"""Metadata-only COUNT(col) (non-null counts from the manifest's
__nulls__ stats) and merge-time schema evolution (evolve=True on both
merge flavors widens the contract; missing columns still refuse)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clx_etl_spark.sinks.versioned import (
    SchemaEnforcementError,
    add_columns,
    append_version,
    count_col_meta,
    delete_version_dv,
    merge_version,
    merge_version_dv,
    read_version,
    table_schema,
)


def test_count_col_meta_exact(spark, tmp_path):
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, None), (3, "c")],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k", "s"])
    append_version(
        spark.createDataFrame([(4, None), (5, None)],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k", "s"])
    assert count_col_meta(path, "s") == 2
    assert count_col_meta(path, "k") == 5
    # version pinning
    assert count_col_meta(path, "s", version=0) == 2


def test_count_col_meta_exact_over_dv_with_nulls(spark, tmp_path):
    """r10 'z' bookkeeping: a dv on a null-bearing file stays EXACT —
    each dv entry records the per-column null count among its
    tombstoned rows (VERDICT r09 item 7; pre-r10 this shape returned
    None and forced a scan)."""
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, None), (3, "c")],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k", "s"])
    # tombstone one NON-null row (k=1 -> s='a')
    delete_version_dv(spark, path, "k", 1, 1)
    assert count_col_meta(path, "s") == 1  # 'c' survives
    assert count_col_meta(path, "k") == 2
    # tombstone the NULL row too (k=2 -> s NULL)
    delete_version_dv(spark, path, "k", 2, 2)
    assert count_col_meta(path, "s") == 1
    assert count_col_meta(path, "k") == 1
    # untracked column -> None
    assert count_col_meta(path, "nope") is None


def test_count_col_meta_none_for_pre_z_dv_entries(spark, tmp_path):
    """dv entries WITHOUT the z bookkeeping (pre-r10 manifests) still
    fall back conservatively on null-bearing files."""
    import json
    import os

    from clx_etl_spark.sinks.versioned import (_read_manifest,
                                               latest_version)

    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, None)],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k", "s"])
    delete_version_dv(spark, path, "k", 1, 1)
    v = latest_version(path)
    mp = os.path.join(path, "_manifests", f"v{v}.json")
    with open(mp) as fh:
        m = json.load(fh)
    for entries in m["dv"].values():  # strip z: simulate a pre-r10 dv
        for e in entries:
            e.pop("z", None)
    os.remove(mp)
    with open(mp, "x") as fh:
        json.dump(m, fh)
    assert count_col_meta(path, "s") is None   # unknowable again
    # zero-null files stay exact under z-less dvs (every dv'd row was
    # provably non-null)
    assert count_col_meta(path, "k") == 1
    # verify the manifest actually had the dv (the strip hit something)
    assert _read_manifest(path, v)["dv"]


def test_count_col_meta_metadata_only_column(spark, tmp_path):
    from pyspark.sql.types import LongType

    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1,)], "k long").coalesce(1),
        path, stats_cols=["k"])
    add_columns(path, [("n", LongType())])
    # no file carries n and no stats exist -> conservative None
    assert count_col_meta(path, "n") is None


def test_merge_evolve_widens(spark, tmp_path):
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k"])
    batch = spark.createDataFrame([(2, "B", 1.5), (9, "i", 2.5)],
                                  "k long, s string, x double")
    with pytest.raises(SchemaEnforcementError, match="evolve=True"):
        merge_version(batch, path, keys=["k"])
    merge_version(batch, path, keys=["k"], evolve=True)
    assert table_schema(path).fieldNames() == ["k", "s", "x"]
    got = {r["k"]: (r["s"], r["x"])
           for r in read_version(spark, path).collect()}
    assert got == {1: ("a", None), 2: ("B", 1.5), 9: ("i", 2.5)}
    # missing columns still refuse even with evolve
    with pytest.raises(SchemaEnforcementError, match="missing table col"):
        merge_version(spark.createDataFrame([(1, "z")], "k long, s string"),
                      path, keys=["k"], evolve=True)


def test_merge_dv_evolve_widens(spark, tmp_path):
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k"])
    batch = spark.createDataFrame([(2, "B", 1.5)],
                                  "k long, s string, x double")
    with pytest.raises(SchemaEnforcementError, match="evolve=True"):
        merge_version_dv(batch, path, keys=["k"])
    merge_version_dv(batch, path, keys=["k"], evolve=True)
    assert table_schema(path).fieldNames() == ["k", "s", "x"]
    got = {r["k"]: (r["s"], r["x"])
           for r in read_version(spark, path).collect()}
    assert got == {1: ("a", None), 2: ("B", 1.5)}


def test_analyze_backfills_null_counts(spark, tmp_path):
    """Pre-r09 files (min/max + __rows__, no __nulls__): ANALYZE
    backfills the null counts so count_col_meta upgrades from None to
    exact — and a re-run is a metadata no-op."""
    import json
    import os

    from clx_etl_spark.sinks.versioned import (_read_manifest,
                                               analyze_table,
                                               latest_version)

    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, None), (3, "c")],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k", "s"])
    # simulate a pre-r09 manifest: strip the __nulls__ entries
    mp = os.path.join(path, "_manifests", "v0.json")
    with open(mp) as fh:
        m = json.load(fh)
    for per in m["stats"].values():
        for key in [k for k in per if k.startswith("__nulls__")]:
            del per[key]
    os.remove(mp)
    with open(mp, "x") as fh:
        json.dump(m, fh)
    assert count_col_meta(path, "s") is None  # legacy: cannot answer
    v = analyze_table(spark, path, ["k", "s"])
    assert count_col_meta(path, "s") == 2
    assert count_col_meta(path, "k") == 3
    # idempotent: nothing left to derive
    m2 = _read_manifest(path, latest_version(path))
    assert analyze_table(spark, path, ["k", "s"]) == v + 1  # metadata no-op commit
    assert _read_manifest(path, latest_version(path))["files"] == m2["files"]


def test_rollback_to_legacy_version_carries_head_contract(spark, tmp_path):
    """Restoring a pre-contract version must not silently drop the
    head's schema contract — it carries."""
    import json
    import os

    from clx_etl_spark.sinks.versioned import rollback_version

    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a")], "k long, s string").coalesce(1),
        path)
    # make v0 legacy
    mp = os.path.join(path, "_manifests", "v0.json")
    with open(mp) as fh:
        m = json.load(fh)
    del m["schema"]
    os.remove(mp)
    with open(mp, "x") as fh:
        json.dump(m, fh)
    from pyspark.sql.types import LongType

    add_columns(path, [("n", LongType())])  # v1 records a contract
    rollback_version(path, 0)
    assert table_schema(path) is not None  # carried, not dropped
    assert table_schema(path).fieldNames() == ["k", "s", "n"]


def test_dv_covered_drop_coalesces_stats(spark, tmp_path):
    """A covered-file drop on the dv path must not leave the dropped
    file's stats haunting the manifest (describe_table coverage stays
    <= 1.0 and the stats map matches the file list)."""
    from clx_etl_spark.sinks.versioned import (_read_manifest,
                                               describe_table,
                                               latest_version)

    path = str(tmp_path / "t")
    for lo in (0, 100):
        append_version(
            spark.createDataFrame([(lo + i,) for i in range(50)],
                                  "k long").coalesce(1),
            path, stats_cols=["k"])
    delete_version_dv(spark, path, "k", 100, 149)  # file 2 covered
    m = _read_manifest(path, latest_version(path))
    assert len(m["files"]) == 1
    assert set(dict(m["stats"])) == set(m["files"])
    assert describe_table(path)["stats_coverage"]["k"] == 1.0


def test_z_bookkeeping_survives_reorg_and_sidecar(spark, tmp_path):
    """The per-entry null counts fold through reorg_dvs (sums across
    the consolidated entries) and round-trip the dv parquet sidecar."""
    import clx_etl_spark.sinks.versioned as V

    path = str(tmp_path / "t")
    rows = [(i, None if i % 3 == 0 else f"s{i}") for i in range(30)]
    append_version(
        spark.createDataFrame(rows, "k long, s string").coalesce(1),
        path, stats_cols=["k", "s"])
    expected = lambda lo: sum(  # noqa: E731
        1 for i in range(lo, 30) if i % 3 != 0)
    delete_version_dv(spark, path, "k", 0, 4)
    delete_version_dv(spark, path, "k", 5, 9)
    assert count_col_meta(path, "s") == expected(10)
    v, n_files, folded = V.reorg_dvs(spark, path)
    assert folded == 2
    assert count_col_meta(path, "s") == expected(10)  # z folded exactly
    # force the dv map through the parquet SIDECAR and back
    monkey = V._STATS_SIDECAR_MIN_FILES
    try:
        V._STATS_SIDECAR_MIN_FILES = 0
        delete_version_dv(spark, path, "k", 10, 14)
    finally:
        V._STATS_SIDECAR_MIN_FILES = monkey
    m = V._read_manifest(path, V.latest_version(path))
    assert m.get("dv_sidecar")  # actually spilled
    assert count_col_meta(path, "s") == expected(15)
