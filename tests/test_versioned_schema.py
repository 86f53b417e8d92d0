"""Schema-contract tests for versioned tables: manifest-recorded
schemas, Delta-style write enforcement (extra columns refused without
evolve, typed-NULL fill for missing columns, lossless upcasts only),
metadata-only ADD COLUMNS, per-version schema under time travel, carry
across every maintenance op, rebase-time schema merging, and the DSv2
doors (catalog schema from the manifest, drift checks on path writes,
the mergeSchema option). Delta semantics; the reference's implicit
dict-schema rows (src/databases/doris/__init__.py:177-182) are exactly
the failure mode this contract closes — SURVEY §1.3's "declare explicit
StructType per domain table" upgrade, now enforced at the storage
layer."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StringType

from clx_etl_spark.sinks.versioned import (
    SchemaEnforcementError,
    _read_manifest,
    add_columns,
    analyze_table,
    append_version,
    clone_table,
    compact_version,
    delete_version,
    merge_version,
    overwrite_version,
    read_version,
    rollback_version,
    scan_version,
    table_schema,
)


def _base(spark, path):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k int, s string"
    ).coalesce(1)
    return append_version(df, path, stats_cols=["k"])


def test_first_append_records_contract(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    st = table_schema(path)
    assert [(f.name, f.dataType.simpleString()) for f in st.fields] == [
        ("k", "int"), ("s", "string")
    ]
    assert all(f.nullable for f in st.fields)


def test_extra_column_refused_without_evolve(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    drifted = spark.createDataFrame([(1, "a", 2.0)], "k int, s string, x double")
    with pytest.raises(SchemaEnforcementError, match="evolve=True"):
        append_version(drifted, path)
    # nothing committed
    assert table_schema(path).fieldNames() == ["k", "s"]


def test_evolve_append_widens_and_pads(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    drifted = spark.createDataFrame(
        [(100, "a", 2.0)], "k int, s string, x double").coalesce(1)
    append_version(drifted, path, evolve=True)
    assert table_schema(path).fieldNames() == ["k", "s", "x"]
    out = read_version(spark, path)
    assert out.columns == ["k", "s", "x"]
    assert out.count() == 21
    # pre-evolution rows read the new column as NULL
    assert out.filter(F.col("x").isNull()).count() == 20


def test_missing_columns_fill_typed_nulls(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    narrow = spark.createDataFrame([(200,)], "k int").coalesce(1)
    append_version(narrow, path)
    row = read_version(spark, path).filter(F.col("k") == 200).first()
    assert row["s"] is None
    # the committed file physically carries the full width (no
    # mergeSchema dependence for contract-era files)
    m = _read_manifest(path, 1)
    import pyarrow.parquet as pq

    newest = m["files"][-1]
    assert pq.read_schema(newest).names == ["k", "s"]


def test_lossless_upcast_casts_silently(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10)], "k int, n long").coalesce(1)
    append_version(df, path)
    into = spark.createDataFrame([(2, 20)], "k int, n int").coalesce(1)
    append_version(into, path)  # int n upcasts into the long column
    out = read_version(spark, path)
    assert dict(out.dtypes)["n"] == "bigint"
    assert out.count() == 2


def test_type_change_always_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    bad = spark.createDataFrame([("x", "y")], "k string, s string")
    with pytest.raises(SchemaEnforcementError, match="not a[\\s]+lossless|lossless"):
        append_version(bad, path, evolve=True)


def test_add_columns_metadata_only(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    files_before = list(_read_manifest(path, 0)["files"])
    v = add_columns(path, [("n", LongType())])
    assert v == 1
    m = _read_manifest(path, 1)
    assert m["op"] == "add-columns"
    assert m["files"] == files_before  # no data file touched
    assert table_schema(path).fieldNames() == ["k", "s", "n"]
    # existing rows read NULL; scan_version pads too (post-filter)
    assert read_version(spark, path).filter(F.col("n").isNull()).count() == 20
    assert "n" in scan_version(spark, path, "k", 0, 5).columns
    # idempotent replay: same column+type commits nothing new
    assert add_columns(path, [("n", LongType())]) == 1
    # same name, different type refuses
    with pytest.raises(SchemaEnforcementError, match="already exists"):
        add_columns(path, [("n", StringType())])


def test_time_travel_reads_version_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    add_columns(path, [("n", LongType())])
    assert table_schema(path, 0).fieldNames() == ["k", "s"]
    assert read_version(spark, path, 0).columns == ["k", "s"]
    assert read_version(spark, path, 1).columns == ["k", "s", "n"]


def test_schema_carries_across_maintenance(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    add_columns(path, [("n", LongType())])
    want = ["k", "s", "n"]
    analyze_table(spark, path, ["k"])
    assert table_schema(path).fieldNames() == want
    merge_version(
        spark.createDataFrame([(5, "m", 1)], "k int, s string, n long"),
        path, keys=["k"])
    assert table_schema(path).fieldNames() == want
    delete_version(spark, path, "k", 0, 2)
    assert table_schema(path).fieldNames() == want
    compact_version(spark, path)
    assert table_schema(path).fieldNames() == want
    dst = str(tmp_path / "c")
    clone_table(path, dst)
    assert table_schema(dst).fieldNames() == want


def test_rollback_restores_schema(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    add_columns(path, [("n", LongType())])
    rollback_version(path, 0)
    assert table_schema(path).fieldNames() == ["k", "s"]
    assert read_version(spark, path).columns == ["k", "s"]


def test_overwrite_enforces_unless_replace(spark, tmp_path):
    path = str(tmp_path / "t")
    _base(spark, path)
    other = spark.createDataFrame([("z",)], "zz string")
    with pytest.raises(SchemaEnforcementError):
        overwrite_version(other, path)
    overwrite_version(other, path, replace_schema=True)
    assert table_schema(path).fieldNames() == ["zz"]


def test_constraints_see_normalized_batch(spark, tmp_path):
    from clx_etl_spark.sinks.versioned import (ConstraintViolation,
                                               set_constraints)

    path = str(tmp_path / "t")
    _base(spark, path)
    set_constraints(path, {"s_set": "s IS NOT NULL"})
    narrow = spark.createDataFrame([(300,)], "k int")
    # the missing column pads NULL, and the CHECK sees that NULL
    with pytest.raises(ConstraintViolation):
        append_version(narrow, path)


def test_rebase_merges_concurrent_evolution(spark, tmp_path, monkeypatch):
    """A CAS-losing append normalized against the old schema must merge
    the winner's evolved schema instead of clobbering it."""
    import clx_etl_spark.sinks.versioned as V

    path = str(tmp_path / "t")
    _base(spark, path)
    real_commit = V._commit
    hits = {"n": 0}

    def racing_commit(p, version, *a, **kw):
        if hits["n"] == 0:
            hits["n"] += 1
            # interleave a winner that evolved the schema
            other = spark.createDataFrame(
                [(900, "w", 1.0)], "k int, s string, w double").coalesce(1)
            V.append_version(other, path, evolve=True)
        return real_commit(p, version, *a, **kw)

    monkeypatch.setattr(V, "_commit", racing_commit)
    mine = spark.createDataFrame(
        [(901, "m", 5)], "k int, s string, m long").coalesce(1)
    V.append_version(mine, path, evolve=True)
    monkeypatch.undo()
    st = table_schema(path)
    assert set(st.fieldNames()) == {"k", "s", "w", "m"}
    out = read_version(spark, path)
    assert out.count() == 22
    assert out.filter(F.col("k") == 900).first()["w"] == 1.0
    assert out.filter(F.col("k") == 901).first()["m"] == 5


def test_legacy_manifest_reads_without_schema(spark, tmp_path):
    """Pre-contract manifests (no 'schema' key) keep working: reads fall
    back to mergeSchema, table_schema returns None, and add_columns
    seeds the contract from the newest file."""
    path = str(tmp_path / "t")
    _base(spark, path)
    # strip the schema key to simulate a pre-r09 manifest
    mp = os.path.join(path, "_manifests", "v0.json")
    with open(mp) as fh:
        m = json.load(fh)
    del m["schema"]
    os.remove(mp)
    with open(mp, "x") as fh:
        json.dump(m, fh)
    assert table_schema(path) is None
    assert read_version(spark, path).count() == 20
    add_columns(path, [("n", LongType())])
    assert table_schema(path).fieldNames() == ["k", "s", "n"]


def test_dsv2_catalog_schema_from_manifest(spark, tmp_path):
    """The DSv2 schema() door reports the manifest contract — a
    metadata-only add_columns is visible before any file carries it."""
    from clx_etl_spark.sources.table_source import read_table_source

    path = str(tmp_path / "t")
    _base(spark, path)
    add_columns(path, [("n", LongType())])
    out = read_table_source(spark, path)
    assert out.columns == ["k", "s", "n"]
    assert out.filter(F.col("n").isNull()).count() == 20


def test_dsv2_path_write_drift_refused_and_evolves(spark, tmp_path):
    from clx_etl_spark.sources.table_source import (TableDataSource,
                                                    write_table_source)

    path = str(tmp_path / "t")
    _base(spark, path)
    drifted = spark.createDataFrame([(1, "a", 2.0)], "k int, s string, x double")
    with pytest.raises(Exception, match="mergeSchema"):
        write_table_source(drifted, path)
    assert table_schema(path).fieldNames() == ["k", "s"]
    spark.dataSource.register(TableDataSource)
    (drifted.write.format("clx_table").option("path", path)
     .option("mergeSchema", "true").mode("append").save())
    assert table_schema(path).fieldNames() == ["k", "s", "x"]
    out = read_version(spark, path)
    assert out.count() == 21 and out.filter(F.col("x").isNotNull()).count() == 1


def test_dsv2_type_drift_refused(spark, tmp_path):
    from clx_etl_spark.sources.table_source import write_table_source

    path = str(tmp_path / "t")
    _base(spark, path)
    bad = spark.createDataFrame([(1.5, "a")], "k double, s string")
    with pytest.raises(Exception, match="cast in"):
        write_table_source(bad, path)


def test_engine_doors(spark, tmp_path):
    from clx_etl_spark.api import Engine

    eng = Engine(spark)
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, "a")], "k int, s string")
    eng.commit_version(df, path)
    wide = spark.createDataFrame([(2, "b", 9)], "k int, s string, n long")
    with pytest.raises(SchemaEnforcementError):
        eng.commit_version(wide, path)
    eng.commit_version(wide, path, evolve=True)
    assert eng.table_schema(path).fieldNames() == ["k", "s", "n"]
    eng.add_table_columns(path, [("z", IntegerType())])
    assert eng.table_schema(path).fieldNames() == ["k", "s", "n", "z"]


def test_merge_refuses_missing_columns(spark, tmp_path):
    """A merge replaces whole matched rows — padding a missing batch
    column with NULL would destroy stored values, so it refuses loudly
    (both flavors)."""
    from clx_etl_spark.sinks.versioned import merge_version_dv

    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a", 9.0)], "k int, s string, x double"),
        path)
    narrow = spark.createDataFrame([(1, "a2")], "k int, s string")
    with pytest.raises(SchemaEnforcementError, match="missing table col"):
        merge_version(narrow, path, keys=["k"])
    with pytest.raises(SchemaEnforcementError, match="missing table col"):
        merge_version_dv(narrow, path, keys=["k"])
    row = read_version(spark, path).first()
    assert row["x"] == 9.0  # stored value intact


def test_legacy_append_does_not_adopt_narrow_contract(spark, tmp_path):
    """Appending a narrow batch to a pre-contract table must NOT record
    the batch's schema as the contract (it would project legacy columns
    away); the table stays legacy until an overwrite/add_columns."""
    path = str(tmp_path / "t")
    _base(spark, path)  # (k, s)
    # strip to legacy
    mp = os.path.join(path, "_manifests", "v0.json")
    with open(mp) as fh:
        m = json.load(fh)
    del m["schema"]
    os.remove(mp)
    with open(mp, "x") as fh:
        json.dump(m, fh)
    narrow = spark.createDataFrame([(99,)], "k int").coalesce(1)
    append_version(narrow, path)
    assert table_schema(path) is None  # still legacy
    out = read_version(spark, path)
    assert set(out.columns) == {"k", "s"}  # legacy column visible
    assert out.count() == 21


def test_scan_version_on_metadata_only_column(spark, tmp_path):
    """scan_version on a column added by metadata-only add_columns —
    which no kept file physically carries — resolves against the
    contract's typed NULLs and returns empty, like read_version."""
    path = str(tmp_path / "t")
    _base(spark, path)
    add_columns(path, [("n", LongType())])
    out = scan_version(spark, path, "n", 0, 10)
    assert out.count() == 0
    assert out.columns == ["k", "s", "n"]


def test_history_and_describe_surface_schema(spark, tmp_path):
    from clx_etl_spark.sinks.versioned import describe_table, history

    path = str(tmp_path / "t")
    _base(spark, path)                      # v0: records the contract
    append_version(
        spark.createDataFrame([(50, "z")], "k int, s string").coalesce(1),
        path)                               # v1: same schema
    add_columns(path, [("n", LongType())])  # v2: widens
    h = {r.version: r.schema_changed
         for r in history(spark, path).collect()}
    assert h == {0: True, 1: False, 2: True}
    d = describe_table(path)
    assert d["schema"] == "struct<k:int,s:string,n:bigint>"


def test_nested_nullability_drift_accepted(spark, tmp_path):
    """A batch whose NESTED nullability differs from the contract (array
    containsNull, struct-field nullable) carries identical data — parquet
    round-trips read everything back nullable — and must append cleanly
    instead of being refused as a type change (ADVICE r09)."""
    from pyspark.sql.types import (ArrayType, StructField, StructType)

    strict = StructType([
        StructField("k", IntegerType(), True),
        StructField("xs", ArrayType(IntegerType(), False), True),
        StructField("st", StructType([
            StructField("a", IntegerType(), False),
        ]), True),
    ])
    loose = StructType([
        StructField("k", IntegerType(), True),
        StructField("xs", ArrayType(IntegerType(), True), True),
        StructField("st", StructType([
            StructField("a", IntegerType(), True),
        ]), True),
    ])
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, [1, 2], (7,))], strict).coalesce(1), path)
    # the same rows under all-nullable nested types (what a parquet
    # read-back of the first batch produces) must not be refused
    append_version(
        spark.createDataFrame([(2, [3], (8,))], loose).coalesce(1), path)
    append_version(
        spark.createDataFrame([(3, [4], (9,))], strict).coalesce(1), path)
    out = read_version(spark, path)
    assert out.count() == 3
    assert sorted(r.st.a for r in out.collect()) == [7, 8, 9]


def test_cas_contract_race_reenforces(spark, tmp_path, monkeypatch):
    """ADVICE r09: an append normalized when the table had NO contract
    that loses the CAS to a commit which RECORDED one must re-enforce
    against the new head — a drifting batch is refused even in this
    interleave, never silently merged into the contract."""
    import clx_etl_spark.sinks.versioned as V

    path = str(tmp_path / "t")
    _base(spark, path)
    # strip the contract: simulate a legacy (pre-contract) head
    mp = os.path.join(path, "_manifests", "v0.json")
    with open(mp) as fh:
        m = json.load(fh)
    del m["schema"]
    os.remove(mp)
    with open(mp, "x") as fh:
        json.dump(m, fh)
    assert table_schema(path) is None
    real_commit = V._commit
    hits = {"n": 0}

    def racing_commit(p, version, *a, **kw):
        if hits["n"] == 0:
            hits["n"] += 1
            # interleaved winner records a ["k","s"] contract
            add_columns(path, [("s", StringType())])
        return real_commit(p, version, *a, **kw)

    monkeypatch.setattr(V, "_commit", racing_commit)
    drifted = spark.createDataFrame(
        [(900, "d", 1.0)], "k int, s string, z double").coalesce(1)
    with pytest.raises(SchemaEnforcementError):
        V.append_version(drifted, path)  # no evolve=True: must refuse
    monkeypatch.undo()
    assert set(table_schema(path).fieldNames()) == {"k", "s"}
    assert read_version(spark, path).count() == 20  # nothing landed


def test_delete_on_contract_only_column_is_noop(spark, tmp_path):
    """DELETE on a column added via metadata-only add_columns (present
    in no data file) resolves instead of raising: every row reads the
    column as NULL, NULL BETWEEN is never TRUE, so all rows survive and
    no file rewrites (ADVICE r09) — on both delete flavors."""
    from clx_etl_spark.sinks.versioned import (delete_version,
                                               delete_version_dv)

    path = str(tmp_path / "t")
    _base(spark, path)
    add_columns(path, [("n", LongType())])
    v, untouched, rewritten = delete_version(spark, path, "n", 0, 10)
    assert rewritten == 0
    assert read_version(spark, path).count() == 20
    v2, dv_files, deleted = delete_version_dv(spark, path, "n", 0, 10,
                                              change_feed=True)
    assert (dv_files, deleted) == (0, 0)
    assert read_version(spark, path).count() == 20


def test_history_schema_baseline_resets_at_gap(spark, tmp_path):
    """An expired-manifest gap resets the schema baseline alongside the
    file baseline: the first post-gap row reports schema_changed=True
    just as its file deltas restart as full adds (ADVICE r09)."""
    from clx_etl_spark.sinks.versioned import history

    path = str(tmp_path / "t")
    _base(spark, path)  # v0
    append_version(
        spark.createDataFrame([(50, "z")], "k int, s string").coalesce(1),
        path)           # v1: same schema
    append_version(
        spark.createDataFrame([(51, "y")], "k int, s string").coalesce(1),
        path)           # v2: same schema
    os.remove(os.path.join(path, "_manifests", "v1.json"))  # expired gap
    h = {r.version: (r.files_added, r.schema_changed)
         for r in history(spark, path).collect()}
    assert set(h) == {0, 2}
    n0 = h[0][0]
    assert h[0][1] is True
    # post-gap: file deltas restart as full adds AND schema restarts
    assert h[2] == (n0 + 2, True)
