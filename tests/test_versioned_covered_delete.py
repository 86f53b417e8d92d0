"""Whole-file metadata DELETE tests: files whose manifest stats prove
every row matches (bounds inside the range + zero footer nulls) drop
from the manifest WITHOUT being read — Delta's fully-matching-file
removal, on both the copy-on-write and deletion-vector paths — plus
the NULL-survivor regression pin (DELETE WHERE col BETWEEN keeps rows
where the predicate is NULL; the CoW anti-filter silently dropped
them before r09)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from clx_etl_spark.sinks.versioned import (
    _read_manifest,
    append_version,
    delete_version,
    delete_version_dv,
    latest_version,
    read_version,
    table_changes,
)


def _seed(spark, path, blocks=(0, 100, 200)):
    for lo in blocks:
        append_version(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(50)],
                "id long, v string",
            ).coalesce(1),
            path, stats_cols=["id"],
        )
    return _read_manifest(path, latest_version(path))


def test_cow_covered_file_drops_without_read(spark, tmp_path):
    path = str(tmp_path / "t")
    m0 = _seed(spark, path)
    mid = m0["files"][1]  # [100,149]
    os.rename(mid, mid + ".hidden")  # loud proof: any read would crash
    v, unt, rew = delete_version(spark, path, "id", 100, 160)
    assert (unt, rew) == (2, 0)  # nothing rewritten, nothing read
    m1 = _read_manifest(path, v)
    assert len(m1["files"]) == 2 and mid not in m1["files"]
    os.rename(mid + ".hidden", mid)  # old snapshot stays readable
    out = read_version(spark, path)
    assert out.count() == 100
    assert out.filter(F.col("id").between(100, 160)).count() == 0
    assert read_version(spark, path, v - 1).count() == 150  # time travel


def test_dv_covered_file_drops_without_positions(spark, tmp_path):
    path = str(tmp_path / "t")
    m0 = _seed(spark, path)
    mid = m0["files"][1]
    os.rename(mid, mid + ".hidden")
    v, nfiles, nrows = delete_version_dv(spark, path, "id", 100, 155)
    # whole file dropped: no dv written for it, rows counted from
    # metadata alone
    assert nfiles == 0 and nrows == 50
    m1 = _read_manifest(path, v)
    assert len(m1["files"]) == 2 and not m1.get("dv")
    os.rename(mid + ".hidden", mid)
    assert read_version(spark, path).count() == 100


def test_covered_change_feed_reads_for_feed_only(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path, blocks=(0, 100))
    v, unt, rew = delete_version(spark, path, "id", 100, 149,
                                 change_feed=True)
    assert (unt, rew) == (1, 0)
    ch = table_changes(spark, path, v - 1, v)
    assert ch.filter(F.col("_change_type") == "delete").count() == 50


def test_dv_covered_change_feed(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path, blocks=(0, 100))
    v, nfiles, nrows = delete_version_dv(spark, path, "id", 100, 149,
                                         change_feed=True)
    assert nfiles == 0 and nrows == 50
    ch = table_changes(spark, path, v - 1, v)
    assert ch.filter(F.col("_change_type") == "delete").count() == 50


def test_null_rows_survive_cow_range_delete(spark, tmp_path):
    """Regression pin: DELETE WHERE col BETWEEN lo AND hi deletes only
    rows where the predicate is TRUE — NULL-key rows survive (the dv
    path always got this right; the CoW anti-filter needed the
    explicit IS NULL leg)."""
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, "b"), (None, "n")],
                              "id long, v string").coalesce(1),
        path, stats_cols=["id"])
    delete_version(spark, path, "id", 0, 10)
    rows = read_version(spark, path).collect()
    assert len(rows) == 1 and rows[0]["id"] is None
    # dv flavor agrees
    path2 = str(tmp_path / "t2")
    append_version(
        spark.createDataFrame([(1, "a"), (None, "n")],
                              "id long, v string").coalesce(1),
        path2, stats_cols=["id"])
    delete_version_dv(spark, path2, "id", 0, 10)
    rows = read_version(spark, path2).collect()
    assert len(rows) == 1 and rows[0]["id"] is None


def test_null_bearing_file_never_covered(spark, tmp_path):
    """A file with nulls in the delete column cannot be proven
    fully-matching (the nulls must survive) — it rewrites."""
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1,), (2,), (None,)], "id long").coalesce(1),
        path, stats_cols=["id"])
    v, unt, rew = delete_version(spark, path, "id", 0, 10)
    assert (unt, rew) == (0, 1)  # conservative rewrite, not a drop
    assert read_version(spark, path).count() == 1


def test_all_covered_keeps_schema_anchor(spark, tmp_path):
    """Dropping every file would leave an unreadable manifest — one
    covered file demotes to a rewrite whose empty output keeps the
    zero-row schema anchor."""
    path = str(tmp_path / "t")
    _seed(spark, path, blocks=(0, 100))
    v, unt, rew = delete_version(spark, path, "id", 0, 149)
    m = _read_manifest(path, v)
    assert len(m["files"]) == 1  # the anchor
    out = read_version(spark, path)
    assert out.count() == 0 and out.columns == ["id", "v"]
    # dv flavor
    path2 = str(tmp_path / "t2")
    _seed(spark, path2, blocks=(0, 100))
    v, nfiles, nrows = delete_version_dv(spark, path2, "id", 0, 149)
    assert nrows == 100
    assert read_version(spark, path2).count() == 0


def test_covered_file_with_existing_dv(spark, tmp_path):
    """A covered file that already carries a deletion vector drops
    cleanly: bounds cover the dv'd rows too (a superset of the live
    ones), the dv entry leaves with the file, and the dv path counts
    only the LIVE rows as deleted."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    # tombstone 5 rows of the middle file first
    delete_version_dv(spark, path, "id", 100, 104)
    v, nfiles, nrows = delete_version_dv(spark, path, "id", 100, 160)
    assert nfiles == 0 and nrows == 45  # 50 - 5 already dv-deleted
    m = _read_manifest(path, v)
    assert len(m["files"]) == 2 and not m.get("dv")
    out = read_version(spark, path)
    assert out.count() == 100
    assert out.filter(F.col("id").between(100, 160)).count() == 0


def test_untracked_column_never_covered(spark, tmp_path):
    """Files without stats on the delete column rewrite conservatively
    (pre-existing behavior, unchanged by the covered-drop)."""
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(i,) for i in range(50)],
                              "id long").coalesce(1),
        path)  # no stats_cols
    v, unt, rew = delete_version(spark, path, "id", 0, 49)
    assert (unt, rew) == (0, 1)
    assert read_version(spark, path).count() == 0


def test_nan_rows_never_covered_and_survive(spark, tmp_path):
    """Parquet footers exclude NaN from min/max and don't count it as
    null — float/double bounds therefore never prove coverage, and the
    conservative rewrite's anti-filter keeps the NaN row (NaN fails
    BETWEEN in Spark)."""
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame(
            [(1.0,), (5.0,), (float("nan"),)], "x double").coalesce(1),
        path, stats_cols=["x"])
    v, unt, rew = delete_version(spark, path, "x", 0.0, 10.0)
    assert (unt, rew) == (0, 1)  # rewritten, never dropped
    import math

    rows = read_version(spark, path).collect()
    assert len(rows) == 1 and math.isnan(rows[0]["x"])


def test_covered_change_feed_across_evolved_schemas(spark, tmp_path):
    """The delete feed unions a covered file and a rewritten file whose
    physical schemas differ (evolution): allowMissingColumns pads the
    gap instead of crashing."""
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(i, f"s{i}") for i in range(50)],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k"])
    append_version(
        spark.createDataFrame([(100 + i, "w", 1.0) for i in range(50)],
                              "k long, s string, x double").coalesce(1),
        path, stats_cols=["k"], evolve=True)
    # covers file 1 fully, file 2 partially -> one covered + one rewrite
    v, unt, rew = delete_version(spark, path, "k", 0, 120,
                                 change_feed=True)
    assert (unt, rew) == (0, 1)
    ch = table_changes(spark, path, v - 1, v)
    assert ch.filter(F.col("_change_type") == "delete").count() == 71
    assert read_version(spark, path).count() == 29
