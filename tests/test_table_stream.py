"""Append-only streaming reads of a versioned table (VERDICT r10 item
4): ``spark.readStream.format("clx_table")`` — initial snapshot +
per-commit increments, Delta's plain streaming-source shape. Until r10,
streaming a versioned table required the change feed (clx_cdf); this is
the zero-write-amplification door for append-mostly tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from clx_etl_spark.sinks.versioned import (
    append_version,
    delete_version,
    delete_version_dv,
    rename_column,
)
from clx_etl_spark.sources.table_source import stream_table


def _run(spark, path, out, ck, **kw):
    q = (
        stream_table(spark, path, **kw)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_snapshot_then_exact_increments_with_restart(spark, tmp_path):
    """First batch = the dv-applied initial snapshot; after a restart
    from the SAME checkpoint, exactly the appended rows arrive — no
    snapshot re-read, no duplicates."""
    path, out, ck = (str(tmp_path / n) for n in ("t", "out", "ck"))
    append_version(
        spark.createDataFrame([(i, f"a{i}") for i in range(10)],
                              "k long, s string").coalesce(1), path)
    delete_version_dv(spark, path, "k", 0, 1)  # snapshot must apply dv
    _run(spark, path, out, ck)
    assert spark.read.parquet(out).count() == 8  # 10 - 2 tombstoned
    append_version(
        spark.createDataFrame([(100, "b")], "k long, s string")
        .coalesce(1), path)
    append_version(
        spark.createDataFrame([(101, "c")], "k long, s string")
        .coalesce(1), path)
    _run(spark, path, out, ck)  # restart resumes from the checkpoint
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == [2, 3, 4, 5, 6, 7, 8, 9, 100, 101]
    _run(spark, path, out, ck)  # nothing new: no rows, no error
    assert spark.read.parquet(out).count() == 10


def test_rewrite_refused_unless_ignore_changes(spark, tmp_path):
    path, out, ck = (str(tmp_path / n) for n in ("t", "out", "ck"))
    append_version(
        spark.createDataFrame([(i, "x") for i in range(10)],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k"])
    _run(spark, path, out, ck)
    delete_version(spark, path, "k", 0, 4)  # a rewriting commit
    with pytest.raises(Exception, match="rewrote row state"):
        _run(spark, path, out, ck)
    # ignoreChanges crosses it (rewritten rows may reprocess — none
    # here, since the delete's survivors land in a rewritten file that
    # IS re-emitted; assert the documented semantics: appends after the
    # rewrite still stream)
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    _run(spark, path, out2, ck2, starting_version="latest")
    append_version(
        spark.createDataFrame([(200, "y")], "k long, s string")
        .coalesce(1), path)
    _run(spark, path, out2, ck2, starting_version="latest",
         ignore_changes=True)
    assert sorted(r.k for r in spark.read.parquet(out2).collect()) == [200]


def test_starting_version_streams_history(spark, tmp_path):
    path, out, ck = (str(tmp_path / n) for n in ("t", "out", "ck"))
    for i in range(3):
        append_version(
            spark.createDataFrame([(i, "v")], "k long, s string")
            .coalesce(1), path)
    _run(spark, path, out, ck, starting_version=1)
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [1, 2]


def test_rename_mid_stream_refuses(spark, tmp_path):
    """A column-mapping commit changes the stream's schema: refuse
    (Delta restarts streams on schema change the same way)."""
    path, out, ck = (str(tmp_path / n) for n in ("t", "out", "ck"))
    append_version(
        spark.createDataFrame([(1, "a")], "k long, s string")
        .coalesce(1), path)
    _run(spark, path, out, ck)
    rename_column(path, "k", "key")
    with pytest.raises(Exception, match="column mapping|schema"):
        _run(spark, path, out, ck)
    # a FRESH stream (new checkpoint) reads the renamed table fine,
    # snapshot under the new name
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    _run(spark, path, out2, ck2)
    df = spark.read.parquet(out2)
    assert df.columns == ["key", "s"]
    assert df.count() == 1


def test_offsets_are_deterministic_for_batch_zero_replay(spark, tmp_path):
    """Review r10: batch-0 recovery must be exact — the snapshot leg
    derives from the WAL'd END offset's version, and initialOffset in
    snapshot mode is a constant, so a crash-restart replays the same
    snapshot even after concurrent appends (which then arrive exactly
    once as increments)."""
    from pyspark.sql.types import StructType

    from clx_etl_spark.sources.table_source import TableStreamReader

    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "k long, s string").coalesce(1), path)
    schema = StructType.fromDDL("k long, s string")
    r = TableStreamReader(schema, {"path": path})
    first = r.initialOffset()
    assert first == {"v": -1, "snap": 1}  # head-independent constant
    end0 = r.latestOffset()
    assert end0 == {"v": 0, "snap": 0}
    # a concurrent append lands BETWEEN the WAL write and the replay
    append_version(
        spark.createDataFrame([(3, "c")], "k long, s string")
        .coalesce(1), path)
    # a RESTARTED reader replans batch 0 from the same offsets and
    # reads the SAME snapshot manifest (v0), not the new head
    r2 = TableStreamReader(schema, {"path": path})
    assert r2.initialOffset() == first
    parts = r2.partitions(first, end0)
    m0 = set(__import__("clx_etl_spark.sinks.versioned",
                        fromlist=["_read_manifest"])
             ._read_manifest(path, 0)["files"])
    assert {p.file for p in parts} == m0
    # the interleaved append arrives exactly once, as the next range
    end1 = r2.latestOffset()
    inc = r2.partitions(end0, end1)
    assert {p.file for p in inc} == set(
        __import__("clx_etl_spark.sinks.versioned",
                   fromlist=["_read_manifest"])
        ._read_manifest(path, 1)["files"]) - m0


def test_cdf_stream_names_mapping_ops(spark, tmp_path):
    """Review r10: the change-feed stream refuses rename/drop commits
    with a restart-the-stream message, not the misleading 'rewrote rows
    without a recorded change set'."""
    from clx_etl_spark.sources.cdf_source import stream_changes

    path, out, ck = (str(tmp_path / n) for n in ("t", "out", "ck"))
    append_version(
        spark.createDataFrame([(1, "a")], "k long, s string")
        .coalesce(1), path)
    rename_column(path, "k", "key")
    q = (
        stream_changes(spark, path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(availableNow=True).start()
    )
    with pytest.raises(Exception, match="column mapping"):
        q.awaitTermination(120)
