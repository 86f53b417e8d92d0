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


def test_rename_crossed_on_restart_resumes_exactly(spark, tmp_path):
    """SCHEMA TRACKING (VERDICT r10 item 3, Delta's
    schemaTrackingLocation shape): a restart from the SAME checkpoint
    crosses a column-mapping commit — the restarted reader's schema
    re-derives from the head contract, the mapping commit becomes a
    zero-row metadata no-op, and rows appended after it arrive exactly
    once under the NEW names. No rows lost, none duplicated."""
    path, out, ck = (str(tmp_path / n) for n in ("t", "out", "ck"))
    append_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
        .coalesce(1), path)
    _run(spark, path, out, ck)
    assert spark.read.parquet(out).count() == 2
    rename_column(path, "k", "key")
    # restart across the rename: resumes cleanly, zero new rows (the
    # mapping commit changed none)
    _run(spark, path, out, ck)
    assert spark.read.parquet(out).count() == 2
    # rows appended under the new name stream exactly once
    append_version(
        spark.createDataFrame([(300, "z")], "key long, s string")
        .coalesce(1), path)
    _run(spark, path, out, ck)
    got = (spark.read.option("mergeSchema", "true").parquet(out))
    assert got.count() == 3
    assert [r.key for r in got.where("key is not null").collect()] == [300]
    # a FRESH stream (new checkpoint) reads the renamed table fine,
    # snapshot under the new name — old files project through the
    # schema version's mapping
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    _run(spark, path, out2, ck2)
    df = spark.read.parquet(out2)
    assert df.columns == ["key", "s"]
    assert sorted(r.key for r in df.collect()) == [1, 2, 300]


def test_mapping_commit_after_stream_start_still_raises(spark, tmp_path):
    """A rename landing AFTER the reader pinned its schema still
    raises restart-the-stream (the query's fixed schema cannot change
    mid-run); the restarted reader then crosses it."""
    from pyspark.sql.types import StructType

    from clx_etl_spark.sinks.versioned import _read_manifest
    from clx_etl_spark.sources.table_source import TableStreamReader

    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a")], "k long, s string")
        .coalesce(1), path)
    r = TableStreamReader(StructType.fromDDL("k long, s string"),
                          {"path": path})
    off0 = r.initialOffset()
    end0 = r.latestOffset()
    assert len(r.partitions(off0, end0)) == 1  # snapshot leg fine
    rename_column(path, "k", "key")  # v1: AFTER this reader started
    append_version(
        spark.createDataFrame([(2, "b")], "key long, s string")
        .coalesce(1), path)  # v2
    end1 = r.latestOffset()
    with pytest.raises(ValueError, match="restart the stream"):
        r.partitions(end0, end1)
    # the restart: a fresh reader (schema re-derived) resumes from the
    # same offsets, skipping the mapping commit, reading only v2's file
    r2 = TableStreamReader(StructType.fromDDL("key long, s string"),
                           {"path": path})
    parts = r2.partitions(end0, {"v": 2, "snap": 0})
    v2_new = (set(_read_manifest(path, 2)["files"])
              - set(_read_manifest(path, 1)["files"]))
    assert {p.file for p in parts} == v2_new
    # and the old-name physical projects onto the new logical name
    rows = [b.to_pylist() for b in r2.read(parts[0])]
    assert rows[0][0] == {"key": 2, "s": "b"}


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


def test_cdf_stream_crosses_historical_rename(spark, tmp_path):
    """SCHEMA TRACKING on the change-feed stream: a rename already in
    history when the stream starts is crossed — the v0 insert replays
    under the NEW name (appended data files store immutable physical
    names; the schema version's mapping projects them), and change-set
    files written under the OLD era's logical names project through
    the composed current->physical->era lookup."""
    from clx_etl_spark.sinks.versioned import delete_version
    from clx_etl_spark.sources.cdf_source import stream_changes

    path, out, ck = (str(tmp_path / n) for n in ("t", "out", "ck"))
    append_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
        .coalesce(1), path, stats_cols=["k"])
    # v1: a change-feed delete — its change files carry era names (k)
    delete_version(spark, path, "k", 2, 2, change_feed=True)
    rename_column(path, "k", "key")  # v2
    q = (
        stream_changes(spark, path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert "key" in got.columns and "k" not in got.columns
    rows = {(r.key, r._change_type) for r in got.collect()}
    assert (1, "insert") in rows and (2, "insert") in rows
    assert (2, "delete") in rows  # era-name change file, composed lookup


def test_cdf_mapping_commit_after_start_still_raises(spark, tmp_path):
    """Review r10 + r11: a rename landing AFTER the CDF reader pinned
    its schema raises the explicit restart-the-stream message, not the
    misleading 'rewrote rows without a recorded change set'."""
    from pyspark.sql.types import StructType

    from clx_etl_spark.sources.cdf_source import CdfStreamReader

    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a")], "k long, s string")
        .coalesce(1), path)
    r = CdfStreamReader(
        StructType.fromDDL(
            "k long, s string, _change_type string, _commit_version bigint"
        ),
        {"path": path})
    off0 = r.initialOffset()
    end0 = r.latestOffset()
    assert len(r.partitions(off0, end0)) == 1
    rename_column(path, "k", "key")  # AFTER this reader started
    end1 = r.latestOffset()
    with pytest.raises(ValueError, match="column mapping"):
        r.partitions(end0, end1)


def test_max_files_per_trigger_rate_limits_steady_state(spark, tmp_path):
    """maxFilesPerTrigger (r11, Delta's file-granular rate limit) under
    a processingTime trigger: a SINGLE commit appending 5 files under
    cap 2 is delivered across three micro-batches with mid-version file
    cursors ({'v': c, 'i': k}) in the WAL — every row exactly once.
    (The FIRST planned window of a query is uncapped — the planner has
    not seen a position yet — so the cap's steady-state proof is on the
    windows after it.)"""
    import json
    import os
    import time

    path, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    append_version(
        spark.range(0, 10).selectExpr(
            "id", "cast(id as double) as x").coalesce(1), path)
    q = (
        stream_table(spark, path, max_files_per_trigger=2)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(processingTime="1 seconds").start()
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:  # batch 0: the snapshot
            try:
                if spark.read.parquet(out).count() >= 10:
                    break
            except Exception:
                pass  # sink not materialized yet
            time.sleep(1)
        append_version(  # ONE commit, five files
            spark.range(100, 150).selectExpr(
                "id", "cast(id as double) as x").repartition(5), path)
        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            try:
                if spark.read.parquet(out).count() >= 60:
                    break
            except Exception:
                pass
            time.sleep(1)
    finally:
        q.stop()
    res = spark.read.parquet(out)
    assert res.count() == 60
    assert res.select("id").distinct().count() == 60
    # the WAL proves the split: the 5-file commit needed mid-version
    # cursors at i=2 and i=4 before completing at {"v": 1}
    odir = os.path.join(ck, "offsets")
    offs = []
    for f in os.listdir(odir):
        if not f.startswith("."):
            with open(os.path.join(odir, f)) as fh:
                offs.append(json.loads(fh.read().splitlines()[-1]))
    cursors = {o.get("i") for o in offs if o.get("i")}
    assert cursors == {2, 4}


def test_max_files_per_trigger_bounds_each_available_now_run(
    spark, tmp_path
):
    """availableNow plans ONE window per run (the Python DSv2 API has
    no admission control), so the cap bounds THE RUN: each rerun from
    the same checkpoint drains at most maxFilesPerTrigger more files,
    exactly once — the bounded-increment backfill contract. (The very
    first window of a query is uncapped, so run 1 delivers the whole
    snapshot.)"""
    path, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    append_version(
        spark.range(0, 10).selectExpr(
            "id", "cast(id as double) as x").coalesce(1), path)

    def run():
        q = (
            stream_table(spark, path, max_files_per_trigger=2)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(120)
        res = spark.read.parquet(out)
        return res.count(), res.select("id").distinct().count()

    n, d = run()  # snapshot: first window, uncapped
    assert (n, d) == (10, 10)
    append_version(  # ONE commit, five files
        spark.range(100, 150).selectExpr(
            "id", "cast(id as double) as x").repartition(5), path)
    counts = []
    for _ in range(5):  # ceil(5/2)=3 runs to drain, never fewer
        n, d = run()
        assert n == d  # exactly-once at every intermediate state
        counts.append(n)
        if n >= 60:
            break
    assert counts[-1] == 60
    assert len(counts) == 3  # the cap bounded every run at 2 files


def test_max_files_per_trigger_offsets_unit(spark, tmp_path):
    """Offset-level contract, driven directly (no Spark runner):
    snapshot pinning, mid-version cursors, and the mid-snapshot
    RESTART fallback (uncapped window = snapshot tail + increments,
    exactly once)."""
    from pyspark.sql.types import StructType

    from clx_etl_spark.sinks.versioned import table_schema
    from clx_etl_spark.sources.table_source import TableStreamReader

    path = str(tmp_path / "t")
    for i in range(2):  # v0: 3 files, v1: +2 files
        append_version(
            spark.range(i * 100, i * 100 + 30)
            .selectExpr("id", "cast(id as double) as x")
            .repartition(3 if i == 0 else 2), path)
    schema = StructType(table_schema(path).fields)

    def reader(mft):
        return TableStreamReader(
            schema, {"path": path, "maxfilespertrigger": str(mft)})

    r = reader(2)
    o0 = r.initialOffset()
    assert o0 == {"v": -1, "snap": 1}
    o1 = r.latestOffset()  # pins the snapshot at head v1 (5 files)
    assert o1 == {"v": -1, "snap": 1, "sv": 1, "i": 2}
    assert len(r.partitions(o0, o1)) == 2
    o2 = r.latestOffset()
    assert o2 == {"v": -1, "snap": 1, "sv": 1, "i": 4}
    assert len(r.partitions(o1, o2)) == 2
    o3 = r.latestOffset()  # snapshot completes
    assert o3 == {"v": 1, "snap": 0}
    assert len(r.partitions(o2, o3)) == 1
    # ---- mid-snapshot RESTART: a fresh reader knows nothing; its
    # first window is uncapped ({"v": head}) and partitions must
    # deliver the snapshot TAIL from the WAL'd start, then increments
    append_version(
        spark.range(500, 520).selectExpr(
            "id", "cast(id as double) as x").repartition(2), path)  # v2
    r2 = reader(2)
    fallback = r2.latestOffset()
    assert fallback == {"v": 2, "snap": 0}
    tail = r2.partitions(o2, fallback)  # WAL'd start: sv=1 through i=4
    # 1 remaining snapshot file of v1 + 2 appended files of v2
    assert len(tail) == 3
    # ---- mid-version cursors on one fat commit
    append_version(
        spark.range(600, 640).selectExpr(
            "id", "cast(id as double) as x").repartition(4), path)  # v3
    o4 = r2.latestOffset()
    assert o4 == {"v": 2, "snap": 0, "i": 2}
    assert len(r2.partitions(fallback, o4)) == 2
    o5 = r2.latestOffset()
    assert o5 == {"v": 3, "snap": 0}
    assert len(r2.partitions(o4, o5)) == 2
    # no further progress: offset stable
    assert r2.latestOffset() == o5
    assert r2.partitions(o5, r2.latestOffset()) == []


def test_max_files_per_trigger_rejects_nonpositive(spark, tmp_path):
    """maxFilesPerTrigger <= 0 raises at construction (Delta parity) —
    a 0 meaning 'unlimited' in the caller's head would otherwise coerce
    to an extreme 1-file-per-trigger throttle."""
    from pyspark.sql.types import StructType

    from clx_etl_spark.sources.table_source import TableStreamReader

    path = str(tmp_path / "t")
    append_version(spark.range(3).selectExpr("id").coalesce(1), path)
    for bad in ("0", "-1"):
        with pytest.raises(ValueError, match="must be positive"):
            TableStreamReader(StructType([]),
                              {"path": path, "maxfilespertrigger": bad})


def test_max_bytes_per_trigger_soft_cap(spark, tmp_path):
    """maxBytesPerTrigger (Delta's byte-granular soft cap): a tiny
    byte budget still takes at least one file per trigger, and the
    budget stops the cursor mid-version — driven at the offset level
    (byte caps never appear in offsets, so replays stay exact)."""
    from pyspark.sql.types import StructType

    from clx_etl_spark.sinks.versioned import table_schema
    from clx_etl_spark.sources.table_source import TableStreamReader

    path = str(tmp_path / "t")
    append_version(
        spark.range(10).selectExpr("id", "cast(id as double) as x")
        .coalesce(1), path)
    append_version(  # one commit, 3 files, each ~hundreds of bytes
        spark.range(100, 130).selectExpr(
            "id", "cast(id as double) as x").repartition(3), path)
    schema = StructType(table_schema(path).fields)
    r = TableStreamReader(
        schema, {"path": path, "maxbytespertrigger": "1"})
    r._cur_off = {"v": 0, "snap": 0}  # snapshot already consumed
    o1 = r.latestOffset()  # 1-byte budget: soft cap -> exactly 1 file
    assert o1 == {"v": 0, "snap": 0, "i": 1}
    assert len(r.partitions({"v": 0, "snap": 0}, o1)) == 1
    o2 = r.latestOffset()
    assert o2 == {"v": 0, "snap": 0, "i": 2}
    o3 = r.latestOffset()
    assert o3 == {"v": 1, "snap": 0}
    assert len(r.partitions(o2, o3)) == 1
    # a budget wider than one file takes several, then stops
    r2 = TableStreamReader(
        schema, {"path": path, "maxbytespertrigger": "1000000"})
    r2._cur_off = {"v": 0, "snap": 0}
    assert r2.latestOffset() == {"v": 1, "snap": 0}  # all 3 files fit


def test_ignore_deletes_crosses_dv_commits_only(spark, tmp_path):
    """Delta's ignoreDeletes: a merge-on-read DELETE (tombstones, no
    files) is crossable — already-delivered rows are not retracted and
    appends after it stream exactly once. Copy-on-write deletes
    REWRITE files and still refuse (that is ignoreChanges territory,
    Delta's same split)."""
    path, out, ck = (str(tmp_path / n) for n in ("t", "out", "ck"))
    append_version(
        spark.createDataFrame([(i, "x") for i in range(10)],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k"])
    _run(spark, path, out, ck, ignore_deletes=True)
    assert spark.read.parquet(out).count() == 10
    delete_version_dv(spark, path, "k", 0, 2)  # merge-on-read: crossable
    append_version(
        spark.createDataFrame([(100, "y")], "k long, s string")
        .coalesce(1), path)
    _run(spark, path, out, ck, ignore_deletes=True)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == list(range(10)) + [100]  # nothing retracted, +append
    delete_version(spark, path, "k", 3, 4)  # copy-on-write: rewrites
    with pytest.raises(Exception, match="ignoreChanges"):
        _run(spark, path, out, ck, ignore_deletes=True)


def test_starting_timestamp_streams_from_commit_time(spark, tmp_path):
    """Delta's startingTimestamp: stream commits AT OR AFTER the
    timestamp — INCLUSIVE at the boundary (no snapshot); a pre-history
    timestamp streams the whole history; combining with
    startingVersion refuses; a datetime string refuses (epoch ms
    only)."""
    import os

    from pyspark.sql.types import StructType

    from clx_etl_spark.sinks.versioned import (_manifest_path,
                                               table_schema)
    from clx_etl_spark.sources.table_source import TableStreamReader

    path = str(tmp_path / "t")
    for i in range(3):
        append_version(
            spark.createDataFrame([(i, "v")], "k long, s string")
            .coalesce(1), path)
    # pin deterministic manifest mtimes: v0=1000s, v1=2000s, v2=3000s
    for v, ts in enumerate((1000, 2000, 3000)):
        os.utime(_manifest_path(path, v), (ts, ts))
    schema = StructType(table_schema(path).fields)

    def starting(ts_ms):
        r = TableStreamReader(
            schema, {"path": path, "startingtimestamp": str(ts_ms)})
        return int(r._starting)

    assert starting(2_500_000) == 2   # after v1 -> start at v2
    assert starting(3_000_000) == 2   # AT v2 -> INCLUSIVE (Delta:
    #                                   "committed at or after")
    assert starting(3_500_000) == 3   # past head -> future commits only
    assert starting(500_000) == 0     # pre-history -> whole history
    with pytest.raises(ValueError, match="mutually exclusive"):
        TableStreamReader(schema, {"path": path,
                                   "startingversion": "1",
                                   "startingtimestamp": "1000"})
    # a Delta-style datetime string must refuse loudly, never silently
    # replay from version 0 (review r11)
    with pytest.raises(ValueError, match="epoch MILLISECONDS"):
        TableStreamReader(schema, {
            "path": path, "startingtimestamp": "2026-08-16 00:00:00"})
    # end-to-end: rows of v2 only
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        stream_table(spark, path, starting_timestamp_ms=2_500_000)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    assert [r.k for r in spark.read.parquet(out).collect()] == [2]


def test_cdf_starting_timestamp(spark, tmp_path):
    """startingTimestamp on the change-feed source resolves like the
    table stream's: commits strictly after the at-or-before version."""
    import os

    from pyspark.sql.types import StructType

    from clx_etl_spark.sinks.versioned import _manifest_path
    from clx_etl_spark.sources.cdf_source import CdfStreamReader

    path = str(tmp_path / "t")
    for i in range(3):
        append_version(
            spark.createDataFrame([(i, "v")], "k long, s string")
            .coalesce(1), path)
    for v, ts in enumerate((1000, 2000, 3000)):
        os.utime(_manifest_path(path, v), (ts, ts))
    schema = StructType.fromDDL(
        "k long, s string, _change_type string, _commit_version bigint")

    r = CdfStreamReader(schema, {"path": path,
                                 "startingtimestamp": "2500000"})
    assert r._starting == "2"
    assert CdfStreamReader(schema, {
        "path": path, "startingtimestamp": "1"})._starting == "0"
    with pytest.raises(ValueError, match="mutually exclusive"):
        CdfStreamReader(schema, {"path": path, "startingversion": "1",
                                 "startingtimestamp": "1000"})


def test_starting_timestamp_refuses_vacuumed_boundary(spark, tmp_path):
    """ADVICE r11 (low): a startingTimestamp landing on a surviving
    version whose PREDECESSOR manifest was expired used to silently
    advance past that version — streaming strictly fewer rows than
    requested with no error. A version's append set needs its
    predecessor's file list, so the boundary is unknowable: the
    resolver now fails LOUDLY (Delta's behavior for streaming from
    vacuumed history) and names the explicit startingVersion escape
    hatch; the explicit escape streams exactly the post-boundary
    commits."""
    import os

    from clx_etl_spark.sinks.versioned import (
        _manifest_path, expire_versions, starting_version_for_timestamp)

    path = str(tmp_path / "t")
    for i in range(5):
        append_version(
            spark.createDataFrame([(i, "v")], "k long, s string")
            .coalesce(1), path)
    for v in range(5):
        ts = 1000 * (v + 1)
        os.utime(_manifest_path(path, v), (ts, ts))
    expire_versions(path, keep_latest=3)  # v0, v1 manifests reclaimed
    assert not os.path.exists(_manifest_path(path, 1))
    # pre-history ts: earliest surviving is v2, but v2's append set
    # needs v1 (expired) -> loud refusal naming startingVersion=3
    with pytest.raises(ValueError, match="startingVersion=3"):
        starting_version_for_timestamp(path, 1)
    # a timestamp inside surviving history still resolves (v3's
    # predecessor v2 survives; utime is seconds, the resolver takes ms)
    assert starting_version_for_timestamp(path, 3_500_000) == 3
    # the named escape hatch streams exactly the post-boundary commits
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        stream_table(spark, path, starting_version=3)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append").trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    assert sorted(r.k for r in spark.read.parquet(out).collect()) == [3, 4]
    # empty table: a timestamp start waits for data instead of raising
    p2 = str(tmp_path / "empty")
    os.makedirs(os.path.join(p2, "_manifests"))
    assert starting_version_for_timestamp(p2, 123) == 0
