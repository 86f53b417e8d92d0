#!/usr/bin/env python
"""Scaling probe: run representative queries at sf0.001 / sf0.01 / sf0.1
(100x data range) and report wall-time growth vs data growth — the
empirical check behind the per-query "scales" claims (PLANS.md shows the
shapes; this shows the slopes). Run from the repo root:

    python scripts/scale_probe.py

At local scale most queries are dominated by fixed scheduling overhead,
so time ratios FAR below the 10x data ratios are expected — the signal
to watch is any query whose step ratio exceeds the data ratio
(super-linear => a shape problem the plan audit missed).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clx_etl_spark.queries import load_all
from clx_etl_spark.session import get_spark

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

# one representative per shape family: scan-agg, window, join, distinct,
# sessionize, grid, inverted-index, LSH dedup, vector, iterative graph —
# plus the round-4 shape families VERDICT r04 asked onto the probe:
# positional k-gram dedup (the most quadratic-capable), CDC fold,
# span masking, and the versioned data-skipping scan.
PROBES = [
    "q1_pricing_summary",
    "w4_moving_frame",
    "q3_shipping_priority",
    "rolling_7d_distinct_users",
    "w3_islands_sessionize",
    "densify_hourly_grid",
    "bm25_doc_scores",
    "dedup_minhash_lsh",
    "sim_knn_ivf",
    "doc_pagerank",
    "substring_run_dedup",
    "cdc_current_state",
    "span_corruption_masking",
]


def _probe_scan_version(spark, sf: str) -> None:
    """Non-registry probe: versioned-table commit + data-skipping scan.
    Commits the events table (stats on ts_ms) into a temp versioned
    layout, then runs a narrow scan_version — the manifest-pruned read
    path (sinks/versioned.py)."""
    import shutil
    import tempfile

    from clx_etl_spark.catalog import load_table
    from clx_etl_spark.sinks.versioned import overwrite_version, scan_version

    ev = load_table(spark, sf, "events").select("event_id", "user_id", "ts_ms")
    lo = ev.agg({"ts_ms": "min"}).head()[0]
    path = tempfile.mkdtemp(prefix="probe_vt_")
    try:
        overwrite_version(ev.repartition(8), path, stats_cols=["ts_ms"])
        scan_version(
            spark, path, "ts_ms", lo, lo + 86_400_000
        ).write.format("noop").mode("overwrite").save()
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _probe_merge_delete(spark, sf: str) -> dict:
    """Non-registry probe: lakehouse MERGE and range-DELETE file-pruning
    effectiveness (VERDICT r05 item 7). Seeds a versioned table from
    events in 8 key-range files (manifest stats on event_id), then runs
    (a) a narrow MERGE whose batch touches keys at BOTH extremes of the
    domain — the per-file-membership case a global-interval prune would
    rewrite wholesale — and (b) a narrow range DELETE. Reports wall
    times AND the untouched-file ratios, so pruning is measured, not
    asserted. A third leg runs the same-width delete MERGE-ON-READ
    (delete_version_dv): zero files rewritten by construction, so the
    measured signal is the sidecar-bytes-to-table-bytes ratio — the
    write amplification a deletion vector buys down."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from clx_etl_spark.catalog import load_table
    from clx_etl_spark.sinks.versioned import (_dv_root, _read_manifest,
                                               append_version,
                                               delete_version,
                                               delete_version_dv,
                                               latest_version, merge_version)

    ev = load_table(spark, sf, "events").select("event_id", "user_id", "value")
    row = ev.agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi")).head()
    lo, hi = row["lo"], row["hi"]
    path = tempfile.mkdtemp(prefix="probe_md_") + "/t"
    try:
        step = (hi - lo) // 8 + 1
        for i in range(8):
            sl = ev.filter(
                (F.col("event_id") >= lo + i * step)
                & (F.col("event_id") < lo + (i + 1) * step)
            )
            append_version(sl.coalesce(1), path, stats_cols=["event_id"])
        before = set(_read_manifest(path, latest_version(path))["files"])
        batch = ev.filter(
            (F.col("event_id") <= lo + 5) | (F.col("event_id") >= hi - 5)
        ).withColumn("value", F.col("value") + 1.0)
        t0 = time.perf_counter()
        v = merge_version(batch, path, keys=["event_id"])
        merge_s = round(time.perf_counter() - t0, 3)
        kept = len(set(_read_manifest(path, v)["files"]) & before)
        t0 = time.perf_counter()
        _, unt, rew = delete_version(
            spark, path, "event_id", lo + step, lo + step + step // 4
        )
        delete_s = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        delete_version_dv(
            spark, path, "event_id",
            lo + 2 * step, lo + 2 * step + step // 4,
        )
        dv_delete_s = round(time.perf_counter() - t0, 3)
        dv_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(_dv_root(path)) for f in fs
        )
        table_bytes = sum(
            os.path.getsize(f)
            for f in _read_manifest(path, latest_version(path))["files"]
        )
        return {
            "merge_s": merge_s,
            "delete_s": delete_s,
            "dv_delete_s": dv_delete_s,
            "merge_untouched_ratio": round(kept / len(before), 3),
            "delete_untouched_ratio": round(unt / (unt + rew), 3),
            "dv_bytes_ratio": round(dv_bytes / table_bytes, 5),
        }
    finally:
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def _probe_ivm_refresh(spark, sf: str) -> float:
    """Non-registry probe: CDF-driven rollup refresh cost. Seeds a
    versioned fact table from events (8 key-range appends) and a rollup
    from its full change feed (setup, untimed), then times ONE
    maintenance cycle: a narrow change_feed MERGE (~1k keys) + folding
    that window into the rollup. The claim under test is O(changes +
    touched groups) per refresh — the timed cycle should stay flat
    across the 100x data range (history is never rescanned)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from clx_etl_spark.catalog import load_table
    from clx_etl_spark.operators.incremental import refresh_from_change_feed
    from clx_etl_spark.sinks.versioned import (append_version,
                                               latest_version, merge_version,
                                               table_changes)

    ev = load_table(spark, sf, "events").select(
        "event_id", "ts_ms", "event_type", "value"
    )
    row = ev.agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi")).head()
    lo, hi = row["lo"], row["hi"]
    base = tempfile.mkdtemp(prefix="probe_ivm_")
    facts, rollup = base + "/facts", base + "/rollup"
    try:
        step = (hi - lo) // 8 + 1
        for i in range(8):
            sl = ev.filter(
                (F.col("event_id") >= lo + i * step)
                & (F.col("event_id") < lo + (i + 1) * step)
            )
            append_version(sl.coalesce(1), facts, stats_cols=["event_id"])
        refresh_from_change_feed(
            spark, table_changes(spark, facts, -1), rollup,
            txn=("probe", latest_version(facts)),
        )
        batch = ev.filter(F.col("event_id") <= lo + 1000).withColumn(
            "value", F.col("value") + 1.0
        ).localCheckpoint(eager=True)
        v_before = latest_version(facts)
        t0 = time.perf_counter()
        merge_version(batch, facts, keys=["event_id"], change_feed=True)
        refresh_from_change_feed(
            spark, table_changes(spark, facts, v_before), rollup,
            txn=("probe", latest_version(facts)),
        )
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _probe_clone(spark, sf: str) -> float:
    """Non-registry probe: shallow CLONE is metadata-only, so its cost
    must stay FLAT across the 100x data range (O(manifest), never
    O(data)). Seeds a versioned table from events in 8 key-range files
    (setup, untimed), then times clone_table + reading the clone's
    manifest head — the whole create-a-dev-copy-of-the-lake operation."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from clx_etl_spark.catalog import load_table
    from clx_etl_spark.sinks.versioned import (append_version, clone_table,
                                               latest_version)

    ev = load_table(spark, sf, "events").select("event_id", "user_id", "value")
    row = ev.agg(F.min("event_id").alias("lo"), F.max("event_id").alias("hi")).head()
    lo, hi = row["lo"], row["hi"]
    base = tempfile.mkdtemp(prefix="probe_cl_")
    src, dst = base + "/src", base + "/clone"
    try:
        step = (hi - lo) // 8 + 1
        for i in range(8):
            sl = ev.filter(
                (F.col("event_id") >= lo + i * step)
                & (F.col("event_id") < lo + (i + 1) * step)
            )
            append_version(sl.coalesce(1), src, stats_cols=["event_id"])
        t0 = time.perf_counter()
        clone_table(src, dst)
        assert latest_version(dst) == 0
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _probe_manifest_planning() -> dict:
    """Manifest-planning scale: commit synthetic manifests of N files
    (each with id [min,max] stats + a 2-KiB key bloom), once inline-JSON
    and once with the columnar stats sidecar, then time the pure
    planning step (pruned_file_count on a range predicate — cold
    manifest read each rep). The data files never exist: planning must
    never open them. The sidecar path should stay near-flat in file
    count (it reads only the predicate column's stat rows and skips the
    bloom payload); the inline path re-parses every bloom byte as JSON."""
    import shutil
    import tempfile

    import clx_etl_spark.sinks.versioned as V

    out: dict = {}
    m_bits = 1 << 14
    for n_files in (100, 1000, 5000):
        files, stats = [], {}
        for i in range(n_files):
            f = f"/nonexistent/data/f{i:06d}.parquet"
            files.append(f)
            lo, hi = i * 100, i * 100 + 99
            stats[f] = {
                "id": [lo, hi],
                V._BLOOM_KEY + "id": {
                    "m": m_bits,
                    "b": V._bloom_build(range(lo, hi + 1, 7), m_bits),
                },
            }
        for mode, thresh in (("inline", 1 << 30), ("sidecar", 0)):
            d = tempfile.mkdtemp()
            old = V._STATS_SIDECAR_MIN_FILES
            V._STATS_SIDECAR_MIN_FILES = thresh
            try:
                V._commit(d, 0, files, "overwrite", stats)
            finally:
                V._STATS_SIDECAR_MIN_FILES = old
            reps, t0 = 5, time.perf_counter()
            for _ in range(reps):
                kept, total = V.pruned_file_count(d, "id", 12_345, 17_345)
            out[f"plan_{mode}_{n_files}"] = round(
                (time.perf_counter() - t0) / reps, 4)
            assert kept == 51 and total == n_files or n_files == 100
            shutil.rmtree(d)
    return out


def _probe_commit_driver_flat(spark) -> dict:
    """The r08 write-path claim: with per-file stats/blooms derived by
    the WRITE TASKS (rows already in hand, KB bitmaps shipped in the
    commit messages), the driver-side commit does O(files) metadata
    work — flat in committed ROWS. Fixed 8 files, rows/file stepped
    100x; `dsv2_driver_commit_*` should stay ~constant (ms) while
    `dsv2_total_*` grows with the data as any write must. The engine
    path's equivalent (distributed _derive_stats vs the old driver
    _file_stats) is timed head-to-head at the largest size."""
    import shutil
    import tempfile

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sources.table_source import write_table_source

    out: dict = {}
    for rows in (2_500, 25_000, 250_000):
        d = tempfile.mkdtemp()
        t = d + "/t"
        df = (
            spark.range(rows)
            .selectExpr("id", "cast(id as string) as k",
                        "cast(id as double) as x")
            .repartition(8)
        )
        t0 = time.perf_counter()
        write_table_source(df, t, stats_cols=["id"], bloom_cols=["id", "k"])
        out[f"dsv2_total_{rows}"] = round(time.perf_counter() - t0, 3)
        with open(os.path.join(t, "_manifests",
                               "_last_commit_metrics.json")) as fh:
            mx = json.load(fh)
        assert mx["stats_source"] == "tasks", mx
        out[f"dsv2_driver_commit_{rows}"] = round(
            mx["driver_commit_secs"], 4)
        if rows == 250_000:
            files = V._read_manifest(t, 0)["files"]
            t0 = time.perf_counter()
            drv = V._file_stats(files, ["id"], ["id", "k"])
            out["bloom_derive_driver_s"] = round(
                time.perf_counter() - t0, 3)
            t0 = time.perf_counter()
            dist = V._derive_stats(spark, files, ["id"], ["id", "k"])
            out["bloom_derive_distributed_s"] = round(
                time.perf_counter() - t0, 3)
            assert drv == dist  # byte-identical bitmaps either path
        shutil.rmtree(d)
    return out


def _probe_dv_manifest_size() -> dict:
    """The r08 dv-map scale-out claim: manifest JSON bytes under K
    dv-bearing files (fixed 5000-file snapshot). Inline-forced grows
    O(K); at the DEFAULT threshold the map spills to the parquet
    sidecar past ~200 dv-bearing files and the JSON stays near-flat
    (the remaining growth is the file list itself, which every
    manifest carries)."""
    import shutil
    import tempfile

    import clx_etl_spark.sinks.versioned as V

    out: dict = {}
    files = [f"/nonexistent/data/f{i:06d}.parquet" for i in range(5000)]
    for k in (100, 1000, 5000):
        dv = {
            f: [{"d": f"/nonexistent/_dv/v1-{i:06d}", "n": 17}]
            for i, f in enumerate(files[:k])
        }
        for mode, thresh in (("inline", 1 << 30), ("default", 200)):
            d = tempfile.mkdtemp()
            old = V._STATS_SIDECAR_MIN_FILES
            V._STATS_SIDECAR_MIN_FILES = thresh
            try:
                V._commit(d, 0, files, "delete-dv", {}, dv=dv)
            finally:
                V._STATS_SIDECAR_MIN_FILES = old
            out[f"dv_manifest_{mode}_{k}"] = os.path.getsize(
                V._manifest_path(d, 0))
            shutil.rmtree(d)
    return out


def _probe_append_metadata_flat(spark) -> dict:
    """The r09 incremental-metadata claim: an append's COMMIT metadata
    work is O(batch), not O(table). Seeds tables of 100 / 2,000 /
    10,000 synthetic stats+bloom-bearing files (the data files never
    exist — only metadata is exercised), then runs 20 real one-file
    appends against each and reports the MEDIAN _commit wall time and
    MEDIAN new-sidecar bytes written per append. Pre-r09 every append
    re-serialized the full per-file stats map (bloom payloads included)
    — O(table) bytes per commit; now a delta segment is KB whatever the
    table size, with one O(table) coalesce every _STATS_SEGMENT_MAX
    carries (the Delta-checkpoint cadence — reported separately as the
    max)."""
    import shutil
    import statistics
    import tempfile

    import clx_etl_spark.sinks.versioned as V

    out: dict = {}
    m_bits = 1 << 14
    for n_files in (100, 2_000, 10_000):
        files, stats = [], {}
        for i in range(n_files):
            f = f"/nonexistent/data/f{i:06d}.parquet"
            files.append(f)
            lo, hi = i * 100, i * 100 + 99
            stats[f] = {
                "id": [lo, hi],
                "__rows__": [100, 100],
                V._BLOOM_KEY + "id": {
                    "m": m_bits,
                    "b": V._bloom_build(range(lo, hi + 1, 7), m_bits),
                },
            }
        d = tempfile.mkdtemp() + "/t"
        V._commit(d, 0, files, "overwrite", stats)
        mdir = os.path.join(d, "_manifests")
        orig = V._commit
        commit_s: list[float] = []

        def timed(*a, **kw):
            t0 = time.perf_counter()
            r = orig(*a, **kw)
            commit_s.append(time.perf_counter() - t0)
            return r

        V._commit = timed
        seg_bytes: list[int] = []
        try:
            df = spark.createDataFrame(
                [(10**9, "x")], "id long, v string").coalesce(1)
            df = df.localCheckpoint(eager=True)
            for k in range(20):
                before = set(os.listdir(mdir))
                V.append_version(df, d, stats_cols=["id"],
                                 bloom_cols=["id"])
                seg_bytes.append(sum(
                    os.path.getsize(os.path.join(mdir, e))
                    for e in set(os.listdir(mdir)) - before
                    if e.endswith(".parquet")
                ))
        finally:
            V._commit = orig
        out[f"append_commit_s_{n_files}"] = round(
            statistics.median(commit_s), 4)
        out[f"append_meta_bytes_{n_files}"] = int(
            statistics.median(seg_bytes))
        out[f"append_meta_bytes_max_{n_files}"] = max(seg_bytes)  # coalesce
        shutil.rmtree(os.path.dirname(d), ignore_errors=True)
    return out


def _probe_rename_drop_flat() -> dict:
    """The r10 column-mapping claim: RENAME/DROP COLUMN is metadata-only
    — driver wall time stays O(manifest) with ZERO data IO whatever the
    table size. Tables of 100 / 2,000 / 10,000 synthetic stats-bearing
    files whose data files never exist (any read would crash loudly);
    10 chained renames + one drop each; medians reported. The residual
    growth is the manifest's file-list JSON itself — the same flatness
    class as the append-commit leg."""
    import shutil
    import statistics
    import tempfile

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    import clx_etl_spark.sinks.versioned as V

    out: dict = {}
    schema = StructType([
        StructField("id", LongType(), True),
        StructField("v", StringType(), True),
    ]).json()
    for n_files in (100, 2_000, 10_000):
        files = [f"/nonexistent/data/f{i:06d}.parquet"
                 for i in range(n_files)]
        stats = {
            f: {"id": [i * 100, i * 100 + 99], "__rows__": [100, 100]}
            for i, f in enumerate(files)
        }
        d = tempfile.mkdtemp() + "/t"
        V._commit(d, 0, files, "overwrite", stats, schema=schema)
        ts: list[float] = []
        name = "id"
        for k in range(10):
            new = f"id{k}"
            t0 = time.perf_counter()
            V.rename_column(d, name, new)
            ts.append(time.perf_counter() - t0)
            name = new
        t0 = time.perf_counter()
        V.drop_columns(d, ["v"])
        drop_s = time.perf_counter() - t0
        out[f"rename_s_{n_files}"] = round(statistics.median(ts), 4)
        out[f"drop_s_{n_files}"] = round(drop_s, 4)
        shutil.rmtree(os.path.dirname(d), ignore_errors=True)
    return out


def _probe_dv_reorg(spark) -> dict:
    """The r09 reorg_dvs claim: k narrow dv deletes leave k sidecar
    dirs unioned by every read; one metadata-only reorg folds them to 1
    and the dv-applied read gets cheaper, rows identical."""
    import shutil
    import tempfile

    import clx_etl_spark.sinks.versioned as V

    d = tempfile.mkdtemp() + "/t"
    out: dict = {}
    try:
        V.append_version(
            spark.range(200_000).selectExpr(
                "id", "cast(id as double) as x").repartition(8),
            d, stats_cols=["id"], bloom_cols=["id"])
        for k in range(20):
            V.delete_version_dv(spark, d, "id", k * 1000, k * 1000 + 50)
        out["dv_dirs_before"] = V.describe_table(d)["dv_dirs"]
        t0 = time.perf_counter()
        n_before = V.read_version(spark, d).count()
        out["read_s_before"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        V.reorg_dvs(spark, d)
        out["reorg_s"] = round(time.perf_counter() - t0, 3)
        out["dv_dirs_after"] = V.describe_table(d)["dv_dirs"]
        t0 = time.perf_counter()
        n_after = V.read_version(spark, d).count()
        out["read_s_after"] = round(time.perf_counter() - t0, 3)
        assert n_before == n_after == 200_000 - 20 * 51
    finally:
        shutil.rmtree(os.path.dirname(d), ignore_errors=True)
    return out


def _probe_ann_compaction(spark) -> dict:
    """The r11 compact_ann_index claim: after many CDC syncs the index
    carries one dead generation per churned id per sync; probe cost
    must track LIVE vectors, not sync history. Bloat an index with 8
    churn rounds, measure a probe, compact, re-measure — results
    identical, post-compaction rows == live rows."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from clx_etl_spark.operators.ann_index import (append_to_ann_index,
                                                   build_ann_index,
                                                   compact_ann_index,
                                                   query_ann_index,
                                                   tombstone_ann_index)

    d = tempfile.mkdtemp()
    idx = d + "/ann"
    out: dict = {}
    try:
        emb = spark.read.parquet(
            "/root/testdata/sf0.01/embeddings.parquet"
        ).select("vec_id", "embedding")
        n_live = emb.count()
        build_ann_index(emb, idx, nlist=16, m=4, k_codes=16)
        # 8 churn rounds: 20% of ids re-encoded per round, old
        # generation tombstoned — the steady-state synced-index diet
        churn = emb.filter(F.col("vec_id") % 5 == 0)
        for r in range(1, 9):
            tombstone_ann_index(spark, idx, churn.select("vec_id"), r)
            append_to_ann_index(churn, idx, epoch=r)
        out["rows_bloated"] = spark.read.parquet(f"{idx}/index").count()
        q = emb.limit(8)
        t0 = time.perf_counter()
        before = sorted(
            (r.query_id, r.neighbor_id)
            for r in query_ann_index(spark, idx, q, k=5, nprobe=4).collect())
        out["probe_s_bloated"] = round(time.perf_counter() - t0, 3)
        res = compact_ann_index(spark, idx)
        out["compact_s"] = res  # kept/dropped
        out["rows_compacted"] = spark.read.parquet(f"{idx}/index").count()
        t0 = time.perf_counter()
        after = sorted(
            (r.query_id, r.neighbor_id)
            for r in query_ann_index(spark, idx, q, k=5, nprobe=4).collect())
        out["probe_s_compacted"] = round(time.perf_counter() - t0, 3)
        assert after == before
        assert out["rows_compacted"] == n_live == res["kept"]
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def _probe_optimize_rebase(spark) -> dict:
    """The r8/r11 OPTIMIZE-vs-append claim: a compaction losing its
    manifest CAS to interleaved appends rebases at manifest cost — no
    staged-file re-rewrite, appended rows carried by reference. Time a
    clean compaction vs one that loses the CAS to 3 appends."""
    import shutil
    import tempfile

    import clx_etl_spark.sinks.versioned as V

    d = tempfile.mkdtemp()
    out: dict = {}
    try:
        def seed(p):
            for lo in range(0, 60_000, 10_000):
                V.append_version(
                    spark.range(lo, lo + 10_000).selectExpr(
                        "id", "cast(id as double) as x").coalesce(1),
                    p, stats_cols=["id"])

        p1 = d + "/clean"
        seed(p1)
        t0 = time.perf_counter()
        V.compact_version(spark, p1, target_bytes=1 << 30)
        out["compact_clean_s"] = round(time.perf_counter() - t0, 3)
        p2 = d + "/raced"
        seed(p2)
        orig, wf_orig = V._commit, V._write_files
        state = {"left": 3, "wf": 0}

        def racing(path_, version, files_, op, *a, **kw):
            if op == "overwrite" and state["left"]:
                state["left"] -= 1
                V._commit = orig  # appends inside commit cleanly
                try:
                    V.append_version(
                        spark.range(100_000 + state["left"], 100_001
                                    + state["left"]).selectExpr(
                            "id", "cast(id as double) as x"),
                        path_, stats_cols=["id"])
                finally:
                    V._commit = racing
            return orig(path_, version, files_, op, *a, **kw)

        def counting_wf(*a, **kw):
            state["wf"] += 1
            return wf_orig(*a, **kw)

        V._commit, V._write_files = racing, counting_wf
        try:
            t0 = time.perf_counter()
            v = V.compact_version(spark, p2, target_bytes=1 << 30)
            out["compact_raced3_s"] = round(time.perf_counter() - t0, 3)
        finally:
            V._commit, V._write_files = orig, wf_orig
        # 1 compaction rewrite + 3 append writes — zero re-rewrites
        out["write_files_calls"] = state["wf"]
        assert state["wf"] == 4
        assert V.read_version(spark, p2, v).count() == 60_003
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def _probe_mapped_write_overhead(spark) -> dict:
    """The r11 columnMapping-writer claim: writing through the DSv2
    door to a MAPPED table (renamed + dropped columns) costs the same
    as to an unmapped one — the logical->physical translation is one
    Arrow schema-metadata swap per batch plus a KB-sized plan dict on
    the driver, never per-row work. Same data, same file count, both
    doors; overhead ratio should sit at ~1.0 (asserted < 1.5 to stay
    VM-noise-proof), and the driver commit stays flat in rows."""
    import shutil
    import tempfile

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sources.table_source import write_table_source

    out: dict = {}
    d = tempfile.mkdtemp()
    try:
        for rows in (25_000, 250_000):
            df = (
                spark.range(rows)
                .selectExpr("id", "cast(id as string) as k",
                            "cast(id as double) as x")
                .repartition(8)
            )
            plain = d + f"/plain{rows}"
            t0 = time.perf_counter()
            write_table_source(df, plain, stats_cols=["id"])
            out[f"plain_write_{rows}_s"] = round(
                time.perf_counter() - t0, 3)
            mapped = d + f"/mapped{rows}"
            # active mapping: id renamed, plus a dropped column so the
            # commit path exercises the full colmap (m + x + xl)
            V.append_version(
                spark.range(1).selectExpr(
                    "id", "cast(id as string) as k",
                    "cast(id as double) as x",
                    "cast(id as double) as gone").coalesce(1),
                mapped, stats_cols=["id"])
            V.rename_column(mapped, "id", "event_id")
            V.drop_columns(mapped, ["gone"])
            mdf = df.withColumnRenamed("id", "event_id")
            t0 = time.perf_counter()
            write_table_source(mdf, mapped, stats_cols=["event_id"])
            out[f"mapped_write_{rows}_s"] = round(
                time.perf_counter() - t0, 3)
            with open(os.path.join(mapped, "_manifests",
                                   "_last_commit_metrics.json")) as fh:
                mx = json.load(fh)
            assert mx["stats_source"] == "tasks", mx
            out[f"mapped_driver_commit_{rows}"] = round(
                mx["driver_commit_secs"], 4)
            # physical layout + pruning stayed intact under the rename
            kept, total = V.pruned_file_count(mapped, "event_id", 0, 0)
            assert kept < total
            n = V.read_version(spark, mapped).count()
            assert n == rows + 1, n
        ratio = (out["mapped_write_250000_s"]
                 / out["plain_write_250000_s"])
        out["overhead_ratio_250k"] = round(ratio, 3)
        assert ratio < 1.5, out
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return out


def main() -> None:
    spark = get_spark("clx-scale-probe")
    reg = load_all()
    # warm the JVM + python workers on the smallest SF
    reg[PROBES[0]].fn(spark, SFS[0]).write.format("noop").mode("overwrite").save()
    results: dict[str, list[float]] = {}
    for name in PROBES:
        times = []
        for sf in SFS:
            t0 = time.perf_counter()
            reg[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        results[name] = times
    times = []
    for sf in SFS:
        t0 = time.perf_counter()
        _probe_scan_version(spark, sf)
        times.append(round(time.perf_counter() - t0, 3))
    results["versioned_scan_version"] = times
    md = [_probe_merge_delete(spark, sf) for sf in SFS]
    results["versioned_merge_narrow"] = [r["merge_s"] for r in md]
    results["versioned_delete_range"] = [r["delete_s"] for r in md]
    results["versioned_delete_dv"] = [r["dv_delete_s"] for r in md]
    results["ivm_refresh_cycle"] = [_probe_ivm_refresh(spark, sf)
                                    for sf in SFS]
    results["versioned_clone_shallow"] = [_probe_clone(spark, sf)
                                          for sf in SFS]
    ratios = {
        "merge_untouched_ratio": [r["merge_untouched_ratio"] for r in md],
        "delete_untouched_ratio": [r["delete_untouched_ratio"] for r in md],
        "dv_bytes_ratio": [r["dv_bytes_ratio"] for r in md],
    }
    planning = _probe_manifest_planning()
    commit_flat = _probe_commit_driver_flat(spark)
    dv_size = _probe_dv_manifest_size()
    meta_flat = _probe_append_metadata_flat(spark)
    dv_reorg = _probe_dv_reorg(spark)
    rename_flat = _probe_rename_drop_flat()
    ann_compact = _probe_ann_compaction(spark)
    optimize_rebase = _probe_optimize_rebase(spark)
    mapped_write = _probe_mapped_write_overhead(spark)
    print(json.dumps({"sfs": SFS, "times": results, "pruning": ratios,
                      "manifest_planning_s": planning,
                      "commit_driver_flat": commit_flat,
                      "dv_manifest_bytes": dv_size,
                      "append_metadata_flat": meta_flat,
                      "dv_reorg": dv_reorg,
                      "rename_drop_flat": rename_flat,
                      "ann_compaction": ann_compact,
                      "optimize_rebase": optimize_rebase,
                      "mapped_write_overhead": mapped_write}))
    print(f"\n{'query':32s} {'sf.001':>8s} {'sf.01':>8s} {'sf.1':>8s} "
          f"{'r(10x)':>7s} {'r(100x)':>8s}")
    for name, t in results.items():
        r10 = t[2] / t[1] if t[1] else float("inf")
        r100 = t[2] / t[0] if t[0] else float("inf")
        print(f"{name:32s} {t[0]:8.2f} {t[1]:8.2f} {t[2]:8.2f} "
              f"{r10:7.2f} {r100:8.2f}")
    for k, v in ratios.items():
        print(f"{k:32s} {v[0]:8.2f} {v[1]:8.2f} {v[2]:8.2f}")
    print("\nmanifest planning (s/plan, 100/1000/5000 synthetic files):")
    for mode in ("inline", "sidecar"):
        row = [planning[f"plan_{mode}_{n}"] for n in (100, 1000, 5000)]
        print(f"{mode:32s} {row[0]:8.4f} {row[1]:8.4f} {row[2]:8.4f}")
    print("\ndsv2 commit (driver secs, 2.5k/25k/250k rows x 8 files):")
    row = [commit_flat[f"dsv2_driver_commit_{n}"]
           for n in (2_500, 25_000, 250_000)]
    print(f"{'driver_commit':32s} {row[0]:8.4f} {row[1]:8.4f} {row[2]:8.4f}")
    print("\ndv manifest bytes (100/1000/5000 dv-bearing of 5000 files):")
    for mode in ("inline", "default"):
        row = [dv_size[f"dv_manifest_{mode}_{k}"] for k in (100, 1000, 5000)]
        print(f"{mode:32s} {row[0]:8d} {row[1]:8d} {row[2]:8d}")
    print("\nappend metadata (median commit s / median seg bytes / "
          "max=coalesce, 100/2000/10000-file tables):")
    for n in (100, 2_000, 10_000):
        print(f"{n:>6d} files  "
              f"{meta_flat[f'append_commit_s_{n}']:8.4f}s  "
              f"{meta_flat[f'append_meta_bytes_{n}']:>10d}B  "
              f"max {meta_flat[f'append_meta_bytes_max_{n}']:>10d}B")
    print(f"\ndv reorg: dirs {dv_reorg['dv_dirs_before']} -> "
          f"{dv_reorg['dv_dirs_after']}, read "
          f"{dv_reorg['read_s_before']:.2f}s -> "
          f"{dv_reorg['read_s_after']:.2f}s, reorg "
          f"{dv_reorg['reorg_s']:.2f}s")
    print("\nrename/drop (median s, 100/2000/10000-file tables — "
          "metadata-only, zero data IO):")
    for n in (100, 2_000, 10_000):
        print(f"{n:>6d} files  rename "
              f"{rename_flat[f'rename_s_{n}']:8.4f}s  drop "
              f"{rename_flat[f'drop_s_{n}']:8.4f}s")
    spark.stop()


if __name__ == "__main__":
    main()
