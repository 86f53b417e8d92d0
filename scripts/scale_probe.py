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
    print(json.dumps({"sfs": SFS, "times": results}))
    print(f"\n{'query':32s} {'sf.001':>8s} {'sf.01':>8s} {'sf.1':>8s} "
          f"{'r(10x)':>7s} {'r(100x)':>8s}")
    for name, t in results.items():
        r10 = t[2] / t[1] if t[1] else float("inf")
        r100 = t[2] / t[0] if t[0] else float("inf")
        print(f"{name:32s} {t[0]:8.2f} {t[1]:8.2f} {t[2]:8.2f} "
              f"{r10:7.2f} {r100:8.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
