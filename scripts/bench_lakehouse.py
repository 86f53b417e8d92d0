#!/usr/bin/env python
"""Lakehouse benchmark: the versioned-table hot path, benched
round-over-round SEPARATELY from the frozen 57-query headline suite
(which predates the lakehouse layer and never touches it). FROZEN
5-query list per VERDICT r06 item 8 — do not grow it; new lakehouse
queries get their own one-off measurements in BASELINE.md.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": "lakehouse_bench_total", "value": total_sec, "unit": "sec",
 "queries": {...}, "sf": ...}

Each query is a full storage round-trip (seed a versioned table in a
tempdir, commit merges/deletes/dv ops, read back through the engine or
the clx_table DSv2 source), so the timings cover write amplification +
manifest planning + read paths together, not just query compute.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clx_etl_spark.queries import load_all
from clx_etl_spark.session import get_spark

LAKEHOUSE = [
    "versioned_merge_replay",
    "versioned_dv_merge_replay",
    "versioned_point_lookup",
    "versioned_sql_scan",
    "ivm_rollup_from_cdf",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("clx-spark-bench-lakehouse")
    registry = load_all()
    # warmup: session + parquet caches + one versioned commit cycle
    registry["versioned_point_lookup"].fn(spark, sf_dir).write.format(
        "noop").mode("overwrite").save()
    timings: dict[str, float] = {}
    for name in LAKEHOUSE:
        t0 = time.perf_counter()
        registry[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    print(json.dumps({
        "metric": "lakehouse_bench_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
