#!/usr/bin/env python
"""Benchmark harness: runs the headline engine queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full execution, no
driver collect bottleneck). A warmup query absorbs JVM/session startup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from clx_etl_spark.queries import load_all
from clx_etl_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_revenue_delta",
    "a1_watermark",
    "a2_integrity_hourly",
    "a3_latest_per_key",
    "w1_gap_detect",
    "w3_gap_fill_plan",
    "w3_islands_sessionize",
    "j2_full_outer_merge",
    "k1_upsert_last_wins",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "sim_knn_bruteforce",
    "sim_knn_ivf",
    "text_quality_scores",
    "text_fingerprints",
    "asof_last_purchase",
    "range_join_attribution",
    "rollup_revenue",
    "w4_sliding_window_counts",
    "q18_group_having",
    "q19_disjunctive_pushdown",
    "dedup_clusters",
    "skew_salted_agg",
    "percentiles_by_group",
    "funnel_conversion",
    "cohort_retention",
    "mm_image_resize",
    "q8_market_share",
    "q9_revenue_by_nation_year",
    "q17_small_quantity_revenue",
    "resample_ohlcv_hourly",
    "q11_important_parts",
    "q12_late_lines_by_status",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q20_heavy_suppliers",
    "q21_last_shipper",
    # round-2 curation flagships (BASELINE.md documents the suite growth:
    # pre-growth rounds compare against the 43-query rows)
    "decontam_ngram_overlap",
    "span_dup_stats",
    "pack_training_sequences",
    "heavy_hitters_tokens",
    "w4_rank_variants",
    "training_mix",
    # round-4 continuation flagships (BASELINE.md documents the growth to
    # 57 queries; compare the 49-query subset against the older rows)
    "markov_transitions",
    "rolling_7d_distinct_users",
    "rrf_fusion",
    "token_pmi",
    "lm_kneser_ney_scores",
    "incremental_agg_merge",
    "doc_pagerank",
    "label_propagation_srp",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("clx-spark-bench")

    # Fail fast with a readable message if the driver regenerated the
    # testdata with a new events.ts encoding (the round-3 failure mode:
    # BENCH crashed mid-suite with zero timings). load_table adapts to
    # nanos-long and timestamp[us]; anything else should die HERE.
    from clx_etl_spark.catalog import load_table

    try:
        ev = load_table(spark, sf_dir, "events")
        types = dict(ev.dtypes)
        assert types.get("ts_ms") == "bigint", types
        assert types.get("event_time") == "timestamp", types
    except Exception as ex:
        print(
            f"FATAL: events testdata encoding canary failed at {sf_dir}: {ex}\n"
            "load_table must canonicalize events.ts to ts_ms:bigint + "
            "event_time:timestamp — see clx_etl_spark/catalog.py",
            file=sys.stderr,
        )
        raise

    # same fail-fast for the corpus tables the dedup/ANN/curation suite
    # reads: catch a documents/embeddings schema drift (the other half of
    # the testdata surface) before it crashes the suite mid-run
    try:
        dt = dict(load_table(spark, sf_dir, "documents").dtypes)
        for col, typ in (("doc_id", "bigint"), ("text", "string"),
                         ("lang", "string"), ("source", "string")):
            assert dt.get(col) == typ, (col, dt)
        et = dict(load_table(spark, sf_dir, "embeddings").dtypes)
        assert et.get("vec_id") == "bigint" and "array" in et.get("embedding", ""), et
        dim = load_table(spark, sf_dir, "embeddings").selectExpr(
            "size(embedding) AS d").head()[0]
        assert dim % 4 == 0, f"embedding dim {dim} not divisible by PQ m=4"
    except Exception as ex:
        print(
            f"FATAL: documents/embeddings testdata canary failed at {sf_dir}: {ex}",
            file=sys.stderr,
        )
        raise

    registry = load_all()

    # warmup: session + parquet footer caches (JVM) and the Python worker
    # pool (first pandas-UDF query otherwise pays ~4s of process forks)
    registry["q6_revenue_delta"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    registry["mm_media_metadata"].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # per-query isolation: one failing query must NOT zero out the whole
    # suite's timings (the round-3 failure mode — bench died at its 5th
    # query with rc=1 and no data). Failures are reported in `errors`,
    # excluded from the wall-time sum, and flip the exit code at the end
    # so automation still notices.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        q = registry[name]
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # noqa: BLE001 - isolate, report, continue
            errors[name] = f"{type(ex).__name__}: {ex}"[:300]
            print(f"bench query {name} FAILED: {errors[name]}", file=sys.stderr)
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_wall_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    # STEAL-ANCHOR NORMALIZATION (VERDICT r10 item 1): q1 is frozen
    # since round 1 and holds 2.3-2.7s on a quiet machine at sf0.1 —
    # co-tenant CPU steal inflates it with the rest of the suite while
    # being invisible to loadavg/vmstat. Recording each query's ratio
    # to the SAME run's q1 makes a code regression distinguishable
    # from ambient weather without prose: a real regression moves one
    # query's ratio while steal moves raw seconds uniformly. BASELINE.md
    # carries the per-query quiet-median ratios to diff against.
    anchor = timings.get("q1_pricing_summary")
    if anchor:
        out["anchor"] = {
            "query": "q1_pricing_summary",
            "sec": anchor,
            # the all-round quiet band at sf0.1 (BASELINE.md history);
            # steal_factor ~1.0 = quiet sample, >1.3 = discard weather
            "quiet_band": [2.3, 2.7],
            "steal_factor": round(anchor / 2.5, 3),
        }
        out["anchor_ratios"] = {
            n: round(t / anchor, 3) for n, t in timings.items()
        }
        out["anchor_normalized_total"] = round(total / anchor, 2)
    if errors:
        out["errors"] = errors
    # Robustness vs the driver's bounded tail capture (VERDICT r12 item
    # 7: the ~4 KB one-line JSON was truncated out of the r11 record,
    # which broke that round's speedup computation). ADDITIONS ONLY:
    # persist the parsed dict beside the bench before printing, and keep
    # the contract line exactly as-is, printed last.
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_out.json"), "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass  # read-only checkout: the stdout contract line still rules
    print(json.dumps(out))
    spark.stop()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
