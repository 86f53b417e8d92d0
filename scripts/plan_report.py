#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for the flagship queries.

Evidence artifact for plan-quality review (pushdown, broadcast, shuffle
structure) — the enforced invariants live in tests/test_plans.py; this file
is the human-readable snapshot. Run from the repo root:

    python scripts/plan_report.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clx_etl_spark.queries import load_all
from clx_etl_spark.session import get_spark

FLAGSHIPS = [
    "q5_region_revenue",       # snowflake broadcast joins
    "q1_pricing_summary",      # single-shuffle decimal agg
    "w3_gap_fill_plan",        # lag windows + islands merge
    "asof_last_purchase",      # union + carry-forward window (no join)
    "range_join_attribution",  # binned equi-join, residual predicate
    "dedup_minhash_lsh",       # LSH band bucketing
    "skew_salted_agg",         # two-phase salted aggregation
    "topk_per_group",          # WindowGroupLimit pushdown
    "q21_last_shipper",        # EXISTS + NOT EXISTS -> semi + anti join
    "q13_order_count_distribution",  # outer-join count histogram, 2-level agg
    "corpus_curation",         # one-scan curation gate, single digest window
    "sim_srp_near_dup",        # banded SRP-LSH, id-only candidates
    "decontam_ngram_overlap",  # broadcast benchmark grams, no corpus shuffle
    "cap_per_source",          # WindowGroupLimit per-domain quota
    "pack_training_sequences", # shard-partitioned window, no join
    "span_dedup_rewrite",      # MIN(struct) winner, no window on block hash
    "bm25_doc_scores",         # 1-row stats broadcast, shuffle-free scoring
    "fuzzy_name_match",        # blocked equi-join candidates, never n^2
    "training_mix",            # 4-stage curation composition
    "dedup_incremental",       # one-sided batch-vs-corpus LSH index join
    "pii_redact",              # map-only regexp redaction, zero shuffles
    "chunk_documents",         # map-only overlapping token windows
    "embed_quantize_int8",     # map-only int8 quantization of embeddings
    "semantic_dedup",          # cell-blocked cosine pairs -> components
    "lm_bigram_doc_scores",    # vocab-bounded model aggs + stats broadcast
    "dsir_importance_weights", # 256-row bucket model broadcast back
    "split_train_val_test",    # map-only hash-range assignment
    "bpe_pair_stats",          # vocab-sized pair agg + TakeOrdered top-k
    "training_manifest",       # curation x split x per-source token shares
    "split_leakage_audit",     # LSH pairs x split labels, audit rollup
    "hybrid_search_rerank",    # BM25 candidates -> cosine rerank cascade
    "dedup_jaccard_prefix",    # lossless prefix-filter candidate join
    "substring_run_dedup",     # positional k-gram join + islands collapse
    "contrastive_hard_negatives",  # broadcast anchors, one corpus pass
    "zorder_locality_stats",   # 1-row bounds broadcast, narrow Morton key
    "lang_temperature_sample", # cluster-side sqrt rates, broadcast join
    "decontam_bloom",          # constant-size bitmap broadcast probe
    "cms_token_frequencies",   # fixed 2048-cell sketch agg + tiny join
    "rolling_7d_distinct_users",  # offset-explode trailing window, no NLJ
    "incremental_agg_merge",   # mergeable partial states, two-batch fold
    "embedding_outlier_scores",  # broadcast per-dim stats, exact integers
    "rrf_fusion",              # two LIMIT-bounded ranked legs, full-outer fuse
    "session_entry_exit_stats",  # islands sessionize + one min_by/max_by agg
    "token_pmi",               # vocab-capped co-occurrence self-join
    "pareto_abc_customers",    # aggregated-table window, 1-row total broadcast
    "interarrival_percentiles",  # partitioned LAG + exact percentile agg
    "daily_type_correlation",  # exact sufficient stats on aggregated days
    "snapshot_diff",           # keyed full-outer version diff
    "attribution_interval_join",  # user_id equi-join, time-bound residuals
    "versioned_change_feed",   # CDF replay: change-set scans, no history join
    "ivm_rollup_from_cdf",     # signed-delta fold, O(changes) refresh
    "versioned_dv_delete",     # merge-on-read read path: broadcast anti-join
    "versioned_sql_write",     # DSv2 writer round-trip + pruned readback
    "sim_knn_ivfpq",           # exact-int IVF+PQ: cell equi-join + ADC LUT
    "versioned_catalog_dml",   # catalog SQL DML: schema-metadata path (r08)
    "versioned_meta_agg",      # metadata-only COUNT/MIN/MAX, no data read
    "versioned_schema_rename_drop",  # column-mapped read: rename projection
    "versioned_optimize",      # post-OPTIMIZE read: compacted, dv-free scan
]

SF = "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("plan-report", master="local[4]")
    reg = load_all()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    out = [
        "# PLANS — physical-plan snapshots of flagship queries\n",
        "*Generated by `scripts/plan_report.py` (sf0.001 inputs; plan shape",
        "is SF-independent pre-AQE). Invariants are enforced in",
        "`tests/test_plans.py`; this file is the readable evidence.*\n",
    ]
    for name in FLAGSHIPS:
        plan = reg[name].fn(spark, SF)._jdf.queryExecution().explainString(mode)
        out.append(f"\n## {name}\n\n{reg[name].doc}\n\n```\n{plan.strip()}\n```\n")
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(FLAGSHIPS)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
