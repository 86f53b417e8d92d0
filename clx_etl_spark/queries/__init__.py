"""The oracle-checked query registry.

Each entry pairs a Spark DataFrame implementation (the engine path) with an
ANSI-SQL oracle string DuckDB runs over the same parquet tables. The driver
harness (and tests/test_queries_oracle.py) execute both and hash-compare.

Determinism contract (both engines must produce byte-identical values):
  * per-row arithmetic in DOUBLE (IEEE-deterministic), aggregation of money
    in fixed-scale DECIMAL (exact, order-independent), final cast to DOUBLE
    (exact for the magnitudes involved);
  * text hashing via md5 hex (identical digests in both engines);
  * every top-k fully tie-broken; no floating-point rounding functions
    (engines' round() implementations differ — raw doubles are safer).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Query:
    """A registered engine query with its DuckDB oracle."""

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = Query(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


# The driver's correctness harness checks a bounded prefix (~50) of the
# registry. Queries that have not yet earned a green CORRECTNESS row are
# rotated to the front each round so the driver sweep eventually covers the
# whole registry; the repo's own oracle suite (tests/test_queries_oracle.py)
# always sweeps everything at sf0.01 regardless. Round-4 front, in
# driver-value order: (1) the 10 r03 reds, (2) the judge-verified set
# whose r01/r02 proofs the events.ts encoding change invalidated (fixed
# by catalog.load_table's dtype branch — each SURVEY §2 row stays marked
# not-correct until a fresh green row lands), (3) the new round-4
# queries, which hold repo-oracle proof at 3 SFs in the meantime.
SWEEP_FRONT: list[str] = [
    "w4_locf_fill",
    "scd2_value_runs",
    "ema_per_user",
    "tz_local_daily",
    "densify_hourly_grid",
    "session_revenue",
    "a6_distinct_users",
    "f6_stale_keys",
    "t12_coalesce_tags",
    "u2_except_unseen",
    "a1_watermark",
    "a2_integrity_hourly",
    "a3_latest_per_key",
    "asof_last_purchase",
    "cohort_retention",
    "funnel_conversion",
    "j2_full_outer_merge",
    "json_props_extract",
    "percentiles_by_group",
    "pivot_event_values",
    "range_join_attribution",
    "resample_ohlcv_hourly",
    "sample_stratified",
    "sketch_daily_users",
    "skew_salted_agg",
    "skew_salted_join",
    "t5_align_5m",
    "t7_dt_derive",
    "t8_ratio_split",
    "t9_interval_snap",
    "t10_prob_normalize",
    "w1_gap_detect",
    "w3_islands_sessionize",
    "w3_gap_fill_plan",
    "w4_moving_frame",
    "w4_range_frame",
    "w4_rank_variants",
    "dedup_incremental",
    "pii_redact",
    "chunk_documents",
    "embed_quantize_int8",
    "semantic_dedup",
    "quality_weighted_sample",
    "mm_media_metadata",
    "lm_bigram_doc_scores",
    "dsir_importance_weights",
    "split_train_val_test",
    "bpe_pair_stats",
    "training_manifest",
    "split_leakage_audit",
    "dedup_jaccard_prefix",
    "substring_run_dedup",
    "contrastive_hard_negatives",
    "zorder_locality_stats",
    "lang_temperature_sample",
    "decontam_bloom",
    "cms_token_frequencies",
    "dedup_containment",
    "winsorize_event_values",
    "curation_drop_attribution",
    "histogram_event_values",
    "trend_slope_by_type",
    "cdc_current_state",
    "quality_rank_normalize",
    "eval_holdout_min_coverage",
    "phrase_search",
    "oov_rate_by_lang",
    "split_with_holdout",
    "mm_scene_cuts",
    "mm_audio_segments",
    "mm_phash_near_dup",
    "fk_inclusion_audit",
    "source_content_overlap",
    "embedding_label_centroids",
    # round-4 continuation: sequence/path analytics + storage-ops planning
    "markov_transitions",
    "top_event_paths",
    "rolling_7d_distinct_users",
    "conversion_lag_stats",
    "compaction_bin_packing",
    "partition_skew_report",
    "embedding_outlier_scores",
    "grouping_sets_revenue",
    "funnel_time_bounded",
    "step_transitions",
    "kfold_balance_audit",
    "rrf_fusion",
    "token_pmi",
    "lm_kneser_ney_scores",
    "incremental_agg_merge",
    "snapshot_diff",
    "column_gini_profile",
    "session_entry_exit_stats",
    "pareto_abc_customers",
    "interarrival_percentiles",
    "doc_pagerank",
    "label_propagation_srp",
    "daily_type_correlation",
    "rfm_segmentation",
    "market_basket_pairs",
    "readability_scores",
    "srp_pair_label_purity",
    "span_corruption_masking",
    "dedup_cluster_size_histogram",
    # ---- spill zone past the driver's ~50 cap: entries with the
    # strongest alternative proof (repo oracle green at 3 SFs this
    # round; w4 family shares w4_locf_fill's load path; the
    # iterative rows-only trainers carry unit/ADC-consistency tests)
    "w4_sliding_window_counts",
    "split_dedup_aware",
    "hybrid_search_rerank",
    "dq_orders_expectations",
    "anomaly_mad_by_type",
    "lm_score_heldout",
    "bpe_train_encode",
    "pq_ann",
    "sim_knn_ivfpq",
]


def load_all() -> dict[str, Query]:
    from . import corpus, parity, pipeline, tpch_extra  # noqa: F401  (registration side effects)
    from . import core  # noqa: F401
    from . import analytic  # noqa: F401
    from . import datasets  # noqa: F401
    from . import sequence  # noqa: F401
    from . import mining  # noqa: F401

    front = {n: REGISTRY[n] for n in SWEEP_FRONT if n in REGISTRY}
    rest = {n: q for n, q in REGISTRY.items() if n not in front}
    return {**front, **rest}
