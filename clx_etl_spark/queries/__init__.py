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
# always sweeps everything at sf0.01 regardless. Round-5 front: the 58
# hash-oracled registry queries with no driver CORRECTNESS row across
# r01-r04 (the round-4 additions at prior positions ~51+), flagships
# first (graph pair, CDC, multimodal legs per VERDICT r04 §Next-round-1).
# 58 > 50 slots, so the 8 with the strongest alternative proof sit at
# 51-58 for the round-6 rotation, followed by the rows-only entries
# (which can never hash-match) and the 124 already-proven queries.
SWEEP_FRONT: list[str] = [
    # flagships
    "doc_pagerank",
    "label_propagation_srp",
    "cdc_current_state",
    "mm_scene_cuts",
    "mm_audio_segments",
    "mm_phash_near_dup",
    # dedup / curation family
    "dedup_jaccard_prefix",
    "substring_run_dedup",
    "dedup_containment",
    "dedup_cluster_size_histogram",
    "decontam_bloom",
    "cms_token_frequencies",
    "curation_drop_attribution",
    "contrastive_hard_negatives",
    "lang_temperature_sample",
    "quality_rank_normalize",
    "eval_holdout_min_coverage",
    "split_with_holdout",
    "kfold_balance_audit",
    "span_corruption_masking",
    # LM / IR / text
    "lm_kneser_ney_scores",
    "token_pmi",
    "rrf_fusion",
    "phrase_search",
    "oov_rate_by_lang",
    "readability_scores",
    "srp_pair_label_purity",
    "embedding_outlier_scores",
    # sequence / path analytics
    "markov_transitions",
    "top_event_paths",
    "step_transitions",
    "funnel_time_bounded",
    "conversion_lag_stats",
    "rolling_7d_distinct_users",
    "session_entry_exit_stats",
    "interarrival_percentiles",
    "market_basket_pairs",
    "rfm_segmentation",
    "pareto_abc_customers",
    "daily_type_correlation",
    # profiling / storage-ops / versioned
    "grouping_sets_revenue",
    "histogram_event_values",
    "trend_slope_by_type",
    "winsorize_event_values",
    "column_gini_profile",
    "compaction_bin_packing",
    "partition_skew_report",
    "zorder_locality_stats",
    "incremental_agg_merge",
    "snapshot_diff",
    # ---- position 51+: past the driver's ~50 cap. First the 8
    # hash-oracled stragglers queued for the round-6 rotation, then
    # new round-5 queries, then rows-only entries, then the proven 124.
    "fk_inclusion_audit",
    "source_content_overlap",
    "embedding_label_centroids",
    "split_dedup_aware",
    "hybrid_search_rerank",
    "dq_orders_expectations",
    "anomaly_mad_by_type",
    "lm_score_heldout",
    # new round-5 queries (hash-oracled; queued behind the stragglers)
    "graph_suite",
    "sketch_daily_users_exact",
    "mix_waterfill",
    "class_balance_oversample",
    "table_profile",
    # rows-only (no hash oracle by design; driver records rows-only)
    "sketch_daily_users",
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
