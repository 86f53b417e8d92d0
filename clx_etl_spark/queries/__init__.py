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
    # new in round 7: the DSv2 SQL write round-trip
    "versioned_sql_write",
    # graduated from rows-only to hash-oracled in round 7 (exact-integer
    # k-means) — first driver rows with an oracle
    "pq_ann",
    "sim_knn_ivfpq",
    # re-prove: sinks/versioned.py + sources/table_source.py changed in
    # round 7 (stats sidecar, dv rebase, path normalization, writer)
    "versioned_sql_scan",
    "versioned_dv_delete",
    "versioned_dv_merge_replay",
    "versioned_merge_replay",
    "versioned_point_lookup",
    "versioned_cdc_replay",
    "versioned_change_feed",
    "ivm_rollup_from_cdf",
    "ivm_rollup_extrema_from_cdf",
    "versioned_clone_divergence",
    "versioned_time_travel_ts",
    # freshness: the r02 rows that fell past the 50-cap last round
    "mm_embedding_knn",
    "mm_frame_sample",
    "mm_image_resize",
    "q11_important_parts",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q1_pricing_summary",
    "q20_heavy_suppliers",
    "q21_last_shipper",
    "q3_shipping_priority",
    # freshness backfill: oldest r03 rows (25 of 39 fit in the 50)
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
    "mode_per_group",
    "pack_training_sequences",
    "profile_orders_columns",
    "q12_late_lines_by_status",
    "quality_percentile_gate",
    "ratio_to_report",
    "shard_balance_stats",
    "sim_embedding_near_dup",
    "sim_knn_bruteforce",
    "sim_knn_ivf",
    # ---- position 51+: past the driver's ~50 cap (next round's backfill:
    # the remaining 14 r03 rows)
    "sim_srp_near_dup",
    "span_dedup_rewrite",
    "span_dup_stats",
    "t2_normalize_enum_split",
    "t3_t4_precision_roundtrip",
    "text_fingerprints",
    "text_lang_id",
    "text_quality_scores",
    "text_repetition_signals",
    "text_token_counts",
    "training_mix",
    "u4_intersect_repeat_buyers",
    "u5_except_all_multiset",
    "unpivot_melt",
    # rows-only (no hash oracle by design; driver records rows-only)
    "sketch_daily_users",
    "bpe_train_encode",
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
