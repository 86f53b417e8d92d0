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
    # ---- round-11 front ----
    # NEW this round: streaming across a RENAME (schema tracking,
    # VERDICT r10 item 3) and persisted-ANN-index compaction (item 7)
    "versioned_stream_schema_track",
    "ann_index_compaction",
    "versioned_dsv2_mapped_write",
    # FRESHNESS, highest priority: the five r05 stragglers that fell
    # past the 50-cap in round 10 (VERDICT r10 item 4)
    "token_pmi",
    "top_event_paths",
    "trend_slope_by_type",
    "winsorize_event_values",
    "zorder_locality_stats",
    # CODE CHANGED this round: sinks/versioned.py (colmap 'xl' carry,
    # latest_version hint, drop_columns replay guard) and
    # sources/table_source.py (columnMapping writer, schema tracking,
    # maxFilesPerTrigger) back the whole versioned family — re-sweep
    # its r10 rows. (versioned_count_col_meta dropped from the front
    # to keep it at exactly 50 before the rows-only sentinel — its
    # backing op, count_col_meta, is untouched this round and its r10
    # row is fresh; review r11 caught the 51-entry spill that would
    # have silently starved w4_sliding_window_counts.)
    "versioned_schema_rename_drop",
    "versioned_optimize",
    "versioned_table_stream",
    # FRESHNESS: the full r06 cohort (stalest remaining cumulative
    # proofs — this closes the ledger to floor r07 everywhere)
    "anomaly_mad_by_type",
    "attribution_interval_join",
    "class_balance_oversample",
    "cube_revenue",
    "dq_orders_expectations",
    "embedding_label_centroids",
    "fk_inclusion_audit",
    "graph_suite",
    "hybrid_search_rerank",
    "j1_semi_active_customers",
    "j6_anti_new_only",
    "k1_upsert_last_wins",
    "lm_score_heldout",
    "mix_waterfill",
    "mm_audio_windows",
    "q10_top_returns",
    "q14_promo_ratio",
    "q17_small_quantity_revenue",
    "q18_group_having",
    "q19_disjunctive_pushdown",
    "q22_idle_rich_customers",
    "q2_min_cost_supplier",
    "q4_exists_semijoin",
    "q5_region_revenue",
    "q6_revenue_delta",
    "q7_nation_volume",
    "q8_market_share",
    "q9_revenue_by_nation_year",
    "rollup_revenue",
    "sketch_daily_users_exact",
    "source_content_overlap",
    "split_dedup_aware",
    "t11_entity_classify",
    "t14_threshold_by_prefix",
    "t15_explode_dims",
    "table_profile",
    "topk_per_group",
    "u3_union_by_name",
    "w4_sliding_window_counts",
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
