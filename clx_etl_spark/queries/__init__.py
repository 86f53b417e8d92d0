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
# always sweeps everything at sf0.01 regardless. Round-6 front, closing the
# proof ledger (VERDICT r05 Next-round-2): positions 1-18 are the LAST 13
# hash-oracled queries that have never had a driver row, k1_upsert_last_wins
# (its sinks/upsert.py backing changed after its r03 row), and the four
# new round-6 queries (versioned_merge_replay, versioned_point_lookup,
# versioned_cdc_replay, attribution_interval_join);
# positions 19-50 backfill with the STALEST driver rows (every r01 row, then
# the oldest r02 rows) so proof freshness rotates too. After this round every
# hash-oracled registry query has a driver CORRECTNESS row.
SWEEP_FRONT: list[str] = [
    # never driver-proven (13) — the final stragglers
    "graph_suite",
    "sketch_daily_users_exact",
    "mix_waterfill",
    "class_balance_oversample",
    "table_profile",
    "fk_inclusion_audit",
    "source_content_overlap",
    "embedding_label_centroids",
    "split_dedup_aware",
    "hybrid_search_rerank",
    "dq_orders_expectations",
    "anomaly_mad_by_type",
    "lm_score_heldout",
    # re-prove: backing sinks/upsert.py changed after its last driver row
    "k1_upsert_last_wins",
    # new round-6 queries (lakehouse MERGE round-trip + bloom point
    # lookup + CDC apply through storage; attribution twin)
    "versioned_merge_replay",
    "versioned_point_lookup",
    "versioned_cdc_replay",
    "versioned_change_feed",
    "ivm_rollup_from_cdf",
    "ivm_rollup_extrema_from_cdf",
    "attribution_interval_join",
    "versioned_clone_divergence",
    "versioned_time_travel_ts",
    "versioned_dv_delete",
    "versioned_dv_merge_replay",
    "versioned_sql_scan",
    # freshness backfill: every query whose last driver row is r01
    "cube_revenue",
    "j1_semi_active_customers",
    "j6_anti_new_only",
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
    "t11_entity_classify",
    "t14_threshold_by_prefix",
    "t15_explode_dims",
    "topk_per_group",
    "u3_union_by_name",
    "w4_sliding_window_counts",
    # freshness backfill: oldest r02 rows (9 of 12 fit in the 50)
    "mm_audio_windows",
    "mm_embedding_knn",
    "mm_frame_sample",
    "mm_image_resize",
    "q11_important_parts",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_variety",
    "q1_pricing_summary",
    # ---- position 51+: past the driver's ~50 cap
    "q20_heavy_suppliers",
    "q21_last_shipper",
    "q3_shipping_priority",
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
