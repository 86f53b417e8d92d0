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
    # ---- round-9 front ----
    # new this round (no driver row yet): schema contract, whole-file
    # metadata delete, dv-sidecar reorg, incremental stats-segment scan
    "versioned_schema_evolution",
    "versioned_retention_purge",
    "versioned_count_col_meta",
    "versioned_dv_reorg",
    "versioned_segment_scan",
    # backing code changed this round (incremental sidecar segments +
    # by-reference carry, shared CAS-rebase helper, uuid-owned change
    # feeds, DSv2 row-group pruning, analyze sentinels, distributed
    # row-count fallback): re-prove the whole versioned family
    "versioned_meta_agg",
    "versioned_catalog_dml",
    "versioned_analyze_backfill",
    "versioned_sql_write",
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
    # freshness: the full remaining r04 cohort (stalest cumulative
    # proofs — retires r04, new floor r05)
    "percentiles_by_group",
    "pii_redact",
    "pivot_event_values",
    "quality_weighted_sample",
    "range_join_attribution",
    "resample_ohlcv_hourly",
    "sample_stratified",
    "scd2_value_runs",
    "semantic_dedup",
    "session_revenue",
    "skew_salted_agg",
    "skew_salted_join",
    "split_leakage_audit",
    "split_train_val_test",
    "t10_prob_normalize",
    "t12_coalesce_tags",
    "t5_align_5m",
    "t7_dt_derive",
    "t8_ratio_split",
    "t9_interval_snap",
    "training_manifest",
    "tz_local_daily",
    "u2_except_unseen",
    "w1_gap_detect",
    "w3_gap_fill_plan",
    "w3_islands_sessionize",
    "w4_locf_fill",
    "w4_moving_frame",
    "w4_range_frame",
    "w4_rank_variants",
    # ---- position 48+: at/past the driver's ~50 cap (next-stalest: the
    # r05 cohort leads the r10 front)
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
