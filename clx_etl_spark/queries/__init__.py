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
# always sweeps everything at sf0.01 regardless. Round-3 front: the 16
# round-2 additions that missed the r02 prefix, the re-checked
# q12_late_lines_by_status (oracle HUGEINT cast fix), and any new
# round-3 queries (appended as they are written).
SWEEP_FRONT: list[str] = [
    "w4_locf_fill",
    "quality_percentile_gate",
    "unpivot_melt",
    "mode_per_group",
    "fuzzy_name_match",
    "scd2_value_runs",
    "ema_per_user",
    "tz_local_daily",
    "ratio_to_report",
    "profile_orders_columns",
    "dedup_best_representative",
    "densify_hourly_grid",
    "u4_intersect_repeat_buyers",
    "session_revenue",
    "dod_revenue_change",
    "u5_except_all_multiset",
    "q12_late_lines_by_status",
]


def load_all() -> dict[str, Query]:
    from . import corpus, parity, pipeline, tpch_extra  # noqa: F401  (registration side effects)
    from . import core  # noqa: F401
    from . import analytic  # noqa: F401

    front = {n: REGISTRY[n] for n in SWEEP_FRONT if n in REGISTRY}
    rest = {n: q for n, q in REGISTRY.items() if n not in front}
    return {**front, **rest}
