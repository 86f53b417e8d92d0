"""Approximate sketches for 100 TB-scale monitoring (beyond-reference
surface; complements the exact paths in queries/analytic.py).

Exact COUNT(DISTINCT) and exact percentiles shuffle every value; at fact
scale the right tool is a mergeable sketch computed map-side and merged
per group: HyperLogLog++ (`approx_count_distinct`, relative error ~rsd)
and a quantile sketch (`percentile_approx`, rank error bounded by
1/accuracy). Both are engine-specific estimates, so there is no DuckDB
hash-oracle — correctness is pinned by tolerance tests against the exact
answers (tests/test_operators.py) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HOUR_MS = 3_600_000
DAY_MS = 86_400_000


def daily_distinct_approx(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_ms",
    rsd: float = 0.02,
) -> DataFrame:
    """Distinct keys per UTC day via HLL++: one scan, map-side sketch
    merge — the exact version reshuffles every (day, key) pair, this
    shuffles one dense sketch per day per input partition."""
    day = ((F.col(ts_col) / DAY_MS).cast("long") * DAY_MS).alias("day_ms")
    return (
        df.groupBy(day)
        .agg(F.approx_count_distinct(key_col, rsd).alias("n_distinct_approx"))
        .orderBy("day_ms")
    )


def group_quantiles_approx(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group quantiles via the Greenwald-Khanna-style sketch behind
    ``percentile_approx``: rank error <= 1/accuracy, fully mergeable, so
    the plan is a partial-aggregate (one sketch per group per partition)
    + one merge — never a per-group sort."""
    probs = F.array(*[F.lit(p) for p in probabilities])
    q = F.percentile_approx(F.col(value_col), probs, F.lit(accuracy))
    out = df.groupBy(*keys).agg(q.alias("_qs"))
    return out.select(
        *keys,
        *[
            F.col("_qs").getItem(i).alias(f"q{str(p).replace('.', '_')}")
            for i, p in enumerate(probabilities)
        ],
    )
