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


CMS_DEPTH = 4
CMS_WIDTH = 512


def _cms_cell(j: int, key, width: int):
    """Row-j cell for a key: first 8 md5 hex chars of 'j:key' mod width —
    the same cross-engine md5 convention as sampling._hash_bucket, so a
    DuckDB oracle reproduces every counter exactly."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(j)), key)), 1, 8),
        16,
        10,
    ).cast("long") % width


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Count-min sketch of a key column: (j, cell, c) counters,
    depth x width cells total.

    The sketch IS a keyed aggregate, so it is map-side combinable and
    mergeable across partitions, days, or corpus snapshots by summing
    counters cell-wise — the property that makes it the fixed-memory
    frequency monitor at 100 TB, where exact per-key counts would
    shuffle the full key space. Overestimate-only error: for N total
    keys, est - true <= e*N/width with probability 1 - e^-depth."""
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                _cms_cell(j, F.col(key_col), width).alias("cell"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("jc"))
        .groupBy(F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each distinct key in ``keys``: min over the depth
    rows of the key's counter cells. The counters table is depth*width
    rows regardless of corpus size — always broadcastable."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_cell(j, F.col(key_col), width).alias("cell"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("jc"),
    ).select(key_col, F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
    return (
        probes.join(F.broadcast(counters), ["j", "cell"])
        .groupBy(key_col)
        .agg(F.min("c").alias("cms_est"))
    )
