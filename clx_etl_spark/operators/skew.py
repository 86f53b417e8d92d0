"""Skew mitigation: salting for hot keys (SURVEY §4 scale posture).

AQE's skew-join splitting handles most runtime skew, but two shapes still
need explicit salting at 100 TB:

  * aggregation onto a handful of giant keys (one reducer owns the key no
    matter how AQE splits inputs) — fix: two-phase salted aggregation;
  * joining a skewed fact against a small-but-not-broadcastable side —
    fix: replicate the small side across N salt values so the hot key's
    rows spread over N reducers.

Salts are DETERMINISTIC (hash of a caller-named discriminator column, or
a row-local monotonic id) — never rand(): retries/speculative tasks must
re-produce identical partitioning or results silently diverge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT_COL = "_salt"


def with_salt(df: DataFrame, discriminator: str | Column, buckets: int) -> DataFrame:
    """Add a deterministic salt in [0, buckets) from a discriminator column
    (any column that varies within a hot key, e.g. the row's unique id)."""
    c = F.col(discriminator) if isinstance(discriminator, str) else discriminator
    return df.withColumn(SALT_COL, F.pmod(F.xxhash64(c), F.lit(buckets)).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    discriminator: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for decomposable aggregates.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 shuffles on (keys, salt) — the hot key
    spreads over ``buckets`` reducers; phase 2 re-shuffles only the tiny
    partial-result set on the real keys.
    """
    _partial = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    _final = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for _, (_, fn) in aggs.items():
        if fn not in _partial:
            raise ValueError(f"non-decomposable aggregate: {fn}")
    salted = with_salt(df, discriminator, buckets)
    partial = salted.groupBy(*keys, SALT_COL).agg(
        *[_partial[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[_final[fn](out).alias(out) for out, (_, fn) in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    keys: list[str],
    discriminator: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact to a small (but above-broadcast-threshold) side.

    The skewed side gets a deterministic salt; the small side is exploded
    ``buckets``× so every (key, salt) combination exists. The join then
    shuffles on (keys, salt): a key holding 30% of the fact spreads over
    ``buckets`` reducers instead of melting one. Cost: small side inflates
    buckets×, so keep buckets × |small| well under shuffle comfort.
    """
    s = with_salt(skewed, discriminator, buckets)
    replicated = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias(SALT_COL)
    )
    return s.join(replicated, on=[*keys, SALT_COL], how=how).drop(SALT_COL)
