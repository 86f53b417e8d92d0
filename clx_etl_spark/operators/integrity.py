"""Completeness / integrity checking (SURVEY A2 + F11).

The reference loops over days × symbols × 24 hours issuing one COUNT(*)
each (reference: src/system_utils/check_market_snapshot_integrity.py:46-66)
and classifies hours as EMPTY (0 rows) or PARTIAL (< expected)
(:97-109). One grouped window plan replaces the whole loop, and a
generated expected-hour spine makes EMPTY hours first-class rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

HOUR_MS = 3_600_000


def hourly_counts(df: DataFrame, keys: list[str], ts_col: str = "ts_ms") -> DataFrame:
    bucket = (F.floor(F.col(ts_col) / HOUR_MS) * HOUR_MS).cast("long").alias("hour_ms")
    return df.groupBy(*keys, bucket).agg(F.count(F.lit(1)).alias("cnt"))


def completeness_report(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts_ms",
    expected_per_hour: int = 3600,
    start_ms: int | None = None,
    end_ms: int | None = None,
) -> DataFrame:
    """Per key × hour: cnt + status ∈ {EMPTY, PARTIAL, OK} over the full
    expected hour spine [start, end). Defaults to the observed global range
    so silent holes inside it surface as EMPTY."""
    counts = hourly_counts(df, keys, ts_col)
    if start_ms is None or end_ms is None:
        lo, hi = df.select(
            F.min(ts_col).alias("lo"), F.max(ts_col).alias("hi")
        ).first()
        start_ms = start_ms if start_ms is not None else (lo // HOUR_MS) * HOUR_MS
        end_ms = end_ms if end_ms is not None else hi + 1
    spine_hours = F.sequence(
        F.lit((start_ms // HOUR_MS) * HOUR_MS),
        F.lit(((end_ms - 1) // HOUR_MS) * HOUR_MS),
        F.lit(HOUR_MS),
    )
    key_spine = (
        df.select(*keys).distinct().select(*keys, F.explode(spine_hours).alias("hour_ms"))
    )
    full = key_spine.join(counts, on=[*keys, "hour_ms"], how="left").withColumn(
        "cnt", F.coalesce(F.col("cnt"), F.lit(0))
    )
    status = (
        F.when(F.col("cnt") == 0, F.lit("EMPTY"))
        .when(F.col("cnt") < expected_per_hour, F.lit("PARTIAL"))
        .otherwise(F.lit("OK"))
    )
    return full.withColumn("status", status)
