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


def mad_anomalies(
    df,
    value_col: str = "value",
    group_cols: list[str] | None = None,
    k: float = 3.0,
):
    """Robust outlier detection per group: flag values more than
    ``k`` median-absolute-deviations from the group median — the MAD
    rule survives the very outliers it hunts, unlike mean/stddev.

    Two aggregation passes over the data (median, then the deviation
    median) with the tiny per-group stats broadcast back between them —
    at 100 TB both are keyed aggs with map-side partials and the final
    count-pass fuses flags into the same scan as the stats join. Exact
    interpolated percentile keeps the oracle bit-identical (swap to
    approx_percentile at fact scale with a declared error bound).

    Returns per group: (group..., n, med, mad, n_anomalies).
    """
    from pyspark.sql import functions as F

    groups = group_cols or ["event_type"]
    med = df.groupBy(*groups).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    dev = df.join(F.broadcast(med), groups).withColumn(
        "_adev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = dev.groupBy(*groups).agg(
        F.expr("percentile(_adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), groups)
        .groupBy(*groups)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(
                (F.col("_adev") > F.lit(k) * F.col("mad")).cast("long")
            ).alias("n_anomalies"),
        )
    )
