"""Incremental watermarks & latest-row-per-key (SURVEY A1/A3/F6).

The reference issues a MAX(dt) per key to decide where to resume fetching
(reference: src/exchanges/_base_.py:153-173) and an ORDER BY dt DESC
LIMIT 1 per key for the freshest stored bar (flows/sync_klines.py:46-55,
issued once per symbol — here one grouped plan covers every key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def high_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    cold_start_ms: int | None = None,
) -> DataFrame:
    """max(ts) per key; keys absent from ``df`` are the caller's cold-start.
    Map-side partial aggregation makes this one light shuffle of one row
    per key regardless of fact-table size."""
    wm = df.groupBy(*keys).agg(F.max(ts_col).alias("watermark_ts"))
    if cold_start_ms is not None:
        wm = wm.withColumn("watermark_ts", F.greatest("watermark_ts", F.lit(cold_start_ms)))
    return wm


def latest_per_key(df: DataFrame, keys: list[str], order_col: str = "ts") -> DataFrame:
    """Whole latest row per key (A3). row_number over a desc window; ties
    broken by the remaining columns' natural order are the caller's concern
    — pass a unique order_col for determinism."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")
    )


def freshness_skip(
    candidates: DataFrame,
    state: DataFrame,
    keys: list[str],
    not_before_col: str = "next_funding_time",
    now_ms: int = 0,
) -> DataFrame:
    """F6: drop candidate keys whose stored state says the next datum isn't
    due yet (reference: bybit/perp.py:200-203). Anti-join against the
    not-yet-due subset; state is small → broadcast."""
    not_due = state.filter(F.col(not_before_col) > F.lit(now_ms)).select(*keys)
    return candidates.join(F.broadcast(not_due), on=keys, how="left_anti")
