"""Sessionization (gaps-and-islands over event streams).

Generalizes the reference's gap grouping (SURVEY W3) into the standard
sessionize operator a pipeline needs: events within ``timeout`` of the
previous event (per key) share a session. One shuffle on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts_ms",
    timeout_ms: int = 1_800_000,
) -> DataFrame:
    """Assign session ids and summarize: one row per session with
    session_start / session_end / n_events / span_ms."""
    w = Window.partitionBy(*keys).orderBy(ts_col)
    new_flag = (
        F.when(F.lag(ts_col).over(w).isNull(), 1)
        .when(F.col(ts_col) - F.lag(ts_col).over(w) > timeout_ms, 1)
        .otherwise(0)
    )
    with_sid = df.withColumn("_new", new_flag).withColumn(
        "session_seq", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_sid.groupBy(*keys, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.max(ts_col) - F.min(ts_col)).alias("span_ms"),
    )
