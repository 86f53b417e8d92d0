"""Gap detection / boundary synthesis / islands merge (SURVEY W1-W3).

The reference detects holes in stored kline history with a LAG window
pushed into Doris SQL (reference: src/exchanges/_base_.py:178-195), then
synthesizes head/tail boundary gaps in Python (:200-222) and coalesces
adjacent gap ranges whose combined span fits one API page (:227-245).

Here all three are single declarative plans:
  * detect_gaps      — lag window per key, filter delta > interval
  * with_boundary_gaps — min/max per key vs requested range, unioned
  * merge_gap_ranges — classic gaps-and-islands: break-flag + running sum

Scale notes: one shuffle on the key columns serves all three (the window
and the groupBy share partitioning); at 100 TB the scan is partition-pruned
by the enclosing time range before the window runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def detect_gaps(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    interval_ms: int = 60_000,
) -> DataFrame:
    """Missing-range detection between consecutive bars per key.

    Returns one row per hole: keys + gap_start/gap_end (both inclusive,
    interval-aligned epoch ms). A hole exists when the next stored bar is
    more than one interval after the previous (reference F10 predicate,
    _base_.py:192-193,204).
    """
    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    return (
        df.select(*keys, ts_col)
        .withColumn("prev_ts", prev)
        .filter(F.col("prev_ts").isNotNull() & (F.col(ts_col) - F.col("prev_ts") > interval_ms))
        .select(
            *keys,
            (F.col("prev_ts") + interval_ms).alias("gap_start"),
            (F.col(ts_col) - interval_ms).alias("gap_end"),
        )
    )


def with_boundary_gaps(
    df: DataFrame,
    keys: list[str],
    start_ms: int,
    end_ms: int,
    ts_col: str = "ts",
    interval_ms: int = 60_000,
) -> DataFrame:
    """Interior gaps plus head gap [start, first-I] and tail gap [last+I, end]
    for a requested range (reference _base_.py:200-222). Keys with no data at
    all are the caller's cold-start path (whole range)."""
    interior = detect_gaps(df, keys, ts_col, interval_ms)
    bounds = df.groupBy(*keys).agg(
        F.min(ts_col).alias("first_ts"), F.max(ts_col).alias("last_ts")
    )
    head = bounds.filter(F.col("first_ts") > start_ms).select(
        *keys,
        F.lit(start_ms).cast("long").alias("gap_start"),
        (F.col("first_ts") - interval_ms).alias("gap_end"),
    )
    tail = bounds.filter(F.col("last_ts") < end_ms).select(
        *keys,
        (F.col("last_ts") + interval_ms).alias("gap_start"),
        F.lit(end_ms).cast("long").alias("gap_end"),
    )
    return interior.unionByName(head).unionByName(tail)


def merge_gap_ranges(
    gaps: DataFrame,
    keys: list[str],
    max_span_ms: int,
    start_col: str = "gap_start",
    end_col: str = "gap_end",
) -> DataFrame:
    """Coalesce gap ranges separated by less than ``max_span_ms`` (so one
    API page can cover the merged request, reference _base_.py:227-245:
    merge while next.start - cur_end <= limit·I), then split any island
    wider than the cap into cap-sized chunks so every output range is a
    single page fetch.

    Gaps-and-islands: order ranges per key, flag a break when the distance
    to the previous range exceeds the cap, group by the running break sum.
    """
    w = Window.partitionBy(*keys).orderBy(start_col)
    df = gaps.withColumn("_prev_end", F.lag(end_col).over(w))
    df = df.withColumn(
        "_break",
        F.when(F.col("_prev_end").isNull(), F.lit(1)).otherwise(
            (F.col(start_col) - F.col("_prev_end") > F.lit(max_span_ms)).cast("int")
        ),
    )
    df = df.withColumn("_grp", F.sum("_break").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    merged = df.groupBy(*keys, "_grp").agg(
        F.min(start_col).alias(start_col), F.max(end_col).alias(end_col)
    )
    # exact cap enforcement: split any island wider than the cap into
    # aligned chunks (the fetch layer pages within a chunk anyway).
    n_chunks = F.floor((F.col(end_col) - F.col(start_col)) / F.lit(max_span_ms))
    chunks = merged.withColumn("_i", F.explode(F.sequence(F.lit(0), n_chunks)))
    return chunks.select(
        *keys,
        (F.col(start_col) + F.col("_i") * max_span_ms).alias(start_col),
        F.least(F.col(end_col), F.col(start_col) + (F.col("_i") + 1) * max_span_ms - 1).alias(
            end_col
        ),
    )


def gap_fill_plan(
    stored: DataFrame,
    keys: list[str],
    start_ms: int,
    end_ms: int,
    ts_col: str = "ts",
    interval_ms: int = 60_000,
    page_limit: int = 1000,
) -> DataFrame:
    """End-to-end refetch plan: holes + boundaries, merged to page-sized
    ranges — the DataFrame the source adapter fans out over (SURVEY §3.1)."""
    gaps = with_boundary_gaps(stored, keys, start_ms, end_ms, ts_col, interval_ms)
    return merge_gap_ranges(gaps, keys, max_span_ms=page_limit * interval_ms)
