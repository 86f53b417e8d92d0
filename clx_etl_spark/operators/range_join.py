"""Binned range join: points-in-interval without a nested-loop plan.

A naive ``p.ts BETWEEN i.start AND i.end`` join compiles to
BroadcastNestedLoopJoin (O(points x intervals) comparisons) — unusable at
100 TB. Standard fix (same idea as Databricks' range-join bin hints): bin
both sides by a fixed width, explode each interval to every bin it covers,
equi-join on (key, bin), then re-check the exact predicate. Each point is
compared only against intervals overlapping its bin, and the join is a
plain shuffled hash join on (key, bin) that AQE can size and skew-split.

Bin width trades duplication for selectivity: width ~ median interval
length keeps the per-interval explosion at ~2 bins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bin_range_join(
    points: DataFrame,
    intervals: DataFrame,
    keys: list[str],
    point_ts: str = "ts_ms",
    start_col: str = "start_ms",
    end_col: str = "end_ms",
    bin_ms: int = 3_600_000,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval (same ``keys``) with
    ``start <= ts < end``. ``how='left_outer'`` keeps intervals as the left
    side, preserving empty intervals (points columns null).
    """
    p_binned = points.withColumn("_bin", (F.col(point_ts) / bin_ms).cast("long"))
    i_binned = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                (F.col(start_col) / bin_ms).cast("long"),
                # end is exclusive: a zero-length or bin-aligned end must not
                # claim the next bin
                ((F.col(end_col) - 1) / bin_ms).cast("long"),
            )
        ),
    )
    on = [*keys, "_bin"]
    pred = (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    if how == "inner":
        return i_binned.join(p_binned, on=on, how="inner").filter(pred).drop("_bin")
    if how != "left_outer":
        raise ValueError(f"unsupported how={how!r}")
    # left_outer with a residual predicate must null-out the non-matching
    # point columns, then de-duplicate intervals that matched in several
    # bins-but-zero-points; simplest correct form: inner + anti union.
    inner = i_binned.join(p_binned, on=on, how="inner").filter(pred).drop("_bin")
    matched_keys = inner.select(*intervals.columns).distinct()
    unmatched = intervals.join(matched_keys, on=intervals.columns, how="left_anti")
    point_cols = [c for c in p_binned.columns if c not in set(on)]
    empty = unmatched.withColumns(
        {c: F.lit(None).cast(p_binned.schema[c].dataType) for c in point_cols}
    )
    return inner.unionByName(empty.select(*inner.columns))
