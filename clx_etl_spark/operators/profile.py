"""Dataset profiling: per-column completeness and cardinality in ONE scan.

The data-quality audit every pipeline runs before trusting a new feed:
null counts catch broken field mappings (a normalizer writing NULLs), and
distinct counts catch key collapses (an id column suddenly constant).

Scale shape: a single aggregate pass computes count + n_nulls for every
column simultaneously (one scan, map-side combinable); exact distincts
add one Expand (rows x C) — acceptable for dimension-sized tables, and
``approx=True`` swaps in HLL (approx_count_distinct) for fact-scale
profiling where one pass over 100 TB is the budget. The wide 1-row
result is unpivoted to (column, metric) rows driver-side free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile_columns(
    df: DataFrame, cols: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct) per column, one scan."""
    cols = cols or df.columns
    distinct = (
        (lambda c: F.approx_count_distinct(c)) if approx
        else (lambda c: F.count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"_nulls_{c}"))
        aggs.append(distinct(c).alias(f"_dist_{c}"))
    row = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").cast("long").alias("n_rows"),
            F.col(f"_nulls_{c}").cast("long").alias("n_nulls"),
            F.col(f"_dist_{c}").cast("long").alias("n_distinct"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
