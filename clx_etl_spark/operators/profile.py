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


def equiwidth_histogram(
    df, value_col: str, group_col: str, n_bins: int = 20
):
    """Exact equi-width histogram per group: bin bounds from ONE grouped
    min/max aggregate broadcast back onto the scan, assignment via
    width_bucket (identical semantics in Spark and DuckDB), so the whole
    profile is two map-side-combinable aggregates — no sort, no
    percentile state. Values == max land in the top bin (width_bucket's
    overflow bin n+1 is folded down), degenerate groups (min == max)
    collapse to bin 1.

    Returns (group, bin, lo, hi, n) with 1-based contiguous-ish bins
    (empty bins are absent — the reader joins against a bin spine if it
    needs zeros)."""
    from pyspark.sql import functions as F

    b = df.groupBy(group_col).agg(
        F.min(value_col).alias("_lo"), F.max(value_col).alias("_hi")
    )
    d = df.join(F.broadcast(b), group_col)
    # explicit width_bucket arithmetic (not the builtin — DuckDB lacks
    # it): 1 + floor((v-lo)/(hi-lo) * n), clamped; plain IEEE ops are
    # bit-identical across engines, which the oracle relies on
    frac = (F.col(value_col) - F.col("_lo")).cast("double") / (
        F.col("_hi") - F.col("_lo")
    ).cast("double")
    bin_ = F.when(F.col("_hi") == F.col("_lo"), F.lit(1).cast("long")).otherwise(
        F.least(
            F.lit(1).cast("long")
            + F.floor(frac * F.lit(float(n_bins))).cast("long"),
            F.lit(n_bins).cast("long"),
        )
    )
    return (
        d.select(group_col, bin_.alias("bin"))
        .groupBy(group_col, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def trend_slope(df, x_col: str, y_col: str, group_col: str):
    """Per-group least-squares slope/intercept of y over x in ONE grouped
    pass — the monitoring primitive for drift ("is quality dropping over
    time per source?").

    Exactness design (what makes this hash-match a second engine):
      * x must be INTEGRAL (pre-bucket time to hours/days) and is
        CENTERED per group (x - min(x)) so magnitudes stay small — slope
        is shift-invariant;
      * y is quantized to 1e-6 by floor(y * 1e6) (deterministic double
        multiply + floor, documented 1e-6 quantization);
      * all five sufficient statistics are then pure BIGINT sums —
        order-independent, overflow-checked by construction (centered
        hours x micro-y x row count stays under 2^63);
      * each BIGINT converts to DOUBLE in ONE correctly-rounded step —
        unlike a wide DECIMAL(38,12) -> DOUBLE cast, which engines
        round through different intermediate paths (1-ulp drift);
      * the closed form runs on those doubles (IEEE-deterministic).
    Slope is NULL for degenerate groups (var(x) == 0); intercept is at
    the group's centered origin (x = group min)."""
    from pyspark.sql import functions as F

    Y_SCALE = 1_000_000
    mn = df.groupBy(group_col).agg(F.min(x_col).alias("_x0"))
    d = df.join(F.broadcast(mn), group_col)
    xc = (F.col(x_col) - F.col("_x0")).cast("long")
    y6 = F.floor(F.col(y_col).cast("double") * F.lit(float(Y_SCALE))).cast(
        "long"
    )
    agg = d.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(xc).alias("sx"),
        F.sum(y6).alias("sy6"),
        F.sum(xc * y6).alias("sxy6"),
        F.sum(xc * xc).alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy6 = F.col("sy6").cast("double")
    sxy6 = F.col("sxy6").cast("double")
    sxx = F.col("sxx").cast("double")
    denom = n * sxx - sx * sx
    slope = F.when(denom != 0, (n * sxy6 - sx * sy6) / denom / F.lit(float(Y_SCALE)))
    intercept = F.when(denom != 0, (sy6 / F.lit(float(Y_SCALE)) - slope * sx) / n)
    return agg.select(
        group_col,
        F.col("n"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )
