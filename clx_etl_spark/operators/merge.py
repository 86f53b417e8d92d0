"""Time-series merge operators (SURVEY J2/U1 + the as-of generalization).

The reference merges 2-3 sentiment sub-feeds by building the sorted union
of their (aligned) timestamps and stitching dicts with missing-side nulls
(reference: src/exchanges/binance/perp.py:168-184). That is exactly an
n-way full outer join on the aligned time bucket.

``asof_join`` is the natural generalization (SURVEY §2.5 note): for each
left row, the most recent right row at-or-before its timestamp within a
tolerance — expressed shuffle-lean as a union + last(ignorenulls) window,
which scales where a range-join would explode.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F


def full_outer_merge(
    feeds: dict[str, DataFrame],
    keys: list[str],
) -> DataFrame:
    """N-way full outer join on ``keys``; every non-key column is prefixed
    with its feed name. Missing sides yield nulls (J2 semantics)."""
    prefixed = []
    for name, df in feeds.items():
        cols = [F.col(c).alias(f"{name}_{c}") for c in df.columns if c not in keys]
        prefixed.append(df.select(*keys, *cols))
    return reduce(lambda a, b: a.join(b, on=keys, how="full_outer"), prefixed)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_ms: int | None = None,
    right_cols: list[str] | None = None,
) -> DataFrame:
    """As-of (backward) join: latest right row with right_ts <= left_ts.

    Implemented as tagged union + last(..., ignorenulls=True) over a window
    ordered by time — one shuffle on the key columns, no range-explosion;
    survives skewed keys far better than a theta-join at scale.
    """
    right_cols = right_cols or [c for c in right.columns if c not in keys and c != right_ts]
    l = left.withColumn("_side", F.lit(1)).withColumn("_t", F.col(left_ts).cast("long"))
    r = right.withColumn("_side", F.lit(0)).withColumn("_t", F.col(right_ts).cast("long"))
    l = l.select(
        *keys, "_t", "_side",
        F.struct(*[F.col(c) for c in left.columns if c not in keys]).alias("_lrow"),
        F.lit(None).cast("long").alias("_rts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_cols],
    )
    r = r.select(
        *keys, "_t", "_side",
        F.lit(None).cast(l.schema["_lrow"].dataType.simpleString()).alias("_lrow"),
        F.col("_t").alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    u = l.unionByName(r)
    # right rows sort before left rows at the same timestamp (side 0 < 1),
    # so an exact-tie right row is visible to the left row.
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *u.columns,
        F.last("_rts", ignorenulls=True).over(w).alias("_last_rts"),
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_f_{c}") for c in right_cols],
    ).filter(F.col("_side") == 1)
    if tolerance_ms is not None:
        in_tol = F.col("_last_rts").isNotNull() & (
            F.col("_t") - F.col("_last_rts") <= F.lit(tolerance_ms)
        )
    else:
        in_tol = F.col("_last_rts").isNotNull()
    out_cols = [F.col("_lrow")[c].alias(c) for c in left.columns if c not in keys]
    matched = [
        F.when(in_tol, F.col(f"_f_{c}")).otherwise(F.lit(None)).alias(c) for c in right_cols
    ]
    return filled.select(*keys, *out_cols, *matched)
