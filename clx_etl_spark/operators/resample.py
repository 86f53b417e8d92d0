"""Time-series resampling (hypertable-rollup shape): derive coarser OHLCV
bars from finer ones in one grouped pass.

The reference maintains kline_1m/_1h/_1d as three independent API-fed tables
(reference: src/flows/sync_klines.py:62-82 registry; write sites
src/exchanges/_base_.py:300-311). An engine owning the storage derives
1h/1d FROM 1m instead — cheaper (no extra API pulls), always consistent,
and exactly a keyed tumbling-window aggregate:

  open  = value at the earliest row in the bucket   (min_by)
  close = value at the latest row in the bucket     (max_by)
  high/low/volume/count = max/min/sum/count

min_by/max_by need a totally-ordered key for determinism when two rows
share a timestamp — callers pass ``order_col`` built from (ts, unique id).
One shuffle on (keys, bucket); partials combine map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def resample_ohlcv(
    df: DataFrame,
    keys: list[str],
    interval_ms: int,
    ts_col: str = "ts_ms",
    price_col: str = "price",
    volume_col: str | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """Aggregate rows into ``interval_ms`` buckets per key. Returns
    (keys..., bucket_ms, open, high, low, close, n_ticks[, volume])."""
    order = F.col(order_col) if order_col else F.col(ts_col)
    bucket = (F.col(ts_col) - (F.col(ts_col) % F.lit(interval_ms))).alias("bucket_ms")
    aggs = [
        F.min_by(F.col(price_col), order).alias("open"),
        F.max(F.col(price_col)).alias("high"),
        F.min(F.col(price_col)).alias("low"),
        F.max_by(F.col(price_col), order).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    ]
    if volume_col:
        aggs.append(F.sum(F.col(volume_col)).alias("volume"))
    return df.groupBy(*keys, bucket).agg(*aggs)


def incremental_rollup(
    spark,
    new_rows: DataFrame,
    stored_fine_path: str,
    stored_coarse_path: str,
    keys: list[str],
    interval_ms: int,
    ts_col: str = "ts_ms",
    price_col: str = "price",
    volume_col: str | None = None,
    order_col: str | None = None,
) -> int:
    """Continuous-aggregate maintenance (the hypertable pattern): after
    ``new_rows`` land in the fine table, recompute ONLY the coarse
    buckets those rows touch and overwrite exactly those partitions of
    the coarse table.

    This is the shape that survives 100 TB: the naive alternative
    (re-aggregate the whole fine table) rewrites everything on every
    micro-batch, while this plan reads just the touched buckets' fine
    slice (partition-pruned semi-join on the bucket key), re-aggregates
    it, and overwrites only those ``bucket_ms`` partitions — the same
    scoped-overwrite discipline as plans/flows.integrity_repair. Late or
    amended fine rows are handled for free: their bucket is in the
    touched set, so the whole bucket is rebuilt from stored truth.
    Returns the number of touched buckets.
    """
    from ..sinks.upsert import overwrite_partitions

    bucket_of = lambda c: (F.col(c) - (F.col(c) % F.lit(interval_ms)))
    touched = (
        new_rows.select(bucket_of(ts_col).alias("bucket_ms"), *[F.col(k) for k in keys])
        .distinct()
    )
    fine = spark.read.parquet(stored_fine_path)
    scoped = fine.withColumn("bucket_ms", bucket_of(ts_col)).join(
        F.broadcast(touched), ["bucket_ms", *keys], "left_semi"
    )
    rolled = resample_ohlcv(
        scoped, keys, interval_ms, ts_col=ts_col,
        price_col=price_col, volume_col=volume_col, order_col=order_col,
    )
    n = touched.count()
    if n:
        overwrite_partitions(rolled, stored_coarse_path, ["bucket_ms"])
    return n
