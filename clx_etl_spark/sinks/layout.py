"""Data-layout maintenance: small-file compaction and sort-ordered rewrite.

The reference never faces this (Doris compacts internally; reference
StreamLoad just appends, src/databases/doris/__init__.py:164-239), but a
parquet/Delta lake ingesting micro-batches (sync_klines every hour, kalshi
every 60 s) fragments partitions into thousands of tiny files — at 100 TB
the listing cost and per-file open overhead dominate scans long before CPU
does. Compaction is therefore part of the engine's sink surface:

  compact_partitions  rewrite each partition's many small files into
                      advisory-sized ones via the AQE REBALANCE hint (the
                      same mechanism behind Delta optimized writes),
                      optionally sorting rows within files so min/max
                      footer stats become selective (parquet row-group
                      pruning on the sort columns)

Scale notes: REBALANCE lets AQE both coalesce tiny shuffle outputs and
split skewed ones to ``spark.sql.adaptive.advisoryPartitionSizeInBytes``,
so one job rights-sizes every partition regardless of skew between dates.
With ``sort_cols``, predicate pushdown on those columns skips whole row
groups — same PushedFilters in .explain(), a fraction of the bytes read.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def partition_file_stats(spark: SparkSession, path: str) -> dict[str, int]:
    """Count data files per partition directory (driver-side listing —
    fine for the per-table cadence compaction runs at)."""
    stats: dict[str, int] = {}
    for root, _dirs, files in os.walk(path):
        n = sum(1 for f in files if f.endswith(".parquet"))
        if n:
            rel = os.path.relpath(root, path)
            stats[rel if rel != "." else ""] = n
    return stats


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict[str, int]:
    """Rewrite a partitioned parquet table with right-sized files.

    ``REBALANCE(partition_cols)`` shuffles rows so AQE emits one task per
    ~``target_file_bytes`` of data within each partition value — merging
    micro-batch fragments and splitting hot partitions in the same job.
    Idempotent and atomic-ish: writes a sibling temp dir, then swaps.
    Returns {partition: n_files} after compaction.
    """
    df = spark.read.parquet(path)
    out = df.hint("rebalance", *partition_cols)
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    prev = spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes", None)
    spark.conf.set(
        "spark.sql.adaptive.advisoryPartitionSizeInBytes", str(target_file_bytes)
    )
    tmp = path.rstrip("/") + "._compact"
    try:
        out.write.mode("overwrite").partitionBy(*partition_cols).parquet(tmp)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
        else:
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", prev)
    shutil.rmtree(path)
    os.rename(tmp, path)
    spark.catalog.refreshByPath(path)
    return partition_file_stats(spark, path)


def zorder_key(cols, bits: int = 16, bounds: dict | None = None):
    """Morton (Z-order) interleave of 2+ numeric columns, as a pure
    column expression builder: each column is min-max scaled to a
    ``bits``-bit integer using the provided global bounds, then the bits
    are interleaved. Sorting files by this key gives every file a tight
    bounding box in ALL dimensions at once, so parquet min/max footer
    stats prune multi-dimensional predicates — a single-column sort only
    prunes its own column and leaves the others at full range.

    ``bounds``: {col: (min, max)} computed by the caller (one aggregate).
    Integer-only arithmetic after scaling; bits*len(cols) must be <= 63.
    """
    from pyspark.sql import functions as F

    if bits * len(cols) > 63:
        raise ValueError("interleaved key exceeds 63 bits")
    scaled = []
    for c in cols:
        lo, hi = bounds[c]
        span = float(hi) - float(lo) or 1.0
        frac = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span)
        q = F.least(
            F.greatest((frac * F.lit(float(2**bits))).cast("long"), F.lit(0)),
            F.lit(2**bits - 1),
        )
        scaled.append(q)
    key = F.lit(0).cast("long")
    ndim = len(cols)
    for b in range(bits):
        for d, q in enumerate(scaled):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(F.shiftleft(bit, b * ndim + d).cast("long"))
    return key


def zorder_layout(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Rewrite ``df`` Z-ordered on ``cols``: one aggregate for global
    bounds (a single collected row), range-partition by the morton key
    into ``n_files`` writers, sort within files. At cluster scale the
    same plan shape holds — bounds are one scalar row regardless of data
    size, and the range partitioner samples the key distribution."""
    from pyspark.sql import functions as F

    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_lo_{c}"), F.max(c).alias(f"_hi_{c}")]
    row = df.agg(*aggs).first()
    bounds = {c: (row[f"_lo_{c}"], row[f"_hi_{c}"]) for c in cols}
    keyed = df.withColumn("_z", zorder_key(cols, bits=bits, bounds=bounds))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
