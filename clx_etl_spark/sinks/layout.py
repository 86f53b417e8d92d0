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
