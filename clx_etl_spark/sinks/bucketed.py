"""Bucketed fact tables: co-located joins and aggregations (SURVEY §4).

At 100 TB the dominant cost of the reference's keyed workloads (gap scans,
ratio merges, per-key watermarks — all on (exchange_id, inst_type, symbol))
is re-shuffling the same fact table on the same key every job. Bucketing
fixes the layout once at write time: `bucketBy(N, keys)` hash-partitions
files on disk, so every later equi-join or groupBy on those keys reads
pre-partitioned data and Catalyst drops the Exchange entirely (verified by
tests/test_sinks.py::test_bucketed_join_avoids_shuffle).

Bucket count: ~(table size / 128 MB) rounded to a power of two; both sides
of a co-located join need the same count (or a divisor, with
spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_keys: list[str],
    n_buckets: int = 8,
    sort_keys: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.
    Sorting within buckets additionally enables merge-join without a sort
    step and better min/max pruning inside files."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_keys)
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
