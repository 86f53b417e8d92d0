"""Testdata catalog: load the driver's synthetic parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings. ``events.ts`` is parquet TIMESTAMP(NANOS);
with ``spark.sql.legacy.parquet.nanosAsLong`` it reads as epoch-nanos long,
from which we derive the canonical columns the operators use:

    ts_ms       epoch milliseconds (long)    — the reference's native unit
    event_time  TimestampType (UTC)          — the engine's canonical time

The DuckDB oracle sees the same column as TIMESTAMP_NS; oracle SQL uses
``epoch_ns(ts)`` to reach the identical long.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    apply_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts arrives as epoch-ns long (nanosAsLong). Canonicalize once here
        # so every operator downstream works in ms / TimestampType.
        # NB: ts ~1.7e18 exceeds double's exact-integer range (2^53), so
        # float division here would be off by ±1 ms — integer `div` only.
        df = df.withColumn("ts_ms", F.expr("ts div 1000000")).withColumn(
            "event_time", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
