"""Testdata catalog: load the driver's synthetic parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings. ``events.ts`` has shipped as two different
parquet encodings across driver rounds — TIMESTAMP(NANOS) (read as
epoch-nanos long via ``spark.sql.legacy.parquet.nanosAsLong``) and
``timestamp[us]`` (read as TIMESTAMP_NTZ on Spark 4.x). ``load_table``
branches on the dtype it actually got and canonicalizes either encoding to
the columns the operators use:

    ts_ms       epoch milliseconds (long)    — the reference's native unit
    event_time  TimestampType (UTC)          — the engine's canonical time

The DuckDB oracle reads the same file natively; oracle SQL uses
``epoch_ns(ts) // 1000000`` which yields the identical ms long for both
physical encodings.
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
        # Canonicalize once here so every operator downstream works in
        # ms / TimestampType, whatever physical encoding the parquet has.
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read as epoch-ns long (nanosAsLong conf).
            # NB: ts ~1.7e18 exceeds double's exact-integer range (2^53),
            # so float division would be off by ±1 ms — integer `div` only.
            df = df.withColumn("ts_ms", F.expr("ts div 1000000")).withColumn(
                "event_time", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif ts_type in ("timestamp", "timestamp_ntz"):
            # timestamp[us] parquet. Session TZ is UTC, so NTZ→LTZ cast is
            # exact and unix_micros gives the true epoch micros.
            df = df.withColumn(
                "event_time", F.col("ts").cast("timestamp")
            ).withColumn("ts_ms", F.expr("unix_micros(event_time) div 1000"))
        else:  # pragma: no cover - future driver drift
            raise TypeError(
                f"events.ts has unsupported dtype {ts_type!r}; expected "
                "bigint (nanos-as-long), timestamp, or timestamp_ntz"
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
