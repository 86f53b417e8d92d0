"""Schema-strict CSV/JSON file sources with corrupt-record routing.

The reference only ever ingests REST JSON, but an engine users can switch
to must also read their file drops (vendor csv dumps, jsonl exports).
Principles at 100 TB:
  * ALWAYS pass an explicit schema — schema inference is a full extra
    pass over the data and non-deterministic under dirty rows.
  * PERMISSIVE + a _corrupt_record column, split into (clean, rejects):
    a bad row must surface in a dead-letter output, not abort the job
    (FAILFAST) or silently null out (DROPMALFORMED) — same posture as
    sources/adapters.split_corrupt_pages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

CORRUPT = "_corrupt_record"


def _split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    # Spark requires a cached/materialized-safe reference to the corrupt
    # column: filtering on it straight off the reader is unsupported, so
    # route through a checkpoint-free local materialization barrier
    df = df.cache()
    clean = df.filter(F.col(CORRUPT).isNull()).drop(CORRUPT)
    rejects = df.filter(F.col(CORRUPT).isNotNull()).select(
        F.col(CORRUPT).alias("raw")
    )
    return clean, rejects


def read_csv_strict(
    spark: SparkSession, path: str, schema: str, header: bool = True, **opts
) -> tuple[DataFrame, DataFrame]:
    """(clean, rejects) from a csv drop. ``schema`` is a DDL string; the
    corrupt column is appended automatically."""
    reader = (
        spark.read.schema(f"{schema}, {CORRUPT} string")
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return _split(reader.csv(path))


def read_jsonl_strict(
    spark: SparkSession, path: str, schema: str, **opts
) -> tuple[DataFrame, DataFrame]:
    """(clean, rejects) from a jsonl export."""
    reader = (
        spark.read.schema(f"{schema}, {CORRUPT} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return _split(reader.json(path))
