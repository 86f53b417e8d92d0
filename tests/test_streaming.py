"""Structured Streaming tests: file-drop micro-batches -> windowed aggs,
and foreachBatch + MERGE idempotence (at-least-once -> effectively-once)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from clx_etl_spark.streaming.jobs import file_stream, foreach_batch_upsert, windowed_counts

from . import fixtures as FX

SCHEMA = StructType(
    [
        StructField("k", LongType()),
        StructField("ts_ms", LongType()),
        StructField("event_type", StringType()),
    ]
)


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_stream_windowed_counts(spark, tmp_path):
    src = str(tmp_path / "in")
    _write_batch(
        spark,
        src,
        [(i, FX.BASE_TS + i * 60_000, "click" if i % 2 else "view") for i in range(20)],
    )
    stream = file_stream(spark, src, SCHEMA)
    agg = windowed_counts(
        stream.withColumn("event_time", F.timestamp_millis("ts_ms")),
        time_col="event_time",
        window="5 minutes",
        keys=["event_type"],
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM win_counts").collect()
    assert sum(r.n for r in out) == 20
    assert {r.event_type for r in out} == {"click", "view"}
    # 20 minutes of data -> 4 windows per type
    assert len(out) == 8


def test_foreach_batch_upsert_effectively_once(spark, tmp_path):
    src = str(tmp_path / "in")
    target = str(tmp_path / "tbl")
    ckpt1, ckpt2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    rows = [(i % 5, FX.BASE_TS + i, "x") for i in range(25)]  # 5 distinct keys
    _write_batch(spark, src, rows)

    def run(ckpt):
        stream = file_stream(spark, src, SCHEMA)
        q = foreach_batch_upsert(stream, target, keys=["k"], checkpoint=ckpt)
        q.awaitTermination(120)

    run(ckpt1)
    n1 = spark.read.parquet(target).count()
    assert n1 == 5  # merged by key
    # replay the SAME data from a fresh checkpoint (simulated redelivery):
    # the idempotent merge converges to the same table
    run(ckpt2)
    assert spark.read.parquet(target).count() == 5
