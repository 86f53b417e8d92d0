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


def test_streaming_gap_monitor_state_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-key watermark survives micro-batch
    boundaries (maxFilesPerTrigger=1 forces one batch per file)."""
    from clx_etl_spark.streaming.stateful import streaming_gap_monitor

    src = str(tmp_path / "in")
    MIN = 60_000
    # file 1: keys A,B contiguous bars 0..4
    _write_batch(
        spark, src,
        [(0, FX.BASE_TS + i * MIN, k) for k in ("A", "B") for i in range(5)],
    )
    # file 2: A resumes at bar 9 (gap of 5 bars), B stays contiguous 5..7
    _write_batch(
        spark, src,
        [(0, FX.BASE_TS + 9 * MIN, "A")] + [(0, FX.BASE_TS + i * MIN, "B") for i in (5, 6, 7)],
    )
    stream = (
        spark.readStream.format("parquet").schema(SCHEMA)
        .option("maxFilesPerTrigger", 1).load(src)
    )
    gaps = streaming_gap_monitor(stream, keys=["event_type"], ts_col="ts_ms", interval_ms=MIN)
    q = (
        gaps.writeStream.format("memory").queryName("gapmon")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM gapmon").collect()
    assert len(out) == 1  # only A gapped, and only once
    r = out[0]
    assert r.event_type == "A"
    assert r.prev_ts == FX.BASE_TS + 4 * MIN
    assert r.curr_ts == FX.BASE_TS + 9 * MIN
    assert r.gap_ms == 5 * MIN


def test_streaming_gap_monitor_state_survives_restart(spark, tmp_path):
    """State is checkpointed: a second run (same checkpoint) sees only new
    files but still detects the gap against the persisted watermark."""
    from clx_etl_spark.streaming.stateful import streaming_gap_monitor

    src, ckpt, out_dir = str(tmp_path / "in"), str(tmp_path / "ck"), str(tmp_path / "out")
    MIN = 60_000

    def run():
        # memory sink can't recover from a checkpoint; a file sink can
        stream = spark.readStream.format("parquet").schema(SCHEMA).load(src)
        gaps = streaming_gap_monitor(
            stream, keys=["event_type"], ts_col="ts_ms", interval_ms=MIN
        )
        q = (
            gaps.writeStream.format("parquet").option("path", out_dir)
            .outputMode("append").option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    _write_batch(spark, src, [(0, FX.BASE_TS + i * MIN, "A") for i in range(3)])
    run()
    assert spark.read.parquet(out_dir).count() == 0
    # restart with a jump: bar 2 -> bar 10
    _write_batch(spark, src, [(0, FX.BASE_TS + 10 * MIN, "A")])
    run()
    out = spark.read.parquet(out_dir).collect()
    assert len(out) == 1
    assert out[0].prev_ts == FX.BASE_TS + 2 * MIN and out[0].gap_ms == 8 * MIN


def test_stream_sliding_and_session_windows(spark, tmp_path):
    src = str(tmp_path / "in")
    MIN = 60_000
    # two activity bursts separated by 30 min of silence
    _write_batch(
        spark, src,
        [(i, FX.BASE_TS + i * MIN, "x") for i in range(10)]
        + [(i, FX.BASE_TS + (40 + i) * MIN, "x") for i in range(5)],
    )

    def collect(name, **kw):
        stream = file_stream(spark, src, SCHEMA).withColumn(
            "event_time", F.timestamp_millis("ts_ms")
        )
        agg = windowed_counts(stream, time_col="event_time", **kw)
        q = (
            agg.writeStream.format("memory").queryName(name)
            .outputMode("complete").trigger(availableNow=True).start()
        )
        q.awaitTermination(60)
        return spark.sql(f"SELECT * FROM {name}").collect()

    slid = collect("slide_counts", window="10 minutes", slide="5 minutes")
    # sliding: every event lands in exactly 2 windows
    assert sum(r.n for r in slid) == 30
    # session windows need a grouping key in streaming (no global session)
    sess = collect("session_counts", session_gap="15 minutes", keys=["event_type"])
    # the two bursts -> exactly two sessions, 10 + 5
    assert sorted(r.n for r in sess) == [5, 10]


def test_stream_dedup_within_watermark(spark, tmp_path):
    from clx_etl_spark.streaming.jobs import stream_dedup

    src = str(tmp_path / "in")
    MIN = 60_000
    # file 1: keys 0..9; file 2 redelivers 5..9 (same ts) + new 10..14
    _write_batch(spark, src, [(i, FX.BASE_TS + i * MIN, "x") for i in range(10)])
    _write_batch(
        spark, src,
        [(i, FX.BASE_TS + i * MIN, "x") for i in range(5, 15)],
    )
    stream = (
        spark.readStream.format("parquet").schema(SCHEMA)
        .option("maxFilesPerTrigger", 1).load(src)
        .withColumn("event_time", F.timestamp_millis("ts_ms"))
    )
    deduped = stream_dedup(stream, keys=["k"], time_col="event_time", watermark="1 hour")
    q = (
        deduped.writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT k FROM dedup_stream").collect()
    ks = sorted(r.k for r in out)
    assert ks == list(range(15))  # redelivered 5..9 dropped exactly once


def test_streaming_ingest_pipeline_end_to_end(spark, tmp_path):
    """The reference's ingest loop in streaming form: raw keyed-dict bars
    arrive as file drops -> normalize (cast/alias, same transform code as
    batch) -> watermarked dedup -> foreachBatch idempotent MERGE. Rerunning
    with redelivered + late data converges to the same stored table."""
    from clx_etl_spark.streaming.jobs import foreach_batch_upsert, stream_dedup

    src, tgt = str(tmp_path / "raw"), str(tmp_path / "kline")
    ck1, ck2 = str(tmp_path / "c1"), str(tmp_path / "c2")
    MIN = 60_000
    raw_schema = StructType(
        [
            StructField("t", LongType()),
            StructField("o", StringType()),
            StructField("c", StringType()),
            StructField("sym", StringType()),
        ]
    )

    def drop_file(rows):
        spark.createDataFrame(rows, raw_schema).coalesce(1).write.mode("append").parquet(src)

    bars1 = [(FX.BASE_TS + i * MIN, f"{100+i}.0", f"{101+i}.0", "BTC") for i in range(10)]
    drop_file(bars1)
    drop_file(bars1[5:] + [(FX.BASE_TS + 10 * MIN, "110.0", "111.0", "BTC")])  # redelivery + 1 new

    def run(ckpt):
        stream = (
            spark.readStream.format("parquet").schema(raw_schema)
            .option("maxFilesPerTrigger", 1).load(src)
        )
        normalized = stream.select(  # keyed-dict normalize: rename + decimal cast
            F.col("sym").alias("symbol"),
            F.col("t").alias("ts"),
            F.timestamp_millis("t").alias("event_time"),
            F.col("o").cast("decimal(38,18)").alias("open"),
            F.col("c").cast("decimal(38,18)").alias("close"),
        )
        deduped = stream_dedup(normalized, keys=["symbol", "ts"], time_col="event_time")
        q = foreach_batch_upsert(
            deduped.drop("event_time"), tgt, keys=["symbol", "ts"], checkpoint=ckpt
        )
        q.awaitTermination(180)

    run(ck1)
    stored = spark.read.parquet(tgt)
    assert stored.count() == 11  # 10 + 1 new, redelivery absorbed
    total1 = stored.agg(F.sum(F.col("open").cast("double"))).first()[0]
    # full replay from scratch (fresh checkpoint): converges, not duplicates
    run(ck2)
    stored2 = spark.read.parquet(tgt)
    assert stored2.count() == 11
    assert stored2.agg(F.sum(F.col("open").cast("double"))).first()[0] == total1


def test_streaming_ohlcv_matches_batch_resample(spark, tmp_path):
    """The streaming rollup must produce the same bars as the batch
    resample operator over the same ticks (semantic parity between the
    two late-data layers), including an out-of-order tick amending its
    in-horizon bar."""
    from clx_etl_spark.operators.resample import resample_ohlcv
    from clx_etl_spark.streaming.jobs import streaming_ohlcv

    src = str(tmp_path / "ticks")
    rows = [(i, FX.BASE_TS + i * 10_000, "BTC", 100.0 + (i * 7 % 13)) for i in range(60)]
    rows.append((99, FX.BASE_TS + 5_000, "BTC", 50.0))  # late, out of order
    spark.createDataFrame(
        rows, "event_id long, ts_ms long, symbol string, price double"
    ).write.parquet(src)

    stream = file_stream(
        spark, src, "event_id long, ts_ms long, symbol string, price double"
    ).withColumn("event_time", F.timestamp_millis("ts_ms"))
    bars = streaming_ohlcv(
        stream, keys=["symbol"], time_col="event_time", window="1 minute"
    )
    q = (
        bars.writeStream.format("memory")
        .queryName("stream_bars")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r.symbol, r.bar_start): (r.open, r.high, r.low, r.close, r.n_ticks)
        for r in spark.sql("SELECT * FROM stream_bars").collect()
    }
    batch = resample_ohlcv(
        spark.read.parquet(src).select("symbol", "ts_ms", "price"),
        keys=["symbol"], interval_ms=60_000, ts_col="ts_ms",
    ).collect()
    import datetime as dt

    want = {
        (r.symbol, dt.datetime.fromtimestamp(r.bucket_ms / 1000, dt.timezone.utc).replace(tzinfo=None)):
        (r.open, r.high, r.low, r.close, r.n_ticks)
        for r in batch
    }
    assert got == want
    # the out-of-order tick really landed in its bar (6 on-time + 1 late)
    first_bar = min(got)
    assert got[first_bar][4] == 7
    assert got[first_bar][2] == 50.0  # ...and is the bar's low


# --- live REST tail as a streaming source (clx_rest streamReader) ----------

_TAIL_SCHEMA = "symbol string, exchange_id int, ts long, close string"


def _run_tail(spark, ckpt, out, now_ms, max_bars=4, start_ms=FX.BASE_TS):
    from clx_etl_spark.sources.datasource import stream_rest

    df = stream_rest(
        spark,
        keys=[
            {"symbol": "BTCUSDT", "exchange_id": 1},
            {"symbol": "ETHUSDT", "exchange_id": 1},
        ],
        transport="tests.fixtures:rest_transport",
        out_schema=_TAIL_SCHEMA,
        interval_ms=FX.MIN,
        start_ms=start_ms,
        max_bars_per_batch=max_bars,
        now_ms=now_ms,
    )
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_stream_rest_tail_catches_up_in_bounded_batches(spark, tmp_path):
    """Cursor starts 10 bars behind 'now': the tail must deliver exactly
    the 10 closed bars per symbol, paged through max 4-bar micro-batches
    (the rate-limit budget), each bar exactly once."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_tail(spark, ckpt, out, now_ms=FX.BASE_TS + 10 * FX.MIN + 7, max_bars=4)
    rows = spark.read.schema(_TAIL_SCHEMA).parquet(out).collect()
    per_sym = {}
    for r in rows:
        per_sym.setdefault(r.symbol, set()).add(r.ts)
    expect = {FX.BASE_TS + i * FX.MIN for i in range(10)}  # [start, now_aligned)
    assert per_sym == {"BTCUSDT": expect, "ETHUSDT": expect}
    assert len(rows) == 20  # no duplicate delivery across micro-batches


def test_stream_rest_tail_resumes_from_checkpoint(spark, tmp_path):
    """Restarting with the same checkpoint and a later clock appends only
    the new bars — the cursor is a real checkpointed offset."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _run_tail(spark, ckpt, out, now_ms=FX.BASE_TS + 5 * FX.MIN)
    _run_tail(spark, ckpt, out, now_ms=FX.BASE_TS + 8 * FX.MIN)
    rows = spark.read.schema(_TAIL_SCHEMA).parquet(out).collect()
    per_sym = {}
    for r in rows:
        per_sym.setdefault(r.symbol, []).append(r.ts)
    expect = sorted(FX.BASE_TS + i * FX.MIN for i in range(8))
    assert sorted(per_sym["BTCUSDT"]) == expect  # once each, no overlap
    assert sorted(per_sym["ETHUSDT"]) == expect


def test_stream_rest_tail_survives_transient_transport_failures(spark, tmp_path):
    """Every fetch window fails its first attempt; the executor-side
    retry budget (reference: 3 tries) absorbs it and the stream still
    delivers every bar exactly once."""
    import shutil

    shutil.rmtree("/tmp/clx_flaky", ignore_errors=True)
    from clx_etl_spark.sources.datasource import stream_rest

    df = stream_rest(
        spark,
        keys=[{"symbol": "BTCUSDT", "exchange_id": 1}],
        transport="tests.fixtures:flaky_transport",
        out_schema=_TAIL_SCHEMA,
        interval_ms=FX.MIN,
        start_ms=FX.BASE_TS,
        max_bars_per_batch=3,
        now_ms=FX.BASE_TS + 6 * FX.MIN,
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        shutil.rmtree("/tmp/clx_flaky", ignore_errors=True)
    got = sorted(
        r.ts for r in spark.read.schema(_TAIL_SCHEMA).parquet(out).collect()
    )
    assert got == [FX.BASE_TS + i * FX.MIN for i in range(6)]


def test_stream_trending_terms_per_window(spark, tmp_path):
    """Streaming corpus analytics: doc stream -> explode tokens ->
    watermarked tumbling-window counts; 'trending' = per-window top term.
    Late tokens within the watermark still land in their window."""
    src = str(tmp_path / "docs")
    doc_schema = "doc_id long, ts_ms long, text string"
    rows1 = [(1, FX.BASE_TS + 10_000, "spark spark window"),
             (2, FX.BASE_TS + 20_000, "spark hash"),
             (3, FX.BASE_TS + 70_000, "hash hash hash window")]
    spark.createDataFrame(rows1, doc_schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(doc_schema).parquet(src)
        .withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
        .withWatermark("ts", "10 minutes")
        .select(F.col("ts"), F.explode(F.split("text", r"\s+")).alias("term"))
        .groupBy(F.window("ts", "1 minute"), F.col("term"))
        .count()
    )
    out = str(tmp_path / "counts")
    q = (
        stream.writeStream.outputMode("complete").format("memory")
        .queryName("trending").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = {
        (r["window"].start.minute, r["term"]): r["count"]
        for r in spark.sql("select * from trending").collect()
    }
    assert got[(0, "spark")] == 3 and got[(0, "window")] == 1
    assert got[(1, "hash")] == 3 and got[(1, "window")] == 1
    top = {}
    for (minute, term), n in got.items():
        if minute not in top or (n, term) > (top[minute][1], top[minute][0]):
            top[minute] = (term, n)
    assert top[0][0] == "spark" and top[1][0] == "hash"


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream join: clicks enrich with the impression
    that preceded them by <= 2 minutes (interval condition). State on
    both sides is bounded by the watermark — the Structured Streaming
    capability behind funnel/attribution at 100 TB/day event volumes."""
    imp_src = str(tmp_path / "imp")
    clk_src = str(tmp_path / "clk")
    imp_schema = "imp_id long, user_id long, imp_ms long"
    clk_schema = "clk_id long, user_id long, clk_ms long"
    spark.createDataFrame(
        [(1, 10, FX.BASE_TS), (2, 20, FX.BASE_TS + 30_000),
         (3, 10, FX.BASE_TS + 300_000)],
        imp_schema,
    ).coalesce(1).write.parquet(imp_src)
    spark.createDataFrame(
        [(100, 10, FX.BASE_TS + 60_000),     # joins imp 1 (60s later)
         (200, 20, FX.BASE_TS + 200_000),    # too late after imp 2 (170s)
         (300, 10, FX.BASE_TS + 310_000)],   # joins imp 3 (10s later)
        clk_schema,
    ).coalesce(1).write.parquet(clk_src)

    imps = (
        spark.readStream.schema(imp_schema).parquet(imp_src)
        .withColumn("imp_ts", F.timestamp_millis("imp_ms"))
        .withWatermark("imp_ts", "10 minutes")
    )
    clks = (
        spark.readStream.schema(clk_schema).parquet(clk_src)
        .withColumn("clk_ts", F.timestamp_millis("clk_ms"))
        .withWatermark("clk_ts", "10 minutes")
    )
    joined = clks.join(
        imps,
        (clks.user_id == imps.user_id)
        & (F.col("clk_ts") >= F.col("imp_ts"))
        & (F.col("clk_ts") <= F.col("imp_ts") + F.expr("interval 2 minutes")),
    )
    q = (
        joined.select("clk_id", "imp_id")
        .writeStream.outputMode("append").format("memory")
        .queryName("attrib").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.clk_id, r.imp_id) for r in spark.sql("select * from attrib").collect()}
    assert got == {(100, 1), (300, 3)}


def test_streaming_ema_matches_batch_recursion_across_restarts(spark, tmp_path):
    """Online EMA: state carries across micro-batches AND a query
    restart; the streamed result equals the single-pass batch recursion
    over the full history."""
    from clx_etl_spark.streaming.stateful import streaming_ema

    src = str(tmp_path / "ticks")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "symbol string, ts_ms long, price double"
    ticks1 = [("BTC", FX.BASE_TS + i * 1000, 100.0 + i) for i in range(5)]
    ticks2 = [("BTC", FX.BASE_TS + i * 1000, 100.0 + i) for i in range(5, 9)]

    def run():
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            streaming_ema(stream, ["symbol"], value_col="price", alpha=0.5)
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    spark.createDataFrame(ticks1, schema).coalesce(1).write.mode("append").parquet(src)
    run()
    spark.createDataFrame(ticks2, schema).coalesce(1).write.mode("append").parquet(src)
    run()  # fresh query, same checkpoint -> state restored

    got = {
        r.ts: r.ema
        for r in spark.read.schema(
            "symbol string, ts long, value double, ema double"
        ).parquet(out).collect()
    }
    ema, expect = None, {}
    for ts, v in [(t, p) for _, t, p in ticks1 + ticks2]:
        ema = v if ema is None else 0.5 * v + 0.5 * ema
        expect[ts] = ema
    assert got == expect  # exact: same float recursion order


# --- stateDir sidecar: restart floor recovery + stale-sidecar safety -------


def _tail_reader(spark, state_dir, now_ms, max_bars=4, start_ms=FX.BASE_TS):
    from pyspark.sql.types import StructType

    from clx_etl_spark.sources.datasource import RestStreamReader

    return RestStreamReader(
        StructType.fromDDL(_TAIL_SCHEMA),
        {
            "keys": '[{"symbol": "BTCUSDT", "exchange_id": 1}]',
            "transport": "tests.fixtures:rest_transport",
            "intervalms": str(FX.MIN),
            "startms": str(start_ms),
            "maxbarsperbatch": str(max_bars),
            "nowms": str(now_ms),
            "statedir": str(state_dir),
        },
    )


def test_state_dir_restores_floor_after_restart(spark, tmp_path):
    """commit() persists the cursor; a fresh reader over the same stateDir
    (in-memory cursor lost, i.e. a restart) recovers the floor so its next
    window is restored + maxBars*interval — NOT the unbounded aligned-now
    catch-up (the feature's whole point)."""
    now = FX.BASE_TS + 100 * FX.MIN
    r1 = _tail_reader(spark, tmp_path, now)
    r1.initialOffset()
    end1 = r1.latestOffset()
    assert end1["cursor"] == FX.BASE_TS + 4 * FX.MIN  # capped
    r1.commit(end1)

    r2 = _tail_reader(spark, tmp_path, now)  # restart: cursor is None
    end2 = r2.latestOffset()
    assert end2["cursor"] == FX.BASE_TS + 8 * FX.MIN  # restored + cap


def test_state_dir_stale_sidecar_never_replans_committed_windows(spark, tmp_path):
    """Spark writes its commit log before source.commit(), so a crash in
    that window leaves the sidecar BEHIND the checkpoint. The restored
    cursor must clamp forward to the checkpointed start: no batch may
    re-fetch a window the checkpoint already committed (silent duplicates
    on non-idempotent sinks)."""
    import json as _json

    ckpt_start = FX.BASE_TS + 10 * FX.MIN
    with open(tmp_path / "rest_cursor.json", "w") as f:
        _json.dump({"cursor": FX.BASE_TS}, f)  # stale: 10 bars behind

    r = _tail_reader(spark, tmp_path, FX.BASE_TS + 100 * FX.MIN)
    end = r.latestOffset()  # plans from the stale floor
    parts = r.partitions({"cursor": ckpt_start}, end)
    assert parts == []  # end precedes the checkpointed start -> no refetch
    end2 = r.latestOffset()
    assert end2["cursor"] > ckpt_start  # floor clamped forward
    parts2 = r.partitions({"cursor": ckpt_start}, end2)
    assert parts2 and all(p.start_ms >= ckpt_start for p in parts2)


def test_state_dir_malformed_sidecar_degrades_gracefully(spark, tmp_path):
    """null cursor / non-dict JSON / garbage must fall back to the
    documented unbounded-window degradation, not crash latestOffset."""
    aligned_now = FX.BASE_TS + 100 * FX.MIN
    for content in ('{"cursor": null}', "[1, 2, 3]", "not json at all"):
        (tmp_path / "rest_cursor.json").write_text(content)
        r = _tail_reader(spark, tmp_path, aligned_now)
        assert r.latestOffset()["cursor"] == aligned_now


def test_stream_rest_restart_batches_stay_capped_end_to_end(spark, tmp_path):
    """Integration (ADVICE low): kill a stream_rest query mid-backfill,
    restart it 45 bars behind, and assert every planned micro-batch window
    in the checkpoint offset log is capped at maxBarsPerBatch."""
    import json as _json
    import re as _re

    from clx_etl_spark.sources.datasource import stream_rest

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    def run(now_ms):
        df = stream_rest(
            spark,
            keys=[{"symbol": "BTCUSDT", "exchange_id": 1}],
            transport="tests.fixtures:rest_transport",
            out_schema=_TAIL_SCHEMA,
            interval_ms=FX.MIN,
            start_ms=FX.BASE_TS,
            max_bars_per_batch=4,
            now_ms=now_ms,
            state_dir=state,
        )
        q = (
            df.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(FX.BASE_TS + 5 * FX.MIN)   # partial backfill, then "crash"
    run(FX.BASE_TS + 50 * FX.MIN)  # restart far behind

    # every consecutive offset delta in the checkpoint log <= cap
    import os as _os

    cursors = []
    off_dir = _os.path.join(ckpt, "offsets")
    for fname in sorted(_os.listdir(off_dir), key=lambda s: int(s) if s.isdigit() else -1):
        if not fname.isdigit():
            continue
        with open(_os.path.join(off_dir, fname)) as f:
            for line in f:
                m = _re.search(r'\{"cursor":\s*(\d+)\}', line)
                if m:
                    cursors.append(int(m.group(1)))
    assert cursors, "no offsets parsed from checkpoint log"
    deltas = [b - a for a, b in zip(cursors, cursors[1:])]
    assert all(d <= 4 * FX.MIN for d in deltas), deltas
    # and delivery is still exactly-once across the restart
    rows = spark.read.schema(_TAIL_SCHEMA).parquet(out).collect()
    assert sorted(r.ts for r in rows) == [FX.BASE_TS + i * FX.MIN for i in range(50)]


def test_streaming_corpus_ingest_with_incremental_dedup_gate(spark, tmp_path):
    """Continuous corpus building: document batches stream in, each
    micro-batch is matched against the PERSISTED corpus near-dup index
    (never corpus x corpus), near-dups of already-stored docs are dropped,
    and fresh docs land. Exactly the production compose: readStream ->
    foreachBatch(incremental_near_duplicates(corpus_index=...) -> anti-join
    -> append)."""
    from clx_etl_spark.operators.dedup import (
        build_near_dup_index, incremental_near_duplicates,
    )

    src, tgt = str(tmp_path / "in"), str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    seed = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "established corpus content that is already stored here safely"),
    ]
    spark.createDataFrame(seed, schema).write.parquet(tgt)
    sh, idx = build_near_dup_index(spark.read.parquet(tgt))

    def drop_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    drop_file(
        [
            (10, "the quick brown fox jumps over the lazy dog"),   # dup of 1
            (11, "genuinely novel incoming document with fresh words"),
        ]
    )
    drop_file([(12, "established corpus content that is already stored here safely")])

    def gate(batch, batch_id):
        if not batch.count():
            return
        dups = incremental_near_duplicates(None, batch, corpus_index=(sh, idx))
        fresh = batch.join(dups.select("doc_id"), "doc_id", "left_anti")
        fresh.write.mode("append").parquet(tgt)

    q = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", 1).load(src)
        .writeStream.foreachBatch(gate)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    stored = sorted(r.doc_id for r in spark.read.parquet(tgt).collect())
    assert stored == [1, 2, 11]  # dups 10 and 12 gated out, fresh 11 landed


def test_gated_ingest_quarantines_dirty_rows(spark, tmp_path):
    """Expectation-gated streaming ingest: clean rows MERGE into the
    table, violating rows (incl. null-verdict satisfies()) land in the
    quarantine — nothing vanishes, re-runs stay idempotent."""
    from clx_etl_spark.operators import expectations as E
    from clx_etl_spark.streaming.jobs import file_stream, gated_ingest

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (3, None), (4, 7.0)],
        "id long, amt double",
    ).write.parquet(src)
    stream = file_stream(spark, src, "id long, amt double")
    q = gated_ingest(
        stream,
        [E.accepted_range("amt", 0.0, 10.0), E.satisfies("amt_odd_ok", F.col("amt") != 5.0)],
        path=str(tmp_path / "table"),
        keys=["id"],
        checkpoint=str(tmp_path / "ckpt"),
        quarantine_path=str(tmp_path / "quarantine"),
    )
    q.awaitTermination(60)
    table = {r.id for r in spark.read.parquet(str(tmp_path / "table")).collect()}
    quarantined = {r.id for r in spark.read.parquet(str(tmp_path / "quarantine")).collect()}
    assert table == {4}            # 5.0 fails satisfies, -1 range, None null-verdict
    assert quarantined == {1, 2, 3}


def test_cdc_apply_stream_materializes_and_deletes(spark, tmp_path):
    """Streaming changelog -> table: upsert-winners MERGE, delete-winners
    physically remove their key; replaying a batch converges (idempotent
    both legs)."""
    from clx_etl_spark.streaming.jobs import cdc_apply_stream, file_stream

    src = str(tmp_path / "log")
    target = str(tmp_path / "tbl")
    schema = "k long, ts long, seq long, op string, v double"

    def run(ckpt):
        stream = file_stream(spark, src, schema)
        q = cdc_apply_stream(
            stream, target, keys=["k"], ts_col="ts",
            checkpoint=str(tmp_path / ckpt), order_cols=["seq"],
        )
        q.awaitTermination(120)

    b1 = [(1, 10, 1, "I", 1.0), (2, 10, 2, "I", 2.0), (3, 10, 3, "I", 3.0)]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    run("c1")
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: 1.0, 2: 2.0, 3: 3.0}

    b2 = [(1, 20, 4, "U", 9.0), (2, 20, 5, "D", 0.0), (4, 20, 6, "I", 4.0)]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    run("c1")
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: 9.0, 3: 3.0, 4: 4.0}, got

    # redelivery from a fresh checkpoint: same final state
    run("c2")
    got = {r.k: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: 9.0, 3: 3.0, 4: 4.0}


def test_cdc_apply_stream_partitioned_delete_scoped(spark, tmp_path):
    """Partitioned target: deletes rewrite only touched partitions, a
    fully-emptied partition's directory is dropped (dynamic overwrite
    alone would leave it behind), and untouched partitions keep their
    files byte-identical."""
    import os

    from clx_etl_spark.streaming.jobs import cdc_apply_stream, file_stream

    src = str(tmp_path / "log")
    target = str(tmp_path / "tbl")
    schema = "k long, ts long, seq long, op string, v double, p string"

    def run(ckpt):
        q = cdc_apply_stream(
            file_stream(spark, src, schema), target, keys=["k"],
            ts_col="ts", checkpoint=str(tmp_path / ckpt),
            order_cols=["seq"], partition_cols=["p"],
        )
        q.awaitTermination(120)

    b1 = [
        (1, 10, 1, "I", 1.0, "a"), (2, 10, 2, "I", 2.0, "a"),
        (3, 10, 3, "I", 3.0, "b"),   # partition b: only key 3
        (4, 10, 4, "I", 4.0, "c"),
    ]
    spark.createDataFrame(b1, schema).write.mode("append").parquet(src)
    run("c1")
    assert os.path.isdir(os.path.join(target, "p=b"))
    c_files = sorted(os.listdir(os.path.join(target, "p=c")))
    c_mtime = [
        os.path.getmtime(os.path.join(target, "p=c", f)) for f in c_files
    ]

    # delete key 1 (partition a keeps key 2) and key 3 (empties partition b)
    b2 = [(1, 20, 5, "D", 0.0, "a"), (3, 20, 6, "D", 0.0, "b")]
    spark.createDataFrame(b2, schema).write.mode("append").parquet(src)
    run("c1")
    got = {(r.k, r.p) for r in spark.read.parquet(target).collect()}
    assert got == {(2, "a"), (4, "c")}
    assert not os.path.isdir(os.path.join(target, "p=b"))  # dropped
    # untouched partition c: same files, untouched mtimes
    assert sorted(os.listdir(os.path.join(target, "p=c"))) == c_files
    assert [
        os.path.getmtime(os.path.join(target, "p=c", f)) for f in c_files
    ] == c_mtime


def test_rollup_stream_incremental_and_replay_safe(spark, tmp_path):
    """Streaming incremental rollup: micro-batches merge into the stored
    daily rollup; a full-stream replay from a fresh checkpoint is a
    no-op thanks to the per-batch_id marker guard (additive sinks are
    NOT naturally idempotent — this is the transactional-sink pattern)."""
    import glob
    import os

    from pyspark.sql.types import DoubleType

    from clx_etl_spark.operators.incremental import partial_daily_state
    from clx_etl_spark.streaming.jobs import rollup_stream

    schema = StructType(
        [
            StructField("ts_ms", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    src = str(tmp_path / "in")
    rollup = str(tmp_path / "rollup")
    rows = [
        (FX.BASE_TS + d * 86_400_000 + i, "click" if i % 2 else "view", float(i))
        for d in range(3)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows, schema)
    # three files -> maxFilesPerTrigger=1 gives three micro-batches
    for d in range(3):
        df.filter(F.expr(f"ts_ms div 86400000 = {FX.BASE_TS // 86_400_000 + d}")) \
          .coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    ckpt = str(tmp_path / "c1")
    q = rollup_stream(stream, rollup, checkpoint=ckpt)
    q.awaitTermination(120)

    got = {
        (r.day_id, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v)
        for r in spark.read.parquet(rollup).collect()
    }
    want = {
        (r.day_id, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v)
        for r in partial_daily_state(df).collect()
    }
    assert got == want
    # the applied-id marker lives INSIDE the rollup dir (committed by the
    # same atomic rename as the data — no marker-less-commit crash window)
    markers = glob.glob(os.path.join(rollup, "_applied_*.json"))
    assert len(markers) == 1

    # crash-replay: re-deliver an ALREADY-APPLIED batch id through the
    # same checkpoint lineage's sink (foreachBatch is at-least-once) —
    # the marker guard makes it a no-op, no double counting
    from clx_etl_spark.streaming.jobs import make_rollup_sink

    sink = make_rollup_sink(rollup, ckpt)
    sink(df.limit(10), 0)
    got2 = {
        (r.day_id, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v)
        for r in spark.read.parquet(rollup).collect()
    }
    assert got2 == want
    # a DIFFERENT checkpoint lineage gets its own marker namespace: its
    # batch 0 is not swallowed by this query's batch-0 marker — and the
    # swap carries the first lineage's marker forward
    other = make_rollup_sink(rollup, str(tmp_path / "c_other"))
    extra_rows = [(FX.BASE_TS + 3 * 86_400_000, "view", 1.0)]
    other(spark.createDataFrame(extra_rows, schema), 0)
    n_after = spark.read.parquet(rollup).count()
    assert n_after == len(want) + 1
    assert len(glob.glob(os.path.join(rollup, "_applied_*.json"))) == 2
    sink(df.limit(10), 0)  # first lineage's ids survived the second swap
    assert spark.read.parquet(rollup).count() == n_after

    # crash window: staged commit completed but the rename-swap was
    # interrupted. Simulate by demoting the committed rollup to the
    # staged path — the next sink call must promote it and then treat
    # the replayed batch as applied (marker traveled with the data).
    staged = rollup + "._staged"
    os.rename(rollup, staged)
    sink(df.limit(10), 2)  # batch 2 was applied pre-"crash"
    assert os.path.exists(rollup) and not os.path.exists(staged)
    got3 = {
        (r.day_id, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v)
        for r in spark.read.parquet(rollup).filter("day_id < %d" % (FX.BASE_TS // 86_400_000 + 3)).collect()
    }
    assert got3 == want


def test_streaming_sessionizer_closes_on_gap_across_batches(spark, tmp_path):
    """Sessions split on the inactivity gap even when the two halves
    arrive in different micro-batches (state carries session_start /
    last_ts / count), and match the batch islands sessionization."""
    from clx_etl_spark.streaming.stateful import streaming_sessionizer

    schema = StructType(
        [StructField("k", LongType()), StructField("ts_ms", LongType())]
    )
    src = str(tmp_path / "in")
    G = 1_800_000
    # key 1: batch A holds session-1 (3 events) + session-2 start;
    #        batch B continues session-2, then jumps -> closes session-2
    a = [(1, FX.BASE_TS), (1, FX.BASE_TS + 60_000), (1, FX.BASE_TS + 120_000),
         (1, FX.BASE_TS + 120_000 + G + 1)]
    b = [(1, FX.BASE_TS + 120_000 + G + 60_001),
         (1, FX.BASE_TS + 120_000 + 2 * (G + 60_001))]
    spark.createDataFrame(a, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    out = streaming_sessionizer(stream, keys=["k"], gap_ms=G)
    q = (
        out.writeStream.format("memory").queryName("sess_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_out ORDER BY session_start").collect()
    # two CLOSED sessions (the third is still open in state)
    assert [(r.session_start, r.session_end, r.n_events, r.closed_by) for r in rows] == [
        (FX.BASE_TS, FX.BASE_TS + 120_000, 3, "gap"),
        (FX.BASE_TS + 120_000 + G + 1, FX.BASE_TS + 120_000 + G + 60_001, 2, "gap"),
    ]


def test_streaming_sessionizer_same_ms_bursts_count_all_events(spark, tmp_path):
    """Distinct events sharing one millisecond must all count (the batch
    islands sessionization counts rows, not timestamps) — within a batch
    always, and across batches when an event_id column deduplicates
    replays (ADVICE r04: the old forward-only guard collapsed same-ms
    bursts to one event)."""
    from pyspark.sql.types import StringType

    from clx_etl_spark.streaming.stateful import streaming_sessionizer

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("ts_ms", LongType()),
            StructField("eid", StringType()),
        ]
    )
    src = str(tmp_path / "in")
    G = 1_800_000
    T = FX.BASE_TS
    # batch A: 3 events at the SAME ms + 1 more, all one session
    a = [(1, T, "e1"), (1, T, "e2"), (1, T, "e3"), (1, T + 1000, "e4")]
    # batch B: a replay of e4 (same ts+id: dropped), a NEW event at the
    # same ms (counted), then a jump that closes the session
    b = [(1, T + 1000, "e4"), (1, T + 1000, "e5"), (1, T + 1000 + G + 1, "e6")]
    spark.createDataFrame(a, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    out = streaming_sessionizer(stream, keys=["k"], gap_ms=G, event_id_col="eid")
    q = (
        out.writeStream.format("memory").queryName("sess_ms")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sess_ms").collect()
    # one closed session: e1-e5 = 5 distinct events (e4 replay dropped)
    assert [(r.session_start, r.session_end, r.n_events, r.closed_by) for r in rows] == [
        (T, T + 1000, 5, "gap")
    ]


def test_streaming_heavy_hitters_state_survives_separator_bytes(spark, tmp_path):
    """Counter state must round-trip key values containing control bytes
    (ADVICE r04: the old \\x1f-joined encoding corrupted on such keys) —
    counts stay exact across micro-batches."""
    from pyspark.sql.types import StringType

    from clx_etl_spark.streaming.stateful import streaming_heavy_hitters

    schema = StructType(
        [StructField("event_type", StringType()), StructField("ts_ms", LongType())]
    )
    src = str(tmp_path / "in")
    weird = "a\x1fb"  # contains the old separator byte
    a = [(weird, FX.BASE_TS + i) for i in range(5)] + [("plain", FX.BASE_TS)]
    b = [(weird, FX.BASE_TS + 100 + i) for i in range(4)] + [("plain", FX.BASE_TS + 100)]
    spark.createDataFrame(a, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    out = streaming_heavy_hitters(stream, key_col="event_type", k=4, capacity=8)
    q = (
        out.writeStream.format("memory").queryName("hh_sep")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    last_seq = spark.sql("SELECT max(seq) s FROM hh_sep").collect()[0].s
    got = {
        r.key: (r.cnt, r.max_err)
        for r in spark.sql(f"SELECT * FROM hh_sep WHERE seq = {last_seq}").collect()
    }
    assert got == {weird: (9, 0), "plain": (2, 0)}


def test_enrich_stream_picks_up_dim_updates_between_batches(spark, tmp_path):
    """Stream-static join re-reads the dimension per micro-batch: rows
    arriving after a dim update see the new attribute without a query
    restart."""
    from clx_etl_spark.streaming.jobs import enrich_stream, file_stream

    src = str(tmp_path / "in")
    dimp = str(tmp_path / "dim")
    schema = StructType(
        [StructField("k", LongType()), StructField("ts_ms", LongType())]
    )
    spark.createDataFrame([(1, "old")], "k long, tag string").write.parquet(dimp)
    _write_batch(spark, src, [(1, FX.BASE_TS, "x")])

    enriched = enrich_stream(
        file_stream(spark, src, SCHEMA), spark.read.parquet(dimp), keys=["k"]
    )
    q = (
        enriched.writeStream.format("memory").queryName("enr")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    assert [r.tag for r in spark.sql("SELECT tag FROM enr").collect()] == ["old"]

    # dim update + new data; a fresh availableNow run from the SAME
    # checkpointless memory sink processes only the new file
    spark.createDataFrame([(1, "new")], "k long, tag string").write.mode(
        "overwrite"
    ).parquet(dimp)
    _write_batch(spark, src, [(1, FX.BASE_TS + 1, "y")])
    enriched2 = enrich_stream(
        file_stream(spark, src, SCHEMA), spark.read.parquet(dimp), keys=["k"]
    )
    q2 = (
        enriched2.writeStream.format("memory").queryName("enr2")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(60)
    tags = {r.tag for r in spark.sql("SELECT tag FROM enr2").collect()}
    assert tags == {"new"}  # both rows see the updated dim on re-read


def test_streaming_sessionizer_idle_timeout_flushes_last_session(spark, tmp_path):
    """The processing-time idle timeout closes a quiet key's final
    session when a later micro-batch (for any key) fires a trigger after
    the timeout elapsed."""
    import time as _time

    from clx_etl_spark.streaming.stateful import streaming_sessionizer

    schema = StructType(
        [StructField("k", LongType()), StructField("ts_ms", LongType())]
    )
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, FX.BASE_TS), (1, FX.BASE_TS + 60_000)], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.format("parquet").schema(schema).load(src)
    out = streaming_sessionizer(
        stream, keys=["k"], gap_ms=1_800_000, idle_timeout_ms=2_000
    )
    q = (
        out.writeStream.format("memory").queryName("sess_to")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _time.time() + 60
        # let batch 1 register key 1's state, then idle past the timeout
        _time.sleep(4)
        # a batch for a DIFFERENT key fires the trigger; key 1 times out
        spark.createDataFrame([(2, FX.BASE_TS)], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        rows = []
        while _time.time() < deadline:
            rows = spark.sql(
                "SELECT * FROM sess_to WHERE closed_by = 'timeout'"
            ).collect()
            if rows:
                break
            _time.sleep(1)
    finally:
        q.stop()
    assert [(r.k, r.session_start, r.session_end, r.n_events) for r in rows] == [
        (1, FX.BASE_TS, FX.BASE_TS + 60_000, 2)
    ]


def test_with_ingest_metrics_surfaces_observed_metrics(spark, tmp_path):
    from clx_etl_spark.streaming.jobs import file_stream, with_ingest_metrics

    src = str(tmp_path / "in")
    now_ms = int(time.time() * 1000)
    rows = [(1, now_ms, "a"), (2, now_ms - 10_000_000, "b"), (3, now_ms, "c")]
    _write_batch(spark, src, rows)
    observed = with_ingest_metrics(
        file_stream(spark, src, SCHEMA), "ts_ms", late_after_ms=3_600_000
    )
    q = (
        observed.writeStream.format("memory").queryName("obs_rows")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    progress = [p for p in q.recentProgress if p.get("observedMetrics")]
    assert progress, "no observedMetrics in any progress event"
    m = progress[-1]["observedMetrics"]["ingest"]
    assert m["n_rows"] == 3
    assert m["n_late"] == 1  # the 10000s-old row
    assert m["max_event_ms"] == now_ms
    # rows pass through unchanged
    assert spark.sql("SELECT COUNT(*) c FROM obs_rows").first().c == 3


def test_streaming_heavy_hitters_spacesaving_bounds(spark, tmp_path):
    """SpaceSaving top-k across micro-batches: exact for keys that fit
    capacity; with capacity pressure, counts stay within the
    overestimate bound and the true heavy hitter is always present."""
    from clx_etl_spark.streaming.stateful import streaming_heavy_hitters

    schema = StructType(
        [StructField("k", LongType()), StructField("ts_ms", LongType()),
         StructField("event_type", StringType())]
    )
    src = str(tmp_path / "in")
    # batch 1: a=5, b=3; batch 2: a=4, c=2 -> truth a=9, b=3, c=2
    b1 = [(i, FX.BASE_TS + i, "a") for i in range(5)] + [
        (10 + i, FX.BASE_TS + i, "b") for i in range(3)]
    b2 = [(20 + i, FX.BASE_TS + i, "a") for i in range(4)] + [
        (30 + i, FX.BASE_TS + i, "c") for i in range(2)]
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    out = streaming_heavy_hitters(stream, key_col="event_type", k=3, capacity=8)
    q = (
        out.writeStream.format("memory").queryName("hh")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM hh").collect()
    last_seq = max(r.seq for r in rows)
    final = {r.key: (r.cnt, r.max_err) for r in rows if r.seq == last_seq}
    # capacity 8 > 3 distinct keys -> exact counts, zero error
    assert final == {"a": (9, 0), "b": (3, 0), "c": (2, 0)}

    # capacity pressure (2 counters for 3 keys): the guarantee holds for
    # any key with true count > N/capacity = 14/2 — i.e. 'a' (9) must
    # survive exactly; the evicted-slot key carries a bounded overestimate
    stream2 = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    out2 = streaming_heavy_hitters(stream2, key_col="event_type", k=2, capacity=2)
    q2 = (
        out2.writeStream.format("memory").queryName("hh1")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    rows2 = spark.sql("SELECT * FROM hh1").collect()
    last = max(r.seq for r in rows2)
    fin = sorted((r for r in rows2 if r.seq == last), key=lambda r: -r.cnt)
    truth = {"a": 9, "b": 3, "c": 2}
    assert fin[0].key == "a" and fin[0].cnt == 9 and fin[0].max_err == 0
    for r in fin:  # overestimate-only with a tight residual bound
        t = truth[r.key]
        assert r.cnt - r.max_err <= t <= r.cnt


def test_near_dup_ingest_stream_gates_batches(spark, tmp_path):
    """Continuous corpus building: per micro-batch, exact id replays,
    batch-internal near-dups, and batch-vs-corpus near-dups all drop;
    only genuinely novel docs append to the accepted corpus."""
    from pyspark.sql.types import StringType

    from clx_etl_spark.streaming.jobs import near_dup_ingest_stream

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon")
    other = ("one two three four five six seven eight nine ten eleven "
             "twelve thirteen fourteen fifteen sixteen seventeen eighteen")
    third = ("red orange yellow green blue indigo violet cyan magenta "
             "maroon navy olive teal silver gold bronze copper iron")
    src = str(tmp_path / "in")
    a = [(1, base), (2, other)]
    b = [
        (1, base),                      # exact id replay -> step-1 drop
        (3, base + " changed"),         # near-dup of corpus doc 1 -> step-3 drop
        (4, third),                     # novel; internal pair winner (min id)
        (5, third + " tweaked"),        # internal near-dup of 4 -> step-2 drop
        (6, "completely different words nothing shared with any prior doc "
            "zeppelin quartz fjord sphinx waltz nymph vex blitz jumble"),
    ]
    spark.createDataFrame(a, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    corpus = str(tmp_path / "corpus")
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    q = near_dup_ingest_stream(
        stream, corpus, checkpoint=str(tmp_path / "ck")
    )
    q.awaitTermination(180)
    got = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got == {1, 2, 4, 6}


def test_streaming_heavy_hitters_sharded_exact_merge(spark, tmp_path):
    """shards > 1: the value space hash-partitions into disjoint counter
    sets, so the merged global top-k is EXACT (no cross-shard count
    splits) — the scale path for single-task ingest bounds."""
    from pyspark.sql.types import StringType

    from clx_etl_spark.streaming.stateful import (
        merge_heavy_hitter_snapshots, streaming_heavy_hitters)

    schema = StructType(
        [StructField("event_type", StringType()), StructField("ts_ms", LongType())]
    )
    src = str(tmp_path / "in")
    # key_i appears (i+1) times, split across two micro-batches
    rows = [(f"key_{i}", FX.BASE_TS + j) for i in range(10) for j in range(i + 1)]
    spark.createDataFrame(rows[:30], schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows[30:], schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    out = streaming_heavy_hitters(
        stream, key_col="event_type", k=10, capacity=16, shards=4
    )
    q = (
        out.writeStream.format("memory").queryName("hh_shard")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    snaps = spark.sql("SELECT * FROM hh_shard")
    assert snaps.select("shard").distinct().count() > 1  # really sharded
    merged = {
        r.key: (r.cnt, r.max_err, r.rank)
        for r in merge_heavy_hitter_snapshots(snaps, k=5).collect()
    }
    # exact: top-5 = key_9..key_5 with counts 10..6, zero error
    assert merged == {
        f"key_{9 - i}": (10 - i, 0, i + 1) for i in range(5)
    }


def test_streaming_quantiles_bottom_k_sample(spark, tmp_path):
    """Bottom-k priority-sample quantiles: with sample_size >= n the
    estimates are EXACT interpolated percentiles; with a small sample
    the state stays bounded and estimates land within the rank-error
    tolerance; replayed batches cannot distort the sample."""
    from pyspark.sql.types import DoubleType, StringType

    from clx_etl_spark.streaming.stateful import streaming_quantiles

    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("value", DoubleType()),
            StructField("ts_ms", LongType()),
        ]
    )
    src = str(tmp_path / "in")
    vals = [float(v) for v in range(1, 101)]  # 1..100
    a = [("a", v, FX.BASE_TS + int(v)) for v in vals[:50]]
    b = [("a", v, FX.BASE_TS + int(v)) for v in vals[50:]] + a[:10]  # replay 10
    spark.createDataFrame(a, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    out = streaming_quantiles(stream, keys=["k"], value_col="value",
                              sample_size=4096)
    q = (
        out.writeStream.format("memory").queryName("sq_exact")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    last = spark.sql(
        "SELECT * FROM sq_exact ORDER BY seq DESC LIMIT 1").collect()[0]
    # full sample -> exact interpolated percentiles of 1..100; the 10
    # replayed rows changed nothing (same fingerprints)
    assert last.n_seen == 100 and last.n_sample == 100
    assert last.q_0_5 == 50.5
    assert abs(last.q_0_9 - 90.1) < 1e-9
    assert abs(last.q_0_99 - 99.01) < 1e-9

    # small sample: bounded state, tolerance-accurate
    out2 = streaming_quantiles(stream, keys=["k"], value_col="value",
                               sample_size=32)
    q2 = (
        out2.writeStream.format("memory").queryName("sq_small")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    last2 = spark.sql(
        "SELECT * FROM sq_small ORDER BY seq DESC LIMIT 1").collect()[0]
    # n_seen may over-count replays of rows already evicted from the
    # bounded sample (documented); the sample itself stays bounded
    assert 100 <= last2.n_seen <= 110 and last2.n_sample == 32
    assert abs(last2.q_0_5 - 50.5) < 25  # ~O(1/sqrt(32)) rank error


def test_streaming_quantiles_repeated_values(spark, tmp_path):
    """Repeated values are distinct sample entries (the fingerprint
    carries the per-row ts), so quantiles follow the stream
    DISTRIBUTION, not the distinct-value set: 99 zeros and one 1000
    has median 0 — while a byte-identical replayed row still collapses
    on its fingerprint."""
    from pyspark.sql.types import DoubleType, StringType

    from clx_etl_spark.streaming.stateful import streaming_quantiles

    schema = StructType(
        [
            StructField("k", StringType()),
            StructField("value", DoubleType()),
            StructField("ts_ms", LongType()),
        ]
    )
    src = str(tmp_path / "in")
    rows = [("a", 0.0, FX.BASE_TS + i) for i in range(99)]
    rows.append(("a", 1000.0, FX.BASE_TS + 99))
    rows += rows[:7]  # replay 7 byte-identical rows -> no effect
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append").parquet(src)

    stream = spark.readStream.format("parquet").schema(schema).load(src)
    out = streaming_quantiles(stream, keys=["k"], value_col="value",
                              sample_size=4096)
    q = (
        out.writeStream.format("memory").queryName("sq_rep")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    last = spark.sql(
        "SELECT * FROM sq_rep ORDER BY seq DESC LIMIT 1").collect()[0]
    assert last.n_seen == 100 and last.n_sample == 100
    assert last.q_0_5 == 0.0  # distribution median, not distinct-set median
    assert last.q_0_99 > 0.0


def test_versioned_ingest_stream_exactly_once(spark, tmp_path):
    """Streaming append into the versioned table format: each
    micro-batch is one committed version; a replayed batch id is a
    manifest-level no-op (txn watermark commits atomically with the
    file list), so at-least-once delivery cannot duplicate rows."""
    from clx_etl_spark.sinks.versioned import (latest_version,
                                               read_changes, read_version)
    from clx_etl_spark.streaming.jobs import versioned_ingest_stream

    src = str(tmp_path / "in")
    table = str(tmp_path / "vt")
    _write_batch(spark, src, [(i, FX.BASE_TS + i, "x") for i in range(5)])
    _write_batch(spark, src, [(i, FX.BASE_TS + i, "y") for i in range(5, 8)])

    stream = (
        spark.readStream.format("parquet").schema(SCHEMA)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    ckpt = str(tmp_path / "ck")
    q = versioned_ingest_stream(stream, table, checkpoint=ckpt)
    q.awaitTermination(120)
    assert read_version(spark, table).count() == 8
    assert latest_version(table) == 1  # one version per micro-batch
    # incremental consumers read only the delta
    assert read_changes(spark, table, after_version=0).count() == 3

    # crash-replay: re-deliver batch 0 through the same sink lineage
    from clx_etl_spark.streaming.jobs import versioned_ingest_stream as _v
    import clx_etl_spark.sinks.versioned as V
    import hashlib
    app_id = "stream-" + hashlib.md5(ckpt.encode()).hexdigest()[:12]
    replay = spark.read.parquet(src).limit(5)
    v = V.append_version(replay, table, txn=(app_id, 0))
    assert v == 1  # no-op: returns current head
    assert read_version(spark, table).count() == 8
    # a NEW batch id still commits
    v2 = V.append_version(replay.limit(1), table, txn=(app_id, 2))
    assert v2 == 2 and read_version(spark, table).count() == 9


def test_versioned_ingest_stream_maintains_rollup(spark, tmp_path):
    """Ingest stream with rollup_path: after each appended micro-batch
    the versioned rollup catches up through the change feed — no side
    checkpoint, end state equals a full recompute."""
    from pyspark.sql.types import DoubleType, StringType

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.streaming.jobs import versioned_ingest_stream

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts_ms", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    src, table = str(tmp_path / "in"), str(tmp_path / "vt")
    rollup, ckpt = str(tmp_path / "ru"), str(tmp_path / "ck")
    spark.createDataFrame(
        [(1, 0, "a", 10.0), (2, 0, "b", 4.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3, 86_400_000, "a", 2.0)], schema
    ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    q = versioned_ingest_stream(stream, table, checkpoint=ckpt,
                                rollup_path=rollup)
    q.awaitTermination(120)
    got = {(r.day_id, r.event_type): (r.n, float(r.sum_v))
           for r in V.read_version(spark, rollup).collect()}
    assert got == {(0, "a"): (1, 10.0), (0, "b"): (1, 4.0),
                   (1, "a"): (1, 2.0)}


def test_versioned_ingest_stream_auto_compact_keeps_rollup_alive(
        spark, tmp_path):
    """auto_compact_every + rollup_path together: the maintenance
    compaction commits WITH an (empty) change marker, so the rollup
    sync — and any table_changes consumer — crosses it; before the fix
    the first post-compaction batch raised ValueError on the unrecorded
    rewrite and the stream died permanently."""
    from pyspark.sql.types import DoubleType, StringType

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.streaming.jobs import versioned_ingest_stream

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts_ms", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    src, table = str(tmp_path / "in"), str(tmp_path / "vt")
    rollup, ckpt = str(tmp_path / "ru"), str(tmp_path / "ck")
    rows = [(1, 0, "a", 10.0), (2, 0, "b", 4.0), (3, 0, "a", 2.0),
            (4, 86_400_000, "b", 5.0)]
    for r in rows:
        spark.createDataFrame([r], schema).coalesce(1).write.mode(
            "append").parquet(src)
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    # 4 micro-batches; compaction fires after batches 1 and 3, so the
    # rollup sync at batches 2 and 3 must cross a compaction commit
    q = versioned_ingest_stream(stream, table, checkpoint=ckpt,
                                rollup_path=rollup, auto_compact_every=2)
    q.awaitTermination(180)
    assert q.exception() is None
    ops = [V._read_manifest(table, v)["op"]
           for v in range(V.latest_version(table) + 1)]
    assert "overwrite" in ops  # the compaction really committed
    got = {(r.day_id, r.event_type): (r.n, float(r.sum_v))
           for r in V.read_version(spark, rollup).collect()}
    assert got == {(0, "a"): (2, 12.0), (0, "b"): (1, 4.0),
                   (1, "b"): (1, 5.0)}
    # a row-level consumer can cross the whole history too
    assert V.table_changes(spark, table, after_version=-1).filter(
        "_change_type = 'insert'").count() == 4


def test_versioned_cdc_stream_exactly_once_apply(spark, tmp_path):
    """Streaming CDC apply: each micro-batch of a changelog folds to
    its per-key net effect and commits ONE merge_version (updates +
    deletes + txn). Later batches supersede earlier state, deletes
    remove keys, and replaying a batch through the same (app, batch_id)
    is a manifest no-op."""
    import hashlib

    from pyspark.sql.types import StringType

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.streaming.jobs import versioned_cdc_stream

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("ts_ms", LongType()),
            StructField("op", StringType()),
            StructField("v", StringType()),
        ]
    )
    src, table = str(tmp_path / "in"), str(tmp_path / "vt")
    ckpt = str(tmp_path / "ck")
    # batch 0: inserts k=1..4; within-batch, k=2 updates after insert
    b0 = [(1, 10, "I", "a1"), (2, 10, "I", "a2"), (2, 20, "U", "b2"),
          (3, 10, "I", "a3"), (4, 10, "I", "a4")]
    # batch 1: delete k=3, update k=1, insert k=5; stale replay of an
    # OLD k=4 op must lose to nothing (k=4 untouched)
    b1 = [(3, 30, "D", None), (1, 30, "U", "c1"), (5, 30, "I", "a5")]
    spark.createDataFrame(b0, schema).coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append").parquet(src)

    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    q = versioned_cdc_stream(stream, table, checkpoint=ckpt, keys=["k"],
                             stats_cols=["k"])
    q.awaitTermination(180)

    out = {r.k: r.v for r in V.read_version(spark, table).collect()}
    assert out == {1: "c1", 2: "b2", 4: "a4", 5: "a5"}  # k=3 deleted

    # crash-replay batch 1 through the same app id: manifest no-op
    app_id = "cdc-" + hashlib.md5(ckpt.encode()).hexdigest()[:12]
    head = V.latest_version(table)
    replay_ups = spark.createDataFrame(
        [(1, 30, "c1"), (5, 30, "a5")], "k long, ts_ms long, v string"
    )
    replay_dels = spark.createDataFrame([(3,)], "k long")
    assert V.merge_version(replay_ups, table, keys=["k"],
                           deletes=replay_dels, txn=(app_id, 1)) == head
    assert V.latest_version(table) == head
    assert {r.k: r.v for r in V.read_version(spark, table).collect()} == out


def test_versioned_cdc_stream_with_rollup_maintenance(spark, tmp_path):
    """Streaming CDC with change_feed + rollup maintenance: each batch
    merges exactly-once AND folds its change set into a versioned daily
    rollup — after both batches the rollup equals a full recompute of
    the final fact state, and the change feed is readable across every
    CDC commit."""
    from pyspark.sql.types import DoubleType, StringType

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.streaming.jobs import versioned_cdc_stream

    schema = StructType(
        [
            StructField("k", LongType()),
            StructField("ts_ms", LongType()),
            StructField("op", StringType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    src, table = str(tmp_path / "in"), str(tmp_path / "vt")
    rollup, ckpt = str(tmp_path / "ru"), str(tmp_path / "ck")
    b0 = [(1, 10, "I", "a", 10.0), (2, 10, "I", "a", 20.0),
          (3, 10, "I", "b", 7.0)]
    # batch 1: update k=1 (+5 into day 0 'a'), delete k=3 ('b' zeroes)
    b1 = [(1, 30, "U", "a", 15.0), (3, 30, "D", "b", None)]
    spark.createDataFrame(b0, schema).coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append").parquet(src)

    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    q = versioned_cdc_stream(stream, table, checkpoint=ckpt, keys=["k"],
                             stats_cols=["k"], change_feed=True,
                             rollup_path=rollup)
    q.awaitTermination(180)

    assert {r.k: r.value for r in V.read_version(spark, table).collect()} \
        == {1: 15.0, 2: 20.0}
    got = {(r.day_id, r.event_type): (r.n, float(r.sum_v))
           for r in V.read_version(spark, rollup).collect()}
    assert got == {(0, "a"): (2, 35.0)}  # 'b' retracted to zero: dropped
    # the change feed spans both CDC commits
    ch = V.table_changes(spark, table, -1)
    types = {(r.k, r._change_type, r._commit_version) for r in ch.collect()}
    assert (1, "update_preimage", 1) in types
    assert (1, "update_postimage", 1) in types
    assert (3, "delete", 1) in types
    # rollup_path without change_feed is a loud config error
    import pytest

    with pytest.raises(ValueError, match="change_feed"):
        versioned_cdc_stream(stream, table, checkpoint=ckpt, keys=["k"],
                             rollup_path=rollup)


def test_stream_stream_attribution_interval_join(spark, tmp_path):
    """Two continuously-arriving streams joined on key within an
    event-time window: a click in a LATER micro-batch still attributes
    to its view; clicks outside the window never match; left_outer
    emits unconverted views once the watermark proves no match can
    arrive."""
    from pyspark.sql.types import TimestampType

    from clx_etl_spark.streaming.jobs import stream_stream_attribution

    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    vschema = StructType(
        [StructField("k", LongType()), StructField("view_time", TimestampType()),
         StructField("page", StringType())]
    )
    cschema = StructType(
        [StructField("k", LongType()), StructField("click_time", TimestampType()),
         StructField("target", StringType())]
    )
    vsrc, csrc = str(tmp_path / "v"), str(tmp_path / "c")
    # views: k=1 (will convert), k=2 (click too late), k=3 (no click).
    # k=98 is a far-future heartbeat view: under Spark's default
    # multipleWatermarkPolicy=min the GLOBAL watermark is the minimum
    # across both inputs, so the views side must also advance or the
    # outer state never evicts (an idle stream pins the watermark).
    spark.createDataFrame(
        [(1, base, "home"), (2, base, "home"), (3, base, "home"),
         (98, base + dt.timedelta(hours=12), "noise-view")], vschema
    ).coalesce(1).write.mode("append").parquet(vsrc)
    # clicks arrive in a separate batch: k=1 inside the 1h window,
    # k=2 outside it; a far-future click advances the click-side
    # watermark so the left-outer emits k=3 (and k=2's view) as
    # unconverted
    spark.createDataFrame(
        [(1, base + dt.timedelta(minutes=30), "buy"),
         (2, base + dt.timedelta(hours=5), "buy"),
         (99, base + dt.timedelta(hours=12), "noise")], cschema
    ).coalesce(1).write.mode("append").parquet(csrc)

    views = spark.readStream.format("parquet").schema(vschema).load(vsrc)
    clicks = spark.readStream.format("parquet").schema(cschema).load(csrc)
    out = stream_stream_attribution(
        views, clicks, key="k", window="1 hour", watermark="2 hours",
        how="left_outer",
    )
    q = (
        out.writeStream.format("memory").queryName("attr")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = {r.k: (r.click_time, r.target)
            for r in spark.sql("SELECT * FROM attr").collect()}
    assert rows[1] == (base + dt.timedelta(minutes=30), "buy")
    assert rows[2] == (None, None)  # click outside window -> unconverted
    assert rows[3] == (None, None)  # no click at all
    assert 99 not in rows  # click without a view never appears
    # the heartbeat view itself is still inside the watermark horizon
    # (view_time + window > global watermark), so it stays buffered
    assert 98 not in rows


# --- change feed as a streaming source (clx_cdf) ---------------------------


def test_cdf_stream_source_full_history_and_restart(spark, tmp_path):
    """spark.readStream.format('clx_cdf'): version numbers are the
    checkpointed offsets — the first run drains the whole history
    (append inserts + merge change sets), a restarted query picks up
    ONLY commits made while it was down, and a non-CDF rewrite breaks
    the stream loudly at planning time."""
    from pyspark.sql import functions as F

    from clx_etl_spark.sinks.versioned import (append_version, merge_version,
                                               overwrite_version)
    from clx_etl_spark.sources.cdf_source import stream_changes

    path = str(tmp_path / "vt")
    ck, out = str(tmp_path / "ck"), str(tmp_path / "out")
    df = spark.range(0, 6).select(
        F.col("id").alias("k"), (F.col("id") * 10.0).alias("v")
    )
    append_version(df.filter("k < 3").coalesce(1), path, stats_cols=["k"])
    append_version(df.filter("k >= 3").coalesce(1), path, stats_cols=["k"])
    merge_version(
        spark.createDataFrame([(1, 99.0), (100, 1.0)], "k long, v double"),
        path, keys=["k"],
        deletes=spark.createDataFrame([(5,)], "k long"), change_feed=True,
    )
    q = (
        stream_changes(spark, path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.k, r._change_type, r._commit_version)
           for r in spark.read.parquet(out).collect()}
    assert {(k, "insert", 0) for k in range(3)} <= got
    assert {(k, "insert", 1) for k in range(3, 6)} <= got
    assert {(1, "update_preimage", 2), (1, "update_postimage", 2),
            (100, "insert", 2), (5, "delete", 2)} <= got
    assert len(got) == 10

    # new commits while the stream is down; restart resumes at v3
    append_version(
        spark.createDataFrame([(7, 70.0)], "k long, v double").coalesce(1),
        path, stats_cols=["k"],
    )
    q2 = (
        stream_changes(spark, path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    got2 = {(r.k, r._change_type, r._commit_version)
            for r in spark.read.parquet(out).collect()}
    assert got2 - got == {(7, "insert", 3)}

    # a change_feed=False merge poisons the NEXT window loudly
    merge_version(
        spark.createDataFrame([(2, 0.0)], "k long, v double"), path,
        keys=["k"],
    )
    q3 = (
        stream_changes(spark, path)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).trigger(availableNow=True).start()
    )
    try:
        q3.awaitTermination(120)
        raised = False
    except Exception as exc:  # StreamingQueryException wraps the ValueError
        raised = "change" in str(exc)
    assert raised


def test_cdf_stream_source_latest_and_catchup_cap(spark, tmp_path):
    """startingVersion='latest' skips history; maxVersionsPerBatch caps
    the END offset per trigger (bounded catch-up, nothing skipped)."""
    from pyspark.sql import functions as F

    from clx_etl_spark.sinks.versioned import append_version
    from clx_etl_spark.sources.cdf_source import stream_changes

    path = str(tmp_path / "vt")
    for i in range(4):
        append_version(
            spark.createDataFrame([(i, float(i))], "k long, v double")
            .coalesce(1), path,
        )
    # latest: the pre-existing 4 commits are NOT streamed
    ck1, out1 = str(tmp_path / "ck1"), str(tmp_path / "out1")
    q = (
        stream_changes(spark, path, starting_version="latest")
        .writeStream.format("parquet").option("path", out1)
        .option("checkpointLocation", ck1).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    append_version(
        spark.createDataFrame([(9, 9.0)], "k long, v double").coalesce(1),
        path,
    )
    q2 = (
        stream_changes(spark, path, starting_version="latest")
        .writeStream.format("parquet").option("path", out1)
        .option("checkpointLocation", ck1).trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    assert {r.k for r in spark.read.parquet(out1).collect()} == {9}

    # cap=1: one availableNow run still drains everything (multiple
    # capped micro-batches), no version skipped
    ck2, out2 = str(tmp_path / "ck2"), str(tmp_path / "out2")
    q3 = (
        stream_changes(spark, path, max_versions_per_batch=1)
        .writeStream.format("parquet").option("path", out2)
        .option("checkpointLocation", ck2).trigger(availableNow=True).start()
    )
    q3.awaitTermination(180)
    got = sorted((r.k, r._commit_version)
                 for r in spark.read.parquet(out2).collect())
    assert got == [(0, 0), (1, 1), (2, 2), (3, 3), (9, 4)]


def test_rollup_maintenance_stream_decoupled(spark, tmp_path):
    """Continuous IVM decoupled from the writer: the clx_cdf stream
    delivers each fact commit once; the rollup converges to a full
    recompute and a restart applies only the new commits."""
    from pyspark.sql import functions as F

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.streaming.jobs import rollup_maintenance_stream

    facts = str(tmp_path / "facts")
    rollup = str(tmp_path / "ru")
    ck = str(tmp_path / "ck")
    ev = spark.createDataFrame(
        [(1, 0, "a", 10.0), (2, 0, "a", 20.0), (3, 0, "b", 7.0)],
        "event_id long, ts_ms long, event_type string, value double",
    )
    V.append_version(ev.coalesce(1), facts, stats_cols=["event_id"])
    V.merge_version(
        spark.createDataFrame(
            [(1, 0, "a", 15.0)],
            "event_id long, ts_ms long, event_type string, value double",
        ),
        facts, keys=["event_id"],
        deletes=spark.createDataFrame([(3,)], "event_id long"),
        change_feed=True,
    )
    q = rollup_maintenance_stream(spark, facts, rollup, ck)
    q.awaitTermination(120)
    got = {(r.day_id, r.event_type): (r.n, float(r.sum_v))
           for r in V.read_version(spark, rollup).collect()}
    assert got == {(0, "a"): (2, 35.0)}  # 'b' retracted away
    # writer keeps writing while maintenance is down
    V.append_version(
        spark.createDataFrame(
            [(9, 86_400_000, "a", 2.0)],
            "event_id long, ts_ms long, event_type string, value double",
        ).coalesce(1), facts, stats_cols=["event_id"],
    )
    q2 = rollup_maintenance_stream(spark, facts, rollup, ck)
    q2.awaitTermination(120)
    got2 = {(r.day_id, r.event_type): (r.n, float(r.sum_v))
            for r in V.read_version(spark, rollup).collect()}
    assert got2 == {(0, "a"): (2, 35.0), (1, "a"): (1, 2.0)}


def test_clx_table_stream_writer_exactly_once(spark, tmp_path):
    """writeStream.format('clx_table'): the declarative DSv2 form of
    versioned_ingest_stream — one committed version per micro-batch
    with txn=(txnAppId, batchId) atomic in the manifest; a restart from
    the same checkpoint resumes without duplicating rows, and a stale
    batch id through the shared commit path is a manifest no-op."""
    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sources.table_source import (TableDataSource,
                                                    _commit_staged_files)

    spark.dataSource.register(TableDataSource)
    src = str(tmp_path / "in")
    table = str(tmp_path / "vt")
    ckpt = str(tmp_path / "ck")
    for i in range(2):
        spark.createDataFrame(
            [(i * 10 + j, float(j)) for j in range(5)], "id long, x double"
        ).coalesce(1).write.mode("append").parquet(src)

    def run():
        stream = (
            spark.readStream.format("parquet").schema("id long, x double")
            .option("maxFilesPerTrigger", "1").load(src)
        )
        q = (
            stream.writeStream.format("clx_table").option("path", table)
            .option("statsCols", "id").option("txnAppId", "t1")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        assert q.exception() is None

    run()
    assert V.latest_version(table) == 1
    assert V.read_version(spark, table).count() == 10
    m = V._read_manifest(table, 1)
    assert m["txn"] == {"t1": 1}
    assert m["op"] == "append"
    # footer stats landed: a narrow scan prunes
    kept, total = V.pruned_file_count(table, "id", 0, 4)
    assert (kept, total) == (1, 2)
    # restart from the same checkpoint with one new input file: resumes
    # at the next batch id, no duplication of the already-committed rows
    spark.createDataFrame(
        [(100 + j, 0.0) for j in range(3)], "id long, x double"
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    assert V.read_version(spark, table).count() == 13
    assert V._read_manifest(table, V.latest_version(table))["txn"] == {"t1": 2}
    # an at-least-once replay of an old epoch is a manifest no-op
    head = V.latest_version(table)
    assert _commit_staged_files(table, [], overwrite=False, stats_cols=None,
                                bloom_cols=None, txn=("t1", 1)) is None
    assert V.latest_version(table) == head


def test_clx_table_stream_writer_checkpoint_scoped_identity(spark, tmp_path):
    """The stream writer's DEFAULT exactly-once identity is derived from
    the checkpoint location, not the table path: batch ids restart at 0
    with a fresh checkpoint, so a restarted-with-new-checkpoint (or
    second) stream must get a fresh app id — a table-path default would
    silently no-op its batch 0 against the first stream's watermark
    (unreported data loss, ADVICE r07). With neither txnAppId nor a
    checkpointLocation option the writer fails loudly."""
    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sources.table_source import TableDataSource

    spark.dataSource.register(TableDataSource)
    src = str(tmp_path / "in")
    table = str(tmp_path / "vt")

    def run(ckpt):
        stream = (
            spark.readStream.format("parquet").schema("id long")
            .load(src)
        )
        q = (
            stream.writeStream.format("clx_table").option("path", table)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        assert q.exception() is None

    spark.createDataFrame([(1,), (2,)], "id long").coalesce(1) \
        .write.mode("append").parquet(src)
    run(str(tmp_path / "ck1"))
    assert V.read_version(spark, table).count() == 2
    m1 = V._read_manifest(table, V.latest_version(table))
    (app1,) = m1["txn"].keys()
    # a FRESH checkpoint reprocesses the source from scratch at batch 0;
    # with the per-checkpoint identity those rows COMMIT (new app id)
    # instead of vanishing under the old stream's watermark
    run(str(tmp_path / "ck2"))
    assert V.read_version(spark, table).count() == 4
    m2 = V._read_manifest(table, V.latest_version(table))
    assert len(m2["txn"]) == 2 and m2["txn"][app1] == m1["txn"][app1]
    # no identity at all -> loud failure, not silent guessing: a
    # SESSION-DEFAULT checkpoint dir satisfies Spark but is invisible
    # to the sink's options, so the writer must refuse to construct
    spark.conf.set("spark.sql.streaming.checkpointLocation",
                   str(tmp_path / "ck-default"))
    try:
        stream = spark.readStream.format("parquet").schema("id long") \
            .load(src)
        q = (stream.writeStream.format("clx_table").option("path", table)
             .queryName("noid").trigger(availableNow=True).start())
        try:
            q.awaitTermination(120)
            exc = q.exception()
        except Exception as e:  # some paths raise from awaitTermination
            exc = e
        assert exc is not None and "exactly-once identity" in str(exc)
    finally:
        spark.conf.unset("spark.sql.streaming.checkpointLocation")


def test_clx_table_stream_writer_schema_evolution(spark, tmp_path):
    """A stream whose upstream schema widens mid-stream: without the
    mergeSchema option the drifted batch fails the query loudly (the
    contract refuses it); with option('mergeSchema','true') the batch
    evolves the contract and earlier rows read the new column as NULL
    — Delta's streaming-sink evolution shape on the r09 schema
    contract."""
    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sources.table_source import TableDataSource

    spark.dataSource.register(TableDataSource)
    src1 = str(tmp_path / "in1")
    src2 = str(tmp_path / "in2")
    table = str(tmp_path / "vt")
    spark.createDataFrame(
        [(j, float(j)) for j in range(5)], "id long, x double"
    ).coalesce(1).write.mode("append").parquet(src1)
    q = (
        spark.readStream.format("parquet").schema("id long, x double")
        .load(src1)
        .writeStream.format("clx_table").option("path", table)
        .option("txnAppId", "ev").option(
            "checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert q.exception() is None
    assert V.table_schema(table).fieldNames() == ["id", "x"]

    # a second stream with a WIDER schema: refused without the option
    spark.createDataFrame(
        [(100 + j, 0.0, "tag") for j in range(3)],
        "id long, x double, t string",
    ).coalesce(1).write.mode("append").parquet(src2)

    def run(merge: bool):
        w = (
            spark.readStream.format("parquet")
            .schema("id long, x double, t string").load(src2)
            .writeStream.format("clx_table").option("path", table)
            .option("txnAppId", "ev2").option(
                "checkpointLocation",
                str(tmp_path / ("ck2m" if merge else "ck2")))
        )
        if merge:
            w = w.option("mergeSchema", "true")
        q = w.trigger(availableNow=True).start()
        q.awaitTermination(120)  # raises on query failure
        return q

    import pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="mergeSchema"):
        run(merge=False)
    assert V.table_schema(table).fieldNames() == ["id", "x"]  # intact

    q = run(merge=True)
    assert q.exception() is None
    assert V.table_schema(table).fieldNames() == ["id", "x", "t"]
    out = V.read_version(spark, table)
    assert out.count() == 8
    assert out.filter(out.t.isNull()).count() == 5


def test_clx_table_stream_writer_mapped_table(spark, tmp_path):
    """writeStream.format('clx_table') into a RENAMED table (the r11
    columnMapping writer feature): staged batch files store physical
    names, commits carry the mapping, and the sink's exactly-once txn
    semantics are untouched."""
    import pyarrow.parquet as pq

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sources.table_source import TableDataSource

    spark.dataSource.register(TableDataSource)
    src = str(tmp_path / "in")
    table = str(tmp_path / "vt")
    V.append_version(
        spark.createDataFrame([(j, float(j)) for j in range(5)],
                              "id long, x double").coalesce(1),
        table, stats_cols=["id"])
    V.rename_column(table, "id", "event_id")
    spark.createDataFrame(
        [(100 + j, 0.0) for j in range(3)], "event_id long, x double"
    ).coalesce(1).write.mode("append").parquet(src)
    q = (
        spark.readStream.format("parquet")
        .schema("event_id long, x double").load(src)
        .writeStream.format("clx_table").option("path", table)
        .option("statsCols", "event_id").option("txnAppId", "cm")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    assert q.exception() is None
    m = V._read_manifest(table, V.latest_version(table))
    assert m["colmap"]["m"] == {"event_id": "id"}
    assert m["txn"] == {"cm": 0}
    new_file = m["files"][-1]
    assert "id" in pq.read_schema(new_file).names  # physical name
    assert m["stats"][new_file]["id"] == [100, 102]  # physical-keyed
    out = V.read_version(spark, table)
    assert out.columns == ["event_id", "x"]
    assert out.count() == 8
    assert out.filter(out.event_id >= 100).count() == 3


def test_clx_table_stream_writer_evolution_under_mapping(spark, tmp_path):
    """Review r11: the stream writer outlives each batch, so when batch
    0's schema evolution changes the colmap (fresh physical for a
    column named like a RETIRED physical), batch 1 must NOT trip the
    writer's colmap drift check as a phantom concurrent DDL — the plan
    refreshes to the mapping the writer itself committed."""
    import pyarrow.parquet as pq

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sources.table_source import TableDataSource

    spark.dataSource.register(TableDataSource)
    src = str(tmp_path / "in")
    table = str(tmp_path / "vt")
    V.append_version(
        spark.createDataFrame([(j, "t%d" % j) for j in range(5)],
                              "id long, tag string").coalesce(1),
        table, stats_cols=["id"])
    V.drop_columns(table, ["tag"])  # physical 'tag' retires
    for b in range(2):  # two source files -> two micro-batches
        spark.createDataFrame(
            [(100 * (b + 1) + j, "new") for j in range(3)],
            "id long, tag string",
        ).coalesce(1).write.mode("append").parquet(src)
    q = (
        spark.readStream.format("parquet").schema("id long, tag string")
        .option("maxFilesPerTrigger", "1").load(src)
        .writeStream.format("clx_table").option("path", table)
        .option("mergeSchema", "true").option("txnAppId", "ev")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    assert q.awaitTermination(120)
    assert q.exception() is None
    m = V._read_manifest(table, V.latest_version(table))
    assert m["txn"] == {"ev": 1}  # BOTH batches committed
    assert m["colmap"]["m"]["tag"].startswith("tag-")  # fresh physical
    for f in m["files"][-2:]:  # both batch files store the fresh name
        assert m["colmap"]["m"]["tag"] in pq.read_schema(f).names
    out = V.read_version(spark, table)
    assert out.count() == 11
    got = {r.id: r.tag for r in out.collect()}
    assert all(got[j] is None for j in range(5))  # dropped bytes stay gone
    assert all(got[k] == "new" for k in got if k >= 100)
