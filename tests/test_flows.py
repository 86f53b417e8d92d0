"""End-to-end flow tests: the reference's flagship pipelines (SURVEY §3)
driven with canned fixtures — gap-filling kline ingest, symbols MERGE,
sentiment full-outer merge, kalshi two-branch DAG, integrity repair."""

from __future__ import annotations

from pyspark.sql import functions as F

from clx_etl_spark.operators.gaps import detect_gaps
from clx_etl_spark.plans.flows import (
    integrity_repair,
    sync_kalshi,
    sync_klines,
    sync_sentiment,
    sync_symbols,
)
from clx_etl_spark.sources.normalizers import normalize_symbols, payload_to_df

from . import fixtures as FX

KEYS = ["exchange_id", "inst_type", "symbol"]


def _kline_df(spark, rows):
    return spark.createDataFrame(
        rows,
        "exchange_id int, inst_type int, symbol string, ts long, open string, "
        "high string, low string, close string, volume string",
    )


def test_sync_klines_fills_all_gaps(spark, tmp_path):
    """The reference's core self-healing loop: after one sync pass over a
    holey store, detect-gaps must return empty (SURVEY §5.3 property)."""
    path = str(tmp_path / "kline_1m")
    rows, expected_gaps = FX.kline_rows(n_symbols=3, n_bars=400)
    stored = _kline_df(spark, rows).withColumn(
        "dt_date", F.to_date(F.timestamp_millis("ts"))
    )
    stored.write.partitionBy("dt_date").parquet(path)
    assert any(expected_gaps.values())  # fixtures really have holes

    def fetch_page(key_row, start_ms, end_ms):
        # deterministic fake exchange: returns every bar in the window
        out = []
        ts = start_ms
        while ts <= end_ms:
            out.append(
                dict(
                    exchange_id=key_row["exchange_id"],
                    inst_type=key_row["inst_type"],
                    symbol=key_row["symbol"],
                    ts=ts,
                    open="1", high="2", low="0.5", close="1.5", volume="9",
                )
            )
            ts += FX.MIN
        return out

    end_ms = FX.BASE_TS + 399 * FX.MIN
    n = sync_klines(
        spark, path, fetch_page, start_ms=FX.BASE_TS, end_ms=end_ms, page_limit=100
    )
    assert n > 0
    healed = spark.read.parquet(path)
    remaining = detect_gaps(healed, KEYS, ts_col="ts", interval_ms=FX.MIN)
    assert remaining.count() == 0
    # full grid per symbol, no duplicates
    per_symbol = healed.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("ts").alias("d")
    )
    for r in per_symbol.collect():
        assert r.n == 400 and r.d == 400
    # idempotence: second pass fetches nothing
    assert sync_klines(
        spark, path, fetch_page, start_ms=FX.BASE_TS, end_ms=end_ms, page_limit=100
    ) == 0


def test_sync_symbols_merge(spark, tmp_path):
    path = str(tmp_path / "symbols")
    feed = normalize_symbols(
        payload_to_df(spark, FX.BINANCE_EXCHANGE_INFO).filter(
            F.col("contractType") == "PERPETUAL"
        ),
        {"symbol": "symbol", "base_asset": "baseAsset", "quote_asset": "quoteAsset",
         "price_precision": "pricePrecision", "quantity_precision": "quantityPrecision",
         "tick_size": "tickSize", "step_size": "stepSize", "status": "status"},
        exchange_id=1,
        status_map={"TRADING": 0, "SETTLING": 1},
    ).withColumn("inst_type", F.lit(1))
    sync_symbols(spark, [feed], path)
    first = spark.read.parquet(path).count()
    sync_symbols(spark, [feed], path)  # rerun: no dup keys
    assert spark.read.parquet(path).count() == first == 2


def test_sync_sentiment_full_outer(spark):
    pos = spark.createDataFrame(FX.ratio_feed(jitter_seed=1))
    acc = spark.createDataFrame(FX.ratio_feed(jitter_seed=2))
    retail = spark.createDataFrame(FX.ratio_feed(jitter_seed=3))
    out = sync_sentiment(spark, pos, acc, retail, out_path="")
    rows = out.collect()
    # key union: every aligned bucket from any feed appears exactly once
    all_ts = {r.ts for r in rows}
    assert len(rows) == len(all_ts)
    assert all(r.ts % 300_000 == 0 for r in rows)  # T5 alignment
    # missing-side nulls present (feeds drop disjoint buckets)
    assert any(r.top_trader_pos_long is None for r in rows)
    assert any(r.retail_acc_long is None for r in rows)
    # a bucket with all three feeds has no nulls
    full = [r for r in rows if r.top_trader_pos_long and r.top_trader_acc_long and r.retail_acc_long]
    assert full


def test_sync_kalshi_branches(spark):
    markets = spark.createDataFrame(FX.kalshi_markets(30))
    stored = spark.createDataFrame(
        [(t, 4) for t in ("KXBTC-24-T1", "KXETH-24-T2")], "ticker string, status int"
    )
    new_meta, snapshots = sync_kalshi(
        spark, markets, stored, thresholds={"KXCPI": 100, "KXBTC": 500}, default_threshold=300
    )
    metas = {r.ticker for r in new_meta.collect()}
    assert "KXBTC-24-T1" not in metas and "KXETH-24-T2" not in metas  # J6 anti-join
    assert len(metas) == 28
    snaps = snapshots.collect()
    assert snaps
    for r in snaps:
        assert r.status if hasattr(r, "status") else True
        if r.event_ticker.startswith("KXCPI"):
            assert r.open_interest > 100
        elif r.event_ticker.startswith("KXBTC"):
            assert r.open_interest > 500
        else:
            assert r.open_interest > 300
        if r.yes_prob is not None:
            assert abs(r.yes_prob + r.no_prob - 1.0) < 1e-9  # T10 renormalized


def test_integrity_repair(spark, tmp_path):
    import os

    path = str(tmp_path / "snapshot")
    # pristine: 2 keys × 2 full days × 10 rows/hour (the report spine is
    # dense over the observed range, so cover every hour); only day 0 will
    # break, so day 1's partition must survive the repair untouched
    pristine_rows = [
        (k, FX.BASE_TS + d * 24 * FX.HOUR + h * FX.HOUR + i * 360_000, float(i))
        for k in ("A", "B") for d in range(2) for h in range(24) for i in range(10)
    ]
    pristine = spark.createDataFrame(pristine_rows, "symbol string, ts_ms long, v double")
    # stored: drop hour 2 entirely for A (EMPTY), thin hour 4 for B (PARTIAL)
    stored = pristine.filter(
        ~((F.col("symbol") == "A") & (F.col("ts_ms") >= FX.BASE_TS + 2 * FX.HOUR)
          & (F.col("ts_ms") < FX.BASE_TS + 3 * FX.HOUR))
    ).filter(
        ~((F.col("symbol") == "B") & (F.col("ts_ms") >= FX.BASE_TS + 4 * FX.HOUR)
          & (F.col("ts_ms") < FX.BASE_TS + 5 * FX.HOUR) & (F.col("v") >= 3))
    )
    stored.withColumn(
        "dt_date", F.to_date(F.timestamp_millis(F.col("ts_ms")))
    ).write.partitionBy("dt_date").parquet(path)

    def day_files(day: str) -> dict[str, tuple[int, float]]:
        d = os.path.join(path, f"dt_date={day}")
        return {
            f: (os.path.getsize(os.path.join(d, f)), os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d) if f.endswith(".parquet")
        }

    untouched_before = day_files("2024-01-02")
    bad = integrity_repair(spark, path, pristine, ["symbol"], expected_per_hour=10)
    statuses = {(r.symbol, r.hour_ms): r.status for r in bad.collect()}
    # spine spans both days; only day-0's two broken hours are non-OK
    assert statuses == {
        ("A", FX.BASE_TS + 2 * FX.HOUR): "EMPTY",
        ("B", FX.BASE_TS + 4 * FX.HOUR): "PARTIAL",
    }
    healed = spark.read.parquet(path)
    assert healed.count() == pristine.count()
    assert healed.drop("dt_date").exceptAll(pristine).count() == 0
    # the clean day's partition was not rewritten (same files, byte-identical)
    assert day_files("2024-01-02") == untouched_before
    # rerun reports clean
    assert integrity_repair(spark, path, pristine, ["symbol"], expected_per_hour=10).count() == 0


def test_sync_funding_snap_join_skip(spark):
    """J3 drop-unmatched, T9 snapping, F6 freshness skip in one pass."""
    from clx_etl_spark.plans.flows import sync_funding

    history = spark.createDataFrame(
        [
            # due, 8h interval (479.5 min -> 480), info present
            (1, 1, "BTCUSDT", 1_000_000, 0.0001, 1_000_000 + 28_770_000),
            # due, but no funding-info row -> dropped (reference `continue`)
            (1, 1, "NOINFO", 1_000_000, 0.0002, 1_000_000 + 3_600_000),
            # not due yet per state -> skipped before the join
            (1, 1, "ETHUSDT", 1_000_000, 0.0003, 1_000_000 + 3_600_000),
        ],
        "exchange_id int, inst_type int, symbol string, ts long, "
        "funding_rate double, next_funding_ts long",
    )
    info = spark.createDataFrame(
        [("BTCUSDT", 0.0075, -0.0075), ("ETHUSDT", 0.02, -0.02)],
        "symbol string, adjusted_cap double, adjusted_floor double",
    )
    state = spark.createDataFrame(
        [("ETHUSDT", 2_000_000)], "symbol string, next_funding_time long"
    )
    out = sync_funding(spark, history, info, state, now_ms=1_500_000).collect()
    assert len(out) == 1
    row = out[0].asDict()
    assert row["symbol"] == "BTCUSDT"
    assert row["funding_interval"] == 480
    assert row["adjusted_cap"] == 0.0075


def test_sync_onchain_tags_and_labels(spark):
    """F9 threshold, J4 double tag join, T12 coalesce, T11 labels."""
    from clx_etl_spark.plans.flows import sync_onchain

    txs = spark.createDataFrame(
        [
            ("eth", 1_000, "0xaa", "0x01", "0x02", "USDT", 6e6, 1.0, 6e6),
            ("eth", 2_000, "0xbb", "0x03", "0x01", "USDT", 1e6, 1.0, 1e6),  # < 5M
            ("btc", 3_000, "0xcc", "0x04", "0x05", "BTC", 100.0, 60_000.0, 6e6),
        ],
        "chain string, ts long, tx_hash string, from_address string, "
        "to_address string, token string, value double, price double, value_usd double",
    )
    tags = spark.createDataFrame(
        [("eth", "0x01", "MegaExchange Hot Wallet"), ("btc", "0x05", "Cold Storage Fund")],
        "chain string, address string, tag string",
    )
    out = {r["tx_hash"]: r.asDict() for r in sync_onchain(spark, txs, tags).collect()}
    assert set(out) == {"0xaa", "0xcc"}  # 0xbb under the 5M threshold
    assert out["0xaa"]["from_tag"] == "MegaExchange Hot Wallet"
    assert out["0xaa"]["to_tag"] == "0x02"  # no dim tag -> address fallback
    assert out["0xcc"]["to_tag"] == "Cold Storage Fund"


def test_sync_cex_inflow_dim_resolve(spark):
    """J5 name->id resolution; unknown exchange names dropped."""
    from clx_etl_spark.plans.flows import sync_cex_inflow

    inflows = spark.createDataFrame(
        [("binance", 3_600_000, 123.5), ("ghost", 3_600_000, 1.0)],
        "exchange_name string, ts long, netflow double",
    )
    dim = spark.createDataFrame(
        [("binance", 1), ("okx", 2)], "name string, exchange_id int"
    )
    out = sync_cex_inflow(spark, inflows, dim).collect()
    assert len(out) == 1
    assert out[0]["exchange_id"] == 1
    assert out[0]["dt"] is not None


def test_sync_macro_union_dedup(spark):
    """U3 heterogeneous union + anti-join dedup against stored keys."""
    from clx_etl_spark.plans.flows import sync_macro

    a = spark.createDataFrame(
        [("SPX", 1_000, 4000.0, 4010.0)],
        "symbol string, ts long, open double, close double",
    )
    b = spark.createDataFrame(  # extra column `volume`, missing `open`
        [("VIX", 1_000, 15.0, 999.0), ("SPX", 2_000, 4020.0, 5.0)],
        "symbol string, ts long, close double, volume double",
    )
    stored = spark.createDataFrame([("SPX", 1_000)], "symbol string, ts long")
    out = {(r["symbol"], r["ts"]): r.asDict() for r in sync_macro(spark, [a, b], stored).collect()}
    assert set(out) == {("VIX", 1_000), ("SPX", 2_000)}  # stored SPX@1000 deduped
    assert out[("VIX", 1_000)]["open"] is None  # null-filled missing column
    assert out[("SPX", 2_000)]["volume"] == 5.0


def test_tail_klines_live_merge_effectively_once(spark, tmp_path):
    """The live tail flow: streaming cursor -> idempotent MERGE. Two runs
    sharing a checkpoint (clock advancing between them) land every closed
    bar exactly once in the stored table; a third run with a rewound-
    overlap clock changes nothing (replay converges)."""
    from clx_etl_spark.plans.flows import tail_klines

    stored = str(tmp_path / "klines")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [], "exchange_id int, symbol string, ts long, close string"
    ).write.parquet(stored)
    keys = [{"symbol": "BTCUSDT", "exchange_id": 1},
            {"symbol": "ETHUSDT", "exchange_id": 1}]

    def run(now_bars):
        q = tail_klines(
            spark, stored, keys, "tests.fixtures:rest_transport", ckpt,
            start_ms=FX.BASE_TS, max_bars_per_batch=3,
            now_ms=FX.BASE_TS + now_bars * FX.MIN,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(4)
    run(9)
    run(9)  # no clock advance -> no new bars, still converged
    rows = spark.read.parquet(stored).collect()
    per_sym = {}
    for r in rows:
        per_sym.setdefault(r.symbol, []).append(r.ts)
    expect = sorted(FX.BASE_TS + i * FX.MIN for i in range(9))
    assert sorted(per_sym["BTCUSDT"]) == expect
    assert sorted(per_sym["ETHUSDT"]) == expect


def test_tail_klines_bootstraps_cursor_from_stored_watermark(spark, tmp_path):
    """start_ms=None: the first tail run resumes at stored MAX(ts) +
    interval — the batch-backfill -> live-tail handoff, no overlap and
    no gap."""
    from clx_etl_spark.plans.flows import tail_klines

    stored = str(tmp_path / "klines")
    spark.createDataFrame(
        [(1, "BTCUSDT", FX.BASE_TS + i * FX.MIN, "100") for i in range(3)],
        "exchange_id int, symbol string, ts long, close string",
    ).write.parquet(stored)
    q = tail_klines(
        spark, stored, [{"symbol": "BTCUSDT", "exchange_id": 1}],
        "tests.fixtures:rest_transport", str(tmp_path / "ckpt"),
        now_ms=FX.BASE_TS + 6 * FX.MIN,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(r.ts for r in spark.read.parquet(stored).collect())
    assert got == [FX.BASE_TS + i * FX.MIN for i in range(6)]


def test_tail_klines_normalized_full_hot_path(spark, tmp_path):
    """Live pages -> adapter-registry normalization (from_json replay, no
    Python in the batch plan) -> idempotent MERGE: the stored table holds
    the unified decimal schema, exactly one row per closed bar."""
    from clx_etl_spark.plans.flows import tail_klines_normalized

    stored = str(tmp_path / "klines")
    spark.createDataFrame(
        [],
        "exchange_id int, inst_type int, symbol string, ts long, "
        "open decimal(38,18), high decimal(38,18), low decimal(38,18), "
        "close decimal(38,18), volume decimal(38,18), quote_volume decimal(38,18), "
        "count long",
    ).write.parquet(stored)

    def run(now_bars):
        q = tail_klines_normalized(
            spark, stored, "binance_spot", ["BTCUSDT", "ETHUSDT"],
            "tests.fixtures:page_transport", str(tmp_path / "ckpt"),
            start_ms=FX.BASE_TS, max_bars_per_batch=3,
            now_ms=FX.BASE_TS + now_bars * FX.MIN,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run(5)
    run(7)  # advance + replay overlap -> converges
    rows = spark.read.parquet(stored).collect()
    assert len(rows) == 14  # 7 bars x 2 symbols, exactly once
    from clx_etl_spark.sources.adapters import REGISTRY

    a = REGISTRY["binance_spot"]
    one = [r for r in rows if r.symbol == "BTCUSDT" and r.ts == FX.BASE_TS][0]
    assert one.exchange_id == a.exchange_id and one.inst_type == a.inst_type
    assert float(one.open) == float(100 + (FX.BASE_TS // FX.MIN) % 50)
    assert float(one.volume) == 10.0 and one["count"] == 5


def test_integrity_repair_pristine_wins_over_corrupt_stored(spark, tmp_path):
    """A stored row that collides with a pristine row on (key, ts) must
    lose to the pristine copy — restore overwrites (reference
    restore_market_snapshot_from_s3.py:184-190). Guards against the
    arbitrary-winner dropDuplicates behavior."""
    import os

    path = str(tmp_path / "snapshot")
    pristine_rows = [
        ("A", FX.BASE_TS + h * FX.HOUR + i * 360_000, float(i))
        for h in range(24) for i in range(10)
    ]
    pristine = spark.createDataFrame(pristine_rows, "symbol string, ts_ms long, v double")
    # stored: hour 2 is PARTIAL (half its rows dropped) and one SURVIVING
    # row in that same hour is corrupt (v = -999 at a ts pristine also has)
    in_hour2 = (F.col("ts_ms") >= FX.BASE_TS + 2 * FX.HOUR) & (
        F.col("ts_ms") < FX.BASE_TS + 3 * FX.HOUR
    )
    stored = pristine.filter(~(in_hour2 & (F.col("v") >= 5))).withColumn(
        "v",
        F.when(in_hour2 & (F.col("v") == 0.0), F.lit(-999.0)).otherwise(F.col("v")),
    )
    stored.withColumn(
        "dt_date", F.to_date(F.timestamp_millis(F.col("ts_ms")))
    ).write.partitionBy("dt_date").parquet(path)

    bad = integrity_repair(spark, path, pristine, ["symbol"], expected_per_hour=10)
    assert {(r.symbol, r.hour_ms, r.status) for r in bad.collect()} == {
        ("A", FX.BASE_TS + 2 * FX.HOUR, "PARTIAL")
    }
    healed = spark.read.parquet(path).drop("dt_date")
    # exact convergence to pristine: the corrupt collision lost
    assert healed.count() == pristine.count()
    assert healed.exceptAll(pristine).count() == 0
    assert healed.filter("v = -999.0").count() == 0
