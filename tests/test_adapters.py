"""S3/S4 adapter registry sweep: every registered exchange adapter driven
through its normalizer family against a golden payload shaped like the
reference's documented API examples (reference src/exchanges/*/{spot,perp}.py
docstrings)."""

from __future__ import annotations

import pytest

from clx_etl_spark.sources.adapters import (
    ACTIVE,
    EXCHANGE_IDS,
    KLINE_FEEDS,
    REGISTRY,
    klines_to_unified,
    symbols_to_unified,
)

TS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
TS_S = TS // 1000

_BINANCE_SYM = {
    "symbol": "BTCUSDT", "baseAsset": "BTC", "quoteAsset": "USDT",
    "status": "TRADING", "contractType": "PERPETUAL",
    "pricePrecision": 2, "quantityPrecision": 3,
    "filters": [
        {"filterType": "PRICE_FILTER", "tickSize": "0.10"},
        {"filterType": "LOT_SIZE", "stepSize": "0.001"},
    ],
}
_BINANCE_SYM_DATED = {  # non-perpetual row: must be dropped by perp adapters
    **_BINANCE_SYM, "symbol": "BTCUSDT_240329", "contractType": "CURRENT_QUARTER",
}

SYMBOL_PAYLOADS = {
    "aster_spot": {"symbols": [_BINANCE_SYM]},
    "aster_perp": {"symbols": [_BINANCE_SYM, _BINANCE_SYM_DATED]},
    "binance_spot": {"symbols": [dict(_BINANCE_SYM, status="BREAK")]},
    "binance_perp": {"symbols": [_BINANCE_SYM, _BINANCE_SYM_DATED]},
    "bitget_spot": {"data": [{
        "symbol": "BTCUSDT", "baseCoin": "BTC", "quoteCoin": "USDT",
        "status": "online", "pricePrecision": "2", "quantityPrecision": "4",
    }]},
    "bitget_perp": {"data": [{
        "symbol": "BTCUSDT_UMCBL", "baseCoin": "BTC", "quoteCoin": "USDT",
        "symbolStatus": "normal", "pricePlace": "1", "volumePlace": "3",
        "sizeMultiplier": "0.001",
    }]},
    "bitmart_spot": {"data": {"symbols": [{
        "symbol": "BTC_USDT", "base_currency": "BTC", "quote_currency": "USDT",
        "trade_status": "trading", "price_max_precision": 6,
        "base_min_size": "0.000010",
    }]}},
    "bitmart_perp": {"data": {"symbols": [{
        "symbol": "BTCUSDT", "base_currency": "BTC", "quote_currency": "USDT",
        "status": "Trading", "price_precision": "0.1", "vol_precision": "0.1",
        "contract_size": "0.01",
    }]}},
    "bybit_spot": {"result": {"list": [{
        "symbol": "BTCUSDT", "baseCoin": "BTC", "quoteCoin": "USDT",
        "status": "Trading", "priceFilter": {"tickSize": "0.01"},
        "lotSizeFilter": {"basePrecision": "0.000001"},
    }]}},
    "bybit_perp": {"result": {"list": [{
        "symbol": "BTCUSDT", "baseCoin": "BTC", "quoteCoin": "USDT",
        "status": "Trading", "contractType": "LinearPerpetual",
        "priceScale": "2", "priceFilter": {"tickSize": "0.01"},
        "lotSizeFilter": {"qtyStep": "0.001"},
    }, {
        "symbol": "BTCUSDH24", "baseCoin": "BTC", "quoteCoin": "USD",
        "status": "Trading", "contractType": "InverseFutures",
        "priceScale": "2", "priceFilter": {"tickSize": "0.5"},
        "lotSizeFilter": {"qtyStep": "1"},
    }]}},
    "coinbase_spot": [{
        "id": "BTC-USD", "base_currency": "BTC", "quote_currency": "USD",
        "status": "online", "quote_increment": "0.01",
        "base_increment": "0.00000001",
    }],
    "gate_spot": [{
        "id": "BTC_USDT", "base": "BTC", "quote": "USDT",
        "trade_status": "tradable", "precision": 2, "amount_precision": 4,
        "sell_start": 1_600_000_000, "buy_start": 1_600_000_001,
    }],
    "gate_perp": [{
        "name": "BTC_USDT", "status": "trading", "order_price_round": "0.1",
        "launch_time": 1_600_000_000,
    }],
    "kraken_spot": {"result": {"XXBTZUSD": {
        "altname": "XBTUSD", "base": "XXBT", "quote": "ZUSD",
        "status": "online", "tick_size": "0.1", "lot_multiplier": 1,
        "lot_decimals": 8, "pair_decimals": 1,
    }}},
    "mexc_spot": {"symbols": [{
        "symbol": "BTCUSDT", "baseAsset": "BTC", "quoteAsset": "USDT",
        "status": "1", "quoteAmountPrecision": "5", "baseSizePrecision": "0.0001",
        "quoteAssetPrecision": 8, "baseAssetPrecision": 8,
    }]},
    "mexc_perp": {"data": [{
        "symbol": "BTC_USDT", "baseCoin": "BTC", "quoteCoin": "USDT",
        "state": 0, "priceUnit": "0.1", "volUnit": "1",
        "priceScale": 1, "amountScale": 0,
    }]},
    "okx_spot": {"data": [{
        "instId": "BTC-USDT", "baseCcy": "BTC", "quoteCcy": "USDT",
        "state": "live", "tickSz": "0.1", "lotSz": "0.00000001",
    }]},
    "okx_perp": {"data": [{
        "instId": "BTC-USDT-SWAP", "instFamily": "BTC-USDT", "state": "live",
        "tickSz": "0.1", "lotSz": "1",
    }]},
    "woox_spot": {"rows": [
        {"symbol": "SPOT_BTC_USDT", "status": "TRADING",
         "quote_tick": "0.01", "base_tick": "0.0001", "listing_time": "1600000000"},
        {"symbol": "PERP_BTC_USDT", "status": "TRADING",
         "quote_tick": "0.1", "base_tick": "0.001", "listing_time": "1600000000"},
    ]},
    # weex (reference exchanges/weex/perp.py:27-47 — dead code modeled
    # from intent): /capi/v2/market/contracts returns a bare list
    "weex_perp": [
        {"symbol": "cmt_btcusdt", "underlying_index": "BTC",
         "quote_currency": "USDT", "status": "TRADING",
         "tick_size": "0.5", "size_increment": "0.001",
         "minOrderSize": "0.001"},
        {"symbol": "cmt_suspusdt", "underlying_index": "SUSP",
         "quote_currency": "USDT", "status": "SUSPENDED",
         "tick_size": "0.01", "size_increment": "1",
         "minOrderSize": "1"},
    ],
}
SYMBOL_PAYLOADS["woox_perp"] = SYMBOL_PAYLOADS["woox_spot"]

_BINANCE_BAR = [TS, "42000.10", "42100", "41900", "42050", "12.5",
                TS + 59_999, "525000.5", 1543, "6.2", "260000", "0"]
_BYBIT_BARS = {"result": {"list": [
    [str(TS), "17071", "17073", "17027", "17055.5", "268611", "15.74"],
]}}
_OKX_BARS = {"code": "0", "data": [
    [str(TS), "3.721", "3.743", "3.677", "3.708", "1"],
]}
_WOOX_BARS = {"data": {"rows": [{
    "open": 66166.23, "close": 66124.56, "low": 66038.06, "high": 66176.97,
    "volume": 23.455, "amount": 1550436.2,
    "start_timestamp": TS, "end_timestamp": TS + 60_000,
}]}}

KLINE_PAYLOADS = {
    "aster_spot": [_BINANCE_BAR],
    "aster_perp": [_BINANCE_BAR],
    "binance_spot": [_BINANCE_BAR],
    "binance_perp": [_BINANCE_BAR],
    "bitget_spot": {"data": [[str(TS), "37834.5", "37849.5", "37773.5",
                              "37800.1", "428.3462", "16198849.1", "16200000.2"]]},
    "bitget_perp": {"data": [[str(TS), "37834.5", "37849.5", "37773.5",
                              "37800.1", "428.3462", "16198849.1"]]},
    "bitmart_spot": {"data": [[str(TS_S), "3.721", "3.743", "3.677", "3.708",
                               "22698348.04", "12698348.04"]]},
    "bitmart_perp": {"data": [{
        "timestamp": TS_S, "open_price": "100", "close_price": "120",
        "high_price": "130", "low_price": "90", "volume": "941008",
    }]},
    "bybit_spot": _BYBIT_BARS,
    "bybit_perp": _BYBIT_BARS,
    "coinbase_spot": [[TS_S, 41900.0, 42100.0, 42000.1, 42050.0, 12.5]],
    "gate_spot": [[str(TS_S), "971519.677", "0.0021724", "0.0021922",
                   "0.0021", "0.0021737", "true"]],
    "gate_perp": [{"t": TS_S, "v": 97151, "c": "1.032", "h": "1.033",
                   "l": "1.031", "o": "1.0315", "sum": "3580"}],
    "kraken_spot": {"error": [], "result": {"XBTUSDT": [
        [TS_S, "92536.5", "92555.8", "92536.1", "92536.2", "92539.7",
         "0.00889648", 5],
    ]}},
    "mexc_spot": [[TS, "47482.36", "47482.36", "47416.57", "47436.1",
                   "3.55", TS + 59_999, "168387.3"]],
    "mexc_perp": {"data": {
        "time": [TS_S, TS_S + 60], "open": [109573.9, 109006.4],
        "close": [109006.4, 109301.5], "high": [109628.1, 109426.2],
        "low": [108953.3, 109006.4], "vol": [5587051.0, 5739575.0],
        "amount": [6.1e7, 6.2e7],
    }},
    "okx_spot": _OKX_BARS,
    "okx_perp": _OKX_BARS,
    "woox_spot": _WOOX_BARS,
    "woox_perp": _WOOX_BARS,
}

KLINE_SYMBOL = {"kraken_spot": "XBTUSDT"}


@pytest.mark.parametrize("key", sorted(REGISTRY))
def test_symbols_adapter_sweep(spark, key):
    """Every registry entry normalizes its golden payload to the unified
    exchange_symbol shape with a mapped status."""
    adapter = REGISTRY[key]
    out = symbols_to_unified(spark, key, SYMBOL_PAYLOADS[key]).collect()
    assert out, key
    r = out[0]
    assert r.exchange_id == EXCHANGE_IDS[adapter.name]
    assert r.inst_type == adapter.inst_type
    assert r.base_asset == "BTC"
    assert r.quote_asset in ("USDT", "USD")
    assert r.status is not None
    assert r.tick_size is not None and float(r.tick_size) > 0
    assert r.price_precision is not None


@pytest.mark.parametrize("key", sorted(KLINE_PAYLOADS))
def test_klines_adapter_sweep(spark, key):
    """Every kline adapter lands its golden page on the unified kline
    columns with millisecond timestamps."""
    adapter = REGISTRY[key]
    symbol = KLINE_SYMBOL.get(key, "BTCUSDT")
    out = klines_to_unified(spark, key, KLINE_PAYLOADS[key], symbol).collect()
    assert out, key
    r = out[0]
    assert r.ts == TS  # every unit variant normalized to epoch-ms
    assert r.exchange_id == EXCHANGE_IDS[adapter.name]
    assert r.inst_type == adapter.inst_type
    assert r.symbol == symbol
    assert r.open is not None and r.close is not None


@pytest.mark.parametrize("key", sorted(KLINE_PAYLOADS))
def test_kline_page_replay_matches_single_page_path(spark, key):
    """Distributed page replay (from_json over stored pages) produces
    exactly the rows of the driver-side single-page path — the backfill
    route is behaviorally identical to the live route."""
    import json

    from clx_etl_spark.sources.adapters import klines_pages_to_unified

    symbol = KLINE_SYMBOL.get(key, "BTCUSDT")
    pages = spark.createDataFrame(
        [(symbol, json.dumps(KLINE_PAYLOADS[key]))], "symbol string, payload string"
    )
    replay = klines_pages_to_unified(pages, key)
    single = klines_to_unified(spark, key, KLINE_PAYLOADS[key], symbol)
    assert replay.columns == single.columns
    assert sorted(map(str, replay.collect())) == sorted(map(str, single.collect()))


def test_kline_page_replay_is_fully_distributed(spark):
    """Multi-symbol multi-page replay in one plan: no Python in the plan
    (from_json + explode + casts only) and per-symbol rows keyed right."""
    import json

    from clx_etl_spark.sources.adapters import klines_pages_to_unified

    TS0 = 1_704_067_200_000
    def page(base):
        return json.dumps([[base + i * 60_000, "1.0", "2.0", "0.5", "1.5",
                            "10", base + i * 60_000 + 59_999, "15", 7,
                            "5", "7.5", "0"] for i in range(3)])

    pages = spark.createDataFrame(
        [("BTCUSDT", page(TS0)), ("ETHUSDT", page(TS0)), ("BTCUSDT", page(TS0 + 180_000))],
        "symbol string, payload string",
    )
    out = klines_pages_to_unified(pages, "binance_spot")
    assert out.count() == 9
    assert out.filter("symbol = 'BTCUSDT'").count() == 6
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_kline_feed_list_matches_reference_dispatch():
    """17 scheduled kline feeds (sync_klines.py HANDLE_CLIENT); the three
    parser-only adapters still resolve but are not dispatched."""
    assert len(KLINE_FEEDS) == 17
    assert set(KLINE_FEEDS) <= set(REGISTRY)
    assert {"aster_spot", "coinbase_spot", "gate_perp"} & set(KLINE_FEEDS) == set()
    # 20 reference-registered clients + weex_perp (r12: dead code in the
    # reference, modeled parse-only for tree closure; never dispatched)
    assert len(REGISTRY) == 21
    assert REGISTRY["weex_perp"].klines is None
    assert "weex_perp" not in KLINE_FEEDS


def test_perp_row_filters_drop_non_perpetual(spark):
    for key in ("aster_perp", "binance_perp", "bybit_perp"):
        out = symbols_to_unified(spark, key, SYMBOL_PAYLOADS[key]).collect()
        assert len(out) == 1, key
        assert out[0].symbol == "BTCUSDT"


def test_woox_split_filters_by_inst_prefix(spark):
    spot = symbols_to_unified(spark, "woox_spot", SYMBOL_PAYLOADS["woox_spot"]).collect()
    perp = symbols_to_unified(spark, "woox_perp", SYMBOL_PAYLOADS["woox_perp"]).collect()
    assert [r.symbol for r in spot] == ["SPOT_BTC_USDT"]
    assert [r.symbol for r in perp] == ["PERP_BTC_USDT"]
    assert spot[0].base_asset == "BTC" and spot[0].quote_asset == "USDT"


def test_kraken_asset_canonicalization_and_derived_step(spark):
    r = symbols_to_unified(spark, "kraken_spot", SYMBOL_PAYLOADS["kraken_spot"]).first()
    assert r.base_asset == "BTC" and r.quote_asset == "USD"  # XXBT/ZUSD mapped
    assert abs(float(r.step_size) - 1e-8) < 1e-18
    assert r.symbol == "XBTUSD"


def test_kraken_kline_vwap_quote_volume(spark):
    r = klines_to_unified(
        spark, "kraken_spot", KLINE_PAYLOADS["kraken_spot"], "XBTUSDT"
    ).first()
    assert abs(float(r.quote_volume) - 0.00889648 * 92539.7) < 1e-6
    assert r.asDict()["count"] == 5


def test_golden_values_binance_and_statuses(spark):
    r = symbols_to_unified(spark, "binance_spot", SYMBOL_PAYLOADS["binance_spot"]).first()
    assert r.tick_size == "0.1"          # rstrip'd trailing zeros
    assert r.price_precision == 1        # precision("0.10") = 1
    assert r.status == 1                 # BREAK -> HALTED
    r = symbols_to_unified(spark, "binance_perp", SYMBOL_PAYLOADS["binance_perp"]).first()
    assert r.tick_size == "0.10"         # perp keeps raw filter value
    assert r.price_precision == 2        # field, not derived
    assert r.status == ACTIVE
    r = symbols_to_unified(spark, "mexc_perp", SYMBOL_PAYLOADS["mexc_perp"]).first()
    assert r.status == ACTIVE            # int-keyed status map (state=0)
    r = symbols_to_unified(spark, "okx_perp", SYMBOL_PAYLOADS["okx_perp"]).first()
    assert r.base_asset == "BTC" and r.quote_asset == "USDT"  # instFamily split
    r = symbols_to_unified(spark, "gate_spot", SYMBOL_PAYLOADS["gate_spot"]).first()
    assert r.tick_size == "0.01" and r.step_size == "0.0001"  # to_decimal_str


def test_sync_symbols_registry_end_to_end(spark, tmp_path):
    """Reference sync_symbols flow over the adapter registry: every
    exchange payload normalized, unioned, MERGEd into one dimension; a
    second sync updates mutable columns idempotently."""
    from clx_etl_spark.plans.flows import sync_symbols_registry

    path = str(tmp_path / "symbols")
    n = sync_symbols_registry(spark, SYMBOL_PAYLOADS, path)
    dim = spark.read.parquet(path)
    n_dim = dim.count()
    assert n_dim == n > 0
    # one row per (exchange, symbol, inst_type); all 11 exchanges present
    assert dim.select("exchange_id").distinct().count() == len(EXCHANGE_IDS)
    assert dim.groupBy("exchange_id", "symbol", "inst_type").count().filter(
        "count > 1"
    ).count() == 0
    # re-sync with a changed binance tick: row count stable, value updated
    changed = {
        "binance_perp": {"symbols": [dict(
            _BINANCE_SYM,
            filters=[{"filterType": "PRICE_FILTER", "tickSize": "0.50"},
                     {"filterType": "LOT_SIZE", "stepSize": "0.001"}],
        )]},
    }
    sync_symbols_registry(spark, changed, path)
    dim2 = spark.read.parquet(path)
    assert dim2.count() == n_dim
    row = dim2.filter(
        "exchange_id = 2 AND inst_type = 1 AND symbol = 'BTCUSDT'"
    ).first()
    assert row.tick_size == "0.50"


def test_golden_kline_field_orders(spark):
    # gate spot: [ts, quote_vol, close, high, low, open] — scrambled order
    r = klines_to_unified(spark, "gate_spot", KLINE_PAYLOADS["gate_spot"], "BTC_USDT").first()
    assert float(r.open) == 0.0021737 and float(r.close) == 0.0021724
    assert float(r.quote_volume) == 971519.677 and r.volume is None
    # coinbase: [time, low, high, open, close, volume]
    r = klines_to_unified(
        spark, "coinbase_spot", KLINE_PAYLOADS["coinbase_spot"], "BTC-USD"
    ).first()
    assert float(r.open) == 42000.1 and float(r.low) == 41900.0
    # okx mark-price candles carry no volume at all
    r = klines_to_unified(spark, "okx_perp", KLINE_PAYLOADS["okx_perp"], "BTC-USDT-SWAP").first()
    assert r.volume is None and r.quote_volume is None
    # mexc perp columnar zip
    rows = klines_to_unified(
        spark, "mexc_perp", KLINE_PAYLOADS["mexc_perp"], "BTC_USDT"
    ).orderBy("ts").collect()
    assert [x.ts for x in rows] == [TS, TS + 60_000]
    assert float(rows[0].open) == 109573.9


def test_split_corrupt_pages_dead_letters(spark):
    """Corrupt payloads route to the dead-letter side instead of
    vanishing in the PERMISSIVE from_json -> explode pipeline."""
    import json

    from clx_etl_spark.sources.adapters import (
        klines_pages_to_unified,
        split_corrupt_pages,
    )

    TS0 = 1_704_067_200_000
    good = json.dumps([[TS0, "1", "2", "0.5", "1.5", "10", TS0 + 59_999,
                        "15", 7, "5", "7.5", "0"]])
    pages = spark.createDataFrame(
        [("BTCUSDT", good), ("ETHUSDT", "{not json"), ("XRPUSDT", None)],
        "symbol string, payload string",
    )
    ok, dead = split_corrupt_pages(pages, "binance_spot")
    assert {r.symbol for r in ok.collect()} == {"BTCUSDT"}
    assert {r.symbol for r in dead.collect()} == {"ETHUSDT", "XRPUSDT"}
    # the parseable side normalizes cleanly
    assert klines_pages_to_unified(ok, "binance_spot").count() == 1


def test_kraken_page_replay_tolerates_last_cursor(spark):
    """Real Kraken OHLC pages carry a numeric ``result.last`` pagination
    cursor beside the per-symbol array (docs.kraken.com OHLC endpoint;
    reference navigates d['result'][symbol] driver-side so it never sees
    it). A typed map schema would make PERMISSIVE from_json null the
    whole page and silently dead-letter every real archived kraken page —
    the map level must parse values as raw JSON text instead."""
    import json

    from clx_etl_spark.sources.adapters import (
        klines_pages_to_unified,
        split_corrupt_pages,
    )

    payload = {
        "error": [],
        "result": {
            "XBTUSDT": [
                [TS_S, "92536.5", "92555.8", "92536.1", "92536.2",
                 "92539.7", "0.00889648", 5],
                [TS_S + 60, "92536.2", "92600.0", "92500.0", "92580.0",
                 "92550.0", "0.01200000", 9],
            ],
            "last": 1_688_888_888,
        },
    }
    pages = spark.createDataFrame(
        [("XBTUSDT", json.dumps(payload)),
         ("ETHUSDT", json.dumps(payload)),     # symbol key absent -> dead letter
         ("XBTUSDT", "{not json")],
        "symbol string, payload string",
    )
    ok, dead = split_corrupt_pages(pages, "kraken_spot")
    assert ok.count() == 1
    assert dead.count() == 2
    rows = klines_pages_to_unified(ok, "kraken_spot").orderBy("ts").collect()
    assert [r.ts for r in rows] == [TS_S * 1000, (TS_S + 60) * 1000]
    assert float(rows[0].open) == 92536.5
    # vwap-derived quote_volume survives the raw-text re-parse
    assert abs(float(rows[0].quote_volume) - 0.00889648 * 92539.7) < 1e-6


def test_page_json_schema_rejects_multiple_symbol_segments():
    """A second {symbol} path segment would silently overwrite the inner
    schema and null out every page; fail loudly instead."""
    from clx_etl_spark.sources.adapters import KlineScan, _page_json_schema

    bad = KlineScan(family="positional", payload_path="result.{symbol}.x.{symbol}")
    with pytest.raises(ValueError, match="more than one"):
        _page_json_schema(bad)


def test_bitget_fetch_tail_quirks(spark):
    """VERDICT r10 item 8 (reference bitget/perp.py:122-189): the
    no-data code 40054 yields ZERO unified rows through the real kline
    door (exact output schema, not an error), and the sentiment
    blocklist skips the six hardcoded base assets at fetch-plan time.
    Both are registry fetch config — other adapters are unaffected."""
    from clx_etl_spark.sources.adapters import (
        no_data_payload,
        sentiment_fetch_bases,
        skip_sentiment_base,
    )

    nd = {"code": "40054", "msg": "no data", "requestTime": 0}
    assert no_data_payload("bitget_perp", nd)
    # reference parity: only the PERP client defines the no_data check
    # (bitget/perp.py:131); spot never consults it
    assert not no_data_payload("bitget_spot", nd)
    assert not no_data_payload("bitget_perp", {"code": "00000", "data": []})
    assert not no_data_payload("binance_perp", nd)  # config is per-adapter
    empty = klines_to_unified(spark, "bitget_perp", nd, "BTCUSDT_UMCBL")
    assert empty.count() == 0
    normal = klines_to_unified(
        spark, "bitget_perp", KLINE_PAYLOADS["bitget_perp"], "BTCUSDT_UMCBL")
    # same unified shape, no rows (nullability differs only on the
    # symbol key: literal vs per-page column)
    assert ([(f.name, f.dataType) for f in empty.schema.fields]
            == [(f.name, f.dataType) for f in normal.schema.fields])
    # the sentiment fetch plan drops exactly the blocklisted bases
    assert skip_sentiment_base("bitget_perp", "ADA")
    assert not skip_sentiment_base("bitget_perp", "BTC")
    assert not skip_sentiment_base("binance_perp", "ADA")
    assert sentiment_fetch_bases(
        "bitget_perp", ["BTC", "ADA", "ETH", "GIGGLE", "LTC"],
    ) == ["BTC", "ETH"]
