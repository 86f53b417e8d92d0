"""Deterministic domain-shaped fixtures (FIXTURES.md): kline grids with
punched holes, misaligned ratio feeds, kalshi markets, canned exchange
payloads (shapes lifted from the reference's docstring examples)."""

from __future__ import annotations

import random

HOUR = 3_600_000
MIN = 60_000

BASE_TS = 1_704_067_200_000  # 2024-01-01T00:00:00Z


def kline_rows(
    n_symbols: int = 3,
    n_bars: int = 500,
    interval_ms: int = MIN,
    holes_per_symbol: int = 5,
    seed: int = 42,
) -> tuple[list[dict], dict[str, list[tuple[int, int]]]]:
    """Full bar grids with punched single-bar and run holes; returns
    (rows, expected interior gap ranges per symbol)."""
    rng = random.Random(seed)
    rows, expected = [], {}
    for s in range(n_symbols):
        symbol = f"SYM{s}USDT"
        holes: set[int] = set()
        for _ in range(holes_per_symbol):
            start = rng.randrange(1, n_bars - 10)
            run = rng.choice([1, 1, 2, 5, 8])
            holes.update(range(start, min(start + run, n_bars - 1)))
        gaps, in_gap, gs = [], False, 0
        for i in range(n_bars):
            ts = BASE_TS + i * interval_ms
            if i in holes:
                if not in_gap:
                    in_gap, gs = True, ts
            else:
                if in_gap:
                    gaps.append((gs, ts - interval_ms))
                    in_gap = False
                px = 100 + s + 0.01 * i
                rows.append(
                    dict(
                        exchange_id=1,
                        inst_type=1,
                        symbol=symbol,
                        ts=ts,
                        open=str(round(px, 4)),
                        high=str(round(px + 0.5, 4)),
                        low=str(round(px - 0.5, 4)),
                        close=str(round(px + 0.1, 4)),
                        volume=str(10 + i % 7),
                    )
                )
        expected[symbol] = gaps
    return rows, expected


def ratio_feed(
    n_buckets: int = 50, drop_mod: int = 5, jitter_seed: int = 7, seed_val: float = 0.5
) -> list[dict]:
    """5-min ratio series with off-boundary timestamps and ~20% missing
    buckets (FIXTURES.md §6)."""
    rng = random.Random(jitter_seed)
    rows = []
    for i in range(n_buckets):
        if i % drop_mod == jitter_seed % drop_mod:
            continue
        ts_raw = BASE_TS + i * 300_000 + rng.randrange(0, 250_000)
        long = round(seed_val + 0.001 * i, 6)
        rows.append(
            dict(
                symbol="BTCUSDT",
                exchange_id=1,
                ts_raw=ts_raw,
                long_ratio=str(long),
                short_ratio=str(round(1 - long, 6)),
            )
        )
    return rows


def kalshi_markets(n: int = 30) -> list[dict]:
    rows = []
    for i in range(n):
        series = "KXCPI" if i % 3 == 0 else ("KXBTC" if i % 3 == 1 else "KXETH")
        rows.append(
            dict(
                updated_ts=BASE_TS + i,
                event_ticker=f"{series}-24",
                ticker=f"{series}-24-T{i}",
                status=i % 5,
                last_price=min(99, i * 3),
                yes_bid=i % 101,
                yes_ask=min(100, i % 101 + 2),
                no_bid=100 - (i % 101),
                no_ask=min(100, 102 - (i % 101)),
                liquidity=1000 + i,
                volume=i * 10,
                open_interest=i * 40,
            )
        )
    return rows


# --- canned payload shapes (reference docstring examples' shapes) ---------

BINANCE_KLINES = [  # positional arrays (binance/perp.py:85-100 shape)
    [1704067200000, "42000.1", "42100.5", "41900.0", "42050.2", "120.5", 1704067259999, "5061000.0", 1543, "60.2", "2530000.0", "0"],
    [1704067260000, "42050.2", "42200.0", "42000.0", "42150.8", "98.1", 1704067319999, "4130000.0", 1201, "49.0", "2065000.0", "0"],
]

MEXC_COLUMNAR = {  # parallel arrays (mexc/perp.py:60-109 shape)
    "time": [1704067200, 1704067260],
    "open": [42000.1, 42050.2],
    "high": [42100.5, 42200.0],
    "low": [41900.0, 42000.0],
    "close": [42050.2, 42150.8],
    "vol": [120.5, 98.1],
    "amount": [5061000.0, 4130000.0],
}

WOOX_KEYED = [  # dict rows (woox/perp.py:61-85 shape)
    {"start_timestamp": 1704067200000, "open": 42000.1, "high": 42100.5,
     "low": 41900.0, "close": 42050.2, "volume": 120.5, "amount": 5061000.0},
    {"start_timestamp": 1704067260000, "open": 42050.2, "high": 42200.0,
     "low": 42000.0, "close": 42150.8, "volume": 98.1, "amount": 4130000.0},
]

GATE_SECONDS = [  # string-second positional (gate/spot.py:61-71 shape)
    ["1704067200", "5061000.0", "42050.2", "42100.5", "41900.0", "42000.1", "120.5", "true"],
    ["1704067260", "4130000.0", "42150.8", "42200.0", "42000.0", "42050.2", "98.1", "true"],
]

BINANCE_EXCHANGE_INFO = [  # instrument metadata (binance/perp.py:47-72 shape)
    {"symbol": "BTCUSDT", "contractType": "PERPETUAL", "status": "TRADING",
     "baseAsset": "BTC", "quoteAsset": "USDT", "pricePrecision": 2,
     "quantityPrecision": 3, "tickSize": "0.10", "stepSize": "0.001"},
    {"symbol": "ETHUSDT", "contractType": "PERPETUAL", "status": "SETTLING",
     "baseAsset": "ETH", "quoteAsset": "USDT", "pricePrecision": 2,
     "quantityPrecision": 3, "tickSize": "0.01", "stepSize": "0.001"},
    {"symbol": "BTCUSDT_240329", "contractType": "CURRENT_QUARTER", "status": "TRADING",
     "baseAsset": "BTC", "quoteAsset": "USDT", "pricePrecision": 2,
     "quantityPrecision": 3, "tickSize": "0.10", "stepSize": "0.001"},
]


def rest_transport(key: dict, start_ms: int, end_ms: int) -> list[dict]:
    """Deterministic fake exchange transport for the clx_rest DataSource
    (module-level so executors can import it as 'tests.fixtures:rest_transport').
    Returns one bar per minute in [start_ms, end_ms], priced off the ts."""
    out = []
    ts = start_ms
    while ts <= end_ms:
        out.append(
            dict(
                symbol=key["symbol"],
                exchange_id=key["exchange_id"],
                ts=ts,
                close=str(100 + (ts // MIN) % 50),
            )
        )
        ts += MIN
    return out



def flaky_transport(key: dict, start_ms: int, end_ms: int) -> list[dict]:
    """rest_transport that fails the FIRST attempt for every (symbol,
    window) — proves the retry budget is honored executor-side. Cross-
    process attempt state via marker files (executors are separate
    processes; module globals don't survive)."""
    import os

    marker = f"/tmp/clx_flaky/{key['symbol']}_{start_ms}_{end_ms}"
    if not os.path.exists(marker):
        os.makedirs("/tmp/clx_flaky", exist_ok=True)
        open(marker, "w").close()
        raise ConnectionError("synthetic first-attempt failure")
    return rest_transport(key, start_ms, end_ms)


def page_transport(key: dict, start_ms: int, end_ms: int) -> list[dict]:
    """Fake exchange returning RAW binance-positional page payloads: one
    row per page with ts = max bar (so the stream cursor advances by
    page), payload = the JSON the real REST endpoint would return."""
    import json

    bars = []
    ts = start_ms
    while ts <= end_ms:
        px = str(100 + (ts // MIN) % 50)
        bars.append([ts, px, px, px, px, "10", ts + MIN - 1,
                     "1000", 5, "5", "500", "0"])
        ts += MIN
    if not bars:
        return []
    return [{"symbol": key["symbol"], "ts": bars[-1][0],
             "payload": json.dumps(bars)}]
