"""Per-exchange adapter registry (SURVEY S3/S4 — the 20 symbol scans and
17 kline scans).

The reference hand-writes one client class per exchange x inst_type with a
``format_item`` lambda, a ``status_map`` and a symbols parser (reference:
src/flows/sync_symbols.py:17-38 CLIENT_REGISTRY, src/flows/sync_klines.py:
62-82 HANDLE_CLIENT; per-exchange maps e.g. src/exchanges/binance/spot.py,
src/exchanges/kraken/spot.py:8-26, src/exchanges/okx/perp.py:36-37). Here
every client reduces to DATA: a payload path, a field map, a status map and
optional pre-select expressions, each driven through the five normalizer
families in :mod:`.normalizers`. Adding an exchange is a registry entry,
not a class.

Scale shape: a payload page is bounded (<= page_limit rows, the REST
reality); only path navigation happens driver-side. Every per-row
transform — nested-filter extraction, precision derivation, status
enumeration, decimal casts — is a Catalyst expression, so a backfill
that replays thousands of stored pages through ``spark.read.json`` +
these adapters runs fully distributed.

Status enum (reference src/constants.py:4-8): ACTIVE=0 HALTED=1
PENDING=2 CLOSED=3. Inst types: SPOT=0 PERP=1.

weex (r12): the reference ships a half-written WeexPerpClient that is
registered in neither CLIENT_REGISTRY nor HANDLE_CLIENT (and crashes in
get_all_symbols — ``symbol["..."]`` on a string), i.e. dead code. It is
modeled here anyway for reference-tree closure — 21st registry entry,
parse-only (no kline feed, not in any dispatch list), field mapping
taken from the evident intent of exchanges/weex/perp.py:27-47.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import precision_of, to_decimal_str
from .normalizers import (
    normalize_columnar,
    normalize_keyed,
    normalize_positional,
    normalize_symbols,
    payload_to_df,
)

ACTIVE, HALTED, PENDING, CLOSED = 0, 1, 2, 3
SPOT, PERP = 0, 1

# stable engine-local ids for the exchange dimension (the reference reads
# them from its MySQL `exchange` table; any stable assignment works)
EXCHANGE_IDS = {
    "aster": 1, "binance": 2, "bitget": 3, "bitmart": 4, "bybit": 5,
    "coinbase": 6, "gate": 7, "kraken": 8, "mexc": 9, "okx": 10, "woox": 11,
    "weex": 12,
}

# reference src/exchanges/kraken/spot.py:8-26 — legacy asset names
KRAKEN_NAME_MAP = {
    "XXBT": "BTC", "XBT": "BTC", "XETH": "ETH", "XXRP": "XRP",
    "XXLM": "XLM", "XDG": "DOGE", "XLTC": "LTC", "XETC": "ETC",
    "XXMR": "XMR", "XXTZ": "XTZ",
    "ZUSD": "USD", "ZEUR": "EUR", "ZJPY": "JPY", "ZGBP": "GBP",
    "ZCAD": "CAD", "ZCHF": "CHF",
}

# binance-family nested filter extraction (filters: array<struct>)
_PRICE_FILTER = "filter(filters, f -> f.filterType = 'PRICE_FILTER')[0].tickSize"
_LOT_FILTER = "filter(filters, f -> f.filterType = 'LOT_SIZE')[0].stepSize"

_BINANCE_PERP_STATUS = {
    "TRADING": ACTIVE, "PENDING_TRADING": PENDING, "PRE_DELIVERING": HALTED,
    "DELIVERING": HALTED, "DELIVERED": HALTED, "PRE_SETTLE": HALTED,
    "SETTLING": HALTED, "CLOSE": CLOSED,
}

# binance-family positional kline row: [ts, o, h, l, c, vol, closeTs, qv, n, ...]
_BINANCE_KLINE_POS = {
    "ts": 0, "open": 1, "high": 2, "low": 3, "close": 4,
    "volume": 5, "quote_volume": 7, "count": 8,
}


@dataclass(frozen=True)
class SymbolScan:
    """One exchange-info endpoint -> unified exchange_symbol rows."""

    payload_path: str | None                 # dot path to the row list; None = payload is the list
    field_map: dict[str, str]
    status_map: dict[str | int, int]
    pre_select: dict = field(default_factory=dict)  # name -> SQL str | ()->Column
    row_filter: str | None = None            # SQL predicate on raw rows (F1-style)
    split_symbol: tuple[str, str] | None = None
    asset_name_map: dict[str, str] | None = None
    object_values: bool = False              # rows are the VALUES of a JSON object (kraken)


@dataclass(frozen=True)
class KlineScan:
    """One kline endpoint -> unified kline rows."""

    family: str                              # positional | keyed | columnar
    payload_path: str | None                 # may contain {symbol} (kraken result.{symbol})
    ts_unit: str = "ms"
    positions: dict[str, int] | None = None
    field_map: dict[str, str] | None = None
    column_map: dict[str, str] | None = None
    pre_select: dict = field(default_factory=dict)   # name -> SQL str | ()->Column
    page_limit: int = 1000                   # S2 pagination window size
    interval_map: dict[str, str] = field(default_factory=dict)  # engine interval -> API param
    start_key: str | None = "startTime"      # S2 cursor param names
    end_key: str | None = "endTime"


@dataclass(frozen=True)
class ExchangeAdapter:
    name: str
    inst_type: int
    symbols: SymbolScan
    klines: KlineScan | None = None          # None: no kline feed (coinbase has one; aster_spot does too — only missing where the reference has none)
    # fetch-tail quirks (VERDICT r10 item 8, reference
    # bitget/perp.py:122-189): payload "code" values that mean
    # no-data-for-this-symbol (zero rows, not an error), and base
    # assets whose sentiment (long-short-ratio) fetch is skipped
    # outright — both fetch-time config, applied before any parse
    no_data_codes: frozenset = frozenset()
    sentiment_base_blocklist: frozenset = frozenset()

    @property
    def exchange_id(self) -> int:
        return EXCHANGE_IDS[self.name]


def _binance_family(inst_type: int, status_map: dict, perp_only: bool,
                    precision_from_fields: bool) -> SymbolScan:
    """aster spot/perp + binance spot/perp share the exchangeInfo shape;
    they differ only in status vocabulary, the PERPETUAL row filter, and
    whether precisions come from fields or are derived from tick/step
    (reference binance/spot.py:48-52 vs binance/perp.py:59-71)."""
    pre: dict = {"_tick": _PRICE_FILTER, "_step": _LOT_FILTER}
    fm = {
        "symbol": "symbol", "base_asset": "baseAsset", "quote_asset": "quoteAsset",
        "status": "status", "tick_size": "_tick", "step_size": "_step",
    }
    if precision_from_fields:
        fm |= {"price_precision": "pricePrecision", "quantity_precision": "quantityPrecision"}
    else:
        # binance spot: rstrip trailing zeros on tick/step, precision(tick)
        pre = {
            "_tick": f"regexp_replace({_PRICE_FILTER}, '0+$', '')",
            "_step": f"regexp_replace({_LOT_FILTER}, '0+$', '')",
            "_pp": lambda: precision_of(F.expr(_PRICE_FILTER)),
            "_qp": lambda: precision_of(F.expr(_LOT_FILTER)),
        }
        fm |= {"price_precision": "_pp", "quantity_precision": "_qp"}
    return SymbolScan(
        payload_path="symbols", field_map=fm, status_map=status_map,
        pre_select=pre,
        row_filter="contractType = 'PERPETUAL'" if perp_only else None,
    )


def _binance_klines() -> KlineScan:
    return KlineScan(
        family="positional", payload_path=None, positions=_BINANCE_KLINE_POS,
        interval_map={"1m": "1m", "1h": "1h", "1d": "1d"},
    )


REGISTRY: dict[str, ExchangeAdapter] = {
    # --- aster (reference exchanges/aster/{spot,perp}.py) ------------------
    "aster_spot": ExchangeAdapter(
        "aster", SPOT,
        _binance_family(SPOT, _BINANCE_PERP_STATUS, perp_only=False,
                        precision_from_fields=True),
        _binance_klines(),
    ),
    "aster_perp": ExchangeAdapter(
        "aster", PERP,
        _binance_family(PERP, _BINANCE_PERP_STATUS, perp_only=True,
                        precision_from_fields=True),
        _binance_klines(),
    ),
    # --- binance (exchanges/binance/{spot,perp}.py) ------------------------
    "binance_spot": ExchangeAdapter(
        "binance", SPOT,
        _binance_family(
            SPOT,
            {"TRADING": ACTIVE, "END_OF_DAY": CLOSED, "HALT": HALTED, "BREAK": HALTED},
            perp_only=False, precision_from_fields=False,
        ),
        _binance_klines(),
    ),
    "binance_perp": ExchangeAdapter(
        "binance", PERP,
        _binance_family(PERP, _BINANCE_PERP_STATUS, perp_only=True,
                        precision_from_fields=True),
        _binance_klines(),
    ),
    # --- bitget (exchanges/bitget/{spot,perp}.py) --------------------------
    "bitget_spot": ExchangeAdapter(
        "bitget", SPOT,
        SymbolScan(
            payload_path="data",
            pre_select={
                "_tick": lambda: to_decimal_str(F.col("pricePrecision").cast("int")),
                "_step": lambda: to_decimal_str(F.col("quantityPrecision").cast("int")),
            },
            field_map={
                "symbol": "symbol", "base_asset": "baseCoin", "quote_asset": "quoteCoin",
                "status": "status", "tick_size": "_tick", "step_size": "_step",
                "price_precision": "pricePrecision", "quantity_precision": "quantityPrecision",
            },
            status_map={"online": ACTIVE, "halt": HALTED, "gray": PENDING, "offline": CLOSED},
        ),
        KlineScan(
            family="positional", payload_path="data",
            positions={"ts": 0, "open": 1, "high": 2, "low": 3, "close": 4,
                       "volume": 5, "quote_volume": 7},
            interval_map={"1m": "1min", "1h": "1h", "1d": "1day"},
        ),
    ),
    "bitget_perp": ExchangeAdapter(
        "bitget", PERP,
        SymbolScan(
            payload_path="data",
            pre_select={"_tick": lambda: to_decimal_str(F.col("pricePlace").cast("int"))},
            field_map={
                "symbol": "symbol", "base_asset": "baseCoin", "quote_asset": "quoteCoin",
                "status": "symbolStatus", "tick_size": "_tick", "step_size": "sizeMultiplier",
                "price_precision": "pricePlace", "quantity_precision": "volumePlace",
            },
            status_map={"normal": ACTIVE, "listed": PENDING, "maintain": HALTED,
                        "limit_open": HALTED, "restrictedAPI": HALTED, "off": CLOSED},
        ),
        KlineScan(
            family="positional", payload_path="data",
            positions={"ts": 0, "open": 1, "high": 2, "low": 3, "close": 4,
                       "volume": 5, "quote_volume": 6},
            interval_map={"1m": "1m", "1h": "1H", "1d": "1D"},
        ),
        # fetch-tail quirks (reference bitget/perp.py:122-189): code
        # 40054 = no data for this symbol (every sentiment endpoint
        # checks it and yields zero rows), and six base assets are
        # skipped before the long-short-ratio fetch entirely
        no_data_codes=frozenset({"40054"}),
        sentiment_base_blocklist=frozenset(
            {"ADA", "ASTER", "BNB", "DOGE", "GIGGLE", "LTC"}),
    ),
    # --- bitmart (exchanges/bitmart/{spot,perp}.py) ------------------------
    "bitmart_spot": ExchangeAdapter(
        "bitmart", SPOT,
        SymbolScan(
            payload_path="data.symbols",
            pre_select={
                "_tick": lambda: to_decimal_str(F.col("price_max_precision").cast("int")),
                "_qp": lambda: precision_of("base_min_size"),
            },
            field_map={
                "symbol": "symbol", "base_asset": "base_currency",
                "quote_asset": "quote_currency", "status": "trade_status",
                "tick_size": "_tick", "step_size": "base_min_size",
                "price_precision": "price_max_precision", "quantity_precision": "_qp",
            },
            status_map={"trading": ACTIVE, "pre-trade": PENDING},
        ),
        KlineScan(
            family="positional", payload_path="data", ts_unit="s",
            positions={"ts": 0, "open": 1, "high": 2, "low": 3, "close": 4,
                       "volume": 5, "quote_volume": 6},
            page_limit=200, interval_map={"1m": "1", "1h": "60", "1d": "1440"},
            start_key="after", end_key="before",
        ),
    ),
    "bitmart_perp": ExchangeAdapter(
        "bitmart", PERP,
        SymbolScan(
            payload_path="data.symbols",
            pre_select={
                # step = vol_precision * contract_size, exact decimal string
                "_step": "CAST(CAST(vol_precision AS DECIMAL(38,18)) * "
                         "CAST(contract_size AS DECIMAL(38,18)) AS STRING)",
                "_pp": lambda: precision_of("price_precision"),
                "_qp": lambda: precision_of(
                    F.col("vol_precision").cast("decimal(38,18)")
                    * F.col("contract_size").cast("decimal(38,18)")
                ),
            },
            field_map={
                "symbol": "symbol", "base_asset": "base_currency",
                "quote_asset": "quote_currency", "status": "status",
                "tick_size": "price_precision", "step_size": "_step",
                "price_precision": "_pp", "quantity_precision": "_qp",
            },
            # reference quirk preserved: Delisted -> PENDING (bitmart/perp.py:19-20)
            status_map={"Trading": ACTIVE, "Delisted": PENDING},
        ),
        KlineScan(
            family="keyed", payload_path="data", ts_unit="s",
            field_map={"ts": "timestamp", "open": "open_price", "high": "high_price",
                       "low": "low_price", "close": "close_price", "volume": "volume"},
            page_limit=200, interval_map={"1m": "1", "1h": "60", "1d": "1440"},
            start_key="start_time", end_key="end_time",
        ),
    ),
    # --- bybit (exchanges/bybit/{spot,perp}.py) ----------------------------
    "bybit_spot": ExchangeAdapter(
        "bybit", SPOT,
        SymbolScan(
            payload_path="result.list",
            pre_select={
                "_tick": lambda: F.col("priceFilter.tickSize"),
                "_step": lambda: F.col("lotSizeFilter.basePrecision"),
                "_pp": lambda: precision_of(F.col("priceFilter.tickSize")),
                "_qp": lambda: precision_of(F.col("lotSizeFilter.basePrecision")),
            },
            field_map={
                "symbol": "symbol", "base_asset": "baseCoin", "quote_asset": "quoteCoin",
                "status": "status", "tick_size": "_tick", "step_size": "_step",
                "price_precision": "_pp", "quantity_precision": "_qp",
            },
            status_map={"Trading": ACTIVE},
        ),
        KlineScan(
            family="positional", payload_path="result.list",
            positions={"ts": 0, "open": 1, "high": 2, "low": 3, "close": 4,
                       "volume": 5, "quote_volume": 6},
            interval_map={"1m": "1", "1h": "60", "1d": "D"},
            start_key="start", end_key="end",
        ),
    ),
    "bybit_perp": ExchangeAdapter(
        "bybit", PERP,
        SymbolScan(
            payload_path="result.list",
            row_filter="contractType = 'LinearPerpetual'",
            pre_select={
                "_tick": lambda: F.col("priceFilter.tickSize"),
                "_step": lambda: F.col("lotSizeFilter.qtyStep"),
                # priceScale field, falling back to precision(tickSize) (bybit/perp.py:44)
                "_pp": lambda: F.coalesce(
                    F.col("priceScale").cast("int"),
                    precision_of(F.col("priceFilter.tickSize")),
                ),
                "_qp": lambda: precision_of(F.col("lotSizeFilter.qtyStep")),
            },
            field_map={
                "symbol": "symbol", "base_asset": "baseCoin", "quote_asset": "quoteCoin",
                "status": "status", "tick_size": "_tick", "step_size": "_step",
                "price_precision": "_pp", "quantity_precision": "_qp",
            },
            status_map={"Trading": ACTIVE},
        ),
        KlineScan(
            family="positional", payload_path="result.list",
            positions={"ts": 0, "open": 1, "high": 2, "low": 3, "close": 4,
                       "volume": 5, "quote_volume": 6},
            interval_map={"1m": "1", "1h": "60", "1d": "D"},
            start_key="start", end_key="end",
        ),
    ),
    # --- coinbase (exchanges/coinbase/spot.py) -----------------------------
    "coinbase_spot": ExchangeAdapter(
        "coinbase", SPOT,
        SymbolScan(
            payload_path=None,
            pre_select={
                "_pp": lambda: precision_of("quote_increment"),
                "_qp": lambda: precision_of("base_increment"),
            },
            field_map={
                "symbol": "id", "base_asset": "base_currency",
                "quote_asset": "quote_currency", "status": "status",
                "tick_size": "quote_increment", "step_size": "base_increment",
                "price_precision": "_pp", "quantity_precision": "_qp",
            },
            status_map={"online": ACTIVE, "offline": CLOSED,
                        "internal": HALTED, "delisted": CLOSED},
        ),
        KlineScan(
            family="positional", payload_path=None, ts_unit="s",
            # [time, low, high, open, close, volume]
            positions={"ts": 0, "open": 3, "high": 2, "low": 1, "close": 4, "volume": 5},
            page_limit=300, interval_map={"1m": "60", "1h": "3600", "1d": "86400"},
            start_key="start", end_key="end",
        ),
    ),
    # --- gate (exchanges/gate/{spot,perp}.py) ------------------------------
    "gate_spot": ExchangeAdapter(
        "gate", SPOT,
        SymbolScan(
            payload_path=None,
            pre_select={
                "_tick": lambda: to_decimal_str(F.col("precision").cast("int")),
                "_step": lambda: to_decimal_str(F.col("amount_precision").cast("int")),
            },
            field_map={
                "symbol": "id", "base_asset": "base", "quote_asset": "quote",
                "status": "trade_status", "tick_size": "_tick", "step_size": "_step",
                "price_precision": "precision", "quantity_precision": "amount_precision",
            },
            status_map={"untradable": CLOSED, "buyable": ACTIVE,
                        "sellable": ACTIVE, "tradable": ACTIVE},
        ),
        KlineScan(
            family="positional", payload_path=None, ts_unit="s",
            # [ts_s, quote_volume, close, high, low, open, closed?] — no base volume
            positions={"ts": 0, "quote_volume": 1, "close": 2, "high": 3,
                       "low": 4, "open": 5},
            interval_map={"1m": "1m", "1h": "1h", "1d": "1d"},
            start_key="from", end_key=None,  # reference leaves `to` unset
        ),
    ),
    "gate_perp": ExchangeAdapter(
        "gate", PERP,
        SymbolScan(
            payload_path=None,
            pre_select={
                "_pp": lambda: precision_of("order_price_round"),
                "_step": "'1'", "_qp": "0",  # contracts trade in integer lots
            },
            field_map={
                "symbol": "name", "status": "status",
                "tick_size": "order_price_round", "step_size": "_step",
                "price_precision": "_pp", "quantity_precision": "_qp",
            },
            split_symbol=("name", "_"),
            status_map={"prelaunch": PENDING, "trading": ACTIVE, "delisting": HALTED,
                        "delisted": CLOSED, "circuit_breaker": HALTED},
        ),
        KlineScan(
            family="keyed", payload_path=None, ts_unit="s",
            field_map={"ts": "t", "open": "o", "high": "h", "low": "l",
                       "close": "c", "volume": "v", "quote_volume": "sum"},
            interval_map={"1m": "1m", "1h": "1h", "1d": "1d"},
            start_key="from", end_key=None,
        ),
    ),
    # --- kraken (exchanges/kraken/spot.py) ---------------------------------
    "kraken_spot": ExchangeAdapter(
        "kraken", SPOT,
        SymbolScan(
            payload_path="result", object_values=True,
            pre_select={
                # step = lot_multiplier / 10^lot_decimals, exact decimal string
                "_step": "CAST(CAST(lot_multiplier AS DECIMAL(38,18)) / "
                         "POWER(10, CAST(lot_decimals AS INT)) AS STRING)",
            },
            field_map={
                "symbol": "altname", "base_asset": "base", "quote_asset": "quote",
                "status": "status", "tick_size": "tick_size", "step_size": "_step",
                "price_precision": "pair_decimals", "quantity_precision": "lot_decimals",
            },
            status_map={"online": ACTIVE, "cancel_only": HALTED, "post_only": HALTED,
                        "limit_only": HALTED, "reduce_only": HALTED},
            asset_name_map=KRAKEN_NAME_MAP,
        ),
        KlineScan(
            # positional raw rows routed through the keyed family so the
            # vwap-derived quote_volume (kraken/spot.py:121) stays a column expr
            family="keyed", payload_path="result.{symbol}", ts_unit="s",
            pre_select={
                "ts": lambda: F.element_at(F.col("value"), 1),
                "open": lambda: F.element_at(F.col("value"), 2),
                "high": lambda: F.element_at(F.col("value"), 3),
                "low": lambda: F.element_at(F.col("value"), 4),
                "close": lambda: F.element_at(F.col("value"), 5),
                "volume": lambda: F.element_at(F.col("value"), 7),
                "quote_volume": lambda: (
                    F.element_at(F.col("value"), 7).cast("decimal(38,18)")
                    * F.element_at(F.col("value"), 6).cast("decimal(38,18)")
                ).cast("string"),
                "count": lambda: F.element_at(F.col("value"), 8),
            },
            field_map={k: k for k in
                       ("ts", "open", "high", "low", "close", "volume",
                        "quote_volume", "count")},
            page_limit=720, interval_map={"1m": "1", "1h": "60", "1d": "1440"},
            start_key="since", end_key=None,
        ),
    ),
    # --- mexc (exchanges/mexc/{spot,perp}.py) ------------------------------
    "mexc_spot": ExchangeAdapter(
        "mexc", SPOT,
        SymbolScan(
            payload_path="symbols",
            field_map={
                "symbol": "symbol", "base_asset": "baseAsset", "quote_asset": "quoteAsset",
                "status": "status", "tick_size": "quoteAmountPrecision",
                "step_size": "baseSizePrecision",
                "price_precision": "quoteAssetPrecision",
                "quantity_precision": "baseAssetPrecision",
            },
            status_map={"1": ACTIVE, "2": HALTED, "3": CLOSED},
        ),
        KlineScan(
            family="positional", payload_path=None,
            positions={"ts": 0, "open": 1, "high": 2, "low": 3, "close": 4,
                       "volume": 5, "quote_volume": 7},
            interval_map={"1m": "1m", "1h": "60m", "1d": "1d"},
        ),
    ),
    "mexc_perp": ExchangeAdapter(
        "mexc", PERP,
        SymbolScan(
            payload_path="data",
            field_map={
                "symbol": "symbol", "base_asset": "baseCoin", "quote_asset": "quoteCoin",
                "status": "state", "tick_size": "priceUnit", "step_size": "volUnit",
                "price_precision": "priceScale", "quantity_precision": "amountScale",
            },
            status_map={0: ACTIVE, 1: HALTED, 2: CLOSED, 3: CLOSED, 4: HALTED},
        ),
        KlineScan(
            family="columnar", payload_path="data", ts_unit="s",
            column_map={"ts": "time", "open": "open", "high": "high", "low": "low",
                        "close": "close", "volume": "vol", "quote_volume": "amount"},
            page_limit=2000, interval_map={"1m": "1m", "1h": "60m", "1d": "1d"},
            start_key="start", end_key="end",
        ),
    ),
    # --- okx (exchanges/okx/{spot,perp}.py) --------------------------------
    "okx_spot": ExchangeAdapter(
        "okx", SPOT,
        SymbolScan(
            payload_path="data",
            pre_select={"_pp": lambda: precision_of("tickSz"), "_qp": lambda: precision_of("lotSz")},
            field_map={
                "symbol": "instId", "base_asset": "baseCcy", "quote_asset": "quoteCcy",
                "status": "state", "tick_size": "tickSz", "step_size": "lotSz",
                "price_precision": "_pp", "quantity_precision": "_qp",
            },
            status_map={"live": ACTIVE, "suspend": HALTED, "preopen": PENDING,
                        "test": PENDING},
        ),
        KlineScan(
            # mark-price candles: ts/o/h/l/c only (okx/spot.py:92-99)
            family="positional", payload_path="data",
            positions={"ts": 0, "open": 1, "high": 2, "low": 3, "close": 4},
            interval_map={"1m": "1m", "1h": "1H"},
            start_key="after", end_key="before",
        ),
    ),
    "okx_perp": ExchangeAdapter(
        "okx", PERP,
        SymbolScan(
            payload_path="data",
            pre_select={"_pp": lambda: precision_of("tickSz"), "_qp": lambda: precision_of("lotSz")},
            field_map={
                "symbol": "instId", "status": "state",
                "tick_size": "tickSz", "step_size": "lotSz",
                "price_precision": "_pp", "quantity_precision": "_qp",
            },
            # base/quote from instFamily 'BTC-USDT' (okx/perp.py:36-37)
            split_symbol=("instFamily", "-"),
            status_map={"live": ACTIVE, "suspend": HALTED, "preopen": PENDING,
                        "test": PENDING},
        ),
        KlineScan(
            family="positional", payload_path="data",
            positions={"ts": 0, "open": 1, "high": 2, "low": 3, "close": 4},
            interval_map={"1m": "1m", "1h": "1H"},
            start_key="after", end_key="before",
        ),
    ),
    # --- woox (exchanges/woox/{spot,perp}.py) ------------------------------
    "woox_spot": ExchangeAdapter(
        "woox", SPOT,
        SymbolScan(
            payload_path="rows",
            row_filter="split(symbol, '_')[0] = 'SPOT'",
            pre_select={
                "_base": "split(symbol, '_')[1]", "_quote": "split(symbol, '_')[2]",
                "_pp": lambda: precision_of("quote_tick"), "_qp": lambda: precision_of("base_tick"),
            },
            field_map={
                "symbol": "symbol", "base_asset": "_base", "quote_asset": "_quote",
                "status": "status", "tick_size": "quote_tick", "step_size": "base_tick",
                "price_precision": "_pp", "quantity_precision": "_qp",
            },
            status_map={"TRADING": ACTIVE, "SUSPENDED": HALTED},
        ),
        KlineScan(
            family="keyed", payload_path="data.rows",
            field_map={"ts": "start_timestamp", "open": "open", "high": "high",
                       "low": "low", "close": "close", "volume": "volume",
                       "quote_volume": "amount"},
            interval_map={"1m": "1m", "1h": "1h", "1d": "1d"},
            start_key="start_time", end_key="end_time",
        ),
    ),
    "woox_perp": ExchangeAdapter(
        "woox", PERP,
        SymbolScan(
            payload_path="rows",
            row_filter="split(symbol, '_')[0] = 'PERP'",
            pre_select={
                "_base": "split(symbol, '_')[1]", "_quote": "split(symbol, '_')[2]",
                "_pp": lambda: precision_of("quote_tick"), "_qp": lambda: precision_of("base_tick"),
            },
            field_map={
                "symbol": "symbol", "base_asset": "_base", "quote_asset": "_quote",
                "status": "status", "tick_size": "quote_tick", "step_size": "base_tick",
                "price_precision": "_pp", "quantity_precision": "_qp",
            },
            status_map={"TRADING": ACTIVE, "SUSPENDED": HALTED},
        ),
        KlineScan(
            family="keyed", payload_path="data.rows",
            field_map={"ts": "start_timestamp", "open": "open", "high": "high",
                       "low": "low", "close": "close", "volume": "volume",
                       "quote_volume": "amount"},
            interval_map={"1m": "1m", "1h": "1h", "1d": "1d"},
            start_key="start_time", end_key="end_time",
        ),
    ),
    # --- weex (exchanges/weex/perp.py — DEAD CODE in the reference: ---
    # registered in neither CLIENT_REGISTRY nor HANDLE_CLIENT, and its
    # get_all_symbols as written crashes (indexes the symbol STRING:
    # perp.py:37-38); modeled here from the evident intent — the row's
    # underlying_index/quote_currency fields — for tree closure (VERDICT
    # r11 item 6). spot.py is an empty file; there is no kline feed.
    "weex_perp": ExchangeAdapter(
        "weex", PERP,
        SymbolScan(
            payload_path=None,  # /capi/v2/market/contracts returns the list
            pre_select={
                "_pp": lambda: precision_of("tick_size"),
                "_qp": lambda: precision_of("minOrderSize"),
            },
            field_map={
                "symbol": "symbol", "base_asset": "underlying_index",
                "quote_asset": "quote_currency", "status": "status",
                "tick_size": "tick_size", "step_size": "size_increment",
                "price_precision": "_pp", "quantity_precision": "_qp",
            },
            status_map={"TRADING": ACTIVE, "SUSPENDED": HALTED},
        ),
        None,  # the reference defines no weex kline endpoint
    ),
}

# the 17 kline feeds the reference actually schedules (sync_klines.py
# HANDLE_CLIENT): aster_spot / coinbase_spot / gate_perp define kline
# parsers but are not wired into the kline flow — same here (their
# adapters still work via klines_to_unified, they're just not in the
# default dispatch list)
KLINE_FEEDS = (
    "aster_perp", "binance_perp", "bitget_perp", "bitmart_perp",
    "bybit_perp", "mexc_perp", "okx_perp", "woox_perp",
    "binance_spot", "bitget_spot", "bitmart_spot", "bybit_spot",
    "gate_spot", "kraken_spot", "mexc_spot", "okx_spot", "woox_spot",
)


def no_data_payload(key: str, payload) -> bool:
    """True when the page is the exchange's documented empty marker —
    bitget's ``{"code": "40054", ...}`` (reference bitget/perp.py:131)
    — meaning zero rows for this symbol, not an error. Checked at the
    fetch tail BEFORE any path navigation, exactly like the
    reference's ``no_data`` lambda."""
    codes = REGISTRY[key].no_data_codes
    return bool(codes) and isinstance(payload, dict) and (
        str(payload.get("code")) in codes)


def skip_sentiment_base(key: str, base_asset: str) -> bool:
    """True when the adapter's long-short-ratio fetch skips this base
    asset outright (reference bitget/perp.py:128 — a hardcoded
    blocklist of symbols the endpoint 404s/empties on)."""
    return base_asset in REGISTRY[key].sentiment_base_blocklist


def sentiment_fetch_bases(key: str, bases) -> list:
    """The F8 fetch-plan filter: which of ``bases`` to fetch sentiment
    for — drops the adapter's blocklisted base assets, preserving
    order."""
    block = REGISTRY[key].sentiment_base_blocklist
    return [b for b in bases if b not in block]


def _get_path(payload, path: str | None, **fmt):
    """Navigate a dot path through a parsed JSON payload (driver-side; the
    payload is one bounded REST page, exactly like the reference's
    get_data lambdas)."""
    node = payload
    if path:
        for part in path.format(**fmt).split("."):
            node = node[part]
    return node


def _rows_to_df(spark: SparkSession, rows) -> DataFrame:
    """Bounded page rows -> DataFrame. Array rows (positional feeds) become
    a `value array<string>` column; dict rows go through the JSON reader."""
    rows = list(rows)
    if rows and isinstance(rows[0], (list, tuple)):
        return spark.createDataFrame(
            [([None if v is None else str(v) for v in r],) for r in rows],
            "value array<string>",
        )
    return payload_to_df(spark, rows)


def _apply_pre(df: DataFrame, pre_select: dict) -> DataFrame:
    """pre_select values are SQL strings or zero-arg Column factories (lazy
    so the registry imports without an active SparkContext)."""
    for name, expr in pre_select.items():
        df = df.withColumn(name, F.expr(expr) if isinstance(expr, str) else expr())
    return df


def symbols_to_unified(spark: SparkSession, key: str, payload) -> DataFrame:
    """Full S3 path for one exchange-info payload: route -> filter ->
    derive -> normalize_symbols, all per-row work in Catalyst."""
    a = REGISTRY[key]
    s = a.symbols
    node = _get_path(payload, s.payload_path)
    if s.object_values:
        node = list(node.values())
    df = _rows_to_df(spark, node)
    if s.row_filter:
        df = df.filter(F.expr(s.row_filter))
    df = _apply_pre(df, s.pre_select)
    out = normalize_symbols(
        df, s.field_map, exchange_id=a.exchange_id, status_map=s.status_map,
        split_symbol=s.split_symbol, asset_name_map=s.asset_name_map,
    )
    return out.withColumn("inst_type", F.lit(a.inst_type).cast("int"))


def _page_json_schema(k: KlineScan) -> tuple[str, str | None]:
    """(outer, inner) DDL schemas for from_json over a raw kline page.
    Numeric JSON values coerce into string fields, so every leaf is
    string-typed and the normalizers do the DECIMAL/long casts.

    A ``{symbol}`` path segment (kraken ``result.{symbol}``) is parsed as
    ``map<string, string>`` — each value kept as raw JSON text — because
    the real payload carries sibling keys of OTHER types at that level
    (kraken's numeric ``result.last`` pagination cursor), and a typed map
    value would make PERMISSIVE from_json null the whole page. The caller
    re-parses the selected symbol's raw text with the ``inner`` schema
    (None when the path has no ``{symbol}`` level)."""
    if k.family == "columnar":
        rows = (
            "struct<"
            + ", ".join(f"`{src}`: array<string>" for src in k.column_map.values())
            + ">"
        )
    elif k.family == "keyed" and not k.pre_select:
        rows = (
            "array<struct<"
            + ", ".join(f"`{src}`: string" for src in dict.fromkeys(k.field_map.values()))
            + ">>"
        )
    else:  # positional rows — also kraken's keyed-over-raw-arrays
        rows = "array<array<string>>"
    parts = (k.payload_path or "").split(".") if k.payload_path else []
    if parts.count("{symbol}") > 1:
        # A second {symbol} segment would silently overwrite `inner` and
        # both split_corrupt_pages and klines_pages_to_unified would apply
        # the wrong schema (nulled pages, no error). No registry entry does
        # this today; fail loudly if one ever tries.
        raise ValueError(
            f"payload_path {k.payload_path!r} has more than one "
            "{symbol} segment — unsupported"
        )
    inner: str | None = None
    for part in reversed(parts):
        if part == "{symbol}":
            inner = rows
            rows = "map<string, string>"
        else:
            rows = f"struct<`{part}`: {rows}>"
    return rows, inner


def split_corrupt_pages(
    pages: DataFrame, key: str, symbol_col: str = "symbol", payload_col: str = "payload"
) -> tuple[DataFrame, DataFrame]:
    """(parseable, dead_letter) split for the page-replay path. from_json
    is PERMISSIVE — a corrupt payload parses to NULL and would otherwise
    vanish silently in the explode; a 100 TB backfill must instead route
    those pages to a dead-letter table for re-fetch/audit. Both outputs
    share one scan (Catalyst caches nothing here — two filters over the
    same source — but the driver sees the counts, not the rows)."""
    k = REGISTRY[key].klines
    if k is None:
        raise ValueError(f"{key} has no kline feed")
    outer_schema, inner_schema = _page_json_schema(k)
    node = F.from_json(F.col(payload_col), outer_schema)
    ok = node.isNotNull()
    if inner_schema is not None:
        # Walk down to the {symbol} map level, then require the selected
        # symbol's raw value to re-parse under the rows schema.
        for part in (k.payload_path or "").split("."):
            if part == "{symbol}":
                node = F.element_at(node, F.col(symbol_col))
                break
            node = node.getField(part)
        ok = ok & F.from_json(node, inner_schema).isNotNull()
    return pages.filter(ok), pages.filter(~ok)


def klines_pages_to_unified(
    pages: DataFrame, key: str, symbol_col: str = "symbol", payload_col: str = "payload"
) -> DataFrame:
    """Distributed page replay (the 100 TB backfill path): ``pages`` holds
    one row per stored REST page — (symbol, raw JSON payload) — and the
    whole route (from_json parse, path navigation, explode, normalize)
    is column expressions, so replaying millions of archived pages is one
    scan with no driver involvement. ``klines_to_unified`` is the
    driver-side single-page variant the live fetch loop uses.
    """
    a = REGISTRY[key]
    k = a.klines
    if k is None:
        raise ValueError(f"{key} has no kline feed")
    sym = F.col("_sym")
    outer_schema, inner_schema = _page_json_schema(k)
    parsed = pages.select(
        F.col(symbol_col).alias("_sym"),
        F.from_json(F.col(payload_col), outer_schema).alias("_p"),
    )
    node = F.col("_p")
    for part in (k.payload_path or "").split(".") if k.payload_path else []:
        if part == "{symbol}":
            node = F.from_json(F.element_at(node, sym), inner_schema)
        else:
            node = node.getField(part)
    if k.family == "columnar":
        cols = parsed.select("_sym", *[node.getField(src).alias(src) for src in k.column_map.values()])
        return normalize_columnar(
            cols, k.column_map, exchange_id=a.exchange_id,
            inst_type=a.inst_type, symbol=sym, ts_unit=k.ts_unit,
        )
    rows = parsed.select("_sym", F.explode(node).alias("_row"))
    if k.family == "positional":
        rows = rows.select("_sym", F.col("_row").alias("value"))
        return normalize_positional(
            rows, k.positions, exchange_id=a.exchange_id,
            inst_type=a.inst_type, symbol=sym, ts_unit=k.ts_unit,
        )
    if k.pre_select:  # kraken: keyed semantics over raw positional arrays
        rows = _apply_pre(rows.select("_sym", F.col("_row").alias("value")), k.pre_select)
    else:
        rows = rows.select("_sym", "_row.*")
    return normalize_keyed(
        rows, k.field_map, exchange_id=a.exchange_id,
        inst_type=a.inst_type, symbol=sym, ts_unit=k.ts_unit,
    )


def klines_to_unified(spark: SparkSession, key: str, payload, symbol: str) -> DataFrame:
    """Full S4/T1 path for one kline page payload."""
    import json as _json

    a = REGISTRY[key]
    k = a.klines
    if k is None:
        raise ValueError(f"{key} has no kline feed")
    if no_data_payload(key, payload):
        # the exchange's empty marker (bitget 40054): zero unified rows
        # with the exact output schema, via the columnar page path
        # (from_json resolves the missing payload field to null ->
        # explode(null) -> no rows) — the distributed replay already
        # behaves this way for stored no-data pages
        pages = spark.createDataFrame(
            [(symbol, _json.dumps(payload))], "symbol string, payload string")
        return klines_pages_to_unified(pages, key)
    node = _get_path(payload, k.payload_path, symbol=symbol)
    if k.family == "columnar":
        df = payload_to_df(spark, node)
        return normalize_columnar(
            df, k.column_map, exchange_id=a.exchange_id,
            inst_type=a.inst_type, symbol=symbol, ts_unit=k.ts_unit,
        )
    df = _apply_pre(_rows_to_df(spark, node), k.pre_select)
    if k.family == "positional":
        return normalize_positional(
            df, k.positions, exchange_id=a.exchange_id,
            inst_type=a.inst_type, symbol=symbol, ts_unit=k.ts_unit,
        )
    return normalize_keyed(
        df, k.field_map, exchange_id=a.exchange_id,
        inst_type=a.inst_type, symbol=symbol, ts_unit=k.ts_unit,
    )
