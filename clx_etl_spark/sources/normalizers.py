"""Payload-shape normalizers: heterogeneous feed JSON -> unified schemas.

The reference hand-writes one ``format_item`` lambda per exchange
(SURVEY T1, 17 variants). The shapes reduce to five families; each
family here is ONE declarative DataFrame transform, parameterized by a
field map, so adding an exchange is configuration, not code:

  positional   rows are arrays: [ts, open, high, low, ...]
               (reference: binance/perp.py:107-119)
  keyed        rows are dicts with native field names
               (reference: woox/perp.py:96-107)
  nested       payload nests rows under result.list etc.
               (reference: bybit/perp.py:89-96) — caller selects the path
  columnar     parallel arrays zipped to rows: {time: [...], open: [...]}
               (reference: mexc/perp.py:123-132) -> arrays_zip + explode
  seconds      s-unit timestamps scaled to ms (reference: gate/spot.py:80-87)

All numerics arrive as decimal strings and are cast to DECIMAL(38,18)
(SURVEY §1.3 — exactness over float convenience).
"""

from __future__ import annotations

import json
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

DEC = "decimal(38,18)"

# unified kline column order (schemas.KLINE minus the key/dt columns)
KLINE_FIELDS = ("ts", "open", "high", "low", "close", "volume", "quote_volume", "count")


def payload_to_df(spark: SparkSession, payload: str | list | dict) -> DataFrame:
    """Parse a raw JSON payload (string or parsed) into an exploded
    DataFrame of rows with columns inferred by Spark's JSON reader."""
    if isinstance(payload, str):
        payload = json.loads(payload)
    rows = payload if isinstance(payload, list) else [payload]
    return spark.read.json(spark.sparkContext.parallelize([json.dumps(r) for r in rows], 1))


def _with_keys(df: DataFrame, exchange_id: int, inst_type: int, symbol) -> DataFrame:
    """symbol may be a literal string (single-feed page) or a Column (bulk
    page replay where each row carries its own symbol)."""
    sym = F.lit(symbol) if isinstance(symbol, str) else symbol
    return df.select(
        F.lit(exchange_id).cast("int").alias("exchange_id"),
        F.lit(inst_type).cast("int").alias("inst_type"),
        sym.alias("symbol"),
        *[c for c in df.columns if c != "_sym"],
    )


def _narrow_and_key(df: DataFrame, cols, exchange_id: int, inst_type: int, symbol) -> DataFrame:
    """Project the unified columns then prepend keys. A Column symbol is
    materialized as `_sym` BEFORE the narrowing select so the expression
    can reference source columns the projection drops."""
    if isinstance(symbol, str):
        return _with_keys(df.select(*cols), exchange_id, inst_type, symbol)
    narrowed = df.withColumn("_sym", symbol).select("_sym", *cols)
    return _with_keys(narrowed, exchange_id, inst_type, F.col("_sym"))


def normalize_positional(
    df: DataFrame,
    positions: dict[str, int],
    exchange_id: int,
    inst_type: int,
    symbol: "str | Column",
    array_col: str = "value",
    ts_unit: str = "ms",
) -> DataFrame:
    """Positional-array rows -> unified kline columns. ``positions`` maps
    unified field -> array index (e.g. binance: ts=0, open=1, ... count=8).
    Missing fields become typed nulls (OKX has no volume)."""
    a = F.col(array_col)
    scale = 1000 if ts_unit == "s" else 1
    cols = []
    for f_name in KLINE_FIELDS:
        if f_name not in positions:
            typ = "long" if f_name in ("ts", "count") else DEC
            cols.append(F.lit(None).cast(typ).alias(f_name))
        elif f_name == "ts":
            cols.append((F.element_at(a, positions[f_name] + 1).cast("long") * scale).alias("ts"))
        elif f_name == "count":
            cols.append(F.element_at(a, positions[f_name] + 1).cast("long").alias("count"))
        else:
            cols.append(F.element_at(a, positions[f_name] + 1).cast(DEC).alias(f_name))
    return _narrow_and_key(df, cols, exchange_id, inst_type, symbol)


def normalize_keyed(
    df: DataFrame,
    field_map: dict[str, str],
    exchange_id: int,
    inst_type: int,
    symbol: "str | Column",
    ts_unit: str = "ms",
) -> DataFrame:
    """Dict rows with native field names -> unified columns via rename+cast.
    ``field_map`` maps unified field -> source column."""
    scale = 1000 if ts_unit == "s" else 1
    cols = []
    for f_name in KLINE_FIELDS:
        src = field_map.get(f_name)
        if src is None:
            typ = "long" if f_name in ("ts", "count") else DEC
            cols.append(F.lit(None).cast(typ).alias(f_name))
        elif f_name == "ts":
            cols.append((F.col(src).cast("long") * scale).alias("ts"))
        elif f_name == "count":
            cols.append(F.col(src).cast("long").alias("count"))
        else:
            cols.append(F.col(src).cast(DEC).alias(f_name))
    return _narrow_and_key(df, cols, exchange_id, inst_type, symbol)


def normalize_columnar(
    df: DataFrame,
    column_map: dict[str, str],
    exchange_id: int,
    inst_type: int,
    symbol: "str | Column",
    ts_unit: str = "s",
) -> DataFrame:
    """Parallel-array payloads (mexc: {time: [...], open: [...], ...}) ->
    rows via arrays_zip + explode (SURVEY T15), then keyed cast. A Column
    symbol (bulk page replay) is carried through the explode."""
    zipped = F.explode(
        F.arrays_zip(*[F.col(src).alias(dst) for dst, src in column_map.items()])
    ).alias("r")
    if isinstance(symbol, str):
        flat = df.select(zipped).select("r.*")
        sym = symbol
    else:
        flat = df.select(symbol.alias("_sym"), zipped).select("_sym", "r.*")
        sym = F.col("_sym")
    return normalize_keyed(
        flat, {k: k for k in column_map}, exchange_id, inst_type, sym, ts_unit
    )


def normalize_symbols(
    df: DataFrame,
    field_map: dict[str, str],
    exchange_id: int,
    status_map: dict[str, int] | None = None,
    split_symbol: tuple[str, str] | None = None,
    asset_name_map: dict[str, str] | None = None,
) -> DataFrame:
    """Instrument metadata -> unified exchange_symbol rows (SURVEY T2).

    status_map: native status string -> enum int (reference status_map
    dicts). split_symbol: (source_col, sep) to derive base/quote by split
    (okx instFamily '-', woox/gate '_' — reference okx/perp.py:36-37).
    asset_name_map: legacy exchange-local asset names -> canonical (kraken
    XBT->BTC style, reference kraken/spot.py:8-26); applied to base/quote
    after extraction via a CASE ladder (broadcast-map scale at N entries).
    """
    def _canon(col: Column) -> Column:
        if not asset_name_map:
            return col
        out = col
        for legacy, canonical in asset_name_map.items():
            out = F.when(col == legacy, F.lit(canonical)).otherwise(out)
        return out

    cols = [F.lit(exchange_id).cast("int").alias("exchange_id")]
    for dst in ("symbol", "inst_type", "base_asset", "quote_asset",
                "price_precision", "quantity_precision", "tick_size", "step_size"):
        src = field_map.get(dst)
        if src is not None:
            typ = {"inst_type": "int", "price_precision": "int", "quantity_precision": "int"}.get(dst, "string")
            col = F.col(src).cast(typ)
            if dst in ("base_asset", "quote_asset"):
                col = _canon(col)
            cols.append(col.alias(dst))
        elif dst in ("base_asset", "quote_asset") and split_symbol:
            src_col, sep = split_symbol
            idx = 0 if dst == "base_asset" else 1
            cols.append(_canon(F.split(F.col(src_col), sep).getItem(idx)).alias(dst))
        else:
            cols.append(F.lit(None).cast("string").alias(dst))
    out = df.select(*cols)
    if status_map and "status" in field_map:
        status = F.lit(None).cast("int")
        for native, enum in status_map.items():
            status = F.when(F.col(field_map["status"]) == native, F.lit(enum)).otherwise(status)
        out = df.select(*cols, status.alias("status"))
    return out
