"""Explicit StructType schemas for the engine's domain catalog.

The reference derives table schemas implicitly from the first row's dict
keys (reference: src/databases/doris/__init__.py:177-182) and stores
numerics as strings. Declaring explicit schemas with real types is the
single biggest semantic upgrade (SURVEY §1.3): DecimalType(38,18) for
prices/rates (exactness), TimestampType as the one true time column,
IntegerType enums, nullable columns for the feeds that omit fields.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DecimalType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

DEC = DecimalType(38, 18)

# --- dimensions (reference: src/databases/mysql/models.py:13-69) -----------

EXCHANGE_INFO = StructType(
    [
        StructField("id", IntegerType(), False),
        StructField("name", StringType(), False),
        StructField("venue_type", IntegerType(), True),  # 0=CEX 1=DEX
        StructField("display_name", StringType(), True),
    ]
)

EXCHANGE_SYMBOL = StructType(
    [
        StructField("id", LongType(), True),
        StructField("exchange_id", IntegerType(), False),
        StructField("symbol", StringType(), False),
        StructField("inst_type", IntegerType(), False),  # 0 SPOT/1 PERP/2 FUT/3 OPT
        StructField("base_asset", StringType(), True),
        StructField("quote_asset", StringType(), True),
        StructField("price_precision", IntegerType(), True),
        StructField("quantity_precision", IntegerType(), True),
        # exact decimal representation preserved as string (models.py:63-64)
        StructField("tick_size", StringType(), True),
        StructField("step_size", StringType(), True),
        StructField("status", IntegerType(), True),  # 0 ACTIVE/1 HALTED/2 PENDING/3 CLOSED
        StructField("onboard_time", LongType(), True),  # epoch ms
    ]
)

CLX_SYMBOL = StructType(
    [
        StructField("id", LongType(), False),
        StructField("symbol_id", LongType(), False),
        StructField("is_active", IntegerType(), False),
    ]
)

# --- facts (reference: write sites, SURVEY §1.2) ---------------------------

KLINE = StructType(
    [
        StructField("exchange_id", IntegerType(), False),
        StructField("inst_type", IntegerType(), False),
        StructField("symbol", StringType(), False),
        StructField("ts", LongType(), False),  # bar open, epoch ms, interval-aligned
        StructField("dt", TimestampType(), True),
        StructField("open", DEC, True),
        StructField("high", DEC, True),
        StructField("low", DEC, True),
        StructField("close", DEC, True),
        StructField("volume", DEC, True),  # nullable: OKX klines lack volume
        StructField("quote_volume", DEC, True),
        StructField("count", LongType(), True),
    ]
)

FUNDING_SETTLEMENT = StructType(
    [
        StructField("ts", LongType(), False),
        StructField("dt", TimestampType(), True),
        StructField("exchange_id", IntegerType(), False),
        StructField("symbol", StringType(), False),
        StructField("inst_type", IntegerType(), False),
        StructField("funding_rate", DEC, True),
        StructField("funding_interval", IntegerType(), True),  # minutes
        StructField("adjusted_cap", DEC, True),
        StructField("adjusted_floor", DEC, True),
    ]
)

MARKET_SENTIMENT = StructType(
    [
        StructField("ts", LongType(), False),
        StructField("dt", TimestampType(), True),
        StructField("symbol", StringType(), False),
        StructField("exchange_id", IntegerType(), False),
        StructField("inst_type", IntegerType(), False),
        StructField("top_trader_pos_long", DEC, True),
        StructField("top_trader_pos_short", DEC, True),
        StructField("top_trader_acc_long", DEC, True),
        StructField("top_trader_acc_short", DEC, True),
        StructField("retail_acc_long", DEC, True),
        StructField("retail_acc_short", DEC, True),
    ]
)

ONCHAIN_LARGE_TRANSFER = StructType(
    [
        StructField("chain", StringType(), False),
        StructField("ts", LongType(), False),
        StructField("dt", TimestampType(), True),
        StructField("tx_hash", StringType(), False),
        StructField("from_address", StringType(), True),
        StructField("from_tag", StringType(), True),
        StructField("to_address", StringType(), True),
        StructField("to_tag", StringType(), True),
        StructField("token", StringType(), True),
        StructField("token_contract", StringType(), True),
        StructField("value", DEC, True),
        StructField("price", DEC, True),
        StructField("value_usd", DEC, True),
    ]
)

KALSHI_MARKET_META = StructType(
    [
        StructField("updated_ts", LongType(), False),
        StructField("event_ticker", StringType(), False),
        StructField("ticker", StringType(), False),
        StructField("status", IntegerType(), True),
        StructField("last_price", IntegerType(), True),
        StructField("yes_bid", IntegerType(), True),
        StructField("yes_ask", IntegerType(), True),
        StructField("no_bid", IntegerType(), True),
        StructField("no_ask", IntegerType(), True),
        StructField("liquidity", LongType(), True),
        StructField("volume", LongType(), True),
        StructField("open_interest", LongType(), True),
        StructField("custom_strike", StringType(), True),
        StructField("rules_primary", StringType(), True),
        StructField("close_time", StringType(), True),
        StructField("expiration_time", StringType(), True),
    ]
)

# --- multimodal / corpus tables (LLM-pipeline extension) -------------------

DOCUMENT = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("n_chars", LongType(), True),
    ]
)

EMBEDDING = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(IntegerType(), False), True),
        StructField("label", IntegerType(), True),
    ]
)

MEDIA_ASSET = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),  # opaque encoded bytes
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("sha256", StringType(), True),
    ]
)
