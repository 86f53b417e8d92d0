"""The reference's flagship flows re-expressed as Spark job plans.

Reference lifecycles (SURVEY §3):
  sync_symbols   src/flows/sync_symbols.py:52-57  — 20 exchange pulls ->
                 normalize -> MERGE dimension (5 mutable columns)
  sync_klines    src/flows/sync_klines.py:103-126 — watermark -> gap scan
                 -> coalesced refetch -> align -> idempotent append
  sync_sentiment src/exchanges/binance/perp.py:132-185 — 3 feeds -> 5m
                 align -> full-outer merge -> append
  sync_kalshi    src/macro_markets/kalshi.py:154-195 — anti-join dedup ->
                 meta append; threshold/prob snapshot branch
  integrity      src/system_utils/check_market_snapshot_integrity.py —
                 hour-bucket completeness -> repair by partition rewrite
  sync_funding   src/exchanges/binance/perp.py:195-222 — history ⨝ info
                 (J3) + interval snapping (T9) + freshness skip (F6)
  sync_onchain   src/macro_markets/oklink/fetcher.py:142-197 — min-USD
                 filter (F9) + double tag join (J4) + entity labels (T11/T12)
  sync_cex_inflow src/flows/sync_cex_inflow.py + oklink/fetcher.py:92-109 —
                 per-exchange hourly netflow joined to the exchange dim (J5)
  sync_macro     src/macro_markets/macro_indicators.py + flows/
                 sync_macro_indicators.py — per-ticker union (U3) + dedup
                 against stored keys
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions import align_to_5m, normalize_probs, snap_to_intervals, ts_to_timestamp
from ..operators.classify import classify_first_match, coalesce_tags, threshold_by_prefix
from ..operators.gaps import gap_fill_plan
from ..operators.integrity import completeness_report
from ..operators.merge import full_outer_merge
from ..operators.watermark import freshness_skip
from ..sinks.upsert import merge_upsert, overwrite_partitions
from ..sources.rest import fetch_ranges

SYMBOL_KEYS = ["exchange_id", "symbol", "inst_type"]
# the only columns a symbols refresh may change (reference _base_.py:113-120)
SYMBOL_UPDATE_COLS = [
    "tick_size",
    "step_size",
    "price_precision",
    "quantity_precision",
    "status",
]
KLINE_KEYS = ["exchange_id", "inst_type", "symbol", "ts"]


def sync_symbols(
    spark: SparkSession, normalized_feeds: list[DataFrame], symbols_path: str
) -> None:
    """Union per-exchange normalized symbol frames and MERGE into the
    symbols dimension, updating only the 5 mutable columns."""
    from functools import reduce

    batch = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), normalized_feeds)
    merge_upsert(
        spark, batch, symbols_path, keys=SYMBOL_KEYS, update_cols=SYMBOL_UPDATE_COLS
    )


def sync_symbols_registry(
    spark: SparkSession, payloads: dict[str, object], symbols_path: str
) -> int:
    """The reference's top-level sync-symbols loop (sync_symbols.py:52-57:
    one task per CLIENT_REGISTRY entry, gathered) as one Spark job: route
    each exchange payload through its registry adapter, union, and MERGE
    into the symbols dimension. ``payloads`` maps registry key (e.g.
    "binance_spot") -> that exchange-info response. Returns symbols merged.

    Scale shape: payloads are bounded pages; the union of ~20 normalized
    frames is a narrow plan feeding one MERGE shuffle.
    """
    from ..sources.adapters import symbols_to_unified

    feeds = [symbols_to_unified(spark, key, p) for key, p in payloads.items()]
    sync_symbols(spark, feeds, symbols_path)
    return sum(f.count() for f in feeds)


def sync_klines(
    spark: SparkSession,
    stored_path: str,
    fetch_page: Callable[[dict, int, int], list[dict]],
    start_ms: int,
    end_ms: int,
    interval_ms: int = 60_000,
    page_limit: int = 1000,
) -> int:
    """Incremental gap-filling kline ingest (the flagship pipeline).

    1. read stored table, 2. compute the coalesced gap-refetch plan
    (W1-W3), 3. distributed fetch over the plan, 4. derive dt/dt_date,
    5. idempotent partition rewrite (overlapping refetches converge).
    Returns rows ingested.
    """
    stored = spark.read.parquet(stored_path)
    plan = gap_fill_plan(
        stored.select("exchange_id", "inst_type", "symbol", "ts"),
        keys=["exchange_id", "inst_type", "symbol"],
        start_ms=start_ms,
        end_ms=end_ms,
        interval_ms=interval_ms,
        page_limit=page_limit,
    )
    fetched = fetch_ranges(
        plan,
        fetch_page,
        out_schema="exchange_id int, inst_type int, symbol string, ts long, "
        "open string, high string, low string, close string, volume string",
        interval_ms=interval_ms,
        page_limit=page_limit,
    )
    DEC = "decimal(38,18)"
    rows = fetched.select(
        "exchange_id", "inst_type", "symbol", "ts",
        *[F.col(c).cast(DEC).alias(c) for c in ("open", "high", "low", "close", "volume")],
        ts_to_timestamp("ts").alias("dt"),
        F.to_date(ts_to_timestamp("ts")).alias("dt_date"),
    )
    n = rows.count()
    if n:
        # union with the stored slice of touched dates so a partition
        # rewrite keeps pre-existing bars; recompute dt/dt_date and cast to
        # the unified types so heterogeneous stored schemas line up
        rtypes = dict(rows.dtypes)
        stored_aug = stored.withColumn("dt", ts_to_timestamp("ts")).withColumn(
            "dt_date", F.to_date(ts_to_timestamp("ts"))
        )
        touched = rows.select("dt_date").distinct()
        keep = stored_aug.join(F.broadcast(touched), "dt_date", "left_semi").select(
            *[F.col(c).cast(rtypes[c]).alias(c) for c in rows.columns]
        )
        merged = (
            keep.withColumn("_src", F.lit(0))
            .unionByName(rows.withColumn("_src", F.lit(1)))
        )
        from pyspark.sql import Window

        dedup = (
            merged.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(*KLINE_KEYS).orderBy(F.col("_src").desc())
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_src", "_rn")
        )
        overwrite_partitions(dedup, stored_path, ["dt_date"])
    return n


def tail_klines(
    spark: SparkSession,
    stored_path: str,
    feed_keys: list[dict],
    transport: str,
    checkpoint: str,
    start_ms: int | None = None,
    interval_ms: int = 60_000,
    out_schema: str = "symbol string, exchange_id int, ts long, close string",
    max_bars_per_batch: int = 5000,
    now_ms: int | None = None,
):
    """Live kline tail: the streaming complement of sync_klines' batch
    gap-fill (reference: the hourly sync loops in src/deploy.py:84 +
    _base_.py fetch loops, re-expressed as one continuously-running
    Structured Streaming query instead of a cron).

    stream_rest's checkpointed cursor offset replaces the stored-table
    MAX(ts) watermark probe (A4) — restart resumes from the last
    committed micro-batch with no table scan — and each micro-batch lands
    through the idempotent MERGE sink, so at-least-once replay after a
    crash converges (effectively-once). Returns the running
    StreamingQuery; callers stop() it or let it run as the service loop.

    ``start_ms=None`` bootstraps the cursor from the stored table's
    MAX(ts) + interval (the reference's batch-max cursor probe, A4) —
    the one-time handoff from a batch backfill to the live tail; after
    the first run the checkpointed offset takes precedence anyway.
    """
    from ..sources.datasource import stream_rest
    from ..streaming.jobs import foreach_batch_upsert

    if start_ms is None:
        wm = spark.read.parquet(stored_path).agg(F.max("ts")).first()[0]
        if wm is None:
            raise ValueError("empty stored table: pass an explicit start_ms")
        start_ms = int(wm) + interval_ms

    stream = stream_rest(
        spark,
        keys=feed_keys,
        transport=transport,
        out_schema=out_schema,
        interval_ms=interval_ms,
        start_ms=start_ms,
        max_bars_per_batch=max_bars_per_batch,
        now_ms=now_ms,
    )
    return foreach_batch_upsert(
        stream,
        stored_path,
        keys=["exchange_id", "symbol", "ts"],
        checkpoint=checkpoint,
        trigger_available_now=False,  # continuous source; caller stops
    )


def tail_klines_normalized(
    spark: SparkSession,
    stored_path: str,
    adapter_key: str,
    symbols: list[str],
    transport: str,
    checkpoint: str,
    start_ms: int | None = None,
    interval_ms: int = 60_000,
    max_bars_per_batch: int = 5000,
    now_ms: int | None = None,
):
    """The full reference hot path, live: stream raw REST *pages*
    (one row per page: symbol, ts=max bar, payload JSON), then normalize
    through the per-exchange adapter registry inside each micro-batch via
    the distributed page-replay route (from_json + explode + casts — no
    Python in the batch plan) and land through the idempotent MERGE.

    A reference user's deployment becomes:
    ``tail_klines_normalized(spark, path, "binance_spot", syms, ...)``.
    """
    from ..sources.adapters import klines_pages_to_unified
    from ..sources.datasource import stream_rest
    from ..streaming.jobs import foreach_batch_upsert

    if start_ms is None:
        wm = spark.read.parquet(stored_path).agg(F.max("ts")).first()[0]
        if wm is None:
            raise ValueError("empty stored table: pass an explicit start_ms")
        start_ms = int(wm) + interval_ms

    stream = stream_rest(
        spark,
        keys=[{"symbol": s, "adapter": adapter_key} for s in symbols],
        transport=transport,
        out_schema="symbol string, ts long, payload string",
        interval_ms=interval_ms,
        start_ms=start_ms,
        max_bars_per_batch=max_bars_per_batch,
        now_ms=now_ms,
    )
    return foreach_batch_upsert(
        stream,
        stored_path,
        keys=["exchange_id", "inst_type", "symbol", "ts"],
        checkpoint=checkpoint,
        transform=lambda pages: klines_pages_to_unified(
            pages.select("symbol", "payload"), adapter_key
        ),
        trigger_available_now=False,
    )


def sync_sentiment(
    spark: SparkSession,
    pos: DataFrame,
    acc: DataFrame,
    retail: DataFrame,
    out_path: str,
) -> DataFrame:
    """3-feed long-short-ratio merge: 5m alignment + full outer join with
    missing-side nulls, appended as market_sentiment_5m."""
    feeds = {}
    for name, df in (("pos", pos), ("acc", acc), ("retail", retail)):
        feeds[name] = df.select(
            "symbol",
            "exchange_id",
            align_to_5m("ts_raw").alias("ts"),
            F.col("long_ratio"),
            F.col("short_ratio"),
        )
    merged = full_outer_merge(feeds, keys=["symbol", "exchange_id", "ts"]).select(
        "symbol", "exchange_id", "ts",
        F.col("pos_long_ratio").alias("top_trader_pos_long"),
        F.col("pos_short_ratio").alias("top_trader_pos_short"),
        F.col("acc_long_ratio").alias("top_trader_acc_long"),
        F.col("acc_short_ratio").alias("top_trader_acc_short"),
        F.col("retail_long_ratio").alias("retail_acc_long"),
        F.col("retail_short_ratio").alias("retail_acc_short"),
        ts_to_timestamp("ts").alias("dt"),
    )
    if out_path:
        merged.write.mode("append").parquet(out_path)
    return merged


def sync_kalshi(
    spark: SparkSession,
    markets: DataFrame,
    stored_meta: DataFrame,
    thresholds: dict[str, int],
    default_threshold: int = 300,
) -> tuple[DataFrame, DataFrame]:
    """Two-branch Kalshi DAG: (new-market meta rows, filtered snapshots).

    meta branch: incoming markets anti-joined against already-finalized
    tickers (status=4). snapshot branch: status==1 AND open_interest >
    per-series prefix threshold, with renormalized probabilities.
    """
    finalized = stored_meta.filter(F.col("status") == 4).select("ticker")
    new_meta = markets.join(F.broadcast(finalized), "ticker", "left_anti")

    thr = threshold_by_prefix(F.col("event_ticker"), thresholds, default_threshold)
    yes_p, no_p = normalize_probs(F.col("yes_bid"), F.col("no_bid"))
    snapshots = (
        markets.filter((F.col("status") == 1) & (F.col("open_interest") > thr))
        .select(
            "ticker", "event_ticker", "updated_ts",
            "last_price", "yes_bid", "yes_ask", "no_bid", "no_ask",
            "liquidity", "volume", "open_interest",
            yes_p.alias("yes_prob"), no_p.alias("no_prob"),
        )
    )
    return new_meta, snapshots


def integrity_repair(
    spark: SparkSession,
    fact_path: str,
    pristine: DataFrame,
    keys: list[str],
    ts_col: str = "ts_ms",
    expected_per_hour: int = 3600,
    partition_col: str = "dt_date",
) -> DataFrame:
    """Find EMPTY/PARTIAL hours in a ``partition_col``-partitioned fact
    table and repair them from a pristine source (the S3-restore analog):
    one windowed-count plan for the whole scan range, then a dynamic
    partition overwrite scoped to the day partitions containing broken
    hours. Untouched partitions' files are never rewritten, and the
    completeness report stays distributed end to end — only scalar counts
    reach the driver, so an outage spanning many keys x hours never
    materializes on one node.

    Returns the broken-hour report, checkpointed to executor storage: its
    lineage reads the pre-repair file listing, which the overwrite (and
    its refreshByPath, which would also drop a plain cache) invalidates.
    """
    stored = spark.read.parquet(fact_path)
    if partition_col not in stored.columns:
        raise ValueError(
            f"integrity_repair requires a {partition_col!r}-partitioned fact "
            f"table at {fact_path}; found columns {stored.columns}"
        )
    report = completeness_report(stored, keys, ts_col, expected_per_hour)
    # localCheckpoint: the report is bounded by keys x hours (tiny next to
    # the fact data) and must survive the overwrite below, which swaps the
    # files its lineage points at; truncating the lineage keeps it valid
    # without ever collecting it to the driver
    bad = report.filter(F.col("status") != "OK").localCheckpoint(eager=True)
    if bad.count() == 0:
        return bad
    with_dt = F.to_date(ts_to_timestamp(ts_col)).alias(partition_col)
    repair_rows = (
        pristine.withColumn("hour_ms", (F.col(ts_col) - F.col(ts_col) % 3_600_000))
        .join(bad.select(*keys, "hour_ms"), on=[*keys, "hour_ms"], how="left_semi")
        .drop("hour_ms")
        .withColumn(partition_col, with_dt)
    )
    # rewrite whole days (the partition grain), so carry every stored row
    # of a touched day alongside the repairs; all other days are untouched
    touched_days = repair_rows.select(partition_col).distinct()
    stored_touched = stored.join(F.broadcast(touched_days), partition_col, "left_semi")
    # stored-vs-pristine collisions must resolve to the pristine row —
    # restore overwrites (reference restore_market_snapshot_from_s3.py:
    # 184-190). dropDuplicates keeps an arbitrary copy, so priority-tag and
    # take row_number()==1, same pattern as sinks/upsert.merge_upsert.
    w = Window.partitionBy(*keys, ts_col).orderBy(F.col("_src_priority"))
    merged = (
        repair_rows.select(*stored.columns).withColumn("_src_priority", F.lit(0))
        .unionByName(stored_touched.withColumn("_src_priority", F.lit(1)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_src_priority", "_rn")
    )
    overwrite_partitions(merged, fact_path, [partition_col])
    return bad


def sync_funding(
    spark: SparkSession,
    history: DataFrame,
    info: DataFrame,
    state: DataFrame,
    now_ms: int,
    out_path: str = "",
) -> DataFrame:
    """Funding-settlement ingest (reference binance/perp.py:195-222 with
    bybit/bitget's freshness skip, :200-203).

    1. F6: drop symbols whose stored state says the next settlement isn't
       due yet (state is small -> broadcast anti-join);
    2. J3: inner-join settlement history with the funding-info dimension
       (cap/floor per symbol; unmatched rows dropped, matching the
       reference's `continue`) — info is broadcast;
    3. T9: snap (next_funding_ts - ts)/60000 minutes to the nearest
       standard interval {60,120,...,720}.
    """
    due = freshness_skip(
        history, state, keys=["symbol"], not_before_col="next_funding_time",
        now_ms=now_ms,
    )
    minutes = (F.col("next_funding_ts") - F.col("ts")) / F.lit(60_000.0)
    out = (
        due.join(F.broadcast(info), "symbol", "inner")
        .select(
            "exchange_id", "inst_type", "symbol",
            "ts", ts_to_timestamp("ts").alias("dt"),
            "funding_rate",
            snap_to_intervals(minutes).alias("funding_interval"),
            "adjusted_cap", "adjusted_floor",
        )
    )
    if out_path:
        out.write.mode("append").parquet(out_path)
    return out


def sync_onchain(
    spark: SparkSession,
    txs: DataFrame,
    tags: DataFrame,
    min_usd: float = 5_000_000.0,
    out_path: str = "",
) -> DataFrame:
    """Large-transfer ingest (reference oklink/fetcher.py:142-197).

    F9 min-USD filter, then the J4 double left join: the address-tag
    dimension joined once per side on (chain, address), tags broadcast.
    Each side's display tag is the T12 coalesce cascade (dimension tag
    first), and the T11 keyword-rule entity label is derived from it.
    """
    from_tags = tags.select(
        "chain",
        F.col("address").alias("from_address"),
        F.col("tag").alias("_from_dim_tag"),
    )
    to_tags = tags.select(
        "chain",
        F.col("address").alias("to_address"),
        F.col("tag").alias("_to_dim_tag"),
    )
    out = (
        txs.filter(F.col("value_usd") >= min_usd)
        .join(F.broadcast(from_tags), ["chain", "from_address"], "left")
        .join(F.broadcast(to_tags), ["chain", "to_address"], "left")
        .select(
            "chain", "ts", ts_to_timestamp("ts").alias("dt"),
            "tx_hash", "from_address", "to_address",
            coalesce_tags(F.col("_from_dim_tag"), F.col("from_address")).alias("from_tag"),
            coalesce_tags(F.col("_to_dim_tag"), F.col("to_address")).alias("to_tag"),
            classify_first_match(F.col("_from_dim_tag")).alias("from_label"),
            classify_first_match(F.col("_to_dim_tag")).alias("to_label"),
            "token", "value", "price", "value_usd",
        )
    )
    if out_path:
        out.write.mode("append").parquet(out_path)
    return out


def sync_cex_inflow(
    spark: SparkSession,
    inflows: DataFrame,
    exchange_dim: DataFrame,
    out_path: str = "",
) -> DataFrame:
    """Hourly CEX netflow ingest (reference flows/sync_cex_inflow.py:16-31):
    rows arrive keyed by exchange NAME; resolve to exchange_id via the
    broadcast exchange dimension (J5 / S12's name lookup), derive dt."""
    dim = exchange_dim.select(
        F.col("name").alias("exchange_name"), "exchange_id"
    )
    out = (
        inflows.join(F.broadcast(dim), "exchange_name", "inner")
        .select(
            "ts", "exchange_id", ts_to_timestamp("ts").alias("dt"), "netflow",
        )
    )
    if out_path:
        out.write.mode("append").parquet(out_path)
    return out


def sync_macro(
    spark: SparkSession,
    ticker_frames: list[DataFrame],
    stored_keys: DataFrame,
    out_path: str = "",
) -> DataFrame:
    """Macro-indicator ingest (reference macro_indicators.py:35-82): union
    the per-ticker frames (U3 — schemas may differ per source, missing
    columns null-filled), then drop rows already stored (anti-join on
    (symbol, ts) — the reference's dedup-against-stored-keys contract)."""
    from functools import reduce

    batch = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), ticker_frames
    )
    out = batch.join(
        F.broadcast(stored_keys.select("symbol", "ts")), ["symbol", "ts"], "left_anti"
    ).withColumn("dt", ts_to_timestamp("ts"))
    if out_path:
        out.write.mode("append").parquet(out_path)
    return out
