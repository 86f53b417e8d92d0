"""Structured Streaming jobs: the reference's cron micro-batches
re-expressed as streaming queries (SURVEY §2.11).

The reference schedules batch pulls every 30s-1h (reference:
src/deploy.py:79-148) and handles late data by *re-pulling* gaps rather
than dropping past-watermark rows. The streaming layer therefore:

  * windowed_counts / windowed_agg — tumbling-window aggregates with a
    watermark for state cleanup (append-mode safe);
  * foreach_batch_upsert — sink wrapper running the idempotent MERGE of
    sinks.upsert per micro-batch, so at-least-once delivery + idempotent
    merge = effectively-once table state (the engine's exactly-once-ish
    contract);
  * file_stream — file-drop source (the S3-restore analog): new parquet/
    json files under a directory become micro-batches.

Gap-repair stays a scheduled *batch* reconciliation (operators.gaps) by
design — matching the reference, late data is refetched, never dropped.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from pyspark.sql.streaming import StreamingQuery


def file_stream(
    spark: SparkSession, path: str, schema, fmt: str = "parquet"
) -> DataFrame:
    return spark.readStream.format(fmt).schema(schema).load(path)


def windowed_counts(
    events: DataFrame,
    time_col: str,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
    keys: list[str] | None = None,
    slide: str | None = None,
    session_gap: str | None = None,
) -> DataFrame:
    """Windowed counts with watermarked state cleanup. Default tumbling;
    pass ``slide`` for sliding (overlapping) windows or ``session_gap``
    for session windows (SURVEY §2.11: surface the reference lacks)."""
    keys = keys or []
    if session_gap is not None:
        win = F.session_window(F.col(time_col), session_gap).alias("w")
    else:
        win = F.window(F.col(time_col), window, slide or window).alias("w")
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(win, *keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), *keys, "n")
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    time_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup on composite keys with bounded state:
    duplicates arriving within the watermark horizon are dropped, state
    for older keys is evicted (the at-least-once feed -> exactly-once-ish
    table story at the stream layer, complementing the MERGE sink).
    State is O(distinct keys inside the horizon), not O(stream)."""
    return events.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(keys)


def foreach_batch_upsert(
    stream: DataFrame,
    path: str,
    keys: list[str],
    checkpoint: str,
    partition_cols: list[str] | None = None,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """writeStream.foreachBatch -> idempotent MERGE: replayed batches
    (at-least-once) converge to the same table state."""
    from ..sinks.upsert import merge_upsert

    def sink(batch: DataFrame, batch_id: int) -> None:
        if transform is not None:
            batch = transform(batch)
        merge_upsert(
            batch.sparkSession, batch, path, keys, partition_cols=partition_cols or []
        )

    writer = stream.writeStream.foreachBatch(sink).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_ohlcv(
    ticks: DataFrame,
    keys: list[str],
    time_col: str,
    price_col: str = "price",
    window: str = "1 minute",
    watermark: str = "10 minutes",
    volume_col: str | None = None,
) -> DataFrame:
    """Streaming hypertable rollup: tick stream -> watermarked OHLCV bars
    (the streaming counterpart of operators.resample — same min_by/max_by
    open/close semantics, event-time ordered). Late ticks inside the
    watermark horizon still amend their bar; beyond it, the batch gap
    reconciliation owns the repair (the engine's layered late-data story).
    State is O(open windows x keys) — bounded by the watermark."""
    win = F.window(F.col(time_col), window).alias("w")
    aggs = [
        F.min_by(F.col(price_col), F.col(time_col)).alias("open"),
        F.max(F.col(price_col)).alias("high"),
        F.min(F.col(price_col)).alias("low"),
        F.max_by(F.col(price_col), F.col(time_col)).alias("close"),
        F.count(F.lit(1)).alias("n_ticks"),
    ]
    if volume_col:
        aggs.append(F.sum(F.col(volume_col)).alias("volume"))
    return (
        ticks.withWatermark(time_col, watermark)
        .groupBy(win, *keys)
        .agg(*aggs)
        .select(F.col("w.start").alias("bar_start"), *keys, "open", "high",
                "low", "close", "n_ticks",
                *(["volume"] if volume_col else []))
    )


def gated_ingest(
    stream: DataFrame,
    expectations: list,
    path: str,
    keys: list[str],
    checkpoint: str,
    quarantine_path: str | None = None,
    partition_cols: list[str] | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Expectation-gated streaming ingest: every micro-batch is split by
    the ROW-LEVEL expectations (operators/expectations.py) — clean rows
    MERGE into the table, violating rows land in a quarantine append
    (same dead-letter discipline as the strict file sources) instead of
    poisoning the table or killing the query. Set-level checks (unique /
    foreign_key) belong in the batch validate() audit, not a per-row
    gate.

    The violation predicate is a pure column expression, so the gate
    costs one extra filter per batch — no second scan, no collect; the
    quarantine write only runs when a batch actually has bad rows."""
    from ..sinks.upsert import merge_upsert

    row_level = [e for e in expectations if e.violation is not None]
    if not row_level:
        raise ValueError("gated_ingest needs at least one row-level expectation")
    bad = row_level[0].violation
    for e in row_level[1:]:
        bad = bad | e.violation
    # a NULL violation verdict (e.g. satisfies() over a null column) must
    # count as violating, and the same normalized predicate must drive
    # BOTH splits — otherwise null-verdict rows vanish from clean AND
    # quarantine
    bad = F.coalesce(bad, F.lit(True))

    def sink(batch: DataFrame, batch_id: int) -> None:
        dirty = batch.filter(bad)
        if quarantine_path is not None and dirty.limit(1).count() > 0:
            dirty.write.mode("append").parquet(quarantine_path)
        clean = batch.filter(~bad)
        merge_upsert(
            batch.sparkSession, clean, path, keys,
            partition_cols=partition_cols or [],
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def with_ingest_metrics(
    stream: DataFrame,
    time_col: str,
    late_after_ms: int,
    name: str = "ingest",
) -> DataFrame:
    """Attach per-micro-batch observability (df.observe): row count, min
    and max event time (epoch ms), and how many rows arrived more than
    ``late_after_ms`` behind wall clock — the lateness profile that
    tells you whether the watermark horizon is sized right. Surfaced
    through StreamingQueryProgress.observedMetrics with ZERO extra
    passes (the aggregates ride the existing scan); the stream's rows
    are unchanged."""
    from pyspark.sql import functions as F

    c = F.col(time_col)
    threshold = F.unix_millis(F.current_timestamp()) - F.lit(late_after_ms)
    return stream.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.min(c).alias("min_event_ms"),
        F.max(c).alias("max_event_ms"),
        F.count(F.when(c < threshold, 1)).alias("n_late"),
    )


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    keys: list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static dimension enrichment: join each micro-batch against a
    (small) static dimension — Spark broadcasts the static side and
    re-evaluates its plan per batch, so a dimension backed by a parquet
    path picks up slowly-changing updates between batches without
    restarting the query. The streaming counterpart of the J3/J5
    broadcast dim joins (reference resolves symbol/exchange dims per
    batch the same way, src/flows/sync_klines.py)."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), keys, how)


def make_rollup_sink(
    rollup_path: str,
    checkpoint: str,
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    keys: tuple[str, ...] = ("event_type",),
):
    """The per-batch sink behind rollup_stream, factored out so the
    replay guard is directly testable: (batch, batch_id) -> None, no-op
    when this (checkpoint, batch_id) was already applied.

    The applied-id set lives INSIDE the rollup directory
    (``_applied_{ns}.json`` — Spark's file index ignores ``_``-prefixed
    files) and is written into the staging directory BEFORE the atomic
    swap (merge_upsert ``commit_files``), so marker and data commit in
    the same rename: there is no crash window in which the refresh is
    committed but the marker is not, and a replayed batch can never
    double-merge. Crash between staged-complete and swap is recovered on
    the next call by promoting the staged dir (a marker file inside
    staged implies its parquet write finished). Single writer per rollup
    path assumed — the same contract any file-swap sink carries."""
    import glob as _glob
    import hashlib as _hashlib
    import json as _json
    import os as _os
    import shutil as _shutil

    from ..operators.incremental import incremental_refresh

    ns = _hashlib.md5(checkpoint.encode()).hexdigest()[:12]
    marker = f"_applied_{ns}.json"
    staged = rollup_path.rstrip("/") + "._staged"

    def _applied() -> set[int]:
        f = _os.path.join(rollup_path, marker)
        if _os.path.exists(f):
            with open(f) as fh:
                return set(_json.load(fh)["batch_ids"])
        return set()

    def sink(batch: DataFrame, batch_id: int) -> None:
        # crash recovery: a staged dir containing ANY applied-marker is a
        # complete commit whose swap was interrupted — promote it (it was
        # derived from the current rollup + one batch, so it supersedes)
        if _glob.glob(_os.path.join(staged, "_applied_*.json")):
            if _os.path.exists(rollup_path):
                _shutil.rmtree(rollup_path)
            _os.rename(staged, rollup_path)
        if batch_id in _applied():
            return  # replayed batch: already merged, skip (idempotence)
        # carry every producer's marker through the swap (markers are
        # namespaced per checkpoint so concurrent-lineage ids never mix)
        files: dict[str, str] = {}
        if _os.path.exists(rollup_path):
            for p in _glob.glob(_os.path.join(rollup_path, "_applied_*.json")):
                with open(p) as fh:
                    files[_os.path.basename(p)] = fh.read()
        files[marker] = _json.dumps({"batch_ids": sorted(_applied() | {batch_id})})
        incremental_refresh(
            batch.sparkSession, batch, rollup_path, value_col, ts_ms_col, keys,
            commit_files=files,
        )

    return sink


def rollup_stream(
    events: DataFrame,
    rollup_path: str,
    checkpoint: str,
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    keys: tuple[str, ...] = ("event_type",),
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Streaming incremental rollup: each micro-batch's partial aggregate
    state merges into the stored daily rollup (operators/incremental.py)
    — O(batch + touched groups) per trigger, facts never re-scanned.

    Exactly-once for an ADDITIVE sink: merging the same batch twice would
    double-count, and Spark's foreachBatch contract is at-least-once
    (a crash between sink success and checkpoint commit replays the
    batch). The standard transactional-sink guard (Delta's
    txnAppId/txnVersion pattern): a marker file per applied batch_id,
    NAMESPACED by the checkpoint (= the query lineage — stable across
    restarts of the same query, distinct for a second stream feeding the
    same rollup, so two producers can never swallow each other's batch
    ids). A replayed batch sees its marker and no-ops; the marker file
    is committed ATOMICALLY with the refresh (written into the staging
    directory before merge_upsert's rename-swap), so neither
    half-applied NOR double-applied refreshes are possible — there is no
    crash window where data committed but the marker did not (see
    make_rollup_sink). Starting a FRESH checkpoint against an existing
    rollup re-ingests from scratch by design — point it at a fresh
    rollup too.
    """
    writer = events.writeStream.foreachBatch(
        make_rollup_sink(rollup_path, checkpoint, value_col, ts_ms_col, keys)
    ).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def cdc_apply_stream(
    changelog: DataFrame,
    path: str,
    keys: list[str],
    ts_col: str,
    checkpoint: str,
    op_col: str = "op",
    order_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Streaming CDC materialization: fold each micro-batch's changelog
    to per-key net state (sinks/upsert.apply_changelog), MERGE the
    upsert-winners, and physically delete keys whose batch-winner is a
    delete — the binlog->table tail of a warehouse sink.

    Convergence under at-least-once replay: both legs are idempotent
    (MERGE last-wins on the same keys; delete of an absent key is a
    no-op), so reprocessed batches land on the same table state. A
    cross-batch caveat is inherent to CDC ordering: rows arriving in
    different batches resolve by batch arrival order, so upstream must
    deliver per-key operations in order (true for binlog/Debezium
    partitioned by key).

    Deletes rewrite only the partitions holding deleted keys (anti-join
    scoped), mirroring merge_upsert's touched-partition discipline.
    """
    import os as _os

    from ..sinks.upsert import apply_changelog, merge_upsert

    def sink(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        winners = apply_changelog(
            batch,
            keys,
            ts_col,
            op_col=op_col,
            upsert_ops=("I", "U"),
            order_cols=order_cols,
        ).drop(op_col)
        merge_upsert(
            spark, winners, path, keys, partition_cols=partition_cols or []
        )
        # delete-winners: keep rows whose key is NOT deleted in this batch
        w = Window.partitionBy(*keys).orderBy(
            F.col(ts_col).desc(),
            *[F.col(c).desc() for c in (order_cols or [])],
        )
        deletes = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col(op_col) == "D"))
            .select(*keys)
        )
        if deletes.isEmpty() or not _os.path.exists(path):
            return
        stored = spark.read.parquet(path)
        if partition_cols:
            # rewrite ONLY partitions holding a deleted key: semi-join the
            # stored table to find them, anti-join out the deleted rows,
            # dynamic-overwrite just those partitions (merge_upsert's
            # touched-partition discipline)
            touched = (
                stored.join(F.broadcast(deletes), keys, "left_semi")
                .select(*partition_cols)
                .distinct()
            )
            slice_ = stored.join(
                F.broadcast(touched), on=partition_cols, how="left_semi"
            )
            remaining = slice_.join(F.broadcast(deletes), keys, "left_anti")
            # materialize the emptied-partition list BEFORE the overwrite:
            # parquet reads are path-lazy, so evaluating after the write
            # would see post-write state
            emptied = (
                touched.join(
                    remaining.select(*partition_cols).distinct(),
                    on=partition_cols,
                    how="left_anti",
                )
                .collect()
            )
            prev = spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "static"
            )
            spark.conf.set(
                "spark.sql.sources.partitionOverwriteMode", "dynamic"
            )
            try:
                remaining.write.mode("overwrite").partitionBy(
                    *partition_cols
                ).parquet(path)
            finally:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
            # dynamic overwrite never touches a partition that produced
            # ZERO output rows — a fully-emptied partition would survive
            # with its deleted rows. Drop those explicitly (bounded by
            # the touched-partition count, never data size).
            from ..sinks.upsert import drop_partitions

            if emptied:
                drop_partitions(
                    path,
                    partition_cols,
                    [tuple(r[c] for c in partition_cols) for r in emptied],
                )
            spark.catalog.refreshByPath(path)
        else:
            remaining = stored.join(F.broadcast(deletes), keys, "left_anti")
            tmp = path + "._cdc_tmp"
            remaining.write.mode("overwrite").parquet(tmp)
            import shutil as _shutil

            _shutil.rmtree(path)
            _os.rename(tmp, path)
            spark.catalog.refreshByPath(path)

    writer = changelog.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def make_near_dup_ingest_sink(
    corpus_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket_size: int | None = 256,
):
    """The per-batch sink behind near_dup_ingest_stream, factored out so
    the ingest policy is directly testable: (batch, batch_id) -> None.

    Per batch, in order:
      1. exact replay/dup guard — batch ids already in the accepted
         corpus drop via a broadcast anti-join (makes at-least-once
         redelivery idempotent at the id level);
      2. batch-internal near-dups — minhash_near_duplicates over the
         batch only (batch-sized LSH, never corpus-sized); within each
         pair the larger id drops (keep-first policy);
      3. batch-vs-corpus near-dups — incremental_near_duplicates joins
         the batch one-sidedly against the corpus band index, so
         candidate volume scales with the batch, not the corpus
         (operators/dedup.py:538), with the viral-bucket cap on;
      4. survivors append to the accepted corpus.

    Scale note: the corpus index is re-derived per batch here (testable,
    dependency-free); production keeps the build_near_dup_index tables
    (dedup.py:505) as persisted parquet and appends the batch's
    signatures alongside the accepted docs, making step 3 O(batch).
    """
    import os as _os

    from ..operators.dedup import (incremental_near_duplicates,
                                   minhash_near_duplicates)

    def sink(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        batch = batch.dropDuplicates([id_col])
        corpus = (
            spark.read.parquet(corpus_path)
            if _os.path.exists(corpus_path)
            else None
        )
        if corpus is not None:
            batch = batch.join(
                F.broadcast(corpus.select(id_col)), id_col, "left_anti"
            )
        internal = minhash_near_duplicates(
            batch, text_col, id_col, k, num_perm, bands, threshold
        )
        batch = batch.join(
            internal.select(F.col("doc_b").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )
        if corpus is not None:
            vs_corpus = incremental_near_duplicates(
                corpus,
                batch,
                text_col,
                id_col,
                k,
                num_perm,
                bands,
                threshold,
                max_bucket_size=max_bucket_size,
            )
            batch = batch.join(
                vs_corpus.select(id_col).distinct(), id_col, "left_anti"
            )
        # materialize before the append: the lineage reads corpus_path,
        # which the write below extends
        batch = batch.localCheckpoint(eager=True)
        batch.write.mode("append").parquet(corpus_path)

    return sink


def near_dup_ingest_stream(
    docs: DataFrame,
    corpus_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Continuous corpus building with near-duplicate gating: each
    micro-batch of documents is deduplicated (exact id, batch-internal
    MinHash-LSH, batch-vs-corpus incremental LSH) and the survivors are
    appended to the accepted corpus — the streaming operationalization
    of the persisted near-dup index path the batch operators provide.
    At-least-once replay converges: a replayed batch's ids are already
    in the corpus and drop at step 1 before any append."""
    writer = docs.writeStream.foreachBatch(
        make_near_dup_ingest_sink(
            corpus_path, text_col, id_col, threshold=threshold
        )
    ).option("checkpointLocation", checkpoint)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def versioned_ingest_stream(
    stream: DataFrame,
    table_path: str,
    checkpoint: str,
    stats_cols: list[str] | None = None,
    trigger_available_now: bool = True,
    rollup_path: str | None = None,
    rollup_value_col: str = "value",
    rollup_ts_col: str = "ts_ms",
    rollup_keys: tuple[str, ...] = ("event_type",),
    auto_compact_every: int | None = None,
    auto_compact_target_bytes: int = 128 << 20,
) -> StreamingQuery:
    """Exactly-once streaming append into a versioned table: every
    micro-batch commits through append_version with
    txn=(checkpoint-id, batch_id) — the txn watermark lives INSIDE the
    manifest JSON, so it becomes visible atomically with the file list
    and a replayed batch is a no-op (sinks/versioned.py). This is the
    manifest-native form of the rollup sink's marker pattern, and the
    natural lakehouse tail for a fact stream: downstream consumers get
    time travel, O(delta) read_changes, manifest data skipping, tags,
    and rollback on the ingested table for free.

    ``rollup_path`` additionally maintains a versioned daily rollup
    after each batch commit (incremental.sync_rollup_from_table): the
    rollup's cursor is its own manifest txn watermark, so the
    facts-append and rollup-sync pair is exactly-once END TO END with
    no extra checkpoint — a crash between the two self-heals on the
    next batch (the sync re-reads only the unapplied change window).

    ``auto_compact_every=k`` folds the accumulated SMALL files (below
    ``auto_compact_target_bytes``) every k-th batch — streaming ingest
    writes one file per micro-batch, and without maintenance the table
    degrades into thousands of fragments; the bin-packing rewrite never
    touches right-sized files, so each maintenance commit is O(recent
    fragments), not O(table). The compaction's overwrite commit carries
    the txn watermarks (exactly-once replays stay no-ops across it) and
    always records an EMPTY change set (change_feed=True) so row-level
    consumers — table_changes, the rollup_path sync below, any
    clx_cdf/rollup_maintenance_stream subscriber — cross the
    maintenance commit instead of failing permanently on an
    unrecorded rewrite; file-level read_changes consumers must still
    window their reads between compactions or switch to the change
    feed."""
    import hashlib as _hashlib

    from ..sinks.versioned import append_version, compact_version

    app_id = "stream-" + _hashlib.md5(checkpoint.encode()).hexdigest()[:12]

    def sink(batch: DataFrame, batch_id: int) -> None:
        append_version(batch, table_path, stats_cols=stats_cols,
                       txn=(app_id, batch_id))
        if auto_compact_every and batch_id % auto_compact_every == (
                auto_compact_every - 1):
            compact_version(
                batch.sparkSession, table_path,
                target_bytes=auto_compact_target_bytes,
                small_only_below=auto_compact_target_bytes,
                # the empty change marker lets table_changes (and with
                # it the rollup sync / clx_cdf consumers) cross the
                # maintenance commit — without it the stream would fail
                # permanently at this version
                change_feed=True,
            )
        if rollup_path is not None:
            from ..operators.incremental import sync_rollup_from_table

            sync_rollup_from_table(
                batch.sparkSession, table_path, rollup_path,
                rollup_value_col, rollup_ts_col, rollup_keys,
            )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def rollup_maintenance_stream(
    spark: SparkSession,
    facts_path: str,
    rollup_path: str,
    checkpoint: str,
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    keys: tuple[str, ...] = ("event_type",),
    starting_version: int | str = 0,
    trigger_available_now: bool = True,
    extrema: bool = False,
) -> StreamingQuery:
    """Continuous incremental view maintenance, DECOUPLED from the
    writer: subscribe to a versioned fact table's change feed (the
    clx_cdf DSv2 source — manifest versions as checkpointed offsets)
    and fold every micro-batch of change rows into a versioned rollup
    (incremental.refresh_from_change_feed). Inserts add, deletes
    retract, updates net to their delta — downstream aggregates stay
    continuously correct under a mutating workload WITHOUT the ingest
    job knowing the rollup exists (contrast versioned_ingest_stream's
    rollup_path, which couples them in one foreachBatch).

    Exactly-once end to end with two independent cursors: the stream's
    checkpoint tracks which fact versions were DELIVERED, and the
    rollup manifest's txn watermark (app 'cdf-maintenance', version =
    the batch's max _commit_version) makes a redelivered batch a
    manifest-level no-op — so a crash between sink and checkpoint
    cannot double-apply.

    ``extrema=True`` maintains exact per-group min/max: touched groups
    recompute from the fact snapshot AT the batch's last delivered
    version (a time-travel read — consistent even if the writer has
    already committed past it)."""
    from ..operators.incremental import refresh_from_change_feed
    from ..sources.cdf_source import stream_changes

    changes = stream_changes(spark, facts_path,
                             starting_version=starting_version)

    def sink(batch: DataFrame, batch_id: int) -> None:
        row = batch.agg(F.max("_commit_version").alias("v")).first()
        if row["v"] is None:
            return  # empty micro-batch: nothing delivered
        facts = None
        if extrema:
            from ..sinks.versioned import read_version

            facts = read_version(batch.sparkSession, facts_path,
                                 int(row["v"]))
        refresh_from_change_feed(
            batch.sparkSession, batch, rollup_path,
            value_col, ts_ms_col, keys,
            txn=("cdf-maintenance", int(row["v"])),
            facts=facts,
        )

    writer = changes.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def versioned_cdc_stream(
    changelog: DataFrame,
    table_path: str,
    checkpoint: str,
    keys: list[str],
    ts_col: str = "ts_ms",
    op_col: str = "op",
    upsert_ops: tuple[str, ...] = ("I", "U"),
    delete_op: str = "D",
    order_cols: list[str] | None = None,
    stats_cols: list[str] | None = None,
    trigger_available_now: bool = True,
    change_feed: bool = False,
    rollup_path: str | None = None,
    rollup_value_col: str = "value",
    rollup_ts_col: str = "ts_ms",
    rollup_keys: tuple[str, ...] = ("event_type",),
    merge_on_read: bool = False,
) -> StreamingQuery:
    """Exactly-once CDC apply into a versioned table: each micro-batch
    of a Debezium/binlog-shaped changelog (key, ts, op, payload) folds
    to its per-key net effect (highest (ts, order_cols) wins — the
    sinks.upsert.apply_changelog contract), then commits ONE
    merge_version with the winners as updates, the delete-winners as
    deletes, and txn=(checkpoint-id, batch_id) — so a replayed batch is
    a manifest-level no-op and at-least-once delivery cannot regress a
    key to an older state. The stored table's schema is the changelog's
    payload (op column dropped; ts kept — it is the row's version
    stamp, exactly what cdc_current_state materializes).

    At 100 TB this is the canonical lakehouse CDC tail: per batch the
    merge rewrites only the files whose key range (and bloom, when
    indexed) intersects the batch's keys — a narrow binlog slice
    touches its key neighborhood, not the table. Pair with
    read_version/scan_version for serving and read_changes is N/A
    across merges by design (op 'overwrite' breaks append lineage
    loudly) — pass ``change_feed=True`` for row-level table_changes
    across the CDC commits instead.

    ``rollup_path`` (requires ``change_feed=True``) maintains a
    versioned daily rollup after each merge via the change feed
    (incremental.sync_rollup_from_table): updates net to their value
    delta, deletes retract — so streaming CDC keeps downstream
    aggregates continuously correct, exactly-once end to end, with no
    side checkpoint.

    ``merge_on_read=True`` routes each batch through merge_version_dv
    instead: matched rows dv-tombstone in place and the batch appends —
    O(batch) write amplification per commit, the right steady state for
    high-frequency narrow binlog batches; schedule
    ``compact_version(where=...)`` over the hot key range to purge the
    accumulated tombstones + small files (same txn idempotence either
    way)."""
    import hashlib as _hashlib

    from ..sinks.versioned import merge_version, merge_version_dv

    merge_fn = merge_version_dv if merge_on_read else merge_version
    if rollup_path is not None and not change_feed:
        raise ValueError(
            "rollup maintenance over a CDC stream needs change_feed=True "
            "(the rollup folds the merge's row-level change set)"
        )
    app_id = "cdc-" + _hashlib.md5(checkpoint.encode()).hexdigest()[:12]
    order_cols = order_cols or []

    def sink(batch: DataFrame, batch_id: int) -> None:
        w = Window.partitionBy(*keys).orderBy(
            F.col(ts_col).desc(), *[F.col(c).desc() for c in order_cols]
        )
        winners = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        ups = winners.filter(F.col(op_col).isin(*upsert_ops)).drop(op_col)
        dels = winners.filter(F.col(op_col) == delete_op).select(*keys)
        merge_fn(ups, table_path, keys=keys, stats_cols=stats_cols,
                 deletes=dels, txn=(app_id, batch_id),
                 change_feed=change_feed)
        if rollup_path is not None:
            from ..operators.incremental import sync_rollup_from_table

            sync_rollup_from_table(
                batch.sparkSession, table_path, rollup_path,
                rollup_value_col, rollup_ts_col, rollup_keys,
            )

    writer = changelog.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_stream_attribution(
    views: DataFrame,
    clicks: DataFrame,
    key: str,
    view_time_col: str = "view_time",
    click_time_col: str = "click_time",
    window: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream event-time interval join: attribute each click to a
    preceding view by the same key within ``window`` — the two-stream
    funnel that stream-static joins can't express (both sides arrive
    continuously). Both inputs carry watermarks, and the join condition
    time-bounds the match, so Spark buffers each side only within the
    watermark horizon: state is O(events inside horizon), evicted as the
    watermark advances — never unbounded.

    ``how="left_outer"`` additionally emits views that never converted,
    with NULL click columns, once the watermark proves no match can
    still arrive (exactly the reference's gap-accounting posture:
    late data inside the horizon still matches; beyond it, the batch
    reconciliation owns repair). Column names must be disjoint apart
    from ``key``.

    Eviction caveat (standard Spark semantics, worth stating): under
    the default ``spark.sql.streaming.multipleWatermarkPolicy=min``
    the GLOBAL watermark is the minimum across BOTH inputs, so
    unmatched-view emission requires the views stream itself to keep
    advancing — an idle views source pins the global watermark at its
    last event time minus ``watermark`` and the outer state never
    flushes, even across restarts. In production both streams tick
    continuously so this is moot; in a drained/backfill run, either
    feed a heartbeat event through the views side or set the policy to
    ``max``. Given both watermarks advance, a single
    ``Trigger.AvailableNow`` pass IS sufficient: Spark runs the extra
    no-data batch that evicts and emits outer rows before terminating
    (verified on 4.1.2 by tests/test_streaming.py::
    test_stream_stream_attribution_interval_join)."""
    v = views.withWatermark(view_time_col, watermark).alias("v")
    c = clicks.withWatermark(click_time_col, watermark).alias("c")
    cond = (
        (F.col(f"v.{key}") == F.col(f"c.{key}"))
        & (F.col(f"c.{click_time_col}") >= F.col(f"v.{view_time_col}"))
        & (
            F.col(f"c.{click_time_col}")
            <= F.col(f"v.{view_time_col}") + F.expr(f"INTERVAL {window}")
        )
    )
    joined = v.join(c, cond, how)
    out_cols = [F.col(f"v.{key}").alias(key), F.col(f"v.{view_time_col}")]
    out_cols += [
        F.col(f"v.{x}") for x in views.columns if x not in (key, view_time_col)
    ]
    out_cols += [F.col(f"c.{click_time_col}")]
    out_cols += [
        F.col(f"c.{x}") for x in clicks.columns if x not in (key, click_time_col)
    ]
    return joined.select(*out_cols)
