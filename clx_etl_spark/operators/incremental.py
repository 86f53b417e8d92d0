"""Incremental aggregate maintenance: materialized rollups refreshed by
merging MERGEABLE PARTIAL STATES instead of recomputing from raw facts.

The 100 TB pattern: a daily rollup over an append-only fact stream should
cost O(new batch) per refresh, not O(history). That requires every
aggregate to be kept as a merge-closed state:

    count  -> sum of counts
    sum    -> sum of sums       (fixed-scale DECIMAL: order-independent)
    min    -> min of mins
    max    -> max of maxs
    avg    -> derived at READ time from (sum, count) — never stored

(avg/stddev stored directly would be lost causes: they don't merge. The
same discipline the sketches follow — operators/sketch.py HLL/CMS cells
merge by max/sum — applied to plain numeric rollups.)

``partial_daily_state`` builds the state table for any slice of events;
``merge_states`` folds any number of state tables into one (associative +
commutative, so batches can arrive in any order or grouping);
``incremental_refresh`` maintains a stored parquet rollup by merging only
the GROUPS present in the new batch — the read-modify-write touches the
rollup (group-cardinality-sized), never re-scans old facts.

Reference analog: the hourly kline sync re-aggregates only the scanned
window and upserts (src/flows/sync_klines.py) — this generalizes that
cadence to arbitrary additive rollups.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

DEC6 = "decimal(38,6)"
DAY_MS = 86_400_000

STATE_COLS = ("n", "sum_v", "min_v", "max_v")


def partial_daily_state(
    events: DataFrame,
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    keys: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Mergeable per-(day, keys) aggregate state for a slice of events.
    One keyed aggregate, map-side combinable; the money-typed sum is
    DECIMAL so re-merging can't drift."""
    return events.groupBy(
        F.expr(f"{ts_ms_col} div {DAY_MS}").alias("day_id"), *keys
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(value_col).cast(DEC6)).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_states(*states: DataFrame) -> DataFrame:
    """Fold state tables into one: group back on the dimension columns and
    combine each state column with its merge function. Associative and
    commutative — any batching of the input facts yields the identical
    state (the property the oracle equality check pins)."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    dims = [c for c in merged.columns if c not in STATE_COLS]
    return merged.groupBy(*dims).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize_state(state: DataFrame) -> DataFrame:
    """Read-time derivation of the non-mergeable aggregates: avg from
    (sum, count), cast to the query-facing types."""
    return state.select(
        *[c for c in state.columns if c not in STATE_COLS],
        "n",
        F.col("sum_v").cast("double").alias("sum_value"),
        "min_v",
        "max_v",
        (F.col("sum_v").cast("double") / F.col("n").cast("double")).alias(
            "avg_value"
        ),
    )


def retractable_delta_state(
    changes: DataFrame,
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    keys: tuple[str, ...] = ("event_type",),
    change_col: str = "_change_type",
) -> DataFrame:
    """Signed partial state from a row-level change feed
    (sinks/versioned.table_changes): insert / update_postimage count +1,
    delete / update_preimage count -1, so an in-place value update nets
    to (new - old) in the sum and 0 in the count. Only the RETRACTABLE
    aggregates are kept — count and decimal sum (avg derived at read
    time). min/max are deliberately absent: they do not merge under
    deletion (retracting the current minimum needs the group's full
    value multiset or a rescan — Flink retract streams and Materialize
    draw the same line), and a rollup that silently kept stale extrema
    would be wrong, not incremental. Other change-feed rows (e.g. the
    empty compaction marker) contribute nothing."""
    sign = (
        F.when(F.col(change_col).isin("insert", "update_postimage"), F.lit(1))
        .when(F.col(change_col).isin("delete", "update_preimage"), F.lit(-1))
    )
    d = changes.withColumn("_sign", sign).filter(F.col("_sign").isNotNull())
    return d.groupBy(
        F.expr(f"{ts_ms_col} div {DAY_MS}").alias("day_id"), *keys
    ).agg(
        F.sum("_sign").alias("n"),
        F.sum(
            F.col("_sign") * F.col(value_col).cast(DEC6)
        ).alias("sum_v"),
    )


def refresh_from_change_feed(
    spark: SparkSession,
    changes: DataFrame,
    rollup_path: str,
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    keys: tuple[str, ...] = ("event_type",),
    txn: tuple[str, int] | None = None,
    facts: DataFrame | None = None,
) -> int:
    """Incremental view maintenance with RETRACTIONS: fold one window of
    a table's change feed into a VERSIONED daily rollup — the consumer
    side of sinks/versioned.table_changes. Inserts add, deletes
    subtract, updates net to their value delta; groups whose count
    reaches zero are REMOVED from the rollup (merge_version's delete
    leg), so the maintained state is exactly what a full recompute over
    the current fact snapshot would produce (the equivalence the
    ivm_rollup_from_cdf query hash-proves cross-engine).

    Cost is O(change rows + touched groups) — the fact history is never
    rescanned, and merge_version's file pruning keeps the rollup
    rewrite to the touched day neighborhood. Pass ``txn=(app_id,
    to_version)`` so a replayed window is a manifest-level no-op:
    change-feed windows are at-least-once-safe end to end. Returns the
    rollup's new version.

    ``facts`` (the CURRENT fact snapshot, i.e. read_version after the
    window's last commit) opts into EXACT min/max maintenance: extrema
    don't merge under retraction, so touched groups recompute theirs
    from the snapshot — a semi-join on the bounded touched-group set,
    O(touched groups' fact slices), untouched groups keep stored
    extrema. This is the recompute-on-retraction strategy (the other
    options are per-group multiset state or wrong answers). Choose at
    rollup creation and stay consistent: mixing extrema and
    non-extrema refreshes fails loudly on schema mismatch."""
    from ..sinks.versioned import latest_version, merge_version

    delta = retractable_delta_state(changes, value_col, ts_ms_col, keys)
    dims = ["day_id", *keys]
    if latest_version(rollup_path) is not None:
        from ..sinks.versioned import read_version

        stored = read_version(spark, rollup_path)
        joined = delta.alias("d").join(
            stored.alias("s"), dims, "left_outer"
        ).select(
            *dims,
            (F.coalesce(F.col("s.n"), F.lit(0)) + F.col("d.n")).alias("n"),
            (
                F.coalesce(F.col("s.sum_v"), F.lit(0).cast(DEC6))
                + F.col("d.sum_v")
            ).alias("sum_v"),
        )
    else:
        joined = delta
    if facts is not None:
        # exact extrema for the touched groups only: semi-join the fact
        # snapshot down to the (bounded) touched-group set, one keyed
        # min/max aggregate; zeroed groups simply find no rows
        fact_days = facts.withColumn(
            "day_id", F.expr(f"{ts_ms_col} div {DAY_MS}")
        )
        ext = (
            fact_days.join(joined.select(*dims), dims, "left_semi")
            .groupBy(*dims)
            .agg(F.min(value_col).alias("min_v"),
                 F.max(value_col).alias("max_v"))
        )
        joined = joined.join(ext, dims, "left_outer")
    # bounded: delta-group-sized; materialize before the merge rewrites
    # the files the `stored` lineage reads
    joined = joined.localCheckpoint(eager=True)
    ups = joined.filter(F.col("n") > 0)
    dels = joined.filter(F.col("n") <= 0).select(*dims)
    return merge_version(ups, rollup_path, keys=dims, deletes=dels,
                         stats_cols=["day_id"], txn=txn)


def sync_rollup_from_table(
    spark: SparkSession,
    facts_path: str,
    rollup_path: str,
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    keys: tuple[str, ...] = ("event_type",),
    app_id: str = "ivm",
    extrema: bool = False,
) -> int | None:
    """Catch the rollup up to the fact table's head — STATELESS
    maintenance: the cursor is the rollup manifest's own txn watermark
    (``app_id`` -> last applied fact version), so there is no side
    checkpoint to lose, and a crashed/duplicated invocation re-applies
    nothing (refresh_from_change_feed commits the new watermark
    atomically with the rollup files). Call it from cron, from a
    foreachBatch hook after each fact commit, or ad hoc — any cadence
    converges to the same state. ``extrema=True`` additionally
    maintains exact per-group min/max by recomputing touched groups
    from the head snapshot (see refresh_from_change_feed). Returns the
    rollup's new version, or None when already caught up."""
    from ..sinks.versioned import (_read_manifest, latest_version,
                                   table_changes)

    head = latest_version(facts_path)
    if head is None:
        return None
    rv = latest_version(rollup_path)
    applied = -1
    if rv is not None:
        applied = int(_read_manifest(rollup_path, rv).get("txn", {})
                      .get(app_id, -1))
    if applied >= head:
        return None
    changes = table_changes(spark, facts_path, applied, head)
    facts = None
    if extrema:
        from ..sinks.versioned import read_version

        facts = read_version(spark, facts_path, head)
    return refresh_from_change_feed(
        spark, changes, rollup_path, value_col, ts_ms_col, keys,
        txn=(app_id, head), facts=facts,
    )


def incremental_refresh(
    spark: SparkSession,
    new_events: DataFrame,
    rollup_path: str,
    value_col: str = "value",
    ts_ms_col: str = "ts_ms",
    keys: tuple[str, ...] = ("event_type",),
    commit_files: dict[str, str] | None = None,
) -> None:
    """Maintain a stored daily rollup from a new fact batch: aggregate the
    batch to partial state, merge with ONLY the stored groups it touches,
    and overwrite those groups (merge_upsert's keyed MERGE). Cost is
    O(batch + touched groups); history is never re-scanned. Idempotence
    caveat: refresh is additive, so exactly-once delivery into this
    function is the caller's contract (feed it from a checkpointed stream
    or the gap-planned batch pulls, both of which deliver each bar once).
    ``commit_files`` passes through to merge_upsert: sidecars committed
    atomically with the rollup swap (the transactional-sink marker hook).
    """
    from ..sinks.upsert import merge_upsert

    batch_state = partial_daily_state(new_events, value_col, ts_ms_col, keys)
    dims = ["day_id", *keys]
    if os.path.exists(rollup_path):
        stored = spark.read.parquet(rollup_path)
        touched = stored.join(
            F.broadcast(batch_state.select(*dims).distinct()), dims, "left_semi"
        )
        merged = merge_states(touched, batch_state)
    else:
        merged = batch_state
    # localCheckpoint: the MERGE below rewrites the same parquet the
    # `stored` lineage reads — materialize first (bounded: rollup-sized)
    merged = merged.localCheckpoint(eager=True)
    merge_upsert(spark, merged, rollup_path, keys=dims, commit_files=commit_files)
