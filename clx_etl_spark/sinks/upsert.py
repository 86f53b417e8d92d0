"""Idempotent MERGE-upsert sink over partitioned parquet (SURVEY K1/K2).

The reference gets idempotence implicitly: MySQL ``ON DUPLICATE KEY
UPDATE`` for dimensions (reference: src/databases/mysql/__init__.py:64-82,
updating only the listed mutable columns) and Doris unique-key tables for
facts (overlapping refetches re-sent, _base_.py:172-173). On a data lake
it must be explicit; this module provides:

  merge_upsert       key-matched last-wins merge, optionally restricted to
                     listed update columns (the reference's 5-column rule)
  append_partitioned plain partitioned append (K2 StreamLoad analog)
  overwrite_partitions  replaceWhere-style idempotent partition rewrite —
                     the scale path for fact backfills: only partitions
                     present in the update batch are rewritten
  drop_partitions    K4 partition drop (corrupt-partition repair)

Scale notes: merge reads only the target partitions the batch touches
(partition pruning by the derived partition values), shuffles once on the
merge keys, and rewrites only those partitions via dynamic overwrite.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _exists(path: str) -> bool:
    return os.path.exists(path)


def append_partitioned(df: DataFrame, path: str, partition_cols: list[str]) -> None:
    """K2: append fact rows into a partitioned parquet table."""
    df.write.mode("append").partitionBy(*partition_cols).parquet(path)


def _dedup_updates(updates: DataFrame, keys: list[str]) -> DataFrame:
    """Resolve in-batch duplicate keys deterministically (largest non-key
    tuple wins) so a replayed/multi-row micro-batch merges cleanly."""
    others = [c for c in updates.columns if c not in keys]
    if not others:
        return updates.dropDuplicates(keys)
    w = Window.partitionBy(*keys).orderBy(F.struct(*[F.col(c) for c in others]).desc())
    return (
        updates.withColumn("_urn", F.row_number().over(w))
        .filter(F.col("_urn") == 1)
        .drop("_urn")
    )


def merge_upsert(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
    update_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
    commit_files: dict[str, str] | None = None,
    evolve_schema: bool = False,
) -> None:
    """MERGE INTO semantics on a parquet table: update rows matching
    ``keys``, insert the rest. ``update_cols`` restricts which columns an
    update may change (reference _base_.py:111-121: tick_size, step_size,
    precisions, status); unlisted columns keep the stored value.

    Implementation: union(stored, updates) tagged by recency, last-wins
    row_number per key. Partitioned targets rewrite only touched
    partitions (dynamic overwrite); unpartitioned targets atomically swap.

    For partitioned targets the merge keys must functionally determine the
    partition values (true for all engine fact tables: dt_date derives
    from ts) — a key can then never "move" between partitions, so pruning
    the merge to touched partitions is exact.

    ``evolve_schema=True`` accepts batches whose schema drifted from the
    stored table: update-side columns the table lacks are ADDED (stored
    rows read NULL), stored columns the batch lacks are carried as NULL
    on inserts / kept on matches. Without it, drift is a loud error —
    the right default, paired with expectations.schema_contract for
    gating. Unpartitioned targets rewrite wholesale, so the evolved
    schema lands everywhere; partitioned targets rewrite only touched
    partitions — read those tables with mergeSchema.

    ``commit_files`` (unpartitioned targets only): sidecar files
    {name: content} written into the staging directory BEFORE the atomic
    rename, so they become visible exactly when the data commit does —
    the hook transactional sinks need to record an applied-transaction id
    atomically with the data (Delta's txnAppId/txnVersion pattern; used
    by streaming/jobs.make_rollup_sink). Names must start with ``_`` so
    Spark's file index ignores them. Sidecars NOT passed are dropped by
    the swap — callers carry forward whatever must persist.
    """
    partition_cols = partition_cols or []
    if commit_files and partition_cols:
        raise ValueError(
            "commit_files requires an unpartitioned target (atomic swap); "
            "dynamic partition overwrite has no single commit point"
        )
    updates = _dedup_updates(updates, keys)
    if not _exists(path):
        if commit_files:
            tmp = path.rstrip("/") + "._staged"
            updates.write.mode("overwrite").parquet(tmp)
            for name, content in commit_files.items():
                with open(os.path.join(tmp, name), "w") as fh:
                    fh.write(content)
            os.rename(tmp, path)
        else:
            updates.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
        return
    stored = spark.read.parquet(path)
    if (
        not evolve_schema
        and update_cols is None
        and set(updates.columns) != set(stored.columns)
    ):
        # silent column dropping is how pipelines lose data: a widened
        # batch must either evolve the table or fail loudly (update_cols
        # callers legitimately send a column subset and are exempt)
        raise ValueError(
            "merge_upsert: batch schema drifted from stored table "
            f"(batch-only: {sorted(set(updates.columns) - set(stored.columns))}, "
            f"stored-only: {sorted(set(stored.columns) - set(updates.columns))}); "
            "pass evolve_schema=True to evolve, or align the batch"
        )
    if evolve_schema:
        batch_cols = list(updates.columns)
        for c in [c for c in updates.columns if c not in stored.columns]:
            stored = stored.withColumn(
                c, F.lit(None).cast(updates.schema[c].dataType)
            )
        missing = [c for c in stored.columns if c not in updates.columns]
        for c in missing:
            updates = updates.withColumn(
                c, F.lit(None).cast(stored.schema[c].dataType)
            )
        if update_cols is None and missing:
            # a narrowed batch must not null stored columns on matched
            # rows (Delta updateAll-with-evolution keeps the target
            # value): restrict updates to the columns the batch actually
            # carries, so the carry path below recovers the rest from
            # the stored row on matches and NULLs them only on inserts
            update_cols = [c for c in batch_cols if c not in keys]
    if partition_cols:
        # prune the merge to partitions the batch touches: a broadcast
        # semi-join on the partition columns, so dynamic partition pruning
        # skips untouched partitions at scan time without ever collecting
        # the touched-partition list to the driver (unbounded at 100 TB
        # partition counts)
        touched = updates.select(*partition_cols).distinct()
        stored_slice = stored.join(F.broadcast(touched), on=partition_cols, how="left_semi")
    else:
        stored_slice = stored

    if update_cols is not None:
        # updates may only change update_cols: recover untouched columns
        # from the stored row when it exists (left join on keys). A marker
        # column distinguishes matched from inserted rows so a stored NULL
        # in a carry column stays NULL (coalesce would resurrect the
        # incoming value, violating "unlisted columns keep the stored value")
        carry = [c for c in stored.columns if c not in keys and c not in update_cols]
        matched = stored_slice.select(
            *keys, *carry, F.lit(True).alias("_matched")
        ).alias("s")
        upd = updates.alias("u").join(matched, on=keys, how="left").select(
            *[F.col(f"u.{k}") for k in keys],
            *[F.col(f"u.{c}").alias(c) for c in update_cols],
            *[
                F.when(F.col("s._matched"), F.col(f"s.{c}"))
                .otherwise(F.col(f"u.{c}"))
                .alias(c)
                for c in carry
            ],
        )
        upd = upd.select(*stored.columns)
    else:
        upd = updates.select(*stored.columns)

    merged = (
        stored_slice.withColumn("_src", F.lit(0))
        .unionByName(upd.withColumn("_src", F.lit(1)))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy(*keys).orderBy(F.col("_src").desc())
            ),
        )
        .filter(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )

    if partition_cols:
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            merged.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        spark.catalog.refreshByPath(path)
    else:
        # materialize to a staging dir first (merged lazily reads `path`),
        # then swap — readers never see a half-written table
        tmp = path.rstrip("/") + "._staged"
        merged.write.mode("overwrite").parquet(tmp)
        for name, content in (commit_files or {}).items():
            with open(os.path.join(tmp, name), "w") as fh:
                fh.write(content)
        shutil.rmtree(path)
        os.rename(tmp, path)
        spark.catalog.refreshByPath(path)


def overwrite_partitions(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """replaceWhere-style idempotent rewrite: every partition present in
    ``df`` is replaced wholesale — re-running a backfill converges
    (the engine's exactly-once story for fact refetches, SURVEY §2.11)."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    spark.catalog.refreshByPath(path)


def drop_partitions(path: str, partition_cols: list[str], values: list[tuple]) -> int:
    """K4: drop listed partitions (reference doris_partition_health_check
    ALTER TABLE ... DROP PARTITION FORCE). Returns partitions removed."""
    removed = 0
    for vals in values:
        sub = "/".join(f"{c}={v}" for c, v in zip(partition_cols, vals))
        target = os.path.join(path, sub)
        if os.path.exists(target):
            shutil.rmtree(target)
            removed += 1
    return removed


def expire_partitions(
    path: str, partition_col: str, keep_latest: int
) -> list[str]:
    """Retention/TTL: keep only the ``keep_latest`` most recent values of
    a date-like partition column, drop the rest (reference: the Doris
    partition health check prunes stale partitions the same way). The
    listing is one directory scan — bounded by partition count, never
    data size; values sort lexicographically, which is correct for
    ISO dates and zero-padded buckets. Returns dropped values."""
    prefix = f"{partition_col}="
    vals = sorted(
        e[len(prefix):]
        for e in os.listdir(path)
        if e.startswith(prefix) and os.path.isdir(os.path.join(path, e))
    )
    stale = vals[:-keep_latest] if keep_latest > 0 else vals
    drop_partitions(path, [partition_col], [(v,) for v in stale])
    return stale


def apply_changelog(
    changelog: DataFrame,
    keys: list[str],
    ts_col: str,
    op_col: str = "op",
    upsert_ops: tuple[str, ...] = ("I", "U"),
    delete_op: str = "D",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """CDC changelog replay: fold an (key, ts, op, payload) stream of
    inserts/updates/deletes into the CURRENT state — the Debezium/binlog
    materialization every warehouse sink eventually needs.

    Semantics: per key, the operation with the highest (ts, order_cols)
    wins; if the winner is a delete the key is absent from the output,
    otherwise the winner's payload is the row. One shuffle (the per-key
    window); deterministic only if (ts, order_cols) totally orders each
    key's operations — pass a sequence/offset column as the tie-break,
    exactly like a binlog position.

    Composes with merge_upsert for incremental application: replay the
    batch's changelog to per-key net state here, then MERGE the survivors
    and drop_partitions/anti-join the deletions.
    """
    order_cols = order_cols or []
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).desc(), *[F.col(c).desc() for c in order_cols]
    )
    ranked = changelog.withColumn("_rn", F.row_number().over(w))
    return (
        ranked.filter(F.col("_rn") == 1)
        .filter(F.col(op_col).isin(*upsert_ops))
        .drop("_rn")
    )
