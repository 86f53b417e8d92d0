"""Persisted IVF+PQ ANN index: build once, serve many — the production
shape of similarity search (the in-session composition lives in
similarity.knn_ivf_pq).

On-disk layout (build_ann_index):

    {path}/index/ivf_cell=N/...   parquet: (vec_id, pq_codes) — m small
                                  ints per vector instead of d floats
    {path}/model.json             coarse centroids + PQ codebooks (tiny,
                                  a few KB — the whole trained model)

Why this scales: the index is PARTITIONED BY the coarse cell, so a query
batch reads only its probed cells' partitions — Spark's partition
pruning turns every search into a scan of nprobe/nlist of the index, and
the pruned fraction carries m bytes per vector, not 4·d. A 1B-vector
64-d float corpus is ~256 GB raw; as m=8 codes it is ~8 GB, and a
16-probe-of-1024-cells query touches ~128 MB of parquet. Queries never
shuffle the index: candidate generation is the cell equi-join,
reconstruction is literal-expression decode, top-k is one window.

The model sidecar is deliberately JSON on the driver: it is O(nlist·d +
m·k·d/m) floats — kilobytes — and embedding it as literal expressions
(pq_reconstruct) keeps the scoring stage join-free.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .similarity import (
    assign_ivf_cells,
    cosine_sim,
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
    """Train (bounded deterministic samples), encode, and persist the
    index. Returns the model dict that was written to model.json."""
    cents = train_ivf_centroids(
        vectors, nlist=nlist, id_col=id_col, vec_col=vec_col
    )
    books = pq_train(vectors, m=m, k=k_codes, id_col=id_col, vec_col=vec_col)
    cells = assign_ivf_cells(vectors, cents, id_col=id_col, vec_col=vec_col)
    coded = pq_assign(
        cells, books, id_col=id_col, vec_col=vec_col, keep_cols=("ivf_cell",)
    ).drop(vec_col)
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
    os.makedirs(path, exist_ok=True)
    with open(f"{path}/model.json", "w") as f:
        json.dump(model, f)
    return model


def query_ann_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k against a persisted index, scanning ONLY the probed
    cells' partitions.

    The probed cell set is collected from the query batch — bounded by
    |queries|·nprobe, and query batches are small by definition (they are
    the thing you broadcast) — so the `isin` filter is static and Spark
    prunes index partitions at planning time (assert: the scan's
    PartitionFilters carries ivf_cell)."""
    with open(f"{path}/model.json") as f:
        model = json.load(f)
    q = assign_ivf_cells(
        queries, model["centroids"], id_col=id_col, vec_col=vec_col,
        nprobe=nprobe,
    ).select(
        F.col(id_col).alias("query_id"), "ivf_cell", F.col(vec_col).alias("_qvec")
    )
    probed = sorted({r.ivf_cell for r in q.select("ivf_cell").distinct().collect()})
    idx = (
        spark.read.parquet(f"{path}/index")
        .filter(F.col("ivf_cell").isin(probed))
        .select(
            F.col(model["id_col"]).alias("neighbor_id"),
            "ivf_cell",
            pq_reconstruct(model["codebooks"]).alias("_vvec"),
        )
    )
    scored = (
        idx.join(q, "ivf_cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", cosine_sim(F.col("_qvec"), F.col("_vvec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    if nprobe > 1:
        scored = scored.distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
