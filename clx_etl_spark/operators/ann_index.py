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
    idx = (
        spark.read.parquet(f"{path}/index")
        .filter(F.col("ivf_cell").isin(probed))
        .select(
            F.col(model["id_col"]).alias("neighbor_id"),
            "ivf_cell",
            pq_reconstruct(model["codebooks"]).alias("_vvec"),
        )
    )
    return adc_cell_topk(idx, q, k=k, nprobe=nprobe, exclude_self=exclude_self)


def append_to_ann_index(
    vectors: DataFrame,
    path: str,
) -> int:
    """Incremental index maintenance: encode a NEW vector batch with the
    persisted model (no retraining — the codebooks/centroids are frozen,
    exactly how production IVFPQ indexes absorb inserts) and append the
    codes into the existing cell partitions. Returns rows appended.

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
    ).drop(model["vec_col"]).cache()  # one encode pass: write + count
    try:
        coded.write.mode("append").partitionBy("ivf_cell").parquet(
            f"{path}/index"
        )
        return coded.count()
    finally:
        coded.unpersist()
