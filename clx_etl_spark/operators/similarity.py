"""Vector similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exactness baseline; the IVF variant prunes
the search space to the query's partition (here the pre-clustered ``label``
column; at scale: KMeans-assigned centroid ids, one Spark partition per
probed cell, so each query scans 1/nlist of the corpus).

Determinism notes (the DuckDB oracle must match bit-for-bit):
  * floats are cast to double before any arithmetic (IEEE-deterministic),
  * dot/norm fold in strict array order (Spark aggregate == DuckDB
    list_reduce left fold), so double sums are bit-identical,
  * top-k ties broken by vec_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

def _dot(a: Column, b: Column) -> Column:
    """Dot product of two float arrays: per-element double products folded
    left-to-right (deterministic order; DuckDB's list_reduce mirrors it)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm2(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x)


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_norm2(a)) * F.sqrt(_norm2(b)))


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector over the corpus.

    queries is expected small (broadcast); the corpus side streams — no
    shuffle until the per-query top-k (one shuffle on query_id).
    Self-matches (same id) are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qvec")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vvec"))
    scored = v.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.withColumn("cosine", cosine_sim(F.col("_qvec"), F.col("_vvec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("cosine"))
    )


def knn_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """IVF-style ANN: search only the query's cell (single-probe).

    With cell co-partitioning (`repartition(cell_col)` at write time) the
    candidate join is shuffle-local; recall < 1.0 by design — the scale
    path when brute force stops being affordable.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.col(cell_col).alias("_cell"),
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_vvec"),
        F.col(cell_col).alias("_cell"),
    )
    scored = v.join(F.broadcast(q), "_cell").filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.withColumn("cosine", cosine_sim(F.col("_qvec"), F.col("_vvec")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("cosine"))
    )


def embedding_near_duplicates(
    vectors: DataFrame,
    threshold: float = 0.999,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within each cell (a < b). The cell
    restriction bounds the pair blow-up the same way LSH bands do for text.
    """
    a = vectors.select(
        F.col(id_col).alias("doc_a"), F.col(vec_col).alias("_va"), F.col(cell_col).alias("_cell")
    )
    b = vectors.select(
        F.col(id_col).alias("doc_b"), F.col(vec_col).alias("_vb"), F.col(cell_col).alias("_cell")
    )
    pairs = a.join(b, "_cell").filter(F.col("doc_a") < F.col("doc_b"))
    pairs = pairs.withColumn("cosine", cosine_sim(F.col("_va"), F.col("_vb")))
    return pairs.filter(F.col("cosine") >= threshold).select(
        "doc_a", "doc_b", F.col("cosine")
    )
