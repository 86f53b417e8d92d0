"""Corpus retrieval operators: inverted index construction and BM25-lite
relevance scoring — the search side of a training-data platform (near-dup
mining, contamination audits, and eval-set retrieval all need "find the
docs containing these terms, ranked").

Design for scale:
  * The inverted index is one explode + one keyed aggregate: (doc, term)
    pairs are distinct-reduced per doc BEFORE the shuffle (array_distinct
    on the token array, not a corpus-wide DISTINCT), and posting lists
    are built with a map-side-combinable collect per term. Hot terms
    (stopwords) make long postings — cap them with ``max_df`` exactly as
    dedup caps stop-shingles.
  * BM25 needs two corpus scalars (N, avgdl) and one document frequency
    per query term. All of them come from ONE aggregate pass producing a
    single row, which is broadcast back over the corpus (the canonical
    scalar-subquery plan) — the per-doc score is then a pure column
    expression: no shuffle at all on the scoring pass.
  * ln() is avoided on purpose: libm implementations differ across
    engines in the last ulp, which would break bit-exact oracle checks.
    The rational Robertson idf (N - df + 0.5) / (df + 0.5) keeps every
    operation an IEEE-exact +,-,*,/ so Spark and DuckDB agree bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import ensure_min_parallelism
from .curation import tokens


def build_inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """(term, df_docs, postings) with postings the doc_id list sorted
    ascending. ``max_df`` drops stopword-grade terms whose posting lists
    would dominate the output (the index analog of the stop-shingle cap)."""
    pairs = ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(text_col))).alias("term"),
    )
    idx = pairs.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df_docs"),
        F.array_sort(F.collect_list("doc_id")).alias("postings"),
    )
    if max_df is not None:
        idx = idx.filter(F.col("df_docs") <= max_df)
    return idx


def _tf(toks: Column, term: str) -> Column:
    # NB: closure, not a default-arg lambda — a second lambda parameter
    # would make Spark bind it as the element INDEX of the HOF
    return F.size(F.filter(toks, lambda x: x == F.lit(term))).cast("double")


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.5,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a fixed term list, using
    the rational Robertson idf (no ln — see module docstring). Returns
    (doc_id, bm25) for docs matching at least one term.

    One corpus scan computes N, avgdl, and per-term document frequencies
    as a single row; that row is broadcast and the score is a pure column
    expression over a second scan — two scans, zero shuffles beyond the
    one-row broadcast.
    """
    toks = tokens(text_col)
    dl = F.size(toks).cast("double")
    stats_aggs = [
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        (F.sum(F.size(toks)).cast("double") / F.count(F.lit(1)).cast("double")
         ).alias("_avgdl"),
    ]
    for i, t in enumerate(query_terms):
        stats_aggs.append(
            F.sum(F.array_contains(toks, t).cast("int")).cast("double").alias(f"_df{i}")
        )
    stats = df.agg(*stats_aggs)

    scored = df.select(
        F.col(id_col).alias("doc_id"),
        dl.alias("_dl"),
        *[_tf(toks, t).alias(f"_tf{i}") for i, t in enumerate(query_terms)],
    ).crossJoin(F.broadcast(stats))

    def contrib(i: int) -> Column:
        tf, dfc = F.col(f"_tf{i}"), F.col(f"_df{i}")
        idf = (F.col("_n_docs") - dfc + F.lit(0.5)) / (dfc + F.lit(0.5))
        denom = tf + F.lit(k1) * (
            F.lit(1.0 - b) + (F.lit(b) * F.col("_dl")) / F.col("_avgdl")
        )
        return idf * ((tf * F.lit(k1 + 1.0)) / denom)

    score = contrib(0)
    matched = F.col("_tf0")
    for i in range(1, len(query_terms)):
        score = score + contrib(i)
        matched = matched + F.col(f"_tf{i}")
    return (
        scored.filter(matched > 0).select("doc_id", score.alias("bm25"))
    )
