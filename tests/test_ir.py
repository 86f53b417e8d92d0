"""Inverted index + BM25 operators: semantics on crafted docs and the
stopword df cap."""

from __future__ import annotations

import pytest

from clx_etl_spark.operators import ir as IR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_inverted_index_postings_and_cap(spark):
    df = _docs(
        spark,
        [
            (3, "alpha beta", "s"),
            (1, "alpha alpha gamma", "s"),  # repeated term -> one posting
            (2, "alpha beta gamma", "s"),
        ],
    )
    idx = {r.term: r for r in IR.build_inverted_index(df).collect()}
    assert list(idx["alpha"].postings) == [1, 2, 3]
    assert idx["alpha"].df_docs == 3
    assert list(idx["beta"].postings) == [2, 3]
    capped = {r.term for r in IR.build_inverted_index(df, max_df=2).collect()}
    assert capped == {"beta", "gamma"}  # 'alpha' is stopword-grade


def test_bm25_ranks_denser_matches_higher(spark):
    df = _docs(
        spark,
        [
            (1, "spark spark spark runs fast", "s"),
            (2, "spark is mentioned once here in a longer document body", "s"),
            (3, "nothing relevant at all", "s"),
        ],
    )
    out = {r.doc_id: r.bm25 for r in IR.bm25_scores(df, ["spark"]).collect()}
    assert set(out) == {1, 2}  # non-matching doc excluded
    assert out[1] > out[2] > 0  # higher tf, shorter doc -> higher score
    # two-term query: doc matching both terms beats single-term docs
    df2 = _docs(
        spark,
        [
            (1, "spark window", "s"),
            (2, "spark other words padding", "s"),
            (3, "window other words padding", "s"),
        ],
    )
    both = {r.doc_id: r.bm25 for r in IR.bm25_scores(df2, ["spark", "window"]).collect()}
    assert both[1] > both[2] and both[1] > both[3]
