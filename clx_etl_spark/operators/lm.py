"""Corpus-distribution document scoring: bigram language-model scoring
(the KenLM-shaped CCNet-style perplexity filter) and DSIR-style hashed
n-gram importance weighting — both re-expressed as pure Spark
aggregation + joins.

Shape at 100 TB:
  * The model is two keyed aggregates over the exploded bigram stream —
    bigram counts and context counts — both map-side combinable, both
    bounded by the (Zipf-truncated) vocabulary cross-section, not by
    corpus size.
  * Scoring is the bigram stream joined back to the two count tables.
    The model side is vocab-bounded, so AQE broadcasts it when small and
    sort-merges when a 100 TB corpus makes the bigram vocabulary large;
    either way no iteration and no driver state.
  * No ln()/exp() anywhere: libm transcendentals differ across engines
    in the last ulp (see operators/ir.py — BM25 uses rational idf for
    the same reason), and a per-doc SUM over a *variable* number of
    float log-probs is order-dependent on top of that. The score is
    therefore an exact fixed-point average probability: each smoothed
    bigram probability is floor((c12+1)·S / (c1+V)) in BIGINT (integer
    floor-division is bit-identical in Spark `div` and DuckDB `//`),
    summed exactly, divided once at the end (IEEE division of exact
    integers — reproducible everywhere). S = 1e9 keeps the numerator
    under 2^63 for any bigram count below ~9.2e9.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import ensure_min_parallelism, tokens

SCALE = 1_000_000_000  # fixed-point probability scale (1e-9 resolution)
DSIR_SCALE = 1_000_000  # DSIR ratio scale: int64 headroom to ~9.2e12 tokens


def bigram_stream(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per adjacent token pair: (doc_id, w1, w2). Single explode;
    docs with < 2 tokens contribute nothing."""
    pairs = F.zip_with(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        F.slice(F.col("t"), 2, F.size("t") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return (
        ensure_min_parallelism(df)
        .select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("t"))
        .filter(F.size("t") >= 2)  # slice(len-1) is invalid on 0/1-token docs
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", "p.w1", "p.w2")
    )


def train_bigram_lm(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Bigram counts, context counts, and the vocab-size scalar.

    Returns (bigram_counts(w1, w2, c12), context_counts(w1, c1),
    stats(v)). c1 is derived from the bigram table (count of w1 as a
    history), so c1 = Σ_w2 c12 — the add-one probabilities then sum to
    exactly 1 over a closed vocab.
    """
    bg = bigram_stream(df, text_col, id_col)
    bigram_counts = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    context_counts = bigram_counts.groupBy("w1").agg(F.sum("c12").alias("c1"))
    stats = (
        ensure_min_parallelism(df)
        .select(F.explode(tokens(text_col)).alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    return bigram_counts, context_counts, stats


def score_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document average add-one-smoothed bigram probability under the
    corpus-trained model: (doc_id, n_bigrams, sum_scaled, avg_p).

    sum_scaled is the exact BIGINT fixed-point sum (order-independent);
    avg_p = sum_scaled / (n_bigrams · S) as one final IEEE division.
    Low avg_p = improbable word sequences under the corpus model — the
    same signal a perplexity filter thresholds on, monotone-reversed.
    """
    bigram_counts, context_counts, stats = train_bigram_lm(df, text_col, id_col)
    bg = bigram_stream(df, text_col, id_col)
    scored = (
        bg.join(bigram_counts, ["w1", "w2"])
        .join(context_counts, ["w1"])
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "p_scaled",
            F.expr(f"((c12 + 1L) * {SCALE}L) div (c1 + v)"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("p_scaled").alias("sum_scaled"),
        (
            F.sum("p_scaled").cast("double")
            / (F.count(F.lit(1)).cast("double") * float(SCALE))
        ).alias("avg_p"),
    )


KN_SCALE = 1_000_000  # KN fixed-point scale; see kneser_ney_scores bound


def kneser_ney_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document interpolated Kneser-Ney bigram scoring — the standard
    LM smoothing (Kneser & Ney 1995; Chen & Goodman 1998) that add-one
    crudely approximates. Discount d = 3/4 (a rational, so everything
    stays in exact integer arithmetic):

        P(w2|w1) = (c12 - d)/c1  +  d·N1+(w1,·)/c1 · N1+(·,w2)/B

    where N1+(w1,·) = distinct continuations of w1, N1+(·,w2) = distinct
    histories of w2 (the "novel-continuation" unigram), B = distinct
    bigram types. In-corpus scoring means every scored bigram has
    c12 >= 1, so the discounted term (4·c12 - 3) is always positive.

    Fixed-point: p_scaled = floor((4·c12-3)·S / (4·c1))
                          + floor(3·N1f·N1b·S / (4·c1·B)), S = 1e6.
    Two integer floor-divisions per bigram — bit-identical in Spark
    ``div`` and DuckDB ``//`` — then an exact BIGINT per-doc sum and one
    final IEEE division. Headroom: 3·N1f·N1b·S < 2^63 holds while
    N1f·N1b < 3.07e12, i.e. word vocabularies to ~1.7M distinct
    continuations/histories per token — beyond any natural-language
    vocab (scale past that by dropping S to 1e4).

    Shape at 100 TB: identical to score_documents — the model is three
    keyed aggregates over the bigram stream (all map-side combinable,
    vocab-bounded), scoring is the stream joined back to them.
    """
    from pyspark.sql import Window

    bg = bigram_stream(df, text_col, id_col)
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # attach the w1 totals / distinct-continuation / distinct-history
    # counts as WINDOWS over the (vocab-bounded) bigram-type table instead
    # of three separate aggregate+join legs: the previous shape consumed
    # c12 four times (its post-exchange aggregate re-ran per consumer) and
    # shuffled the corpus-sized bigram stream twice; here the c12-keyed
    # exchange of bg is reused by the scoring join (same child, same key)
    # so the stream is shuffled exactly once. Same counts, same integers.
    c12e = (
        c12.withColumn(
            "c1", F.sum("c12").over(Window.partitionBy("w1"))
        )
        .withColumn(
            "n1f", F.count(F.lit(1)).over(Window.partitionBy("w1"))
        )
        .withColumn(
            "n1b", F.count(F.lit(1)).over(Window.partitionBy("w2"))
        )
    )
    btypes = c12.agg(F.count(F.lit(1)).alias("b"))
    scored = (
        bg.join(c12e, ["w1", "w2"])
        .crossJoin(F.broadcast(btypes))
        .withColumn(
            "p_scaled",
            F.expr(
                f"((4L * c12 - 3L) * {KN_SCALE}L) div (4L * c1)"
                f" + (3L * n1f * n1b * {KN_SCALE}L) div (4L * c1 * b)"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("p_scaled").alias("sum_scaled"),
        (
            F.sum("p_scaled").cast("double")
            / (F.count(F.lit(1)).cast("double") * float(KN_SCALE))
        ).alias("avg_p"),
    )


def dsir_importance(
    df: DataFrame,
    target_pred,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights: score each document by how much its
    hashed-unigram distribution resembles a target subset of the corpus
    (Xie et al. 2023, "Data Selection for Language Models via Importance
    Resampling" — the hashed-feature variant).

    Per token, the weight is the add-one-smoothed likelihood ratio
    p_target(bucket) / p_raw(bucket); a document's score is the average
    over its tokens. High avg_w = looks like the target distribution —
    feed into sampling.quality_weighted_sample for the resampling step.

    Shape at 100 TB: the model is ONE pass over the token stream (two
    counts per bucket, map-side combinable into exactly ``n_buckets``
    rows); per-bucket weights are precomputed on that tiny table and
    broadcast, so scoring is a broadcast join + one keyed agg — the
    corpus never shuffles on the token.

    Determinism: same fixed-point discipline as score_documents — the
    ratio is two chained BIGINT floor-divisions (scale S then the raw
    side), exact in both engines; one final IEEE division per doc.
    md5-bucketing (not xxhash) keeps buckets engine-portable.

    S = DSIR_SCALE (1e6, not score_documents' 1e9): the chained product
    (ct+1)·S and q1·(nr+B) with q1 ≤ S must stay under 2^63, which at
    S=1e6 holds to ~9.2e12 tokens per side — trillion-token corpora —
    where 1e9 would overflow three orders of magnitude earlier.
    """
    base = ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("_is_target"),
        F.explode(tokens(text_col)).alias("tok"),
    ).withColumn(
        "bk",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % n_buckets,
    )
    counts = base.groupBy("bk").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("_is_target"), 1).otherwise(0)).alias("ct"),
    )
    stats = counts.agg(
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    weights = counts.crossJoin(F.broadcast(stats)).withColumn(
        "w",
        F.expr(
            f"((((ct + 1L) * {DSIR_SCALE}L) div (nt + {n_buckets}))"
            f" * (nr + {n_buckets})) div (cr + 1L)"
        ),
    )
    return (
        base.join(F.broadcast(weights.select("bk", "w")), "bk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("w").alias("sum_w_scaled"),
            (
                F.sum("w").cast("double")
                / (F.count(F.lit(1)).cast("double") * float(DSIR_SCALE))
            ).alias("avg_w"),
        )
    )


def score_against_model(
    batch: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a batch under a FIXED model (possibly trained elsewhere /
    loaded from disk): add-one smoothing with out-of-vocabulary backoff —
    an unseen bigram contributes (0+1)/(c1+V), an unseen CONTEXT
    contributes 1/(0+V) (left joins + coalesce, so held-out text scores
    instead of silently dropping). Same fixed-point discipline as
    score_documents; scoring is the batch's bigram stream joined to the
    vocab-bounded model tables — no retraining, no iteration."""
    bg = bigram_stream(batch, text_col, id_col)
    scored = (
        bg.join(bigram_counts, ["w1", "w2"], "left")
        .join(context_counts, ["w1"], "left")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "p_scaled",
            F.expr(
                f"((coalesce(c12, 0L) + 1L) * {SCALE}L)"
                f" div (coalesce(c1, 0L) + v)"
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("p_scaled").alias("sum_scaled"),
        F.sum(F.col("c12").isNull().cast("long")).alias("n_oov_bigrams"),
        (
            F.sum("p_scaled").cast("double")
            / (F.count(F.lit(1)).cast("double") * float(SCALE))
        ).alias("avg_p"),
    )


def save_lm_model(
    df: DataFrame, path: str, text_col: str = "text", id_col: str = "doc_id"
) -> None:
    """Persist the trained bigram model as three parquet tables
    ({path}/bigrams, /contexts, /stats) — vocab-bounded, so the model is
    small relative to the corpus; future batches score by joining these
    (load_lm_model) with zero retraining, the same build-once cadence as
    the dedup and ANN indexes."""
    bigram_counts, context_counts, stats = train_bigram_lm(df, text_col, id_col)
    bigram_counts.write.mode("overwrite").parquet(f"{path}/bigrams")
    context_counts.write.mode("overwrite").parquet(f"{path}/contexts")
    stats.write.mode("overwrite").parquet(f"{path}/stats")


def load_lm_model(spark, path: str) -> tuple[DataFrame, DataFrame, DataFrame]:
    return (
        spark.read.parquet(f"{path}/bigrams"),
        spark.read.parquet(f"{path}/contexts"),
        spark.read.parquet(f"{path}/stats"),
    )
