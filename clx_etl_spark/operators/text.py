"""Text-analysis operators for corpus pipelines: language ID heuristic,
quality scoring, token counting, document fingerprinting.

All native column expressions (codegen, no UDFs); every statistic is
deterministic so the DuckDB oracle cross-checks them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import ensure_min_parallelism, md5_hex, tokens

# A tiny per-language stopword table for the n-gram/stopword-hit heuristic.
# Real pipelines plug fastText/CLD3 in as a pandas UDF; the heuristic is the
# always-available JVM-side fallback.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "für", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "en", "un", "du", "que", "pour"),
}


def _hit_count(toks: Column, words: tuple[str, ...]) -> Column:
    wl = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(wl, F.lower(t))))


def _lang_hit_columns(toks: Column) -> dict[str, Column]:
    """Per-language stopword hit-count expressions over a token array.
    Callers materialize these as columns BEFORE combining them: the
    guess/best combination references every hit several times, and
    inlined hit counts re-scan the token array (and re-tokenize, when
    ``toks`` is itself the split expression) once per reference."""
    return {lang: _hit_count(toks, words) for lang, words in STOPWORDS.items()}


def _lang_guess(hits: dict[str, Column]) -> tuple[Column, Column]:
    """(lang_pred, best_hits) from per-language hit-count columns.
    Language with the most stopword hits; 'und' when no language scores a
    hit; ties resolve in fixed language order (en, es, de, fr)."""
    best = F.greatest(*hits.values())
    guess = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier langs win ties -> apply last
        guess = F.when(hits[lang] == best, F.lit(lang)).otherwise(guess)
    return F.when(best > 0, guess).otherwise(F.lit("und")), best


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-hit language guess per document (see _lang_guess)."""
    scored = ensure_min_parallelism(df).select(
        F.col(id_col), tokens(text_col).alias("_toks")
    )
    hit_cols = _lang_hit_columns(F.col("_toks"))
    counted = scored.select(
        id_col, *[c.alias(f"_h_{lang}") for lang, c in hit_cols.items()]
    )
    guess, best = _lang_guess(
        {lang: F.col(f"_h_{lang}") for lang in STOPWORDS}
    )
    return counted.select(id_col, guess.alias("lang_pred"), best.alias("stopword_hits"))


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length / punctuation / stopword / uniqueness signals per document —
    the standard cheap pre-filters of a training-data pipeline.

    Staged projection: the raw counters are materialized as columns first
    and the ratios read those attributes. Inlining everything into one
    projection re-evaluates tokens() per reference (~9x here — Catalyst's
    CollapseProject only keeps an alias split when a non-cheap expression
    is referenced more than once, which this staging guarantees) and blows
    the generated code past Janino's sweet spot: the one-time compile was
    ~1.8 s of the query's cold cost."""
    txt = F.col(text_col)
    toks = F.col("_toks")
    dbl = lambda c: c.cast("double")
    base = ensure_min_parallelism(df).select(
        F.col(id_col),
        F.length(txt).alias("n_chars"),
        (
            F.length(txt) - F.length(F.regexp_replace(txt, r"[.,;:!?'\"]", ""))
        ).alias("_n_punct"),
        tokens(text_col).alias("_toks"),
    )
    counted = base.select(
        id_col,
        "n_chars",
        "_n_punct",
        F.size(toks).alias("n_tokens"),
        _hit_count(toks, STOPWORDS["en"]).alias("_n_stop"),
        F.size(F.array_distinct(toks)).alias("_n_uniq"),
    )
    n_chars, n_tokens = F.col("n_chars"), F.col("n_tokens")
    return counted.select(
        id_col,
        "n_chars",
        "n_tokens",
        F.when(n_tokens > 0, dbl(n_chars) / dbl(n_tokens)).alias("mean_token_len"),
        F.when(n_chars > 0, dbl(F.col("_n_punct")) / dbl(n_chars)).alias("punct_ratio"),
        F.when(n_tokens > 0, dbl(F.col("_n_stop")) / dbl(n_tokens)).alias("stopword_ratio"),
        F.when(n_tokens > 0, dbl(F.col("_n_uniq")) / dbl(n_tokens)).alias("unique_token_ratio"),
    )


def token_counts(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword proxy: count of
    alphanumeric runs and punctuation marks (each roughly one token in a
    byte-pair vocabulary), the standard cheap pre-tokenizer estimate."""
    txt = F.col(text_col)
    ws = F.size(tokens(text_col))
    # count matches of: letter runs | digit runs | any non-space symbol
    pieces = F.regexp_count(txt, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    return ensure_min_parallelism(df).select(
        F.col(id_col),
        ws.cast("long").alias("n_ws_tokens"),
        pieces.cast("long").alias("n_bpe_pieces"),
    )


def curate_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 12,
    min_unique_ratio: float = 0.35,
    langs: tuple[str, ...] = ("en", "es"),
    sample_permille: int = 900,
) -> DataFrame:
    """End-to-end curation gate — the standard shape of a training-data
    ingest: exact-dedup keep-list + quality gates + language gate +
    deterministic downsample, composed as ONE scan.

    Scale shape: every signal (tokens, uniqueness, language guess, content
    digest, sample gate) is a column expression over the same scan; the
    only shuffle is the single hash-partition by content digest for the
    dedup window. Gates are plain predicates, so at 100 TB this is one
    pass over the corpus with one exchange — not a join of four derived
    tables. The hash-gate sample keeps row fate stable as the corpus
    grows (see operators/sampling.py).

    Returns the kept documents: (doc_id, lang_pred, n_tokens,
    unique_token_ratio, n_copies).
    """
    from .sampling import hash_gate

    dd = _curation_signals(df, text_col, id_col)
    kept = dd.filter(
        (F.col("rn") == 1)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("unique_token_ratio") >= min_unique_ratio)
        & F.col("lang_pred").isin(*langs)
        & hash_gate(F.col(id_col), sample_permille)
    )
    return kept.select(id_col, "lang_pred", "n_tokens", "unique_token_ratio", "n_copies")


def _curation_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The shared signal block behind curate_corpus and
    curation_attribution: per-doc digest, token stats, language guess,
    dedup rank + copy count. One scan, one digest-window shuffle."""
    from pyspark.sql import Window

    # staged projection (see quality_scores): tokenize once, materialize
    # the per-language hit counts and raw counters, then combine — the
    # inlined form re-tokenized per reference (~12x) and its generated
    # projection dominated the query's cold compile time
    toks = F.col("_toks")
    staged = ensure_min_parallelism(df).select(
        F.col(id_col),
        md5_hex(text_col).alias("digest"),
        tokens(text_col).alias("_toks"),
    ).select(
        id_col,
        "digest",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("_n_uniq"),
        *[
            c.alias(f"_h_{lang}")
            for lang, c in _lang_hit_columns(toks).items()
        ],
    )
    guess, _ = _lang_guess({lang: F.col(f"_h_{lang}") for lang in STOPWORDS})
    n_tokens = F.col("n_tokens")
    base = staged.select(
        id_col,
        "digest",
        "n_tokens",
        F.when(
            n_tokens > 0,
            F.col("_n_uniq").cast("double") / n_tokens.cast("double"),
        ).alias("unique_token_ratio"),
        guess.alias("lang_pred"),
    )
    w = Window.partitionBy("digest")
    return base.withColumn(
        "rn", F.row_number().over(w.orderBy(id_col))
    ).withColumn("n_copies", F.count(F.lit(1)).over(w))


def curation_attribution(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 12,
    min_unique_ratio: float = 0.35,
    langs: tuple[str, ...] = ("en", "es"),
    sample_permille: int = 900,
) -> DataFrame:
    """Per-document drop attribution for the curate_corpus gate chain —
    the observability half of curation: every doc is labeled with the
    FIRST gate that would drop it (gate order: duplicate -> too_short ->
    low_uniqueness -> language -> sample) or 'kept'. Drop-rate dashboards
    and gate tuning read this instead of diffing kept-lists.

    Same one-scan / one-shuffle shape as curate_corpus (shared signal
    block); the attribution itself is a pure CASE chain."""
    from .sampling import hash_gate

    dd = _curation_signals(df, text_col, id_col)
    reason = (
        F.when(F.col("rn") != 1, F.lit("duplicate"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(
            F.col("unique_token_ratio") < min_unique_ratio,
            F.lit("low_uniqueness"),
        )
        .when(~F.col("lang_pred").isin(*langs), F.lit("language"))
        .when(
            ~hash_gate(F.col(id_col), sample_permille), F.lit("sample")
        )
        .otherwise(F.lit("kept"))
    )
    return dd.select(id_col, reason.alias("drop_reason"))


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling document fingerprint.

    Polynomial rolling hash over token hashes mod 2^31-1 with base 131 —
    overflow-free in 64-bit (values < 2^31, products < 2^62) so Spark and
    DuckDB compute identical results. Content hash (md5) alongside.
    """
    MOD = 2_147_483_647
    BASE = 131
    toks = tokens(text_col)
    th = F.transform(toks, lambda w: F.conv(F.substring(F.md5(w.cast("binary")), 1, 7), 16, 10).cast("long") % MOD)
    rolling = F.aggregate(
        th, F.lit(0).cast("long"), lambda acc, h: (acc * BASE + h) % MOD
    )
    return ensure_min_parallelism(df).select(
        F.col(id_col),
        md5_hex(text_col).alias("content_md5"),
        rolling.alias("rolling_fp"),
    )
