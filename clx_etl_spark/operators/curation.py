"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup/quality gates: benchmark decontamination, repetition-based
quality signals, per-domain caps, deterministic sharding, and sequence
packing for LM pretraining.

Design for scale (the 100 TB shapes):
  * Decontamination joins the corpus' n-grams against the *benchmark*
    side, which is tiny (eval suites are MBs against a 100 TB corpus) —
    the benchmark gram set is broadcast, so the corpus side never
    shuffles; the only wide op is the per-doc overlap aggregate, which
    is map-side combinable.
  * Repetition signals follow Gopher/C4: the duplicate-2-gram fraction
    is a pure array expression (no shuffle); the top-token fraction is
    an explode + two keyed aggregates with map-side combine — token
    counts collapse per partition before any exchange.
  * Per-domain caps run through row_number over (domain, hash order),
    which Spark executes as WindowGroupLimit: each map task keeps only
    its local top-N per domain before the shuffle, so a domain with a
    billion pages ships N rows per task, not a billion.
  * Shard assignment and sequence packing are deterministic functions of
    the row key (md5 order), so re-running over a grown corpus never
    reassigns existing rows (same property as operators/sampling.py).
    Packing uses the concatenate-then-chunk scheme of LM pretraining:
    a running token total per shard, chunked by integer division —
    windows partition by shard, so state never exceeds one shard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions import ensure_min_parallelism
from ..functions import tokens as _raw_tokens
from .dedup import shingle_sets


def tokens(text_col):
    """Null-safe tokens: a NULL text is an empty document (0 tokens), not
    a NULL that silently poisons counts/offsets downstream."""
    return F.coalesce(
        _raw_tokens(text_col), F.array().cast("array<string>")
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    flag_threshold: float = 0.1,
) -> DataFrame:
    """Benchmark decontamination by k-gram overlap (the standard guard
    against eval leakage in pretraining corpora).

    For every training doc with >= k tokens: the fraction of its distinct
    k-grams that appear anywhere in the benchmark set. Returns
    (doc_id, n_grams, n_contaminated, overlap_ratio, is_contaminated) for
    every such doc — callers drop or audit rows where ``is_contaminated``.

    Scale shape: benchmark grams are distinct-reduced then broadcast, so
    the 100 TB training side is one scan + one map-side-combinable
    aggregate; no corpus-wide shuffle on the gram key.
    """
    grams = shingle_sets(train, text_col, id_col, k)
    bench_grams = (
        shingle_sets(benchmark, text_col, id_col, k)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = grams.join(F.broadcast(bench_grams), "shingle", "left")
    n_grams = F.count(F.lit(1)).cast("long")
    n_hit = F.count("_hit").cast("long")
    return (
        joined.groupBy(F.col("doc_id"))
        .agg(n_grams.alias("n_grams"), n_hit.alias("n_contaminated"))
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            (F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double")
             ).alias("overlap_ratio"),
            (F.col("n_contaminated").cast("double")
             >= F.lit(flag_threshold) * F.col("n_grams").cast("double")
             ).alias("is_contaminated"),
        )
    )


BLOOM_M = 8_192  # bits
BLOOM_K = 3  # hash functions


def _bloom_bit(i: int, key, m: int = BLOOM_M):
    """Bloom bit position i for a key: the shared cross-engine md5
    convention (first 8 hex chars, base 16, mod m)."""
    return F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(i)), key)), 1, 8),
        16,
        10,
    ).cast("long") % m


def bloom_build(keys: DataFrame, key_col: str, m: int = BLOOM_M, k: int = BLOOM_K) -> DataFrame:
    """Bloom bitmap of a key set as (word_idx, word) rows — m/32 rows of
    32 bits each (32-bit words in BIGINT so no sign-bit shift semantics
    can differ across engines). The bitmap is CONSTANT-size however large
    the key set: the whole point vs broadcasting the distinct keys
    themselves, whose size grows with the benchmark."""
    bits = keys.select(
        F.explode(
            F.array(*[_bloom_bit(i, F.col(key_col), m) for i in range(k)])
        ).alias("bit")
    ).distinct()
    return bits.groupBy((F.col("bit") / 32).cast("long").alias("word_idx")).agg(
        F.bit_or(
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("bit") % 32).cast("int")
            )
        ).alias("word")
    )


def bloom_decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    k_gram: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = BLOOM_M,
    k_hash: int = BLOOM_K,
) -> DataFrame:
    """Decontamination with a Bloom-compressed benchmark: like
    ``decontaminate`` but the broadcast side is an m-bit bitmap (1 KiB at
    m=8192) instead of the benchmark's distinct k-gram set — the shape
    that still broadcasts when the benchmark suite itself is millions of
    grams. Overcount-only error: a gram can false-positive at ~(1-e^{-kn/m})^k
    but never false-negative, which is the safe direction for leakage
    guarding (and deterministic: same md5 bits in every engine/run).

    Returns (doc_id, n_grams, n_bloom_hits) per training doc with >= 1
    gram."""
    bench_grams = (
        shingle_sets(benchmark, text_col, id_col, k_gram)
        .select("shingle")
        .distinct()
    )
    bitmap = bloom_build(bench_grams, "shingle", m, k_hash)
    grams = shingle_sets(train, text_col, id_col, k_gram)
    probes = grams.select(
        "doc_id",
        "shingle",
        F.explode(
            F.array(*[_bloom_bit(i, F.col("shingle"), m) for i in range(k_hash)])
        ).alias("bit"),
    ).select(
        "doc_id",
        "shingle",
        (F.col("bit") / 32).cast("long").alias("word_idx"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("bit") % 32).cast("int")
        ).alias("mask"),
    )
    hit = (
        probes.join(F.broadcast(bitmap), "word_idx", "left")
        .withColumn(
            "set_flag",
            F.when(
                F.col("word").isNotNull()
                & (F.col("word").bitwiseAND(F.col("mask")) != 0),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .groupBy("doc_id", "shingle")
        .agg(F.min("set_flag").alias("is_hit"))
    )
    return hit.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("is_hit").alias("n_bloom_hits"),
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo_p: float = 0.01,
    hi_p: float = 0.99,
) -> DataFrame:
    """Per-group outlier capping at exact interpolated percentiles (the
    standard numeric-feature guard before training-set statistics): each
    row gains ``<value_col>_w`` clamped into [p_lo, p_hi] of its group,
    plus the group's bounds.

    Shape: ONE grouped percentile aggregate (group count rows), broadcast
    back onto the scan — the fact side never shuffles. At 100 TB swap
    percentile() for approx_percentile with a declared rank-error bound;
    the exact form is the correctness anchor (Spark percentile == DuckDB
    quantile_cont bit-identically)."""
    stats = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo_p})").alias("_w_lo"),
        F.expr(f"percentile({value_col}, {hi_p})").alias("_w_hi"),
    )
    clamped = F.least(
        F.greatest(F.col(value_col), F.col("_w_lo")), F.col("_w_hi")
    )
    return df.join(F.broadcast(stats), group_col).withColumn(
        f"{value_col}_w", clamped
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

      * ``top_token_ratio`` — frequency of the most common token over the
        token count (catches "buy buy buy ..." spam);
      * ``dup_2gram_ratio`` — fraction of word 2-grams that are repeats
        (catches boilerplate loops); NULL when the doc has < 2 tokens.

    The 2-gram fraction is a pure array expression over the scan; the top
    token needs a (doc, token) count -> per-doc max, both keyed aggregates
    with map-side partial combine.
    """
    # staged: tokenize once, materialize the 2-gram array once — inlined,
    # the split ran per reference and g2 (itself ~2 tokenizations) was
    # evaluated twice (distinct + size)
    toks = F.col("_toks")
    n = F.size(toks)
    g2 = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    dbl = lambda c: c.cast("double")
    base = (
        ensure_min_parallelism(df).select(
            F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks")
        )
        # keep g2 under the n >= 2 guard (slice length n-1 is invalid on
        # shorter docs; the inlined form only evaluated it inside when())
        .select(
            "doc_id",
            n.cast("long").alias("n_tokens"),
            F.when(n >= 2, g2).alias("_g2"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.when(
                F.col("n_tokens") >= 2,
                F.lit(1.0)
                - dbl(F.size(F.array_distinct("_g2"))) / dbl(F.size("_g2")),
            ).alias("dup_2gram_ratio"),
        )
    )
    tok_counts = (
        ensure_min_parallelism(df)
        .select(F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("_w"))
        .groupBy("doc_id", "_w")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    top = tok_counts.groupBy("doc_id").agg(F.max("_c").alias("_top"))
    return base.join(top, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        F.when(
            F.col("n_tokens") > 0, dbl(F.col("_top")) / dbl(F.col("n_tokens"))
        ).alias("top_token_ratio"),
        "dup_2gram_ratio",
    )


def span_dup_stats(
    df: DataFrame,
    block_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style span-level duplication: docs are cut into non-overlapping
    ``block_tokens``-token blocks; a block is duplicated when the same
    token run appears anywhere else in the corpus (including again in the
    same doc). Returns per-doc (doc_id, n_blocks, n_dup_blocks,
    dup_block_ratio) — the signal behind "drop docs that are mostly
    boilerplate" and span-removal rewrites.

    Scale shape: blocks are hashed to one md5 per block before the
    shuffle; corpus-wide frequency is one map-side-combinable count, and
    the per-doc join keys on the 32-char digest, never the text. The
    trailing partial block (< block_tokens) is excluded so stats are
    comparable across doc lengths.
    """
    # tokenize once into a column: the transform lambda below slices the
    # token array per block element, and an inlined tokens() expression
    # is re-evaluated inside the lambda for EVERY element (O(blocks)
    # splits per row instead of 1)
    toks = F.col("_toks")
    n_full = (F.size(toks) / F.lit(block_tokens)).cast("int")
    block_arr = F.transform(
        F.sequence(F.lit(0), n_full - 1),
        lambda i: F.md5(
            F.concat_ws(" ", F.slice(toks, i * block_tokens + 1, block_tokens)
                        ).cast("binary")),
    )
    # sequence(0, -1) DESCENDS in Spark — short docs must yield no blocks
    block_arr = F.when(n_full >= 1, block_arr).otherwise(
        F.array().cast("array<string>")
    )
    blocks = ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks")
    ).select("doc_id", F.explode(block_arr).alias("bh"))
    freq = blocks.groupBy("bh").agg(F.count(F.lit(1)).alias("_f"))
    per_doc = (
        blocks.join(freq, "bh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_blocks"),
            F.sum((F.col("_f") > 1).cast("long")).cast("long").alias("n_dup_blocks"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_blocks",
        "n_dup_blocks",
        (F.col("n_dup_blocks").cast("double") / F.col("n_blocks").cast("double")
         ).alias("dup_block_ratio"),
    )


def remove_duplicate_spans(
    df: DataFrame,
    block_tokens: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style span REMOVAL: every duplicated ``block_tokens``-token run
    keeps only its globally-first occurrence (smallest (doc_id, position))
    and later occurrences are cut out; each doc's text is rebuilt from its
    kept blocks plus the partial tail. Returns (doc_id, text_clean,
    n_blocks, n_kept) — n_blocks - n_kept spans were removed.

    Scale shape: the winner per block digest is a map-side-combinable
    MIN(struct(doc_id, idx)) — an aggregate, deliberately NOT a
    row_number window, so a boilerplate block occurring a billion times
    collapses per-partition before the shuffle instead of sorting a
    billion-row skewed window partition. Rebuild is one groupBy(doc)
    collecting at most the doc's own blocks.
    """
    # tokenize once into a column (see duplicate_span_stats: an inlined
    # tokens() re-splits per transform-lambda ELEMENT — O(blocks) per row)
    toks = F.col("_toks")
    n = F.size(toks)
    n_full = (n / F.lit(block_tokens)).cast("int")
    block_arr = F.transform(
        F.sequence(F.lit(0), n_full - 1),
        lambda i: F.struct(
            i.alias("idx"),
            F.concat_ws(
                " ", F.slice(toks, i * block_tokens + 1, block_tokens)
            ).alias("btext"),
        ),
    )
    block_arr = F.when(n_full >= 1, block_arr).otherwise(
        F.array().cast("array<struct<idx:int,btext:string>>")
    )
    base = ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks")
    ).select(
        "doc_id",
        block_arr.alias("_blocks"),
        n_full.cast("long").alias("n_blocks"),
        F.concat_ws(
            " ", F.slice(toks, n_full * block_tokens + 1, n - n_full * block_tokens)
        ).alias("_tail"),
    )
    blocks = base.select(
        "doc_id", F.explode("_blocks").alias("b")
    ).select(
        "doc_id", F.col("b.idx").alias("idx"), F.col("b.btext").alias("btext"),
        F.md5(F.col("b.btext").cast("binary")).alias("bh"),
    )
    winners = blocks.groupBy("bh").agg(
        F.min(F.struct("doc_id", "idx")).alias("w")
    )
    kept = (
        blocks.join(winners, "bh")
        .filter((F.col("doc_id") == F.col("w.doc_id")) & (F.col("idx") == F.col("w.idx")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "btext"))),
                    lambda x: x.btext,
                ),
                " ",
            ).alias("_kept_text"),
        )
    )
    out = base.join(kept, "doc_id", "left")
    joined = F.concat_ws(
        " ", F.nullif(F.coalesce(F.col("_kept_text"), F.lit("")), F.lit("")),
        F.nullif(F.col("_tail"), F.lit("")),
    )
    return out.select(
        "doc_id",
        joined.alias("text_clean"),
        "n_blocks",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
    )


def _hash_order(key: Column) -> Column:
    """Deterministic pseudo-random ordering key: md5 of the row key.
    The same row sorts to the same place on every engine and every run."""
    return F.md5(key.cast("string"))


def cap_per_group(
    df: DataFrame, group_col: str, cap: int, key_col: str = "doc_id"
) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen by deterministic hash
    order (an unbiased, reproducible per-domain quota — the standard
    anti-overrepresentation gate for web corpora).

    Executes as WindowGroupLimit: each map task pre-trims to its local
    top-``cap`` per group before the shuffle, so a domain with a billion
    rows ships cap rows per task, not a billion (plan-asserted in
    tests/test_plans.py).
    """
    w = Window.partitionBy(group_col).orderBy(_hash_order(F.col(key_col)), key_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )


def shard_assign(
    df: DataFrame, n_shards: int, key_col: str = "doc_id", shard_col: str = "shard"
) -> DataFrame:
    """Stable shard id from the row key: first 8 md5 hex chars mod
    n_shards. Rows never migrate when the corpus grows, so incremental
    re-runs append to the same shards; the md5 gate is the same
    DuckDB-reproducible form as operators/sampling.hash_gate."""
    bucket = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return df.withColumn(shard_col, (bucket % F.lit(n_shards)).cast("int"))


def pack_sequences(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """Concatenate-then-chunk sequence packing (the GPT-style pretraining
    layout): within each shard, docs are laid end-to-end in deterministic
    id order and cut into fixed-``budget`` token sequences; a doc's
    sequence id is its running token offset div budget.

    Returns (doc_id, shard, n_tokens, seq_id, seq_offset): ``seq_id`` is
    the training sequence the doc *starts* in, ``seq_offset`` its token
    position there. Integer-only arithmetic (exact cross-engine); the
    window partitions by shard, so per-task state is one shard's running
    sum — no global sort, no driver involvement.
    """
    n_tok = F.size(tokens(text_col)).cast("long")
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return (
        df.select(F.col(id_col), F.col(shard_col), n_tok.alias("n_tokens"))
        .withColumn("_cum", cum_before)
        # long `div` long — exact at any magnitude, unlike double '/' + cast
        # which drifts once a shard's running token count passes 2^53
        .withColumn("seq_id", F.expr(f"_cum div {int(budget)}"))
        .withColumn("seq_offset", F.col("_cum") % F.lit(budget))
        .drop("_cum")
    )


def write_shards(
    df: DataFrame, path: str, n_shards: int, key_col: str = "doc_id"
) -> None:
    """Materialize the training layout: assign stable shards and write
    parquet partitioned by shard, one file per shard (each shard is
    repartitioned to a single writer so downstream loaders see exactly
    n_shards files; at cluster scale raise files-per-shard instead)."""
    sharded = shard_assign(df, n_shards, key_col)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


# PII redaction -------------------------------------------------------------
# Patterns restricted to syntax valid in BOTH Java regex (Spark) and RE2
# (DuckDB oracle): no backreferences, no lookaround. Order matters: emails
# are redacted before IPs so an address's dotted domain can never be
# re-matched as a dotted quad.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d{1,3}-\d{3}-\d{4}", "<PHONE>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Mask emails / IPv4s / intl phone numbers in ``text_col``.

    Adds per-entity match counts (``n_email``/``n_ip``/``n_phone``) and
    the masked text as ``out_col``. Each pattern is counted on the text
    AFTER the earlier patterns masked it, so counts equal the masked
    occurrences in the output — a dotted quad inside an email local-part
    is one email, not also a phantom IP (audits reconciling n_ip against
    <IP> tokens stay exact). Pure native regexp column expressions —
    single scan, zero shuffles, zero UDFs — so it composes into any
    curation pipeline at full scan speed; at 100 TB this is a map-only
    stage pipelined into the parquet read.
    """
    out = df
    masked = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.size(F.regexp_extract_all(masked, F.lit(pat), F.lit(0)))
        )
        masked = F.regexp_replace(masked, pat, repl)
    return out.withColumn(out_col, masked)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into overlapping token-window chunks (the RAG /
    context-window preprocessing shape; contrast pack_sequences, which
    concatenates ACROSS docs with no overlap).

    Chunk starts advance by ``chunk_size - overlap``; a start past
    ``n - overlap`` would produce a window fully contained in its
    predecessor, so those are dropped (every doc still yields >= 1 chunk
    when non-empty). All array exprs — the explode is the only row
    inflation (bounded at ~n_tokens/stride per doc), no shuffle, no UDF:
    at 100 TB this is a map-only stage pipelined into the scan.

    Output: (doc_id, chunk_id, n_tokens, chunk_text), chunk_id dense from 0.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be < chunk_size")
    stride = chunk_size - overlap
    toks = tokens(text_col)  # null-safe: NULL text -> 0 tokens -> 0 chunks
    n = F.size(toks)
    starts = F.filter(
        F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
            F.array().cast("array<int>")
        ),
        lambda s: (s == 0) | (s < n - overlap),
    )
    out = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_t"),
        F.explode(starts).alias("_s"),
    )
    chunk = F.slice(F.col("_t"), F.col("_s") + 1, chunk_size)
    return out.select(
        "doc_id",
        (F.col("_s") / stride).cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
