"""Corpus deduplication operators — exact, MinHash+LSH, SimHash, n-gram
Jaccard. First-class components for a 100 TB training-data pipeline.

Design for scale:
  * All hashing is md5-based native SQL (JVM, codegen) — no Python UDFs.
  * Candidate generation is LSH-band bucketing, never an n² cross join:
    docs sharing a band bucket co-shuffle to the same partition, so the
    quadratic blow-up is bounded per-bucket. Huge buckets (boilerplate
    dupes) are the skew risk — cap via distinct-signature dedup first.
  * md5 (not xxhash64) so the DuckDB oracle reproduces bytes exactly.
"""

from __future__ import annotations

import random as _random

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import ensure_min_parallelism, md5_hex, md5_long, tokens


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup by content hash: keep the smallest id per digest.
    Returns the canonical rows plus n_copies."""
    digest = md5_hex(text_col).alias("digest")
    w = Window.partitionBy("digest").orderBy(id_col)
    return (
        df.select(id_col, text_col, digest)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(Window.partitionBy("digest")))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(id, shingle) distinct pairs — shared base for MinHash and Jaccard.

    Shuffle-free: k shifted slices of the token array are zipped into
    shingles and de-duplicated per doc with array_distinct BEFORE the
    explode, so the output is already (doc_id, shingle)-distinct with no
    wide operation at all. The token array is materialized as a column
    in its own projection first, so tokenization runs ONCE per row — an
    inlined tokens() re-splits once per slice (k times), and the naive
    per-element indexing form re-tokenizes O(k·shingles) times because
    Catalyst inlines the expression into every element_at lambda.
    The parallelism guard distributes the tokenize+hash map work when
    the source scan is a single unsplittable row group (guide §2.5).
    """
    toks = F.col("_toks")
    n = F.size(toks)
    slices = [F.slice(toks, j + 1, n - (k - 1)) for j in range(k)]
    zipped = slices[0]
    for s in slices[1:]:
        zipped = F.zip_with(zipped, s, lambda a, b: F.concat_ws(" ", a, b))
    shingle_arr = F.when(n >= k, F.array_distinct(zipped)).otherwise(
        F.array().cast("array<string>")
    )
    return ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks")
    ).select("doc_id", F.explode(shingle_arr).alias("shingle"))


def hashed_shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(doc_id, h) with h = 60-bit md5 prefix of the shingle. All set
    operations downstream (doc-frequency, candidate self-join, intersection
    counting) run on 8-byte longs instead of ~20-byte strings — measured
    ~2x on the whole n-gram pipeline from shuffle-payload shrinkage alone.
    Collisions at 2^-60 are nil at bench scale and a documented epsilon on
    Jaccard at extreme corpus sizes."""
    return shingle_sets(df, text_col, id_col, k).select(
        "doc_id", md5_long(F.col("shingle")).alias("h")
    )


# Affine min-wise permutation family over a single md5 base hash: computing
# one md5 per shingle instead of num_perm of them cuts the dominant CPU cost
# of signature building ~16x. P is the classic Mersenne prime 2^31-1; with
# base < P and a < P the product stays < 2^62 (no 64-bit overflow), and the
# DuckDB oracle reproduces the arithmetic exactly in BIGINT.
MINHASH_PRIME = 2_147_483_647

_rng = _random.Random(0xC1A0)
PERM_PARAMS: tuple[tuple[int, int], ...] = tuple(
    (_rng.randrange(1, MINHASH_PRIME), _rng.randrange(0, MINHASH_PRIME))
    for _ in range(64)  # enough for any reasonable num_perm
)


def minhash_signatures(shingles: DataFrame, num_perm: int = 16) -> DataFrame:
    """MinHash signature per doc: perm i = min over shingles of
    (a_i * h + b_i) mod P, h = 60-bit md5 prefix mod P. One shuffle
    (groupBy doc). Accepts either string shingles (column ``shingle``) or
    pre-hashed longs (column ``h`` from hashed_shingle_sets).
    Output: doc_id, sig array<long> of length num_perm."""
    base = (
        F.col("h") if "h" in shingles.columns else md5_long(F.col("shingle"))
    ) % MINHASH_PRIME
    mins = [
        F.min((F.lit(a) * base + F.lit(b)) % MINHASH_PRIME).alias(f"h{i}")
        for i, (a, b) in enumerate(PERM_PARAMS[:num_perm])
    ]
    sig = F.array(*[F.col(f"h{i}") for i in range(num_perm)])
    return shingles.groupBy("doc_id").agg(*mins).select("doc_id", sig.alias("sig"))


def band_buckets(
    signatures, bands: int, rpb, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, band, bucket) from a (doc_id, sig) table — THE band-hash
    derivation (md5 of the band's '|'-joined signature values), shared by
    the self-join path (lsh_candidate_pairs) and the incremental-index
    path so the persisted corpus index can never drift from the in-session
    bucket format. ``rpb`` is rows-per-band: an int when the caller knows
    num_perm, or a Column derived from size(sig)."""
    rpb_c = F.lit(rpb) if isinstance(rpb, int) else rpb
    buckets = F.array(
        *[
            md5_hex(
                F.array_join(
                    F.transform(
                        F.slice(F.col("sig"), F.lit(b) * rpb_c + 1, rpb_c),
                        lambda x: x.cast("string"),
                    ),
                    "|",
                )
            )
            for b in range(bands)
        ]
    )
    return signatures.select(
        "doc_id", *carry, F.posexplode(buckets).alias("band", "bucket")
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Docs sharing >= 1 LSH band bucket -> candidate pairs (a < b).
    ``carry`` columns ride along as <col>_a / <col>_b on each pair —
    per-doc scalars (set sizes) are functionally dependent on the ids, so
    widening the distinct by them never changes the pair set but saves
    the caller two per-doc joins after intersection counting."""
    banded = band_buckets(
        signatures, bands, (F.size("sig") / bands).cast("int"), carry=carry
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            *[F.col(f"a.{c}").alias(f"{c}_a") for c in carry],
            *[F.col(f"b.{c}").alias(f"{c}_b") for c in carry],
        )
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> sign -> band-bucket ->
    candidate pairs -> exact Jaccard filter. Returns (doc_a, doc_b, jaccard).
    """
    # one shingle pass + one groupBy producing BOTH signature mins and set
    # size — the same (materialized) artifact pair the incremental index
    # persists, so the two pipelines share one definition
    sh, per_doc = build_near_dup_index(df, text_col, id_col, k, num_perm)
    # thread each side's shingle-set size through the band self-join
    # instead of joining the per-doc size table back on twice after
    # intersection counting: n is functionally dependent on the id, so
    # widening the candidate distinct (and the groupBy key) by it changes
    # no results while removing two join stages (guide §2.4)
    cand = lsh_candidate_pairs(
        per_doc.select("doc_id", "sig", "n"), bands, carry=("n",)
    )
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "h"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "h"), ["doc_b", "h"])
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    out = (
        inter.withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
    min_common: int = 2,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs WITHOUT MinHash: candidates are
    docs sharing >= ``min_common`` shingles, found by self-joining the
    inverted (shingle -> doc) index.

    The self-join's blow-up is quadratic in each shingle's document
    frequency, so boilerplate shingles ("all rights reserved") would melt
    a 100 TB corpus. ``max_doc_freq`` drops those stop-shingles from
    candidate generation — the standard inverted-index prefix trick; a
    shingle shared by >1000 docs carries ~no similarity signal. The final
    Jaccard is still computed over the FULL shingle sets, so the filter
    only affects which pairs are considered, not their scores.

    The full-set intersection is SPLIT, not re-scanned (guide §2.3):
    common shingles partition exactly into rare (df <= cap, already
    counted by the candidate aggregate) and stop (df > cap), so
    n_inter = n_common + n_stop_common — the old second pass re-joined
    every candidate against the ENTIRE shingle table; the replacement
    joins only against the stop-shingle slice (empty until a shingle
    tops the cap, boilerplate-sized after), with identical integers.
    Returns (doc_a, doc_b, jaccard) with jaccard >= threshold.
    """
    sh = hashed_shingle_sets(df, text_col, id_col, k).cache()
    sh.count()  # materialize BEFORE fan-out: the downstream stages
    # (dfreq, cand, sizes, inter) are independent and would otherwise race
    # to recompute the shingle pipeline concurrently within one job
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
    rare = sh.join(dfreq.filter(F.col("_df") <= max_doc_freq), "h").select(
        "doc_id", "h"
    )
    cand = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    stop = sh.join(dfreq.filter(F.col("_df") > max_doc_freq), "h").select(
        "doc_id", "h"
    )
    stop_common = (
        cand.select("doc_a", "doc_b")
        .join(stop.select(F.col("doc_id").alias("doc_a"), "h"), "doc_a")
        .join(stop.select(F.col("doc_id").alias("doc_b"), "h"), ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_n_stop"))
    )
    inter = cand.join(stop_common, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        (F.col("n_common") + F.coalesce(F.col("_n_stop"), F.lit(0))).alias(
            "n_inter"
        ),
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def positional_kgrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 3
) -> DataFrame:
    """(doc_id, pos, h): 1-based token position of every k-gram, hashed to
    a 60-bit long. Unlike shingle_sets this keeps duplicates and order —
    the substrate for exact substring-run detection. Same shuffle-free
    zip-of-shifted-slices construction (and staged one-tokenization
    projection) as shingle_sets."""
    toks = F.col("_toks")
    n = F.size(toks)
    slices = [F.slice(toks, j + 1, n - (k - 1)) for j in range(k)]
    zipped = slices[0]
    for s in slices[1:]:
        zipped = F.zip_with(zipped, s, lambda a, b: F.concat_ws(" ", a, b))
    arr = F.when(n >= k, zipped).otherwise(F.array().cast("array<string>"))
    return ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks")
    ).select(
        "doc_id", F.posexplode(arr).alias("pos0", "g")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        md5_long(F.col("g")).alias("h"),
    )


def substring_run_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_run_tokens: int = 8,
    max_doc_freq: int = 200,
) -> DataFrame:
    """EXACT shared-substring detection (the Lee et al. 2022 'Deduplicating
    Training Data' signal): maximal runs of >= min_run_tokens consecutive
    shared tokens between doc pairs — catches verbatim passage reuse that
    set-based Jaccard/MinHash dilutes away inside long documents.

    Distributed shape (no suffix array needed): positional k-grams join on
    gram hash, then matched positions collapse to maximal runs by the
    gaps-and-islands identity — within a (doc_a, doc_b, pa - pb) diagonal,
    consecutive pa values share (pa - row_number()). Two shuffles total
    (the gram equi-join, the island groupBy).

    ``max_doc_freq`` drops grams appearing in more than that many DISTINCT
    docs before pairing — the boilerplate guard that bounds the join
    quadratic at corpus scale; a run passing through a capped gram splits
    into two shorter reported runs (recall trade-off, documented).

    Returns (doc_a, doc_b, start_a, start_b, run_tokens): 1-based token
    starts and inclusive token length, one row per maximal run.
    """
    kg = positional_kgrams(df, text_col, id_col, k).cache()
    kg.count()  # materialize before the dfreq/join fan-out
    dfreq = kg.groupBy("h").agg(
        F.count_distinct("doc_id").alias("_df")
    )
    rare = kg.join(dfreq.filter(F.col("_df") <= max_doc_freq), "h").select(
        "doc_id", "pos", "h"
    )
    m = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.pos").alias("pa"),
            F.col("b.pos").alias("pb"),
        )
    )
    diag = (F.col("pa") - F.col("pb")).alias("diag")
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    isl = m.select("doc_a", "doc_b", "pa", "pb", diag).withColumn(
        "grp", F.col("pa") - F.row_number().over(w)
    )
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(k - 1)).alias("run_tokens"),
        )
        .filter(F.col("run_tokens") >= min_run_tokens)
        .select("doc_a", "doc_b", "start_a", "start_b", "run_tokens")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold_num: int = 4,
    threshold_den: int = 5,
) -> DataFrame:
    """PPJoin-style LOSSLESS prefix-filtered exact-Jaccard self-join — the
    provably-complete alternative to ngram_jaccard_pairs's doc-frequency
    cap (which trades recall for boundedness).

    Global token order = (document frequency ASC, hash ASC): rare shingles
    sort first, so the indexed prefixes land on the SHORTEST posting lists.
    For Jaccard >= t, a matching pair must overlap in >= ceil(t*n) shingles
    on each side, hence must share at least one shingle inside each doc's
    first  n - ceil(t*n) + 1  shingles under ANY shared total order
    (Chaudhuri et al., SSJoin/PPJoin) — so the prefix self-join candidate
    set is complete, and the full-set Jaccard verify makes the output
    exactly the brute-force pair set. At 100 TB the prefix join touches a
    small, rare-token slice of the inverted index instead of every posting
    list; the quadratic term is bounded by prefix-token doc-frequency,
    which the frequency-ascending order actively minimizes.

    The threshold is an exact rational (threshold_num/threshold_den) and
    prefix lengths use integer arithmetic (ceil(t*n) = (num*n + den-1) div
    den) — no float rounding can shorten a prefix and silently drop a pair.
    Returns (doc_a, doc_b, jaccard) with jaccard >= t, doc_a < doc_b.
    """
    t = threshold_num / threshold_den
    sh = hashed_shingle_sets(df, text_col, id_col, k).cache()
    sh.count()  # materialize before the multi-branch fan-out (see above)
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
    ranked = sh.join(dfreq, "h")
    w_pos = Window.partitionBy("doc_id").orderBy("_df", "h")
    w_doc = Window.partitionBy("doc_id")
    overlap_min = F.floor(  # ceil(t * n) in exact integer arithmetic
        (F.lit(threshold_num) * F.col("_n") + F.lit(threshold_den - 1))
        / F.lit(threshold_den)
    )
    pref = (
        ranked.withColumn("_pos", F.row_number().over(w_pos))
        .withColumn("_n", F.count(F.lit(1)).over(w_doc))
        .filter(F.col("_pos") <= F.col("_n") - overlap_min + 1)
        .select("doc_id", "h")
    )
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "h"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "h"), ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(t))
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.9,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Asymmetric containment dedup (Broder): containment(A in B) =
    |A ∩ B| / |A| over k-gram shingle sets. Catches the inclusion cases
    symmetric Jaccard dilutes away — a short doc quoted verbatim inside a
    long one scores containment ~1.0 while its Jaccard is tiny, which is
    exactly the quote/aggregator/boilerplate-wrapper pattern in web
    corpora.

    Candidate generation is the shared-shingle inverted index with the
    same doc-frequency cap as ngram_jaccard_pairs (the quadratic bound);
    the verify stage computes BOTH directions from the full shingle sets.
    Returns (doc_a, doc_b, cont_a_in_b, cont_b_in_a, jaccard) for pairs
    where max(cont_a_in_b, cont_b_in_a) >= threshold, doc_a < doc_b.
    """
    sh = hashed_shingle_sets(df, text_col, id_col, k).cache()
    sh.count()  # materialize before the fan-out (see ngram_jaccard_pairs)
    dfreq = sh.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
    rare = sh.join(dfreq.filter(F.col("_df") <= max_doc_freq), "h").select(
        "doc_id", "h"
    )
    cand = (
        rare.alias("a")
        .join(
            rare.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("doc_a"), "h"), "doc_a")
        .join(sh.select(F.col("doc_id").alias("doc_b"), "h"), ["doc_b", "h"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    scored = (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            (F.col("n_inter").cast("double") / F.col("n_a").cast("double")).alias(
                "cont_a_in_b"
            ),
            (F.col("n_inter").cast("double") / F.col("n_b").cast("double")).alias(
                "cont_b_in_a"
            ),
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    return scored.filter(
        F.greatest("cont_a_in_b", "cont_b_in_a") >= F.lit(threshold)
    )


def build_near_dup_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 16,
) -> tuple[DataFrame, DataFrame]:
    """The persistable corpus-side index for incremental dedup:
    (shingles, per_doc) where shingles = (doc_id, h) hashed shingle pairs
    and per_doc = (doc_id, sig, n) signatures + set sizes. In production
    both are written once (partitioned parquet) and every future batch
    joins against them; here they are cached for the in-session case."""
    sh = hashed_shingle_sets(df, text_col, id_col, k).cache()
    # no separate sh.count(): agg below is sh's only consumer until the
    # caller's fan-out, and its count() fills BOTH caches in one job
    # (the scan feeding the signature aggregate populates sh on the way)
    base = F.col("h") % MINHASH_PRIME
    mins = [
        F.min((F.lit(a) * base + F.lit(b)) % MINHASH_PRIME).alias(f"h{i}")
        for i, (a, b) in enumerate(PERM_PARAMS[:num_perm])
    ]
    agg = (
        sh.groupBy("doc_id")
        .agg(*mins, F.count(F.lit(1)).alias("n"))
        .select(
            "doc_id",
            F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig"),
            "n",
        )
        .cache()
    )
    agg.count()  # materialize: consumed by banding AND the size join
    return sh, agg


def incremental_near_duplicates(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_perm: int = 16,
    bands: int = 8,
    threshold: float = 0.5,
    corpus_index: tuple[DataFrame, DataFrame] | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Incremental ingest dedup: match an incoming BATCH against an already
    indexed CORPUS without re-pairing the corpus with itself.

    This is the production shape of continuous corpus building: the corpus
    side's band buckets are the persisted index (pass ``corpus_index`` from
    build_near_dup_index — possibly read back from parquet — to skip
    re-shingling the corpus every batch); each new batch is shingled
    and signed, then joined one-sidedly against that index — candidate
    volume scales with the batch, not the corpus, and corpus×corpus pairs
    are never generated. Exact Jaccard (full shingle sets) verifies each
    candidate; per batch doc the single best corpus match wins
    (max jaccard, tie-broken on the smaller corpus doc_id).

    Cache lifecycle: build_near_dup_index caches + materializes both of
    its tables. In a continuous-ingest loop, build the corpus index ONCE
    (or read it back from parquet) and pass it via ``corpus_index``;
    after materializing each batch's matches, unpersist that batch's
    index pair — batch-side caches otherwise accumulate across batches.

    Returns (doc_id, dup_of, jaccard): batch docs with a corpus near-dup at
    >= threshold. Batch-internal duplicates are out of scope here — run the
    self-join pipeline (minhash_near_duplicates) on the batch separately.
    """
    c_sh, c_idx = corpus_index or build_near_dup_index(
        corpus, text_col, id_col, k, num_perm
    )
    b_sh, b_idx = build_near_dup_index(batch, text_col, id_col, k, num_perm)

    rpb = num_perm // bands

    def banded(idx: DataFrame) -> DataFrame:
        return band_buckets(idx, bands, rpb)

    corpus_banded = banded(c_idx)
    if max_bucket_size is not None:
        # Skew guard for continuous ingest: a viral boilerplate bucket in
        # the corpus index (identical signatures across millions of docs)
        # would fan EVERY colliding batch doc out to the whole bucket. Cap
        # the corpus side per (band, bucket) — same stop-shingle logic as
        # ngram_jaccard_pairs' max_doc_freq; a capped bucket still yields
        # matches (the surviving members), just not the full fan-out.
        bw = Window.partitionBy("band", "bucket").orderBy("doc_id")
        corpus_banded = (
            corpus_banded.withColumn("_bn", F.row_number().over(bw))
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    cand = (
        banded(b_idx)
        .alias("b")
        .join(
            corpus_banded.alias("c"),
            (F.col("b.band") == F.col("c.band"))
            & (F.col("b.bucket") == F.col("c.bucket")),
        )
        .select(
            F.col("b.doc_id").alias("doc_id"), F.col("c.doc_id").alias("dup_of")
        )
        .distinct()
    )
    inter = (
        cand.join(b_sh.select(F.col("doc_id"), "h"), "doc_id")
        .join(c_sh.select(F.col("doc_id").alias("dup_of"), "h"), ["dup_of", "h"])
        .groupBy("doc_id", "dup_of")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    scored = (
        inter.join(
            b_idx.select("doc_id", F.col("n").alias("n_b")), "doc_id"
        )
        .join(c_idx.select(F.col("doc_id").alias("dup_of"), F.col("n").alias("n_c")), "dup_of")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("n_b") + F.col("n_c") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("jaccard").desc(), F.col("dup_of"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "dup_of", "jaccard")
    )


def undirected_edges(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b"
) -> DataFrame:
    """(src, dst) in both directions from a unique (a < b) pair table via
    ONE posexplode — the union-of-two-projections it replaces duplicated
    the entire upstream pair pipeline into both branches (ReusedExchange
    only rescues the shuffles; every post-shuffle verify stage executed
    twice) and then paid a distinct that is a no-op for a < b inputs
    (the two directions can never collide). PRECONDITION: one row per
    unordered pair with a_col < b_col — true of every engine pair
    generator (LSH/SRP/ngram candidates are distinct-ed before the
    verify join; cell joins emit each id pair once). Callers with
    duplicate pair rows must distinct() first."""
    return pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(a_col).alias("src"), F.col(b_col).alias("dst")
                ),
                F.struct(
                    F.col(b_col).alias("src"), F.col(a_col).alias("dst")
                ),
            )
        ).alias("_e")
    ).select("_e.src", "_e.dst")


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Duplicate-cluster assignment: connected components over near-dup
    pairs by iterative min-label propagation. Returns (doc_id, component)
    where component = min doc_id reachable in the pair graph — the
    canonical representative a dedup pipeline keeps.

    Each iteration is a neighbor-min step (join + min-agg, two shuffles)
    FOLLOWED by a pointer-jumping shortcut (label' = min(label,
    label[label]), one self-join) — the path-halving trick from classic
    PRAM connectivity: neighbor-min alone needs O(diameter) rounds, and
    real similarity graphs grow chains (r13 measured the sf0.1 SRP graph
    still moving after 10 rounds), while the shortcut composes reach
    doublings for O(log diameter) convergence. Both steps only ever
    LOWER a label to another id inside the same component, so the fixed
    point — min reachable id per node — is identical to pure
    propagation, just reached exponentially sooner. The driver loop only
    checks a scalar convergence count per round; all data stays
    distributed (no collect of nodes/edges).
    """
    edges = (
        undirected_edges(pairs, a_col, b_col)
        # run the (possibly expensive) pair pipeline exactly once and cut
        # its lineage, so the per-round plans the driver must analyze are
        # O(round) instead of carrying the whole upstream tree
        .localCheckpoint(eager=True)
        # every round joins on dst — re-hash ONCE; the cached
        # InMemoryRelation retains this partitioning across rounds (a bare
        # checkpoint scan would not), so the loop shuffles only the much
        # smaller label table
        .repartition("dst")
        .cache()
    )
    # Seed labels with round 1 already applied: starting from
    # component=doc_id, the first propagation is exactly
    # min(doc_id, min(neighbor)) — one aggregate over the edge list, which
    # saves a full join+agg+collect round trip from the loop below.
    labels = edges.groupBy(F.col("src").alias("doc_id")).agg(
        F.least(F.first("src"), F.min("dst")).alias("component")
    )
    for it in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_comp"))
        )
        # pointer-jumping shortcut alongside the neighbor min: follow my
        # label to ITS label (a plain self-join of the label table) and
        # take the three-way min. component values are always node ids
        # inside the same component, so label[label] cannot escape the
        # component and the fixed point is unchanged; both steps read the
        # SAME checkpointed `labels` (cheap checkpoint scans, no
        # recompute), and reach roughly doubles per round instead of
        # growing by one hop. The left joins cover nodes whose neighbor
        # set / pointee is absent (no lowering from that step).
        ptr = labels.select(
            F.col("doc_id").alias("_pid"), F.col("component").alias("_pcomp")
        )
        lowered = F.least(
            F.col("component"),
            F.coalesce(F.col("nbr_comp"), F.col("component")),
            F.coalesce(F.col("_pcomp"), F.col("component")),
        )
        # `labels` feeds THREE plan branches per round (neighbor-min,
        # carry, pointer), so an uncut LOGICAL tree would blow up every
        # round — r11 measured the final dedup_clusters action analyzing
        # a 608-Exchange 2^rounds plan. A LAZY localCheckpoint truncates
        # lineage at no extra job: the convergence aggregate below is the
        # action that materializes it, exactly like the cache-fill it
        # replaces, so every round's plan is O(1) deep.
        new_labels = (
            labels.join(neighbor_min, labels.doc_id == neighbor_min.src, "left")
            .join(ptr, F.col("component") == F.col("_pid"), "left")
            .select(
                "doc_id",
                lowered.alias("component"),
                # labels only ever decrease, so changed == strictly lower
                (lowered < F.col("component")).cast("long").alias("_chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(F.sum("_chg")).collect()[0][0]
        labels = new_labels.drop("_chg")
        if not changed:
            break
    edges.unpersist()
    return labels


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """SimHash fingerprint per doc over whitespace tokens (with multiplicity).

    Token hash = first 8 md5 hex chars -> uint32; fingerprint bit b is 1
    when the (+1/-1) vote sum over tokens at bit b is positive. Pure SQL:
    one row per token carrying ``bits`` per-bit vote SUM aggregates (no
    row inflation — an earlier version exploded tokens × bits, a 32×
    blow-up ahead of the shuffle). The single groupBy(doc_id) gets
    map-side partial aggregation, so the shuffle carries at most one
    (doc_id, 32 longs) tuple per doc per input partition.
    Output: (doc_id, simhash long).
    """
    tok = ensure_min_parallelism(df).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("w")
    )
    h = F.conv(F.substring(md5_hex(F.col("w")), 1, 8), 16, 10).cast("long")
    tok = tok.select("doc_id", h.alias("h"))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(F.expr(f"CAST(((shiftright(h, {b}) & 1) * 2 - 1) AS BIGINT)")).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    fp = F.lit(0).cast("long")
    for b in range(bits):
        fp = fp + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return votes.select("doc_id", fp.alias("simhash"))


def simhash_duplicate_groups(sim: DataFrame) -> DataFrame:
    """Docs whose full fingerprints collide (hamming distance 0): canonical
    id + group size, only groups with > 1 member."""
    w = Window.partitionBy("simhash")
    return (
        sim.withColumn("n_docs", F.count(F.lit(1)).over(w))
        .withColumn("canonical", F.min("doc_id").over(w))
        .filter((F.col("n_docs") > 1) & (F.col("doc_id") == F.col("canonical")))
        .select("simhash", F.col("canonical").alias("doc_id"), "n_docs")
    )
