"""Corpus / training-data pipeline queries: dedup, similarity search,
text analysis. All oracle-checked against DuckDB via md5-based hashing and
exact decimal accumulation (see queries/__init__ determinism contract).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..catalog import load_table
from ..operators import dedup as D
from ..operators import similarity as S
from ..operators import text as T
from . import register

# shared DuckDB fragments ---------------------------------------------------

TOKS = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"

SHINGLES_CTE = f"""
    toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, unnest(
        [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
         FOR i IN generate_series(1, len(t) - 2)]) AS shingle
      FROM toks WHERE len(t) >= 3)
"""

NUM_PERM = 16
BANDS = 8
ROWS_PER_BAND = NUM_PERM // BANDS

# identical affine minhash family as operators/dedup.py (one md5 base hash
# mod P, then (a*h+b) mod P per permutation — 16x fewer digests than
# hashing per-perm)
_P = D.MINHASH_PRIME
_BASE = f"(CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % {_P})"
_sig_cols = ",\n           ".join(
    f"MIN(({a} * {_BASE} + {b}) % {_P}) AS h{i}"
    for i, (a, b) in enumerate(D.PERM_PARAMS[:NUM_PERM])
)
_band_selects = "\n      UNION ALL ".join(
    "SELECT doc_id, {b} AS band, md5({concat}) AS bucket FROM sig".format(
        b=b,
        concat=" || '|' || ".join(
            f"CAST(h{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
        ),
    )
    for b in range(BANDS)
)

MINHASH_ORACLE = f"""
    WITH {SHINGLES_CTE},
    sig AS (SELECT doc_id,
           {_sig_cols}
           FROM sh GROUP BY doc_id),
    bands AS (
      {_band_selects}
    ),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.doc_a
              JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
              GROUP BY c.doc_a, c.doc_b)
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS DOUBLE) / CAST(na.n + nb.n - i.n_inter AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE CAST(i.n_inter AS DOUBLE) / CAST(na.n + nb.n - i.n_inter AS DOUBLE) >= 0.5
"""


@register(
    "dedup_exact",
    oracle="""
    SELECT doc_id, text, digest, n_copies FROM (
      SELECT doc_id, text, md5(text) AS digest,
             ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY md5(text)) AS n_copies
      FROM documents) WHERE rn = 1
    """,
    doc="Exact dedup by content hash; canonical = smallest doc_id",
)
def dedup_exact(spark, sf):
    docs = load_table(spark, sf, "documents")
    return D.exact_dedup(docs).select("doc_id", "text", "digest", "n_copies")


@register(
    "dedup_minhash_lsh",
    oracle=MINHASH_ORACLE,
    doc="MinHash(16 perms) + LSH(8 bands) candidate pairs, exact-Jaccard "
    "verified at >= 0.5; band-bucket join bounds the pair blow-up at scale",
)
def dedup_minhash_lsh(spark, sf):
    docs = load_table(spark, sf, "documents")
    return D.minhash_near_duplicates(
        docs, k=3, num_perm=NUM_PERM, bands=BANDS, threshold=0.5
    )


NGRAM_JACCARD_ORACLE = f"""
    WITH {SHINGLES_CTE},
    dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
    rare AS (SELECT sh.doc_id, sh.shingle
             FROM sh JOIN dfreq ON sh.shingle = dfreq.shingle WHERE df <= 1000),
    cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM rare a JOIN rare b
               ON a.shingle = b.shingle AND a.doc_id < b.doc_id
             GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.doc_a
              JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
              GROUP BY 1, 2)
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS DOUBLE) / CAST(na.n + nb.n - i.n_inter AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE CAST(i.n_inter AS DOUBLE) / CAST(na.n + nb.n - i.n_inter AS DOUBLE) >= 0.5
"""


@register(
    "dedup_ngram_jaccard",
    oracle=NGRAM_JACCARD_ORACLE,
    doc="Exact n-gram Jaccard dedup (no MinHash approximation): inverted-"
    "index self-join candidates with a stop-shingle document-frequency cap "
    "(df <= 1000) and >= 2 common shingles — the df cap bounds the "
    "quadratic blow-up of boilerplate shingles at corpus scale",
)
def dedup_ngram_jaccard(spark, sf):
    docs = load_table(spark, sf, "documents")
    return D.ngram_jaccard_pairs(
        docs, k=3, threshold=0.5, max_doc_freq=1000, min_common=2
    )


SUBSTRING_RUN_ORACLE = f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    kg AS (SELECT doc_id, i AS pos,
                  t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
           FROM toks, UNNEST(generate_series(1, len(t) - 2)) AS u(i)
           WHERE len(t) >= 3),
    dfreq AS (SELECT g, COUNT(DISTINCT doc_id) AS df FROM kg GROUP BY g),
    rare AS (SELECT kg.doc_id, kg.pos, kg.g
             FROM kg JOIN dfreq ON kg.g = dfreq.g WHERE df <= 200),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 a.pos AS pa, b.pos AS pb
          FROM rare a JOIN rare b
            ON a.g = b.g AND a.doc_id < b.doc_id),
    isl AS (SELECT doc_a, doc_b, pa, pb, pa - pb AS diag,
                   pa - ROW_NUMBER() OVER (
                     PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS grp
            FROM m)
    SELECT doc_a, doc_b,
           CAST(MIN(pa) AS BIGINT) AS start_a,
           CAST(MIN(pb) AS BIGINT) AS start_b,
           CAST(COUNT(*) + 2 AS BIGINT) AS run_tokens
    FROM isl GROUP BY doc_a, doc_b, diag, grp
    HAVING COUNT(*) + 2 >= 8
"""


@register(
    "substring_run_dedup",
    oracle=SUBSTRING_RUN_ORACLE,
    doc="Exact shared-substring runs >= 8 tokens between doc pairs (the "
    "Lee et al. 2022 verbatim-passage dedup signal): positional k-gram "
    "equi-join + gaps-and-islands collapse along (pa - pb) diagonals — two "
    "shuffles, no suffix array; distinct-doc-frequency cap (df <= 200) "
    "bounds the boilerplate-gram quadratic at corpus scale",
)
def substring_run_dedup(spark, sf):
    docs = load_table(spark, sf, "documents")
    return D.substring_run_pairs(
        docs, k=3, min_run_tokens=8, max_doc_freq=200
    )


@register(
    "dedup_containment",
    oracle=f"""
    WITH {SHINGLES_CTE},
    dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle),
    rare AS (SELECT sh.doc_id, sh.shingle
             FROM sh JOIN dfreq ON sh.shingle = dfreq.shingle WHERE df <= 1000),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM rare a JOIN rare b
               ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
              FROM cand c
              JOIN sh sa ON sa.doc_id = c.doc_a
              JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
              GROUP BY 1, 2),
    scored AS (SELECT i.doc_a, i.doc_b,
                      CAST(i.n_inter AS DOUBLE) / CAST(na.n AS DOUBLE) AS cont_a_in_b,
                      CAST(i.n_inter AS DOUBLE) / CAST(nb.n AS DOUBLE) AS cont_b_in_a,
                      CAST(i.n_inter AS DOUBLE)
                        / CAST(na.n + nb.n - i.n_inter AS DOUBLE) AS jaccard
               FROM inter i
               JOIN sizes na ON na.doc_id = i.doc_a
               JOIN sizes nb ON nb.doc_id = i.doc_b)
    SELECT * FROM scored WHERE GREATEST(cont_a_in_b, cont_b_in_a) >= 0.9
    """,
    doc="Asymmetric containment dedup (Broder): |A∩B|/|A| over shingle "
    "sets — flags a short doc quoted verbatim inside a long one "
    "(containment ~1.0) that symmetric Jaccard dilutes below any "
    "threshold; inverted-index candidates under the df cap, both "
    "directions verified from full sets",
)
def dedup_containment(spark, sf):
    docs = load_table(spark, sf, "documents")
    return D.containment_pairs(docs, k=3, threshold=0.9, max_doc_freq=1000)


PREFIX_JACCARD_ORACLE = f"""
    WITH {SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
              FROM sh a JOIN sh b
                ON a.shingle = b.shingle AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_inter AS DOUBLE) / CAST(na.n + nb.n - i.n_inter AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE CAST(i.n_inter AS DOUBLE) / CAST(na.n + nb.n - i.n_inter AS DOUBLE) >= 0.8
"""


@register(
    "dedup_jaccard_prefix",
    oracle=PREFIX_JACCARD_ORACLE,
    doc="PPJoin-style LOSSLESS prefix-filtered exact-Jaccard pairs at "
    ">= 0.8: global (doc-freq ASC, hash ASC) token order, integer-exact "
    "prefix lengths n - ceil(t*n) + 1, candidates from a prefix-only "
    "inverted-index self-join — provably complete (oracle is the UNCAPPED "
    "brute-force pair set), unlike the df-capped recall trade-off of "
    "dedup_ngram_jaccard",
)
def dedup_jaccard_prefix(spark, sf):
    docs = load_table(spark, sf, "documents")
    return D.prefix_filter_jaccard_pairs(
        docs, k=3, threshold_num=4, threshold_den=5
    )


# transitive closure over the >= 0.5 MinHash-LSH near-dup pair graph;
# component = min reachable doc_id (the canonical representative). LSH is
# the candidate path that scales (banding bounds pair blow-up), so the
# cluster stage builds on it rather than the inverted-index self-join.
_MH_CTES = MINHASH_ORACLE.split("WITH", 1)[1].rsplit("SELECT", 1)[0]
_MH_FINAL = "SELECT" + MINHASH_ORACLE.rsplit("SELECT", 1)[1]

DEDUP_CLUSTERS_ORACLE = f"""
    WITH RECURSIVE {_MH_CTES.strip().rstrip(',')},
    pairs AS ({_MH_FINAL}),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach AS (SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
    SELECT src AS doc_id, LEAST(src, MIN(dst)) AS component
    FROM reach GROUP BY src
"""


@register(
    "dedup_clusters",
    oracle=DEDUP_CLUSTERS_ORACLE,
    doc="Duplicate-cluster assignment: connected components over the "
    "MinHash-LSH near-dup graph via iterative min-label propagation "
    "(2 shuffles/round, O(cluster diameter) rounds, nothing collected to "
    "the driver). Oracle: DuckDB recursive-CTE transitive closure",
)
def dedup_clusters(spark, sf):
    docs = load_table(spark, sf, "documents")
    pairs = D.minhash_near_duplicates(
        docs, k=3, num_perm=NUM_PERM, bands=BANDS, threshold=0.5
    )
    return D.connected_components(pairs)


@register(
    "dedup_simhash",
    oracle=rf"""
    WITH toks AS (SELECT doc_id, unnest({TOKS}) AS w FROM documents),
    th AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) AS h FROM toks),
    votes AS (SELECT doc_id, bit, CAST(SUM(((h >> bit) & 1) * 2 - 1) AS BIGINT) AS v
              FROM th, UNNEST(generate_series(0, 31)) AS t(bit)
              GROUP BY doc_id, bit),
    sim AS (SELECT doc_id,
                   CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << bit)
                                 ELSE 0 END) AS BIGINT) AS simhash
            FROM votes GROUP BY doc_id)
    SELECT simhash, MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM sim GROUP BY simhash HAVING COUNT(*) > 1
    """,
    doc="SimHash(32-bit) fingerprints; groups of colliding fingerprints "
    "(hamming-0 duplicates)",
)
def dedup_simhash(spark, sf):
    docs = load_table(spark, sf, "documents")
    sim = D.simhash(docs, bits=32)
    return D.simhash_duplicate_groups(sim)


def _fold_sum(elems: str) -> str:
    # left fold in list order == Spark F.aggregate: bit-identical doubles
    return f"list_reduce(list_prepend(CAST(0 AS DOUBLE), {elems}), (acc, x) -> acc + x)"


def _cosine_sql(a: str, b: str) -> str:
    dot = _fold_sum(
        f"[CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) FOR i IN generate_series(1, len({a}))]"
    )
    norm = lambda v: "sqrt(" + _fold_sum(
        f"[CAST({v}[i] AS DOUBLE) * CAST({v}[i] AS DOUBLE) FOR i IN generate_series(1, len({v}))]"
    ) + ")"
    return f"({dot} / ({norm(a)} * {norm(b)}))"


KNN_ORACLE = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 8),
    v AS (SELECT vec_id AS neighbor_id, embedding AS vv, label AS vl FROM embeddings),
    scored AS (SELECT query_id, neighbor_id, {_cosine_sql('qv', 'vv')} AS cosine
               FROM v, q WHERE neighbor_id <> query_id {{cell_filter}}),
    ranked AS (SELECT query_id, neighbor_id, cosine,
                      CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, rank, cosine FROM ranked WHERE rank <= 5
"""


@register(
    "sim_knn_bruteforce",
    oracle=KNN_ORACLE.format(cell_filter=""),
    doc="Exact cosine top-5 neighbors for 8 query vectors over the corpus; "
    "decimal-exact dot products, fully tie-broken ranking",
)
def sim_knn_bruteforce(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    out = S.knn_bruteforce(emb, emb.filter(F.col("vec_id") < 8), k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


@register(
    "sim_knn_ivf",
    oracle=KNN_ORACLE.format(cell_filter="AND vl = ql"),
    doc="IVF-style single-probe ANN: search restricted to the query's cell "
    "(label); the scale path — 1/nlist of the corpus scanned per query",
)
def sim_knn_ivf(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    out = S.knn_ivf(emb, emb.filter(F.col("vec_id") < 8), k=5)
    return out.withColumn("rank", F.col("rank").cast("int"))


@register(
    "sim_embedding_near_dup",
    oracle=f"""
    WITH a AS (SELECT vec_id, embedding, label FROM embeddings)
    SELECT x.vec_id AS doc_a, y.vec_id AS doc_b,
           {_cosine_sql('x.embedding', 'y.embedding')} AS cosine
    FROM a x JOIN a y ON x.label = y.label AND x.vec_id < y.vec_id
    WHERE {_cosine_sql('x.embedding', 'y.embedding')} >= 0.35
    """,
    doc="Embedding-cosine near-dup pairs, cell(label)-blocked to bound the "
    "pair count at scale",
)
def sim_embedding_near_dup(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    return S.embedding_near_duplicates(emb, threshold=0.35)


@register(
    "lang_temperature_sample",
    oracle="""
    WITH cnt AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
                 FROM documents GROUP BY lang),
    mn AS (SELECT MIN(n) AS min_n FROM cnt),
    rates AS (SELECT lang, n,
                     LEAST(1000, CAST(floor(1000.0 *
                       sqrt(CAST(min_n AS DOUBLE) / CAST(n AS DOUBLE)))
                       AS BIGINT)) AS rate_pm
              FROM cnt, mn),
    kept AS (SELECT d.lang, r.rate_pm, r.n
             FROM documents d JOIN rates r ON d.lang = r.lang
             WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
                     AS BIGINT) % 1000 < r.rate_pm)
    SELECT lang, rate_pm, n AS n_total,
           CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM kept GROUP BY lang, rate_pm, n
    """,
    doc="Multilingual temperature rebalance at tau = 1/2 "
    "(operators/sampling.temperature_mix_sqrt): keep-rate proportional to "
    "count^(-1/2) anchored at the rarest language, derived ENTIRELY "
    "cluster-side — the closed-form sqrt is bit-identical across IEEE "
    "engines where general pow() is not, so the per-language rates are "
    "oracle-checkable; row fate is the stable md5 hash gate, stable under "
    "corpus growth",
)
def lang_temperature_sample(spark, sf):
    from ..operators.sampling import temperature_mix_sqrt

    docs = load_table(spark, sf, "documents")
    cnt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_total"))
    kept = temperature_mix_sqrt(docs, key_col="doc_id", stratum_col="lang")
    return (
        kept.groupBy("lang", "rate_pm")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .join(F.broadcast(cnt), "lang")
        .select("lang", "rate_pm", "n_total", "n_kept")
    )


@register(
    "contrastive_hard_negatives",
    oracle=f"""
    WITH a AS (SELECT vec_id AS anchor_id, embedding AS av, label AS al
               FROM embeddings WHERE vec_id % 17 = 0),
    v AS (SELECT vec_id AS neighbor_id, embedding AS vv, label AS vl
          FROM embeddings),
    scored AS (SELECT anchor_id, neighbor_id, vl, al,
                      {_cosine_sql('av', 'vv')} AS cosine
               FROM v, a WHERE neighbor_id <> anchor_id),
    pos AS (SELECT anchor_id, MAX(cosine) AS pos_cosine
            FROM scored WHERE vl = al GROUP BY anchor_id),
    neg AS (SELECT anchor_id, neighbor_id, cosine,
                   CAST(ROW_NUMBER() OVER (PARTITION BY anchor_id
                        ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
            FROM scored WHERE vl <> al)
    SELECT n.anchor_id, n.neighbor_id, n.rank, n.cosine AS neg_cosine,
           p.pos_cosine, n.cosine - p.pos_cosine AS margin
    FROM neg n LEFT JOIN pos p ON n.anchor_id = p.anchor_id
    WHERE n.rank <= 3
    """,
    doc="Contrastive hard-negative mining: per deterministic anchor subset "
    "(vec_id % 17 = 0), top-3 most-cosine-similar DIFFERENT-label vectors "
    "plus the hardest same-label positive and the triplet margin — one "
    "corpus pass feeds both (broadcast anchors, map-side MAX for the "
    "positive, one window shuffle for the negative top-k)",
)
def contrastive_hard_negatives(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 17 == 0)
    return S.hard_negative_mining(emb, anchors, k=3)


_SRP_BANDS, _SRP_BITS = 4, 4


def _srp_bit_sql(k: int) -> str:
    """Bit k of the SRP signature: sign of the md5-derived hyperplane dot
    (mirrors operators/similarity.srp_signature exactly)."""
    hp = (
        f"CAST(CAST('0x' || substr(md5('{k}:' || CAST(i AS VARCHAR)), 1, 8) AS BIGINT)"
        f" % 2001 - 1000 AS DOUBLE) / 1000.0"
    )
    dot = _fold_sum(
        f"[CAST(embedding[i] AS DOUBLE) * ({hp}) FOR i IN generate_series(1, len(embedding))]"
    )
    return f"CASE WHEN {dot} >= 0 THEN '1' ELSE '0' END"


_SRP_SIG = " || ".join(_srp_bit_sql(k) for k in range(_SRP_BANDS * _SRP_BITS))


@register(
    "sim_srp_near_dup",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding FROM embeddings),
    sig AS (SELECT vec_id, {_SRP_SIG} AS sig FROM v),
    bands AS (SELECT vec_id, b AS band, substr(sig, b * {_SRP_BITS} + 1, {_SRP_BITS}) AS bucket
              FROM sig, generate_series(0, {_SRP_BANDS - 1}) AS t(b)),
    cand AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
    SELECT c.doc_a, c.doc_b, {_cosine_sql('va.embedding', 'vb.embedding')} AS cosine
    FROM cand c
    JOIN v va ON va.vec_id = c.doc_a
    JOIN v vb ON vb.vec_id = c.doc_b
    WHERE {_cosine_sql('va.embedding', 'vb.embedding')} >= 0.35
    """,
    doc="Label-free embedding near-dup: banded signed-random-projection "
    "LSH (md5-derived hyperplanes, 4 bands x 4 bits) -> candidate pairs "
    "-> exact-cosine verify; the scale path when no cell column exists",
)
def sim_srp_near_dup(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    return S.srp_near_duplicates(
        emb, threshold=0.35, bands=_SRP_BANDS, bits_per_band=_SRP_BITS
    )


# --- text analysis ---------------------------------------------------------

_sw = {
    "en": "('the','and','of','to','a','in','is','that','for','with')",
    "es": "('el','la','de','que','y','en','un','por','con','los')",
    "de": "('der','die','und','das','ist','von','mit','den','für','nicht')",
    "fr": "('le','la','et','les','des','en','un','du','que','pour')",
}
_hits = {
    l: f"len(list_filter({TOKS}, x -> lower(x) IN {ws}))" for l, ws in _sw.items()
}
_best = f"greatest({_hits['en']}, {_hits['es']}, {_hits['de']}, {_hits['fr']})"


@register(
    "text_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_hits['en']} AS h_en, {_hits['es']} AS h_es,
             {_hits['de']} AS h_de, {_hits['fr']} AS h_fr
      FROM documents),
    pred AS (SELECT doc_id, lang,
                    CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
                         WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
                         WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
                         WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
                         ELSE 'fr' END AS lang_pred
             FROM scored)
    SELECT lang_pred, COUNT(*) AS n_docs FROM pred GROUP BY lang_pred
    """,
    doc="Stopword-hit language-ID heuristic (JVM-side fallback for "
    "fastText-style classifiers), aggregated to prediction counts",
)
def text_lang_id(spark, sf):
    docs = load_table(spark, sf, "documents")
    return T.lang_id(docs).groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "text_quality_scores",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents)
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           CASE WHEN len(toks) > 0
                THEN CAST(length(text) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS mean_token_len,
           CASE WHEN length(text) > 0
                THEN CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"]', '', 'g')) AS DOUBLE)
                     / CAST(length(text) AS DOUBLE) END AS punct_ratio,
           CASE WHEN len(toks) > 0
                THEN CAST(len(list_filter(toks, x -> lower(x) IN {_sw['en']})) AS DOUBLE)
                     / CAST(len(toks) AS DOUBLE) END AS stopword_ratio,
           CASE WHEN len(toks) > 0
                THEN CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS unique_token_ratio
    FROM t
    """,
    doc="Per-document quality signals: length, punctuation ratio, stopword "
    "ratio, uniqueness — the cheap pre-filters of a corpus pipeline",
)
def text_quality_scores(spark, sf):
    docs = load_table(spark, sf, "documents")
    return T.quality_scores(docs).withColumn(
        "n_chars", F.col("n_chars").cast("int")
    ).withColumn("n_tokens", F.col("n_tokens").cast("int"))


@register(
    "text_token_counts",
    oracle=rf"""
    SELECT doc_id,
           CAST(len({TOKS}) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe_pieces
    FROM documents
    """,
    doc="Whitespace + BPE-ish token counting (regex piece proxy)",
)
def text_token_counts(spark, sf):
    docs = load_table(spark, sf, "documents")
    return T.token_counts(docs)


@register(
    "corpus_curation",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
    base AS (
      SELECT doc_id, md5(text) AS digest,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) > 0
                  THEN CAST(len(list_distinct(toks)) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) END AS unique_token_ratio,
             {_hits['en']} AS h_en, {_hits['es']} AS h_es,
             {_hits['de']} AS h_de, {_hits['fr']} AS h_fr
      FROM t),
    pred AS (SELECT doc_id, digest, n_tokens, unique_token_ratio,
                    CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
                         WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
                         WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
                         WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
                         ELSE 'fr' END AS lang_pred
             FROM base),
    dd AS (SELECT *,
                  ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) AS rn,
                  CAST(COUNT(*) OVER (PARTITION BY digest) AS BIGINT) AS n_copies
           FROM pred)
    SELECT doc_id, lang_pred, n_tokens, unique_token_ratio, n_copies
    FROM dd
    WHERE rn = 1 AND n_tokens >= 12 AND unique_token_ratio >= 0.35
      AND lang_pred IN ('en', 'es')
      AND CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000 < 900
    """,
    doc="End-to-end corpus curation: exact-dedup keep-list + token/"
    "uniqueness quality gates + language gate + deterministic hash-gate "
    "downsample, all in one scan with a single digest-window shuffle",
)
def corpus_curation(spark, sf):
    docs = load_table(spark, sf, "documents")
    return T.curate_corpus(docs)


@register(
    "curation_drop_attribution",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
    base AS (
      SELECT doc_id, md5(text) AS digest,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) > 0
                  THEN CAST(len(list_distinct(toks)) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) END AS unique_token_ratio,
             {_hits['en']} AS h_en, {_hits['es']} AS h_es,
             {_hits['de']} AS h_de, {_hits['fr']} AS h_fr
      FROM t),
    pred AS (SELECT doc_id, digest, n_tokens, unique_token_ratio,
                    CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
                         WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
                         WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
                         WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
                         ELSE 'fr' END AS lang_pred
             FROM base),
    dd AS (SELECT *,
                  ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
           FROM pred),
    attributed AS (SELECT doc_id,
      CASE WHEN rn <> 1 THEN 'duplicate'
           WHEN n_tokens < 12 THEN 'too_short'
           WHEN unique_token_ratio < 0.35 THEN 'low_uniqueness'
           WHEN lang_pred NOT IN ('en', 'es') THEN 'language'
           WHEN NOT (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                       AS BIGINT) % 1000 < 900) THEN 'sample'
           ELSE 'kept' END AS drop_reason
      FROM dd)
    SELECT drop_reason, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM attributed GROUP BY drop_reason
    """,
    doc="Curation observability (operators/text.curation_attribution): "
    "every doc labeled with the FIRST curate_corpus gate that drops it "
    "(duplicate -> too_short -> low_uniqueness -> language -> sample) or "
    "'kept', rolled up to per-gate counts — drop-rate dashboards and gate "
    "tuning without diffing kept-lists; same one-scan/one-shuffle shape "
    "as the gate itself",
)
def curation_drop_attribution(spark, sf):
    docs = load_table(spark, sf, "documents")
    return (
        T.curation_attribution(docs)
        .groupBy("drop_reason")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "heavy_hitters_tokens",
    oracle=f"""
    SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS n
    FROM (SELECT unnest({TOKS}) AS w FROM documents)
    GROUP BY w ORDER BY n DESC, token LIMIT 50
    """,
    doc="Corpus vocabulary heavy hitters: exact top-50 token frequencies, "
    "fully tie-broken. Scale shape: explode -> map-side-combinable count "
    "-> TakeOrderedAndProject (per-partition top-k, no global sort)",
)
def heavy_hitters_tokens(spark, sf):
    from ..functions import tokens as _tokens

    docs = load_table(spark, sf, "documents")
    return (
        docs.select(F.explode(_tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(50)
    )


_BLOOM_BIT = (
    "CAST('0x' || substr(md5(CAST(i AS VARCHAR) || ':' || shingle), 1, 8)"
    " AS BIGINT) % 8192"
)


@register(
    "decontam_bloom",
    oracle=f"""
    WITH {SHINGLES_CTE},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    bbits AS (SELECT DISTINCT {_BLOOM_BIT} AS bit
              FROM bench, UNNEST([0, 1, 2]) AS t(i)),
    bitmap AS (SELECT bit // 32 AS word_idx,
                      BIT_OR(CAST(1 AS BIGINT) << CAST(bit % 32 AS INTEGER)) AS word
               FROM bbits GROUP BY word_idx),
    train AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0),
    probes AS (SELECT doc_id, shingle,
                      ({_BLOOM_BIT}) // 32 AS word_idx,
                      CAST(1 AS BIGINT)
                        << CAST(({_BLOOM_BIT}) % 32 AS INTEGER) AS mask
               FROM train, UNNEST([0, 1, 2]) AS t(i)),
    hits AS (SELECT p.doc_id, p.shingle,
                    MIN(CASE WHEN b.word IS NOT NULL
                              AND (b.word & p.mask) <> 0
                             THEN 1 ELSE 0 END) AS is_hit
             FROM probes p LEFT JOIN bitmap b ON p.word_idx = b.word_idx
             GROUP BY p.doc_id, p.shingle)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(is_hit) AS BIGINT) AS n_bloom_hits
    FROM hits GROUP BY doc_id
    """,
    doc="Decontamination with a Bloom-compressed benchmark "
    "(operators/curation.bloom_decontaminate): the broadcast side is an "
    "8192-bit bitmap (constant 1 KiB however large the benchmark suite) "
    "instead of the distinct gram set; overcount-only error, never a "
    "false negative — the safe direction for leakage guarding, and "
    "deterministic (md5 bits) so even the false positives hash-match the "
    "oracle",
)
def decontam_bloom(spark, sf):
    from ..operators.curation import bloom_decontaminate

    docs = load_table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return bloom_decontaminate(train, bench)


_CMS_CELL = (
    "CAST('0x' || substr(md5('{j}:' || w), 1, 8) AS BIGINT) % 512"
)


@register(
    "cms_token_frequencies",
    oracle=f"""
    WITH w AS (SELECT unnest({TOKS}) AS w FROM documents),
    counters AS (
      SELECT j, cell, CAST(COUNT(*) AS BIGINT) AS c
      FROM (
        {" UNION ALL ".join(f"SELECT {j} AS j, {_CMS_CELL.format(j=j)} AS cell FROM w" for j in range(4))}
      ) GROUP BY j, cell),
    top AS (SELECT w AS token, CAST(COUNT(*) AS BIGINT) AS exact_n
            FROM w GROUP BY w ORDER BY exact_n DESC, token LIMIT 32),
    probes AS (
      SELECT token, exact_n, j, cell FROM (
        {" UNION ALL ".join("SELECT token, exact_n, " + str(j) + " AS j, " + _CMS_CELL.format(j=j).replace("|| w", "|| token") + " AS cell FROM top" for j in range(4))}
      )),
    est AS (SELECT p.token, p.exact_n, MIN(c.c) AS cms_est
            FROM probes p JOIN counters c ON p.j = c.j AND p.cell = c.cell
            GROUP BY p.token, p.exact_n)
    SELECT token, exact_n, cms_est FROM est
    """,
    doc="Count-min sketch (4 x 512, md5 rows) vs exact truth: counters "
    "are ONE map-side-combinable keyed aggregate of fixed 2048-cell size "
    "— mergeable across partitions/snapshots by cell-wise sum, the "
    "fixed-memory frequency monitor when the key space itself is "
    "corpus-sized; estimates (broadcast counter join, min over rows) "
    "reported beside exact counts for the top-32 tokens, overestimate "
    "bound e*N/512 per row",
)
def cms_token_frequencies(spark, sf):
    from ..functions import tokens as _tokens
    from ..operators.sketch import cms_build, cms_estimate

    docs = load_table(spark, sf, "documents")
    toks = docs.select(F.explode(_tokens("text")).alias("token"))
    counters = cms_build(toks, "token")
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.desc("exact_n"), "token")
        .limit(32)
    )
    return cms_estimate(top, counters, "token").join(top, "token").select(
        "token", "exact_n", "cms_est"
    )


# --- curation: decontamination, repetition, caps, sharding ----------------


@register(
    "decontam_ngram_overlap",
    oracle=f"""
    WITH {SHINGLES_CTE},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    train AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 97 <> 0),
    agg AS (SELECT t.doc_id,
                   CAST(COUNT(*) AS BIGINT) AS n_grams,
                   CAST(COUNT(b.shingle) AS BIGINT) AS n_contaminated
            FROM train t LEFT JOIN bench b ON t.shingle = b.shingle
            GROUP BY t.doc_id)
    SELECT doc_id, n_grams, n_contaminated,
           CAST(n_contaminated AS DOUBLE) / CAST(n_grams AS DOUBLE) AS overlap_ratio,
           CAST(n_contaminated AS DOUBLE) >= 0.1 * CAST(n_grams AS DOUBLE) AS is_contaminated
    FROM agg
    """,
    doc="Benchmark decontamination: 3-gram overlap of every training doc "
    "against the benchmark set (doc_id % 97 = 0 stands in for an eval "
    "suite); benchmark grams broadcast, corpus side never shuffles on the "
    "gram key",
)
def decontam_ngram_overlap(spark, sf):
    from ..operators import curation as C

    docs = load_table(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return C.decontaminate(train, bench, k=3, flag_threshold=0.1)


@register(
    "text_repetition_signals",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
    cnt AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w),
    top AS (SELECT doc_id, MAX(c) AS top FROM cnt GROUP BY doc_id),
    base AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
                    CASE WHEN len(t) >= 2 THEN
                      CAST(1 AS DOUBLE)
                      - CAST(len(list_distinct([t[i] || ' ' || t[i+1]
                              FOR i IN generate_series(1, len(t) - 1)])) AS DOUBLE)
                        / CAST(len(t) - 1 AS DOUBLE)
                    END AS dup_2gram_ratio
             FROM toks)
    SELECT b.doc_id, b.n_tokens,
           CASE WHEN b.n_tokens > 0
                THEN CAST(top.top AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
           END AS top_token_ratio,
           b.dup_2gram_ratio
    FROM base b LEFT JOIN top ON b.doc_id = top.doc_id
    """,
    doc="Gopher-style repetition quality signals: top-token fraction "
    "(explode + keyed aggregates, map-side combinable) and duplicate-"
    "2-gram fraction (pure array expression, shuffle-free)",
)
def text_repetition_signals(spark, sf):
    from ..operators import curation as C

    docs = load_table(spark, sf, "documents")
    return C.repetition_signals(docs)


@register(
    "cap_per_source",
    oracle="""
    SELECT doc_id, source FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents) WHERE rn <= 15
    """,
    doc="Per-domain quota: keep at most 15 docs per source in "
    "deterministic hash order — executes as WindowGroupLimit (each map "
    "task pre-trims before the shuffle; plan-asserted)",
)
def cap_per_source(spark, sf):
    from ..operators import curation as C

    docs = load_table(spark, sf, "documents")
    return C.cap_per_group(docs, "source", cap=15).select("doc_id", "source")


_SHARDS_CTE = f"""
    s AS (SELECT doc_id,
                 CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                      AS BIGINT) % 16 AS INTEGER) AS shard,
                 CAST(len({TOKS}) AS BIGINT) AS n_tokens
          FROM documents),
    p AS (SELECT doc_id, shard, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
                      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING), 0) AS BIGINT) AS cum
          FROM s)
"""


@register(
    "pack_training_sequences",
    oracle=f"""
    WITH {_SHARDS_CTE}
    SELECT doc_id, shard, n_tokens,
           CAST(cum // 256 AS BIGINT) AS seq_id,
           CAST(cum % 256 AS BIGINT) AS seq_offset
    FROM p
    """,
    doc="LM-pretraining sequence packing (concatenate-then-chunk): stable "
    "md5 shard assignment, per-shard running token offset in doc order, "
    "chunked into 256-token sequences. Integer-only; windows partition by "
    "shard so no global sort",
)
def pack_training_sequences(spark, sf):
    from ..operators import curation as C

    docs = load_table(spark, sf, "documents")
    return C.pack_sequences(C.shard_assign(docs, n_shards=16), budget=256)


@register(
    "shard_balance_stats",
    oracle=f"""
    WITH {_SHARDS_CTE}
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(cum // 256) + 1 AS BIGINT) AS n_sequences
    FROM p GROUP BY shard
    """,
    doc="Training-layout balance audit: per-shard doc/token/sequence "
    "counts over the stable md5 sharding — the check that no shard is "
    "skewed before a distributed training run reads them",
)
def shard_balance_stats(spark, sf):
    from ..operators import curation as C

    docs = load_table(spark, sf, "documents")
    packed = C.pack_sequences(C.shard_assign(docs, n_shards=16), budget=256)
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        (F.max("seq_id") + 1).cast("long").alias("n_sequences"),
    )


@register(
    "span_dup_stats",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    blocks AS (
      SELECT doc_id,
             md5(array_to_string(t[(i-1)*8+1 : (i-1)*8+8], ' ')) AS bh
      FROM toks, UNNEST(generate_series(1, len(t) // 8)) AS u(i)),
    freq AS (SELECT bh, COUNT(*) AS f FROM blocks GROUP BY bh)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(CASE WHEN f > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_blocks,
           CAST(SUM(CASE WHEN f > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS dup_block_ratio
    FROM blocks b JOIN freq USING (bh)
    GROUP BY b.doc_id
    """,
    doc="C4-style span-level duplication stats: non-overlapping 8-token "
    "blocks hashed to one md5 each; corpus-wide block frequency joined "
    "back on the digest (never the text) -> per-doc duplicated-span "
    "fraction, the 'mostly boilerplate' drop signal",
)
def span_dup_stats(spark, sf):
    from ..operators import curation as C

    docs = load_table(spark, sf, "documents")
    return C.span_dup_stats(docs, block_tokens=8)


@register(
    "span_dedup_rewrite",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    base AS (SELECT doc_id, t, len(t) // 8 AS n_full,
                    COALESCE(array_to_string(t[(len(t)//8)*8+1 : len(t)], ' '),
                             '') AS tail
             FROM toks),
    blocks AS (SELECT doc_id, i - 1 AS idx,
                      array_to_string(t[(i-1)*8+1 : (i-1)*8+8], ' ') AS btext
               FROM toks, UNNEST(generate_series(1, len(t) // 8)) AS u(i)),
    ranked AS (SELECT doc_id, idx, btext,
                      ROW_NUMBER() OVER (PARTITION BY md5(btext)
                                         ORDER BY doc_id, idx) AS rn
               FROM blocks),
    agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                   string_agg(btext, ' ' ORDER BY idx) AS ktext
            FROM ranked WHERE rn = 1 GROUP BY doc_id)
    SELECT b.doc_id,
           CASE WHEN a.ktext IS NOT NULL AND b.tail <> ''
                  THEN a.ktext || ' ' || b.tail
                WHEN a.ktext IS NOT NULL THEN a.ktext
                ELSE b.tail END AS text_clean,
           CAST(b.n_full AS BIGINT) AS n_blocks,
           CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept
    FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id
    """,
    doc="C4-style span REMOVAL: duplicated 8-token runs keep only the "
    "globally-first occurrence (min (doc_id, position) — a map-side-"
    "combinable MIN(struct), deliberately not a row_number window, so "
    "billion-occurrence boilerplate blocks collapse before the shuffle); "
    "docs rebuilt from kept blocks + partial tail",
)
def span_dedup_rewrite(spark, sf):
    from ..operators import curation as C

    docs = load_table(spark, sf, "documents")
    return C.remove_duplicate_spans(docs, block_tokens=8)


@register(
    "inverted_index_terms",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    pairs AS (SELECT DISTINCT doc_id, unnest(t) AS term FROM toks)
    SELECT term, CAST(COUNT(*) AS BIGINT) AS df_docs,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
    FROM pairs GROUP BY term
    """,
    doc="Inverted-index build: per-doc distinct terms (array_distinct "
    "BEFORE the explode/shuffle) -> map-side-combinable posting-list "
    "collect per term; postings emitted as sorted CSV for the compare",
)
def inverted_index_terms(spark, sf):
    from ..operators import ir as IR

    docs = load_table(spark, sf, "documents")
    idx = IR.build_inverted_index(docs)
    return idx.select(
        "term",
        "df_docs",
        F.array_join(F.transform("postings", lambda d: d.cast("string")), ","
                     ).alias("postings"),
    )


_BM25_TERMS = ("spark", "hash", "window")
_BM25_TF = {
    t: f"CAST(len(list_filter(t, x -> x = '{t}')) AS DOUBLE)" for t in _BM25_TERMS
}
_BM25_DF = {
    t: f"CAST(SUM(CASE WHEN list_contains(t, '{t}') THEN 1 ELSE 0 END) AS DOUBLE)"
    for t in _BM25_TERMS
}


def _bm25_contrib(i: int, t: str) -> str:
    idf = f"(((n_docs - df{i}) + 0.5) / (df{i} + 0.5))"
    denom = f"(tf{i} + (1.5 * (0.25 + ((0.75 * dl) / avgdl))))"
    return f"({idf} * ((tf{i} * 2.5) / {denom}))"


@register(
    "bm25_doc_scores",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     CAST(SUM(len(t)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
                     {", ".join(f"{_BM25_DF[t]} AS df{i}" for i, t in enumerate(_BM25_TERMS))}
              FROM toks),
    scored AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
                      {", ".join(f"{_BM25_TF[t]} AS tf{i}" for i, t in enumerate(_BM25_TERMS))}
               FROM toks)
    SELECT doc_id,
           {" + ".join(_bm25_contrib(i, t) for i, t in enumerate(_BM25_TERMS))} AS bm25
    FROM scored, stats
    WHERE tf0 + tf1 + tf2 > 0
    """,
    doc="BM25-lite relevance of every doc vs a fixed term set: one "
    "aggregate pass -> single stats row broadcast -> pure column-expr "
    "scoring (no shuffle). Rational Robertson idf instead of ln() so the "
    "doubles are bit-identical across engines",
)
def bm25_doc_scores(spark, sf):
    from ..operators import ir as IR

    docs = load_table(spark, sf, "documents")
    return IR.bm25_scores(docs, list(_BM25_TERMS))


_CURATION_KEPT_CTES = f"""
    t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents),
    base AS (
      SELECT doc_id, md5(text) AS digest,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) > 0
                  THEN CAST(len(list_distinct(toks)) AS DOUBLE)
                       / CAST(len(toks) AS DOUBLE) END AS uniq_ratio,
             {_hits['en']} AS h_en, {_hits['es']} AS h_es,
             {_hits['de']} AS h_de, {_hits['fr']} AS h_fr
      FROM t),
    pred AS (SELECT doc_id, digest, n_tokens, uniq_ratio,
                    CASE WHEN greatest(h_en, h_es, h_de, h_fr) = 0 THEN 'und'
                         WHEN h_en = greatest(h_en, h_es, h_de, h_fr) THEN 'en'
                         WHEN h_es = greatest(h_en, h_es, h_de, h_fr) THEN 'es'
                         WHEN h_de = greatest(h_en, h_es, h_de, h_fr) THEN 'de'
                         ELSE 'fr' END AS lang_pred
             FROM base),
    dd AS (SELECT *,
                  ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id) AS rn
           FROM pred),
    kept AS (SELECT doc_id, n_tokens FROM dd
             WHERE rn = 1 AND n_tokens >= 12 AND uniq_ratio >= 0.35
               AND lang_pred IN ('en', 'es')
               AND CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) % 1000 < 900)
"""


@register(
    "training_mix",
    oracle=f"""
    WITH {_CURATION_KEPT_CTES},
    {SHINGLES_CTE},
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 97 = 0),
    contam AS (SELECT s.doc_id,
                      CAST(COUNT(*) AS BIGINT) AS n_grams,
                      CAST(COUNT(b.shingle) AS BIGINT) AS n_hit
               FROM sh s JOIN kept k ON s.doc_id = k.doc_id
               LEFT JOIN bench b ON s.shingle = b.shingle
               WHERE s.doc_id % 97 <> 0
               GROUP BY s.doc_id),
    clean AS (SELECT c.doc_id, k.n_tokens, d.source
              FROM contam c
              JOIN kept k ON k.doc_id = c.doc_id
              JOIN documents d ON d.doc_id = c.doc_id
              WHERE NOT (CAST(c.n_hit AS DOUBLE) >= 0.1 * CAST(c.n_grams AS DOUBLE))),
    capped AS (SELECT doc_id, n_tokens FROM (
                 SELECT doc_id, n_tokens,
                        ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
                 FROM clean) WHERE rn <= 15),
    sharded AS (SELECT doc_id, n_tokens,
                       CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                            AS BIGINT) % 16 AS INTEGER) AS shard
                FROM capped),
    packed AS (SELECT doc_id, shard, n_tokens,
                      CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY shard
                           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS BIGINT) AS cum
               FROM sharded)
    SELECT doc_id, shard, n_tokens,
           CAST(cum // 256 AS BIGINT) AS seq_id,
           CAST(cum % 256 AS BIGINT) AS seq_offset
    FROM packed
    """,
    doc="The end-to-end training-data job, composed from the operator "
    "library: curation gates (dedup/quality/lang/sample) -> benchmark "
    "decontamination (broadcast eval grams, flagged docs dropped) -> "
    "per-source quota (WindowGroupLimit) -> stable shards + "
    "concatenate-then-chunk packing. One registered query proves the "
    "operators compose; every stage keeps its 100 TB shape",
)
def training_mix(spark, sf):
    from ..operators import curation as C

    docs = load_table(spark, sf, "documents")
    kept = T.curate_corpus(docs).select("doc_id")
    surviving = docs.join(kept, "doc_id", "left_semi")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    # train feeds both the decontamination shingling and the clean
    # semi-join; a cache here measured 2x WORSE cold (the InMemoryRelation
    # build adds its own codegen + a pipeline barrier) — the digest-window
    # exchange below is already reused across the two consumers
    train = surviving.filter(F.col("doc_id") % 97 != 0)
    contam = C.decontaminate(train, bench, k=3, flag_threshold=0.1)
    clean = train.join(
        contam.filter(~F.col("is_contaminated")).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    capped = C.cap_per_group(clean, "source", cap=15)
    return C.pack_sequences(C.shard_assign(capped, n_shards=16), budget=256)


@register(
    "text_fingerprints",
    oracle=rf"""
    WITH t AS (SELECT doc_id, text, {TOKS} AS toks FROM documents)
    SELECT doc_id, md5(text) AS content_md5,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(toks,
                 w -> CAST('0x' || substr(md5(w), 1, 7) AS BIGINT) % 2147483647)),
             (acc, h) -> (acc * 131 + h) % 2147483647) AS rolling_fp
    FROM t
    """,
    doc="Document fingerprinting: md5 content hash + order-sensitive "
    "polynomial rolling hash (mod 2^31-1, overflow-free in 64-bit)",
)
def text_fingerprints(spark, sf):
    docs = load_table(spark, sf, "documents")
    return T.fingerprints(docs)


INCREMENTAL_ORACLE = f"""
    WITH {SHINGLES_CTE},
    sig AS (SELECT doc_id,
           {_sig_cols}
           FROM sh GROUP BY doc_id),
    bands AS (
      {_band_selects}
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    cand AS (SELECT DISTINCT b.doc_id AS doc_id, c.doc_id AS dup_of
             FROM bands b JOIN bands c
               ON b.band = c.band AND b.bucket = c.bucket
              AND b.doc_id % 10 < 2 AND c.doc_id % 10 >= 2),
    inter AS (SELECT cd.doc_id, cd.dup_of, COUNT(*) AS n_inter
              FROM cand cd
              JOIN sh sb ON sb.doc_id = cd.doc_id
              JOIN sh sc ON sc.doc_id = cd.dup_of AND sc.shingle = sb.shingle
              GROUP BY 1, 2),
    scored AS (SELECT i.doc_id, i.dup_of,
               CAST(i.n_inter AS DOUBLE)
                 / CAST(nb.n + nc.n - i.n_inter AS DOUBLE) AS jaccard
               FROM inter i
               JOIN sizes nb ON nb.doc_id = i.doc_id
               JOIN sizes nc ON nc.doc_id = i.dup_of
               WHERE CAST(i.n_inter AS DOUBLE)
                 / CAST(nb.n + nc.n - i.n_inter AS DOUBLE) >= 0.5)
    SELECT doc_id, dup_of, jaccard FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY jaccard DESC, dup_of) AS rn
      FROM scored) WHERE rn = 1
"""


@register(
    "dedup_incremental",
    oracle=INCREMENTAL_ORACLE,
    doc="Incremental ingest dedup: a 20% incoming batch (doc_id % 10 < 2) "
    "matched one-sidedly against the indexed 80% corpus via LSH band "
    "buckets; candidate volume scales with the batch, never corpus², "
    "then exact-Jaccard best-match per incoming doc",
)
def dedup_incremental(spark, sf):
    docs = load_table(spark, sf, "documents")
    side = F.col("doc_id") % 10 < 2
    return D.incremental_near_duplicates(
        docs.filter(~side),
        docs.filter(side),
        k=3,
        num_perm=NUM_PERM,
        bands=BANDS,
        threshold=0.5,
    )


# PII seeding expressions — the synthetic documents contain no PII, so the
# demo deterministically derives entities from doc_id (inputs stay the
# driver's testdata; the oracle reproduces seeding + redaction exactly).
# {S} = the engine's string type name (STRING for Spark SQL, VARCHAR for
# DuckDB) — everything else is shared syntax.
_PII_SEED_TMPL = (
    "text || ' contact user' || CAST(doc_id AS {S}) || '@ex' || "
    "CAST(doc_id % 7 AS {S}) || '.org from 10.' || "
    "CAST(doc_id % 256 AS {S}) || '.' || "
    "CAST((doc_id * 7) % 256 AS {S}) || '.' || "
    "CAST((doc_id * 13) % 256 AS {S}) || ' tel +44-555-' || "
    "CAST(1000 + doc_id % 9000 AS {S})"
)
_PII_SEED_SPARK = _PII_SEED_TMPL.format(S="STRING")
_PII_SEED_SQL = _PII_SEED_TMPL.format(S="VARCHAR")

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_PHONE = r"\+\d{1,3}-\d{3}-\d{4}"

# counts mirror the engine: each pattern counted on the text AFTER the
# earlier patterns masked it, so n_* == masked occurrences in the output
PII_ORACLE = f"""
    WITH seeded AS (SELECT doc_id, {_PII_SEED_SQL} AS text FROM documents),
    s1 AS (SELECT doc_id,
        CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
        regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1
      FROM seeded),
    s2 AS (SELECT doc_id, n_email,
        CAST(len(regexp_extract_all(t1, '{_PII_IP}')) AS BIGINT) AS n_ip,
        regexp_replace(t1, '{_PII_IP}', '<IP>', 'g') AS t2
      FROM s1)
    SELECT doc_id, n_email, n_ip,
        CAST(len(regexp_extract_all(t2, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
        md5(regexp_replace(t2, '{_PII_PHONE}', '<PHONE>', 'g')) AS redacted_md5
    FROM s2
"""


@register(
    "pii_redact",
    oracle=PII_ORACLE,
    doc="PII redaction (emails / IPv4s / intl phones) over deterministically "
    "seeded text: native regexp exprs only — a map-only stage that "
    "pipelines into the scan at 100 TB (zero shuffles, zero UDFs)",
)
def pii_redact(spark, sf):
    from ..operators.curation import redact_pii

    docs = load_table(spark, sf, "documents")
    seeded = docs.select("doc_id", F.expr(_PII_SEED_SPARK).alias("text"))
    red = redact_pii(seeded)
    return red.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ip").cast("long").alias("n_ip"),
        F.col("n_phone").cast("long").alias("n_phone"),
        F.md5("redacted").alias("redacted_md5"),
    )


CHUNK_ORACLE = f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    starts AS (
      SELECT doc_id, t, unnest(range(0, len(t), 48)) AS s
      FROM toks WHERE len(t) > 0)
    SELECT doc_id,
           CAST(s // 48 AS BIGINT) AS chunk_id,
           CAST(len(list_slice(t, s + 1, s + 64)) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(t, s + 1, s + 64), ' ') AS chunk_text
    FROM starts
    WHERE s = 0 OR s < len(t) - 16
"""


@register(
    "chunk_documents",
    oracle=CHUNK_ORACLE,
    doc="Overlapping token-window chunking (64-token windows, 16-token "
    "overlap — the RAG / context-window preprocessing shape): pure array "
    "exprs, the explode is the only row inflation, zero shuffles/UDFs",
)
def chunk_documents_q(spark, sf):
    from ..operators.curation import chunk_documents

    docs = load_table(spark, sf, "documents")
    return chunk_documents(docs, chunk_size=64, overlap=16)


QUANT_ORACLE = """
    WITH ld AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings),
    sc AS (
      SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS s
      FROM ld)
    SELECT vec_id,
           s AS scale,
           CASE WHEN s = 0
                THEN array_to_string(list_transform(v, x -> 0), ',')
                ELSE array_to_string(
                  list_transform(v, x -> CAST(floor(x / s + 0.5) AS INTEGER)),
                  ',')
           END AS qvec_csv,
           CASE WHEN s = 0 THEN 0.0
                ELSE list_max(list_transform(
                  v, x -> abs(x - floor(x / s + 0.5) * s)))
           END AS max_abs_err
    FROM sc
"""


@register(
    "embed_quantize_int8",
    oracle=QUANT_ORACLE,
    doc="Per-vector symmetric int8 scalar quantization of the embedding "
    "store (4x memory shrink, the ANN scale path): scale = max|x|/127, "
    "floor-rounded codes (engine-deterministic, unlike round()), "
    "order-independent max reconstruction error — map-only, zero "
    "shuffles/UDFs",
)
def embed_quantize_int8(spark, sf):
    from ..operators.similarity import quantize_int8

    emb = load_table(spark, sf, "embeddings")
    q = quantize_int8(emb)
    return q.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform(F.col("qvec"), lambda x: x.cast("string")), ","
        ).alias("qvec_csv"),
        "max_abs_err",
    )


SEMANTIC_DEDUP_ORACLE = f"""
    WITH RECURSIVE a AS (SELECT vec_id, embedding, label FROM embeddings),
    pairs AS (
      SELECT x.vec_id AS doc_a, y.vec_id AS doc_b
      FROM a x JOIN a y ON x.label = y.label AND x.vec_id < y.vec_id
      WHERE {_cosine_sql('x.embedding', 'y.embedding')} >= 0.35),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach AS (SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    comp AS (SELECT src AS vec_id, LEAST(src, MIN(dst)) AS component
             FROM reach GROUP BY src)
    SELECT e.vec_id,
           COALESCE(c.component, e.vec_id) AS component,
           (COALESCE(c.component, e.vec_id) = e.vec_id) AS is_kept
    FROM embeddings e LEFT JOIN comp c ON c.vec_id = e.vec_id
"""


@register(
    "semantic_dedup",
    oracle=SEMANTIC_DEDUP_ORACLE,
    doc="SemDeDup-style semantic dedup over the embedding space: "
    "cell-blocked cosine near-dup pairs -> connected components -> keep "
    "the minimum id per semantic group (composes the existing "
    "embedding_near_duplicates + connected_components operators; at scale "
    "cells come from trained IVF centroids instead of the label column)",
)
def semantic_dedup(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    pairs = S.embedding_near_duplicates(emb, threshold=0.35)
    comps = D.connected_components(pairs).withColumnRenamed("doc_id", "vec_id")
    return (
        emb.select("vec_id")
        .join(comps, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("component"), F.col("vec_id")).alias("component"),
            (
                F.coalesce(F.col("component"), F.col("vec_id"))
                == F.col("vec_id")
            ).alias("is_kept"),
        )
    )


QUALITY_SAMPLE_ORACLE = f"""
    WITH t AS (SELECT doc_id, source, {TOKS} AS toks FROM documents),
    r AS (SELECT doc_id, source,
            CASE WHEN len(toks) > 0
                 THEN CAST(floor(CAST(len(list_distinct(toks)) AS DOUBLE)
                                 / CAST(len(toks) AS DOUBLE) * 1000) AS BIGINT)
                 ELSE 0 END AS permille,
            CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
              % 1000 AS bucket
          FROM t)
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(permille) AS BIGINT) AS sum_permille
    FROM r WHERE bucket < permille GROUP BY source
"""


@register(
    "quality_weighted_sample",
    oracle=QUALITY_SAMPLE_ORACLE,
    doc="Doc-level quality-weighted downsampling: keep probability = the "
    "doc's own unique-token ratio (floor'd to a permille rate), gated by "
    "the stable md5 hash of doc_id — reproducible across engines and "
    "growth-stable; narrow filter, no shuffle before the verification agg",
)
def quality_weighted_sample_q(spark, sf):
    from ..functions import tokens as _toks
    from ..operators.sampling import quality_weighted_sample

    docs = load_table(spark, sf, "documents")
    toks = _toks("text")
    n = F.size(toks)
    permille = (
        F.when(
            n > 0,
            F.floor(
                F.size(F.array_distinct(toks)).cast("double")
                / n.cast("double")
                * 1000
            ),
        )
        .otherwise(0)
        .cast("long")
    )
    rated = docs.select("doc_id", "source", permille.alias("permille"))
    kept = quality_weighted_sample(rated, "doc_id", F.col("permille"))
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("permille").cast("long").alias("sum_permille"),
    )


@register(
    "quality_rank_normalize",
    oracle=f"""
    WITH q AS (SELECT doc_id, source,
                      CAST(len(list_distinct({TOKS})) AS DOUBLE)
                        / CAST(len({TOKS}) AS DOUBLE) AS raw
               FROM documents WHERE len({TOKS}) > 0),
    r AS (SELECT doc_id, source, raw,
                 CAST(ROW_NUMBER() OVER (PARTITION BY source
                        ORDER BY raw, doc_id) - 1 AS DOUBLE)
                 / CAST(COUNT(*) OVER (PARTITION BY source) - 1 AS DOUBLE)
                   AS pct_rank
          FROM q)
    SELECT source,
           CAST(floor(pct_rank * 10.0) AS BIGINT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n,
           MIN(raw) AS raw_lo, MAX(raw) AS raw_hi
    FROM r GROUP BY source, decile
    """,
    doc="Cross-source quality-score calibration: raw uniqueness scores "
    "are incomparable across sources (different length/boilerplate "
    "profiles), so each doc gets its PERCENTILE RANK within its source "
    "(fully tie-broken row_number over (raw, doc_id) — percent_rank's "
    "tie semantics differ subtly across engines) and sources are "
    "compared on equal-footing deciles; one window shuffle on source, "
    "decile rollup shows each source's raw-score range per calibrated "
    "bucket",
)
def quality_rank_normalize(spark, sf):
    from ..functions import tokens as _tokens

    docs = load_table(spark, sf, "documents")
    toks = _tokens("text")
    q = docs.select(
        "doc_id",
        "source",
        (
            F.size(F.array_distinct(toks)).cast("double")
            / F.size(toks).cast("double")
        ).alias("raw"),
    ).filter(F.size(toks) > 0)
    w = Window.partitionBy("source").orderBy("raw", "doc_id")
    wn = Window.partitionBy("source")
    r = q.select(
        "source",
        "raw",
        (
            (F.row_number().over(w) - 1).cast("double")
            / (F.count(F.lit(1)).over(wn) - 1).cast("double")
        ).alias("pct_rank"),
    )
    return (
        r.groupBy(
            "source",
            F.floor(F.col("pct_rank") * 10.0).cast("long").alias("decile"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("raw").alias("raw_lo"),
            F.max("raw").alias("raw_hi"),
        )
    )


@register(
    "eval_holdout_min_coverage",
    oracle="""
    WITH g AS (SELECT doc_id, lang,
                      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) AS gh
               FROM documents),
    r AS (SELECT doc_id, lang,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY gh, doc_id) AS rn
          FROM g)
    SELECT lang, doc_id, CAST(rn AS BIGINT) AS rn
    FROM r WHERE rn <= 25
    """,
    doc="Eval holdout with per-stratum coverage guarantee: EXACTLY the "
    "25 lowest-gate-hash docs per language — a plain permille hash split "
    "under-covers rare languages (a 1000-doc lang at 10 permille yields "
    "~10 eval docs, a 50-doc lang ~0); hash-ordered top-k keeps the "
    "holdout deterministic and growth-stable-ish (a new doc displaces at "
    "most one) while guaranteeing k per stratum. Executes as "
    "WindowGroupLimit: map-side top-k per language before the shuffle",
)
def eval_holdout_min_coverage(spark, sf):
    from ..operators.sampling import _hash_bucket

    docs = load_table(spark, sf, "documents")
    g = docs.select(
        "doc_id",
        "lang",
        _hash_bucket(F.col("doc_id"), mod=1 << 62).alias("gh"),
    )
    w = Window.partitionBy("lang").orderBy("gh", "doc_id")
    return (
        g.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 25)
        .select("lang", "doc_id", "rn")
    )


_P5 = "t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]"


@register(
    "phrase_search",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    grams AS (SELECT doc_id, i AS pos, {_P5} AS g
              FROM toks, UNNEST(generate_series(1, len(t) - 4)) AS u(i)
              WHERE len(t) >= 5),
    target AS (SELECT g FROM grams
               GROUP BY g ORDER BY COUNT(*) DESC, g LIMIT 1),
    hits AS (SELECT gr.doc_id, gr.pos FROM grams gr JOIN target ON gr.g = target.g)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(pos) AS BIGINT) AS first_pos
    FROM hits GROUP BY doc_id
    """,
    doc="Exact token-boundary phrase search over the positional index: "
    "the corpus' most frequent 5-token phrase (deterministic tie-broken "
    "argmax, both engines derive the same target) located per doc with "
    "occurrence counts and first position — the quoted-phrase retrieval "
    "the unigram inverted index (operators/ir.py) can't answer; grams "
    "from the shuffle-free zip-of-slices, one keyed agg for the target, "
    "broadcast join to probe",
)
def phrase_search(spark, sf):
    from ..functions import tokens as _tokens

    docs = load_table(spark, sf, "documents")
    toks = _tokens("text")
    n = F.size(toks)
    slices = [F.slice(toks, j + 1, n - 4) for j in range(5)]
    zipped = slices[0]
    for s in slices[1:]:
        zipped = F.zip_with(zipped, s, lambda a, b: F.concat_ws(" ", a, b))
    arr = F.when(n >= 5, zipped).otherwise(F.array().cast("array<string>"))
    grams = docs.select(
        "doc_id", F.posexplode(arr).alias("pos0", "g")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    target = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.desc("_n"), "g")
        .limit(1)
        .select("g")
    )
    return (
        grams.join(F.broadcast(target), "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("pos").alias("first_pos"),
        )
    )


@register(
    "oov_rate_by_lang",
    oracle=f"""
    WITH w AS (SELECT doc_id, lang, unnest({TOKS}) AS w FROM documents),
    vocab AS (SELECT w FROM w GROUP BY w
              ORDER BY COUNT(*) DESC, w LIMIT 1000),
    flagged AS (SELECT ww.doc_id, ww.lang,
                       CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
                FROM w ww LEFT JOIN vocab v ON ww.w = v.w)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(SUM(oov) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS oov_rate
    FROM flagged GROUP BY lang
    """,
    doc="Tokenizer-vocabulary coverage audit: OOV rate per language "
    "against the corpus' own top-1000 token vocab (fully tie-broken) — "
    "the fertility/coverage signal that decides vocab size and flags "
    "under-served languages before training; vocab is one keyed agg + "
    "TakeOrdered, probe is a broadcast left join, rollup map-side "
    "combinable",
)
def oov_rate_by_lang(spark, sf):
    from ..functions import tokens as _tokens

    docs = load_table(spark, sf, "documents")
    w = docs.select("lang", F.explode(_tokens("text")).alias("w"))
    vocab = (
        w.groupBy("w")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.desc("_n"), "w")
        .limit(1000)
        .select("w", F.lit(1).alias("_in_vocab"))
    )
    flagged = w.join(F.broadcast(vocab), "w", "left").select(
        "lang",
        F.when(F.col("_in_vocab").isNull(), 1).otherwise(0).alias("oov"),
    )
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("oov").cast("long").alias("n_oov"),
        (
            F.sum("oov").cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("oov_rate"),
    )


@register(
    "split_with_holdout",
    oracle=f"""
    WITH g AS (SELECT doc_id, lang,
                      CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                        AS BIGINT) AS gh
               FROM documents),
    r AS (SELECT doc_id, lang, gh,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY gh, doc_id) AS rn
          FROM g)
    SELECT doc_id, lang,
           CASE WHEN rn <= 25 THEN 'test'
                WHEN gh % 1000 < 900 THEN 'train'
                ELSE 'val' END AS split
    FROM r
    """,
    doc="Split assignment that RESPECTS the coverage-guaranteed holdout: "
    "the k lowest-gate-hash docs per language are forced into 'test' "
    "(rare languages keep eval representation), the remainder falls "
    "through to the 90/10 hash-range train/val split on the SAME gate "
    "hash — one hash drives both decisions, so membership stays "
    "deterministic and a doc can never be simultaneously held out and "
    "trained on; one per-language rank window, then a narrow CASE",
)
def split_with_holdout(spark, sf):
    from ..operators.sampling import _hash_bucket

    docs = load_table(spark, sf, "documents")
    g = docs.select(
        "doc_id",
        "lang",
        _hash_bucket(F.col("doc_id"), mod=1 << 62).alias("gh"),
    )
    w = Window.partitionBy("lang").orderBy("gh", "doc_id")
    r = g.withColumn("rn", F.row_number().over(w))
    split = (
        F.when(F.col("rn") <= 25, F.lit("test"))
        .when(F.col("gh") % 1000 < 900, F.lit("train"))
        .otherwise(F.lit("val"))
    )
    return r.select("doc_id", "lang", split.alias("split"))


@register(
    "source_content_overlap",
    oracle="""
    WITH d AS (SELECT DISTINCT source, md5(text) AS digest FROM documents),
    sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_digests
              FROM d GROUP BY source),
    inter AS (SELECT a.source AS source_a, b.source AS source_b,
                     CAST(COUNT(*) AS BIGINT) AS n_shared
              FROM d a JOIN d b
                ON a.digest = b.digest AND a.source < b.source
              GROUP BY 1, 2)
    SELECT i.source_a, i.source_b, i.n_shared, sa.n_digests AS n_a,
           sb.n_digests AS n_b,
           CAST(i.n_shared AS DOUBLE)
             / CAST(sa.n_digests + sb.n_digests - i.n_shared AS DOUBLE)
             AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.source_a
    JOIN sizes sb ON sb.source = i.source_b
    """,
    doc="Source-to-source content overlap matrix: exact-dup digests "
    "(md5 of full text) intersected pairwise — finds mirrored/scraped-"
    "twice sources before per-doc dedup even runs; digest sets are "
    "distinct-reduced per source first, so the self-join is over the "
    "deduped digest space, and the pair count is bounded by sources^2 "
    "(dozens), never docs^2",
)
def source_content_overlap(spark, sf):
    docs = load_table(spark, sf, "documents")
    d = docs.select("source", F.md5("text").alias("digest")).distinct()
    sizes = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_digests"))
    inter = (
        d.alias("a")
        .join(
            d.alias("b"),
            (F.col("a.digest") == F.col("b.digest"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        inter.join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_a"),
                    F.col("n_digests").alias("n_a"),
                )
            ),
            "source_a",
        )
        .join(
            F.broadcast(
                sizes.select(
                    F.col("source").alias("source_b"),
                    F.col("n_digests").alias("n_b"),
                )
            ),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared",
            "n_a",
            "n_b",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast(
                    "double"
                )
            ).alias("jaccard"),
        )
    )


@register(
    "embedding_label_centroids",
    oracle="""
    WITH e AS (SELECT label, i - 1 AS dim,
                      CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                        AS BIGINT) AS v6
               FROM embeddings,
                    UNNEST(generate_series(1, len(embedding))) AS t(i))
    SELECT label, CAST(dim AS INTEGER) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v6) AS DOUBLE) / 1000000.0 / CAST(COUNT(*) AS DOUBLE)
             AS mean
    FROM e GROUP BY label, dim
    """,
    doc="Per-label embedding centroids (the mean-centering / whitening "
    "prep of embedding pipelines, and the exact-aggregation counterpart "
    "of the sampled k-means in similarity.train_ivf_centroids): one "
    "posexplode + keyed aggregate, map-side combinable; components "
    "micro-quantized to BIGINT so the cross-row sum is order-independent "
    "and exact — float sums would drift by summation order at cluster "
    "partition counts",
)
def embedding_label_centroids(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    e = emb.select(
        "label", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "label",
        F.col("dim").cast("int").alias("dim"),
        F.floor(F.col("v").cast("double") * F.lit(1000000.0)).cast("long").alias("v6"),
    )
    return e.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("v6").cast("double")
            / F.lit(1000000.0)
            / F.count(F.lit(1)).cast("double")
        ).alias("mean"),
    )
