"""Dataset-assembly queries: tokenizer training statistics, corpus-LM
document scoring, deterministic split assignment, and compressed-index
ANN — the "turn a curated corpus into a training dataset" tail of the
pipeline (tokenize / score / split / index).

Oracle determinism follows the queries/__init__ contract; the LM score
uses exact BIGINT fixed-point probabilities (see operators/lm.py — no
ln(), no order-dependent float sums). bpe_train_encode graduated to
hash-oracled in round 10: greedy left-to-right merge application over a
word's symbols is EXACTLY one non-overlapping string replace over a
bracket-delimited symbol string, so the whole 8-round train+encode loop
unrolls into materialized DuckDB CTEs (_bpe_oracle below) — the same
unrolled-iteration discipline as the exact-integer k-means ANN twins
(operators/similarity.knn_pq_exact, generated below).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import bpe as B
from ..operators import lm as LM
from ..operators import similarity as S
from ..operators.sampling import hash_split
from . import register
from .corpus import TOKS


def _split_case(key_sql: str) -> str:
    """The 80/10/10 split CASE over the shared gate hash — the DuckDB
    mirror of sampling.hash_split; every split-aware oracle must use this
    one definition."""
    b = f"CAST('0x' || substr(md5(CAST({key_sql} AS VARCHAR)), 1, 8) AS BIGINT) % 1000"
    return (
        f"CASE WHEN {b} < 800 THEN 'train' "
        f"WHEN {b} < 900 THEN 'val' ELSE 'test' END"
    )



@register(
    "lm_bigram_doc_scores",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
           WHERE len(t) >= 2),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
    vs AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
           FROM (SELECT unnest(t) AS w FROM toks)),
    scored AS (SELECT b.doc_id,
                      ((c.c12 + 1) * CAST({LM.SCALE} AS BIGINT)) // (u.c1 + vs.v)
                        AS p_scaled
               FROM bg b
               JOIN c12 c ON b.w1 = c.w1 AND b.w2 = c.w2
               JOIN c1 u ON b.w1 = u.w1, vs)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(p_scaled) AS BIGINT) AS sum_scaled,
           CAST(SUM(p_scaled) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * {float(LM.SCALE)}) AS avg_p
    FROM scored GROUP BY doc_id
    """,
    doc="CCNet-shaped corpus-LM quality scoring: add-one-smoothed bigram "
    "model trained on the corpus itself (two map-side-combinable keyed "
    "aggregates, vocab-bounded), every doc scored by exact fixed-point "
    "average probability — the perplexity-filter signal without "
    "engine-dependent ln()/float-sum ordering",
)
def lm_bigram_doc_scores(spark, sf):
    docs = load_table(spark, sf, "documents")
    return LM.score_documents(docs)


@register(
    "lm_kneser_ney_scores",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
           FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
           WHERE len(t) >= 2),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                  CAST(COUNT(*) AS BIGINT) AS n1f
           FROM c12 GROUP BY w1),
    n1b AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b
            FROM c12 GROUP BY w2),
    bt AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM c12),
    scored AS (SELECT g.doc_id,
                      ((4 * c.c12 - 3) * {LM.KN_SCALE}) // (4 * u.c1)
                      + (3 * u.n1f * n.n1b * {LM.KN_SCALE}) // (4 * u.c1 * bt.b)
                        AS p_scaled
               FROM bg g
               JOIN c12 c ON g.w1 = c.w1 AND g.w2 = c.w2
               JOIN c1 u ON g.w1 = u.w1
               JOIN n1b n ON g.w2 = n.w2, bt)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(p_scaled) AS BIGINT) AS sum_scaled,
           CAST(SUM(p_scaled) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * {float(LM.KN_SCALE)}) AS avg_p
    FROM scored GROUP BY doc_id
    """,
    doc="Interpolated Kneser-Ney bigram scoring (d = 3/4, the rational "
    "discount keeps every term exact-integer): discounted ML estimate "
    "plus continuation-probability backoff N1+(w1,.)/c1 x N1+(.,w2)/B — "
    "the principled smoothing the add-one model (lm_bigram_doc_scores) "
    "approximates. Three vocab-bounded keyed aggregates + stream-back "
    "joins; fixed-point floors bit-identical cross-engine",
)
def lm_kneser_ney_scores(spark, sf):
    docs = load_table(spark, sf, "documents")
    return LM.kneser_ney_scores(docs)


@register(
    "split_train_val_test",
    oracle=f"""
    SELECT doc_id, lang, n_chars, {_split_case("doc_id")} AS split
    FROM documents
    """,
    doc="Deterministic 80/10/10 train/val/test assignment by stable key "
    "hash (operators/sampling.hash_split): growth-stable — new docs never "
    "reassign old ones, so eval holdouts survive incremental corpus "
    "builds; pure narrow expression, no shuffle, no RNG",
)
def split_train_val_test(spark, sf):
    docs = load_table(spark, sf, "documents")
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        hash_split(
            F.col("doc_id"), [("train", 800), ("val", 100), ("test", 100)]
        ).alias("split"),
    )


@register(
    "bpe_pair_stats",
    oracle=f"""
    WITH w AS (SELECT unnest({TOKS}) AS word FROM documents),
    wf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM w GROUP BY word),
    pairs AS (SELECT substr(word, i, 1) AS a, substr(word, i + 1, 1) AS b, freq
              FROM wf, UNNEST(generate_series(1, length(word) - 1)) AS g(i)
              WHERE length(word) >= 2),
    agg AS (SELECT a, b, CAST(SUM(freq) AS BIGINT) AS pair_weight
            FROM pairs GROUP BY a, b)
    SELECT a, b, pair_weight FROM agg
    ORDER BY pair_weight DESC, a, b LIMIT 32
    """,
    doc="The distributed core of BPE training, oracle-checked: top-32 "
    "frequency-weighted adjacent character pairs over the DISTINCT-word "
    "table (operators/bpe.pair_counts) — per-merge cost proportional to "
    "|vocab|, not corpus size; fully tie-broken top-k",
)
def bpe_pair_stats(spark, sf):
    docs = load_table(spark, sf, "documents")
    pairs = B.pair_counts(B.initial_vocab(docs))
    return (
        pairs.select(
            F.col("p.a").alias("a"),
            F.col("p.b").alias("b"),
            F.col("n").alias("pair_weight"),
        )
        .orderBy(F.desc("pair_weight"), F.asc("a"), F.asc("b"))
        .limit(32)
    )


def _bpe_oracle(num_merges: int = 8) -> str:
    """The full BPE train+encode loop as unrolled DuckDB CTEs.

    The key identity: the engine\'s greedy left-to-right merge fold
    (operators/bpe._merge_fold) over a word\'s symbol array equals ONE
    non-overlapping left-to-right string replace when each symbol is
    bracketed as \\x01<sym>\\x02 — adjacent bracketed tokens share no
    characters, so replace() consumes complete symbol pairs in the
    exact greedy order. Per round: split the bracket string back to
    symbols, count freq-weighted adjacent pairs, pick the argmax
    (n DESC, a, b — the engine\'s lexicographic tie-break), and apply
    it via replace; min_pair_count=2 rounds become no-ops exactly like
    the engine\'s early break. CTEs are MATERIALIZED: without it DuckDB
    inlines each round\'s references and re-evaluates the chain
    exponentially.

    SCOPE: the engine\'s base alphabet is CODEPOINT-safe since r12
    (operators/bpe._char_split — Java regex \'.\' consumes one full
    code point, previously F.split(word, \'\') split non-BMP code
    points into UTF-16 surrogate halves), matching this oracle\'s
    ``regexp_replace(word, \'(.)\', ...)`` which brackets whole code
    points in RE2 — the identity holds on any corpus, emoji/CJK
    included (pytest: test_bpe.py non-BMP oracle parity). The one
    remaining assumption: a literal \\x01/\\x02 byte inside a token
    would corrupt the oracle\'s bracket encoding (the ENGINE is
    unaffected — only this SQL twin brackets)."""
    S, E = r"\x01", r"\x02"
    ctes = [
        f"docs_toks AS MATERIALIZED (SELECT doc_id, {TOKS} AS t "
        "FROM documents)",
        "words AS MATERIALIZED (SELECT w AS word, "
        "CAST(SUM(1) AS BIGINT) AS freq "
        "FROM (SELECT unnest(t) AS w FROM docs_toks) GROUP BY w)",
        "w0 AS MATERIALIZED (SELECT word, freq, "
        f"regexp_replace(word, '(.)', e'{S}\\\\1{E}', 'g') AS s FROM words)",
    ]
    for r in range(1, num_merges + 1):
        prev = r - 1
        ctes += [
            f"t{r} AS MATERIALIZED (SELECT word, freq, s, "
            f"string_split(trim(s, e'{S}{E}'), e'{E}{S}') AS t FROM w{prev})",
            f"p{r} AS (SELECT t[i] AS a, t[i+1] AS b, SUM(freq) AS n "
            f"FROM t{r}, UNNEST(generate_series(1, len(t) - 1)) AS g(i) "
            "WHERE len(t) >= 2 GROUP BY 1, 2)",
            f"b{r} AS MATERIALIZED (SELECT a, b, n FROM p{r} "
            "ORDER BY n DESC, a, b LIMIT 1)",
            f"w{r} AS MATERIALIZED (SELECT word, freq, "
            "CASE WHEN coalesce(b.n, 0) >= 2 "
            f"THEN replace(s, e'{S}' || b.a || e'{E}{S}' || b.b || e'{E}', "
            f"e'{S}' || b.a || b.b || e'{E}') "
            f"ELSE s END AS s FROM t{r} LEFT JOIN b{r} b ON TRUE)",
        ]
    ctes.append(
        f"wc AS (SELECT word, CAST(len(string_split(trim(s, e'{S}{E}'), "
        f"e'{E}{S}')) AS BIGINT) AS k FROM w{num_merges})"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT d.doc_id AS doc_id, "
        "CAST(SUM(wc.k) AS BIGINT) AS n_bpe_tokens "
        "FROM (SELECT doc_id, unnest(t) AS word FROM docs_toks) d "
        "JOIN wc USING (word) GROUP BY d.doc_id"
    )


@register(
    "bpe_train_encode",
    oracle=_bpe_oracle(8),
    doc="End-to-end BPE: train 8 merges on the corpus (one vocab-sized "
    "aggregate + a single collected argmax row per round, lineage cut "
    "per round), then join-based encoding — per-doc BPE token counts. "
    "HASH-ORACLED since r10 (VERDICT r09 item 6 — previously the only "
    "registered query with zero driver evidence): the oracle unrolls "
    "all 8 training rounds into materialized DuckDB CTEs via the "
    "replace-over-bracketed-symbols identity (see _bpe_oracle); ties "
    "broken lexicographically in both engines. Round-1 statistics "
    "stay independently hash-checked by bpe_pair_stats",
)
def bpe_train_encode(spark, sf):
    docs = load_table(spark, sf, "documents")
    _merges, vocab = B.bpe_train(docs, num_merges=8)
    return B.bpe_token_counts(docs, vocab).select(
        "doc_id", F.col("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens")
    )


# --- exact-integer ANN oracle builders (the SQL twins of
# operators/similarity.py knn_pq_exact / knn_ivf_pq_exact; every
# arithmetic step is on the same integer lattice, so DuckDB reproduces
# the trained codebooks, codes, and ADC ranking bit-for-bit) ----------

_EX_DIM, _EX_M, _EX_D = 64, 4, 16  # embeddings dim, subspaces, sub-dim


def _fold_sum_int(elems: str) -> str:
    return (f"list_reduce(list_prepend(CAST(0 AS BIGINT), {elems}), "
            "(acc, x) -> acc + x)")


def _int_dist_sql(a: str, b: str, d: int) -> str:
    return _fold_sum_int(
        f"[({a}[i] - {b}[i]) * ({a}[i] - {b}[i]) "
        f"FOR i IN generate_series(1, {d})]"
    )


def _kmeans_ctes(n: str, src: str, k: int, d: int, iters: int = 2) -> str:
    """CTE chain training exact-integer k-means over {src}(vec_id, v)
    into {n}_c{iters}(cid, c) — md5-ranked init, fixed unrolled
    iterations, floor-mean update, empty clusters carry."""
    ctes = [f"""{n}_c0 AS (
      SELECT cid, v AS c FROM (
        SELECT ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cid, v
        FROM {src}) WHERE cid <= {k})"""]
    for i in range(1, iters + 1):
        prev = f"{n}_c{i - 1}"
        ctes.append(f"""{n}_a{i} AS (
      SELECT vec_id, v, cid FROM (
        SELECT s.vec_id, s.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id
                 ORDER BY {_int_dist_sql('s.v', 'c.c', d)}, c.cid) AS rn
        FROM {src} s, {prev} c) WHERE rn = 1)""")
        ctes.append(f"""{n}_m{i} AS (
      SELECT cid, pos, CAST(SUM(v[pos]) // COUNT(*) AS BIGINT) AS comp
      FROM {n}_a{i}, UNNEST(generate_series(1, {d})) AS g(pos)
      GROUP BY cid, pos)""")
        ctes.append(f"""{n}_cl{i} AS (
      SELECT cid, list(comp ORDER BY pos) AS c FROM {n}_m{i} GROUP BY cid)""")
        ctes.append(f"""{n}_c{i} AS (
      SELECT p.cid, COALESCE(w.c, p.c) AS c
      FROM {prev} p LEFT JOIN {n}_cl{i} w USING (cid))""")
    return ",\n    ".join(ctes)


def _pq_subspace_ctes(iters: int = 2, k_codes: int = 8) -> str:
    """Per-subspace training + corpus codes + query LUT CTEs, and the
    unioned per-subspace partial ADC distances as ``parts``."""
    blocks, unions = [], []
    for s in range(_EX_M):
        lo, hi = s * _EX_D + 1, (s + 1) * _EX_D
        n = f"pq{s}"
        blocks.append(
            f"{n}_sub AS (SELECT vec_id, q[{lo}:{hi}] AS v FROM qv)")
        blocks.append(_kmeans_ctes(n, f"{n}_sub", k_codes, _EX_D, iters))
        blocks.append(f"""{n}_code AS (
      SELECT vec_id AS neighbor_id, cid AS code FROM (
        SELECT s.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id
                 ORDER BY {_int_dist_sql('s.v', 'c.c', _EX_D)}, c.cid) AS rn
        FROM {n}_sub s, {n}_c{iters} c) WHERE rn = 1)""")
        blocks.append(f"""{n}_lut AS (
      SELECT u.vec_id AS query_id, c.cid AS code,
             {_int_dist_sql('u.v', 'c.c', _EX_D)} AS dist
      FROM {n}_sub u, {n}_c{iters} c WHERE u.vec_id < 8)""")
        unions.append(
            f"SELECT l.query_id, c.neighbor_id, l.dist "
            f"FROM {n}_code c JOIN {n}_lut l USING (code)")
    blocks.append("parts AS (" + " UNION ALL ".join(unions) + ")")
    return ",\n    ".join(blocks)


_QV_CTE = f"""qv AS (
      SELECT vec_id,
             [CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT)
              + 4194304 FOR i IN generate_series(1, {_EX_DIM})] AS q
      FROM embeddings)"""

_PQ_ANN_ORACLE = f"""
    WITH {_QV_CTE},
    {_pq_subspace_ctes()},
    adc AS (SELECT query_id, neighbor_id, CAST(SUM(dist) AS BIGINT) AS adc_dist
            FROM parts GROUP BY query_id, neighbor_id)
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, adc_dist FROM (
      SELECT query_id, neighbor_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, neighbor_id) AS rank
      FROM adc WHERE query_id <> neighbor_id) WHERE rank <= 5
    """

_IVF_PQ_ORACLE = f"""
    WITH {_QV_CTE},
    ivf_sub AS (SELECT vec_id, q AS v FROM qv),
    {_kmeans_ctes('ivf', 'ivf_sub', 8, _EX_DIM)},
    v_cells AS (
      SELECT vec_id AS neighbor_id, cid AS cell FROM (
        SELECT s.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id
                 ORDER BY {_int_dist_sql('s.v', 'c.c', _EX_DIM)}, c.cid) AS rn
        FROM ivf_sub s, ivf_c2 c) WHERE rn = 1),
    q_cells AS (
      SELECT query_id, cell FROM (
        SELECT s.vec_id AS query_id, c.cid AS cell,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id
                 ORDER BY {_int_dist_sql('s.v', 'c.c', _EX_DIM)}, c.cid) AS rn
        FROM ivf_sub s, ivf_c2 c WHERE s.vec_id < 8) WHERE rn <= 2),
    cand AS (SELECT DISTINCT q.query_id, v.neighbor_id
             FROM v_cells v JOIN q_cells q USING (cell)),
    {_pq_subspace_ctes()},
    adc AS (SELECT p.query_id, p.neighbor_id,
                   CAST(SUM(p.dist) AS BIGINT) AS adc_dist
            FROM parts p
            JOIN cand USING (query_id, neighbor_id)
            GROUP BY p.query_id, p.neighbor_id)
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, adc_dist FROM (
      SELECT query_id, neighbor_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, neighbor_id) AS rank
      FROM adc WHERE query_id <> neighbor_id) WHERE rank <= 5
    """


@register(
    "pq_ann",
    oracle=_PQ_ANN_ORACLE,
    doc="Product-quantization ANN, HASH-ORACLED end to end: codebooks "
    "trained by exact-integer k-means (md5-ranked init, 2 unrolled "
    "iterations, floor-mean update — the PageRank treatment applied to "
    "k-means, operators/similarity.knn_pq_exact), corpus encoded to "
    "m=4 codes, queries scored by integer ADC (per-subspace LUT join), "
    "fully tie-broken top-5. No driver-side model state: training is a "
    "k-row broadcast + positional aggregate per iteration. The float "
    "knn_pq path remains for the persisted-index operators; its "
    "recall-vs-bruteforce is unit-asserted",
)
def pq_ann(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    return S.knn_pq_exact(
        emb, emb.filter(F.col("vec_id") < 8), m=4, k_codes=8, k=5
    )


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH toks AS (SELECT doc_id, lang, unnest({TOKS}) AS tok FROM documents),
    b AS (SELECT doc_id, lang,
                 CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 256 AS bk
          FROM toks),
    cnt AS (SELECT bk, CAST(COUNT(*) AS BIGINT) AS cr,
                   CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS ct
            FROM b GROUP BY bk),
    tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(ct) AS BIGINT) AS nt
            FROM cnt),
    wb AS (SELECT bk,
                  ((((ct + 1) * CAST({LM.DSIR_SCALE} AS BIGINT)) // (nt + 256))
                   * (nr + 256)) // (cr + 1) AS w
           FROM cnt, tot)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(w) AS BIGINT) AS sum_w_scaled,
           CAST(SUM(w) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * {float(LM.DSIR_SCALE)}) AS avg_w
    FROM b JOIN wb USING (bk) GROUP BY doc_id
    """,
    doc="DSIR-style data selection (hashed-unigram importance "
    "resampling): each doc weighted by the add-one likelihood ratio of "
    "the target (lang='en') vs raw token distribution over 256 md5 "
    "buckets — model is one map-side-combinable pass into 256 rows, "
    "weights broadcast back, fixed-point exact (operators/lm.py)",
)
def dsir_importance_weights(spark, sf):
    docs = load_table(spark, sf, "documents")
    return LM.dsir_importance(docs, F.col("lang") == "en")


@register(
    "sim_knn_ivfpq",
    oracle=_IVF_PQ_ORACLE,
    doc="IVF+PQ composed ANN (the FAISS-IVFPQ billion-scale layout), "
    "HASH-ORACLED end to end: exact-integer coarse k-means prunes "
    "candidates via an EQUI-JOIN on cell id with 2-probe boundary "
    "recovery, exact-integer PQ codebooks compress candidate scoring "
    "to an integer ADC LUT join (operators/similarity.knn_ivf_pq_exact)"
    " — only the constant-size centroid broadcasts are nested-loop "
    "shapes; candidate generation touches 1/nlist of the corpus per "
    "probe. The float knn_ivf_pq path remains for the persisted index",
)
def sim_knn_ivfpq(spark, sf):
    emb = load_table(spark, sf, "embeddings")
    return S.knn_ivf_pq_exact(
        emb, emb.filter(F.col("vec_id") < 8),
        nlist=8, m=4, k_codes=8, k=5, nprobe=2,
    )


@register(
    "ann_index_compaction",
    oracle="SELECT vec_id, "
    "CAST(CASE WHEN vec_id % 5 = 0 THEN 3 ELSE 0 END AS BIGINT) AS epoch "
    "FROM embeddings WHERE vec_id < 400",
    doc="Persisted-index maintenance (VERDICT r10 item 7, "
    "operators/ann_index.compact_ann_index): build an IVF+PQ index on "
    "400 vectors, churn it 3 rounds (tombstone the %5==0 ids at "
    "versions 1..3, re-append the SAME vectors at matching epochs — "
    "the steady-state synced-index diet), then compact. The hash "
    "oracle pins the folded index CONTENT — exactly one row per live "
    "id, churned ids at their final epoch 3, untouched ids at 0 (ids "
    "and epochs are model-independent, so this is byte-deterministic "
    "even though the float k-means geometry is not SQL-expressible); "
    "probe-result parity across the compaction and the cleared "
    "tombstone set are asserted engine-side. Query cost after many "
    "syncs is O(live vectors), not O(sync history)",
)
def ann_index_compaction(spark, sf):
    import shutil
    import tempfile

    from ..operators.ann_index import (append_to_ann_index,
                                       build_ann_index,
                                       compact_ann_index,
                                       query_ann_index,
                                       tombstone_ann_index)

    emb = load_table(spark, sf, "embeddings").select(
        "vec_id", "embedding").filter(F.col("vec_id") < 400)
    tmp = tempfile.mkdtemp(prefix="clx_annc_")
    idx = tmp + "/ann"
    try:
        build_ann_index(emb, idx, nlist=8, m=4, k_codes=16)
        churn = emb.filter(F.col("vec_id") % 5 == 0)
        for r in range(1, 4):
            tombstone_ann_index(spark, idx, churn.select("vec_id"), r)
            append_to_ann_index(churn, idx, epoch=r)
        q = emb.filter(F.col("vec_id") < 4)
        before = sorted(
            (row.query_id, row.neighbor_id)
            for row in query_ann_index(spark, idx, q, k=5,
                                       nprobe=4).collect())
        res = compact_ann_index(spark, idx)
        after = sorted(
            (row.query_id, row.neighbor_id)
            for row in query_ann_index(spark, idx, q, k=5,
                                       nprobe=4).collect())
        if after != before:
            raise AssertionError("compaction changed probe results")
        if res["kept"] != 400 or res["dropped"] != 240:
            raise AssertionError(f"unexpected fold counts: {res}")
        if spark.read.parquet(f"{idx}/tombstones").count() != 0:
            raise AssertionError("tombstones must clear on compaction")
        out = spark.read.parquet(f"{idx}/index").select(
            F.col("vec_id"),
            F.col("_epoch").cast("bigint").alias("epoch"),
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


from .corpus import _CURATION_KEPT_CTES  # noqa: E402


@register(
    "training_manifest",
    oracle=f"""
    WITH {_CURATION_KEPT_CTES},
    assigned AS (
      SELECT k.doc_id, k.n_tokens, d.source,
             d.split
      FROM kept k
      JOIN (SELECT doc_id, source, {_split_case("doc_id")} AS split
            FROM documents) d ON d.doc_id = k.doc_id),
    g AS (SELECT split, source,
                 CAST(COUNT(*) AS BIGINT) AS n_docs,
                 CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
          FROM assigned GROUP BY split, source)
    SELECT split, source, n_docs, sum_tokens,
           CAST(sum_tokens AS DOUBLE)
             / CAST(SUM(sum_tokens) OVER (PARTITION BY split) AS DOUBLE)
             AS token_share
    FROM g
    """,
    doc="Training-run manifest: the curation keep-list (dedup + quality + "
    "language + hash-gate sample, one scan) split-assigned by stable "
    "hash and rolled up per (split, source) — doc counts, token sums, "
    "and each source's exact token share of its split. The composed "
    "what-goes-into-the-run audit every dataset release ships with",
)
def training_manifest(spark, sf):
    from pyspark.sql import Window

    from ..operators import text as TX

    docs = load_table(spark, sf, "documents")
    kept = TX.curate_corpus(docs)
    assigned = (
        kept.select("doc_id", "n_tokens")
        .join(docs.select("doc_id", "source"), "doc_id")
        .withColumn(
            "split",
            hash_split(
                F.col("doc_id"), [("train", 800), ("val", 100), ("test", 100)]
            ),
        )
    )
    g = assigned.groupBy("split", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
    return g.withColumn(
        "token_share",
        F.col("sum_tokens").cast("double")
        / F.sum("sum_tokens").over(Window.partitionBy("split")).cast("double"),
    )


from ..operators import dedup as D  # noqa: E402
from .corpus import MINHASH_ORACLE  # noqa: E402



@register(
    "split_leakage_audit",
    oracle=f"""
    WITH pairs AS ({MINHASH_ORACLE}),
    sp AS (SELECT doc_id, {_split_case("doc_id")} AS split FROM documents)
    SELECT LEAST(a.split, b.split) AS split_lo,
           GREATEST(a.split, b.split) AS split_hi,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs p
    JOIN sp a ON a.doc_id = p.doc_a
    JOIN sp b ON b.doc_id = p.doc_b
    GROUP BY 1, 2
    """,
    doc="Eval-contamination audit: MinHash-LSH near-dup pairs (Jaccard >= "
    "0.5) labeled with each side's growth-stable split and rolled up per "
    "split pair — any off-diagonal row is train/eval leakage a "
    "dedup-aware split must resolve. Composes the bucketed LSH pipeline "
    "(never corpus^2) with the hash split; pair volume is LSH-bounded so "
    "the audit costs the same as the dedup pass itself",
)
def split_leakage_audit(spark, sf):
    docs = load_table(spark, sf, "documents")
    pairs = D.minhash_near_duplicates(docs, threshold=0.5)
    sp = docs.select(
        "doc_id",
        hash_split(
            F.col("doc_id"), [("train", 800), ("val", 100), ("test", 100)]
        ).alias("split"),
    )
    labeled = (
        pairs.join(
            sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("_sa")),
            "doc_a",
        )
        .join(
            sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("_sb")),
            "doc_b",
        )
    )
    return labeled.groupBy(
        F.least("_sa", "_sb").alias("split_lo"),
        F.greatest("_sa", "_sb").alias("split_hi"),
    ).agg(F.count(F.lit(1)).alias("n_pairs"))


from .corpus import DEDUP_CLUSTERS_ORACLE  # noqa: E402


@register(
    "split_dedup_aware",
    oracle=f"""
    WITH comp AS ({DEDUP_CLUSTERS_ORACLE})
    SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS rep,
           {_split_case("COALESCE(c.component, d.doc_id)")} AS split
    FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    """,
    doc="Dedup-aware split assignment: every doc is split by the stable "
    "hash of its duplicate-cluster REPRESENTATIVE (connected-components "
    "min label; singletons hash themselves), so near-duplicate docs land "
    "in the same split by construction — the repair for what "
    "split_leakage_audit measures. Costs one CC pass over the LSH graph; "
    "growth-stable for docs whose cluster membership is stable",
)
def split_dedup_aware(spark, sf):
    from .corpus import BANDS, NUM_PERM

    docs = load_table(spark, sf, "documents")
    pairs = D.minhash_near_duplicates(
        docs, k=3, num_perm=NUM_PERM, bands=BANDS, threshold=0.5
    )
    comp = D.connected_components(pairs)
    rep = (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id", F.coalesce(F.col("component"), F.col("doc_id")).alias("rep")
        )
    )
    return rep.withColumn(
        "split",
        hash_split(F.col("rep"), [("train", 800), ("val", 100), ("test", 100)]),
    )


from ..operators import ir as IR  # noqa: E402
from .corpus import (  # noqa: E402
    _BM25_DF, _BM25_TERMS, _BM25_TF, _bm25_contrib, _cosine_sql)

_BM25_EXPR = " + ".join(_bm25_contrib(i, t) for i, t in enumerate(_BM25_TERMS))
_RERANK_COS = _cosine_sql("e.embedding", "q.qv")


@register(
    "hybrid_search_rerank",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     CAST(SUM(len(t)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
                     {", ".join(f"{_BM25_DF[t]} AS df{i}" for i, t in enumerate(_BM25_TERMS))}
              FROM toks),
    scored AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
                      {", ".join(f"{_BM25_TF[t]} AS tf{i}" for i, t in enumerate(_BM25_TERMS))}
               FROM toks),
    bm AS (SELECT doc_id, {_BM25_EXPR} AS bm25
           FROM scored, stats WHERE tf0 + tf1 + tf2 > 0),
    cand AS (SELECT doc_id, bm25 FROM bm ORDER BY bm25 DESC, doc_id LIMIT 20),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
    SELECT c.doc_id, c.bm25,
           {_RERANK_COS} AS cosine,
           CAST(ROW_NUMBER() OVER (ORDER BY {_RERANK_COS} DESC, c.doc_id)
                AS INTEGER) AS rerank
    FROM cand c JOIN embeddings e ON e.vec_id = c.doc_id, q
    """,
    doc="Hybrid retrieval cascade: BM25 top-20 lexical candidates "
    "(rational idf, fully tie-broken) reranked by embedding cosine vs a "
    "query vector — the classic retrieve-then-rerank join of the text "
    "and vector surfaces. Candidate set is LIMIT-bounded, so the rerank "
    "join and window cost O(candidates), not corpus",
)
def hybrid_search_rerank(spark, sf):
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents")
    emb = load_table(spark, sf, "embeddings")
    cand = (
        IR.bm25_scores(docs, list(_BM25_TERMS))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_qv"))
    scored = (
        cand.join(
            emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
        )
        .crossJoin(F.broadcast(q))
        .withColumn("cosine", S.cosine_sim(F.col("embedding"), F.col("_qv")))
    )
    w = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    return scored.select(
        "doc_id",
        "bm25",
        "cosine",
        F.row_number().over(w).cast("int").alias("rerank"),
    )


@register(
    "dq_orders_expectations",
    oracle="""
    WITH row_checks AS (
      SELECT 'not_null_o_custkey' AS name, 'not_null' AS kind,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations,
             CAST(COUNT(*) AS BIGINT) AS total FROM orders
      UNION ALL
      SELECT 'range_o_totalprice', 'accepted_range',
             CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0.0
                           OR o_totalprice > 1000000.0 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'values_o_orderstatus', 'accepted_values',
             CAST(SUM(CASE WHEN o_orderstatus IS NULL
                           OR o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'order_after_epoch', 'satisfies',
             CAST(SUM(CASE WHEN NOT (o_orderdate >= TIMESTAMP '1990-01-01')
                           THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(*) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'unique_o_orderkey', 'unique',
             CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n ELSE 0 END), 0) AS BIGINT),
             CAST(COALESCE(SUM(n), 0) AS BIGINT)
      FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)
      UNION ALL
      SELECT 'fk_o_custkey', 'foreign_key',
             CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON o.o_custkey = c.c_custkey)
    SELECT name, kind, violations, total, violations = 0 AS passed FROM row_checks
    """,
    doc="Data-quality expectations (dbt-test / Great-Expectations "
    "surface): not-null, range, accepted-values and custom-predicate "
    "checks FUSED into one scan (N checks = N map-side-combinable sums, "
    "1 pass), plus key uniqueness (one keyed shuffle) and referential "
    "integrity (left-join null flag, one pass for violations AND total). "
    "Gate loads on passed, store the rows as the audit trail",
)
def dq_orders_expectations(spark, sf):
    from ..operators import expectations as E

    orders = load_table(spark, sf, "orders")
    customer = load_table(spark, sf, "customer")
    return E.validate(
        orders,
        [
            E.not_null("o_custkey"),
            E.accepted_range("o_totalprice", 0.0, 1_000_000.0),
            E.accepted_values("o_orderstatus", ["O", "F", "P"]),
            E.satisfies(
                "order_after_epoch",
                F.col("o_orderdate") >= F.lit("1990-01-01").cast("timestamp"),
            ),
            E.unique(["o_orderkey"]),
            E.foreign_key("o_custkey", customer, "c_custkey"),
        ],
    )


@register(
    "anomaly_mad_by_type",
    oracle="""
    WITH med AS (SELECT event_type, quantile_cont(value, 0.5) AS med
                 FROM events GROUP BY event_type),
    dev AS (SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
            FROM events e JOIN med m ON e.event_type = m.event_type),
    mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY event_type)
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           MAX(d.med) AS med,
           MAX(a.mad) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3.0 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalies
    FROM dev d JOIN mad a ON d.event_type = a.event_type
    GROUP BY d.event_type
    """,
    doc="Robust outlier monitoring: per-type median + MAD (exact "
    "interpolated percentiles, bit-identical to quantile_cont) and the "
    "count of values beyond 3 MADs — the monitoring rule that survives "
    "the outliers it hunts; stats broadcast back, flags fused into the "
    "final keyed agg",
)
def anomaly_mad_by_type(spark, sf):
    from ..operators.integrity import mad_anomalies

    ev = load_table(spark, sf, "events")
    return mad_anomalies(ev, "value", ["event_type"], k=3.0)


@register(
    "lm_score_heldout",
    oracle=f"""
    WITH train AS (SELECT doc_id, {TOKS} AS t FROM documents WHERE doc_id % 7 <> 0),
    held AS (SELECT doc_id, {TOKS} AS t FROM documents WHERE doc_id % 7 = 0),
    bg_tr AS (SELECT t[i] AS w1, t[i + 1] AS w2
              FROM train, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
              WHERE len(t) >= 2),
    c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg_tr GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1),
    vs AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
           FROM (SELECT unnest(t) AS w FROM train)),
    bg_h AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
             FROM held, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
             WHERE len(t) >= 2),
    scored AS (SELECT b.doc_id,
                      ((COALESCE(c.c12, 0) + 1) * CAST({LM.SCALE} AS BIGINT))
                        // (COALESCE(u.c1, 0) + vs.v) AS p_scaled,
                      CASE WHEN c.c12 IS NULL THEN 1 ELSE 0 END AS oov
               FROM bg_h b
               LEFT JOIN c12 c ON b.w1 = c.w1 AND b.w2 = c.w2
               LEFT JOIN c1 u ON b.w1 = u.w1, vs)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(p_scaled) AS BIGINT) AS sum_scaled,
           CAST(SUM(oov) AS BIGINT) AS n_oov_bigrams,
           CAST(SUM(p_scaled) AS DOUBLE)
             / (CAST(COUNT(*) AS DOUBLE) * {float(LM.SCALE)}) AS avg_p
    FROM scored GROUP BY doc_id
    """,
    doc="Held-out LM scoring with OOV backoff: model trained on 6/7 of "
    "the corpus, the held-out 1/7 scored under it — unseen bigrams back "
    "off to (0+1)/(c1+V), unseen contexts to 1/V (left joins + coalesce, "
    "the path self-corpus scoring never exercises). The shape of real "
    "perplexity filtering, where the scored batch is NEW data; model "
    "persists via save_lm_model/load_lm_model (parquet, vocab-bounded)",
)
def lm_score_heldout(spark, sf):
    docs = load_table(spark, sf, "documents")
    train = docs.filter(F.col("doc_id") % 7 != 0)
    held = docs.filter(F.col("doc_id") % 7 == 0)
    bigram_counts, context_counts, stats = LM.train_bigram_lm(train)
    return LM.score_against_model(held, bigram_counts, context_counts, stats)


_WF_ROUNDS = 5


def _waterfill_oracle(rounds: int = _WF_ROUNDS) -> str:
    """Unrolled exact-integer water-filling: all arithmetic is BIGINT
    floor division, so N chained CTE rounds reproduce the Spark loop
    bit-for-bit (same unroll discipline as the PageRank oracle)."""
    ctes = [
        "caps AS (SELECT source, CAST(SUM(len(" + TOKS + ")) AS BIGINT)"
        " AS cap FROM documents GROUP BY source)",
        "b AS (SELECT CAST(SUM(cap) // 2 AS BIGINT) AS budget FROM caps)",
        "s0 AS (SELECT source, cap, budget, CAST(0 AS BIGINT) AS alloc,"
        " FALSE AS frozen FROM caps, b)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"st{i} AS (SELECT CAST(SUM(CASE WHEN frozen THEN alloc "
            f"ELSE 0 END) AS BIGINT) AS fz, "
            f"CAST(SUM(CASE WHEN NOT frozen THEN 1 ELSE 0 END) AS BIGINT)"
            f" AS nf FROM s{i-1}), "
            f"s{i} AS (SELECT source, cap, budget, "
            f"CASE WHEN frozen THEN alloc ELSE LEAST(cap, "
            f"CASE WHEN nf > 0 THEN (budget - fz) // nf ELSE CAST(0 AS BIGINT) END) END"
            f" AS alloc, "
            f"frozen OR cap <= CASE WHEN nf > 0 THEN (budget - fz) // nf "
            f"ELSE CAST(0 AS BIGINT) END AS frozen "
            f"FROM s{i-1}, st{i})"
        )
    return f"""
    WITH {", ".join(ctes)}
    SELECT source, cap AS cap_tokens, CAST(alloc AS BIGINT) AS alloc_tokens,
           frozen AS saturated
    FROM s{rounds}
    """


@register(
    "mix_waterfill",
    oracle=_waterfill_oracle(),
    doc="Training-mix water-filling: allocate a global token budget "
    "(half the corpus) across sources with per-source capacity caps — "
    "each round the remaining budget splits equally among unsaturated "
    "sources; any source whose capacity falls below its share freezes "
    "at capacity and its surplus redistributes. Exact BIGINT floor "
    "arithmetic, 5 unrolled rounds (covers any saturation cascade on "
    "this source count), so the ITERATIVE allocation carries a full "
    "hash oracle. Per round: one 1-row aggregate broadcast back over "
    "the source table — dimension-sized, never scans the corpus again",
)
def mix_waterfill(spark, sf):
    from ..functions import tokens

    docs = load_table(spark, sf, "documents")
    caps = docs.groupBy("source").agg(
        F.sum(F.size(tokens("text"))).cast("long").alias("cap")
    )
    budget = caps.agg((F.sum("cap").cast("long") / 2).cast("long").alias("budget"))
    state = caps.crossJoin(F.broadcast(budget)).select(
        "source",
        "cap",
        "budget",
        F.lit(0).cast("long").alias("alloc"),
        F.lit(False).alias("frozen"),
    )
    for _ in range(_WF_ROUNDS):
        stats = state.agg(
            F.sum(F.when(F.col("frozen"), F.col("alloc")).otherwise(F.lit(0)))
            .cast("long")
            .alias("fz"),
            F.sum((~F.col("frozen")).cast("long")).cast("long").alias("nf"),
        )
        share = F.when(
            F.col("nf") > 0,
            F.expr("(budget - fz) div nf"),
        ).otherwise(F.lit(0).cast("long"))
        state = state.crossJoin(F.broadcast(stats)).select(
            "source",
            "cap",
            "budget",
            F.when(F.col("frozen"), F.col("alloc"))
            .otherwise(F.least(F.col("cap"), share))
            .alias("alloc"),
            (F.col("frozen") | (F.col("cap") <= share)).alias("frozen"),
        )
    return state.select(
        "source",
        F.col("cap").alias("cap_tokens"),
        F.col("alloc").cast("long").alias("alloc_tokens"),
        F.col("frozen").alias("saturated"),
    )


@register(
    "class_balance_oversample",
    oracle="""
    WITH n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang
               FROM documents GROUP BY lang),
    tgt AS (SELECT CAST(MAX(n_lang) AS BIGINT) AS target FROM n),
    ranked AS (SELECT d.doc_id, d.lang, n.n_lang, t.target,
                      CAST(ROW_NUMBER() OVER (PARTITION BY d.lang
                           ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
                        AS BIGINT) AS rk
               FROM documents d JOIN n ON n.lang = d.lang, tgt t),
    copies AS (SELECT doc_id, lang,
                      target // n_lang
                      + CASE WHEN rk <= target % n_lang THEN 1 ELSE 0 END
                        AS n_copies
               FROM ranked)
    SELECT doc_id, lang, CAST(c AS BIGINT) AS copy_id
    FROM copies, UNNEST(generate_series(1, CAST(n_copies AS BIGINT))) AS t(c)
    """,
    doc="Deterministic class-balance oversampling: every language is "
    "replicated up to the majority-class count — each doc gets "
    "floor(target / n_lang) copies, and the remainder goes to the docs "
    "ranked first by the stable md5(doc_id) hash (reproducible across "
    "engines, no RNG state). Materializes (doc_id, lang, copy_id) rows "
    "via an explode over a per-row sequence — map-side expansion, the "
    "only shuffle is the per-lang count + rank window; at 100 TB the "
    "copy factor is bounded by the class imbalance, not data size",
)
def class_balance_oversample(spark, sf):
    from pyspark.sql import Window

    docs = load_table(spark, sf, "documents")
    n = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_lang"))
    tgt = n.agg(F.max("n_lang").cast("long").alias("target"))
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = (
        docs.select("doc_id", "lang")
        .join(n, "lang")
        .crossJoin(F.broadcast(tgt))
        .withColumn("rk", F.row_number().over(w).cast("long"))
    )
    copies = ranked.select(
        "doc_id",
        "lang",
        (
            F.expr("target div n_lang")
            + F.when(F.col("rk") <= F.col("target") % F.col("n_lang"), 1)
            .otherwise(0)
        ).cast("long").alias("n_copies"),
    )
    return copies.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(1).cast("long"), F.col("n_copies")))
        .alias("copy_id"),
    )
