"""Behavioral mining and retrieval-fusion queries (round-4 continuation).

Time-bounded funnels, step-indexed flow transitions (Sankey input),
k-fold split balance, reciprocal-rank fusion of lexical+vector retrieval,
and token co-occurrence association ratios — the second-order analytics a
product/ML team runs on top of the base event & corpus surfaces.

Scale rules as elsewhere: per-user windows (no global sorts on facts),
single-key shuffles for user-scoped joins, broadcast-sized vocab/query
sides, integer-exact counts with one double division at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import load_table
from ..functions import tokens as _tokens
from ..operators import ir as IR
from ..operators import similarity as S
from . import register
from .corpus import (_BM25_DF, _BM25_TERMS, _BM25_TF, _bm25_contrib,
                     _cosine_sql, TOKS)

EV_MS = "(epoch_ns(ts) // 1000000)"
HOUR_MS = 3_600_000
DAY_MS = 86_400_000


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


@register(
    "funnel_time_bounded",
    oracle=f"""
    WITH v AS (SELECT user_id, MIN({EV_MS}) AS t_view
               FROM events WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN({EV_MS}) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click'
            AND {EV_MS} > v.t_view AND {EV_MS} <= v.t_view + {HOUR_MS}
          GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN({EV_MS}) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase'
            AND {EV_MS} > c.t_click AND {EV_MS} <= c.t_click + {DAY_MS}
          GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_click_1h,
           (SELECT COUNT(*) FROM p) AS n_purchase_24h
    """,
    doc="Time-bounded funnel: click within 1h of FIRST view, purchase "
    "within 24h of that click — the windowed variant of "
    "funnel_conversion (which only requires ordering). Three keyed MIN "
    "aggregates chained by user_id equi-joins — one shuffle key "
    "throughout, stage populations shrink monotonically so each join's "
    "build side is smaller than the last",
)
def funnel_time_bounded(spark, sf):
    ev = _t(spark, sf, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts_ms") > F.col("t_view"))
            & (F.col("ts_ms") <= F.col("t_view") + HOUR_MS)
        )
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts_ms") > F.col("t_click"))
            & (F.col("ts_ms") <= F.col("t_click") + DAY_MS)
        )
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("t_purchase"))
    )
    # explicit broadcast: plan shape (BroadcastNestedLoop over 1-row
    # sides) must not depend on AQE runtime inference
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(F.broadcast(c.agg(F.count(F.lit(1)).alias("n_click_1h"))))
        .crossJoin(F.broadcast(p.agg(F.count(F.lit(1)).alias("n_purchase_24h"))))
    )


@register(
    "step_transitions",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY {EV_MS}, event_id) AS rn
      FROM events),
    j AS (SELECT a.rn AS step, a.event_type AS from_type,
                 b.event_type AS to_type
          FROM r a JOIN r b ON a.user_id = b.user_id AND b.rn = a.rn + 1
          WHERE a.rn <= 4)
    SELECT step, from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM j GROUP BY step, from_type, to_type
    """,
    doc="Step-indexed flow transitions (the Sankey-diagram input): "
    "step k's (from, to) counts over each user's first five events — "
    "markov_transitions aggregates over ALL positions, this keeps the "
    "position axis. LEAD window per user (no self-join on the Spark "
    "side; the oracle's self-join form is the cross-engine-stable "
    "equivalent), then a keyed count over the small (step x type x type) "
    "space",
)
def step_transitions(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    r = ev.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    j = r.filter((F.col("rn") <= 4) & F.col("to_type").isNotNull())
    return j.groupBy(
        F.col("rn").alias("step"),
        F.col("event_type").alias("from_type"),
        "to_type",
    ).agg(F.count(F.lit(1)).alias("n"))


@register(
    "kfold_balance_audit",
    oracle=f"""
    WITH a AS (SELECT doc_id, lang,
                      CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                           AS BIGINT) % 5 AS INTEGER) AS fold,
                      CAST(len({TOKS}) AS BIGINT) AS n_tokens
               FROM documents)
    SELECT lang, fold,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM a GROUP BY lang, fold
    """,
    doc="5-fold cross-validation balance audit: folds assigned by the "
    "corpus' shared gate hash (sampling._hash_bucket mod 5 — growth-"
    "stable, no RNG, agrees with every split/sample query), audited as "
    "per-(lang, fold) doc and token counts. One narrow expression + one "
    "keyed aggregate; the audit output is vocab-sized, not corpus-sized",
)
def kfold_balance_audit(spark, sf):
    from ..operators.sampling import _hash_bucket

    docs = _t(spark, sf, "documents")
    a = docs.select(
        "lang",
        _hash_bucket(F.col("doc_id"), 5).cast("int").alias("fold"),
        F.size(_tokens("text")).cast("long").alias("n_tokens"),
    )
    return a.groupBy("lang", "fold").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


_BM25_EXPR = " + ".join(_bm25_contrib(i, t) for i, t in enumerate(_BM25_TERMS))
_RRF_COS = _cosine_sql("e.embedding", "q.qv")
RRF_K = 60


@register(
    "rrf_fusion",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {TOKS} AS t FROM documents),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     CAST(SUM(len(t)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl,
                     {", ".join(f"{_BM25_DF[t]} AS df{i}" for i, t in enumerate(_BM25_TERMS))}
              FROM toks),
    scored AS (SELECT doc_id, CAST(len(t) AS DOUBLE) AS dl,
                      {", ".join(f"{_BM25_TF[t]} AS tf{i}" for i, t in enumerate(_BM25_TERMS))}
               FROM toks),
    bm AS (SELECT doc_id,
                  CAST(ROW_NUMBER() OVER (ORDER BY {_BM25_EXPR} DESC, doc_id)
                       AS BIGINT) AS bm_rank
           FROM scored, stats WHERE tf0 + tf1 + tf2 > 0
           QUALIFY bm_rank <= 20),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cs AS (SELECT e.vec_id AS doc_id,
                  CAST(ROW_NUMBER() OVER (ORDER BY {_RRF_COS} DESC, e.vec_id)
                       AS BIGINT) AS cos_rank
           FROM embeddings e, q WHERE e.vec_id <> 0
           QUALIFY cos_rank <= 20),
    fused AS (
      SELECT COALESCE(bm.doc_id, cs.doc_id) AS doc_id,
             bm.bm_rank, cs.cos_rank,
             COALESCE(1.0 / ({RRF_K} + bm.bm_rank), 0.0)
               + COALESCE(1.0 / ({RRF_K} + cs.cos_rank), 0.0) AS rrf
      FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.doc_id)
    SELECT doc_id, bm_rank, cos_rank, rrf,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS INTEGER)
             AS rk
    FROM fused QUALIFY rk <= 10
    """,
    doc="Reciprocal-rank fusion of the lexical and vector retrieval legs "
    "(the rank-space complement of hybrid_search_rerank's score-space "
    "cascade): BM25 top-20 and cosine top-20 ranked independently, "
    "fused by sum(1/(60+rank)) over a full-outer join of the two "
    "LIMIT-bounded lists. Fusion cost is O(k), corpus touched once per "
    "leg; 1/(60+r) is a single correctly-rounded division so the fused "
    "scores are bit-identical cross-engine",
)
def rrf_fusion(spark, sf):
    docs = _t(spark, sf, "documents")
    emb = _t(spark, sf, "embeddings")
    wb = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    bm = (
        IR.bm25_scores(docs, list(_BM25_TERMS))
        .withColumn("bm_rank", F.row_number().over(wb).cast("long"))
        .filter(F.col("bm_rank") <= 20)
        .select("doc_id", "bm_rank")
    )
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("_qv"))
    wc = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    cs = (
        emb.filter(F.col("vec_id") != 0)
        .select(F.col("vec_id").alias("doc_id"), "embedding")
        .crossJoin(F.broadcast(q))
        .withColumn("cosine", S.cosine_sim(F.col("embedding"), F.col("_qv")))
        .withColumn("cos_rank", F.row_number().over(wc).cast("long"))
        .filter(F.col("cos_rank") <= 20)
        .select("doc_id", "cos_rank")
    )
    fused = bm.join(cs, "doc_id", "full_outer").select(
        "doc_id",
        "bm_rank",
        "cos_rank",
        (
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("bm_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("cos_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    rk = F.row_number().over(Window.orderBy(F.desc("rrf"), F.asc("doc_id")))
    return fused.select(
        "doc_id", "bm_rank", "cos_rank", "rrf", rk.cast("int").alias("rk")
    ).filter(F.col("rk") <= 10)


PMI_VOCAB = 50
PMI_TOPK = 50


@register(
    "token_pmi",
    oracle=f"""
    WITH dt0 AS (SELECT DISTINCT doc_id, unnest({TOKS}) AS tok
                 FROM documents),
    vocab AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
              FROM dt0 GROUP BY tok
              QUALIFY ROW_NUMBER() OVER (ORDER BY df DESC, tok) <= {PMI_VOCAB}),
    dt AS (SELECT dt0.doc_id, dt0.tok, v.df
           FROM dt0 JOIN vocab v ON dt0.tok = v.tok),
    pairs AS (SELECT a.tok AS tok_a, b.tok AS tok_b,
                     CAST(COUNT(*) AS BIGINT) AS n_ab,
                     MAX(a.df) AS df_a, MAX(b.df) AS df_b
              FROM dt a JOIN dt b
                ON a.doc_id = b.doc_id AND a.tok < b.tok
              GROUP BY a.tok, b.tok),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
          FROM documents)
    SELECT tok_a, tok_b, n_ab,
           CAST(n.n_docs * n_ab AS DOUBLE) / CAST(df_a * df_b AS DOUBLE)
             AS assoc_ratio,
           CAST(ROW_NUMBER() OVER (ORDER BY n_ab DESC, tok_a, tok_b)
                AS INTEGER) AS rk
    FROM pairs, n QUALIFY rk <= {PMI_TOPK}
    """,
    doc="Token association ratios (exponentiated PMI: P(a,b)/(P(a)P(b)) "
    "over doc co-occurrence) for the top-50 vocab — collocation / "
    "related-term mining. The quadratic term is bounded by "
    "vocab-capping: per-doc candidate pairs <= C(50,2), independent of "
    "doc length or corpus size; counts are exact integers cross-"
    "multiplied so no log and no float drift. Vocab is broadcast",
)
def token_pmi(spark, sf):
    from ..functions import ensure_min_parallelism

    docs = _t(spark, sf, "documents")
    # the tokenize+explode map stage otherwise runs on the single
    # unsplittable row group (guide §2.5; see ensure_min_parallelism)
    dt0 = ensure_min_parallelism(docs).select(
        "doc_id", F.explode(F.array_distinct(_tokens("text"))).alias("tok")
    )
    wv = Window.orderBy(F.desc("df"), F.asc("tok"))
    vocab = (
        dt0.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
        .withColumn("_r", F.row_number().over(wv))
        .filter(F.col("_r") <= PMI_VOCAB)
        .drop("_r")
    )
    dt = dt0.join(F.broadcast(vocab), "tok")
    a = dt.select("doc_id", F.col("tok").alias("tok_a"), F.col("df").alias("df_a"))
    b = dt.select("doc_id", F.col("tok").alias("tok_b"), F.col("df").alias("df_b"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ab"),
            F.max("df_a").alias("df_a"),
            F.max("df_b").alias("df_b"),
        )
    )
    n_docs = docs.select(F.countDistinct("doc_id").alias("n_docs"))
    rk = F.row_number().over(Window.orderBy(F.desc("n_ab"), "tok_a", "tok_b"))
    return (
        pairs.crossJoin(F.broadcast(n_docs))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            (
                (F.col("n_docs") * F.col("n_ab")).cast("double")
                / (F.col("df_a") * F.col("df_b")).cast("double")
            ).alias("assoc_ratio"),
            rk.cast("int").alias("rk"),
        )
        .filter(F.col("rk") <= PMI_TOPK)
    )


@register(
    "pareto_abc_customers",
    oracle="""
    WITH c AS (SELECT o_custkey,
                      SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev
               FROM orders GROUP BY o_custkey),
    t AS (SELECT SUM(rev) AS total FROM c),
    r AS (SELECT o_custkey, rev,
                 SUM(rev) OVER (ORDER BY rev DESC, o_custkey
                                ROWS UNBOUNDED PRECEDING) AS cum
          FROM c)
    SELECT o_custkey,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(cum AS DOUBLE) / CAST(t.total AS DOUBLE) AS cum_share,
           CASE WHEN CAST(cum AS DOUBLE) / CAST(t.total AS DOUBLE) <= 0.5
                  THEN 'A'
                WHEN CAST(cum AS DOUBLE) / CAST(t.total AS DOUBLE) <= 0.8
                  THEN 'B'
                ELSE 'C' END AS abc_class
    FROM r, t
    """,
    doc="Pareto / ABC revenue concentration: customers ranked by "
    "decimal-exact revenue, running share of total (cumulative DECIMAL "
    "sum — the running total is exact, only the final share divides "
    "doubles), classed A (top 50% of revenue) / B (to 80%) / C. The "
    "concentration curve behind per-source caps and skew decisions; the "
    "global window runs over the AGGREGATED customer table (orders "
    "collapsed first), not raw facts",
)
def pareto_abc_customers(spark, sf):
    orders = _t(spark, sf, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev")
    )
    t = c.agg(F.sum("rev").alias("total"))
    w = (
        Window.orderBy(F.col("rev").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    r = c.withColumn("cum", F.sum("rev").over(w)).crossJoin(F.broadcast(t))
    share = F.col("cum").cast("double") / F.col("total").cast("double")
    abc = (
        F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C")
    )
    return r.select(
        "o_custkey",
        F.col("rev").cast("double").alias("revenue"),
        share.alias("cum_share"),
        abc.alias("abc_class"),
    )


@register(
    "interarrival_percentiles",
    oracle=f"""
    WITH g AS (
      SELECT event_type,
             {EV_MS} - LAG({EV_MS}) OVER (PARTITION BY user_id, event_type
                                          ORDER BY {EV_MS}, event_id) AS gap
      FROM events)
    SELECT event_type,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           quantile_cont(gap, 0.5) AS p50_ms,
           quantile_cont(gap, 0.9) AS p90_ms,
           quantile_cont(gap, 0.99) AS p99_ms,
           MAX(gap) AS max_ms
    FROM g WHERE gap IS NOT NULL GROUP BY event_type
    """,
    doc="Inter-arrival-time percentiles per event type (burst/staleness "
    "monitoring: p99 inter-arrival jumping is the on-call signal before "
    "a watermark goes stale): per-(user, type) LAG gaps — window "
    "partitioned, no global sort — then the exact interpolated "
    "percentile aggregate (same cross-engine contract as "
    "percentiles_by_group). Integer-ms gaps, so interpolation inputs are "
    "exact",
)
def interarrival_percentiles(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts_ms", "event_id")
    g = ev.select(
        "event_type", (F.col("ts_ms") - F.lag("ts_ms").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return g.groupBy("event_type").agg(
        F.count("gap").alias("n_gaps"),
        F.expr("percentile(gap, 0.5)").alias("p50_ms"),
        F.expr("percentile(gap, 0.9)").alias("p90_ms"),
        F.expr("percentile(gap, 0.99)").alias("p99_ms"),
        F.max("gap").alias("max_ms"),
    )


from ..operators.graph import DAMPING_DEN, DAMPING_NUM, RANK_SCALE
from .corpus import _MH_CTES, _MH_FINAL

_PR_BASE = (DAMPING_DEN - DAMPING_NUM) * RANK_SCALE // DAMPING_DEN


def _pagerank_oracle(iterations: int = 10) -> str:
    """Unrolled exact-integer PageRank in DuckDB SQL: since every update
    is BIGINT floor arithmetic, N chained CTEs reproduce the Spark loop
    bit-for-bit (aggregates are not allowed in a recursive CTE member,
    so the fixed iteration count is unrolled instead)."""
    ctes = [
        f"r0 AS (SELECT src AS doc_id, CAST({RANK_SCALE} AS BIGINT) AS rank_q"
        " FROM deg)"
    ]
    for i in range(1, iterations + 1):
        ctes.append(
            f"r{i} AS (SELECT e.dst AS doc_id, "
            f"CAST({_PR_BASE} + ({DAMPING_NUM} * "
            f"SUM(r{i-1}.rank_q // d.out_deg)) // {DAMPING_DEN} AS BIGINT)"
            f" AS rank_q "
            f"FROM edges e JOIN r{i-1} ON e.src = r{i-1}.doc_id "
            f"JOIN deg d ON e.src = d.src GROUP BY e.dst)"
        )
    return f"""
    WITH {_MH_CTES.strip().rstrip(',')},
    pairs AS MATERIALIZED ({_MH_FINAL}),
    edges AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION
              SELECT doc_b AS src, doc_a AS dst FROM pairs),
    deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg
            FROM edges GROUP BY src),
    {", ".join(ctes)}
    SELECT doc_id, rank_q,
           CAST(rank_q AS DOUBLE) / {float(RANK_SCALE)} AS rank
    FROM r{iterations}
    """


@register(
    "doc_pagerank",
    oracle=_pagerank_oracle(10),
    doc="Deterministic fixed-point PageRank over the MinHash-LSH near-dup "
    "graph (operators/graph.py): integer micro-unit ranks, floor-division "
    "contributions, rational damping 85/100 — bit-identical under any "
    "partitioning, so even this ITERATIVE algorithm carries a full hash "
    "oracle (10 unrolled exact-integer CTE iterations), unlike float "
    "PageRanks which drift by summation order. Two shuffles per round, "
    "driver holds only the loop counter",
)
def doc_pagerank(spark, sf):
    from ..operators import dedup as D
    from ..operators.graph import pagerank
    from .corpus import BANDS, NUM_PERM

    docs = _t(spark, sf, "documents")
    pairs = D.minhash_near_duplicates(
        docs, k=3, num_perm=NUM_PERM, bands=BANDS, threshold=0.5
    )
    return pagerank(pairs, iterations=10)


from .corpus import _SRP_BANDS, _SRP_BITS, _SRP_SIG

_LP_ROUNDS = 3


def _label_prop_oracle(rounds: int = _LP_ROUNDS) -> str:
    cos = _cosine_sql("va.embedding", "vb.embedding")
    ctes = [
        "l0 AS (SELECT vec_id, CASE WHEN vec_id % 4 = 0 THEN label END AS lab"
        " FROM embeddings)"
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"v{i} AS (SELECT e.dst AS vec_id, l.lab, COUNT(*) AS n "
            f"FROM edges e JOIN l{i-1} l ON e.src = l.vec_id "
            f"WHERE l.lab IS NOT NULL GROUP BY e.dst, l.lab), "
            f"w{i} AS (SELECT vec_id, lab FROM v{i} "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"ORDER BY n DESC, lab) = 1), "
            f"l{i} AS (SELECT l.vec_id, COALESCE(l.lab, w.lab) AS lab "
            f"FROM l{i-1} l LEFT JOIN w{i} w ON l.vec_id = w.vec_id)"
        )
    return f"""
    WITH v AS (SELECT vec_id, embedding FROM embeddings),
    sig AS MATERIALIZED (SELECT vec_id, {_SRP_SIG} AS sig FROM v),
    bands AS (SELECT vec_id, b AS band,
                     substr(sig, b * {_SRP_BITS} + 1, {_SRP_BITS}) AS bucket
              FROM sig, generate_series(0, {_SRP_BANDS - 1}) AS t(b)),
    cand AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bucket = b.bucket
              AND a.vec_id < b.vec_id),
    pairs AS MATERIALIZED (
        SELECT c.doc_a, c.doc_b FROM cand c
        JOIN v va ON va.vec_id = c.doc_a
        JOIN v vb ON vb.vec_id = c.doc_b
        WHERE {cos} >= 0.35),
    edges AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs),
    {", ".join(ctes)}
    SELECT vec_id, lab AS label, vec_id % 4 = 0 AS is_seed FROM l{rounds}
    """


@register(
    "label_propagation_srp",
    oracle=_label_prop_oracle(),
    doc="Semi-supervised label spreading (operators/graph.py:"
    "label_propagation): 1-in-4 seed labels expand through the SRP "
    "similarity graph — each round, unlabeled nodes adopt the exact-"
    "integer majority label of labeled neighbors (ties -> smallest "
    "label), assigned labels frozen, so the ITERATIVE algorithm is a "
    "pure function of the graph and carries a full hash oracle (3 "
    "unrolled rounds, MATERIALIZED graph CTEs). The weak-supervision "
    "expansion primitive for classifier training sets",
)
def label_propagation_srp(spark, sf):
    from ..operators import similarity as S2
    from ..operators.graph import label_propagation

    emb = _t(spark, sf, "embeddings")
    pairs = S2.srp_near_duplicates(
        emb, threshold=0.35, bands=_SRP_BANDS, bits_per_band=_SRP_BITS
    ).select("doc_a", "doc_b")
    seeds = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 4 == 0, F.col("label")).alias("label"),
    )
    out = label_propagation(pairs, seeds, rounds=_LP_ROUNDS)
    return out.select(
        "vec_id", "label", (F.col("vec_id") % 4 == 0).alias("is_seed")
    )


def _graph_suite_oracle(pr_iters: int = 10, lp_rounds: int = _LP_ROUNDS) -> str:
    """One SRP pair graph, three consumers: the unrolled exact-integer
    PageRank, the unrolled label propagation, and the recursive
    connected-components reach — all reading the same MATERIALIZED
    edges CTE, mirroring the Spark side's single localCheckpoint."""
    cos = _cosine_sql("va.embedding", "vb.embedding")
    pr = [
        f"r0 AS (SELECT src AS vec_id, CAST({RANK_SCALE} AS BIGINT) AS rank_q"
        " FROM deg)"
    ]
    for i in range(1, pr_iters + 1):
        pr.append(
            f"r{i} AS (SELECT e.dst AS vec_id, "
            f"CAST({_PR_BASE} + ({DAMPING_NUM} * "
            f"SUM(r{i-1}.rank_q // d.out_deg)) // {DAMPING_DEN} AS BIGINT)"
            f" AS rank_q "
            f"FROM edges e JOIN r{i-1} ON e.src = r{i-1}.vec_id "
            f"JOIN deg d ON e.src = d.src GROUP BY e.dst)"
        )
    lp = [
        "l0 AS (SELECT vec_id, CASE WHEN vec_id % 4 = 0 THEN label END AS lab"
        " FROM embeddings)"
    ]
    for i in range(1, lp_rounds + 1):
        lp.append(
            f"v{i} AS (SELECT e.dst AS vec_id, l.lab, COUNT(*) AS n "
            f"FROM edges e JOIN l{i-1} l ON e.src = l.vec_id "
            f"WHERE l.lab IS NOT NULL GROUP BY e.dst, l.lab), "
            f"w{i} AS (SELECT vec_id, lab FROM v{i} "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id "
            f"ORDER BY n DESC, lab) = 1), "
            f"l{i} AS (SELECT l.vec_id, COALESCE(l.lab, w.lab) AS lab "
            f"FROM l{i-1} l LEFT JOIN w{i} w ON l.vec_id = w.vec_id)"
        )
    return f"""
    WITH RECURSIVE v AS (SELECT vec_id, embedding FROM embeddings),
    sig AS MATERIALIZED (SELECT vec_id, {_SRP_SIG} AS sig FROM v),
    bands AS (SELECT vec_id, b AS band,
                     substr(sig, b * {_SRP_BITS} + 1, {_SRP_BITS}) AS bucket
              FROM sig, generate_series(0, {_SRP_BANDS - 1}) AS t(b)),
    cand AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bucket = b.bucket
              AND a.vec_id < b.vec_id),
    pairs AS MATERIALIZED (
        SELECT c.doc_a, c.doc_b FROM cand c
        JOIN v va ON va.vec_id = c.doc_a
        JOIN v vb ON vb.vec_id = c.doc_b
        WHERE {cos} >= 0.35),
    edges AS MATERIALIZED (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b AS src, doc_a AS dst FROM pairs),
    deg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg
            FROM edges GROUP BY src),
    {", ".join(pr)},
    {", ".join(lp)},
    reach AS (SELECT src, dst FROM edges
              UNION
              SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
    comp AS (SELECT src AS vec_id, LEAST(src, MIN(dst)) AS component
             FROM reach GROUP BY src)
    SELECT emb.vec_id,
           r.rank_q,
           CAST(r.rank_q AS DOUBLE) / {float(RANK_SCALE)} AS rank,
           l.lab AS label,
           emb.vec_id % 4 = 0 AS is_seed,
           COALESCE(c.component, emb.vec_id) AS component,
           (COALESCE(c.component, emb.vec_id) = emb.vec_id) AS is_kept
    FROM embeddings emb
    LEFT JOIN r{pr_iters} r ON r.vec_id = emb.vec_id
    LEFT JOIN l{lp_rounds} l ON l.vec_id = emb.vec_id
    LEFT JOIN comp c ON c.vec_id = emb.vec_id
    """


@register(
    "graph_suite",
    oracle=_graph_suite_oracle(),
    doc="Composed graph analytics on ONE materialized SRP similarity "
    "graph (VERDICT r04: doc_pagerank / label_propagation_srp / "
    "semantic_dedup each re-derived their pair graph — in a real "
    "pipeline the graph is built once): a single "
    "srp_near_duplicates pass is localCheckpoint'ed and feeds "
    "PageRank (10 exact-integer rounds), label propagation (3 "
    "rounds), and connected components, joined to one row per "
    "vector. Still fully hash-oracled — every consumer is "
    "deterministic fixed-point arithmetic over the same edge list",
)
def graph_suite(spark, sf):
    from ..operators import dedup as D2
    from ..operators import similarity as S2
    from ..operators.graph import label_propagation, pagerank

    emb = _t(spark, sf, "embeddings")
    pairs = (
        S2.srp_near_duplicates(
            emb, threshold=0.35, bands=_SRP_BANDS, bits_per_band=_SRP_BITS
        )
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)  # the ONE graph all consumers share
    )
    ranks = pagerank(pairs, iterations=10).select(
        F.col("doc_id").alias("vec_id"), "rank_q", "rank"
    )
    seeds = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 4 == 0, F.col("label")).alias("label"),
    )
    labels = label_propagation(pairs, seeds, rounds=_LP_ROUNDS)
    comps = (
        D2.connected_components(pairs)
        .select(F.col("doc_id").alias("vec_id"), "component")
    )
    return (
        emb.select("vec_id")
        .join(ranks, "vec_id", "left")
        .join(labels, "vec_id", "left")
        .join(comps, "vec_id", "left")
        .select(
            "vec_id",
            "rank_q",
            "rank",
            "label",
            (F.col("vec_id") % 4 == 0).alias("is_seed"),
            F.coalesce("component", "vec_id").alias("component"),
            (F.coalesce("component", "vec_id") == F.col("vec_id")).alias(
                "is_kept"
            ),
        )
    )


@register(
    "rfm_segmentation",
    oracle="""
    WITH m AS (SELECT o_custkey,
                      MAX(o_orderdate) AS last_order,
                      CAST(COUNT(*) AS BIGINT) AS frequency,
                      SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS monetary
               FROM orders GROUP BY o_custkey),
    q AS (SELECT o_custkey, frequency,
                 CAST(monetary AS DOUBLE) AS monetary,
                 CAST(NTILE(5) OVER (ORDER BY last_order, o_custkey)
                   AS INTEGER) AS r_score,
                 CAST(NTILE(5) OVER (ORDER BY frequency, o_custkey)
                   AS INTEGER) AS f_score,
                 CAST(NTILE(5) OVER (ORDER BY monetary, o_custkey)
                   AS INTEGER) AS m_score
          FROM m)
    SELECT o_custkey, frequency, monetary, r_score, f_score, m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS rfm
    FROM q
    """,
    doc="RFM customer segmentation: recency (last order date), frequency "
    "(order count), monetary (decimal-exact revenue) quintiled with "
    "NTILE over fully tie-broken orders (metric, custkey) — identical "
    "bucket boundaries cross-engine because NTILE is rank arithmetic, "
    "not value arithmetic. The windows run over the aggregated customer "
    "table; the classic marketing segmentation as three windows + one "
    "select",
)
def rfm_segmentation(spark, sf):
    orders = _t(spark, sf, "orders")
    m = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("mon"),
    )
    r = F.ntile(5).over(Window.orderBy("last_order", "o_custkey"))
    f = F.ntile(5).over(Window.orderBy("frequency", "o_custkey"))
    mo = F.ntile(5).over(Window.orderBy(F.col("mon").cast("double"), "o_custkey"))
    q = m.select(
        "o_custkey",
        "frequency",
        F.col("mon").cast("double").alias("monetary"),
        r.cast("int").alias("r_score"),
        f.cast("int").alias("f_score"),
        mo.cast("int").alias("m_score"),
    )
    return q.withColumn(
        "rfm",
        (F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score"))
        .cast("int"),
    )


@register(
    "market_basket_pairs",
    oracle="""
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    freq AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM items
             GROUP BY l_partkey),
    n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders
          FROM items),
    pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
                     CAST(COUNT(*) AS BIGINT) AS n_ab
              FROM items a JOIN items b
                ON a.l_orderkey = b.l_orderkey
               AND a.l_partkey < b.l_partkey
              GROUP BY part_a, part_b)
    SELECT p.part_a, p.part_b, p.n_ab,
           CAST(n.n_orders * p.n_ab AS DOUBLE)
             / CAST(fa.c * fb.c AS DOUBLE) AS lift,
           CAST(ROW_NUMBER() OVER (ORDER BY p.n_ab DESC, p.part_a, p.part_b)
             AS INTEGER) AS rk
    FROM pairs p
    JOIN freq fa ON fa.l_partkey = p.part_a
    JOIN freq fb ON fb.l_partkey = p.part_b, n
    QUALIFY rk <= 50
    """,
    doc="Market-basket affinity: top-50 co-purchased part pairs with lift "
    "(n_orders*c_ab/(c_a*c_b) — exact-integer cross-multiplication, the "
    "retail twin of token_pmi). Distinct (order, part) first, pair "
    "generation bounded by per-order item count (~4 lines/order, never "
    "catalog^2), one keyed count; fully tie-broken top-k",
)
def market_basket_pairs(spark, sf):
    li = _t(spark, sf, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    freq = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    n = items.select(F.countDistinct("l_orderkey").alias("n_orders"))
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    fa = freq.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    fb = freq.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    rk = F.row_number().over(
        Window.orderBy(F.col("n_ab").desc(), "part_a", "part_b")
    )
    return (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b", "n_ab",
            (
                (F.col("n_orders") * F.col("n_ab")).cast("double")
                / (F.col("ca") * F.col("cb")).cast("double")
            ).alias("lift"),
            rk.cast("int").alias("rk"),
        )
        .filter(F.col("rk") <= 50)
    )


@register(
    "readability_scores",
    oracle=r"""
    WITH c AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\s+'),
                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(GREATEST(len(list_filter(string_split_regex(text, '[.!?]+'),
                  x -> trim(x) <> '')), 1) AS BIGINT) AS n_sentences,
             CAST(GREATEST(len(list_filter(
                  string_split_regex(lower(text), '[^aeiou]+'),
                  x -> x <> '')), 1) AS BIGINT) AS n_syllables
      FROM documents)
    SELECT doc_id, n_words, n_sentences, n_syllables,
           206.835
             - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             AS flesch
    FROM c WHERE n_words > 0
    """,
    doc="Flesch reading-ease per document from exact integer counts "
    "(whitespace words, [.!?] sentences, vowel-group syllable proxy — "
    "the standard heuristic), combined in a fixed-order double "
    "expression so both engines agree bit-for-bit. The readability leg "
    "of quality filtering, complementing text_quality_scores' "
    "length/punctuation signals; map-only, zero shuffles",
)
def readability_scores(spark, sf):
    docs = _t(spark, sf, "documents")
    def nz(col):
        return F.greatest(col, F.lit(1)).cast("long")
    words = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != ""))
    sentences = F.size(
        F.filter(F.split(F.col("text"), r"[.!?]+"), lambda x: F.trim(x) != "")
    )
    syllables = F.size(
        F.filter(F.split(F.lower(F.col("text")), r"[^aeiou]+"), lambda x: x != "")
    )
    c = docs.select(
        "doc_id",
        words.cast("long").alias("n_words"),
        nz(sentences).alias("n_sentences"),
        nz(syllables).alias("n_syllables"),
    ).filter(F.col("n_words") > 0)
    return c.withColumn(
        "flesch",
        F.lit(206.835)
        - F.lit(1.015)
        * (F.col("n_words").cast("double") / F.col("n_sentences").cast("double"))
        - F.lit(84.6)
        * (F.col("n_syllables").cast("double") / F.col("n_words").cast("double")),
    )


@register(
    "srp_pair_label_purity",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding FROM embeddings),
    sig AS MATERIALIZED (SELECT vec_id, {_SRP_SIG} AS sig FROM v),
    bands AS (SELECT vec_id, b AS band,
                     substr(sig, b * {_SRP_BITS} + 1, {_SRP_BITS}) AS bucket
              FROM sig, generate_series(0, {_SRP_BANDS - 1}) AS t(b)),
    cand AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bucket = b.bucket
              AND a.vec_id < b.vec_id),
    pairs AS (SELECT c.doc_a, c.doc_b FROM cand c
              JOIN v va ON va.vec_id = c.doc_a
              JOIN v vb ON vb.vec_id = c.doc_b
              WHERE {{cos}} >= 0.35),
    lab AS (SELECT p.doc_a, p.doc_b,
                   la.label AS label_a, lb.label AS label_b
            FROM pairs p
            JOIN embeddings la ON la.vec_id = p.doc_a
            JOIN embeddings lb ON lb.vec_id = p.doc_b)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN label_a = label_b THEN 1 ELSE 0 END)
             AS BIGINT) AS n_same_label,
           CAST(SUM(CASE WHEN label_a = label_b THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS purity
    FROM lab
    """.format(cos=_cosine_sql("va.embedding", "vb.embedding")),
    doc="Similarity-graph quality metric: fraction of SRP near-dup pairs "
    "whose endpoints share a ground-truth label (pair purity) — the "
    "evaluation that justifies using the graph for label propagation "
    "and semantic dedup. One scalar row; reuses the hash-checked SRP "
    "candidate pipeline, so the metric itself is hash-checked too",
)
def srp_pair_label_purity(spark, sf):
    from ..operators import similarity as S2

    emb = _t(spark, sf, "embeddings")
    pairs = S2.srp_near_duplicates(
        emb, threshold=0.35, bands=_SRP_BANDS, bits_per_band=_SRP_BITS
    )
    la = emb.select(F.col("vec_id").alias("doc_a"), F.col("label").alias("label_a"))
    lb = emb.select(F.col("vec_id").alias("doc_b"), F.col("label").alias("label_b"))
    j = pairs.join(la, "doc_a").join(lb, "doc_b")
    same = F.sum(F.when(F.col("label_a") == F.col("label_b"), 1).otherwise(0))
    return j.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        same.cast("long").alias("n_same_label"),
        (same.cast("double") / F.count(F.lit(1)).cast("double")).alias("purity"),
    )


SPAN_LEN = 3          # fixed corruption span length (T5 mean span)
SPAN_GATE_MOD = 20    # ~5% span starts -> ~15% tokens masked


@register(
    "span_corruption_masking",
    oracle=rf"""
    WITH toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
                         x -> x <> '') AS t
                  FROM documents),
    pos AS (SELECT doc_id, i - 1 AS j, t[i] AS tok, len(t) AS n
            FROM toks, UNNEST(generate_series(1, len(t))) AS u(i)),
    g AS (SELECT doc_id, j, tok,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                      CAST(j AS VARCHAR)), 1, 8) AS BIGINT)
                   % {SPAN_GATE_MOD} = 0 AS g0,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                      CAST(j - 1 AS VARCHAR)), 1, 8) AS BIGINT)
                   % {SPAN_GATE_MOD} = 0 AND j >= 1 AS g1,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                      CAST(j - 2 AS VARCHAR)), 1, 8) AS BIGINT)
                   % {SPAN_GATE_MOD} = 0 AND j >= 2 AS g2
          FROM pos),
    cov AS (SELECT doc_id, j, tok,
                   (g0 OR g1 OR g2) AS covered,
                   CASE WHEN (g0 OR g1 OR g2)
                        AND NOT COALESCE(LAG(g0 OR g1 OR g2)
                          OVER (PARTITION BY doc_id ORDER BY j), FALSE)
                        THEN 1 ELSE 0 END AS is_start
            FROM g),
    sid AS (SELECT doc_id, j, tok, covered, is_start,
                   SUM(is_start) OVER (PARTITION BY doc_id ORDER BY j
                                       ROWS UNBOUNDED PRECEDING) AS span_no
            FROM cov),
    inp AS (SELECT doc_id,
                   string_agg(CASE WHEN NOT covered THEN tok
                                   ELSE '<extra_id_' || CAST(span_no - 1
                                        AS VARCHAR) || '>' END,
                              ' ' ORDER BY j) AS input_text
            FROM sid WHERE NOT covered OR is_start = 1
            GROUP BY doc_id),
    tgt AS (SELECT doc_id,
                   string_agg(CASE WHEN is_start = 1
                                   THEN '<extra_id_' || CAST(span_no - 1
                                        AS VARCHAR) || '> ' || tok
                                   ELSE tok END,
                              ' ' ORDER BY j) AS target_text
            FROM sid WHERE covered
            GROUP BY doc_id),
    spans AS (SELECT doc_id, CAST(MAX(span_no) AS BIGINT) AS n_spans
              FROM sid GROUP BY doc_id)
    SELECT s.doc_id, i.input_text, t.target_text, s.n_spans
    FROM spans s
    JOIN inp i ON i.doc_id = s.doc_id
    JOIN tgt t ON t.doc_id = s.doc_id
    WHERE s.n_spans > 0
    """,
    doc="T5/UL2-style span-corruption pretraining prep: deterministic "
    "~15% token masking in fixed-length-3 spans (md5 position gates — "
    "growth-stable, no RNG), overlapping spans merged by the islands "
    "pattern, masked spans replaced by <extra_id_k> sentinels in the "
    "input and emitted after their sentinel in the target — the "
    "denoising-objective example builder. Everything is per-(doc, "
    "position) window arithmetic + ordered string_agg, so both engines "
    "produce byte-identical examples; map-side except one partitioned "
    "window",
)
def span_corruption_masking(spark, sf):
    docs = _t(spark, sf, "documents")
    pos = docs.select(
        "doc_id", F.posexplode(_tokens("text")).alias("j", "tok")
    )

    def gate(off):
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        (F.col("j") - off).cast("string"),
                    )
                ),
                1, 8,
            ),
            16, 10,
        ).cast("long")
        g = (h % SPAN_GATE_MOD) == 0
        return g if off == 0 else (g & (F.col("j") >= off))

    w = Window.partitionBy("doc_id").orderBy("j")
    cov = pos.withColumn(
        "covered", gate(0) | gate(1) | gate(2)
    ).withColumn(
        "is_start",
        (
            F.col("covered")
            & ~F.coalesce(F.lag("covered").over(w), F.lit(False))
        ).cast("int"),
    )
    sid = cov.withColumn(
        "span_no",
        F.sum("is_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), (F.col("span_no") - 1).cast("string"), F.lit(">")
    )
    inp_piece = F.when(~F.col("covered"), F.col("tok")).when(
        F.col("is_start") == 1, sentinel
    )
    inp = (
        sid.filter(~F.col("covered") | (F.col("is_start") == 1))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("j", inp_piece.alias("p")))
                    ),
                    lambda x: x["p"],
                ),
            ).alias("input_text")
        )
    )
    tgt_piece = F.when(
        F.col("is_start") == 1, F.concat(sentinel, F.lit(" "), F.col("tok"))
    ).otherwise(F.col("tok"))
    tgt = (
        sid.filter(F.col("covered"))
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("j", tgt_piece.alias("p")))
                    ),
                    lambda x: x["p"],
                ),
            ).alias("target_text")
        )
    )
    spans = sid.groupBy("doc_id").agg(
        F.max("span_no").cast("long").alias("n_spans")
    ).filter(F.col("n_spans") > 0)
    return spans.join(inp, "doc_id").join(tgt, "doc_id").select(
        "doc_id", "input_text", "target_text", "n_spans"
    )


from .corpus import DEDUP_CLUSTERS_ORACLE


@register(
    "dedup_cluster_size_histogram",
    oracle=f"""
    WITH comp AS ({DEDUP_CLUSTERS_ORACLE}),
    sizes AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS cluster_size
              FROM comp GROUP BY component)
    SELECT cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(COUNT(*) * cluster_size AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """,
    doc="Duplicate-cluster size distribution: the dedup health dashboard "
    "number (a fat tail here means boilerplate factories / mirror sites "
    "upstream — the trigger for df-caps and source-level review). Two "
    "keyed counts over the connected-components output; histogram-sized "
    "result",
)
def dedup_cluster_size_histogram(spark, sf):
    from ..operators import dedup as D
    from .corpus import BANDS, NUM_PERM

    docs = _t(spark, sf, "documents")
    pairs = D.minhash_near_duplicates(
        docs, k=3, num_perm=NUM_PERM, bands=BANDS, threshold=0.5
    )
    comp = D.connected_components(pairs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.count(F.lit(1)) * F.col("cluster_size")).cast("long").alias("n_docs"),
    )
