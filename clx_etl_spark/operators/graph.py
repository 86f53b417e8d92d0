"""Graph analytics over derived document/entity graphs: deterministic
fixed-point PageRank.

The engine builds graphs as DataFrame edge lists (near-dup pairs from
dedup.minhash_near_duplicates, semantic-pair graphs from similarity,
citation-ish props links) and already runs connected components over
them (dedup.connected_components). PageRank adds the importance ranking
— which representative to keep from a duplicate cluster, which document
anchors a semantic neighborhood.

Determinism: the textbook float implementation is partition-order
dependent (float sums) AND library-dependent. Here every rank is an
integer in micro-units (RANK_SCALE per node of initial mass) and each
update is

    rank' = floor(0.15 * RANK_SCALE) + floor(85 * SUM(contrib) / 100)
    contrib = rank div out_degree        (integer floor division)

— exact BIGINT arithmetic end-to-end, so any partitioning, any engine,
any summation order produces bit-identical ranks. Floor losses slightly
deflate total mass (bounded by iterations * n_nodes micro-units ~ 1e-3
relative); rankings are unaffected and reproducibility is total — the
same trade the fixed-point LM scores make (operators/lm.py).

Scale shape: per iteration one equi-join (ranks x edges on src) and one
keyed sum — two shuffles, same as a connected-components round; the
driver holds only the iteration counter. Fixed iteration count (no
convergence collect) keeps the job graph static for AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import undirected_edges

RANK_SCALE = 1_000_000_000_000  # 1e12 micro-units of rank mass per node
DAMPING_NUM, DAMPING_DEN = 85, 100  # d = 0.85 as a rational


def pagerank(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iterations: int = 10,
) -> DataFrame:
    """Deterministic PageRank over an undirected pair graph: returns
    (doc_id, rank_q, rank) with rank_q the exact integer fixed-point
    score and rank = rank_q / RANK_SCALE as a convenience double.
    Isolated nodes don't appear in ``pairs`` and thus hold the base
    rank 0.15 by definition; callers union them in if needed."""
    # Run the pair pipeline exactly once BEFORE deriving out-degrees: deg
    # and the deg-join both reference the edge list, so an uncheckpointed
    # tree would execute the expensive pair pipeline's post-shuffle stages
    # twice (ReusedExchange only dedups the shuffles themselves). The
    # repartition+cache on top retains the src partitioning across all
    # rounds — a bare checkpoint scan loses outputPartitioning and r11
    # measured every round re-shuffling the edge list (3 exchanges/round);
    # with the cache only the small rank table moves (2 exchanges/round,
    # and at scale edges >> ranks).
    edges = undirected_edges(pairs, a_col, b_col).localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    edges = edges.join(deg, "src").repartition("src").cache()

    base = (DAMPING_DEN - DAMPING_NUM) * RANK_SCALE // DAMPING_DEN  # 0.15
    # seed from the cached edge list (groupBy over the src partitioning is
    # exchange-free), not from `deg`, whose lineage is the full pair tree
    ranks = edges.groupBy(F.col("src").alias("doc_id")).agg(
        F.first(F.lit(RANK_SCALE)).alias("rank_q")
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges.src == ranks.doc_id)
            .select(
                F.col("dst").alias("doc_id"),
                F.expr("rank_q div out_deg").alias("c"),
            )
            .groupBy("doc_id")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = contrib.select(
            "doc_id",
            (
                F.lit(base)
                + F.expr(f"({DAMPING_NUM} * in_sum) div {DAMPING_DEN}")
            ).alias("rank_q"),
        )
        # no intra-loop checkpoints: ranks feeds exactly ONE branch per
        # round, so the logical tree grows linearly (~10 join+agg pairs),
        # and the single final action lets AQE pipeline all rounds in one
        # query instead of paying 3 extra eager materialization jobs
        # (r11: 66 AQE sub-jobs for 10 rounds; the eager cuts were a
        # holdover from the branching connected_components shape)
    # materialize the final ranks so the edge cache can be RELEASED
    # before returning — a lazily returned plan would keep the edge-list
    # InMemoryRelation alive past the call (repeated pagerank calls in
    # one session, e.g. top_representatives, stacked cached edge copies)
    ranks = ranks.localCheckpoint(eager=True)
    edges.unpersist()
    return ranks.select(
        "doc_id",
        "rank_q",
        (F.col("rank_q").cast("double") / float(RANK_SCALE)).alias("rank"),
    )


def top_representatives(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iterations: int = 10,
) -> DataFrame:
    """Compose PageRank with connected components: for every duplicate /
    similarity cluster, rank members and pick the highest-PageRank doc
    as the cluster representative (tie-broken by doc_id) — the
    importance-aware alternative to dedup's min-label representative."""
    from pyspark.sql import Window

    from .dedup import connected_components

    comp = connected_components(pairs, a_col, b_col)
    pr = pagerank(pairs, a_col, b_col, iterations)
    j = comp.join(pr, "doc_id")
    w = Window.partitionBy("component").orderBy(
        F.col("rank_q").desc(), "doc_id"
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .withColumn("is_representative", F.col("_rn") == 1)
        .drop("_rn")
    )


def label_propagation(
    pairs: DataFrame,
    seeds: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    id_col: str = "vec_id",
    label_col: str = "label",
    rounds: int = 3,
) -> DataFrame:
    """Semi-supervised label spreading over an undirected similarity
    graph: ``seeds`` is (id, label-or-NULL); each round, every still-
    unlabeled node adopts the majority label among its LABELED neighbors
    (exact integer votes, ties broken by smallest label), and a label
    never changes once assigned (seed-frozen, monotone — so the result
    is a pure function of the graph, independent of partitioning or
    visit order, unlike classic async LPA). The weak-supervision
    primitive: expand a small labeled set through the near-dup /
    semantic graph.

    Per round: one equi-join (labels x edges) + one keyed count + one
    argmax window over the (node, label) vote table — vote-table sized,
    not graph-squared. Driver holds only the round counter."""
    # checkpoint cuts the pair-pipeline lineage out of every round's plan.
    # Unlike pagerank (10 rounds) and connected_components, the default 3
    # rounds do NOT amortize a repartition+cache of the edge list: the
    # vote join's small side is the label table (AQE broadcasts it, so
    # edges stream shuffle-free from the checkpoint), and an A/B measured
    # the cache fill costing more than the three joins it would save.
    edges = undirected_edges(pairs, a_col, b_col).localCheckpoint(eager=True)
    labels = seeds.select(
        F.col(id_col).alias("vec_id"), F.col(label_col).alias("lab")
    )
    for it in range(rounds):
        # majority label among labeled neighbors in ONE aggregation:
        # deterministic mode() is exactly the (count DESC, label ASC)
        # argmax the previous per-(node,label) count + row_number window
        # computed — most frequent value, ties broken by smallest —
        # with one exchange instead of two and no sort (guide §2.4)
        winner = (
            edges.join(
                labels.filter(F.col("lab").isNotNull()),
                edges.src == F.col("vec_id"),
            )
            .groupBy(F.col("dst").alias("vec_id"))
            .agg(F.mode("lab", True).alias("w_lab"))
        )
        labels = labels.join(winner, "vec_id", "left").select(
            "vec_id", F.coalesce(F.col("lab"), F.col("w_lab")).alias("lab")
        )
        # the default 3-round lineage is shallow enough without per-round
        # materialization; deep runs still get periodic cuts
        if it % 4 == 3:
            labels = labels.localCheckpoint(eager=True)
    return labels.select("vec_id", F.col("lab").alias(label_col))
