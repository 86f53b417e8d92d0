"""Physical-plan audits: the scale discipline, enforced.

Every registered query's plan is checked for the patterns that kill jobs
at 100 TB: nested-loop/cartesian joins (quadratic compare), missing
broadcast on dimension joins, and missing filter/column pushdown on
selective scans. Runs at sf0.001 — plans, not data, are under test
(AQE may re-plan shapes at runtime, but the static plan must already be
sane because AQE can only coarsen, not rescue a nested loop)."""

from __future__ import annotations

import pytest

from clx_etl_spark.queries import load_all

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = load_all()[name].fn(spark, SF)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


@pytest.fixture(scope="module")
def plans(spark):
    # driver-thread fan-out (guide §2.6): explaining all 200+ queries is
    # driver-side Catalyst work (265 s serial, measured r13); concurrent
    # builders produce the identical strings ~6x faster
    from concurrent.futures import ThreadPoolExecutor

    names = list(load_all())
    with ThreadPoolExecutor(max_workers=8) as pool:
        return dict(zip(names, pool.map(lambda n: _plan(spark, n), names)))


# Justified broadcast-nested-loop shapes (each O(n), not O(n^2)):
#   sim_knn_bruteforce — tiny query set x corpus IS the declared exactness
#     baseline; sim_knn_ivf is the scale path and must stay NLJ-free
#   q22_idle_rich_customers / q11_important_parts / q15_top_supplier —
#     single-row scalar-threshold broadcast (the canonical plan for a
#     scalar subquery; build side is exactly 1 row)
NLJ_ALLOWED = {
    "sim_knn_bruteforce",
    "mm_embedding_knn",
    "q22_idle_rich_customers",
    "q11_important_parts",
    "q15_top_supplier",
    "bm25_doc_scores",  # broadcast of the 1-row (N, avgdl, df...) stats
    "densify_hourly_grid",  # broadcast of the 1-row (lo, hi) hour bounds
    "lm_bigram_doc_scores",  # broadcast of the 1-row vocab-size stats
    "lm_score_heldout",  # same 1-row vocab-size stats broadcast
    "dsir_importance_weights",  # broadcast of the 1-row (nr, nt) totals
    "hybrid_search_rerank",  # two 1-row broadcasts (bm25 stats + query vec)
    "pq_ann",  # constant-size (k_codes-row) codebook broadcasts from the
    # exact-integer k-means trainings + the tiny query-LUT broadcast;
    # corpus-side scoring is an equi-join on code — compose with IVF cell
    # pruning (sim_knn_ivfpq) for the candidate-pruned scale path
    "sim_knn_ivfpq",  # same constant-size centroid/codebook broadcasts
    # (8-row coarse + 8-row per-subspace); candidate generation is the
    # cell EQUI-join — 1/nlist of the corpus per probe, never all-pairs
    "contrastive_hard_negatives",  # broadcast anchor subset x corpus —
    # same declared shape as sim_knn_bruteforce; swap in IVF/SRP candidate
    # pruning at scale (semantics unchanged, see hard_negative_mining doc)
    "zorder_locality_stats",  # broadcast of the 1-row global bounds
    "lang_temperature_sample",  # broadcast of the 1-row min-count anchor
    "funnel_time_bounded",  # crossJoin of three 1-row stage counts
    "lm_kneser_ney_scores",  # broadcast of the 1-row bigram-type total
    "rrf_fusion",  # broadcast 1-row query vector against the top-20 leg
    "token_pmi",  # broadcast of the 1-row n_docs scalar onto vocab pairs
    "pareto_abc_customers",  # broadcast of the 1-row revenue total
    "market_basket_pairs",  # broadcast of the 1-row n_orders scalar
    "mix_waterfill",  # per-round broadcast of the 1-row (fz, nf) stats
    # onto the dimension-sized source table (5 unrolled rounds)
    "class_balance_oversample",  # broadcast of the 1-row majority-class
    # target onto the per-lang counts
}


def test_no_nested_loop_or_cartesian_anywhere(plans):
    offenders = {
        n: p for n, p in plans.items()
        if ("BroadcastNestedLoopJoin" in p or "CartesianProduct" in p)
        and n not in NLJ_ALLOWED
    }
    assert not offenders, f"quadratic join shapes in: {sorted(offenders)}"


def test_dimension_joins_broadcast(plans):
    # snowflake/dim joins must be broadcast, not shuffled sort-merge
    for name in ("q3_shipping_priority", "q5_region_revenue", "j4_double_left_tags"):
        assert "BroadcastHashJoin" in plans[name], name
        assert "SortMergeJoin" not in plans[name], f"{name}: dim join shuffled"


def test_full_outer_merge_is_sort_merge(plans):
    # full outer can't broadcast; SMJ is the correct scalable shape
    assert "SortMergeJoin FullOuter" in plans["j2_full_outer_merge"].replace(
        "SortMergeJoin [", "SortMergeJoin ["
    ) or "FullOuter" in plans["j2_full_outer_merge"]


def test_selective_scans_push_filters(plans):
    # queries with selective predicates must reach the parquet reader
    for name in ("q3_shipping_priority", "q6_revenue_delta", "q19_disjunctive_pushdown"):
        p = plans[name]
        assert "PushedFilters: [" in p and "PushedFilters: []" not in p.replace(
            "PushedFilters: [],", "PushedFilters: []"
        ), f"{name}: no filters pushed to scan"


def test_column_pruning_reaches_scan(plans):
    # q6 projects 3 lineitem columns + 1 filter col; the scan must not read
    # the full 11-column schema
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plans["q6_revenue_delta"])
    assert schemas and all(len(s.split(",")) <= 4 for s in schemas), schemas


def test_topk_uses_window_group_limit(plans):
    # rank-filter pattern should trigger WindowGroupLimit pushdown
    # (partial top-k before the shuffle) on Spark >= 3.5
    assert "WindowGroupLimit" in plans["topk_per_group"]


def test_domain_cap_uses_window_group_limit(plans):
    # per-domain quota must pre-trim on the map side (WindowGroupLimit),
    # not ship every row of a hot domain through the shuffle
    assert "WindowGroupLimit" in plans["cap_per_source"]


def test_decontaminate_broadcasts_benchmark(plans):
    # the benchmark gram set is the small side; the 100 TB corpus side
    # must never shuffle on the gram key
    p = plans["decontam_ngram_overlap"]
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p, "corpus side shuffled on gram key"


def test_sequence_packing_no_join_one_shuffle(plans):
    # concat-then-chunk packing is one window over a shard partitioning —
    # no join, and the only exchange key is the shard column
    import re

    p = plans["pack_training_sequences"]
    assert "Join" not in p
    keys = {m for m in re.findall(r"hashpartitioning\((\w+)", p)}
    assert keys == {"shard"}, keys


def test_span_rewrite_winner_is_partial_aggregate(plans):
    # the per-block winner must be a map-side-combinable MIN(struct), not
    # a row_number window over the block hash — a billion-occurrence
    # boilerplate block must collapse per-partition before the shuffle
    import re

    p = plans["span_dedup_rewrite"]
    assert "partial_min(struct" in p
    assert "windowspecdefinition" not in p.lower()
    keys = set(re.findall(r"hashpartitioning\((\w+)", p))
    assert keys == {"bh", "doc_id"}, keys


def test_asof_join_single_key_shuffle(plans):
    # the as-of union-window trick must not introduce a join at all —
    # exactly the union + one windowed sort
    p = plans["asof_last_purchase"]
    assert "Join" not in p or "SortMergeJoin" not in p
    assert "Window" in p


def test_exact_dedup_single_wide_stage(plans):
    # hash-dedup = one shuffle on digest (plan shows initial+final AQE
    # sections, so count unique exchange ids, not occurrences)
    import re

    ex = set(re.findall(r"hashpartitioning\(digest[^)]*\)", plans["dedup_exact"]))
    assert len(ex) == 1, ex
    # and no second wide op (no other hashpartitioning target)
    others = {
        m for m in re.findall(r"hashpartitioning\((\w+)", plans["dedup_exact"])
    }
    assert others == {"digest"}, others


def test_aqe_splits_skewed_join(spark, tmp_path):
    """The engine's skew posture is AQE-first (salting is for the shapes
    AQE can't fix): with a 90%-hot key, the adaptive plan must mark the
    sort-merge join skew-split. Thresholds lowered to trigger at test scale."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(0, 200_000).selectExpr(
            "CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS key",
            "repeat('x', 64) AS pad",
        )
        dim = spark.range(0, 200_000).selectExpr("id AS key", "id AS v")
        j = fact.join(dim, "key")
        assert len(j.collect()) == 200_000
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_map_only_queries_have_no_exchange(plans):
    # pii_redact / chunk_documents / embed_quantize_int8 all claim to be
    # map-only stages that pipeline into the scan at 100 TB: any Exchange
    # in the plan falsifies the claim
    for name in ("pii_redact", "chunk_documents", "embed_quantize_int8"):
        p = plans[name]
        assert "Exchange" not in p, f"{name} has a shuffle"
        assert "Scan parquet" in p


def test_incremental_dedup_is_one_sided_hash_join(plans):
    # batch-vs-corpus candidates must come from an equi-join on the band
    # bucket (hash-partitioned or broadcast), never a nested loop; and the
    # corpus must never self-join (no doc_a/doc_b pair columns)
    p = plans["dedup_incremental"]
    assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p
