"""Property tests for the sequence/path + storage-ops queries
(queries/sequence.py) — invariants the DuckDB hash oracle can't express
(conservation laws, independent-recomputation equality)."""

from __future__ import annotations

import math

import pytest

from clx_etl_spark.catalog import load_table
from clx_etl_spark.queries import load_all

from .conftest import SF_SMOKE

REG = load_all()


def _rows(spark, name):
    return REG[name].fn(spark, SF_SMOKE).collect()


def test_markov_probs_sum_to_one_and_counts_conserve(spark):
    rows = _rows(spark, "markov_transitions")
    by_prev: dict[str, float] = {}
    total = 0
    for r in rows:
        by_prev[r.prev_type] = by_prev.get(r.prev_type, 0.0) + r.prob
        total += r.n
    for prev, s in by_prev.items():
        assert math.isclose(s, 1.0, rel_tol=1e-12), (prev, s)
    ev = load_table(spark, SF_SMOKE, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # each user's sequence contributes len-1 transitions
    assert total == n_events - n_users


def test_rolling_7d_matches_bruteforce_set_union(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    pairs = {
        (r.day, r.user_id)
        for r in ev.selectExpr(
            "ts_ms div 86400000 as day", "user_id"
        ).collect()
    }
    days = sorted({d for d, _ in pairs})
    expected = {
        d: len({u for (dd, u) in pairs if d - 6 <= dd <= d}) for d in days
    }
    got = {r.report_day: r.users_7d for r in _rows(spark, "rolling_7d_distinct_users")}
    assert got == expected


def test_compaction_conserves_bytes_and_bins_contiguous(spark):
    from clx_etl_spark.queries.sequence import COMPACT_TARGET

    docs = load_table(spark, SF_SMOKE, "documents")
    totals = {
        r.source: (r.b, r.n)
        for r in docs.groupBy("source")
        .agg({"n_chars": "sum", "*": "count"})
        .withColumnRenamed("sum(n_chars)", "b")
        .withColumnRenamed("count(1)", "n")
        .collect()
    }
    rows = _rows(spark, "compaction_bin_packing")
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    assert set(by_source) == set(totals)
    for source, bins in by_source.items():
        tot_b, tot_n = totals[source]
        assert sum(r.bin_bytes for r in bins) == tot_b
        assert sum(r.n_files for r in bins) == tot_n
        ids = sorted(r.bin for r in bins)
        # contiguous packing: a bin can only start once the previous byte
        # range is entered, so bin ids are 0..k with no holes
        assert ids == list(range(len(ids))), source
        for r in bins:
            assert math.isclose(
                r.fill_ratio, r.bin_bytes / COMPACT_TARGET, rel_tol=1e-12
            )


def test_partition_skew_report_conserves_rows(spark):
    rows = _rows(spark, "partition_skew_report")
    ev = load_table(spark, SF_SMOKE, "events")
    assert sum(r.n_rows for r in rows) == ev.count()
    for r in rows:
        # max*k/total is >= 1 by definition of max, <= k when one cell holds all
        assert r.skew_ratio >= 1.0 - 1e-12
        assert r.skew_ratio <= r.n_types + 1e-12
        assert r.max_type_rows * r.n_types >= r.n_rows


def test_embedding_outliers_match_numpy(spark):
    np = pytest.importorskip("numpy")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb.collect()}
    # replicate the micro-quantized contract: v6 = floor(v * 1e6)
    q = {k: np.floor(v * 1e6) for k, v in vecs.items()}
    n = len(q)
    mean_num = sum(q.values())  # per-dim sums
    dist2 = {
        k: float(np.sum((v * n - mean_num) ** 2)) / (1e12 * n * n)
        for k, v in q.items()
    }
    top = sorted(dist2.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = {r.vec_id: (r.dist2, r.rk) for r in _rows(spark, "embedding_outlier_scores")}
    assert set(got) == {k for k, _ in top}
    for rk, (k, d) in enumerate(top, start=1):
        gd, grk = got[k]
        assert grk == rk, (k, grk, rk)
        assert math.isclose(gd, d, rel_tol=1e-12), (k, gd, d)


def test_conversion_lags_nonnegative_and_bounded_by_signups(spark):
    rows = _rows(spark, "conversion_lag_stats")
    assert rows
    for r in rows:
        assert r.n_converted <= r.n_signups
        if r.n_converted:
            assert 0 <= r.min_lag_ms <= r.max_lag_ms
            assert r.min_lag_ms <= r.avg_lag_ms <= r.max_lag_ms
        else:
            assert r.min_lag_ms is None and r.avg_lag_ms is None


def test_top_event_paths_shape(spark):
    rows = _rows(spark, "top_event_paths")
    ev = load_table(spark, SF_SMOKE, "events")
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_users for r in rows) <= n_users
    assert [r.rk for r in sorted(rows, key=lambda r: r.rk)] == list(
        range(1, len(rows) + 1)
    )
    for r in rows:
        assert 1 <= len(r.path.split(">")) <= 5


def test_grouping_sets_consistent_with_rollup(spark):
    gs = {(r.l_returnflag, r.l_linestatus, r.gid): r.revenue
          for r in _rows(spark, "grouping_sets_revenue")}
    ru = {(r.l_returnflag, r.l_linestatus, r.gid): r.revenue
          for r in _rows(spark, "rollup_revenue")}
    # grand total (gid=3) identical; per-flag subtotals (flag, NULL, 1) identical
    for key, rev in gs.items():
        flag, status, gid = key
        if gid in (1, 3) and key in ru:
            assert math.isclose(rev, ru[key], rel_tol=1e-12), key
    assert {k[2] for k in gs} == {1, 2, 3}  # never the (flag,status) detail cells


# --- batch 2: mining / fusion queries (queries/mining.py) ------------------


def test_funnel_time_bounded_monotone_and_tighter_than_unbounded(spark):
    r = _rows(spark, "funnel_time_bounded")[0]
    assert r.n_view >= r.n_click_1h >= r.n_purchase_24h
    # the windowed funnel can never beat the ordering-only funnel
    u = _rows(spark, "funnel_conversion")[0]
    assert r.n_click_1h <= u.n_click_after_view


def test_step_transitions_conserve_and_match_markov_total(spark):
    rows = _rows(spark, "step_transitions")
    per_step: dict[int, int] = {}
    for r in rows:
        assert 1 <= r.step <= 4
        per_step[r.step] = per_step.get(r.step, 0) + r.n
    # a user contributes to step k+1 only if they contributed to step k
    for k in range(1, 4):
        if k + 1 in per_step:
            assert per_step[k + 1] <= per_step[k]
    # step transitions are a subset of all markov transitions
    markov_total = sum(r.n for r in _rows(spark, "markov_transitions"))
    assert sum(per_step.values()) <= markov_total


def test_kfold_balance_partitions_all_docs(spark):
    rows = _rows(spark, "kfold_balance_audit")
    docs = load_table(spark, SF_SMOKE, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    assert {r.fold for r in rows} <= set(range(5))


def test_rrf_scores_recompute(spark):
    rows = _rows(spark, "rrf_fusion")
    assert len(rows) == 10
    for r in rows:
        expect = 0.0
        if r.bm_rank is not None:
            expect += 1.0 / (60 + r.bm_rank)
        if r.cos_rank is not None:
            expect += 1.0 / (60 + r.cos_rank)
        assert r.rrf == expect
        assert r.bm_rank is not None or r.cos_rank is not None


def test_token_pmi_ratio_bounds(spark):
    rows = _rows(spark, "token_pmi")
    docs = load_table(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    for r in rows:
        assert r.n_ab >= 1
        # c_ab <= min(df_a, df_b) implies ratio <= n_docs / max(df_a, df_b)
        assert 0.0 < r.assoc_ratio <= float(n_docs)
        assert r.tok_a < r.tok_b


def test_kneser_ney_matches_pure_python_fixed_point(spark):
    """Independent recomputation of the KN fixed-point arithmetic on a
    tiny corpus (integer floors included), plus probability sanity."""
    from clx_etl_spark.operators.lm import KN_SCALE, kneser_ney_scores

    texts = [
        (1, "a b a b c"),
        (2, "a b c d"),
        (3, "b c a a"),
        (4, "d a b"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r.doc_id: (r.n_bigrams, r.sum_scaled) for r in kneser_ney_scores(df).collect()}

    # pure-python mirror
    from collections import Counter, defaultdict

    bgs = defaultdict(list)
    for doc_id, t in texts:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            bgs[doc_id].append((a, b))
    c12 = Counter(p for ps in bgs.values() for p in ps)
    c1 = Counter()
    n1f = Counter()
    n1b = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    B = len(c12)
    for doc_id, ps in bgs.items():
        s = 0
        for w1, w2 in ps:
            s += ((4 * c12[(w1, w2)] - 3) * KN_SCALE) // (4 * c1[w1])
            s += (3 * n1f[w1] * n1b[w2] * KN_SCALE) // (4 * c1[w1] * B)
        assert got[doc_id] == (len(ps), s), doc_id
    # and on real data: average probabilities are valid probabilities
    rows = _rows(spark, "lm_kneser_ney_scores")
    assert rows and all(0.0 < r.avg_p <= 1.0 for r in rows)


def test_kneser_ney_conditional_distribution_sums_below_one(spark):
    """For every context w1, sum_w2 P_KN(w2|w1) <= 1 (floors only lose
    mass) and >= 1 - d·N1f/c1 slack bound — the distribution shape that
    makes KN a proper smoothing."""
    from fractions import Fraction

    from clx_etl_spark.catalog import load_table
    from clx_etl_spark.operators.lm import bigram_stream

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    bg = [(r.w1, r.w2) for r in bigram_stream(docs).collect()]
    from collections import Counter

    c12 = Counter(bg)
    c1 = Counter()
    n1f = Counter()
    n1b = Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    B = len(c12)
    d = Fraction(3, 4)
    sum_n1b = sum(n1b.values())
    by_w1 = Counter()
    for (w1, w2), c in c12.items():
        p = (c - d) / c1[w1] + d * n1f[w1] / c1[w1] * Fraction(n1b[w2], B)
        by_w1[w1] += p
    for w1, s in by_w1.items():
        assert s <= 1, (w1, s)
        # full mass only if Pcont summed over w2 seen after w1 were 1;
        # the loss is exactly lambda * (1 - sum Pcont(seen w2))
        lam = d * n1f[w1] / c1[w1]
        assert s >= 1 - lam, (w1, s)
    assert sum_n1b == B


def test_incremental_refresh_converges_to_full_recompute(spark, tmp_path):
    """Two successive incremental refreshes == one full recompute, and a
    refresh leaves untouched groups' stored rows intact."""
    from pyspark.sql import functions as F

    from clx_etl_spark.operators.incremental import (
        finalize_state, incremental_refresh, merge_states, partial_daily_state)

    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "rollup")
    day = F.expr("ts_ms div 86400000")
    b1 = ev.filter(day < 19723 + 10)
    b2 = ev.filter(day >= 19723 + 10)
    incremental_refresh(spark, b1, path)
    stored_after_b1 = {
        (r.day_id, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v)
        for r in spark.read.parquet(path).collect()
    }
    incremental_refresh(spark, b2, path)
    got = {
        (r.day_id, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v)
        for r in spark.read.parquet(path).collect()
    }
    want = {
        (r.day_id, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v)
        for r in partial_daily_state(ev).collect()
    }
    assert got == want
    # groups from batch 1 whose day never appears in batch 2 are untouched
    b2_days = {r.day_id for r in partial_daily_state(b2).select("day_id").collect()}
    for key, state in stored_after_b1.items():
        if key[0] not in b2_days:
            assert got[key] == state, key
    # merge_states is order/batching independent
    a, b = partial_daily_state(b1), partial_daily_state(b2)
    m1 = {tuple(r) for r in merge_states(a, b).collect()}
    m2 = {tuple(r) for r in merge_states(b, a).collect()}
    assert m1 == m2
    # finalize derives avg consistently
    fin = finalize_state(merge_states(a, b))
    r0 = fin.filter(F.col("n") > 0).first()
    assert abs(r0.avg_value - r0.sum_value / r0.n) < 1e-12


def test_refresh_from_change_feed_retracts_and_replays(spark, tmp_path):
    """CDF-driven rollup maintenance: updates net to their value delta,
    deletes subtract, a group whose count reaches zero is REMOVED, and
    a replayed change window is a txn no-op."""
    from pyspark.sql import functions as F

    from clx_etl_spark.operators.incremental import refresh_from_change_feed
    from clx_etl_spark.sinks.versioned import (append_version, latest_version,
                                               merge_version, read_version,
                                               table_changes)

    facts = str(tmp_path / "facts")
    rollup = str(tmp_path / "rollup")
    ev = spark.createDataFrame(
        [(1, 0, "a", 10.0), (2, 0, "a", 20.0), (3, 0, "b", 7.0),
         (4, 86_400_000, "a", 5.0)],
        "event_id long, ts_ms long, event_type string, value double",
    )
    append_version(ev.coalesce(1), facts, stats_cols=["event_id"])
    refresh_from_change_feed(spark, table_changes(spark, facts, -1), rollup,
                             txn=("t", 0))
    got0 = {(r.day_id, r.event_type): (r.n, float(r.sum_v))
            for r in read_version(spark, rollup).collect()}
    assert got0 == {(0, "a"): (2, 30.0), (0, "b"): (1, 7.0),
                    (1, "a"): (1, 5.0)}
    # update event 1 (+5), delete event 3 — day-0 'b' zeroes out
    upd = spark.createDataFrame([(1, 0, "a", 15.0)], ev.schema)
    dels = spark.createDataFrame([(3,)], "event_id long")
    v_before = latest_version(facts)
    merge_version(upd, facts, keys=["event_id"], deletes=dels,
                  change_feed=True)
    changes = table_changes(spark, facts, v_before).localCheckpoint(eager=True)
    refresh_from_change_feed(spark, changes, rollup, txn=("t", 1))
    got1 = {(r.day_id, r.event_type): (r.n, float(r.sum_v))
            for r in read_version(spark, rollup).collect()}
    assert got1 == {(0, "a"): (2, 35.0), (1, "a"): (1, 5.0)}
    # replaying the same window is a manifest-level no-op
    v = latest_version(rollup)
    refresh_from_change_feed(spark, changes, rollup, txn=("t", 1))
    assert latest_version(rollup) == v
    got2 = {(r.day_id, r.event_type): (r.n, float(r.sum_v))
            for r in read_version(spark, rollup).collect()}
    assert got2 == got1


def test_refresh_extrema_recompute_on_retraction(spark, tmp_path):
    """facts= opts into exact min/max: deleting a group's maximum
    recomputes that group's extrema from the snapshot, while an
    untouched group keeps its stored extrema (no recompute, no
    staleness)."""
    from pyspark.sql import functions as F

    from clx_etl_spark.operators.incremental import refresh_from_change_feed
    from clx_etl_spark.sinks.versioned import (append_version, merge_version,
                                               read_version, table_changes)

    facts = str(tmp_path / "facts")
    rollup = str(tmp_path / "ru")
    ev = spark.createDataFrame(
        [(1, 0, "a", 10.0), (2, 0, "a", 99.0), (3, 0, "b", 7.0),
         (4, 0, "b", 1.0)],
        "event_id long, ts_ms long, event_type string, value double",
    )
    append_version(ev.coalesce(1), facts, stats_cols=["event_id"])
    refresh_from_change_feed(
        spark, table_changes(spark, facts, -1), rollup, txn=("t", 0),
        facts=read_version(spark, facts),
    )
    got0 = {(r.day_id, r.event_type): (r.n, r.min_v, r.max_v)
            for r in read_version(spark, rollup).collect()}
    assert got0 == {(0, "a"): (2, 10.0, 99.0), (0, "b"): (2, 1.0, 7.0)}
    # delete the 'a' maximum — naive stale-extrema maintenance would
    # keep 99.0; group 'b' is untouched and must not be recomputed
    merge_version(
        ev.limit(0), facts, keys=["event_id"],
        deletes=spark.createDataFrame([(2,)], "event_id long"),
        change_feed=True,
    )
    refresh_from_change_feed(
        spark, table_changes(spark, facts, 0), rollup, txn=("t", 1),
        facts=read_version(spark, facts),
    )
    got1 = {(r.day_id, r.event_type): (r.n, r.min_v, r.max_v)
            for r in read_version(spark, rollup).collect()}
    assert got1 == {(0, "a"): (1, 10.0, 10.0), (0, "b"): (2, 1.0, 7.0)}


def test_sync_rollup_from_table_stateless_cursor(spark, tmp_path):
    """sync_rollup_from_table catches up using the rollup manifest's own
    txn watermark as the cursor: repeated calls are no-ops, new fact
    commits are picked up exactly once."""
    from pyspark.sql import functions as F

    from clx_etl_spark.operators.incremental import sync_rollup_from_table
    from clx_etl_spark.sinks.versioned import (append_version, merge_version,
                                               read_version)

    facts = str(tmp_path / "facts")
    rollup = str(tmp_path / "rollup")
    ev = spark.createDataFrame(
        [(1, 0, "a", 10.0), (2, 0, "b", 4.0)],
        "event_id long, ts_ms long, event_type string, value double",
    )
    append_version(ev.coalesce(1), facts, stats_cols=["event_id"])
    assert sync_rollup_from_table(spark, facts, rollup) is not None
    assert sync_rollup_from_table(spark, facts, rollup) is None  # caught up
    merge_version(
        spark.createDataFrame([(1, 0, "a", 12.0)],
                              "event_id long, ts_ms long, event_type string,"
                              " value double"),
        facts, keys=["event_id"], change_feed=True,
    )
    assert sync_rollup_from_table(spark, facts, rollup) is not None
    got = {(r.day_id, r.event_type): (r.n, float(r.sum_v))
           for r in read_version(spark, rollup).collect()}
    assert got == {(0, "a"): (1, 12.0), (0, "b"): (1, 4.0)}
    assert sync_rollup_from_table(spark, facts, rollup) is None


def test_rfm_scores_balanced_quintiles(spark):
    rows = _rows(spark, "rfm_segmentation")
    n = len(rows)
    for axis in ("r_score", "f_score", "m_score"):
        counts = {}
        for r in rows:
            v = getattr(r, axis)
            assert 1 <= v <= 5
            counts[v] = counts.get(v, 0) + 1
        # NTILE balance: bucket sizes differ by at most 1
        assert max(counts.values()) - min(counts.values()) <= 1, (axis, counts)
    assert all(r.rfm == r.r_score * 100 + r.f_score * 10 + r.m_score for r in rows)
    assert n == load_table(spark, SF_SMOKE, "orders").select("o_custkey").distinct().count()


def test_market_basket_lift_bounds(spark):
    rows = _rows(spark, "market_basket_pairs")
    items = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
    )
    n_orders = items.select("l_orderkey").distinct().count()
    freq = {r.l_partkey: r.c for r in items.groupBy("l_partkey").count()
            .withColumnRenamed("count", "c").collect()}
    for r in rows:
        assert r.n_ab >= 1
        assert r.n_ab <= min(freq[r.part_a], freq[r.part_b])
        expect = n_orders * r.n_ab / (freq[r.part_a] * freq[r.part_b])
        assert r.lift == expect


def test_daily_correlation_in_range_and_symmetric_pairs(spark):
    rows = _rows(spark, "daily_type_correlation")
    seen = set()
    for r in rows:
        assert -1.0 - 1e-9 <= r.corr <= 1.0 + 1e-9
        assert r.type_a < r.type_b
        assert (r.type_a, r.type_b) not in seen
        seen.add((r.type_a, r.type_b))
    # 5 event types -> C(5,2) pairs
    assert len(rows) == 10


def test_span_corruption_reconstructs_original(spark):
    """T5 span corruption is lossless: replacing each input sentinel with
    its target span rebuilds the original token stream exactly."""
    import re

    df = REG["span_corruption_masking"].fn(spark, SF_SMOKE)
    docs = {
        r.doc_id: r.text.split()
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    rows = df.collect()
    assert rows
    for row in rows:
        spans: dict[int, list[str]] = {}
        cur = None
        for t in row.target_text.split():
            m = re.fullmatch(r"<extra_id_(\d+)>", t)
            if m:
                cur = int(m.group(1))
                spans[cur] = []
            else:
                spans[cur].append(t)
        assert len(spans) == row.n_spans
        rebuilt: list[str] = []
        for t in row.input_text.split():
            m = re.fullmatch(r"<extra_id_(\d+)>", t)
            rebuilt.extend(spans[int(m.group(1))] if m else [t])
        assert rebuilt == docs[row.doc_id], row.doc_id
