"""Operator property tests (SURVEY §5.3-5.4): gap-logic invariants and the
as-of join generalization."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from clx_etl_spark.operators.gaps import detect_gaps, gap_fill_plan, merge_gap_ranges
from clx_etl_spark.operators.merge import asof_join

from . import fixtures as FX

KEYS = ["symbol"]
MIN = FX.MIN


def _bars(spark, present: dict[str, list[int]]):
    rows = [(s, FX.BASE_TS + i * MIN) for s, idxs in present.items() for i in idxs]
    return spark.createDataFrame(rows, "symbol string, ts long")


def test_detect_gaps_matches_fixture_expectation(spark):
    rows, expected = FX.kline_rows(n_symbols=2, n_bars=300)
    df = spark.createDataFrame(rows).select("symbol", "ts")
    got = {
        s: sorted((r.gap_start, r.gap_end) for r in g)
        for s, g in (
            (s, detect_gaps(df.filter(F.col("symbol") == s), KEYS, "ts", MIN).collect())
            for s in expected
        )
    }
    assert got == {s: sorted(v) for s, v in expected.items()}


def test_gap_plan_covers_exactly_the_missing_bars(spark):
    """detect ∘ fill = ∅ and fill covers exactly the complement, for random
    subsets (SURVEY §5.3 property)."""
    rng = random.Random(123)
    n = 200
    for trial in range(3):
        present = sorted(rng.sample(range(n), k=rng.randrange(20, n - 20)))
        df = _bars(spark, {"S": present})
        plan = gap_fill_plan(
            df, KEYS, start_ms=FX.BASE_TS, end_ms=FX.BASE_TS + (n - 1) * MIN,
            ts_col="ts", interval_ms=MIN, page_limit=50,
        ).collect()
        covered = set()
        for r in plan:
            assert r.gap_end - r.gap_start < 50 * MIN  # page-cap respected
            for i in range(n):
                ts = FX.BASE_TS + i * MIN
                if r.gap_start <= ts <= r.gap_end:
                    covered.add(i)
        missing = set(range(n)) - set(present)
        assert covered >= missing  # every hole is fetched
        # coalescing may refetch some present bars (page packing) but must
        # never miss; idempotent sink makes over-fetch harmless
        filled = _bars(spark, {"S": sorted(set(present) | covered)})
        assert detect_gaps(filled, KEYS, "ts", MIN).count() == 0


def test_merge_gap_ranges_islands(spark):
    gaps = spark.createDataFrame(
        [("S", 0, 10), ("S", 20, 30), ("S", 1000, 1010), ("S", 5000, 5400)],
        "symbol string, gap_start long, gap_end long",
    )
    out = sorted(
        (r.gap_start, r.gap_end)
        for r in merge_gap_ranges(gaps, KEYS, max_span_ms=200).collect()
    )
    # first two merge (distance 10 <= 200); third separate; fourth split into
    # cap-sized chunks
    assert (0, 30) in out
    assert (1000, 1010) in out
    assert all(e - s <= 200 for s, e in out)
    covered = set()
    for s, e in out:
        covered.update(range(s, e + 1))
    assert covered >= set(range(5000, 5401))


def test_asof_join_backward_with_tolerance(spark):
    trades = spark.createDataFrame(
        [("A", 1000, 1.0), ("A", 2000, 2.0), ("A", 10_000, 3.0), ("B", 1500, 9.0)],
        "sym string, ts long, px double",
    )
    quotes = spark.createDataFrame(
        [("A", 900, 0.9), ("A", 1999, 1.9), ("A", 2000, 2.1), ("B", 100, 8.0)],
        "sym string, ts long, bid double",
    )
    out = {
        (r.sym, r.ts): r.bid
        for r in asof_join(
            trades, quotes, keys=["sym"], left_ts="ts", right_ts="ts",
            tolerance_ms=1000,
        ).collect()
    }
    assert out[("A", 1000)] == 0.9   # most recent at-or-before
    assert out[("A", 2000)] == 2.1   # exact-tie right row visible
    assert out[("A", 10_000)] is None  # outside tolerance
    assert out[("B", 1500)] is None  # 1400ms gap > 1000 tolerance


def test_bin_range_join_inner_and_left_outer(spark):
    from clx_etl_spark.operators.range_join import bin_range_join

    points = spark.createDataFrame(
        [("u1", 1, 100), ("u1", 2, 5_000_000), ("u2", 3, 150)],
        "user string, pid long, ms long",
    )
    intervals = spark.createDataFrame(
        [
            ("u1", 10, 0, 200),            # catches pid 1 (100 in [0,200))
            ("u1", 11, 100, 101),          # 1-row interval, catches pid 1
            ("u1", 12, 200, 300),          # empty
            ("u1", 13, 0, 10_000_000),     # spans many bins: pids 1 and 2
            ("u2", 14, 150, 151),          # exact start inclusive
            ("u2", 15, 100, 150),          # end exclusive: misses 150
        ],
        "user string, iid long, start_ms long, end_ms long",
    )
    inner = bin_range_join(
        points, intervals, keys=["user"], point_ts="ms",
        start_col="start_ms", end_col="end_ms", bin_ms=1000,
    )
    got = sorted((r.iid, r.pid) for r in inner.collect())
    assert got == [(10, 1), (11, 1), (13, 1), (13, 2), (14, 3)]

    outer = bin_range_join(
        points, intervals, keys=["user"], point_ts="ms",
        start_col="start_ms", end_col="end_ms", bin_ms=1000, how="left_outer",
    )
    by_iid = {}
    for r in outer.collect():
        by_iid.setdefault(r.iid, []).append(r.pid)
    assert sorted(by_iid[12]) == [None]  # empty interval kept
    assert sorted(by_iid[15]) == [None]
    assert sorted(by_iid[13]) == [1, 2]
    assert outer.count() == 7  # 5 matches + 2 empties


def test_ngram_jaccard_pairs_exact(spark):
    from clx_etl_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),  # near-dup of 1
            (3, "completely different text with no overlap at all here"),
            (4, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(
        docs, k=3, threshold=0.5, max_doc_freq=1000, min_common=2
    ).collect()}
    # doc1/doc4: identical 7-shingle sets -> jaccard 1.0
    assert out[(1, 4)] == 1.0
    # doc1/doc2 share 6 of 7 shingles each: |inter|=6, |union|=8 -> 0.75
    assert abs(out[(1, 2)] - 0.75) < 1e-12
    assert out[(2, 4)] == out[(1, 2)]
    assert not any(3 in p for p in out)


def test_ngram_jaccard_doc_freq_cap_drops_boilerplate(spark):
    from clx_etl_spark.operators.dedup import ngram_jaccard_pairs

    # 4 docs all sharing one boilerplate shingle; pairs only exist via it
    docs = spark.createDataFrame(
        [(i, f"all rights reserved tail{i} x{i} y{i}") for i in range(4)],
        "doc_id long, text string",
    )
    # df cap of 3 excludes the shared shingle (df=4) -> no candidates at all
    out = ngram_jaccard_pairs(docs, k=3, threshold=0.0, max_doc_freq=3, min_common=1)
    assert out.count() == 0


def test_prefix_filter_jaccard_lossless_vs_bruteforce(spark):
    """The PPJoin prefix filter must be COMPLETE: its output equals the
    brute-force all-pairs Jaccard >= t set on seeded random docs, including
    the integer-boundary cases (t*n exactly integral) where a float-rounded
    prefix length would silently drop pairs."""
    import itertools
    import random

    from clx_etl_spark.operators.dedup import prefix_filter_jaccard_pairs

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(40):
        # cluster structure: groups of 4 docs mutate a shared base text
        base = rng.sample(vocab, 12) if i % 4 == 0 else rows[-1][1].split()
        toks = list(base)
        for _ in range(rng.randrange(0, 3)):
            toks[rng.randrange(len(toks))] = rng.choice(vocab)
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def shingles(text, k=3):
        t = text.split()
        return {" ".join(t[i : i + k]) for i in range(len(t) - k + 1)}

    for num, den in ((4, 5), (1, 2), (2, 3)):
        t = num / den
        expect = {}
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
            sa, sb = shingles(ta), shingles(tb)
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= t:
                expect[(min(ia, ib), max(ia, ib))] = j
        got = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in prefix_filter_jaccard_pairs(
                docs, k=3, threshold_num=num, threshold_den=den
            ).collect()
        }
        assert set(got) == set(expect), (t, set(expect) ^ set(got))
        for p, j in expect.items():
            assert abs(got[p] - j) < 1e-12


def test_hard_negative_mining_margins_and_unique_label(spark):
    """Known geometry: the hardest negative and hardest positive are
    hand-computable, and an anchor whose label is unique gets NULL
    pos_cosine/margin rather than being dropped."""
    from clx_etl_spark.operators.similarity import hard_negative_mining

    rows = [
        (0, [1.0, 0.0], 0),   # anchor
        (1, [0.9, 0.1], 0),   # positive, cos ~0.9939
        (2, [0.8, 0.6], 1),   # negative, cos 0.8
        (3, [0.0, 1.0], 1),   # negative, cos 0.0
        (4, [0.5, 0.5], 2),   # lone-label anchor
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negative_mining(
        emb, emb.filter(F.col("vec_id").isin(0, 4)), k=2
    ).collect()
    a0 = {r.rank: r for r in out if r.anchor_id == 0}
    assert a0[1].neighbor_id == 2 and abs(a0[1].neg_cosine - 0.8) < 1e-12
    import math

    # rank 2: vec 4 (label 2, cos = 1/sqrt(2)) beats vec 3 (cos 0)
    assert a0[2].neighbor_id == 4
    assert abs(a0[2].neg_cosine - 1 / math.sqrt(2)) < 1e-12

    pos = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(a0[1].pos_cosine - pos) < 1e-12
    assert abs(a0[1].margin - (0.8 - pos)) < 1e-12
    a4 = [r for r in out if r.anchor_id == 4]
    assert len(a4) == 2  # all 4 others are different-label; top-2 kept
    assert all(r.pos_cosine is None and r.margin is None for r in a4)


def test_substring_run_pairs_exact_runs(spark):
    """Hand-built passages: maximal-run boundaries, the min-length cutoff,
    and multiple independent runs per pair are all reported exactly."""
    from clx_etl_spark.operators.dedup import substring_run_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    short = "one two three four five"  # 5 tokens < min_run
    docs = spark.createDataFrame(
        [
            (1, f"x1 y1 {shared} z1 w1 q1 {short} r1"),
            (2, f"{shared} a2 b2 c2 d2 e2 f2 {short} g2"),
            (3, "totally unrelated content with nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    out = substring_run_pairs(docs, k=3, min_run_tokens=8).collect()
    runs = {(r.doc_a, r.doc_b, r.start_a, r.start_b): r.run_tokens for r in out}
    # the 8-token passage: doc1 pos 3..10 (1-based), doc2 pos 1..8
    assert runs == {(1, 2, 3, 1): 8}, runs
    # lowering the cutoff surfaces the 5-token run too
    out5 = substring_run_pairs(docs, k=3, min_run_tokens=5).collect()
    runs5 = {(r.doc_a, r.doc_b, r.start_a, r.start_b): r.run_tokens for r in out5}
    assert runs5[(1, 2, 3, 1)] == 8
    assert runs5[(1, 2, 14, 15)] == 5  # 'one two three four five'
    assert len(runs5) == 2
    assert not any(r.doc_a == 3 or r.doc_b == 3 for r in out5)


def test_substring_run_doc_freq_cap_splits_runs(spark):
    """A gram above the distinct-doc-frequency cap is excluded from
    pairing, so a run through it splits — the documented recall
    trade-off that bounds the boilerplate quadratic."""
    from clx_etl_spark.operators.dedup import substring_run_pairs

    # 'p q r' appears in all 4 docs (df=4); the surrounding runs only in 2
    passage = "a b c p q r d e f"
    docs = spark.createDataFrame(
        [
            (1, passage),
            (2, passage),
            (3, "zz p q r yy xx ww vv uu"),
            (4, "kk p q r jj ii hh gg ff"),
        ],
        "doc_id long, text string",
    )
    full = substring_run_pairs(docs, k=3, min_run_tokens=3, max_doc_freq=4)
    got_full = {
        (r.doc_a, r.doc_b): r.run_tokens for r in full.collect()
    }
    assert got_full[(1, 2)] == 9  # uncapped: one maximal 9-token run
    capped = substring_run_pairs(docs, k=3, min_run_tokens=3, max_doc_freq=2)
    got = sorted(
        (r.start_a, r.run_tokens)
        for r in capped.collect()
        if (r.doc_a, r.doc_b) == (1, 2)
    )
    # only the 'p q r' gram (df=4) is dropped; matched positions
    # {1,2,3,5,6,7} split into islands {1-3} and {5-7}, each 3 grams
    # = 5 tokens
    assert got == [(1, 5), (5, 5)], got


def test_salted_agg_matches_plain(spark):
    from clx_etl_spark.operators.skew import salted_agg

    # heavy skew: 90% of rows on one key
    rows = [(("HOT" if i % 10 else f"k{i}"), i, float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "key string, id long, v double")
    got = {
        r.key: (r.total, r.n, r.lo, r.hi)
        for r in salted_agg(
            df, ["key"],
            {"total": ("v", "sum"), "n": ("v", "count"),
             "lo": ("v", "min"), "hi": ("v", "max")},
            discriminator="id", buckets=8,
        ).collect()
    }
    want = {
        r.key: (r.total, r.n, r.lo, r.hi)
        for r in df.groupBy("key").agg(
            F.sum("v").alias("total"), F.count("v").alias("n"),
            F.min("v").alias("lo"), F.max("v").alias("hi"),
        ).collect()
    }
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][1:] == want[k][1:]
        assert abs(got[k][0] - want[k][0]) < 1e-6  # fp sum order differs


def test_salted_join_matches_plain(spark):
    from clx_etl_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(("HOT" if i % 5 else f"k{i}"), i) for i in range(500)],
        "key string, id long",
    )
    dim = spark.createDataFrame(
        [("HOT", "hot-tag")] + [(f"k{i}", f"tag{i}") for i in range(0, 500, 5)],
        "key string, tag string",
    )
    got = sorted(
        (r.id, r.tag)
        for r in salted_join(fact, dim, ["key"], discriminator="id", buckets=4).collect()
    )
    want = sorted((r.id, r.tag) for r in fact.join(dim, "key").collect())
    assert got == want


def test_salted_agg_is_deterministic_across_runs(spark):
    from clx_etl_spark.operators.skew import salted_agg

    df = spark.createDataFrame(
        [("A", i, float(i % 7)) for i in range(300)], "key string, id long, v double"
    )
    a = salted_agg(df, ["key"], {"t": ("v", "sum")}, "id", buckets=8).collect()
    b = salted_agg(df, ["key"], {"t": ("v", "sum")}, "id", buckets=8).collect()
    assert a == b  # deterministic salt => identical partial groupings


def test_connected_components_chain_and_islands(spark):
    from clx_etl_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3, needs multiple rounds), pair {10,11},
    # triangle {20,21,22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_asof_join_property_vs_pandas_merge_asof(spark):
    """Random keyed series: our union-window as-of must agree with
    pandas.merge_asof (backward, allow_exact_matches=True) everywhere."""
    import random as rnd

    import pandas as pd

    from clx_etl_spark.operators.merge import asof_join

    rng = rnd.Random(7)
    keys = ["k0", "k1", "k2"]
    left_rows = [
        (rng.choice(keys), rng.randrange(0, 10_000), i) for i in range(400)
    ]
    # distinct (key, ts) on the right: merge_asof ties would be ambiguous
    right_seen = set()
    right_rows = []
    for _ in range(300):
        k, t = rng.choice(keys), rng.randrange(0, 10_000)
        if (k, t) not in right_seen:
            right_seen.add((k, t))
            right_rows.append((k, t, float(len(right_rows))))
    left = spark.createDataFrame(left_rows, "sym string, ts long, lid long")
    right = spark.createDataFrame(right_rows, "sym string, ts long, px double")

    got = {
        (r.sym, r.ts, r.lid): r.px
        for r in asof_join(left, right, keys=["sym"], left_ts="ts", right_ts="ts").collect()
    }

    lp = pd.DataFrame(left_rows, columns=["sym", "ts", "lid"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["sym", "ts", "px"]).sort_values("ts")
    want_df = pd.merge_asof(lp, rp, on="ts", by="sym", direction="backward")
    for row in want_df.itertuples():
        want_px = None if pd.isna(row.px) else row.px
        assert got[(row.sym, row.ts, row.lid)] == want_px


def test_bin_range_join_property_vs_bruteforce(spark):
    """Random points/intervals across many bin widths: binned join must
    equal the O(n*m) definition exactly (boundary semantics included)."""
    import random as rnd

    from clx_etl_spark.operators.range_join import bin_range_join

    rng = rnd.Random(11)
    points = [(f"u{rng.randrange(4)}", i, rng.randrange(0, 5_000)) for i in range(150)]
    intervals = []
    for i in range(60):
        s = rng.randrange(0, 5_000)
        intervals.append((f"u{rng.randrange(4)}", 100 + i, s, s + rng.randrange(1, 900)))
    want = sorted(
        (iid, pid)
        for (uk, iid, s, e) in intervals
        for (up, pid, t) in points
        if up == uk and s <= t < e
    )
    pdf = spark.createDataFrame(points, "user string, pid long, ms long")
    idf = spark.createDataFrame(intervals, "user string, iid long, start_ms long, end_ms long")
    for bin_ms in (64, 500, 1000, 4096):
        got = sorted(
            (r.iid, r.pid)
            for r in bin_range_join(
                pdf, idf, keys=["user"], point_ts="ms",
                start_col="start_ms", end_col="end_ms", bin_ms=bin_ms,
            ).collect()
        )
        assert got == want, f"bin_ms={bin_ms}"


def test_resample_chain_consistency(spark):
    """Continuous-aggregate property: resampling ticks -> 1h -> 1d equals
    ticks -> 1d directly (open/close/high/low/count all compose)."""
    import random as rnd

    from pyspark.sql import functions as F
    from clx_etl_spark.operators.resample import resample_ohlcv

    rng = rnd.Random(3)
    HOUR, DAY = 3_600_000, 86_400_000
    rows = [
        ("S", rng.randrange(0, 3 * DAY), float(rng.randrange(100, 200)), i)
        for i in range(2000)
    ]
    ticks = spark.createDataFrame(rows, "sym string, ts_ms long, price double, tid long").withColumn(
        "ord", F.col("ts_ms") * 1_000_000 + F.col("tid")
    )
    direct = resample_ohlcv(ticks, ["sym"], DAY, price_col="price", order_col="ord")

    hourly = resample_ohlcv(ticks, ["sym"], HOUR, price_col="price", order_col="ord")
    # chain: day open = min_by(hour open), close = max_by(hour close),
    # high = max(hour high), low = min(hour low), n = sum(hour n)
    day_from_hours = hourly.groupBy(
        "sym", (F.col("bucket_ms") - F.col("bucket_ms") % DAY).alias("bucket_ms")
    ).agg(
        F.min_by("open", "bucket_ms").alias("open"),
        F.max("high").alias("high"),
        F.min("low").alias("low"),
        F.max_by("close", "bucket_ms").alias("close"),
        F.sum("n_ticks").alias("n_ticks"),
    )
    a = sorted(tuple(r) for r in direct.collect())
    b = sorted(tuple(r) for r in day_from_hours.collect())
    assert a == b


def test_sketch_accuracy_bounds(spark):
    """HLL distinct within its rsd envelope; approx quantiles within the
    sketch's rank-error bound of the exact answers — the tolerance gate
    standing in for a hash oracle (estimates are engine-specific)."""
    from clx_etl_spark.operators.sketch import daily_distinct_approx, group_quantiles_approx

    DAY = 86_400_000
    rows = [
        (d * DAY + (i * 17) % DAY, i % (1000 * (d + 1)), float((i * 37) % 10_000))
        for d in range(3) for i in range(5000)
    ]
    ev = spark.createDataFrame(rows, "ts_ms long, user_id long, value double")
    approx = {r.day_ms // DAY: r.n_distinct_approx for r in daily_distinct_approx(ev).collect()}
    exact = {
        r.day: r.n for r in ev.groupBy((F.col("ts_ms") / DAY).cast("long").alias("day"))
        .agg(F.count_distinct("user_id").alias("n")).collect()
    }
    for day, n_exact in exact.items():
        assert abs(approx[day] - n_exact) <= max(0.10 * n_exact, 5), (day, approx[day], n_exact)

    q = group_quantiles_approx(
        ev.withColumn("g", (F.col("user_id") % 2)), ["g"], "value",
        probabilities=(0.5, 0.9), accuracy=10_000,
    ).collect()
    for r in q:
        # values are ~uniform on [0, 10000): medians near 5000, p90 near 9000
        assert abs(r.q0_5 - 5000) < 500 and abs(r.q0_9 - 9000) < 500


def test_simhash_matches_python_and_does_not_explode_bits(spark):
    """simhash == a hand-rolled Python reference, AND the plan carries one
    row per token into the aggregate — no tokens×bits row inflation (the
    earlier explode(sequence(0,31)) shape was a 32× scale-killer)."""
    import hashlib

    from clx_etl_spark.operators.dedup import simhash

    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy dog",  # identical -> same fp
        3: "pack my box with five dozen liquor jugs",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in simhash(docs, bits=32).collect()}

    def py_simhash(text: str, bits: int = 32) -> int:
        votes = [0] * bits
        for w in text.split():
            h = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
            for b in range(bits):
                votes[b] += 1 if (h >> b) & 1 else -1
        return sum(1 << b for b in range(bits) if votes[b] > 0)

    assert got == {d: py_simhash(t) for d, t in texts.items()}
    assert got[1] == got[2]

    # exactly one Generate (the token explode); no bit-sequence explode
    plan = simhash(docs, bits=32)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1
    assert "sequence(" not in plan


def test_operators_handle_empty_inputs(spark):
    """Empty partitions/tables are routine at scale — operators must
    return empty (not throw) with stable schemas."""
    from clx_etl_spark.operators.dedup import (
        connected_components, exact_dedup, minhash_near_duplicates, ngram_jaccard_pairs,
    )
    from clx_etl_spark.operators.gaps import gap_fill_plan
    from clx_etl_spark.operators.merge import asof_join
    from clx_etl_spark.operators.range_join import bin_range_join

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert exact_dedup(empty_docs).count() == 0
    assert minhash_near_duplicates(empty_docs).count() == 0
    assert ngram_jaccard_pairs(empty_docs).count() == 0
    assert connected_components(
        spark.createDataFrame([], "doc_a long, doc_b long")
    ).count() == 0

    empty_bars = spark.createDataFrame([], "symbol string, ts long")
    plan = gap_fill_plan(
        empty_bars, ["symbol"], start_ms=0, end_ms=10_000,
        ts_col="ts", interval_ms=1000, page_limit=10,
    )
    assert plan.count() == 0  # no keys -> nothing to fetch

    left = spark.createDataFrame([("A", 5, 1)], "sym string, ts long, lid long")
    right = spark.createDataFrame([], "sym string, ts long, px double")
    out = asof_join(left, right, keys=["sym"], left_ts="ts", right_ts="ts").collect()
    assert len(out) == 1 and out[0].px is None

    pts = spark.createDataFrame([], "user string, pid long, ms long")
    iv = spark.createDataFrame([("u", 1, 0, 100)], "user string, iid long, start_ms long, end_ms long")
    lo = bin_range_join(pts, iv, ["user"], point_ts="ms",
                        start_col="start_ms", end_col="end_ms", bin_ms=50, how="left_outer")
    assert lo.count() == 1 and lo.first().pid is None


def test_merge_gap_ranges_hypothesis_invariants(spark):
    """For arbitrary gap sets: merged output is per-key sorted, disjoint,
    span-capped, and covers exactly the union of the inputs."""
    from hypothesis import given, settings, strategies as st

    from clx_etl_spark.operators.gaps import merge_gap_ranges

    gap_strategy = st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(min_value=0, max_value=500),
            st.integers(min_value=0, max_value=80),
        ),
        min_size=1,
        max_size=12,
    )

    @settings(max_examples=15, deadline=None)
    @given(gap_strategy)
    def check(raw):
        gaps = [(k, s, s + w) for k, s, w in raw]
        df = spark.createDataFrame(gaps, "symbol string, gap_start long, gap_end long")
        out = merge_gap_ranges(df, ["symbol"], max_span_ms=100).collect()
        by_key: dict[str, list] = {}
        for r in out:
            assert r.gap_end - r.gap_start <= 100  # span cap
            by_key.setdefault(r.symbol, []).append((r.gap_start, r.gap_end))
        for k, ranges in by_key.items():
            ranges.sort()
            for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
                assert e1 < s2  # disjoint and sorted
        # coverage: every input instant is inside some output range
        for k, s, e in gaps:
            covered = [(a, b) for a, b in by_key.get(k, []) ]
            for t in range(s, e + 1, max(1, (e - s) // 5 or 1)):
                assert any(a <= t <= b for a, b in covered), (k, t)

    check()


def test_trained_ivf_clusters_and_recall(spark):
    """Deterministic 3-cluster corpus: trained centroids separate the
    clusters, cell search returns the same top-1 as brute force for
    within-cluster neighbors, and training is reproducible."""
    from clx_etl_spark.operators.similarity import (
        assign_ivf_cells, knn_bruteforce, knn_ivf_trained, train_ivf_centroids,
    )

    # 3 tight clusters around orthogonal axes (deterministic jitter)
    def vec(axis, j):
        v = [0.05 * ((j * 7 + d) % 5) for d in range(6)]
        v[axis] += 10.0
        return v

    rows = [(axis * 100 + j, vec(axis, j)) for axis in range(3) for j in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    c1 = train_ivf_centroids(emb, nlist=3, sample_target=120)
    c2 = train_ivf_centroids(emb, nlist=3, sample_target=120)
    assert c1 == c2  # deterministic training

    cells = assign_ivf_cells(emb, c1)
    by_cluster = {
        axis: {r.ivf_cell for r in cells.filter((F.col("vec_id") >= axis * 100) & (F.col("vec_id") < axis * 100 + 40)).collect()}
        for axis in range(3)
    }
    assert all(len(s) == 1 for s in by_cluster.values())  # clusters intact
    assert len(set().union(*by_cluster.values())) == 3    # and separated

    queries = emb.filter(F.col("vec_id").isin([0, 100, 200]))
    exact = {r.query_id: r.neighbor_id for r in knn_bruteforce(emb, queries, k=1).collect()}
    approx = {r.query_id: r.neighbor_id for r in knn_ivf_trained(emb, queries, nlist=3, k=1).collect()}
    assert exact == approx  # recall@1 = 1.0 when neighbors share the cell


def test_trained_ivf_multiprobe_recovers_boundary_neighbors(spark):
    """A query sitting between two clusters: single-probe misses its true
    nearest neighbor in the adjacent cell; nprobe=2 recovers it."""
    from clx_etl_spark.operators.similarity import knn_bruteforce, knn_ivf_trained

    def vec(axis, j, scale=10.0):
        v = [0.01 * ((j * 3 + d) % 4) for d in range(4)]
        v[axis] += scale
        return v

    corpus = (
        [(j, vec(0, j)) for j in range(30)]
        + [(100 + j, vec(1, j)) for j in range(30)]
        # boundary point: leans to axis-0 cell but its true NN is 999's twin
        + [(999, [7.0, 6.9, 0.0, 0.0]), (998, [7.1, 7.0, 0.0, 0.0])]
    )
    emb = spark.createDataFrame(corpus, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id") == 999)

    exact = knn_bruteforce(emb, queries, k=1).first().neighbor_id
    assert exact == 998
    multi = knn_ivf_trained(emb, queries, nlist=2, k=1, nprobe=2).first().neighbor_id
    assert multi == 998  # both cells probed -> true neighbor found


def test_approx_aggregates_within_declared_error(spark):
    """The engine's declared scale path for distinct counts and quantiles
    (BASELINE.md: 'at 100 TB swap to approx_percentile with a declared
    error bound'): HLL++ approx_count_distinct within its rsd, and
    approx_percentile within the rank tolerance implied by its accuracy
    parameter. Anchored against the exact operators on the same data."""
    from pyspark.sql import functions as F

    df = (
        spark.range(200_000)
        .select(
            (F.col("id") % 37_123).alias("user"),
            (F.hash(F.col("id")) % 10_000 / 100.0).alias("v"),
        )
        .cache()
    )
    exact_n = df.select(F.countDistinct("user")).collect()[0][0]
    approx_n = df.select(
        F.approx_count_distinct("user", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx_n - exact_n) / exact_n < 0.06  # 3 sigma of rsd=2%

    exact_p50, exact_p99 = df.select(
        F.expr("percentile(v, 0.5)"), F.expr("percentile(v, 0.99)")
    ).collect()[0]
    ap50, ap99 = df.select(
        F.expr("approx_percentile(v, 0.5, 1000)"),
        F.expr("approx_percentile(v, 0.99, 1000)"),
    ).collect()[0]
    # accuracy=1000 => rank error <= n/1000; values are ~uniform on
    # [-100, 100], so value error <= span * rank_error_frac * slack
    span = 200.0
    assert abs(ap50 - exact_p50) <= span * (1 / 1000) * 10
    assert abs(ap99 - exact_p99) <= span * (1 / 1000) * 10
    df.unpersist()


def test_stratified_sample_stable_under_growth(spark):
    """The hash-gate guarantee: a row's keep/drop fate never changes when
    the table grows (RNG sampling breaks this), and per-stratum rates land
    near their targets."""
    from clx_etl_spark.operators.sampling import stratified_sample

    rates = {"a": 100, "b": 500}
    small = spark.range(2_000).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS cls"
    )
    big = spark.range(10_000).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS cls"
    )
    kept_small = {
        r.id for r in stratified_sample(small, "id", rates, "cls").collect()
    }
    kept_big = {r.id for r in stratified_sample(big, "id", rates, "cls").collect()}
    # growth only adds kept rows, never flips old ones
    assert kept_small == {i for i in kept_big if i < 2_000}
    # rates within loose binomial bounds (n=5000 per class in `big`)
    n_a = sum(1 for i in kept_big if i % 2 == 0)
    n_b = sum(1 for i in kept_big if i % 2 == 1)
    assert 0.07 < n_a / 5_000 < 0.13
    assert 0.45 < n_b / 5_000 < 0.55


def test_temperature_mix_flattens_strata(spark):
    """tau->0 equalizes keep-rates toward the smallest stratum; tau=1
    keeps natural proportions; row fate is growth-stable."""
    from clx_etl_spark.operators.sampling import temperature_mix

    rows = [(i, "big" if i < 9000 else "small") for i in range(10000)]
    df = spark.createDataFrame(rows, "k long, src string")

    natural = temperature_mix(df, "k", "src", tau=1.0)
    by = {r[0]: r[1] for r in natural.groupBy("src").count().collect()}
    assert by["big"] == 9000 and by["small"] == 1000  # tau=1 keeps all

    flat = temperature_mix(df, "k", "src", tau=0.3)
    byf = {r[0]: r[1] for r in flat.groupBy("src").count().collect()}
    assert byf["small"] == 1000  # smallest stratum anchored at full rate
    # big stratum downsampled toward (9000/1000)^(0.3-1) ~ 0.215
    assert 0.15 * 9000 < byf["big"] < 0.28 * 9000
    # growth stability: the kept set is unchanged when new rows arrive
    # with the same per-stratum rates (hash-gate property)
    kept_small = {r.k for r in flat.filter("src='small'").collect()}
    bigger = spark.createDataFrame(
        rows + [(10000 + i, "small") for i in range(50)], "k long, src string"
    )
    flat2 = temperature_mix(bigger, "k", "src", tau=0.3)
    kept_small2 = {r.k for r in flat2.filter("src='small' and k < 10000").collect()}
    assert kept_small == kept_small2


def test_trend_slope_matches_closed_form(spark):
    """Known line y = 3x + 7 recovers slope/intercept exactly (after the
    1e-6 y-quantization); a constant-x group yields NULL slope."""
    from clx_etl_spark.operators.profile import trend_slope

    rows = [("a", x, 3.0 * x + 7.0) for x in range(100, 150)]
    rows += [("flat", 5, 1.0), ("flat", 5, 9.0)]
    df = spark.createDataFrame(rows, "g string, x long, y double")
    out = {r.g: r for r in trend_slope(df, "x", "y", "g").collect()}
    assert abs(out["a"].slope - 3.0) < 1e-6
    # intercept is at the group's centered origin (x = 100): 3*100+7
    assert abs(out["a"].intercept - 307.0) < 1e-4
    assert out["flat"].slope is None and out["flat"].intercept is None


def test_equiwidth_histogram_totals_and_edges(spark):
    """Bin counts sum to the group size, min lands in bin 1, max in the
    top bin, and a degenerate (constant) group collapses to bin 1."""
    from clx_etl_spark.operators.profile import equiwidth_histogram

    rows = [("a", float(v)) for v in range(0, 101)] + [("c", 4.2)] * 3
    df = spark.createDataFrame(rows, "g string, v double")
    out = equiwidth_histogram(df, "v", "g", n_bins=10).collect()
    a = {r.bin: r.n for r in out if r.g == "a"}
    assert sum(a.values()) == 101
    assert set(a) == set(range(1, 11))
    assert a[10] == 11  # 90..100: the max folds into the top bin
    c = {r.bin: r.n for r in out if r.g == "c"}
    assert c == {1: 3}


def test_apply_changelog_cdc_semantics(spark):
    """Last-wins by (ts, seq); a delete-winner removes the key; an
    earlier delete is overridden by a later upsert."""
    from clx_etl_spark.sinks.upsert import apply_changelog

    log = spark.createDataFrame(
        [
            (1, 10, 1, "I", 1.0),
            (1, 20, 2, "U", 2.0),   # winner for key 1
            (2, 10, 3, "I", 5.0),
            (2, 30, 4, "D", 0.0),   # delete wins: key 2 absent
            (3, 10, 5, "D", 0.0),
            (3, 20, 6, "I", 9.0),   # re-insert after delete: key 3 present
            (4, 40, 7, "U", 3.0),
            (4, 40, 8, "D", 0.0),   # same ts: seq 8 wins -> absent
        ],
        "k long, ts long, seq long, op string, v double",
    )
    out = {r.k: (r.op, r.v) for r in apply_changelog(
        log, keys=["k"], ts_col="ts", order_cols=["seq"]
    ).collect()}
    assert out == {1: ("U", 2.0), 3: ("I", 9.0)}


def test_curation_attribution_consistent_with_gate(spark):
    """'kept' under attribution == the curate_corpus output set, and each
    non-kept doc is labeled with the FIRST failing gate in order."""
    from clx_etl_spark.operators.text import curate_corpus, curation_attribution

    en = "the quick brown fox jumps over the lazy dog and runs far away today"
    docs = spark.createDataFrame(
        [
            (1, en),                       # kept
            (2, en),                       # duplicate of 1
            (3, "short text only"),        # too_short
            (4, ("la " * 20).strip()),     # repetitive -> low_uniqueness
            (5, "der die und das ist von mit den war nicht auch einem haus"),  # language (de)
        ],
        "doc_id long, text string",
    )
    attr = {r.doc_id: r.drop_reason for r in curation_attribution(docs).collect()}
    assert attr[2] == "duplicate"
    assert attr[3] == "too_short"
    assert attr[4] == "low_uniqueness"
    assert attr[5] == "language"
    kept_ids = {r.doc_id for r in curate_corpus(docs).collect()}
    assert kept_ids == {d for d, why in attr.items() if why == "kept"}


def test_winsorize_clamps_to_group_percentiles(spark):
    from clx_etl_spark.operators.curation import winsorize

    rows = [("a", float(v)) for v in range(1, 101)] + [("a", 1e6), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = winsorize(df, "v", "g", lo_p=0.1, hi_p=0.9)
    a = out.filter("g = 'a'").collect()
    assert max(r.v_w for r in a) == max(r._w_hi for r in a) < 1e6
    assert min(r.v_w for r in a) == min(r._w_lo for r in a) > 1.0
    # singleton group: percentiles degenerate to the value, nothing capped
    b = out.filter("g = 'b'").collect()
    assert [r.v_w for r in b] == [5.0]


def test_containment_catches_inclusion_jaccard_misses(spark):
    """A short doc quoted verbatim inside a long one: containment 1.0,
    Jaccard far below any dedup threshold — the asymmetric detector must
    flag it and report both directions correctly."""
    from clx_etl_spark.operators.dedup import (
        containment_pairs, prefix_filter_jaccard_pairs)

    quote = "the quick brown fox jumps over the lazy dog tonight"  # 10 toks
    filler = " ".join(f"u{i} v{i} w{i}" for i in range(20))  # 60 unique toks
    docs = spark.createDataFrame(
        [(1, quote), (2, f"{filler} {quote}")],
        "doc_id long, text string",
    )
    out = containment_pairs(docs, k=3, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.cont_a_in_b == 1.0  # every shingle of the quote is in doc 2
    assert r.cont_b_in_a < 0.2 and r.jaccard < 0.2
    # symmetric Jaccard at 0.5 misses this pair entirely
    assert prefix_filter_jaccard_pairs(docs, threshold_num=1, threshold_den=2).count() == 0


def test_bloom_decontaminate_never_false_negative(spark):
    """Bloom hits must be a superset of exact hits per doc (overcount
    only), and the bitmap stays within m/32 words however many grams the
    benchmark holds."""
    from clx_etl_spark.operators.curation import (
        BLOOM_M, bloom_build, bloom_decontaminate, decontaminate)
    from clx_etl_spark.operators.dedup import shingle_sets

    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(50)]
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))
    bench = spark.createDataFrame(
        [(100 + i, mk(12)) for i in range(5)], "doc_id long, text string"
    )
    leaky = bench.first().text  # verbatim leak of a benchmark doc
    train = spark.createDataFrame(
        [(1, leaky), (2, mk(20)), (3, mk(20)), (4, mk(20))],
        "doc_id long, text string",
    )
    exact = {
        r.doc_id: r.n_contaminated
        for r in decontaminate(train, bench).collect()
    }
    bloom = {
        r.doc_id: r.n_bloom_hits
        for r in bloom_decontaminate(train, bench).collect()
    }
    assert set(bloom) == set(exact)
    assert all(bloom[d] >= exact[d] for d in exact)
    assert bloom[1] == exact[1]  # the full-leak doc: every gram hits

    grams = shingle_sets(bench, "text", "doc_id", 3).select("shingle").distinct()
    assert bloom_build(grams, "shingle").count() <= BLOOM_M // 32


def test_cms_overestimates_and_merges(spark):
    """Count-min invariants: every estimate >= the true count (never
    under), and the sketch of a union equals the cell-wise sum of the
    parts' sketches (mergeability — the 100 TB property)."""
    from clx_etl_spark.operators.sketch import cms_build, cms_estimate

    rows_a = [(f"k{i % 37}",) for i in range(1000)]
    rows_b = [(f"k{i % 53}",) for i in range(800)]
    a = spark.createDataFrame(rows_a, "key string")
    b = spark.createDataFrame(rows_b, "key string")
    both = a.union(b)

    truth = {r.key: r[1] for r in both.groupBy("key").count().collect()}
    counters = cms_build(both, "key")
    est = {
        r.key: r.cms_est
        for r in cms_estimate(both.distinct(), counters, "key").collect()
    }
    assert set(est) == set(truth)
    assert all(est[k] >= truth[k] for k in truth)

    merged = (
        cms_build(a, "key")
        .union(cms_build(b, "key"))
        .groupBy("j", "cell")
        .agg(F.sum("c").alias("c"))
    )
    direct = {(r.j, r.cell): r.c for r in counters.collect()}
    summed = {(r.j, r.cell): r.c for r in merged.collect()}
    assert direct == summed


def test_temperature_mix_sqrt_rates_and_agreement(spark):
    """The tau=1/2 closed form: rarest stratum keeps everything, others
    keep floor(1000*sqrt(min/n)) permille; the kept set agrees with
    stratified_sample at those same rates (shared gate hash)."""
    import math

    from clx_etl_spark.operators.sampling import (
        stratified_sample, temperature_mix_sqrt)

    rows = [(i, "big" if i < 4000 else "small") for i in range(4500)]
    df = spark.createDataFrame(rows, "k long, src string")
    kept = temperature_mix_sqrt(df, "k", "src").cache()
    rates = {r.src: r.rate_pm for r in kept.select("src", "rate_pm").distinct().collect()}
    assert rates["small"] == 1000
    assert rates["big"] == math.floor(1000.0 * math.sqrt(500 / 4000))
    expected = stratified_sample(df, "k", rates, "src")
    assert {r.k for r in kept.collect()} == {r.k for r in expected.collect()}


def test_incremental_rollup_touches_only_affected_buckets(spark, tmp_path):
    """New fine rows for hour 1 rebuild ONLY hour 1's coarse partition:
    hour 0's parquet files are untouched on disk, and a late amend to an
    already-rolled bucket rebuilds that bucket from stored truth."""
    import glob
    import os

    from clx_etl_spark.operators.resample import incremental_rollup, resample_ohlcv

    HOUR = 3_600_000
    BASE = 1_704_067_200_000
    fine_path = str(tmp_path / "fine")
    coarse_path = str(tmp_path / "coarse")
    fine_schema = "symbol string, ts_ms long, price double, uid long"

    def fine_rows(hour, n, px0):
        return [("BTC", BASE + hour * HOUR + i * 60_000, px0 + i, hour * 100 + i)
                for i in range(n)]

    spark.createDataFrame(fine_rows(0, 5, 10.0), fine_schema).write.parquet(fine_path)
    full = resample_ohlcv(
        spark.read.parquet(fine_path), ["symbol"], HOUR,
        price_col="price", order_col="uid",
    )
    from clx_etl_spark.sinks.upsert import overwrite_partitions

    overwrite_partitions(full, coarse_path, ["bucket_ms"])
    h0_files = sorted(glob.glob(f"{coarse_path}/bucket_ms={BASE}/*.parquet"))
    h0_mtimes = [os.path.getmtime(f) for f in h0_files]

    # hour-1 rows arrive
    new1 = spark.createDataFrame(fine_rows(1, 4, 20.0), fine_schema)
    new1.write.mode("append").parquet(fine_path)
    n = incremental_rollup(
        spark, new1, fine_path, coarse_path, ["symbol"], HOUR,
        price_col="price",
    )
    assert n == 1
    coarse = {r.bucket_ms: r for r in spark.read.parquet(coarse_path).collect()}
    assert coarse[BASE].open == 10.0 and coarse[BASE].close == 14.0
    assert coarse[BASE + HOUR].open == 20.0 and coarse[BASE + HOUR].close == 23.0
    # hour 0 files untouched byte-for-byte
    assert [os.path.getmtime(f) for f in h0_files] == h0_mtimes

    # late amend inside hour 0: bucket rebuilt from stored truth
    amend = spark.createDataFrame(
        [("BTC", BASE + 30 * 60_000, 99.0, 999)], fine_schema
    )
    amend.write.mode("append").parquet(fine_path)
    incremental_rollup(
        spark, amend, fine_path, coarse_path, ["symbol"], HOUR, price_col="price"
    )
    coarse = {r.bucket_ms: r for r in spark.read.parquet(coarse_path).collect()}
    assert coarse[BASE].high == 99.0 and coarse[BASE].close == 99.0  # uid 999 latest
    assert coarse[BASE].n_ticks == 6


def test_profile_columns_one_scan(spark):
    from clx_etl_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")], "k long, v string"
    )
    out = {r.column: r for r in profile_columns(df).collect()}
    assert out["k"].n_rows == 4 and out["k"].n_nulls == 1 and out["k"].n_distinct == 3
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 2
    # approx path runs and is sane
    ap = {r.column: r for r in profile_columns(df, approx=True).collect()}
    assert ap["v"].n_distinct >= 1


def test_session_queries_agree_on_boundaries(spark):
    """session_revenue and w3_islands_sessionize derive sessions
    independently (operator vs inline windows): their (user, seq) ->
    n_events maps must be identical."""
    from clx_etl_spark.queries import load_all

    reg = load_all()
    sf = "/root/testdata/sf0.001"
    a = {
        (r.user_id, r.session_seq): r.n_events
        for r in reg["w3_islands_sessionize"].fn(spark, sf).collect()
    }
    b = {
        (r.user_id, r.session_seq): r.n_events
        for r in reg["session_revenue"].fn(spark, sf).collect()
    }
    assert a == b


def test_gap_fill_plan_property_detect_fill_detect_is_empty(spark):
    """Property (SURVEY §5.3, reference _base_.py:227-245 semantics):
    for random stored-bar subsets, (1) plan ranges are per-key sorted,
    disjoint, interval-aligned, each spanning <= page_limit*interval;
    (2) synthesizing exactly the planned bars and re-planning yields no
    gaps (detect ∘ fill ∘ detect = ∅); (3) stored ∪ filled covers the
    whole requested grid. Seeded loop (hypothesis-style, Spark-friendly
    example count)."""
    import random as _random

    from clx_etl_spark.operators.gaps import gap_fill_plan

    n_bars = 48
    start, end = FX.BASE_TS, FX.BASE_TS + (n_bars - 1) * FX.MIN
    grid = {start + i * FX.MIN for i in range(n_bars)}
    rng = _random.Random(20260813)
    for trial in range(12):
        limit = rng.randrange(2, 13)
        keep = rng.sample(sorted(grid), rng.randrange(1, n_bars + 1))
        stored = spark.createDataFrame(
            [("A", t) for t in keep], "symbol string, ts long"
        )
        plan = gap_fill_plan(
            stored, ["symbol"], start, end, ts_col="ts",
            interval_ms=FX.MIN, page_limit=limit,
        )
        ranges = sorted(
            (r.gap_start, r.gap_end) for r in plan.collect()
        )
        filled = set()
        prev_end = None
        for gs, ge in ranges:
            assert gs <= ge
            assert (gs - start) % FX.MIN == 0, (trial, gs)
            assert ge - gs <= limit * FX.MIN, (trial, gs, ge, limit)
            if prev_end is not None:
                assert gs > prev_end, (trial, ranges)  # disjoint + sorted
            prev_end = ge
            t = gs
            while t <= ge:
                filled.add(t)
                t += FX.MIN
        # NB: planned ranges MAY cover stored bars — merging coalesces gaps
        # across small stored islands by design (one API page beats two
        # requests; reference _base_.py:227-245) and the sink upsert makes
        # the re-fetch idempotent. The contract is coverage, not disjointness
        # from stored.
        # full coverage of the requested grid
        assert set(keep) | filled == grid, (trial, sorted(grid - set(keep) - filled))
        # detect ∘ fill ∘ detect = ∅
        refetched = stored.unionByName(
            spark.createDataFrame([("A", t) for t in sorted(filled)],
                                  "symbol string, ts long")
        ) if filled else stored
        again = gap_fill_plan(
            refetched, ["symbol"], start, end, ts_col="ts",
            interval_ms=FX.MIN, page_limit=limit,
        )
        assert again.count() == 0, (trial, again.collect())


def test_incremental_near_duplicates_batch_vs_corpus(spark):
    from clx_etl_spark.operators.dedup import incremental_near_duplicates

    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "the quick brown fox jumps over the lazy cat"),
            (12, "completely different text with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (20, "the quick brown fox jumps over the lazy dog"),  # dup of 10 AND near 11
            (21, "fresh unseen content nothing like the corpus rows today"),
            (22, "the quick brown fox jumps over the lazy dog"),  # batch-internal dup of 20
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in incremental_near_duplicates(
        corpus, batch, k=3, num_perm=16, bands=8, threshold=0.5
    ).collect()}
    # best match wins: exact dup (jaccard 1.0) beats the 0.75 near-dup
    assert out[20].dup_of == 10 and out[20].jaccard == 1.0
    # batch-internal duplicates are NOT paired with each other — both map
    # to their corpus match independently
    assert out[22].dup_of == 10 and out[22].jaccard == 1.0
    # fresh content yields no row at all
    assert 21 not in out
    # corpus docs never appear on the batch side of the output
    assert set(out) <= {20, 22}


def test_quantize_int8_bounds_and_fidelity(spark):
    import math

    from clx_etl_spark.operators.similarity import cosine_sim, quantize_int8

    df = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5, 2.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),   # zero vector: scale 0, no NaN
            (3, [127.0]),                # exact power: code == 127
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert out[2].scale == 0.0 and list(out[2].qvec) == [0, 0, 0, 0]
    assert out[2].max_abs_err == 0.0
    assert out[3].qvec == [127]
    r = out[1]
    assert math.isclose(r.scale, 2.0 / 127.0)
    # reconstruction error bounded by half a quantization step
    assert r.max_abs_err <= r.scale / 2 + 1e-12
    assert all(-127 <= q <= 127 for q in r.qvec)
    # dequantized vector stays nearly parallel to the original
    from pyspark.sql import functions as F

    deq = quantize_int8(df).filter(F.col("vec_id") == 1).select(
        F.transform(
            "qvec", lambda q: (q.cast("double") * F.col("scale")).cast("float")
        ).alias("d")
    )
    orig = df.filter(F.col("vec_id") == 1).select("embedding")
    both = orig.crossJoin(deq).select(
        cosine_sim(F.col("embedding"), F.col("d")).alias("cos")
    )
    assert both.collect()[0].cos > 0.999


def test_pq_roundtrip_and_recall(spark):
    """PQ codebooks: deterministic training, codes pick the nearest
    sub-centroid, reconstruction lands near the original, and PQ ANN
    recall@1 matches brute force on a well-separated corpus."""
    from clx_etl_spark.operators.similarity import (
        knn_bruteforce, knn_pq, pq_assign, pq_reconstruct, pq_train,
    )

    # 3 tight clusters around orthogonal axes in 8 dims
    def vec(axis, j):
        v = [0.05 * ((j * 7 + d) % 5) for d in range(8)]
        v[axis] += 10.0
        return v

    rows = [(axis * 100 + j, vec(axis, j)) for axis in range(3) for j in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    b1 = pq_train(emb, m=4, k=8, sample_target=120)
    b2 = pq_train(emb, m=4, k=8, sample_target=120)
    assert b1 == b2  # deterministic
    assert len(b1) == 4 and all(len(book) == 8 and len(book[0]) == 2 for book in b1)

    coded = pq_assign(emb, b1)
    codes = {r.vec_id: list(r.pq_codes) for r in coded.collect()}
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in codes.values())

    # reconstruction error small relative to vector norm (clusters are tight)
    recon = coded.select(
        "vec_id", "embedding", pq_reconstruct(b1).alias("recon")
    ).collect()
    import math

    for r in recon:
        err = math.sqrt(sum((a - b) ** 2 for a, b in zip(r.embedding, r.recon)))
        norm = math.sqrt(sum(a * a for a in r.embedding))
        assert err / norm < 0.05, (r.vec_id, err, norm)

    queries = emb.filter(F.col("vec_id").isin([0, 100, 200]))
    exact = {r.query_id: r.neighbor_id for r in knn_bruteforce(emb, queries, k=1).collect()}
    approx = {r.query_id: r.neighbor_id for r in knn_pq(emb, queries, m=4, k_codes=8, k=1).collect()}
    assert exact == approx  # recall@1 = 1.0 on separated clusters


def test_pq_validates_dims(spark):
    import pytest as _pytest

    from clx_etl_spark.operators.similarity import pq_train

    emb = spark.createDataFrame(
        [(i, [float(i), 0.0, 1.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    with _pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=2, k=4, sample_target=40)


def test_incremental_dedup_with_prebuilt_index(spark, tmp_path):
    """The corpus index survives a parquet round trip (the production
    persist-once path) and yields identical matches."""
    from clx_etl_spark.operators.dedup import (
        build_near_dup_index, incremental_near_duplicates,
    )

    corpus = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),
            (11, "entirely unrelated corpus content sits right here now"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(20, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    sh, idx = build_near_dup_index(corpus)
    sh.write.parquet(str(tmp_path / "sh"))
    idx.write.parquet(str(tmp_path / "idx"))
    restored = (
        spark.read.parquet(str(tmp_path / "sh")),
        spark.read.parquet(str(tmp_path / "idx")),
    )
    live = incremental_near_duplicates(corpus, batch).collect()
    cached = incremental_near_duplicates(None, batch, corpus_index=restored).collect()
    assert [tuple(r) for r in live] == [tuple(r) for r in cached] == [(20, 10, 1.0)]


def test_incremental_dedup_bucket_cap_bounds_fanout(spark):
    """A viral corpus bucket (many identical docs) fans a colliding batch
    doc out to every member; max_bucket_size bounds the fan-out while
    still matching against the surviving members."""
    from clx_etl_spark.operators.dedup import incremental_near_duplicates

    viral = "the exact same boilerplate text repeated across the corpus"
    corpus = spark.createDataFrame(
        [(i, viral) for i in range(30)], "doc_id long, text string"
    )
    batch = spark.createDataFrame([(100, viral)], "doc_id long, text string")

    full = incremental_near_duplicates(corpus, batch)
    capped = incremental_near_duplicates(corpus, batch, max_bucket_size=3)
    # both still find a best match (smallest corpus id, jaccard 1.0)
    assert full.collect()[0].dup_of == 0 == capped.collect()[0].dup_of


def test_eval_holdout_covers_rare_strata(spark):
    """The coverage property a permille hash split lacks: every stratum
    yields exactly min(k, stratum size) holdout rows, including a
    3-doc stratum; membership is hash-determined, not positional."""
    from pyspark.sql import Window

    from clx_etl_spark.operators.sampling import _hash_bucket

    rows = [(i, "big") for i in range(500)] + [(1000 + i, "rare") for i in range(3)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    g = docs.select("doc_id", "lang", _hash_bucket(F.col("doc_id"), mod=1 << 62).alias("gh"))
    w = Window.partitionBy("lang").orderBy("gh", "doc_id")
    held = g.withColumn("rn", F.row_number().over(w)).filter("rn <= 25")
    by = {r[0]: r[1] for r in held.groupBy("lang").count().collect()}
    assert by == {"big": 25, "rare": 3}


def test_substring_runs_fuzz_vs_python_truth(spark):
    """Uncapped substring_run_pairs equals an independent Python truth
    (diagonal scan over token equality) on random tiny-vocab docs —
    duplicate grams, overlapping runs, and run-boundary cases included."""
    import random

    from clx_etl_spark.operators.dedup import substring_run_pairs

    K, MIN_RUN = 3, 4
    rng = random.Random(41)
    vocab = ["a", "b", "c", "d"]

    def truth(docs):
        out = set()
        for ai in range(len(docs)):
            for bi in range(ai + 1, len(docs)):
                ta, tb = docs[ai][1], docs[bi][1]
                for d in range(-(len(tb) - 1), len(ta)):
                    run = 0
                    for i in range(max(0, d), min(len(ta), len(tb) + d) + 1):
                        match = (
                            i < len(ta)
                            and 0 <= i - d < len(tb)
                            and ta[i] == tb[i - d]
                        )
                        if match:
                            run += 1
                        else:
                            if run >= max(MIN_RUN, K):
                                out.add(
                                    (docs[ai][0], docs[bi][0],
                                     i - run + 1, i - run - d + 1, run)
                                )
                            run = 0
        return out

    for trial in range(4):
        docs = [
            (i, [rng.choice(vocab) for _ in range(rng.randrange(0, 15))])
            for i in range(8)
        ]
        sdf = spark.createDataFrame(
            [(i, " ".join(t)) for i, t in docs], "doc_id long, text string"
        )
        got = {
            (r.doc_a, r.doc_b, r.start_a, r.start_b, r.run_tokens)
            for r in substring_run_pairs(
                sdf, k=K, min_run_tokens=MIN_RUN, max_doc_freq=10**9
            ).collect()
        }
        assert got == truth(docs), (trial, got ^ truth(docs))


def test_pagerank_matches_integer_python_mirror_exactly(spark):
    """The fixed-point PageRank equals a pure-Python mirror using the
    identical integer arithmetic — bit-exact, any partitioning."""
    from clx_etl_spark.operators.graph import (DAMPING_DEN, DAMPING_NUM,
                                               RANK_SCALE, pagerank)

    # star (0-1,0-2,0-3) + a 2-cycle (4-5) + a triangle (6,7,8)
    pair_list = [(0, 1), (0, 2), (0, 3), (4, 5), (6, 7), (7, 8), (6, 8)]
    pairs = spark.createDataFrame(pair_list, "doc_a long, doc_b long")

    adj: dict[int, set[int]] = {}
    for a, b in pair_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    base = (DAMPING_DEN - DAMPING_NUM) * RANK_SCALE // DAMPING_DEN
    ranks = {n: RANK_SCALE for n in adj}
    for _ in range(10):
        sums = {n: 0 for n in adj}
        for n, nbrs in adj.items():
            c = ranks[n] // len(nbrs)
            for m in nbrs:
                sums[m] += c
        ranks = {n: base + (DAMPING_NUM * sums[n]) // DAMPING_DEN for n in adj}

    got = {r.doc_id: r.rank_q for r in pagerank(pairs).collect()}
    assert got == ranks
    # hub of the star outranks its leaves; symmetric nodes tie exactly
    assert got[0] > got[1] == got[2] == got[3]
    assert got[6] == got[7] == got[8]
    # repartitioned input -> identical ranks (order independence)
    got2 = {r.doc_id: r.rank_q for r in pagerank(pairs.repartition(7)).collect()}
    assert got2 == got


def test_pagerank_top_representatives_per_cluster(spark):
    from clx_etl_spark.operators.graph import top_representatives

    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (4, 5)], "doc_a long, doc_b long"
    )
    out = top_representatives(pairs).collect()
    reps = {r.component: r.doc_id for r in out if r.is_representative}
    # star cluster: the hub (highest rank) represents; 2-cycle: tie -> min id
    assert reps == {0: 0, 4: 4}
    assert sum(1 for r in out if r.is_representative) == 2
    assert len(out) == 6


def test_label_propagation_python_mirror_and_monotone(spark):
    from clx_etl_spark.operators.graph import label_propagation

    # path graph 0-1-2-3-4, seeds at the ends with different labels
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    seeds = spark.createDataFrame(
        [(0, 7), (1, None), (2, None), (3, None), (4, 9)],
        "vec_id long, label int",
    )
    adj = {0: {1}, 1: {0, 2}, 2: {1, 3}, 3: {2, 4}, 4: {3}}
    labels = {0: 7, 4: 9}
    for _ in range(3):
        new = dict(labels)
        for n in adj:
            if n in labels:
                continue
            votes = {}
            for m in adj[n]:
                if m in labels:
                    votes[labels[m]] = votes.get(labels[m], 0) + 1
            if votes:
                new[n] = min(votes, key=lambda l: (-votes[l], l))
        labels = new
    got = {r.vec_id: r.label for r in label_propagation(pairs, seeds).collect()}
    assert got == {0: 7, 1: 7, 2: 7, 3: 9, 4: 9}  # node 2 tie -> min label
    assert got == labels
    # seeds never change and assignment is repartition-invariant
    got2 = {
        r.vec_id: r.label
        for r in label_propagation(pairs.repartition(5), seeds.repartition(3)).collect()
    }
    assert got2 == got


def test_minhash_lsh_recall_floor_vs_bruteforce(spark):
    """Characterize (and pin) LSH recall: over the sf0.001 documents, the
    banded MinHash candidate pairs must recover >= 90% of the true
    >= 0.5-Jaccard pairs (deterministic hashing -> a fixed number, so
    this is a regression bound, not a flaky sample), and every emitted
    pair must verify exactly (precision 1.0 by construction)."""
    from clx_etl_spark.catalog import load_table
    from clx_etl_spark.operators.dedup import minhash_near_duplicates
    from clx_etl_spark.queries.corpus import BANDS, NUM_PERM

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_near_duplicates(
            docs, k=3, num_perm=NUM_PERM, bands=BANDS, threshold=0.5
        ).collect()
    }
    # brute-force truth: exact Jaccard over 3-token shingle sets
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    sets = {}
    for doc_id, text in rows:
        toks = text.split()
        sets[doc_id] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } or {text}
    ids = sorted(sets)
    truth = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= 0.5:
                truth.add((a, b))
    assert truth, "fixture should contain true near-dups"
    assert got <= truth  # exact-Jaccard verification => no false positives
    recall = len(got & truth) / len(truth)
    assert recall >= 0.9, (recall, len(truth), len(got))


def test_connected_components_chain_graph_pointer_jump(spark):
    """r13: pointer-jumping shortcut — a 33-node path graph (diameter 32)
    must fully converge well inside 10 rounds, which pure one-hop
    min-label propagation cannot do (it needs ~diameter rounds). Also
    pins the fixed point: every node's component is the path's min id."""
    from clx_etl_spark.operators.dedup import connected_components

    n = 33
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    got = connected_components(pairs, max_iter=10).collect()
    assert len(got) == n
    assert all(r.component == 0 for r in got), sorted(
        (r.doc_id, r.component) for r in got
    )[:5]


def test_ngram_jaccard_stop_slice_exact(spark):
    """r13: the split intersection (n_inter = rare-common + stop-common)
    must reproduce FULL-set Jaccard when stop shingles (df > cap) exist —
    at bench SF the stop slice is empty, so this pins the non-empty leg.
    Docs share a boilerplate tail (df=4 > cap=3) plus varying bodies."""
    from clx_etl_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved worldwide"
    rows = [
        (1, "alpha beta gamma delta epsilon " + boiler),
        (2, "alpha beta gamma delta zeta " + boiler),
        (3, "alpha beta gamma eta theta " + boiler),
        (4, "iota kappa lam mu nu " + boiler),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in ngram_jaccard_pairs(
            df, k=3, threshold=0.1, max_doc_freq=3, min_common=1
        ).collect()
    }
    # brute force: candidates = pairs sharing >= 1 shingle with df <= 3,
    # verified on FULL shingle sets
    sets = {}
    for doc_id, text in rows:
        toks = text.split()
        sets[doc_id] = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
    from collections import Counter
    dfreq = Counter(s for ss in sets.values() for s in ss)
    rare = {d: {s for s in ss if dfreq[s] <= 3} for d, ss in sets.items()}
    truth = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if len(rare[a] & rare[b]) >= 1:
                j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
                if j >= 0.1:
                    truth[(a, b)] = j
    assert truth and any(dfreq[s] > 3 for s in dfreq)  # stop slice exercised
    assert got.keys() == truth.keys()
    for k in truth:
        assert abs(got[k] - truth[k]) == 0.0, (k, got[k], truth[k])


def test_srp_near_duplicates_unique_pairs(spark):
    """r13: the first-matching-band filter must emit each qualifying pair
    exactly once (it replaced the candidate distinct)."""
    from clx_etl_spark.catalog import load_table
    from clx_etl_spark.operators.similarity import srp_near_duplicates

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    pairs = srp_near_duplicates(emb, threshold=0.35, bands=4, bits_per_band=4)
    n = pairs.count()
    nd = pairs.select("doc_a", "doc_b").distinct().count()
    assert n == nd and n > 0
