"""Engine facade + declarative schedule tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from clx_etl_spark.api import Engine
from clx_etl_spark.plans.schedule import SCHEDULE, due


def test_engine_sql_and_table(spark):
    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    assert eng.table("nation").count() == 25
    out = eng.sql(
        "SELECT r_name, COUNT(*) AS n FROM nation JOIN region "
        "ON n_regionkey = r_regionkey GROUP BY r_name"
    )
    assert sum(r.n for r in out.collect()) == 25


def test_engine_runs_registered_query(spark):
    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    assert "q1_pricing_summary" in eng.query_names()
    df = eng.query("q1_pricing_summary")
    assert df.count() > 0 and "sum_qty" in df.columns


def test_engine_upsert_roundtrip(spark, tmp_path):
    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    tgt = str(tmp_path / "dim")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    eng.upsert(base, tgt, keys=["id"])
    eng.upsert(
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"),
        tgt, keys=["id"],
    )
    got = {r.id: r.v for r in spark.read.parquet(tgt).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_schedule_due_semantics():
    names = [j.name for j in SCHEDULE]
    assert len(names) == len(set(names))
    # cold start: everything due
    assert due({}, now_s=0) == list(SCHEDULE)
    # nothing due immediately after a full run
    last = {j.name: 1000.0 for j in SCHEDULE}
    assert due(last, now_s=1000.0) == []
    # the 30/60s feeds come due first
    soon = [j.name for j in due(last, now_s=1061.0)]
    assert "sync_kalshi" in soon and "sync_onchain" in soon
    assert "sync_symbols" not in soon
    # misfire recovery: long pause -> everything due exactly once
    assert due(last, now_s=1000.0 + 90_000) == list(SCHEDULE)


def test_schedule_flows_resolve():
    """Every scheduled job points at a real flow callable — no placeholder
    refs (each of the reference's 11 deployments has its own flow now)."""
    from clx_etl_spark.plans import flows

    for job in SCHEDULE:
        mod, fn = job.flow.split(".")
        assert mod == "flows"
        assert callable(getattr(flows, fn)), job.name
    # distinct pipelines map to distinct flows (klines share one by design)
    assert len({j.flow for j in SCHEDULE}) >= 9


def test_bench_headline_names_resolve():
    """Every bench.py HEADLINE name must exist in the registry — a query
    rename must not silently break the driver's per-round bench run."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from bench import HEADLINE

    from clx_etl_spark.queries import load_all

    reg = set(load_all())
    missing = [n for n in HEADLINE if n not in reg]
    assert not missing, missing
    assert len(set(HEADLINE)) == len(HEADLINE)  # no duplicates


def test_driver_contract_shape():
    """__spark_entry__ exposes the exact driver contract: queries() keys
    superset oracle_sql() keys, all callables, all SQL strings."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as entry

    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert all(isinstance(s, str) and s.strip() for s in osql.values())
    assert len(qs) >= 100


def test_engine_maintenance_surface(spark, tmp_path):
    from clx_etl_spark.api import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    prof = {r.column: r for r in eng.profile("orders", ["o_orderkey"]).collect()}
    assert prof["o_orderkey"].n_nulls == 0 and prof["o_orderkey"].n_distinct > 0

    df = spark.range(100).selectExpr("id AS x", "id % 7 AS y")
    eng.zorder(df, str(tmp_path / "z"), ["x", "y"], n_files=2)
    assert spark.read.parquet(str(tmp_path / "z")).count() == 100

    part = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-03")],
        "v long, dt_date string",
    )
    part.write.partitionBy("dt_date").parquet(str(tmp_path / "p"))
    assert eng.expire(str(tmp_path / "p"), "dt_date", keep_latest=1) == [
        "2024-01-01", "2024-01-02"
    ]


def test_engine_curation_surface(spark):
    from clx_etl_spark.api import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    docs = spark.createDataFrame(
        [
            (1, "mail a@b.org now the quick brown fox jumps over the dog"),
            (2, "the quick brown fox jumps over the dog mail a@b.org now"),
        ],
        "doc_id long, text string",
    )
    red = eng.redact(docs)
    assert {r.n_email for r in red.collect()} == {1}
    chunks = eng.chunk(docs, chunk_size=8, overlap=2)
    assert chunks.count() >= 2 and chunks.columns == [
        "doc_id", "chunk_id", "n_tokens", "chunk_text",
    ]
    idx = eng.dedup_index(docs.filter("doc_id = 1"))
    dups = eng.dedup_incoming(docs.filter("doc_id = 2"), idx, threshold=0.3)
    assert [r.dup_of for r in dups.collect()] == [1]
    merges, vocab = eng.train_tokenizer(docs, num_merges=5)
    assert len(merges) == 5
    enc = eng.tokenize(docs, vocab)
    assert enc.filter("size(syms) = 0").count() == 0


def test_engine_dataset_assembly_surface(spark):
    from pyspark.sql import functions as F

    from clx_etl_spark.api import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog", "en"),
            (2, "el rapido zorro marron salta sobre el perro", "es"),
            (3, "the lazy dog sleeps under the quick fox", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    lm = eng.lm_scores(docs)
    assert set(lm.columns) == {"doc_id", "n_bigrams", "sum_scaled", "avg_p"}
    assert lm.count() == 3
    iw = eng.importance_weights(docs, F.col("lang") == "en")
    w = {r.doc_id: r.avg_w for r in iw.collect()}
    assert w[1] > w[2] and w[3] > w[2]
    sp = eng.split(docs)
    assert sp.columns == ["doc_id", "text", "lang", "split"]
    assert set(r.split for r in sp.collect()) <= {"train", "val", "test"}


def test_engine_ann_surface(spark, tmp_path):
    from pyspark.sql import functions as F

    from clx_etl_spark.api import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    emb = eng.table("embeddings")
    path = str(tmp_path / "annidx")
    model = eng.ann_index(emb, path, nlist=4, m=4, k_codes=8)
    assert model["nlist"] == 4
    out = eng.ann_query(path, emb.filter(F.col("vec_id") < 3), k=2, nprobe=2)
    assert out.columns == ["query_id", "neighbor_id", "rank", "cosine"]
    assert out.count() == 6


def test_engine_similarity_curation_round4_surface(spark):
    from clx_etl_spark.api import Engine

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (3, "completely different words appear here in this document"),
        ],
        "doc_id long, text string",
    )
    runs = eng.substring_runs(docs)
    assert [(r.doc_a, r.doc_b, r.run_tokens) for r in runs.collect()] == [(1, 2, 10)]
    pairs = eng.jaccard_pairs_exact(docs)
    assert [(r.doc_a, r.doc_b, r.jaccard) for r in pairs.collect()] == [(1, 2, 1.0)]

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0], 0), (1, [0.9, 0.2], 0), (2, [0.7, 0.7], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    hn = eng.hard_negatives(emb, emb.filter("vec_id = 0"), k=1)
    assert [r.neighbor_id for r in hn.collect()] == [2]

    sampled = eng.temperature_sample(docs, "doc_id", "text")
    assert sampled.count() >= 1

    cms = eng.cms(docs, "doc_id")
    assert cms.columns == ["j", "cell", "c"]
    audit = eng.decontaminate_bloom(
        docs.filter("doc_id <> 1"), docs.filter("doc_id = 1")
    )
    hits = {r.doc_id: r.n_bloom_hits for r in audit.collect()}
    assert hits[2] == 8 and hits[3] == 0  # doc2 = verbatim copy, doc3 clean


def test_engine_monitoring_cdc_media_surface(spark):
    from clx_etl_spark.api import Engine
    from clx_etl_spark.operators.multimodal import media_assets

    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    ev = spark.createDataFrame(
        [("a", float(v)) for v in range(50)] + [("a", 1e9)],
        "g string, v double",
    )
    w = eng.winsorize(ev, "v", "g")
    assert max(r.v_w for r in w.collect()) < 1e9
    h = eng.histogram(ev, "v", "g", n_bins=5)
    assert sum(r.n for r in h.collect()) == 51
    t = eng.trend(
        spark.createDataFrame(
            [("g", x, 2.0 * x) for x in range(20)], "g string, x long, y double"
        ),
        "x", "y", "g",
    ).collect()
    assert abs(t[0].slope - 2.0) < 1e-6

    log = spark.createDataFrame(
        [(1, 1, 1, "I", 1.0), (1, 2, 2, "D", 0.0), (2, 1, 3, "I", 5.0)],
        "k long, ts long, seq long, op string, v double",
    )
    cur = eng.apply_changelog(log, ["k"], "ts", order_cols=["seq"]).collect()
    assert [(r.k, r.v) for r in cur] == [(2, 5.0)]

    docs = spark.createDataFrame(
        [(i, f"media {i % 3}") for i in range(9)], "doc_id long, text string"
    )
    assets = media_assets(docs, mime="video/fake")
    assert eng.scene_cuts(assets).columns == ["asset_id", "frame_idx", "prev_sig", "sig"]
    assert eng.audio_segments(assets).columns == [
        "asset_id", "seg_start_ms", "seg_end_ms", "n_windows"]
    dups = eng.phash_near_dups(assets).collect()
    assert {(r.asset_a, r.asset_b) for r in dups} >= {(0, 3), (1, 4)}  # text dups

    hold = eng.eval_holdout(
        spark.createDataFrame(
            [(i, "big") for i in range(100)] + [(200, "rare")],
            "doc_id long, lang string",
        ),
        "doc_id", "lang", k=10,
    )
    by = {r[0]: r[1] for r in hold.groupBy("lang").count().collect()}
    assert by == {"big": 10, "rare": 1}


def test_engine_rollup_kn_and_diff(spark, tmp_path):
    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")

    # incremental rollup facade: two refreshes == direct partial state
    from clx_etl_spark.operators.incremental import partial_daily_state

    ev = eng.table("events")
    path = str(tmp_path / "rollup")
    day = F.expr("ts_ms div 86400000")
    eng.refresh_rollup(ev.filter(day < 19723 + 10), path)
    eng.refresh_rollup(ev.filter(day >= 19723 + 10), path)
    got = {
        (r.day_id, r.event_type): (r.n, r.sum_v)
        for r in spark.read.parquet(path).collect()
    }
    want = {
        (r.day_id, r.event_type): (r.n, r.sum_v)
        for r in partial_daily_state(ev).collect()
    }
    assert got == want

    # KN scores facade: valid probabilities over a small slice
    scores = eng.kn_scores(eng.table("documents").limit(20)).collect()
    assert scores and all(0.0 < r.avg_p <= 1.0 for r in scores)

    # snapshot-diff facade
    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string")
    new = spark.createDataFrame([(2, "B"), (3, "c"), (4, "d")], "id long, v string")
    diff = {r.id: r.change_type for r in eng.diff_snapshots(old, new, ["id"]).collect()}
    assert diff == {1: "removed", 2: "changed", 4: "added"}


def test_engine_versioned_table_facade(spark, tmp_path):
    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    path = str(tmp_path / "vt")
    assert eng.commit_version(
        spark.createDataFrame([(1, "a")], "id long, v string"), path
    ) == 0
    assert eng.commit_version(
        spark.createDataFrame([(2, "b")], "id long, v string"), path
    ) == 1
    assert {r.id for r in eng.read_version(path, 0).collect()} == {1}
    assert {r.id for r in eng.read_version(path).collect()} == {1, 2}
    assert {r.id for r in eng.read_changes(path, 0).collect()} == {2}
    assert {r.id for r in eng.scan_version(path, "id", 2, 9).collect()} == {2}
    # composes with the snapshot diff
    diff = eng.diff_snapshots(
        eng.read_version(path, 0), eng.read_version(path, 1), ["id"]
    )
    assert {(r.id, r.change_type) for r in diff.collect()} == {(2, "added")}


def test_engine_graph_facade(spark):
    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    pairs = spark.createDataFrame([(0, 1), (0, 2), (3, 4)], "doc_a long, doc_b long")
    pr = {r.doc_id: r.rank_q for r in eng.pagerank(pairs).collect()}
    assert pr[0] > pr[1] == pr[2] and pr[3] == pr[4]
    reps = {r.component: r.doc_id
            for r in eng.cluster_representatives(pairs).collect()
            if r.is_representative}
    assert reps == {0: 0, 3: 3}
    seeds = spark.createDataFrame(
        [(0, 5), (1, None), (2, None), (3, None), (4, 6)], "vec_id long, label int"
    )
    got = {r.vec_id: r.label for r in eng.propagate_labels(pairs, seeds).collect()}
    assert got == {0: 5, 1: 5, 2: 5, 3: 6, 4: 6}


def test_cli_list_and_run(spark, capsys):
    from clx_etl_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary\thash" in out
    assert "sketch_daily_users\trows-only" in out

    assert main([
        "run", "dedup_exact", "--sf", "/root/testdata/sf0.001",
        "--json", "--limit", "3",
    ]) == 0
    import json as _json

    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == 3
    assert "digest" in _json.loads(lines[0])

    assert main(["run", "no_such_query"]) == 2


def test_engine_round5_facade(spark, tmp_path):
    """Round-5 facade additions: table compaction, streaming dedup
    ingest, water-filling allocation."""
    from clx_etl_spark.api import Engine
    from clx_etl_spark.sinks.versioned import append_version, read_version

    eng = Engine(spark)

    # compaction
    path = str(tmp_path / "vt")
    for i in range(4):
        append_version(
            spark.createDataFrame([(i,)], "id long").coalesce(1), path
        )
    v = eng.compact_table_version(path, target_bytes=1 << 30)
    assert read_version(spark, path, v).count() == 4

    # water-filling: budget 100 over caps (10, 200, 300) ->
    # 10 saturates, the other two get 45 each
    caps = spark.createDataFrame(
        [("a", 10), ("b", 200), ("c", 300)], "source string, cap long"
    )
    got = {r.source: (r.alloc, r.saturated)
           for r in eng.allocate_mix(caps, budget=100).collect()}
    assert got == {"a": (10, True), "b": (45, False), "c": (45, False)}

    # streaming ingest facade wires through (smoke: one batch, two docs)
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string",
    ).coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.format("parquet")
        .schema("doc_id long, text string").load(src)
    )
    q = eng.ingest_dedup_stream(
        stream, str(tmp_path / "corpus"), str(tmp_path / "ck")
    )
    q.awaitTermination(120)
    assert spark.read.parquet(str(tmp_path / "corpus")).count() == 2


def test_engine_table_via_versioned(spark, tmp_path):
    from clx_etl_spark.api import Engine
    from clx_etl_spark.sinks.versioned import append_version, tag_version

    eng = Engine(spark)
    path = str(tmp_path / "vt")
    for i in range(2):
        append_version(spark.createDataFrame([(i,)], "id long"), path)
    tag_version(path, "first", version=0)
    assert eng.table(path, via="versioned").count() == 2
    assert eng.table(path, via="versioned", version=0).count() == 1
    assert eng.table(path, via="versioned", tag="first").count() == 1


def test_engine_round6_facade(spark, tmp_path):
    """Round-6 surface: bloom-indexed commits, MERGE triad with txn,
    and the streaming CDC apply wired through the Engine facade."""
    eng = Engine(spark, sf_dir="/root/testdata/sf0.001")
    path = str(tmp_path / "vt")
    eng.commit_version(
        spark.createDataFrame([(0, "a"), (100, "b")],
                              "id long, v string").coalesce(1),
        path, stats_cols=["id"], bloom_cols=["id"],
    )
    # point lookup in the interval gap: bloom-pruned to zero files
    from clx_etl_spark.sinks.versioned import pruned_file_count
    assert pruned_file_count(path, "id", 50, 50) == (0, 1)

    # MERGE triad: update 0, delete 100, insert 200; replayed txn no-ops
    v = eng.merge_table_version(
        spark.createDataFrame([(0, "a2"), (200, "c")], "id long, v string"),
        path, keys=["id"],
        deletes=spark.createDataFrame([(100,)], "id long"),
        txn=("api", 0),
    )
    assert eng.merge_table_version(
        spark.createDataFrame([(0, "a2")], "id long, v string"),
        path, keys=["id"], txn=("api", 0),
    ) == v
    assert {(r.id, r.v) for r in eng.read_version(path).collect()} == {
        (0, "a2"), (200, "c")
    }

    # streaming CDC apply end-to-end
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    schema = StructType([
        StructField("k", LongType()), StructField("ts_ms", LongType()),
        StructField("op", StringType()), StructField("v", StringType()),
    ])
    src, table, ck = str(tmp_path / "in"), str(tmp_path / "cdc"), str(tmp_path / "ck")
    spark.createDataFrame(
        [(1, 10, "I", "x"), (1, 20, "U", "y"), (2, 10, "I", "z"),
         (2, 30, "D", None)], schema
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.format("parquet").schema(schema).load(src)
    q = eng.apply_cdc_stream(stream, table, checkpoint=ck, keys=["k"])
    q.awaitTermination(120)
    assert {(r.k, r.v) for r in eng.read_version(table).collect()} == {(1, "y")}


def test_engine_table_via_clx_table(spark, tmp_path):
    """Engine.table(via="clx_table") reads the snapshot through the
    DSv2 source, honoring version time travel."""
    from clx_etl_spark.api import Engine
    from clx_etl_spark.sinks.versioned import append_version

    eng = Engine(spark)
    path = str(tmp_path / "vt")
    append_version(spark.createDataFrame([(1, "a")], "k long, v string"),
                   path, stats_cols=["k"])
    append_version(spark.createDataFrame([(2, "b")], "k long, v string"),
                   path, stats_cols=["k"])
    assert eng.table(path, via="clx_table").count() == 2
    assert eng.table(path, via="clx_table", version=0).count() == 1


def test_engine_metadata_aggregates_and_sql_table(spark, tmp_path):
    """Engine doors onto the r08 surface: table_count / table_min_max
    answer from metadata; create_sql_table opens pure-SQL DML, and the
    new rows are visible to the metadata count. Also pins the pre-r08
    fallback: a manifest without __rows__ keys still counts via one
    footer read per file."""
    import uuid as _uuid

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.api import Engine
    from clx_etl_spark.sinks.versioned import append_version

    eng = Engine(spark)
    path = str(tmp_path / "vt")
    append_version(
        spark.createDataFrame([(i, float(i)) for i in range(20)],
                              "id long, x double"),
        path, stats_cols=["id"])
    assert eng.table_count(path) == 20
    assert eng.table_min_max(path, "id") == (0, 19)
    t = f"clx_api_{_uuid.uuid4().hex[:8]}"
    try:
        eng.create_sql_table(t, path)
        spark.sql(f"INSERT INTO {t} VALUES (100, 1.0)")
        assert eng.table_count(path) == 21
        assert eng.table_min_max(path, "id") == (0, 100)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    # pre-r08 manifest compatibility: strip __rows__, count still exact
    m = V._read_manifest(path, V.latest_version(path))
    stats = {f: {c: v for c, v in per.items() if c != V._ROWS_KEY}
             for f, per in dict(m["stats"]).items()}
    V._commit(path, V.latest_version(path) + 1, m["files"], "overwrite",
              stats, txn=m.get("txn", {}))
    assert eng.table_count(path) == 21


def test_engine_graph_doors_canonicalize_pairs(spark):
    """r13 (ADVICE r12): the public graph doors accept messy caller pair
    tables — duplicates, reversed rows, self-pairs — and must produce the
    SAME ranks/labels as the clean unique-(a<b) form the operators
    require."""
    from clx_etl_spark.api import Engine

    eng = Engine(spark)
    clean = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    messy = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (2, 3), (6, 5), (4, 4)],
        "doc_a long, doc_b long",
    )
    r_clean = {(r.doc_id, r.rank_q) for r in eng.pagerank(clean, 3).collect()}
    r_messy = {(r.doc_id, r.rank_q) for r in eng.pagerank(messy, 3).collect()}
    assert r_clean == r_messy and r_clean

    seeds = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (5, "b"), (6, None)],
        "vec_id long, label string",
    )
    l_clean = {(r.vec_id, r.label)
               for r in eng.propagate_labels(clean, seeds).collect()}
    l_messy = {(r.vec_id, r.label)
               for r in eng.propagate_labels(messy, seeds).collect()}
    assert l_clean == l_messy and ("3", ) not in l_clean
