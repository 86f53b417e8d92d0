"""Multimodal plumbing tests: schema stability, Arrow batch iteration,
1:N expansion arithmetic, and the embedding handoff into similarity ops."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from clx_etl_spark.operators import multimodal as MM
from clx_etl_spark.operators.similarity import knn_bruteforce


def _docs(spark):
    rows = [(i, f"document body number {i} with words " * (i + 1)) for i in range(6)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_media_assets_schema_and_payload_roundtrip(spark):
    assets = MM.media_assets(_docs(spark))
    assert [f.simpleString() for f in assets.schema.fields] == [
        "asset_id:bigint", "mime:string", "payload:binary", "n_bytes:bigint",
    ]
    r = assets.filter(F.col("asset_id") == 2).first()
    assert bytes(r.payload).decode() == "document body number 2 with words " * 3
    assert r.n_bytes == len(bytes(r.payload))


def test_image_features_match_stub_decode(spark):
    assets = MM.media_assets(_docs(spark))
    feats = {r.asset_id: r for r in MM.image_features(assets).collect()}
    for i in range(6):
        payload = (f"document body number {i} with words " * (i + 1)).encode()
        expect = MM.decode_stub(payload)
        got = feats[i]
        assert got.sha256 == expect["sha256"] == hashlib.sha256(payload).hexdigest()
        assert (got.width, got.height) == (expect["width"], expect["height"])
        assert got.mean_brightness == expect["mean_brightness"]


def test_resize_plan_bounds_and_aspect(spark):
    plan = MM.resize_plan(MM.image_features(MM.media_assets(_docs(spark))), max_side=64)
    for r in plan.collect():
        assert 1 <= r.out_w <= 64 and 1 <= r.out_h <= 64
        assert max(r.out_w, r.out_h) == 64  # longest side hits the target
        # aspect preserved within integer floor
        assert abs(r.out_w / r.out_h - r.width / r.height) < 0.1


def test_frame_sample_expansion_count(spark):
    assets = MM.media_assets(_docs(spark))
    frames = MM.frame_sample(assets).collect()
    by_asset: dict[int, list] = {}
    for r in frames:
        by_asset.setdefault(r.asset_id, []).append(r)
    for aid, rows in by_asset.items():
        n = rows[0].n_frames
        assert len(rows) == n  # 1:N expansion exact
        assert sorted(r.frame_idx for r in rows) == list(range(n))
        assert all(r.frame_ts_ms == r.frame_idx * MM.FRAME_STRIDE_MS for r in rows)
        dur = MM.decode_stub(
            (f"document body number {aid} with words " * (aid + 1)).encode()
        )["duration_ms"]
        assert n == (dur + MM.FRAME_STRIDE_MS - 1) // MM.FRAME_STRIDE_MS


def test_media_embedding_feeds_similarity_ops(spark):
    emb = MM.media_embedding(MM.media_assets(_docs(spark)), dim=8)
    row = emb.first()
    assert len(row.embedding) == 8
    assert all(0.0 <= x <= 1.0 for x in row.embedding)
    # duplicate payloads -> identical embeddings -> cosine 1.0 neighbors
    base = MM.media_assets(_docs(spark))
    dup = base.withColumn("asset_id", F.col("asset_id") + 100)
    both = MM.media_embedding(base.unionByName(dup), dim=8).withColumnsRenamed(
        {"asset_id": "vec_id"}
    )
    out = knn_bruteforce(both, both.filter(F.col("vec_id") < 6), k=1)
    top = {r.query_id: (r.neighbor_id, r.cosine) for r in out.collect()}
    for q in range(6):
        assert top[q][0] == q + 100  # its clone is the nearest neighbor
        assert abs(top[q][1] - 1.0) < 1e-12


def test_scene_cuts_and_audio_segments_invariants(spark):
    """Composition invariants on the stub decode: every cut's jump
    exceeds the threshold; active segments are disjoint, aligned to the
    window grid, and jointly cover exactly the active windows."""
    from clx_etl_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(i, f"payload text {i} " * (i + 1)) for i in range(8)],
        "doc_id long, text string",
    )
    assets = MM.media_assets(docs, mime="video/fake")
    cuts = MM.scene_cuts(assets).collect()
    assert cuts  # stub signatures jump often
    assert all(abs(r.sig - r.prev_sig) > MM.SCENE_CUT_JUMP for r in cuts)
    assert all(r.frame_idx >= 1 for r in cuts)  # frame 0 has no prev

    wins = MM.audio_window_features(MM.media_assets(docs, mime="audio/fake"))
    active = {
        (r.asset_id, r.window_idx)
        for r in wins.collect()
        if r.rms >= 0.5
    }
    segs = MM.audio_active_segments(
        MM.media_assets(docs, mime="audio/fake")
    ).collect()
    covered = set()
    for s in segs:
        assert s.seg_start_ms % MM.AUDIO_WINDOW_MS == 0
        assert s.seg_end_ms - s.seg_start_ms == s.n_windows * MM.AUDIO_WINDOW_MS
        for i in range(s.n_windows):
            w_idx = s.seg_start_ms // MM.AUDIO_WINDOW_MS + i
            key = (s.asset_id, w_idx)
            assert key not in covered  # disjoint
            covered.add(key)
    assert covered == active


def test_phash_banding_complete_vs_bruteforce(spark):
    """Pigeonhole completeness: the 4-band candidate join finds EVERY
    pair with hamming <= 7 (brute-force cross-check over the computed
    phashes), and reports no pair above the threshold."""
    import itertools

    from clx_etl_spark.operators import multimodal as MM

    docs = spark.createDataFrame(
        [(i, f"asset body {i % 13} tail") for i in range(60)],  # dup groups
        "doc_id long, text string",
    )
    assets = MM.media_assets(docs, mime="image/fake")
    ph = {r.asset_id: r.phash for r in MM.phash_values(assets).collect()}
    expect = set()
    for a, b in itertools.combinations(sorted(ph), 2):
        if bin(ph[a] ^ ph[b]).count("1") <= 7:
            expect.add((a, b))
    got = {
        (r.asset_a, r.asset_b): r.hamming
        for r in MM.phash_near_duplicates(assets).collect()
    }
    assert set(got) == expect
    assert all(h <= 7 for h in got.values())
