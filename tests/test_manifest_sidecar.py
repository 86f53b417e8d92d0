"""Columnar stats sidecar (manifest scale-out): past a file-count
threshold, per-file min/max stats and key blooms move out of the
per-version manifest JSON into one parquet sidecar — the manifest keeps
the file list plus a pointer, and the planner reads only the columns it
prunes on. These tests pin the format switch, every consumer of the
stats map across the op surface, and sidecar lifecycle (CAS losers,
expiry). Threshold is forced to 0 so every stats-bearing commit
exercises the sidecar path."""

from __future__ import annotations

import glob
import json
import os

import pytest

import clx_etl_spark.sinks.versioned as V
from clx_etl_spark.sinks.versioned import (
    _manifest_path,
    _read_manifest,
    append_version,
    clone_table,
    compact_version,
    delete_version_dv,
    expire_versions,
    merge_version,
    pruned_file_count,
    read_version,
    scan_version,
)


@pytest.fixture(autouse=True)
def _sidecar_always(monkeypatch):
    monkeypatch.setattr(V, "_STATS_SIDECAR_MIN_FILES", 0)


def _seed(spark, path, blocks=(0, 100, 200), bloom=True):
    for lo in blocks:
        append_version(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(50)],
                "id long, v string",
            ).coalesce(1),
            path, stats_cols=["id"], bloom_cols=["id"] if bloom else None,
        )


def test_sidecar_replaces_inline_stats(spark, tmp_path):
    path = str(tmp_path / "vt")
    _seed(spark, path)
    raw = json.load(open(_manifest_path(path, 2)))
    # incremental carry (r09): each append writes one DELTA segment and
    # references its parent's segments — v2 lists all three
    assert raw["stats"] == {} and len(raw["stats_segments"]) == 3
    for seg in raw["stats_segments"]:
        assert os.path.exists(os.path.join(path, "_manifests", seg))
    # the delta segments are shared by reference with the parents
    raw1 = json.load(open(_manifest_path(path, 1)))
    assert raw["stats_segments"][:2] == raw1["stats_segments"]
    # the lazy mapping reconstitutes the FULL map (stats + blooms),
    # including entries carried forward from the earlier versions
    m = _read_manifest(path, 2)
    stats = dict(m["stats"])
    assert len(stats) == 3
    per = next(iter(stats.values()))
    assert any(c == "id" for c in per)
    assert any(c.startswith(V._BLOOM_KEY) for c in per)
    lo, hi = per["id"]
    assert isinstance(lo, int) and isinstance(hi, int)


def test_sidecar_scan_pruning_and_bloom_point_lookup(spark, tmp_path):
    path = str(tmp_path / "vt")
    _seed(spark, path)
    kept, total = pruned_file_count(path, "id", 100, 149)
    assert (kept, total) == (1, 3)
    # bloom gap: id 60 inside no file's range
    kept, _ = pruned_file_count(path, "id", 60, 60)
    assert kept == 0
    assert scan_version(spark, path, "id", 205, 205).count() == 1
    got = scan_version(spark, path, "id", 100, 149)
    assert got.count() == 50


def test_sidecar_merge_pruning_and_carry(spark, tmp_path):
    path = str(tmp_path / "vt")
    _seed(spark, path)
    batch = spark.createDataFrame([(5, "NEW")], "id long, v string")
    merge_version(batch, path, ["id"])
    df = read_version(spark, path)
    assert df.count() == 150
    assert df.filter("id = 5").collect()[0].v == "NEW"
    # stats carried through the merge commit still prune (the untouched
    # blocks rode by reference, with their sidecar-backed stats)
    kept, total = pruned_file_count(path, "id", 205, 205)
    assert kept == 1 and total >= 3


def test_sidecar_dv_delete_compact_clone_expire(spark, tmp_path):
    path = str(tmp_path / "vt")
    _seed(spark, path)
    v, nf, n = delete_version_dv(spark, path, "id", 110, 120)
    assert (nf, n) == (1, 11)
    assert read_version(spark, path).count() == 139
    # clone carries sidecar-backed stats into the clone's own manifest
    dst = str(tmp_path / "clone")
    clone_table(path, dst)
    assert read_version(spark, dst).count() == 139
    assert pruned_file_count(dst, "id", 205, 205)[0] == 1
    # compaction re-derives stats; expire reclaims orphaned sidecars
    compact_version(spark, path)
    assert read_version(spark, path).count() == 139
    before = set(glob.glob(os.path.join(path, "_manifests", "*-stats-*")))
    assert len(before) >= 4
    expire_versions(path, keep_latest=1)
    after = set(glob.glob(os.path.join(path, "_manifests", "*-stats-*")))
    assert len(after) == 1  # only the head's sidecar survives
    assert read_version(spark, path).count() == 139
    kept, total = pruned_file_count(path, "id", 130, 130)
    assert kept <= total  # post-compaction stats still answer


def test_sidecar_cas_loser_reclaims_its_sidecar(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    head_sc = json.load(open(_manifest_path(path, 0)))["stats_segments"][0]
    orig = V._commit
    fired = {}

    def racing(path_, version, files, op, stats=None, txn=None, **kw):
        if op == "overwrite" and not fired:
            fired["x"] = True
            append_version(
                spark.createDataFrame([(500, "x")], "id long, v string")
                .coalesce(1), path_, stats_cols=["id"])
        return orig(path_, version, files, op, stats, txn, **kw)

    monkeypatch.setattr(V, "_commit", racing)
    with pytest.raises(V.VersionConflictError):
        V.overwrite_version(
            spark.createDataFrame([(1, "y")], "id long, v string"),
            path, stats_cols=["id"])
    monkeypatch.setattr(V, "_commit", orig)
    # every surviving sidecar is referenced by a committed manifest
    referenced = set()
    for mp in glob.glob(os.path.join(path, "_manifests", "v*.json")):
        raw = json.load(open(mp))
        referenced.update(raw.get("stats_segments", []))
        if raw.get("stats_sidecar"):
            referenced.add(raw["stats_sidecar"])
    on_disk = {os.path.basename(p) for p in
               glob.glob(os.path.join(path, "_manifests", "*-stats-*"))}
    assert on_disk == referenced and head_sc in referenced


def test_sidecar_clx_table_pushdown(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from clx_etl_spark.sources.table_source import (_PushdownTableReader,
                                                    read_table_source)

    path = str(tmp_path / "vt")
    _seed(spark, path)
    sch = spark.createDataFrame([], "id long, v string").schema
    r = _PushdownTableReader(sch, {"path": path})
    list(r.pushFilters([EqualTo(("id",), 205)]))
    assert len(r.partitions()) == 1
    r2 = _PushdownTableReader(sch, {"path": path})
    list(r2.pushFilters([GreaterThanOrEqual(("id",), 100)]))
    assert len(r2.partitions()) == 2
    # filterless scan: no pruning, full row set, and no sidecar load
    r3 = _PushdownTableReader(sch, {"path": path})
    assert len(r3.partitions()) == 3
    assert read_table_source(spark, path).count() == 150


def test_sidecar_inline_below_threshold(spark, tmp_path, monkeypatch):
    """Small tables keep the inline, human-debuggable JSON form."""
    monkeypatch.setattr(V, "_STATS_SIDECAR_MIN_FILES", 200)
    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    raw = json.load(open(_manifest_path(path, 0)))
    assert raw["stats"] and "stats_sidecar" not in raw


def test_dv_map_sidecar_spill_readback_carry_expire(spark, tmp_path):
    """Past the threshold the manifest's file->dv-entries map moves to a
    parquet sidecar (r08): the JSON keeps only a pointer + the extra
    reader feature (old engines fail loudly instead of resurrecting
    deleted rows), reads/metadata/carry behave identically, and expiry
    reclaims the sidecar with its manifest."""
    path = str(tmp_path / "vt")
    _seed(spark, path)  # ids 0-49 / 100-149 / 200-249, one file each
    delete_version_dv(spark, path, "id", 0, 4)        # file 1
    delete_version_dv(spark, path, "id", 100, 104)    # file 2
    v = V.latest_version(path)
    raw = json.load(open(_manifest_path(path, v)))
    assert "dv" not in raw and raw["dv_sidecar"]
    assert set(raw["reader_features"]) == {"deletion-vectors", "dv-sidecar"}
    assert os.path.exists(os.path.join(path, "_manifests",
                                       raw["dv_sidecar"]))
    # lazy mapping reconstitutes the full map; reads apply the dvs
    m = _read_manifest(path, v)
    assert sum(e["n"] for es in m["dv"].values() for e in es) == 10
    got = {r.id for r in read_version(spark, path).collect()}
    assert got == ({*range(5, 50)} | {*range(105, 150)} | {*range(200, 250)})
    assert V.count_rows_meta(path) == 140
    # an append CARRIES the spilled dv map forward (re-spilled)
    append_version(
        spark.createDataFrame([(300, "v300")], "id long, v string"),
        path, stats_cols=["id"], bloom_cols=["id"])
    assert read_version(spark, path).count() == 141
    raw2 = json.load(open(_manifest_path(path, V.latest_version(path))))
    assert raw2["dv_sidecar"] and "dv" not in raw2
    # the DSv2 reader resolves the lazy dv map too: one partition per
    # file, tombstones applied executor-side from the sidecar-backed map
    from clx_etl_spark.sources.table_source import read_table_source

    got_sql = {r.id for r in
               read_table_source(spark, path).select("id").collect()}
    assert got_sql == got | {300}
    # compaction purges dvs -> dv-free manifest, no dv sidecar
    compact_version(spark, path)
    raw3 = json.load(open(_manifest_path(path, V.latest_version(path))))
    assert "dv_sidecar" not in raw3 and "dv" not in raw3
    # expiry reclaims every unreferenced dv sidecar alongside manifests
    expire_versions(path, keep_latest=1)
    leftover = [f for f in os.listdir(os.path.join(path, "_manifests"))
                if f.startswith("dv-v")]
    assert leftover == []


def test_incremental_segments_and_coalesce(spark, tmp_path, monkeypatch):
    """r09 incremental metadata: an append writes one O(batch) DELTA
    segment and carries the parent's segments by reference; every
    _STATS_SEGMENT_MAX'th carry coalesces into one full segment (the
    Delta-checkpoint cadence); expiry reclaims segments only when no
    surviving manifest references them."""
    import pyarrow.parquet as pq

    monkeypatch.setattr(V, "_STATS_SEGMENT_MAX", 4)
    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0, 100, 200, 300))
    mdir = os.path.join(path, "_manifests")
    raw3 = json.load(open(_manifest_path(path, 3)))
    assert len(raw3["stats_segments"]) == 4
    # each DELTA segment holds exactly its commit's one new file
    last = raw3["stats_segments"][-1]
    t = pq.read_table(os.path.join(mdir, last), columns=["file"])
    assert len(set(t["file"].to_pylist())) == 1
    # 5th append: parent already at the cadence -> coalesce to ONE
    _seed(spark, path, blocks=(400,))
    raw4 = json.load(open(_manifest_path(path, 4)))
    assert len(raw4["stats_segments"]) == 1
    coal = pq.read_table(
        os.path.join(mdir, raw4["stats_segments"][0]), columns=["file"])
    assert len(set(coal["file"].to_pylist())) == 5
    # planner answers identically across the whole carry chain
    kept, total = pruned_file_count(path, "id", 405, 405)
    assert (kept, total) == (1, 5)
    assert read_version(spark, path).count() == 250
    # shared segments survive expiry while ANY survivor references them
    expire_versions(path, keep_latest=2)  # keeps v3 (4 segs) + v4 (1)
    on_disk = {os.path.basename(p) for p in
               glob.glob(os.path.join(path, "_manifests", "*-stats-*"))}
    assert on_disk == set(raw3["stats_segments"]) | set(
        raw4["stats_segments"])
    expire_versions(path, keep_latest=1)  # only v4's coalesced segment
    on_disk = {os.path.basename(p) for p in
               glob.glob(os.path.join(path, "_manifests", "*-stats-*"))}
    assert on_disk == set(raw4["stats_segments"])
    assert pruned_file_count(path, "id", 405, 405) == (1, 5)


def test_analyze_delta_segment_and_sentinels(spark, tmp_path):
    """ANALYZE commits an O(todo) delta segment; columns that yield no
    derivable bounds (all-null) or no bloom (unsupported type) record
    conservative SENTINELS, so a re-run is a true metadata no-op
    instead of re-reading those files' data (ADVICE r08)."""
    from clx_etl_spark.sinks.versioned import analyze_table, min_max_meta

    path = str(tmp_path / "vt")
    for lo in (0, 100, 200):
        append_version(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}", None) for i in range(50)],
                "id long, v string, z double",
            ).coalesce(1),
            path, stats_cols=["id"],
        )
    v1 = analyze_table(spark, path, stats_cols=["id", "z"],
                       bloom_cols=["z"])
    raw_parent = json.load(open(_manifest_path(path, v1 - 1)))
    raw = json.load(open(_manifest_path(path, v1)))
    assert raw["stats_segments"][:-1] == raw_parent["stats_segments"]
    # sentinels are conservative: z never prunes, min/max falls back
    assert pruned_file_count(path, "z", 1.0, 2.0)[0] == 3
    assert min_max_meta(path, "z") is None
    # re-run: todo is empty -> same segment list, nothing new written
    v2 = analyze_table(spark, path, stats_cols=["id", "z"],
                       bloom_cols=["z"])
    raw2 = json.load(open(_manifest_path(path, v2)))
    assert raw2["stats_segments"] == raw["stats_segments"]
    # id pruning still exact through the analyze carries
    assert pruned_file_count(path, "id", 205, 205)[0] == 1


def test_expire_grace_protects_inflight_staging(spark, tmp_path):
    """expire_versions vs a concurrent committer (code-review r09): data
    files, delta segments, and change-feed dirs are all staged BEFORE
    the manifest CAS, so a never-referenced artifact younger than the
    grace window must survive the sweep — only committed-then-expired
    artifacts (and aged-out orphans) reclaim."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clx_etl_spark.sinks.versioned import merge_version

    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0, 100))
    # a change-feed commit so an expired cf dir exists too
    merge_version(
        spark.createDataFrame([(0, "u")], "id long, v string"), path,
        ["id"], change_feed=True)
    v0_seg = json.load(open(_manifest_path(path, 0)))["stats_segments"][0]
    # simulate an in-flight writer mid-commit: staged artifacts with NO
    # manifest referencing them yet
    staged_data = os.path.join(path, "data", "v9-staged", "part-0.parquet")
    os.makedirs(os.path.dirname(staged_data))
    pq.write_table(pa.table({"id": pa.array([1])}), staged_data)
    staged_seg = os.path.join(path, "_manifests",
                              "v9-stats-deadbeef.parquet")
    pq.write_table(pa.table({"file": pa.array(["x"])}), staged_seg)
    staged_cf = os.path.join(path, "_changes", "cf-ffffffffffffffff")
    os.makedirs(staged_cf)
    pq.write_table(pa.table({"id": pa.array([1])}), staged_cf + "/p.parquet")

    expire_versions(path, keep_latest=1)  # default 10-min grace
    assert os.path.exists(staged_data)
    assert os.path.exists(staged_seg)
    assert os.path.isdir(staged_cf)
    # committed-then-expired history reclaimed immediately
    assert not os.path.exists(os.path.join(path, "_manifests", v0_seg))
    assert read_version(spark, path).count() == 100
    # an aged-out orphan does reclaim (grace forced to zero)
    expire_versions(path, keep_latest=1, orphan_grace_ms=0)
    assert not os.path.exists(staged_data)
    assert not os.path.exists(staged_seg)
    assert not os.path.isdir(staged_cf)
    assert read_version(spark, path).count() == 100


def test_analyze_backfills_rows_key_for_legacy_files(spark, tmp_path):
    """code-review r09: ANALYZE must upgrade pre-r08 files (bounds
    present, __rows__ absent) onto the metadata-only COUNT(*) path —
    proven the loud way, by deleting the data files and re-counting."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clx_etl_spark.sinks.versioned import analyze_table, count_rows_meta

    path = str(tmp_path / "vt")
    sub = os.path.join(path, "data", "v0-legacy")
    os.makedirs(sub)
    files, stats = [], {}
    for i in range(3):
        f = os.path.join(sub, f"part-{i}.parquet")
        pq.write_table(pa.table({"id": pa.array(range(i * 10, i * 10 + 5))}),
                       f)
        files.append(f)
        stats[f] = {"id": [i * 10, i * 10 + 4]}  # bounds, NO __rows__
    V._commit(path, 0, files, "append", stats)
    analyze_table(spark, path, stats_cols=["id"])
    m = _read_manifest(path, V.latest_version(path))
    assert all(V._ROWS_KEY in dict(m["stats"])[f] for f in files)
    for f in files:
        os.remove(f)
    assert count_rows_meta(path) == 15  # answered from metadata alone
