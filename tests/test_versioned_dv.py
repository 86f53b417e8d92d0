"""Deletion-vector (merge-on-read DELETE) tests for sinks/versioned.py:
no-rewrite deletes, dv carry-through across append/merge/delete/rollback/
clone, purge on compaction, sidecar reclaim on expire, the change-feed
leg, and the reader-features forward-compat guard (Delta DV semantics;
reference has no lakehouse layer — this is the beyond-§2 surface)."""

from __future__ import annotations

import json
import os

import pytest

from clx_etl_spark.sinks.versioned import (
    _dv_root,
    _read_manifest,
    append_version,
    clone_table,
    compact_version,
    delete_version,
    delete_version_dv,
    describe_table,
    expire_versions,
    files_table,
    merge_version,
    read_version,
    rollback_version,
    scan_version,
    table_changes,
)


def _seed(spark, path, blocks=(0, 100, 200), bloom=False):
    """One 50-row file per block with id stats (and optional blooms)."""
    for lo in blocks:
        append_version(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(50)],
                "id long, v string",
            ).coalesce(1),
            path,
            stats_cols=["id"],
            bloom_cols=["id"] if bloom else None,
        )


def test_dv_delete_rewrites_nothing(spark, tmp_path):
    """The headline: a narrow dv delete leaves every data file
    byte-identical on disk, the manifest file list unchanged, and the
    rows gone from every reader."""
    path = str(tmp_path / "vt")
    _seed(spark, path)
    m2 = _read_manifest(path, 2)
    sizes = {f: (os.path.getsize(f), os.path.getmtime(f)) for f in m2["files"]}
    v, files_with_dv, n_deleted = delete_version_dv(spark, path, "id", 110, 120)
    assert (v, files_with_dv, n_deleted) == (3, 1, 11)
    m = _read_manifest(path, v)
    assert m["files"] == m2["files"]  # zero data-file churn
    assert m["op"] == "delete-dv"
    assert m.get("reader_features") == ["deletion-vectors"]
    for f in m2["files"]:
        assert (os.path.getsize(f), os.path.getmtime(f)) == sizes[f]
    ids = {r.id for r in read_version(spark, path).collect()}
    assert ids == (
        set(range(0, 50)) | set(range(100, 150)) | set(range(200, 250))
    ) - set(range(110, 121))
    # time travel to before the delete still sees everything
    assert read_version(spark, path, 2).count() == 150
    # scan_version applies the dv too (the deleted range scans empty,
    # its neighbors intact)
    assert scan_version(spark, path, "id", 110, 120).count() == 0
    assert scan_version(spark, path, "id", 100, 130).count() == 20
    # observability: describe + files_table surface the dv debt
    d = describe_table(path)
    assert (d["dv_files"], d["dv_deleted_rows"]) == (1, 11)
    inv = {r.file: r for r in files_table(spark, path).collect()}
    assert sum(r.dv_deleted for r in inv.values()) == 11
    dv_file = next(f for f, r in inv.items() if r.dv_deleted)
    assert inv[dv_file].rows == 50  # physical footer rows unchanged


def test_dv_cumulative_no_double_count(spark, tmp_path):
    """Overlapping dv deletes accumulate; already-deleted positions are
    excluded before matching, so re-deleting the same range adds zero."""
    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    assert delete_version_dv(spark, path, "id", 10, 19)[2] == 10
    # overlap [15, 24]: only 20..24 are still live
    assert delete_version_dv(spark, path, "id", 15, 24)[2] == 5
    # exact replay: nothing live in range -> no dv entry added
    v, files_with_dv, n = delete_version_dv(spark, path, "id", 10, 24)
    assert (files_with_dv, n) == (0, 0)
    m = _read_manifest(path, v)
    assert sum(len(e) for e in m["dv"].values()) == 2  # no empty 3rd entry
    ids = {r.id for r in read_version(spark, path).collect()}
    assert ids == set(range(50)) - set(range(10, 25))
    d = describe_table(path)
    assert d["dv_deleted_rows"] == 15


def test_dv_empty_delete_still_commits(spark, tmp_path):
    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    v, files_with_dv, n = delete_version_dv(spark, path, "id", 900, 999)
    assert (v, files_with_dv, n) == (1, 0, 0)
    assert "dv" not in _read_manifest(path, v)
    assert read_version(spark, path).count() == 50


def test_dv_survives_append_and_merge(spark, tmp_path):
    """Appends and merges carry the dv map: deleted rows stay deleted;
    a merge whose rewrite slice includes a dv-bearing file must not
    resurrect its deleted rows, and untouched files keep their dv."""
    path = str(tmp_path / "vt")
    _seed(spark, path)
    delete_version_dv(spark, path, "id", 110, 120)
    # append: dv carried, deleted ids still gone, new rows visible
    append_version(
        spark.createDataFrame([(300 + i, f"v{300 + i}") for i in range(10)],
                              "id long, v string").coalesce(1),
        path, stats_cols=["id"],
    )
    ids = {r.id for r in read_version(spark, path).collect()}
    assert 115 not in ids and 300 in ids and len(ids) == 149
    # merge updating a key in the dv-bearing file: that file rewrites
    # dv-applied; the other files keep their (non-)dv entries
    batch = spark.createDataFrame([(125, "UPDATED")], "id long, v string")
    v = merge_version(batch, path, keys=["id"])
    m = _read_manifest(path, v)
    assert "dv" not in m  # the only dv-bearing file was rewritten clean
    out = {r.id: r.v for r in read_version(spark, path).collect()}
    assert out[125] == "UPDATED"
    assert len(out) == 149 and 115 not in out  # no resurrection


def test_dv_merge_keeps_untouched_file_dv(spark, tmp_path):
    """A merge whose key neighborhood excludes the dv-bearing file must
    carry that file's dv entries into the new manifest."""
    path = str(tmp_path / "vt")
    _seed(spark, path)
    delete_version_dv(spark, path, "id", 0, 4)  # dv on the 0-49 file
    batch = spark.createDataFrame([(205, "UPDATED")], "id long, v string")
    v = merge_version(batch, path, keys=["id"])
    m = _read_manifest(path, v)
    assert sum(e["n"] for es in m["dv"].values() for e in es) == 5
    out = {r.id: r.v for r in read_version(spark, path).collect()}
    assert out[205] == "UPDATED" and 0 not in out and len(out) == 145


def test_dv_then_cow_delete(spark, tmp_path):
    """Copy-on-write delete over a dv-bearing table: the rewritten slice
    reads dv-applied, untouched files keep their dv entries."""
    path = str(tmp_path / "vt")
    _seed(spark, path)
    delete_version_dv(spark, path, "id", 0, 4)
    v, untouched, rewritten = delete_version(spark, path, "id", 110, 120)
    assert (untouched, rewritten) == (2, 1)
    m = _read_manifest(path, v)
    assert sum(e["n"] for es in m["dv"].values() for e in es) == 5
    ids = {r.id for r in read_version(spark, path).collect()}
    assert ids == (
        set(range(5, 50)) | set(range(100, 150)) | set(range(200, 250))
    ) - set(range(110, 121))


def test_dv_compaction_purges(spark, tmp_path):
    """Compaction materializes dv-applied rows and commits dv-free
    (REORG APPLY PURGE); expire then reclaims the orphaned sidecars."""
    path = str(tmp_path / "vt")
    _seed(spark, path)
    delete_version_dv(spark, path, "id", 110, 120)
    before = read_version(spark, path).count()
    compact_version(spark, path)
    m = _read_manifest(path, 4)
    assert "dv" not in m and "reader_features" not in m
    assert read_version(spark, path).count() == before == 139
    assert describe_table(path)["dv_deleted_rows"] == 0
    assert os.listdir(_dv_root(path))  # sidecar still held by history
    gone = expire_versions(path, keep_latest=1)
    assert any("_dv" in p for p in gone)
    assert not os.path.isdir(_dv_root(path)) or not os.listdir(_dv_root(path))
    assert read_version(spark, path).count() == 139


def test_dv_expire_keeps_referenced_sidecars(spark, tmp_path):
    """expire keep_latest=1 right after a dv commit must KEEP the
    referenced sidecar (and the head stays readable)."""
    path = str(tmp_path / "vt")
    _seed(spark, path)
    delete_version_dv(spark, path, "id", 110, 120)
    deleted = expire_versions(path, keep_latest=1)
    assert not any("_dv" in p for p in deleted)
    assert read_version(spark, path).count() == 139


def test_dv_rollback_restores_dv_state(spark, tmp_path):
    """RESTORE to a dv-bearing version brings its deletion vectors back;
    restore to a pre-dv version clears them."""
    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    delete_version_dv(spark, path, "id", 10, 19)  # v1: dv
    append_version(
        spark.createDataFrame([(100, "x")], "id long, v string"), path,
        stats_cols=["id"],
    )  # v2
    rollback_version(path, 1)  # v3 == v1's state
    assert {r.id for r in read_version(spark, path).collect()} == (
        set(range(50)) - set(range(10, 20))
    )
    assert "dv" in _read_manifest(path, 3)
    rollback_version(path, 0)  # v4 == pre-dv state
    assert read_version(spark, path).count() == 50
    assert "dv" not in _read_manifest(path, 4)


def test_dv_clone_shallow_and_deep(spark, tmp_path):
    """Shallow clones reference dv sidecars in place; deep clones remap
    positions onto the copied files and survive source expiry."""
    src = str(tmp_path / "src")
    _seed(spark, src)
    delete_version_dv(spark, src, "id", 110, 120)
    want = {r.id for r in read_version(spark, src).collect()}

    shallow = str(tmp_path / "shallow")
    clone_table(src, shallow)
    assert {r.id for r in read_version(spark, shallow).collect()} == want

    deep = str(tmp_path / "deep")
    clone_table(src, deep, deep=True)
    m = _read_manifest(deep, 0)
    assert sum(e["n"] for es in m["dv"].values() for e in es) == 11
    # every remapped dv path lives under the clone
    assert all(f.startswith(deep) for f in m["dv"])
    assert all(e["d"].startswith(deep) for es in m["dv"].values() for e in es)
    assert {r.id for r in read_version(spark, deep).collect()} == want
    # deep clone is independent: nuke the source entirely
    import shutil

    shutil.rmtree(src)
    assert {r.id for r in read_version(spark, deep).collect()} == want


def test_dv_change_feed(spark, tmp_path):
    """change_feed=True on a dv delete records the deleted rows exactly;
    table_changes crosses the commit."""
    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    delete_version_dv(spark, path, "id", 10, 14, change_feed=True)
    ch = table_changes(spark, path, after_version=0).collect()
    assert {(r.id, r._change_type, r._commit_version) for r in ch} == {
        (i, "delete", 1) for i in range(10, 15)
    }
    # without change_feed the row-level delta doesn't exist -> loud error
    delete_version_dv(spark, path, "id", 20, 24)
    with pytest.raises(ValueError, match="without a recorded change set"):
        table_changes(spark, path, after_version=1).collect()


def test_dv_point_lookup_with_bloom(spark, tmp_path):
    """Bloom-pruned point lookups stay correct over dv-bearing files:
    a dv-deleted key scans empty, a live key in the same file scans."""
    path = str(tmp_path / "vt")
    _seed(spark, path, bloom=True)
    delete_version_dv(spark, path, "id", 115, 115)
    assert scan_version(spark, path, "id", 115, 115).count() == 0
    assert scan_version(spark, path, "id", 116, 116).count() == 1


def test_reader_features_forward_compat_guard(spark, tmp_path):
    """A manifest declaring a feature this reader lacks fails LOUDLY on
    read instead of silently returning wrong rows."""
    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    mp = os.path.join(path, "_manifests", "v0.json")
    with open(mp) as fh:
        m = json.load(fh)
    m["reader_features"] = ["deletion-vectors", "column-mapping-v9"]
    with open(mp, "w") as fh:
        json.dump(m, fh)
    with pytest.raises(ValueError, match="column-mapping-v9"):
        read_version(spark, path)


def test_merge_dv_triad_no_rewrite(spark, tmp_path):
    """Merge-on-read MERGE: matched rows dv-tombstone in place, the
    batch appends as new files, deletes tombstone without appending —
    every pre-existing data file survives byte-identical."""
    from clx_etl_spark.sinks.versioned import merge_version_dv

    path = str(tmp_path / "vt")
    _seed(spark, path)
    m2 = _read_manifest(path, 2)
    sizes = {f: os.path.getsize(f) for f in m2["files"]}
    upd = spark.createDataFrame(
        [(105, "UPDATED"), (900, "NEW")], "id long, v string"
    )
    dels = spark.createDataFrame([(210,)], "id long")
    v = merge_version_dv(upd, path, keys=["id"], deletes=dels)
    m = _read_manifest(path, v)
    assert m["op"] == "merge-dv"
    assert set(m2["files"]) <= set(m["files"])  # nothing removed
    assert len(m["files"]) == len(m2["files"]) + 1  # one appended file
    for f in m2["files"]:
        assert os.path.getsize(f) == sizes[f]  # nothing rewritten
    out = {r.id: r.v for r in read_version(spark, path).collect()}
    assert out[105] == "UPDATED" and out[900] == "NEW"
    assert 210 not in out and len(out) == 150  # 150 - 1 del + 1 ins
    assert out[0] == "v0" and out[249] == "v249"
    # dv tombstones: 1 update preimage + 1 delete = 2 positions
    assert describe_table(path)["dv_deleted_rows"] == 2
    # time travel: pre-merge snapshot intact
    assert read_version(spark, path, 2).count() == 150


def test_merge_dv_repeated_then_compact(spark, tmp_path):
    """Steady state: many dv merges accumulate tombstones + small files;
    one compaction purges both and the result is bit-equal."""
    from clx_etl_spark.sinks.versioned import merge_version_dv

    path = str(tmp_path / "vt")
    _seed(spark, path)
    for i in range(3):
        upd = spark.createDataFrame(
            [(105, f"U{i}"), (140, f"U{i}")], "id long, v string"
        )
        merge_version_dv(upd, path, keys=["id"])
    # 105/140 tombstoned twice (originals + each superseded update)
    assert describe_table(path)["dv_deleted_rows"] == 6
    want = {r.id: r.v for r in read_version(spark, path).collect()}
    assert want[105] == want[140] == "U2" and len(want) == 150
    compact_version(spark, path)
    m = _read_manifest(path, 6)
    assert "dv" not in m
    got = {r.id: r.v for r in read_version(spark, path).collect()}
    assert got == want


def test_merge_dv_txn_replay_noop(spark, tmp_path):
    from clx_etl_spark.sinks.versioned import merge_version_dv

    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    upd = spark.createDataFrame([(5, "U")], "id long, v string")
    v1 = merge_version_dv(upd, path, keys=["id"], txn=("app", 7))
    v2 = merge_version_dv(upd, path, keys=["id"], txn=("app", 7))
    assert v2 == v1  # replay: no new version
    assert read_version(spark, path).count() == 50
    assert describe_table(path)["dv_deleted_rows"] == 1


def test_merge_dv_change_feed_classification(spark, tmp_path):
    from clx_etl_spark.sinks.versioned import merge_version_dv

    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    upd = spark.createDataFrame(
        [(5, "U"), (900, "NEW")], "id long, v string"
    )
    dels = spark.createDataFrame([(7,)], "id long")
    merge_version_dv(upd, path, keys=["id"], deletes=dels, change_feed=True)
    ch = {(r.id, r._change_type)
          for r in table_changes(spark, path, after_version=0).collect()}
    assert ch == {(5, "update_preimage"), (5, "update_postimage"),
                  (900, "insert"), (7, "delete")}


def test_delete_keys_dv_purge(spark, tmp_path):
    """Keyed GDPR-style purge: pruned candidates, no files added or
    rewritten, txn-idempotent."""
    from clx_etl_spark.sinks.versioned import delete_keys_dv

    path = str(tmp_path / "vt")
    _seed(spark, path)
    m2 = _read_manifest(path, 2)
    ids = spark.createDataFrame([(5,), (115,), (115,), (999,)], "id long")
    v, files_with_dv, n = delete_keys_dv(
        spark, path, ids, ["id"], txn=("purge", 1)
    )
    assert (files_with_dv, n) == (2, 2)  # 999 absent; dup key once
    m = _read_manifest(path, v)
    assert m["files"] == m2["files"]
    out = {r.id for r in read_version(spark, path).collect()}
    assert 5 not in out and 115 not in out and len(out) == 148
    # replay is a manifest no-op
    assert delete_keys_dv(spark, path, ids, ["id"], txn=("purge", 1)) == (v, 0, 0)


def test_merge_dv_pure_delete_adds_no_files(spark, tmp_path):
    from clx_etl_spark.sinks.versioned import merge_version_dv

    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    empty = spark.createDataFrame([], "id long, v string")
    dels = spark.createDataFrame([(3,), (4,)], "id long")
    v = merge_version_dv(empty, path, keys=["id"], deletes=dels)
    m = _read_manifest(path, v)
    assert m["files"] == _read_manifest(path, 0)["files"]
    assert read_version(spark, path).count() == 48


def test_partial_compaction_where(spark, tmp_path):
    """OPTIMIZE ... WHERE: only files overlapping the range rewrite;
    out-of-range files carry by reference with stats AND deletion
    vectors intact; the rewritten slice purges its dv."""
    path = str(tmp_path / "vt")
    # two small files per block so the in-range slice has something to bin
    _seed(spark, path, blocks=(0, 50, 100, 150, 200, 250))
    delete_version_dv(spark, path, "id", 5, 9)      # dv on the 0-49 file
    delete_version_dv(spark, path, "id", 105, 109)  # dv on the 100-149 file
    m_before = _read_manifest(path, 7)
    want = {r.id for r in read_version(spark, path).collect()}
    v = compact_version(spark, path, where=("id", 100, 199))
    m = _read_manifest(path, v)
    in_range = {f for f in m_before["files"]
                if m_before["stats"][f]["id"][0] >= 100
                and m_before["stats"][f]["id"][1] <= 199}
    out_range = set(m_before["files"]) - in_range
    # out-of-range files carried by reference with their stats
    assert out_range <= set(m["files"])
    assert all(f not in m["files"] for f in in_range)
    assert all(m["stats"][f] == m_before["stats"][f] for f in out_range)
    # the 100-149 dv was purged by the rewrite; the 0-49 dv survives
    assert sum(e["n"] for es in m["dv"].values() for e in es) == 5
    assert {r.id for r in read_version(spark, path).collect()} == want
    # the two in-range small files binned into one
    assert len(m["files"]) == len(m_before["files"]) - 1


def test_partial_compaction_zorder_slice(spark, tmp_path):
    """where= + zorder_by: the in-range slice re-clusters; pruning on
    the zorder column turns selective inside the compacted range."""
    from clx_etl_spark.sinks.versioned import _stat_overlaps

    path = str(tmp_path / "vt")
    # interleaved second dim so pre-compaction boxes are wide
    for lo in (0, 100):
        append_version(
            spark.createDataFrame(
                [(lo + i, (i * 37) % 100) for i in range(100)],
                "id long, d long",
            ).coalesce(1),
            path, stats_cols=["id"],
        )
    v = compact_version(spark, path, target_bytes=1 << 10,
                        where=("id", 100, 199), zorder_by=["d"])
    m = _read_manifest(path, v)
    # the untouched 0-99 file has no d stats; rewritten files do
    rewritten = [f for f in m["files"] if m["stats"][f].get("d")]
    assert len(rewritten) >= 2  # slice actually split
    narrow = [f for f in rewritten
              if not _stat_overlaps(0, 5, m["stats"][f]["d"])]
    assert narrow  # at least one rewritten file prunes for d in [0,5]
    assert read_version(spark, path).count() == 200


def test_versioned_cdc_stream_merge_on_read(spark, tmp_path):
    """CDC stream with merge_on_read=True: per batch one merge_version_dv
    — seeded files are never rewritten (tombstones only), batches append,
    replays are manifest no-ops."""
    import hashlib

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.streaming.jobs import versioned_cdc_stream

    schema = StructType([
        StructField("k", LongType()),
        StructField("ts_ms", LongType()),
        StructField("op", StringType()),
        StructField("v", StringType()),
    ])
    src, table = str(tmp_path / "in"), str(tmp_path / "vt")
    ckpt = str(tmp_path / "ck")
    b0 = [(1, 10, "I", "a1"), (2, 10, "I", "a2"), (3, 10, "I", "a3")]
    b1 = [(2, 30, "U", "b2"), (3, 30, "D", None), (4, 30, "I", "a4")]
    spark.createDataFrame(b0, schema).coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append").parquet(src)
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    q = versioned_cdc_stream(stream, table, checkpoint=ckpt, keys=["k"],
                             stats_cols=["k"], merge_on_read=True)
    q.awaitTermination(180)

    out = {r.k: r.v for r in V.read_version(spark, table).collect()}
    assert out == {1: "a1", 2: "b2", 4: "a4"}  # k=3 deleted
    # batch 0's files survived batch 1 untouched (merge-on-read)
    head = V.latest_version(table)
    m0 = V._read_manifest(table, head - 1)
    m1 = V._read_manifest(table, head)
    assert set(m0["files"]) <= set(m1["files"])
    assert m1["op"] == "merge-dv"
    # tombstones: k=2 superseded + k=3 deleted
    assert sum(e["n"] for es in m1["dv"].values() for e in es) == 2
    # crash-replay of batch 1 is a manifest no-op
    app_id = "cdc-" + hashlib.md5(ckpt.encode()).hexdigest()[:12]
    ups = spark.createDataFrame([(2, 30, "b2"), (4, 30, "a4")],
                                "k long, ts_ms long, v string")
    dels = spark.createDataFrame([(3,)], "k long")
    assert V.merge_version_dv(ups, table, keys=["k"], deletes=dels,
                              txn=(app_id, 1)) == head
    assert V.latest_version(table) == head
    # compaction purges the stream's accumulated debt, state unchanged
    compact_version(spark, table)
    assert "dv" not in V._read_manifest(table, head + 1)
    assert {r.k: r.v for r in read_version(spark, table).collect()} == out


def test_compaction_small_only_bin_packing(spark, tmp_path):
    """OPTIMIZE bin-packing rule: only files below the threshold
    rewrite; right-sized files are never touched (Delta's behavior —
    the steady-state maintenance for streaming ingest)."""
    path = str(tmp_path / "vt")
    # one big file (500 rows) + three per-batch fragments (5 rows each)
    append_version(
        spark.createDataFrame([(i, f"v{i}") for i in range(500)],
                              "id long, v string").coalesce(1),
        path, stats_cols=["id"])
    for lo in (1000, 2000, 3000):
        append_version(
            spark.createDataFrame([(lo + i, f"v{lo + i}") for i in range(5)],
                                  "id long, v string").coalesce(1),
            path, stats_cols=["id"])
    m0 = _read_manifest(path, 3)
    big = max(m0["files"], key=os.path.getsize)
    threshold = os.path.getsize(big)  # strictly-below keeps the big file
    v = compact_version(spark, path, small_only_below=threshold)
    m = _read_manifest(path, v)
    assert big in m["files"]  # right-sized file untouched
    assert len(m["files"]) == 2  # big + one packed fragment file
    assert read_version(spark, path).count() == 515
    # carried stats keep pruning for the untouched file
    assert m["stats"][big] == m0["stats"][big]


def test_ingest_stream_auto_compaction(spark, tmp_path):
    """Streaming ingest with auto_compact_every: fragments fold every
    k batches, rows and txn idempotence intact across the compaction."""
    from pyspark.sql.types import LongType, StructField, StructType

    from clx_etl_spark.sinks.versioned import (append_version as _av,
                                               latest_version)
    from clx_etl_spark.streaming.jobs import versioned_ingest_stream

    schema = StructType([StructField("k", LongType()),
                         StructField("n", LongType())])
    src, table = str(tmp_path / "in"), str(tmp_path / "vt")
    ckpt = str(tmp_path / "ck")
    for b in range(4):
        spark.createDataFrame([(b * 10 + i, b) for i in range(10)],
                              schema).coalesce(1).write.mode(
            "append").parquet(src)
    stream = (
        spark.readStream.format("parquet").schema(schema)
        .option("maxFilesPerTrigger", "1").load(src)
    )
    q = versioned_ingest_stream(stream, table, checkpoint=ckpt,
                                stats_cols=["k"], auto_compact_every=2)
    q.awaitTermination(180)
    m = _read_manifest(table, latest_version(table))
    assert read_version(spark, table).count() == 40
    # 4 ingest fragments folded by 2 compactions -> far fewer than 4 files
    assert len(m["files"]) <= 2
    # txn watermark survived the compactions: replaying batch 3 is a no-op
    import hashlib
    app_id = "stream-" + hashlib.md5(ckpt.encode()).hexdigest()[:12]
    head = latest_version(table)
    replay = spark.createDataFrame([(35, 3)], schema)
    assert _av(replay, table, txn=(app_id, 3)) == head
    assert read_version(spark, table).count() == 40


def test_dv_delete_conflict_cleans_up_sidecar(spark, tmp_path, monkeypatch):
    """A dv delete losing the manifest CAS to an append that MAY hold
    in-range rows raises VersionConflictError and removes its orphaned
    sidecar; the winner's state is intact and the retry against the new
    head succeeds (and now also tombstones the raced-in row)."""
    import clx_etl_spark.sinks.versioned as V

    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    orig = V._commit
    fired = {}

    def racing(path_, version, files, op, stats=None, txn=None, **kw):
        if op == "delete-dv" and not fired:
            fired["x"] = True  # a concurrent OVERLAPPING append wins
            V.append_version(
                spark.createDataFrame([(15, "x")], "id long, v string")
                .coalesce(1),
                path_, stats_cols=["id"])
        return orig(path_, version, files, op, stats, txn, **kw)

    monkeypatch.setattr(V, "_commit", racing)
    with pytest.raises(V.VersionConflictError):
        delete_version_dv(spark, path, "id", 10, 19)
    monkeypatch.setattr(V, "_commit", orig)
    # loser's sidecar reclaimed eagerly; winner intact
    root = _dv_root(path)
    assert not os.path.isdir(root) or not os.listdir(root)
    assert read_version(spark, path).count() == 51
    # retry on the new head lands, covering the raced-in id=15 too —
    # the raced-in single-row file [15,15] is FULLY covered by the
    # range, so it drops from the manifest metadata-only (r09) instead
    # of taking a dv: one file with new positions, 11 rows deleted
    v, nf, n = delete_version_dv(spark, path, "id", 10, 19)
    assert (nf, n) == (1, 11)
    assert read_version(spark, path).count() == 40


def test_dv_delete_rebases_over_disjoint_append(spark, tmp_path, monkeypatch):
    """Delta's disjoint-files rule: a dv delete losing the CAS to an
    append whose file stats provably exclude the delete range REBASES —
    both the appended rows and the tombstones land, no error, no data
    rewrite."""
    import clx_etl_spark.sinks.versioned as V

    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    orig = V._commit
    fired = {}

    def racing(path_, version, files, op, stats=None, txn=None, **kw):
        if op == "delete-dv" and not fired:
            fired["x"] = True  # a concurrent DISJOINT append wins
            V.append_version(
                spark.createDataFrame([(500, "x")], "id long, v string")
                .coalesce(1),
                path_, stats_cols=["id"])
        return orig(path_, version, files, op, stats, txn, **kw)

    monkeypatch.setattr(V, "_commit", racing)
    v, nf, n = delete_version_dv(spark, path, "id", 10, 19)
    monkeypatch.setattr(V, "_commit", orig)
    assert (nf, n) == (1, 10)
    df = read_version(spark, path)
    assert df.count() == 41  # 50 - 10 deleted + 1 raced-in append
    assert df.filter("id = 500").count() == 1
    assert df.filter("id BETWEEN 10 AND 19").count() == 0
    # the rebase re-pointed the commit past the winner
    assert V.latest_version(path) == v and v == 2


def test_dv_delete_racing_compaction_still_raises(spark, tmp_path,
                                                  monkeypatch):
    """A dv delete racing a compaction of its own files is a TRUE
    conflict: positions were computed against files the winner
    rewrote — must raise, never rebase."""
    import clx_etl_spark.sinks.versioned as V

    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0, 100))
    orig = V._commit
    fired = {}

    def racing(path_, version, files, op, stats=None, txn=None, **kw):
        if op == "delete-dv" and not fired:
            fired["x"] = True
            V.compact_version(spark, path_)
        return orig(path_, version, files, op, stats, txn, **kw)

    monkeypatch.setattr(V, "_commit", racing)
    with pytest.raises(V.VersionConflictError):
        delete_version_dv(spark, path, "id", 10, 19)
    monkeypatch.setattr(V, "_commit", orig)
    root = _dv_root(path)
    assert not os.path.isdir(root) or not os.listdir(root)
    assert read_version(spark, path).count() == 100


def test_dv_merge_rebases_over_disjoint_append(spark, tmp_path, monkeypatch):
    """merge_version_dv losing the CAS to a key-disjoint append rebases:
    tombstones + batch files ride onto the new head."""
    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sinks.versioned import merge_version_dv

    path = str(tmp_path / "vt")
    _seed(spark, path, blocks=(0,))
    orig = V._commit
    fired = {}

    def racing(path_, version, files, op, stats=None, txn=None, **kw):
        if op == "merge-dv" and not fired:
            fired["x"] = True
            V.append_version(
                spark.createDataFrame([(500, "x")], "id long, v string")
                .coalesce(1),
                path_, stats_cols=["id"])
        return orig(path_, version, files, op, stats, txn, **kw)

    monkeypatch.setattr(V, "_commit", racing)
    batch = spark.createDataFrame(
        [(5, "NEW5"), (60, "NEW60")], "id long, v string")
    v = merge_version_dv(batch, path, ["id"])
    monkeypatch.setattr(V, "_commit", orig)
    assert v == V.latest_version(path) == 2
    df = read_version(spark, path)
    got = {r.id: r.v for r in df.filter("id IN (5, 60, 500)").collect()}
    assert got == {5: "NEW5", 60: "NEW60", 500: "x"}
    assert df.count() == 52  # 50 + insert(60) + raced append(500)


def test_dv_read_plan_is_broadcast_anti_join(spark, tmp_path):
    """Plan discipline for the merge-on-read read path: the dv
    anti-join must broadcast the (tiny) position side — a sort-merge or
    nested-loop here would shuffle the table per scan at 100 TB."""
    path = str(tmp_path / "vt")
    _seed(spark, path)
    delete_version_dv(spark, path, "id", 110, 120)
    df = read_version(spark, path)
    df.collect()  # let AQE settle the final plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:1500]
    assert "SortMergeJoin" not in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # and a dv-free snapshot plans NO join at all (zero read debt)
    clean = read_version(spark, path, 2)
    clean.collect()
    plan2 = clean._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan2


def test_dv_delete_via_relative_path(spark, tmp_path, monkeypatch):
    """A table addressed by a RELATIVE path must still commit a live dv
    map: write entry points normalize to the absolute form Spark keys
    _metadata.file_path by, so the manifest's files-membership filter
    cannot silently orphan the deletion vectors (which would report
    rows deleted while every read resurrects them)."""
    monkeypatch.chdir(tmp_path)
    _seed(spark, "vt_rel")
    new_v, files_hit, n = delete_version_dv(spark, "vt_rel", "id", 110, 120)
    assert n == 11 and files_hit == 1
    m = _read_manifest(str(tmp_path / "vt_rel"), new_v)
    assert m.get("dv"), "dv map must survive a relative-path commit"
    assert read_version(spark, "vt_rel").count() == 139
    # keyed purge and merge-on-read via relative paths too
    from clx_etl_spark.sinks.versioned import delete_keys_dv

    gone = spark.createDataFrame([(5,)], "id long")
    _, _, n2 = delete_keys_dv(spark, "vt_rel", gone, ["id"])
    assert n2 == 1
    assert read_version(spark, "vt_rel").count() == 138
