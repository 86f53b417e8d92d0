"""reorg_dvs (VERDICT r08 #4): fold each file's accumulated deletion-
vector dirs into one consolidated sidecar dir — metadata + dv sidecar
only, live rows identical, read-side dv opens back to one. Also pins
the op's concurrency contract: reorg-dv is append-safe (other writers
rebase over it; it rebases over appends), while dv-writing interleaves
are true conflicts."""

from __future__ import annotations

import os

import pytest

import clx_etl_spark.sinks.versioned as V
from clx_etl_spark.sinks.versioned import (
    append_version,
    count_rows_meta,
    delete_keys_dv,
    delete_version_dv,
    describe_table,
    expire_versions,
    latest_version,
    read_changes,
    read_version,
    reorg_dvs,
)


def _seed(spark, path):
    for lo in (0, 100, 200):
        append_version(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(50)],
                "id long, v string",
            ).coalesce(1),
            path, stats_cols=["id"], bloom_cols=["id"],
        )


def test_reorg_folds_dirs_rows_unchanged(spark, tmp_path):
    path = str(tmp_path / "vt")
    _seed(spark, path)
    delete_version_dv(spark, path, "id", 0, 4)
    delete_version_dv(spark, path, "id", 10, 14)
    delete_version_dv(spark, path, "id", 100, 104)
    assert describe_table(path)["dv_dirs"] == 3
    before = {r.id for r in read_version(spark, path).collect()}
    v, nf, folded = reorg_dvs(spark, path)
    assert (nf, folded) == (2, 3)  # two dv-bearing files, three dirs
    d = describe_table(path)
    assert d["dv_dirs"] == 1 and d["dv_deleted_rows"] == 15
    assert {r.id for r in read_version(spark, path).collect()} == before
    assert count_rows_meta(path) == 135
    # pre-reorg snapshot still reads (its dirs survive until expiry)
    assert read_version(spark, path, v - 1).count() == 135
    # incremental readers cross the reorg (no rows added/changed)
    append_version(
        spark.createDataFrame([(300, "x")], "id long, v string"), path,
        stats_cols=["id"], bloom_cols=["id"],
    )
    assert {r.id for r in read_changes(spark, path, v).collect()} == {300}
    # a second reorg is a no-op (already one dir)
    v2, _, folded2 = reorg_dvs(spark, path)
    assert folded2 == 1 and v2 == latest_version(path)
    # expiry reclaims the folded dirs once unreferenced
    expire_versions(path, keep_latest=1)
    dirs = os.listdir(os.path.join(path, "_dv"))
    assert len(dirs) == 1 and dirs[0].count("reorg") == 1
    assert read_version(spark, path).count() == 136


def test_reorg_rebases_over_append_conflicts_on_dv_write(spark, tmp_path,
                                                         monkeypatch):
    path = str(tmp_path / "vt")
    _seed(spark, path)
    delete_version_dv(spark, path, "id", 0, 4)
    delete_version_dv(spark, path, "id", 200, 204)
    orig = V._commit
    fired = {}

    def racing_append(path_, version, files, op, stats=None, txn=None, **kw):
        if op == "reorg-dv" and "a" not in fired:
            fired["a"] = True
            append_version(
                spark.createDataFrame([(500, "x")], "id long, v string")
                .coalesce(1), path_, stats_cols=["id"], bloom_cols=["id"])
        return orig(path_, version, files, op, stats, txn, **kw)

    monkeypatch.setattr(V, "_commit", racing_append)
    v, nf, folded = reorg_dvs(spark, path)
    monkeypatch.setattr(V, "_commit", orig)
    assert folded == 2 and describe_table(path)["dv_dirs"] == 1
    got = {r.id for r in read_version(spark, path).collect()}
    assert got == (set(range(5, 250)) - set(range(50, 100))
                   - set(range(150, 200)) - set(range(200, 205))) | {500}

    # losing to an interleaved dv WRITE is a true conflict: the dv
    # content this reorg folded changed under it. (A second dir first,
    # so the reorg has something to fold and actually commits.)
    delete_version_dv(spark, path, "id", 30, 31)
    assert describe_table(path)["dv_dirs"] == 2

    def racing_delete(path_, version, files, op, stats=None, txn=None, **kw):
        if op == "reorg-dv" and "d" not in fired:
            fired["d"] = True
            delete_version_dv(spark, path_, "id", 10, 11)
        return orig(path_, version, files, op, stats, txn, **kw)

    monkeypatch.setattr(V, "_commit", racing_delete)
    with pytest.raises(V.VersionConflictError):
        reorg_dvs(spark, path)
    monkeypatch.setattr(V, "_commit", orig)
    # the loser reclaimed its staged consolidated dir; re-running folds
    on_disk = {os.path.join(path, "_dv", d)
               for d in os.listdir(os.path.join(path, "_dv"))}
    # every on-disk dir is referenced by SOME surviving manifest
    referenced = set()
    for vv in range(0, latest_version(path) + 1):
        mm = V._read_manifest(path, vv)
        referenced |= {e["d"] for es in mm.get("dv", {}).values()
                       for e in es}
    assert on_disk <= referenced
    reorg_dvs(spark, path)
    assert describe_table(path)["dv_dirs"] == 1


def test_dv_delete_rebases_over_interleaved_reorg(spark, tmp_path,
                                                  monkeypatch):
    """The other direction of the append-safe contract: a keyed dv
    delete losing the CAS to a reorg re-attaches its entries onto the
    consolidated head map."""
    path = str(tmp_path / "vt")
    _seed(spark, path)
    delete_version_dv(spark, path, "id", 0, 4)
    delete_version_dv(spark, path, "id", 100, 104)
    orig = V._commit
    fired = {}

    def racing_reorg(path_, version, files, op, stats=None, txn=None, **kw):
        if op == "delete-dv" and "r" not in fired and version >= 5:
            fired["r"] = True
            reorg_dvs(spark, path_)
        return orig(path_, version, files, op, stats, txn, **kw)

    monkeypatch.setattr(V, "_commit", racing_reorg)
    keys = spark.createDataFrame([(200,), (201,)], "id long")
    v, nf, n = delete_keys_dv(spark, path, keys, ["id"])
    monkeypatch.setattr(V, "_commit", orig)
    assert n == 2 and fired == {"r": True}
    got = {r.id for r in read_version(spark, path).collect()}
    assert got == (set(range(5, 50)) | set(range(105, 150))
                   | set(range(202, 250)))
    assert describe_table(path)["dv_dirs"] == 2  # consolidated + new
