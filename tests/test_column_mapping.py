"""Column-mapping tests: metadata-only RENAME/DROP COLUMN (the Delta
columnMapping name-mode shape — VERDICT r09 item 2). Data files keep
immutable PHYSICAL column names; the manifest's 'colmap' records
logical->physical plus retired physicals; reads rename, writes
translate at the file boundary, stats stay physical-keyed (valid across
renames), and time travel answers under each version's own names.
Reference analog: the mutable-column discipline of the symbol upsert
(/root/reference/src/exchanges/_base_.py:111-121), lifted to a true
ALTER TABLE."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType

from clx_etl_spark.sinks.versioned import (
    SchemaEnforcementError,
    _read_manifest,
    add_columns,
    append_version,
    clone_table,
    compact_version,
    count_col_meta,
    delete_version,
    delete_version_dv,
    describe_table,
    drop_columns,
    latest_version,
    merge_version,
    min_max_meta,
    pruned_file_count,
    read_version,
    rename_column,
    rollback_version,
    scan_version,
    set_constraints,
    table_changes,
    table_schema,
)


def _register(spark):
    from clx_etl_spark.sources.table_source import TableDataSource

    spark.dataSource.register(TableDataSource)


def _seed(spark, path, n=100):
    df = spark.createDataFrame(
        [(i, f"v{i}", i * 1.0) for i in range(n)],
        "k long, s string, x double",
    ).coalesce(2)
    return append_version(df, path, stats_cols=["k"], bloom_cols=["k"])


def test_rename_is_metadata_only_and_time_travels(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    files0 = list(_read_manifest(path, 0)["files"])
    v = rename_column(path, "k", "key")
    m = _read_manifest(path, v)
    assert m["files"] == files0  # no file touched
    assert m["colmap"] == {"m": {"key": "k"}}
    assert table_schema(path).fieldNames() == ["key", "s", "x"]
    out = read_version(spark, path)
    assert out.columns == ["key", "s", "x"]
    assert out.count() == 100
    # time travel: the pre-rename snapshot answers under the OLD name
    assert read_version(spark, path, 0).columns == ["k", "s", "x"]
    assert table_schema(path, 0).fieldNames() == ["k", "s", "x"]


def test_stats_pruning_survives_rename(spark, tmp_path):
    """Manifest min/max and blooms are keyed by the physical name, so
    file skipping keeps working under the new logical name."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    rename_column(path, "k", "key")
    kept, total = pruned_file_count(path, "key", 5, 5)
    assert (kept, total) == (1, 2)
    assert scan_version(spark, path, "key", 5, 5).count() == 1
    assert min_max_meta(path, "key") == (0, 99)
    assert count_col_meta(path, "key") == 100


def test_writes_after_rename_store_physical(spark, tmp_path):
    """Appends and merges under the new logical name land under the
    ORIGINAL physical column, so old and new files stay binary-uniform
    (one mergeSchema read, no column aliasing per file)."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    _seed(spark, path)
    rename_column(path, "k", "key")
    v = append_version(
        spark.createDataFrame([(1000, "z", 2.0)],
                              "key long, s string, x double").coalesce(1),
        path, stats_cols=["key"])
    m = _read_manifest(path, v)
    newf = [f for f in m["files"]
            if f not in set(_read_manifest(path, v - 1)["files"])]
    assert len(newf) == 1
    assert "k" in pq.read_schema(newf[0]).names  # physical name on disk
    assert read_version(spark, path).filter(
        F.col("key") == 1000).count() == 1
    merge_version(
        spark.createDataFrame([(1000, "zz", 3.0)],
                              "key long, s string, x double"),
        path, keys=["key"])
    assert read_version(spark, path).filter(
        F.col("key") == 1000).first().s == "zz"


def test_drop_then_readd_gets_fresh_physical(spark, tmp_path):
    """DROP retires the physical name; re-adding the same LOGICAL name
    maps to a fresh physical, so the dropped column's bytes can never
    leak back in — the Delta columnMapping fresh-physical rule."""
    path = str(tmp_path / "t")
    _seed(spark, path)
    drop_columns(path, ["x"])
    assert table_schema(path).fieldNames() == ["k", "s"]
    assert read_version(spark, path).columns == ["k", "s"]
    add_columns(path, [("x", DoubleType())])
    m = _read_manifest(path, latest_version(path))
    assert m["colmap"]["x"] == ["x"]          # retired physical
    assert m["colmap"]["m"]["x"].startswith("x-")  # fresh physical
    # old bytes must NOT resurface: the re-added column reads all-NULL
    assert read_version(spark, path).agg(F.count("x")).first()[0] == 0
    # new writes land under the fresh physical and read back
    append_version(
        spark.createDataFrame([(2000, "w", 9.9)],
                              "k long, s string, x double").coalesce(1),
        path)
    got = read_version(spark, path).filter(F.col("k") == 2000).first()
    assert got.x == 9.9
    # pre-drop snapshots still carry the original column's data
    assert read_version(spark, path, 0).agg(
        F.count("x")).first()[0] == 100


def test_rename_refusals(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    with pytest.raises(SchemaEnforcementError):
        rename_column(path, "nope", "y")       # unknown column
    with pytest.raises(SchemaEnforcementError):
        rename_column(path, "k", "s")          # collides with a column
    drop_columns(path, ["x"])
    with pytest.raises(SchemaEnforcementError):
        rename_column(path, "k", "x")          # collides with retired
    set_constraints(path, {"k_pos": "k >= 0"})
    with pytest.raises(SchemaEnforcementError):
        rename_column(path, "k", "key")        # CHECK references it
    set_constraints(path, {})
    # rename BACK to a column's own physical erases the mapping
    rename_column(path, "k", "key")
    rename_column(path, "key", "k")
    m = _read_manifest(path, latest_version(path))
    assert "m" not in m.get("colmap", {})      # only retired x remains
    assert m["colmap"]["x"] == ["x"]


def test_drop_refusals_and_idempotence(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    with pytest.raises(SchemaEnforcementError):
        drop_columns(path, ["k", "s", "x"])    # would drop everything
    set_constraints(path, {"x_pos": "x >= 0"})
    with pytest.raises(SchemaEnforcementError):
        drop_columns(path, ["x"])              # CHECK references it
    set_constraints(path, {})
    v = drop_columns(path, ["x"])
    assert drop_columns(path, ["x"]) == v      # idempotent replay


def test_legacy_replay_of_renamed_then_dropped_column(spark, tmp_path):
    """ADVICE r11 (low): on a PRE-'xl' manifest (legacy tables from
    before dropped LOGICAL names were recorded), a column that was
    RENAMED and then dropped retired under its PHYSICAL name — the
    replay-vs-typo check only knew 'x', so a legitimate idempotent
    replay of drop_columns with the logical name raised as a typo.
    The check now also accepts names whose historical mapping (older
    surviving manifests) lands on a currently-retired physical; real
    typos still raise."""
    import json as _json

    from clx_etl_spark.sinks.versioned import _manifest_path

    path = str(tmp_path / "t")
    _seed(spark, path)
    rename_column(path, "x", "val")   # logical 'val' at physical 'x'
    v = drop_columns(path, ["val"])   # retires physical 'x'
    # strip 'xl' to simulate a legacy pre-xl manifest
    mp = _manifest_path(path, v)
    with open(mp) as fh:
        m = _json.load(fh)
    assert m["colmap"].pop("xl") == ["val"]
    assert m["colmap"]["x"] == ["x"]  # retired under the PHYSICAL name
    with open(mp, "w") as fh:
        _json.dump(m, fh)
    # legitimate replay with the LOGICAL name: idempotent success via
    # the historical-mapping walk (v1's colmap maps val -> x)
    assert drop_columns(path, ["val"]) == v
    # a genuine typo still raises
    with pytest.raises(SchemaEnforcementError, match="never dropped"):
        drop_columns(path, ["valu"])


def test_dsv2_reads_and_writes_mapped_table(spark, tmp_path):
    """The DSv2 reader translates pushed filters and projections to
    physical names; the DSv2 write door implements the columnMapping
    WRITER feature (r11 — the r10 gate refused mapped tables): staged
    files store physical names, stats stay physical-keyed, and reads
    answer under the logical names."""
    from clx_etl_spark.sources.table_source import read_table_source

    _register(spark)
    path = str(tmp_path / "t")
    _seed(spark, path)
    rename_column(path, "k", "key")
    drop_columns(path, ["x"])
    df = read_table_source(spark, path)
    assert df.columns == ["key", "s"]
    assert df.count() == 100
    assert [r.s for r in df.filter(F.col("key") == 7).collect()] == ["v7"]
    (spark.createDataFrame([(1000, "dsv2")], "key long, s string")
     .coalesce(1)
     .write.format("clx_table").option("path", path)
     .mode("append").save())
    # staged file stores the PHYSICAL name 'k'; the manifest colmap is
    # carried, so the row reads back under the logical 'key'
    m = _read_manifest(path, latest_version(path))
    assert m["colmap"]["m"] == {"key": "k"}
    new_file = m["files"][-1]
    import pyarrow.parquet as pq

    assert "k" in pq.read_schema(new_file).names
    out = read_version(spark, path)
    assert out.filter(F.col("key") == 1000).count() == 1
    assert out.count() == 101
    # stats landed physical-keyed: pruning on the logical name works
    kept, total = pruned_file_count(path, "key", 1000, 1000)
    assert kept < total


def test_dsv2_write_statscols_translate_once(spark, tmp_path):
    """statsCols/bloomCols options name LOGICAL columns; the writer
    translates them to physical exactly once (manifest stats are
    physical-keyed — the colmap invariant)."""
    _register(spark)
    path = str(tmp_path / "t")
    _seed(spark, path, n=10)
    rename_column(path, "k", "key")
    (spark.createDataFrame([(77, "s77", 7.0)],
                           "key long, s string, x double").coalesce(1)
     .write.format("clx_table").option("path", path)
     .option("statsCols", "key").option("bloomCols", "key")
     .mode("append").save())
    m = _read_manifest(path, latest_version(path))
    new_file = m["files"][-1]
    st = m["stats"][new_file]
    assert st["k"] == [77, 77]  # physical key, never 'key'
    assert "key" not in st
    kept, total = pruned_file_count(path, "key", 77, 77)
    assert kept < total


def test_dsv2_write_constraints_enforced_under_mapping(spark, tmp_path):
    """CHECK constraints are written over LOGICAL names; the DSv2
    commit's DuckDB validation aliases the staged files' physical
    columns back before evaluating."""
    _register(spark)
    path = str(tmp_path / "t")
    _seed(spark, path, n=10)
    rename_column(path, "k", "key")
    set_constraints(path, {"key_nonneg": "key >= 0"})
    # Spark re-wraps the driver-side ConstraintViolation at the DSv2
    # boundary; the named constraint survives in the message
    with pytest.raises(Exception, match="key_nonneg"):
        (spark.createDataFrame([(-5, "bad", 0.0)],
                               "key long, s string, x double").coalesce(1)
         .write.format("clx_table").option("path", path)
         .mode("append").save())
    v_before = latest_version(path)
    (spark.createDataFrame([(5, "ok", 0.0)],
                           "key long, s string, x double").coalesce(1)
     .write.format("clx_table").option("path", path)
     .mode("append").save())
    assert latest_version(path) == v_before + 1


def test_dsv2_evolve_fresh_physical_after_drop(spark, tmp_path):
    """A DSv2 write with mergeSchema=true adding a column named like a
    RETIRED physical must get a fresh physical (the r10 merge+evolve
    data-loss rule, now on the DSv2 door) — old bytes never resurrect."""
    _register(spark)
    path = str(tmp_path / "t")
    _seed(spark, path, n=10)  # x double lives at physical 'x'
    drop_columns(path, ["x"])
    (spark.createDataFrame([(999, "n", "fresh")],
                           "k long, s string, x string").coalesce(1)
     .write.format("clx_table").option("path", path)
     .option("mergeSchema", "true").mode("append").save())
    m = _read_manifest(path, latest_version(path))
    assert m["colmap"]["m"]["x"].startswith("x-")  # fresh physical
    out = read_version(spark, path)
    got = {r.k: r.x for r in out.collect()}
    assert got[999] == "fresh"
    assert all(v is None for k, v in got.items() if k != 999)


def test_write_plan_salt_survives_interleaved_append(spark, tmp_path):
    """ADVICE r11 (medium): Spark instantiates the DSv2 writer in more
    than one python process (task-side pickle + commit-side); a PLAIN
    append racing between those instantiations bumps the head version
    without moving the colmap, and the commit's drift check (colmap
    JSON only) passes. The fresh-physical salt must therefore be a
    function of MAPPING STATE only — two plans computed at different
    head versions under the same colmap derive identical fresh
    physicals, or the staged files and the committed mapping disagree
    and the evolved column silently reads back all-NULL."""
    from clx_etl_spark.sources.table_source import _plan_write_mapping

    path = str(tmp_path / "t")
    _seed(spark, path, n=10)           # x double at physical 'x'
    drop_columns(path, ["x"])          # retire physical 'x'
    # evolution schema re-adds 'x' (collides with the retired physical)
    schema = spark.createDataFrame([], "k long, s string, x string").schema
    plan_a = _plan_write_mapping(path, schema)   # task-side instance
    # the race: a plain append lands between the two instantiations —
    # head bumps, colmap does not move
    append_version(
        spark.createDataFrame([(200, "mid")], "k long, s string"),
        path)
    plan_b = _plan_write_mapping(path, schema)   # commit-side instance
    assert plan_a["mapping"]["x"] == plan_b["mapping"]["x"]
    assert plan_a["mapping"]["x"].startswith("x-")
    assert plan_a["head_colmap"] == plan_b["head_colmap"]


def test_commit_refuses_staged_footers_outside_plan(spark, tmp_path):
    """Belt-and-braces for the same class (review r12): whatever
    guarantees the task-side and commit-side plans agree, the commit
    verifies the staged parquet FOOTER names against the mapping it is
    about to record and refuses loudly on a rogue physical — never a
    silent all-NULL column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clx_etl_spark.sinks.versioned import VersionConflictError
    from clx_etl_spark.sources.table_source import (_commit_staged_files,
                                                    _plan_write_mapping)

    path = str(tmp_path / "t")
    _seed(spark, path, n=10)
    drop_columns(path, ["x"])
    schema = spark.createDataFrame([], "k long, s string, x string").schema
    plan = _plan_write_mapping(path, schema)
    fresh = plan["mapping"]["x"]
    staging = os.path.join(path, "data", "dsv2-rogue")
    os.makedirs(staging)
    staged = os.path.join(staging, "part-rogue.parquet")
    # a diverged task-side plan would have staged a DIFFERENT fresh
    # physical than the one this commit is about to record
    pq.write_table(
        pa.table({"k": [500], "s": ["r"], "x-deadbeef": ["boom"]}), staged)
    assert fresh != "x-deadbeef"
    with pytest.raises(VersionConflictError, match="diverged"):
        _commit_staged_files(path, [staged], overwrite=False,
                             stats_cols=None, bloom_cols=None,
                             plan=plan, evolve=True)


def test_dsv2_write_racing_rename_refused(spark, tmp_path):
    """A rename landing between DSv2 write planning and commit fails
    the commit LOUDLY (Delta's MetadataChangedException shape): the
    staged files carry the planning-time physical layout, which the
    moved mapping may no longer read back. Driven through the shared
    commit helper in-process (the real DSv2 writer plans and commits
    inside Spark's Python worker, out of monkeypatch reach); plain
    interleaved appends keep rebasing (covered by the probe leg and
    the stream-writer txn tests)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from clx_etl_spark.sinks.versioned import VersionConflictError
    from clx_etl_spark.sources.table_source import (_commit_staged_files,
                                                    _plan_write_mapping)

    _register(spark)
    path = str(tmp_path / "t")
    _seed(spark, path, n=10)
    schema = spark.createDataFrame(
        [], "k long, s string, x double").schema
    plan = _plan_write_mapping(path, schema)  # planning-time: unmapped
    assert not plan["active"]
    staging = os.path.join(path, "data", "dsv2-race")
    os.makedirs(staging)
    staged = os.path.join(staging, "part-race.parquet")
    pq.write_table(pa.table({"k": [500], "s": ["r"], "x": [5.0]}), staged)
    rename_column(path, "k", "key")  # the race: DDL lands mid-write
    with pytest.raises(VersionConflictError, match="column-mapping commit"):
        _commit_staged_files(path, [staged], overwrite=False,
                             stats_cols=None, bloom_cols=None, plan=plan)
    # nothing committed; the table answers under the new name
    out = read_version(spark, path)
    assert out.columns == ["key", "s", "x"]
    assert out.count() == 10
    # and a fresh (re-planned) write under the new name lands cleanly
    (spark.createDataFrame([(500, "r", 5.0)],
                           "key long, s string, x double").coalesce(1)
     .write.format("clx_table").option("path", path)
     .mode("append").save())
    assert read_version(spark, path).filter(
        F.col("key") == 500).count() == 1


def test_change_feed_crosses_rename_and_drop(spark, tmp_path):
    """VERDICT r11 item 1: batch CDF across column-mapping commits.
    Physical names are stable across renames, so each commit's change
    frame translates exactly to the RANGE-END version's logical names
    (Delta columnMapping CDF) instead of refusing the range. Dropped
    columns leave every frame (the end schema rules); a re-added name
    gets a fresh physical, so pre-drop frames surface NULL for it —
    old bytes never alias onto the new column."""
    path = str(tmp_path / "t")
    _seed(spark, path, n=4)                        # v0: k,s,x
    rename_column(path, "k", "key")                # v1 (metadata)
    append_version(
        spark.createDataFrame([(100, "a", 5.0)],
                              "key long, s string, x double").coalesce(1),
        path)                                      # v2
    drop_columns(path, ["x"])                      # v3 (metadata)
    merge_version(
        spark.createDataFrame([(100, "updated")], "key long, s string"),
        path, keys=["key"], change_feed=True)      # v4: update via merge
    ch = table_changes(spark, path, -1)
    assert set(ch.columns) == {"key", "s", "_change_type",
                               "_commit_version"}  # x gone everywhere
    rows = {(r.key, r._change_type, r._commit_version)
            for r in ch.collect()}
    # v0's appends answer under the HEAD name 'key'
    assert (0, "insert", 0) in rows and (3, "insert", 0) in rows
    assert (100, "insert", 2) in rows
    assert (100, "update_preimage", 4) in rows
    assert (100, "update_postimage", 4) in rows
    # metadata commits contribute zero rows
    assert not any(v in (1, 3) for _, _, v in rows)
    # re-add 'x' (fresh physical) and append a value: old frames NULL
    add_columns(path, [("x", DoubleType())])       # v5 (metadata no-op row)
    append_version(
        spark.createDataFrame([(200, "n", 9.0)],
                              "key long, s string, x double").coalesce(1),
        path)                                      # v6
    ch2 = table_changes(spark, path, -1)
    got = {r.key: (r.x, r._commit_version) for r in ch2.collect()
           if r._change_type == "insert"}
    assert got[200] == (9.0, 6)
    assert got[0][0] is None      # pre-drop frame: never the old bytes
    assert got[100][0] is None
    # sub-range fully on one side of the mapping commits: untranslated
    tail = table_changes(spark, path, 5)
    assert [r.key for r in tail.collect()] == [200]


def test_change_feed_replays_per_version_names(spark, tmp_path):
    """CDC across a rename: each commit's changes replay under THAT
    version's logical names (append legs rename physical->logical with
    the commit's own colmap)."""
    path = str(tmp_path / "t")
    _seed(spark, path, n=10)
    rename_column(path, "k", "key")
    append_version(
        spark.createDataFrame([(100, "n", 1.0)],
                              "key long, s string, x double").coalesce(1),
        path)
    ch = table_changes(spark, path, 1)  # post-rename appends only
    assert "key" in ch.columns
    assert [r.key for r in ch.collect()] == [100]


def test_dv_delete_under_mapping(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    rename_column(path, "k", "key")
    v, dv_files, deleted = delete_version_dv(spark, path, "key", 0, 9)
    assert deleted == 10
    assert read_version(spark, path).count() == 90
    # copy-on-write delete and compaction keep working on the mapping
    delete_version(spark, path, "key", 10, 19)
    assert read_version(spark, path).count() == 80
    compact_version(spark, path)
    out = read_version(spark, path)
    assert out.columns == ["key", "s", "x"]
    assert out.count() == 80
    # stats re-derived by compaction stay physical-keyed: prune works
    kept, total = pruned_file_count(path, "key", 50, 50)
    assert kept <= total


def test_clone_and_rollback_carry_mapping(spark, tmp_path):
    path = str(tmp_path / "t")
    _seed(spark, path)
    rename_column(path, "k", "key")
    dst = str(tmp_path / "c")
    clone_table(path, dst)
    assert read_version(spark, dst).columns == ["key", "s", "x"]
    drop_columns(path, ["x"])
    rollback_version(path, 1)  # restore the pre-drop (renamed) contract
    assert table_schema(path).fieldNames() == ["key", "s", "x"]
    assert read_version(spark, path).agg(F.count("x")).first()[0] == 100


def test_concurrent_append_across_rename_refused(
    spark, tmp_path, monkeypatch
):
    """An append that loses the CAS to an interleaved RENAME discards
    its staged files and re-enforces against the head: the batch still
    speaks the OLD logical name, so it is refused LOUDLY (Delta's
    MetadataChangedException shape) — never committed under a stale
    name translation. The table stays consistent under the new name."""
    import clx_etl_spark.sinks.versioned as V

    path = str(tmp_path / "t")
    _seed(spark, path, n=10)
    real = V._commit
    fired = {}

    def racing(p, version, *a, **kw):
        if not fired and kw.get("colmap") is None and a and a[1] == "append":
            fired["x"] = True
            rename_column(path, "k", "key")
        return real(p, version, *a, **kw)

    monkeypatch.setattr(V, "_commit", racing)
    with pytest.raises(SchemaEnforcementError, match="'k'|\\['k'\\]"):
        append_version(
            spark.createDataFrame([(500, "r", 5.0)],
                                  "k long, s string, x double").coalesce(1),
            path)
    monkeypatch.undo()
    out = read_version(spark, path)
    assert out.columns == ["key", "s", "x"]
    assert out.count() == 10  # nothing landed
    # the same batch re-issued under the NEW name commits cleanly
    append_version(
        spark.createDataFrame([(500, "r", 5.0)],
                              "key long, s string, x double").coalesce(1),
        path)
    assert read_version(spark, path).filter(
        F.col("key") == 500).count() == 1


def test_describe_and_history_surface_mapping(spark, tmp_path):
    from clx_etl_spark.sinks.versioned import history

    path = str(tmp_path / "t")
    _seed(spark, path)
    rename_column(path, "k", "key")
    drop_columns(path, ["x"])
    d = describe_table(path)
    assert d["column_mapping"] == {"key": "k"}
    assert d["dropped_physical"] == ["x"]
    assert d["schema"] == "struct<key:bigint,s:string>"
    # stats coverage reports LOGICAL names, retired physicals hidden
    assert "key" in d["stats_coverage"] and "x" not in d["stats_coverage"]
    h = {r.version: (r.op, r.schema_changed)
         for r in history(spark, path).collect()}
    assert h[1] == ("rename-column", True)
    assert h[2] == ("drop-columns", True)


def test_merge_evolve_gets_fresh_physical_after_drop(spark, tmp_path):
    """Review r10 (confirmed data loss): a MERGE with evolve=True whose
    new column's name matches a DROPPED column's retired physical must
    map it to a fresh physical — pre-fix the merged values were written
    under the retired name and hidden on every read."""
    from clx_etl_spark.sinks.versioned import merge_version_dv

    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "k long, tag string").coalesce(1),
        path, stats_cols=["k"])
    drop_columns(path, ["tag"])  # physical 'tag' retires
    merge_version(
        spark.createDataFrame([(2, "B2"), (3, "C3")],
                              "k long, tag string"),
        path, keys=["k"], evolve=True)
    m = _read_manifest(path, latest_version(path))
    assert m["colmap"]["m"]["tag"].startswith("tag-")  # fresh physical
    got = {r.k: r.tag for r in read_version(spark, path).collect()}
    assert got == {1: None, 2: "B2", 3: "C3"}  # nothing hidden
    # same rule on the merge-on-read flavor
    drop_columns(path, ["tag"])  # retire the fresh physical too
    merge_version_dv(
        spark.createDataFrame([(3, "C4"), (4, "D4")],
                              "k long, tag string"),
        path, keys=["k"], evolve=True)
    got = {r.k: r.tag for r in read_version(spark, path).collect()}
    assert got == {1: None, 2: None, 3: "C4", 4: "D4"}


def test_dsv2_time_travel_reads_version_names(spark, tmp_path):
    """Review r10: DSv2 time travel must pair the TARGET version's
    schema with its colmap — pre-fix the head contract ('oid') was
    paired with the old snapshot's identity mapping and the renamed
    column read back all-NULL."""
    from clx_etl_spark.sources.table_source import read_table_source

    path = str(tmp_path / "t")
    _seed(spark, path, n=10)
    rename_column(path, "k", "key")
    df0 = read_table_source(spark, path, version=0)
    assert df0.columns == ["k", "s", "x"]      # the v0 names
    assert df0.agg(F.count("k")).first()[0] == 10  # and the v0 DATA
    dfh = read_table_source(spark, path)
    assert dfh.columns == ["key", "s", "x"]
    assert dfh.agg(F.count("key")).first()[0] == 10


def test_drop_columns_dedupes_input(spark, tmp_path):
    """Review r10: duplicate names must neither trip the drop-everything
    guard nor retire a bogus physical."""
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a")], "a long, b string").coalesce(1),
        path)
    drop_columns(path, ["a", "a"])
    m = _read_manifest(path, latest_version(path))
    assert table_schema(path).fieldNames() == ["b"]
    assert m["colmap"]["x"] == ["a"]  # retired once, no bogus entry


def test_writer_without_schema_refuses_mapped_table(spark, tmp_path):
    """Review r11 (silent-corruption hole): a writer constructed with
    no write schema on a MAPPED table must refuse at planning like the
    r10 gate — with pmap unplannable, staged files would keep LOGICAL
    names, pass every check, and read back as NULL-padded rows."""
    from clx_etl_spark.sources.table_source import (TableStreamWriter,
                                                    TableWriter)

    path = str(tmp_path / "t")
    _seed(spark, path, n=10)
    rename_column(path, "k", "key")
    with pytest.raises(ValueError, match="no write schema"):
        TableWriter({"path": path}, overwrite=False)
    with pytest.raises(ValueError, match="no write schema"):
        TableStreamWriter({"path": path,
                           "checkpointlocation": str(tmp_path / "ck")})
    # unmapped tables keep accepting schema-less construction
    p2 = str(tmp_path / "plain")
    append_version(
        spark.range(3).selectExpr("id").coalesce(1), p2)
    TableWriter({"path": p2}, overwrite=False)
