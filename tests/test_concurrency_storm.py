"""Multi-writer concurrency storm over one versioned table: REAL
threads racing through the optimistic-concurrency machinery (no
monkeypatched interleavings — those live in test_sinks /
test_versioned_schema; this file proves the machinery under actual
contention). The invariants of every storm:

  * version numbers stay DENSE (manifest CAS never skips or clobbers),
  * row accounting is EXACT (no lost appends, no duplicated rebases,
    deletes remove exactly their range),
  * every manifest-listed file exists on disk (no commit references a
    loser's orphan),
  * the file-skipping stats survive (rebases carry base_stats).

Delta analog: AppendOnly commits never conflict (rebase), rewriting
commits fail loudly. Reference analog: the reference serializes all
writes through one asyncio loop (/root/reference/src/main.py) — this
engine must instead survive N independent Spark jobs committing at
once, because a 1000-executor cluster has no single loop."""

from __future__ import annotations

import os
import threading

from pyspark.sql import functions as F

from clx_etl_spark.sinks.versioned import (
    _read_manifest,
    append_version,
    compact_version,
    delete_version_dv,
    latest_version,
    pruned_file_count,
    read_version,
)


def _run_threads(workers):
    errs: list[BaseException] = []

    def wrap(fn):
        def body():
            try:
                fn()
            except BaseException as e:  # noqa: BLE001 - surfaced below
                errs.append(e)
        return body

    ts = [threading.Thread(target=wrap(w)) for w in workers]
    for t in ts:
        t.start()
    for t in ts:
        t.join(300)
    assert not any(t.is_alive() for t in ts), "storm thread hung"
    if errs:
        raise errs[0]
    return errs


def _assert_manifest_integrity(path: str) -> int:
    head = latest_version(path)
    for v in range(head + 1):  # dense history, every file present
        m = _read_manifest(path, v)
        for f in m["files"]:
            assert os.path.exists(f), f"v{v} lists missing file {f}"
    return head


def test_append_storm_exact_accounting(spark, tmp_path):
    """6 threads x 4 appends of disjoint id ranges, all racing the
    manifest CAS: every append must land exactly once (the rebase loop
    re-commits losers against the new head without re-writing files)."""
    path = str(tmp_path / "t")
    append_version(
        spark.range(0, 100).selectExpr("id", "cast(id as double) as x")
        .coalesce(1), path, stats_cols=["id"])

    def appender(tid: int):
        def body():
            for b in range(4):
                lo = 1000 * (1 + tid * 4 + b)
                append_version(
                    spark.range(lo, lo + 100).selectExpr(
                        "id", "cast(id as double) as x").coalesce(1),
                    path, stats_cols=["id"])
        return body

    _run_threads([appender(t) for t in range(6)])
    head = _assert_manifest_integrity(path)
    assert head == 24  # seed + exactly one version per append
    out = read_version(spark, path)
    assert out.count() == 100 + 24 * 100
    # no duplicated or lost ids anywhere in the union
    assert out.select("id").distinct().count() == out.count()
    # stats carried through every rebase: point scan prunes to 1 file
    kept, total = pruned_file_count(path, "id", 1000, 1000)
    assert (kept, total) == (1, 25)


def test_append_storm_with_compactions(spark, tmp_path):
    """Appends landing WHILE compactions run: OPTIMIZE rebases through
    interleaved appends (carrying their files by reference) and appends
    rebase through the compaction's overwrite — zero lost commits on
    either side."""
    path = str(tmp_path / "t")
    for i in range(4):
        append_version(
            spark.range(i * 100, i * 100 + 100).selectExpr(
                "id", "cast(id as double) as x").coalesce(1),
            path, stats_cols=["id"])

    def appender(tid: int):
        def body():
            for b in range(3):
                lo = 10_000 * (1 + tid * 3 + b)
                append_version(
                    spark.range(lo, lo + 50).selectExpr(
                        "id", "cast(id as double) as x").coalesce(1),
                    path, stats_cols=["id"])
        return body

    def compactor():
        for _ in range(2):
            compact_version(spark, path, target_bytes=1 << 30)

    _run_threads([appender(0), appender(1), appender(2), compactor])
    _assert_manifest_integrity(path)
    out = read_version(spark, path)
    assert out.count() == 400 + 9 * 50
    assert out.select("id").distinct().count() == out.count()
    # the storm's versions: 9 appends + 2 compactions on the 4-seed
    assert latest_version(path) == 3 + 9 + 2


def test_append_storm_with_dv_deletes(spark, tmp_path):
    """Appends racing merge-on-read deletes: dv commits are
    append-safe against appends (disjoint read sets), so both sides
    rebase and the final accounting is exact."""
    path = str(tmp_path / "t")
    for i in range(4):
        append_version(
            spark.range(i * 1000, i * 1000 + 1000).selectExpr(
                "id", "cast(id as double) as x").coalesce(1),
            path, stats_cols=["id"])

    deleted = {"n": 0}

    def appender(tid: int):
        def body():
            for b in range(3):
                lo = 100_000 * (1 + tid * 3 + b)
                append_version(
                    spark.range(lo, lo + 50).selectExpr(
                        "id", "cast(id as double) as x").coalesce(1),
                    path, stats_cols=["id"])
        return body

    def deleter():
        # three disjoint ranges inside the seeded files
        for lo in (0, 1000, 2000):
            _, _, n = delete_version_dv(spark, path, "id", lo, lo + 99)
            deleted["n"] += n

    _run_threads([appender(0), appender(1), deleter])
    _assert_manifest_integrity(path)
    assert deleted["n"] == 300
    out = read_version(spark, path)
    assert out.count() == 4000 + 6 * 50 - 300
    assert out.filter((F.col("id") >= 0) & (F.col("id") <= 99)).count() == 0
    assert out.select("id").distinct().count() == out.count()


def test_torn_latest_hint_recovers(spark, tmp_path):
    """A torn/empty _latest hint (the truncating-write window of
    pre-r11 engines, or an interrupted writer) must not wedge the
    table: latest_version falls back to probing the JSON-validated
    manifest chain, and the next commit rewrites the hint atomically."""
    path = str(tmp_path / "t")
    for i in range(3):
        append_version(
            spark.range(i, i + 1).selectExpr("id").coalesce(1), path)
    hint = os.path.join(path, "_manifests", "_latest")
    open(hint, "w").close()  # torn: exists but empty
    assert latest_version(path) == 2
    assert read_version(spark, path).count() == 3
    append_version(spark.range(9, 10).selectExpr("id").coalesce(1), path)
    assert latest_version(path) == 3
    with open(hint) as fh:  # the commit healed the hint
        assert fh.read().strip() == "3"


def test_torn_hint_recovers_after_expiry(spark, tmp_path):
    """Torn hint on a table whose EARLY history was expired: the
    fallback must find the head from the manifest directory listing,
    not a probe from version 0 (those manifests are gone)."""
    from clx_etl_spark.sinks.versioned import expire_versions

    path = str(tmp_path / "t")
    for i in range(5):
        append_version(
            spark.range(i, i + 1).selectExpr("id").coalesce(1), path)
    expire_versions(path, keep_latest=2)  # v0-v2 manifests reclaimed
    hint = os.path.join(path, "_manifests", "_latest")
    with open(hint, "w") as fh:
        fh.write("not-a-number")  # corrupt, not just empty
    assert latest_version(path) == 4
    assert read_version(spark, path).count() == 5


def test_dsv2_and_engine_writers_race(spark, tmp_path):
    """The two write doors (engine append_version and the DSv2
    write.format('clx_table') path) share one manifest CAS: racing
    them must lose nothing — each door's rebase carries the other's
    files by reference."""
    from clx_etl_spark.sources.table_source import write_table_source

    path = str(tmp_path / "t")
    append_version(
        spark.range(0, 100).selectExpr("id", "cast(id as double) as x")
        .coalesce(1), path, stats_cols=["id"])

    def engine_appender():
        for b in range(4):
            lo = 1000 * (b + 1)
            append_version(
                spark.range(lo, lo + 100).selectExpr(
                    "id", "cast(id as double) as x").coalesce(1),
                path, stats_cols=["id"])

    def dsv2_appender():
        for b in range(4):
            lo = 100_000 * (b + 1)
            write_table_source(
                spark.range(lo, lo + 100).selectExpr(
                    "id", "cast(id as double) as x").coalesce(1),
                path, stats_cols=["id"])

    _run_threads([engine_appender, dsv2_appender])
    head = _assert_manifest_integrity(path)
    assert head == 8
    out = read_version(spark, path)
    assert out.count() == 900
    assert out.select("id").distinct().count() == 900
    kept, total = pruned_file_count(path, "id", 100_000, 100_000)
    assert (kept, total) == (1, 9)


def test_rename_racing_appends_never_corrupts(spark, tmp_path):
    """A RENAME landing mid-storm: appends under the OLD name that lose
    the race refuse LOUDLY (never commit under a stale translation);
    appends that won before it landed — whichever interleaving the
    scheduler produced — are fully present. Either way the table is
    consistent: version chain dense, every committed row readable
    under the new name, nothing half-applied."""
    from clx_etl_spark.sinks.versioned import (SchemaEnforcementError,
                                               rename_column,
                                               table_schema)

    path = str(tmp_path / "t")
    append_version(
        spark.range(0, 100).selectExpr("id", "cast(id as double) as x")
        .coalesce(1), path, stats_cols=["id"])
    landed, refused = [], []

    def appender():
        for b in range(6):
            lo = 1000 * (b + 1)
            try:
                append_version(
                    spark.range(lo, lo + 10).selectExpr(
                        "id", "cast(id as double) as x").coalesce(1),
                    path, stats_cols=["id"])
                landed.append(lo)
            except SchemaEnforcementError:
                refused.append(lo)  # raced the rename: loud, not silent

    def renamer():
        import time

        time.sleep(0.4)  # land mid-storm
        rename_column(path, "id", "event_id")

    _run_threads([appender, renamer])
    head = _assert_manifest_integrity(path)
    assert table_schema(path).fieldNames() == ["event_id", "x"]
    out = read_version(spark, path)
    # exactly the appends that committed are present — once each
    assert out.count() == 100 + 10 * len(landed)
    assert out.select("event_id").distinct().count() == out.count()
    # the rename + every landed append has a version; nothing extra
    assert head == 1 + len(landed)
    # appends refused post-rename re-issue cleanly under the new name
    for lo in refused:
        append_version(
            spark.range(lo, lo + 10).selectExpr(
                "id as event_id", "cast(id as double) as x").coalesce(1),
            path)
    assert read_version(spark, path).count() == 100 + 60
