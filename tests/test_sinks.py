"""Sink tests: MERGE idempotence + update-column restriction + partition
ops (SURVEY K1-K4; the reference's implicit exactly-once contract §2.11)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clx_etl_spark.sinks.upsert import (
    append_partitioned,
    drop_partitions,
    merge_upsert,
    overwrite_partitions,
)


def _table_hash(spark, path):
    df = spark.read.parquet(path)
    rows = sorted(map(str, df.select(*sorted(df.columns)).collect()))
    return hash(tuple(rows))


def test_merge_upsert_idempotent(spark, tmp_path):
    path = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "BTCUSDT", 0, "0.1", 0), (1, "ETHUSDT", 0, "0.01", 0)],
        "exchange_id int, symbol string, inst_type int, tick_size string, status int",
    )
    merge_upsert(spark, base, path, keys=["exchange_id", "symbol", "inst_type"])
    h1 = _table_hash(spark, path)
    # re-applying the same batch changes nothing
    merge_upsert(spark, base, path, keys=["exchange_id", "symbol", "inst_type"])
    assert _table_hash(spark, path) == h1


def test_merge_upsert_updates_and_inserts(spark, tmp_path):
    path = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "BTCUSDT", 0, "0.1", 0)],
        "exchange_id int, symbol string, inst_type int, tick_size string, status int",
    )
    merge_upsert(spark, base, path, keys=["exchange_id", "symbol", "inst_type"])
    batch = spark.createDataFrame(
        [(1, "BTCUSDT", 0, "0.2", 1), (1, "SOLUSDT", 0, "0.001", 0)],
        "exchange_id int, symbol string, inst_type int, tick_size string, status int",
    )
    merge_upsert(spark, batch, path, keys=["exchange_id", "symbol", "inst_type"])
    out = {r.symbol: r for r in spark.read.parquet(path).collect()}
    assert len(out) == 2
    assert out["BTCUSDT"].tick_size == "0.2" and out["BTCUSDT"].status == 1
    assert out["SOLUSDT"].tick_size == "0.001"


def test_merge_upsert_restricted_update_cols(spark, tmp_path):
    """The reference updates only the 5 mutable columns (_base_.py:113-120);
    other stored values must survive an update that tries to change them."""
    path = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "BTCUSDT", 0, "0.1", "BTC")],
        "exchange_id int, symbol string, inst_type int, tick_size string, base_asset string",
    )
    merge_upsert(spark, base, path, keys=["exchange_id", "symbol", "inst_type"])
    batch = spark.createDataFrame(
        [(1, "BTCUSDT", 0, "0.5", "XXX"), (1, "ETHUSDT", 0, "0.01", "ETH")],
        "exchange_id int, symbol string, inst_type int, tick_size string, base_asset string",
    )
    merge_upsert(
        spark, batch, path,
        keys=["exchange_id", "symbol", "inst_type"], update_cols=["tick_size"],
    )
    out = {r.symbol: r for r in spark.read.parquet(path).collect()}
    assert out["BTCUSDT"].tick_size == "0.5"       # updated
    assert out["BTCUSDT"].base_asset == "BTC"      # protected from update
    assert out["ETHUSDT"].base_asset == "ETH"      # insert keeps its value


def test_merge_upsert_keeps_stored_null_in_carry_col(spark, tmp_path):
    """'Unlisted columns keep the stored value' includes a stored NULL: a
    matched row's carry column must stay NULL, not resurrect the incoming
    value (the old coalesce path got this wrong)."""
    path = str(tmp_path / "dim")
    base = spark.createDataFrame(
        [(1, "BTCUSDT", 0, "0.1", None)],
        "exchange_id int, symbol string, inst_type int, tick_size string, base_asset string",
    )
    merge_upsert(spark, base, path, keys=["exchange_id", "symbol", "inst_type"])
    batch = spark.createDataFrame(
        [(1, "BTCUSDT", 0, "0.5", "SNEAKY")],
        "exchange_id int, symbol string, inst_type int, tick_size string, base_asset string",
    )
    merge_upsert(
        spark, batch, path,
        keys=["exchange_id", "symbol", "inst_type"], update_cols=["tick_size"],
    )
    row = spark.read.parquet(path).first()
    assert row.tick_size == "0.5"
    assert row.base_asset is None  # stored NULL survives the update


def test_overwrite_partitions_converges(spark, tmp_path):
    path = str(tmp_path / "fact")
    day1 = spark.createDataFrame(
        [(1, 100, "2024-01-01"), (2, 200, "2024-01-01")], "k int, v int, dt_date string"
    )
    day2 = spark.createDataFrame([(3, 300, "2024-01-02")], "k int, v int, dt_date string")
    append_partitioned(day1, path, ["dt_date"])
    append_partitioned(day2, path, ["dt_date"])
    # re-backfill day1 with corrected values; day2 untouched
    fix = spark.createDataFrame(
        [(1, 101, "2024-01-01"), (2, 201, "2024-01-01")], "k int, v int, dt_date string"
    )
    overwrite_partitions(fix, path, ["dt_date"])
    overwrite_partitions(fix, path, ["dt_date"])  # idempotent re-run
    out = spark.read.parquet(path)
    assert out.count() == 3
    assert {r.v for r in out.filter(F.col("dt_date") == "2024-01-01").collect()} == {101, 201}
    assert out.filter(F.col("dt_date") == "2024-01-02").count() == 1


def test_drop_partitions(spark, tmp_path):
    path = str(tmp_path / "fact")
    df = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "k int, dt_date string"
    )
    append_partitioned(df, path, ["dt_date"])
    assert drop_partitions(path, ["dt_date"], [("2024-01-01",)]) == 1
    # partition values are type-inferred on read (string -> date)
    assert [str(r.dt_date) for r in spark.read.parquet(path).select("dt_date").collect()] == [
        "2024-01-02"
    ]


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Both sides bucketed on the join key -> SortMergeJoin with ZERO
    Exchange operators: the 100 TB co-location story, plan-verified."""
    from clx_etl_spark.sinks.bucketed import read_table, write_bucketed

    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path}/wh'")
    facts = spark.range(0, 10_000).selectExpr(
        "id % 100 AS key", "id AS v1"
    )
    other = spark.range(0, 5_000).selectExpr("id % 100 AS key", "id AS v2")
    write_bucketed(facts, "bkt.facts", ["key"], n_buckets=8)
    write_bucketed(other, "bkt.other", ["key"], n_buckets=8)

    # disable auto-broadcast: at real scale neither side fits; the point
    # is the shuffle-free sort-merge join from co-located buckets
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table(spark, "bkt.facts").join(read_table(spark, "bkt.other"), "key")
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = j._jdf.queryExecution().explainString(mode)
        assert "SortMergeJoin" in plan and "Exchange" not in plan, plan
        # correctness: every key pairs 100 x 50
        assert j.count() == 100 * 100 * 50
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # grouped agg on the bucket key also skips the shuffle
    g = read_table(spark, "bkt.facts").groupBy("key").count()
    gplan = g._jdf.queryExecution().explainString(mode)
    assert "Exchange" not in gplan, gplan


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """dt_date-partitioned fact layout: a date predicate must become a
    PartitionFilter (directory pruning), not a row filter — the mechanism
    that turns a 100 TB scan into a single-day scan."""
    from clx_etl_spark.sinks.upsert import append_partitioned

    df = spark.createDataFrame(
        [(i, f"2024-01-{(i % 5) + 1:02d}", float(i)) for i in range(1000)],
        "id long, dt_date string, v double",
    )
    path = str(tmp_path / "fact")
    append_partitioned(df, path, ["dt_date"])

    rd = spark.read.parquet(path).filter(F.col("dt_date") == "2024-01-03")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = rd._jdf.queryExecution().explainString(mode)
    assert "PartitionFilters" in plan
    assert "dt_date" in plan.split("PartitionFilters")[1].split("]")[0]
    assert rd.count() == 200
    # directory layout really is hive-partitioned
    import os
    assert sorted(d for d in os.listdir(path) if d.startswith("dt_date="))[2] == "dt_date=2024-01-03"


def test_compact_partitions_merges_small_files(spark, tmp_path):
    """Micro-batch fragmentation -> one right-sized file per partition;
    data identical; sort_cols tighten footer min/max for row-group skips."""
    from pyspark.sql import functions as F

    from clx_etl_spark.sinks.layout import compact_partitions, partition_file_stats

    path = str(tmp_path / "fact")
    # simulate 12 micro-batch appends of 500 rows across 2 date partitions
    for batch in range(12):
        spark.range(500).select(
            (F.col("id") + batch * 500).alias("ts"),
            (F.col("id") % 7).alias("key"),
            F.lit(f"2026-01-0{1 + batch % 2}").alias("dt_date"),
        ).write.mode("append").partitionBy("dt_date").parquet(path)
    before = partition_file_stats(spark, path)
    assert all(n >= 6 for n in before.values()), before  # really fragmented
    expected = spark.read.parquet(path).groupBy("key").count().collect()

    after = compact_partitions(
        spark, path, ["dt_date"], target_file_bytes=256 * 1024 * 1024,
        sort_cols=["ts"],
    )
    assert set(after) == set(before)
    assert all(n == 1 for n in after.values()), after  # tiny data -> 1 file each
    got = spark.read.parquet(path).groupBy("key").count().collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, expected))
    # second compaction is a no-op shapewise (idempotent maintenance)
    again = compact_partitions(spark, path, ["dt_date"])
    assert again == after


def test_zorder_layout_tightens_all_dimensions(spark, tmp_path):
    """Z-order vs single-column sort: per-file bounding boxes must be
    tight in BOTH dimensions (that's what multi-dim skipping needs);
    a lexicographic sort leaves the second column at ~full range."""
    import pyspark.sql.functions as F

    from clx_etl_spark.sinks.layout import zorder_layout

    n = 20_000
    df = spark.range(n).selectExpr(
        "CAST(id % 141 AS LONG) AS x", "CAST((id * 7919) % 149 AS LONG) AS y"
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    zorder_layout(df, zpath, ["x", "y"], n_files=16)
    (df.repartitionByRange(16, "x").sortWithinPartitions("x", "y")
       .write.parquet(spath))

    def mean_file_span(path, col):
        back = spark.read.parquet(path).withColumn("_f", F.input_file_name())
        spans = back.groupBy("_f").agg(
            (F.max(col) - F.min(col)).alias("span")
        ).collect()
        return sum(r.span for r in spans) / len(spans)

    # both layouts are tight on x...
    assert mean_file_span(zpath, "x") < 141 * 0.45
    assert mean_file_span(spath, "x") < 141 * 0.45
    # ...but only z-order is also tight on y
    assert mean_file_span(zpath, "y") < 149 * 0.55
    assert mean_file_span(spath, "y") > 149 * 0.9


def test_zorder_key_is_bijective_on_the_grid(spark):
    """Bit interleaving must be collision-free over the quantized grid
    (a collision would merge unrelated regions into one file range)."""
    from clx_etl_spark.sinks.layout import zorder_key

    df = spark.range(32 * 32).selectExpr("id % 32 AS x", "id div 32 AS y")
    key = zorder_key(["x", "y"], bits=5, bounds={"x": (0, 32), "y": (0, 32)})
    out = df.select(key.alias("z"))
    assert out.distinct().count() == 1024
    assert out.agg({"z": "max"}).first()[0] <= 1023


def test_expire_partitions_retention(spark, tmp_path):
    from clx_etl_spark.sinks.upsert import expire_partitions

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"2024-01-0{d}") for d in (1, 2, 3, 4) for i in range(3)],
        "v long, dt_date string",
    )
    df.write.partitionBy("dt_date").parquet(path)
    dropped = expire_partitions(path, "dt_date", keep_latest=2)
    assert dropped == ["2024-01-01", "2024-01-02"]
    left = spark.read.parquet(path)
    assert {str(r.dt_date) for r in left.select("dt_date").distinct().collect()} == {
        "2024-01-03", "2024-01-04"
    }
    assert left.count() == 6


# --- versioned snapshots (sinks/versioned.py) ------------------------------


def test_versioned_time_travel_append_and_read(spark, tmp_path):
    from clx_etl_spark.sinks.versioned import (append_version, latest_version,
                                               read_version)

    path = str(tmp_path / "vt")
    d1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    d2 = spark.createDataFrame([(3, "c")], "id long, v string")
    assert append_version(d1, path) == 0
    assert append_version(d2, path) == 1
    assert latest_version(path) == 1
    # snapshots are stable: v0 unchanged after v1 commit
    assert {r.id for r in read_version(spark, path, 0).collect()} == {1, 2}
    assert {r.id for r in read_version(spark, path).collect()} == {1, 2, 3}


def test_versioned_incremental_changes_and_overwrite_guard(spark, tmp_path):
    import pytest

    from clx_etl_spark.sinks.versioned import (append_version,
                                               overwrite_version, read_changes)

    path = str(tmp_path / "vt")
    append_version(spark.createDataFrame([(1,)], "id long"), path)
    append_version(spark.createDataFrame([(2,)], "id long"), path)
    append_version(spark.createDataFrame([(3,)], "id long"), path)
    # delta between v0 and latest = rows added in v1+v2 only
    assert {r.id for r in read_changes(spark, path, 0).collect()} == {2, 3}
    assert {r.id for r in read_changes(spark, path, 1, 2).collect()} == {3}
    # an overwrite breaks append-only lineage: incremental read refuses
    overwrite_version(spark.createDataFrame([(9,)], "id long"), path)
    with pytest.raises(ValueError, match="overwrite"):
        read_changes(spark, path, 0)
    # but changes AFTER the overwrite are exact again
    append_version(spark.createDataFrame([(10,)], "id long"), path)
    assert {r.id for r in read_changes(spark, path, 3).collect()} == {10}


def test_versioned_expire_keeps_survivors_readable(spark, tmp_path):
    import glob
    import os

    from clx_etl_spark.sinks.versioned import (append_version, expire_versions,
                                               overwrite_version, read_version)

    path = str(tmp_path / "vt")
    append_version(spark.createDataFrame([(1,)], "id long"), path)
    overwrite_version(spark.createDataFrame([(2,)], "id long"), path)
    append_version(spark.createDataFrame([(3,)], "id long"), path)
    deleted = expire_versions(path, keep_latest=2)
    # v0's files are unreferenced by v1/v2 (v1 overwrote) -> physically gone
    assert deleted and all("/v0-" in f for f in deleted)
    assert {r.id for r in read_version(spark, path, 2).collect()} == {2, 3}
    assert {r.id for r in read_version(spark, path, 1).collect()} == {2}
    assert not os.path.exists(os.path.join(path, "_manifests", "v0.json"))
    # every remaining physical file is referenced
    import json
    refs = set()
    for m in glob.glob(os.path.join(path, "_manifests", "v*.json")):
        refs.update(json.load(open(m))["files"])
    on_disk = set(glob.glob(os.path.join(path, "data", "*", "*.parquet")))
    assert on_disk == refs


def test_versioned_changes_feed_incremental_rollup(spark, tmp_path):
    """The composed incremental pipeline: facts land as versioned
    commits, each refresh consumes read_changes (O(delta)) and merges
    into the rollup — final rollup equals a full recompute over the
    latest snapshot."""
    from clx_etl_spark.operators.incremental import (incremental_refresh,
                                                     partial_daily_state)
    from clx_etl_spark.sinks.versioned import (append_version, read_changes,
                                               read_version)

    facts = str(tmp_path / "facts")
    rollup = str(tmp_path / "rollup")
    base = 1_704_067_200_000  # 2024-01-01 in ms
    schema = "ts_ms long, event_type string, value double"

    v0 = append_version(
        spark.createDataFrame(
            [(base + i, "view" if i % 2 else "click", float(i)) for i in range(10)],
            schema,
        ),
        facts,
    )
    incremental_refresh(spark, read_version(spark, facts, v0), rollup)
    for day in (1, 2):
        v = append_version(
            spark.createDataFrame(
                [(base + day * 86_400_000 + i, "view", float(i)) for i in range(5)],
                schema,
            ),
            facts,
        )
        incremental_refresh(spark, read_changes(spark, facts, v - 1, v), rollup)

    got = {
        (r.day_id, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v)
        for r in spark.read.parquet(rollup).collect()
    }
    want = {
        (r.day_id, r.event_type): (r.n, r.sum_v, r.min_v, r.max_v)
        for r in partial_daily_state(read_version(spark, facts)).collect()
    }
    assert got == want


def test_versioned_merge_and_schema_evolution(spark, tmp_path):
    from clx_etl_spark.sinks.versioned import (append_version, merge_version,
                                               read_version)

    path = str(tmp_path / "vt")
    append_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), path
    )
    v1 = merge_version(
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"),
        path, keys=["id"],
    )
    assert {(r.id, r.v) for r in read_version(spark, path, v1).collect()} == {
        (1, "a"), (2, "B"), (3, "c")
    }
    # time travel still shows the pre-merge state
    assert {(r.id, r.v) for r in read_version(spark, path, 0).collect()} == {
        (1, "a"), (2, "b")
    }
    # schema evolution is opt-in (r09 contract): the bare append refuses
    # the extra column; evolve=True widens it and old files read NULL
    import pytest

    from clx_etl_spark.sinks.versioned import SchemaEnforcementError

    wide = spark.createDataFrame(
        [(4, "d", 9.5)], "id long, v string, score double")
    with pytest.raises(SchemaEnforcementError, match="evolve=True"):
        append_version(wide, path)
    append_version(wide, path, evolve=True)
    rows = {r.id: r.score for r in read_version(spark, path).collect()}
    assert rows[4] == 9.5 and rows[1] is None


def test_versioned_data_skipping_prunes_files(spark, tmp_path):
    from clx_etl_spark.sinks.versioned import (append_version,
                                               pruned_file_count, scan_version)

    path = str(tmp_path / "vt")
    for lo in (0, 100, 200):
        append_version(
            spark.createDataFrame(
                [(lo + i, f"r{lo + i}") for i in range(50)], "id long, v string"
            ).coalesce(1),
            path,
            stats_cols=["id"],
        )
    keep, total = pruned_file_count(path, "id", 110, 120)
    assert total == 3 and keep == 1  # manifest stats prune 2 of 3 files
    got = {r.id for r in scan_version(spark, path, "id", 110, 120).collect()}
    assert got == set(range(110, 121))
    # empty overlap: zero files read, empty result, schema intact
    empty = scan_version(spark, path, "id", 10_000, 10_001)
    assert empty.count() == 0 and empty.columns == ["id", "v"]
    # a file committed WITHOUT stats is read conservatively, never skipped
    append_version(
        spark.createDataFrame([(115, "x")], "id long, v string").coalesce(1), path
    )
    keep2, total2 = pruned_file_count(path, "id", 110, 120)
    assert total2 == 4 and keep2 == 2
    got2 = {r.v for r in scan_version(spark, path, "id", 115, 115).collect()}
    assert got2 == {"r115", "x"}


def test_versioned_data_skipping_typed_stats(spark, tmp_path):
    """Manifest stats survive the JSON round-trip for NON-long column
    types (date, timestamp, decimal, double) and still prune; any
    stat the scan can't compare falls back to reading the file —
    conservative, never an exception (ADVICE r04: type(lo)(rng[0])
    raised on date/decimal stats and int-vs-float coercions)."""
    import datetime as dt
    import decimal
    import json
    import os

    from clx_etl_spark.sinks.versioned import (append_version,
                                               pruned_file_count,
                                               scan_version)

    path = str(tmp_path / "vt_typed")
    for m in (1, 2, 3):
        rows = [
            (
                dt.date(2024, m, d),
                dt.datetime(2024, m, d, 12, 0, 0),
                decimal.Decimal(f"{m * 100 + d}.25"),
                float(m * 100 + d),
            )
            for d in range(1, 11)
        ]
        append_version(
            spark.createDataFrame(
                rows, "d date, ts timestamp, amt decimal(10,2), x double"
            ).coalesce(1),
            path,
            stats_cols=["d", "ts", "amt", "x"],
        )
    # date bounds prune to the overlapping month's file
    keep, total = pruned_file_count(path, "d", dt.date(2024, 2, 3), dt.date(2024, 2, 5))
    assert total == 3 and keep == 1
    got = {r.d for r in scan_version(
        spark, path, "d", dt.date(2024, 2, 3), dt.date(2024, 2, 5)).collect()}
    assert got == {dt.date(2024, 2, d) for d in (3, 4, 5)}
    # timestamp bounds
    keep, _ = pruned_file_count(
        path, "ts", dt.datetime(2024, 3, 1), dt.datetime(2024, 3, 2))
    assert keep == 1
    # decimal bounds (exact string round-trip, no float drift)
    keep, _ = pruned_file_count(
        path, "amt", decimal.Decimal("201.00"), decimal.Decimal("205.00"))
    assert keep == 1
    assert scan_version(
        spark, path, "amt", decimal.Decimal("201.00"), decimal.Decimal("205.00")
    ).count() == 4
    # int query bounds against double-valued stats: native numeric compare
    keep, _ = pruned_file_count(path, "x", 101, 105)
    assert keep == 1
    # corrupt/incomparable stat entry -> file kept, no raise
    mdir = os.path.join(path, "_manifests")
    latest = max(int(f[1:-5]) for f in os.listdir(mdir) if f.startswith("v"))
    mf = os.path.join(mdir, f"v{latest}.json")
    m = json.load(open(mf))
    # corrupt the stats of a file that does NOT overlap [101, 105]
    victim = next(f for f in m["files"] if m["stats"][f]["x"][0] == 301.0)
    m["stats"][victim]["x"] = ["not-a-number", "also-not"]
    json.dump(m, open(mf, "w"))
    keep, total = pruned_file_count(path, "x", 101, 105)
    assert keep == 2 and total == 3  # the true hit + the corrupted file
    assert scan_version(spark, path, "x", 101.0, 105.0).count() == 5


def test_versioned_zorder_commit_prunes_both_dims(spark, tmp_path):
    """Z-ordered commit + manifest stats: a small 2-D box prunes most
    files; the same data committed unsorted prunes (almost) nothing —
    the layout half of the skipping story."""
    from clx_etl_spark.sinks.versioned import (overwrite_version,
                                               overwrite_version_zordered,
                                               pruned_file_count, scan_version)

    rows = [(x, y, x * 1000 + y) for x in range(0, 100, 2) for y in range(0, 100, 2)]
    df = spark.createDataFrame(rows, "x long, y long, payload long")

    zpath = str(tmp_path / "z")
    overwrite_version_zordered(df, zpath, cols=["x", "y"], n_files=16)
    keep_x, total = pruned_file_count(zpath, "x", 10, 20)
    assert total >= 8 and keep_x < total  # x-pruning works
    # and the SAME layout also prunes on y (single-col sort could not)
    keep_y, _ = pruned_file_count(zpath, "y", 10, 20)
    assert keep_y < total
    got = {
        (r.x, r.y)
        for r in scan_version(spark, zpath, "x", 10, 20)
        .filter("y between 10 and 20")
        .collect()
    }
    want = {(x, y) for x, y, _ in rows if 10 <= x <= 20 and 10 <= y <= 20}
    assert got == want

    # unsorted baseline: every file spans ~the full x range -> no pruning
    upath = str(tmp_path / "u")
    overwrite_version(
        df.repartition(16), upath, stats_cols=["x", "y"]
    )
    keep_u, total_u = pruned_file_count(upath, "x", 10, 20)
    assert keep_u == total_u
    assert keep_x <= keep_u


def test_versioned_model_based_fuzz(spark, tmp_path):
    """Model-based check of the table format: a random sequence of
    append/overwrite/merge commits against a pure-Python model — after
    every commit, EVERY committed version must still read back exactly
    its model state (time travel never drifts)."""
    import random

    rng = random.Random(1234)
    path = str(tmp_path / "vt")

    from clx_etl_spark.sinks.versioned import (append_version, merge_version,
                                               overwrite_version, read_version)

    model_versions: list[dict[int, str]] = []  # version -> {id: v}
    state: dict[int, str] = {}

    def batch():
        return {
            rng.randrange(0, 8): f"v{rng.randrange(0, 100)}"
            for _ in range(rng.randrange(1, 4))
        }

    for step in range(8):
        b = batch()
        df = spark.createDataFrame(sorted(b.items()), "id long, v string")
        op = rng.choice(["append", "overwrite", "merge"])
        if op == "append" and model_versions:
            # append keeps duplicate keys as distinct rows; model as
            # multiset — to keep the model simple, only append disjoint
            # keys (re-roll collisions into merge)
            if any(k in state for k in b):
                op = "merge"
        if op == "append":
            append_version(df, path)
            state = {**state, **b}
        elif op == "overwrite":
            overwrite_version(df, path)
            state = dict(b)
        else:
            if model_versions:
                merge_version(df, path, keys=["id"])
                state = {**state, **b}
            else:
                overwrite_version(df, path)
                state = dict(b)
        model_versions.append(dict(state))
        # EVERY historical version still reads exactly its model state
        for v, want in enumerate(model_versions):
            got = {r.id: r.v for r in read_version(spark, path, v).collect()}
            assert got == want, (step, v)


def test_merge_states_random_batching_fuzz(spark):
    """merge_states is associative+commutative: random K-way splits of a
    random fact set, merged in random group orders, always equal the
    direct single-pass state."""
    import random

    from pyspark.sql import functions as F

    from clx_etl_spark.operators.incremental import (merge_states,
                                                     partial_daily_state)

    rng = random.Random(99)
    for trial in range(3):
        rows = [
            (
                rng.randrange(0, 5) * 86_400_000 + rng.randrange(0, 86_400_000),
                rng.choice(["a", "b"]),
                round(rng.uniform(-100, 100), 2),
            )
            for _ in range(200)
        ]
        df = spark.createDataFrame(rows, "ts_ms long, event_type string, value double")
        want = {
            tuple(r) for r in partial_daily_state(df).collect()
        }
        k = rng.randrange(2, 5)
        df = df.withColumn("_g", (F.rand(seed=trial) * k).cast("int"))
        parts = [
            partial_daily_state(df.filter(F.col("_g") == i).drop("_g"))
            for i in range(k)
        ]
        rng.shuffle(parts)
        got = {tuple(r) for r in merge_states(*parts).collect()}
        assert got == want, trial


def test_merge_upsert_commit_files_rejects_partitioned(spark, tmp_path):
    """commit_files promises atomic visibility with the data commit —
    impossible under dynamic partition overwrite, so the combination
    must fail loudly instead of silently weakening the guarantee."""
    import pytest as _pytest

    from clx_etl_spark.sinks.upsert import merge_upsert

    df = spark.createDataFrame([(1, "2024-01-01", 1.0)], "k long, dt string, v double")
    with _pytest.raises(ValueError, match="unpartitioned"):
        merge_upsert(
            spark, df, str(tmp_path / "t"), keys=["k"],
            partition_cols=["dt"], commit_files={"_m.json": "{}"},
        )


def test_merge_upsert_commit_files_initial_write_atomic(spark, tmp_path):
    """First-ever commit with commit_files also routes through the
    staged-rename path: sidecar visible exactly when the table is."""
    import os

    from clx_etl_spark.sinks.upsert import merge_upsert

    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 1.0)], "k long, v double")
    merge_upsert(spark, df, path, keys=["k"], commit_files={"_m.json": '{"x":1}'})
    assert os.path.exists(os.path.join(path, "_m.json"))
    assert spark.read.parquet(path).count() == 1  # sidecar ignored by scan


def test_versioned_compact_version(spark, tmp_path):
    """Small-file compaction: many tiny appended files rewrite into few
    files as a new version; rows identical, prior versions readable
    until expiry reclaims the small files."""
    import os

    from clx_etl_spark.sinks.versioned import (append_version,
                                               compact_version,
                                               expire_versions,
                                               latest_version,
                                               read_changes,
                                               read_version)

    path = str(tmp_path / "vt")
    for i in range(8):
        append_version(
            spark.createDataFrame([(i, f"r{i}")], "id long, v string").coalesce(1),
            path,
        )
    v_before = latest_version(path)
    rows_before = {(r.id, r.v) for r in read_version(spark, path).collect()}

    v_compact = compact_version(spark, path, target_bytes=1 << 30)
    assert v_compact == v_before + 1
    from clx_etl_spark.sinks.versioned import _read_manifest
    m = _read_manifest(path, v_compact)
    assert len(m["files"]) < 8 and m["op"] == "overwrite"
    assert {(r.id, r.v) for r in read_version(spark, path).collect()} == rows_before
    # time travel to a pre-compaction version still works
    assert read_version(spark, path, 3).count() == 4
    # incremental reads across the compaction boundary refuse loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="overwrite"):
        read_changes(spark, path, after_version=2)
    # expiry reclaims the tiny pre-compaction files
    deleted = expire_versions(path, keep_latest=1)
    assert len(deleted) >= 8
    assert {(r.id, r.v) for r in read_version(spark, path).collect()} == rows_before


def test_versioned_tags_and_rollback(spark, tmp_path):
    """Named snapshot tags pin exact file sets; rollback restores an
    earlier snapshot as a NEW head without deleting history."""
    import pytest as _pytest

    from clx_etl_spark.sinks.versioned import (append_version,
                                               latest_version, read_tag,
                                               read_version,
                                               rollback_version,
                                               tag_version)

    path = str(tmp_path / "vt")
    for i in range(3):
        append_version(
            spark.createDataFrame([(i,)], "id long").coalesce(1), path
        )
    assert tag_version(path, "golden", version=1) == 1
    assert {r.id for r in read_tag(spark, path, "golden").collect()} == {0, 1}

    # a bad commit lands; roll back to the tagged version
    append_version(spark.createDataFrame([(99,)], "id long").coalesce(1), path)
    assert {r.id for r in read_version(spark, path).collect()} == {0, 1, 2, 99}
    new_head = rollback_version(path, to_version=1)
    assert new_head == latest_version(path)
    assert {r.id for r in read_version(spark, path).collect()} == {0, 1}
    # forensics: the bad version is still readable
    assert {r.id for r in read_version(spark, path, 3).collect()} == {0, 1, 2, 99}

    with _pytest.raises(FileNotFoundError):
        read_tag(spark, path, "nope")
    with _pytest.raises(ValueError):
        tag_version(path, "_bad")


def test_versioned_txn_survives_compaction_and_rollback(spark, tmp_path):
    """Maintenance commits must carry the exactly-once txn watermark
    forward: after a compaction or a rollback, replaying an
    already-applied streaming batch is still a manifest-level no-op —
    otherwise at-least-once delivery duplicates rows (the Delta
    RESTORE / SetTransaction caveat, resolved conservatively)."""
    from clx_etl_spark.sinks.versioned import (append_version,
                                               compact_version,
                                               read_version,
                                               rollback_version)

    path = str(tmp_path / "vt")
    b0 = spark.createDataFrame([(0, "a"), (1, "a")], "id long, v string")
    b1 = spark.createDataFrame([(2, "b")], "id long, v string")
    append_version(b0.coalesce(1), path, txn=("app", 0))
    append_version(b1.coalesce(1), path, txn=("app", 1))
    assert read_version(spark, path).count() == 3

    compact_version(spark, path, target_bytes=1 << 30)
    # replay batch 1 after compaction: must be a no-op
    v = append_version(b1.coalesce(1), path, txn=("app", 1))
    assert read_version(spark, path).count() == 3
    assert read_version(spark, path, v).count() == 3

    # roll back to the pre-compaction head; replays still no-ops
    rollback_version(path, to_version=1)
    append_version(b1.coalesce(1), path, txn=("app", 1))
    append_version(b0.coalesce(1), path, txn=("app", 0))
    assert read_version(spark, path).count() == 3
    # a genuinely NEW batch still commits
    append_version(b1.coalesce(1), path, txn=("app", 2))
    assert read_version(spark, path).count() == 4


def test_versioned_compact_rederives_manifest_stats(spark, tmp_path):
    """compact_version with stats_cols=None re-derives stats for every
    column the current manifest tracks — compaction must not drop the
    table's file-skipping index."""
    from clx_etl_spark.sinks.versioned import (_read_manifest,
                                               append_version,
                                               compact_version)

    path = str(tmp_path / "vt")
    for i in range(4):
        append_version(
            spark.createDataFrame([(i, i * 10)], "id long, ts long").coalesce(1),
            path, stats_cols=["id", "ts"],
        )
    v = compact_version(spark, path, target_bytes=1 << 30)
    m = _read_manifest(path, v)
    assert m["files"], "compaction committed no files"
    for f in m["files"]:
        assert set(m["stats"][f]) == {
            "id", "ts", "__rows__", "__nulls__:id", "__nulls__:ts"}


def test_versioned_merge_bloom_prunes_interval_gaps(spark, tmp_path):
    """Per-file key blooms: a batch key inside a file's [min,max] GAP
    skips the file (min/max alone would rewrite it); a key actually in
    the file still rewrites it; compaction re-derives blooms."""
    from clx_etl_spark.sinks.versioned import (_BLOOM_KEY, _read_manifest,
                                               append_version,
                                               compact_version,
                                               merge_version, read_version)

    path = str(tmp_path / "vt")
    # two files with gappy key sets: A = {0, 100}, B = {200, 300}
    append_version(
        spark.createDataFrame([(0, "a0"), (100, "a100")],
                              "id long, v string").coalesce(1),
        path, stats_cols=["id"], bloom_cols=["id"],
    )
    append_version(
        spark.createDataFrame([(200, "b200"), (300, "b300")],
                              "id long, v string").coalesce(1),
        path, stats_cols=["id"], bloom_cols=["id"],
    )
    m = _read_manifest(path, 1)
    assert all(_BLOOM_KEY + "id" in m["stats"][f] for f in m["files"])
    before = set(m["files"])

    # key 50 is INSIDE file A's interval [0,100] but NOT in the file:
    # interval pruning alone rewrites A; the bloom proves absence
    v = merge_version(
        spark.createDataFrame([(50, "NEW")], "id long, v string"),
        path, keys=["id"],
    )
    m2 = _read_manifest(path, v)
    assert before <= set(m2["files"])  # BOTH original files untouched
    out = {r.id: r.v for r in read_version(spark, path).collect()}
    assert out == {0: "a0", 100: "a100", 200: "b200",
                   300: "b300", 50: "NEW"}

    # a key actually present still rewrites exactly its file
    v = merge_version(
        spark.createDataFrame([(100, "UPD")], "id long, v string"),
        path, keys=["id"],
    )
    m3 = _read_manifest(path, v)
    out = {r.id: r.v for r in read_version(spark, path).collect()}
    assert out[100] == "UPD" and out[0] == "a0" and len(out) == 5
    # file B survives by reference across both merges
    b_file = [f for f in before if m["stats"][f]["id"] == [200, 300]][0]
    assert b_file in set(m3["files"])
    # rewritten files carry fresh blooms (index maintained by merge)
    new_files = [f for f in m3["files"] if f not in before]
    assert new_files and all(
        _BLOOM_KEY + "id" in m3["stats"].get(f, {}) for f in new_files
    )

    # compaction re-derives both min/max stats and blooms
    vc = compact_version(spark, path, target_bytes=1 << 30)
    mc = _read_manifest(path, vc)
    for f in mc["files"]:
        assert "id" in mc["stats"][f]
        assert _BLOOM_KEY + "id" in mc["stats"][f]


def test_versioned_scan_point_lookup_bloom_prune(spark, tmp_path):
    """Point-lookup scan_version (lo == hi) probes the key bloom: a key
    inside a file's [min,max] gap skips the file; a present key reads
    it; range scans never consult blooms (conservative)."""
    from clx_etl_spark.sinks.versioned import (append_version,
                                               overwrite_version_zordered,
                                               pruned_file_count,
                                               scan_version)

    path = str(tmp_path / "vt")
    append_version(
        spark.createDataFrame([(0, "a0"), (100, "a100")],
                              "id long, v string").coalesce(1),
        path, stats_cols=["id"], bloom_cols=["id"],
    )
    append_version(
        spark.createDataFrame([(200, "b200"), (300, "b300")],
                              "id long, v string").coalesce(1),
        path, stats_cols=["id"], bloom_cols=["id"],
    )
    # key 50 overlaps file A's interval, but the bloom proves absence:
    # the planning step keeps ZERO files (interval alone would keep 1)
    assert pruned_file_count(path, "id", 50, 50) == (0, 2)
    assert pruned_file_count(path, "id", 100, 100) == (1, 2)  # present key
    assert scan_version(spark, path, "id", 50, 50).count() == 0
    # a present key reads exactly its rows
    assert [r.v for r in scan_version(spark, path, "id", 200, 200).collect()] \
        == ["b200"]
    # ranges keep the conservative interval behavior
    assert scan_version(spark, path, "id", 50, 250).count() == 2

    # zordered commits thread blooms through
    ev = spark.createDataFrame(
        [(i * 10, f"z{i}") for i in range(64)], "id long, v string"
    )
    zpath = str(tmp_path / "zt")
    overwrite_version_zordered(ev, zpath, cols=["id"], n_files=4,
                               bloom_cols=["id"])
    assert scan_version(spark, zpath, "id", 315, 315).count() == 0  # gap key
    assert scan_version(spark, zpath, "id", 320, 320).count() == 1


def test_versioned_merge_with_deletes_and_txn(spark, tmp_path):
    """Full MERGE triad: update / insert / DELETE in one commit, file
    pruning driven by the union of update+delete keys, and txn
    idempotence — a replayed (app, version) merge is a manifest no-op,
    so at-least-once CDC delivery cannot regress a key."""
    from clx_etl_spark.sinks.versioned import (_read_manifest,
                                               append_version,
                                               latest_version,
                                               merge_version, read_version)

    path = str(tmp_path / "vt")
    for lo in (0, 100, 200):
        append_version(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(50)], "id long, v string"
            ).coalesce(1),
            path, stats_cols=["id"],
        )
    before = set(_read_manifest(path, 2)["files"])

    ups = spark.createDataFrame(
        [(105, "UPD"), (500, "INS")], "id long, v string"
    )
    dels = spark.createDataFrame([(210,), (211,)], "id long")
    v = merge_version(ups, path, keys=["id"], deletes=dels, txn=("cdc", 0))
    m = _read_manifest(path, v)
    # file 0-49 untouched; 100s (update) and 200s (delete) rewrite
    assert len(set(m["files"]) & before) == 1
    out = {r.id: r.v for r in read_version(spark, path).collect()}
    assert len(out) == 149  # 150 - 2 deleted + 1 inserted
    assert out[105] == "UPD" and out[500] == "INS"
    assert 210 not in out and 211 not in out

    # replay the SAME txn: no new version, state unchanged
    assert merge_version(ups, path, keys=["id"], deletes=dels,
                         txn=("cdc", 0)) == v
    assert latest_version(path) == v
    assert read_version(spark, path).count() == 149

    # a later txn re-inserting a deleted key applies normally
    v2 = merge_version(
        spark.createDataFrame([(210, "BACK")], "id long, v string"),
        path, keys=["id"], txn=("cdc", 1),
    )
    assert v2 == v + 1
    out = {r.id: r.v for r in read_version(spark, path).collect()}
    assert out[210] == "BACK" and len(out) == 150

    # key in BOTH frames: the update wins (changelog folds emit one
    # winner per key, but the contract is pinned anyway)
    v3 = merge_version(
        spark.createDataFrame([(105, "WINS")], "id long, v string"),
        path, keys=["id"],
        deletes=spark.createDataFrame([(105,)], "id long"),
    )
    out = {r.id: r.v for r in read_version(spark, path, v3).collect()}
    assert out[105] == "WINS" and len(out) == 150


def test_versioned_concurrent_commit_conflict(spark, tmp_path):
    """Two writers racing to the same version number: the second
    exclusive-create of the manifest fails loudly (VersionConflictError)
    instead of silently clobbering the first writer's history."""
    import pytest as _pytest

    from clx_etl_spark.sinks.versioned import (VersionConflictError,
                                               _commit, append_version,
                                               latest_version, read_version)

    path = str(tmp_path / "vt")
    append_version(
        spark.createDataFrame([(0,)], "id long").coalesce(1), path
    )
    # writer A commits version 1; writer B computed the same next
    # version from the stale head and loses at the manifest create
    _commit(path, 1, [], "append")
    with _pytest.raises(VersionConflictError, match="version 1"):
        _commit(path, 1, [], "append")
    assert latest_version(path) == 1
    assert read_version(spark, path, 0).count() == 1


def test_versioned_tags_are_retention_leases(spark, tmp_path):
    """expire_versions must never strand a tag: tagged manifests and
    their files survive expiry until the tag is deleted."""
    import os

    from clx_etl_spark.sinks.versioned import (append_version,
                                               expire_versions, read_tag,
                                               read_version, tag_version)

    path = str(tmp_path / "vt")
    for i in range(5):
        append_version(
            spark.createDataFrame([(i,)], "id long").coalesce(1), path
        )
    tag_version(path, "pinned", version=1)
    expire_versions(path, keep_latest=1)
    # tag still readable after an expiry that would have swept v1
    assert {r.id for r in read_tag(spark, path, "pinned").collect()} == {0, 1}
    assert read_version(spark, path).count() == 5
    # releasing the tag lets the next expiry reclaim it
    os.remove(os.path.join(path, "_manifests", "tag-pinned"))
    expire_versions(path, keep_latest=1)
    import pytest as _pytest
    with _pytest.raises(FileNotFoundError):
        read_tag(spark, path, "pinned")


def test_merge_upsert_schema_evolution(spark, tmp_path):
    """evolve_schema=True: a batch adding a column merges (stored rows
    read NULL); a batch missing a stored column carries NULL on insert
    and keeps stored values on match. Default stays a loud error."""
    import pytest as _pytest

    path = str(tmp_path / "dim")
    merge_upsert(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        path, keys=["k"],
    )
    widened = spark.createDataFrame(
        [(2, "b2", 9.5), (3, "c", 1.0)], "k long, v string, score double"
    )
    with _pytest.raises(Exception):
        merge_upsert(spark, widened, path, keys=["k"])
    merge_upsert(spark, widened, path, keys=["k"], evolve_schema=True)
    out = {r.k: (r.v, r.score) for r in spark.read.parquet(path).collect()}
    assert out == {1: ("a", None), 2: ("b2", 9.5), 3: ("c", 1.0)}

    # narrower batch: stored-only column KEEPS its value on match
    # (Delta updateAll-with-evolution semantics), carries NULL on insert
    narrower = spark.createDataFrame(
        [(2, "b3"), (3, "c3"), (4, "d")], "k long, v string"
    )
    merge_upsert(spark, narrower, path, keys=["k"], evolve_schema=True)
    out = {r.k: (r.v, r.score) for r in spark.read.parquet(path).collect()}
    assert out[2] == ("b3", 9.5)  # matched: batch col updates, stored kept
    assert out[3] == ("c3", 1.0)  # matched: stored score kept, not nulled
    assert out[4] == ("d", None)  # inserted: missing column is NULL
    assert out[1] == ("a", None)  # untouched


def test_versioned_delete_prunes_untouched_files(spark, tmp_path):
    """Range delete: non-overlapping files carry through by reference
    (zero IO), only overlapping files rewrite; prior versions intact."""
    from clx_etl_spark.sinks.versioned import (_read_manifest,
                                               append_version,
                                               delete_version,
                                               read_version)

    path = str(tmp_path / "vt")
    for lo in (0, 100, 200):
        append_version(
            spark.createDataFrame(
                [(lo + i,) for i in range(50)], "id long"
            ).coalesce(1),
            path,
            stats_cols=["id"],
        )
    before = {f for f in _read_manifest(path, 2)["files"]}
    v, untouched, rewritten = delete_version(spark, path, "id", 110, 120)
    assert (untouched, rewritten) == (2, 1)
    m = _read_manifest(path, v)
    # the two non-overlapping files are the SAME paths (no rewrite)
    assert len(set(m["files"]) & before) == 2
    ids = {r.id for r in read_version(spark, path).collect()}
    want = (
        set(range(0, 50)) | set(range(100, 150)) | set(range(200, 250))
    ) - set(range(110, 121))
    assert ids == want and len(ids) == 139
    # time travel to before the delete still sees everything
    assert read_version(spark, path, 2).count() == 150
    # carried stats still prune on the new head
    from clx_etl_spark.sinks.versioned import pruned_file_count
    keep, total = pruned_file_count(path, "id", 200, 210)
    assert keep == 1


def test_versioned_merge_prunes_by_key_stats(spark, tmp_path):
    """Keyed MERGE with manifest-stat pruning: files whose key range
    can't contain any batch key carry by reference; only the key
    neighborhood rewrites."""
    from clx_etl_spark.sinks.versioned import (_read_manifest,
                                               append_version,
                                               merge_version, read_version)

    path = str(tmp_path / "vt")
    for lo in (0, 100, 200):
        append_version(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(50)], "id long, v string"
            ).coalesce(1),
            path,
            stats_cols=["id"],
        )
    before = set(_read_manifest(path, 2)["files"])
    batch = spark.createDataFrame(
        [(105, "UPDATED"), (140, "UPDATED"), (130, "UPDATED")],
        "id long, v string",
    )
    v = merge_version(batch, path, keys=["id"])
    m = _read_manifest(path, v)
    # the 0-49 and 200-249 files survive as the same paths
    assert len(set(m["files"]) & before) == 2
    out = {r.id: r.v for r in read_version(spark, path).collect()}
    assert len(out) == 150
    assert out[105] == out[130] == out[140] == "UPDATED"
    assert out[0] == "v0" and out[249] == "v249"
    # prior version still reads pre-merge values
    assert {r.v for r in read_version(spark, path, 2).collect() if r.id == 105} == {"v105"}


def test_versioned_merge_per_file_pruning_sparse_batch(spark, tmp_path):
    """Per-file membership pruning: a 2-key batch spanning BOTH ends of
    the key domain rewrites only the 2 containing files — a global
    [min,max] batch-interval prune would cover every file and rewrite
    the whole table."""
    from clx_etl_spark.sinks.versioned import (_read_manifest,
                                               append_version,
                                               merge_version, read_version)

    path = str(tmp_path / "vt")
    for lo in (0, 100, 200, 300, 400):
        append_version(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(50)], "id long, v string"
            ).coalesce(1),
            path,
            stats_cols=["id"],
        )
    before = set(_read_manifest(path, 4)["files"])
    assert len(before) == 5
    # keys at the extreme ends: global interval [5, 445] overlaps ALL
    # five files; per-file membership overlaps exactly two
    batch = spark.createDataFrame(
        [(5, "UPDATED"), (445, "UPDATED"), (500, "INSERTED")],
        "id long, v string",
    )
    v = merge_version(batch, path, keys=["id"])
    m = _read_manifest(path, v)
    # the three interior files (100s, 200s, 300s) survive by reference
    assert len(set(m["files"]) & before) == 3
    out = {r.id: r.v for r in read_version(spark, path).collect()}
    assert len(out) == 251
    assert out[5] == out[445] == "UPDATED" and out[500] == "INSERTED"
    assert out[100] == "v100" and out[300] == "v300"


def test_versioned_change_feed_merge_delete_compact(spark, tmp_path):
    """table_changes reconstructs the full row-level history: appends
    read straight from added files, merge/delete/compact from the
    change sets their change_feed=True rewrite persisted (Delta CDF)."""
    from clx_etl_spark.sinks.versioned import (append_version,
                                               compact_version,
                                               delete_version, merge_version,
                                               read_version, table_changes)

    path = str(tmp_path / "vt")
    df = spark.range(0, 10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    append_version(df.filter("k < 5").coalesce(1), path, stats_cols=["k"])
    append_version(df.filter("k >= 5").coalesce(1), path, stats_cols=["k"])
    upd = spark.createDataFrame([(3, 999), (100, 1)], "k long, v long")
    dels = spark.createDataFrame([(7,), (3,)], "k long")
    # key 3 in BOTH updates and deletes: survives as its update row
    merge_version(upd, path, keys=["k"], deletes=dels, change_feed=True)
    delete_version(spark, path, "k", 8, 9, change_feed=True)
    compact_version(spark, path, change_feed=True)
    ch = table_changes(spark, path, -1)
    got = {(r.k, r.v, r._change_type, r._commit_version) for r in ch.collect()}
    assert {(k, k * 10, "insert", 0) for k in range(5)} <= got
    assert {(k, k * 10, "insert", 1) for k in range(5, 10)} <= got
    assert (3, 30, "update_preimage", 2) in got
    assert (3, 999, "update_postimage", 2) in got
    assert (100, 1, "insert", 2) in got
    assert (7, 70, "delete", 2) in got
    assert (8, 80, "delete", 3) in got and (9, 90, "delete", 3) in got
    assert len(got) == 16  # compaction contributes nothing
    # replaying the feed over the v1 snapshot reproduces the head
    assert {(r.k, r.v) for r in read_version(spark, path).collect()} == {
        (0, 0), (1, 10), (2, 20), (3, 999), (4, 40), (5, 50), (6, 60),
        (100, 1),
    }
    # a window crossing only appends needs no change files at all
    inc = {(r.k, r._change_type) for r in
           table_changes(spark, path, 0, 1).collect()}
    assert inc == {(k, "insert") for k in range(5, 10)}


def test_versioned_change_feed_exact_under_pruning(spark, tmp_path):
    """Matched-vs-insert classification stays exact when file pruning
    leaves most files untouched: any stored row sharing a batch key is
    provably inside the rewritten slice."""
    from clx_etl_spark.sinks.versioned import (append_version,
                                               latest_version, merge_version,
                                               table_changes)

    path = str(tmp_path / "vt")
    for i in range(4):
        sl = spark.range(i * 100, (i + 1) * 100).select(
            F.col("id").alias("k"), F.lit(f"f{i}").alias("v")
        )
        append_version(sl.coalesce(1), path, stats_cols=["k"])
    before = set(
        __import__("json").load(
            open(str(tmp_path / "vt" / "_manifests" / f"v{latest_version(path)}.json"))
        )["files"]
    )
    batch = spark.createDataFrame(
        [(5, "UPD"), (1000, "INS")], "k long, v string"
    )
    merge_version(batch, path, keys=["k"], change_feed=True)
    import json as _json

    m = _json.load(open(str(tmp_path / "vt" / "_manifests" / "v4.json")))
    # pruning really happened: 3 of 4 files carried by reference
    assert len(set(m["files"]) & before) == 3
    got = {(r.k, r.v, r._change_type) for r in
           table_changes(spark, path, 3).collect()}
    assert got == {
        (5, "f0", "update_preimage"),
        (5, "UPD", "update_postimage"),
        (1000, "INS", "insert"),
    }


def test_versioned_change_feed_guard_and_expiry(spark, tmp_path):
    """A rewrite WITHOUT change_feed breaks the feed loudly; expiring a
    version reclaims its change directory."""
    import os

    import pytest

    from clx_etl_spark.sinks.versioned import (append_version,
                                               expire_versions, merge_version,
                                               table_changes)

    path = str(tmp_path / "vt")
    append_version(
        spark.createDataFrame([(1, "a")], "k long, v string"), path,
        stats_cols=["k"],
    )
    merge_version(
        spark.createDataFrame([(1, "b")], "k long, v string"), path,
        keys=["k"],
    )  # no change_feed: row-level delta unrecorded
    with pytest.raises(ValueError, match="change set"):
        table_changes(spark, path, -1)
    merge_version(
        spark.createDataFrame([(2, "c")], "k long, v string"), path,
        keys=["k"], change_feed=True,
    )
    # a window that starts after the gap is fine
    assert {(r.k, r._change_type) for r in
            table_changes(spark, path, 1).collect()} == {(2, "insert")}
    # the feed dir is uuid-owned and named by the manifest (r09)
    from clx_etl_spark.sinks.versioned import (_change_dir_for,
                                               _read_manifest,
                                               latest_version)

    v2 = latest_version(path)
    cdir = _change_dir_for(path, _read_manifest(path, v2), v2)
    assert cdir is not None and os.path.isdir(cdir)
    expire_versions(path, keep_latest=1)
    assert os.path.isdir(cdir)  # v2 is the surviving head: feed kept
    append_version(
        spark.createDataFrame([(3, "d")], "k long, v string"), path,
        stats_cols=["k"],
    )
    expire_versions(path, keep_latest=1)
    assert not os.path.exists(cdir)  # v2 expired: its change set too


def test_versioned_check_constraints_gate_writes(spark, tmp_path):
    """Declared CHECK constraints refuse violating batches on append,
    merge, and overwrite — with per-constraint violating-row counts —
    while NULLs pass (SQL CHECK semantics) and compaction never
    revalidates."""
    import pytest

    from clx_etl_spark.sinks.versioned import (ConstraintViolation,
                                               append_version,
                                               compact_version,
                                               get_constraints, merge_version,
                                               overwrite_version,
                                               read_version, set_constraints)

    path = str(tmp_path / "vt")
    set_constraints(path, {
        "price_positive": "price > 0",
        "status_known": "status IN ('ok', 'late')",
    })
    assert get_constraints(path)["price_positive"] == "price > 0"
    good = spark.createDataFrame(
        [(1, 5.0, "ok"), (2, 1.0, None)],  # NULL status passes (SQL CHECK)
        "id long, price double, status string",
    )
    append_version(good.coalesce(1), path, stats_cols=["id"])
    bad = spark.createDataFrame(
        [(3, -1.0, "ok"), (4, 2.0, "bogus"), (5, -2.0, "bogus")],
        "id long, price double, status string",
    )
    with pytest.raises(ConstraintViolation) as ei:
        append_version(bad, path)
    assert ei.value.counts == {"price_positive": 2, "status_known": 2}
    with pytest.raises(ConstraintViolation):
        merge_version(bad, path, keys=["id"])
    with pytest.raises(ConstraintViolation):
        overwrite_version(bad, path)
    # nothing committed by the refused writes
    assert {r.id for r in read_version(spark, path).collect()} == {1, 2}
    # compaction skips revalidation (rows already in the table) even if
    # constraints were tightened after ingest
    set_constraints(path, {"impossible": "1 = 0"})
    compact_version(spark, path)
    assert {r.id for r in read_version(spark, path).collect()} == {1, 2}
    # dropping constraints re-opens the gate
    set_constraints(path, {})
    append_version(bad.coalesce(1), path)
    assert {r.id for r in read_version(spark, path).collect()} == {1, 2, 3, 4, 5}


def test_versioned_change_feed_replay_reconstructs_snapshots(spark, tmp_path):
    """Model-based property: for EVERY consecutive version pair, folding
    the commit's change set onto snapshot(v) reproduces snapshot(v+1)
    exactly — state' = state minus (update_preimage ∪ delete keys) plus
    (update_postimage ∪ insert rows). Runs a deterministic pseudo-random
    schedule of appends / MERGE triads / range deletes / compactions."""
    import random

    from clx_etl_spark.sinks.versioned import (append_version,
                                               compact_version,
                                               delete_version, latest_version,
                                               merge_version, read_version,
                                               table_changes)

    rng = random.Random(60614)
    path = str(tmp_path / "vt")

    def mk(rows):
        return spark.createDataFrame(rows, "k long, v double")

    append_version(
        mk([(k, float(k)) for k in range(0, 40, 2)]).coalesce(1), path,
        stats_cols=["k"],
    )
    for step in range(8):
        op = rng.choice(["append", "merge", "delete", "compact"])
        if op == "append":
            base = rng.randrange(100, 1000)
            append_version(
                mk([(base + i, float(i)) for i in range(5)]).coalesce(1),
                path, stats_cols=["k"],
            )
        elif op == "merge":
            ups = mk([(rng.randrange(0, 60), rng.random() * 100)
                      for _ in range(6)])
            dels = spark.createDataFrame(
                [(rng.randrange(0, 60),) for _ in range(3)], "k long"
            )
            merge_version(ups, path, keys=["k"], deletes=dels,
                          change_feed=True)
        elif op == "delete":
            lo = rng.randrange(0, 50)
            delete_version(spark, path, "k", lo, lo + 10, change_feed=True)
        else:
            compact_version(spark, path, change_feed=True)

    head = latest_version(path)
    for v in range(0, head):
        prev = {r.k: r.v for r in read_version(spark, path, v).collect()}
        nxt = {r.k: r.v for r in read_version(spark, path, v + 1).collect()}
        ch = table_changes(spark, path, v, v + 1).collect()
        state = dict(prev)
        for r in ch:
            if r._change_type in ("update_preimage", "delete"):
                state.pop(r.k, None)
        for r in ch:
            if r._change_type in ("update_postimage", "insert"):
                state[r.k] = r.v
        assert state == nxt, f"replay mismatch at v{v}->v{v+1}"
    # and the cumulative fold from the beginning reconstructs the head
    # (two passes per version: pre/post images share keys)
    state = {}
    by_v = {}
    for r in table_changes(spark, path, -1).collect():
        by_v.setdefault(r._commit_version, []).append(r)
    for v in sorted(by_v):
        for r in by_v[v]:
            if r._change_type in ("update_preimage", "delete"):
                state.pop(r.k, None)
        for r in by_v[v]:
            if r._change_type in ("update_postimage", "insert"):
                state[r.k] = r.v
    assert state == {r.k: r.v for r in read_version(spark, path).collect()}


def test_versioned_append_optimistic_rebase_two_writers(spark, tmp_path):
    """Optimistic concurrency for appends: two threads appending to the
    same table race the manifest CAS; losers REBASE onto the winner's
    head and retry with their already-written files — every batch lands
    exactly once, no VersionConflictError escapes."""
    import threading

    from clx_etl_spark.sinks.versioned import (append_version,
                                               latest_version, read_version)

    path = str(tmp_path / "vt")
    errs: list[Exception] = []

    def writer(base: int) -> None:
        try:
            for i in range(4):
                append_version(
                    spark.createDataFrame(
                        [(base + i, float(base + i))], "k long, v double"
                    ).coalesce(1),
                    path, stats_cols=["k"],
                )
        except Exception as exc:  # surface in the main thread
            errs.append(exc)

    threads = [threading.Thread(target=writer, args=(b,))
               for b in (100, 200)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errs == []
    assert latest_version(path) == 7  # 8 commits, zero lost
    got = {r.k for r in read_version(spark, path).collect()}
    assert got == {100, 101, 102, 103, 200, 201, 202, 203}


def test_versioned_latest_version_probes_past_stale_hint(spark, tmp_path):
    """_latest is a hint: when a losing writer overwrites it with an
    older version, latest_version probes forward to the true committed
    head (the manifest exclusive-create is the commit point)."""
    import os

    from clx_etl_spark.sinks.versioned import (_commit, append_version,
                                               latest_version)

    path = str(tmp_path / "vt")
    append_version(
        spark.createDataFrame([(0,)], "id long").coalesce(1), path
    )
    _commit(path, 1, [], "append")
    # simulate the loser's late hint write
    with open(os.path.join(path, "_manifests", "_latest"), "w") as fh:
        fh.write("0")
    assert latest_version(path) == 1
    # a half-written claimed slot does NOT advance the probe
    with open(os.path.join(path, "_manifests", "v2.json"), "w") as fh:
        fh.write('{"version": 2, "fi')  # torn write
    assert latest_version(path) == 1


def test_versioned_history_and_describe(spark, tmp_path):
    """history() reports per-commit op + file deltas + CDF presence;
    describe_table() summarizes head state, stats/bloom coverage,
    constraints, tags, txn watermarks."""
    from clx_etl_spark.sinks.versioned import (append_version,
                                               describe_table, history,
                                               merge_version, set_constraints,
                                               tag_version)

    path = str(tmp_path / "vt")
    set_constraints(path, {"v_pos": "v >= 0"})
    append_version(
        spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
        .coalesce(1), path, stats_cols=["k"], bloom_cols=["k"],
        txn=("app", 0),
    )
    merge_version(
        spark.createDataFrame([(1, 9.0), (3, 3.0)], "k long, v double"),
        path, keys=["k"], change_feed=True,
    )
    tag_version(path, "golden", 0)
    h = {r.version: r for r in history(spark, path).collect()}
    assert h[0].op == "append" and h[0].files_added == 1
    assert h[0].has_change_feed is False and "app" in h[0].txn
    assert h[1].op == "overwrite" and h[1].has_change_feed is True
    assert h[1].files_removed >= 1
    d = describe_table(path)
    assert d["version"] == 1 and d["op"] == "overwrite"
    assert d["constraints"] == {"v_pos": "v >= 0"}
    assert d["tags"] == {"golden": 0}
    assert d["txn"] == {"app": 0}
    assert d["stats_coverage"].get("k") == 1.0
    assert d["bloom_coverage"].get("k") == 1.0  # merge rebuilt the bloom
    assert d["change_feed_versions"] == [1]
    assert d["bytes_total"] > 0 and d["n_files"] >= 1


def test_expire_versions_dry_run(spark, tmp_path):
    """dry_run lists exactly what a real expiry would delete and
    touches nothing."""
    import os

    from clx_etl_spark.sinks.versioned import (append_version,
                                               expire_versions,
                                               overwrite_version,
                                               read_version)

    path = str(tmp_path / "vt")
    append_version(spark.createDataFrame([(1,)], "id long").coalesce(1), path)
    overwrite_version(spark.createDataFrame([(2,)], "id long").coalesce(1),
                      path)
    would = expire_versions(path, keep_latest=1, dry_run=True)
    assert len(would) >= 1 and all(os.path.exists(f) for f in would)
    assert read_version(spark, path, 0).count() == 1  # v0 still readable
    did = expire_versions(path, keep_latest=1)
    assert sorted(did) == sorted(would)
    assert all(not os.path.exists(f) for f in did)


def test_timestamp_time_travel(spark, tmp_path):
    """TIMESTAMP AS OF resolves by manifest mtime: newest commit at or
    before the asked time; before-first-commit raises; expired
    manifests are skipped."""
    import os

    import pytest

    from clx_etl_spark.sinks.versioned import (
        _manifest_path, append_version, expire_versions, overwrite_version,
        read_version_as_of, version_as_of_timestamp)

    path = str(tmp_path / "vt")
    append_version(spark.createDataFrame([(1,)], "id long").coalesce(1), path)
    append_version(spark.createDataFrame([(2,)], "id long").coalesce(1), path)
    overwrite_version(spark.createDataFrame([(9,)], "id long").coalesce(1),
                      path)
    # pin deterministic commit times: v0@1000ms v1@2000ms v2@3000ms
    for v, t in [(0, 1.0), (1, 2.0), (2, 3.0)]:
        os.utime(_manifest_path(path, v), (t, t))
    assert version_as_of_timestamp(path, 1000) == 0
    assert version_as_of_timestamp(path, 2500) == 1
    assert version_as_of_timestamp(path, 99999) == 2
    assert sorted(
        r.id for r in read_version_as_of(spark, path, 2500).collect()
    ) == [1, 2]
    with pytest.raises(ValueError):
        version_as_of_timestamp(path, 999)  # predates first commit
    # expire v0/v1: as-of 2500 now resolves to nothing surviving <= it
    expire_versions(path, keep_latest=1)
    with pytest.raises(ValueError):
        version_as_of_timestamp(path, 2500)


def test_expire_time_based_retention(spark, tmp_path):
    """keep_since_ms retains every version committed in the window even
    when keep_latest would drop it."""
    import os

    from clx_etl_spark.sinks.versioned import (
        _manifest_path, append_version, expire_versions, read_version)

    path = str(tmp_path / "vt")
    for i in range(4):
        append_version(
            spark.createDataFrame([(i,)], "id long").coalesce(1), path)
    for v, t in [(0, 1.0), (1, 2.0), (2, 3.0), (3, 4.0)]:
        os.utime(_manifest_path(path, v), (t, t))
    # keep_latest=1 alone would drop v0-v2; the window keeps v2 (3000ms)
    expire_versions(path, keep_latest=1, keep_since_ms=3000)
    assert read_version(spark, path, 2).count() == 3
    assert read_version(spark, path, 3).count() == 4
    import pytest

    with pytest.raises(FileNotFoundError):
        read_version(spark, path, 1)


def test_clone_shallow_isolation(spark, tmp_path):
    """Shallow clone is metadata-only, reads identically, carries
    stats/blooms/constraints, and diverges independently of the
    source."""
    import pytest

    from clx_etl_spark.sinks.versioned import (
        ConstraintViolation, _read_manifest, append_version, clone_table,
        merge_version, read_version, set_constraints)

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "k long, v long")
    append_version(df.coalesce(1), src, stats_cols=["k"], bloom_cols=["k"])
    set_constraints(src, {"v_pos": "v >= 0"})
    v = clone_table(src, dst)
    assert v == 0
    m = _read_manifest(dst, 0)
    assert m["op"] == "clone"
    # metadata-only: the clone references the source's files in place
    assert m["files"] == _read_manifest(src, 0)["files"]
    assert m["stats"]  # stats carried -> file skipping works on the clone
    assert sorted((r.k, r.v) for r in read_version(spark, dst).collect()) == \
        [(1, 10), (2, 20), (3, 30)]
    # constraints carried
    with pytest.raises(ConstraintViolation):
        append_version(
            spark.createDataFrame([(4, -1)], "k long, v long").coalesce(1),
            dst)
    # divergence: merge into the clone; source snapshot unchanged
    merge_version(
        spark.createDataFrame([(2, 99)], "k long, v long").coalesce(1),
        dst, keys=["k"])
    assert sorted((r.k, r.v) for r in read_version(spark, dst).collect()) == \
        [(1, 10), (2, 99), (3, 30)]
    assert sorted((r.k, r.v) for r in read_version(spark, src).collect()) == \
        [(1, 10), (2, 20), (3, 30)]


def test_clone_deep_survives_source_expiry(spark, tmp_path):
    """Deep clone physically copies files (stats remapped onto the
    copies); expiring + rewriting the source cannot break it, while a
    shallow clone of the same snapshot goes dark."""
    import pytest

    from clx_etl_spark.sinks.versioned import (
        _read_manifest, append_version, clone_table, expire_versions,
        overwrite_version, read_version)

    src = str(tmp_path / "src")
    deep = str(tmp_path / "deep")
    shallow = str(tmp_path / "shallow")
    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    append_version(df.coalesce(1), src, stats_cols=["k"])
    clone_table(src, deep, deep=True)
    clone_table(src, shallow)
    m = _read_manifest(deep, 0)
    assert all(f.startswith(deep) for f in m["files"])  # physical copies
    assert m["stats"] and all(k in m["files"] for k in m["stats"])
    # rewrite the source and reclaim its old files
    overwrite_version(
        spark.createDataFrame([(9, 9)], "k long, v long").coalesce(1), src)
    expire_versions(src, keep_latest=1)
    assert sorted(r.k for r in read_version(spark, deep).collect()) == [1, 2]
    with pytest.raises(Exception):
        read_version(spark, shallow).collect()  # documented caveat
    # a second clone into an existing table refuses
    with pytest.raises(FileExistsError):
        clone_table(src, deep)


def test_compact_zorder_reclusters(spark, tmp_path):
    """compact_version(zorder_by=) is OPTIMIZE ZORDER BY: the rewrite
    re-clusters a time-ordered ingest layout so manifest pruning on the
    OTHER dimension becomes selective; rows unchanged, txn carried."""
    from clx_etl_spark.sinks.versioned import (
        _read_manifest, append_version, compact_version, latest_version,
        pruned_file_count, read_version)

    path = str(tmp_path / "vt")
    # streaming-shaped ingest: 8 time-ordered appends, each spanning the
    # WHOLE key domain -> key pruning is useless before maintenance
    for t in range(8):
        batch = spark.range(1000).selectExpr(
            "id * 8 + {} as k".format(t), "id % 7 as v")
        append_version(batch.coalesce(1), path, stats_cols=["k"],
                       txn=("ingest", t))
    before_open, total_before = pruned_file_count(path, "k", 100, 120)
    assert before_open == total_before == 8  # every file overlaps
    v = compact_version(spark, path, target_bytes=8 << 10,
                        zorder_by=["k", "v"])
    after_open, total_after = pruned_file_count(path, "k", 100, 120)
    assert total_after > 1  # the rewrite actually produced several files
    assert after_open < total_after  # ...with selective k bounding boxes
    # rows survive bit-identically
    assert read_version(spark, path, v).count() == 8000
    assert read_version(spark, path, v).agg({"k": "sum"}).first()[0] == \
        sum(range(8000))
    m = _read_manifest(path, latest_version(path))
    assert m["txn"] == {"ingest": 7}  # exactly-once watermark survives
    # zorder cols joined the tracked stats
    assert any("v" in fstats for fstats in m["stats"].values())


def test_files_table_inventory(spark, tmp_path):
    """files_table is the .files metadata view: one row per file with
    footer row counts, sizes, stats JSON, and bloom presence."""
    import json as _json

    from clx_etl_spark.sinks.versioned import append_version, files_table

    path = str(tmp_path / "vt")
    append_version(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string")
        .coalesce(1), path, stats_cols=["k"], bloom_cols=["k"])
    append_version(
        spark.createDataFrame([(3, "c")], "k long, s string").coalesce(1),
        path, stats_cols=["k"], bloom_cols=["k"])
    inv = files_table(spark, path).collect()
    assert len(inv) == 2
    assert sum(r.rows for r in inv) == 3
    assert all(r.bytes > 0 for r in inv)
    assert all(r.bloom_cols == ["k"] for r in inv)
    boxes = sorted(tuple(_json.loads(r.stats)["k"]) for r in inv)
    assert boxes == [[1, 2], [3, 3]] or boxes == [(1, 2), (3, 3)]
    # old snapshot's inventory is still addressable
    assert len(files_table(spark, path, version=0).collect()) == 1


def _seed_merge_race_table(spark, path):
    from clx_etl_spark.sinks.versioned import append_version

    for lo in (0, 5):
        append_version(
            spark.createDataFrame([(k, 0) for k in range(lo, lo + 5)],
                                  "k long, v long").coalesce(1),
            path, stats_cols=["k"])


def test_merge_rebases_over_disjoint_append(spark, tmp_path, monkeypatch):
    """A MERGE losing the commit race to a key-disjoint append REBASES
    (Delta WriteSerializable): the appended rows ride into the retried
    commit, nothing is lost, no data is rewritten twice."""
    import clx_etl_spark.sinks.versioned as V

    path = str(tmp_path / "vt")
    _seed_merge_race_table(spark, path)
    appended = spark.createDataFrame([(100, 9), (101, 9)], "k long, v long")
    orig = V._commit
    fired = {}

    def racing(path_, version, files, op, stats=None, txn=None, **kw):
        if op == "overwrite" and not fired:
            fired["x"] = True  # concurrent writer lands first
            V.append_version(appended.coalesce(1), path_, stats_cols=["k"],
                             txn=("other", 1))
        return orig(path_, version, files, op, stats, txn, **kw)

    monkeypatch.setattr(V, "_commit", racing)
    batch = spark.createDataFrame([(0, 7), (1, 7)], "k long, v long")
    v = V.merge_version(batch, path, keys=["k"], txn=("mine", 3))
    assert v == V.latest_version(path)
    rows = {r.k: r.v for r in V.read_version(spark, path).collect()}
    assert rows[0] == 7 and rows[1] == 7          # merge applied
    assert rows[100] == 9 and rows[101] == 9      # append survived
    assert len(rows) == 12
    m = V._read_manifest(path, v)
    assert m["txn"] == {"other": 1, "mine": 3}    # both watermarks carried
    # appended file carried by reference with its stats (no rewrite)
    app_files = set(V._read_manifest(path, v - 1)["files"]) - \
        set(V._read_manifest(path, v - 2)["files"])
    assert app_files <= set(m["files"])
    assert all(m["stats"].get(f, {}).get("k") for f in app_files)


def test_merge_conflict_on_overlapping_append(spark, tmp_path, monkeypatch):
    """An interleaved append that MAY contain a batch key is a true
    conflict: the merge must surface VersionConflictError, never
    silently duplicate or drop the racing rows."""
    import pytest

    import clx_etl_spark.sinks.versioned as V

    path = str(tmp_path / "vt")
    _seed_merge_race_table(spark, path)
    orig = V._commit
    fired = {}

    def racing(path_, version, files, op, stats=None, txn=None, **kw):
        if op == "overwrite" and not fired:
            fired["x"] = True
            V.append_version(
                spark.createDataFrame([(1, 9)], "k long, v long")
                .coalesce(1), path_, stats_cols=["k"])
        return orig(path_, version, files, op, stats, txn, **kw)

    monkeypatch.setattr(V, "_commit", racing)
    batch = spark.createDataFrame([(1, 7)], "k long, v long")
    with pytest.raises(V.VersionConflictError):
        V.merge_version(batch, path, keys=["k"])


def test_merge_rebase_carries_change_feed(spark, tmp_path, monkeypatch):
    """When a change_feed merge rebases, its change set follows to the
    final committed version and the feed replays cleanly."""
    import clx_etl_spark.sinks.versioned as V

    path = str(tmp_path / "vt")
    _seed_merge_race_table(spark, path)
    orig = V._commit
    fired = {}

    def racing(path_, version, files, op, stats=None, txn=None, **kw):
        if op == "overwrite" and not fired:
            fired["x"] = True
            V.append_version(
                spark.createDataFrame([(200, 9)], "k long, v long")
                .coalesce(1), path_, stats_cols=["k"])
        return orig(path_, version, files, op, stats, txn, **kw)

    monkeypatch.setattr(V, "_commit", racing)
    batch = spark.createDataFrame([(0, 7), (300, 1)], "k long, v long")
    v = V.merge_version(batch, path, keys=["k"], change_feed=True)
    ch = V.table_changes(spark, path, v - 1, v).collect()
    got = {(r.k, r._change_type) for r in ch}
    assert (0, "update_postimage") in got and (300, "insert") in got
    assert all(r._commit_version == v for r in ch)


def test_derive_stats_distributed_parity_and_engine_path(
    spark, tmp_path, monkeypatch
):
    """Executor-side stats derivation (r08): forcing the distributed
    path must produce BYTE-IDENTICAL stats/bloom bitmaps to the driver
    _file_stats (same per-file code runs in tasks), and the engine
    write path keeps committing correct manifests under it."""
    import clx_etl_spark.sinks.versioned as V

    from clx_etl_spark.sinks.versioned import (_read_manifest,
                                               append_version,
                                               pruned_file_count,
                                               read_version)

    path = str(tmp_path / "vt")
    monkeypatch.setattr(V, "_STATS_DISTRIBUTE_MIN_BYTES", 0)
    monkeypatch.setattr(V, "_STATS_DISTRIBUTE_MIN_FILES", 0)
    df = spark.createDataFrame(
        [(i, f"k{i}", float(i)) for i in range(500)],
        "id long, k string, x double",
    ).repartition(4)
    append_version(df, path, stats_cols=["id"], bloom_cols=["id", "k"])
    m = _read_manifest(path, 0)
    drv = V._file_stats(m["files"], ["id"], ["id", "k"])
    assert drv == {f: dict(per) for f, per in m["stats"].items()}
    # blooms actually prune through the distributed-derived manifest
    kept, total = pruned_file_count(path, "id", 0, 0)
    assert kept == 1 and total == 4
    assert read_version(spark, path).count() == 500


def test_count_rows_meta_and_min_max_meta(spark, tmp_path):
    """Metadata-only aggregates (r08): COUNT(*) from the manifest's
    __rows__ keys minus dv tombstones; MIN/MAX from per-file bounds —
    None whenever metadata cannot answer EXACTLY (dv present, missing
    bounds, string bounds)."""
    from clx_etl_spark.sinks.versioned import (append_version,
                                               count_rows_meta,
                                               delete_version_dv,
                                               min_max_meta)

    path = str(tmp_path / "vt")
    for lo in (0, 100):
        append_version(
            spark.createDataFrame(
                [(lo + i, f"s{lo + i}") for i in range(50)],
                "id long, name string",
            ).coalesce(1),
            path, stats_cols=["id", "name"],
        )
    assert count_rows_meta(path) == 100
    assert min_max_meta(path, "id") == (0, 149)
    assert min_max_meta(path, "missing") is None
    assert min_max_meta(path, "name") is None  # strings: maybe truncated
    delete_version_dv(spark, path, "id", 10, 19)
    assert count_rows_meta(path) == 90
    assert count_rows_meta(path, version=1) == 100  # time travel
    assert min_max_meta(path, "id") is None  # dv: extremes may be dead
    assert min_max_meta(path, "id", version=1) == (0, 149)


def test_analyze_table_backfills_skipping_index(spark, tmp_path):
    """analyze_table (r08): a table committed WITHOUT tracking gains
    per-file min/max + blooms via a metadata-only commit — same file
    list, pruning works afterward, idempotent re-run, dv map carried."""
    from clx_etl_spark.sinks.versioned import (_BLOOM_KEY, _read_manifest,
                                               analyze_table,
                                               append_version,
                                               delete_version_dv,
                                               pruned_file_count,
                                               read_version)

    path = str(tmp_path / "vt")
    for lo in (0, 100, 200):
        append_version(
            spark.createDataFrame(
                [(lo + i, f"s{lo + i}") for i in range(50)],
                "id long, name string",
            ).coalesce(1),
            path)  # no stats tracking at all
    delete_version_dv(spark, path, "id", 0, 4)
    m0 = _read_manifest(path, 3)
    v = analyze_table(spark, path, ["id"], bloom_cols=["id"])
    m = _read_manifest(path, v)
    assert m["files"] == m0["files"]  # metadata-only: zero file churn
    assert m["op"] == "analyze"
    assert all("id" in m["stats"][f] and _BLOOM_KEY + "id" in m["stats"][f]
               for f in m["files"])
    kept, total = pruned_file_count(path, "id", 120, 130)
    assert (kept, total) == (1, 3)
    assert read_version(spark, path).count() == 145  # dv carried
    assert analyze_table(spark, path, ["id"], bloom_cols=["id"]) == v + 1
    # analyze is metadata-only: CDC consumers cross it as a no-change
    # commit and incremental readers stay exact (code-review r08 fix)
    from clx_etl_spark.sinks.versioned import read_changes, table_changes

    assert read_changes(spark, path, after_version=v).count() == 0
    ch = table_changes(spark, path, after_version=v)
    assert ch.count() == 0
    # an append racing an interleaved analyze still rebases (analyze
    # never removes/rewrites files)
    from clx_etl_spark.sinks.versioned import _append_only_interleave

    ai = _append_only_interleave(path, v, v + 1)
    assert ai is not None and ai[0] == []


def test_compaction_rebases_over_append_raises_on_rewrite(
    spark, tmp_path, monkeypatch
):
    """OPTIMIZE-vs-append concurrency (r08, Delta's rule): a compaction
    that loses the manifest CAS to an interleaved APPEND rebases —
    appended files carry by reference with their stats and the winner's
    txn watermarks, nothing appended is lost (this also pins the old
    overwrite_version delegation's silent-loss race closed). A
    rewriting interleave stays a true conflict."""
    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sinks.versioned import (VersionConflictError,
                                               _read_manifest,
                                               append_version,
                                               compact_version,
                                               delete_version,
                                               latest_version,
                                               read_version)

    path = str(tmp_path / "vt")
    for lo in (0, 100, 200):
        append_version(
            spark.createDataFrame(
                [(lo + i, f"s{lo + i}") for i in range(30)],
                "id long, v string",
            ).coalesce(1),
            path, stats_cols=["id"],
            txn=("ingest", lo))
    orig = V._commit
    state = {"raced": False}

    def racing(path_, version, files_, op, *a, **kw):
        if op == "overwrite" and not state["raced"]:
            state["raced"] = True
            append_version(
                spark.createDataFrame([(999, "z")], "id long, v string"),
                path, stats_cols=["id"], txn=("ingest", 999))
        return orig(path_, version, files_, op, *a, **kw)

    monkeypatch.setattr(V, "_commit", racing)
    orig_wf = V._write_files
    wf_calls = {"n": 0}

    def counting_wf(*a, **kw):
        wf_calls["n"] += 1
        return orig_wf(*a, **kw)

    monkeypatch.setattr(V, "_write_files", counting_wf)
    v = compact_version(spark, path, target_bytes=1 << 30)
    monkeypatch.setattr(V, "_commit", orig)
    monkeypatch.setattr(V, "_write_files", orig_wf)
    # the rebase retry is manifest-JSON-only: the compacted data files
    # were staged once and never re-rewritten (VERDICT r10 item 2)
    assert wf_calls["n"] == 2  # compaction's rewrite + the racing append
    m = _read_manifest(path, v)
    assert m["op"] == "overwrite"
    got = {r.id for r in read_version(spark, path).collect()}
    assert got == ({*range(0, 30)} | {*range(100, 130)}
                   | {*range(200, 230)} | {999})  # nothing lost
    # the appended file rides by reference with its stats + txn
    assert any("id" in per and per["id"] == [999, 999]
               for per in dict(m["stats"]).values())
    assert m["txn"] == {"ingest": 999}
    # rewriting interleave -> true conflict
    state["raced"] = False

    def racing_delete(path_, version, files_, op, *a, **kw):
        if op == "overwrite" and not state["raced"]:
            state["raced"] = True
            delete_version(spark, path, "id", 999, 999)
        return orig(path_, version, files_, op, *a, **kw)

    monkeypatch.setattr(V, "_commit", racing_delete)
    import pytest

    with pytest.raises(VersionConflictError):
        compact_version(spark, path, target_bytes=1 << 30)
    monkeypatch.setattr(V, "_commit", orig)
    assert read_version(spark, path).count() == 90  # delete won cleanly
    assert latest_version(path) is not None


def test_cow_delete_rebases_over_disjoint_append(spark, tmp_path,
                                                 monkeypatch):
    """CoW delete_version now rebases over provably key-disjoint
    appends (r08 — same WriteSerializable rule as its dv twin): the
    appended file rides by reference, nothing is lost; an append whose
    stats OVERLAP the delete range stays a true conflict."""
    import pytest

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sinks.versioned import (VersionConflictError,
                                               append_version,
                                               delete_version,
                                               read_version)

    path = str(tmp_path / "vt")
    for lo in (0, 100):
        append_version(
            spark.createDataFrame(
                [(lo + i, f"s{lo + i}") for i in range(30)],
                "id long, v string",
            ).coalesce(1),
            path, stats_cols=["id"])
    orig = V._commit
    state = {"raced": False}

    def race_disjoint(path_, version, files_, op, *a, **kw):
        if op == "overwrite" and not state["raced"]:
            state["raced"] = True
            append_version(
                spark.createDataFrame([(500, "z")], "id long, v string"),
                path, stats_cols=["id"])
        return orig(path_, version, files_, op, *a, **kw)

    monkeypatch.setattr(V, "_commit", race_disjoint)
    new_v, unt, rew = delete_version(spark, path, "id", 100, 104)
    monkeypatch.setattr(V, "_commit", orig)
    got = {r.id for r in read_version(spark, path).collect()}
    assert got == ({*range(0, 30)} | {*range(105, 130)} | {500})
    assert unt == 2  # the pruned base file + the rebased append
    # overlapping append -> true conflict
    state["raced"] = False

    def race_overlap(path_, version, files_, op, *a, **kw):
        if op == "overwrite" and not state["raced"]:
            state["raced"] = True
            append_version(
                spark.createDataFrame([(20, "dup")], "id long, v string"),
                path, stats_cols=["id"])
        return orig(path_, version, files_, op, *a, **kw)

    monkeypatch.setattr(V, "_commit", race_overlap)
    with pytest.raises(VersionConflictError):
        delete_version(spark, path, "id", 0, 29)
    monkeypatch.setattr(V, "_commit", orig)
    # the losing delete changed nothing; re-run on the head converges
    assert read_version(spark, path).count() == 57
    delete_version(spark, path, "id", 0, 29)
    got = {r.id for r in read_version(spark, path).collect()}
    assert got == ({*range(105, 130)} | {500})


def test_min_max_meta_temporal_decimal_and_empty_batch(spark, tmp_path):
    """code-review r08 fixes: (a) min_max_meta answers EXACTLY for
    timestamp/date/decimal columns (bounds are string-canonicalized in
    the manifest; one footer-schema read classifies and parses them
    back) while physical strings stay None; (b) an ALL-empty batch
    commits exactly one schema-anchor file; (c) describe_table's
    stats_coverage never reports the internal __rows__ key."""
    import datetime as dt
    from decimal import Decimal

    from clx_etl_spark.sinks.versioned import (_read_manifest,
                                               append_version,
                                               describe_table,
                                               min_max_meta, read_version)

    path = str(tmp_path / "vt")
    rows = [
        (1, dt.datetime(2024, 1, 1, 5), dt.date(2024, 1, 1),
         Decimal("10.50"), "alpha"),
        (2, dt.datetime(2024, 6, 30, 23), dt.date(2024, 6, 30),
         Decimal("99.25"), "zeta"),
    ]
    sch = ("id long, ts timestamp, d date, amt decimal(10,2), s string")
    for r in rows:
        append_version(spark.createDataFrame([r], sch).coalesce(1), path,
                       stats_cols=["id", "ts", "d", "amt", "s"])
    assert min_max_meta(path, "id") == (1, 2)
    # spark timestamps are UTC-adjusted: bounds come back tz-aware
    utc = dt.timezone.utc
    assert min_max_meta(path, "ts") == (
        dt.datetime(2024, 1, 1, 5, tzinfo=utc),
        dt.datetime(2024, 6, 30, 23, tzinfo=utc))
    assert min_max_meta(path, "d") == (dt.date(2024, 1, 1),
                                       dt.date(2024, 6, 30))
    assert min_max_meta(path, "amt") == (Decimal("10.50"),
                                         Decimal("99.25"))
    assert min_max_meta(path, "s") is None  # maybe footer-truncated
    cov = describe_table(path)["stats_coverage"]
    assert "__rows__" not in cov and cov["id"] == 1.0
    # all-empty batch -> exactly ONE anchor file, readable, zero rows
    v = append_version(
        spark.createDataFrame([], sch).repartition(8), path)
    m = _read_manifest(path, v)
    prev = set(_read_manifest(path, v - 1)["files"])
    assert len([f for f in m["files"] if f not in prev]) == 1
    assert read_version(spark, path).count() == 2


def test_cas_loser_cannot_clobber_winner_change_feed(
    spark, tmp_path, monkeypatch
):
    import os

    import pytest
    """Adversarial two-writer change-feed race (VERDICT r09): two
    change-feed deletes target the same version; the CAS loser's
    cleanup — and the legacy version-keyed drop API — must leave the
    winner's committed feed byte-identical. This pins the r09
    uuid-owned-feed fix: pre-r09 the loser's version-keyed rmtree
    clobbered the winner's CDC history."""
    import glob
    import hashlib

    import clx_etl_spark.sinks.versioned as V

    path = str(tmp_path / "vt")
    V.append_version(
        spark.createDataFrame(
            [(i, i * 2) for i in range(200)], "k long, v long"
        ).coalesce(1),
        path, stats_cols=["k"],
    )
    orig = V._commit
    state: dict = {}

    def digest(cdir: str) -> dict:
        out = {}
        for f in sorted(glob.glob(os.path.join(cdir, "*"))):
            with open(f, "rb") as fh:
                out[os.path.basename(f)] = hashlib.md5(fh.read()).hexdigest()
        return out

    def racing(path_, version, files, op, stats=None, txn=None, **kw):
        if "winner_cf" not in state and op == "overwrite" and kw.get("cf"):
            # the LOSER's commit attempt: interleave a winner that
            # commits its OWN change feed at the same version
            state["winner_cf"] = True  # guard before recursing
            V.delete_version_dv(spark, path_, "k", 150, 199,
                                change_feed=True)
            wm = V._read_manifest(path_, V.latest_version(path_))
            cdir = os.path.join(path_, "_changes", wm["cf"])
            state["winner_cf"] = wm["cf"]
            state["winner_bytes"] = digest(cdir)
        return orig(path_, version, files, op, stats, txn, **kw)

    monkeypatch.setattr(V, "_commit", racing)
    with pytest.raises(V.VersionConflictError):
        # loser: copy-on-write delete with a feed; the interleaved
        # delete-dv is a rewrite, so rebase refuses and cleanup runs
        V.delete_version(spark, path, "k", 0, 49, change_feed=True)
    monkeypatch.undo()
    win_v = V.latest_version(path)
    wm = V._read_manifest(path, win_v)
    assert wm["cf"] == state["winner_cf"]
    cdir = os.path.join(path, "_changes", wm["cf"])
    # the loser's cleanup removed ONLY its own uuid-owned dir
    assert sorted(os.listdir(os.path.join(path, "_changes"))) == [wm["cf"]]
    assert digest(cdir) == state["winner_bytes"]
    # the legacy version-keyed drop (the pre-r09 clobber vector) is
    # harmless against a uuid-owned committed feed
    V._drop_change_feed(path, win_v)
    assert digest(cdir) == state["winner_bytes"]
    ch = V.table_changes(spark, path, win_v - 1, win_v)
    assert ch.count() == 50
    assert {r._change_type for r in ch.collect()} == {"delete"}


def test_optimize_table_single_door(spark, tmp_path):
    """optimize_table sequences reorg-dv -> bin-pack compaction ->
    ANALYZE (one commit each, no-ops skipped) and reports the combined
    delta: file count down, dv debt gone, stats coverage intact, rows
    byte-identical (VERDICT r09 item 8)."""
    from clx_etl_spark.sinks.versioned import (append_version,
                                               delete_version_dv,
                                               describe_table,
                                               optimize_table,
                                               read_version)

    path = str(tmp_path / "vt")
    for i in range(6):  # six small files
        append_version(
            spark.createDataFrame(
                [(i * 100 + j, f"s{i * 100 + j}") for j in range(50)],
                "k long, s string").coalesce(1),
            path, stats_cols=["k"])
    delete_version_dv(spark, path, "k", 0, 4)      # dv dir 1
    delete_version_dv(spark, path, "k", 100, 104)  # dv dir 2
    d0 = describe_table(path)
    assert d0["n_files"] == 6 and d0["dv_dirs"] == 2
    expect = read_version(spark, path).orderBy("k").collect()
    rep = optimize_table(spark, path)
    # compaction re-derives full stats for the rewritten files, so the
    # ANALYZE step may already have nothing to backfill (no-op skipped)
    assert {"reorg_dvs", "compact"} <= set(rep["commits"]) \
        <= {"reorg_dvs", "compact", "analyze"}
    assert rep["after"]["n_files"] < rep["before"]["n_files"]
    assert rep["after"]["dv_files"] == 0  # compaction purged the debt
    d1 = describe_table(path)
    assert d1["stats_coverage"].get("k") == 1.0  # index survives
    assert read_version(spark, path).orderBy("k").collect() == expect
    # a second pass converges: NOTHING commits (review r10: the ANALYZE
    # step used to append a spurious manifest per pass on a fully
    # indexed table)
    rep2 = optimize_table(spark, path)
    assert rep2["commits"] == {}
    assert rep2["after"]["version"] == rep["after"]["version"]
    # opt-in retention sweep reclaims the pre-optimize artifacts
    rep3 = optimize_table(spark, path, expire_keep_latest=1)
    assert rep3["expired_artifacts"] > 0
    assert read_version(spark, path).orderBy("k").collect() == expect
