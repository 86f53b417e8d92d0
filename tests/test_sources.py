"""Source adapter + normalizer tests (SURVEY S1/S2, T1/T2/T15 golden)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clx_etl_spark.sources.normalizers import (
    normalize_columnar,
    normalize_keyed,
    normalize_positional,
    normalize_symbols,
    payload_to_df,
)
from clx_etl_spark.sources.rest import RetryPolicy, paginate_time_window

from . import fixtures as FX


def test_paginate_cursor_advances_and_aligns():
    calls = []

    def fetch(start, end):
        calls.append((start, end))
        if start >= FX.BASE_TS + 5 * FX.MIN:
            return []
        # 3 bars per page, deliberately misaligned by +7ms
        return [{"ts": start + i * FX.MIN + 7, "v": i} for i in range(3)]

    batches = list(
        paginate_time_window(
            fetch, FX.BASE_TS, FX.BASE_TS + 9 * FX.MIN, FX.MIN, page_limit=3,
            retry=RetryPolicy(sleep=lambda s: None), sleep=lambda s: None,
        )
    )
    rows = [r for b in batches for r in b]
    assert all(r["ts"] % FX.MIN == 0 for r in rows)  # T6 force-align
    # cursor advanced past each batch max
    assert calls[1][0] == FX.BASE_TS + 3 * FX.MIN
    # window end capped by page_limit * interval
    assert calls[0][1] - calls[0][0] == 3 * FX.MIN


def test_retry_gives_up_after_tries():
    attempts = []

    def boom():
        attempts.append(1)
        raise ValueError("down")

    with pytest.raises(ValueError):
        RetryPolicy(tries=3, sleep=lambda s: None).run(boom)
    assert len(attempts) == 3


def test_retry_recovers_mid_way():
    state = {"n": 0}

    def flaky():
        state["n"] += 1
        if state["n"] < 3:
            raise ValueError("blip")
        return "ok"

    assert RetryPolicy(tries=3, sleep=lambda s: None).run(flaky) == "ok"


def test_normalize_positional_binance(spark):
    df = spark.createDataFrame([(r,) for r in FX.BINANCE_KLINES], "value array<string>")
    out = normalize_positional(
        df, {"ts": 0, "open": 1, "high": 2, "low": 3, "close": 4, "volume": 5,
             "quote_volume": 7, "count": 8},
        exchange_id=1, inst_type=1, symbol="BTCUSDT",
    ).collect()
    assert [r.ts for r in out] == [1704067200000, 1704067260000]
    assert str(out[0].open) == "42000.100000000000000000"
    assert out[0].asDict()["count"] == 1543
    assert out[0].exchange_id == 1 and out[0].symbol == "BTCUSDT"


def test_normalize_gate_seconds_unit(spark):
    df = spark.createDataFrame([(r,) for r in FX.GATE_SECONDS], "value array<string>")
    out = normalize_positional(
        df, {"ts": 0, "quote_volume": 1, "close": 2, "high": 3, "low": 4, "open": 5, "volume": 6},
        exchange_id=4, inst_type=0, symbol="BTC_USDT", ts_unit="s",
    ).collect()
    assert [r.ts for r in out] == [1704067200000, 1704067260000]
    assert out[0].asDict()["count"] is None  # absent field -> typed null


def test_normalize_keyed_woox(spark):
    df = payload_to_df(spark, FX.WOOX_KEYED)
    out = normalize_keyed(
        df, {"ts": "start_timestamp", "open": "open", "high": "high", "low": "low",
             "close": "close", "volume": "volume", "quote_volume": "amount"},
        exchange_id=9, inst_type=1, symbol="BTC_PERP",
    ).collect()
    assert out[0].ts == 1704067200000
    assert float(out[1].quote_volume) == 4130000.0


def test_normalize_columnar_mexc(spark):
    df = payload_to_df(spark, FX.MEXC_COLUMNAR)
    out = normalize_columnar(
        df, {"ts": "time", "open": "open", "high": "high", "low": "low",
             "close": "close", "volume": "vol", "quote_volume": "amount"},
        exchange_id=7, inst_type=1, symbol="BTC_USDT", ts_unit="s",
    ).orderBy("ts").collect()
    assert [r.ts for r in out] == [1704067200000, 1704067260000]
    assert float(out[0].open) == 42000.1


def test_normalize_symbols_status_and_filter(spark):
    df = payload_to_df(spark, FX.BINANCE_EXCHANGE_INFO)
    out = normalize_symbols(
        df.filter(F.col("contractType") == "PERPETUAL"),  # F1 predicate
        {"symbol": "symbol", "base_asset": "baseAsset", "quote_asset": "quoteAsset",
         "price_precision": "pricePrecision", "quantity_precision": "quantityPrecision",
         "tick_size": "tickSize", "step_size": "stepSize", "status": "status"},
        exchange_id=1,
        status_map={"TRADING": 0, "SETTLING": 1, "PENDING_TRADING": 2, "BREAK": 3},
    ).orderBy("symbol").collect()
    assert [r.symbol for r in out] == ["BTCUSDT", "ETHUSDT"]  # quarterly filtered
    assert [r.status for r in out] == [0, 1]
    assert out[0].tick_size == "0.10"  # decimal string preserved verbatim


def test_normalize_positional_coinbase_reordered(spark):
    """Coinbase candles order is [time, low, high, open, close, volume]
    (reference coinbase/spot.py:84-94) — the position map must land each
    field correctly despite the unusual order, with s->ms scaling."""
    payload = [[1700000000, "99.5", "101.5", "100.0", "101.0", "12.5"]]
    df = spark.createDataFrame([(r,) for r in payload], "value array<string>")
    out = normalize_positional(
        df,
        positions={"ts": 0, "low": 1, "high": 2, "open": 3, "close": 4, "volume": 5},
        exchange_id=9, inst_type=0, symbol="BTC-USD", ts_unit="s",
    ).first()
    assert out.ts == 1700000000000
    assert float(out.low) == 99.5 and float(out.high) == 101.5
    assert float(out.open) == 100.0 and float(out.close) == 101.0
    assert out["count"] is None  # coinbase has no trade count


def test_normalize_symbols_legacy_name_map(spark):
    """Kraken-style legacy asset names remap to canonical during symbol
    normalization (reference kraken/spot.py:8-26, XBT->BTC etc.)."""
    df = spark.createDataFrame(
        [("XBTUSD", "XBT", "USD"), ("XETHZUSD", "XETH", "ZUSD")],
        "pair string, base string, quote string",
    )
    out = {r.symbol: r for r in normalize_symbols(
        df,
        field_map={"symbol": "pair", "base_asset": "base", "quote_asset": "quote"},
        exchange_id=7,
        asset_name_map={"XBT": "BTC", "XETH": "ETH", "ZUSD": "USD"},
    ).collect()}
    assert out["XBTUSD"].base_asset == "BTC" and out["XBTUSD"].quote_asset == "USD"
    assert out["XETHZUSD"].base_asset == "ETH" and out["XETHZUSD"].quote_asset == "USD"


def test_rest_datasource_partition_per_range(spark):
    """The DSv2 surface (spark.read.format('clx_rest')): one Spark input
    partition per coalesced gap range, rows born on executors, cursor
    pagination + ts alignment identical to the mapInPandas path."""
    from clx_etl_spark.sources.datasource import read_rest

    ranges = [
        {"key": {"symbol": "BTCUSDT", "exchange_id": 1},
         "start_ms": FX.BASE_TS, "end_ms": FX.BASE_TS + 9 * FX.MIN},
        {"key": {"symbol": "ETHUSDT", "exchange_id": 1},
         "start_ms": FX.BASE_TS + 100 * FX.MIN, "end_ms": FX.BASE_TS + 104 * FX.MIN},
    ]
    df = read_rest(
        spark,
        ranges,
        transport="tests.fixtures:rest_transport",
        out_schema="symbol string, exchange_id int, ts long, close string",
        interval_ms=FX.MIN,
        page_limit=4,  # forces multi-page cursor advance within each range
    )
    assert df.rdd.getNumPartitions() == 2  # one task per gap range
    rows = df.collect()
    by_sym = {}
    for r in rows:
        by_sym.setdefault(r.symbol, []).append(r)
    assert len(by_sym["BTCUSDT"]) == 10
    assert len(by_sym["ETHUSDT"]) == 5
    assert all(r.ts % FX.MIN == 0 for r in rows)  # aligned
    # bar values deterministic from ts -> pagination didn't skip/dup bars
    assert sorted(r.ts for r in by_sym["BTCUSDT"]) == [
        FX.BASE_TS + i * FX.MIN for i in range(10)
    ]


def test_read_csv_strict_routes_corrupt_rows(spark, tmp_path):
    from clx_etl_spark.sources.files import read_csv_strict

    p = tmp_path / "drop.csv"
    p.write_text(
        "symbol,ts,close\n"
        "BTCUSDT,1704067200000,42000.1\n"
        "ETHUSDT,not_a_number,2200.5\n"   # bad long -> reject
        "SOLUSDT,1704067260000,95.3\n"
    )
    clean, rejects = read_csv_strict(
        spark, str(p), "symbol string, ts long, close double"
    )
    assert {r.symbol for r in clean.collect()} == {"BTCUSDT", "SOLUSDT"}
    rej = rejects.collect()
    assert len(rej) == 1 and "not_a_number" in rej[0].raw


def test_read_jsonl_strict_routes_corrupt_rows(spark, tmp_path):
    from clx_etl_spark.sources.files import read_jsonl_strict

    p = tmp_path / "export.jsonl"
    p.write_text(
        '{"symbol": "BTCUSDT", "ts": 1704067200000}\n'
        "{broken json line\n"
        '{"symbol": "ETHUSDT", "ts": 1704067260000}\n'
    )
    clean, rejects = read_jsonl_strict(spark, str(p), "symbol string, ts long")
    assert {r.symbol for r in clean.collect()} == {"BTCUSDT", "ETHUSDT"}
    rej = rejects.collect()
    assert len(rej) == 1 and rej[0].raw.startswith("{broken")


def test_clx_table_batch_source_time_travel_and_dv(spark, tmp_path):
    """clx_table DSv2 batch source: SQL-facing reads of a versioned
    table — head snapshot with deletion vectors applied executor-side,
    time travel by version and tag, evolution-gap columns as NULL."""
    from pyspark.sql import functions as F

    from clx_etl_spark.sinks.versioned import (append_version,
                                               delete_version_dv,
                                               tag_version)
    from clx_etl_spark.sources.table_source import read_table_source

    path = str(tmp_path / "vt")
    for lo in (0, 100, 200):
        append_version(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(50)],
                "id long, v string").coalesce(1),
            path, stats_cols=["id"], bloom_cols=["id"])
    tag_version(path, "seeded")
    delete_version_dv(spark, path, "id", 110, 120)
    df = read_table_source(spark, path)
    assert df.count() == 139
    assert df.filter(F.col("id").between(110, 120)).count() == 0
    assert read_table_source(spark, path, version=2).count() == 150
    assert read_table_source(spark, path, tag="seeded").count() == 150
    # SQL door: a temp view over the source
    df.createOrReplaceTempView("clx_vt")
    assert spark.sql(
        "SELECT COUNT(*) FROM clx_vt WHERE id >= 200").collect()[0][0] == 50
    got = {r.id: r.v for r in spark.sql(
        "SELECT id, v FROM clx_vt WHERE id = 205").collect()}
    assert got == {205: "v205"}


def test_clx_table_pushdown_prunes_partitions(spark, tmp_path):
    """DSv2 filter pushdown: the manifest prunes files out of the
    partition list at plan time — an equality on a bloom-indexed key
    plans one partition of three; a range keeps its two; filters are
    never consumed (rows still re-filter), so stat-less files are safe."""
    from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual

    from clx_etl_spark.sinks.versioned import append_version
    from clx_etl_spark.sources.table_source import _PushdownTableReader

    path = str(tmp_path / "vt")
    for lo in (0, 100, 200):
        append_version(
            spark.createDataFrame(
                [(lo + i, i) for i in range(50)], "id long, n long"
            ).coalesce(1),
            path, stats_cols=["id"], bloom_cols=["id"])
    sch = spark.createDataFrame([], "id long, n long").schema
    r = _PushdownTableReader(sch, {"path": path})
    back = list(r.pushFilters([EqualTo(("id",), 205)]))
    assert len(back) == 1  # advisory: every filter handed back
    assert len(r.partitions()) == 1
    r2 = _PushdownTableReader(sch, {"path": path})
    list(r2.pushFilters([GreaterThanOrEqual(("id",), 100)]))
    assert len(r2.partitions()) == 2
    # bloom gap: id 60 is inside no file's range -> zero partitions
    r3 = _PushdownTableReader(sch, {"path": path})
    list(r3.pushFilters([EqualTo(("id",), 60)]))
    assert len(r3.partitions()) == 0


def test_clx_table_pushdown_in_list(spark, tmp_path):
    """IN-list pushdown: bounds from min/max of the list plus the bloom
    probe — a 2-value IN spanning two files plans exactly those two; an
    IN whose values all fall in stat gaps plans zero."""
    from pyspark.sql.datasource import In

    from clx_etl_spark.sinks.versioned import append_version
    from clx_etl_spark.sources.table_source import _PushdownTableReader

    path = str(tmp_path / "vt")
    for lo in (0, 100, 200):
        append_version(
            spark.createDataFrame(
                [(lo + i, i) for i in range(50)], "id long, n long"
            ).coalesce(1),
            path, stats_cols=["id"], bloom_cols=["id"])
    sch = spark.createDataFrame([], "id long, n long").schema
    r = _PushdownTableReader(sch, {"path": path})
    list(r.pushFilters([In(("id",), (5, 205))]))
    assert len(r.partitions()) == 2
    r2 = _PushdownTableReader(sch, {"path": path})
    list(r2.pushFilters([In(("id",), (60, 160))]))  # both in stat gaps
    assert len(r2.partitions()) == 0


def test_clx_table_pushdown_prefix(spark, tmp_path):
    """StringStartsWith pushdown: a prefix maps to the exact covering
    string interval, pruning files whose [min,max] exclude it."""
    from pyspark.sql.datasource import StringStartsWith

    from clx_etl_spark.sinks.versioned import append_version
    from clx_etl_spark.sources.table_source import _PushdownTableReader

    path = str(tmp_path / "vt")
    for block in ("apple", "mango", "zebra"):
        append_version(
            spark.createDataFrame(
                [(f"{block}-{i:03d}", i) for i in range(20)],
                "name string, n long").coalesce(1),
            path, stats_cols=["name"])
    sch = spark.createDataFrame([], "name string, n long").schema
    r = _PushdownTableReader(sch, {"path": path})
    list(r.pushFilters([StringStartsWith(("name",), "mango-")]))
    assert len(r.partitions()) == 1
    r2 = _PushdownTableReader(sch, {"path": path})
    list(r2.pushFilters([StringStartsWith(("name",), "q")]))  # gap
    assert len(r2.partitions()) == 0
    # correctness through the full source: rows still exact
    from clx_etl_spark.sources.table_source import read_table_source
    from pyspark.sql import functions as F

    df = read_table_source(spark, path)
    assert df.filter(F.col("name").startswith("mango-")).count() == 20


def test_clx_table_prefix_prune_keeps_max_codepoint_rows(spark, tmp_path):
    """File-level prefix pruning must NEVER drop a file whose only
    matching rows sort ABOVE prefix+U+10FFFF (prefix followed by U+10FFFF
    plus more characters) — the naive upper bound would prune it, and
    file pruning is not recoverable by Spark's row-level re-filter."""
    from pyspark.sql.datasource import StringStartsWith

    from clx_etl_spark.sinks.versioned import append_version
    from clx_etl_spark.sources.table_source import _PushdownTableReader

    path = str(tmp_path / "vt")
    hot = "q" + chr(0x10FFFF) + "zzz"  # startswith("q"), > "q"+U+10FFFF
    append_version(
        spark.createDataFrame([(hot, 1), (hot + "a", 2)], "name string, n long")
        .coalesce(1),
        path, stats_cols=["name"])
    sch = spark.createDataFrame([], "name string, n long").schema
    r = _PushdownTableReader(sch, {"path": path})
    list(r.pushFilters([StringStartsWith(("name",), "q")]))
    assert len(r.partitions()) == 1  # kept: succ("q") = "r" bounds it
    # a prefix that is ALL U+10FFFF has no finite successor: no upper
    # bound, so a file whose rows DO match survives
    path2 = str(tmp_path / "vt2")
    append_version(
        spark.createDataFrame(
            [(chr(0x10FFFF) * 2 + "tail", 1)], "name string, n long")
        .coalesce(1),
        path2, stats_cols=["name"])
    r2 = _PushdownTableReader(sch, {"path": path2})
    list(r2.pushFilters([StringStartsWith(("name",), chr(0x10FFFF))]))
    assert len(r2.partitions()) == 1
    # and a provable miss still prunes
    r3 = _PushdownTableReader(sch, {"path": path})
    list(r3.pushFilters([StringStartsWith(("name",), "a")]))
    assert len(r3.partitions()) == 0


def test_clx_table_reader_prunes_columns_and_vectorizes_dv(spark, tmp_path):
    """TableReader.read passes a column projection to the parquet reader
    (narrow schemas never decode unread columns) and applies deletion
    vectors with a vectorized mask — results stay exact on a dv-bearing
    multi-row file."""
    import pyarrow.parquet as pq

    from clx_etl_spark.sinks.versioned import (append_version,
                                               delete_version_dv)
    from clx_etl_spark.sources.table_source import (TableFilePartition,
                                                    TableReader)

    path = str(tmp_path / "vt")
    append_version(
        spark.range(10_000)
        .selectExpr("id", "id * 2 AS a", "repeat('x', 20) AS b")
        .coalesce(1),
        path, stats_cols=["id"])
    delete_version_dv(spark, path, "id", 100, 199)
    # narrow schema: only (id, a) — column b must never be decoded
    sch = spark.createDataFrame([], "id long, a long").schema
    r = TableReader(sch, {"path": path})
    parts = r.partitions()
    assert len(parts) == 1
    seen_cols = []
    orig = pq.ParquetFile.iter_batches  # r08: reads STREAM in batches

    def spy(self, *a, **kw):
        seen_cols.append(kw.get("columns"))
        return orig(self, *a, **kw)

    import unittest.mock as mock
    with mock.patch.object(pq.ParquetFile, "iter_batches", spy):
        batches = list(r.read(parts[0]))
    assert seen_cols == [["id", "a"]]
    total = sum(b.num_rows for b in batches)
    assert total == 10_000 - 100
    ids = {i for b in batches for i in b.column("id").to_pylist()}
    assert not any(100 <= i <= 199 for i in ids)
    # evolution gap: a column absent from the file reads as NULL
    sch2 = spark.createDataFrame([], "id long, missing string").schema
    r2 = TableReader(sch2, {"path": path})
    b2 = list(r2.read(r2.partitions()[0]))
    assert all(b.column("missing").null_count == b.num_rows for b in b2)
    assert sum(b.num_rows for b in b2) == 9_900


def test_clx_table_writer_append_and_overwrite(spark, tmp_path):
    """DSv2 batch writer: df.write.format('clx_table') appends land as
    committed versions with footer stats + blooms; a second append
    without statsCols re-derives the tracked columns from the head
    manifest; mode('overwrite') starts a fresh file list."""
    from clx_etl_spark.sinks.versioned import (_BLOOM_KEY, _read_manifest,
                                               latest_version,
                                               pruned_file_count,
                                               read_version)
    from clx_etl_spark.sources.table_source import write_table_source

    path = str(tmp_path / "vt")
    df = spark.range(100).selectExpr("id", "cast(id * 2 as double) AS x")
    write_table_source(df.coalesce(1), path, mode="append",
                       stats_cols=["id"], bloom_cols=["id"])
    assert latest_version(path) == 0
    assert read_version(spark, path).count() == 100
    write_table_source(
        spark.range(100, 200).selectExpr("id", "cast(0.0 as double) AS x")
        .coalesce(1), path, mode="append")  # no statsCols: derived
    assert read_version(spark, path).count() == 200
    m = _read_manifest(path, 1)
    tracked = {c for per in dict(m["stats"]).values() for c in per}
    assert tracked == {"id", _BLOOM_KEY + "id", "__rows__",
                       "__nulls__:id"}
    kept, total = pruned_file_count(path, "id", 150, 150)
    assert (kept, total) == (1, 2)
    write_table_source(
        spark.range(10).selectExpr("id", "cast(1.0 as double) AS x")
        .coalesce(1), path, mode="overwrite")
    assert read_version(spark, path).count() == 10
    assert _read_manifest(path, 2)["op"] == "overwrite"


def test_clx_table_writer_constraints_fail_closed(spark, tmp_path):
    """CHECK constraints gate SQL writes: a violating batch is refused
    (table state intact) and an expression the commit-side validator
    cannot evaluate also refuses — never a silent skip."""
    import pytest

    from clx_etl_spark.sinks.versioned import (latest_version, read_version,
                                               set_constraints)
    from clx_etl_spark.sources.table_source import write_table_source

    path = str(tmp_path / "vt")
    write_table_source(
        spark.range(5).selectExpr("id", "cast(1.0 as double) AS x")
        .coalesce(1), path, mode="append", stats_cols=["id"])
    set_constraints(path, {"id_nonneg": "id >= 0"})
    with pytest.raises(Exception, match="constraint violation|id_nonneg"):
        write_table_source(
            spark.range(-3, 3).selectExpr("id", "cast(0.0 as double) AS x")
            .coalesce(1), path, mode="append")
    assert latest_version(path) == 0
    assert read_version(spark, path).count() == 5
    # fail CLOSED on an unparseable expression
    set_constraints(path, {"bad": "totally_bogus_fn(id) == 1"})
    with pytest.raises(Exception):
        write_table_source(
            spark.range(5, 8).selectExpr("id", "cast(0.0 as double) AS x")
            .coalesce(1), path, mode="append")
    assert latest_version(path) == 0


def test_clx_table_writer_commit_rebases_over_append(spark, tmp_path,
                                                     monkeypatch):
    """The writer's driver-side commit loop: losing the manifest CAS to
    an interleaved append rebases (manifest JSON only) and both commits'
    rows survive; a lost overwrite raises."""
    import pytest

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sources.table_source import (TableWriter,
                                                    write_table_source)

    path = str(tmp_path / "vt")
    write_table_source(
        spark.range(10).selectExpr("id", "cast(1.0 as double) AS x")
        .coalesce(1), path, mode="append", stats_cols=["id"])
    orig = V._commit
    fired = {}

    def racing(path_, version, files, op, stats=None, txn=None, **kw):
        if not fired:
            fired["x"] = True
            V.append_version(
                spark.createDataFrame([(500, 0.0)], "id long, x double")
                .coalesce(1), path_, stats_cols=["id"])
        return orig(path_, version, files, op, stats, txn, **kw)

    # drive the commit loop in-process with a pre-staged file
    w = TableWriter({"path": path}, overwrite=False)
    import pyarrow as pa
    msg = w.write(iter([pa.record_batch({"id": pa.array([99], pa.int64()),
                                         "x": pa.array([9.9])})]))
    monkeypatch.setattr(V, "_commit", racing)
    w.commit([msg])
    monkeypatch.setattr(V, "_commit", orig)
    got = {r.id for r in V.read_version(spark, path).collect()}
    assert 99 in got and 500 in got and len(got) == 12
    # overwrite loses the race -> loud conflict
    fired.clear()
    w2 = TableWriter({"path": path}, overwrite=True)
    msg2 = w2.write(iter([pa.record_batch({"id": pa.array([1], pa.int64()),
                                           "x": pa.array([0.0])})]))
    monkeypatch.setattr(V, "_commit", racing)
    with pytest.raises(V.VersionConflictError):
        w2.commit([msg2])


def test_clx_table_schema_evolution_via_writer(spark, tmp_path):
    """A later append with an extra column is a contract violation
    (r09 schema enforcement) until the writer opts into evolution with
    option("mergeSchema","true") — then the schema widens and older
    files read the new column as NULL."""
    import pytest

    from clx_etl_spark.sources.table_source import (TableDataSource,
                                                    read_table_source,
                                                    write_table_source)

    path = str(tmp_path / "vt")
    write_table_source(
        spark.range(3).selectExpr("id"), path, mode="append",
        stats_cols=["id"])
    drifted = spark.range(3, 5).selectExpr(
        "id", "cast(id as double) AS extra")
    with pytest.raises(Exception, match="mergeSchema"):
        write_table_source(drifted, path, mode="append")
    spark.dataSource.register(TableDataSource)
    (drifted.write.format("clx_table").option("path", path)
     .option("mergeSchema", "true").mode("append").save())
    df = read_table_source(spark, path)
    assert set(df.columns) == {"id", "extra"}
    got = {r.id: r.extra for r in df.collect()}
    assert got[0] is None and got[4] == 4.0 and len(got) == 5


def test_clx_table_catalog_sql_dml(spark, tmp_path):
    """Catalog SQL DML (r08): CREATE TABLE ... USING clx_table LOCATION
    + INSERT INTO / INSERT OVERWRITE / SELECT work even though Spark
    4.1 hands catalog-resolved Python DSv2 sources EMPTY options — the
    table path rides StructField metadata through the catalog schema
    (_recover_path). Tracked stats/blooms carry through SQL commits;
    CTAS (whose catalog schema is the query's, no metadata channel)
    fails LOUDLY with the two-step recipe."""
    import uuid as _uuid

    import pytest

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sources.table_source import (TableDataSource,
                                                    write_table_source)

    spark.dataSource.register(TableDataSource)
    path = str(tmp_path / "vt")
    write_table_source(
        spark.createDataFrame([(i, float(i)) for i in range(10)],
                              "id long, x double"),
        path, stats_cols=["id"], bloom_cols=["id"])
    t = f"clx_cat_test_{_uuid.uuid4().hex[:8]}"
    try:
        spark.sql(f"CREATE TABLE {t} USING clx_table LOCATION '{path}'")
        assert spark.sql(f"SELECT count(*) c FROM {t}").first().c == 10
        spark.sql(f"INSERT INTO {t} VALUES (100, 1.5), (101, 2.5)")
        got = spark.sql(
            f"SELECT sum(id) s, count(*) c FROM {t}").first()
        assert (got.s, got.c) == (45 + 201, 12)
        # the SQL-committed version keeps the file-skipping index
        m = V._read_manifest(path, V.latest_version(path))
        new_f = m["files"][-1]
        assert set(m["stats"][new_f]) == {
            "id", "__rows__", "__nulls__:id", V._BLOOM_KEY + "id"}
        spark.sql(f"INSERT OVERWRITE {t} VALUES (7, 0.0)")
        assert spark.sql(f"SELECT count(*) c FROM {t}").first().c == 1
        # full history retained: SQL DML commits versions like any writer
        assert V.latest_version(path) == 2
        assert V.read_version(spark, path, 0).count() == 10
        # CTAS cannot recover a path -> loud two-step guidance
        with pytest.raises(Exception, match="[Tt]wo-step"):
            spark.sql(
                f"CREATE TABLE {t}_ctas USING clx_table LOCATION "
                f"'{tmp_path}/t2' AS SELECT 1 AS v")
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        spark.sql(f"DROP TABLE IF EXISTS {t}_ctas")


def test_clx_table_sql_row_level_dml_fails_loudly(spark, tmp_path):
    """SQL UPDATE / DELETE / MERGE on a catalog clx_table table (r09
    probe): pyspark 4.1's Python DSv2 has no SupportsRowLevelOperations,
    so Spark's analyzer refuses all three BEFORE any data is touched —
    a loud dead-end, never a silent no-op. There is no API hook to
    customize the message, so the redirect to the Engine doors
    (merge_version / merge_version_dv / delete_version / delete_keys_dv)
    lives in the docs (README 'catalog tables', table_source docstring).
    This pins the refusal so a Spark upgrade that ADDS the capability
    surfaces as a test failure -> implement, don't document."""
    import uuid as _uuid

    import pytest

    from clx_etl_spark.sources.table_source import (TableDataSource,
                                                    write_table_source)

    spark.dataSource.register(TableDataSource)
    path = str(tmp_path / "vt")
    write_table_source(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        path, stats_cols=["id"])
    t = f"clx_dml_probe_{_uuid.uuid4().hex[:8]}"
    try:
        spark.sql(f"CREATE TABLE {t} USING clx_table LOCATION '{path}'")
        with pytest.raises(Exception, match="does not support UPDATE"):
            spark.sql(f"UPDATE {t} SET v = 'x' WHERE id = 1")
        with pytest.raises(Exception, match="does not support deletes"):
            spark.sql(f"DELETE FROM {t} WHERE id = 1")
        with pytest.raises(Exception, match="does not support MERGE"):
            spark.sql(
                f"MERGE INTO {t} USING (SELECT 1 AS id, 'z' AS v) s "
                f"ON {t}.id = s.id WHEN MATCHED THEN UPDATE SET *")
        # nothing was touched: the table still answers, rows intact
        assert spark.sql(f"SELECT count(*) c FROM {t}").first().c == 2
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_clx_table_reader_limit_option_early_stop(spark, tmp_path):
    """Opt-in LIMIT (r08 — the Python DSv2 API has no pushLimit): the
    ``limit`` option caps each partition's decoded output, streaming
    batches stop early, and dv tombstones still apply before the cap."""
    from clx_etl_spark.sinks.versioned import (append_version,
                                               delete_version_dv)
    from clx_etl_spark.sources.table_source import (TableReader,
                                                    read_table_source)

    path = str(tmp_path / "vt")
    append_version(
        spark.range(200_000).selectExpr("id", "id * 2 AS a").coalesce(1),
        path, stats_cols=["id"])
    delete_version_dv(spark, path, "id", 0, 9)
    r = TableReader(
        spark.createDataFrame([], "id long, a long").schema,
        {"path": path, "limit": "5"})
    batches = list(r.read(r.partitions()[0]))
    rows = [i for b in batches for i in b.column("id").to_pylist()]
    assert rows == [10, 11, 12, 13, 14]  # dv applied, then capped
    # one 64k-batch window decoded, not the 200k-row file
    assert len(batches) == 1
    # DataFrame door: pair the option with .limit(n)
    assert read_table_source(spark, path, limit=3).limit(3).count() == 3


def test_stream_writer_legacy_identity_migration_warning(spark, tmp_path):
    """ADVICE r08: a table whose exactly-once watermark sits under the
    pre-r08 TABLE-PATH-derived default identity gets a loud runtime
    warning (naming the exact txnAppId to set) when a stream constructs
    with the new checkpoint-derived default — the silent-replay upgrade
    window is signalled instead of discovered. No warning with an
    explicit txnAppId, and none for tables without a legacy watermark."""
    import hashlib
    import warnings

    import pytest

    import clx_etl_spark.sinks.versioned as V
    from clx_etl_spark.sources.table_source import TableStreamWriter

    table = str(tmp_path / "vt")
    legacy = ("clx-table-stream-"
              + hashlib.md5(table.encode()).hexdigest()[:12])
    V.append_version(spark.createDataFrame([(1,)], "id long"), table,
                     txn=(legacy, 3))
    with pytest.warns(UserWarning, match=f"txnAppId', '{legacy}'"):
        TableStreamWriter({"path": table,
                           "checkpointlocation": str(tmp_path / "ck")})
    # explicit identity or a legacy-free table: silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        TableStreamWriter({"path": table, "txnappid": "explicit-id"})
    t2 = str(tmp_path / "vt2")
    V.append_version(spark.createDataFrame([(1,)], "id long"), t2)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        TableStreamWriter({"path": t2,
                           "checkpointlocation": str(tmp_path / "ck2")})


def test_count_rows_meta_distributed_legacy_fallback(spark, tmp_path,
                                                     monkeypatch):
    """VERDICT r08 #6: pre-r08 files (no __rows__ stats key) fall back
    to footer reads — past the distribution threshold those reads ship
    as one no-shuffle task batch instead of a serial driver loop, and
    both paths agree."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    import clx_etl_spark.sinks.versioned as V

    path = str(tmp_path / "vt")
    sub = os.path.join(path, "data", "v0-legacy")
    os.makedirs(sub)
    files = []
    for i in range(6):
        f = os.path.join(sub, f"part-{i}.parquet")
        pq.write_table(pa.table({"id": pa.array(range(i + 1))}), f)
        files.append(f)
    V._commit(path, 0, files, "append", {})  # legacy: no stats at all
    assert V.count_rows_meta(path) == 21  # serial fallback
    monkeypatch.setattr(V, "_STATS_DISTRIBUTE_MIN_FILES", 1)
    assert V.count_rows_meta(path, spark=spark) == 21  # distributed
    assert V.count_rows_meta(path) == 21  # active-session discovery
