"""S12/K1 JDBC surface: real round-trips against Derby embedded (the JDBC
database Spark ships in its classpath) — read, partitioned read, batched
upsert convergence, restricted update columns, streaming foreachBatch."""

from __future__ import annotations

import pytest

from clx_etl_spark.sinks.jdbc import (
    _mysql_upsert_sql,
    foreach_batch_jdbc_upsert,
    jdbc_upsert,
    read_jdbc,
)

DDL = (
    "CREATE TABLE dim (exchange_id INT NOT NULL, symbol VARCHAR(64) NOT NULL, "
    "tick_size VARCHAR(32), base_asset VARCHAR(16), "
    "PRIMARY KEY (exchange_id, symbol))"
)
SCHEMA = "exchange_id int, symbol string, tick_size string, base_asset string"


def _lc(df):
    """Derby uppercases identifiers; normalize for assertions."""
    return df.toDF(*[c.lower() for c in df.columns])


@pytest.fixture
def derby(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/dimdb;create=true"
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(DDL)
    st.close()
    conn.close()
    return url


def test_jdbc_upsert_insert_then_update_converges(spark, derby):
    base = spark.createDataFrame(
        [(1, "BTCUSDT", "0.1", "BTC"), (1, "ETHUSDT", "0.01", "ETH")], SCHEMA
    )
    assert jdbc_upsert(spark, base, derby, "dim", keys=["exchange_id", "symbol"]) == 2
    # second batch: one update (new tick), one insert
    batch = spark.createDataFrame(
        [(1, "BTCUSDT", "0.5", "BTC"), (1, "SOLUSDT", "0.001", "SOL")], SCHEMA
    )
    jdbc_upsert(spark, batch, derby, "dim", keys=["exchange_id", "symbol"])
    # idempotent: replaying the same batch changes nothing
    jdbc_upsert(spark, batch, derby, "dim", keys=["exchange_id", "symbol"])
    back = {r.symbol: r for r in _lc(read_jdbc(spark, derby, "dim")).collect()}
    assert len(back) == 3
    assert back["BTCUSDT"].tick_size == "0.5"
    assert back["SOLUSDT"].base_asset == "SOL"


def test_jdbc_upsert_restricted_update_cols(spark, derby):
    base = spark.createDataFrame([(1, "BTCUSDT", "0.1", "BTC")], SCHEMA)
    jdbc_upsert(spark, base, derby, "dim", keys=["exchange_id", "symbol"])
    sneaky = spark.createDataFrame([(1, "BTCUSDT", "0.5", "XXX")], SCHEMA)
    jdbc_upsert(
        spark, sneaky, derby, "dim",
        keys=["exchange_id", "symbol"], update_cols=["tick_size"],
    )
    row = _lc(read_jdbc(spark, derby, "dim")).first()
    assert row.tick_size == "0.5"
    assert row.base_asset == "BTC"  # protected column kept the stored value


def test_jdbc_partitioned_read(spark, derby):
    rows = [(i % 4, f"S{i}", "0.1", "B") for i in range(40)]
    jdbc_upsert(
        spark, spark.createDataFrame(rows, SCHEMA), derby, "dim",
        keys=["exchange_id", "symbol"],
    )
    df = read_jdbc(
        spark, derby, "dim",
        partition_column="exchange_id", num_partitions=4,
        lower_bound=0, upper_bound=4,
    )
    assert df.rdd.getNumPartitions() == 4  # parallel range scan
    assert df.count() == 40


def test_foreach_batch_sink_function(spark, derby):
    sink = foreach_batch_jdbc_upsert(derby, "dim", keys=["exchange_id", "symbol"])
    batch = spark.createDataFrame([(9, "BTC-PERP", "0.5", "BTC")], SCHEMA)
    sink(batch, batch_id=0)
    sink(batch, batch_id=1)  # redelivery converges
    out = _lc(read_jdbc(spark, derby, "dim")).filter("exchange_id = 9").collect()
    assert len(out) == 1 and out[0].tick_size == "0.5"


def test_mysql_dialect_statement_shape():
    """Reference parity (mysql/__init__.py:56-58): ON DUPLICATE KEY UPDATE
    over exactly the listed mutable columns."""
    sql = _mysql_upsert_sql(
        "exchange_symbol",
        ["exchange_id", "symbol", "tick_size", "status"],
        ["tick_size", "status"],
    )
    assert sql == (
        "INSERT INTO exchange_symbol (exchange_id, symbol, tick_size, status) "
        "VALUES (?, ?, ?, ?) "
        "ON DUPLICATE KEY UPDATE tick_size = VALUES(tick_size), status = VALUES(status)"
    )


def test_engine_table_via_jdbc(spark, derby):
    from clx_etl_spark.api import Engine

    eng = Engine(spark)
    df = spark.createDataFrame([(2, "XRPUSDT", "0.0001", "XRP")], SCHEMA)
    eng.upsert(df, "dim", keys=["exchange_id", "symbol"], via="jdbc", url=derby)
    out = _lc(eng.table("dim", via="jdbc", url=derby)).filter("exchange_id = 2").collect()
    assert len(out) == 1 and out[0].symbol == "XRPUSDT"


def test_mysql_dialect_all_key_columns_degrades_to_noop_update():
    # NOT INSERT IGNORE: IGNORE downgrades every insert error (FK,
    # truncation) to a silently dropped row; the no-op dup-key update
    # suppresses only the duplicate-key case
    sql = _mysql_upsert_sql("pair", ["exchange_id", "symbol"], [])
    assert sql == (
        "INSERT INTO pair (exchange_id, symbol) VALUES (?, ?) "
        "ON DUPLICATE KEY UPDATE exchange_id = exchange_id"
    )


def test_jdbc_upsert_all_columns_are_keys(spark, tmp_path):
    """Every column in the PK: the generic dialect must degrade to
    insert-if-absent instead of emitting a malformed empty SET clause."""
    url = f"jdbc:derby:{tmp_path}/pairdb;create=true"
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE pair (exchange_id INT NOT NULL, symbol VARCHAR(64) NOT NULL, "
        "PRIMARY KEY (exchange_id, symbol))"
    )
    st.close()
    conn.close()
    pair_schema = "exchange_id int, symbol string"
    base = spark.createDataFrame([(1, "BTCUSDT"), (1, "ETHUSDT")], pair_schema)
    assert jdbc_upsert(spark, base, url, "pair", keys=["exchange_id", "symbol"]) == 2
    # replay + one new row: converges, no duplicates, no SQL error
    again = spark.createDataFrame(
        [(1, "BTCUSDT"), (1, "SOLUSDT")], pair_schema
    )
    jdbc_upsert(spark, again, url, "pair", keys=["exchange_id", "symbol"])
    jdbc_upsert(spark, again, url, "pair", keys=["exchange_id", "symbol"])
    back = _lc(read_jdbc(spark, url, "pair")).collect()
    assert sorted((r.exchange_id, r.symbol) for r in back) == [
        (1, "BTCUSDT"), (1, "ETHUSDT"), (1, "SOLUSDT"),
    ]


def test_jdbc_upsert_refuses_fact_scale_input(spark, derby):
    rows = [(i, f"S{i}", "0.1", "B") for i in range(50)]
    df = spark.createDataFrame(rows, SCHEMA)
    with pytest.raises(ValueError, match="capped at 10 rows"):
        jdbc_upsert(
            spark, df, derby, "dim", keys=["exchange_id", "symbol"], max_rows=10
        )
    # explicit override still works (the deliberate escape hatch)
    assert (
        jdbc_upsert(
            spark, df, derby, "dim", keys=["exchange_id", "symbol"], max_rows=None
        )
        == 50
    )
