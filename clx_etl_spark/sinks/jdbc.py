"""JDBC dimension source + upsert sink (SURVEY S12/K1 — the declared
``spark.read.jdbc`` option for MySQL-style dimension stores).

The reference reads dimensions from MySQL through an ORM and upserts with
``INSERT ... ON DUPLICATE KEY UPDATE`` in batches (reference:
src/databases/mysql/__init__.py:40-82, batch size 2000 in
src/exchanges/_base_.py). The engine's primary dimension store is parquet
+ MERGE (sinks/upsert.py); this module completes the declared surface for
deployments that keep dimensions in a relational store.

Scale notes:
  * reads go through Spark's JDBC source — predicate pushdown reaches the
    database, and ``partition_column``/``num_partitions`` splits a large
    dimension scan across executors;
  * upserts stream through ``toLocalIterator`` (one partition in driver
    memory at a time) into batched PreparedStatements — the right shape
    for dimension-sized tables (the reference's use case: thousands of
    rows per sync); fact-sized data belongs in the parquet MERGE path,
    never a row-at-a-time JDBC channel.

Tested against Derby embedded (the JDBC driver Spark ships); the MySQL
dialect emits the reference's exact ON DUPLICATE statement shape.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
) -> DataFrame:
    """S12: dimension scan over JDBC. With ``partition_column`` (+ bounds)
    the read is split into ``num_partitions`` parallel range queries;
    without it the whole table arrives through one connection (fine for
    dimensions, wrong for facts)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def _mysql_upsert_sql(table: str, cols: list[str], update_cols: list[str]) -> str:
    """Reference parity: INSERT ... ON DUPLICATE KEY UPDATE over the listed
    mutable columns (mysql/__init__.py:56-58 update_dict). When every column
    is a key there is nothing to update — degrade to a no-op dup-key update
    on the first key (NOT INSERT IGNORE: IGNORE downgrades EVERY insert
    error — FK violations, truncation, invalid values — to a silently
    dropped/mangled row, while the no-op update suppresses only the
    duplicate-key case, converging identically)."""
    collist = ", ".join(cols)
    params = ", ".join(["?"] * len(cols))
    if not update_cols:
        k0 = cols[0]
        return (
            f"INSERT INTO {table} ({collist}) VALUES ({params}) "
            f"ON DUPLICATE KEY UPDATE {k0} = {k0}"
        )
    updates = ", ".join(f"{c} = VALUES({c})" for c in update_cols)
    return f"INSERT INTO {table} ({collist}) VALUES ({params}) ON DUPLICATE KEY UPDATE {updates}"


def _to_java(spark: SparkSession, v):
    if isinstance(v, Decimal):
        return spark._jvm.java.math.BigDecimal(str(v))
    return v


def jdbc_upsert(
    spark: SparkSession,
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    update_cols: list[str] | None = None,
    batch_size: int = 2000,
    dialect: str = "generic",
    max_rows: int | None = 1_000_000,
) -> int:
    """K1: batched idempotent upsert into a JDBC table. Returns rows sent.

    dialect="mysql"   one ON DUPLICATE KEY UPDATE statement per row batch
                      (exactly the reference's statement shape);
    dialect="generic" portable UPDATE-else-INSERT per batch (works on any
                      JDBC database, e.g. Derby embedded in the tests).

    Rows stream via ``toLocalIterator`` — bounded driver memory — and every
    statement is batched (``addBatch``/``executeBatch``). Re-running the
    same upsert converges (last-wins), which is what makes at-least-once
    delivery exactly-once-ish downstream.

    When every column is a key, both dialects degrade to insert-if-absent
    (MySQL: INSERT IGNORE; generic: exists-check) instead of emitting a
    malformed empty SET clause.

    ``max_rows`` guards the scale envelope: this path writes through ONE
    driver-side connection and is sized for dimension syncs (the
    reference's use case — thousands of rows). Pointing a fact table at it
    raises instead of silently running for hours; fact-scale data belongs
    in the parquet MERGE path (sinks/upsert.py), or pass max_rows=None to
    override deliberately.
    """
    cols = df.columns
    update_cols = [c for c in (update_cols or cols) if c not in keys]
    if max_rows is not None:
        # limit(n+1).count() bounds the probe cost — never a full scan
        if df.limit(max_rows + 1).count() > max_rows:
            raise ValueError(
                f"jdbc_upsert streams through one driver connection and is "
                f"capped at {max_rows} rows (dimension-scale); this input "
                f"exceeds it. Use the parquet MERGE path (sinks/upsert.py) "
                f"for fact-scale data, or pass max_rows=None to override."
            )
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    sent = 0
    try:
        conn.setAutoCommit(False)
        if dialect == "mysql":
            stmt = conn.prepareStatement(_mysql_upsert_sql(table, cols, update_cols))
            pending = 0
            for row in df.toLocalIterator():
                for i, c in enumerate(cols):
                    stmt.setObject(i + 1, _to_java(spark, row[c]))
                stmt.addBatch()
                pending += 1
                if pending >= batch_size:
                    stmt.executeBatch()
                    sent, pending = sent + pending, 0
            if pending:
                stmt.executeBatch()
                sent += pending
            stmt.close()
        elif dialect == "generic":
            where_sql = " AND ".join(f"{k} = ?" for k in keys)
            ins = conn.prepareStatement(
                f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({', '.join(['?'] * len(cols))})"
            )
            if update_cols:
                set_sql = ", ".join(f"{c} = ?" for c in update_cols)
                upd = conn.prepareStatement(
                    f"UPDATE {table} SET {set_sql} WHERE {where_sql}"
                )
                for row in df.toLocalIterator():
                    for i, c in enumerate(update_cols + keys):
                        upd.setObject(i + 1, _to_java(spark, row[c]))
                    if upd.executeUpdate() == 0:
                        for i, c in enumerate(cols):
                            ins.setObject(i + 1, _to_java(spark, row[c]))
                        ins.executeUpdate()
                    sent += 1
                upd.close()
            else:
                # all columns are keys: insert-if-absent via exists-check
                chk = conn.prepareStatement(
                    f"SELECT 1 FROM {table} WHERE {where_sql}"
                )
                for row in df.toLocalIterator():
                    for i, k in enumerate(keys):
                        chk.setObject(i + 1, _to_java(spark, row[k]))
                    rs = chk.executeQuery()
                    exists = rs.next()
                    rs.close()
                    if not exists:
                        for i, c in enumerate(cols):
                            ins.setObject(i + 1, _to_java(spark, row[c]))
                        ins.executeUpdate()
                    sent += 1
                chk.close()
            ins.close()
        else:
            raise ValueError(f"unknown dialect {dialect!r}")
        conn.commit()
    except Exception:
        conn.rollback()
        raise
    finally:
        conn.close()
    return sent


def foreach_batch_jdbc_upsert(
    url: str,
    table: str,
    keys: list[str],
    update_cols: list[str] | None = None,
    batch_size: int = 2000,
    dialect: str = "generic",
):
    """Streaming K1: a ``foreachBatch`` function upserting every micro-batch
    (at-least-once delivery x idempotent upsert == effective exactly-once;
    mirrors streaming/jobs.foreach_batch_upsert for the parquet path)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        jdbc_upsert(
            batch_df.sparkSession, batch_df, url, table, keys,
            update_cols=update_cols, batch_size=batch_size, dialect=dialect,
        )

    return _sink
