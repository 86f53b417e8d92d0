"""Remaining TPC-H query shapes (Q11/Q12/Q13/Q15/Q16/Q20/Q21), adapted to
the synthetic star schema (no partsupp/shipmode/commitdate columns — each
query keeps its distinctive *plan shape* on the columns that exist).

These complete the analytic surface SURVEY §2.6 declares ("grouping sets,
distinct-agg ... we expose but don't need custom work for"): scalar-subquery
thresholds over grouped sums (Q11), conditional class counts (Q12), left-outer
count distribution with a double aggregation (Q13), max join-back (Q15),
distinct-agg with NOT-IN exclusion (Q16), nested semi-join with an agg
threshold (Q20), and EXISTS + NOT EXISTS double-correlated self-joins (Q21).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from . import register

DEC6 = "decimal(38,6)"


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


@register(
    "q11_important_parts",
    oracle="""
    WITH v AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS val
      FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      GROUP BY l_partkey),
    t AS (SELECT CAST(SUM(val) AS DOUBLE) / COUNT(*) * 1.5 AS thr FROM v)
    SELECT partkey, CAST(val AS DOUBLE) AS total_value
    FROM v, t WHERE CAST(val AS DOUBLE) > thr
    """,
    doc="TPC-H Q11 shape: per-part value share vs a global scalar-subquery "
    "threshold (HAVING > SUM(...)*fraction — expressed as 1.5x the mean so "
    "the filter stays selective at every scale factor; TPC-H's fixed "
    "fraction degenerates as part count grows). The grouped sums are "
    "computed once and reused for both the threshold and the filter; "
    "decimal accumulation keeps the > comparison order-insensitive",
)
def q11_important_parts(spark, sf):
    li = _t(spark, sf, "lineitem")
    supp = _t(spark, sf, "supplier")
    nation = _t(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    v = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.col("l_extendedprice").cast(DEC6)).alias("val"))
    )
    thr = v.agg(
        (F.sum("val").cast("double") / F.count(F.lit(1)) * 1.5).alias("thr")
    )
    return (
        v.crossJoin(F.broadcast(thr))
        .filter(F.col("val").cast("double") > F.col("thr"))
        .select("partkey", F.col("val").cast("double").alias("total_value"))
    )


@register(
    "q12_late_lines_by_status",
    oracle="""
    SELECT l_linestatus AS linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY linestatus
    """,
    doc="TPC-H Q12 shape: late-shipment lines classified by order priority "
    "— join with a non-equi date conjunct, then conditional class counts "
    "in one grouped pass (no shipmode column in the synthetic schema; "
    "linestatus plays its role)",
)
def q12_late_lines_by_status(spark, sf):
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_order_count_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: customer order-count distribution — left outer "
    "join preserving order-less customers (COUNT(col) skips their nulls), "
    "then a second aggregation over the first's output",
)
def q13_order_count_distribution(spark, sf):
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    c_orders = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS suppkey,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey),
    m AS (SELECT MAX(total_revenue) AS mx FROM rev)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = suppkey, m
    WHERE total_revenue = m.mx
    """,
    doc="TPC-H Q15 shape: top revenue supplier via max join-back (the view "
    "+ scalar MAX form). Equality on a decimal-summed double is safe: both "
    "engines produce the identical bit pattern",
)
def q15_top_supplier(spark, sf):
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = _t(spark, sf, "supplier")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    per_supp = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        F.sum(rev).cast("double").alias("total_revenue")
    )
    mx = per_supp.agg(F.max("total_revenue").alias("mx"))
    return (
        supp.join(per_supp, supp.s_suppkey == per_supp.suppkey)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16 shape: supplier variety per (brand, type, size) — "
    "distinct-agg after excluding a supplier set (NOT IN -> left_anti; "
    "null-safe because s_suppkey is a non-null key)",
)
def q16_supplier_variety(spark, sf):
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    )
    bad_supp = _t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_heavy_suppliers",
    oracle="""
    WITH pq AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(38,6))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey)
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM pq JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'red%' AND qty > 40)
    """,
    doc="TPC-H Q20 shape: suppliers who moved heavy volume of a part class "
    "in a year — nested IN-subquery decorrelated to agg + semi-join chain; "
    "decimal quantity sums make the > threshold exact",
)
def q20_heavy_suppliers(spark, sf):
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    part = _t(spark, sf, "part").filter(F.col("p_name").startswith("red"))
    supp = _t(spark, sf, "supplier")
    pq = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast(DEC6)).alias("qty")
    )
    heavy = (
        pq.join(F.broadcast(part), pq.l_partkey == part.p_partkey)
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
    )
    return supp.join(
        heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


@register(
    "q21_last_shipper",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
    doc="TPC-H Q21 shape: the supplier whose line shipped LAST in a "
    "multi-supplier finished order (reference's commitdate lateness "
    "recast onto shipdate) — EXISTS + NOT EXISTS double-correlated "
    "self-joins become left_semi + left_anti with non-equi conjuncts",
)
def q21_last_shipper(spark, sf):
    li = _t(spark, sf, "lineitem")
    supp = _t(spark, sf, "supplier")
    orders = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    ).alias("l2")
    l3 = li.select(
        F.col("l_orderkey").alias("k3"),
        F.col("l_suppkey").alias("s3"),
        F.col("l_shipdate").alias("d3"),
    ).alias("l3")
    waited = (
        l1.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey)
        .join(
            l2,
            (F.col("k2") == F.col("l1.l_orderkey"))
            & (F.col("s2") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("k3") == F.col("l1.l_orderkey"))
            & (F.col("s3") != F.col("l1.l_suppkey"))
            & (F.col("d3") > F.col("l1.l_shipdate")),
            "left_anti",
        )
    )
    return (
        waited.join(supp, F.col("l1.l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


@register(
    "fk_inclusion_audit",
    oracle="""
    WITH pairs AS (
      SELECT 'orders.o_custkey -> customer.c_custkey' AS fk,
             (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_child,
             (SELECT COUNT(DISTINCT o.o_custkey) FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey) AS n_matched
      UNION ALL
      SELECT 'lineitem.l_orderkey -> orders.o_orderkey',
             (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem),
             (SELECT COUNT(DISTINCT l.l_orderkey) FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey)
      UNION ALL
      SELECT 'supplier.s_nationkey -> nation.n_nationkey',
             (SELECT COUNT(DISTINCT s_nationkey) FROM supplier),
             (SELECT COUNT(DISTINCT s.s_nationkey) FROM supplier s
              JOIN nation n ON s.s_nationkey = n.n_nationkey))
    SELECT fk, CAST(n_child AS BIGINT) AS n_child,
           CAST(n_matched AS BIGINT) AS n_matched,
           CAST(n_matched AS DOUBLE) / CAST(n_child AS DOUBLE) AS inclusion
    FROM pairs
    """,
    doc="Referential-integrity profiling: inclusion coefficient "
    "|distinct(child ∩ parent)| / |distinct child| for the declared FK "
    "pairs — the fk-discovery/validation audit of dataset onboarding; "
    "each leg is a distinct-reduce then semi-join on already-distinct "
    "keys (no fact-scale row join), map-side combinable",
)
def fk_inclusion_audit(spark, sf):
    from ..catalog import load_table as _lt

    def leg(name, child_df, child_col, parent_df, parent_col):
        child = child_df.select(F.col(child_col).alias("k")).distinct()
        parent = parent_df.select(F.col(parent_col).alias("k")).distinct()
        stats = child.join(parent.withColumn("_m", F.lit(1)), "k", "left").agg(
            F.count(F.lit(1)).alias("n_child"),
            F.count("_m").alias("n_matched"),
        )
        return stats.select(
            F.lit(name).alias("fk"),
            "n_child",
            "n_matched",
            (
                F.col("n_matched").cast("double")
                / F.col("n_child").cast("double")
            ).alias("inclusion"),
        )

    orders = _lt(spark, sf, "orders")
    customer = _lt(spark, sf, "customer")
    lineitem = _lt(spark, sf, "lineitem")
    supplier = _lt(spark, sf, "supplier")
    nation = _lt(spark, sf, "nation")
    return (
        leg("orders.o_custkey -> customer.c_custkey", orders, "o_custkey",
            customer, "c_custkey")
        .unionByName(
            leg("lineitem.l_orderkey -> orders.o_orderkey", lineitem,
                "l_orderkey", orders, "o_orderkey"))
        .unionByName(
            leg("supplier.s_nationkey -> nation.n_nationkey", supplier,
                "s_nationkey", nation, "n_nationkey"))
    )
