"""Engine analytic surface beyond the reference's own operators — SURVEY
§2.6/§2.5 declare these as capabilities we expose because Spark SQL gives
them natively (rollup/cube, frame windows, top-k, decorrelated min-per-group)
or because the domain naturally needs them (as-of join, range join, sliding
windows — the reference approximates as-of with 5-minute bucket alignment,
binance/perp.py:168-184).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import load_table
from ..operators.merge import asof_join
from ..operators.range_join import bin_range_join
from ..operators.watermark import latest_per_key
from . import register

DEC6 = "decimal(38,6)"
EV_MS = "(epoch_ns(ts) // 1000000)"


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


@register(
    "rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items,
           GROUPING(l_returnflag, l_linestatus) AS gid
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP with grouping_id: hierarchy subtotals in one pass (Spark "
    "plans a single Expand + hash-agg, not N scans)",
)
def rollup_revenue(spark, sf):
    li = _t(spark, sf, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
        F.grouping_id().alias("gid"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) WHERE rn <= 3
    """,
    doc="Top-k per group via ranked window, fully tie-broken; Spark pushes "
    "the rn <= 3 limit into the window sort (WindowGroupLimit)",
)
def topk_per_group(spark, sf):
    cust = _t(spark, sf, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
    )


@register(
    "w4_moving_frame",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS mov_sum,
           COUNT(*) OVER w AS n_window
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY {EV_MS}, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
    doc="Frame-spec moving aggregate (rowsBetween), decimal-exact so the "
    "sliding accumulation order can't perturb float results",
)
def w4_moving_frame(spark, sf):
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(-3, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC6)).over(w).cast("double").alias("mov_sum"),
        F.count(F.lit(1)).over(w).alias("n_window"),
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH pc AS (SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
                FROM lineitem GROUP BY l_partkey, l_suppkey),
         m AS (SELECT l_partkey, MIN(unit_cost) AS min_cost FROM pc GROUP BY l_partkey)
    SELECT pc.l_partkey AS partkey,
           MIN(pc.l_suppkey) AS best_suppkey,
           MIN(pc.unit_cost) AS min_cost
    FROM pc JOIN m ON pc.l_partkey = m.l_partkey AND pc.unit_cost = m.min_cost
    GROUP BY pc.l_partkey
    """,
    doc="TPC-H Q2 shape: min-per-group + join-back (the decorrelated form "
    "of a correlated scalar subquery); ties -> smallest suppkey",
)
def q2_min_cost_supplier(spark, sf):
    li = _t(spark, sf, "lineitem")
    pc = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    m = pc.groupBy("partkey").agg(F.min("unit_cost").alias("min_cost"))
    return (
        pc.join(m, on=[pc.partkey == m.partkey, pc.unit_cost == m.min_cost])
        .drop(m.partkey)
        .groupBy("partkey")
        .agg(
            F.min("suppkey").alias("best_suppkey"),
            F.min("unit_cost").alias("min_cost"),
        )
    )


@register(
    "q19_disjunctive_pushdown",
    oracle="""
    SELECT COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 20 AND 35 AND l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape: OR-of-ANDs join predicate; Catalyst extracts the "
    "common p_partkey equi-key and pushes per-side conjuncts into the scans",
)
def q19_disjunctive_pushdown(spark, sf):
    li = _t(spark, sf, "lineitem")
    part = _t(spark, sf, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    arm = lambda brand, s_lo, s_hi, q_lo, q_hi: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s_lo, s_hi)
        & F.col("l_quantity").between(q_lo, q_hi)
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return (
        j.filter(
            arm("Brand#12", 1, 15, 1, 11)
            | arm("Brand#23", 10, 25, 10, 20)
            | arm("Brand#3", 20, 35, 20, 30)
        )
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(rev).cast("double").alias("revenue"),
        )
    )


@register(
    "q18_group_having",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderdate, o_totalprice
    HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 150
    """,
    doc="TPC-H Q18 shape: join + group + HAVING threshold (large-order "
    "detection); partial aggregation runs map-side before the shuffle",
)
def q18_group_having(spark, sf):
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(DEC6)).alias("_q"))
        .filter(F.col("_q") > 150)
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_q").cast("double").alias("total_qty"),
        )
    )


@register(
    "asof_last_purchase",
    oracle=f"""
    WITH purch AS (
      SELECT user_id, ms, value FROM (
        SELECT user_id, {EV_MS} AS ms, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, {EV_MS}
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'purchase') WHERE rn = 1),
    clicks AS (SELECT event_id, user_id, {EV_MS} AS ms
               FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, c.ms, p.value AS last_purchase_value
    FROM clicks c ASOF LEFT JOIN purch p
      ON c.user_id = p.user_id AND c.ms >= p.ms
    """,
    doc="As-of join: each click joined to the latest purchase at-or-before "
    "it per user. Spark has no native as-of; implemented as union + "
    "last(ignorenulls) carry-forward window — one shuffle, both sides "
    "arbitrarily large (operators/asof.py). Oracle: DuckDB ASOF LEFT JOIN",
)
def asof_last_purchase(spark, sf):
    ev = _t(spark, sf, "events")
    purch = latest_per_key(
        ev.filter(F.col("event_type") == "purchase").select(
            "user_id", F.col("ts_ms").alias("ms"), "value", "event_id"
        ),
        ["user_id", "ms"],
        order_col="event_id",
    ).select("user_id", "ms", "value")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts_ms").alias("ms")
    )
    return asof_join(
        clicks, purch, keys=["user_id"], left_ts="ms", right_ts="ms", right_cols=["value"]
    ).select(
        "event_id", "user_id", "ms", F.col("value").alias("last_purchase_value")
    )


@register(
    "range_join_attribution",
    oracle=f"""
    WITH iv AS (SELECT event_id AS interval_id, user_id,
                       {EV_MS} AS start_ms, {EV_MS} + 3600000 AS end_ms
                FROM events WHERE event_type = 'purchase'),
         pt AS (SELECT event_id, user_id, {EV_MS} AS ms
                FROM events WHERE event_type = 'click')
    SELECT iv.interval_id, COUNT(pt.event_id) AS n_clicks
    FROM iv LEFT JOIN pt
      ON pt.user_id = iv.user_id AND pt.ms >= iv.start_ms AND pt.ms < iv.end_ms
    GROUP BY iv.interval_id
    """,
    doc="Range join (points-in-interval): clicks within 1h after each "
    "purchase. Implemented as a BINNED equi-join on (key, time-bucket) + "
    "residual predicate (operators/range_join.py) — a shuffled hash join "
    "AQE can split, never a nested loop",
)
def range_join_attribution(spark, sf):
    ev = _t(spark, sf, "events")
    iv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("interval_id"),
        "user_id",
        F.col("ts_ms").alias("start_ms"),
        (F.col("ts_ms") + 3_600_000).alias("end_ms"),
    )
    pt = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts_ms").alias("ms")
    )
    joined = bin_range_join(
        pt, iv, keys=["user_id"], point_ts="ms", bin_ms=3_600_000, how="left_outer"
    )
    return joined.groupBy("interval_id").agg(
        F.count("event_id").alias("n_clicks")
    )


@register(
    "w4_sliding_window_counts",
    oracle=f"""
    SELECT ({EV_MS} // 3600000 - k) * 3600000 AS win_start_ms,
           COUNT(*) AS n_events
    FROM events, UNNEST([0, 1]) AS t(k)
    GROUP BY 1
    """,
    doc="Sliding window (2h size, 1h slide) event counts — the streaming "
    "windowed-agg surface (SURVEY §2.11) in its batch-equivalent form; "
    "each event expands to exactly size/slide windows",
)
def w4_sliding_window_counts(spark, sf):
    ev = _t(spark, sf, "events")
    return (
        ev.groupBy(F.window("event_time", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_millis(F.col("w.start")).alias("win_start_ms"), "n_events"
        )
    )
