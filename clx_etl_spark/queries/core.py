"""Core relational + SURVEY §2 operator queries over the driver testdata.

Naming maps to SURVEY §2 operator ids (w1 = gap lag scan, j2 = full-outer
series merge, a2 = completeness counts, ...). Every aggregate column is
aliased identically in the Spark plan and the oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import load_table
from ..functions import dt_str, snap_to_intervals
from ..operators.gaps import detect_gaps, gap_fill_plan
from ..operators.integrity import completeness_report
from ..operators.merge import full_outer_merge
from ..operators.sessions import sessionize
from ..operators.watermark import high_watermark, latest_per_key
from ..operators.classify import classify_first_match, threshold_by_prefix
from . import register

DEC6 = "decimal(38,6)"

# events.ts (ns) -> ms, shared oracle fragment
EV_MS = "(epoch_ns(ts) // 1000000)"


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# ---------------------------------------------------------------------------
# TPC-H-shaped analytics (the "delegated to Doris SQL" surface, SURVEY S13)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary; exact decimal aggregation of double money",
)
def q1_pricing_summary(spark, sf):
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "2001-09-01")
    dec = lambda c: c.cast(DEC6)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
        F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
        F.sum(dec(disc_price)).cast("double").alias("sum_disc_price"),
        F.sum(dec(charge)).cast("double").alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )


@register(
    "w3_islands_sessionize",
    oracle=f"""
    WITH ev AS (SELECT user_id, {EV_MS} AS ts_ms FROM events),
    flagged AS (SELECT user_id, ts_ms,
                       CASE WHEN LAG(ts_ms) OVER w IS NULL THEN 1
                            WHEN ts_ms - LAG(ts_ms) OVER w > 1800000 THEN 1
                            ELSE 0 END AS new_s
                FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)),
    sess AS (SELECT user_id, ts_ms,
                    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_ms
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
             FROM flagged)
    SELECT user_id, session_seq, MIN(ts_ms) AS session_start, MAX(ts_ms) AS session_end,
           COUNT(*) AS n_events, MAX(ts_ms) - MIN(ts_ms) AS span_ms
    FROM sess GROUP BY user_id, session_seq
    """,
    doc="W3 generalized: sessionization via gaps-and-islands, 30 min timeout",
)
def w3_islands_sessionize(spark, sf):
    ev = _t(spark, sf, "events").select("user_id", "ts_ms")
    return sessionize(ev, ["user_id"], ts_col="ts_ms", timeout_ms=1_800_000).select(
        "user_id", "session_seq", "session_start", "session_end", "n_events", "span_ms"
    )


@register(
    "w4_rank_variants",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
    doc="Ranking-window surface: ntile/percent_rank/cume_dist over a "
    "fully tie-broken per-user ordering (unique (value, event_id) sort "
    "makes the rank-derived doubles engine-identical)",
)
def w4_rank_variants(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.ntile(4).over(w).cast("int").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3: broadcast dim filter, join, top-k fully tie-broken",
)
def q3_shipping_priority(spark, sf):
    cust = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return (
        joined.groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    doc="TPC-H Q5: snowflake join with broadcast dims",
)
def q5_region_revenue(spark, sf):
    region = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf, "nation")
    cust = _t(spark, sf, "customer")
    sup = _t(spark, sf, "supplier")
    orders = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = _t(spark, sf, "lineitem")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(sup), (li.l_suppkey == sup.s_suppkey) & (cust.c_nationkey == sup.s_nationkey))
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return joined.groupBy("n_name").agg(F.sum(rev).cast("double").alias("revenue"))


@register(
    "q6_revenue_delta",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6: pure scan+filter+agg; pushdown showcase",
)
def q6_revenue_delta(spark, sf):
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(DEC6))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# joins / set ops (J1, J6, U2, U3)
# ---------------------------------------------------------------------------


@register(
    "j1_semi_active_customers",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_active
    FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="J1: active-dimension semi-join (reference flows/sync_klines.py:24-34)",
)
def j1_semi_active_customers(spark, sf):
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@register(
    "j6_anti_new_only",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_inactive
    FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="J6/U2: dedup anti-join (reference kalshi.py:157-164)",
)
def j6_anti_new_only(spark, sf):
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_inactive"))
    )


@register(
    "u3_union_by_name",
    oracle="""
    WITH a AS (SELECT o_orderpriority AS bucket, COUNT(*) AS n_orders
               FROM orders GROUP BY 1),
         b AS (SELECT l_returnflag AS bucket, COUNT(*) AS n_lines
               FROM lineitem GROUP BY 1)
    SELECT bucket, n_orders, n_lines FROM (
      SELECT bucket, n_orders, NULL::BIGINT AS n_lines FROM a
      UNION ALL BY NAME
      SELECT bucket, n_lines FROM b
    )
    """,
    doc="U3: unionByName with missing columns (reference macro union)",
)
def u3_union_by_name(spark, sf):
    a = (
        _t(spark, sf, "orders")
        .groupBy(F.col("o_orderpriority").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    b = (
        _t(spark, sf, "lineitem")
        .groupBy(F.col("l_returnflag").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    return a.unionByName(b, allowMissingColumns=True).select("bucket", "n_orders", "n_lines")


# ---------------------------------------------------------------------------
# time-series operators over events (A1/A2/A3, W1-W3, T5/T7/T8/T9, J2)
# ---------------------------------------------------------------------------


@register(
    "a1_watermark",
    oracle=f"""
    SELECT user_id, event_type, MAX({EV_MS}) AS watermark_ts
    FROM events GROUP BY user_id, event_type
    """,
    doc="A1: incremental MAX watermark per key (reference _base_.py:153-162)",
)
def a1_watermark(spark, sf):
    ev = _t(spark, sf, "events")
    return high_watermark(ev, ["user_id", "event_type"], ts_col="ts_ms")


@register(
    "a2_integrity_hourly",
    oracle=f"""
    WITH ev AS (SELECT event_type, {EV_MS} AS ts_ms FROM events),
    bounds AS (SELECT (MIN(ts_ms) // 3600000) * 3600000 AS lo,
                      (MAX(ts_ms) // 3600000) * 3600000 AS hi FROM ev),
    spine AS (SELECT DISTINCT event_type, unnest(generate_series(lo, hi, 3600000)) AS hour_ms
              FROM ev, bounds),
    counts AS (SELECT event_type, (ts_ms // 3600000) * 3600000 AS hour_ms,
                      COUNT(*) AS cnt
               FROM ev GROUP BY 1, 2)
    SELECT s.event_type, s.hour_ms, COALESCE(c.cnt, 0) AS cnt,
           CASE WHEN COALESCE(c.cnt, 0) = 0 THEN 'EMPTY'
                WHEN COALESCE(c.cnt, 0) < 2 THEN 'PARTIAL'
                ELSE 'OK' END AS status
    FROM spine s LEFT JOIN counts c
      ON s.event_type = c.event_type AND s.hour_ms = c.hour_ms
    """,
    doc="A2/F11: hour-spine completeness classes; one plan replaces the "
    "reference's days×symbols×24 COUNT loop (check_market_snapshot_integrity.py)",
)
def a2_integrity_hourly(spark, sf):
    ev = _t(spark, sf, "events")
    return completeness_report(ev, ["event_type"], ts_col="ts_ms", expected_per_hour=2).select(
        "event_type", "hour_ms", "cnt", "status"
    )


@register(
    "a3_latest_per_key",
    oracle=f"""
    SELECT user_id, ts_ms, event_type, value FROM (
      SELECT user_id, {EV_MS} AS ts_ms, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY {EV_MS} DESC) AS rn
      FROM events) WHERE rn = 1
    """,
    doc="A3: latest row per key (reference flows/sync_klines.py:46-55)",
)
def a3_latest_per_key(spark, sf):
    ev = _t(spark, sf, "events").select("user_id", "ts_ms", "event_type", "value")
    return latest_per_key(ev, ["user_id"], order_col="ts_ms")


@register(
    "w1_gap_detect",
    oracle=f"""
    WITH grid AS (SELECT DISTINCT user_id, ({EV_MS} // 3600000) * 3600000 AS hour_ms
                  FROM events),
    lagged AS (SELECT user_id, hour_ms,
                      LAG(hour_ms) OVER (PARTITION BY user_id ORDER BY hour_ms) AS prev_ts
               FROM grid)
    SELECT user_id, prev_ts + 3600000 AS gap_start, hour_ms - 3600000 AS gap_end
    FROM lagged WHERE prev_ts IS NOT NULL AND hour_ms - prev_ts > 3600000
    """,
    doc="W1: LAG gap scan on the hourly activity grid (reference _base_.py:178-195)",
)
def w1_gap_detect(spark, sf):
    ev = _t(spark, sf, "events")
    grid = ev.select(
        "user_id", ((F.col("ts_ms") / 3600000).cast("long") * 3600000).alias("hour_ms")
    ).distinct()
    return detect_gaps(grid, ["user_id"], ts_col="hour_ms", interval_ms=3_600_000)


@register(
    "w3_gap_fill_plan",
    oracle=f"""
    WITH grid AS (SELECT DISTINCT user_id, ({EV_MS} // 3600000) * 3600000 AS hour_ms
                  FROM events),
    bounds AS (SELECT (MIN(hour_ms) // 3600000) * 3600000 AS lo, MAX(hour_ms) AS hi FROM grid),
    lagged AS (SELECT user_id, hour_ms,
                      LAG(hour_ms) OVER (PARTITION BY user_id ORDER BY hour_ms) AS prev_ts
               FROM grid),
    interior AS (SELECT user_id, prev_ts + 3600000 AS gap_start, hour_ms - 3600000 AS gap_end
                 FROM lagged WHERE prev_ts IS NOT NULL AND hour_ms - prev_ts > 3600000),
    kb AS (SELECT user_id, MIN(hour_ms) AS first_ts, MAX(hour_ms) AS last_ts
           FROM grid GROUP BY user_id),
    head AS (SELECT user_id, lo AS gap_start, first_ts - 3600000 AS gap_end
             FROM kb, bounds WHERE first_ts > lo),
    tail AS (SELECT user_id, last_ts + 3600000 AS gap_start, hi AS gap_end
             FROM kb, bounds WHERE last_ts < hi),
    allgaps AS (SELECT * FROM interior UNION ALL SELECT * FROM head UNION ALL SELECT * FROM tail),
    flagged AS (SELECT user_id, gap_start, gap_end,
                       CASE WHEN LAG(gap_end) OVER w IS NULL THEN 1
                            WHEN gap_start - LAG(gap_end) OVER w > 86400000 THEN 1
                            ELSE 0 END AS brk
                FROM allgaps WINDOW w AS (PARTITION BY user_id ORDER BY gap_start)),
    grouped AS (SELECT user_id, gap_start, gap_end,
                       SUM(brk) OVER (PARTITION BY user_id ORDER BY gap_start
                                      ROWS UNBOUNDED PRECEDING) AS grp
                FROM flagged),
    merged AS (SELECT user_id, grp, MIN(gap_start) AS gap_start, MAX(gap_end) AS gap_end
               FROM grouped GROUP BY user_id, grp)
    SELECT user_id,
           gap_start + i * 86400000 AS gap_start,
           LEAST(gap_end, gap_start + (i + 1) * 86400000 - 1) AS gap_end
    FROM merged, UNNEST(generate_series(0, (gap_end - gap_start) // 86400000)) AS t(i)
    """,
    doc="W1+W2+W3: full refetch plan — interior gaps, boundary synthesis, "
    "islands merge, page-cap split (reference _base_.py:178-245); cap = 24 pages × 1h",
)
def w3_gap_fill_plan(spark, sf):
    ev = _t(spark, sf, "events")
    grid = ev.select(
        "user_id", ((F.col("ts_ms") / 3600000).cast("long") * 3600000).alias("hour_ms")
    ).distinct()
    lo, hi = grid.select(F.min("hour_ms"), F.max("hour_ms")).first()
    return gap_fill_plan(
        grid, ["user_id"], start_ms=lo, end_ms=hi, ts_col="hour_ms",
        interval_ms=3_600_000, page_limit=24,
    )


@register(
    "j2_full_outer_merge",
    oracle=f"""
    WITH ev AS (SELECT event_type, ({EV_MS} // 300000) * 300000 AS bucket_ms, value
                FROM events),
    click AS (SELECT bucket_ms, COUNT(*) AS click_n,
                     CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS click_sum
              FROM ev WHERE event_type = 'click' GROUP BY 1),
    purchase AS (SELECT bucket_ms, COUNT(*) AS purchase_n,
                        CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS purchase_sum
                 FROM ev WHERE event_type = 'purchase' GROUP BY 1),
    error AS (SELECT bucket_ms, COUNT(*) AS error_n,
                     CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS error_sum
              FROM ev WHERE event_type = 'error' GROUP BY 1)
    SELECT bucket_ms, click_n, click_sum, purchase_n, purchase_sum, error_n, error_sum
    FROM click FULL JOIN purchase USING (bucket_ms) FULL JOIN error USING (bucket_ms)
    """,
    doc="J2/U1/T5: 3-feed full-outer merge on aligned 5m buckets "
    "(reference binance/perp.py:168-184)",
)
def j2_full_outer_merge(spark, sf):
    ev = _t(spark, sf, "events").withColumn(
        "bucket_ms", ((F.col("ts_ms") / 300000).cast("long") * 300000)
    )
    feeds = {}
    for et in ("click", "purchase", "error"):
        feeds[et] = (
            ev.filter(F.col("event_type") == et)
            .groupBy("bucket_ms")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("value").cast(DEC6)).cast("double").alias("sum"),
            )
        )
    return full_outer_merge(feeds, ["bucket_ms"]).select(
        "bucket_ms",
        F.col("click_n"), F.col("click_sum"),
        F.col("purchase_n"), F.col("purchase_sum"),
        F.col("error_n"), F.col("error_sum"),
    )


@register(
    "t5_align_5m",
    oracle=f"""
    SELECT ({EV_MS} // 300000) * 300000 AS bucket_ms, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events WHERE event_type = 'purchase' GROUP BY 1
    """,
    doc="T5/T6: interval floor alignment (reference utils/__init__.py:20-29)",
)
def t5_align_5m(spark, sf):
    ev = _t(spark, sf, "events").filter(F.col("event_type") == "purchase")
    return (
        ev.groupBy(((F.col("ts_ms") / 300000).cast("long") * 300000).alias("bucket_ms"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC6)).cast("double").alias("sum_value"),
        )
    )


@register(
    "t7_dt_derive",
    oracle=f"""
    SELECT event_id, {EV_MS} AS ts_ms,
           strftime(make_timestamp(({EV_MS}) * 1000), '%Y-%m-%d %H:%M:%S') AS dt
    FROM events
    """,
    doc="T7: epoch-ms -> 'yyyy-MM-dd HH:mm:ss' (UTC standardized; the "
    "reference mixed local/UTC at _base_.py:310)",
)
def t7_dt_derive(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.select("event_id", "ts_ms", dt_str("ts_ms").alias("dt"))


@register(
    "t8_ratio_split",
    oracle="""
    SELECT event_id, value AS ratio,
           value / (1.0 + value) AS long_pct,
           1.0 - value / (1.0 + value) AS short_pct
    FROM events WHERE event_type = 'view' AND value IS NOT NULL AND value > 0
    """,
    doc="T8: long/short ratio r -> (r/(1+r), 1-r/(1+r)) (reference okx/perp.py:116-121)",
)
def t8_ratio_split(spark, sf):
    ev = _t(spark, sf, "events").filter(
        (F.col("event_type") == "view") & F.col("value").isNotNull() & (F.col("value") > 0)
    )
    long_pct = F.col("value") / (F.lit(1.0) + F.col("value"))
    return ev.select(
        "event_id",
        F.col("value").alias("ratio"),
        long_pct.alias("long_pct"),
        (F.lit(1.0) - long_pct).alias("short_pct"),
    )


@register(
    "t9_interval_snap",
    oracle=f"""
    WITH d AS (
      SELECT user_id, {EV_MS} AS ts_ms,
             ({EV_MS} - LAG({EV_MS}) OVER (PARTITION BY user_id ORDER BY {EV_MS}))
               // 60000 AS delta_min
      FROM events)
    SELECT user_id, ts_ms, delta_min,
           (SELECT c FROM (
              SELECT UNNEST([60,120,180,240,360,480,720]) AS c)
            ORDER BY ABS(delta_min - c), c LIMIT 1) AS snapped_min
    FROM d WHERE delta_min IS NOT NULL
    """,
    doc="T9/A7: snap raw gaps to nearest standard interval "
    "(reference okx/perp.py:192-205); ties -> smaller candidate",
)
def t9_interval_snap(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms")
    d = ev.select(
        "user_id",
        "ts_ms",
        F.floor((F.col("ts_ms") - F.lag("ts_ms").over(w)) / 60000).cast("long").alias("delta_min"),
    ).filter(F.col("delta_min").isNotNull())
    return d.withColumn("snapped_min", snap_to_intervals(F.col("delta_min")).cast("int"))


@register(
    "t10_prob_normalize",
    oracle="""
    WITH m AS (SELECT event_id,
                      CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
               FROM events)
    SELECT event_id,
           CASE WHEN (k / 100.0) + ((100 - k) / 100.0) > 0
                THEN (k / 100.0) / ((k / 100.0) + ((100 - k) / 100.0)) END AS yes_prob,
           CASE WHEN (k / 100.0) + ((100 - k) / 100.0) > 0
                THEN ((100 - k) / 100.0) / ((k / 100.0) + ((100 - k) / 100.0)) END AS no_prob
    FROM m
    """,
    doc="T10: cent-price probability renormalization with null guards "
    "(reference kalshi.py:77-98); JSON field extraction from props",
)
def t10_prob_normalize(spark, sf):
    ev = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    y = k.cast("double") / 100.0
    n = (F.lit(100) - k).cast("double") / 100.0
    total = y + n
    ok = total > 0
    return ev.select(
        "event_id",
        F.when(ok, y / total).alias("yes_prob"),
        F.when(ok, n / total).alias("no_prob"),
    )


@register(
    "t11_entity_classify",
    oracle="""
    SELECT COALESCE(
             CASE WHEN contains(lower(text), 'merge') THEN 'merger'
                  WHEN contains(lower(text), 'join')  THEN 'joiner'
                  WHEN contains(lower(text), 'scan')  THEN 'scanner'
                  WHEN contains(lower(text), 'stream') THEN 'streamer'
             END, 'unmatched') AS label,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
    doc="T11: first-match keyword classification (reference oklink/fetcher.py:14-43)",
)
def t11_entity_classify(spark, sf):
    docs = _t(spark, sf, "documents")
    rules = [("merger", "merge"), ("joiner", "join"), ("scanner", "scan"), ("streamer", "stream")]
    label = F.coalesce(classify_first_match(F.col("text"), rules), F.lit("unmatched"))
    return docs.groupBy(label.alias("label")).agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "t14_threshold_by_prefix",
    oracle="""
    SELECT o_orderpriority,
           CASE WHEN starts_with(o_orderpriority, '1') THEN 50000
                WHEN starts_with(o_orderpriority, '2') THEN 100000
                ELSE 150000 END AS threshold,
           COUNT(*) FILTER (WHERE o_totalprice > CASE
                WHEN starts_with(o_orderpriority, '1') THEN 50000
                WHEN starts_with(o_orderpriority, '2') THEN 100000
                ELSE 150000 END) AS n_above
    FROM orders GROUP BY 1, 2
    """,
    doc="T14/F5: per-series threshold by key prefix (reference kalshi.py:172-178)",
)
def t14_threshold_by_prefix(spark, sf):
    orders = _t(spark, sf, "orders")
    thr = threshold_by_prefix(F.col("o_orderpriority"), {"1": 50000, "2": 100000}, default=150000)
    return (
        orders.withColumn("threshold", thr)
        .groupBy("o_orderpriority", "threshold")
        .agg(
            F.sum((F.col("o_totalprice") > F.col("threshold")).cast("long")).alias("n_above")
        )
    )


@register(
    "t15_explode_dims",
    oracle="""
    SELECT i - 1 AS dim,
           COUNT(*) AS n,
           MIN(CAST(embedding[i] AS DOUBLE)) AS dim_min,
           MAX(CAST(embedding[i] AS DOUBLE)) AS dim_max
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)
    GROUP BY 1
    """,
    doc="T15: columnar arrays -> rows via posexplode (reference mexc/perp.py:123-132); "
    "min/max are order-independent, so cross-row float aggregation stays deterministic",
)
def t15_explode_dims(spark, sf):
    emb = _t(spark, sf, "embeddings")
    return (
        emb.select(F.posexplode("embedding").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.col("x").cast("double")).alias("dim_min"),
            F.max(F.col("x").cast("double")).alias("dim_max"),
        )
    )
