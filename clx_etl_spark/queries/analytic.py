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
    "w4_locf_fill",
    oracle=f"""
    SELECT event_id, user_id,
           CASE WHEN event_type <> 'error' THEN value END AS value_masked,
           last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY {EV_MS}, event_id
                   ROWS UNBOUNDED PRECEDING) AS value_filled
    FROM events
    """,
    doc="Last-observation-carried-forward fill: error readings masked to "
    "NULL, then last(ignorenulls) carries the previous good value per "
    "user — the standard sensor/market-data repair, one window, no join "
    "(same carry-forward machinery as the as-of join)",
)
def w4_locf_fill(spark, sf):
    ev = _t(spark, sf, "events")
    masked = F.when(F.col("event_type") != "error", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        masked.alias("value_masked"),
        F.last(masked, ignorenulls=True).over(w).alias("value_filled"),
    )


@register(
    "quality_percentile_gate",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(list_distinct(list_filter(string_split_regex(text, '\\s+'),
                    x -> x <> ''))) AS DOUBLE)
               / CAST(len(list_filter(string_split_regex(text, '\\s+'),
                    x -> x <> '')) AS DOUBLE) AS uniq_ratio
      FROM documents),
    ranked AS (SELECT doc_id, source, uniq_ratio,
                      PERCENT_RANK() OVER (PARTITION BY source
                          ORDER BY uniq_ratio, doc_id) AS pr
               FROM scored)
    SELECT doc_id, source, uniq_ratio FROM ranked WHERE pr >= 0.25
    """,
    doc="Relative quality gate: keep docs above their SOURCE's 25th "
    "percentile of token uniqueness — per-domain calibration instead of a "
    "global threshold (a global cutoff over-prunes clean domains and "
    "under-prunes spammy ones). One window per source partition, "
    "fully tie-broken so percent_rank doubles are engine-identical",
)
def quality_percentile_gate(spark, sf):
    from ..functions import tokens as _tokens

    docs = _t(spark, sf, "documents")
    toks = _tokens("text")
    uniq = (
        F.size(F.array_distinct(toks)).cast("double")
        / F.size(toks).cast("double")
    )
    w = Window.partitionBy("source").orderBy("uniq_ratio", "doc_id")
    return (
        docs.select("doc_id", "source", uniq.alias("uniq_ratio"))
        .withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.25)
        .select("doc_id", "source", "uniq_ratio")
    )


@register(
    "unpivot_melt",
    oracle="""
    SELECT p_partkey, metric, val FROM (
      SELECT p_partkey, CAST(p_retailprice AS DOUBLE) AS p_retailprice,
             CAST(p_size AS DOUBLE) AS p_size
      FROM part) UNPIVOT (val FOR metric IN (p_retailprice, p_size))
    """,
    doc="UNPIVOT/melt: wide metrics to long (metric, value) rows — the "
    "inverse of pivot_event_values; narrow transform, no shuffle",
)
def unpivot_melt(spark, sf):
    part = _t(spark, sf, "part")
    return part.select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
        F.col("p_size").cast("double").alias("p_size"),
    ).unpivot(["p_partkey"], ["p_retailprice", "p_size"], "metric", "val")


@register(
    "mode_per_group",
    oracle="""
    SELECT p_brand, p_type AS mode_type, n FROM (
      SELECT p_brand, p_type, CAST(COUNT(*) AS BIGINT) AS n,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY COUNT(*) DESC, p_type) AS rn
      FROM part GROUP BY p_brand, p_type) WHERE rn = 1
    """,
    doc="Per-group mode (most frequent type per brand, ties to smallest "
    "type): keyed count with map-side combine, then a tiny per-group "
    "window over the already-aggregated rows",
)
def mode_per_group(spark, sf):
    part = _t(spark, sf, "part")
    counts = part.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("p_brand").orderBy(F.desc("n"), "p_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_brand", F.col("p_type").alias("mode_type"), "n")
    )


@register(
    "fuzzy_name_match",
    oracle="""
    WITH blocked AS (
      SELECT c_name, substr(c_name, 1, length(c_name) - 2) AS blk
      FROM customer)
    SELECT a.c_name AS name_a, b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS lev
    FROM blocked a JOIN blocked b
      ON a.blk = b.blk AND a.c_name < b.c_name
    WHERE levenshtein(a.c_name, b.c_name) <= 1
    """,
    doc="Entity-resolution fuzzy match with BLOCKING (the scale "
    "requirement: candidate pairs come from an equi-join on a block key, "
    "never an n^2 cross join); edit-distance verify on the blocked pairs "
    "only. Same shape as LSH-candidates -> exact-verify in dedup",
)
def fuzzy_name_match(spark, sf):
    cust = _t(spark, sf, "customer")
    blocked = cust.select(
        "c_name",
        F.expr("substr(c_name, 1, length(c_name) - 2)").alias("blk"),
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.c_name") < F.col("b.c_name")))
        .select(
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
            F.levenshtein("a.c_name", "b.c_name").cast("int").alias("lev"),
        )
        .filter(F.col("lev") <= 1)
    )


@register(
    "scd2_value_runs",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_id, event_type, {EV_MS} AS ts_ms FROM events),
    flagged AS (SELECT *,
                       CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                            THEN 1 ELSE 0 END AS chg
                FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
    runs AS (SELECT *,
                    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
             FROM flagged)
    SELECT user_id, run_id, event_type,
           MIN(ts_ms) AS valid_from, MAX(ts_ms) AS valid_to,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM runs GROUP BY user_id, run_id, event_type
    """,
    doc="SCD2 interval build / value-run compression: consecutive equal "
    "values collapse into validity intervals via LAG change detection + "
    "cumulative run id — the dimension-history builder, same "
    "gaps-and-islands machinery as sessionize but value-driven",
)
def scd2_value_runs(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    chg = F.when(
        ~F.lag("event_type").over(w).eqNullSafe(F.col("event_type")), 1
    ).otherwise(0)
    runs = ev.select(
        "user_id", "event_id", "event_type", "ts_ms", chg.alias("chg")
    ).withColumn(
        "run_id",
        F.sum("chg").over(
            Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    )
    return runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ts_ms").alias("valid_from"),
        F.max("ts_ms").alias("valid_to"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
    )


@register(
    "ema_per_user",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_id, value, {EV_MS} AS ts_ms FROM events),
    ordered AS (SELECT user_id,
                       list(value ORDER BY ts_ms, event_id) AS vs
                FROM ev GROUP BY user_id)
    SELECT user_id,
           CAST(len(vs) AS BIGINT) AS n_ticks,
           list_reduce(vs, (acc, x) -> 0.2 * x + 0.8 * acc) AS ema
    FROM ordered
    """,
    doc="Batch twin of streaming_ema: per-user EWMA as an ordered "
    "CHUNKED two-level fold — events index into fixed 4096-row blocks "
    "(row_number window: a spillable SORT, not a giant in-memory array), "
    "each block aggregates to a bounded array, and the final fold walks "
    "blocks then elements in the identical left-fold order, so the float "
    "recursion stays bit-identical to the oracle's list_reduce. Every "
    "SHUFFLED row is <= 4096 values — a whale user costs sort spill, "
    "not a multi-GB aggregation buffer (VERDICT r04). The single "
    "final-fold row is still O(user history); a guard fails loudly past "
    "the representable bound — unbounded keys belong on streaming_ema's "
    "O(1)-state recursion",
)
def ema_per_user(spark, sf):
    B = 4096  # block length: bounds every shuffled/aggregated row
    MAX_BLOCKS = 65536  # ~268M events/user ~= the 2 GB row ceiling
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    indexed = ev.select("user_id", "ts_ms", "event_id", "value").withColumn(
        "_i", F.row_number().over(w).cast("long") - 1
    )
    blocks = indexed.groupBy(
        "user_id", (F.col("_i") / B).cast("long").alias("_blk")
    ).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct((F.col("_i") % B).alias("j"), "value"))
            ),
            lambda s: s.value,
        ).alias("vals")
    )
    per_user = blocks.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("_blk", "vals"))).alias("blocks")
    )
    guarded = per_user.withColumn(
        "blocks",
        F.when(F.size("blocks") <= MAX_BLOCKS, F.col("blocks")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("ema_per_user: user "),
                    F.col("user_id").cast("string"),
                    F.lit(
                        f" exceeds {MAX_BLOCKS} blocks — use streaming_ema "
                        "for unbounded per-key history"
                    ),
                )
            )
        ),
    )
    # blocks-then-elements fold, seeding from the first element via a
    # (first, acc) state struct: the exact element order of the flat fold
    step = lambda s, x: F.struct(  # noqa: E731
        F.lit(False).alias("first"),
        F.when(s["first"], x)
        .otherwise(F.lit(0.2) * x + F.lit(0.8) * s["acc"])
        .alias("acc"),
    )
    ema = F.aggregate(
        F.col("blocks"),
        F.struct(F.lit(True).alias("first"), F.lit(0.0).alias("acc")),
        lambda st, blk: F.aggregate(blk["vals"], st, step),
    )["acc"]
    n_ticks = F.aggregate(
        F.col("blocks"),
        F.lit(0).cast("long"),
        lambda acc, blk: acc + F.size(blk["vals"]).cast("long"),
    )
    return guarded.select(
        "user_id", n_ticks.alias("n_ticks"), ema.alias("ema")
    )


@register(
    "tz_local_daily",
    oracle=f"""
    SELECT CAST(timezone('Asia/Tokyo', to_timestamp({EV_MS} / 1000)) AS DATE) AS local_date,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY local_date
    """,
    doc="Daily rollup in exchange-LOCAL time (Asia/Tokyo): the day-bucket "
    "semantics venue reports use — the reference mixed local/UTC "
    "(_base_.py:310); here the tz conversion is explicit per query and "
    "storage stays UTC. Decimal-exact sums",
)
def tz_local_daily(spark, sf):
    ev = _t(spark, sf, "events")
    local_date = F.to_date(
        F.from_utc_timestamp(F.timestamp_millis(F.col("ts_ms")), "Asia/Tokyo")
    )
    return ev.groupBy(local_date.alias("local_date")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast(DEC6)).cast("double").alias("total_value"),
    )


@register(
    "ratio_to_report",
    oracle="""
    WITH n AS (SELECT n_name, n_regionkey,
                      SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS bal_d
               FROM customer JOIN nation ON c_nationkey = n_nationkey
               GROUP BY n_name, n_regionkey)
    SELECT n_name, CAST(bal_d AS DOUBLE) AS bal,
           CAST(bal_d AS DOUBLE) / CAST(SUM(bal_d) OVER () AS DOUBLE) AS share_global,
           CAST(bal_d AS DOUBLE) / CAST(SUM(bal_d) OVER (PARTITION BY n_regionkey) AS DOUBLE) AS share_region
    FROM n
    """,
    doc="Ratio-to-report windows: each nation's balance share of the "
    "global and regional totals — unpartitioned + partitioned window sums "
    "over the ALREADY-aggregated rows (25 rows, not the fact table), so "
    "the single-partition window is trivially cheap; sums stay DECIMAL "
    "through the windows (order-independent exact) and only the final "
    "division is double, so shares are engine-identical",
)
def ratio_to_report(spark, sf):
    cust = _t(spark, sf, "customer")
    nation = _t(spark, sf, "nation")
    n = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", "n_regionkey")
        .agg(F.sum(F.col("c_acctbal").cast(DEC6)).alias("bal_d"))
    )
    bal = F.col("bal_d").cast("double")
    tot_g = F.sum("bal_d").over(Window.partitionBy()).cast("double")
    tot_r = F.sum("bal_d").over(Window.partitionBy("n_regionkey")).cast("double")
    return n.select(
        "n_name",
        bal.alias("bal"),
        (bal / tot_g).alias("share_global"),
        (bal / tot_r).alias("share_region"),
    )


@register(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_orderkey' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
    """,
    doc="Dataset profiling (operators/profile.py): per-column null and "
    "distinct counts in ONE scan — the pre-trust audit for a new feed "
    "(null spikes = broken field map; distinct collapse = broken key). "
    "approx=True swaps exact distincts for HLL at fact scale",
)
def profile_orders_columns(spark, sf):
    from ..operators.profile import profile_columns

    orders = _t(spark, sf, "orders")
    return profile_columns(orders, ["o_orderkey", "o_custkey", "o_orderstatus"])


def _dedup_best_oracle() -> str:
    from .corpus import DEDUP_CLUSTERS_ORACLE, TOKS

    return f"""
    WITH comp AS (SELECT * FROM ({DEDUP_CLUSTERS_ORACLE})),
    q AS (SELECT doc_id,
                 CAST(len(list_distinct({TOKS})) AS DOUBLE)
                   / CAST(len({TOKS}) AS DOUBLE) AS uniq_ratio
          FROM documents),
    ranked AS (SELECT c.component, c.doc_id, q.uniq_ratio,
                      ROW_NUMBER() OVER (PARTITION BY c.component
                          ORDER BY q.uniq_ratio DESC, c.doc_id) AS rn,
                      CAST(COUNT(*) OVER (PARTITION BY c.component) AS BIGINT) AS n_members
               FROM comp c JOIN q ON q.doc_id = c.doc_id)
    SELECT component, doc_id AS best_doc, uniq_ratio, n_members
    FROM ranked WHERE rn = 1
    """


@register(
    "dedup_best_representative",
    oracle=None,  # assigned below (needs corpus module fragments)
    doc="Completes the dedup story: WHICH copy to keep. Per duplicate "
    "cluster (connected components over MinHash-LSH pairs), select the "
    "highest-quality member (max token-uniqueness, ties to smallest id) "
    "instead of the arbitrary min-id canonical — a tiny ranked window "
    "over the already-small cluster assignment, not the corpus",
)
def dedup_best_representative(spark, sf):
    from ..functions import tokens as _tokens
    from ..operators import dedup as D
    from .corpus import BANDS, NUM_PERM

    docs = _t(spark, sf, "documents")
    pairs = D.minhash_near_duplicates(
        docs, k=3, num_perm=NUM_PERM, bands=BANDS, threshold=0.5
    )
    comp = D.connected_components(pairs)
    toks = _tokens("text")
    q = docs.select(
        "doc_id",
        (F.size(F.array_distinct(toks)).cast("double")
         / F.size(toks).cast("double")).alias("uniq_ratio"),
    )
    j = comp.join(q, "doc_id")
    w = Window.partitionBy("component").orderBy(F.desc("uniq_ratio"), "doc_id")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("component")).cast("long"),
        )
        .filter(F.col("rn") == 1)
        .select("component", F.col("doc_id").alias("best_doc"), "uniq_ratio", "n_members")
    )


@register(
    "densify_hourly_grid",
    oracle=f"""
    WITH ev AS (SELECT user_id, ({EV_MS} // 3600000) * 3600000 AS hour_ms FROM events),
    bounds AS (SELECT MIN(hour_ms) AS lo, MAX(hour_ms) AS hi FROM ev),
    spine AS (SELECT u.user_id, CAST(h AS BIGINT) AS hour_ms
              FROM (SELECT DISTINCT user_id FROM ev) u,
                   bounds, UNNEST(generate_series(bounds.lo, bounds.hi, 3600000)) AS t(h)),
    counts AS (SELECT user_id, hour_ms, CAST(COUNT(*) AS BIGINT) AS n
               FROM ev GROUP BY user_id, hour_ms)
    SELECT s.user_id, s.hour_ms, COALESCE(c.n, 0) AS n_events
    FROM spine s LEFT JOIN counts c
      ON c.user_id = s.user_id AND c.hour_ms = s.hour_ms
    """,
    doc="Calendar densification: every (user, hour) cell of the activity "
    "range INCLUDING zero hours — the dense-grid reporting shape. Spine = "
    "distinct users x an hour sequence exploded from one scalar bounds "
    "row (broadcast); zero-fill via left join. Spine size is users x "
    "hours, never fact-table size",
)
def densify_hourly_grid(spark, sf):
    ev = _t(spark, sf, "events").select(
        "user_id",
        ((F.col("ts_ms") / 3_600_000).cast("long") * 3_600_000).alias("hour_ms"),
    )
    bounds = ev.agg(
        F.min("hour_ms").alias("lo"), F.max("hour_ms").alias("hi")
    )
    users = ev.select("user_id").distinct()
    spine = users.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        F.explode(F.sequence("lo", "hi", F.lit(3_600_000))).alias("hour_ms"),
    )
    counts = ev.groupBy("user_id", "hour_ms").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    return spine.join(counts, ["user_id", "hour_ms"], "left").select(
        "user_id", "hour_ms", F.coalesce(F.col("n"), F.lit(0).cast("long")).alias("n_events")
    )


@register(
    "u4_intersect_repeat_buyers",
    oracle="""
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    """,
    doc="INTERSECT set op (completes U1-U4: union / except / unionByName "
    "/ intersect): customers active in both years — plans as a left-semi "
    "over distinct sides, one shuffle each",
)
def u4_intersect_repeat_buyers(spark, sf):
    orders = _t(spark, sf, "orders")
    year = F.year("o_orderdate")
    a = orders.filter(year == 1994).select("o_custkey")
    b = orders.filter(year == 1995).select("o_custkey")
    return a.intersect(b)


@register(
    "session_revenue",
    oracle=f"""
    WITH ev AS (SELECT user_id, event_id, value, {EV_MS} AS ts_ms FROM events),
    flagged AS (SELECT *,
                       CASE WHEN LAG(ts_ms) OVER w IS NULL THEN 1
                            WHEN ts_ms - LAG(ts_ms) OVER w > 1800000 THEN 1
                            ELSE 0 END AS new_s
                FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
    sess AS (SELECT *,
                    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
             FROM flagged)
    SELECT user_id, session_seq,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS session_value,
           MAX(ts_ms) - MIN(ts_ms) AS span_ms
    FROM sess GROUP BY user_id, session_seq
    """,
    doc="Sessionized metrics: per-event session assignment (gaps-and-"
    "islands, 30 min timeout) then per-session event count, decimal-exact "
    "value sum, and span — the product-analytics companion to "
    "w3_islands_sessionize which only counts",
)
def session_revenue(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    new_s = F.when(
        F.lag("ts_ms").over(w).isNull()
        | (F.col("ts_ms") - F.lag("ts_ms").over(w) > 1_800_000),
        1,
    ).otherwise(0)
    sess = ev.select("user_id", "event_id", "value", "ts_ms").withColumn(
        "session_seq",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.col("value").cast(DEC6)).cast("double").alias("session_value"),
        (F.max("ts_ms") - F.min("ts_ms")).alias("span_ms"),
    )


@register(
    "dod_revenue_change",
    oracle="""
    WITH d AS (SELECT o_orderdate,
                      SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS rev_d
               FROM orders GROUP BY o_orderdate)
    SELECT o_orderdate, CAST(rev_d AS DOUBLE) AS revenue,
           CAST(LAG(rev_d) OVER (ORDER BY o_orderdate) AS DOUBLE) AS prev_revenue,
           CASE WHEN LAG(rev_d) OVER (ORDER BY o_orderdate) IS NOT NULL
                THEN (CAST(rev_d AS DOUBLE)
                      - CAST(LAG(rev_d) OVER (ORDER BY o_orderdate) AS DOUBLE))
                     / CAST(LAG(rev_d) OVER (ORDER BY o_orderdate) AS DOUBLE)
           END AS dod_change
    FROM d
    """,
    doc="Day-over-day change: daily decimal-exact revenue, LAG window on "
    "the tiny aggregated series (dates, not orders), doubles only in the "
    "final ratio — the unpartitioned window runs over ~2500 rows",
)
def dod_revenue_change(spark, sf):
    orders = _t(spark, sf, "orders")
    d = orders.groupBy("o_orderdate").agg(
        F.sum(F.col("o_totalprice").cast(DEC6)).alias("rev_d")
    )
    w = Window.orderBy("o_orderdate")
    prev = F.lag("rev_d").over(w)
    rev = F.col("rev_d").cast("double")
    prevd = prev.cast("double")
    return d.select(
        "o_orderdate",
        rev.alias("revenue"),
        prevd.alias("prev_revenue"),
        F.when(prev.isNotNull(), (rev - prevd) / prevd).alias("dod_change"),
    )


@register(
    "u5_except_all_multiset",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    doc="EXCEPT ALL (multiset semantics): each open-order occurrence of a "
    "customer cancels against one finished-order occurrence — bag "
    "difference, not set difference; completes U2's set variant",
)
def u5_except_all_multiset(spark, sf):
    orders = _t(spark, sf, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return a.exceptAll(b)


# late-bind the oracle: it splices CTE fragments from queries.corpus,
# which load_all always imports before this module
from . import REGISTRY as _REGISTRY  # noqa: E402

_REGISTRY["dedup_best_representative"].oracle = _dedup_best_oracle()


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


@register(
    "q4_exists_semijoin",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS correlated subquery -> left-semi join with "
    "a non-equi conjunct (orders with any late-shipped line)",
)
def q4_exists_semijoin(spark, sf):
    orders = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    late = (li.l_orderkey == orders.o_orderkey) & (
        li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        orders.join(li, on=late, how="left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q7_nation_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation cn ON cn.n_nationkey = c_nationkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
    WHERE cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name <> sn.n_name
    GROUP BY cust_nation, supp_nation
    """,
    doc="TPC-H Q7 shape: cross-nation trade matrix — the same dimension "
    "broadcast twice under different aliases, fact joins stay shuffled",
)
def q7_nation_volume(spark, sf):
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    supp = _t(spark, sf, "supplier")
    nation = _t(spark, sf, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("snk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "q10_top_returns",
    oracle="""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-revenue ranking, tie-broken top-20",
)
def q10_top_returns(spark, sf):
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q14_promo_ratio",
    oracle="""
    SELECT CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
                    ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue,
           CAST(SUM(CASE WHEN p_type = 'PROMO'
                    THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
                    ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
             AS promo_ratio
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-02-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional aggregation ratio; both legs "
    "accumulated in exact decimal, ratio taken once in double",
)
def q14_promo_ratio(spark, sf):
    li = _t(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-02-01")
    )
    part = _t(spark, sf, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast(DEC6))
    agg = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(rev).cast("double").alias("total_revenue"),
        )
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.col("promo_revenue") / F.col("total_revenue")).alias("promo_ratio"),
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    WITH thr AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0)
    SELECT c.c_custkey, c.c_acctbal
    FROM customer c, thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey)
    """,
    doc="TPC-H Q22 shape: scalar-subquery threshold (decimal-exact mean) "
    "broadcast to every row + NOT EXISTS anti-join (customers with money "
    "and no orders)",
)
def q22_idle_rich_customers(spark, sf):
    cust = _t(spark, sf, "customer")
    orders = _t(spark, sf, "orders")
    thr = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast(DEC6)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_acctbal")
    )


@register(
    "funnel_conversion",
    oracle=f"""
    WITH m AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN {EV_MS} END) AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN {EV_MS} END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN {EV_MS} END) AS t_purchase
      FROM events GROUP BY user_id)
    SELECT COUNT(*) AS n_users,
           COUNT(CASE WHEN t_view IS NOT NULL THEN 1 END) AS n_view,
           COUNT(CASE WHEN t_view < t_click THEN 1 END) AS n_click_after_view,
           COUNT(CASE WHEN t_view < t_click AND t_click < t_purchase THEN 1 END) AS n_converted
    FROM m
    """,
    doc="Event-funnel conversion (view -> click -> purchase ordering per "
    "user): one grouped pass + conditional mins — no self-joins",
)
def funnel_conversion(spark, sf):
    ev = _t(spark, sf, "events")
    t = lambda et: F.min(F.when(F.col("event_type") == et, F.col("ts_ms")))
    m = ev.groupBy("user_id").agg(
        t("view").alias("t_view"),
        t("click").alias("t_click"),
        t("purchase").alias("t_purchase"),
    )
    cnt = lambda c: F.sum(F.when(c, 1).otherwise(0))
    return m.agg(
        F.count(F.lit(1)).alias("n_users"),
        cnt(F.col("t_view").isNotNull()).alias("n_view"),
        cnt(F.col("t_view") < F.col("t_click")).alias("n_click_after_view"),
        cnt(
            (F.col("t_view") < F.col("t_click"))
            & (F.col("t_click") < F.col("t_purchase"))
        ).alias("n_converted"),
    )


@register(
    "cohort_retention",
    oracle=f"""
    WITH d AS (SELECT user_id, {EV_MS} // 86400000 AS day FROM events),
         c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
    SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
           COUNT(DISTINCT d.user_id) AS n_active
    FROM d JOIN c ON d.user_id = c.user_id
    GROUP BY c.cohort_day, day_offset
    """,
    doc="Cohort retention matrix: first-seen day x activity offset with "
    "distinct-user counts — integer day arithmetic (no float division on "
    "epoch values)",
)
def cohort_retention(spark, sf):
    ev = _t(spark, sf, "events")
    d = ev.select("user_id", F.expr("ts_ms div 86400000").alias("day"))
    c = d.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        d.join(c, "user_id")
        .groupBy("cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset"))
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "skew_salted_agg",
    oracle=f"""
    SELECT event_type,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total,
           COUNT(*) AS n,
           MIN({EV_MS}) AS first_ms,
           MAX({EV_MS}) AS last_ms
    FROM events GROUP BY event_type
    """,
    doc="Hot-key aggregation via deterministic salting (operators/skew.py): "
    "phase 1 shuffles on (key, xxhash-salt) so a key owning most of the "
    "fact spreads over N reducers; phase 2 re-aggregates the tiny partial "
    "set. Decimal accumulation keeps the two-phase result bit-identical "
    "to the oracle's single-phase GROUP BY",
)
def skew_salted_agg(spark, sf):
    from ..operators.skew import salted_agg

    ev = _t(spark, sf, "events").withColumn(
        "value_dec", F.col("value").cast(DEC6)
    )
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "total": ("value_dec", "sum"),
            "n": ("value_dec", "count"),
            "first_ms": ("ts_ms", "min"),
            "last_ms": ("ts_ms", "max"),
        },
        discriminator="event_id",
        buckets=16,
    )
    return out.select(
        "event_type", F.col("total").cast("double").alias("total"),
        "n", "first_ms", "last_ms",
    )


@register(
    "percentiles_by_group",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99,
           MIN(value) AS v_min, MAX(value) AS v_max
    FROM events GROUP BY event_type
    """,
    doc="Exact interpolated percentiles per group (Spark percentile() == "
    "DuckDB quantile_cont bit-identically: same sort + same a+(b-a)*f "
    "interpolation on doubles). At 100 TB swap to approx_percentile with "
    "a declared error bound — the exact form is the correctness anchor",
)
def percentiles_by_group(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
    )


@register(
    "resample_ohlcv_hourly",
    oracle=f"""
    WITH t AS (SELECT user_id, {EV_MS} AS ms, value,
                      {EV_MS} * 1000000 + event_id AS ord
               FROM events)
    SELECT user_id,
           ms - (ms % 3600000) AS bucket_ms,
           min_by(value, ord) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           max_by(value, ord) AS close,
           COUNT(*) AS n_ticks
    FROM t GROUP BY user_id, bucket_ms
    """,
    doc="Hypertable-rollup shape: derive hourly OHLCV bars from tick-level "
    "rows in ONE grouped pass (min_by/max_by for open/close with a total "
    "order; map-side partials). The engine derives 1h/1d from 1m instead "
    "of maintaining three API-fed tables (reference flows/sync_klines.py)",
)
def resample_ohlcv_hourly(spark, sf):
    from ..operators.resample import resample_ohlcv

    ev = _t(spark, sf, "events").select(
        "user_id", "ts_ms", F.col("value").alias("price"),
        (F.col("ts_ms") * 1_000_000 + F.col("event_id")).alias("ord"),
    )
    return resample_ohlcv(
        ev, keys=["user_id"], interval_ms=3_600_000,
        ts_col="ts_ms", price_col="price", order_col="ord",
    )


@register(
    "q8_market_share",
    oracle="""
    WITH flat AS (
      SELECT EXTRACT(year FROM o_orderdate) AS yr,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS vol,
             sn.n_name AS supp_nation
      FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        JOIN region  ON r_regionkey = cn.n_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
      WHERE r_name = 'EUROPE')
    SELECT yr,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                         ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
           CAST(SUM(vol) AS DOUBLE) AS total_volume
    FROM flat GROUP BY yr
    """,
    doc="TPC-H Q8 shape: per-year market share of one supplier nation in "
    "a region — two-level conditional-aggregation ratio, decimal legs",
)
def q8_market_share(spark, sf):
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    cust = _t(spark, sf, "customer")
    supp = _t(spark, sf, "supplier")
    nation = _t(spark, sf, "nation")
    region = _t(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    cn = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    flat = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(region), F.col("crk") == region.r_regionkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("snk"))
        .select(
            F.year("o_orderdate").alias("yr"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(DEC6)
    return flat.groupBy("yr").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(zero)).cast("double")
            / F.sum("vol").cast("double")
        ).alias("mkt_share"),
        F.sum("vol").cast("double").alias("total_volume"),
    )


@register(
    "q9_revenue_by_nation_year",
    oracle="""
    SELECT sn.n_name AS nation, EXTRACT(year FROM o_orderdate) AS yr,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
    FROM lineitem
      JOIN orders ON o_orderkey = l_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation sn ON sn.n_nationkey = s_nationkey
    GROUP BY nation, yr
    """,
    doc="TPC-H Q9 shape: revenue by supplier nation x order year — wide "
    "fact join with two-dimension grouping and EXTRACT",
)
def q9_revenue_by_nation_year(spark, sf):
    li = _t(spark, sf, "lineitem")
    orders = _t(spark, sf, "orders")
    supp = _t(spark, sf, "supplier")
    sn = _t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), supp.s_nationkey == F.col("snk"))
        .groupBy("nation", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH avg_q AS (
      SELECT l_partkey AS pk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN avg_q ON l_partkey = pk
    WHERE l_quantity < 0.2 * avg_qty
    """,
    doc="TPC-H Q17 shape: per-group mean join-back filter (correlated "
    "scalar subquery on the fact itself, decorrelated to agg + join); "
    "decimal-exact mean avoids float-sum order sensitivity",
)
def q17_small_quantity_revenue(spark, sf):
    li = _t(spark, sf, "lineitem")
    avg_q = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(F.col("l_quantity").cast(DEC6)).cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(avg_q, li.l_partkey == avg_q.pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(F.col("l_extendedprice").cast(DEC6)).cast("double") / 7.0).alias("avg_yearly"),
        )
    )


@register(
    "cube_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items,
           GROUPING(l_returnflag, l_linestatus) AS gid
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="CUBE: all 2^k grouping-set combinations in one Expand pass "
    "(rollup covers the hierarchy; cube the full lattice)",
)
def cube_revenue(spark, sf):
    li = _t(spark, sf, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
        F.grouping_id().alias("gid"),
    )


@register(
    "w4_range_frame",
    oracle=f"""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS sum_10m,
           COUNT(*) OVER w AS n_10m
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY {EV_MS}
                 RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW)
    """,
    doc="RANGE-frame window (value-based, not row-based): per-user rolling "
    "10-minute sum — peer rows at equal ts share the frame, unlike ROWS; "
    "decimal accumulation keeps it order-insensitive",
)
def w4_range_frame(spark, sf):
    ev = _t(spark, sf, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_ms"))
        .rangeBetween(-600_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC6)).over(w).cast("double").alias("sum_10m"),
        F.count(F.lit(1)).over(w).alias("n_10m"),
    )


@register(
    "json_props_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY k_bucket
    """,
    doc="Semi-structured surface: parse the props JSON column with an "
    "explicit schema (from_json — vectorized JVM parse, not a Python "
    "UDF) and aggregate by an extracted field; the reference flattens "
    "nested JSON at extract time (SURVEY §1.1), the engine can also keep "
    "it and extract lazily",
)
def json_props_extract(spark, sf):
    ev = _t(spark, sf, "events")
    k = F.from_json(F.col("props"), "k int")["k"]
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC6)).cast("double").alias("total_value"),
        )
    )


@register(
    "pivot_event_values",
    oracle="""
    SELECT user_id % 100 AS user_bucket,
           CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS view_total,
           CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS click_total,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(38,6)) END) AS DOUBLE) AS purchase_total
    FROM events
    GROUP BY user_bucket
    """,
    doc="Pivot with an explicit value list (no extra pass to discover "
    "pivot keys; single hash-agg plan, same as conditional aggregation)",
)
def pivot_event_values(spark, sf):
    ev = _t(spark, sf, "events")
    out = (
        ev.groupBy((F.col("user_id") % 100).alias("user_bucket"))
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(F.sum(F.col("value").cast(DEC6)).cast("double"))
    )
    return out.select(
        "user_bucket",
        F.col("view").alias("view_total"),
        F.col("click").alias("click_total"),
        F.col("purchase").alias("purchase_total"),
    )


@register(
    "skew_salted_join",
    oracle=f"""
    WITH dim AS (SELECT event_type, COUNT(*) AS type_n FROM events GROUP BY event_type)
    SELECT e.event_type,
           CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS total,
           MIN(d.type_n) AS type_n
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
    doc="Hot-key fact-to-dim join via replication salting "
    "(operators/skew.py:salted_join): the fact side salts on a "
    "deterministic xxhash, the dim side explodes buckets-wide so every "
    "(key, salt) pair exists, and the shuffle spreads each hot key over "
    "`buckets` reducers. The shape for dims too big to broadcast but "
    "small enough to replicate; AQE skew-split covers the rest",
)
def skew_salted_join(spark, sf):
    from ..operators.skew import salted_join

    ev = _t(spark, sf, "events")
    dim = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("type_n"))
    joined = salted_join(
        ev.select("event_id", "event_type", F.col("value").cast(DEC6).alias("v")),
        dim,
        keys=["event_type"],
        discriminator="event_id",
        buckets=8,
    )
    return joined.groupBy("event_type").agg(
        F.sum("v").cast("double").alias("total"),
        F.min("type_n").alias("type_n"),
    )


@register(
    "sample_stratified",
    oracle="""
    WITH gated AS (
      SELECT event_type, value,
             CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000 AS bucket
      FROM events)
    SELECT event_type, COUNT(*) AS n_kept,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS kept_value
    FROM gated
    WHERE bucket < CASE event_type WHEN 'view' THEN 50
                                   WHEN 'click' THEN 200
                                   WHEN 'purchase' THEN 1000 ELSE 0 END
    GROUP BY event_type
    """,
    doc="Deterministic stratified downsampling (operators/sampling.py): "
    "per-class keep rates (5% views, 20% clicks, all purchases) gated by "
    "a stable row-key hash instead of an RNG — rows keep their fate as "
    "the table grows, so incremental pipelines and train/eval splits "
    "stay consistent across re-runs and engines. Narrow filter, no "
    "shuffle before the verification agg",
)
def sample_stratified(spark, sf):
    from ..operators.sampling import stratified_sample

    ev = _t(spark, sf, "events")
    kept = stratified_sample(
        ev,
        key_col="event_id",
        rates_permille={"view": 50, "click": 200, "purchase": 1000},
        stratum_col="event_type",
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("value").cast(DEC6)).cast("double").alias("kept_value"),
    )


def _z8_sql(qu: str, qt: str) -> str:
    """16-bit Morton interleave of two 8-bit quantized coords in portable
    SQL — disjoint bits, so + == OR."""
    terms = []
    for b in range(8):
        terms.append(f"((({qu} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({qt} >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(terms)


_ZQ_U = (
    "LEAST(GREATEST(CAST(floor(CAST(user_id - lo_u AS DOUBLE) / sp_u * 256.0)"
    " AS BIGINT), 0), 255)"
)
_ZQ_T = (
    "LEAST(GREATEST(CAST(floor(CAST(ts_ms - lo_t AS DOUBLE) / sp_t * 256.0)"
    " AS BIGINT), 0), 255)"
)


@register(
    "zorder_locality_stats",
    oracle=f"""
    WITH ev AS (SELECT event_id, user_id, {EV_MS} AS ts_ms FROM events),
    b AS (SELECT MIN(user_id) AS lo_u, MAX(user_id) AS hi_u,
                 MIN(ts_ms) AS lo_t, MAX(ts_ms) AS hi_t FROM ev),
    sp AS (SELECT lo_u, lo_t,
                  CASE WHEN hi_u = lo_u THEN 1.0
                       ELSE CAST(hi_u - lo_u AS DOUBLE) END AS sp_u,
                  CASE WHEN hi_t = lo_t THEN 1.0
                       ELSE CAST(hi_t - lo_t AS DOUBLE) END AS sp_t
           FROM b),
    keyed AS (SELECT event_id, user_id, ts_ms,
                     {_z8_sql(_ZQ_U, _ZQ_T)} AS z
              FROM ev, sp)
    SELECT z >> 12 AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(user_id) AS u_lo, MAX(user_id) AS u_hi,
           MIN(ts_ms) AS t_lo, MAX(ts_ms) AS t_hi
    FROM keyed GROUP BY bucket
    """,
    doc="Z-order (Morton) layout audit over events (user_id x time): "
    "8-bit min-max quantized coords bit-interleaved to a 16-bit key; "
    "bucket = the key's top 4 bits = the file a z-ordered writer "
    "(sinks/layout.zorder_layout) would target — per-bucket min/max show "
    "every file's bounding box tight in BOTH dimensions, the property "
    "that lets parquet footer stats prune 2-D predicates. Narrow plan: "
    "bounds broadcast from one aggregate row, zero extra shuffles",
)
def zorder_locality_stats(spark, sf):
    ev = _t(spark, sf, "events").select("event_id", "user_id", "ts_ms")
    b = ev.agg(
        F.min("user_id").alias("lo_u"),
        F.max("user_id").alias("hi_u"),
        F.min("ts_ms").alias("lo_t"),
        F.max("ts_ms").alias("hi_t"),
    )
    d = ev.crossJoin(F.broadcast(b))

    def quant(x, lo, hi):
        span = F.when(
            F.col(hi) == F.col(lo), F.lit(1.0)
        ).otherwise((F.col(hi) - F.col(lo)).cast("double"))
        frac = (F.col(x) - F.col(lo)).cast("double") / span
        return F.least(
            F.greatest((frac * F.lit(256.0)).cast("long"), F.lit(0)),
            F.lit(255),
        )

    qu, qt = quant("user_id", "lo_u", "hi_u"), quant("ts_ms", "lo_t", "hi_t")
    z = F.lit(0).cast("long")
    for bit in range(8):
        z = z + F.shiftleft(
            F.shiftright(qu, bit).bitwiseAND(F.lit(1)), 2 * bit
        ).cast("long")
        z = z + F.shiftleft(
            F.shiftright(qt, bit).bitwiseAND(F.lit(1)), 2 * bit + 1
        ).cast("long")
    return (
        d.select("event_id", "user_id", "ts_ms", z.alias("z"))
        .groupBy(F.shiftright(F.col("z"), 12).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("user_id").alias("u_lo"),
            F.max("user_id").alias("u_hi"),
            F.min("ts_ms").alias("t_lo"),
            F.max("ts_ms").alias("t_hi"),
        )
    )


@register(
    "winsorize_event_values",
    oracle="""
    WITH stats AS (SELECT event_type,
                          quantile_cont(value, 0.01) AS w_lo,
                          quantile_cont(value, 0.99) AS w_hi
                   FROM events GROUP BY event_type),
    c AS (SELECT e.event_type, e.value, s.w_lo, s.w_hi,
                 LEAST(GREATEST(e.value, s.w_lo), s.w_hi) AS w
          FROM events e JOIN stats s ON e.event_type = s.event_type)
    SELECT event_type, w_lo, w_hi,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN value < w_lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_capped_low,
           CAST(SUM(CASE WHEN value > w_hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_capped_high,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_raw,
           CAST(SUM(CAST(w AS DECIMAL(38,6))) AS DOUBLE) AS sum_winsorized
    FROM c GROUP BY event_type, w_lo, w_hi
    """,
    doc="Per-group winsorization audit (operators/curation.winsorize): "
    "values clamped into [p01, p99] of their event_type — exact "
    "interpolated percentiles in ONE grouped aggregate broadcast back "
    "onto the scan (fact side never shuffles); capped-row counts and "
    "decimal-exact before/after sums per group. At 100 TB swap to "
    "approx_percentile with a declared rank-error bound",
)
def winsorize_event_values(spark, sf):
    from ..operators.curation import winsorize

    ev = _t(spark, sf, "events").select("event_type", "value")
    w = winsorize(ev, "value", "event_type", lo_p=0.01, hi_p=0.99)
    return (
        w.groupBy(
            "event_type",
            F.col("_w_lo").alias("w_lo"),
            F.col("_w_hi").alias("w_hi"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value") < F.col("_w_lo"), 1).otherwise(0)
            ).alias("n_capped_low"),
            F.sum(
                F.when(F.col("value") > F.col("_w_hi"), 1).otherwise(0)
            ).alias("n_capped_high"),
            F.sum(F.col("value").cast(DEC6)).cast("double").alias("sum_raw"),
            F.sum(F.col("value_w").cast(DEC6))
            .cast("double")
            .alias("sum_winsorized"),
        )
    )


@register(
    "histogram_event_values",
    oracle="""
    WITH b AS (SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
               FROM events GROUP BY event_type),
    d AS (SELECT e.event_type,
                 CASE WHEN b.hi = b.lo THEN 1
                      ELSE LEAST(1 + CAST(floor((e.value - b.lo)
                                   / (b.hi - b.lo) * 20.0) AS BIGINT), 20)
                 END AS bin
          FROM events e JOIN b ON e.event_type = b.event_type)
    SELECT event_type, CAST(bin AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM d GROUP BY event_type, bin
    """,
    doc="Exact equi-width value histogram per event_type "
    "(operators/profile.equiwidth_histogram): bounds from one grouped "
    "min/max broadcast back, bins via explicit 1+floor((v-lo)/(hi-lo)*n) "
    "arithmetic (plain IEEE ops, bit-identical both engines; max folded "
    "into the top bin) — two map-side-combinable aggregates, no sort or "
    "percentile state; the drift-dashboard profile shape at fact scale",
)
def histogram_event_values(spark, sf):
    from ..operators.profile import equiwidth_histogram

    ev = _t(spark, sf, "events").select("event_type", "value")
    h = equiwidth_histogram(ev, "value", "event_type", n_bins=20)
    return h.select("event_type", F.col("bin").cast("long").alias("bin"), "n")


@register(
    "trend_slope_by_type",
    oracle="""
    WITH t AS (SELECT event_type,
                      (epoch_ns(ts) // 1000000) // 3600000 AS x,
                      value AS y
               FROM events),
    mn AS (SELECT event_type, MIN(x) AS x0 FROM t GROUP BY event_type),
    c AS (SELECT t.event_type,
                 CAST(t.x - mn.x0 AS BIGINT) AS xc,
                 CAST(floor(t.y * 1000000.0) AS BIGINT) AS y6
          FROM t JOIN mn ON t.event_type = mn.event_type),
    agg AS (SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(xc) AS BIGINT) AS sx,
                   CAST(SUM(y6) AS BIGINT) AS sy6,
                   CAST(SUM(xc * y6) AS BIGINT) AS sxy6,
                   CAST(SUM(xc * xc) AS BIGINT) AS sxx
            FROM c GROUP BY event_type)
    SELECT event_type, n,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
                THEN (CAST(n AS DOUBLE) * CAST(sxy6 AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy6 AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     / 1000000.0
           END AS slope,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
                THEN (CAST(sy6 AS DOUBLE) / 1000000.0
                      - (CAST(n AS DOUBLE) * CAST(sxy6 AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sy6 AS DOUBLE))
                        / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        / 1000000.0
                        * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE)
           END AS intercept
    FROM agg
    """,
    doc="Per-group least-squares value-over-time slope "
    "(operators/profile.trend_slope): per-group-centered integral-hour "
    "x, micro-quantized y, five sufficient statistics as pure BIGINT "
    "sums (order-independent, one correctly-rounded int64->double "
    "conversion each — a wide-decimal->double cast drifts by 1 ulp "
    "between engines), closed form on the exact aggregates — the drift "
    "monitor that needs no window or sort at fact scale",
)
def trend_slope_by_type(spark, sf):
    from ..operators.profile import trend_slope

    ev = _t(spark, sf, "events").select(
        "event_type", F.expr("ts_ms div 3600000").alias("x"), F.col("value").alias("y")
    )
    return trend_slope(ev, "x", "y", "event_type")


@register(
    "cdc_current_state",
    oracle=f"""
    WITH log AS (SELECT user_id, {EV_MS} AS ts_ms, event_id, value,
                        CASE event_type WHEN 'purchase' THEN 'D'
                                        WHEN 'view' THEN 'U'
                                        ELSE 'I' END AS op
                 FROM events),
    ranked AS (SELECT *,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ts_ms DESC, event_id DESC) AS rn
               FROM log)
    SELECT user_id, ts_ms, event_id, value, op
    FROM ranked WHERE rn = 1 AND op IN ('I', 'U')
    """,
    doc="CDC changelog replay to current state "
    "(sinks/upsert.apply_changelog): per key the highest (ts, seq) "
    "operation wins, delete-winners drop the key — Debezium/binlog "
    "materialization in one per-key window shuffle; events replayed as "
    "the changelog (event_id = the binlog-position tie-break), composes "
    "with merge_upsert for incremental application",
)
def cdc_current_state(spark, sf):
    from ..sinks.upsert import apply_changelog

    ev = _t(spark, sf, "events")
    log = ev.select(
        "user_id",
        "ts_ms",
        "event_id",
        "value",
        F.when(F.col("event_type") == "purchase", F.lit("D"))
        .when(F.col("event_type") == "view", F.lit("U"))
        .otherwise(F.lit("I"))
        .alias("op"),
    )
    return apply_changelog(
        log, keys=["user_id"], ts_col="ts_ms", order_cols=["event_id"]
    )


@register(
    "versioned_cdc_replay",
    oracle=f"""
    WITH log AS (SELECT user_id, {EV_MS} AS ts_ms, event_id, value,
                        CASE event_type WHEN 'purchase' THEN 'D'
                                        WHEN 'view' THEN 'U'
                                        ELSE 'I' END AS op
                 FROM events),
    ranked AS (SELECT *,
                      ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ts_ms DESC, event_id DESC) AS rn
               FROM log)
    SELECT user_id, ts_ms, event_id, value
    FROM ranked WHERE rn = 1 AND op IN ('I', 'U')
    """,
    doc="CDC replay through the ACTUAL lakehouse apply path "
    "(sinks/versioned.merge_version with updates+deletes+txn — the "
    "storage twin of cdc_current_state's pure-plan fold): the events "
    "changelog splits at its median ts into two ordered batches, each "
    "folds to per-key winners and commits ONE exactly-once MERGE "
    "(exactly what streaming/jobs.versioned_cdc_stream does per "
    "micro-batch), then batch 1 REPLAYS (txn no-op) and the final "
    "table reads back from committed files — hash-proven equal to the "
    "single-pass changelog fold, so sequential CDC application is "
    "provably order-insensitive across batch boundaries",
)
def versioned_cdc_replay(spark, sf):
    import shutil
    import tempfile

    from pyspark.sql import Window

    from ..sinks.versioned import merge_version, read_version

    ev = _t(spark, sf, "events")
    log = ev.select(
        "user_id", "ts_ms", "event_id", "value",
        F.when(F.col("event_type") == "purchase", F.lit("D"))
        .when(F.col("event_type") == "view", F.lit("U"))
        .otherwise(F.lit("I"))
        .alias("op"),
    )
    split = log.agg(
        F.percentile_approx("ts_ms", 0.5).alias("m")
    ).first()["m"]

    def fold(batch):
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts_ms").desc(), F.col("event_id").desc()
        )
        winners = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn")
        )
        ups = winners.filter(F.col("op") != "D").drop("op")
        dels = winners.filter(F.col("op") == "D").select("user_id")
        return ups, dels

    tmp = tempfile.mkdtemp(prefix="clx_cdc_")
    path = tmp + "/t"
    try:
        app = "cdc-replay"
        for i, batch in enumerate(
            (log.filter(F.col("ts_ms") < split),
             log.filter(F.col("ts_ms") >= split))
        ):
            ups, dels = fold(batch)
            merge_version(ups, path, keys=["user_id"],
                          stats_cols=["user_id"], deletes=dels,
                          txn=(app, i))
        # crash-replay of batch 1: the txn watermark makes it a no-op
        ups, dels = fold(log.filter(F.col("ts_ms") >= split))
        merge_version(ups, path, keys=["user_id"],
                      stats_cols=["user_id"], deletes=dels, txn=(app, 1))
        out = read_version(spark, path).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out.select("user_id", "ts_ms", "event_id", "value")


