"""Sequence / path analytics and storage-ops planning queries (round 4).

Event-sequence mining (Markov transitions, prefix paths, conversion lag),
trailing-window distinct counts, partition-skew reporting, file-compaction
planning, embedding outlier scoring, and the explicit GROUPING SETS surface.

These extend the engine beyond the reference's point-in-time aggregates into
the sequence/ops questions a 100 TB event store actually gets asked
(reference's closest analogs: the integrity hour-bucket scan
`src/system_utils/check_market_snapshot_integrity.py:97-104` and the 5-minute
alignment joins `src/exchanges/binance/perp.py:168-184` — both single-step;
everything here is the multi-step generalization).

Scale notes are per-query; the common rules:
  * windows partition by user/source/shard — no global sorts on raw events;
  * trailing windows are expressed as constant-fanout offset explodes and
    keyed aggregates (shuffle-friendly), never range-condition nested loops;
  * float-nondeterministic cross-row sums are micro-quantized to integers
    (same contract as embedding_label_centroids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..catalog import load_table
from . import register

DEC6 = "decimal(38,6)"
EV_MS = "(epoch_ns(ts) // 1000000)"
DAY_MS = 86_400_000


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


# --------------------------------------------------------------------------
# Event-sequence mining
# --------------------------------------------------------------------------


@register(
    "markov_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY {EV_MS}, event_id) AS prev_type
      FROM events),
    c AS (SELECT prev_type, event_type AS next_type, COUNT(*) AS n
          FROM seq WHERE prev_type IS NOT NULL
          GROUP BY prev_type, event_type)
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE) AS prob
    FROM c
    """,
    doc="First-order Markov transition matrix over per-user event sequences: "
    "LAG window partitioned by user (no global sort), then a keyed count and "
    "a window normalization over the tiny (type x type) matrix. The "
    "next-event-model / anomalous-transition primitive; integer counts, one "
    "double division at the end",
)
def markov_transitions(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    c = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wt = Window.partitionBy("prev_type")
    return c.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wt).cast("double")).alias(
            "prob"
        ),
    )


@register(
    "top_event_paths",
    oracle=f"""
    WITH r AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY {EV_MS}, event_id) AS rn
      FROM events),
    p AS (SELECT user_id,
                 string_agg(event_type, '>' ORDER BY rn) AS path
          FROM r WHERE rn <= 5 GROUP BY user_id),
    c AS (SELECT path, COUNT(*) AS n_users FROM p GROUP BY path)
    SELECT path, n_users,
           CAST(ROW_NUMBER() OVER (ORDER BY n_users DESC, path) AS INTEGER)
             AS rk
    FROM c QUALIFY rk <= 20
    """,
    doc="Top-20 five-event prefix paths: per-user ranked window (partitioned, "
    "no global sort), order-pinned path assembly via array_sort on "
    "(rn, type) structs, then a count over the small distinct-path space. "
    "The funnel-discovery / clickstream primitive; fully tie-broken",
)
def top_event_paths(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    r = ev.select(
        "user_id", "event_type", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= 5)
    p = r.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    c = p.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    rk = F.row_number().over(Window.orderBy(F.col("n_users").desc(), "path"))
    return c.select(
        "path", "n_users", rk.cast("int").alias("rk")
    ).filter(F.col("rk") <= 20)


@register(
    "rolling_7d_distinct_users",
    oracle=f"""
    WITH pairs AS (SELECT DISTINCT {EV_MS} // {DAY_MS} AS day_id, user_id
                   FROM events),
    expanded AS (SELECT day_id + o AS report_day, user_id
                 FROM pairs, UNNEST(generate_series(0, 6)) AS t(o)),
    days AS (SELECT DISTINCT day_id AS report_day FROM pairs)
    SELECT e.report_day,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users_7d
    FROM expanded e JOIN days d ON e.report_day = d.report_day
    GROUP BY e.report_day
    """,
    doc="Trailing 7-day distinct users per day (rolling MAU/WAU): distinct "
    "(day, user) pairs first (collapses raw events ~3000x), then a "
    "constant-7 offset explode + keyed distinct count — shuffle-friendly "
    "equi-aggregation, deliberately NOT a range-condition join (which "
    "Spark would plan as a broadcast nested loop). The offset-explode "
    "rewrite is the standard scale form: volume is 7x the deduped pairs, "
    "not 7x the raw events",
)
def rolling_7d_distinct_users(spark, sf):
    ev = _t(spark, sf, "events")
    pairs = ev.select(
        F.expr(f"ts_ms div {DAY_MS}").alias("day_id"), "user_id"
    ).distinct()
    expanded = pairs.select(
        F.explode(F.array([F.lit(i) for i in range(7)])).alias("o"),
        "day_id",
        "user_id",
    ).select((F.col("day_id") + F.col("o")).alias("report_day"), "user_id")
    days = pairs.select(F.col("day_id").alias("report_day")).distinct()
    return (
        expanded.join(days, "report_day", "left_semi")
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


@register(
    "conversion_lag_stats",
    oracle=f"""
    WITH s AS (SELECT user_id, MIN({EV_MS}) AS signup_ms
               FROM events WHERE event_type = 'signup' GROUP BY user_id),
    conv AS (SELECT e.user_id, MIN({EV_MS}) AS conv_ms
             FROM events e JOIN s ON e.user_id = s.user_id
             WHERE e.event_type = 'purchase' AND {EV_MS} >= s.signup_ms
             GROUP BY e.user_id)
    SELECT s.signup_ms // {DAY_MS} AS cohort_day,
           CAST(COUNT(*) AS BIGINT) AS n_signups,
           CAST(COUNT(c.conv_ms) AS BIGINT) AS n_converted,
           MIN(c.conv_ms - s.signup_ms) AS min_lag_ms,
           MAX(c.conv_ms - s.signup_ms) AS max_lag_ms,
           CAST(SUM(c.conv_ms - s.signup_ms) AS DOUBLE)
             / CAST(COUNT(c.conv_ms) AS DOUBLE) AS avg_lag_ms
    FROM s LEFT JOIN conv c ON s.user_id = c.user_id
    GROUP BY cohort_day
    """,
    doc="Signup-to-first-purchase lag by signup-day cohort: two keyed MIN "
    "aggregates + one left join on user_id (co-partitioned, single shuffle "
    "key), integer-exact lags, the only double the final mean. Companion "
    "to funnel_conversion/cohort_retention: those count stages, this "
    "measures the time axis",
)
def conversion_lag_stats(spark, sf):
    ev = _t(spark, sf, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("signup_ms"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts_ms") >= F.col("signup_ms"))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("conv_ms"))
    )
    lag = F.col("conv_ms") - F.col("signup_ms")
    return (
        s.join(conv, "user_id", "left")
        .groupBy(F.expr(f"signup_ms div {DAY_MS}").alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.count("conv_ms").alias("n_converted"),
            F.min(lag).alias("min_lag_ms"),
            F.max(lag).alias("max_lag_ms"),
            (F.sum(lag).cast("double") / F.count("conv_ms").cast("double")).alias(
                "avg_lag_ms"
            ),
        )
    )


@register(
    "attribution_interval_join",
    oracle=f"""
    WITH v AS (SELECT user_id, event_id AS view_id, {EV_MS} AS view_ms
               FROM events WHERE event_type = 'view'),
    p AS (SELECT user_id, event_id AS purchase_id, {EV_MS} AS purchase_ms,
                 value
          FROM events WHERE event_type = 'purchase'),
    j AS (SELECT v.user_id, v.view_id, v.view_ms,
                 p.purchase_id, p.purchase_ms, p.value,
                 ROW_NUMBER() OVER (PARTITION BY v.view_id
                   ORDER BY p.purchase_ms, p.purchase_id) AS rn
          FROM v LEFT JOIN p
            ON v.user_id = p.user_id
           AND p.purchase_ms >= v.view_ms
           AND p.purchase_ms <= v.view_ms + 3600000)
    SELECT user_id, view_id, view_ms, purchase_id,
           purchase_ms, value AS attributed_value
    FROM j WHERE rn = 1
    """,
    doc="Interval-join attribution, the BATCH TWIN of "
    "streaming/jobs.stream_stream_attribution: every view attributes to "
    "the EARLIEST same-user purchase within 1h (event_id tie-break); "
    "views that never converted emit with NULL purchase columns — the "
    "same left-outer semantics the streaming test pins, here with a "
    "full DuckDB hash oracle. Plan: equi-join on user_id (one shuffle "
    "key, co-partitioned) with the time bounds as residual predicates, "
    "then one per-view window — never a time-range nested loop",
)
def attribution_interval_join(spark, sf):
    ev = _t(spark, sf, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts_ms").alias("view_ms"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts_ms").alias("purchase_ms"),
        F.col("value").alias("attributed_value"),
    )
    j = v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ms") >= F.col("view_ms"))
        & (F.col("purchase_ms") <= F.col("view_ms") + 3600000),
        "left",
    )
    w = Window.partitionBy("view_id").orderBy(
        F.asc_nulls_last("purchase_ms"), F.asc_nulls_last("purchase_id")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "view_id", "view_ms", "purchase_id",
                "purchase_ms", "attributed_value")
    )


# --------------------------------------------------------------------------
# Storage-ops planning
# --------------------------------------------------------------------------

COMPACT_TARGET = 65_536  # bytes per compacted output file (test-scale stand-in)


@register(
    "compaction_bin_packing",
    oracle=f"""
    WITH f AS (SELECT doc_id, source, n_chars,
                      CAST(COALESCE(SUM(n_chars) OVER (PARTITION BY source
                           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS BIGINT) AS start_off
               FROM documents)
    SELECT source, CAST(start_off // {COMPACT_TARGET} AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(n_chars) AS BIGINT) AS bin_bytes,
           CAST(SUM(n_chars) AS DOUBLE) / {COMPACT_TARGET}.0 AS fill_ratio
    FROM f GROUP BY source, bin
    """,
    doc="Small-file compaction plan (the nightly job every big parquet lake "
    "runs): per source, files in doc_id order get a running byte offset "
    "(window partitioned by source — parallel across sources, no global "
    "sort), offset div target assigns the compacted output bin; output is "
    "the per-bin manifest with fill ratios. Contiguous-concatenation "
    "packing — the token-level sibling is pack_training_sequences; this "
    "one plans file IO, not sequences",
)
def compaction_bin_packing(spark, sf):
    docs = _t(spark, sf, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    f = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0))
        .cast("long")
        .alias("start_off"),
    )
    return f.groupBy(
        "source", F.expr(f"start_off div {COMPACT_TARGET}").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("n_chars").cast("long").alias("bin_bytes"),
        (F.sum("n_chars").cast("double") / F.lit(float(COMPACT_TARGET))).alias(
            "fill_ratio"
        ),
    )


@register(
    "partition_skew_report",
    oracle=f"""
    WITH pt AS (SELECT {EV_MS} // {DAY_MS} AS day_id, event_type,
                       COUNT(*) AS n
                FROM events GROUP BY day_id, event_type)
    SELECT day_id,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(MAX(n) AS BIGINT) AS max_type_rows,
           CAST(MAX(n) * COUNT(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE)
             AS skew_ratio
    FROM pt GROUP BY day_id
    """,
    doc="Partition-skew report over the (day x type) layout: per-cell counts "
    "partially aggregated map-side, then per-day max/avg ratio — "
    "skew_ratio ~1 means balanced, >>1 says salt this key before joining "
    "(the decision input for skew_salted_agg/skew_salted_join). At 100 TB "
    "this reads footer statistics scale: two keyed aggregates, nothing "
    "row-wise after the first",
)
def partition_skew_report(spark, sf):
    ev = _t(spark, sf, "events")
    pt = ev.groupBy(
        F.expr(f"ts_ms div {DAY_MS}").alias("day_id"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return pt.groupBy("day_id").agg(
        F.sum("n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.max("n").cast("long").alias("max_type_rows"),
        (
            (F.max("n") * F.count(F.lit(1))).cast("double")
            / F.sum("n").cast("double")
        ).alias("skew_ratio"),
    )


# --------------------------------------------------------------------------
# Embedding outliers
# --------------------------------------------------------------------------


@register(
    "embedding_outlier_scores",
    oracle="""
    WITH e AS (SELECT vec_id, i - 1 AS dim,
                      CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0)
                        AS BIGINT) AS v6
               FROM embeddings,
                    UNNEST(generate_series(1, len(embedding))) AS t(i)),
    d AS (SELECT dim, CAST(SUM(v6) AS BIGINT) AS mean_num,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM e GROUP BY dim),
    dev AS (SELECT e.vec_id,
                   CAST(e.v6 * d.n - d.mean_num AS HUGEINT) AS d6
            FROM e JOIN d ON e.dim = d.dim),
    sc AS (SELECT vec_id, CAST(SUM(d6 * d6) AS DOUBLE) AS q
           FROM dev GROUP BY vec_id),
    nn AS (SELECT MAX(n) AS n FROM d)
    SELECT vec_id,
           q / (1000000000000.0 * CAST(nn.n AS DOUBLE)
                * CAST(nn.n AS DOUBLE)) AS dist2,
           CAST(ROW_NUMBER() OVER (
             ORDER BY q / (1000000000000.0 * CAST(nn.n AS DOUBLE)
                           * CAST(nn.n AS DOUBLE)) DESC, vec_id)
             AS INTEGER) AS rk
    FROM sc, nn QUALIFY rk <= 50
    """,
    doc="Embedding outlier scoring (poisoned/garbage-vector triage before "
    "semantic dedup): squared distance to the global centroid, computed "
    "integer-exactly — components micro-quantized to BIGINT, deviations "
    "kept as exact integers scaled by n (d6 = v6*n - sum), squares summed "
    "in DECIMAL(38,0)/HUGEINT so partition order can't perturb the result "
    "(same contract as embedding_label_centroids). One explode, two keyed "
    "aggregates, a broadcast-sized per-dim join; top-50 fully tie-broken. "
    "Quantized-exact up to n*|v|*1e6 < 9e18, i.e. billions of vectors",
)
def embedding_outlier_scores(spark, sf):
    emb = _t(spark, sf, "embeddings")
    e = emb.select("vec_id", F.posexplode("embedding").alias("dim", "v")).select(
        "vec_id",
        "dim",
        F.floor(F.col("v").cast("double") * F.lit(1000000.0))
        .cast("long")
        .alias("v6"),
    )
    d = e.groupBy("dim").agg(
        F.sum("v6").cast("long").alias("mean_num"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    dev = e.join(F.broadcast(d), "dim").select(
        "vec_id",
        "n",
        (F.col("v6") * F.col("n") - F.col("mean_num"))
        .cast("decimal(38,0)")
        .alias("d6"),
    )
    sc = dev.groupBy("vec_id").agg(
        F.sum(F.col("d6") * F.col("d6")).cast("double").alias("q"),
        F.max("n").alias("n"),
    )
    dist2 = F.col("q") / (
        F.lit(1_000_000_000_000.0) * F.col("n").cast("double") * F.col("n").cast("double")
    )
    rk = F.row_number().over(Window.orderBy(dist2.desc(), "vec_id"))
    return (
        sc.select("vec_id", dist2.alias("dist2"), rk.cast("int").alias("rk"))
        .filter(F.col("rk") <= 50)
    )


# --------------------------------------------------------------------------
# Explicit GROUPING SETS (completes the rollup/cube SQL surface)
# --------------------------------------------------------------------------


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items,
           GROUPING(l_returnflag, l_linestatus) AS gid
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS — the non-hierarchical subtotal shape "
    "rollup/cube can't express (per-flag totals + per-status totals + "
    "grand total, but no (flag, status) cells — rollup/cube over the same columns always include them). Spark plans one Expand "
    "(3 replicas) + hash-agg, a single scan; decimal-exact money",
)
def grouping_sets_revenue(spark, sf):
    li = _t(spark, sf, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC6)
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"], []], "l_returnflag", "l_linestatus"
    ).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
        F.grouping_id().alias("gid"),
    )


# --------------------------------------------------------------------------
# Incremental aggregate maintenance (operators/incremental.py)
# --------------------------------------------------------------------------


@register(
    "incremental_agg_merge",
    oracle=f"""
    SELECT {EV_MS} // {DAY_MS} AS day_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_v, MAX(value) AS max_v,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_value
    FROM events GROUP BY day_id, event_type
    """,
    doc="Incremental rollup maintenance proof: facts split into two "
    "batches (days < 15 / rest), each aggregated to MERGEABLE partial "
    "state (count/decimal-sum/min/max — avg derived only at read time), "
    "states merged, then finalized; the oracle aggregates the raw facts "
    "directly, so the hash match proves merge(partial(A), partial(B)) == "
    "direct(A+B) cross-engine. The O(batch)-per-refresh pattern that "
    "replaces O(history) recomputes at 100 TB (operators/incremental.py)",
)
def incremental_agg_merge(spark, sf):
    from ..operators.incremental import (finalize_state, merge_states,
                                         partial_daily_state)

    ev = _t(spark, sf, "events")
    old = ev.filter(F.expr(f"ts_ms div {DAY_MS}") < F.lit(19723 + 15))
    new = ev.filter(F.expr(f"ts_ms div {DAY_MS}") >= F.lit(19723 + 15))
    merged = merge_states(
        partial_daily_state(old), partial_daily_state(new)
    )
    out = finalize_state(merged)
    return out.select(
        "day_id", "event_type", "n", "sum_value", "min_v", "max_v", "avg_value"
    )


@register(
    "ivm_rollup_from_cdf",
    oracle=f"""
    WITH ev AS (SELECT event_id, {EV_MS} AS ts_ms, event_type, value
                FROM events),
    final AS (
      SELECT event_id, ts_ms, event_type,
             CASE WHEN event_id % 11 = 0 THEN value + 5.0 ELSE value END
               AS value
      FROM ev
      WHERE NOT (event_id % 13 = 0 AND event_id % 11 <> 0))
    SELECT ts_ms // {DAY_MS} AS day_id, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS avg_value
    FROM final GROUP BY day_id, event_type
    """,
    doc="Incremental view maintenance WITH RETRACTIONS through the real "
    "storage loop (operators/incremental.refresh_from_change_feed over "
    "sinks/versioned.table_changes): events seed a versioned fact table "
    "in two appends, the daily rollup is built from their change feed "
    "(pure inserts), then a change_feed=True MERGE triad mutates the "
    "facts (value updates on the %11 residue, deletes on %13 minus the "
    "update overlap) and ONLY that commit's change rows fold into the "
    "rollup — updates net to their value delta, deletes subtract, "
    "zeroed groups drop. The oracle aggregates the FINAL fact state "
    "directly, so the hash match proves maintained-state == recompute "
    "across an update/delete workload — the O(changes)-per-refresh "
    "contract that replaces O(history) rescans at 100 TB",
)
def ivm_rollup_from_cdf(spark, sf):
    import shutil
    import tempfile

    from ..operators.incremental import refresh_from_change_feed
    from ..sinks.versioned import (append_version, latest_version,
                                   merge_version, read_version,
                                   table_changes)

    ev = _t(spark, sf, "events").select(
        "event_id", "ts_ms", "event_type", "value"
    )
    tmp = tempfile.mkdtemp(prefix="clx_ivm_")
    facts, rollup = tmp + "/facts", tmp + "/rollup"
    try:
        append_version(
            ev.filter(F.col("event_id") % 2 == 0).coalesce(1), facts,
            stats_cols=["event_id"],
        )
        append_version(
            ev.filter(F.col("event_id") % 2 == 1).coalesce(1), facts,
            stats_cols=["event_id"],
        )
        refresh_from_change_feed(
            spark, table_changes(spark, facts, -1), rollup,
            txn=("ivm", latest_version(facts)),
        )
        upd = ev.filter(F.col("event_id") % 11 == 0).withColumn(
            "value", F.col("value") + 5.0
        )
        dels = ev.filter(F.col("event_id") % 13 == 0).select("event_id")
        v_before = latest_version(facts)
        merge_version(upd, facts, keys=["event_id"], deletes=dels,
                      change_feed=True)
        refresh_from_change_feed(
            spark, table_changes(spark, facts, v_before), rollup,
            txn=("ivm", latest_version(facts)),
        )
        out = (
            read_version(spark, rollup)
            .select(
                "day_id", "event_type", "n",
                F.col("sum_v").cast("double").alias("sum_value"),
                (F.col("sum_v").cast("double") / F.col("n").cast("double"))
                .alias("avg_value"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@register(
    "ivm_rollup_extrema_from_cdf",
    oracle=f"""
    WITH ev AS (SELECT event_id, {EV_MS} AS ts_ms, event_type, value
                FROM events),
    final AS (
      SELECT event_id, ts_ms, event_type,
             CASE WHEN event_id % 11 = 0 THEN value + 5.0 ELSE value END
               AS value
      FROM ev
      WHERE NOT (event_id % 13 = 0 AND event_id % 11 <> 0))
    SELECT ts_ms // {DAY_MS} AS day_id, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           MIN(value) AS min_v, MAX(value) AS max_v
    FROM final GROUP BY day_id, event_type
    """,
    doc="IVM with EXACT EXTREMA under retraction (the aggregate family "
    "ivm_rollup_from_cdf deliberately excludes): min/max don't merge "
    "under deletion, so refresh_from_change_feed(facts=snapshot) "
    "recomputes them for TOUCHED groups only — a semi-join of the fact "
    "snapshot onto the bounded touched-group set, untouched groups "
    "keep stored extrema (recompute-on-retraction, the strategy "
    "engines with multiset state pay memory for). Same workload as the "
    "sibling query: two appends, then a change_feed MERGE with value "
    "updates (%11, which MOVE each group's max up by 5) and deletes "
    "(%13, which can REMOVE a group's extremum — the case naive "
    "stale-extrema maintenance gets wrong); the oracle recomputes the "
    "final state directly, so the hash proves maintained extrema == "
    "true extrema after both update- and delete-driven movement",
)
def ivm_rollup_extrema_from_cdf(spark, sf):
    import shutil
    import tempfile

    from ..operators.incremental import refresh_from_change_feed
    from ..sinks.versioned import (append_version, latest_version,
                                   merge_version, read_version,
                                   table_changes)

    ev = _t(spark, sf, "events").select(
        "event_id", "ts_ms", "event_type", "value"
    )
    tmp = tempfile.mkdtemp(prefix="clx_ivmx_")
    facts, rollup = tmp + "/facts", tmp + "/rollup"
    try:
        append_version(
            ev.filter(F.col("event_id") % 2 == 0).coalesce(1), facts,
            stats_cols=["event_id"],
        )
        append_version(
            ev.filter(F.col("event_id") % 2 == 1).coalesce(1), facts,
            stats_cols=["event_id"],
        )
        refresh_from_change_feed(
            spark, table_changes(spark, facts, -1), rollup,
            txn=("ivm", latest_version(facts)),
            facts=read_version(spark, facts),
        )
        upd = ev.filter(F.col("event_id") % 11 == 0).withColumn(
            "value", F.col("value") + 5.0
        )
        dels = ev.filter(F.col("event_id") % 13 == 0).select("event_id")
        v_before = latest_version(facts)
        merge_version(upd, facts, keys=["event_id"], deletes=dels,
                      change_feed=True)
        refresh_from_change_feed(
            spark, table_changes(spark, facts, v_before), rollup,
            txn=("ivm", latest_version(facts)),
            facts=read_version(spark, facts),
        )
        out = (
            read_version(spark, rollup)
            .select(
                "day_id", "event_type", "n",
                F.col("sum_v").cast("double").alias("sum_value"),
                "min_v", "max_v",
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# Snapshot diffing and distribution profiling
# --------------------------------------------------------------------------


@register(
    "snapshot_diff",
    oracle="""
    WITH old AS (SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_orderkey % 10 <> 0),
    new AS (SELECT o_orderkey,
                   CASE WHEN o_orderkey % 7 = 0
                        THEN o_totalprice + 1.0 ELSE o_totalprice END
                     AS o_totalprice
            FROM orders WHERE o_orderkey % 13 <> 0)
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           o.o_totalprice AS old_value,
           n.o_totalprice AS new_value
    FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey
    WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
       OR o.o_totalprice <> n.o_totalprice
    """,
    doc="Table-snapshot diff (the regression check between two pipeline "
    "runs / table versions): keyed full-outer join classifying every key "
    "as added / removed / changed, unchanged rows filtered out so the "
    "diff is change-sized, not table-sized. Snapshots here are two "
    "deterministic residue-class views of orders; in production the two "
    "sides are yesterday's and today's parquet — same single-shuffle "
    "co-partitioned join on the key",
)
def snapshot_diff(spark, sf):
    orders = _t(spark, sf, "orders")
    old = orders.filter(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey", F.col("o_totalprice").alias("old_value")
    )
    new = orders.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")).alias("new_value"),
    )
    j = old.join(new, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("old_value").isNull(), "added")
        .when(F.col("new_value").isNull(), "removed")
        .otherwise("changed")
    )
    return j.filter(
        F.col("old_value").isNull()
        | F.col("new_value").isNull()
        | (F.col("old_value") != F.col("new_value"))
    ).select("o_orderkey", change.alias("change_type"), "old_value", "new_value")


@register(
    "column_gini_profile",
    oracle="""
    WITH src AS (
      SELECT 'o_orderstatus' AS col, CAST(o_orderstatus AS VARCHAR) AS v
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderdate', CAST(o_orderdate AS VARCHAR) FROM orders),
    c AS (SELECT col, v, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM src GROUP BY col, v),
    s AS (SELECT col, CAST(SUM(cnt * cnt) AS BIGINT) AS sum_c2,
                 CAST(SUM(cnt) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS ndv
          FROM c GROUP BY col)
    SELECT col, n, ndv,
           1.0 - CAST(sum_c2 AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS gini_impurity
    FROM s
    """,
    doc="Per-column Gini impurity (1 - sum p^2) — the log-free "
    "concentration profile (entropy's rational cousin: ln() differs in "
    "the last ulp across engines, sum(c^2) is an exact BIGINT): 0 = "
    "constant column, ->1 = uniform high-cardinality. Drift in it "
    "flags distribution shifts between pipeline runs. One unpivot + two "
    "keyed aggregates, value space bounded by per-column NDV",
)
def column_gini_profile(spark, sf):
    orders = _t(spark, sf, "orders")
    legs = [
        orders.select(
            F.lit(c).alias("col"), F.col(c).cast("string").alias("v")
        )
        for c in ("o_orderstatus", "o_orderpriority", "o_orderdate")
    ]
    src = legs[0].unionByName(legs[1]).unionByName(legs[2])
    c = src.groupBy("col", "v").agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    s = c.groupBy("col").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sum_c2"),
        F.sum("cnt").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("ndv"),
    )
    return s.select(
        "col",
        "n",
        "ndv",
        (
            F.lit(1.0)
            - F.col("sum_c2").cast("double")
            / (F.col("n").cast("double") * F.col("n").cast("double"))
        ).alias("gini_impurity"),
    )


SESSION_GAP_MS = 1_800_000  # 30 min inactivity breaks a session


@register(
    "session_entry_exit_stats",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_type, {EV_MS} AS ts_ms, event_id,
             CASE WHEN {EV_MS} - LAG({EV_MS}) OVER w > {SESSION_GAP_MS}
                  OR LAG({EV_MS}) OVER w IS NULL THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY {EV_MS}, event_id)),
    s AS (SELECT user_id, event_type, ts_ms, event_id,
                 SUM(brk) OVER (PARTITION BY user_id
                                ORDER BY ts_ms, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
          FROM e),
    sel AS (SELECT user_id, session_id,
                   FIRST_VALUE(event_type) OVER ws AS entry_type,
                   LAST_VALUE(event_type) OVER ws AS exit_type
            FROM s
            WINDOW ws AS (PARTITION BY user_id, session_id
                          ORDER BY ts_ms, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)),
    agg AS (SELECT user_id, session_id,
                   MIN(entry_type) AS entry_type, MIN(exit_type) AS exit_type,
                   COUNT(*) AS n_events
            FROM sel GROUP BY user_id, session_id)
    SELECT entry_type, exit_type,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces
    FROM agg GROUP BY entry_type, exit_type
    """,
    doc="Session entry/exit matrix with bounce counts: 30-min-gap "
    "sessionization (per-user LAG + running break sum — the islands "
    "pattern of w3_islands_sessionize), then argmin/argmax by "
    "(ts, event_id) picks each session's first and last event in one "
    "keyed aggregate (min_by/max_by, no second window pass). The "
    "landing/exit-page analytics primitive; fully deterministic "
    "tie-break via event_id",
)
def session_entry_exit_stats(spark, sf):
    ev = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    lagged = ev.select(
        "user_id", "event_type", "ts_ms", "event_id",
        F.lag("ts_ms").over(w).alias("prev_ms"),
    ).withColumn(
        "brk",
        F.when(
            F.col("prev_ms").isNull()
            | (F.col("ts_ms") - F.col("prev_ms") > SESSION_GAP_MS),
            1,
        ).otherwise(0),
    )
    s = lagged.withColumn(
        "session_id",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    key = F.struct("ts_ms", "event_id")
    agg = s.groupBy("user_id", "session_id").agg(
        F.min_by("event_type", key).alias("entry_type"),
        F.max_by("event_type", key).alias("exit_type"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return agg.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_bounces"),
    )


@register(
    "daily_type_correlation",
    oracle=f"""
    WITH d AS (SELECT {EV_MS} // {DAY_MS} AS day_id, event_type,
                      CAST(SUM(CAST(floor(value * 100.0) AS BIGINT))
                        AS BIGINT) AS v
               FROM events GROUP BY day_id, event_type),
    p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                 CAST(COUNT(*) AS HUGEINT) AS n,
                 CAST(SUM(CAST(a.v AS HUGEINT)) AS HUGEINT) AS sx,
                 CAST(SUM(CAST(b.v AS HUGEINT)) AS HUGEINT) AS sy,
                 CAST(SUM(CAST(a.v AS HUGEINT) * b.v) AS HUGEINT) AS sxy,
                 CAST(SUM(CAST(a.v AS HUGEINT) * a.v) AS HUGEINT) AS sxx,
                 CAST(SUM(CAST(b.v AS HUGEINT) * b.v) AS HUGEINT) AS syy
          FROM d a JOIN d b
            ON a.day_id = b.day_id AND a.event_type < b.event_type
          GROUP BY type_a, type_b)
    SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr
    FROM p
    """,
    doc="Pairwise Pearson correlation of event types' daily totals: "
    "values micro-quantized to integer cents so the five sufficient "
    "statistics (n, Sx, Sy, Sxy, Sxx, Syy) are EXACT integers "
    "(DECIMAL(38,0) / HUGEINT — order-independent), converted to double "
    "only in the final closed-form ratio (each conversion one correctly-"
    "rounded step, same contract as trend_slope_by_type). The co-"
    "movement / multivariate-drift profile over the tiny (type x type) "
    "matrix; the self-join runs on the AGGREGATED daily table",
)
def daily_type_correlation(spark, sf):
    ev = _t(spark, sf, "events")
    d = ev.groupBy(
        F.expr(f"ts_ms div {DAY_MS}").alias("day_id"), "event_type"
    ).agg(
        F.sum(F.floor(F.col("value") * 100.0).cast("long"))
        .cast("long")
        .alias("v")
    )
    a = d.select("day_id", F.col("event_type").alias("type_a"),
                 F.col("v").cast("decimal(38,0)").alias("va"))
    b = d.select("day_id", F.col("event_type").alias("type_b"),
                 F.col("v").cast("decimal(38,0)").alias("vb"))
    p = (
        a.join(b, "day_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum("va").cast("decimal(38,0)").alias("sx"),
            F.sum("vb").cast("decimal(38,0)").alias("sy"),
            F.sum(F.col("va") * F.col("vb")).cast("decimal(38,0)").alias("sxy"),
            F.sum(F.col("va") * F.col("va")).cast("decimal(38,0)").alias("sxx"),
            F.sum(F.col("vb") * F.col("vb")).cast("decimal(38,0)").alias("syy"),
        )
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    denx = F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
    deny = F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    return p.select(
        "type_a", "type_b",
        F.col("n").cast("long").alias("n_days"),
        (num / (denx * deny)).alias("corr"),
    )


@register(
    "table_profile",
    oracle="""
    WITH m AS (
      SELECT 'o_orderkey' AS col,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
      FROM orders
      UNION ALL
      SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT o_custkey) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) FROM orders
      UNION ALL
      SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
             CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders)
    SELECT col, n_rows, n_nulls, n_distinct,
           CAST(n_nulls AS DOUBLE) / CAST(n_rows AS DOUBLE) AS null_fraction
    FROM m
    """,
    doc="One-pass table profiler: per-column row count, null count, "
    "exact distinct count, and null fraction for the orders table — the "
    "data-quality summary every ingest job publishes. Spark computes "
    "ALL columns' metrics in a single multi-aggregate scan (one job, "
    "expand + partial aggs) and unpivots the 1-row result with stack(); "
    "the oracle's 6-scan UNION ALL is the semantic spec, not the plan. "
    "Exact count_distinct here is the audit variant; the monitoring "
    "path swaps in approx_count_distinct (see sketch_daily_users) when "
    "per-column NDV state would otherwise dominate the shuffle",
)
def table_profile(spark, sf):
    orders = load_table(spark, sf, "orders")
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"{c}__nulls")
        )
        aggs.append(F.count_distinct(F.col(c)).cast("long").alias(f"{c}__ndv"))
    row = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__ndv" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col, n_nulls, n_distinct)"
        ),
        "n_rows",
    ).select(
        "col",
        "n_rows",
        "n_nulls",
        "n_distinct",
        (F.col("n_nulls").cast("double") / F.col("n_rows").cast("double")).alias(
            "null_fraction"
        ),
    )
