"""Reference-parity queries for the SURVEY §2 rows not covered by core.py:
J4 (double left tag-join), U2 (set difference), A6 (distinct-agg per group),
F6 (freshness anti-join), T2 (enum map + string split), T3/T4 (decimal-string
precision round-trip), T12 (coalesce/element_at tag fallback).

Every aggregate/computed column is aliased identically in the Spark plan and
the DuckDB oracle SQL (driver hash-compares after sorting columns by name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..catalog import load_table
from ..functions import precision_of, to_decimal_str
from ..operators.watermark import high_watermark
from . import register

# events.ts (ns) -> ms, shared oracle fragment (catalog reads it as nanosAsLong)
EV_MS = "(epoch_ns(ts) // 1000000)"


def _t(spark: SparkSession, sf: str, name: str) -> DataFrame:
    return load_table(spark, sf, name)


@register(
    "j4_double_left_tags",
    oracle="""
    WITH supp_tags AS (SELECT s_suppkey, s_name FROM supplier WHERE s_acctbal > 5000),
         part_tags AS (SELECT p_partkey, p_brand FROM part WHERE p_size >= 25)
    SELECT l_orderkey, l_linenumber, s_name AS supp_tag, p_brand AS part_tag
    FROM lineitem
      LEFT JOIN supp_tags ON l_suppkey = s_suppkey
      LEFT JOIN part_tags ON l_partkey = p_partkey
    """,
    doc="J4: the same fact left-joined to two tag dimensions on different "
    "keys, unmatched rows keep nulls (reference oklink/fetcher.py:155-190 "
    "from/to address-tag enrichment); both dims broadcast",
)
def j4_double_left_tags(spark, sf):
    li = _t(spark, sf, "lineitem")
    supp_tags = (
        _t(spark, sf, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select("s_suppkey", F.col("s_name").alias("supp_tag"))
    )
    part_tags = (
        _t(spark, sf, "part")
        .filter(F.col("p_size") >= 25)
        .select("p_partkey", F.col("p_brand").alias("part_tag"))
    )
    return (
        li.join(F.broadcast(supp_tags), li.l_suppkey == supp_tags.s_suppkey, "left")
        .join(F.broadcast(part_tags), li.l_partkey == part_tags.p_partkey, "left")
        .select("l_orderkey", "l_linenumber", "supp_tag", "part_tag")
    )


@register(
    "u2_except_unseen",
    oracle="""
    SELECT DISTINCT o_custkey AS custkey FROM orders
    EXCEPT
    SELECT DISTINCT user_id AS custkey FROM events
    """,
    doc="U2: set difference — customers who ordered but never emitted an "
    "event (reference kalshi.py:164 markets-minus-finalized); EXCEPT "
    "compiles to a distinct + null-safe anti-join",
)
def u2_except_unseen(spark, sf):
    ordered = _t(spark, sf, "orders").select(F.col("o_custkey").alias("custkey"))
    seen = _t(spark, sf, "events").select(F.col("user_id").alias("custkey"))
    return ordered.distinct().exceptAll(seen.distinct())


@register(
    "a6_distinct_users",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
    doc="A6: distinct key-set per group (reference oklink/fetcher.py:155-158 "
    "per-chain address sets); also the engine's distinct-agg surface — "
    "Spark plans it as a two-phase partial/final expand",
)
def a6_distinct_users(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# 2024-01-28 00:00:00 UTC — inside the events table's Jan-2024 span
F6_CUTOFF_MS = 1_706_400_000_000


@register(
    "f6_stale_keys",
    oracle=f"""
    WITH last AS (SELECT user_id, MAX({EV_MS}) AS last_ms FROM events GROUP BY user_id)
    SELECT user_id, last_ms FROM last WHERE last_ms < {F6_CUTOFF_MS}
    """,
    doc="F6: freshness skip — keys whose high-watermark is older than the "
    "cutoff need a refetch; fresh keys are anti-joined away (reference "
    "bybit/perp.py:200-203 next_funding_time skip)",
)
def f6_stale_keys(spark, sf):
    ev = _t(spark, sf, "events")
    last = high_watermark(ev, ["user_id"], ts_col="ts_ms").withColumnRenamed(
        "watermark_ts", "last_ms"
    )
    fresh = last.filter(F.col("last_ms") >= F6_CUTOFF_MS).select("user_id")
    return last.join(fresh, "user_id", "left_anti")


@register(
    "t2_normalize_enum_split",
    oracle="""
    SELECT doc_id,
           CASE lang WHEN 'en' THEN 0 WHEN 'zh' THEN 1 WHEN 'fr' THEN 2
                     WHEN 'es' THEN 3 WHEN 'de' THEN 4 ELSE -1 END AS lang_id,
           CAST(regexp_extract(source, 'src(\\d+)', 1) AS INTEGER) AS source_num,
           upper(lang) AS lang_uc
    FROM documents
    """,
    doc="T2: symbol normalization — status-string -> TINYINT enum via CASE "
    "ladder + id extraction by string split (reference binance/perp.py:58-66 "
    "status_map, okx/perp.py:36-37 instFamily split)",
)
def t2_normalize_enum_split(spark, sf):
    docs = _t(spark, sf, "documents")
    lang_map = {"en": 0, "zh": 1, "fr": 2, "es": 3, "de": 4}
    lang_id = F.lit(-1)
    for k, v in reversed(lang_map.items()):
        lang_id = F.when(F.col("lang") == k, v).otherwise(lang_id)
    return docs.select(
        "doc_id",
        lang_id.alias("lang_id"),
        F.regexp_extract("source", r"src(\d+)", 1).cast("int").alias("source_num"),
        F.upper("lang").alias("lang_uc"),
    )


@register(
    "t3_t4_precision_roundtrip",
    oracle=r"""
    WITH t AS (
      SELECT p_partkey % 7 AS p,
             CASE WHEN p_partkey % 7 <= 0 THEN '1'
                  ELSE '0.' || repeat('0', CAST(p_partkey % 7 AS INTEGER) - 1) || '1'
             END AS tick
      FROM part)
    SELECT p, tick,
           LENGTH(regexp_extract(regexp_replace(tick, '0+$', ''), '\.(\d+)$', 1)) AS parsed_p,
           COUNT(*) AS n
    FROM t GROUP BY p, tick
    """,
    doc="T3/T4 round-trip: precision -> fixed decimal string -> parsed "
    "precision (reference utils/__init__.py:5-17; tick_size fidelity, "
    "models.py:63-64). parsed_p == p for p >= 1, both map p=0 to '1'",
)
def t3_t4_precision_roundtrip(spark, sf):
    part = _t(spark, sf, "part")
    t = part.select(
        (F.col("p_partkey") % 7).alias("p"),
        to_decimal_str(F.col("p_partkey") % 7).alias("tick"),
    )
    return t.groupBy("p", "tick").agg(F.count(F.lit(1)).alias("n")).withColumn(
        "parsed_p", precision_of(F.col("tick"))
    ).select("p", "tick", "parsed_p", "n")


@register(
    "t12_coalesce_tags",
    oracle="""
    WITH m AS (SELECT event_id, event_type, value,
                      CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
               FROM events)
    SELECT event_id,
           COALESCE(CASE WHEN event_type = 'click' THEN k END,
                    CASE WHEN value > 10 THEN k END,
                    -1) AS tag
    FROM m
    """,
    doc="T12: tag fallback chain — entityTag ?? hoverEntityTag ?? default "
    "(reference oklink/fetcher.py:111-140 coalescing + entityTags[0])",
)
def t12_coalesce_tags(spark, sf):
    ev = _t(spark, sf, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select(
        "event_id",
        F.coalesce(
            F.when(F.col("event_type") == "click", k),
            F.when(F.col("value") > 10, k),
            F.element_at(F.array(F.lit(-1)), 1),
        ).alias("tag"),
    )
