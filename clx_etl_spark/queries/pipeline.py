"""Pipeline-shaped queries: idempotent upsert semantics and multimodal
column plumbing (the reference's sink contracts re-expressed over the
driver testdata).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.watermark import latest_per_key
from . import register


@register(
    "k1_upsert_last_wins",
    oracle="""
    WITH updates AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 1.0 AS o_totalprice,
             o_orderdate, o_orderpriority, 1 AS version
      FROM orders WHERE o_orderkey % 10 = 0),
    unioned AS (
      SELECT o_orderkey, o_totalprice, 0 AS version FROM orders
      UNION ALL
      SELECT o_orderkey, o_totalprice, version FROM updates),
    merged AS (
      SELECT o_orderkey, o_totalprice FROM (
        SELECT o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
        FROM unioned) WHERE rn = 1)
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM merged
    """,
    doc="K1 MERGE upsert semantics (reference mysql/__init__.py:64-82): "
    "re-applying an update batch is idempotent; verified via last-wins "
    "window dedup — row count unchanged, updated measure visible",
)
def k1_upsert_last_wins(spark, sf):
    orders = load_table(spark, sf, "orders")
    base = orders.select("o_orderkey", "o_totalprice", F.lit(0).alias("version"))
    updates = (
        orders.filter(F.col("o_orderkey") % 10 == 0)
        .select("o_orderkey", (F.col("o_totalprice") + 1.0).alias("o_totalprice"), F.lit(1).alias("version"))
    )
    merged = latest_per_key(base.unionByName(updates), ["o_orderkey"], order_col="version")
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("total"),
    )


@register(
    "mm_media_metadata",
    oracle=None,  # binary payloads + pandas UDF: non-SQL-expressible (rows-only check)
    doc="Multimodal plumbing: documents -> opaque binary payload column -> "
    "mapInPandas feature extraction (decode step stubbed deterministically; "
    "schema/partitioning/batch shape are the real, tested surface)",
)
def mm_media_metadata(spark, sf):
    docs = load_table(spark, sf, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text/plain").alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
    )
    out_schema = "asset_id long, mime string, n_bytes long, sha256 string, feat_dim int"

    def extract(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(bytes(b)).hexdigest()),
                    # real decode (image resize / audio frames) is stubbed:
                    # deterministic fake feature dimensionality
                    "feat_dim": payloads.map(lambda b: 64).astype("int32"),
                }
            )

    return assets.mapInPandas(extract, schema=out_schema)
