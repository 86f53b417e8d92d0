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


from ..operators import multimodal as MM

# shared stub-decode oracle fragment: identical sha256-derived arithmetic
# as operators/multimodal.py::decode_stub (60-bit digest prefix)
_MM_H = "CAST('0x' || substr(sha256(text), 1, 15) AS BIGINT)"
_MM_DECODE = f"""
    f AS (SELECT doc_id AS asset_id, sha256(text) AS sha256, {_MM_H} AS h
          FROM documents),
    feat AS (SELECT asset_id, sha256,
                    CAST(64 + h % {MM.W_MOD} AS INTEGER) AS width,
                    CAST(64 + (h // {MM.W_MOD}) % {MM.H_MOD} AS INTEGER) AS height,
                    (h % {MM.BRIGHT_MOD}) / {MM.BRIGHT_MOD}.0 AS mean_brightness,
                    1000 + h % {MM.DUR_MOD} AS duration_ms
             FROM f)
"""


@register(
    "mm_image_resize",
    oracle=f"""
    WITH {_MM_DECODE}
    SELECT asset_id, sha256, width, height, mean_brightness,
           CAST(GREATEST(1, FLOOR(width * 64.0 / GREATEST(width, height))) AS INTEGER) AS out_w,
           CAST(GREATEST(1, FLOOR(height * 64.0 / GREATEST(width, height))) AS INTEGER) AS out_h
    FROM feat
    """,
    doc="Multimodal 1:1 path: binary payload -> mapInPandas decode+feature "
    "extraction (decode stubbed as sha256-derived arithmetic, so the "
    "pandas-UDF output is fully hash-checked against DuckDB) -> JVM-side "
    "aspect-preserving resize plan",
)
def mm_image_resize(spark, sf):
    docs = load_table(spark, sf, "documents")
    feats = MM.image_features(MM.media_assets(docs))
    return MM.resize_plan(feats, max_side=64)


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH {_MM_DECODE}
    SELECT asset_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(i * {MM.FRAME_STRIDE_MS} AS BIGINT) AS frame_ts_ms,
           CAST((duration_ms + {MM.FRAME_STRIDE_MS - 1}) // {MM.FRAME_STRIDE_MS} AS INTEGER) AS n_frames
    FROM feat,
         UNNEST(generate_series(0,
           CAST((duration_ms + {MM.FRAME_STRIDE_MS - 1}) // {MM.FRAME_STRIDE_MS} AS INTEGER) - 1)) AS t(i)
    """,
    doc="Multimodal 1:N path (UDTF shape): each asset expands to "
    "ceil(duration/stride) frame rows inside mapInPandas — data-dependent "
    "output cardinality, Arrow-batched; frame times hash-checked",
)
def mm_frame_sample(spark, sf):
    docs = load_table(spark, sf, "documents")
    return MM.frame_sample(MM.media_assets(docs))


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
