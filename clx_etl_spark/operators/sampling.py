"""Deterministic sampling for training-data pipelines.

A 100 TB corpus pipeline downsamples constantly (per-source quotas,
class rebalancing, eval holdouts). `df.sample`/`sampleBy` draw from a
per-task RNG — resampling a grown table reshuffles which rows are kept,
which poisons incremental pipelines and train/eval splits. Hash-gate
sampling instead derives keep/drop from a stable row key: a row's fate
never changes as the table grows, the same row lands in the same split
on every engine and every run, and no sampling state needs storing.

md5 is used as the gate hash (not xxhash64) deliberately: it is the one
hash both Spark and DuckDB compute identically, which is what makes the
operator oracle-checkable; at scale swap HASH_BITS to xxhash64 for speed
if cross-engine reproducibility isn't required.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# gate granularity: 8 hex chars = 32 bits; 2^32 % 1000 != 0, so buckets
# 0-295 are over-weighted by ~7e-5 relative — negligible for sampling, and
# 8 hex chars keeps the 16-digit conv() exact in both Spark and DuckDB
_GATE_MOD = 1_000


def hash_gate(key: Column, permille: Column | int) -> Column:
    """True for rows whose stable hash bucket falls under ``permille``.
    Bucket = first 8 md5 hex chars of the key (32 bits, uniform), mod 1000."""
    bucket = F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % _GATE_MOD
    return bucket < (
        permille if isinstance(permille, Column) else F.lit(permille)
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    rates_permille: dict[str, int],
    stratum_col: str,
    default_permille: int = 0,
) -> DataFrame:
    """Keep a deterministic per-stratum fraction: rate looked up per
    stratum (a CASE ladder — strata sets are small), gate by row-key hash.
    One narrow filter, no shuffle, no RNG, idempotent under re-runs."""
    rate = F.lit(default_permille)
    for stratum, pm in rates_permille.items():
        rate = F.when(F.col(stratum_col) == stratum, F.lit(pm)).otherwise(rate)
    return df.filter(hash_gate(F.col(key_col), rate))
