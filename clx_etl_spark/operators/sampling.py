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


def _hash_bucket(key: Column, mod: int = _GATE_MOD) -> Column:
    """THE cross-engine gate hash — first 8 md5 hex chars of the string
    key (32 bits, uniform), base-16, mod ``mod``. Every DuckDB oracle
    mirrors this exact expression; hash_gate and hash_split must share it
    so a sampled row and a split row always agree on their bucket."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % mod


def hash_gate(key: Column, permille: Column | int) -> Column:
    """True for rows whose stable hash bucket falls under ``permille``.
    Bucket = first 8 md5 hex chars of the key (32 bits, uniform), mod 1000."""
    bucket = _hash_bucket(key)
    return bucket < (
        permille if isinstance(permille, Column) else F.lit(permille)
    )


def temperature_mix(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    tau: float = 0.7,
    max_keep_permille: int = 1000,
) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual/multi-domain
    rebalance of LM pretraining): stratum s is kept at a rate
    proportional to count(s)^(tau-1), so tau=1 keeps natural proportions
    and tau->0 equalizes strata; the largest rate is anchored at
    ``max_keep_permille``.

    Per-stratum counts are ONE aggregate collected to the driver —
    bounded by the number of strata (domains/languages are dozens to
    thousands, never corpus-sized) — and the float rate derivation stays
    driver-side Python on purpose: pow() differs across engine libms in
    the last ulp, so deriving rates distributed would make keep/drop
    decisions engine-dependent. The gate itself is the deterministic
    hash_gate, so row fate is stable under corpus growth and re-runs.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(stratum_col).agg(F.count(F.lit(1))).collect()
    }
    if not counts:
        return df.filter(F.lit(False))
    weights = {s: float(n) ** (tau - 1.0) for s, n in counts.items()}
    top = max(weights.values())
    rates = {
        s: max(1, int(max_keep_permille * w / top)) for s, w in weights.items()
    }
    return stratified_sample(df, key_col, rates, stratum_col)


def temperature_mix_sqrt(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    max_keep_permille: int = 1000,
) -> DataFrame:
    """Temperature-scaled stratum rebalance at tau = 1/2, fully
    cluster-side and cross-engine exact — the registered-oracle variant of
    ``temperature_mix``.

    tau = 1/2 gives keep-rate(s) proportional to count(s)^(-1/2), anchored
    so the rarest stratum keeps ``max_keep_permille``:

        rate(s) = max_pm * sqrt(min_count / count(s))

    The closed form matters twice. (1) A single correctly-rounded sqrt of
    a correctly-rounded division is bit-identical on every IEEE-754 engine
    — unlike pow(), whose last-ulp varies by libm, which is why
    temperature_mix keeps its general-tau rates driver-side. (2) No
    driver round-trip at all: per-stratum counts stay a DataFrame, the
    min is a broadcast one-row join, and the gate is the stable hash —
    the whole operator is two map-side-combinable aggregates plus a
    narrow filter, at any corpus size.

    Returns the kept rows plus their stratum's ``rate_pm`` column.
    """
    cnt = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_n"))
    mn = cnt.agg(F.min("_n").alias("_min_n"))
    rates = cnt.crossJoin(F.broadcast(mn)).select(
        stratum_col,
        F.least(
            F.lit(max_keep_permille),
            F.floor(
                F.lit(float(max_keep_permille))
                * F.sqrt(F.col("_min_n").cast("double") / F.col("_n").cast("double"))
            ),
        ).alias("rate_pm"),
    )
    return df.join(F.broadcast(rates), stratum_col).filter(
        hash_gate(F.col(key_col), F.col("rate_pm"))
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


def quality_weighted_sample(
    df: DataFrame, key_col: str, rate_permille: Column
) -> DataFrame:
    """Doc-level quality-weighted downsampling (the FineWeb-style refine
    step): each row's keep probability is its OWN quality-derived permille
    rate, gated by the stable hash of its key — so the sample is
    reproducible across runs/engines and row fate never flips as the
    corpus grows. ``rate_permille`` is any integer Column in [0, 1000];
    derive it from quality signals with deterministic arithmetic (floor,
    not round). Narrow filter: no shuffle."""
    return df.filter(hash_gate(F.col(key_col), rate_permille))


def hash_split(
    key: Column, splits: list[tuple[str, int]], mod: int = _GATE_MOD
) -> Column:
    """Disjoint deterministic split assignment (train/val/test): the row's
    stable hash bucket is mapped through cumulative permille ranges, e.g.
    [("train", 800), ("val", 100), ("test", 100)]. Growth-stable: adding
    rows never reassigns existing ones (no RNG, no counting), so eval
    holdouts stay uncontaminated across incremental corpus builds. The
    last split absorbs any remainder. Pure narrow expression."""
    bucket = _hash_bucket(key, mod)
    bounds = []
    hi = 0
    for name, pm in splits[:-1]:
        hi += pm
        bounds.append((hi, name))
    expr = F.lit(splits[-1][0])
    for hi, name in reversed(bounds):
        expr = F.when(bucket < hi, F.lit(name)).otherwise(expr)
    return expr
