"""Reusable Column helpers — the engine's scalar-function surface.

These are the Spark re-expressions of the reference's module-level Python
helpers (SURVEY §2.10): all native Column expressions so Catalyst can fold
and push them; no row-at-a-time Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# ---------------------------------------------------------------------------
# time alignment (reference: src/utils/__init__.py:20-29, _base_.py:276-277)
# ---------------------------------------------------------------------------


def align_ms(col: Column | str, interval_ms: int) -> Column:
    """Floor an epoch-ms column to an interval boundary: ts - ts % I.
    Pure integer arithmetic — exact for any long, unlike float division."""
    c = F.col(col) if isinstance(col, str) else col
    c = c.cast("long")
    return (c - (c % F.lit(interval_ms))).cast("long")


def align_to_5m(col: Column | str) -> Column:
    return align_ms(col, 300_000)


def dt_str(ts_ms: Column | str) -> Column:
    """epoch-ms -> 'yyyy-MM-dd HH:mm:ss' string (UTC; the reference mixed
    local/UTC — reference src/exchanges/_base_.py:310 — we standardize)."""
    c = F.col(ts_ms) if isinstance(ts_ms, str) else ts_ms
    return F.date_format(F.timestamp_millis(c.cast("long")), "yyyy-MM-dd HH:mm:ss")


def ts_to_timestamp(ts_ms: Column | str) -> Column:
    c = F.col(ts_ms) if isinstance(ts_ms, str) else ts_ms
    return F.timestamp_millis(c.cast("long"))


# ---------------------------------------------------------------------------
# decimal-string precision helpers (reference: src/utils/__init__.py:5-17)
# ---------------------------------------------------------------------------


def precision_of(dec_str: Column | str) -> Column:
    """Number of significant decimals of a decimal string, trailing zeros
    stripped: '0.001000' -> 3, '1.0' -> 0, '5' -> 0."""
    c = F.col(dec_str) if isinstance(dec_str, str) else dec_str
    stripped = F.regexp_replace(c, r"0+$", "")
    frac = F.regexp_extract(stripped, r"\.(\d+)$", 1)
    return F.length(frac)


def to_decimal_str(precision: Column | str) -> Column:
    """precision -> fixed decimal string without scientific notation:
    3 -> '0.001', 0 -> '1'."""
    p = F.col(precision) if isinstance(precision, str) else precision
    return F.when(p <= 0, F.lit("1")).otherwise(
        F.concat(F.lit("0."), F.repeat(F.lit("0"), (p - 1).cast("int")), F.lit("1"))
    )


# ---------------------------------------------------------------------------
# deterministic hashing / tokenization (dedup + fingerprint building blocks)
# md5 is used (not xxhash64) because the DuckDB oracle computes the byte-
# identical hex digest, making every hash-derived operator cross-checkable.
# ---------------------------------------------------------------------------


def md5_hex(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("binary"))


def md5_long(col: Column | str) -> Column:
    """First 15 hex chars of md5 as a non-negative 60-bit long."""
    return F.conv(F.substring(md5_hex(col), 1, 15), 16, 10).cast("long")


def tokens(text: Column | str) -> Column:
    """Whitespace tokens, empties removed, order preserved."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(c, r"\s+"), lambda w: w != "")


def word_shingles(toks: Column, k: int = 3) -> Column:
    """Ordered k-word shingles joined by single spaces; [] if < k tokens."""
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - F.lit(k))
    shingle = lambda i: F.concat_ws(" ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(k)])
    return F.when(n >= F.lit(k), F.transform(idx, shingle)).otherwise(
        F.array().cast("array<string>")
    )


# ---------------------------------------------------------------------------
# probability normalization (reference: src/macro_markets/kalshi.py:77-98)
# ---------------------------------------------------------------------------


def normalize_probs(yes_cents: Column, no_cents: Column) -> tuple[Column, Column]:
    """(yes_bid, no_bid) in cents -> renormalized probabilities summing to 1;
    null-propagating, (0,0) -> (null, null)."""
    y = yes_cents.cast("double") / F.lit(100.0)
    n = no_cents.cast("double") / F.lit(100.0)
    total = y + n
    ok = total > F.lit(0.0)
    return (
        F.when(ok, y / total).otherwise(F.lit(None).cast("double")),
        F.when(ok, n / total).otherwise(F.lit(None).cast("double")),
    )


# ---------------------------------------------------------------------------
# interval snapping (reference: src/exchanges/okx/perp.py:192-205)
# ---------------------------------------------------------------------------

COMMON_FUNDING_INTERVALS_MIN = (60, 120, 180, 240, 360, 480, 720)


def snap_to_intervals(minutes: Column, candidates: tuple[int, ...] = COMMON_FUNDING_INTERVALS_MIN) -> Column:
    """Nearest candidate interval by absolute distance (ties -> smaller
    candidate, matching Python min() first-wins over the sorted tuple)."""
    arr = F.array(*[F.lit(c) for c in candidates])
    return F.array_min(
        F.transform(arr, lambda c: F.struct(F.abs(minutes - c).alias("d"), c.alias("c")))
    )["c"]


# ---------------------------------------------------------------------------
# scan-parallelism guard (optimization guide §2.5 "input skew: one huge
# unsplittable file ... repartition immediately after the read")
# ---------------------------------------------------------------------------


def ensure_min_parallelism(df, factor: int = 2):
    """Round-robin repartition a DataFrame whose current partitioning is
    below the cluster's default parallelism — the single-unsplittable-
    row-group case, where every downstream map stage (tokenization,
    shingling, hashing, signature folds) would otherwise run on ONE core
    until the first exchange. No-op on healthily partitioned input (a
    real multi-file scan), so it never adds an exchange at cluster
    scale; when it fires, the exchange moves the raw rows once and every
    per-row stage after it is parallel. Results are unaffected: callers
    are operators whose outputs are aggregations/joins over the rows,
    not row-order-sensitive folds.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(factor * par)
    return df
