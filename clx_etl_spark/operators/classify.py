"""Rule-based classification operators (SURVEY T11/T14, F5).

The reference classifies on-chain addresses by first-match keyword rules
(reference: src/macro_markets/oklink/fetcher.py:14-43) and picks per-series
thresholds by ticker prefix (src/macro_markets/kalshi.py:172-178). Both are
first-match-wins CASE cascades — Catalyst folds them into one projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# first-match-wins (label, keyword) rules, mirroring the shape of the
# reference's ENTITY_RULES table (contents here are generic).
DEFAULT_ENTITY_RULES: list[tuple[str, str]] = [
    ("exchange", "exchange"),
    ("exchange", "binance"),
    ("fund", "capital"),
    ("fund", "fund"),
    ("bridge", "bridge"),
    ("contract", "contract"),
    ("miner", "mining"),
]


def classify_first_match(
    text: Column, rules: list[tuple[str, str]] = DEFAULT_ENTITY_RULES
) -> Column:
    """Case-insensitive contains cascade; first matching rule's label wins;
    null for no match (T11)."""
    lowered = F.lower(text)
    expr = F.lit(None).cast("string")
    for label, kw in reversed(rules):
        expr = F.when(lowered.contains(kw.lower()), F.lit(label)).otherwise(expr)
    return expr


def threshold_by_prefix(
    key: Column,
    thresholds: dict[str, int],
    default: int = 300,
) -> Column:
    """Per-series threshold selected by key prefix, reference T14. Longer
    prefixes are applied first so the most specific rule wins."""
    expr = F.lit(default)
    for prefix in sorted(thresholds, key=len):
        expr = F.when(key.startswith(prefix), F.lit(thresholds[prefix])).otherwise(expr)
    return expr


def coalesce_tags(*tag_cols: Column) -> Column:
    """T12 tag cascade: first non-null of the tag sources."""
    return F.coalesce(*tag_cols)
