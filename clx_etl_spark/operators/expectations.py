"""Data-quality expectations: declarative constraint validation over a
table, the dbt-test / Great-Expectations surface of a production ETL
engine. Every check returns (name, kind, violations, total, passed) so a
pipeline can gate a load on `violations == 0` or track drift over time.

Shape at 100 TB:
  * All ROW-LEVEL checks (not_null, accepted_range, accepted_values,
    custom predicate) compile into ONE aggregate pass over the table —
    each check is a SUM of a violation flag, map-side combinable, so N
    checks cost one scan, not N.
  * unique() is the one keyed shuffle (groupBy count>1 on the key set);
    foreign_key() is a broadcast/shuffle anti-join counted — both return
    the same row shape and union in.
  * The result is a handful of rows per table — collect-safe, store it
    next to the load for audit trails.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F


@dataclass
class Expectation:
    name: str
    kind: str
    violation: Column | None = None      # row-level: true when the row violates
    key_cols: list[str] = field(default_factory=list)   # unique
    fk: tuple[DataFrame, str, str] | None = None        # (dim, fact_col, dim_col)


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null_{col}", "not_null", F.col(col).isNull())


def accepted_range(col: str, lo, hi) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"range_{col}", "accepted_range",
        c.isNull() | (c < F.lit(lo)) | (c > F.lit(hi)),
    )


def accepted_values(col: str, values: list) -> Expectation:
    c = F.col(col)
    return Expectation(
        f"values_{col}", "accepted_values", c.isNull() | ~c.isin(values)
    )


def satisfies(name: str, predicate: Column) -> Expectation:
    """Custom row-level rule: ``predicate`` must hold for every row."""
    return Expectation(name, "satisfies", ~predicate)


def unique(cols: list[str]) -> Expectation:
    return Expectation(f"unique_{'_'.join(cols)}", "unique", key_cols=cols)


def foreign_key(fact_col: str, dim: DataFrame, dim_col: str) -> Expectation:
    return Expectation(
        f"fk_{fact_col}", "foreign_key", fk=(dim, fact_col, dim_col)
    )


def validate(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Run all expectations; returns one row per expectation:
    (name, kind, violations, total, passed) — row-level checks fused into
    a single scan, set-level checks unioned in."""
    row_level = [e for e in expectations if e.violation is not None]
    results: list[DataFrame] = []
    if row_level:
        aggs = [F.count(F.lit(1)).alias("_total")] + [
            F.sum(e.violation.cast("long")).alias(f"_v{i}")
            for i, e in enumerate(row_level)
        ]
        one = df.agg(*aggs)
        pairs = F.array(
            *[
                F.struct(
                    F.lit(e.name).alias("name"),
                    F.lit(e.kind).alias("kind"),
                    F.col(f"_v{i}").alias("violations"),
                )
                for i, e in enumerate(row_level)
            ]
        )
        results.append(
            one.select(F.explode(pairs).alias("e"), F.col("_total").alias("total"))
            .select("e.name", "e.kind", "e.violations", "total")
        )
    for e in expectations:
        if e.kind == "unique":
            dup = (
                df.groupBy(*e.key_cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(
                    F.coalesce(
                        F.sum(F.when(F.col("_n") > 1, F.col("_n")).otherwise(0)),
                        F.lit(0),
                    ).alias("violations"),
                    F.coalesce(F.sum("_n"), F.lit(0)).alias("total"),
                )
            )
            results.append(
                dup.select(
                    F.lit(e.name).alias("name"),
                    F.lit(e.kind).alias("kind"),
                    F.col("violations"),
                    F.col("total"),
                )
            )
        elif e.kind == "foreign_key":
            # left join + null flag (not anti-join + separate count): one
            # pass yields violations AND total, and the plan stays a plain
            # equi-join — no 1-row cross join for the denominator
            dim, fact_col, dim_col = e.fk
            joined = df.select(fact_col).join(
                dim.select(F.col(dim_col).alias(fact_col))
                .distinct()
                .withColumn("_hit", F.lit(1)),
                fact_col,
                "left",
            )
            results.append(
                joined.agg(
                    F.sum(F.col("_hit").isNull().cast("long")).alias("violations"),
                    F.count(F.lit(1)).alias("total"),
                ).select(
                    F.lit(e.name).alias("name"),
                    F.lit(e.kind).alias("kind"),
                    F.col("violations"),
                    F.col("total"),
                )
            )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.withColumn("passed", F.col("violations") == 0)


# --- schema contracts ------------------------------------------------------


def schema_contract(df) -> dict:
    """Freeze a DataFrame's schema as a JSON-able contract: {column: type
    simple-string}. Store next to the table (or in the versioned
    manifest) and audit future batches against it."""
    return {f.name: f.dataType.simpleString() for f in df.schema.fields}


def schema_drift(df, contract: dict) -> list[dict]:
    """Audit a batch against a stored contract: returns drift records
    [{column, kind: added|removed|type_changed, expected, actual}] —
    empty means the contract holds. The ingestion-time gate that catches
    upstream schema changes BEFORE they poison a table (the reference's
    positional format_item parsers would silently misalign instead,
    src/exchanges/*/spot.py format_item)."""
    actual = schema_contract(df)
    drift: list[dict] = []
    for col, typ in actual.items():
        if col not in contract:
            drift.append(
                {"column": col, "kind": "added", "expected": None, "actual": typ}
            )
        elif contract[col] != typ:
            drift.append(
                {
                    "column": col,
                    "kind": "type_changed",
                    "expected": contract[col],
                    "actual": typ,
                }
            )
    for col, typ in contract.items():
        if col not in actual:
            drift.append(
                {"column": col, "kind": "removed", "expected": typ, "actual": None}
            )
    return drift


def enforce_contract(df, contract: dict, allow_added: bool = False):
    """Gate a batch on its schema contract: raises ValueError on drift
    (optionally tolerating added columns, which are dropped to the
    contract's column set); returns the contract-conformant projection
    in the CONTRACT's column order, so downstream positional consumers
    (parquet schema evolution, unionByName-free appends) stay stable."""
    drift = schema_drift(df, contract)
    blocking = [
        d for d in drift if not (allow_added and d["kind"] == "added")
    ]
    if blocking:
        raise ValueError(f"schema drift: {blocking}")
    return df.select(*contract.keys())
