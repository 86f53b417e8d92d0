"""Local replica of the driver's DuckDB-oracle compare.

Runs a registered Spark query and its oracle SQL over the same parquet
tables, then compares row count, column names, and an order-insensitive
value representation (columns sorted by name, rows sorted by their full
stringified tuple) — stricter than needed, so passing here implies passing
the driver's hash check.
"""

from __future__ import annotations

import math

import duckdb

from clx_etl_spark.catalog import TABLES

TOL_NONE = object()


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision: bit-identical doubles match exactly
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)
    return cols, out


def _type_class(t: str) -> str:
    """Coarse cross-engine type class for dtype-parity checking.

    The driver hash-compares native serializations, so a DuckDB HUGEINT
    (arrow decimal128(38,0)) against a Spark BIGINT fails its hash even
    when every value is equal. Python-level fetchall() hides that (both
    arrive as int), so we compare declared types coarsely instead.
    """
    t = t.lower()
    if t.startswith(("int", "uint", "smallint", "tinyint", "bigint", "long", "short", "byte")):
        return "int"
    if t.startswith(("float", "double", "halffloat")):
        return "float"
    if t.startswith("decimal"):
        return t.replace(" ", "")  # exact precision/scale must agree
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("date"):
        return "date"
    if t.startswith("bool"):
        return "bool"
    if t.startswith(("string", "large_string", "varchar")):
        return "string"
    return t


def type_parity(spark_df, arrow_schema) -> list[str]:
    """Return per-column type-class mismatches between engines."""
    sparkt = {f.name: _type_class(f.dataType.simpleString()) for f in spark_df.schema.fields}
    issues = []
    for f in arrow_schema:
        st = sparkt.get(f.name)
        ot = _type_class(str(f.type))
        if st is not None and st != ot:
            issues.append(f"{f.name}: spark={st} oracle={ot}")
    return issues


def compare(spark, sf_dir: str, name: str, query) -> dict:
    sdf = query.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    result = {"name": name, "spark_rows": len(srows)}
    if query.oracle is None:
        result["status"] = "rows_only"
        return result
    con = duckdb_connection(sf_dir)
    # ONE oracle execution: the arrow fetch provides the schema for the
    # type-parity check AND the rows — the previous shape re-ran every
    # oracle a second time for fetchall(), doubling DuckDB time across
    # the 200+-query sweep (the recursive/unrolled graph oracles are the
    # suite's slowest cells). Rows come back through the same arrow
    # conversion duckdb's fetchall uses underneath, normalized by the
    # identical _norm_cell path.
    otbl = con.execute(query.oracle).arrow()
    mismatches = type_parity(sdf, otbl.schema)
    if mismatches:
        result["status"] = "dtype_mismatch"
        result["detail"] = "; ".join(mismatches)
        return result
    ocols = list(otbl.column_names)
    ocolumns = [otbl.column(i).to_pylist() for i in range(otbl.num_columns)]
    orows = list(zip(*ocolumns)) if ocolumns else []
    if not otbl.num_columns:
        orows = [()] * otbl.num_rows
    result["oracle_rows"] = len(orows)
    sc, sr = normalize(scols, srows)
    oc, orn = normalize(ocols, orows)
    if sc != oc:
        result["status"] = "schema_mismatch"
        result["detail"] = f"spark={sc} oracle={oc}"
    elif len(sr) != len(orn):
        result["status"] = "rowcount_mismatch"
    elif sr != orn:
        result["status"] = "value_mismatch"
        diffs = [(a, b) for a, b in zip(sr, orn) if a != b][:3]
        result["detail"] = f"first diffs: {diffs}"
    else:
        result["status"] = "match"
    return result
