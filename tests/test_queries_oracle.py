"""Every registered query must match its DuckDB oracle (the driver's
correctness gate, replicated locally at sf0.001)."""

from __future__ import annotations

import pytest

from clx_etl_spark.queries import load_all

from .conftest import SF_ORACLE
from .oracle import compare

REGISTRY = load_all()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    result = compare(spark, SF_ORACLE, name, REGISTRY[name])
    assert result["status"] in ("match", "rows_only"), result


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.columns
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
