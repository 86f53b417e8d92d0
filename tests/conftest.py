from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clx_etl_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = os.environ.get("CLX_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # CLX_TEST_MASTER lets scripts/ptest.py size each shard's local
    # thread pool so N concurrent shards don't oversubscribe the box
    spark = get_spark("clx-spark-tests",
                      master=os.environ.get("CLX_TEST_MASTER", "local[8]"))
    yield spark
    spark.stop()
