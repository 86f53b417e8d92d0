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
    # availableNow queries over stateful operators with PROCESSING-TIME
    # timeouts never terminate under no-data micro-batches (the engine
    # keeps scheduling empty batches until the pending timers — up to an
    # hour out — fire), so every stream test burned its full
    # awaitTermination budget (r13 measured 120 s+ per test, 11 s with
    # the conf off; emitted rows identical — the idle-timeout tests
    # drive their timers with explicit later batches).
    spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    yield spark
    spark.stop()
