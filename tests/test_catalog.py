"""Testdata-encoding canary (round-4 hardening).

The driver has shipped ``events.ts`` as two different parquet encodings
across rounds — TIMESTAMP(NANOS) (rounds 1-2) and timestamp[us] (round 3+).
The round-3 regression (38/113 queries broken by one dtype assumption in
``catalog.load_table``) motivates this canary: ``load_table`` must
canonicalize BOTH encodings to identical ``ts_ms: bigint`` /
``event_time: timestamp`` columns, and fail loudly on anything else.
"""

from __future__ import annotations

import calendar
import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clx_etl_spark.catalog import load_table

_TS = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 123456),
    dt.datetime(2024, 1, 1, 0, 9, 58, 778549),
    dt.datetime(2024, 3, 15, 12, 30, 0),
    dt.datetime(2024, 6, 30, 23, 59, 59, 999999),
    dt.datetime(2024, 12, 31, 0, 0, 1),
]
# integer arithmetic — float .timestamp() rounds at the microsecond
_EXPECT_MS = [
    calendar.timegm(t.timetuple()) * 1000 + t.microsecond // 1000 for t in _TS
]


def _write_events(dir_path, unit: str) -> str:
    table = pa.table(
        {
            "event_id": pa.array(range(len(_TS)), pa.int64()),
            "ts": pa.array(_TS, pa.timestamp(unit)),
            "user_id": pa.array([1] * len(_TS), pa.int64()),
            "event_type": pa.array(["view"] * len(_TS)),
            "value": pa.array([1.0] * len(_TS)),
            "props": pa.array(["{}"] * len(_TS)),
        }
    )
    pq.write_table(table, str(dir_path / "events.parquet"))
    return str(dir_path)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_load_table_canonicalizes_both_ts_encodings(spark, tmp_path, unit):
    sf_dir = _write_events(tmp_path, unit)
    df = load_table(spark, sf_dir, "events")
    types = dict(df.dtypes)
    assert types["ts_ms"] == "bigint"
    assert types["event_time"] == "timestamp"
    rows = df.orderBy("event_id").select("ts_ms", "event_time").collect()
    assert [r.ts_ms for r in rows] == _EXPECT_MS
    # event_time round-trips to the same epoch ms (UTC session TZ)
    for r, want in zip(rows, _EXPECT_MS):
        t = r.event_time
        got = calendar.timegm(t.timetuple()) * 1000 + t.microsecond // 1000
        assert got == want


def test_load_table_rejects_unknown_ts_encoding(spark, tmp_path):
    table = pa.table(
        {
            "event_id": pa.array([0], pa.int64()),
            "ts": pa.array(["2024-01-01"], pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    with pytest.raises(TypeError, match="unsupported dtype"):
        load_table(spark, str(tmp_path), "events")


def test_live_testdata_loads(spark):
    """Whatever encoding the driver regenerated this round, the canonical
    columns must come out right — fail in minutes, not at round end."""
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    types = dict(df.dtypes)
    assert types["ts_ms"] == "bigint", types
    assert types["event_time"] == "timestamp", types
    assert df.filter("ts_ms IS NULL OR event_time IS NULL").count() == 0
