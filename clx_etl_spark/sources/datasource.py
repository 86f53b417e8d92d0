"""Python DataSource (DSv2) for paginated REST backfills (SURVEY S1/S2).

`sources.rest.fetch_ranges` fans fetches out via mapInPandas; this module
exposes the same executor-side pagination as a *declarative* Spark source —
``spark.read.format("clx_rest")`` — the DSv2 path SURVEY §2.1 names for
scale. One Spark input partition per coalesced gap range (the plan from
operators.gaps), so a 1000-executor cluster fetches 1000 ranges at once
and the rows are born distributed; no driver bottleneck, no post-hoc
repartition.

The transport is injected as an importable ``module:function`` reference
(executors import it; closures can't be shipped through reader options) —
tests use a deterministic fake, production supplies a urllib/aiohttp
client with the reference's retry x3 + pacing budget (src/exchanges/
_base_.py:55-98) via RetryPolicy inside paginate_time_window.
"""

from __future__ import annotations

import importlib
import json
import os
from collections.abc import Iterator

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from .rest import paginate_time_window


class RangePartition(InputPartition):
    """One coalesced gap range = one Spark task."""

    def __init__(self, key: dict, start_ms: int, end_ms: int):
        self.key = key
        self.start_ms = start_ms
        self.end_ms = end_ms


class RestDataSource(DataSource):
    """format("clx_rest") — options:

    ranges     JSON list of {key: {...}, start_ms, end_ms}
    transport  "module:function"; called as fn(key_dict, start_ms, end_ms)
               -> list[dict] rows with epoch-ms "ts"
    outSchema  DDL string for the produced rows
    intervalMs bar interval (cursor advance + ts alignment)
    pageLimit  max rows per fetch window (default 1000)
    """

    @classmethod
    def name(cls) -> str:
        return "clx_rest"

    def schema(self) -> str:
        opts = {k.lower(): v for k, v in self.options.items()}
        return opts["outschema"]

    def reader(self, schema: StructType) -> "RestReader":
        return RestReader(schema, {k.lower(): v for k, v in self.options.items()})

    def streamReader(self, schema: StructType) -> "RestStreamReader":
        return RestStreamReader(
            schema, {k.lower(): v for k, v in self.options.items()}
        )


class RestReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._cols = [f.name for f in schema.fields]
        self._ranges = json.loads(options["ranges"])
        self._transport = options["transport"]
        self._interval_ms = int(options["intervalms"])
        self._page_limit = int(options.get("pagelimit", "1000"))

    def partitions(self) -> list[RangePartition]:
        return [
            RangePartition(r["key"], int(r["start_ms"]), int(r["end_ms"]))
            for r in self._ranges
        ]

    def read(self, partition: RangePartition) -> Iterator[tuple]:
        mod, _, fn = self._transport.partition(":")
        fetch = getattr(importlib.import_module(mod), fn)
        for batch in paginate_time_window(
            lambda s, e: fetch(partition.key, s, e),
            partition.start_ms,
            partition.end_ms,
            self._interval_ms,
            self._page_limit,
        ):
            for row in batch:
                yield tuple(row.get(c) for c in self._cols)


class RestStreamReader(DataSourceStreamReader):
    """Live REST tail as a Structured-Streaming source — the Spark-native
    replacement for the reference's cron sync loops (src/deploy.py
    schedules + _base_.py fetch loops): the bar-interval cursor is a
    checkpointed stream offset, so restarts resume exactly where the last
    committed micro-batch ended and a foreachBatch idempotent MERGE
    downstream gives effectively-once delivery.

    Offsets are ``{"cursor": epoch_ms}`` — the exclusive end of the last
    planned window. Each trigger plans the window [cursor, now_aligned),
    capped at ``maxBarsPerBatch`` bars so a long-offline stream catches up
    in bounded micro-batches instead of one giant fetch (the rate-limit
    budget the reference enforces with sleeps). One input partition per
    feed key per trigger: a 1000-symbol tail fans out to 1000 parallel
    executor-side fetches, rows born distributed.

    Extra options over the batch reader: ``keys`` (JSON list of key
    dicts), ``startMs`` (first cursor), ``maxBarsPerBatch`` (default
    5000), ``clock`` ("module:function" -> epoch ms; wall clock when
    absent), ``nowMs`` (fixed clock value — the stream reader runs in its
    own Python worker process, so deterministic tests inject the clock as
    an option rather than via environment), ``stateDir`` (directory where
    ``commit()`` persists the cursor so a restarted reader recovers its
    floor and the first post-restart micro-batch stays capped at
    maxBarsPerBatch instead of planning one unbounded catch-up window;
    MUST be unique per query — the sidecar filename is fixed, and a dir
    shared across queries would restore another query's cursor. A stale
    sidecar is safe either way: partitions() clamps the floor forward
    with the checkpointed start).
    """

    def __init__(self, schema: StructType, options: dict):
        self._cols = [f.name for f in schema.fields]
        self._keys = json.loads(options["keys"])
        self._transport = options["transport"]
        self._interval_ms = int(options["intervalms"])
        self._page_limit = int(options.get("pagelimit", "1000"))
        self._start_ms = int(options["startms"])
        self._max_bars = int(options.get("maxbarsperbatch", "5000"))
        self._clock = options.get("clock")
        self._fixed_now = options.get("nowms")  # deterministic tests
        self._state_dir = options.get("statedir")
        self._cursor: int | None = None  # driver-side advance floor

    def _cursor_file(self) -> str | None:
        return os.path.join(self._state_dir, "rest_cursor.json") if self._state_dir else None

    def _restore_cursor(self) -> int | None:
        path = self._cursor_file()
        if path and os.path.exists(path):
            try:
                with open(path) as f:
                    return int(json.load(f)["cursor"])
            except (OSError, ValueError, KeyError, TypeError):
                # TypeError: sidecar holds {"cursor": null} or non-dict JSON
                return None
        return None

    def _now_ms(self) -> int:
        if self._fixed_now is not None:
            return int(self._fixed_now)
        if self._clock:
            mod, _, fn = self._clock.partition(":")
            return int(getattr(importlib.import_module(mod), fn)())
        return int(time.time() * 1000)

    def initialOffset(self) -> dict:
        self._cursor = self._start_ms
        return {"cursor": self._start_ms}

    def latestOffset(self) -> dict:
        aligned = self._now_ms() - self._now_ms() % self._interval_ms
        if self._cursor is None:
            # restarted from checkpoint: recover the committed floor from
            # the stateDir sidecar so the catch-up stays capped; without a
            # stateDir the true floor only arrives with the next
            # partitions() call and one unbounded window is the safe
            # degradation (end can never precede the stored start)
            restored = self._restore_cursor()
            self._cursor = restored if restored is not None else aligned
        end = max(
            self._cursor,
            min(aligned, self._cursor + self._max_bars * self._interval_ms),
        )
        self._cursor = end
        return {"cursor": end}

    def partitions(self, start: dict, end: dict) -> list[RangePartition]:
        s, e = int(start["cursor"]), int(end["cursor"])
        # Clamp forward with the checkpointed start too: Spark writes its
        # commit log before calling commit(), so a crash in that window (or
        # a stateDir shared across queries) can leave the sidecar behind the
        # checkpoint; without `s` here a stale restore would re-plan
        # already-committed windows (duplicates on non-idempotent sinks).
        self._cursor = max(self._cursor or 0, s, e)
        if e <= s:
            return []
        # transport windows are end-inclusive bar timestamps
        return [RangePartition(k, s, e - self._interval_ms) for k in self._keys]

    def read(self, partition: RangePartition) -> Iterator[tuple]:
        mod, _, fn = self._transport.partition(":")
        fetch = getattr(importlib.import_module(mod), fn)
        for batch in paginate_time_window(
            lambda s, e: fetch(partition.key, s, e),
            partition.start_ms,
            partition.end_ms,
            self._interval_ms,
            self._page_limit,
        ):
            for row in batch:
                yield tuple(row.get(c) for c in self._cols)

    def commit(self, end: dict) -> None:
        # Offsets live in the checkpoint; the sidecar only exists so a
        # restarted reader can recover its floor in latestOffset (atomic
        # rename — a torn write falls back to the unbounded path).
        path = self._cursor_file()
        if path:
            os.makedirs(self._state_dir, exist_ok=True)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"cursor": int(end["cursor"])}, f)
            os.replace(tmp, path)


def stream_rest(
    spark: SparkSession,
    keys: list[dict],
    transport: str,
    out_schema: str,
    interval_ms: int,
    start_ms: int,
    max_bars_per_batch: int = 5000,
    clock: str | None = None,
    now_ms: int | None = None,
    state_dir: str | None = None,
) -> DataFrame:
    """readStream over the live REST tail (see RestStreamReader)."""
    from ._register import register_datasource_once

    register_datasource_once(spark, RestDataSource)
    reader = (
        spark.readStream.format("clx_rest")
        .option("keys", json.dumps(keys))
        .option("transport", transport)
        .option("outSchema", out_schema)
        .option("intervalMs", str(interval_ms))
        .option("startMs", str(start_ms))
        .option("maxBarsPerBatch", str(max_bars_per_batch))
    )
    if clock:
        reader = reader.option("clock", clock)
    if now_ms is not None:
        reader = reader.option("nowMs", str(now_ms))
    if state_dir:
        reader = reader.option("stateDir", state_dir)
    return reader.load()


def read_rest(
    spark: SparkSession,
    ranges: list[dict],
    transport: str,
    out_schema: str,
    interval_ms: int,
    page_limit: int = 1000,
) -> DataFrame:
    """Register (idempotent) and load the REST source over a gap plan."""
    from ._register import register_datasource_once

    register_datasource_once(spark, RestDataSource)
    return (
        spark.read.format("clx_rest")
        .option("ranges", json.dumps(ranges))
        .option("transport", transport)
        .option("outSchema", out_schema)
        .option("intervalMs", str(interval_ms))
        .option("pageLimit", str(page_limit))
        .load()
    )
