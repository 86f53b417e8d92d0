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
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
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


def read_rest(
    spark: SparkSession,
    ranges: list[dict],
    transport: str,
    out_schema: str,
    interval_ms: int,
    page_limit: int = 1000,
) -> DataFrame:
    """Register (idempotent) and load the REST source over a gap plan."""
    spark.dataSource.register(RestDataSource)
    return (
        spark.read.format("clx_rest")
        .option("ranges", json.dumps(ranges))
        .option("transport", transport)
        .option("outSchema", out_schema)
        .option("intervalMs", str(interval_ms))
        .option("pageLimit", str(page_limit))
        .load()
    )
