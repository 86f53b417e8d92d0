"""Python DataSource (DSv2): Structured-Streaming source over a
versioned table's CHANGE FEED — ``spark.readStream.format("clx_cdf")``,
the Delta ``readChangeFeed`` streaming shape for sinks/versioned.py
tables.

Offsets are manifest VERSION NUMBERS (``{"version": N}`` = everything
through commit N has been processed), so the checkpoint is exact and a
restart resumes at the next unprocessed commit. Per trigger the reader
plans one input partition PER FILE of each new commit:

  * append commits stream their ADDED data files directly, rows tagged
    ``_change_type='insert'`` — zero write amplification, the same
    reason Delta CDF is free for appends;
  * merge/delete/compact commits made with ``change_feed=True`` stream
    the change-set files persisted under ``_changes/`` (insert /
    update_preimage / update_postimage / delete rows);
  * any other rewrite raises loudly at planning time — its row-level
    delta was never recorded (same contract as table_changes).

Planning cost is manifest JSON only (kilobytes per version, driver
side); data moves executor-side through one pyarrow read per file —
a 1000-file commit fans out to 1000 parallel tasks. ``maxVersionsPerBatch``
bounds catch-up after downtime so a long-offline stream drains in
bounded micro-batches.

The natural tail: ``foreachBatch`` folding each micro-batch through
operators/incremental.retractable_delta_state keeps downstream
aggregates continuously correct under updates/deletes — the streaming
twin of sync_rollup_from_table's batch catch-up.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

_ARROW_DDL = {
    "int8": "tinyint", "int16": "smallint", "int32": "int", "int64": "bigint",
    "float": "float", "double": "double", "bool": "boolean",
    "string": "string", "large_string": "string", "binary": "binary",
    "date32[day]": "date",
}


def _parquet_ddl(path: str) -> str:
    """Derive a Spark DDL schema from a parquet file's arrow schema —
    primitive columns only (the versioned-table rollup/fact shapes);
    anything fancier should pass an explicit outSchema option."""
    import pyarrow.parquet as pq

    sch = pq.read_schema(path)
    cols = []
    for f in sch:
        t = str(f.type)
        if t in _ARROW_DDL:
            ddl = _ARROW_DDL[t]
        elif t.startswith("timestamp"):
            ddl = "timestamp_ntz" if "tz=" not in t else "timestamp"
        elif t.startswith("decimal128(") or t.startswith("decimal("):
            ddl = "decimal" + t[t.index("("):]
        else:
            raise ValueError(
                f"cannot map arrow type {t!r} of column {f.name!r} to DDL — "
                "pass outSchema explicitly"
            )
        cols.append(f"{f.name} {ddl}")
    return ", ".join(cols)


class ChangeFilePartition(InputPartition):
    """One change-bearing parquet file of one commit = one Spark task."""

    def __init__(self, file: str, version: int, change_type: str | None,
                 colmap: dict | None = None):
        self.file = file
        self.version = version
        # None => the file already carries _change_type (a _changes/ set);
        # 'insert' => an appended data file, tag every row
        self.change_type = change_type
        # logical->physical column map of the commit's manifest (column
        # mapping): appended DATA files store physical names; change-set
        # files are written logical and pass None
        self.colmap = colmap or {}


class CdfDataSource(DataSource):
    """format("clx_cdf") — options:

    path                 versioned table root (required)
    startingVersion      first version to stream, or "latest" (default:
                         0 — replay the whole history; "latest" streams
                         only commits made after the query starts)
    maxVersionsPerBatch  catch-up bound per trigger (default 100)
    outSchema            DDL override (else derived from the head
                         version's first parquet footer)
    """

    @classmethod
    def name(cls) -> str:
        return "clx_cdf"

    def _opts(self) -> dict:
        return {k.lower(): v for k, v in self.options.items()}

    def schema(self) -> str:
        opts = self._opts()
        if "outschema" in opts:
            base = opts["outschema"]
        else:
            from ..sinks.versioned import (_read_manifest,
                                           _schema_from_json,
                                           latest_version)

            path = opts["path"]
            head = latest_version(path)
            if head is None:
                raise FileNotFoundError(f"no versions committed at {path}")
            m = _read_manifest(path, head)
            contract = _schema_from_json(m.get("schema"))
            if contract is not None:
                # the recorded contract is authoritative: it carries
                # LOGICAL names (a footer carries physical ones, stale
                # after a rename) — prerequisite for schema tracking
                base = ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in contract.fields)
            else:
                files = m["files"]
                if not files:
                    raise ValueError(
                        f"version {head} of {path} has no files — pass "
                        "outSchema")
                base = _parquet_ddl(files[0])
        return base + ", _change_type string, _commit_version bigint"

    def streamReader(self, schema: StructType) -> "CdfStreamReader":
        return CdfStreamReader(schema, self._opts())


class CdfStreamReader(DataSourceStreamReader):
    """Change-feed streaming source (format 'clx_cdf').

    Rate limiting is VERSION-granular (``maxVersionsPerBatch``) by
    design: unlike the plain table stream's file-cursor offsets
    (TableStreamReader, r11 maxFilesPerTrigger), a CDC batch must
    never split one commit's change set across micro-batches — an
    update's delete/insert legs landing in different batches would
    let a per-batch MERGE applier (apply_changelog folds per-key
    winners WITHIN a batch) apply a preimage without its postimage.
    Commit atomicity per micro-batch is the correctness contract CDC
    consumers rely on; bounded catch-up at version granularity is the
    rate limit compatible with it."""

    def __init__(self, schema: StructType, options: dict):
        self._cols = [f.name for f in schema.fields]
        self._path = options["path"]
        self._max_versions = int(options.get("maxversionsperbatch", "100"))
        # same shared startingVersion/startingTimestamp resolver as
        # the table stream (review r11 — one copy, no drift)
        from ..sinks.versioned import resolve_starting_option

        self._starting = resolve_starting_option(self._path,
                                                 options) or "0"
        self._cursor: int | None = None  # driver-side floor for capping
        # SCHEMA TRACKING (VERDICT r10 item 3, same shape as
        # TableStreamReader): mapping commits at or below the version
        # whose contract this query's schema reflects are crossable —
        # a restart resumes past a rename instead of being wedged.
        # Off when the schema is not the head contract (outSchema
        # override / footer-derived physical names / no contract).
        self._schema_v = -1
        self._smap: dict = {}
        self._track = False
        from ..sinks.versioned import (_read_manifest, _schema_from_json,
                                       latest_version)
        head = latest_version(self._path)
        if head is not None:
            m = _read_manifest(self._path, head)
            contract = _schema_from_json(m.get("schema"))
            if contract is not None:
                names = {f.name for f in contract.fields}
                data_cols = set(self._cols) - {"_change_type",
                                               "_commit_version"}
                if data_cols <= names:
                    self._schema_v = head
                    self._smap = dict(
                        (m.get("colmap") or {}).get("m", {}))
                    self._track = True

    def initialOffset(self) -> dict:
        from ..sinks.versioned import latest_version

        if self._starting == "latest":
            head = latest_version(self._path)
            v = head if head is not None else -1
        else:
            # stream everything from startingVersion on: "processed
            # through" is the version before it
            v = int(self._starting) - 1
        self._cursor = v
        return {"version": v}

    def latestOffset(self) -> dict:
        from ..sinks.versioned import latest_version

        head = latest_version(self._path)
        head = -1 if head is None else head
        if self._cursor is not None:
            # bounded catch-up: the END offset itself is capped, so the
            # checkpoint never records skipped versions as processed
            head = max(self._cursor, min(head, self._cursor + self._max_versions))
        # restarted reader (cursor unknown): one uncapped window is the
        # safe degradation — correct, merely large
        self._cursor = head
        return {"version": head}

    def partitions(self, start: dict, end: dict) -> list[ChangeFilePartition]:
        from ..sinks.versioned import (_APPEND_SAFE_OPS, _change_dir_for,
                                       _read_manifest)

        s, e = int(start["version"]), int(end["version"])
        self._cursor = max(self._cursor or -1, s, e)
        parts: list[ChangeFilePartition] = []
        for v in range(s + 1, e + 1):
            m = _read_manifest(self._path, v)
            cdir = _change_dir_for(self._path, m, v)
            if cdir is not None and os.path.isdir(cdir):
                # change files carry the LOGICAL names of their own
                # commit's era; when tracking, compose current-logical
                # -> physical (schema version's map) -> era-logical
                # (inverse of this version's map) so pre-rename change
                # history replays under the live names
                lk = None
                if self._track:
                    vmap = dict((m.get("colmap") or {}).get("m", {}))
                    inv = {p: l for l, p in vmap.items()}
                    lk = {c: inv.get(self._smap.get(c, c),
                                     self._smap.get(c, c))
                          for c in self._cols}
                for f in sorted(os.listdir(cdir)):
                    if f.endswith(".parquet"):
                        parts.append(ChangeFilePartition(
                            os.path.join(cdir, f), v, None, colmap=lk))
            elif m["op"] in _APPEND_SAFE_OPS:
                base = (set(_read_manifest(self._path, v - 1)["files"])
                        if v > 0 else set())
                # appended data files carry PHYSICAL names: the schema
                # version's mapping projects them onto the live names
                # whatever era they were written in
                cmap = (dict(self._smap) if self._track
                        else dict((m.get("colmap") or {}).get("m", {})))
                for f in m["files"]:
                    if f not in base:
                        parts.append(ChangeFilePartition(
                            f, v, "insert", colmap=cmap))
            elif m["op"] in ("rename-column", "drop-columns"):
                # column-mapping commits change NO rows; one the
                # query's schema already reflects is crossable
                # (schema-tracking restart path, VERDICT r10 item 3);
                # one landing after the stream started still raises —
                # the restart re-derives the schema and resumes here
                if self._track and v <= self._schema_v:
                    continue
                raise ValueError(
                    f"version {v} changed the column mapping "
                    f"({m['op']}); the stream's schema is fixed at "
                    "query start — restart the stream to resume from "
                    "the checkpoint under the new column names"
                )
            else:
                raise ValueError(
                    f"version {v} rewrote rows without a recorded change "
                    "set (change_feed=False or a plain overwrite) — the "
                    "stream cannot cross it; snapshot-diff that range"
                )
        return parts

    def read(self, partition: ChangeFilePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        rows = pq.read_table(partition.file).to_pylist()
        pmap = partition.colmap
        for r in rows:
            if partition.change_type is not None:
                r["_change_type"] = partition.change_type
            r["_commit_version"] = partition.version
            yield tuple(r.get(pmap.get(c, c)) for c in self._cols)

    def commit(self, end: dict) -> None:
        pass  # offsets live entirely in the checkpoint


def stream_changes(
    spark: SparkSession,
    path: str,
    starting_version: int | str = 0,
    max_versions_per_batch: int = 100,
    out_schema: str | None = None,
    starting_timestamp_ms: int | None = None,
) -> DataFrame:
    """readStream over a versioned table's change feed (CdfDataSource).
    ``starting_timestamp_ms`` resolves like Delta's startingTimestamp
    (earliest commit AT OR AFTER the timestamp, inclusive) and is
    mutually exclusive with an explicit ``starting_version`` — passing
    both surfaces the reader's refusal rather than silently dropping
    one (review r11)."""
    from .table_source import _ensure_active_session

    from ._register import register_datasource_once

    _ensure_active_session(spark)
    register_datasource_once(spark, CdfDataSource)
    reader = (
        spark.readStream.format("clx_cdf")
        .option("path", path)
        .option("maxVersionsPerBatch", str(max_versions_per_batch))
    )
    if starting_timestamp_ms is not None:
        reader = reader.option("startingTimestamp",
                               str(starting_timestamp_ms))
        if starting_version != 0:
            # surface the mutual-exclusion refusal instead of silently
            # preferring one start position
            reader = reader.option("startingVersion",
                                   str(starting_version))
    else:
        reader = reader.option("startingVersion", str(starting_version))
    if out_schema:
        reader = reader.option("outSchema", out_schema)
    return reader.load()
