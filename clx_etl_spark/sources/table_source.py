"""Python DataSource (DSv2): BATCH reads over a versioned table —
``spark.read.format("clx_table")`` — making sinks/versioned.py tables
first-class to SQL users (``CREATE TEMPORARY VIEW t USING clx_table``)
with the engine's own planning intelligence:

  * **time travel** via ``version`` / ``tag`` / ``timestampAsOf`` options
    (the same resolution rules as read_version / read_tag /
    read_version_as_of);
  * **manifest file skipping at plan time**: Spark pushes the query's
    filters into the source (DSv2 ``pushFilters``), and files whose
    manifest [min,max] — and per-file key bloom, for equality — provably
    exclude the predicate never become input partitions. The filters are
    also RETURNED to Spark (re-applied row-level), so pruning is pure
    gain and never a correctness dependency;
  * **deletion vectors applied executor-side**: each partition is one
    data file plus its dv sidecar list; the reader drops tombstoned row
    positions with one Arrow boolean mask per batch — no driver
    involvement, no shuffle;
  * **Arrow-batch transport**: ``read`` yields pyarrow RecordBatches, so
    rows never materialize as Python objects.

Planning cost is manifest JSON only. One file = one partition = one
task, so a 1000-file snapshot fans out to 1000 parallel reads — the
same shape as Spark's native parquet scan, but planned off the
kilobyte manifest instead of file listings. The programmatic API
(read_version/scan_version) remains the primary path; this source is
the SQL/catalog door to the same storage."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
)
from pyspark.sql.types import StructType

from .cdf_source import _parquet_ddl


class TableFilePartition(InputPartition):
    """One data file of the snapshot (+ its deletion-vector dirs)."""

    def __init__(self, file: str, dv_dirs: list[str]):
        self.file = file
        self.dv_dirs = dv_dirs


def _resolve_version(opts: dict) -> tuple[str, int]:
    from ..sinks.versioned import (_manifest_dir, latest_version,
                                   version_as_of_timestamp)

    path = opts["path"]
    if "version" in opts:
        return path, int(opts["version"])
    if "tag" in opts:
        import os

        f = os.path.join(_manifest_dir(path), f"tag-{opts['tag']}")
        with open(f) as fh:
            return path, int(fh.read().strip())
    if "timestampasof" in opts:
        return path, version_as_of_timestamp(path, int(opts["timestampasof"]))
    head = latest_version(path)
    if head is None:
        raise FileNotFoundError(f"no versions committed at {path}")
    return path, head


class TableDataSource(DataSource):
    """format("clx_table") — options:

    path           versioned table root (required)
    version        snapshot number (default: latest)
    tag            named snapshot (tag_version)
    timestampAsOf  epoch ms — newest commit at-or-before (TIMESTAMP AS OF)
    outSchema      DDL override (else derived from the snapshot's first
                   parquet footer; evolution-gap columns read as NULL)
    """

    @classmethod
    def name(cls) -> str:
        return "clx_table"

    def _opts(self) -> dict:
        return {k.lower(): v for k, v in self.options.items()}

    def schema(self) -> str:
        opts = self._opts()
        if "outschema" in opts:
            return opts["outschema"]
        from ..sinks.versioned import _read_manifest

        path, v = _resolve_version(opts)
        files = _read_manifest(path, v)["files"]
        if not files:
            raise ValueError(
                f"version {v} of {path} has no files — pass outSchema"
            )
        return _parquet_ddl(files[0])

    def reader(self, schema: StructType) -> "TableReader":
        # Spark refuses a reader that merely DEFINES pushFilters while
        # spark.sql.python.filterPushdown.enabled is false, so the
        # pushdown-capable subclass is chosen by option (set by
        # read_table_source from the live conf); the base reader still
        # serves every row correctly — pruning is pure optimization
        opts = self._opts()
        cls = (_PushdownTableReader
               if opts.get("pushdown", "").lower() == "true" else TableReader)
        return cls(schema, opts)


class TableReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        from ..sinks.versioned import _read_manifest

        self._schema = schema
        self._cols = [f.name for f in schema.fields]
        path, v = _resolve_version(options)
        self._manifest = _read_manifest(path, v)
        # col -> [lo, hi] bounds accumulated from pushed filters, plus
        # equality/IN point-value lists for the bloom probe (a file is
        # skipped only when NO point can be present)
        self._bounds: dict[str, list] = {}
        self._points: dict[str, list] = {}

    def partitions(self) -> list[TableFilePartition]:
        from ..sinks.versioned import (_BLOOM_KEY, _bloom_any_hit,
                                       _bloom_seed, _stat_overlaps)

        m = self._manifest
        stats = m.get("stats", {})
        dv_map = m.get("dv", {})
        keep = []
        for f in m["files"]:
            fstats = stats.get(f, {})
            ok = True
            for col, (lo, hi) in self._bounds.items():
                rng = fstats.get(col)
                if rng is not None and not _stat_overlaps(
                    lo if lo is not None else rng[0],
                    hi if hi is not None else rng[1],
                    rng,
                ):
                    ok = False
                    break
            if ok:
                for col, vals in self._points.items():
                    bloom = fstats.get(_BLOOM_KEY + col)
                    if bloom and all(isinstance(v, (int, str))
                                     for v in vals) and \
                            not _bloom_any_hit(
                                bloom, [_bloom_seed(v) for v in vals]):
                        ok = False
                        break
            if ok:
                keep.append(TableFilePartition(
                    f, sorted({e["d"] for e in dv_map.get(f, [])})))
        return keep

    def read(self, partition: TableFilePartition):
        import glob
        import os

        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        # COLUMN PRUNING: read only the query-schema columns the file
        # actually has — the parquet reader never decodes the rest (a
        # narrow projection over a wide snapshot reads its columns only,
        # same as Spark's native scan). Evolution-gap columns pad NULL.
        pf = pq.ParquetFile(partition.file)
        have = set(pf.schema_arrow.names)
        want = [c for c in self._cols if c in have]
        if want:
            t = pf.read(columns=want)
            n = t.num_rows
        else:  # pure-gap projection (or COUNT(*)): footer row count only
            t = None
            n = pf.metadata.num_rows
        if partition.dv_dirs:
            # tombstoned positions for THIS file only — the sidecars are
            # O(deleted rows); row order in the file IS the row index
            dead: set[int] = set()
            for d in partition.dv_dirs:
                for p in sorted(glob.glob(os.path.join(d, "*.parquet"))):
                    dt = pq.read_table(p, columns=["_file", "_pos"])
                    mask = pc.equal(dt["_file"], partition.file)
                    dead.update(dt.filter(mask)["_pos"].to_pylist())
            if dead:
                # vectorized keep-mask: one boolean scatter over the row
                # index domain, never a per-row Python loop
                keep = np.ones(n, dtype=bool)
                idx = np.fromiter(dead, dtype=np.int64, count=len(dead))
                keep[idx[idx < n]] = False
                if t is not None:
                    t = t.filter(pa.array(keep))
                n = int(keep.sum())
        if t is not None:
            n = t.num_rows
        # project/pad to the query schema: evolution-gap columns -> NULL
        from pyspark.sql.pandas.types import to_arrow_type

        arrays = []
        for field in self._schema.fields:
            if t is not None and field.name in t.column_names:
                arrays.append(t[field.name].combine_chunks())
            else:
                arrays.append(
                    pa.nulls(n, type=to_arrow_type(field.dataType))
                )
        out = pa.table(dict(zip(self._cols, arrays)))
        yield from out.to_batches(max_chunksize=1 << 16)


class _PushdownTableReader(TableReader):
    """TableReader + DSv2 filter pushdown (requires
    spark.sql.python.filterPushdown.enabled)."""

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Harvest single-column range/equality predicates for manifest
        pruning. EVERY filter is returned back (Spark re-applies them
        row-level), so the harvest only ever SKIPS files the stats prove
        empty for the predicate — stat-less files always survive. Eager
        (not a generator): the harvest must complete even if the caller
        never drains the returned iterable."""
        for f in filters:
            col = None
            if isinstance(f, (EqualTo, GreaterThan, GreaterThanOrEqual,
                              LessThan, LessThanOrEqual, In,
                              StringStartsWith)):
                if len(f.attribute) == 1:
                    col = f.attribute[0]
            if col is not None:
                lo, hi = self._bounds.get(col, [None, None])
                if isinstance(f, EqualTo):
                    lo, hi = f.value, f.value
                    self._points[col] = [f.value]
                elif isinstance(f, In):
                    vals = [v for v in f.value if v is not None]
                    if not vals:
                        continue
                    try:
                        lo, hi = min(vals), max(vals)
                    except TypeError:  # incomparable mix: points only
                        lo, hi = None, None
                    self._points[col] = vals
                elif isinstance(f, StringStartsWith):
                    # standard parquet startsWith rule: matches sort in
                    # [p, succ(p)) where succ increments p's last code
                    # point (dropping trailing U+10FFFF first — such a
                    # prefix has no finite successor, so no upper bound;
                    # naive p+chr(0x10FFFF) would prune files holding
                    # longer matches that sort above it)
                    p = f.value
                    lo = p if lo is None else max(lo, p)
                    base = p.rstrip(chr(0x10FFFF))
                    if base:
                        succ = base[:-1] + chr(ord(base[-1]) + 1)
                        hi = succ if hi is None else min(hi, succ)
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    lo = f.value if lo is None else max(lo, f.value)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    hi = f.value if hi is None else min(hi, f.value)
                self._bounds[col] = [lo, hi]
        return list(filters)  # none consumed: pruning is advisory


def read_table_source(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    tag: str | None = None,
    timestamp_as_of_ms: int | None = None,
) -> DataFrame:
    """spark.read over a versioned table via the clx_table DSv2 source
    (registers the source; see TableDataSource for the option surface).
    Manifest-pruning filter pushdown engages automatically when
    ``spark.sql.python.filterPushdown.enabled`` is true."""
    spark.dataSource.register(TableDataSource)
    pd_on = str(spark.conf.get(
        "spark.sql.python.filterPushdown.enabled", "false")).lower()
    reader = (spark.read.format("clx_table").option("path", path)
              .option("pushdown", pd_on))
    if version is not None:
        reader = reader.option("version", str(version))
    if tag is not None:
        reader = reader.option("tag", tag)
    if timestamp_as_of_ms is not None:
        reader = reader.option("timestampAsOf", str(timestamp_as_of_ms))
    return reader.load()
