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

import json
import os
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    StringStartsWith,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from ._register import register_datasource_once
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


def _newest_file(opts: dict) -> str:
    """The snapshot's NEWEST data file (manifests append new files at
    the tail): schema evolution adds columns over time, so the last
    write carries the widest schema; older files' missing columns read
    as typed NULLs in TableReader."""
    from ..sinks.versioned import _read_manifest

    path, v = _resolve_version(opts)
    files = _read_manifest(path, v)["files"]
    if not files:
        raise ValueError(
            f"version {v} of {path} has no files — pass outSchema"
        )
    return files[-1]


_PATH_META_KEY = "clx_table_path"  # field-metadata carrier (see schema())


def _recover_path(opts: dict, schema) -> dict:
    """Recover the table path for a catalog-resolved scan/DML whose
    options arrived empty (Spark 4.1 Python-DSv2 limitation): schema()
    smuggled it through StructField metadata, the one channel the
    catalog persists. Explicit options always win; catalog tables are
    pinned to their path (no time travel / pushdown options can reach
    them, so they read the HEAD with the base reader)."""
    if "path" not in opts and schema is not None:
        for f in getattr(schema, "fields", []):
            p = (f.metadata or {}).get(_PATH_META_KEY)
            if p:
                import re

                opts["path"] = re.sub("^file:/+", "/", p)
                break
    if "path" not in opts:
        raise ValueError(
            "clx_table: no table path reached this catalog-resolved "
            "operation (Spark 4.1 hands Python data sources EMPTY "
            "options after CREATE, and this statement's schema carries "
            "no recovery metadata — CTAS and column-list CREATE hit "
            "this). Two-step instead: seed the table with "
            "df.write.format('clx_table').option('path', ...) or "
            "write_table_source, THEN CREATE TABLE ... USING clx_table "
            "LOCATION '<path>'; INSERT INTO / INSERT OVERWRITE / "
            "SELECT on such a table work."
        )
    return opts


class TableDataSource(DataSource):
    """format("clx_table") — options:

    path           versioned table root (required)
    version        snapshot number (default: latest)
    tag            named snapshot (tag_version)
    timestampAsOf  epoch ms — newest commit at-or-before (TIMESTAMP AS OF)
    outSchema      DDL override (else derived from the snapshot's first
                   parquet footer; evolution-gap columns read as NULL)

    SQL surface on catalog tables (``CREATE TABLE ... USING clx_table
    LOCATION ...``): SELECT, INSERT INTO, INSERT OVERWRITE. Row-level
    SQL — UPDATE / DELETE / MERGE INTO — is refused by Spark's analyzer
    before any data is touched (pyspark 4.1's Python DSv2 exposes no
    SupportsRowLevelOperations; probed r09, pinned by
    test_clx_table_sql_row_level_dml_fails_loudly): use the Engine
    doors instead — ``merge_version`` / ``merge_version_dv`` for
    MERGE/UPDATE, ``delete_version`` / ``delete_version_dv`` /
    ``delete_keys_dv`` for DELETE. CTAS likewise requires the
    documented two-step (seed with write_table_source, then CREATE).
    """

    @classmethod
    def name(cls) -> str:
        return "clx_table"

    def _opts(self) -> dict:
        opts = {k.lower(): v for k, v in self.options.items()}
        if "path" in opts:
            # the session catalog qualifies CREATE TABLE paths into
            # file: URIs; manifests live on the plain local path
            import re

            opts["path"] = re.sub("^file:/+", "/", opts["path"])
        return opts

    def schema(self):
        # CATALOG-DML ENABLER: Spark 4.1 constructs the Python data
        # source with EMPTY options on every catalog-resolved scan/DML
        # (only the CREATE TABLE instance sees LOCATION/OPTIONS — see
        # README "catalog tables"). The one artifact the catalog DOES
        # persist and hand back to reader()/writer() is the SCHEMA, and
        # StructField metadata survives that round-trip. So when the
        # schema derives from the table (path known, no outSchema
        # override), it is returned as a StructType carrying the table
        # path in field-0 metadata — _recover_path() reads it back when
        # options arrive empty, making CREATE TABLE ... USING clx_table
        # LOCATION ... + INSERT INTO/SELECT work end to end.
        opts = self._opts()
        if "path" in opts and "outschema" not in opts:
            import pyarrow.parquet as pq
            import pyspark.sql.types as T
            from pyspark.sql.pandas.types import from_arrow_schema

            from ..sinks.versioned import table_schema

            # the manifest's recorded schema CONTRACT is authoritative
            # (one small JSON read, and metadata-only add_columns are
            # visible before any file carries them); legacy pre-contract
            # tables fall back to the newest file's footer. (No
            # SparkSession exists here, hence arrow not DDL parse.)
            # Every field reads as NULLABLE — older files' evolution-gap
            # columns pad NULL whatever the newest file's writer said
            try:
                # TIME TRAVEL reads the schema AS OF the requested
                # version (review r10: pairing the HEAD contract with an
                # older snapshot's colmap returned a renamed column as
                # all-NULL for pre-rename versions) — same resolution
                # rules as the reader itself
                _p, _v = _resolve_version(opts)
                st0 = table_schema(_p, version=_v)
            except (OSError, ValueError, KeyError, FileNotFoundError):
                st0 = None
            if st0 is None:
                st0 = from_arrow_schema(pq.read_schema(_newest_file(opts)))
            fields = [T.StructField(f.name, f.dataType, True, f.metadata)
                      for f in st0.fields]
            f0 = fields[0]
            md = dict(f0.metadata or {})
            md[_PATH_META_KEY] = opts["path"]
            fields[0] = T.StructField(f0.name, f0.dataType, True, md)
            return T.StructType(fields)
        return self._schema_ddl(opts)

    def _schema_ddl(self, opts) -> str:
        if "outschema" in opts:
            return opts["outschema"]
        return _parquet_ddl(_newest_file(opts))

    def reader(self, schema: StructType) -> "TableReader":
        # Spark refuses a reader that merely DEFINES pushFilters while
        # spark.sql.python.filterPushdown.enabled is false, so the
        # pushdown-capable subclass is chosen by option (set by
        # read_table_source from the live conf); the base reader still
        # serves every row correctly — pruning is pure optimization
        opts = _recover_path(self._opts(), schema)
        cls = (_PushdownTableReader
               if opts.get("pushdown", "").lower() == "true" else TableReader)
        return cls(schema, opts)

    def writer(self, schema: StructType, overwrite: bool) -> "TableWriter":
        return TableWriter(_recover_path(self._opts(), schema), overwrite,
                           schema)

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> "TableStreamWriter":
        return TableStreamWriter(_recover_path(self._opts(), schema), schema)

    def streamReader(self, schema: StructType) -> "TableStreamReader":
        return TableStreamReader(schema, _recover_path(self._opts(), schema))


class TableReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        from ..sinks.versioned import _read_manifest

        self._schema = schema
        self._cols = [f.name for f in schema.fields]
        path, v = _resolve_version(options)
        self._manifest = _read_manifest(path, v)
        # column mapping (Delta columnMapping shape): the query schema
        # speaks LOGICAL names; data files and manifest stats use the
        # immutable PHYSICAL names. Pushed filters translate at harvest
        # (pushFilters), reads translate per file (read) — identity for
        # unmapped tables.
        self._pmap = dict(
            (self._manifest.get("colmap") or {}).get("m", {}))
        # col -> [lo, hi] bounds accumulated from pushed filters, plus
        # equality/IN point-value lists for the bloom probe (a file is
        # skipped only when NO point can be present)
        self._bounds: dict[str, list] = {}
        self._points: dict[str, list] = {}
        # explicit opt-in LIMIT (the Python DSv2 API has no pushLimit):
        # each partition stops decoding after N surviving rows. Only
        # correct when the query applies no predicates beyond the
        # pushed ones, so it is an option the CALLER sets for
        # point-lookup/sample shapes, never inferred
        self._limit = (int(options["limit"])
                       if options.get("limit") else None)

    def partitions(self) -> list[TableFilePartition]:
        from ..sinks.versioned import (_BLOOM_KEY, _SidecarStats,
                                       _bloom_any_hit, _bloom_seed,
                                       _load_stats_sidecar, _sidecar_excluded,
                                       _stat_overlaps, _stats_for_cols)

        m = self._manifest
        files = m["files"]
        dv_map = m.get("dv", {})
        # column-selective planning: a filterless scan never opens the
        # stats sidecar at all; range predicates run vectorized in arrow
        # compute over the typed bound columns (no bloom bytes, no
        # per-row Python); only non-vectorizable bound types and bloom
        # point probes fall back to the per-file loop, and then only
        # over the range survivors
        need = sorted(set(self._bounds) | set(self._points))
        stats: dict = {}
        bounds = dict(self._bounds)
        if need:
            s = m.get("stats", {})
            if isinstance(s, _SidecarStats) and s._full is None:
                excluded: set[str] = set()
                for col, (lo, hi) in self._bounds.items():
                    e = _sidecar_excluded(s._segments, col, lo, hi)
                    if e is not None:
                        excluded |= e
                        del bounds[col]
                if excluded:
                    files = [f for f in files if f not in excluded]
                rest = sorted(set(bounds) | set(self._points))
                if rest:
                    stats = _load_stats_sidecar(
                        s._segments, cols=rest, blooms=bool(self._points),
                        files=files if len(files) <= 1024 else None)
            else:
                stats = _stats_for_cols(m, need, blooms=bool(self._points))
        keep = []
        for f in files:
            fstats = stats.get(f, {})
            ok = True
            for col, (lo, hi) in bounds.items():
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
        """One data file -> Arrow batches, STREAMED: row groups decode
        incrementally (iter_batches), so task memory is one batch — not
        one file — and an early-stopping consumer (LIMIT via the
        ``limit`` option) never decodes the tail. ROW-GROUP PRUNING
        (r09): the pushed bounds/points are first tested against each
        row group's footer statistics, so a point lookup into a
        bloom-kept 1-GiB file decodes only its matching row groups —
        the same skip Spark's native parquet reader gives the
        engine-side scan_version path. Column pruning: only the
        query-schema columns the file actually has are read; the
        parquet reader never decodes the rest. Deletion vectors apply
        per batch as a numpy boolean scatter over the batch's row-index
        window (dv positions are FILE-level row indexes, so each kept
        row group's batches offset from that group's first file row).
        Evolution-gap columns pad NULL."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.file)
        have = set(pf.schema_arrow.names)
        pmap = self._pmap
        want = [pmap.get(c, c) for c in self._cols
                if pmap.get(c, c) in have]
        dead_idx = _dead_positions(partition.file, partition.dv_dirs)

        def _pad(t, n):
            return _pad_to_schema(self._schema.fields, self._cols,
                                  pmap, t, n)

        limit = self._limit
        if not want:  # pure-gap projection (or COUNT(*)): counts only
            n = pf.metadata.num_rows
            if dead_idx is not None:
                n -= int((dead_idx < n).sum())
            if limit is not None:
                n = min(n, limit)
            yield from _pad(None, n).to_batches(max_chunksize=1 << 16)
            return
        kept_rgs, rg_offsets = _select_row_groups(
            pf, self._bounds, self._points)
        produced = 0
        for rg in kept_rgs:
            off = rg_offsets[rg]  # FILE-level row index of this group
            for rb in pf.iter_batches(batch_size=1 << 16, columns=want,
                                      row_groups=[rg]):
                t = pa.Table.from_batches([rb])
                n = rb.num_rows
                if dead_idx is not None:
                    sel = dead_idx[(dead_idx >= off) & (dead_idx < off + n)]
                    if sel.size:
                        keep = np.ones(n, dtype=bool)
                        keep[sel - off] = False
                        t = t.filter(pa.array(keep))
                off += n
                if t.num_rows == 0:
                    continue
                if limit is not None and produced + t.num_rows > limit:
                    t = t.slice(0, limit - produced)
                produced += t.num_rows
                yield from _pad(t, t.num_rows).to_batches(
                    max_chunksize=1 << 16)
                if limit is not None and produced >= limit:
                    return


def _dead_positions(file: str, dv_dirs: list[str]):
    """The file's tombstoned row indexes as an int64 numpy array, or
    None — shared by the batch and streaming readers (review r10: the
    harvest was duplicated). Sidecars are O(deleted rows); row order in
    the file IS the row index; reads column-prune to _file/_pos (r10 dv
    dirs carry extra null-flag columns)."""
    import glob

    import numpy as np
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if not dv_dirs:
        return None
    dead: set[int] = set()
    for d in dv_dirs:
        for p in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            dt = pq.read_table(p, columns=["_file", "_pos"])
            mask = pc.equal(dt["_file"], file)
            dead.update(dt.filter(mask)["_pos"].to_pylist())
    if not dead:
        return None
    return np.fromiter(dead, dtype=np.int64, count=len(dead))


def _pad_to_schema(schema_fields, out_names, pmap, t, n):
    """Project/pad an Arrow table onto the query schema: physical file
    columns surface under their logical names (column mapping), gap
    columns pad typed NULLs — shared by the batch and streaming
    readers."""
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    arrays = []
    for field in schema_fields:
        pn = pmap.get(field.name, field.name)
        if t is not None and pn in t.column_names:
            arrays.append(t[pn].combine_chunks())
        else:
            arrays.append(pa.nulls(n, type=to_arrow_type(field.dataType)))
    return pa.table(dict(zip(out_names, arrays)))


def _rg_minmax(rg_meta, col_idx):
    """(min, max) of one row group's column from the footer, or None
    when the writer recorded none / the logical type cannot surface
    them — the caller keeps the group (conservative)."""
    try:
        st = rg_meta.column(col_idx).statistics
        if st is None or not st.has_min_max:
            return None
        return (st.min, st.max)
    except Exception:
        return None


def _select_row_groups(pf, bounds: dict, points: dict
                       ) -> tuple[list[int], list[int]]:
    """Row-group pruning for the DSv2 read path: test the pushed
    bounds/point filters against each row group's FOOTER statistics
    (already decoded with the file open — no data pages touched) and
    return (kept row-group indices, per-group first-file-row offsets).
    Conservative in every failure mode — a group is dropped only when
    its stats PROVE the predicate empty; missing stats, absent columns,
    and incomparable types keep it. Pruning is pure gain: Spark
    re-applies all pushed filters row-level. The offsets let deletion
    vectors (file-level row indexes) stay exact across skipped groups."""
    from ..sinks.versioned import _stat_overlaps

    md = pf.metadata
    offsets, off = [], 0
    for rg in range(md.num_row_groups):
        offsets.append(off)
        off += md.row_group(rg).num_rows
    if not bounds and not points:
        return list(range(md.num_row_groups)), offsets
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    kept = []
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        ok = True
        for col, (lo, hi) in bounds.items():
            ci = names.get(col)
            rng = _rg_minmax(g, ci) if ci is not None else None
            if rng is not None and not _stat_overlaps(
                lo if lo is not None else rng[0],
                hi if hi is not None else rng[1],
                rng,
            ):
                ok = False
                break
        if ok:
            for col, vals in points.items():
                ci = names.get(col)
                rng = _rg_minmax(g, ci) if ci is not None else None
                if rng is not None and not any(
                    _stat_overlaps(v, v, rng) for v in vals
                ):
                    ok = False
                    break
        if ok:
            kept.append(rg)
    return kept, offsets


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
                    # harvest under the PHYSICAL name: manifest stats
                    # and row-group footers are keyed by it (identity
                    # for unmapped tables)
                    col = self._pmap.get(f.attribute[0], f.attribute[0])
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


class TableStreamPartition(InputPartition):
    """One file of one streamed commit (snapshot leg or appended file),
    plus its deletion-vector dirs and the commit's column mapping."""

    def __init__(self, file: str, dv_dirs: list[str], colmap: dict):
        self.file = file
        self.dv_dirs = dv_dirs
        self.colmap = colmap


class TableStreamReader(DataSourceStreamReader):
    """Append-only STREAMING reads of a versioned table — ``spark.
    readStream.format("clx_table")`` — Delta's plain streaming-source
    shape (VERDICT r10 item 4; until now streaming required the change
    feed, sources/cdf_source.py).

    Semantics (matching Delta's delta-as-a-source):
      * the FIRST batch is the INITIAL SNAPSHOT — the head manifest's
        files at stream start, deletion vectors applied;
      * every later batch reads exactly the files APPENDED by the
        commits since the checkpointed version — O(new data) per
        trigger, never a table rescan, planned off kilobyte manifests;
      * a rewriting commit (overwrite / delete / merge / compact)
        RAISES: its rows are a rewrite, not an increment — the same
        refusal as Delta without ``ignoreChanges``. Option
        ``ignoreChanges='true'`` skips those commits instead (appended
        files of mixed commits still stream; the caller accepts
        possibly-reprocessed rows — Delta's documented trade);
      * a RENAME/DROP COLUMN commit: the stream's schema is fixed at
        query start, so a mapping commit landing AFTER the stream
        started raises restart-the-stream (Delta's behavior). On the
        RESTART the schema re-derives from the head contract and the
        reader records the head as its SCHEMA VERSION — mapping
        commits at or below it are zero-row metadata commits the
        stream now crosses silently, resuming from the checkpoint
        under the new names with no rows lost or duplicated
        (VERDICT r10 item 3 — Delta needs schemaTrackingLocation for
        this because its sources pin schema in the checkpoint; this
        source re-derives schema at every start, so the manifest
        history IS the tracking log). Every partition reads through
        the SCHEMA version's logical→physical mapping — physical
        names are immutable, so files appended under any earlier
        mapping still project correctly onto the live schema.

    Offsets are manifest versions ({"v": processed-through, "snap":
    snapshot-pending flag}), checkpointed by Spark. DETERMINISTIC
    RESTART (review r10): a batch's work derives from its WAL'd START
    and END offsets alone — the snapshot leg reads the manifest of the
    END offset's version, never a re-evaluated ``latest_version`` — so
    a crash-restart of the uncommitted first batch replays exactly the
    same snapshot even if writers appended meanwhile (those commits
    arrive as later increments, exactly once). Options:
    ``startingVersion`` (int, or 'latest' for new-commits-only;
    default: initial snapshot), ``maxVersionsPerBatch`` (bounded
    catch-up, default 100; one uncapped window after a restart — the
    same safe degradation as the CDF reader), ``ignoreChanges``.

    ``maxFilesPerTrigger`` (r11, Delta's file-granular rate limit):
    bounds each micro-batch by FILES, splitting WITHIN a version when
    a single commit (or the initial snapshot — at 100 TB that is the
    whole table) exceeds the cap. Offsets then extend with file
    cursors: {"snap": 1, "sv": V, "i": k} = the pinned snapshot
    version V delivered through file k; {"v": c, "i": k} = version c
    complete plus k files of c+1's append set. Both slice the
    IMMUTABLE manifest file list, so replays of a WAL'd (start, end]
    window are byte-deterministic. Soft cap (at least one file per
    trigger, Delta's rule); unset = whole-version batches, offsets
    byte-identical to r10 (old checkpoints resume unchanged). The
    planner's cursor is re-learned from every partitions()/commit()
    call's WAL'd end offset, so a window planned before the reader has
    seen ANY position (the first window of a fresh query or restart)
    degrades to uncapped, never to wrong: a mid-snapshot start's WAL'd
    offset carries the pinned sv, and that batch delivers the snapshot
    TAIL plus the increments to head, exactly once.

    Trigger semantics (the Python DSv2 API has no admission control,
    so Delta's multi-batch-per-run draining is not expressible):
    under a processingTime trigger the cap rate-limits every
    micro-batch after the first — true steady-state limiting. An
    availableNow run plans ONE window (Spark's available-now wrapper
    captures latestOffset up front), so the cap bounds THE RUN at
    maxFilesPerTrigger files: rerun from the same checkpoint to drain
    in bounded increments (the same per-run contract as
    maxVersionsPerBatch's bounded catch-up), or leave the cap unset
    for drain-everything runs."""

    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._cols = [f.name for f in schema.fields]
        self._path = options["path"]
        self._max_versions = int(options.get("maxversionsperbatch", "100"))
        mft = options.get("maxfilespertrigger")
        self._mft = int(mft) if mft else None
        mbt = options.get("maxbytespertrigger")
        self._mbt = int(mbt) if mbt else None
        for name, v in (("maxFilesPerTrigger", self._mft),
                        ("maxBytesPerTrigger", self._mbt)):
            if v is not None and v <= 0:
                raise ValueError(
                    f"{name} must be positive, got {v} — omit the "
                    "option for unlimited (Delta rejects non-positive "
                    "values the same way)"
                )
        # startingVersion / startingTimestamp: ONE shared resolver
        # with the CDF reader (sinks.versioned.resolve_starting_option
        # — inclusive at-or-after, epoch-ms validated, expired-boundary
        # aware; review r11 deduplicated the first two copies)
        from ..sinks.versioned import resolve_starting_option

        self._starting = resolve_starting_option(self._path, options)
        self._ignore_changes = (
            options.get("ignorechanges", "").lower() == "true")
        self._ignore_deletes = (
            options.get("ignoredeletes", "").lower() == "true")
        self._cursor: int | None = None
        self._cur_off: dict | None = None  # last emitted end (capped path)
        self._snap_total: tuple | None = None  # (snapshot version, file list)
        # SCHEMA TRACKING (VERDICT r10 item 3): the version whose
        # contract this query's fixed schema reflects, and that
        # version's logical->physical mapping. Mapping commits at or
        # below it are crossable metadata no-ops; one landing above it
        # raises restart-the-stream (and the restart lands here again
        # with the new head). Tracking stays off when the query schema
        # is not the head contract (outSchema override / no recorded
        # contract) — those streams keep the always-raise behavior.
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
                if set(self._cols) <= names:
                    self._schema_v = head
                    self._smap = dict(
                        (m.get("colmap") or {}).get("m", {}))
                    self._track = True

    def initialOffset(self) -> dict:
        from ..sinks.versioned import latest_version

        if self._starting is None:
            # initial-snapshot mode: DETERMINISTIC ({"snap": 1} always)
            # — the snapshot version is pinned by the first batch's
            # WAL'd END offset, not by whatever the head is when this
            # re-evaluates after a crash
            off = {"v": -1, "snap": 1}
        elif str(self._starting) == "latest":
            head = latest_version(self._path)
            off = {"v": -1 if head is None else head, "snap": 0}
        else:
            off = {"v": int(self._starting) - 1, "snap": 0}
        self._cursor = off["v"]
        self._cur_off = off
        return off

    def _append_set(self, v: int,
                    prev_files: set | None = None) -> tuple[list, set]:
        """(version v's appended files — manifest's stable order, so
        slices replay byte-identically — and v's full file set, for the
        caller's next-step reuse: one manifest parse per version)."""
        from ..sinks.versioned import _read_manifest

        m = _read_manifest(self._path, v)
        if prev_files is None:
            prev_files = (set(_read_manifest(self._path, v - 1)["files"])
                          if v > 0 else set())
        return ([f for f in m["files"] if f not in prev_files],
                set(m["files"]))

    def _latest_offset_filecapped(self, head: int) -> dict:
        """The rate-limited END planner: walk files forward from the
        cursor, spending the file budget (maxFilesPerTrigger) and the
        byte budget (maxBytesPerTrigger — soft max, Delta's rule: keep
        adding while under, always at least one file per trigger; sizes
        are one os.stat per candidate file, driver-side, bounded by the
        window). Offsets carry only FILE indexes, so byte caps change
        where a cursor stops, never what a WAL'd (start, end] replays."""
        from ..sinks.versioned import _read_manifest

        cur = self._cur_off
        state = {"files": (self._mft if self._mft is not None
                           else float("inf")),
                 "bytes": (self._mbt if self._mbt is not None
                           else float("inf")),
                 "took": 0}

        def spend(files: list, i: int) -> int:
            while i < len(files) and state["files"] > 0 and (
                    state["bytes"] > 0 or state["took"] == 0):
                if self._mbt is not None:
                    try:
                        state["bytes"] -= os.path.getsize(files[i])
                    except OSError:
                        # unstat-able (races with expire, remote
                        # hiccup): fail SMALL, not unbounded — treat
                        # the file as exhausting the byte budget (it
                        # still gets taken; the at-least-one rule and
                        # the file cap are unaffected). Review r11: a
                        # zero-cost fallback silently disabled the cap
                        # the user explicitly set.
                        state["bytes"] = 0
                i += 1
                state["files"] -= 1
                state["took"] += 1
            return i

        def spent() -> bool:
            return state["files"] <= 0 or (
                state["bytes"] <= 0 and state["took"] > 0)

        if cur.get("snap"):
            sv = cur.get("sv")
            if sv is None:  # pin the snapshot version NOW
                if head < 0:
                    return cur  # empty table: no progress
                sv = head
            if not self._snap_total or self._snap_total[0] != sv:
                self._snap_total = (sv, _read_manifest(
                    self._path, sv)["files"])
            files = self._snap_total[1]
            ni = spend(files, int(cur.get("i", 0)))
            off = ({"v": -1, "snap": 1, "sv": sv, "i": ni}
                   if ni < len(files) else {"v": sv, "snap": 0})
            self._cur_off = off
            return off
        c, i = int(cur["v"]), int(cur.get("i", 0))
        limit = min(head, c + self._max_versions)
        p, prev_files = c + 1, None
        while not spent() and p <= limit:
            aset, files = self._append_set(p, prev_files)
            i = spend(aset, i)
            if i >= len(aset):
                prev_files = files
                c, i = p, 0
                p += 1
            else:
                break
        off = {"v": c, "snap": 0}
        if i:
            off["i"] = i
        self._cur_off = off
        return off

    def latestOffset(self) -> dict:
        from ..sinks.versioned import latest_version

        head = latest_version(self._path)
        head = -1 if head is None else head
        if (self._mft is not None or self._mbt is not None) \
                and self._cur_off is not None:
            return self._latest_offset_filecapped(head)
        if self._cursor is not None and not (
            self._starting is None and self._cursor < 0
        ):
            # bounded catch-up: cap the END offset itself so the
            # checkpoint never records skipped versions as processed.
            # The snapshot-mode FIRST window is never capped — its
            # batch reads one manifest however far ahead the head is
            # (capping it would instead force an increment walk through
            # pre-snapshot history, which may contain rewrites)
            head = max(self._cursor,
                       min(head, self._cursor + self._max_versions))
        self._cursor = head
        off = {"v": head, "snap": 0}
        self._cur_off = off  # restart fallback: capped from NEXT window
        return off

    def partitions(self, start: dict, end: dict) -> list[TableStreamPartition]:
        from ..sinks.versioned import _read_manifest

        s, e = int(start["v"]), int(end["v"])
        self._cursor = max(self._cursor or -1, s, e)
        # the END offset is this reader's most reliable cursor: under a
        # restart (or the availableNow wrapper, which captures
        # latestOffset BEFORE initialOffset) the planning instance has
        # never seen the checkpointed position — the WAL'd end passed
        # here is it, and recording it arms the file-capped path for
        # the next window
        self._cur_off = dict(end)
        parts: list[TableStreamPartition] = []
        if int(start.get("snap", 0)):
            # initial snapshot leg: the PINNED version's file set,
            # dv-applied — sliced by the offsets' file cursors when
            # maxFilesPerTrigger split it. The pinned version rides in
            # whichever WAL'd offset carries it (end while splitting,
            # start after a mid-snapshot restart), falling back to the
            # END version (the whole-snapshot-in-one-batch shape).
            sv = start.get("sv", end.get("sv", e))
            sv = -1 if sv is None else int(sv)
            if sv >= 0:
                m = _read_manifest(self._path, sv)
                # project through the SCHEMA version's mapping when
                # tracking (physical names are immutable, so it is
                # correct for files of every age); the snapshot
                # manifest's own mapping otherwise (pre-tracking)
                cmap = (dict(self._smap) if self._track
                        else dict((m.get("colmap") or {}).get("m", {})))
                dv_map = m.get("dv", {})
                files = m["files"]
                a = int(start.get("i", 0))
                b = (int(end["i"]) if int(end.get("snap", 0))
                     else len(files))
                for f in files[a:b]:
                    parts.append(TableStreamPartition(
                        f, sorted({x["d"] for x in dv_map.get(f, [])}),
                        cmap))
            if int(end.get("snap", 0)):
                return parts  # still mid-snapshot: no incremental leg
            # the snapshot completes in THIS batch; a restart-fallback
            # window may extend past it — deliver sv+1..e increments
            # too (exactly the rows a non-split snapshot at e covers)
            parts.extend(self._increment_parts(sv, 0, e, 0))
            return parts
        parts.extend(self._increment_parts(
            s, int(start.get("i", 0)), e, int(end.get("i", 0))))
        return parts

    def _increment_parts(self, s: int, si: int, e: int,
                         ei: int) -> list[TableStreamPartition]:
        """Appended files of versions (s, e], starting at file ``si``
        of version s+1, plus the first ``ei`` files of version e+1
        when the END offset split mid-version (maxFilesPerTrigger)."""
        from ..sinks.versioned import (_APPEND_SAFE_OPS, _read_manifest)

        parts: list[TableStreamPartition] = []
        first = s + 1
        last = e + 1 if ei else e
        for v in range(first, last + 1):
            m = _read_manifest(self._path, v)
            op = m["op"]
            if op not in _APPEND_SAFE_OPS:
                if op in ("rename-column", "drop-columns"):
                    if self._track and v <= self._schema_v:
                        # a mapping commit the query's schema already
                        # reflects: zero rows changed, zero files added
                        # — crossable (the schema-tracking restart
                        # path, VERDICT r10 item 3)
                        continue
                    raise ValueError(
                        f"version {v} changed the column mapping ({op}); "
                        "the stream's schema is fixed at query start — "
                        "restart the stream to resume from the "
                        "checkpoint under the new column names (Delta's "
                        "schemaTrackingLocation shape; no rows are lost "
                        "or duplicated)"
                    )
                if op == "delete-dv" and self._ignore_deletes:
                    # Delta's ignoreDeletes: a merge-on-read DELETE
                    # adds tombstones and NO files — already-delivered
                    # rows are not retracted, nothing new streams.
                    # (Copy-on-write deletes rewrite files and commit
                    # as 'overwrite' — those need ignoreChanges, same
                    # as Delta's rewriting deletes.)
                    continue
                if not self._ignore_changes:
                    raise ValueError(
                        f"version {v} rewrote row state (op {op!r}); an "
                        "append-only stream cannot cross it — pass "
                        ".option('ignoreDeletes','true') if this is a "
                        "merge-on-read delete (tombstones only, no "
                        "rows retracted), .option('ignoreChanges',"
                        "'true') to skip all rewriting commits (rows "
                        "they rewrote may reprocess), or stream the "
                        "change feed (clx_cdf) for exact row-level "
                        "deltas"
                    )
            base = (set(_read_manifest(self._path, v - 1)["files"])
                    if v > 0 else set())
            cmap = (dict(self._smap) if self._track
                    else dict((m.get("colmap") or {}).get("m", {})))
            aset = [f for f in m["files"] if f not in base]
            lo = si if v == first else 0
            hi = ei if (ei and v == last) else len(aset)
            for f in aset[lo:hi]:
                # appended files carry no dv at their own commit
                parts.append(TableStreamPartition(f, [], cmap))
        return parts

    def read(self, partition: TableStreamPartition):
        """One file -> Arrow batches, streamed (shared dv-harvest and
        pad helpers with the batch TableReader.read, minus its
        predicate/limit pruning — streams read whole appended files)."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.file)
        have = set(pf.schema_arrow.names)
        pmap = partition.colmap
        want = [pmap.get(c, c) for c in self._cols
                if pmap.get(c, c) in have]
        dead_idx = _dead_positions(partition.file, partition.dv_dirs)

        def _pad(t, n):
            return _pad_to_schema(self._schema.fields, self._cols,
                                  pmap, t, n)

        if not want:
            n = pf.metadata.num_rows
            if dead_idx is not None:
                n -= int((dead_idx < n).sum())
            yield from _pad(None, n).to_batches(max_chunksize=1 << 16)
            return
        off = 0
        for rb in pf.iter_batches(batch_size=1 << 16, columns=want):
            t = pa.Table.from_batches([rb])
            n = rb.num_rows
            if dead_idx is not None:
                sel = dead_idx[(dead_idx >= off) & (dead_idx < off + n)]
                if sel.size:
                    keep = np.ones(n, dtype=bool)
                    keep[sel - off] = False
                    t = t.filter(pa.array(keep))
            off += n
            if t.num_rows:
                yield from _pad(t, t.num_rows).to_batches(
                    max_chunksize=1 << 16)

    def commit(self, end: dict) -> None:
        # offsets live entirely in the checkpoint; the committed end is
        # also a valid cursor for the file-capped planner (see
        # partitions)
        self._cur_off = dict(end)


def stream_table(
    spark: SparkSession,
    path: str,
    starting_version: int | str | None = None,
    starting_timestamp_ms: int | None = None,
    max_versions_per_batch: int = 100,
    ignore_changes: bool = False,
    ignore_deletes: bool = False,
    max_files_per_trigger: int | None = None,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a versioned table's appends (TableStreamReader):
    initial snapshot + per-commit increments, Delta's plain streaming
    source. ``max_files_per_trigger`` / ``max_bytes_per_trigger`` bound each
    micro-batch by files / bytes (splitting within a version / the
    initial snapshot when needed — Delta's maxFilesPerTrigger and
    maxBytesPerTrigger; the byte cap is a soft max, at least one file
    per trigger). For exact row-level change semantics
    across merges/deletes, stream the change feed instead
    (cdf_source.stream_changes)."""
    _ensure_active_session(spark)
    register_datasource_once(spark, TableDataSource)
    reader = (
        spark.readStream.format("clx_table")
        .option("path", path)
        .option("maxVersionsPerBatch", str(max_versions_per_batch))
    )
    if starting_version is not None:
        reader = reader.option("startingVersion", str(starting_version))
    if starting_timestamp_ms is not None:
        reader = reader.option("startingTimestamp",
                               str(starting_timestamp_ms))
    if ignore_changes:
        reader = reader.option("ignoreChanges", "true")
    if ignore_deletes:
        reader = reader.option("ignoreDeletes", "true")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    if max_bytes_per_trigger is not None:
        reader = reader.option("maxBytesPerTrigger",
                               str(max_bytes_per_trigger))
    return reader.load()


class TableCommitMessage(WriterCommitMessage):
    """Per-task result: the parquet files the task staged, plus the
    per-file manifest stats (footer min/max, row count, key blooms) the
    task derived from its OWN file — KB-sized bitmaps, so the driver
    commit merges metadata instead of re-reading committed rows.
    ``cols`` records the (stats_cols, bloom_cols) the task computed
    for, so the commit can detect a concurrent tracked-column change
    and fall back to driver-side derivation."""

    def __init__(self, files: list[str], stats: dict | None = None,
                 cols: tuple | None = None):
        self.files = files
        self.stats = stats or {}
        self.cols = cols


def _resolve_tracked_cols(
    path: str, stats_cols: list[str] | None, bloom_cols: list[str] | None,
) -> tuple[list[str] | None, list[str] | None]:
    """Default the tracked stats/bloom columns to whatever the table's
    head manifest already tracks, so SQL writers cannot silently degrade
    the table's file-skipping index. Shared by the writers' driver-side
    __init__ (tasks need the column list up front) and the commit path
    (which re-resolves to detect drift)."""
    if stats_cols is not None and bloom_cols is not None:
        return stats_cols, bloom_cols
    from ..sinks.versioned import (_read_manifest, _tracked_col_sets,
                                   latest_version)

    head = latest_version(path)
    plain, blooms = (_tracked_col_sets(_read_manifest(path, head))
                     if head is not None else (set(), set()))
    if stats_cols is None:
        stats_cols = sorted(plain) or None
    if bloom_cols is None:
        bloom_cols = sorted(blooms) or None
    return stats_cols, bloom_cols


def _cols_key(stats_cols: list[str] | None,
              bloom_cols: list[str] | None) -> tuple:
    return (tuple(stats_cols or ()), tuple(bloom_cols or ()))


def _plan_write_mapping(path: str, schema) -> dict:
    """The columnMapping WRITER feature for the DSv2/SQL doors (r11;
    the r10 gate `_refuse_column_mapped` refused mapped tables
    outright). Resolve, at PLANNING time, the physical name every
    written logical column's staged files must store — physical names
    are immutable across renames, so the translation is just the head
    manifest's logical->physical map, plus `_assign_fresh_physicals`
    for evolution columns outside the contract (a new column named
    like a retired physical must NOT resurrect old bytes).

    Returns a plan dict:
      pmap     logical -> physical for the WRITE schema (identity for
               unmapped tables — every hot path stays branch-free)
      mapping/dropped/xl   the colmap to COMMIT (mapping includes any
               fresh-physical assignments for evolution columns)
      head_colmap   the planning-time mapping state; the commit refuses
               if it moved (a rename/drop raced the write — staged
               files are immutable, Delta fails concurrent metadata
               txns the same way). Plain interleaved appends carry the
               colmap verbatim, so append rebase still works; schema
               drift needs no planning-time pin — the commit loop
               re-enforces against each head it rebases onto.
      active   True when any translation applies (gates every check)

    A MAPPED table with no write schema (``schema=None`` — possible
    only through direct construction; Spark always hands the DSv2
    writers the query schema) REFUSES like the r10 gate did: without
    the schema there is no translation to plan, and committing
    logical-named files to a mapped table is silent corruption (every
    read would translate the logical name away and pad NULLs)."""
    from ..sinks.versioned import (_assign_fresh_physicals, _colmap,
                                   _read_manifest, _schema_from_json,
                                   _xl, latest_version)

    head = latest_version(path)
    m = _read_manifest(path, head) if head is not None else {}
    mapping, dropped = _colmap(m)
    xl = _xl(m)
    if schema is None and (mapping or dropped):
        raise ValueError(
            f"table at {path} has an active column mapping (renamed or "
            "dropped columns) and this writer was given no write "
            "schema — the logical->physical translation cannot be "
            "planned; write through the DataFrame API "
            "(write.format('clx_table')) or the engine API "
            "(append_version / overwrite_version / merge_version)"
        )
    tbl = _schema_from_json(m.get("schema"))
    tbl_names = {f.name for f in tbl.fields} if tbl is not None else set()
    if tbl is not None and schema is not None:
        # DETERMINISTIC fresh physicals (review r11, confirmed
        # corruption): Spark instantiates this writer in more than one
        # python process per write (task-side and commit-side); every
        # instance MUST derive the same fresh name or the staged files
        # and the committed mapping disagree and the evolved column
        # reads back NULL. The salt uses ONLY mapping state — exactly
        # what the commit's drift check pins (review r12: a plain
        # append racing between the two instantiations bumps the head
        # VERSION without moving the colmap, so a version-salted plan
        # diverged while the drift check passed). A racing commit that
        # DOES move the colmap changes this salt and trips the drift
        # check, so divergent plans can never both commit; the commit
        # additionally verifies staged parquet footers against the
        # mapping it is about to record.
        salt = json.dumps(m.get("colmap"), sort_keys=True)
        _assign_fresh_physicals(
            mapping, dropped, tbl_names,
            [f for f in schema.fields if f.name not in tbl_names],
            salt=salt)
    pmap = ({f.name: mapping.get(f.name, f.name) for f in schema.fields}
            if schema is not None else {})
    return {
        "pmap": pmap,
        "mapping": mapping, "dropped": dropped, "xl": xl,
        "head_colmap": json.dumps(m.get("colmap"), sort_keys=True),
        "active": bool(mapping or dropped or xl),
    }


class TableWriter(DataSourceArrowWriter):
    """DSv2 BATCH writer for versioned tables — the SQL write door
    (``df.write.format("clx_table")``, ``INSERT INTO`` on a
    ``CREATE TABLE ... USING clx_table`` relation) onto the same
    manifest format the Python API commits.

    Shape: each task streams its Arrow batches into ONE immutable
    parquet file under a staging dir inside ``<table>/data/`` (never
    rewritten — a crashed/aborted job leaves orphans that
    expire_versions reclaims) and stats it TASK-SIDE (footer min/max,
    row count, key blooms — the rows are already in the task's hands,
    so a backfill-sized commit never serializes O(rows) reads through
    the driver); the driver-side ``commit`` merges the KB-sized shipped
    stats, enforces the table's CHECK constraints, and runs the same
    manifest CAS loop as append_version / overwrite_version (append
    rebases through interleaved commits; an overwrite that loses the
    race surfaces VersionConflictError).

    Options: ``statsCols`` / ``bloomCols`` (comma-separated) override
    the tracked columns; by default the commit re-derives whatever the
    table's head manifest already tracks, so SQL writers cannot
    silently degrade the table's file-skipping index.

    Constraint note: CHECK expressions are validated here with DuckDB
    over the staged files (no SparkSession on the commit path), so
    they must stay in the ANSI subset both engines parse — true for
    the comparison/null-test shapes constraints are made of; anything
    unparseable fails CLOSED (the write is refused, never silently
    unchecked)."""

    def __init__(self, options: dict, overwrite: bool,
                 schema: StructType | None = None):
        self._path = options["path"]
        self._overwrite = overwrite
        # columnMapping writer feature (r11): staged files store
        # PHYSICAL names; the plan resolves the translation and the
        # commit refuses if a DDL moved the mapping mid-write
        self._plan = _plan_write_mapping(self._path, schema)
        # user-given statsCols/bloomCols are LOGICAL names; staged
        # files and manifest stats store PHYSICAL — translate here,
        # ONCE (the manifest-derived defaults below are already
        # physical: stats keys; translating those again would be the
        # double-translation bug the colmap invariants forbid)
        pmap = self._plan["pmap"]
        self._stats_cols = [pmap.get(c, c) for c in
                            options.get("statscols", "").split(",")
                            if c] or None
        self._bloom_cols = [pmap.get(c, c) for c in
                            options.get("bloomcols", "").split(",")
                            if c] or None
        self._evolve = options.get("mergeschema", "").lower() == "true"
        # resolve the tracked columns NOW (driver-side planning): each
        # write task stats its own staged file with the rows already in
        # hand, so the driver commit never re-reads committed data
        self._task_cols = _resolve_tracked_cols(
            self._path, self._stats_cols, self._bloom_cols)
        import uuid as _uuid

        self._staging = os.path.join(
            self._path, "data", f"dsv2-{_uuid.uuid4().hex[:8]}")

    def write(self, iterator) -> TableCommitMessage:
        return _write_task_file(self._staging, iterator, self._task_cols,
                                self._plan["pmap"])

    def commit(self, messages) -> None:
        files = sorted(f for msg in messages if msg for f in msg.files)
        try:
            _commit_staged_files(
                self._path, files, overwrite=self._overwrite,
                stats_cols=self._stats_cols, bloom_cols=self._bloom_cols,
                shipped=_merge_shipped(messages),
                evolve=self._evolve,
                plan=self._plan,
            )
        except Exception:
            self.abort(messages)
            raise

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self._staging, ignore_errors=True)


class TableStreamWriter(DataSourceStreamArrowWriter):
    """DSv2 STREAMING writer — ``stream.writeStream.format("clx_table")``
    — the declarative form of streaming/jobs.versioned_ingest_stream:
    every micro-batch commits one version through the shared staged-file
    commit, with ``txn=(txnAppId, batchId)`` recorded atomically inside
    the manifest, so a replayed epoch (at-least-once delivery, restart
    from checkpoint) is a manifest-level no-op and ingestion is
    EXACTLY-ONCE end to end without foreachBatch.

    Options: ``txnAppId`` — the exactly-once identity; it must be
    STABLE across restarts and UNIQUE per logical stream. Defaults to
    a hash of the CHECKPOINT LOCATION (Delta's streaming-sink rule):
    batch ids restart at 0 with a fresh checkpoint, so the identity
    must reset with the checkpoint too — a table-path default would
    silently no-op every batch of a restarted-with-new-checkpoint (or
    second) stream at-or-below the table's recorded watermark. With
    neither txnAppId nor a checkpointLocation option the writer FAILS
    LOUDLY rather than guess.

    UPGRADE NOTE (pre-r08 streams): the default identity used to be a
    hash of the TABLE PATH. An existing no-txnAppId stream resuming the
    same checkpoint under this revision commits under the new
    checkpoint-derived id, so a batch that committed to the table but
    not yet to Spark's checkpoint at upgrade time would replay once.
    To retain the legacy watermark, set txnAppId explicitly to
    'clx-table-stream-' + md5(table_path)[:12] — an automatic fallback
    is deliberately NOT applied, because honoring the legacy watermark
    under a FRESH checkpoint is exactly the silent-data-loss bug this
    change fixes. ``statsCols`` / ``bloomCols`` as on
    the batch writer (default: re-derive the head manifest's tracked
    columns). CHECK constraints are enforced per batch (fail closed).

    Epoch semantics: ``commit(messages, batchId)`` is invoked once per
    successful epoch with every task's staged files; ``abort`` removes
    only that epoch's files (staged per-batch subdirs); a batch id at
    or below the table's recorded watermark leaves its staged files as
    expire-reclaimable orphans and commits nothing."""

    def __init__(self, options: dict, schema: StructType | None = None):
        import hashlib as _hashlib

        self._path = options["path"]
        # columnMapping writer feature (r11): same plan/translate/
        # drift-check shape as the batch writer; a rename landing
        # mid-stream fails the batch commit loudly, and the restarted
        # sink re-plans under the new mapping
        self._plan = _plan_write_mapping(self._path, schema)
        pmap = self._plan["pmap"]
        self._stats_cols = [pmap.get(c, c) for c in
                            options.get("statscols", "").split(",")
                            if c] or None
        self._bloom_cols = [pmap.get(c, c) for c in
                            options.get("bloomcols", "").split(",")
                            if c] or None
        self._evolve = options.get("mergeschema", "").lower() == "true"
        ckpt = options.get("checkpointlocation")
        if options.get("txnappid"):
            self._app_id = options["txnappid"]
        elif ckpt:
            # per-checkpoint identity: batch ids and the app id reset
            # TOGETHER, so a fresh checkpoint (or a second stream with
            # its own checkpoint) never collides with the table's
            # recorded watermark for a previous stream
            self._app_id = (
                "clx-table-stream-"
                + _hashlib.md5(ckpt.encode()).hexdigest()[:12]
            )
            # RUNTIME upgrade signal (ADVICE r08): pre-r08 the default
            # identity hashed the TABLE PATH. If the table carries a
            # watermark under that legacy id and none under the new
            # checkpoint-derived one, this is very likely an existing
            # stream resuming its old checkpoint across the upgrade —
            # warn loudly, naming the exact option that restores
            # watermark continuity. (No automatic fallback: honoring
            # the legacy watermark under a FRESH checkpoint is the
            # silent-data-loss bug the r08 change fixed.)
            legacy = (
                "clx-table-stream-"
                + _hashlib.md5(self._path.encode()).hexdigest()[:12]
            )
            try:
                from ..sinks.versioned import _read_manifest, latest_version

                head = latest_version(self._path)
                txn_map = (_read_manifest(self._path, head).get("txn", {})
                           if head is not None else {})
            except Exception:
                txn_map = {}
            if legacy in txn_map and self._app_id not in txn_map:
                import warnings

                warnings.warn(
                    "clx_table stream writer: this table's exactly-once "
                    f"watermark was recorded under the LEGACY identity "
                    f"{legacy!r} (pre-r08 default: table-path hash), but "
                    "this stream will commit under the checkpoint-derived "
                    f"identity {self._app_id!r}. If this is the same "
                    "logical stream resuming its old checkpoint, one "
                    "in-flight batch may replay once — set "
                    f".option('txnAppId', '{legacy}') to retain the "
                    "legacy watermark. A stream with a fresh checkpoint "
                    "should keep the new identity.",
                    stacklevel=2,
                )
        else:
            raise ValueError(
                "clx_table stream writer needs an exactly-once identity: "
                "pass .option('txnAppId', ...) or a checkpointLocation "
                "option (session-default checkpoint dirs are not visible "
                "to the sink)"
            )
        # tracked columns resolved once at query start; a mid-stream
        # tracked-column change is caught by the commit-time re-check
        # (falls back to driver-side derivation for that batch)
        self._task_cols = _resolve_tracked_cols(
            self._path, self._stats_cols, self._bloom_cols)
        import uuid as _uuid

        self._staging = os.path.join(
            self._path, "data", f"dsv2s-{_uuid.uuid4().hex[:8]}")

    def write(self, iterator) -> TableCommitMessage:
        return _write_task_file(self._staging, iterator, self._task_cols,
                                self._plan["pmap"])

    def commit(self, messages, batchId: int) -> None:
        from ..sinks.versioned import _colmap_key

        files = sorted(f for msg in messages if msg for f in msg.files)
        _commit_staged_files(
            self._path, files, overwrite=False,
            stats_cols=self._stats_cols, bloom_cols=self._bloom_cols,
            txn=(self._app_id, int(batchId)),
            shipped=_merge_shipped(messages),
            evolve=self._evolve,
            plan=self._plan,
        )
        # this writer OUTLIVES the batch (one instance per query run):
        # the commit it just made IS the new head mapping — an
        # evolution batch whose fresh-physical assignment changed the
        # colmap would otherwise trip the NEXT batch's drift check as a
        # phantom concurrent DDL (review r11). Real renames/drops still
        # refuse: they produce a colmap this expression cannot.
        self._plan["head_colmap"] = json.dumps(
            _colmap_key(self._plan["mapping"], self._plan["dropped"],
                        self._plan["xl"]), sort_keys=True)

    def abort(self, messages, batchId: int) -> None:
        for msg in messages:
            if msg:
                for f in msg.files:
                    try:
                        os.remove(f)
                    except OSError:
                        pass


def _write_task_file(staging: str, iterator, task_cols: tuple,
                     pmap: dict | None = None) -> TableCommitMessage:
    """The per-task body of both DSv2 writers: stream the task's Arrow
    batches into ONE immutable staged parquet file, then stat THAT file
    task-side (footer min/max + row count + key blooms — the rows are
    right here; shipping the KB-sized result beats re-reading them
    through the driver at commit, the r07 `weak`).

    ``pmap`` (columnMapping writer feature, r11): logical->physical
    rename applied to every batch before it hits parquet — a zero-copy
    Arrow metadata swap, so mapped tables pay nothing per row."""
    import uuid as _uuid

    import pyarrow.parquet as pq

    os.makedirs(staging, exist_ok=True)
    fname = os.path.join(staging, f"part-{_uuid.uuid4().hex}.parquet")
    translate = bool(pmap) and any(pmap[c] != c for c in pmap)
    writer = None
    try:
        for batch in iterator:
            if translate:
                batch = batch.rename_columns(
                    [pmap.get(n, n) for n in batch.schema.names])
            if writer is None:
                writer = pq.ParquetWriter(fname, batch.schema)
            writer.write_batch(batch)
    finally:
        if writer is not None:
            writer.close()
    if writer is None:
        return TableCommitMessage([])
    from ..sinks.versioned import _file_stats

    stats_cols, bloom_cols = task_cols
    return TableCommitMessage(
        [fname], _file_stats([fname], stats_cols, bloom_cols),
        _cols_key(stats_cols, bloom_cols),
    )


def _merge_shipped(messages) -> tuple[tuple, dict] | None:
    """Fold the tasks' shipped per-file stats into one (cols, stats)
    pair; None when any file arrived without stats (legacy message) or
    tasks disagree on the column set — the commit then falls back to
    driver-side derivation."""
    cols = None
    stats: dict = {}
    for msg in messages:
        if not msg or not msg.files:
            continue
        if getattr(msg, "cols", None) is None or any(
            f not in msg.stats for f in msg.files
        ):
            return None
        if cols is None:
            cols = msg.cols
        elif cols != msg.cols:
            return None
        stats.update(msg.stats)
    return None if cols is None else (cols, stats)


def _commit_staged_files(
    path: str, files: list[str], overwrite: bool,
    stats_cols: list[str] | None, bloom_cols: list[str] | None,
    txn: tuple[str, int] | None = None,
    shipped: tuple[tuple, dict] | None = None,
    evolve: bool = False,
    plan: dict | None = None,
) -> int | None:
    """Driver-side commit shared by the batch and streaming DSv2
    writers: constraint check (DuckDB — no SparkSession on this path,
    fail CLOSED on anything unevaluable), per-file stats assembly, and
    the manifest CAS loop (appends rebase; overwrites raise).

    Stats come from the write TASKS (``shipped`` — each task stated its
    own file with the rows in hand; this path merges KB-sized dicts and
    reads no data), falling back to driver-side _file_stats only when a
    message lacks them or the tracked-column set changed between
    planning and commit. ``txn=(app_id, batch_id)`` gives streaming
    exactly-once: a replayed batch id is a no-op returning None with
    its staged files left as expire-reclaimable orphans.

    ``plan`` (columnMapping writer feature, r11 — _plan_write_mapping):
    staged files store PHYSICAL column names; everything here that
    compares staged columns to the table CONTRACT (constraint exprs,
    schema enforcement, evolution) first translates back to LOGICAL via
    the plan's inverse map, and the recorded manifest schema stays
    logical. The commit REFUSES (VersionConflictError) if the head's
    colmap moved since planning — a rename/drop landed mid-write, so
    the staged files' physical layout can no longer be trusted (same
    rule as the engine API: mapping commits are not append-safe);
    plain interleaved appends carry the colmap verbatim, so the normal
    append rebase is unaffected. Stats/bloom column lists arrive here
    already PHYSICAL (translated once at writer init — the colmap
    invariant forbids double translation)."""
    import time as _time

    from ..sinks.versioned import (ConstraintViolation,
                                   SchemaEnforcementError, _all_nullable,
                                   _colmap_key, _commit, _file_stats,
                                   _manifest_dir, _norm_path, _norm_type,
                                   _read_manifest, _schema_from_json,
                                   get_constraints, latest_version,
                                   VersionConflictError)

    t0 = _time.monotonic()
    path = _norm_path(path)
    # physical -> logical for the write schema; identity when unmapped
    inv = ({p: l for l, p in plan["pmap"].items()}
           if plan is not None and plan.get("active") else {})
    staged_schema = None
    staged_phys_names: list[str] = []
    if files:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema
        from pyspark.sql.types import StructField, StructType

        raw = _all_nullable(from_arrow_schema(pq.read_schema(files[0])))
        staged_phys_names = [f.name for f in raw.fields]
        # contract checks below speak LOGICAL names; rename through the
        # plan's inverse map (identity Project for unmapped tables)
        staged_schema = StructType([
            StructField(inv.get(f.name, f.name), f.dataType, True)
            for f in raw.fields]) if inv else raw
    if files and plan is not None and plan.get("active") \
            and plan.get("pmap"):
        # belt-and-braces against plan divergence (review r12): the
        # task-side and commit-side writer instances plan
        # independently; whatever invariant guarantees they agree, the
        # files on disk are the ground truth — refuse to record a
        # mapping the staged footers do not actually carry (the
        # alternative is an evolved column silently reading back NULL)
        expected = set(plan["pmap"].values())
        rogue = [n for n in staged_phys_names if n not in expected]
        if rogue:
            raise VersionConflictError(
                f"DSv2 write to {path}: staged files carry physical "
                f"column(s) {rogue} that the commit-side write plan "
                f"does not map (expected {sorted(expected)}) — the "
                "task-side and commit-side plans diverged; re-run the "
                "write"
            )
    cons = get_constraints(path)
    if cons and files:
        import duckdb

        con = duckdb.connect()
        flist = ", ".join("'" + f.replace("'", "''") + "'" for f in files)
        # CHECK exprs are written over LOGICAL names; mapped tables'
        # staged files store physicals, so alias them back in a subquery
        src = f"read_parquet([{flist}])"
        if inv and any(inv.get(p, p) != p for p in staged_phys_names):
            def _q(n: str) -> str:
                return '"' + n.replace('"', '""') + '"'

            sel = ", ".join(
                f"{_q(p)} AS {_q(inv.get(p, p))}" if inv.get(p, p) != p
                else _q(p) for p in staged_phys_names)
            src = f"(SELECT {sel} FROM read_parquet([{flist}]))"
        bad: dict[str, int] = {}
        for name, expr in cons.items():
            n = con.execute(
                f"SELECT count(*) FROM {src} "
                f"WHERE NOT coalesce(({expr}), true)"
            ).fetchone()[0]
            if n:
                bad[name] = int(n)
        if bad:
            raise ConstraintViolation(path, bad)
    # keep the table's file-skipping contract: default the tracked
    # columns to whatever the head manifest already tracks
    stats_cols, bloom_cols = _resolve_tracked_cols(
        path, stats_cols, bloom_cols)
    if shipped is not None and shipped[0] == _cols_key(stats_cols,
                                                       bloom_cols):
        stats = {f: shipped[1][f] for f in files}
        stats_source = "tasks"
    else:  # legacy message / tracked-column drift: derive on the driver
        stats = _file_stats(files, stats_cols, bloom_cols)
        stats_source = "driver"

    def _metrics(version) -> None:
        # probe/observability hook (never load-bearing): how long the
        # DRIVER spent committing, and where the stats came from —
        # scripts/scale_probe.py asserts this stays flat in committed
        # rows now that derivation is task-side
        try:
            with open(os.path.join(_manifest_dir(path),
                                   "_last_commit_metrics.json"), "w") as fh:
                json.dump({
                    "version": version,
                    "driver_commit_secs": _time.monotonic() - t0,
                    "stats_source": stats_source,
                    "files": len(files),
                }, fh)
        except OSError:
            pass

    for _ in range(11):
        prev = latest_version(path)
        prev_m = _read_manifest(path, prev) if prev is not None else {}
        if plan is not None:
            if json.dumps(prev_m.get("colmap"),
                          sort_keys=True) != plan["head_colmap"]:
                # a RENAME/DROP COLUMN landed between writer planning
                # and this commit: the staged files carry the
                # planning-time physical layout, which the new mapping
                # may no longer read back correctly. Mapping commits
                # are not append-safe (same rule as the engine API) —
                # fail loudly; a re-run re-plans under the new mapping.
                raise VersionConflictError(
                    f"DSv2 write to {path}: a column-mapping commit "
                    "(rename/drop column) landed between write "
                    "planning and commit — staged files carry the "
                    "old physical layout; re-run the write"
                )
        else:
            cm = prev_m.get("colmap") or {}
            if cm.get("m") or cm.get("x"):
                raise ValueError(
                    f"table at {path} has an active column mapping and "
                    "this commit path was given no write plan — write "
                    "through the DSv2 writers or the engine API"
                )
        prev_txn = {k: int(v) for k, v in prev_m.get("txn", {}).items()}
        if txn is not None:
            app_id, txn_v = txn
            if prev_txn.get(app_id, -1) >= int(txn_v):
                return None  # replayed batch: already committed
            prev_txn[app_id] = int(txn_v)
        version = 0 if prev is None else prev + 1
        # schema contract: staged files were written with the query's
        # schema (catalog INSERTs are pre-cast by Spark to the reported
        # schema(), so they always match); path-based writes with
        # DRIFTED schemas are checked here against the manifest contract
        # — extra columns need option("mergeSchema","true"), type
        # changes always refuse (the staged file is already written; a
        # type-merged read would break — cast in the query instead).
        tbl_json = prev_m.get("schema")
        if staged_schema is None:
            schema_json = tbl_json  # no-file commit: carry the contract
        elif tbl_json is None:
            # fresh table records the contract; LEGACY tables (files but
            # no schema) only adopt one on overwrite — recording a
            # narrow append's schema would project legacy columns away
            schema_json = (staged_schema.json()
                           if prev is None or overwrite else None)
        else:
            tbl = _schema_from_json(tbl_json)
            tf = {f.name: f for f in tbl.fields}
            extra = [f for f in staged_schema.fields if f.name not in tf]
            for f in staged_schema.fields:
                got = tf.get(f.name)
                if got is not None and \
                        _norm_type(got.dataType) != _norm_type(f.dataType):
                    raise SchemaEnforcementError(
                        f"DSv2 write to {path}: column '{f.name}' arrives "
                        f"as {f.dataType.simpleString()} but the table "
                        f"records {got.dataType.simpleString()} — cast in "
                        "the writing query (staged files are immutable, "
                        "so no implicit upcast is possible here)"
                    )
            if extra and not evolve:
                raise SchemaEnforcementError(
                    f"DSv2 write to {path}: columns "
                    f"{[f.name for f in extra]} are not in the table "
                    "schema; set option(\"mergeSchema\",\"true\") to add "
                    "them as nullable columns"
                )
            if extra:
                from pyspark.sql.types import StructType

                schema_json = StructType(
                    list(_all_nullable(tbl).fields) + list(extra)).json()
            else:
                schema_json = tbl_json
        # the committed colmap: the head's mapping (verified unmoved
        # above) plus any fresh physicals the plan assigned to
        # evolution columns whose names collide with retired physicals
        colmap_out = (_colmap_key(plan["mapping"], plan["dropped"],
                                  plan["xl"])
                      if plan is not None else prev_m.get("colmap"))
        try:
            if overwrite:
                # carry txn watermarks like overwrite_version(txn=None)
                v = _commit(path, version, files, "overwrite", stats,
                            txn=prev_txn, schema=schema_json,
                            colmap=colmap_out)
            else:
                v = _commit(
                    path, version, prev_m.get("files", []) + files,
                    "append", stats,  # delta: this batch's files only
                    txn=prev_txn, dv=prev_m.get("dv"),
                    base_stats=prev_m.get("stats"),
                    schema=schema_json,
                    colmap=colmap_out,
                )
            _metrics(v)
            return v
        except VersionConflictError:
            if overwrite:
                raise  # an overwrite's read-set is the whole table
            continue  # append rebase: manifest JSON only, no rewrite
    raise VersionConflictError(
        f"DSv2 write to {path} lost the commit race 11 times — "
        "pathological contention; retry with backoff"
    )


def _ensure_active_session(spark: SparkSession) -> None:
    """Python DSv2 lookup resolves through the JVM's THREAD-LOCAL
    active session (DataSource.lookupDataSource is a static method
    consulting getActiveSession): a save/load issued from a non-main
    Python thread runs on a JVM thread with NO active session and
    fails DATA_SOURCE_NOT_FOUND even though the source is registered —
    caught by the r11 thread-storm suite racing the DSv2 and engine
    write doors. With pinned py4j threads (the default), setting it
    once per thread sticks. Respects an already-active session; no-op
    where there is no JVM (connect mode)."""
    try:
        jvm = spark._jvm
        if jvm is None:
            return
        cls = jvm.org.apache.spark.sql.classic.SparkSession
        if cls.getActiveSession().isEmpty():
            cls.setActiveSession(spark._jsparkSession)
    except Exception:
        pass  # best-effort: the main-thread path never needed it


def write_table_source(
    df: DataFrame,
    path: str,
    mode: str = "append",
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> None:
    """DataFrameWriter door onto a versioned table via the clx_table
    DSv2 source (see TableWriter). ``mode`` is 'append' or
    'overwrite'."""
    _ensure_active_session(df.sparkSession)
    register_datasource_once(df.sparkSession, TableDataSource)
    w = df.write.format("clx_table").option("path", path).mode(mode)
    if stats_cols:
        w = w.option("statsCols", ",".join(stats_cols))
    if bloom_cols:
        w = w.option("bloomCols", ",".join(bloom_cols))
    w.save()


def read_table_source(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    tag: str | None = None,
    timestamp_as_of_ms: int | None = None,
    limit: int | None = None,
) -> DataFrame:
    """spark.read over a versioned table via the clx_table DSv2 source
    (registers the source; see TableDataSource for the option surface).
    Manifest-pruning filter pushdown engages automatically when
    ``spark.sql.python.filterPushdown.enabled`` is true."""
    _ensure_active_session(spark)
    register_datasource_once(spark, TableDataSource)
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
    if limit is not None:
        # per-partition early stop (no pushLimit in Python DSv2) — pair
        # with .limit(n) on the result; only for queries with no
        # predicates beyond the pushed ones
        reader = reader.option("limit", str(limit))
    return strip_path_metadata(reader.load())


def strip_path_metadata(df: DataFrame) -> DataFrame:
    """Drop the internal path-carrier metadata key from a clx_table
    read's columns. The key exists for the CATALOG round-trip
    (_recover_path); on a returned DataFrame it is noise that makes
    schemas compare unequal across table rebuilds (tempdir paths) —
    user-facing reads strip it."""
    from pyspark.sql import functions as F

    if not any(_PATH_META_KEY in (f.metadata or {})
               for f in df.schema.fields):
        return df
    return df.select(*[
        F.col(f.name).alias(f.name, metadata={
            k: v for k, v in (f.metadata or {}).items()
            if k != _PATH_META_KEY
        })
        for f in df.schema.fields
    ])
