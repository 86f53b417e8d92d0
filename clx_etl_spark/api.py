"""User-facing engine facade: the surface a reference user lands on.

A reference user's workflow is: point at stored tables, run analytic SQL
(they sent it to Doris), run the maintenance flows (gap fill, integrity,
symbol refresh), and ingest feeds. `Engine` packages exactly that over a
SparkSession — thin by design: every method delegates to the operator
library so behavior stays testable without the facade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import catalog
from .session import apply_runtime_confs, get_spark


class Engine:
    def __init__(self, spark: SparkSession | None = None, sf_dir: str | None = None):
        self.spark = apply_runtime_confs(spark or get_spark())
        self.sf_dir = sf_dir or catalog.DEFAULT_SF_DIR
        self._views_registered = False

    # -- catalog ----------------------------------------------------------
    def table(self, name: str, via: str = "parquet", url: str | None = None,
              version: int | None = None, tag: str | None = None,
              **jdbc_opts) -> DataFrame:
        """Load a table. ``via="jdbc"`` reads a relational dimension store
        instead of the parquet catalog (SURVEY S12; ``name`` is the remote
        table, ``url`` the JDBC URL, ``jdbc_opts`` e.g. partition_column).
        ``via="versioned"`` time-travel-reads a manifest-versioned table
        (``name`` is its path; pick a snapshot with ``version=`` or
        ``tag=``, default latest). ``via="clx_table"`` reads the same
        snapshot through the DSv2 source instead — registrable as a SQL
        temp view, with manifest file pruning pushed into the scan
        (sources/table_source.py)."""
        if via == "jdbc":
            if url is None:
                raise ValueError('table(via="jdbc") requires url=')
            from .sinks.jdbc import read_jdbc

            return read_jdbc(self.spark, url, name, **jdbc_opts)
        if via == "clx_table":
            from .sources.table_source import read_table_source

            return read_table_source(self.spark, name, version=version,
                                     tag=tag)
        if via == "versioned":
            from .sinks.versioned import read_tag, read_version

            if tag is not None:
                return read_tag(self.spark, name, tag)
            return read_version(self.spark, name, version)
        return catalog.load_table(self.spark, self.sf_dir, name)

    def table_count(self, path: str, version: int | None = None,
                    col: str | None = None):
        """Exact COUNT(*) of a versioned table from METADATA alone
        (manifest row counts minus dv tombstones — no data file opens;
        sinks/versioned.count_rows_meta). With ``col``, the exact
        COUNT(col) — non-null count from the __nulls__ stats — or None
        when metadata cannot answer exactly
        (sinks/versioned.count_col_meta)."""
        from .sinks.versioned import count_col_meta, count_rows_meta

        if col is not None:
            return count_col_meta(path, col, version)
        return count_rows_meta(path, version=version, spark=self.spark)

    def table_min_max(self, path: str, col: str,
                      version: int | None = None) -> tuple | None:
        """MIN/MAX of ``col`` from the manifest's per-file bounds, or
        None when metadata cannot answer exactly (then scan;
        sinks/versioned.min_max_meta)."""
        from .sinks.versioned import min_max_meta

        return min_max_meta(path, col, version=version)

    def analyze_table(self, path: str, stats_cols: list[str],
                      bloom_cols: list[str] | None = None) -> int:
        """Backfill the file-skipping index (per-file min/max + blooms
        + row counts) onto an existing versioned table via a
        metadata-only commit; executor-side derivation
        (sinks/versioned.analyze_table)."""
        from .sinks.versioned import analyze_table

        return analyze_table(self.spark, path, stats_cols,
                             bloom_cols=bloom_cols)

    def rename_column(self, path: str, old: str, new: str) -> int:
        """METADATA-ONLY ``ALTER TABLE ... RENAME COLUMN`` on a
        versioned table via column mapping — no file rewritten, stats
        survive, time travel answers under each version's names
        (sinks/versioned.rename_column)."""
        from .sinks.versioned import rename_column

        return rename_column(path, old, new)

    def drop_columns(self, path: str, cols) -> int:
        """METADATA-ONLY ``ALTER TABLE ... DROP COLUMN`` — the physical
        bytes retire behind the column mapping and reclaim with the
        next rewrite (sinks/versioned.drop_columns)."""
        from .sinks.versioned import drop_columns

        return drop_columns(path, cols)

    def optimize(self, path: str, **kw) -> dict:
        """The single Delta-style OPTIMIZE maintenance door: fold dv
        sidecars, bin-pack small files (Z-ORDER with ``zorder_by``),
        backfill stats, optionally expire old versions — one atomic
        commit per step, combined before/after delta returned
        (sinks/versioned.optimize_table)."""
        from .sinks.versioned import optimize_table

        return optimize_table(self.spark, path, **kw)

    def stream_table(self, path: str, **kw) -> DataFrame:
        """readStream over a versioned table's appends (initial
        snapshot + per-commit increments — Delta's plain streaming
        source; sources/table_source.stream_table). For exact
        row-level deltas across merges/deletes use
        ``stream_changes``."""
        from .sources.table_source import stream_table

        return stream_table(self.spark, path, **kw)

    def create_sql_table(self, name: str, path: str) -> None:
        """Register a versioned table in the session catalog for pure
        SQL DML: after this, ``INSERT INTO name`` / ``INSERT OVERWRITE
        name`` / ``SELECT ... FROM name`` work with no DataFrame API
        (sources/table_source.py catalog-DML path)."""
        from .sources._register import register_datasource_once
        from .sources.table_source import TableDataSource

        register_datasource_once(self.spark, TableDataSource)
        self.spark.sql(
            f"CREATE TABLE {name} USING clx_table LOCATION '{path}'")

    def sql(self, query: str) -> DataFrame:
        """ANSI SQL over the registered tables — the engine's replacement
        for the SQL the reference shipped to Doris (SURVEY S13)."""
        if not self._views_registered:
            catalog.register_views(self.spark, self.sf_dir)
            self._views_registered = True
        return self.spark.sql(query)

    # -- registered query inventory --------------------------------------
    def query(self, name: str) -> DataFrame:
        """Run a registered engine query by name (see queries.load_all)."""
        from .queries import load_all

        return load_all()[name].fn(self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        from .queries import load_all

        return sorted(load_all())

    # -- flows ------------------------------------------------------------
    def gap_fill_plan(self, df: DataFrame, keys: list[str], start_ms: int,
                      end_ms: int, interval_ms: int, page_limit: int = 1000) -> DataFrame:
        from .operators.gaps import gap_fill_plan

        return gap_fill_plan(df, keys, start_ms=start_ms, end_ms=end_ms,
                             ts_col="ts", interval_ms=interval_ms, page_limit=page_limit)

    def upsert(self, df: DataFrame, path: str, keys: list[str],
               update_cols: list[str] | None = None,
               partition_cols: list[str] | None = None,
               via: str = "parquet", url: str | None = None,
               dialect: str = "generic") -> None:
        """MERGE semantics into the store. ``via="jdbc"`` routes to the
        batched JDBC upsert (SURVEY K1; ``path`` is the remote table)."""
        if via == "jdbc":
            if url is None:
                raise ValueError('upsert(via="jdbc") requires url=')
            from .sinks.jdbc import jdbc_upsert

            jdbc_upsert(self.spark, df, url, path, keys,
                        update_cols=update_cols, dialect=dialect)
            return
        from .sinks.upsert import merge_upsert

        merge_upsert(self.spark, df, path, keys, update_cols=update_cols,
                     partition_cols=partition_cols or [])

    # -- maintenance & audit ----------------------------------------------
    def profile(self, name_or_df: str | DataFrame,
                cols: list[str] | None = None, approx: bool = False) -> DataFrame:
        """Per-column null/distinct audit (operators/profile.py) — run it
        on every new feed before trusting the field maps."""
        from .operators.profile import profile_columns

        df = self.table(name_or_df) if isinstance(name_or_df, str) else name_or_df
        return profile_columns(df, cols, approx=approx)

    def compact(self, path: str, partition_cols: list[str],
                sort_cols: list[str] | None = None) -> dict[str, int]:
        """Small-file compaction (AQE REBALANCE) with optional sorted
        layout for footer-stat pruning (sinks/layout.py)."""
        from .sinks.layout import compact_partitions

        return compact_partitions(self.spark, path, partition_cols,
                                  sort_cols=sort_cols)

    def zorder(self, df: DataFrame, path: str, cols: list[str],
               n_files: int = 16) -> None:
        """Z-order rewrite for multi-dimensional data skipping."""
        from .sinks.layout import zorder_layout

        zorder_layout(df, path, cols, n_files=n_files)

    def expire(self, path: str, partition_col: str, keep_latest: int) -> list[str]:
        """Retention: keep the latest N partitions, drop the rest."""
        from .sinks.upsert import expire_partitions

        return expire_partitions(path, partition_col, keep_latest)

    # -- corpus curation ---------------------------------------------------
    def redact(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        """PII masking (emails/IPs/phones) + per-entity counts, map-only."""
        from .operators.curation import redact_pii

        return redact_pii(df, text_col)

    def chunk(self, df: DataFrame, chunk_size: int = 64,
              overlap: int = 16, text_col: str = "text") -> DataFrame:
        """Overlapping token-window chunking (RAG / context windows)."""
        from .operators.curation import chunk_documents

        return chunk_documents(df, text_col=text_col,
                               chunk_size=chunk_size, overlap=overlap)

    def dedup_index(self, corpus: DataFrame, text_col: str = "text"):
        """Build the persistable near-dup index for incremental ingest."""
        from .operators.dedup import build_near_dup_index

        return build_near_dup_index(corpus, text_col=text_col)

    def dedup_incoming(self, batch: DataFrame, corpus_index,
                       threshold: float = 0.5, text_col: str = "text") -> DataFrame:
        """Match an incoming batch against a prebuilt corpus index:
        (doc_id, dup_of, jaccard) for batch docs with a stored near-dup."""
        from .operators.dedup import incremental_near_duplicates

        return incremental_near_duplicates(
            None, batch, text_col=text_col, threshold=threshold,
            corpus_index=corpus_index,
        )

    def train_tokenizer(self, df: DataFrame, num_merges: int = 50,
                        text_col: str = "text"):
        """Distributed BPE training: (merges, vocab) — encode with
        tokenize()."""
        from .operators.bpe import bpe_train

        return bpe_train(df, text_col=text_col, num_merges=num_merges)

    def tokenize(self, df: DataFrame, vocab: DataFrame,
                 text_col: str = "text") -> DataFrame:
        """Join-based BPE encoding under a trained vocab (no UDF)."""
        from .operators.bpe import bpe_encode

        return bpe_encode(df, vocab, text_col=text_col)

    def lm_scores(self, df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
        """Corpus-LM quality scores (CCNet-shaped perplexity-filter
        signal): per-doc exact fixed-point average bigram probability."""
        from .operators.lm import score_documents

        return score_documents(df, text_col=text_col, id_col=id_col)

    def importance_weights(self, df: DataFrame, target_pred,
                           text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
        """DSIR-style importance weights vs a target subset; feed avg_w
        into sample(rate_permille=...) for the resampling step."""
        from .operators.lm import dsir_importance

        return dsir_importance(df, target_pred, text_col=text_col,
                               id_col=id_col)

    def split(self, df: DataFrame, key_col: str = "doc_id",
              splits: list[tuple[str, int]] | None = None,
              out_col: str = "split") -> DataFrame:
        """Growth-stable train/val/test assignment by stable key hash."""
        from pyspark.sql import functions as F

        from .operators.sampling import hash_split

        return df.withColumn(
            out_col,
            hash_split(F.col(key_col),
                       splits or [("train", 800), ("val", 100), ("test", 100)]),
        )

    def ann_index(self, vectors: DataFrame, path: str, **kw) -> dict:
        """Build + persist the IVF+PQ ANN index (cell-partitioned codes
        parquet + tiny model.json); returns the trained model dict."""
        from .operators.ann_index import build_ann_index

        return build_ann_index(vectors, path, **kw)

    def ann_index_from_table(self, table_path: str, index_path: str,
                             **kw) -> dict:
        """Build the persisted ANN index from a versioned embedding
        table's current snapshot and bind the sync cursor
        (operators/ann_index.build_ann_index_from_table)."""
        from .operators.ann_index import build_ann_index_from_table

        return build_ann_index_from_table(self.spark, table_path,
                                          index_path, **kw)

    def sync_ann_index(self, table_path: str, index_path: str) -> dict | None:
        """Catch a persisted ANN index up to its versioned table's head
        through the change feed — O(changed embeddings) per sync
        (operators/ann_index.sync_ann_index_from_table)."""
        from .operators.ann_index import sync_ann_index_from_table

        return sync_ann_index_from_table(self.spark, table_path, index_path)

    def ann_query(self, path: str, queries: DataFrame, k: int = 5,
                  nprobe: int = 1, **kw) -> DataFrame:
        """ADC top-k against a persisted index; scans only the probed
        cells' partitions (partition-pruned)."""
        from .operators.ann_index import query_ann_index

        return query_ann_index(self.spark, path, queries, k=k,
                               nprobe=nprobe, **kw)

    def expect(self, df: DataFrame, expectations: list) -> DataFrame:
        """Run data-quality expectations (operators/expectations.py):
        one row per check (name, kind, violations, total, passed)."""
        from .operators.expectations import validate

        return validate(df, expectations)

    def substring_runs(self, df: DataFrame, min_run_tokens: int = 8,
                       text_col: str = "text") -> DataFrame:
        """Exact shared-substring runs between doc pairs (verbatim
        passage reuse): (doc_a, doc_b, start_a, start_b, run_tokens)."""
        from .operators.dedup import substring_run_pairs

        return substring_run_pairs(df, text_col=text_col,
                                   min_run_tokens=min_run_tokens)

    def jaccard_pairs_exact(self, df: DataFrame, threshold_num: int = 4,
                            threshold_den: int = 5,
                            text_col: str = "text") -> DataFrame:
        """Lossless prefix-filtered exact-Jaccard near-dup pairs at
        threshold_num/threshold_den."""
        from .operators.dedup import prefix_filter_jaccard_pairs

        return prefix_filter_jaccard_pairs(
            df, text_col=text_col,
            threshold_num=threshold_num, threshold_den=threshold_den)

    def hard_negatives(self, vectors: DataFrame, anchors: DataFrame,
                       k: int = 3) -> DataFrame:
        """Contrastive hard-negative mining: per-anchor top-k
        different-label cosine neighbors + triplet margin."""
        from .operators.similarity import hard_negative_mining

        return hard_negative_mining(vectors, anchors, k=k)

    def temperature_sample(self, df: DataFrame, key_col: str,
                           stratum_col: str) -> DataFrame:
        """tau=1/2 temperature rebalance, rates derived cluster-side
        (cross-engine exact); rows keep a rate_pm column."""
        from .operators.sampling import temperature_mix_sqrt

        return temperature_mix_sqrt(df, key_col, stratum_col)

    def cms(self, df: DataFrame, key_col: str) -> DataFrame:
        """Count-min sketch counters (j, cell, c) — mergeable by
        cell-wise sum; estimate with cms_estimate()."""
        from .operators.sketch import cms_build

        return cms_build(df, key_col)

    def decontaminate_bloom(self, train: DataFrame,
                            benchmark: DataFrame) -> DataFrame:
        """Leakage audit against a Bloom-compressed benchmark bitmap
        (constant broadcast size; overcount-only)."""
        from .operators.curation import bloom_decontaminate

        return bloom_decontaminate(train, benchmark)

    def winsorize(self, df: DataFrame, value_col: str, group_col: str,
                  lo_p: float = 0.01, hi_p: float = 0.99) -> DataFrame:
        """Per-group outlier capping at exact percentiles (bounds
        broadcast back; adds <value>_w)."""
        from .operators.curation import winsorize

        return winsorize(df, value_col, group_col, lo_p, hi_p)

    def histogram(self, df: DataFrame, value_col: str, group_col: str,
                  n_bins: int = 20) -> DataFrame:
        """Exact equi-width histogram per group (explicit bin
        arithmetic, two map-side aggregates)."""
        from .operators.profile import equiwidth_histogram

        return equiwidth_histogram(df, value_col, group_col, n_bins)

    def trend(self, df: DataFrame, x_col: str, y_col: str,
              group_col: str) -> DataFrame:
        """Per-group OLS slope/intercept from BIGINT sufficient
        statistics (x integral, y micro-quantized)."""
        from .operators.profile import trend_slope

        return trend_slope(df, x_col, y_col, group_col)

    def apply_changelog(self, changelog: DataFrame, keys: list[str],
                        ts_col: str, order_cols: list[str] | None = None
                        ) -> DataFrame:
        """CDC replay to current state: last-wins by (ts, order),
        delete-winners drop the key."""
        from .sinks.upsert import apply_changelog

        return apply_changelog(changelog, keys, ts_col,
                               order_cols=order_cols)

    def scene_cuts(self, assets: DataFrame) -> DataFrame:
        """Video shot boundaries from per-frame signatures (LAG jump)."""
        from .operators.multimodal import scene_cuts

        return scene_cuts(assets)

    def audio_segments(self, assets: DataFrame) -> DataFrame:
        """VAD-shaped active-audio segments (windowed-RMS islands)."""
        from .operators.multimodal import audio_active_segments

        return audio_active_segments(assets)

    def phash_near_dups(self, assets: DataFrame,
                        max_hamming: int = 7) -> DataFrame:
        """Image near-dup pairs by banded perceptual-hash hamming."""
        from .operators.multimodal import phash_near_duplicates

        return phash_near_duplicates(assets, max_hamming)

    def refresh_rollup(self, new_events: DataFrame, rollup_path: str,
                       value_col: str = "value", ts_ms_col: str = "ts_ms",
                       keys: tuple[str, ...] = ("event_type",)) -> None:
        """Incremental daily-rollup maintenance: merge the batch's partial
        aggregate state into the stored rollup — O(batch + touched
        groups), never a history re-scan (operators/incremental.py)."""
        from .operators.incremental import incremental_refresh

        incremental_refresh(self.spark, new_events, rollup_path,
                            value_col, ts_ms_col, keys)

    def kn_scores(self, df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
        """Kneser-Ney smoothed per-document LM scores (exact fixed
        point; the principled upgrade of lm_scores' add-one model)."""
        from .operators.lm import kneser_ney_scores

        return kneser_ney_scores(df, text_col, id_col)

    def diff_snapshots(self, old: DataFrame, new: DataFrame,
                       keys: list[str]) -> DataFrame:
        """Keyed snapshot diff: added / removed / changed rows between two
        table versions, unchanged rows dropped (change-sized output)."""
        from pyspark.sql import functions as F

        vals = [c for c in old.columns if c not in keys]
        o = old.select(*keys, F.struct(*vals).alias("_old"))
        n = new.select(*keys, F.struct(*vals).alias("_new"))
        j = o.join(n, keys, "full_outer")
        change = (
            F.when(F.col("_old").isNull(), "added")
            .when(F.col("_new").isNull(), "removed")
            .otherwise("changed")
        )
        return j.filter(
            F.col("_old").isNull() | F.col("_new").isNull()
            | (F.col("_old") != F.col("_new"))
        ).select(*keys, change.alias("change_type"), "_old", "_new")

    def commit_version(self, df: DataFrame, path: str,
                       mode: str = "append",
                       stats_cols: list[str] | None = None,
                       bloom_cols: list[str] | None = None,
                       evolve: bool = False) -> int:
        """Commit a table snapshot (manifest-based copy-on-write,
        sinks/versioned.py): 'append' adds this batch to the previous
        version's files, 'overwrite' starts fresh. ``stats_cols``
        records per-file min/max (data skipping), ``bloom_cols`` a
        per-file key bloom (point-lookup skipping). Prior versions stay
        readable until expire_versions. Batches are schema-enforced
        against the table's recorded contract; ``evolve=True`` lets a
        batch ADD nullable columns (Delta mergeSchema —
        sinks/versioned._enforce_schema)."""
        from .sinks.versioned import append_version, overwrite_version

        fn = append_version if mode == "append" else overwrite_version
        return fn(df, path, stats_cols=stats_cols, bloom_cols=bloom_cols,
                  evolve=evolve)

    def add_table_columns(self, path: str, cols) -> int:
        """METADATA-ONLY ``ALTER TABLE ... ADD COLUMNS`` on a versioned
        table: widens the recorded schema contract with new nullable
        columns; existing rows read them as NULL, no data file touched
        (sinks/versioned.add_columns)."""
        from .sinks.versioned import add_columns

        return add_columns(path, cols)

    def table_schema(self, path: str, version: int | None = None):
        """The versioned table's recorded schema contract (StructType)
        as of ``version`` (default head) — time travel sees the schema
        of that version (sinks/versioned.table_schema)."""
        from .sinks.versioned import table_schema

        return table_schema(path, version)

    def merge_table_version(self, updates: DataFrame, path: str,
                            keys: list[str],
                            deletes: DataFrame | None = None,
                            txn: tuple[str, int] | None = None,
                            change_feed: bool = False,
                            merge_on_read: bool = False,
                            evolve: bool = False) -> int:
        """Keyed MERGE into a versioned table (WHEN MATCHED UPDATE /
        DELETE, WHEN NOT MATCHED INSERT): file pruning by manifest key
        ranges + blooms rewrites only the batch's key neighborhood;
        ``txn`` makes replays manifest-level no-ops; ``change_feed``
        persists the row-level change set for ``table_changes``
        (sinks/versioned.merge_version). ``merge_on_read=True`` instead
        dv-tombstones matched rows and appends only the batch — O(batch)
        write amplification, repaid at compaction
        (sinks/versioned.merge_version_dv)."""
        from .sinks.versioned import merge_version, merge_version_dv

        fn = merge_version_dv if merge_on_read else merge_version
        return fn(updates, path, keys, deletes=deletes, txn=txn,
                  change_feed=change_feed, evolve=evolve)

    def delete_table_range(self, path: str, col: str, lo, hi,
                           merge_on_read: bool = False,
                           change_feed: bool = False) -> tuple[int, int, int]:
        """Range DELETE from a versioned table. Copy-on-write (default)
        rewrites only the files whose manifest [min,max] overlap the
        range (sinks/versioned.delete_version). ``merge_on_read=True``
        rewrites NOTHING — deleted row positions land in a deletion
        vector readers anti-join away, O(deleted rows) write
        amplification for narrow deletes; compaction purges the debt
        (sinks/versioned.delete_version_dv)."""
        from .sinks.versioned import delete_version, delete_version_dv

        fn = delete_version_dv if merge_on_read else delete_version
        return fn(self.spark, path, col, lo, hi, change_feed=change_feed)

    def set_table_constraints(self, path: str,
                              constraints: dict[str, str]) -> None:
        """Declare CHECK constraints on a versioned table (Delta ADD
        CONSTRAINT): every later append/overwrite/merge validates its
        batch in one aggregate pass and refuses to commit on violation
        (sinks/versioned.set_constraints)."""
        from .sinks.versioned import set_constraints

        set_constraints(path, constraints)

    def sync_rollup(self, facts_path: str, rollup_path: str,
                    value_col: str = "value", ts_ms_col: str = "ts_ms",
                    keys: tuple[str, ...] = ("event_type",),
                    app_id: str = "ivm") -> int | None:
        """Catch a versioned rollup up to its fact table's head via the
        change feed — stateless (the cursor is the rollup manifest's txn
        watermark), idempotent at any cadence
        (operators/incremental.sync_rollup_from_table)."""
        from .operators.incremental import sync_rollup_from_table

        return sync_rollup_from_table(self.spark, facts_path, rollup_path,
                                      value_col, ts_ms_col, keys, app_id)

    def table_history(self, path: str) -> DataFrame:
        """Commit history of a versioned table (DESCRIBE HISTORY shape):
        per-version op, file/byte deltas, change-feed presence, txn
        summary (sinks/versioned.history)."""
        from .sinks.versioned import history

        return history(self.spark, path)

    def describe_table(self, path: str) -> dict:
        """Head-state summary of a versioned table: stats/bloom
        coverage, constraints, tags, txn watermarks, CDF coverage
        (sinks/versioned.describe_table)."""
        from .sinks.versioned import describe_table

        return describe_table(path)

    def stream_table_changes(self, path: str,
                             starting_version: int | str = 0,
                             max_versions_per_batch: int = 100) -> DataFrame:
        """Structured-Streaming source over a versioned table's change
        feed (format 'clx_cdf', Delta readChangeFeed shape): manifest
        versions are the checkpointed offsets, appends stream their
        added files as inserts, change_feed=True rewrites stream their
        persisted change sets (sources/cdf_source.py)."""
        from .sources.cdf_source import stream_changes

        return stream_changes(self.spark, path, starting_version,
                              max_versions_per_batch)

    def refresh_rollup_from_changes(self, changes: DataFrame,
                                    rollup_path: str,
                                    value_col: str = "value",
                                    ts_ms_col: str = "ts_ms",
                                    keys: tuple[str, ...] = ("event_type",),
                                    txn: tuple[str, int] | None = None) -> int:
        """Incremental view maintenance with retractions: fold a
        change-feed window into a versioned daily rollup — inserts add,
        deletes subtract, updates net to their delta, zeroed groups
        drop (operators/incremental.refresh_from_change_feed)."""
        from .operators.incremental import refresh_from_change_feed

        return refresh_from_change_feed(self.spark, changes, rollup_path,
                                        value_col, ts_ms_col, keys, txn=txn)

    def table_changes(self, path: str, after_version: int,
                      to_version: int | None = None) -> DataFrame:
        """Row-level change feed (Delta CDF): every row each commit
        changed, tagged _change_type / _commit_version — appends read
        from their added files, change_feed=True merges/deletes from
        their persisted change sets (sinks/versioned.table_changes)."""
        from .sinks.versioned import table_changes

        return table_changes(self.spark, path, after_version, to_version)

    def apply_cdc_stream(self, changelog: DataFrame, path: str,
                         checkpoint: str, keys: list[str],
                         ts_col: str = "ts_ms", op_col: str = "op"):
        """Exactly-once streaming CDC apply: each micro-batch of a
        Debezium-shaped changelog folds to per-key winners and commits
        one idempotent MERGE (streaming/jobs.versioned_cdc_stream)."""
        from .streaming.jobs import versioned_cdc_stream

        return versioned_cdc_stream(changelog, path, checkpoint, keys,
                                    ts_col=ts_col, op_col=op_col)

    def read_version(self, path: str, version: int | None = None) -> DataFrame:
        """Time-travel read of a committed snapshot (default latest)."""
        from .sinks.versioned import read_version

        return read_version(self.spark, path, version)

    def read_changes(self, path: str, after_version: int,
                     to_version: int | None = None) -> DataFrame:
        """Incremental read: rows added after a version (append-only
        ranges only — overwrites raise)."""
        from .sinks.versioned import read_changes

        return read_changes(self.spark, path, after_version, to_version)

    def expire_table_versions(self, path: str, keep_latest: int = 1,
                              dry_run: bool = False,
                              keep_since_ms: int | None = None) -> list[str]:
        """Drop old manifests; physically delete only unreferenced files
        (``dry_run`` lists the reclaim without touching anything;
        ``keep_since_ms`` additionally retains every version committed
        at or after that wall-clock time)."""
        from .sinks.versioned import expire_versions

        return expire_versions(path, keep_latest, dry_run=dry_run,
                               keep_since_ms=keep_since_ms)

    def read_version_as_of(self, path: str, ts_ms: int) -> DataFrame:
        """Time-travel read by wall-clock time (``TIMESTAMP AS OF``):
        the newest version committed at or before ``ts_ms``."""
        from .sinks.versioned import read_version_as_of

        return read_version_as_of(self.spark, path, ts_ms)

    def table_files(self, path: str,
                    version: int | None = None) -> DataFrame:
        """Snapshot file inventory (size / rows / stats / blooms per
        file) — the layout-maintenance operability view."""
        from .sinks.versioned import files_table

        return files_table(self.spark, path, version)

    def clone_table_version(self, src: str, dst: str,
                            version: int | None = None,
                            deep: bool = False) -> int:
        """CLONE a versioned table: shallow (metadata-only, references
        the source files in place) or deep (physical copy). The clone's
        history diverges independently; stats/blooms/constraints carry."""
        from .sinks.versioned import clone_table

        return clone_table(src, dst, version=version, deep=deep)

    def scan_version(self, path: str, col: str, lo, hi,
                     version: int | None = None) -> DataFrame:
        """Data-skipping scan: manifest min/max prunes files before any
        open; the row filter applies to the survivors."""
        from .sinks.versioned import scan_version

        return scan_version(self.spark, path, col, lo, hi, version)

    @staticmethod
    def _canonical_pairs(pairs: DataFrame) -> DataFrame:
        """Normalize arbitrary caller pair tables to the unique-(a < b)
        precondition the iterative graph operators require
        (operators/dedup.undirected_edges): orient each row as
        (least, greatest), drop self-pairs, dedup. Engine-internal pair
        generators already satisfy the contract and skip this; without
        it, duplicate or (b, a)-reversed caller rows would silently skew
        PageRank out-degrees and label-propagation votes."""
        from pyspark.sql import functions as F

        a, b = pairs.columns[0], pairs.columns[1]
        return (
            pairs.select(
                F.least(F.col(a), F.col(b)).alias(a),
                F.greatest(F.col(a), F.col(b)).alias(b),
            )
            .filter(F.col(a) < F.col(b))
            .distinct()
        )

    def pagerank(self, pairs: DataFrame, iterations: int = 10) -> DataFrame:
        """Deterministic fixed-point PageRank over an undirected pair
        graph (exact integer ranks — bit-identical any partitioning).
        ``pairs`` may contain duplicates / reversed rows; they are
        canonicalized to unique (a < b) pairs first."""
        from .operators.graph import pagerank

        return pagerank(self._canonical_pairs(pairs), iterations=iterations)

    def cluster_representatives(self, pairs: DataFrame,
                                iterations: int = 10) -> DataFrame:
        """Importance-aware duplicate-cluster representatives: connected
        components x PageRank, top-ranked member flagged per cluster.
        ``pairs`` may contain duplicates / reversed rows; they are
        canonicalized to unique (a < b) pairs first."""
        from .operators.graph import top_representatives

        return top_representatives(
            self._canonical_pairs(pairs), iterations=iterations
        )

    def propagate_labels(self, pairs: DataFrame, seeds: DataFrame,
                         rounds: int = 3) -> DataFrame:
        """Seed-frozen majority-vote label spreading over a similarity
        graph (weak-supervision expansion; deterministic). ``pairs`` may
        contain duplicates / reversed rows; they are canonicalized to
        unique (a < b) pairs first."""
        from .operators.graph import label_propagation

        return label_propagation(
            self._canonical_pairs(pairs), seeds, rounds=rounds
        )

    def eval_holdout(self, df: DataFrame, key_col: str, stratum_col: str,
                     k: int = 25) -> DataFrame:
        """Coverage-guaranteed holdout: the k lowest-gate-hash rows per
        stratum (WindowGroupLimit shape)."""
        from pyspark.sql import Window, functions as F

        from .operators.sampling import _hash_bucket

        g = df.withColumn("_gh", _hash_bucket(F.col(key_col), mod=1 << 62))
        w = Window.partitionBy(stratum_col).orderBy("_gh", key_col)
        return (
            g.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_gh", "_rn")
        )

    def compact_table_version(self, path: str,
                              target_bytes: int = 128 << 20,
                              stats_cols: list[str] | None = None,
                              change_feed: bool = False,
                              zorder_by: list[str] | None = None,
                              where: tuple | None = None) -> int:
        """OPTIMIZE-style small-file compaction of the current version
        (rows unchanged, committed as a new version; prior versions stay
        readable until expiry). ``change_feed`` records an EMPTY change
        set so table_changes crosses the commit; ``zorder_by``
        additionally Z-order-clusters the rewrite (OPTIMIZE ZORDER BY);
        ``where=(col, lo, hi)`` compacts only the overlapping files
        (OPTIMIZE ... WHERE — the nightly job compacts yesterday's
        range, never the table), purging deletion vectors in the
        rewritten slice only."""
        from .sinks.versioned import compact_version

        return compact_version(self.spark, path, target_bytes, stats_cols,
                               change_feed=change_feed, zorder_by=zorder_by,
                               where=where)

    def reorg_table_dvs(self, path: str) -> tuple[int, int, int]:
        """Coalesce a table's accumulated deletion-vector sidecar dirs
        into one (Delta REORG-light): metadata + dv sidecar only — k
        narrow deletes no longer cost k sidecar opens per scan task.
        Returns (version, dv_bearing_files, dirs_folded); see
        sinks/versioned.reorg_dvs."""
        from .sinks.versioned import reorg_dvs

        return reorg_dvs(self.spark, path)

    def ingest_dedup_stream(self, docs: DataFrame, corpus_path: str,
                            checkpoint: str, threshold: float = 0.5):
        """Continuous corpus building with near-duplicate gating: each
        micro-batch drops exact-id replays, batch-internal near-dups,
        and batch-vs-corpus near-dups, then appends survivors
        (streaming/jobs.near_dup_ingest_stream)."""
        from .streaming.jobs import near_dup_ingest_stream

        return near_dup_ingest_stream(docs, corpus_path, checkpoint,
                                      threshold=threshold)

    def allocate_mix(self, caps: DataFrame, budget: int,
                     rounds: int = 5) -> DataFrame:
        """Water-filling token-budget allocation over (source, cap)
        rows: equal shares among unsaturated sources per round,
        saturated sources freeze at capacity (exact BIGINT floor
        arithmetic — deterministic; the mix_waterfill registry query is
        the oracle-checked instance)."""
        from pyspark.sql import functions as F

        state = caps.select(
            "source", "cap",
            F.lit(int(budget)).cast("long").alias("budget"),
            F.lit(0).cast("long").alias("alloc"),
            F.lit(False).alias("frozen"),
        )
        for _ in range(rounds):
            stats = state.agg(
                F.sum(F.when(F.col("frozen"), F.col("alloc")).otherwise(F.lit(0)))
                .cast("long").alias("fz"),
                F.sum((~F.col("frozen")).cast("long")).cast("long").alias("nf"),
            )
            share = F.when(F.col("nf") > 0, F.expr("(budget - fz) div nf")) \
                .otherwise(F.lit(0).cast("long"))
            state = state.crossJoin(F.broadcast(stats)).select(
                "source", "cap", "budget",
                F.when(F.col("frozen"), F.col("alloc"))
                .otherwise(F.least(F.col("cap"), share)).alias("alloc"),
                (F.col("frozen") | (F.col("cap") <= share)).alias("frozen"),
            )
        return state.select("source", "cap", "alloc",
                            F.col("frozen").alias("saturated"))
