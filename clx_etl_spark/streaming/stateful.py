"""Custom stateful streaming operators (applyInPandasWithState).

The reference detects kline gaps by re-scanning stored history with a LAG
window every cycle (reference: src/exchanges/_base_.py:178-198). Online,
that is a per-key stateful streaming operator: keep each key's high
watermark in checkpointed state and emit a gap row the moment an arriving
event jumps past watermark + interval. State is O(1) per key (one long),
so a million symbols cost ~MBs of state store — this scales where the
re-scan approach re-reads the fact table every cycle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def streaming_gap_monitor(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts_ms",
    interval_ms: int = 60_000,
) -> DataFrame:
    """Emit (keys..., prev_ts, curr_ts, gap_ms) whenever a key's stream
    skips more than ``interval_ms`` between consecutive events — across
    micro-batch AND restart boundaries (state is checkpointed).

    Events may arrive unordered within a micro-batch (sorted here); late
    rows older than the stored watermark are ignored, matching the
    reference's forward-only cursor (_base_.py:287).
    """
    key_fields = [events.schema[k] for k in keys]
    out_schema = StructType(
        key_fields
        + [
            StructField("prev_ts", LongType()),
            StructField("curr_ts", LongType()),
            StructField("gap_ms", LongType()),
        ]
    )
    state_schema = StructType([StructField("max_ts", LongType())])

    def monitor(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (max_ts,) = state.get if state.exists else (None,)
        gaps: list[tuple] = []
        for pdf in pdfs:
            for t in sorted(int(t) for t in pdf[ts_col]):
                if max_ts is not None and t - max_ts > interval_ms:
                    gaps.append((*key, max_ts, t, t - max_ts))
                max_ts = t if max_ts is None else max(max_ts, t)
        state.update((max_ts,))
        yield pd.DataFrame(gaps, columns=[f.name for f in out_schema.fields])

    return events.groupBy(*keys).applyInPandasWithState(
        monitor,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_ema(
    ticks: DataFrame,
    keys: list[str],
    value_col: str = "price",
    ts_col: str = "ts_ms",
    alpha: float = 0.2,
) -> DataFrame:
    """Online exponentially-weighted moving average per key, carried
    across micro-batches and restarts: state is (last_ts, last_ema) —
    O(1) per key, so millions of symbols cost MBs of state store. The
    batch equivalent re-reads the whole history every cycle to rebuild
    the recursion; online EMA is the canonical case where streaming
    state beats re-scan, because the recurrence ema_t = a*x_t +
    (1-a)*ema_{t-1} needs only the previous value.

    Rows unordered within a micro-batch are sorted here; rows older than
    the state's last_ts are ignored (forward-only, like the gap
    monitor). Emits (keys..., ts, value, ema) per accepted row.
    """
    key_fields = [ticks.schema[k] for k in keys]
    out_schema = StructType(
        key_fields
        + [
            StructField("ts", LongType()),
            StructField("value", DoubleType()),
            StructField("ema", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("last_ts", LongType()), StructField("last_ema", DoubleType())]
    )

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last_ts, last_ema = state.get if state.exists else (None, None)
        rows: list[tuple] = []
        pending = []
        for pdf in pdfs:
            pending.extend(
                (int(t), float(v)) for t, v in zip(pdf[ts_col], pdf[value_col])
            )
        for t, v in sorted(pending):
            if last_ts is not None and t <= last_ts:
                continue  # forward-only
            last_ema = v if last_ema is None else alpha * v + (1.0 - alpha) * last_ema
            last_ts = t
            rows.append((*key, t, v, last_ema))
        if last_ts is not None:
            state.update((last_ts, last_ema))
        yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return ticks.groupBy(*keys).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_sessionizer(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts_ms",
    gap_ms: int = 1_800_000,
    idle_timeout_ms: int = 3_600_000,
    event_id_col: str | None = None,
) -> DataFrame:
    """Per-key sessionization with emit-on-close: a session CLOSES (and
    its summary row is emitted) when an arriving event's gap exceeds
    ``gap_ms``, or when the key has been idle ``idle_timeout_ms`` of
    PROCESSING time (so the final session of a quiet key still flushes —
    the half F.session_window's append-mode aggregation can't express,
    since it holds the last window until more data arrives).

    State per key is (session_start, last_ts, n_events) — O(1), the
    custom-stateful counterpart of the batch islands sessionize
    (operators/sessions.py). Emits (keys..., session_start, session_end,
    n_events, closed_by) rows: closed_by 'gap' | 'timeout'.

    Ordering / replay discipline: rows sort within the micro-batch.
    Events strictly older than the stored watermark are dropped
    (forward-only). Events AT the watermark millisecond are counted —
    distinct same-ms bursts within a batch match the batch islands
    sessionization exactly; ACROSS batches, pass ``event_id_col`` to
    deduplicate same-ms replays by id (state then also carries the ids
    seen at the watermark ms — bounded by the same-ms burst size).
    Without an id column, a cross-batch row landing exactly on the
    watermark ms is conservatively treated as a replay and dropped.

    Checkpoint compatibility: the ``last_ts_ids`` state field is new as
    of round 5 — checkpoints written by earlier revisions fail state
    schema validation on restart. Start a new checkpoint location when
    upgrading (the emitted sessions are deterministic from the source,
    so a reprocess converges).
    """
    import json as _json

    from pyspark.sql.types import StringType

    key_fields = [events.schema[k] for k in keys]
    out_schema = StructType(
        key_fields
        + [
            StructField("session_start", LongType()),
            StructField("session_end", LongType()),
            StructField("n_events", LongType()),
            StructField("closed_by", StringType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("session_start", LongType()),
            StructField("last_ts", LongType()),
            StructField("n_events", LongType()),
            StructField("last_ts_ids", StringType()),  # JSON id list
        ]
    )

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                s0, lt, n, _ids = state.get
                closed.append((*key, s0, lt, n, "timeout"))
                state.remove()
            yield pd.DataFrame(closed, columns=[f.name for f in out_schema.fields])
            return
        s0, lt, n, ids_json = (
            state.get if state.exists else (None, None, 0, "[]")
        )
        stored_lt = lt
        cur_ids: set[str] = set(_json.loads(ids_json))
        pending: list[tuple] = []
        for pdf in pdfs:
            if event_id_col is not None:
                pending.extend(
                    (int(t), str(e))
                    for t, e in zip(pdf[ts_col], pdf[event_id_col])
                )
            else:
                pending.extend((int(t), None) for t in pdf[ts_col])
        for t, eid in sorted(pending, key=lambda p: p[0]):
            if stored_lt is not None and (
                t < stored_lt
                or (
                    t == stored_lt
                    and (event_id_col is None or eid in cur_ids)
                )
            ):
                continue  # forward-only / cross-batch replay
            if lt is not None and t - lt > gap_ms:
                closed.append((*key, s0, lt, n, "gap"))
                s0, n = t, 0
            if s0 is None:
                s0 = t
            if lt is None or t > lt:
                cur_ids = set()
            if eid is not None:
                if eid in cur_ids:
                    continue  # within-batch duplicate id at the same ms
                cur_ids.add(eid)
            lt = t if lt is None else max(lt, t)
            n += 1
        if lt is not None:
            state.update((s0, lt, n, _json.dumps(sorted(cur_ids))))
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(closed, columns=[f.name for f in out_schema.fields])

    return events.groupBy(*keys).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def streaming_heavy_hitters(
    events: DataFrame,
    key_col: str,
    k: int = 10,
    capacity: int = 64,
    shards: int = 1,
) -> DataFrame:
    """Streaming top-k frequent values via the SpaceSaving algorithm:
    state is a fixed set of ``capacity`` (value, count, overestimate)
    counters however long the stream runs — when a new value arrives
    with all counters taken, it REPLACES the minimum counter and
    inherits its count as the overestimate bound (Metwally et al. 2005).
    Guarantees: every true count is <= counter count <= true + max_err,
    and any value with true count > N_shard/capacity is guaranteed
    present in its shard.

    Emits each shard's current top-k snapshot (shard, key, cnt, max_err,
    monotone per-shard seq) after every micro-batch. Per batch the
    arriving rows are reduced to value counts FIRST (one pandas
    value_counts), so the state update is O(distinct-in-batch +
    capacity), not O(rows).

    Scale: ``shards`` > 1 hash-partitions the VALUE space into disjoint
    shards (xxhash64 mod shards), each with its own counter set and
    ingest task — a single task's rate is never the bound. Because a
    value maps to exactly ONE shard, cross-shard counts never split:
    the global top-k is simply the top-k over the union of shard
    snapshots (merge_heavy_hitter_snapshots) with NO merge error — the
    error bound even TIGHTENS to N_shard/capacity per shard.

    Checkpoint compatibility: round 5 changed the state encoding (three
    joined strings -> one JSON column) and the output schema (new
    ``shard`` column) — checkpoints written by earlier revisions fail
    validation or misread state on restart; start a new checkpoint
    location when upgrading.
    """
    from pyspark.sql.types import StringType

    out_schema = StructType(
        [
            StructField("shard", LongType()),
            StructField("key", StringType()),
            StructField("cnt", LongType()),
            StructField("max_err", LongType()),
            StructField("seq", LongType()),
        ]
    )
    state_schema = StructType(
        [
            # the counter table serializes as JSON {value: [count, err]} —
            # arbitrary key bytes round-trip exactly (a joined-string
            # encoding would corrupt on keys containing the separator)
            StructField("table", StringType()),
            StructField("seq", LongType()),
        ]
    )
    import json as _json

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            table_json, seq = state.get
            counters = {
                kk: [int(c), int(e)]
                for kk, (c, e) in _json.loads(table_json).items()
            }
        else:
            counters, seq = {}, 0
        batch_counts: dict[str, int] = {}
        for pdf in pdfs:
            for v, c in pdf[key_col].astype(str).value_counts().items():
                batch_counts[v] = batch_counts.get(v, 0) + int(c)
        # deterministic update order: by (-count, value) so replacement
        # decisions don't depend on pandas hash order
        for v, c in sorted(batch_counts.items(), key=lambda kv: (-kv[1], kv[0])):
            if v in counters:
                counters[v][0] += c
            elif len(counters) < capacity:
                counters[v] = [c, 0]
            else:
                mv = min(counters.items(), key=lambda kv: (kv[1][0], kv[0]))
                mkey, (mcount, _merr) = mv
                del counters[mkey]
                counters[v] = [mcount + c, mcount]
        seq += 1
        state.update((_json.dumps(counters), seq))
        top = sorted(
            counters.items(), key=lambda kv: (-kv[1][0], kv[0])
        )[:k]
        yield pd.DataFrame(
            [(key[0], v, c, e, seq) for v, (c, e) in top],
            columns=[f.name for f in out_schema.fields],
        )

    shard = (
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(shards))
        if shards > 1
        else F.lit(0)
    )
    return (
        events.withColumn("_g", shard.cast("long"))
        .groupBy("_g")
        .applyInPandasWithState(
            step,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def merge_heavy_hitter_snapshots(snapshots: DataFrame, k: int = 10) -> DataFrame:
    """Global top-k from sharded SpaceSaving snapshots: take each shard's
    LATEST snapshot (max seq per shard) and rank the union — exact merge,
    because hash sharding gives every value exactly one home shard (no
    count ever splits across counter sets). Returns (key, cnt, max_err,
    rank), fully tie-broken."""
    from pyspark.sql import Window

    latest = snapshots.withColumn(
        "_mx", F.max("seq").over(Window.partitionBy("shard"))
    ).filter(F.col("seq") == F.col("_mx"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    return (
        latest.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("key", "cnt", "max_err", F.col("rank").cast("int").alias("rank"))
    )


def streaming_quantiles(
    events: DataFrame,
    keys: list[str],
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
    sample_size: int = 1024,
    fingerprint_cols: list[str] | None = None,
) -> DataFrame:
    """Streaming per-key quantile estimates from a BOTTOM-K PRIORITY
    SAMPLE: every row gets a deterministic hash priority (md5 of its
    (key, value, per-row fingerprint) triple, where the fingerprint is
    ``fingerprint_cols`` — default: every other column of the input,
    i.e. the ts/event-id columns that make a row unique) and state
    keeps only the
    ``sample_size`` smallest-priority rows per key — a uniform sample of
    everything seen, with O(sample_size) state however long the stream
    runs (the bottom-k sketch; mergeable by union + re-trim).

    Determinism: no RNG state — a replayed micro-batch regenerates the
    SAME priorities, so at-least-once redelivery cannot distort the
    SAMPLE (a replayed retained row collapses on its fingerprint; a
    replayed EVICTED row re-enters with its original priority and is
    re-evicted by the same comparison). Because the fingerprint carries
    the per-row unique columns, REPEATED VALUES are distinct sample
    entries — quantiles reflect the stream's value DISTRIBUTION (e.g.
    a stream of 999 zeros and one 1000 has median 0), not its distinct
    values; only byte-identical full rows collapse, which is replay
    detection, not value dedup. ``n_seen`` is exact under
    exactly-once delivery but may over-count replays of already-evicted
    rows — bounded state cannot remember every fingerprint ever seen.
    Quantiles use the same exact interpolation contract as the batch
    percentile queries, evaluated over the sample.

    Emits (keys..., n_seen, n_sample, q_... per probability, seq) per
    micro-batch — the monitoring twin of group_quantiles_approx; rank
    error shrinks as O(1/sqrt(sample_size)).

    Checkpoint compatibility: round 6 changed the priority hash to
    carry the per-row fingerprint (repeated values were previously
    collapsed to one sample entry). The state SCHEMA is unchanged so
    old checkpoints restart cleanly, but their retained samples were
    drawn distinct-value-biased — start a new checkpoint location if
    exact sampling semantics matter for history."""
    import hashlib as _hashlib
    import json as _json

    fp_cols = (
        fingerprint_cols
        if fingerprint_cols is not None
        else [c for c in events.columns if c not in keys and c != value_col]
    )

    key_fields = [events.schema[k] for k in keys]
    out_schema = StructType(
        key_fields
        + [StructField("n_seen", LongType()), StructField("n_sample", LongType())]
        + [
            StructField(f"q_{str(p).replace('.', '_')}", DoubleType())
            for p in probabilities
        ]
        + [StructField("seq", LongType())]
    )
    from pyspark.sql.types import StringType

    state_schema = StructType(
        [
            StructField("sample", StringType()),  # JSON [[priority, value]...]
            StructField("n_seen", LongType()),
            StructField("seq", LongType()),
        ]
    )

    def _quantile(sorted_vals: list, p: float) -> float:
        # exact interpolated percentile over the sample (the contract the
        # batch percentile() aggregate uses)
        n = len(sorted_vals)
        if n == 1:
            return float(sorted_vals[0])
        pos = p * (n - 1)
        lo = int(pos)
        hi = min(lo + 1, n - 1)
        frac = pos - lo
        return float(sorted_vals[lo]) * (1 - frac) + float(sorted_vals[hi]) * frac

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            sample_json, n_seen, seq = state.get
            sample = [(p, float(v)) for p, v in _json.loads(sample_json)]
        else:
            sample, n_seen, seq = [], 0, 0
        seen = {p for p, _ in sample}
        for pdf in pdfs:
            fps = pdf[fp_cols].astype(str).agg("|".join, axis=1) if fp_cols \
                else pd.Series([""] * len(pdf))
            for v, fp in zip(pdf[value_col], fps):
                fv = float(v)
                pr = _hashlib.md5(
                    repr(fv).encode() + b"|" + repr(key).encode()
                    + b"|" + fp.encode()
                ).hexdigest()
                if pr in seen:
                    continue  # replayed full row (same key/value/fingerprint)
                seen.add(pr)
                n_seen += 1
                sample.append((pr, fv))
        if len(sample) > sample_size:
            sample.sort(key=lambda t: t[0])
            for p, _ in sample[sample_size:]:
                seen.discard(p)
            sample = sample[:sample_size]
        seq += 1
        state.update((_json.dumps(sample), n_seen, seq))
        vals = sorted(v for _, v in sample)
        qs = [_quantile(vals, p) if vals else None for p in probabilities]
        yield pd.DataFrame(
            [(*key, n_seen, len(vals), *qs, seq)],
            columns=[f.name for f in out_schema.fields],
        )

    return events.groupBy(*keys).applyInPandasWithState(
        step,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
