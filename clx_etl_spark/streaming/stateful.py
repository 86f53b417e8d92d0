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
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


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
