"""Generic paginated REST source adapter (SURVEY S1/S2).

The reference implements per-exchange async fetch loops with retry ×3,
inter-page pacing, and a time-window pagination cursor (reference:
src/exchanges/_base_.py:55-98, 257-288). Here the adapter is transport-
agnostic and testable: a ``fetch_page`` callable (injected; tests use
canned fixtures, production uses urllib/aiohttp) drives a cursor loop,
and the engine surface is ``fetch_ranges``: given a *ranges DataFrame*
(the gap-fill plan from operators.gaps), fan page-fetches out.

Scale stance: network fetch is driver-side for small dimension pulls
(20 exchanges × symbols), but kline backfills over thousands of
(symbol, range) pairs run distributed via mapInPandas over the ranges
DataFrame — one task per coalesced gap range, executors fetch in
parallel, results land directly as partitioned rows without a driver
bottleneck.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame


@dataclass
class RetryPolicy:
    """Mirror of the reference's HTTP budget (_base_.py:61-92): 3 tries,
    fixed delay; errors re-raise after the last try."""

    tries: int = 3
    delay_s: float = 1.0
    sleep: Callable[[float], None] = time.sleep

    def run(self, fn: Callable[[], object]) -> object:
        last: Exception | None = None
        for attempt in range(self.tries):
            try:
                return fn()
            except Exception as exc:  # noqa: BLE001 - adapter boundary
                last = exc
                if attempt < self.tries - 1:
                    self.sleep(self.delay_s)
        raise last  # type: ignore[misc]


def paginate_time_window(
    fetch_page: Callable[[int, int], list[dict]],
    start_ms: int,
    end_ms: int,
    interval_ms: int,
    page_limit: int,
    retry: RetryPolicy | None = None,
    pace_ms: int = 0,
    sleep: Callable[[float], None] = time.sleep,
) -> Iterator[list[dict]]:
    """Forward pagination cursor (reference _base_.py:257-288): fetch
    [cursor, min(cursor + limit*I, end)], advance to max(batch ts) + I;
    empty page advances by the window to skip dead zones. Each row must
    carry an aligned epoch-ms ``ts``.
    """
    retry = retry or RetryPolicy()
    cursor = start_ms
    while cursor <= end_ms:
        window_end = min(cursor + page_limit * interval_ms, end_ms)
        batch = retry.run(lambda: fetch_page(cursor, window_end))
        if batch:
            for row in batch:
                row["ts"] = (row["ts"] // interval_ms) * interval_ms
            yield batch
            cursor = max(r["ts"] for r in batch) + interval_ms
        else:
            cursor = window_end + interval_ms
        if pace_ms:
            sleep(pace_ms / 1000.0)


def fetch_ranges(
    ranges: DataFrame,
    fetch_page: Callable[[dict, int, int], list[dict]],
    out_schema: str,
    interval_ms: int,
    page_limit: int,
    start_col: str = "gap_start",
    end_col: str = "gap_end",
) -> DataFrame:
    """Distributed fetch over a gap-range plan: one task per range row.

    ``fetch_page(key_row, start_ms, end_ms)`` is executed on executors via
    mapInPandas — the scale path for backfills (1000 executors × paced
    fetches), with the ranges DataFrame pre-coalesced by
    operators.gaps.merge_gap_ranges so each task is one page.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for row in pdf.to_dict("records"):
                for batch in paginate_time_window(
                    lambda s, e, r=row: fetch_page(r, s, e),
                    int(row[start_col]),
                    int(row[end_col]),
                    interval_ms,
                    page_limit,
                ):
                    out.extend(batch)
            yield pd.DataFrame(out) if out else pd.DataFrame(
                {f.split(" ")[0]: [] for f in out_schema.split(", ")}
            )

    return ranges.mapInPandas(run, schema=out_schema)
