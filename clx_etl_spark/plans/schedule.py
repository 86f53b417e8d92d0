"""Declarative job schedule — the reference's Prefect/cron deployment
table re-expressed as data (reference: src/deploy.py:69-173; legacy
APScheduler mirror src/main.py:19-101).

The engine deliberately does NOT embed a scheduler loop: on a cluster the
platform (Airflow/cron/Databricks jobs) owns triggering. What the engine
owns is (a) the catalog of runnable flows, (b) their cadences and
concurrency contracts, and (c) `due()` — the pure function a thin outer
loop needs. Every flow is safe to re-run (idempotent MERGE sinks), which
is what makes `misfire -> run late` the correct recovery policy, matching
the reference's coalesce=True/max_instances=1 settings.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Job:
    name: str
    flow: str  # dotted ref into clx_etl_spark.plans.flows
    interval_s: int  # cadence (reference deploy.py schedule)
    timeout_s: int = 1800
    max_concurrency: int = 1  # reference: concurrency_limit=1


# cadences from reference src/deploy.py:71-156 and src/main.py:21-96
SCHEDULE: tuple[Job, ...] = (
    Job("sync_symbols", "flows.sync_symbols", interval_s=86_400),
    Job("sync_klines_1m", "flows.sync_klines", interval_s=3_600),
    Job("sync_klines_1h", "flows.sync_klines", interval_s=3_600),
    Job("sync_klines_1d", "flows.sync_klines", interval_s=86_400),
    Job("sync_sentiment_5m", "flows.sync_sentiment", interval_s=300),
    Job("sync_funding", "flows.sync_funding", interval_s=3_600),
    Job("sync_kalshi", "flows.sync_kalshi", interval_s=60),
    Job("sync_onchain", "flows.sync_onchain", interval_s=30),
    Job("sync_macro", "flows.sync_macro", interval_s=30),
    Job("sync_cex_inflow", "flows.sync_cex_inflow", interval_s=3_600),
    Job("integrity_check", "flows.integrity_repair", interval_s=3_600),
)


def due(last_run_s: dict[str, float], now_s: float) -> list[Job]:
    """Jobs whose interval has elapsed since their last run. Never-run jobs
    are due immediately (cold start). Pure function — trivially testable
    and schedulable by any outer loop."""
    return [
        j
        for j in SCHEDULE
        if now_s - last_run_s.get(j.name, float("-inf")) >= j.interval_s
    ]
