"""Commit-backend fault injection (VERDICT r11 item 4): the manifest
CAS, head-hint, and manifest-read primitives live behind a swappable
backend (sinks/versioned.LocalCommitBackend) so an object-store port is
a swap, not a rewrite — and so commit-protocol faults can be injected
through the INTERFACE instead of corrupting raw files. Covers: a lost
conditional put (the S3 "concurrent writer won" outcome), a torn/
garbage hint, and a hint that lags the true head (loser-writes-last)."""

from __future__ import annotations

import os

import pytest

from clx_etl_spark.sinks.versioned import (
    LocalCommitBackend,
    append_version,
    latest_version,
    read_version,
    set_commit_backend,
)


@pytest.fixture
def restore_backend():
    prev = set_commit_backend(LocalCommitBackend())
    try:
        yield
    finally:
        set_commit_backend(prev)


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "k long, s string"
    ).coalesce(1)


class LostCasBackend(LocalCommitBackend):
    """First N conditional puts report 'already exists' WITHOUT creating
    the object — the observable outcome of losing an S3 conditional-put
    race (the winner being a writer this process never sees)."""

    def __init__(self, lose: int):
        self.lose = lose
        self.cas_calls = 0

    def put_if_absent(self, dest: str, payload: str) -> bool:
        self.cas_calls += 1
        if self.lose > 0:
            self.lose -= 1
            return False
        return super().put_if_absent(dest, payload)


class TornHintBackend(LocalCommitBackend):
    """The hint replace lands as garbage (a torn multi-part upload /
    interrupted writer) — readers must degrade to the manifest listing,
    never crash or trust the hint."""

    def replace_atomic(self, dest: str, payload: str) -> None:
        super().replace_atomic(dest, "<torn>")


class StaleHintBackend(LocalCommitBackend):
    """The hint PUT is dropped entirely (object-store last-writer-wins
    where the LOSER wrote last, or a crash between CAS and hint):
    the hint lags the committed head and readers must probe forward."""

    def replace_atomic(self, dest: str, payload: str) -> None:
        if not os.path.exists(dest):
            super().replace_atomic(dest, payload)  # seed v0's hint only


def test_lost_cas_retries_and_commits_once(spark, tmp_path, restore_backend):
    path = str(tmp_path / "t")
    append_version(_df(spark, 0, 5), path)
    fb = LostCasBackend(lose=2)
    set_commit_backend(fb)
    v = append_version(_df(spark, 5, 10), path)
    assert v == 1  # the rebase loop re-resolved the SAME head and won
    assert fb.cas_calls == 3  # two injected losses + the winning put
    assert latest_version(path) == 1
    assert read_version(spark, path).count() == 10


def test_lost_cas_exhaustion_raises(spark, tmp_path, restore_backend):
    from clx_etl_spark.sinks.versioned import VersionConflictError

    path = str(tmp_path / "t")
    append_version(_df(spark, 0, 5), path)
    set_commit_backend(LostCasBackend(lose=10_000))
    with pytest.raises(VersionConflictError):
        append_version(_df(spark, 5, 10), path, max_retries=3)
    set_commit_backend(LocalCommitBackend())
    assert latest_version(path) == 0  # nothing half-committed
    assert read_version(spark, path).count() == 5


def test_torn_hint_degrades_to_listing(spark, tmp_path, restore_backend):
    path = str(tmp_path / "t")
    set_commit_backend(TornHintBackend())
    append_version(_df(spark, 0, 5), path)
    append_version(_df(spark, 5, 10), path)
    # every hint write was torn; the head must still resolve
    assert latest_version(path) == 1
    assert read_version(spark, path).count() == 10
    # a healthy writer heals the hint in passing
    set_commit_backend(LocalCommitBackend())
    append_version(_df(spark, 10, 12), path)
    with open(os.path.join(path, "_manifests", "_latest")) as fh:
        assert fh.read().strip() == "2"


def test_stale_hint_probes_forward(spark, tmp_path, restore_backend):
    path = str(tmp_path / "t")
    set_commit_backend(StaleHintBackend())
    for i in range(4):
        append_version(_df(spark, 5 * i, 5 * i + 5), path)
    with open(os.path.join(path, "_manifests", "_latest")) as fh:
        assert fh.read().strip() == "0"  # hint frozen at the seed
    assert latest_version(path) == 3  # probe walked the manifest chain
    assert read_version(spark, path).count() == 20
