"""Metadata-only COUNT(col) (non-null counts from the manifest's
__nulls__ stats) and merge-time schema evolution (evolve=True on both
merge flavors widens the contract; missing columns still refuse)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clx_etl_spark.sinks.versioned import (
    SchemaEnforcementError,
    add_columns,
    append_version,
    count_col_meta,
    delete_version_dv,
    merge_version,
    merge_version_dv,
    read_version,
    table_schema,
)


def test_count_col_meta_exact(spark, tmp_path):
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, None), (3, "c")],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k", "s"])
    append_version(
        spark.createDataFrame([(4, None), (5, None)],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k", "s"])
    assert count_col_meta(path, "s") == 2
    assert count_col_meta(path, "k") == 5
    # version pinning
    assert count_col_meta(path, "s", version=0) == 2


def test_count_col_meta_none_when_inexact(spark, tmp_path):
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, None)],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k", "s"])
    # a dv on a null-bearing file: the tombstoned row's null-ness is
    # unknown -> cannot be exact
    delete_version_dv(spark, path, "k", 1, 1)
    assert count_col_meta(path, "s") is None
    # zero-null files stay exact under dvs (every dv'd row was non-null)
    assert count_col_meta(path, "k") == 1
    # untracked column -> None
    assert count_col_meta(path, "nope") is None


def test_count_col_meta_metadata_only_column(spark, tmp_path):
    from pyspark.sql.types import LongType

    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1,)], "k long").coalesce(1),
        path, stats_cols=["k"])
    add_columns(path, [("n", LongType())])
    # no file carries n and no stats exist -> conservative None
    assert count_col_meta(path, "n") is None


def test_merge_evolve_widens(spark, tmp_path):
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k"])
    batch = spark.createDataFrame([(2, "B", 1.5), (9, "i", 2.5)],
                                  "k long, s string, x double")
    with pytest.raises(SchemaEnforcementError, match="evolve=True"):
        merge_version(batch, path, keys=["k"])
    merge_version(batch, path, keys=["k"], evolve=True)
    assert table_schema(path).fieldNames() == ["k", "s", "x"]
    got = {r["k"]: (r["s"], r["x"])
           for r in read_version(spark, path).collect()}
    assert got == {1: ("a", None), 2: ("B", 1.5), 9: ("i", 2.5)}
    # missing columns still refuse even with evolve
    with pytest.raises(SchemaEnforcementError, match="missing table col"):
        merge_version(spark.createDataFrame([(1, "z")], "k long, s string"),
                      path, keys=["k"], evolve=True)


def test_merge_dv_evolve_widens(spark, tmp_path):
    path = str(tmp_path / "t")
    append_version(
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "k long, s string").coalesce(1),
        path, stats_cols=["k"])
    batch = spark.createDataFrame([(2, "B", 1.5)],
                                  "k long, s string, x double")
    with pytest.raises(SchemaEnforcementError, match="evolve=True"):
        merge_version_dv(batch, path, keys=["k"])
    merge_version_dv(batch, path, keys=["k"], evolve=True)
    assert table_schema(path).fieldNames() == ["k", "s", "x"]
    got = {r["k"]: (r["s"], r["x"])
           for r in read_version(spark, path).collect()}
    assert got == {1: ("a", None), 2: ("B", 1.5)}
