"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are generated from the engine's registered
query inventory (clx_etl_spark/queries/*); ``entry`` runs the flagship
gap-fill planning pipeline (SURVEY §3.1) on sf0.001.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from clx_etl_spark.queries import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: incremental gap-refetch planning over the events activity
    grid — watermark + LAG gap scan + boundary synthesis + islands merge
    (SURVEY §3.1) on /root/testdata/sf0.001."""
    registry = load_all()
    return registry["w3_gap_fill_plan"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
