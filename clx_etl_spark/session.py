"""SparkSession factory with scale-oriented defaults.

Tuned for the driver harness (local[N], single JVM) but every setting is
chosen for cluster scale: AQE handles skew and post-shuffle coalescing,
shuffle partitions sized for the bench SF, Arrow for the pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQL confs we need regardless of who built the session
# (the driver harness builds its own). nanosAsLong: the synthetic events
# table stores TIMESTAMP(NANOS) which Spark's vectorized parquet reader
# rejects unless read as raw long.
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Best-effort apply of runtime-settable confs to an existing session."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime-settable on this build; builder path sets it
    return spark


def get_spark(app_name: str = "clx-spark", master: str | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    # sized for the bench SF on local[32]; on a cluster set this to
    # ~2-3x total executor cores (AQE coalesces the excess)
    shuffle_parts = os.environ.get("CLX_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.driver.memory", os.environ.get("CLX_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # at 100 TB: bound scan task size; AQE re-coalesces small ones
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # lets the clx_table DSv2 source prune files off the manifest at
        # plan time (read_table_source degrades gracefully without it)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    # sharded-test isolation (scripts/ptest.py): each worker process
    # gets its own warehouse + Derby home so concurrent pytest shards
    # never contend on cwd-relative state
    wh = os.environ.get("CLX_WAREHOUSE_DIR")
    if wh:
        builder = builder.config("spark.sql.warehouse.dir", wh)
    dh = os.environ.get("CLX_DERBY_HOME")
    if dh:
        builder = builder.config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home={dh} -Dderby.stream.error.file={dh}/derby.log",
        )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return apply_runtime_confs(spark)
