"""SparkSession factory (HRP:105-124 analog, ES connector config dropped).

Scale posture: AQE on (runtime join-strategy switch, skew-join splitting,
partition coalescing), UTC session timezone for deterministic epoch math,
Arrow enabled for the pandas-UDF escape hatches. ``spark.sql.shuffle.partitions``
defaults to 2x cores locally; on a real cluster it should be sized to the
input (the operators themselves never hard-code partition counts).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "household-retention-engine"


def get_spark(
    app_name: str = DEFAULT_APP_NAME,
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` else all cores. On a cluster
    deployment the master/resource config comes from spark-submit; only the
    SQL-level settings below matter there.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # honor the 64m advisory target when coalescing instead of keeping
        # one partition per core: post-shuffle partition count then derives
        # from DATA SIZE at every scale (thousands of partitions at 100 TB,
        # a handful on a laptop) — the setting Spark's own tuning guide
        # recommends, and ~30% off small-stage wall time locally, where
        # per-task scheduling overhead dominates sub-MB partitions.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Read parquet TIMESTAMP as an instant (session-UTC), not NTZ — keeps
        # epoch math identical to the oracle and to the reference's Spark 2.x.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # TIMESTAMP(NANOS) parquet (events.ts) is illegal for Spark's reader;
        # read as long and convert (sources.tpch truncates to micros, which
        # is exactly what DuckDB does when it reads the same file).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel(os.environ.get("LOG_LEVEL", "WARN"))
    return spark
