"""SparkSession factory.

Defaults are sized for local[N] testing but every knob matters at cluster
scale: AQE (runtime partition coalescing + skew-join splitting), Arrow
(vectorized pandas UDF transfer), and a shuffle-partition count that the
caller overrides per data scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "networkit-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a real cluster the master/executor topology comes from
    spark-submit; here we honor $SPARK_GRAFT_CPUS for local sizing.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_for_iteration(spark: SparkSession, shuffle_partitions: int | None = None) -> None:
    """Clamp shuffle width for iterative kernels on small/medium inputs.

    Iterative join-agg supersteps launch dozens of stages; 200 default
    shuffle partitions of a few KB each is pure scheduler overhead. At
    100 TB the caller instead raises this (or relies on AQE coalescing).
    Safe no-op if the conf is immutable in the caller's session.
    """
    if shuffle_partitions is None:
        par = spark.sparkContext.defaultParallelism
        shuffle_partitions = max(8, par)
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    except Exception:
        pass
