"""SparkSession factory.

Defaults are chosen for the 100 TB design target scaled down to local mode:
AQE on (runtime partition coalescing + skew-join handling), Arrow on (all
Python-side compute is vectorized), UTC session timezone (parity with the
DuckDB oracle, whose timestamps are UTC-naive), and shuffle partitions sized
to the local core count rather than Spark's default 200.

On a real cluster the same builder applies; only ``master`` and the memory
knobs change. Nothing in the engine assumes single-JVM execution.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "duckdb_streaming_patterns_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Parameters are overridable for tests/bench; environment variable
    ``SPARK_GRAFT_CPUS`` sets local parallelism (default 32).
    """
    cpus = int(DEFAULT_CPUS)
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        # Streaming micro-batch state: RocksDB would be the cluster choice;
        # default HDFS-backed store is fine in local mode.
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
