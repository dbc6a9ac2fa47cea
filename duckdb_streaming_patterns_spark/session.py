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

# Cluster-profile confs (opt-in via SPARK_GRAFT_PROD_CONF=1): the
# optimization guide's at-scale I/O and join settings (§2.3, §3.1, §4.3,
# §6, §9). They are NOT defaults because the bench must stay comparable
# across rounds on this host (a codec swap's local effect is far inside
# the window noise, see OPTIMIZATION_r16.md), but production values
# belong in code, parameterised, not in a doc footnote:
# - zstd for parquet and shuffle: markedly better ratio than
#   snappy/lz4 at similar read speed — at 100 TB the shuffle and scan
#   byte counts dominate the network floor (§1.3), so ratio wins
#   convert directly to wall time;
# - 512m scan splits: fewer, larger map tasks feeding every shuffle
#   (§2.2) for large sequential parquet scans;
# - 256m AQE advisory partitions: post-shuffle partitions in the
#   100 MB–1 GB band instead of many tiny reducers (§2.2);
# - shuffled-hash join allowed (§3.1): sort-merge only when the planner
#   proves the build side won't fit;
# - Arrow-serialized scalar UDFs (§4.3): this engine has none on query
#   paths, but any future one should cross the boundary as Arrow.
_PROD_CONF: dict[str, str] = {
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.io.compression.codec": "zstd",
    "spark.sql.files.maxPartitionBytes": "512m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
    "spark.sql.join.preferSortMergeJoin": "false",
    "spark.sql.execution.pythonUDF.arrow.enabled": "true",
}


def session_conf(
    shuffle_partitions: int,
    prod: bool | None = None,
    driver_mem: str | None = None,
) -> dict[str, str]:
    """The engine's session conf as a plain dict — pure so the profile
    logic is testable without a JVM. ``prod=None`` reads
    ``SPARK_GRAFT_PROD_CONF`` (any value but ''/'0' enables the cluster
    profile above); explicit ``extra_conf`` passed to :func:`get_spark`
    still wins over either profile."""
    if prod is None:
        prod = os.environ.get("SPARK_GRAFT_PROD_CONF", "0") not in ("", "0")
    conf = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
        # Streaming micro-batch state: RocksDB would be the cluster
        # choice; default HDFS-backed store is fine in local mode.
        "spark.sql.shuffle.spill.compress": "true",
        "spark.ui.enabled": "false",
        "spark.driver.memory": driver_mem
        if driver_mem is not None
        else os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    }
    if prod:
        conf.update(_PROD_CONF)
    return conf


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

    builder = SparkSession.builder.master(master).appName(app_name)
    conf = session_conf(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
