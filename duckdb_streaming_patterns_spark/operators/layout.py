"""Physical-layout operators: partitioned and bucketed tables at rest.

The two storage-layout levers a 100 TB deployment pulls before any query
tuning:

- **partition pruning**: fact tables written ``partitionBy(date)`` so a
  date-ranged query reads only matching directories — the scan cost tracks
  the queried window, not table history. (The same mechanism backs the CDF
  emulation's snapshot pruning in plans/snapshots.py.)
- **bucketing**: both sides of a recurring fact-fact join written
  ``bucketBy(n, key)`` so the join is co-located at write time — the
  SortMergeJoin consumes bucketed scans directly with ZERO Exchange in the
  plan (asserted in tests/test_plans.py). At 100 TB this converts every
  run of the join from a full two-sided shuffle into a scan-merge; the
  shuffle is paid once, at layout time.

Local layout artifacts live under /tmp (never the repo); creation is
memoized per (sf_dir, params) like the streaming replay staging.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.sources.tables import load_table

LAYOUT_ROOT = os.environ.get("SPARK_GRAFT_LAYOUT_DIR", "/tmp/dsp_layout")

_PARTITIONED: dict[tuple, str] = {}
_BUCKETED: dict[tuple, tuple[str, str]] = {}


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", os.path.basename(sf_dir.rstrip("/")))


def partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Write `events` date-partitioned (memoized); returns the path.

    At scale this is the bronze-table layout: one directory per day, so
    event-time-ranged queries scan only the queried days."""
    key = (sf_dir, "events_by_date")
    cached = _PARTITIONED.get(key)
    if cached and os.path.isdir(cached):
        return cached
    path = os.path.join(LAYOUT_ROOT, _tag(sf_dir), "events_by_date")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    ev.write.mode("overwrite").partitionBy("event_date").parquet(path)
    _PARTITIONED[key] = path
    return path


def bucketed_join_tables(
    spark: SparkSession, sf_dir: str, n_buckets: int = 8
) -> tuple[str, str]:
    """Create bucketed external tables for lineitem and orders, clustered
    and sorted on the order key (memoized); returns the table names.

    External location under /tmp; metadata in the session catalog. The
    write pays one shuffle-by-bucket; every subsequent orderkey join of
    the pair is exchange-free."""
    key = (sf_dir, n_buckets)
    cached = _BUCKETED.get(key)
    if cached and all(spark.catalog.tableExists(t) for t in cached):
        return cached
    tag = _tag(sf_dir)
    names = (f"lineitem_b{n_buckets}_{tag}", f"orders_b{n_buckets}_{tag}")
    specs = [
        (names[0], load_table(spark, sf_dir, "lineitem"), "l_orderkey"),
        (names[1], load_table(spark, sf_dir, "orders"), "o_orderkey"),
    ]
    for name, df, bucket_key in specs:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(n_buckets, bucket_key)
            .sortBy(bucket_key)
            .option("path", os.path.join(LAYOUT_ROOT, tag, name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    _BUCKETED[key] = names
    return names


_IVF_LAYOUT: dict[tuple, tuple[str, object]] = {}


def ivf_partitioned_embeddings(
    spark: SparkSession, sf_dir: str, n_centroids: int = 16, iters: int = 2
):
    """Materialize the IVF index AT REST: embeddings written partitioned by
    their coarse-quantizer cell (memoized); returns (path, centroids).

    This is the physical form knn_ivf's docstring promises: a probe for
    n_probe cells is a directory-pruned scan reading n_probe/n_centroids of
    the corpus (PartitionFilters, asserted in tests), instead of an
    assignment pass over everything. Centroids are returned so probes use
    the same quantizer the layout was built with."""
    from duckdb_streaming_patterns_spark.operators import similarity

    key = (sf_dir, n_centroids, iters)
    cached = _IVF_LAYOUT.get(key)
    if cached and os.path.isdir(cached[0]):
        return cached
    path = os.path.join(LAYOUT_ROOT, _tag(sf_dir), f"embeddings_ivf{n_centroids}")
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = similarity.ivf_centroids(
        emb, n_centroids=n_centroids, iters=iters
    )
    assigned = similarity.ivf_assign(emb, centroids)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    _IVF_LAYOUT[key] = (path, centroids)
    return path, centroids


def bucketed_revenue_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by order status through the bucketed pair. The ``merge``
    hint pins SortMergeJoin (a broadcast would hide the layout win at
    fixture scale; at 100 TB neither side broadcasts), and the bucketed
    scans satisfy its distribution requirement with no Exchange."""
    li_t, ord_t = bucketed_join_tables(spark, sf_dir)
    li = spark.table(li_t).hint("merge")
    orders = spark.table(ord_t)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def pruned_daily_clicks(
    spark: SparkSession, sf_dir: str, start: str, end: str
) -> DataFrame:
    """Clicks per day over a date window, read from the date-partitioned
    layout — the filter prunes partitions (PartitionFilters in the scan),
    so only the window's directories are read."""
    path = partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(path)
    return (
        ev.filter(
            (F.col("event_date") >= F.lit(start).cast("date"))
            & (F.col("event_date") <= F.lit(end).cast("date"))
            & (F.col("event_type") == "click")
        )
        .groupBy("event_date")
        .agg(F.count("*").alias("n_clicks"))
        .select(F.col("event_date").cast("string").alias("event_date"), "n_clicks")
    )


def dpp_daily_clicks(
    spark: SparkSession, sf_dir: str, days_of_month: tuple[int, ...]
) -> DataFrame:
    """Clicks per day for the days selected by a DIMENSION filter — the
    dynamic-partition-pruning shape: the fact scan's partition filter is
    not known until the (broadcast) dim side is evaluated at runtime, so
    Catalyst inserts a dynamicpruningexpression into PartitionFilters
    (plan-asserted). This is the optimizer surface every star-schema scan
    over a partitioned 100 TB fact table lives on: the date predicate
    arrives via a join, not a literal, and still only the matching
    day-directories are read."""
    path = partitioned_events(spark, sf_dir)
    ev = spark.read.parquet(path)
    dim = (
        load_table(spark, sf_dir, "events")
        .select(F.col("ts").cast("date").alias("event_date"))
        .distinct()
        .filter(F.dayofmonth("event_date").isin(*days_of_month))
    )
    return (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(dim), "event_date")
        .groupBy("event_date")
        .agg(F.count("*").alias("n_clicks"))
        .select(
            F.col("event_date").cast("string").alias("event_date"), "n_clicks"
        )
    )
