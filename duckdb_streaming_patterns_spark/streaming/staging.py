"""Deterministic stream replay from files (SURVEY §7 hard-part 4).

The reference's stream is a Kafka topic; CI has no broker, so tests and the
driver's correctness gate replay the `events` fixture through Spark's file
source: the table is split into N chunk files written in event order, and
``readStream(..., maxFilesPerTrigger=1)`` turns each chunk into one
micro-batch — a faithful, reproducible stand-in for topic offsets
(chunk boundary == offset range). The Kafka path proper is declared in
streaming/kafka.py and differs only in the source format string.
"""

from __future__ import annotations

import glob
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.sources.tables import load_table

RUNS_ROOT = os.environ.get("SPARK_GRAFT_RUN_DIR", "/tmp/dsp_runs")

# Staged chunk dirs are a pure function of (table dir, chunking params) —
# the same bytes every time — so repeated pattern runs in one process
# (bench + the oracle gate run every pattern query) reuse the first
# staging instead of re-writing it. Checkpoints and summaries stay
# per-run; only the *input* replay files are shared.
_STAGE_CACHE: dict[tuple, str] = {}

EVENT_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string,"
    " value double, props string"
)
# JSON wire schema — mirrors the reference producer's message shape
# (scripts/producer.py:73-78): ISO-8601 timestamp string + string ids +
# user_name (stable per user_id: USER_IDS[user_name] is a bijection at
# producer.py:66-67; the fixture's derivation 'user_' || user_id preserves
# exactly that functional dependency).
JSON_WIRE_SCHEMA = (
    "timestamp string, user_id string, user_name string, event_type string"
)
TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def new_run_dir(tag: str) -> str:
    d = os.path.join(RUNS_ROOT, f"{tag}_{uuid.uuid4().hex[:12]}")
    os.makedirs(d, exist_ok=True)
    return d


def _stamp_chunk_order(chunks_dir: str) -> None:
    """Give chunk k's files mtime = t0 + k. Spark's file stream source
    orders files by modification time; a single-pass partitioned write
    stamps near-identical mtimes, so without this the replay order of
    chunks is ARBITRARY (observed: chunk 1 before chunk 0) — silently
    breaking every order-sensitive replay (watermarks, sessionization)."""
    t0 = os.path.getmtime(chunks_dir)
    for d in glob.glob(os.path.join(chunks_dir, "__chunk=*")):
        k = int(d.rsplit("=", 1)[1])
        for f in glob.glob(os.path.join(d, "*")):
            os.utime(f, (t0 + k, t0 + k))


def stage_event_chunks(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 5,
    order_col: str = "event_id",
    dup_factor: int = 1,
) -> str:
    """Split `events` into n_chunks single-file parquet chunks in
    ``order_col`` order; chunk k is micro-batch k on replay.

    order_col="ts" stages an event-time-ordered stream: each chunk's rows
    are all later than the previous chunk's, so a ``withWatermark`` query
    replaying it never classifies a row late — the deterministic harness
    for watermark semantics (SURVEY §7 hard-part 4). dup_factor > 1 writes
    each event that many times within its chunk, the fixture for streaming
    dedup (the copies land in one micro-batch, inside any watermark).

    Chunk assignment is range-bucketing on approxQuantile boundaries
    (parallel scan + a codegen'd per-row comparison) — no global sort.
    Ties at a boundary all land in the lower chunk, so chunks are monotone
    in order_col (the property the watermark tests need) even if slightly
    uneven in size.
    """
    key = ("events", sf_dir, n_chunks, order_col, dup_factor)
    cached = _STAGE_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached
    ev = load_table(spark, sf_dir, "events")
    chunks_dir = os.path.join(out_dir, "chunks")
    if order_col == "event_id":
        # event_id is dense — arithmetic chunking, no boundary probe needed
        rows = ev.count()
        per = (rows + n_chunks - 1) // n_chunks
        chunk = (F.col("event_id") / F.lit(per)).cast("int").alias("__chunk")
        staged = ev.select("*", chunk)
    else:
        ord_expr = F.col(order_col)
        if "timestamp" in dict(ev.dtypes)[order_col]:
            ord_expr = F.unix_micros(ord_expr.cast("timestamp"))
        probed = ev.withColumn("__ord", ord_expr.cast("double"))
        bounds = probed.approxQuantile(
            "__ord", [i / n_chunks for i in range(1, n_chunks)], 0.001
        )
        chunk = sum(
            F.when(F.col("__ord") > F.lit(b), 1).otherwise(0) for b in bounds
        )
        staged = probed.select("*", chunk.cast("int").alias("__chunk")).drop("__ord")
    if dup_factor > 1:
        staged = staged.withColumn(
            "__copy", F.explode(F.array(*[F.lit(i) for i in range(dup_factor)]))
        ).drop("__copy")
    (
        staged.repartition("__chunk")
        .write.mode("overwrite")
        .partitionBy("__chunk")
        .parquet(chunks_dir)
    )
    _stamp_chunk_order(chunks_dir)
    _STAGE_CACHE[key] = chunks_dir
    return chunks_dir


def read_event_stream(spark: SparkSession, chunks_dir: str) -> DataFrame:
    """File-source micro-batch stream: one staged chunk per trigger —
    the Kafka-source stand-in (reference pattern_2.py:38-43)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunks_dir)
    )


def stage_json_chunks(
    spark: SparkSession, sf_dir: str, out_dir: str, n_chunks: int = 5
) -> str:
    """Stage events as JSON-lines text chunks — the Kafka *value* parity
    path: each line is what the reference producer would put on the wire
    (scripts/producer.py:73-78), exercising decode + from_json at read."""
    key = ("events_json", sf_dir, n_chunks)
    cached = _STAGE_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached
    ev = load_table(spark, sf_dir, "events")
    rows = ev.count()
    per = (rows + n_chunks - 1) // n_chunks
    wire = ev.select(
        (F.col("event_id") / F.lit(per)).cast("int").alias("__chunk"),
        F.to_json(
            F.struct(
                F.date_format("ts", TS_FMT).alias("timestamp"),
                F.col("user_id").cast("string").alias("user_id"),
                F.concat(
                    F.lit("user_"), F.col("user_id").cast("string")
                ).alias("user_name"),
                F.col("event_type"),
            )
        ).alias("value"),
    )
    chunks_dir = os.path.join(out_dir, "chunks")
    (
        wire.repartition("__chunk")
        .write.mode("overwrite")
        .partitionBy("__chunk")
        .text(chunks_dir)
    )
    _stamp_chunk_order(chunks_dir)
    _STAGE_CACHE[key] = chunks_dir
    return chunks_dir


def read_json_stream(spark: SparkSession, chunks_dir: str) -> DataFrame:
    """Text stream of JSON values → parsed columns, mirroring the
    reference's Spark pipeline (pattern_2.py:46-51): CAST → from_json →
    flatten → to_timestamp."""
    raw = (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .text(chunks_dir)
    )
    return (
        raw.select(F.from_json(F.col("value"), JSON_WIRE_SCHEMA).alias("data"))
        .select("data.*")
        .withColumn(
            "ts", F.to_timestamp("timestamp", TS_FMT).cast("timestamp_ntz")
        )
        .drop("timestamp")
    )


DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def stage_document_chunks(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 5,
) -> str:
    """Split `documents` into n_chunks single-file parquet chunks in
    doc_id order; chunk k is micro-batch k on replay — the corpus
    arriving as a stream (a crawl dump landing batch by batch), the
    input shape of continuous-ingestion dedup."""
    key = ("documents", sf_dir, n_chunks)
    cached = _STAGE_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached
    docs = load_table(spark, sf_dir, "documents")
    rows = docs.count()
    per = (rows + n_chunks - 1) // n_chunks
    # doc_id is dense from 0 — arithmetic chunking keeps chunks monotone
    # in doc_id, the property the first-occurrence oracle relies on
    chunk = (F.col("doc_id") / F.lit(per)).cast("int").alias("__chunk")
    chunks_dir = os.path.join(out_dir, "chunks")
    (
        docs.select("*", chunk)
        .repartition("__chunk")
        .write.mode("overwrite")
        .partitionBy("__chunk")
        .parquet(chunks_dir)
    )
    _stamp_chunk_order(chunks_dir)
    _STAGE_CACHE[key] = chunks_dir
    return chunks_dir


def read_document_stream(spark: SparkSession, chunks_dir: str) -> DataFrame:
    """File-source micro-batch stream of staged document chunks."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunks_dir)
    )


EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def stage_embedding_chunks(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 5,
) -> str:
    """Split `embeddings` into n_chunks single-file parquet chunks in
    vec_id order — embedding batches landing as a stream (a continuously
    embedded corpus), the input shape of streaming ANN-index
    maintenance. Chunk k = vec_id div ceil(rows/n), the same arithmetic
    the oracles replay."""
    key = ("embeddings", sf_dir, n_chunks)
    cached = _STAGE_CACHE.get(key)
    if cached and os.path.isdir(cached):
        return cached
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.count()
    per = (rows + n_chunks - 1) // n_chunks
    chunk = (F.col("vec_id") / F.lit(per)).cast("int").alias("__chunk")
    chunks_dir = os.path.join(out_dir, "chunks")
    (
        emb.select("*", chunk)
        .repartition("__chunk")
        .write.mode("overwrite")
        .partitionBy("__chunk")
        .parquet(chunks_dir)
    )
    _stamp_chunk_order(chunks_dir)
    _STAGE_CACHE[key] = chunks_dir
    return chunks_dir


def stage_paired_embedding_chunks(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    n_chunks: int = 6,
) -> str:
    """Embedding chunks at a DIFFERENT micro-batch granularity than the
    matching document stream: the corpus is split into ``n_chunks``
    vec_id-arithmetic chunks (the SAME prefix boundaries the document
    stream uses), then consecutive PAIRS are concatenated into one
    single-file stream chunk — so embedding micro-batch v carries the
    corpus coverage of document micro-batches 2v and 2v+1. This is the
    deliberately UNALIGNED batch numbering the atomic two-index
    generation manifest exists for: the two streams share corpus-prefix
    boundaries (the real-world invariant — both consume the same
    upstream feed) but NOT batch ids."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = stage_embedding_chunks(
        spark, sf_dir, os.path.join(out_dir, "base"), n_chunks=n_chunks
    )
    dst = os.path.join(out_dir, "paired")
    if os.path.isdir(dst) and glob.glob(os.path.join(dst, "__chunk=*")):
        return dst
    src_dirs = sorted(
        glob.glob(os.path.join(src, "__chunk=*")),
        key=lambda d: int(d.rsplit("=", 1)[1]),
    )
    for v in range((len(src_dirs) + 1) // 2):
        pair = src_dirs[2 * v : 2 * v + 2]
        tables = [
            pq.read_table(f)
            for d in pair
            for f in sorted(glob.glob(os.path.join(d, "*.parquet")))
        ]
        d = os.path.join(dst, f"__chunk={v}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            pa.concat_tables(tables), os.path.join(d, "part-0.parquet")
        )
    _stamp_chunk_order(dst)
    return dst


def read_embedding_stream(spark: SparkSession, chunks_dir: str) -> DataFrame:
    """File-source micro-batch stream of staged embedding chunks."""
    return (
        spark.readStream.schema(EMB_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunks_dir)
    )
