"""Custom Python DataSource tests (sources/pysource.py): the offset
contract and pacing are pure-Python — pinned without a Spark session —
plus the end-to-end Arrow read through a real session."""

from __future__ import annotations

import os

from pyspark.sql.types import StructType


def _stage(tmp_path, n_chunks=3, rows_per=4):
    """A minimal __chunk=K parquet layout (what staging writes)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "chunks")
    for k in range(n_chunks):
        d = os.path.join(root, f"__chunk={k}")
        os.makedirs(d)
        ids = list(range(k * rows_per, (k + 1) * rows_per))
        t = pa.table({"doc_id": ids, "text": [f"d{i}" for i in ids]})
        pq.write_table(t, os.path.join(d, "part-0.parquet"))
    return root


def _schema():
    from pyspark.sql.types import LongType, StringType, StructField

    return StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )


def test_stream_reader_paces_one_chunk_per_batch(tmp_path):
    from duckdb_streaming_patterns_spark.sources.pysource import (
        ChunkTopicStreamReader,
    )

    r = ChunkTopicStreamReader(_schema(), {"path": _stage(tmp_path)})
    assert r.initialOffset() == {"chunk": 0}
    # one chunk per latestOffset call, capped at what exists
    assert r.latestOffset() == {"chunk": 1}
    assert r.latestOffset() == {"chunk": 2}
    assert r.latestOffset() == {"chunk": 3}
    assert r.latestOffset() == {"chunk": 3}  # drained: no phantom offsets
    parts = r.partitions({"chunk": 0}, {"chunk": 2})
    assert len(parts) == 2  # one file per staged chunk
    rows = [t for p in parts for t in r.read(p)]
    assert sum(b.num_rows for b in rows) == 8  # chunks 0+1 only
    r.commit({"chunk": 2})  # no-op by contract, must not raise


def test_stream_reader_restart_never_plans_backwards(tmp_path):
    """A checkpoint-restarted query re-creates the reader (pacer = 0)
    and immediately plans partitions(start=committed, end=committed+k);
    the pacer must fold that end back in so the NEXT latestOffset is
    >= the committed watermark instead of replaying from 1."""
    from duckdb_streaming_patterns_spark.sources.pysource import (
        ChunkTopicStreamReader,
    )

    root = _stage(tmp_path)
    fresh = ChunkTopicStreamReader(_schema(), {"path": root})
    fresh.partitions({"chunk": 2}, {"chunk": 3})  # restart replan
    assert fresh.latestOffset() == {"chunk": 3}


def test_batch_reader_plans_one_partition_per_file(tmp_path):
    from duckdb_streaming_patterns_spark.sources.pysource import (
        ChunkTopicBatchReader,
    )

    r = ChunkTopicBatchReader(_schema(), {"path": _stage(tmp_path)})
    parts = r.partitions()
    assert len(parts) == 3
    batches = [b for p in parts for b in r.read(p)]
    assert sum(b.num_rows for b in batches) == 12
    # schema projection: column order follows the SOURCE schema
    assert batches[0].schema.names == ["doc_id", "text"]


def test_chunk_topic_end_to_end_matches_native_scan(spark, sf_small):
    """Batch read through the registered format equals the native scan
    (value-level), and streaming replay delivers chunks as ordered
    micro-batches."""
    from duckdb_streaming_patterns_spark.queries import QUERIES
    from duckdb_streaming_patterns_spark.sources.tables import load_table

    fn, _ = QUERIES["python_datasource_scan"]
    got = sorted(
        (r["doc_id"], r["n_chars"]) for r in fn(spark, sf_small).collect()
    )
    want = sorted(
        (r["doc_id"], r["n_chars"])
        for r in load_table(spark, sf_small, "documents")
        .select("doc_id", "n_chars")
        .collect()
    )
    assert got == want


def test_sink_commit_protocol_manifest_last(tmp_path):
    """The sink's publish protocol: staged files invisible; commit
    moves files then writes the manifest LAST; a dir without a manifest
    is ignored by the committed reader; abort discards staged files; a
    re-delivered batch republishes idempotently."""
    import json
    import os

    import pyarrow as pa

    from duckdb_streaming_patterns_spark.sources.pysource import (
        COMMIT_MANIFEST,
        ChunkTopicStreamWriter,
        committed_batches,
    )

    out = str(tmp_path / "topic")
    os.makedirs(out)
    w = ChunkTopicStreamWriter(_schema(), {"path": out})

    def batches(ids):
        yield pa.record_batch(
            {"doc_id": ids, "text": [f"d{i}" for i in ids]}
        )

    # task write stages, publishes nothing
    m0 = w.write(batches([0, 1]))
    assert os.path.exists(m0.path) and ".staged" in m0.path
    assert committed_batches(out) == []
    # commit publishes batch 0, manifest last
    w.commit([m0, None], 0)  # None = empty task, must be skipped
    assert committed_batches(out) == [0]
    d0 = os.path.join(out, "__batch=0")
    assert os.path.exists(os.path.join(d0, COMMIT_MANIFEST))
    assert json.load(open(os.path.join(d0, COMMIT_MANIFEST)))["files"][0][
        "rows"
    ] == 2
    # a manifest-less dir (crash between moves and manifest) is invisible
    os.makedirs(os.path.join(out, "__batch=7"))
    assert committed_batches(out) == [0]
    # abort discards staged files
    m1 = w.write(batches([2]))
    w.abort([m1], 1)
    assert not os.path.exists(m1.path)
    assert committed_batches(out) == [0]
    # re-delivered epoch republishes (old contents replaced)
    m0b = w.write(batches([0, 1, 5]))
    w.commit([m0b], 0)
    assert committed_batches(out) == [0]
    assert json.load(open(os.path.join(d0, COMMIT_MANIFEST)))["files"][0][
        "rows"
    ] == 3
    # empty epoch: all-None messages still publish an (empty) manifest
    w.commit([None], 2)
    assert committed_batches(out) == [0, 2]


def test_stream_source_tails_chunks_added_mid_query(spark, tmp_path):
    """latestOffset re-lists the directory per micro-batch, so a chunk
    landing WHILE the query runs is picked up — the tailing behavior of
    a real topic (a file-source replay can do this too, but here it is
    the offset contract that delivers it, in chunk order)."""
    import os
    import shutil
    import time

    from duckdb_streaming_patterns_spark.sources import pysource

    root = _stage(tmp_path, n_chunks=2, rows_per=4)
    pysource.ensure_registered(spark)
    seen: list[tuple[int, list[int]]] = []

    def sink(b, bid):
        seen.append((bid, sorted(r["doc_id"] for r in b.collect())))

    q = (
        spark.readStream.format("chunk_topic")
        .option("path", root)
        .schema("doc_id long, text string")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline and len(seen) < 2:
            time.sleep(0.1)
        assert len(seen) >= 2
        # chunk 2 lands mid-query (staged atomically: write then rename)
        tmp_chunk = str(tmp_path / "newchunk")
        os.makedirs(tmp_chunk)
        import pyarrow as pa
        import pyarrow.parquet as pq

        ids = [100, 101]
        pq.write_table(
            pa.table({"doc_id": ids, "text": ["x", "y"]}),
            os.path.join(tmp_chunk, "part-0.parquet"),
        )
        shutil.move(tmp_chunk, os.path.join(root, "__chunk=2"))
        while time.monotonic() < deadline and len(seen) < 3:
            time.sleep(0.1)
    finally:
        q.stop()
        q.awaitTermination()
    assert len(seen) >= 3
    # one chunk per micro-batch, in chunk order, tail included
    assert seen[0] == (0, [0, 1, 2, 3])
    assert seen[1] == (1, [4, 5, 6, 7])
    assert seen[2] == (2, [100, 101])


def test_stream_source_checkpoint_restart_exactly_once(spark, tmp_path):
    """A NEW query over the same checkpoint resumes from the committed
    offset: chunks delivered before the stop are not replayed, the rest
    arrive in order — the exactly-once resume contract a real topic
    source must honor (pacing restart covered by the pure-Python test;
    this is the end-to-end Spark form)."""
    import time

    from duckdb_streaming_patterns_spark.sources import pysource

    root = _stage(tmp_path, n_chunks=4, rows_per=3)
    pysource.ensure_registered(spark)
    ckpt = str(tmp_path / "ckpt")
    seen: list[tuple[int, list[int]]] = []

    def run_until(n_batches, deadline_s=60):
        q = (
            spark.readStream.format("chunk_topic")
            .option("path", root)
            .schema("doc_id long, text string")
            .load()
            .writeStream.foreachBatch(
                lambda b, bid: seen.append(
                    (bid, sorted(r["doc_id"] for r in b.collect()))
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.monotonic() + deadline_s
            while time.monotonic() < deadline and len(seen) < n_batches:
                time.sleep(0.1)
        finally:
            q.stop()
            q.awaitTermination()

    run_until(2, deadline_s=120)  # first query: chunks 0 and 1 commit
    assert len(seen) >= 2
    n_first = len(seen)
    # restarted query resumes where it left off; if the first query's
    # stop raced far enough to drain everything, there is nothing left
    # to wait for — the coverage assertions below still hold
    delivered = {i for _bid, ids in seen for i in ids}
    if len(delivered) < 12:
        run_until(n_first + 2, deadline_s=120)
    # Contract: an epoch interrupted between foreachBatch and the offset
    # commit may be REDELIVERED with the SAME batch id and identical
    # contents (that is what the engine's batch-id fences absorb) — so
    # per batch id the content must be stable, and the distinct batch
    # ids must cover every chunk exactly once, in order.
    by_bid: dict[int, list[int]] = {}
    for bid, ids in seen:
        assert by_bid.get(bid, ids) == ids, (bid, by_bid.get(bid), ids)
        by_bid[bid] = ids
    assert [i for bid in sorted(by_bid) for i in by_bid[bid]] == list(
        range(12)
    )


def test_stream_reader_committed_restart_floors_pacer(tmp_path):
    """Round-12 ADVICE: a restart whose offset log is FULLY committed has
    no pending batch to replan — the only signal the fresh reader gets is
    the engine's re-commit of the last durable batch. commit() must floor
    the pacer at that watermark, else the first latestOffset() returns
    {chunk: 1} (< committed) and new chunks landing afterwards get
    planned in a BACKWARDS batch that re-delivers committed chunks."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_streaming_patterns_spark.sources.pysource import (
        ChunkTopicStreamReader,
    )

    root = _stage(tmp_path)  # chunks 0..2, all committed pre-restart
    fresh = ChunkTopicStreamReader(_schema(), {"path": root})
    fresh.commit({"chunk": 3})  # engine's restart re-commit
    # a new chunk lands after the restart
    d = os.path.join(root, "__chunk=3")
    os.makedirs(d)
    ids = [12, 13]
    pq.write_table(
        pa.table({"doc_id": ids, "text": [f"d{i}" for i in ids]}),
        os.path.join(d, "part-0.parquet"),
    )
    # the next offset must be ABOVE the committed watermark — exactly
    # the new chunk, never a replay of chunks 0..2
    assert fresh.latestOffset() == {"chunk": 4}


def test_stream_reader_partitions_floors_on_start_offset(tmp_path):
    """partitions() folds BOTH offsets into the pacer: planning an empty
    range (start == end == committed) must still keep latestOffset at or
    above the watermark."""
    from duckdb_streaming_patterns_spark.sources.pysource import (
        ChunkTopicStreamReader,
    )

    fresh = ChunkTopicStreamReader(_schema(), {"path": _stage(tmp_path)})
    fresh.partitions({"chunk": 3}, {"chunk": 3})
    assert fresh.latestOffset() == {"chunk": 3}


def test_ensure_registered_is_per_session(spark):
    """Registration is keyed on the SESSION, not a process-global flag
    (round-12 ADVICE): a second session in the same process registers
    again rather than silently skipping. Spark 4.1 shares the Python
    data-source registry across newSession() clones — there the
    re-register surfaces as DATA_SOURCE_ALREADY_EXISTS, which
    ensure_registered treats as the registered state; on a genuinely
    fresh registry the register call succeeds. Either way the second
    session ends up able to plan chunk_topic reads."""
    from duckdb_streaming_patterns_spark.sources import pysource

    pysource.ensure_registered(spark)
    assert spark in pysource._SESSIONS_REGISTERED
    s2 = spark.newSession()
    try:
        assert s2 not in pysource._SESSIONS_REGISTERED
        pysource.ensure_registered(s2)  # must not raise on shared registry
        assert s2 in pysource._SESSIONS_REGISTERED
    finally:
        pysource._SESSIONS_REGISTERED.discard(s2)
