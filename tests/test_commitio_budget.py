"""SCALE.md §10.4 request budget, EXECUTED (round 12, verdict item 2):
CountingCommitIO wraps ObjectStoreSimIO and counts every would-be store
round-trip per verb, and these tests pin the metadata-plane request
complexity of the four hot operations — one append, one maintenance
tick, one snapshots() read, one read_latest — at depth ~64. The ledger
CHECKPOINT test bounds file OPENS, which is only the same thing on
POSIX; this is the guard that catches a change quietly going O(depth)
on the REQUEST plane (e.g. the per-snapshot generation-pointer GET this
wrapper's first probe found in _ledger_paths).

Budget being pinned (measured round 12, ObjectStoreSimIO):
- SnapshotTable.append: ~7 requests flat in table age; a checkpoint
  tick adds ≤ checkpoint_every loose-entry GCs + 1 conditional PUT.
- snapshots(): 1 LIST + ≤ checkpoint_every GETs regardless of age
  (parse-cached checkpoint → usually 1 LIST total on a warm reader).
- full-range read: 1 pointer GET + 1 LIST + O(range) HEADs (path
  construction is per-snapshot by design; the pointer GET must not be).
- UpsertLog append+maintain tick: bursty (carry cascades), amortized
  sub-linear in depth (manifest planning is O(live dirs) = O(log B)).
- read_latest: 1 LIST + O(live dirs) manifest GETs — flat in depth.
"""

from __future__ import annotations

import os

from duckdb_streaming_patterns_spark.operators.merge import UpsertLog
from duckdb_streaming_patterns_spark.plans.commitio import (
    CountingCommitIO,
    ObjectStoreSimIO,
)
from duckdb_streaming_patterns_spark.plans.snapshots import SnapshotTable


def _total(d: dict) -> int:
    return sum(d.values())


def test_snapshot_table_append_and_reads_are_request_flat(spark, tmp_path):
    io = CountingCommitIO(ObjectStoreSimIO())
    t = SnapshotTable(
        spark, str(tmp_path / "snap"), "id long", io=io, checkpoint_every=4
    )
    deltas = []
    for i in range(24):
        before = io.snapshot()
        t.append(spark.createDataFrame([(i,)], "id long"), batch_id=i)
        deltas.append(io.since(before))
    # non-checkpoint appends: O(1) requests, identical early and late
    plain = [d for d in deltas if "put_json_if_absent" not in d]
    assert len(plain) >= 12
    assert all(_total(d) <= 10 for d in plain), plain[-1]
    assert _total(plain[-1]) <= _total(plain[2]) + 2, (plain[2], plain[-1])
    # checkpoint ticks: bounded by checkpoint_every (loose-entry GC +
    # one conditional PUT + the covering re-read), never by table age
    ckpt = [d for d in deltas if "put_json_if_absent" in d]
    assert ckpt, "checkpoint cadence never fired"
    assert all(_total(d) <= 25 for d in ckpt), ckpt[-1]
    assert _total(ckpt[-1]) <= _total(ckpt[0]) + 4, (ckpt[0], ckpt[-1])
    # snapshots() read: 1 LIST + <= checkpoint_every GETs, flat in age
    before = io.snapshot()
    t.snapshots()
    d = io.since(before)
    assert d.get("list_names", 0) == 1 and _total(d) <= 2 + 4, d
    # full-range read: exactly ONE generation-pointer GET for the whole
    # enumeration (the round-12 hoist — this was O(range) before), plus
    # the per-snapshot HEADs path construction is documented to cost
    before = io.snapshot()
    assert t.read().count() == 24
    d = io.since(before)
    assert d.get("try_read_json", 0) <= 3, d
    assert d.get("exists", 0) <= 24 + 2, d


def test_upsert_log_tick_and_serve_request_budget(spark, tmp_path):
    io = CountingCommitIO(ObjectStoreSimIO())
    log = UpsertLog(
        spark, str(tmp_path / "log"), keys=["k"], insert_only=True, io=io
    )
    assert log.deferred_gc is True  # backend-resolved default
    ticks = []
    serve = {}
    for i in range(64):
        before = io.snapshot()
        log.append(spark.createDataFrame([(i,)], "k long"), i)
        log.maintain(before_batch=i + 1, fanout=2)
        ticks.append(_total(io.since(before)))
        if i in (15, 31, 63):
            before = io.snapshot()
            assert log.read_latest().count() == i + 1
            serve[i + 1] = io.since(before)
    # read_latest: 1 LIST + O(live dirs) manifest GETs — FLAT in stream
    # depth (live dirs is tier-bounded at O(fanout·log B))
    assert all(d.get("list_names", 0) == 1 for d in serve.values()), serve
    assert _total(serve[64]) <= _total(serve[16]) + 8, serve
    assert _total(serve[64]) <= 30, serve
    # maintenance ticks are bursty (carry cascades) but amortized
    # sub-linear in depth: doubling the depth must not double the mean
    # request count per tick (O(depth) on the request plane fails this)
    early = sum(ticks[16:32]) / 16
    late = sum(ticks[48:64]) / 16
    assert late <= early * 2.0, (early, late)
    assert max(ticks) <= 400, max(ticks)


def test_asof_probe_request_budget_flat_in_state_depth(spark, tmp_path):
    """The as-of enrichment's per-batch state probe must stay O(live
    dirs) on the request plane regardless of stream depth: one LIST +
    one manifest GET per live dir (read_latest), with the bucket prune
    happening inside the one Spark scan — never a per-bucket or
    per-batch-dir request fan-out."""
    from pyspark.sql import functions as F

    io = CountingCommitIO(ObjectStoreSimIO())
    clicks = UpsertLog(
        spark,
        str(tmp_path / "clicks"),
        keys=["user_id"],
        bucket_col="user_id",
        n_buckets=8,
        io=io,
    )
    import datetime as dt

    def mk(i):
        return spark.createDataFrame(
            [(i % 5, dt.datetime(2024, 1, 1, 0, i))],
            "user_id long, click_ts timestamp",
        )

    deltas = []
    for i in range(24):
        if i > 0 and i % 4 == 0:
            clicks.maintain(before_batch=i)
        clicks.append(mk(i), i)
        before = io.snapshot()
        # the probe a batch with users {0..4} issues
        state = clicks.read_latest(before_batch=i + 1, buckets=[0, 1, 2])
        state.count()
        deltas.append(sum(io.since(before).values()))
    # flat: late probes cost the same request budget as early ones
    # (live dirs bounded by the tiered maintain, not by depth)
    assert deltas[-1] <= max(deltas[:6]) + 6, deltas


def test_consistent_serve_request_budget(spark):
    """Round-13 (verdict item 5): the EXTERNAL serving path's metadata
    request budget on the object-store backend. bm25_consistent_serve
    must cost exactly ONE pointer GET (which doubles as the stats read)
    plus the two state reads' budget — 1 LIST + O(live dirs) manifest
    GETs each — and hybrid_manifest_serve ONE manifest GET + one ledger
    read on top. No per-bucket, per-batch, or per-generation request
    fan-out anywhere in a serve."""
    import pytest

    from duckdb_streaming_patterns_spark.operators import merge as merge_mod
    from duckdb_streaming_patterns_spark.plans import (
        snapshots as snaps_mod,
    )
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )
    from duckdb_streaming_patterns_spark.streaming import patterns, staging

    io = CountingCommitIO(ObjectStoreSimIO())
    mp = pytest.MonkeyPatch()
    mp.setattr(snaps_mod, "POSIX_IO", io)
    mp.setattr(merge_mod, "POSIX_IO", io)
    try:
        run = staging.new_run_dir("budserve")
        chunks = staging.stage_document_chunks(
            spark, "/root/testdata/sf0.001", run, n_chunks=5
        )
        patterns.pattern_streaming_bm25_index(
            spark, chunks, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
            state_partitions=4, compact_every=2,
        )
        tf_log, dl_log = patterns.bm25_reader_logs(spark, run)
        live = (
            len(tf_log._batch_dirs()) + len(dl_log._batch_dirs())
        )  # upper bound on live dirs across both logs
        before = io.snapshot()
        rows = patterns.bm25_consistent_serve(
            spark, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5
        ).collect()
        d = io.since(before)
        assert rows
        # 3 root LISTs (tf + dl read_latest + the O(1) GDPR
        # tombstone-existence probe, round 14) — NOTHING per bucket
        assert d.get("list_names", 0) == 3, d
        # pointer GET + at most one manifest GET per live dir; the
        # pointer carries the stats, so no SummaryTable read appears
        assert d.get("try_read_json", 0) <= 1 + live, (d, live)
        # serving writes nothing
        for verb in ("put_json", "put_json_if_absent", "swap_pointer",
                     "promote_dir", "delete", "delete_tree"):
            assert d.get(verb, 0) == 0, d
    finally:
        mp.undo()


def test_hybrid_manifest_serve_request_budget(spark):
    """The two-index manifest serve's request plane: ONE manifest GET
    pins both retrievers; the lexical side adds its two read_latest
    budgets, the dense side one snapshots() ledger read (1 LIST +
    bounded GETs) plus O(snapshots × probed cells) path-construction
    HEADs — documented per §10.4; no writes, no per-generation GETs."""
    import pytest

    from pyspark.sql import functions as F

    from duckdb_streaming_patterns_spark.operators import merge as merge_mod
    from duckdb_streaming_patterns_spark.plans import (
        snapshots as snaps_mod,
    )
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )
    from duckdb_streaming_patterns_spark.sources.tables import load_table
    from duckdb_streaming_patterns_spark.streaming import patterns, staging

    io = CountingCommitIO(ObjectStoreSimIO())
    mp = pytest.MonkeyPatch()
    mp.setattr(snaps_mod, "POSIX_IO", io)
    mp.setattr(merge_mod, "POSIX_IO", io)
    try:
        sf = "/root/testdata/sf0.001"
        run = staging.new_run_dir("budhyb")
        doc_chunks = staging.stage_document_chunks(
            spark, sf, staging.new_run_dir("budhybd"), n_chunks=6
        )
        emb_chunks = staging.stage_paired_embedding_chunks(
            spark, sf, staging.new_run_dir("budhybe"), n_chunks=6
        )
        queries_df = load_table(spark, sf, "embeddings").filter(
            F.col("vec_id") < 3
        )
        patterns.pattern_streaming_hybrid_manifest(
            spark, doc_chunks, emb_chunks, run, _BM25_QUERIES, queries_df,
            _BM25_SCORE_EXPR, at_version=1, state_partitions=4,
            compact_every=2,
        )
        before = io.snapshot()
        rows = patterns.hybrid_manifest_serve(
            spark, run, _BM25_QUERIES, queries_df, _BM25_SCORE_EXPR
        ).collect()
        d = io.since(before)
        assert rows
        # 2 log-root LISTs + 1 ledger LIST (+1 tolerance for a
        # checkpoint-covered re-list)
        # +1 (round 14): the O(1) GDPR tombstone-existence probe
        assert d.get("list_names", 0) <= 5, d
        # manifest GET + fold-manifest GETs (O(live dirs)) + ledger
        # loose-entry GETs (<= checkpoint_every) — generous flat bound
        assert d.get("try_read_json", 0) <= 40, d
        assert d.get("read_json", 0) <= 4, d
        # path-construction HEADs: O(snapshots x probed cells), never
        # O(corpus)
        assert d.get("exists", 0) <= 200, d
        for verb in ("put_json", "put_json_if_absent", "swap_pointer",
                     "promote_dir", "delete", "delete_tree"):
            assert d.get(verb, 0) == 0, d
    finally:
        mp.undo()


def test_release_read_path_request_budget(spark):
    """The training-run consumer's read path (round 14, verdict item 6):
    resolving a published corpus release costs exactly ONE manifest GET
    on the metadata plane — the data scan reads the manifest-named path
    directly (Spark-side file I/O, zero CommitIO LISTs) and no write
    verb ever fires on a read."""
    from duckdb_streaming_patterns_spark import queries_pipeline as qp
    from duckdb_streaming_patterns_spark.sources.tables import load_table
    from duckdb_streaming_patterns_spark.streaming import staging

    io = CountingCommitIO(ObjectStoreSimIO())
    release_dir = staging.new_run_dir("budrelease")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    man = qp.corpus_release_build(spark, docs, release_dir, io=io, version=0)
    assert man["shards"] and man["mixture"]["thresholds"]
    before = io.snapshot()
    rows = qp.corpus_release_read(spark, release_dir, io=io).collect()
    d = io.since(before)
    assert rows
    assert d.get("read_json", 0) == 1, d  # the manifest GET
    assert d.get("list_names", 0) == 0, d  # zero LISTs — path from manifest
    for verb in ("put_json", "put_json_if_absent", "swap_pointer",
                 "promote_dir", "delete", "delete_tree"):
        assert d.get(verb, 0) == 0, d
    # publish is version-monotone: a stale rebuild cannot regress the head
    qp.corpus_release_build(spark, docs, release_dir, io=io, version=0)
    assert io.inner.read_json(
        qp._release_manifest_path(release_dir)
    )["version"] == 0


def test_release_publish_and_redelivery_request_budget(spark):
    """The streaming-release exactly-once claim on the request plane
    (round 15): one release publish costs O(1) pointer verbs (a
    pre-check GET, a CAS-loop GET, one swap); a REDELIVERED build of an
    already-covered version costs exactly ONE GET and writes NOTHING —
    the pre-check returns before any data or pointer verb fires. The
    forget floor-raise on a covered version costs one extra swap."""
    from duckdb_streaming_patterns_spark.queries import (  # noqa: F401
        QUERIES as _load_registry_chain,  # qp's oracle assembly needs it
    )
    from duckdb_streaming_patterns_spark import queries_pipeline as qp
    from duckdb_streaming_patterns_spark.sources.tables import load_table
    from duckdb_streaming_patterns_spark.streaming import staging

    io = CountingCommitIO(ObjectStoreSimIO())
    release_dir = staging.new_run_dir("budrelpub")
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    before = io.snapshot()
    qp.corpus_release_build(spark, docs, release_dir, io=io, version=0)
    d = io.since(before)
    # pointer plane: pre-check GET + CAS-loop GET + one swap; the data
    # write is Spark-side (not a CommitIO verb) by design
    assert d.get("try_read_json", 0) <= 2, d
    assert d.get("swap_pointer", 0) == 1, d
    assert d.get("delete_tree", 0) == 0, d
    # redelivery of the covered version: ONE GET, zero writes, zero
    # data-dir touches — the exactly-once release on at-least-once
    # batch delivery
    before = io.snapshot()
    qp.corpus_release_build(spark, docs, release_dir, io=io, version=0)
    d = io.since(before)
    assert d == {"try_read_json": 1}, d
    # covered forget with an unraised floor: the floor-raise path adds
    # exactly one swap (version 1 so there IS a sub-floor version to
    # truncate; a covered forget at version 0 is a pure-GET no-op —
    # floor 0 already covers it)
    qp.corpus_release_build(spark, docs, release_dir, io=io, version=1)
    before = io.snapshot()
    qp.corpus_release_build(
        spark, docs, release_dir, io=io, version=1, forget=True
    )
    d = io.since(before)
    assert d.get("swap_pointer", 0) == 1, d
    assert d.get("put_json", 0) == 0 and d.get("promote_dir", 0) == 0, d
    assert int(io.inner.read_json(
        qp._release_manifest_path(release_dir)
    )["floor"]) == 1
