"""Pattern-level end-to-end tests (SURVEY §5.2): each streaming pattern's
final summary must equal the one-shot batch aggregation (incremental ≡ batch),
plus unit tests for the merge/fencing/ledger machinery (§5.3)."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.operators.merge import SummaryTable, additive_merge
from duckdb_streaming_patterns_spark.operators.summary import user_clicks
from duckdb_streaming_patterns_spark.plans.snapshots import SnapshotTable
from duckdb_streaming_patterns_spark.sources.tables import load_table
from duckdb_streaming_patterns_spark.streaming import patterns, staging


def _batch_oracle(spark, sf_dir):
    return {
        (r["user_id"], r["count_of_clicks"], r["updated_at"])
        for r in user_clicks(load_table(spark, sf_dir, "events")).collect()
    }


def _as_set(df):
    return {tuple(r) for r in df.select("user_id", "count_of_clicks", "updated_at").collect()}


def test_pattern_1_1_incremental_equals_batch(spark, sf_small):
    run = staging.new_run_dir("t_p11")
    chunks = staging.stage_event_chunks(spark, sf_small, run, n_chunks=4)
    result = patterns.pattern_1_1(spark, chunks, run)
    assert _as_set(result) == _batch_oracle(spark, sf_small)


def test_pattern_1_2_cdf_equals_batch(spark, sf_small):
    run = staging.new_run_dir("t_p12")
    chunks = staging.stage_event_chunks(spark, sf_small, run, n_chunks=4)
    result = patterns.pattern_1_2(spark, chunks, run, aggregate_every=2)
    assert _as_set(result) == _batch_oracle(spark, sf_small)


def test_pattern_2_complete_equals_batch(spark, sf_small):
    run = staging.new_run_dir("t_p2")
    chunks = staging.stage_json_chunks(spark, sf_small, run, n_chunks=4)
    result = patterns.pattern_2(spark, chunks, run)
    assert _as_set(result) == _batch_oracle(spark, sf_small)


def test_bonus_topk_matches_batch(spark, sf_small):
    run = staging.new_run_dir("t_bonus")
    chunks = staging.stage_json_chunks(spark, sf_small, run, n_chunks=3)
    got = patterns.bonus_stateless_views(spark, chunks, k=5).collect()
    oracle = (
        user_clicks(load_table(spark, sf_small, "events"))
        .orderBy(F.col("count_of_clicks").desc(), "user_id")
        .limit(5)
        .collect()
    )
    assert [(r["user_id"], r["count_of_clicks"]) for r in got] == [
        (r["user_id"], r["count_of_clicks"]) for r in oracle
    ]


# ---------------------------------------------------------------------------
# Unit: merge semantics + fencing (reference pattern_1_1.py:97-116 semantics)
# ---------------------------------------------------------------------------


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def test_additive_merge_matched_and_unmatched(spark):
    dest = spark.createDataFrame(
        [(1, 5, _ts("2024-01-01T00:00:00"))],
        "user_id long, count_of_clicks long, updated_at timestamp_ntz",
    )
    src = spark.createDataFrame(
        [
            (1, 2, _ts("2024-01-02T00:00:00")),  # matched → add / greatest
            (2, 7, _ts("2024-01-03T00:00:00")),  # unmatched → insert
        ],
        "user_id long, count_of_clicks long, updated_at timestamp_ntz",
    )
    out = {
        r["user_id"]: (r["count_of_clicks"], r["updated_at"])
        for r in additive_merge(
            dest, src, ["user_id"], ["count_of_clicks"], ["updated_at"]
        ).collect()
    }
    assert out[1] == (7, _ts("2024-01-02T00:00:00"))
    assert out[2] == (7, _ts("2024-01-03T00:00:00"))


def test_summary_table_batch_fencing(spark, tmp_path):
    st = SummaryTable(
        spark, str(tmp_path / "s"), "user_id long, count_of_clicks long, updated_at timestamp_ntz"
    )
    delta = spark.createDataFrame(
        [(1, 3, _ts("2024-01-01T00:00:00"))],
        "user_id long, count_of_clicks long, updated_at timestamp_ntz",
    )
    assert st.merge_batch(delta, 0, ["user_id"], ["count_of_clicks"], ["updated_at"])
    # retry of the same epoch must be a no-op (exactly-once)
    assert not st.merge_batch(delta, 0, ["user_id"], ["count_of_clicks"], ["updated_at"])
    rows = st.read().collect()
    assert len(rows) == 1 and rows[0]["count_of_clicks"] == 3


def test_snapshot_table_changes_and_compaction(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "snap"), "id long, v string")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    s1 = t.append(df1, batch_id=0)
    s2 = t.append(df2, batch_id=1)
    assert (s1, s2) == (0, 1)
    # fenced duplicate append
    assert t.append(df2, batch_id=1) == -1
    assert t.table_changes(-1, 0).count() == 2
    assert {r["id"] for r in t.table_changes(0, 1).collect()} == {3}
    assert t.table_changes(1, 1).count() == 0
    before = {tuple(r) for r in t.read().drop("snapshot_id").collect()}
    t.compact()
    after = {tuple(r) for r in t.read().drop("snapshot_id").collect()}
    assert before == after
    assert t.max_snapshot_id() == 1


def test_windowed_watermark_equals_batch_hourly(spark, sf_small):
    run = staging.new_run_dir("t_pww")
    chunks = staging.stage_event_chunks(
        spark, sf_small, run, n_chunks=4, order_col="ts"
    )
    result = patterns.pattern_windowed_watermark(spark, chunks, run)
    got = {
        (r["window_start"], r["count_of_clicks"], r["updated_at"])
        for r in result.collect()
    }
    ev = load_table(spark, sf_small, "events")
    want = {
        (r["window_start"], r["count_of_clicks"], r["updated_at"])
        for r in ev.filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(
            F.count("*").alias("count_of_clicks"),
            F.max("ts").alias("updated_at"),
        )
        .collect()
    }
    assert got == want


def test_streaming_dedup_removes_staged_copies(spark, sf_small):
    run = staging.new_run_dir("t_psd")
    chunks = staging.stage_event_chunks(
        spark, sf_small, run, n_chunks=4, order_col="ts", dup_factor=2
    )
    # staged stream really carries 2 copies of every event
    staged_rows = spark.read.option("recursiveFileLookup", "true").parquet(chunks)
    ev_rows = load_table(spark, sf_small, "events").count()
    assert staged_rows.count() == 2 * ev_rows
    result = patterns.pattern_streaming_dedup(spark, chunks, run)
    assert _as_set(result) == _batch_oracle(spark, sf_small)


def test_windowed_watermark_drops_late_rows_when_replay_is_unordered(
    spark, sf_small
):
    """SURVEY §2.9 T5: the reference silently never counts rows that arrive
    behind its high-watermark. Spark makes the same trade *explicit*: with
    an arrival-unordered replay and a tight watermark, late rows are
    dropped by the windowed aggregation — observably fewer clicks than the
    batch total — while the event-time-ordered replay (previous test)
    matches batch exactly."""
    run = staging.new_run_dir("t_late")
    # chunk by `value` (uncorrelated with ts — event_id would NOT do, the
    # fixture generates it in timestamp order): each chunk spans the full
    # time range, so after micro-batch 1 the watermark sits near the global
    # max event time and most later rows are late
    chunks = staging.stage_event_chunks(
        spark, sf_small, run, n_chunks=4, order_col="value"
    )
    result = patterns.pattern_windowed_watermark(
        spark, chunks, run, delay="0 seconds"
    )
    got_clicks = result.agg(F.sum("count_of_clicks")).first()[0] or 0
    total_clicks = (
        load_table(spark, sf_small, "events")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert 0 < got_clicks < total_clicks


def test_sessionization_order_sensitivity_at_scale(spark):
    """Regression for the micro-batch ordering bug: at sf0.1 (5× more
    chunks-worth of data than the oracle gate's sf0.01) an out-of-order
    replay diverged from batch by ~1.5% while sf0.01 passed by luck.
    Run the full streaming sessionization at sf0.1 and require exact
    per-session equality with the batch lag+cumsum computation."""
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_BENCH", "/root/testdata/sf0.1")
    run = staging.new_run_dir("t_pss_sf01")
    chunks = staging.stage_event_chunks(spark, sf, run, n_chunks=5, order_col="ts")
    got = {
        (r["user_id"], r["session_seq"], r["n_events"])
        for r in patterns.pattern_streaming_sessionization(
            spark, chunks, run
        ).collect()
    }
    gap_us = 30 * 60 * 1_000_000
    from pyspark.sql import Window as W

    ev = load_table(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select("user_id", "ts", "event_id", us.alias("us")).withColumn(
        "is_new",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    want = {
        (r["user_id"], r["session_seq"], r["n_events"])
        for r in numbered.groupBy("user_id", "session_seq")
        .agg(F.count("*").alias("n_events"))
        .collect()
    }
    assert got == want


def test_stream_stream_join_buffers_across_batches(spark, sf_oracle):
    """The interval join's oracle equality only proves buffering if pairs
    actually SPAN micro-batches — pin that the fixture/window combination
    produces cross-chunk pairs, so a future window shrink can't quietly
    turn this into a within-batch-only test."""
    from pyspark.sql import functions as F

    from duckdb_streaming_patterns_spark.sources.tables import load_table

    ev = load_table(spark, sf_oracle, "events")
    bounds = (
        ev.withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
        .approxQuantile("us", [0.2, 0.4, 0.6, 0.8], 0.001)
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("c_ts")
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vu"), F.col("ts").alias("v_ts")
    )
    pairs = clicks.join(
        views,
        (F.col("cu") == F.col("vu"))
        & F.col("v_ts").between(
            F.col("c_ts") - F.expr("INTERVAL 1 DAY"), F.col("c_ts")
        ),
    ).select(
        F.unix_micros(F.col("c_ts").cast("timestamp")).alias("c_us"),
        F.unix_micros(F.col("v_ts").cast("timestamp")).alias("v_us"),
    )
    crossing = pairs.filter(
        # some staged chunk boundary falls strictly between view and click
        F.exists(
            F.array(*[F.lit(int(b)) for b in bounds]),
            lambda b: (b > F.col("v_us")) & (b <= F.col("c_us")),
        )
    ).count()
    assert crossing > 0


def test_snapshot_time_travel(spark, tmp_path):
    """read_as_of(k) reconstructs the table at snapshot k exactly, and its
    scan prunes to the asked snapshots' partitions."""
    t = SnapshotTable(spark, str(tmp_path / "tt"), "id long, v string")
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"), batch_id=0)
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"), batch_id=1)
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"), batch_id=2)
    assert {r["id"] for r in t.read_as_of(0).collect()} == {1}
    assert {r["id"] for r in t.read_as_of(1).collect()} == {1, 2}
    assert {r["id"] for r in t.read_as_of(2).collect()} == {1, 2, 3}
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        t.read_as_of(1).explain("formatted")
    assert "snapshot_id" in buf.getvalue().split("PartitionFilters")[1].splitlines()[0]


def test_snapshot_append_retry_clobbers_orphan(spark, tmp_path):
    """Failure-path exactly-once: if a prior append landed data but crashed
    before the ledger commit, the foreachBatch retry (same snapshot id) must
    CLOBBER the orphan, not append a second copy beside it."""
    t = SnapshotTable(spark, str(tmp_path / "snap"), "id long, v string")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    assert t.append(df1, batch_id=0) == 0
    df2 = spark.createDataFrame([(3, "c")], "id long, v string")
    # simulate the crash: snapshot-1 data directory exists, no ledger entry
    orphan = os.path.join(t.data_dir, "snapshot_id=1")
    df2.write.mode("overwrite").parquet(orphan)
    assert t.read().count() == 2  # ledger-scoped reader never sees the orphan
    assert t.append(df2, batch_id=1) == 1  # the retry
    assert t.read().count() == 3  # NOT 4: the orphan was clobbered
    assert t.table_changes(0, 1).count() == 1


def test_snapshot_compact_drops_orphans_and_defers_gc(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "snap"), "id long, v string")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), batch_id=0)
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"), batch_id=1)
    gen0 = t.data_dir
    # orphaned, uncommitted partition from a crashed append
    spark.createDataFrame([(99, "zz")], "id long, v string").write.mode(
        "overwrite"
    ).parquet(os.path.join(gen0, "snapshot_id=2"))
    t.compact()
    gen1 = t.data_dir
    assert gen1 != gen0
    # deferred GC: a reader that resolved gen0 just before the swap still
    # has a live directory
    assert os.path.exists(gen0)
    # the orphan is NOT materialized into the compacted generation
    assert not os.path.exists(os.path.join(gen1, "snapshot_id=2"))
    assert {r["id"] for r in t.read().collect()} == {1, 2, 3}
    # appends continue into the new generation; the next compact GCs gen0
    assert t.append(spark.createDataFrame([(4, "d")], "id long, v string"), batch_id=2) == 2
    t.compact()
    assert not os.path.exists(gen0)
    assert {r["id"] for r in t.read().collect()} == {1, 2, 3, 4}


def test_summary_overwrite_defers_gc_one_version(spark, tmp_path):
    import json

    root = str(tmp_path / "s")
    st = SummaryTable(spark, root, "user_id long, n long")
    for i in range(3):
        st.overwrite(
            spark.createDataFrame([(1, i)], "user_id long, n long"), batch_id=i
        )
        with open(os.path.join(root, "_meta.json")) as f:
            meta = json.load(f)
        if meta["prev_data"]:
            # version N-1 survives the swap for in-flight readers of it
            assert os.path.exists(os.path.join(root, meta["prev_data"]))
    assert st.read().collect()[0]["n"] == 2
    # exactly current + previous versions remain on disk
    data_dirs = [d for d in os.listdir(root) if d.startswith("data_v")]
    assert len(data_dirs) == 2


def test_pattern_2_insert_overwrite_equals_batch(spark, sf_small):
    run = staging.new_run_dir("t_p2io")
    chunks = staging.stage_json_chunks(spark, sf_small, run, n_chunks=4)
    result = patterns.pattern_2_insert_overwrite(spark, chunks, run)
    assert _as_set(result) == _batch_oracle(spark, sf_small)


def test_kafka_decode_matches_staged_json(spark, sf_small):
    """The Kafka source itself needs a broker, but its decode chain
    (binary value → string → from_json → flatten → to_timestamp,
    reference pattern_2.py:46-51) is pure DataFrame code — drive it on a
    synthetic `value: binary` frame in the producer wire format and check
    it equals the staged-JSON read of the same events."""
    from duckdb_streaming_patterns_spark.streaming import kafka

    ev = load_table(spark, sf_small, "events").limit(200)
    wire = ev.select(
        F.to_json(
            F.struct(
                F.date_format("ts", staging.TS_FMT).alias("timestamp"),
                F.col("user_id").cast("string").alias("user_id"),
                F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias(
                    "user_name"
                ),
                F.col("event_type"),
            )
        )
        .cast("binary")
        .alias("value")
    )
    decoded = kafka._decode(wire)
    assert decoded.columns == ["user_id", "user_name", "event_type", "ts"]
    got = {tuple(r) for r in decoded.collect()}
    want = {
        tuple(r)
        for r in ev.select(
            F.col("user_id").cast("string"),
            F.concat(F.lit("user_"), F.col("user_id").cast("string")),
            "event_type",
            "ts",
        ).collect()
    }
    assert got == want


def test_kafka_encode_decode_roundtrip(spark, sf_small):
    """Producer encode → consumer decode round-trip, broker-free: the wire
    frame kafka._encode emits must decode (kafka._decode) back to the
    original events projection, closing the W7 producer path."""
    from duckdb_streaming_patterns_spark.streaming import kafka

    ev = load_table(spark, sf_small, "events").limit(100)
    wire_src = ev.select(
        F.date_format("ts", staging.TS_FMT).alias("timestamp"),
        F.col("user_id").cast("string").alias("user_id"),
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias(
            "user_name"
        ),
        F.col("event_type"),
    )
    encoded = kafka._encode(wire_src, key_col="user_id")
    assert dict(encoded.dtypes) == {"key": "binary", "value": "binary"}
    decoded = kafka._decode(encoded)
    got = {tuple(r) for r in decoded.collect()}
    want = {
        tuple(r)
        for r in ev.select(
            F.col("user_id").cast("string"),
            F.concat(F.lit("user_"), F.col("user_id").cast("string")),
            "event_type",
            "ts",
        ).collect()
    }
    assert got == want


def test_pattern_1_1_resumes_from_checkpoint(spark, sf_small, tmp_path):
    """Checkpoint recovery: run the pipeline over a prefix of the stream,
    then reveal the remaining chunks and run AGAIN with the same
    checkpoint + summary — the second run must process only the new
    offsets (the fence would reject re-applied batches anyway) and land on
    the exact batch answer. This is the restart-after-crash story."""
    import shutil

    run = staging.new_run_dir("t_resume")
    chunks = staging.stage_event_chunks(spark, sf_small, run, n_chunks=4)
    grow_dir = os.path.join(run, "growing")
    os.makedirs(grow_dir, exist_ok=True)
    all_chunks = sorted(
        d for d in os.listdir(chunks) if d.startswith("__chunk=")
    )
    for d in all_chunks[:2]:
        shutil.copytree(os.path.join(chunks, d), os.path.join(grow_dir, d))
    partial = patterns.pattern_1_1(spark, grow_dir, run)
    batch_ids_after_first = partial.count()
    assert batch_ids_after_first > 0
    # reveal the rest of the stream, resume from the same checkpoint
    for d in all_chunks[2:]:
        shutil.copytree(os.path.join(chunks, d), os.path.join(grow_dir, d))
    final = patterns.pattern_1_1(spark, grow_dir, run)
    assert _as_set(final) == _batch_oracle(spark, sf_small)


def test_upsert_log_compaction_preserves_state(spark, tmp_path):
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    log = UpsertLog(spark, str(tmp_path / "log"), keys=["k"])
    log.append(spark.createDataFrame([(1, "a0"), (2, "b0")], "k long, v string"), 0)
    log.append(spark.createDataFrame([(1, "a1")], "k long, v string"), 1)
    log.append(spark.createDataFrame([(3, "c2")], "k long, v string"), 2)
    before = {tuple(r) for r in log.read_latest().collect()}
    assert before == {(1, "a1"), (2, "b0"), (3, "c2")}
    log.compact()
    dirs = [d for d in os.listdir(str(tmp_path / "log")) if d.startswith("__batch_id=")]
    # base gets a fresh NEGATIVE id so no engine-delivered epoch (>= 0) can
    # ever overwrite it
    assert dirs == ["__batch_id=-1"]
    assert {tuple(r) for r in log.read_latest().collect()} == before
    # later batches still win after compaction
    log.append(spark.createDataFrame([(2, "b3")], "k long, v string"), 3)
    assert {tuple(r) for r in log.read_latest().collect()} == {
        (1, "a1"), (2, "b3"), (3, "c2")
    }


def test_upsert_log_compact_survives_retry_of_last_batch(spark, tmp_path):
    """The checkpoint-uncommitted newest batch can be re-delivered AFTER an
    offline compaction; its overwrite of its own directory must not clobber
    the folded base (the reason the base id is negative, never max_id)."""
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    log = UpsertLog(spark, str(tmp_path / "log"), keys=["k"])
    log.append(spark.createDataFrame([(1, "a0"), (2, "b0")], "k long, v string"), 0)
    log.append(spark.createDataFrame([(1, "a1")], "k long, v string"), 1)
    log.compact()
    # foreachBatch retry of epoch 1 (the newest, assumed uncommitted)
    log.append(spark.createDataFrame([(1, "a1")], "k long, v string"), 1)
    assert {tuple(r) for r in log.read_latest().collect()} == {
        (1, "a1"), (2, "b0")  # key 2 must survive the retry
    }


def test_upsert_log_compact_crash_window_is_consistent(spark, tmp_path):
    """Mid-compact crash simulation: once the negative-id base COMMITS —
    which since the fold-manifest contract means base data + its
    ``_folds.json`` land together (compact writes both into the temp, so
    they become visible atomically) — any surviving subset of the old
    batch dirs resolves to the same state (the manifest marks them dead).
    A base dir WITHOUT its manifest is the round-11 opposite case: an
    in-flight/aborted copy-based promote, which readers treat as
    invisible (the sources are all still live), so both halves of the
    crash window resolve to exactly ``want``."""
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    log = UpsertLog(spark, str(tmp_path / "log"), keys=["k"])
    log.append(spark.createDataFrame([(1, "a0"), (2, "b0")], "k long, v string"), 0)
    log.append(spark.createDataFrame([(1, "a1")], "k long, v string"), 1)
    want = {tuple(r) for r in log.read_latest().collect()}
    base = os.path.join(str(tmp_path / "log"), "__batch_id=-1")
    src_dirs = [
        os.path.join(str(tmp_path / "log"), f"__batch_id={b}") for b in (0, 1)
    ]
    # pre-commit half: base data written but manifest not yet visible
    # (crash mid-promote on a copy-based backend) — the base is ignored,
    # the sources resolve
    log.read_latest().write.mode("overwrite").parquet(base)
    assert {tuple(r) for r in log.read_latest().collect()} == want
    # commit point: the manifest lands (as compact's atomic temp+rename
    # makes it, together with the data) — sources now logically dead
    log._write_manifest(base, src_dirs)
    assert {tuple(r) for r in log.read_latest().collect()} == want
    # ...and after the GC deleted only ONE old dir
    import shutil

    shutil.rmtree(os.path.join(str(tmp_path / "log"), "__batch_id=0"))
    assert {tuple(r) for r in log.read_latest().collect()} == want


def test_upsert_log_maintain_is_tiered_carry_counter(spark, tmp_path):
    """maintain() is the F-ary carry counter the docstring claims: with
    fanout 4 and 64 single-row appends (maintain after each), tier-0
    merges fire every 4 appends (16), tier-1 every 16 (4), tier-2 once —
    21 merges total, each row rewritten once per tier it climbs (3× for
    64 batches) instead of compact()'s full-log rewrite per cadence
    tick. Dir count stays bounded by (F-1)·levels + in-flight, and the
    resolved read is byte-identical to an unmaintained log."""
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    log = UpsertLog(
        spark, str(tmp_path / "log"), keys=["k"], insert_only=True
    )
    merges = 0
    max_dirs = 0
    for i in range(64):
        log.append(
            spark.createDataFrame([(i, f"v{i}")], "k long, v string"), i
        )
        merges += log.maintain(before_batch=i + 1, fanout=4)
        n = len(
            [
                d
                for d in os.listdir(log.root)
                if d.startswith("__batch_id=")
            ]
        )
        max_dirs = max(max_dirs, n)
    assert merges == 21, merges  # 16 tier-0 + 4 tier-1 + 1 tier-2
    assert max_dirs <= 10, max_dirs  # (F-1)·3 levels + the fresh append
    got = {tuple(r) for r in log.read_latest().collect()}
    assert got == {(i, f"v{i}") for i in range(64)}
    # the top-tier dir records the full weight — the metadata that stops
    # a later small merge from rewriting the big dir
    import glob as _glob
    import json as _json

    weights = []
    for mf in _glob.glob(os.path.join(log.root, "__batch_id=*", "_folds.json")):
        with open(mf) as f:
            m = _json.load(f)
        weights.append(m["weight"])
        # clean GCs prune the death lists to empty — they must not grow
        # with stream age
        assert m["folded"] == [], m
    assert max(weights) == 64


def test_maintain_all_is_equivalent_to_sequential_maintains(spark, tmp_path):
    """maintain_all() runs the logs' merge chains on concurrent threads;
    each log must end in exactly the state sequential maintain() gives
    it — same merge counts, same resolved reads, same bounded dir count
    — for a mixed fleet (insert-only, LWW, bucketed insert-only) like a
    real maintenance tick touches. None entries are skipped (the
    semdedup retrain-tick shape)."""
    from duckdb_streaming_patterns_spark.operators.merge import (
        UpsertLog,
        maintain_all,
    )

    def build(sub: str, **kw) -> UpsertLog:
        return UpsertLog(spark, str(tmp_path / sub), keys=["k"], **kw)

    con_logs = [
        build("c_io", insert_only=True),
        build("c_lww"),
        build("c_kb", insert_only=True, bucket_col="k", n_buckets=4),
    ]
    seq_logs = [
        build("s_io", insert_only=True),
        build("s_lww"),
        build("s_kb", insert_only=True, bucket_col="k", n_buckets=4),
    ]
    for i in range(8):
        df = spark.createDataFrame(
            [(i % 5, f"v{i}")], "k long, v string"
        )  # LWW log sees key collisions; insert-only logs use (i, ...)
        io_df = spark.createDataFrame([(i, f"v{i}")], "k long, v string")
        for logs in (con_logs, seq_logs):
            logs[0].append(io_df, i)
            logs[1].append(df, i)
            logs[2].append(io_df, i)
        con = maintain_all(
            [None, *con_logs], before_batch=i + 1, fanout=2
        )
        seq = sum(
            l.maintain(before_batch=i + 1, fanout=2) for l in seq_logs
        )
        assert con == seq, (i, con, seq)
    for c, s in zip(con_logs, seq_logs):
        got = {tuple(r) for r in c.read_latest().collect()}
        want = {tuple(r) for r in s.read_latest().collect()}
        assert got == want
        n_c = len(
            [d for d in os.listdir(c.root) if d.startswith("__batch_id=")]
        )
        n_s = len(
            [d for d in os.listdir(s.root) if d.startswith("__batch_id=")]
        )
        assert n_c == n_s


def test_overlap_preserves_order_and_propagates_errors(spark):
    """overlap()'s contract: results come back in ARGUMENT order (not
    completion order — the first thunk here finishes last), and any
    thunk's exception reaches the caller so a micro-batch fails exactly
    like the sequential form would."""
    import time as _time

    import pytest

    from duckdb_streaming_patterns_spark.operators.merge import overlap

    def slow_first():
        _time.sleep(0.3)
        return "first"

    assert overlap(slow_first, lambda: "second", lambda: "third") == [
        "first",
        "second",
        "third",
    ]

    def boom():
        raise RuntimeError("batch tier failed")

    with pytest.raises(RuntimeError, match="batch tier failed"):
        overlap(slow_first, boom)
    # single-thunk fast path runs inline
    assert overlap(lambda: 7) == [7]


def test_append_all_is_equivalent_to_sequential_appends(spark, tmp_path):
    """append_all() writes each (log, df) pair from its own thread; the
    resolved reads must equal sequential appends', and a re-delivered
    batch (the foreachBatch retry shape) must stay idempotent."""
    from duckdb_streaming_patterns_spark.operators.merge import (
        UpsertLog,
        append_all,
    )

    con = [
        UpsertLog(spark, str(tmp_path / "ca"), keys=["k"], insert_only=True),
        UpsertLog(spark, str(tmp_path / "cb"), keys=["k"]),
    ]
    seq = [
        UpsertLog(spark, str(tmp_path / "sa"), keys=["k"], insert_only=True),
        UpsertLog(spark, str(tmp_path / "sb"), keys=["k"]),
    ]
    for i in range(3):
        a = spark.createDataFrame([(i, f"a{i}")], "k long, v string")
        b = spark.createDataFrame([(i % 2, f"b{i}")], "k long, v string")
        append_all([(con[0], a), (con[1], b)], i)
        if i == 1:  # retry re-delivery: overwrite the same batch dirs
            append_all([(con[0], a), (con[1], b)], i)
        seq[0].append(a, i)
        seq[1].append(b, i)
    for c, s in zip(con, seq):
        got = {tuple(r) for r in c.read_latest().collect()}
        want = {tuple(r) for r in s.read_latest().collect()}
        assert got == want


def test_upsert_log_maintain_survives_gc_crash(spark, tmp_path):
    """Crash window: a merge commits (rename) but its GC dies leaving a
    source dir on disk. The manifest covers it (no duplicate rows), and
    the next maintain() sweeps it and prunes the death list."""
    from duckdb_streaming_patterns_spark.operators import merge as merge_mod
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    # deferred_gc pinned OFF: this test is specifically about the
    # in-place fold-GC crash window (the objstore wrapper re-runs it;
    # the backend-resolved default there would park sources instead)
    log = UpsertLog(
        spark, str(tmp_path / "log"), keys=["k"], insert_only=True,
        deferred_gc=False,
    )
    for i in range(4):
        log.append(
            spark.createDataFrame([(i, f"v{i}")], "k long, v string"), i
        )
    want = {tuple(r) for r in log.read_latest().collect()}
    real_rmtree = merge_mod.shutil.rmtree
    spared = os.path.join(log.root, "__batch_id=2")

    def crashy_rmtree(path, **kw):
        if os.path.abspath(path) == os.path.abspath(spared):
            return  # "crash": this source dir survives the GC
        real_rmtree(path, **kw)

    merge_mod.shutil.rmtree = crashy_rmtree
    try:
        assert log.maintain(fanout=4) == 1
    finally:
        merge_mod.shutil.rmtree = real_rmtree
    assert os.path.exists(spared)
    # manifest keeps the leftover dead — read has no duplicates (count
    # first: duplicated rows are invisible to a set-compare)
    got = log.read_latest()
    assert got.count() == len(want)
    assert {tuple(r) for r in got.collect()} == want
    # next call sweeps the debris (no new merge needed)
    log.maintain(fanout=4)
    assert not os.path.exists(spared)
    got = log.read_latest()
    assert got.count() == len(want)
    assert {tuple(r) for r in got.collect()} == want


def test_upsert_log_maintain_every_gc_crash_point(spark, tmp_path):
    """Exhaustive crash sweep: a merge's GC can die after deleting 0, 1,
    2, or 3 of its 4 source dirs. At EVERY point the committed manifest
    keeps surviving sources logically dead (reads identical, no
    duplicates), and a subsequent maintain() sweeps the debris without
    re-merging."""
    import shutil as _shutil

    from duckdb_streaming_patterns_spark.operators import merge as merge_mod
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    for crash_after in range(4):
        root = str(tmp_path / f"log{crash_after}")
        # in-place GC path pinned (see gc-crash test above)
        log = UpsertLog(
            spark, root, keys=["k"], insert_only=True, deferred_gc=False
        )
        for i in range(4):
            log.append(
                spark.createDataFrame(
                    [(crash_after * 10 + i, f"v{i}")], "k long, v string"
                ),
                i,
            )
        want = {tuple(r) for r in log.read_latest().collect()}
        deleted = [0]
        real_rmtree = merge_mod.shutil.rmtree

        def make_crashy(_n, _cap, _rm):
            def crashy(path, **kw):
                if os.path.basename(path).startswith("__batch_id="):
                    if _n[0] >= _cap:
                        return  # GC "crashes" here
                    _n[0] += 1
                _rm(path, **kw)

            return crashy

        crashy = make_crashy(deleted, crash_after, real_rmtree)

        merge_mod.shutil.rmtree = crashy
        try:
            assert log.maintain(fanout=4) == 1
        finally:
            merge_mod.shutil.rmtree = real_rmtree
        survivors = [
            d
            for d in os.listdir(root)
            if d.startswith("__batch_id=") and not d.startswith("__batch_id=-")
        ]
        assert len(survivors) == 4 - crash_after, (crash_after, survivors)
        got = log.read_latest()
        assert got.count() == len(want), crash_after  # dup rows double this
        assert {tuple(r) for r in got.collect()} == want
        assert log.maintain(fanout=4) == 0  # sweep only, no re-merge
        assert not any(
            d.startswith("__batch_id=")
            and not d.startswith("__batch_id=-")
            for d in os.listdir(root)
        )
        got = log.read_latest()
        assert got.count() == len(want)
        assert {tuple(r) for r in got.collect()} == want


def test_upsert_log_maintain_rejects_bad_fanout(spark, tmp_path):
    """fanout <= 1 would make the tier loop (1**n <= w) spin forever —
    maintain() must reject it up front, for both log flavors."""
    import pytest

    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    for kw in ({"insert_only": True}, {}):
        log = UpsertLog(spark, str(tmp_path / f"log{len(kw)}"), keys=["k"], **kw)
        with pytest.raises(ValueError):
            log.maintain(fanout=1)
        with pytest.raises(ValueError):
            log.maintain(fanout=0)


def test_upsert_log_lww_maintain_preserves_last_writer_wins(spark, tmp_path):
    """Adjacent-range tiered maintenance for LAST-WRITER-WINS logs
    (round-6 verdict item 2): keys re-emit across batches; merges are
    restricted to contiguous batch-id spans, resolve LWW within the span
    at merge time, and the read side ranks merged dirs at their span top
    — so a maintained log resolves byte-identically to an unmaintained
    twin, while the live dir count stays tier-bounded."""
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    root = str(tmp_path / "lww")
    log = UpsertLog(spark, root, keys=["k"])
    twin = UpsertLog(spark, str(tmp_path / "twin"), keys=["k"])
    # key k is touched on every batch where k % 3 == i % 3 → constant
    # re-emission, the session-extension shape
    for i in range(16):
        rows = [(k, f"v{k}@{i}") for k in range(9) if k % 3 == i % 3]
        df = spark.createDataFrame(rows, "k long, v string")
        if i > 0 and i % 2 == 0:
            log.maintain(before_batch=i, fanout=2)
        log.append(df, i)
        twin.append(df, i)
    got = log.read_latest()
    want = {tuple(r) for r in twin.read_latest().collect()}
    assert got.count() == len(want) == 9
    assert {tuple(r) for r in got.collect()} == want
    # every key resolved to its LAST write
    by_key = {r["k"]: r["v"] for r in got.collect()}
    for k in range(9):
        last = max(i for i in range(16) if k % 3 == i % 3)
        assert by_key[k] == f"v{k}@{last}", (k, by_key[k])
    # merged dirs carry contiguous, disjoint ranges
    import glob as _glob
    import json as _json

    ranges = []
    for mf in _glob.glob(os.path.join(root, "__batch_id=*", "_folds.json")):
        with open(mf) as f:
            m = _json.load(f)
        assert "range" in m, m
        ranges.append(tuple(m["range"]))
    assert ranges, "no tiered merge fired"
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, ranges  # disjoint spans
    # dir count bounded (fanout 2, 16 batches → ~(F-1)·log2(16)+slack)
    n_dirs = len([d for d in os.listdir(root) if d.startswith("__batch_id=")])
    assert n_dirs <= 8, n_dirs


def test_upsert_log_lww_maintain_skips_non_adjacent_tiers(spark, tmp_path):
    """A same-tier pair separated by a heavier dir must NOT merge: a
    merged [0, 2] span with live dir 1 in the middle would mis-rank
    batch 1's writes below batch 2's span top. maintain() prefers order
    preservation over merge eagerness and reports zero merges."""
    import glob as _glob
    import json as _json

    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    root = str(tmp_path / "gap")
    log = UpsertLog(spark, root, keys=["k"])
    log.append(spark.createDataFrame([(1, "a0")], "k long, v string"), 0)
    # fake a weight-4 merged dir at id 1 by writing its manifest: tier 2
    # under fanout 2, so tier 0 = {0, 2} with a tier-2 dir between them
    log.append(spark.createDataFrame([(1, "a1"), (2, "b1")], "k long, v string"), 1)
    mf = os.path.join(root, "__batch_id=1", "_folds.json")
    with open(mf, "w") as f:
        _json.dump({"folded": [], "weight": 4, "range": [1, 1]}, f)
    log.append(spark.createDataFrame([(2, "b2")], "k long, v string"), 2)
    assert log.maintain(fanout=2) == 0
    assert len(_glob.glob(os.path.join(root, "__batch_id=*"))) == 3
    got = {tuple(r) for r in log.read_latest().collect()}
    assert got == {(1, "a1"), (2, "b2")}


def test_upsert_log_lww_maintain_survives_gc_crash(spark, tmp_path):
    """LWW twin of the insert-only GC-crash test: the merge commits but
    its GC dies leaving a source dir on disk. The manifest keeps the
    survivor logically dead — the resolved read returns the same ROW
    COUNT (duplicate rows would double it) and values; the next call
    sweeps the debris."""
    from duckdb_streaming_patterns_spark.operators import merge as merge_mod
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    # in-place GC path pinned (see gc-crash test above)
    log = UpsertLog(
        spark, str(tmp_path / "lwwcrash"), keys=["k"], deferred_gc=False
    )
    for i in range(4):
        log.append(
            spark.createDataFrame(
                [(0, f"hot@{i}"), (i + 10, f"cold@{i}")], "k long, v string"
            ),
            i,
        )
    want = {tuple(r) for r in log.read_latest().collect()}
    assert len(want) == 5  # key 0 resolved once + 4 cold keys
    real_rmtree = merge_mod.shutil.rmtree
    spared = os.path.join(log.root, "__batch_id=2")

    def crashy_rmtree(path, **kw):
        if os.path.abspath(path) == os.path.abspath(spared):
            return  # "crash": this source dir survives the GC
        real_rmtree(path, **kw)

    merge_mod.shutil.rmtree = crashy_rmtree
    try:
        assert log.maintain(fanout=4) == 1
    finally:
        merge_mod.shutil.rmtree = real_rmtree
    assert os.path.exists(spared)
    got = log.read_latest()
    assert got.count() == len(want)  # a dead-filter regression doubles this
    assert {tuple(r) for r in got.collect()} == want
    log.maintain(fanout=4)
    assert not os.path.exists(spared)
    got = log.read_latest()
    assert got.count() == len(want)
    assert {tuple(r) for r in got.collect()} == want


def test_corpus_dedup_maintain_interleaves_with_retry(spark, tmp_path):
    """The maintain() twin of the compact × retry interleave: batch k's
    first attempt lands, the tiered maintenance tick fires (scoped
    before_batch=k), then batch k is re-delivered. The scoped merge only
    touches committed dirs (< k, merged ids are negative and also < k),
    so the retry's pre-batch read resolves identically."""
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        corpus_dedup_batch,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    b = [
        mk([(0, "aaa"), (1, "bbb")]),
        mk([(2, "aaa"), (3, "ccc")]),
        mk([(4, "bbb"), (5, "ddd")]),
        mk([(6, "ccc"), (7, "eee")]),
    ]
    root = str(tmp_path / "minterleave")
    seen = UpsertLog(
        spark,
        os.path.join(root, "seen"),
        keys=["__h"],
        insert_only=True,
        bucket_col="__h",
    )
    verd = UpsertLog(
        spark, os.path.join(root, "verd"), keys=["doc_id"], insert_only=True
    )
    for i in range(3):
        corpus_dedup_batch(seen, verd, b[i], i)
    corpus_dedup_batch(seen, verd, b[3], 3)  # first attempt (uncommitted)
    seen.maintain(before_batch=3, fanout=2)  # tick fires mid-crash-window
    verd.maintain(before_batch=3, fanout=2)
    corpus_dedup_batch(seen, verd, b[3], 3)  # re-delivery
    got = {
        r["doc_id"]: (r["canonical_id"], r["keep"])
        for r in verd.read_latest().collect()
    }
    assert got == {
        0: (0, True), 1: (1, True), 2: (0, False), 3: (3, True),
        4: (1, False), 5: (5, True), 6: (3, False), 7: (7, True),
    }


def test_bucketed_log_maintain_preserves_layout(spark, tmp_path):
    """A maintained __h-bucketed log must keep the __kb hive layout in
    merged dirs — otherwise every later DPP/pruned read degrades to a
    full scan of the merged portion."""
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    log = UpsertLog(
        spark,
        str(tmp_path / "log"),
        keys=["__h"],
        insert_only=True,
        bucket_col="__h",
        n_buckets=4,
    )
    for i in range(4):
        log.append(
            spark.createDataFrame(
                [(f"h{i}{j}",) for j in range(8)], "__h string"
            ),
            i,
        )
    assert log.maintain(fanout=4) == 1
    merged = [
        d
        for d in os.listdir(log.root)
        if d.startswith("__batch_id=-")
    ]
    assert len(merged) == 1
    kb_dirs = [
        d
        for d in os.listdir(os.path.join(log.root, merged[0]))
        if d.startswith("__kb=")
    ]
    assert kb_dirs, "merged dir lost the __kb hive layout"
    want_rows = {f"h{i}{j}" for i in range(4) for j in range(8)}
    assert {r["__h"] for r in log.read_latest().collect()} == want_rows
    # the pruned read still prunes: only the named bucket's rows return
    some = log.read_latest(buckets=[0])
    assert set(r["__h"] for r in some.collect()) < want_rows


def test_connected_components_falls_back_to_star_on_non_convergence(spark):
    """A chain longer than max_iters rounds of min-label propagation must
    NOT return partially-propagated labels: the operator falls back to
    large-star/small-star contraction and still resolves the full
    component (round-2 behavior was to raise; round 3 resolves)."""
    from duckdb_streaming_patterns_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(6)]  # diameter 6 > max_iters=3
    nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
    edges = spark.createDataFrame(chain, "id_a long, id_b long")
    via_fallback = {
        r["id"]: r["cluster"]
        for r in connected_components(nodes, edges, max_iters=3).collect()
    }
    assert set(via_fallback.values()) == {0}
    direct = {
        r["id"]: r["cluster"]
        for r in connected_components(nodes, edges, max_iters=10).collect()
    }
    assert direct == via_fallback


def test_session_window_exact_gap_extends_session(spark):
    """Pin Spark's session_window boundary: an event at exactly
    last_event + gap EXTENDS the session (merge is gap-inclusive), while
    one microsecond past the gap opens a new one — the strict > in the
    sessionization_session_window oracle."""
    gap_edge = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, 0)),
        (1, datetime.datetime(2024, 1, 1, 0, 30, 0)),  # exactly +gap: merges
        (2, datetime.datetime(2024, 1, 1, 0, 0, 0)),
        (2, datetime.datetime(2024, 1, 1, 0, 30, 0, 1)),  # +gap+1us: new
    ]
    df = spark.createDataFrame(gap_edge, "user_id long, ts timestamp_ntz")
    out = (
        df.groupBy("user_id", F.session_window(F.col("ts").cast("timestamp"), "30 minutes"))
        .count()
        .collect()
    )
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r["count"])
    assert sorted(by_user[1]) == [2]
    assert sorted(by_user[2]) == [1, 1]


def test_corpus_ingest_dedup_flags_cross_batch_duplicates(spark, tmp_path):
    """The fixture corpus has no exact duplicates, so the driver oracle
    only proves the all-keep path. This exercises the real decision:
    duplicates WITHIN one micro-batch (doc 1 == doc 3, same chunk) and
    ACROSS batches (doc 0 duplicated in chunks 1 and 2) must both resolve
    to the earliest doc_id, and verdicts must equal the batch
    first-occurrence-wins window exactly."""
    import os

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from duckdb_streaming_patterns_spark.streaming import patterns, staging

    texts = {
        0: "alpha beta gamma",
        1: "dup text one",
        2: "unique two",
        3: "dup text one",       # within-batch dup of 1 (chunk 0)
        4: "alpha beta gamma",   # cross-batch dup of 0 (chunk 1)
        5: "unique five",
        6: "unique six",
        7: "alpha beta gamma",   # cross-batch dup of 0 again (chunk 1)
        8: "dup text one",       # cross-batch dup of 1 (chunk 2)
        9: "unique nine",
        10: "unique ten",
        11: "unique eleven",
    }
    docs = spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    src = os.path.join(str(tmp_path), "src")
    os.makedirs(src, exist_ok=True)
    docs.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(src, "documents.parquet")
    )
    run = os.path.join(str(tmp_path), "run")
    os.makedirs(run, exist_ok=True)
    chunks = staging.stage_document_chunks(spark, src, run, n_chunks=3)
    got = {
        r["doc_id"]: (r["canonical_id"], r["keep"])
        for r in patterns.pattern_corpus_ingest_dedup(
            spark, chunks, run, state_partitions=2
        ).collect()
    }
    expect = (
        docs.withColumn("__h", F.md5("text"))
        .withColumn(
            "canonical_id", F.min("doc_id").over(W.partitionBy("__h"))
        )
        .collect()
    )
    assert len(got) == len(texts)
    for r in expect:
        canon, keep = got[r["doc_id"]]
        assert canon == r["canonical_id"], (r["doc_id"], canon, r["canonical_id"])
        assert keep == (r["doc_id"] == r["canonical_id"])
    # the dup sets resolved as intended
    assert got[4] == (0, False) and got[7] == (0, False)
    assert got[3] == (1, False) and got[8] == (1, False)
    assert got[0] == (0, True) and got[1] == (1, True)


def test_corpus_ingest_dedup_retry_is_idempotent(spark, tmp_path):
    """A foreachBatch retry re-delivers a batch whose first attempt may
    have already appended to the seen log before crashing. The batch
    computation must resolve against the PRE-batch state (scoped
    read_latest) — resolving against the full log would make the retry
    see its own hashes, write an empty new-firsts frame over the batch
    dir, and erase the state (a later duplicate would then pass as new).
    Every crash window: re-delivery must leave both logs bit-identical."""
    import os

    from pyspark.sql import functions as F

    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        corpus_dedup_batch,
    )

    def mk(i):
        return spark.createDataFrame(
            [(j, t) for j, t in i], "doc_id long, text string"
        )

    b0 = mk([(0, "aaa"), (1, "bbb"), (2, "aaa")])
    b1 = mk([(3, "bbb"), (4, "ccc")])
    b2 = mk([(5, "aaa"), (6, "ddd")])

    def snapshot(log):
        return {
            tuple(sorted(r.asDict().items()))
            for r in spark.read.parquet(log.root).collect()
        }

    for crash_after_seen_append in (False, True):
        root = os.path.join(
            str(tmp_path), f"retry_{int(crash_after_seen_append)}"
        )
        seen = UpsertLog(spark, os.path.join(root, "seen"), keys=["__h"])
        verd = UpsertLog(spark, os.path.join(root, "verdicts"), keys=["doc_id"])
        corpus_dedup_batch(seen, verd, b0, 0)
        # first attempt of batch 1 — optionally "crash" after the seen
        # append by wiping only the verdict dir it wrote
        corpus_dedup_batch(seen, verd, b1, 1)
        if crash_after_seen_append:
            import shutil

            shutil.rmtree(os.path.join(verd.root, "__batch_id=1"))
        pre_seen = snapshot(seen)
        # retry (re-delivery of the same batch)
        corpus_dedup_batch(seen, verd, b1, 1)
        assert snapshot(seen) == pre_seen, "retry altered the seen log"
        corpus_dedup_batch(seen, verd, b2, 2)
        got = {
            r["doc_id"]: (r["canonical_id"], r["keep"])
            for r in verd.read_latest().collect()
        }
        assert got == {
            0: (0, True),
            1: (1, True),
            2: (0, False),
            3: (1, False),
            4: (4, True),
            5: (0, False),
            6: (6, True),
        }, got


def test_corpus_dedup_long_run_compaction_bounds_dirs(spark, tmp_path):
    """50 micro-batches with the pattern's in-loop compaction cadence
    (every 4): log directory count must stay bounded (≤ cadence + base)
    instead of growing one dir per batch, and the final verdicts must
    still equal the batch first-occurrence oracle — compaction loses no
    state. doc i duplicates doc i-10's content every 10 docs, so dup
    verdicts keep spanning compaction folds."""
    import os

    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        corpus_dedup_batch,
    )

    root = str(tmp_path / "longrun")
    seen = UpsertLog(spark, os.path.join(root, "seen"), keys=["__h"])
    verd = UpsertLog(spark, os.path.join(root, "verdicts"), keys=["doc_id"])

    def text_of(i: int) -> str:
        return f"text {i % 10} body"  # 10 distinct contents, first in 0..9

    max_dirs = 0
    for b in range(50):
        if b > 0 and b % 4 == 0:
            seen.compact(before_batch=b)
            verd.compact(before_batch=b)
        batch = spark.createDataFrame(
            [(b, text_of(b))], "doc_id long, text string"
        )
        corpus_dedup_batch(seen, verd, batch, b)
        n = len([d for d in os.listdir(seen.root) if d.startswith("__batch_id=")])
        max_dirs = max(max_dirs, n)
    assert max_dirs <= 6, max_dirs  # cadence 4 + base + in-flight
    got = {
        r["doc_id"]: (r["canonical_id"], r["keep"])
        for r in verd.read_latest().collect()
    }
    assert len(got) == 50
    for i in range(50):
        assert got[i] == (i % 10, i < 10), (i, got[i])


def test_corpus_dedup_compact_interleaves_with_retry(spark, tmp_path):
    """The crash-interleave the in-loop cadence must survive: batch k's
    first attempt appends state, THEN the compaction tick fires (scoped
    before_batch=k, folding only committed batches < k), then the crashed
    batch k is re-delivered. The retry's scoped read must resolve against
    exactly the pre-batch state — the fold must neither swallow batch k's
    surviving dir nor let the retry see its own first attempt's rows. An
    UNSCOPED compact here would fold batch k into the base and erase the
    crash-window invariant fixed in the retry-scoped read."""
    import os
    import shutil

    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        corpus_dedup_batch,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    b = [
        mk([(0, "aaa"), (1, "bbb")]),
        mk([(2, "aaa"), (3, "ccc")]),
        mk([(4, "bbb"), (5, "ddd")]),
        mk([(6, "ccc"), (7, "eee")]),
    ]
    root = str(tmp_path / "interleave")
    seen = UpsertLog(spark, os.path.join(root, "seen"), keys=["__h"])
    verd = UpsertLog(spark, os.path.join(root, "verdicts"), keys=["doc_id"])
    for i in range(3):
        corpus_dedup_batch(seen, verd, b[i], i)
    # batch 3 first attempt: seen append lands, verdict write "crashes"
    corpus_dedup_batch(seen, verd, b[3], 3)
    shutil.rmtree(os.path.join(verd.root, "__batch_id=3"))
    # maintenance tick fires before the retry (scoped below the retried id)
    seen.compact(before_batch=3)
    verd.compact(before_batch=3)
    assert os.path.isdir(os.path.join(seen.root, "__batch_id=3"))  # survived
    # re-delivery of batch 3
    corpus_dedup_batch(seen, verd, b[3], 3)
    got = {
        r["doc_id"]: (r["canonical_id"], r["keep"])
        for r in verd.read_latest().collect()
    }
    assert got == {
        0: (0, True), 1: (1, True), 2: (0, False), 3: (3, True),
        4: (1, False), 5: (5, True), 6: (3, False), 7: (7, True),
    }, got


def test_neardup_dedup_retry_is_idempotent(spark, tmp_path):
    """pattern_streaming_neardup_dedup's four state logs under a
    foreachBatch retry whose first attempt partially committed: the
    scoped reads must resolve the retry against pre-batch state, leaving
    every log bit-identical and later batches' verdicts unchanged.
    Fixture plants an exact dup (doc 3 == doc 0) and a near dup (doc 4 ~
    doc 1 at high token overlap) across the retried boundary."""
    import os
    import shutil

    from duckdb_streaming_patterns_spark.streaming.patterns import (
        neardup_dedup_batch,
        neardup_state_logs,
    )

    base1 = "the quick brown fox jumps over the lazy dog again and again"
    near1 = "the quick brown fox jumps over the lazy dog again and once"
    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    b0 = mk([(0, "alpha beta gamma delta epsilon zeta"), (1, base1)])
    b1 = mk([(3, "alpha beta gamma delta epsilon zeta"), (4, near1)])
    b2 = mk([(5, base1), (6, "totally different words here now")])

    def snapshot(log):
        return {
            tuple(sorted(r.asDict().items()))
            for r in spark.read.parquet(log.root).collect()
        }

    for crash_partial in (False, True):
        root = os.path.join(str(tmp_path), f"nd_retry_{int(crash_partial)}")
        args = neardup_state_logs(spark, root)
        logs = dict(zip(("seen", "bands", "docs", "verdicts"), args))
        neardup_dedup_batch(*args, b0, 0)
        neardup_dedup_batch(*args, b1, 1)
        if crash_partial:  # crash after seen+bands append, before docs/verdicts
            shutil.rmtree(os.path.join(logs["docs"].root, "__batch_id=1"))
            shutil.rmtree(os.path.join(logs["verdicts"].root, "__batch_id=1"))
        pre = {n: snapshot(l) for n, l in logs.items() if n in ("seen", "bands")}
        neardup_dedup_batch(*args, b1, 1)  # retry
        for n in ("seen", "bands"):
            assert snapshot(logs[n]) == pre[n], f"retry altered {n} log"
        neardup_dedup_batch(*args, b2, 2)
        got = {
            r["doc_id"]: r["verdict"]
            for r in logs["verdicts"].read_latest().collect()
        }
        assert got[0] == "keep" and got[1] == "keep"
        assert got[3] == "drop_exact"
        assert got[4] == "drop_near", got
        assert got[5] == "drop_exact"
        assert got[6] == "keep"


def test_snapshot_delete_tombstones_and_time_travel(spark, tmp_path):
    """delete() commits a tombstone snapshot: reads anti-join it, time
    travel BEFORE the delete still sees the rows, table_changes grows a
    _change_type column on request, and delete_changes scopes the feed."""
    t = SnapshotTable(spark, str(tmp_path / "del"), "id long, grp long, v string")
    t.append(
        spark.createDataFrame(
            [(1, 0, "a"), (2, 1, "b"), (3, 0, "c")], "id long, grp long, v string"
        ),
        batch_id=0,
    )
    t.append(
        spark.createDataFrame([(4, 1, "d")], "id long, grp long, v string"),
        batch_id=1,
    )
    sid = t.delete(F.col("grp") == 1, key_cols=["id", "grp"], batch_id=2)
    assert sid == 2
    # fenced retry of the same delete request
    assert t.delete(F.col("grp") == 1, key_cols=["id", "grp"], batch_id=2) == -1
    assert {r["id"] for r in t.read().collect()} == {1, 3}
    # deletes time-travel: as-of snapshot 1 predates the tombstone
    assert {r["id"] for r in t.read_as_of(1).collect()} == {1, 2, 3, 4}
    # change feed with deletes: 1 insert + 2 delete rows in (0, 2]
    feed = t.table_changes(0, 2, include_deletes=True).collect()
    kinds = {(r["id"], r["_change_type"]) for r in feed}
    assert kinds == {(4, "insert"), (2, "delete"), (4, "delete")}
    # delete-side feed scoping
    assert t.delete_changes(2, 2).count() == 0
    assert {r["id"] for r in t.delete_changes(1, 2).collect()} == {2, 4}


def test_snapshot_reinsert_after_delete_survives(spark, tmp_path):
    """A tombstone kills only rows appended BEFORE it: re-inserting the
    same key afterwards is visible (the MVCC ordering contract)."""
    t = SnapshotTable(spark, str(tmp_path / "re"), "id long, v string")
    t.append(spark.createDataFrame([(1, "old")], "id long, v string"), batch_id=0)
    t.delete(F.col("id") == 1, key_cols=["id"], batch_id=1)
    t.append(spark.createDataFrame([(1, "new")], "id long, v string"), batch_id=2)
    rows = t.read().collect()
    assert [(r["id"], r["v"]) for r in rows] == [(1, "new")]


def test_snapshot_vacuum_applies_tombstones_physically(spark, tmp_path):
    """vacuum() rewrites the data with tombstones folded in: reads are
    unchanged, the tombstone files are retired (no anti-join on the read
    path afterwards), and compaction before vacuum preserves history."""
    t = SnapshotTable(spark, str(tmp_path / "vac"), "id long, v string")
    t.append(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), batch_id=0
    )
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"), batch_id=1)
    t.delete(F.col("id") == 2, key_cols=["id"], batch_id=2)
    before = {tuple(r) for r in t.read().drop("snapshot_id").collect()}
    # compact preserves the full insert history (CDF intact, delete applied on read)
    t.compact()
    assert {r["id"] for r in t.table_changes(-1, 1).collect()} == {1, 2, 3}
    assert {tuple(r) for r in t.read().drop("snapshot_id").collect()} == before
    t.vacuum()
    assert {tuple(r) for r in t.read().drop("snapshot_id").collect()} == before
    # tombstones retired: none left for the read path to apply
    assert t._tombstones(t.max_snapshot_id()) == []
    # physical rewrite dropped the deleted row from the data files too
    assert {r["id"] for r in t.table_changes(-1, t.max_snapshot_id()).collect()} == {1, 3}


def test_summary_delete_keys(spark, tmp_path):
    st = SummaryTable(
        spark, str(tmp_path / "sdel"), "user_id long, count_of_clicks long"
    )
    st.overwrite(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "user_id long, count_of_clicks long"
        ),
        batch_id=0,
    )
    gone = spark.createDataFrame([(2,)], "user_id long")
    assert st.delete_keys(gone, batch_id=1, keys=["user_id"])
    # fenced retry
    assert not st.delete_keys(gone, batch_id=1, keys=["user_id"])
    assert {r["user_id"] for r in st.read().collect()} == {1, 3}


def test_fused_delete_reinsert_equals_two_step(spark, tmp_path):
    """The r16 phase-4 optimization in pattern_delete_propagation folds
    delete_keys + merge_batch into ONE overwrite(additive_merge(anti-join,
    delta)) swap. Pin the equivalence the fusion relies on: for any
    summary, affected-key set, and recomputed delta over exactly those
    keys, the fused rewrite's contents equal the two-step form's."""
    ddl = "user_id long, count_of_clicks long, updated_at long"
    base = [(1, 10, 100), (2, 20, 200), (3, 30, 300), (4, 40, 400)]
    # affected groups: 2 (recomputed to smaller values — the trim case)
    # and 3 (fully purged: no recomputed row); 1 and 4 untouched
    affected = spark.createDataFrame([(2,), (3,)], "user_id long")
    delta = spark.createDataFrame([(2, 7, 150)], ddl)

    two = SummaryTable(spark, str(tmp_path / "two"), ddl)
    two.overwrite(spark.createDataFrame(base, ddl), batch_id=0)
    two.delete_keys(affected, batch_id=1, keys=["user_id"])
    two.merge_batch(
        delta, 2, keys=["user_id"], add_cols=["count_of_clicks"],
        max_cols=["updated_at"],
    )

    fused = SummaryTable(spark, str(tmp_path / "fused"), ddl)
    fused.overwrite(spark.createDataFrame(base, ddl), batch_id=0)
    remaining = fused.read().join(
        F.broadcast(affected), on=["user_id"], how="left_anti"
    )
    fused.overwrite(
        additive_merge(
            remaining, delta, keys=["user_id"],
            add_cols=["count_of_clicks"], max_cols=["updated_at"],
        ),
        batch_id=2,
    )

    rows = lambda t: {tuple(r) for r in t.read().collect()}  # noqa: E731
    assert rows(fused) == rows(two)
    assert rows(fused) == {(1, 10, 100), (4, 40, 400), (2, 7, 150)}
    assert fused.last_batch_id() == two.last_batch_id() == 2


def test_streaming_ann_index_incremental_build_and_pruned_probe(spark, sf_small):
    """The index accumulates one snapshot per micro-batch, the quantizer is
    frozen from batch 0, and the probe's index scan is directory-pruned to
    the probed cells (PartitionFilters on cell_id)."""
    import contextlib
    import io
    import json

    run = staging.new_run_dir("pann_t")
    chunks = staging.stage_embedding_chunks(spark, sf_small, run, n_chunks=5)
    queries_df = load_table(spark, sf_small, "embeddings").filter(
        F.col("vec_id") < 5
    )
    out = patterns.pattern_streaming_ann_index(
        spark, chunks, run, queries_df, k=10, n_cells=8, n_probe=3,
        state_partitions=4,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    seg = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "cell_id" in seg, f"probe scan not pruned on cell_id: {seg}"
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2, 3, 4}
    assert all(1 <= r["rank"] <= 10 for r in rows)
    # one index snapshot per micro-batch, all insert-kind
    index = SnapshotTable(
        spark,
        os.path.join(run, "ivf_index"),
        "vec_id long, embedding array<float>, cell_id long",
    )
    snaps = index.snapshots()
    assert len(snaps) == 5 and all(s["kind"] == "insert" for s in snaps)
    # quantizer froze on batch 0: anchors persisted once, n_cells wide
    with open(os.path.join(run, "anchors.json")) as f:
        anchors = json.load(f)
    assert len(anchors) == 8
    # every corpus vector landed in exactly one cell across the snapshots
    total = load_table(spark, sf_small, "embeddings").count()
    assert index.read().count() == total


def test_ingest_funnel_batch_retry_is_idempotent(spark, tmp_path):
    """The funnel inherits corpus dedup's crash contract: a re-delivered
    batch resolves against the pre-batch seen state and rewrites its own
    dirs bit-identically, across both crash windows (before/after the
    seen append). Quality and bloom tiers are stateless, so the composed
    verdicts must also be identical."""
    from duckdb_streaming_patterns_spark.operators.dedup import bloom_build
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        ingest_funnel_batch,
    )

    texts = {
        0: "alpha beta gamma delta",
        1: "one two three four five",
        2: "alpha beta gamma delta",  # exact dup of 0
        3: "one two three four five",  # exact dup of 1
        4: "zeta eta theta iota kappa",
    }

    def mk(ids):
        return spark.createDataFrame(
            [(i, texts[i]) for i in ids], "doc_id long, text string"
        )

    bench = spark.createDataFrame(
        [("alpha beta gamma",), ("beta gamma delta",)], "g string"
    )
    bitset = bloom_build(bench, "g")

    def snapshot(log):
        return {
            tuple(sorted(r.asDict().items()))
            for r in spark.read.parquet(log.root).collect()
        }

    for crash_after_seen_append in (False, True):
        root = os.path.join(
            str(tmp_path), f"funnel_retry_{int(crash_after_seen_append)}"
        )
        seen = UpsertLog(spark, os.path.join(root, "seen"), keys=["__h"])
        verd = UpsertLog(spark, os.path.join(root, "verdicts"), keys=["doc_id"])
        ingest_funnel_batch(seen, verd, bitset, mk([0, 1]), 0)
        ingest_funnel_batch(seen, verd, bitset, mk([2, 3]), 1)
        if crash_after_seen_append:
            import shutil

            shutil.rmtree(os.path.join(verd.root, "__batch_id=1"))
        pre_seen = snapshot(seen)
        ingest_funnel_batch(seen, verd, bitset, mk([2, 3]), 1)
        assert snapshot(seen) == pre_seen, "retry altered the seen log"
        ingest_funnel_batch(seen, verd, bitset, mk([4]), 2)
        got = {
            r["doc_id"]: (r["canonical_id"], r["verdict"], r["bloom_flagged"])
            for r in verd.read_latest().collect()
        }
        # doc 0 contains bench gram 'alpha beta gamma' -> contaminated;
        # 2/3 are dups of earlier arrivals regardless of other tiers;
        # short docs all fail the length-dominated quality gate? No —
        # assert only the invariants that are fixture-independent here.
        assert got[2][0] == 0 and got[2][1] == "drop_duplicate"
        assert got[3][0] == 1 and got[3][1] == "drop_duplicate"
        assert got[0][0] == 0 and got[0][2] is True  # bench gram present
        assert got[4][1] != "drop_duplicate"


def test_running_totals_tws_matches_batch_or_skips(spark, sf_small):
    """Spark 4 transformWithStateInPandas formulation of the reference's
    running aggregation. The TWS runtime needs protobuf for its state
    protocol; without it the operator raises a clear ImportError and the
    test skips — on a protobuf-equipped environment it must match the
    same batch ground truth as pattern_1_1."""
    import pytest

    from duckdb_streaming_patterns_spark.operators.summary import user_clicks

    run = staging.new_run_dir("ptws_t")
    chunks = staging.stage_event_chunks(spark, sf_small, run, n_chunks=5)
    try:
        got = patterns.pattern_running_totals_tws(
            spark, chunks, run, state_partitions=4
        ).collect()
    except ImportError as e:
        pytest.skip(f"TWS unavailable in this environment: {e}")
    expected = {
        (r["user_id"], r["count_of_clicks"], r["updated_at"])
        for r in user_clicks(load_table(spark, sf_small, "events")).collect()
    }
    assert {
        (r["user_id"], r["count_of_clicks"], r["updated_at"]) for r in got
    } == expected


def test_snapshot_compact_preserves_partition_cols(spark, tmp_path):
    """Maintenance must not destroy the sub-partition layout readers'
    pruning depends on: after compact() of a cell-partitioned table, the
    cell directories still exist inside each snapshot partition and the
    data round-trips."""
    import glob as _glob

    t = SnapshotTable(
        spark,
        str(tmp_path / "cellsnap"),
        "id long, cell_id long, v string",
        partition_cols=["cell_id"],
    )
    t.append(
        spark.createDataFrame(
            [(1, 0, "a"), (2, 1, "b"), (3, 0, "c")],
            "id long, cell_id long, v string",
        ),
        batch_id=0,
    )
    t.append(
        spark.createDataFrame([(4, 1, "d")], "id long, cell_id long, v string"),
        batch_id=1,
    )
    before = {tuple(sorted(r.asDict().items())) for r in t.read().collect()}
    t.compact()
    after = {tuple(sorted(r.asDict().items())) for r in t.read().collect()}
    assert before == after
    cell_dirs = _glob.glob(
        os.path.join(t.data_dir, "snapshot_id=*", "cell_id=*")
    )
    assert cell_dirs, "compaction flattened the cell sub-partitions"


def test_maintenance_rewrite_is_parallel_and_one_file_per_leaf(spark, tmp_path):
    """target_files=1 means a REBALANCE shuffle on (snapshot_id,
    partition cols) (``_rewrite_layout``), not coalesce(1)'s single task
    funnelling the whole table — and since round 10 not a plain
    repartition either, because the expire fold re-stamps all history at
    ONE snapshot_id and a per-key repartition would funnel that through
    one task (AQE's rebalance splits such a skewed leaf). Asserts the
    plan is the rebalance shuffle, never a Coalesce; on-disk, each tiny
    fixture leaf still lands one part file (AQE coalesces small
    partitions — at scale a skewed leaf may legitimately hold several,
    readers glob)."""
    import contextlib as _contextlib
    import glob as _glob
    import io as _io

    t = SnapshotTable(
        spark,
        str(tmp_path / "parsnap"),
        "id long, cell_id long, v string",
        partition_cols=["cell_id"],
    )
    rows = [(i, i % 4, f"v{i}") for i in range(64)]
    t.append(
        spark.createDataFrame(rows[:32], "id long, cell_id long, v string"),
        batch_id=0,
    )
    t.append(
        spark.createDataFrame(rows[32:], "id long, cell_id long, v string"),
        batch_id=1,
    )

    shaped = t._rewrite_layout(t.table_changes(-1, t.max_snapshot_id()), 1)
    buf = _io.StringIO()
    with _contextlib.redirect_stdout(buf):
        shaped.explain("formatted")
    plan = buf.getvalue()
    # The distribution must be the AQE rebalance shuffle over the leaf
    # key (right-sizes partition count AND splits skewed leaves — at
    # fixture scale it may coalesce to 1, at 100 TB it fans out), never
    # a Coalesce funnel and never a one-task-per-key repartition.
    assert "REBALANCE_PARTITIONS_BY_COL" in plan, plan
    assert "hashpartitioning(snapshot_id" in plan, plan
    assert "Coalesce" not in plan, plan

    t.compact()
    leaves = _glob.glob(os.path.join(t.data_dir, "snapshot_id=*", "cell_id=*"))
    assert len(leaves) == 8  # 2 snapshots x 4 cells survive the fold
    for leaf in leaves:
        parts = _glob.glob(os.path.join(leaf, "*.parquet"))
        assert len(parts) == 1, (leaf, parts)
    # explicit target_files keeps the deliberate small-table coalesce knob
    assert t._rewrite_layout(t.read(), 3).rdd.getNumPartitions() <= 3


def test_snapshot_schema_evolution(spark, tmp_path):
    """A later batch may append new columns (DuckLake/Delta schema
    evolution): full reads span the union with nulls for pre-evolution
    rows, while time travel to the pre-evolution era returns that era's
    schema — the ledger records each snapshot's columns and scopes the
    projection to the queried range."""
    t = SnapshotTable(spark, str(tmp_path / "evo"), "id long, v string")
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"), batch_id=0)
    t.append(
        spark.createDataFrame(
            [(2, "b", 9.5)], "id long, v string, score double"
        ),
        batch_id=1,
    )
    full = t.read()
    assert set(full.columns) == {"id", "v", "score", "snapshot_id"}
    rows = {r["id"]: r["score"] for r in full.collect()}
    assert rows == {1: None, 2: 9.5}
    old = t.read_as_of(0)
    assert set(old.columns) == {"id", "v", "snapshot_id"}
    assert [r["id"] for r in old.collect()] == [1]
    # CDF of only the evolved range carries the new column with values
    delta = t.table_changes(0, 1)
    assert set(delta.columns) == {"id", "v", "score", "snapshot_id"}
    assert [r["score"] for r in delta.collect()] == [9.5]


def test_bootstrap_then_stream_fences_covered_batches(spark, sf_small, tmp_path):
    """The backfill/live boundary: after the batch bootstrap (chunks 0-2
    under batch id 2), the replaying stream must merge ONLY batches 3-4 —
    visible as exactly three summary versions (bootstrap + two tail
    merges) — and the final state must equal the batch ground truth."""
    from duckdb_streaming_patterns_spark.operators.summary import user_clicks

    run = staging.new_run_dir("pboot_t")
    chunks = staging.stage_event_chunks(spark, sf_small, run, n_chunks=5)
    got = patterns.pattern_bootstrap_then_stream(
        spark, chunks, run, bootstrap_chunks=3, state_partitions=4
    )
    summary = SummaryTable(
        spark, os.path.join(run, "summary"), patterns.SUMMARY_DDL
    )
    assert summary.last_batch_id() == 4
    assert summary._meta()["version"] == 2, "stream re-merged covered batches"
    expected = {
        (r["user_id"], r["count_of_clicks"], r["updated_at"])
        for r in user_clicks(load_table(spark, sf_small, "events")).collect()
    }
    assert {
        (r["user_id"], r["count_of_clicks"], r["updated_at"])
        for r in got.collect()
    } == expected


def test_ann_index_composes_with_tombstone_deletes(spark, sf_small, tmp_path):
    """The delete surface composes with the at-rest ANN index: after
    tombstoning some vectors (a takedown request against an embedding
    index), reads exclude them — so a re-probe of the same index returns
    no deleted neighbor, without rebuilding anything."""
    run = staging.new_run_dir("pann_del")
    chunks = staging.stage_embedding_chunks(spark, sf_small, run, n_chunks=5)
    queries_df = load_table(spark, sf_small, "embeddings").filter(
        F.col("vec_id") < 3
    )
    before = patterns.pattern_streaming_ann_index(
        spark, chunks, run, queries_df, k=5, n_cells=8, n_probe=3,
        state_partitions=4,
    ).collect()
    index = SnapshotTable(
        spark,
        os.path.join(run, "ivf_index"),
        "vec_id long, embedding array<float>, cell_id long",
        partition_cols=["cell_id"],
    )
    victims = {r["neighbor_id"] for r in before if r["rank"] == 1}
    index.delete(F.col("vec_id").isin(*victims), key_cols=["vec_id"],
                 batch_id=9_999)
    assert index.read().filter(F.col("vec_id").isin(*victims)).count() == 0
    # re-probe the post-delete index through the same at-rest read path
    from duckdb_streaming_patterns_spark.functions.vectors import (
        dot_double,
        l2_norm,
        to_double_array,
    )
    from duckdb_streaming_patterns_spark.operators import similarity
    import json as _json
    from pyspark.sql import Row, Window as W

    with open(os.path.join(run, "anchors.json")) as f:
        anchors = [Row(aid=a, vec=v) for a, v in _json.load(f)]
    probe = similarity.anchor_cell_udf(anchors, n_probe=3)
    qv = queries_df.select(
        F.col("vec_id").cast("long").alias("query_id"),
        to_double_array(F.col("embedding")).alias("q_vec"),
        l2_norm(F.col("embedding")).alias("q_norm"),
        F.explode(probe(F.col("embedding"))).alias("cell_id"),
    )
    cells = index.read().select(
        F.col("vec_id").alias("neighbor_id"),
        "cell_id",
        to_double_array(F.col("embedding")).alias("c_vec"),
        l2_norm(F.col("embedding")).alias("c_norm"),
    )
    scored = (
        cells.join(F.broadcast(qv), "cell_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            dot_double(F.col("q_vec"), F.col("c_vec"))
            / F.col("q_norm")
            / F.col("c_norm"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    after = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .collect()
    )
    got = {r["neighbor_id"] for r in after}
    assert got.isdisjoint(victims), "deleted vectors still retrieved"
    assert {r["query_id"] for r in after} == {0, 1, 2}


def test_vacuum_then_append_and_cdf_continue(spark, tmp_path):
    """Lifecycle after vacuum: appends continue with fresh snapshot ids,
    further deletes work against the rewritten generation, and the change
    feed over the post-vacuum range is intact (only the vacuumed range's
    delete rows are truncated — the documented retention trade)."""
    t = SnapshotTable(spark, str(tmp_path / "lifec"), "id long, v string")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), batch_id=0)
    t.delete(F.col("id") == 1, key_cols=["id"], batch_id=1)
    t.vacuum()
    assert {r["id"] for r in t.read().collect()} == {2}
    # appends continue past the vacuum with monotone snapshot ids
    sid = t.append(spark.createDataFrame([(3, "c")], "id long, v string"), batch_id=2)
    assert sid == 2
    assert {r["id"] for r in t.read().collect()} == {2, 3}
    # post-vacuum deletes work against the rewritten generation
    t.delete(F.col("id") == 2, key_cols=["id"], batch_id=3)
    assert {r["id"] for r in t.read().collect()} == {3}
    # change feed: post-vacuum range intact, including the new delete
    feed = t.table_changes(1, 3, include_deletes=True).collect()
    assert {(r["id"], r["_change_type"]) for r in feed} == {
        (3, "insert"),
        (2, "delete"),
    }
    # time travel before the new delete still sees id=2
    assert {r["id"] for r in t.read_as_of(2).collect()} == {2, 3}


def test_noop_delete_is_fence_only_and_never_poisons_reads(spark, tmp_path):
    """A delete() whose condition matches zero visible rows must not
    commit a tombstone data dir (an empty dir can have zero part files —
    spark.read.parquet on it fails schema inference, poisoning EVERY
    later read) and must not add a useless anti-join; the batch-id fence
    still holds (round-4 ADVICE, snapshots.py delete())."""
    t = SnapshotTable(spark, str(tmp_path / "noop"), "id long, v string")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"), batch_id=0)
    sid = t.delete(F.col("id") == 99, key_cols=["id"], batch_id=1)
    assert sid == 1
    # fence holds for a retried no-op delete
    assert t.delete(F.col("id") == 99, key_cols=["id"], batch_id=1) == -1
    # reads keep working and take the no-tombstone fast path (no anti-join)
    assert {r["id"] for r in t.read().collect()} == {1, 2}
    assert t._tombstones(t.max_snapshot_id()) == []
    # later real deletes and reads are unaffected
    t.delete(F.col("id") == 1, key_cols=["id"], batch_id=2)
    assert {r["id"] for r in t.read().collect()} == {2}
    assert {r["id"] for r in t.read_as_of(1).collect()} == {1, 2}


def test_delete_changes_empty_window_keeps_key_schema(spark, tmp_path):
    """delete_changes over a window containing no tombstones must still
    expose the table's tombstone key columns (typed from the table
    schema), so propagation code that selects key columns gets an empty
    keyed frame instead of AnalysisException (round-4 ADVICE)."""
    t = SnapshotTable(spark, str(tmp_path / "ew"), "id long, grp long, v string")
    t.append(
        spark.createDataFrame([(1, 0, "a"), (2, 1, "b")], "id long, grp long, v string"),
        batch_id=0,
    )
    t.delete(F.col("grp") == 1, key_cols=["id", "grp"], batch_id=1)
    # window excludes the tombstone -> empty, but key cols select fine
    empty = t.delete_changes(1, 1)
    assert empty.count() == 0
    assert empty.select("id", "grp").count() == 0
    assert dict(empty.dtypes)["grp"] == "bigint"


def test_insert_high_water_mark_ignores_tombstone_snapshots(spark, tmp_path):
    """max_insert_snapshot_id() is the ingest fence the delete-propagation
    pattern scopes its feed window with: after a tombstone commits, the
    overall max advances but the INSERT high-water mark does not, so a
    retry's feed window (insert_hwm, max] still covers every tombstone —
    including ones committed before the crash (round-4 ADVICE, medium)."""
    t = SnapshotTable(spark, str(tmp_path / "hwm"), "id long, grp long")
    t.append(spark.createDataFrame([(1, 3), (2, 4)], "id long, grp long"), batch_id=0)
    t.append(spark.createDataFrame([(3, 3)], "id long, grp long"), batch_id=1)
    assert t.max_insert_snapshot_id() == 1 == t.max_snapshot_id()
    # first delete commits (the pre-crash state of the retry hole)
    t.delete(F.col("grp") == 3, key_cols=["id", "grp"], batch_id=10)
    assert t.max_snapshot_id() == 2
    assert t.max_insert_snapshot_id() == 1  # unchanged by the tombstone
    # a retry computing its window from the insert HWM sees BOTH deletes
    t.delete(F.col("grp") == 4, key_cols=["id", "grp"], batch_id=11)
    feed = t.delete_changes(t.max_insert_snapshot_id(), t.max_snapshot_id())
    assert {r["id"] for r in feed.collect()} == {1, 2, 3}


def test_file_envelope_handles_stats_without_min_max(tmp_path):
    """A parquet column chunk can carry a statistics object with min/max
    unset (e.g. an all-null column: null_count only). The skip decision
    must take the documented 'no stats: keep the file' fallback instead
    of raising (round-4 ADVICE, layout._file_envelope)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_streaming_patterns_spark.operators.layout import _file_envelope

    f = str(tmp_path / "nullstats.parquet")
    table = pa.table(
        {
            "user_id": pa.array([None, None], type=pa.int64()),
            "event_date": pa.array([None, None], type=pa.date32()),
        }
    )
    pq.write_table(table, f)
    md = pq.ParquetFile(f).metadata.row_group(0).column(0)
    # precondition: this writer produced a stats object without min/max
    assert md.statistics is not None and not md.statistics.has_min_max
    assert _file_envelope(f) is None


def test_semdedup_stream_retry_is_idempotent_and_matches_all_prior(
    spark, tmp_path
):
    """pattern_streaming_semdedup's two state logs under a foreachBatch
    retry whose first attempt partially committed (vecs appended,
    verdicts lost): the before_batch-scoped state read must resolve the
    retry against pre-batch state, the epoch quantizer must re-assign
    identically (batches 1 and 2 are RETRAIN boundaries: the codebook
    file and the refold marker fence the retry — the re-delivered batch
    must neither re-train nor re-fold, leaving the vector state
    bit-identical), and the final verdicts must equal the all-prior
    batch semantics under the epoch schedule. Fixture: v10 ≈ v0 (same
    cell, cosine ≈ 1) across the retried boundary; v11 orthogonal-ish
    (keep); v20 ≈ v10 in a later batch (epoch-2 anchors = md5-top-4 of
    {0,1,2,10,11} = {0,1,2,11}; v20 → cell 0, matching v0 AND v10)."""
    import os
    import shutil

    from duckdb_streaming_patterns_spark.streaming.patterns import (
        semdedup_state_logs,
        semdedup_stream_batch,
    )

    def mk(rows):
        return spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<float>",
        )

    b0 = mk([(0, [1, 0, 0, 0]), (1, [0, 1, 0, 0]), (2, [0, 0, 1, 0])])
    b1 = mk([(10, [0.9, 0.1, 0, 0]), (11, [0, 0, 0.1, 0.9])])
    b2 = mk([(20, [0.95, 0.05, 0, 0])])

    for crash_partial in (False, True):
        root = os.path.join(str(tmp_path), f"sem_retry_{int(crash_partial)}")
        vecs_log, verdict_log = semdedup_state_logs(spark, root)
        quant = os.path.join(root, "quant")
        args = (vecs_log, verdict_log, quant)
        semdedup_stream_batch(*args, b0, 0, 0.5, 4)
        semdedup_stream_batch(*args, b1, 1, 0.5, 4)
        if crash_partial:  # crash after vecs append, before verdicts
            shutil.rmtree(os.path.join(verdict_log.root, "__batch_id=1"))
        def snap():
            return {
                tuple(
                    (k, tuple(v) if isinstance(v, list) else v)
                    for k, v in sorted(r.asDict().items())
                )
                for r in spark.read.parquet(vecs_log.root).collect()
            }

        pre = snap()
        semdedup_stream_batch(*args, b1, 1, 0.5, 4)  # retry
        post = snap()
        assert post == pre, "retry altered the vector state"
        semdedup_stream_batch(*args, b2, 2, 0.5, 4)
        got = {
            r["vec_id"]: (r["verdict"], r["n_sem_matches"])
            for r in verdict_log.read_latest().collect()
        }
        assert got[0] == ("keep", 0)
        assert got[1] == ("keep", 0)
        assert got[10] == ("drop_semantic", 1)  # matches earlier v0
        assert got[11][0] == "keep"
        assert got[20] == ("drop_semantic", 2)  # matches v0 AND v10


def test_source_caps_production_cadence_fires_past_batch_8(spark, sf_small):
    """Round-10: the registered forms pin compact_every=2 so the driver
    gate exercises maintenance at 5-batch fixture scale — this test
    covers the other half: the PRODUCTION default (cadence 8) on a
    replay long enough to reach it. 12 micro-batches fire the verdict
    log's tiered maintain() at batch 8 mid-stream; every quota verdict
    must still equal the batch arrival-rank reference. Without this, no
    test ran any pattern past its default cadence (the round-9 blind
    spot, from the other direction)."""
    from pyspark.sql import Window

    from duckdb_streaming_patterns_spark.sources.tables import load_table

    run = staging.new_run_dir("t_caps_c8")
    chunks = staging.stage_document_chunks(spark, sf_small, run, n_chunks=12)
    got = patterns.pattern_streaming_source_caps(
        spark, chunks, run, cap=20, state_partitions=4
    )  # compact_every stays the default 8
    docs = load_table(spark, sf_small, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    ref = docs.select(
        "doc_id",
        "source",
        F.row_number().over(w).cast("long").alias("src_rank"),
        (F.row_number().over(w) <= 20).alias("keep"),
    )
    assert got.count() == docs.count()
    assert (
        got.join(
            ref, ["doc_id", "source", "src_rank", "keep"], "inner"
        ).count()
        == docs.count()
    )
    # and the maintenance actually ran: the verdict log holds at least
    # one fold-produced (negative-id) dir
    import glob as _glob

    folded = [
        d
        for d in _glob.glob(os.path.join(run, "**", "__batch_id=-*"))
        + _glob.glob(os.path.join(run, "**", "**", "__batch_id=-*"))
    ]
    assert folded, "cadence-8 maintenance never produced a fold dir"


def test_source_caps_retry_is_idempotent(spark, tmp_path):
    """pattern_streaming_source_caps under foreachBatch retries, both
    crash windows: (a) verdicts appended but the counts merge not yet
    applied — the retry recomputes from the current (pre-batch) counts
    and overwrites bit-identically, then applies the merge; (b) the
    merge already applied (fence holds) — the retry must read the
    PREVIOUS summary version (read_prev) or every verdict of the
    re-delivered batch would be shifted by its own batch's counts."""
    import os
    import shutil

    from duckdb_streaming_patterns_spark.operators.merge import (
        SummaryTable,
        UpsertLog,
    )
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        source_caps_batch,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, source string")

    b0 = mk([(0, "a"), (1, "a"), (2, "b")])
    b1 = mk([(3, "a"), (4, "b"), (5, "c")])
    b2 = mk([(6, "a"), (7, "b")])
    cap = 2  # source a saturates in b0; b1's doc 3 must drop

    for crash in ("before_merge", "after_merge"):
        root = str(tmp_path / f"caps_{crash}")
        counts = SummaryTable(
            spark, os.path.join(root, "counts"), "source string, n_seen long"
        )
        vlog = UpsertLog(
            spark, os.path.join(root, "verdicts"), keys=["doc_id"],
            insert_only=True,
        )
        source_caps_batch(counts, vlog, b0, 0, cap)
        if crash == "before_merge":
            # first attempt of batch 1 crashed between verdict append and
            # the counts merge
            vlog.append(
                spark.createDataFrame(
                    [(99, "junk", 1, True)],
                    "doc_id long, source string, src_rank long, keep boolean",
                ),
                1,
            )  # half-written garbage the idempotent overwrite must clobber
        else:
            source_caps_batch(counts, vlog, b1, 1, cap)  # fully applied
            shutil.rmtree(os.path.join(vlog.root, "__batch_id=1"))
        source_caps_batch(counts, vlog, b1, 1, cap)  # (re)delivery
        source_caps_batch(counts, vlog, b2, 2, cap)
        got = {
            r["doc_id"]: (r["src_rank"], r["keep"])
            for r in vlog.read_latest().collect()
        }
        assert 99 not in got
        assert got[0] == (1, True) and got[1] == (2, True)
        assert got[2] == (1, True)
        assert got[3] == (3, False)  # a saturated at cap=2
        assert got[4] == (2, True) and got[5] == (1, True)
        assert got[6] == (4, False) and got[7] == (3, False)
        # counts converged to true arrival totals exactly once
        final = {r["source"]: r["n_seen"] for r in counts.read().collect()}
        assert final == {"a": 4, "b": 3, "c": 1}


def test_quality_drift_flags_bad_batch_and_retries_idempotently(
    spark, tmp_path
):
    """The drift monitor must flag a batch whose mean logit moves more
    than tol from the prior cumulative mean (division-free exact
    cross-multiplication), and the retry contract must hold across both
    crash windows (fenced cum merge; read_prev when already applied)."""
    import os
    import shutil
    from decimal import Decimal

    from duckdb_streaming_patterns_spark.operators.merge import (
        SummaryTable,
        UpsertLog,
    )
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        quality_drift_batch,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and then the dog "
        "sleeps while the fox runs away into the quiet green forest"
    )
    junk = "@#$% ^&*! )(*& ^%$# @!~` +_=- [];' ./,?"

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    b0 = mk([(0, good), (1, good + " again and again")])
    b1 = mk([(2, junk), (3, junk + " !!!")])  # quality collapses → drift
    b2 = mk([(4, good)])

    for crash in (None, "before_merge", "after_merge"):
        root = str(tmp_path / f"drift_{crash}")
        cum = SummaryTable(
            spark,
            os.path.join(root, "cum"),
            "n_docs long, sum_logit decimal(28,6), n_dropped long",
        )
        vlog = UpsertLog(
            spark, os.path.join(root, "verdicts"), keys=["batch_seq"],
            insert_only=True,
        )
        tol = Decimal("0.5")
        quality_drift_batch(cum, vlog, b0, 0, tol)
        if crash == "after_merge":
            quality_drift_batch(cum, vlog, b1, 1, tol)
            shutil.rmtree(os.path.join(vlog.root, "__batch_id=1"))
        quality_drift_batch(cum, vlog, b1, 1, tol)  # (re)delivery
        quality_drift_batch(cum, vlog, b2, 2, tol)
        got = {
            r["batch_seq"]: (r["drift"], r["n_docs"], r["n_dropped"])
            for r in vlog.read_latest().collect()
        }
        assert got[0][0] is False  # no baseline yet
        assert got[1] == (True, 2, 2), got  # junk batch drifts + drops
        assert got[2][0] is True  # recovery also ≥ tol from polluted mean
        final = cum.read().collect()[0]
        assert final["n_docs"] == 5 and final["n_dropped"] == 2


def test_quality_drift_empty_batch_emits_zero_row(spark, tmp_path):
    """ADVICE r5: a zero-row micro-batch (no-data trigger / empty retry
    epoch) aggregates to NULL sums; Decimal(None) raised a TypeError.
    An empty batch must emit its (n_docs=0, sum_logit=0, n_dropped=0,
    drift=false) row and leave the cumulative state unchanged."""
    import os
    from decimal import Decimal

    from duckdb_streaming_patterns_spark.operators.merge import (
        SummaryTable,
        UpsertLog,
    )
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        quality_drift_batch,
    )

    root = str(tmp_path)
    cum = SummaryTable(
        spark,
        os.path.join(root, "cum"),
        "n_docs long, sum_logit decimal(28,6), n_dropped long",
    )
    vlog = UpsertLog(
        spark, os.path.join(root, "verdicts"), keys=["batch_seq"],
        insert_only=True,
    )
    tol = Decimal("0.5")
    b0 = spark.createDataFrame(
        [(0, "a perfectly ordinary sentence about the weather today.")],
        "doc_id long, text string",
    )
    empty = b0.limit(0)
    quality_drift_batch(cum, vlog, b0, 0, tol)
    quality_drift_batch(cum, vlog, empty, 1, tol)  # must not raise
    got = {
        r["batch_seq"]: (r["n_docs"], float(r["sum_logit"]), r["drift"])
        for r in vlog.read_latest().collect()
    }
    assert got[1] == (0, 0.0, False), got
    final = cum.read().collect()[0]
    assert final["n_docs"] == 1  # empty batch added nothing


def test_semdedup_epoch_requantization_grows_cells_and_refolds(
    spark, sf_small, tmp_path
):
    """Round-5 VERDICT wrong-item 2: a quantizer frozen at batch 0 makes
    cell occupancy — and per-batch comparison work — grow linearly with
    the corpus. The epoch schedule must (a) write one codebook per
    epoch (power-of-2 boundaries ⇒ epochs 0..3 over 5 chunks), (b) grow
    the codebook to max(n_cells, ceil(√n_state)) anchors, and (c)
    re-fold the state log so every at-rest vector lives in its
    CURRENT-epoch cell directory (otherwise the DPP-pruned comparison
    joins on stale cells and silently misses matches)."""
    import glob
    import json
    import math
    import os

    from duckdb_streaming_patterns_spark.sources.tables import load_table
    from duckdb_streaming_patterns_spark.streaming import staging
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        pattern_streaming_semdedup,
        semdedup_state_logs,
    )

    run = staging.new_run_dir("psem_epoch_t")
    chunks = staging.stage_embedding_chunks(spark, sf_small, run, n_chunks=5)
    out = pattern_streaming_semdedup(
        spark, chunks, run, threshold=0.35, n_cells=16, state_partitions=4
    )
    n = load_table(spark, sf_small, "embeddings").count()
    assert out.count() == n
    per = math.ceil(n / 5)
    quant = os.path.join(run, "quant")
    # (a) one codebook per epoch; boundaries at batches 1, 2, 4
    books = sorted(os.path.basename(p) for p in glob.glob(
        os.path.join(quant, "anchors_e*.json")))
    assert books == [f"anchors_e{e}.json" for e in range(4)], books
    for e in (1, 2, 3):
        assert os.path.exists(os.path.join(quant, f"refold_e{e}.done"))
    # (b) codebook growth: epoch 0 = n_cells; epoch e trains on the
    # state before batch 2^(e-1) with max(16, ceil(sqrt(n_before)))
    with open(os.path.join(quant, "anchors_e0.json")) as f:
        assert len(json.load(f)) == 16
    with open(os.path.join(quant, "anchors_e3.json")) as f:
        e3 = json.load(f)
    n_before_e3 = min(n, 4 * per)
    assert len(e3) == max(16, math.ceil(math.sqrt(n_before_e3))), len(e3)
    # (c) the at-rest state's cell layout is the CURRENT epoch's: every
    # cell_id directory names an epoch-3 anchor id
    vecs_log, _ = semdedup_state_logs(spark, run)
    cell_ids = {
        r["cell_id"]
        for r in vecs_log.read_latest().select("cell_id").distinct().collect()
    }
    assert cell_ids <= {int(a) for a, _ in e3}, cell_ids


def test_insert_only_compact_crash_mid_gc_has_no_duplicates(spark, tmp_path):
    """compact()'s old crash argument — surviving source dirs 'outrank
    the base' — only holds for last-writer-wins logs. An INSERT-ONLY
    read is a plain scan, so base + a not-yet-deleted source dir meant
    DUPLICATED rows for every read until someone noticed. The fold
    manifest (_folds.json, committed atomically with the base's rename)
    must make the surviving source logically dead: reads stay exact,
    stay scan-shaped (the dead-id exclusion is a partition filter, not a
    resolve), and the next compact heals the straggler."""
    import contextlib
    import io
    import os

    from pyspark.sql import functions as F

    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    from duckdb_streaming_patterns_spark.operators import merge as merge_mod

    # in-place GC path pinned (see gc-crash test above)
    log = UpsertLog(
        spark, str(tmp_path / "io"), keys=["id"], insert_only=True,
        deferred_gc=False,
    )
    r0 = spark.range(0, 4).select("id", (F.col("id") * 10).alias("v"))
    r1 = spark.range(4, 8).select("id", (F.col("id") * 10).alias("v"))
    log.append(r0, 0)
    log.append(r1, 1)
    want = {tuple(r) for r in log.read_latest().collect()}
    # crash simulation: compact()'s fold commits (base renamed, manifest
    # inside) but the GC dies before removing __batch_id=1 — a REAL
    # mid-GC crash via monkeypatched rmtree, so the surviving manifest
    # still covers the spared dir (appending after a clean compact would
    # instead recreate a LIVE dir 1: the pruned manifest no longer lists
    # it, and reads genuinely duplicate rows 4-7)
    real_rmtree = merge_mod.shutil.rmtree
    spared = os.path.join(log.root, "__batch_id=1")

    def crashy_rmtree(path, **kw):
        if os.path.abspath(path) == os.path.abspath(spared):
            return
        real_rmtree(path, **kw)

    merge_mod.shutil.rmtree = crashy_rmtree
    try:
        log.compact()
    finally:
        merge_mod.shutil.rmtree = real_rmtree
    assert os.path.isdir(spared)
    got = log.read_latest()
    # count FIRST: a dead-filter regression duplicates rows 4-7, which a
    # set-compare cannot see (round-6 ADVICE item 1)
    assert got.count() == len(want)
    assert {tuple(r) for r in got.collect()} == want  # no duplicates
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p and "Window" not in p, p  # still scan-shaped
    # scoped reads exclude the dead dir too (the retry contract): the
    # spared dir id 1 would pass the __batch_id < 2 filter were it not
    # dead-excluded, so a duplicate here means the dead filter regressed
    scoped = log.read_latest(before_batch=2)
    assert scoped.count() == len(want)
    assert {tuple(r) for r in scoped.collect()} == want
    # a boundary strictly INSIDE the base's folded span is a contract
    # violation (batch-1 rows would leak into a batch-1 retry) — the
    # round-8 straddle guard refuses it instead of leaking
    import pytest

    with pytest.raises(RuntimeError, match="straddles"):
        log.read_latest(before_batch=1).count()
    # the next compact's opening dead-dir sweep (round 11, shared with
    # maintain) collects the straggler WITHOUT re-folding — the base
    # already holds its rows, so the cheap recovery is a delete, not a
    # rewrite; with only the base left there is nothing to fold
    log.compact()
    assert sorted(os.listdir(log.root)) == ["__batch_id=-1"]
    healed = log.read_latest()
    assert healed.count() == len(want)
    assert {tuple(r) for r in healed.collect()} == want


def test_sessionization_lww_maintenance_fires_and_preserves_results(
    spark, sf_small
):
    """Round-6 verdict item 2, wired end-to-end: the registered
    sessionization parameterization (cadence 2 / fanout 2) fires
    ADJACENT-RANGE tiered merges over the LWW session-summary log
    mid-stream, and the resolved sessions are identical to a
    maintenance-free twin run — the merge machinery preserves every
    last-writer-wins decision, proven on the real pattern, not just the
    log unit tests."""
    import glob as _glob
    import json as _json

    run_m = staging.new_run_dir("t_pss_maint")
    chunks_m = staging.stage_event_chunks(
        spark, sf_small, run_m, n_chunks=5, order_col="ts"
    )
    with_m = patterns.pattern_streaming_sessionization(
        spark, chunks_m, run_m, state_partitions=4,
        compact_every=2, maintain_fanout=2,
    )
    rows_m = {tuple(r) for r in with_m.collect()}
    assert with_m.count() == len(rows_m)
    manifests = _glob.glob(
        os.path.join(run_m, "summary", "__batch_id=*", "_folds.json")
    )
    assert manifests, "no tiered merge fired over the session log"
    for mf in manifests:
        with open(mf) as f:
            m = _json.load(f)
        assert "range" in m, m  # LWW merges must record their span
    run_0 = staging.new_run_dir("t_pss_nomaint")
    chunks_0 = staging.stage_event_chunks(
        spark, sf_small, run_0, n_chunks=5, order_col="ts"
    )
    without = patterns.pattern_streaming_sessionization(
        spark, chunks_0, run_0, state_partitions=4, compact_every=0,
    )
    assert rows_m == {tuple(r) for r in without.collect()}


def test_full_funnel_maintenance_fires_and_preserves_results(
    spark, sf_small
):
    """Round-6 verdict item 4: the composed five-verdict funnel's
    registered parameterization (cadence 2 / fanout 2) fires tiered
    merges over its state logs mid-stream; the verdicts equal a
    maintenance-free twin run."""
    import glob as _glob

    from duckdb_streaming_patterns_spark.functions.text import shingles
    from duckdb_streaming_patterns_spark.operators import dedup as dedup_ops

    docs = load_table(spark, sf_small, "documents")
    bench_g = (
        docs.filter(F.col("doc_id") < 50)
        .select(F.explode(shingles(F.col("text"), k=8)).alias("g"))
        .distinct()
    )
    bitset = dedup_ops.bloom_build(bench_g, "g")

    run_m = staging.new_run_dir("t_ff_maint")
    chunks_m = staging.stage_document_chunks(spark, sf_small, run_m, n_chunks=5)
    with_m = patterns.pattern_streaming_full_funnel(
        spark, chunks_m, run_m, bitset, threshold=0.7, state_partitions=4,
        compact_every=2, maintain_fanout=2,
    )
    rows_m = {tuple(r) for r in with_m.collect()}
    merged = []
    for logname in ("seen", "bands", "docs", "verdicts"):
        merged += _glob.glob(
            os.path.join(run_m, logname, "__batch_id=*", "_folds.json")
        )
    assert merged, "no tiered merge fired over any funnel state log"

    run_0 = staging.new_run_dir("t_ff_nomaint")
    chunks_0 = staging.stage_document_chunks(spark, sf_small, run_0, n_chunks=5)
    without = patterns.pattern_streaming_full_funnel(
        spark, chunks_0, run_0, bitset, threshold=0.7, state_partitions=4,
        compact_every=0,
    )
    assert rows_m == {tuple(r) for r in without.collect()}


def test_snapshot_reads_are_ledger_scoped_never_list_data_dir(
    spark, tmp_path
):
    """Round-6 verdict item 1: SnapshotTable reads enumerate data paths
    from the _snapshots ledger instead of hive-discovering the data dir.
    An orphan directory dropped on disk (a shape hive discovery would
    list and read) is NEVER touched: it appears in no scan's input
    files, and reads return exactly the ledger-committed rows."""
    root = str(tmp_path / "ledger_scoped")
    t = SnapshotTable(spark, root, "id long, v string")
    for i in range(3):
        t.append(
            spark.createDataFrame(
                [(i * 10 + j, f"s{i}") for j in range(4)], "id long, v string"
            ),
            batch_id=i,
        )
    # orphan: a plausible-looking snapshot dir with a POISON payload (an
    # incompatible schema) that is in no ledger entry — hive discovery
    # would list it; the ledger reader must never build its path
    orphan = os.path.join(t.data_dir, "snapshot_id=99")
    spark.createDataFrame(
        [("poison", 1.5)], "wrong string, cols double"
    ).write.parquet(orphan)
    got = t.read()
    assert got.count() == 12
    for fp in got.inputFiles():
        assert "snapshot_id=99" not in fp, fp
    cdf = t.table_changes(0, 2)
    assert cdf.count() == 8
    for fp in cdf.inputFiles():
        assert "snapshot_id=99" not in fp, fp
        assert "snapshot_id=0" not in fp, fp  # range-scoped too
    # time travel is ledger-scoped the same way
    asof = t.read_as_of(1)
    assert asof.count() == 8
    for fp in asof.inputFiles():
        assert "snapshot_id=99" not in fp and "snapshot_id=2" not in fp, fp


def test_snapshot_partition_scoped_read_touches_only_named_leaf_dirs(
    spark, tmp_path
):
    """The ledger records each append's partition subdirs (a directory-
    granularity file manifest); a partition_values-scoped read builds
    leaf paths from it — the ANN probe touches O(snapshots × probed
    cells) dirs, never the whole layout."""
    root = str(tmp_path / "leaf_scoped")
    t = SnapshotTable(
        spark, root, "id long, cell_id long", partition_cols=["cell_id"]
    )
    for i in range(3):
        t.append(
            spark.createDataFrame(
                [(i * 10 + j, j % 3) for j in range(6)], "id long, cell_id long"
            ),
            batch_id=i,
        )
    # ledger entries carry the partition-dir manifest
    for s in t.snapshots():
        assert s.get("partitions") == [
            "cell_id=0", "cell_id=1", "cell_id=2"
        ], s
    got = t.read(partition_values={"cell_id": [1]})
    assert got.count() == 6  # 2 rows per snapshot in cell 1
    assert {r["cell_id"] for r in got.collect()} == {1}
    for fp in got.inputFiles():
        assert "/cell_id=1" in fp, fp
    # a probed-but-absent value is skipped by the existence stat, not an error
    got2 = t.read(partition_values={"cell_id": [1, 7]})
    assert got2.count() == 6


def test_snapshot_vacuum_pruned_dirs_are_skipped_by_ledger_reader(
    spark, tmp_path
):
    """vacuum() can prune a snapshot's dir entirely (all rows
    tombstoned): the ledger still names it, and the reader's existence
    stat must skip it instead of crashing on a missing path."""
    from pyspark.sql import functions as F

    root = str(tmp_path / "vac_pruned")
    t = SnapshotTable(spark, root, "id long, grp string")
    t.append(
        spark.createDataFrame([(i, "a") for i in range(4)], "id long, grp string"),
        batch_id=0,
    )
    t.append(
        spark.createDataFrame([(i, "b") for i in range(4, 8)], "id long, grp string"),
        batch_id=1,
    )
    t.delete(F.col("grp") == "a", key_cols=["id"], batch_id=2)
    t.vacuum()
    # snapshot 0's rows were all deleted → its dir is gone from the new
    # generation even though the ledger names it
    assert not os.path.exists(os.path.join(t.data_dir, "snapshot_id=0"))
    got = t.read()
    assert got.count() == 4
    assert {r["grp"] for r in got.collect()} == {"b"}
    assert t.table_changes(-1, t.max_snapshot_id()).count() == 4


def test_ledger_checkpointing_bounds_opens_per_read(spark, tmp_path):
    """Round-7 verdict item 1: the ledger itself must not become the
    O(stream-age) read cost. With checkpointing, a single read() opens
    O(checkpoint_every) ledger files — the newest checkpoint plus the
    loose suffix — no matter how many snapshots the stream ever
    committed, and loose files the checkpoint covers are deleted."""
    import builtins

    root = str(tmp_path / "ckpt")
    t = SnapshotTable(spark, root, "id long, v string", checkpoint_every=8)
    for i in range(30):
        t.append(
            spark.createDataFrame([(i, f"s{i}")], "id long, v string"),
            batch_id=i,
        )
    # log cleanup happened: exactly one checkpoint survives, and the
    # loose files are only the suffix it does not cover
    names = sorted(os.listdir(t.ledger_dir))
    ckpts = [n for n in names if n.startswith("checkpoint-")]
    loose = [n for n in names if n.endswith(".json") and n not in ckpts]
    assert len(ckpts) == 1, names
    ckpt_sid = int(ckpts[0][len("checkpoint-"):-len(".json")])
    assert all(int(n[:-len(".json")]) > ckpt_sid for n in loose), names
    assert len(loose) < 8, names
    # the folded view is complete and ordered
    snaps = t.snapshots()
    assert [s["snapshot_id"] for s in snaps] == list(range(30))

    real_open = builtins.open
    opened: list[str] = []

    def counting_open(file, *a, **kw):
        if isinstance(file, str) and "_snapshots" in file:
            opened.append(file)
        return real_open(file, *a, **kw)

    builtins.open = counting_open
    try:
        got = t.read()
        n = got.count()
    finally:
        builtins.open = real_open
    assert n == 30
    # one snapshots() scan per read: 1 checkpoint + len(loose) entries
    assert len(opened) <= 8 + 1, opened


def test_vacuum_flag_survives_checkpoint_fold(spark, tmp_path):
    """vacuum() mutates already-committed ledger entries in place; a
    loose rewrite must override the checkpoint's stale copy, and the
    NEXT checkpoint must fold the mutation in. Reads stay correct at
    every stage (no anti-join against a retired tombstone dir)."""
    root = str(tmp_path / "ckpt_vac")
    t = SnapshotTable(spark, root, "id long, grp string", checkpoint_every=4)
    for i in range(6):  # crosses a checkpoint at 4 loose entries
        t.append(
            spark.createDataFrame(
                [(i * 10 + j, "a" if j % 2 else "b") for j in range(4)],
                "id long, grp string",
            ),
            batch_id=i,
        )
    t.delete(F.col("grp") == "a", key_cols=["id"], batch_id=100)
    assert t.read().count() == 12
    t.vacuum()
    # the delete entry (and every pre-vacuum entry) is now flagged; the
    # flag came from loose overrides and/or the post-vacuum checkpoint
    flagged = [s for s in t.snapshots() if s.get("kind") == "delete"]
    assert flagged and all(s.get("vacuumed") for s in flagged)
    assert t.read().count() == 12
    # force another checkpoint cycle on top of the mutated entries
    for i in range(6, 12):
        t.append(
            spark.createDataFrame(
                [(i * 10 + j, "c") for j in range(2)], "id long, grp string"
            ),
            batch_id=i,
        )
    flagged = [s for s in t.snapshots() if s.get("kind") == "delete"]
    assert flagged and all(s.get("vacuumed") for s in flagged)
    assert t.read().count() == 12 + 12
    assert t._tombstones(t.max_snapshot_id()) == []


def test_maintenance_only_checkpoint_windows_never_serve_or_bake_stale_state(
    spark, tmp_path
):
    """Code-review r8: a checkpoint window fed ENTIRELY by in-place
    re-commits (expire/vacuum flag mutations — no new snapshot id) used
    to rewrite ``checkpoint-<top>.json`` under its existing name while
    ``snapshots()``'s parse cache stayed keyed on that name: every later
    read served the pre-mutation entries, and a SECOND such window
    rebuilt the checkpoint from the stale cache — permanently dropping
    the first window's mutations from disk. Checkpoint filenames are now
    write-once (a same-top re-checkpoint gets a monotonic suffix) and
    the writer refreshes the cache with what it just wrote."""
    root = str(tmp_path / "ckpt_stale")
    t = SnapshotTable(spark, root, "id long, v string", checkpoint_every=2)
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"), batch_id=0)
    t.append(spark.createDataFrame([(2, "b")], "id long, v string"), batch_id=1)
    assert any(n.startswith("checkpoint-") for n in os.listdir(t.ledger_dir))
    # window 1: only re-commits of existing ids — top does not move
    for s in t.snapshots():
        s["m1"] = True
        t._commit_ledger(s)
    assert all(s.get("m1") for s in t.snapshots()), "stale cache served"
    # window 2 folds whatever the writer's view holds back onto disk
    for s in t.snapshots():
        s["m2"] = True
        t._commit_ledger(s)
    fresh = SnapshotTable(spark, root, "id long, v string", checkpoint_every=2)
    assert all(
        s.get("m1") and s.get("m2") for s in fresh.snapshots()
    ), "window-1 mutations were baked away on disk"


def test_expire_flags_visible_after_maintenance_only_checkpoint(
    spark, tmp_path
):
    """End-to-end form of the same bug: expire_snapshots' step-4
    re-commits can cross the checkpoint cadence by themselves. The
    expiry flags must be visible to the SAME instance afterwards
    (read_as_of before the horizon raises) and survive a reopen."""
    import pytest

    root = str(tmp_path / "ckpt_exp")
    t = SnapshotTable(spark, root, "id long, v string", checkpoint_every=2)
    for i in range(4):
        t.append(
            spark.createDataFrame([(i, f"v{i}")], "id long, v string"),
            batch_id=i,
        )
    t.expire_snapshots()
    with pytest.raises(ValueError):
        t.read_as_of(0)
    assert t.read().count() == 4
    fresh = SnapshotTable(spark, root, "id long, v string", checkpoint_every=2)
    assert [bool(s.get("expired")) for s in fresh.snapshots()] == [
        True,
        True,
        True,
        False,
    ]


def test_partition_values_filter_guarantees_semantics_without_manifest(
    spark, tmp_path
):
    """ADVICE r7 (medium): partition_values was pure path pruning — a
    snapshot with no partition manifest fell back to its whole dir and
    leaked rows outside the requested values. table_changes now applies
    an explicit value filter on top of the prune."""
    root = str(tmp_path / "pv_sem")
    t = SnapshotTable(spark, root, "id long, cell long")  # no partition_cols
    t.append(
        spark.createDataFrame(
            [(j, j % 3) for j in range(9)], "id long, cell long"
        ),
        batch_id=0,
    )  # appended UNpartitioned: ledger entry has no 'partitions' manifest
    assert "partitions" not in t.snapshots()[0]
    got = t.read(partition_values={"cell": [1]})
    assert got.count() == 3
    assert {r["cell"] for r in got.collect()} == {1}


def test_partition_values_on_non_partition_column_still_correct(
    spark, tmp_path
):
    """ADVICE r7 (medium), second hole: requesting a column that is NOT
    the snapshot's first-level partition column used to yield zero
    candidate paths — silently dropping every manifest-bearing snapshot.
    The prune now detects inapplicability and reads the whole dir; the
    explicit filter delivers the semantics."""
    root = str(tmp_path / "pv_other")
    t = SnapshotTable(
        spark, root, "id long, cell long", partition_cols=["cell"]
    )
    for i in range(2):
        t.append(
            spark.createDataFrame(
                [(i * 10 + j, j % 2) for j in range(4)], "id long, cell long"
            ),
            batch_id=i,
        )
    assert t.snapshots()[0].get("partitions")  # manifest present
    got = t.read(partition_values={"id": [3, 11]})
    assert sorted(r["id"] for r in got.collect()) == [3, 11]


def test_zero_row_append_dirs_do_not_poison_reads(spark, tmp_path):
    """ADVICE r7 (low): a zero-row append commits a ledger entry whose
    dir may hold no parquet part files; when every dir in range is such,
    enumerating them broke schema inference. The reader skips rows==0
    entries and falls back to the typed empty frame."""
    root = str(tmp_path / "zero_row")
    t = SnapshotTable(spark, root, "id long, v string")
    t.append(spark.createDataFrame([], "id long, v string"), batch_id=0)
    got = t.read()  # only snapshot in range is the empty one
    assert got.count() == 0
    assert "id" in got.columns and "snapshot_id" in got.columns
    t.append(
        spark.createDataFrame([(1, "x")], "id long, v string"), batch_id=1
    )
    assert t.read().count() == 1
    assert t.table_changes(-1, 0).count() == 0


def test_read_latest_raises_on_before_batch_straddling_merged_span(
    spark, tmp_path
):
    """Round-7 verdict hardening #4: a merged dir is admitted by its
    synthetic (below-all) dir id, so a before_batch that falls strictly
    inside a live fold's raw-id span would silently leak fenced rows.
    In-repo loops always maintain(before_batch=b) before appending b —
    this guard turns a violation of that invariant into an error."""
    import pytest
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    for flavor, kw in [("lww", {}), ("io", {"insert_only": True})]:
        log = UpsertLog(spark, str(tmp_path / flavor), keys=["k"], **kw)
        for b in range(2):
            log.append(
                spark.createDataFrame([(f"k{b}", b)], "k string, v int"), b
            )
        assert log.maintain(fanout=2) == 1  # folds batches [0, 1]
        # boundary INSIDE the span -> refuse
        with pytest.raises(RuntimeError, match="straddles"):
            log.read_latest(before_batch=1).count()
        # boundary at/above the span top -> fine
        assert log.read_latest(before_batch=2).count() == 2
        assert log.read_latest().count() == 2


def test_insert_only_manifest_span_is_ignored_for_lww_ranking(
    spark, tmp_path
):
    """ADVICE r7 (low): insert-only maintain() merges the F OLDEST dirs
    of a tier — not an adjacent run — so its manifest span is only a
    bounding box. The manifest now records the flavor, and reopening the
    same root with insert_only=False must not consume those spans for
    LWW ranking (the old bug re-ranked rows at the bounding-box top)."""
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    root = str(tmp_path / "io_reopen")
    io_log = UpsertLog(spark, root, keys=["k"], insert_only=True)
    for b in range(3):
        io_log.append(
            spark.createDataFrame([(f"k{b}", b)], "k string, v int"), b
        )
    assert io_log.maintain(fanout=2) == 1  # folds oldest two dirs
    mf = io_log._fold_ranges()
    assert len(mf) == 1
    (lo, hi, io_flag), = mf.values()
    assert io_flag and (lo, hi) == (0, 1)
    # reopen as LWW: the insert-only span contributes no fold order
    lww_view = UpsertLog(spark, root, keys=["k"])
    assert lww_view._fold_orders() == {}
    assert sorted(
        (r["k"], r["v"]) for r in lww_view.read_latest().collect()
    ) == [("k0", 0), ("k1", 1), ("k2", 2)]


def test_semdedup_epoch_requantizer_handles_distribution_drift(
    spark, sf_small, tmp_path
):
    """Round-6 verdict item 7 (adversarial drift): the embedding
    distribution SHIFTS mid-stream — from chunk 2 onward every vector's
    coordinates are cyclically rotated by dim/2, so epochs 2-3 see a
    half-space epoch 0-1 never did. The epoch re-quantizer must (a)
    still produce verdicts that exactly match the replayed-schedule
    oracle on the same drifted input (the oracle SQL replays the md5
    anchor schedule, so it adapts to any distribution), and (b) keep
    per-batch cost bounded: post-drift codebooks sample anchors FROM the
    drifted region, so drifted vectors spread across cells instead of
    piling into whichever stale cell is nearest (the occupancy collapse
    that makes same-cell comparison quadratic)."""
    import math

    import duckdb

    from duckdb_streaming_patterns_spark.queries import QUERIES
    from duckdb_streaming_patterns_spark.sources.tables import load_table
    from duckdb_streaming_patterns_spark.streaming import staging
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        pattern_streaming_semdedup,
        semdedup_state_logs,
    )

    emb = load_table(spark, sf_small, "embeddings")
    n = emb.count()
    per = math.ceil(n / 5)
    shifted = F.expr(
        "concat("
        " slice(embedding, cast(size(embedding)/2 as int) + 1,"
        "       cast(size(embedding)/2 as int)),"
        " slice(embedding, 1, cast(size(embedding)/2 as int)))"
    )
    drifted = emb.withColumn(
        "embedding",
        F.when(F.col("vec_id") >= 2 * per, shifted).otherwise(
            F.col("embedding")
        ),
    )
    sfdir = str(tmp_path / "sf_drift")
    os.makedirs(sfdir)
    drifted.coalesce(1).write.parquet(os.path.join(sfdir, "embeddings.parquet"))

    run = str(tmp_path / "run")
    chunks = staging.stage_embedding_chunks(spark, sfdir, run, n_chunks=5)
    out = pattern_streaming_semdedup(
        spark, chunks, run, threshold=0.35, n_cells=16, state_partitions=4
    )
    spdf = out.toPandas()
    assert len(spdf) == n

    # (a) exact match vs the replayed-schedule oracle ON THE DRIFTED data
    _, osql = QUERIES["pattern_streaming_semdedup"]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sfdir}/embeddings.parquet/*.parquet')"
    )
    odf = con.execute(osql).fetchdf()

    def canon(d):
        d = d.reindex(sorted(d.columns), axis=1)
        return d.astype(str).sort_values(list(d.columns)).reset_index(drop=True)

    assert canon(spdf).equals(canon(odf)), "drifted verdicts diverge from oracle"

    # (b) the post-drift codebook sampled the drifted region: epoch 3
    # trains on ids < 4*per, of which [2*per, 4*per) are drifted
    import glob
    import json as _json

    books = sorted(glob.glob(os.path.join(run, "quant", "anchors_e*.json")))
    with open(books[-1]) as f:
        anchors = _json.load(f)
    drifted_anchors = [a for a, _ in anchors if int(a) >= 2 * per]
    assert len(drifted_anchors) >= 2, (
        f"final codebook has no drifted-region anchors: {sorted(a for a, _ in anchors)}"
    )
    # drifted vectors spread across multiple cells under the final epoch
    vecs_log, _ = semdedup_state_logs(spark, run)
    cells = {
        r["cell_id"]
        for r in vecs_log.read_latest()
        .filter(F.col("vec_id") >= 2 * per)
        .select("cell_id")
        .distinct()
        .collect()
    }
    assert len(cells) >= 4, f"drifted vectors collapsed into cells {cells}"


def test_expire_snapshots_folds_history_and_bounds_paths(spark, tmp_path):
    """Round-8: expire_snapshots folds every snapshot <= through into one
    base dir (the ducklake_delete_old_snapshots analogue), applying and
    retiring in-range tombstones. Reads stay exact, the live path count
    drops to fold + tail, time travel before the fold raises, and the
    batch-id retry fence survives (entries are marked, never deleted)."""
    import pytest

    root = str(tmp_path / "expire")
    t = SnapshotTable(
        spark, root, "id long, cell long", partition_cols=["cell"]
    )
    for i in range(6):
        t.append(
            spark.createDataFrame(
                [(i * 10 + j, j % 2) for j in range(4)], "id long, cell long"
            ),
            batch_id=i,
        )
    t.delete(F.col("id") == 11, key_cols=["id"], batch_id=100)  # sid 6
    before = {tuple(r) for r in t.read().select("id", "cell").collect()}
    assert len(before) == 23  # 24 rows - 1 tombstoned

    fold = t.expire_snapshots(through=4)
    assert fold == 4
    after = {tuple(r) for r in t.read().select("id", "cell").collect()}
    assert after == before
    # live DATA paths: only the fold dir and the post-fold snapshot
    # (the sid-6 tombstone is > fold, so its anti-join scan stays live)
    files = [f for f in t.read().inputFiles() if "_tombstones" not in f]
    assert files
    for fp in files:
        assert "/snapshot_id=4/" in fp or "/snapshot_id=5/" in fp, fp
    # partition-scoped probe still correct and scoped
    got = t.read(partition_values={"cell": [1]})
    assert {r["cell"] for r in got.collect()} == {1}
    assert got.count() == 11  # 12 cell-1 rows - tombstoned id 11
    # ledger state: pre-fold inserts expired, tombstone retired
    snaps = {s["snapshot_id"]: s for s in t.snapshots()}
    assert all(snaps[i].get("expired") for i in range(4))
    assert not snaps[4].get("expired")
    assert snaps[4]["expired_through"] == 4
    # the sid-6 tombstone is AFTER the fold horizon: it stays live (its
    # anti-join still kills the re-stamped fold rows, which sit at 4 < 6)
    assert "vacuumed" not in snaps[6]
    assert len(t._tombstones(t.max_snapshot_id())) == 1
    # retry fence survives expiry
    assert t.append(spark.createDataFrame([(99, 0)], "id long, cell long"),
                    batch_id=2) == -1
    # time travel: before the fold raises, at/after the fold works
    with pytest.raises(ValueError, match="expired"):
        t.read_as_of(3)
    # tombstone 6 does not time-travel back to 4: all 20 rows visible
    assert t.read_as_of(4).count() == 20
    # CDF: the folded rows report as one change at the fold id
    cdf = t.table_changes(-1, 4)
    assert cdf.count() == 20
    assert {r["snapshot_id"] for r in cdf.select("snapshot_id").collect()} == {4}
    # a second expiry (the retry shape) clamps to the newest INSERT
    # snapshot and preserves results
    assert t.expire_snapshots() == 5
    assert {
        tuple(r) for r in t.read().select("id", "cell").collect()
    } == before


def test_expire_crash_before_swap_keeps_history_travellable(
    spark, tmp_path, monkeypatch
):
    """Round-9 (ADVICE): expired_through must stamp AFTER the generation
    swap — a pre-swap crash leaves every folded snapshot intact in the
    still-live old generation, and a full read must keep serving it.
    Round-11 (ADVICE): read_as_of now honors the pending marker the
    crashed expiry left behind, so pre-fold time travel REFUSES until
    the expiry is retried (the recoverable trade that closes the
    post-swap silent-partial window the sibling test covers)."""
    import pytest

    root = str(tmp_path / "expcrash")
    t = SnapshotTable(spark, root, "id long, v long")
    for i in range(4):
        t.append(
            spark.createDataFrame([(i, i * 10)], "id long, v long"),
            batch_id=i,
        )

    real_replace = os.replace

    def crash_on_pointer_swap(src, dst):
        if dst == t._pointer_path:
            raise OSError("injected crash at pointer swap")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", crash_on_pointer_swap)
    with pytest.raises(OSError, match="injected crash"):
        t.expire_snapshots(through=2)
    monkeypatch.undo()

    # The old generation is still live and fully intact: full read
    # unchanged, and no FINAL horizon stamp leaked into the ledger.
    assert t.read().count() == 4
    assert all(
        s.get("expired_through", -1) == -1 and not s.get("expired")
        for s in t.snapshots()
    )
    # But the in-flight marker committed pre-swap, so pre-fold time
    # travel refuses (conservative: the history is readable, the refusal
    # recoverable) until the expiry settles; at/after the fold id works.
    assert max(
        s.get("pending_expired_through", -1) for s in t.snapshots()
    ) == 2
    with pytest.raises(ValueError, match="expired"):
        t.read_as_of(1)
    assert t.read_as_of(2).count() == 3
    # Retrying the expiry (the crash-retry shape) completes and only
    # then advances the horizon.
    assert t.expire_snapshots(through=2) == 2
    with pytest.raises(ValueError, match="expired"):
        t.read_as_of(1)
    assert t.read().count() == 4


def test_expire_crash_after_swap_keeps_cdf_guard_armed(spark, tmp_path):
    """Round-10 (ADVICE): a crash between the generation swap (folded
    history physically gone) and the expired_through stamp used to leave
    the table_changes double-count guard inert — a stale incremental
    cursor would silently re-receive the re-stamped fold as "new" rows.
    The pending_expired_through marker commits BEFORE the swap, so the
    guard is armed across the whole window. Round-11 (ADVICE):
    read_as_of honors the marker too — in THIS window the folded dirs
    are physically gone, so a pre-fold travel would stat-drop them and
    silently return a partial (here: empty) table."""
    import pytest

    root = str(tmp_path / "expcrash2")
    t = SnapshotTable(spark, root, "id long, v long")
    for i in range(4):
        t.append(
            spark.createDataFrame([(i, i * 10)], "id long, v long"),
            batch_id=i,
        )

    real_io = t.io

    class CrashAfterSwapIO:
        def __getattr__(self, name):
            return getattr(real_io, name)

        def swap_pointer(self, path, obj, expected=None):
            real_io.swap_pointer(path, obj, expected=expected)
            raise OSError("injected crash after pointer swap")

    t.io = CrashAfterSwapIO()
    with pytest.raises(OSError, match="after pointer swap"):
        t.expire_snapshots(through=2)
    t.io = real_io

    # The swap landed: current reads serve the folded generation intact.
    assert t.read().count() == 4
    # expired_through never stamped — but the guard must STILL refuse
    # the stale cursor (this was the silent-double-count hole).
    snaps = t.snapshots()
    assert max(s.get("expired_through", -1) for s in snaps) == -1
    assert max(s.get("pending_expired_through", -1) for s in snaps) == 2
    with pytest.raises(ValueError, match="double-count"):
        t.table_changes(1, 3)
    # read_as_of below the pending horizon refuses too — its folded
    # dirs are gone; without the guard this returned an EMPTY table.
    with pytest.raises(ValueError, match="expired"):
        t.read_as_of(1)
    assert t.read_as_of(2).count() == 3
    # full reads and at/after-horizon cursors stay valid
    assert t.table_changes(-1, 3).count() == 4
    assert t.table_changes(2, 3).count() == 1
    # the retry completes, clears the marker, and stamps for real
    assert t.expire_snapshots(through=2) == 2
    snaps = t.snapshots()
    assert max(s.get("expired_through", -1) for s in snaps) == 2
    assert max(s.get("pending_expired_through", -1) for s in snaps) == -1
    with pytest.raises(ValueError, match="double-count"):
        t.table_changes(1, 3)
    assert t.read().count() == 4


def test_table_changes_guards_expired_incremental_cursor(spark, tmp_path):
    """Round-9 (ADVICE medium): an incremental CDF cursor below the
    expire_snapshots horizon raises instead of silently double-counting
    the folded history (which was re-stamped at the fold id). Full
    reads (from=-1) and cursors at/after the horizon stay valid."""
    import pytest

    root = str(tmp_path / "cdfguard")
    t = SnapshotTable(spark, root, "id long, v long")
    for i in range(5):
        t.append(
            spark.createDataFrame([(i, i * 10)], "id long, v long"),
            batch_id=i,
        )
    # an incremental consumer consumed through snapshot 1...
    assert t.table_changes(1, 4).count() == 3
    # ...then retention folds history through snapshot 3
    assert t.expire_snapshots(through=3) == 3
    # resuming the stale cursor would re-receive snapshots 0-3's rows
    # re-stamped at 3: refuse it
    with pytest.raises(ValueError, match="double-count"):
        t.table_changes(1, 4)
    # full read and at-horizon cursor both fine and exact
    assert t.table_changes(-1, 4).count() == 5
    assert t.table_changes(3, 4).count() == 1


def test_table_changes_partition_scopes_delete_side(spark, tmp_path):
    """Round-9 (ADVICE): partition_values must scope BOTH sides of the
    change feed — tombstone key rows from other partitions must not
    leak into a partition-scoped include_deletes read (when the
    partition column is among the tombstone's key columns)."""
    root = str(tmp_path / "cdfdelscope")
    t = SnapshotTable(
        spark, root, "id long, cell long", partition_cols=["cell"]
    )
    t.append(
        spark.createDataFrame(
            [(i, i % 2) for i in range(8)], "id long, cell long"
        ),
        batch_id=0,
    )
    # tombstone keyed WITH the partition column: one key per cell
    t.delete(F.col("id").isin(0, 1), key_cols=["id", "cell"], batch_id=1)
    feed = t.table_changes(
        0, t.max_snapshot_id(), include_deletes=True,
        partition_values={"cell": [1]},
    )
    rows = feed.collect()
    # only the cell-1 tombstone key row; the cell-0 one (id 0) is scoped out
    assert len(rows) == 1
    assert rows[0]["_change_type"] == "delete"
    assert rows[0]["id"] == 1 and rows[0]["cell"] == 1
    # tombstone keyed WITHOUT the partition column cannot be scoped:
    # its key rows are emitted whole (documented pass-through)
    t.delete(F.col("id") == 7, key_cols=["id"], batch_id=2)
    feed2 = t.table_changes(
        1, t.max_snapshot_id(), include_deletes=True,
        partition_values={"cell": [1]},
    )
    assert [r["id"] for r in feed2.collect()] == [7]


def test_snapshots_checkpoint_cache_is_mutation_proof(spark, tmp_path):
    """Round-9: entries served from the checkpoint parse-cache must not
    alias it — a caller mutating a returned entry's nested lists
    (partitions/columns) in place must not corrupt later reads."""
    root = str(tmp_path / "ckptcache")
    t = SnapshotTable(
        spark, root, "id long, cell long",
        partition_cols=["cell"], checkpoint_every=2,
    )
    for i in range(4):  # enough commits to cross the checkpoint cadence
        t.append(
            spark.createDataFrame(
                [(i, 0), (i + 10, 1)], "id long, cell long"
            ),
            batch_id=i,
        )
    assert any(
        n.startswith("checkpoint-") for n in os.listdir(t.ledger_dir)
    )
    snaps = t.snapshots()
    served_from_ckpt = snaps[0]
    before_parts = list(served_from_ckpt["partitions"])
    before_cols = list(served_from_ckpt["columns"])
    # hostile in-place mutation of every nested field
    served_from_ckpt["partitions"].clear()
    served_from_ckpt["columns"].append("evil")
    served_from_ckpt["rows"] = 999999
    again = t.snapshots()[0]
    assert again["partitions"] == before_parts
    assert again["columns"] == before_cols
    assert again["rows"] != 999999
    # and the partition-scoped read path (which consumes the manifest)
    # still prunes correctly
    got = t.read(partition_values={"cell": [1]})
    assert {r["cell"] for r in got.collect()} == {1}


def test_snapshots_skips_stray_json_in_ledger_dir(spark, tmp_path):
    """Round-9 (ADVICE): a stray non-numeric .json dropped into
    _snapshots (an editor artifact, a foreign tool's marker) must not
    crash every read."""
    root = str(tmp_path / "strayjson")
    t = SnapshotTable(spark, root, "id long")
    t.append(spark.createDataFrame([(1,)], "id long"), batch_id=0)
    with open(os.path.join(t.ledger_dir, "notes.json"), "w") as f:
        f.write("{}")
    snaps = t.snapshots()
    assert [s["snapshot_id"] for s in snaps] == [0]
    assert t.read().count() == 1


def test_snapshots_survives_checkpoint_cleanup_race(spark, tmp_path):
    """Round-10 (ADVICE): another process's checkpoint cleanup can delete
    an OLDER checkpoint between a reader's listdir and open — not just a
    loose entry. The read must re-list and retry (cleanup commits the
    newer covering checkpoint before deleting, so a fresh listing always
    has a complete view), and a persistently vanishing checkpoint must
    RAISE rather than return a silently incomplete ledger (which would
    corrupt max_snapshot_id and every fence built on it)."""
    import pytest

    from duckdb_streaming_patterns_spark.plans.commitio import POSIX_IO
    from duckdb_streaming_patterns_spark.plans.snapshots import SnapshotTable

    root = str(tmp_path / "ckptrace")
    t = SnapshotTable(spark, root, "id long", checkpoint_every=2)
    for i in range(4):
        t.append(spark.createDataFrame([(i,)], "id long"), batch_id=i)
    assert any(
        n.startswith("checkpoint-") for n in os.listdir(t.ledger_dir)
    )

    class FlakyCkptIO:
        """Delegates to POSIX_IO but makes the first ``fails`` checkpoint
        reads vanish, simulating the cleanup race from a reader's view."""

        def __init__(self, fails: int):
            self.fails_left = fails

        def __getattr__(self, name):
            return getattr(POSIX_IO, name)

        def read_json(self, path):
            if (
                os.path.basename(path).startswith("checkpoint-")
                and self.fails_left > 0
            ):
                self.fails_left -= 1
                raise FileNotFoundError(path)
            return POSIX_IO.read_json(path)

    # a fresh reader (no parse cache) racing two consecutive cleanups
    reader = SnapshotTable(spark, root, "id long", io=FlakyCkptIO(2))
    assert [s["snapshot_id"] for s in reader.snapshots()] == [0, 1, 2, 3]

    # pathological: the checkpoint vanishes on EVERY attempt — raise,
    # never a silent loose-entries-only view
    reader_bad = SnapshotTable(spark, root, "id long", io=FlakyCkptIO(99))
    with pytest.raises(FileNotFoundError):
        reader_bad.snapshots()


def test_overlap_empty_and_multi_error_aggregation(spark):
    """Round-9: overlap() with zero thunks returns [] (public helper,
    obscure IndexError otherwise); when SEVERAL thunks fail, the first
    by argument order raises and the others ride along as exception
    notes with their tracebacks — not silently swallowed."""
    import pytest

    from duckdb_streaming_patterns_spark.operators.merge import overlap

    assert overlap() == []

    def boom_a():
        raise RuntimeError("failure alpha")

    def boom_b():
        raise ValueError("failure beta")

    with pytest.raises(RuntimeError, match="failure alpha") as exc_info:
        overlap(boom_a, boom_b)
    notes = "".join(getattr(exc_info.value, "__notes__", []))
    assert "failure beta" in notes and "ValueError" in notes


def test_ann_index_results_are_expiry_invariant(spark, sf_small, tmp_path):
    """pattern_streaming_ann_index with expire_every=2 (the registered
    driver form) must return exactly the no-expiry result — the probe
    reads current state only, so folding history is invisible to it."""
    from duckdb_streaming_patterns_spark.sources.tables import load_table
    from duckdb_streaming_patterns_spark.streaming import staging as st
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        pattern_streaming_ann_index,
    )

    queries_df = load_table(spark, sf_small, "embeddings").filter(
        F.col("vec_id") < 5
    )
    results = []
    for tag, expire in (("off", 0), ("on", 2)):
        run = str(tmp_path / f"annexp_{tag}")
        chunks = st.stage_embedding_chunks(spark, sf_small, run, n_chunks=5)
        out = pattern_streaming_ann_index(
            spark, chunks, run, queries_df, k=10, n_cells=16, n_probe=8,
            state_partitions=4, expire_every=expire,
        )
        results.append(sorted(tuple(r) for r in out.collect()))
    assert results[0] == results[1]
    # and the expiring run's index really was folded: the index table
    # under the "on" run has at most 3 live snapshot dirs (folds at
    # batches 2 and 4 leave fold + tail)
    import glob as _glob
    import json as _json

    idx_root = str(tmp_path / "annexp_on" / "ivf_index")
    ptr = _json.loads(open(os.path.join(idx_root, "_data.json")).read())
    live = _glob.glob(
        os.path.join(idx_root, ptr["data"], "snapshot_id=*")
    )
    assert len(live) <= 3, live


def test_streaming_bm25_equals_batch_and_prunes_query_buckets(
    spark, sf_small
):
    """pattern_streaming_bm25_index: (a) the accumulated-index answer
    equals the batch text_bm25_topk result row-for-row (streaming ≡
    batch for ranked retrieval under monotone chunking); (b) the
    query-phase candidate fetch carries a dynamic-partition-pruning
    subquery on the token-bucketed tf state AND the candidate-length
    fetch one on the doc_id-bucketed dl state (round-11: two pruned
    probes) — at 100 TB the read is O(|q| + candidate buckets), never an
    index scan; (c) the query phase carries NO aggregate over the dl
    log — corpus stats come from the O(1) maintained summary row, so no
    sum/count over `dl` appears anywhere in the served plan (the per-doc
    lengths join through, but are never aggregated)."""
    import contextlib
    import io
    import re

    from duckdb_streaming_patterns_spark.queries import QUERIES
    from duckdb_streaming_patterns_spark.queries_streaming import (
        q_pattern_streaming_bm25_index,
    )

    got = q_pattern_streaming_bm25_index(spark, sf_small)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        got.explain("formatted")
    plan = buf.getvalue()
    assert plan.lower().count("dynamicpruning") >= 2, plan[:3000]
    # no full-log stats aggregate in the query phase: every HashAggregate
    # in the served plan is the tf/df/score machinery — none aggregates
    # the dl column
    assert not re.search(r"(?i)(sum|count)\(dl[#)]", plan), plan[:3000]

    batch_fn, _ = QUERIES["text_bm25_topk"]
    want = batch_fn(spark, sf_small)
    cols = ["query_id", "doc_id", "score", "rank"]
    got_rows = sorted(tuple(r[c] for c in cols) for r in got.collect())
    want_rows = sorted(tuple(r[c] for c in cols) for r in want.collect())
    assert got_rows == want_rows


def test_streaming_bm25_midstream_probe_equals_batch_prefix(
    spark, sf_small, tmp_path
):
    """Round-11: serving the BM25 queries at batch 3 of 5 — while
    ingestion is still in flight, on state that took a maintenance fold
    at batch 2 — returns exactly the batch BM25 answer over the 3-chunk
    document prefix (streaming ≡ batch at every point of the stream, not
    just at the drain). Also pins the maintained stats row: after the
    probe run, (sum_dl, n_docs) equals the corpus totals, proving the
    per-batch integer folds accumulated exactly."""
    from pyspark.sql import functions as F

    from duckdb_streaming_patterns_spark.functions.text import tokens
    from duckdb_streaming_patterns_spark.operators.merge import SummaryTable
    from duckdb_streaming_patterns_spark.queries_streaming import (
        q_pattern_streaming_bm25_midstream,
    )
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )
    from duckdb_streaming_patterns_spark.sources.tables import load_table
    from duckdb_streaming_patterns_spark.streaming import patterns, staging

    got = q_pattern_streaming_bm25_midstream(spark, sf_small)

    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    per = (n + 4) // 5
    prefix = docs.filter(F.col("doc_id") < 3 * per)
    want = _bm25_reference(spark, prefix, _BM25_QUERIES, _BM25_SCORE_EXPR)
    cols = ["query_id", "doc_id", "score", "rank"]
    got_rows = sorted(tuple(r[c] for c in cols) for r in got.collect())
    want_rows = sorted(tuple(r[c] for c in cols) for r in want.collect())
    assert got_rows == want_rows

    # stats row accumulated exactly across the 5 batches
    total_dl = docs.select(
        F.sum(F.size(tokens(F.col("text")))).alias("s")
    ).first()["s"]
    # probe a fresh full run's stats table
    run2 = str(tmp_path / "bm25stats")
    chunks2 = staging.stage_document_chunks(spark, sf_small, run2, n_chunks=5)
    patterns.pattern_streaming_bm25_index(
        spark, chunks2, run2, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
        state_partitions=4, compact_every=2,
    ).collect()
    stats = SummaryTable(
        spark, os.path.join(run2, "stats"), patterns._BM25_STATS_DDL
    )
    row = stats.read().first()
    assert (row["sum_dl"], row["n_docs"]) == (total_dl, n)


def _bm25_reference(spark, docs, queries, score_expr, k=5):
    """Batch BM25 over an arbitrary docs frame — the same plan as
    text_bm25_topk, parameterized by source (prefix-oracle helper)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from duckdb_streaming_patterns_spark.functions.text import tokens

    qterms = spark.createDataFrame(
        [
            (qid, tok)
            for qid, qtext in queries
            for tok in dict.fromkeys(qtext.split())
        ],
        "query_id long, tok string",
    )
    qtok_list = sorted({t for _, q in queries for t in q.split()})
    dl = docs.select("doc_id", F.size(tokens(F.col("text"))).alias("dl"))
    sl, n_docs = dl.agg(F.sum("dl"), F.count("*")).first()
    avgdl = float(sl) / float(n_docs)
    tf = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .filter(F.col("tok").isin(qtok_list))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .join(F.broadcast(dfreq), "tok")
        .join(dl, "doc_id")
        .withColumn("n_docs", F.lit(int(n_docs)))
        .withColumn("avgdl", F.lit(avgdl))
        .withColumn(
            "s", F.expr(f"CAST(ROUND({score_expr}, 6) AS DECIMAL(18,6))")
        )
    )
    agg = scored.groupBy("query_id", "doc_id").agg(
        F.sum("s").cast("double").alias("score")
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("bigint").alias("query_id"),
            F.col("doc_id").cast("bigint").alias("doc_id"),
            "score",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def test_type_widening_read_and_era_correct_travel(spark, tmp_path):
    """Round-11 (verdict item 6): a range spanning a type-widened column
    reads era by era under an explicit LUB cast — full read returns
    BIGINT with the wide values intact; time travel confined to the
    narrow era returns that era's own INT (era-correct types); expiry
    folding across the widening boundary preserves every value and
    re-stamps the fold entry's recorded types to the widened union.
    Unsupported (non-numeric) type evolution raises instead of guessing
    a lossy cast."""
    import pytest

    root = str(tmp_path / "widen")
    t = SnapshotTable(spark, root, "id long, v int")
    t.append(spark.createDataFrame([(0, 10), (1, 20)], "id long, v int"),
             batch_id=0)
    t.append(spark.createDataFrame([(2, 30)], "id long, v int"), batch_id=1)
    t.append(
        spark.createDataFrame([(3, 5_000_000_000)], "id long, v bigint"),
        batch_id=2,
    )
    full = t.read()
    types = {f.name: f.dataType.simpleString() for f in full.schema.fields}
    assert types["v"] == "bigint"
    assert sorted(r["v"] for r in full.collect()) == [10, 20, 30, 5_000_000_000]
    asof = t.read_as_of(1)
    types1 = {f.name: f.dataType.simpleString() for f in asof.schema.fields}
    assert types1["v"] == "int"  # era-correct: narrow era stays narrow
    assert sorted(r["v"] for r in asof.collect()) == [10, 20, 30]
    # expiry folds across the boundary: values preserved, widened types
    # recorded on the fold entry
    t.append(
        spark.createDataFrame([(4, 6_000_000_000)], "id long, v bigint"),
        batch_id=3,
    )
    fid = t.expire_snapshots(through=2)
    assert fid == 2
    post = t.read()
    assert sorted(r["v"] for r in post.collect()) == [
        10, 20, 30, 5_000_000_000, 6_000_000_000,
    ]
    fold = next(s for s in t.snapshots() if s["snapshot_id"] == fid)
    assert ["v", "bigint"] in [list(ct) for ct in fold["column_types"]]

    # unsupported evolution: int -> string raises loudly at read time
    t2 = SnapshotTable(spark, str(tmp_path / "bad"), "id long, v int")
    t2.append(spark.createDataFrame([(0, 1)], "id long, v int"), batch_id=0)
    t2.append(spark.createDataFrame([(1, "x")], "id long, v string"),
              batch_id=1)
    with pytest.raises(ValueError, match="unsupported column type"):
        t2.read().collect()


def test_type_widening_decimal_precision_lub(spark, tmp_path):
    """Round-12 (verdict item 7): DECIMAL(p,s) widening — the other
    common lakehouse type evolution. The LUB keeps max integer digits
    and max scale so every era's values survive exactly; int eras join
    at their exact digit width; decimal × float widens to double; a LUB
    past precision 38 refuses loudly instead of truncating."""
    from decimal import Decimal

    import pytest

    from duckdb_streaming_patterns_spark.plans.snapshots import _widen_type

    # lattice unit contract
    assert _widen_type({"decimal(10,2)", "decimal(12,4)"}) == "decimal(12,4)"
    assert _widen_type({"decimal(10,2)", "bigint"}) == "decimal(21,2)"
    assert _widen_type({"decimal(10,2)", "int"}) == "decimal(12,2)"
    assert _widen_type({"decimal(10,2)", "double"}) == "double"
    assert _widen_type({"decimal(7,7)", "decimal(31,0)"}) == "decimal(38,7)"
    with pytest.raises(ValueError, match="exceeds the maximum precision"):
        _widen_type({"decimal(38,0)", "decimal(20,20)"})
    with pytest.raises(ValueError, match="unsupported column type"):
        _widen_type({"decimal(10,2)", "string"})

    # era read end-to-end: decimal(10,2) era then decimal(12,4) era
    root = str(tmp_path / "dec")
    t = SnapshotTable(spark, root, "id long, v decimal(10,2)")
    t.append(
        spark.createDataFrame(
            [(0, Decimal("12345678.91"))], "id long, v decimal(10,2)"
        ),
        batch_id=0,
    )
    t.append(
        spark.createDataFrame(
            [(1, Decimal("7.0001"))], "id long, v decimal(12,4)"
        ),
        batch_id=1,
    )
    full = t.read()
    types = {f.name: f.dataType.simpleString() for f in full.schema.fields}
    assert types["v"] == "decimal(12,4)"
    got = {r["id"]: r["v"] for r in full.collect()}
    assert got == {0: Decimal("12345678.9100"), 1: Decimal("7.0001")}
    # era-correct time travel: the narrow era keeps its own type
    asof = t.read_as_of(0)
    assert asof.schema["v"].dataType.simpleString() == "decimal(10,2)"


def test_type_widening_groups_legacy_untyped_entries_as_own_eras(
    spark, tmp_path
):
    """Round-12 (ADVICE): ledger entries written before column_types
    existed (pre-round-11) must not DISABLE era grouping for the typed
    entries around them — each untyped entry becomes its own era whose
    parquet FOOTER types join the LUB computation, so a legacy INT file
    between two typed eras still reads widened instead of failing (or
    mis-typing) under the plain single-footer read."""
    root = str(tmp_path / "legacy")
    t = SnapshotTable(spark, root, "id long, v int")
    t.append(spark.createDataFrame([(0, 10)], "id long, v int"), batch_id=0)
    # strip the recorded types from entry 0 — the pre-round-11 ledger shape
    entry_path = os.path.join(t.ledger_dir, "000000000.json")
    import json as _json

    with open(entry_path) as f:
        e = _json.load(f)
    del e["column_types"]
    with open(entry_path, "w") as f:
        _json.dump(e, f)
    t.append(
        spark.createDataFrame([(1, 7_000_000_000)], "id long, v bigint"),
        batch_id=1,
    )
    full = t.read()
    types = {f.name: f.dataType.simpleString() for f in full.schema.fields}
    assert types["v"] == "bigint"
    assert sorted(r["v"] for r in full.collect()) == [10, 7_000_000_000]
    # a legacy entry whose footer type CONFLICTS non-numerically with the
    # typed eras fails loudly (the _widen_type contract), never a
    # null-producing cast
    t2 = SnapshotTable(spark, str(tmp_path / "legacy2"), "id long, v string")
    t2.append(spark.createDataFrame([(0, "x")], "id long, v string"),
              batch_id=0)
    ep2 = os.path.join(t2.ledger_dir, "000000000.json")
    with open(ep2) as f:
        e2 = _json.load(f)
    del e2["column_types"]
    with open(ep2, "w") as f:
        _json.dump(e2, f)
    t2.append(spark.createDataFrame([(1, 1)], "id long, v int"), batch_id=1)
    import pytest

    with pytest.raises(ValueError, match="unsupported column type"):
        t2.read().collect()


def test_type_widening_era_read_survives_concurrent_dir_loss(
    spark, tmp_path
):
    """Round-12 (ADVICE): in the era-by-era branch, every per-era
    _ledger_paths re-enumeration coming back empty (a concurrent
    expiry/vacuum deleted the dirs between the initial enumeration and
    the per-era re-stat) must yield an EMPTY result, not IndexError on
    frames[0]."""
    root = str(tmp_path / "race")
    t = SnapshotTable(spark, root, "id long, v int")
    t.append(spark.createDataFrame([(0, 1)], "id long, v int"), batch_id=0)
    t.append(
        spark.createDataFrame([(1, 5_000_000_000)], "id long, v bigint"),
        batch_id=1,
    )
    real = t._ledger_paths
    calls = {"n": 0}

    def racy(*a, **kw):
        calls["n"] += 1
        # first call = the initial full-range enumeration (non-empty);
        # every per-era re-enumeration finds its dirs vanished
        return real(*a, **kw) if calls["n"] == 1 else []

    t._ledger_paths = racy
    try:
        got = t.read()
        assert got.count() == 0
    finally:
        t._ledger_paths = real
    assert calls["n"] >= 3  # initial + one per era: the era path ran
    # and the undamaged table still reads widened
    assert sorted(r["v"] for r in t.read().collect()) == [1, 5_000_000_000]


def test_bm25_serve_empty_index_returns_empty_topk(spark, tmp_path):
    """Round-12 (ADVICE): probing the streaming BM25 index before any
    document landed (probe_at_batch=0 over an empty first chunk, or a
    stats fold that crashed pre-commit) answers with an EMPTY top-k of
    the serve schema — not TypeError on a missing stats row or
    ZeroDivisionError on n_docs=0."""
    from duckdb_streaming_patterns_spark.operators.merge import SummaryTable
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        _BM25_STATS_DDL,
        _bm25_serve,
    )
    from duckdb_streaming_patterns_spark.queries_text import _BM25_SCORE_EXPR

    stats = SummaryTable(
        spark, str(tmp_path / "stats"), _BM25_STATS_DDL
    )  # never written: read() is empty, first() is None
    got = _bm25_serve(
        spark, None, None, stats, [(0, "hello world")], _BM25_SCORE_EXPR, 5
    )
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == [
        "query_id", "doc_id", "score", "rank",
    ]
    # n_docs=0 row (a crashed stats fold's zero state) takes the same guard
    stats.overwrite(
        spark.createDataFrame([(0, 0, 0)], _BM25_STATS_DDL), batch_id=0
    )
    assert (
        _bm25_serve(
            spark, None, None, stats, [(0, "hello")], _BM25_SCORE_EXPR, 5
        ).count()
        == 0
    )


def test_upsert_log_deferred_gc_parks_folded_dirs_one_cycle(
    spark, tmp_path
):
    """Round-11 (verdict item 8): with deferred_gc=True a fold parks its
    source dirs (logically dead via the manifest, still on disk) instead
    of deleting them, and the NEXT maintenance call's sweep collects
    them — so an external reader whose listing predates the fold can
    finish scanning, the same grace SnapshotTable's generation swap
    gives. Pinned three ways: (a) a lazy plan built BEFORE the fold
    collects successfully after it (with immediate GC the same sequence
    dies on deleted files); (b) a reader thread hammering read_latest
    across the fold sees no errors and always the full state; (c) the
    parked dirs are gone after the next cycle and results stay exact."""
    import threading

    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    root = str(tmp_path / "defgc")
    log = UpsertLog(
        spark, root, keys=["k"], insert_only=True, deferred_gc=True
    )
    mk = lambda lo, hi: spark.range(lo, hi).selectExpr("id AS k")
    for b in range(4):
        log.append(mk(b * 10, b * 10 + 10), b)

    stale = log.read_latest()  # plan whose listing predates the fold
    errors: list = []
    seen: list = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                seen.append(log.read_latest().count())
            except Exception as e:  # noqa: BLE001 — the test records it
                errors.append(e)
                return

    th = threading.Thread(target=reader)
    th.start()
    try:
        assert log.maintain(fanout=2) >= 1
        # keep the reader going until it has demonstrably read ACROSS
        # the fold (post-fold listings see the parked dirs and must
        # still resolve the full state) — deterministic, not a race
        import time as _time

        deadline = _time.time() + 60
        while len(seen) < 3 and not errors and _time.time() < deadline:
            _time.sleep(0.1)
    finally:
        stop.set()
        th.join()
    assert not errors
    assert len(seen) >= 3 and all(n == 40 for n in seen)
    # (a) the stale pre-fold plan still collects — its dirs are parked
    assert stale.count() == 40
    # parked dirs are physically present and manifest-dead
    import os as _o

    dead = set(log._dead_batch_ids())
    on_disk = {
        int(n.rsplit("=", 1)[1])
        for n in _o.listdir(root)
        if n.startswith("__batch_id=")
    }
    assert dead and dead <= on_disk
    # (c) next cycle sweeps the parked dirs; state stays exact
    log.append(mk(40, 50), 4)
    log.maintain(fanout=2)
    on_disk2 = {
        int(n.rsplit("=", 1)[1])
        for n in _o.listdir(root)
        if n.startswith("__batch_id=")
    }
    assert not (dead & on_disk2)
    assert log.read_latest().count() == 50
    assert sorted(r["k"] for r in log.read_latest().collect()) == list(
        range(50)
    )


def test_upsert_log_deferred_gc_compact_parks_too(spark, tmp_path):
    """compact() under deferred_gc: sources of the full fold survive one
    cycle (stale reader plans stay valid), the next compact collects
    them, and LWW resolution is unchanged throughout."""
    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog

    root = str(tmp_path / "defgc2")
    log = UpsertLog(spark, root, keys=["k"], deferred_gc=True)
    for b in range(3):
        df = spark.range(0, 10).selectExpr("id AS k", f"id * 10 + {b} AS v")
        log.append(df, b)
    stale = log.read_latest()
    log.compact()
    # LWW: every key's winner is from batch 2
    got = {r["k"]: r["v"] for r in log.read_latest().collect()}
    assert got == {k: k * 10 + 2 for k in range(10)}
    assert stale.count() == 10  # pre-fold plan still scannable
    import os as _o

    assert len([n for n in _o.listdir(root) if n.startswith("__batch_id=")]) == 4
    log.append(
        spark.range(0, 5).selectExpr("id AS k", "id * 10 + 9 AS v"), 3
    )
    log.compact()
    got = {r["k"]: r["v"] for r in log.read_latest().collect()}
    assert got == {
        **{k: k * 10 + 2 for k in range(5, 10)},
        **{k: k * 10 + 9 for k in range(5)},
    }


def test_asof_enrichment_retries_and_prunes_state_probe(spark, tmp_path):
    """pattern_streaming_asof_enrichment's batch fn: (a) identical
    enriched rows under every delivery schedule (idempotent per-batch
    appends recomputed against read_latest(before_batch)); (b) the
    state probe carries a dynamic-partition-pruning subquery on the
    user-bucketed clicks log — per batch only the batch's users'
    buckets are read, never the whole profile state."""
    import contextlib
    import datetime as dt
    import io
    import os

    from duckdb_streaming_patterns_spark.operators.merge import UpsertLog
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        asof_enrich_batch,
        asof_state_seed,
    )

    def ts(m):
        return dt.datetime(2024, 1, 1, 0, m)

    def mk(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp,"
            " event_type string"
        )

    b0 = mk([(0, 1, ts(0), "click"), (1, 2, ts(1), "purchase")])
    b1 = mk([(2, 1, ts(5), "purchase"), (3, 2, ts(6), "click")])
    b2 = mk([(4, 1, ts(9), "click"), (5, 1, ts(9), "purchase"),
             (6, 2, ts(10), "purchase")])

    results = {}
    for crash in (None, "redeliver"):
        root = str(tmp_path / f"asof_{crash}")
        clicks = UpsertLog(
            spark, os.path.join(root, "clicks"), keys=["user_id"],
            bucket_col="user_id", n_buckets=4,
        )
        out = UpsertLog(
            spark, os.path.join(root, "enriched"), keys=["event_id"],
            insert_only=True,
        )
        asof_enrich_batch(clicks, out, b0, 0)
        asof_enrich_batch(clicks, out, b1, 1)
        if crash == "redeliver":
            asof_enrich_batch(clicks, out, b1, 1)  # full re-delivery
        asof_enrich_batch(clicks, out, b2, 2)
        got = sorted(
            (r["event_id"], r["last_click_ts"])
            for r in out.read_latest().collect()
        )
        results[crash] = got
    assert results[None] == results["redeliver"]
    got = dict(results[None])
    assert got[1] is None           # purchase before any click by user 2
    assert got[2] == ts(0)          # carried state across batches
    assert got[5] == ts(9)          # same-batch click at EQUAL ts visible
    assert got[6] == ts(6)          # state from batch 1

    # (b) plan shape: the seed probe is DPP-pruned to the batch's users
    ev = b2.withColumn(
        "click_ts",
        F.when(F.col("event_type") == "click", F.col("ts")),
    )
    seed = asof_state_seed(clicks, ev, 3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        seed.explain("formatted")
    plan = buf.getvalue()
    import re

    m = re.search(r"PartitionFilters: \[[^\]]*__kb", plan)
    assert m, plan[:3000]


def test_bm25_consistent_serve_ignores_torn_batch(spark, sf_small):
    """The generation pointer makes external serving snapshot-consistent:
    a half-written batch (tf rows only — no dl, no stats, no publish)
    is INVISIBLE to bm25_consistent_serve but DOES leak into a naive
    unscoped serve — proving the pointer is load-bearing, not
    decorative. Also pins publish idempotence under redelivery."""
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )
    from duckdb_streaming_patterns_spark.streaming import patterns, staging

    run = staging.new_run_dir("bm25torn")
    chunks = staging.stage_document_chunks(spark, sf_small, run, n_chunks=5)
    patterns.pattern_streaming_bm25_index(
        spark, chunks, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
        state_partitions=4, compact_every=2,
    )
    clean = sorted(
        (r["query_id"], r["rank"], r["doc_id"])
        for r in patterns.bm25_consistent_serve(
            spark, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5
        ).collect()
    )
    tf_log, dl_log = patterns.bm25_reader_logs(spark, run)
    ptr = tf_log.io.try_read_json(patterns._bm25_gen_path(run))
    assert ptr is not None and ptr["gen"] == 4
    # redelivered publish for a covered generation is a no-op
    patterns._publish_bm25_gen(tf_log.io, run, 3, 999, 999)
    assert tf_log.io.try_read_json(patterns._bm25_gen_path(run)) == ptr
    # torn batch: phantom docs carrying every query term
    phantom = spark.createDataFrame(
        [
            (10_000_000 + i, tok, 50)
            for i, (_qid, qtext) in enumerate(_BM25_QUERIES)
            for tok in qtext.split()
        ],
        "doc_id long, tok string, tf long",
    )
    tf_log.append(phantom, batch_id=5)
    consistent = sorted(
        (r["query_id"], r["rank"], r["doc_id"])
        for r in patterns.bm25_consistent_serve(
            spark, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5
        ).collect()
    )
    assert consistent == clean
    # the naive (unscoped) serve DOES see the phantom candidates — the
    # dl join drops them (no dl rows), but the df counts shift: prove
    # the torn rows at least reach the candidate set
    cand = tf_log.read_latest(keep_bucket=True)
    assert cand.filter(F.col("doc_id") >= 10_000_000).count() > 0


def test_hybrid_consistent_serve_pins_both_indexes(spark, sf_small):
    """Cross-index teeth: with the ANN ledger one batch AHEAD of the
    lexical generation (phantom query-vector copies in every cell), the
    naive current-state probe retrieves the phantoms at cosine ~1.0,
    while the consistent serve's as-of probe does not — and the as-of
    probe's plan keeps the probed-cell pruning through read_as_of."""
    import contextlib
    import io
    import json
    import os

    from pyspark.sql import Row

    from duckdb_streaming_patterns_spark.plans.snapshots import (
        SnapshotTable,
    )
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )
    from duckdb_streaming_patterns_spark.sources.tables import load_table
    from duckdb_streaming_patterns_spark.streaming import patterns, staging

    run = staging.new_run_dir("hybct")
    doc_chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("hybctd"), n_chunks=5
    )
    emb_chunks = staging.stage_embedding_chunks(
        spark, sf_small, staging.new_run_dir("hybcte"), n_chunks=5
    )
    queries_df = load_table(spark, sf_small, "embeddings").filter(
        F.col("vec_id") < 3
    )
    patterns.pattern_streaming_hybrid_retrieval(
        spark, doc_chunks, emb_chunks, run, _BM25_QUERIES, queries_df,
        _BM25_SCORE_EXPR, state_partitions=4, compact_every=2,
    )
    clean = sorted(
        tuple(r) for r in patterns.hybrid_consistent_serve(
            spark, run, _BM25_QUERIES, queries_df, _BM25_SCORE_EXPR
        ).collect()
    )
    index = SnapshotTable(
        spark,
        os.path.join(run, "vec", "ivf_index"),
        "vec_id long, embedding array<float>, cell_id long",
        partition_cols=["cell_id"],
    )
    qvec = queries_df.filter(F.col("vec_id") == 0).first()["embedding"]
    index.append(
        spark.createDataFrame(
            [(20_000_000 + c, list(qvec), c) for c in range(16)],
            "vec_id long, embedding array<float>, cell_id long",
        ),
        batch_id=5,
    )
    with open(os.path.join(run, "vec", "anchors.json")) as f:
        anchors = [Row(aid=a, vec=v) for a, v in json.load(f)]
    naive = patterns.ann_probe(
        spark, index, anchors, queries_df, k=20, n_probe=8
    )
    assert naive.filter(F.col("neighbor_id") >= 20_000_000).count() > 0
    snaps = [
        s["snapshot_id"]
        for s in index.snapshots()
        if s.get("batch_id") is not None and int(s["batch_id"]) <= 4
    ]
    asof = patterns.ann_probe(
        spark, index, anchors, queries_df, k=20, n_probe=8,
        as_of_snapshot=max(snaps),
    )
    assert asof.filter(F.col("neighbor_id") >= 20_000_000).count() == 0
    # the as-of read enumerates ONLY the probed cells' ledger paths —
    # assert the pruning mechanism directly: a cell-scoped enumeration
    # is a strict subset of the full one at the same as-of snapshot
    all_paths = index._ledger_paths(-1, max(snaps))
    occupied = sorted(
        {
            int(part.split("=", 1)[1])
            for sn in index.snapshots()
            if sn.get("partitions") and sn["snapshot_id"] <= max(snaps)
            for part in sn["partitions"]
        }
    )
    pick = occupied[:2]
    some = index._ledger_paths(
        -1, max(snaps), partition_values={"cell_id": pick}
    )
    # unpruned enumeration returns whole snapshot dirs (every cell);
    # the scoped one returns ONLY the picked cells' leaf dirs — the
    # granularity read_as_of's scan then touches
    assert some, (pick, occupied)
    touched = {os.path.basename(p) for p in some}
    assert touched <= {f"cell_id={c}" for c in pick}, touched
    assert all(os.path.basename(p).startswith("snapshot_id=") for p in all_paths)
    consistent = sorted(
        tuple(r) for r in patterns.hybrid_consistent_serve(
            spark, run, _BM25_QUERIES, queries_df, _BM25_SCORE_EXPR
        ).collect()
    )
    assert consistent == clean


def test_hybrid_consistent_serve_dense_behind(spark, sf_small):
    """The likelier cross-index skew: the EMBEDDING stream runs BEHIND
    the document stream (embedding is the slow stream). The consistent
    serve must pin BOTH sides to the shared prefix gen_eff = min(lex
    gen, max ANN insert batch) — not silently fuse BM25 state at gen=4
    with a dense index stuck at batch 2 (round-12 ADVICE). Oracle: a
    control run where BOTH streams replay only the first 3 chunks — the
    skewed run's consistent serve must hash-equal it, because prefix<=2
    of the 5-chunk doc stream IS the 3-truncated doc stream's state."""
    import shutil

    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )
    from duckdb_streaming_patterns_spark.sources.tables import load_table

    doc_chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("dbehd"), n_chunks=5
    )
    emb_chunks = staging.stage_embedding_chunks(
        spark, sf_small, staging.new_run_dir("dbehe"), n_chunks=5
    )

    def _truncate(src: str, tag: str, keep: int) -> str:
        dst = os.path.join(staging.new_run_dir(tag), "chunks")
        os.makedirs(dst, exist_ok=True)
        for k in range(keep):
            d = os.path.join(src, f"__chunk={k}")
            shutil.copytree(d, os.path.join(dst, f"__chunk={k}"),
                            copy_function=shutil.copy2)
        return dst

    doc3 = _truncate(doc_chunks, "dbehd3", 3)
    emb3 = _truncate(emb_chunks, "dbehe3", 3)
    queries_df = load_table(spark, sf_small, "embeddings").filter(
        F.col("vec_id") < 3
    )
    # control: both streams stop at chunk 2 — a fully consistent world
    control_run = staging.new_run_dir("dbehctl")
    patterns.pattern_streaming_hybrid_retrieval(
        spark, doc3, emb3, control_run, _BM25_QUERIES, queries_df,
        _BM25_SCORE_EXPR, state_partitions=4, compact_every=2,
    )
    control = sorted(
        tuple(r) for r in patterns.hybrid_consistent_serve(
            spark, control_run, _BM25_QUERIES, queries_df,
            _BM25_SCORE_EXPR,
        ).collect()
    )
    # skewed: docs replay all 5 chunks (lex gen=4), embeddings only 3
    # (max ANN insert batch=2) — the dense stream is 2 batches behind
    skew_run = staging.new_run_dir("dbehskw")
    patterns.pattern_streaming_hybrid_retrieval(
        spark, doc_chunks, emb3, skew_run, _BM25_QUERIES, queries_df,
        _BM25_SCORE_EXPR, state_partitions=4, compact_every=2,
    )
    tf_log, _dl = patterns.bm25_reader_logs(
        spark, os.path.join(skew_run, "lex")
    )
    ptr = tf_log.io.try_read_json(
        patterns._bm25_gen_path(os.path.join(skew_run, "lex"))
    )
    assert int(ptr["gen"]) == 4
    # the pointer history carries exact stats for the older prefix —
    # the reader resolves gen_eff=2's stats from the SAME single GET
    assert any(int(h["gen"]) == 2 for h in ptr.get("hist", [])), ptr
    skewed = sorted(
        tuple(r) for r in patterns.hybrid_consistent_serve(
            spark, skew_run, _BM25_QUERIES, queries_df, _BM25_SCORE_EXPR
        ).collect()
    )
    assert skewed == control


def test_bm25_stats_at_history_and_fallback(spark, sf_small):
    """_bm25_stats_at: history fast path returns the exact stats the
    pointer recorded at that generation; the fallback (prefix older than
    the history window) recomputes them exactly from the scoped dl log."""
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )

    run = staging.new_run_dir("statsat")
    chunks = staging.stage_document_chunks(spark, sf_small, run, n_chunks=5)
    patterns.pattern_streaming_bm25_index(
        spark, chunks, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
        state_partitions=4, compact_every=0,
    )
    tf_log, dl_log = patterns.bm25_reader_logs(spark, run)
    ptr = tf_log.io.try_read_json(patterns._bm25_gen_path(run))
    assert int(ptr["gen"]) == 4 and len(ptr["hist"]) == 4
    # exact recompute from the scoped dl log, per prefix
    for g in range(5):
        row = (
            dl_log.read_latest(before_batch=g + 1)
            .agg(F.sum("dl").alias("s"), F.count("*").alias("n"))
            .first()
        )
        expect = (int(row["s"]), int(row["n"]))
        # history path (g < gen) or the pointer head (g == gen)
        assert patterns._bm25_stats_at(ptr, g, dl_log) == expect
        # fallback path: strip the history and force the dl-log aggregate
        bare = {k: v for k, v in ptr.items() if k != "hist"}
        assert patterns._bm25_stats_at(bare, g, dl_log) == expect


def test_hybrid_manifest_unaligned_batches(spark, sf_small):
    """The atomic two-index manifest (round 13): with 6 lexical vs 3
    dense micro-batches over the same corpus, (a) publish is idempotent
    under redelivery, (b) the serve pinned at version 1 ignores BOTH
    streams' committed state beyond the manifest, (c) the old shared-
    numbering rule min(lex gen, dense max batch) pins a DIFFERENT (wrong)
    prefix — the manifest is load-bearing, and (d) serving without a
    manifest raises instead of guessing."""
    import json
    import pytest

    from duckdb_streaming_patterns_spark.plans.snapshots import (
        SnapshotTable as ST,
    )
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )
    from duckdb_streaming_patterns_spark.sources.tables import load_table

    run = staging.new_run_dir("hmanif")
    doc_chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("hmanifd"), n_chunks=6
    )
    emb_chunks = staging.stage_paired_embedding_chunks(
        spark, sf_small, staging.new_run_dir("hmanife"), n_chunks=6
    )
    queries_df = load_table(spark, sf_small, "embeddings").filter(
        F.col("vec_id") < 3
    )
    pinned = sorted(
        tuple(r)
        for r in patterns.pattern_streaming_hybrid_manifest(
            spark, doc_chunks, emb_chunks, run, _BM25_QUERIES, queries_df,
            _BM25_SCORE_EXPR, at_version=1, state_partitions=4,
            compact_every=2,
        ).collect()
    )
    tf_log, _dl = patterns.bm25_reader_logs(spark, os.path.join(run, "lex"))
    man = tf_log.io.try_read_json(patterns._hybrid_manifest_path(run))
    # the coordinator published EVERY covered version: head is 2 (both
    # streams fully drained), and version 1 lives in the history
    assert man["version"] == 2 and man["lex_gen"] == 5
    hist1 = [h for h in man["hist"] if h["version"] == 1]
    assert hist1 and hist1[-1]["lex_gen"] == 3
    # (a) redelivered publish for a covered version is a no-op
    patterns.publish_hybrid_manifest(
        tf_log.io, run, version=0, lex_gen=1, ann_snapshot=0,
        sum_dl=1, n_docs=1,
    )
    assert tf_log.io.try_read_json(patterns._hybrid_manifest_path(run)) == man
    # (b) as-of serving through the history is stable — and pinned at
    # version 1, DESPITE the head having moved on to version 2
    again = sorted(
        tuple(r)
        for r in patterns.hybrid_manifest_serve(
            spark, run, _BM25_QUERIES, queries_df, _BM25_SCORE_EXPR,
            at_version=1,
        ).collect()
    )
    assert again == pinned
    # an unpublished / aged-out version raises rather than guessing
    with pytest.raises(ValueError, match="not in the manifest"):
        patterns.hybrid_manifest_serve(
            spark, run, _BM25_QUERIES, queries_df, _BM25_SCORE_EXPR,
            at_version=7,
        )
    # (c) min(lex gen=5, dense max batch=2) is NOT version 1's pairing
    # (lex_gen=3, dense<=1): the shared-numbering rule would serve
    # mismatched prefixes here — the coordinator's version map is the
    # only sound cross-index linkage
    lex_ptr = tf_log.io.try_read_json(
        patterns._bm25_gen_path(os.path.join(run, "lex"))
    )
    index = ST(
        spark,
        os.path.join(run, "vec", "ivf_index"),
        "vec_id long, embedding array<float>, cell_id long",
        partition_cols=["cell_id"],
    )
    dense_max = max(
        int(s["batch_id"])
        for s in index.snapshots()
        if s.get("kind", "insert") == "insert"
        and s.get("batch_id") is not None
    )
    min_rule = min(int(lex_ptr["gen"]), dense_max)
    # 2 != 3: the shared-numbering rule pins the WRONG lexical prefix
    # for corpus version 1 — only the coordinator's map is sound
    assert min_rule != hist1[-1]["lex_gen"]
    # (d) no manifest -> loud failure
    with pytest.raises(ValueError, match="manifest"):
        patterns.hybrid_manifest_serve(
            spark, staging.new_run_dir("hmanifx"), _BM25_QUERIES,
            queries_df, _BM25_SCORE_EXPR,
        )


def test_bm25_maintain_floor_preserves_asof_serving(spark, sf_small):
    """The retention knob for as-of serving (round 13): maintenance with
    ``maintain_floor=G`` never folds across generation G, so a reader
    pinned at any generation >= G-1 stays servable at ANY stream depth —
    while the default (fold to head) eventually trips the straddle guard
    for the same pinned read, refusing loudly instead of leaking."""
    import pytest

    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )

    from duckdb_streaming_patterns_spark.operators.merge import maintain_all

    chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("mflc"), n_chunks=8
    )
    # floored: post-drain maintenance folds only BELOW generation 4
    # (fanout 2 forces real tiered folds at this depth) — the pinned
    # read at generation 3 stays servable
    run_f = staging.new_run_dir("mflf")
    patterns.pattern_streaming_bm25_index(
        spark, chunks, run_f, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
        state_partitions=4, compact_every=2, maintain_floor=4,
    )
    tf_log, dl_log = patterns.bm25_reader_logs(spark, run_f)
    maintain_all([tf_log, dl_log], before_batch=4, fanout=2)
    pinned = patterns._bm25_serve(
        spark, tf_log, dl_log, None, _BM25_QUERIES, _BM25_SCORE_EXPR, 5,
        as_of_gen=3,
        stats_override=patterns._bm25_stats_at(
            tf_log.io.try_read_json(patterns._bm25_gen_path(run_f)), 3,
            dl_log,
        ),
    ).collect()
    assert pinned
    # head-mode: maintenance folds right past the pinned generation —
    # the same read refuses loudly instead of leaking newer rows
    run_h = staging.new_run_dir("mflh")
    patterns.pattern_streaming_bm25_index(
        spark, chunks, run_h, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
        state_partitions=4, compact_every=2,
    )
    tf_h, dl_h = patterns.bm25_reader_logs(spark, run_h)
    maintain_all([tf_h, dl_h], before_batch=8, fanout=2)
    with pytest.raises(RuntimeError, match="straddles"):
        patterns._bm25_serve(
            spark, tf_h, dl_h, None, _BM25_QUERIES, _BM25_SCORE_EXPR, 5,
            as_of_gen=3, stats_override=(1, 1),
        ).collect()


def test_retrieval_gdpr_forget_history_reset_and_purge(spark, sf_small):
    """Deletion propagation into the serving indexes (round 14): after
    the forget, (a) no forgotten doc in the served pools, (b) the
    pre-delete manifest version is NOT pinnable (history reset — an
    as-of reader must not resurface the doc), (c) the rows physically
    left every storage plane (BM25 logs, IVF index, corpus-of-record),
    and (d) a full re-run of the same forget is a pure no-op: no
    double-subtracted stats, no burned generation, stable serve."""
    import pytest

    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )

    run = staging.new_run_dir("tgdprret")
    doc_chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("tgdprd"), n_chunks=5
    )
    emb_chunks = staging.stage_embedding_chunks(
        spark, sf_small, staging.new_run_dir("tgdpre"), n_chunks=5
    )
    queries_df = load_table(spark, sf_small, "embeddings").filter(
        F.col("vec_id") < 3
    )
    docs = load_table(spark, sf_small, "documents")
    served = sorted(
        tuple(r)
        for r in patterns.pattern_streaming_retrieval_gdpr(
            spark, doc_chunks, emb_chunks, run, _BM25_QUERIES, queries_df,
            _BM25_SCORE_EXPR, corpus_docs=docs,
            forget_predicate=F.col("doc_id") % 7 == 3,
            state_partitions=4, compact_every=2,
        ).collect()
    )
    # (a) no forgotten doc serves
    assert served and all(r[1] % 7 != 3 for r in served)
    # (b) version 0 (pre-delete) is refused: below the forget floor
    # (and also gone from the pinnable history)
    with pytest.raises(ValueError, match="forgotten"):
        patterns.hybrid_manifest_serve(
            spark, run, _BM25_QUERIES, queries_df, _BM25_SCORE_EXPR,
            at_version=0,
        )
    # (c) physical erasure across every plane
    lex = os.path.join(run, "lex")
    tf_log, dl_log = patterns.bm25_reader_logs(spark, lex)
    assert tf_log.read_latest().filter(F.col("doc_id") % 7 == 3).count() == 0
    assert dl_log.read_latest().filter(F.col("doc_id") % 7 == 3).count() == 0
    index = SnapshotTable(
        spark,
        os.path.join(run, "vec", "ivf_index"),
        "vec_id long, embedding array<float>, cell_id long",
        partition_cols=["cell_id"],
    )
    assert index.read().filter(F.col("vec_id") % 7 == 3).count() == 0
    corpus = SnapshotTable(
        spark, os.path.join(run, "corpus"), "doc_id long, source string"
    )
    assert corpus.read().filter(F.col("doc_id") % 7 == 3).count() == 0
    # (d) full-retry no-op: same feed, nothing novel
    ptr_before = tf_log.io.read_json(patterns._bm25_gen_path(lex))
    man_before = tf_log.io.read_json(patterns._hybrid_manifest_path(run))
    out2 = patterns.retrieval_forget(
        spark, run, docs.filter(F.col("doc_id") % 7 == 3).select("doc_id")
    )
    assert out2["n_forgotten"] == 0
    assert out2["gen"] == ptr_before["gen"]
    assert tf_log.io.read_json(patterns._bm25_gen_path(lex)) == ptr_before
    assert (
        tf_log.io.read_json(patterns._hybrid_manifest_path(run))
        == man_before
    )
    again = sorted(
        tuple(r)
        for r in patterns.hybrid_manifest_serve(
            spark, run, _BM25_QUERIES, queries_df, _BM25_SCORE_EXPR
        ).collect()
    )
    assert again == served


def test_retrieval_forget_fence_survives_post_purge_retry(spark, sf_small):
    """The measurement fence: a retry that lands AFTER the purge erased
    the dl rows must publish the ORIGINAL measured delta, not a
    re-measured zero. Simulated by rewinding the pointer to its
    pre-forget value after a completed forget (state purged, fence
    durable) and re-running — the republished generation must carry the
    fence's stats."""
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )

    run = staging.new_run_dir("tgdprfence")
    chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("tgdprfd"), n_chunks=5
    )
    patterns.pattern_streaming_bm25_index(
        spark, chunks, os.path.join(run, "lex"), _BM25_QUERIES,
        _BM25_SCORE_EXPR, k=5, state_partitions=4, compact_every=2,
    )
    lex = os.path.join(run, "lex")
    tf_log, _dl = patterns.bm25_reader_logs(spark, lex)
    ptr0 = tf_log.io.read_json(patterns._bm25_gen_path(lex))
    feed = load_table(spark, sf_small, "documents").filter(
        F.col("doc_id") % 7 == 3
    ).select("doc_id")
    out1 = patterns.retrieval_forget(spark, run, feed)
    assert out1["n_forgotten"] > 0
    ptr1 = tf_log.io.read_json(patterns._bm25_gen_path(lex))
    # crash simulation: the pointer publish is lost, everything else
    # (tombstones, purge, fence) is durable
    tf_log.io.swap_pointer(patterns._bm25_gen_path(lex), ptr0, expected=ptr1)
    out2 = patterns.retrieval_forget(spark, run, feed)
    ptr2 = tf_log.io.read_json(patterns._bm25_gen_path(lex))
    assert ptr2["gen"] == ptr1["gen"]
    assert ptr2["sum_dl"] == ptr1["sum_dl"]  # fence delta, not zero
    assert ptr2["n_docs"] == ptr1["n_docs"]
    # the retry completes the SAME forget generation — it reports the
    # fence's recorded count, proving the measurement came from the
    # fence (a post-purge re-measure would read zero)
    assert out2["n_forgotten"] == out1["n_forgotten"]


def test_publish_hybrid_manifest_multiwriter_cas_retry(tmp_path):
    """Two coordinators racing successive versions converge on one
    history with no raise and no lost version (round 14, verdict item
    4): the loser's CAS re-reads, re-checks coverage, re-swaps."""
    from duckdb_streaming_patterns_spark.plans.commitio import (
        ObjectStoreSimIO,
    )

    run = str(tmp_path / "race")
    os.makedirs(run, exist_ok=True)

    class RacingIO:
        """Delegates to the sim store, but the first manifest swap is
        beaten by a competing coordinator publishing version 1 — the
        deterministic two-writer interleave."""

        def __init__(self):
            self.inner = ObjectStoreSimIO()
            self.raced = False

        def __getattr__(self, name):
            return getattr(self.inner, name)

        def swap_pointer(self, path, obj, expected=None):
            if not self.raced and obj.get("version") == 2:
                self.raced = True
                patterns.publish_hybrid_manifest(
                    self.inner, run, version=1, lex_gen=3, ann_snapshot=1,
                    sum_dl=30, n_docs=3,
                )
            return self.inner.swap_pointer(path, obj, expected=expected)

    io = RacingIO()
    patterns.publish_hybrid_manifest(
        io, run, version=0, lex_gen=1, ann_snapshot=0, sum_dl=10, n_docs=1
    )
    # this publish loses its first CAS to the racing version-1 publish,
    # then retries and lands version 2 with version 1 stacked in history
    patterns.publish_hybrid_manifest(
        io, run, version=2, lex_gen=5, ann_snapshot=2, sum_dl=50, n_docs=5
    )
    man = io.read_json(patterns._hybrid_manifest_path(run))
    assert man["version"] == 2 and man["lex_gen"] == 5
    assert [h["version"] for h in man["hist"]] == [0, 1]
    assert io.raced


def test_bm25_tomb_antijoin_is_broadcast_and_scoped(spark, sf_small):
    """The GDPR tombstone exclusion in the serve plan: a BROADCAST
    left-anti join (the tomb set is forget-request-sized, never a
    shuffle of the candidate side), and generation-scoped — a serve
    pinned BEFORE the forget generation returns the intact pre-delete
    pools while the post-forget serve excludes the docs."""
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )

    run = staging.new_run_dir("tgdprplan")
    chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("tgdprplc"), n_chunks=5
    )
    patterns.pattern_streaming_bm25_index(
        spark, chunks, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
        state_partitions=4, compact_every=2,
    )
    pre = {
        (r["query_id"], r["doc_id"])
        for r in patterns.bm25_consistent_serve(
            spark, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5
        ).collect()
    }
    victims = sorted({d for _q, d in pre})[:2]
    feed = spark.createDataFrame([(d,) for d in victims], "doc_id long")
    # purge=False: the scoped-read teeth need the pre-forget rows still
    # physically present — only the tombstone anti-join may hide them
    out = patterns.retrieval_forget(spark, run, feed, purge=False)
    assert out["n_forgotten"] == len(victims)
    tf_log, dl_log = patterns.bm25_reader_logs(spark, run)
    tomb = patterns._bm25_tomb_or_none(spark, run)
    assert tomb is not None
    served = patterns._bm25_serve(
        spark, tf_log, dl_log, None, _BM25_QUERIES, _BM25_SCORE_EXPR, 5,
        as_of_gen=out["gen"],
        stats_override=(out["sum_dl"], out["n_docs"]),
        tomb_log=tomb,
    )
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan[:2000]
    post = {(r["query_id"], r["doc_id"]) for r in served.collect()}
    assert not post & {(q, d) for q, d in pre if d in set(victims)}
    # generation-scoped: pinned BEFORE the forget, the docs still serve
    pinned = {
        (r["query_id"], r["doc_id"])
        for r in patterns._bm25_serve(
            spark, tf_log, dl_log, None, _BM25_QUERIES, _BM25_SCORE_EXPR,
            5, as_of_gen=out["gen"] - 1,
            stats_override=patterns._bm25_stats_at(
                tf_log.io.read_json(patterns._bm25_gen_path(run)),
                out["gen"] - 1,
                dl_log,
            ),
            tomb_log=tomb,
        ).collect()
    }
    assert pinned == pre


def test_mixture_stream_empty_first_batch_is_safe(spark, tmp_path):
    """ADVICE r13: an empty very-first micro-batch must not divide by
    zero (NULL Z) — the fold records an empty verdict batch and the
    stream proceeds; a later real batch mixes normally."""
    # the batch fn lazily imports queries_pipeline, whose oracle
    # assembly needs the full registry chain loaded first
    from duckdb_streaming_patterns_spark.queries import (  # noqa: F401
        QUERIES as _ensure_registry,
    )
    from duckdb_streaming_patterns_spark.operators.merge import (
        SummaryTable,
        UpsertLog,
    )
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        mixture_sample_batch,
    )

    counts = SummaryTable(
        spark, str(tmp_path / "counts"), "source string, n_docs long"
    )
    verdicts = UpsertLog(
        spark,
        str(tmp_path / "verdicts"),
        keys=["doc_id"],
        insert_only=True,
    )
    empty = spark.createDataFrame([], "doc_id long, source string")
    mixture_sample_batch(counts, verdicts, empty, 0)  # must not raise
    real = spark.createDataFrame(
        [(i, "src0") for i in range(50)], "doc_id long, source string"
    )
    mixture_sample_batch(counts, verdicts, real, 1)
    rows = verdicts.read_latest().collect()
    assert rows and all(r["batch_seq"] == 1 for r in rows)


def test_retrieval_forget_on_bm25_only_run(spark, sf_small):
    """The single-index layout: retrieval_forget on a bare BM25 run dir
    (no lex/ subdir, no dense side) — tombstones + purge + negative
    stats + pointer publish, consistent serve excludes the docs and
    hash-equals a fresh index built over the surviving corpus."""
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )

    run = staging.new_run_dir("tgdprlex")
    chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("tgdprlexc"), n_chunks=5
    )
    patterns.pattern_streaming_bm25_index(
        spark, chunks, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
        state_partitions=4, compact_every=2,
    )
    docs = load_table(spark, sf_small, "documents")
    out = patterns.retrieval_forget(
        spark, run, docs.filter(F.col("doc_id") % 5 == 1).select("doc_id")
    )
    assert out["n_forgotten"] > 0 and out["ann_delete_snapshot"] is None
    served = {
        tuple(r)
        for r in patterns.bm25_consistent_serve(
            spark, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5
        ).collect()
    }
    assert served and all(r[1] % 5 != 1 for r in served)
    # the purge's tombstones RETIRED into the membership ledger (round
    # 15): the live tomb log is empty again (serve takes the
    # no-tombstone fast path), the retired ledger remembers the ids
    assert not patterns.bm25_tomb_log(spark, run)._batch_dirs()
    retired_ids = (
        patterns.bm25_retired_tomb_log(spark, run)
        .read_latest()
        .select("doc_id")
    )
    assert retired_ids.count() == out["n_forgotten"]
    # the published pointer must carry EXACTLY the surviving corpus's
    # stats: post-purge dl rows (anti-joined vs the retired ledger for
    # belt-and-braces — the purge already removed them) must sum to the
    # pointer's (sum_dl, n_docs)
    tf_log, dl_log = patterns.bm25_reader_logs(spark, run)
    ptr = tf_log.io.read_json(patterns._bm25_gen_path(run))
    survivors = dl_log.read_latest().join(
        F.broadcast(retired_ids),
        "doc_id",
        "left_anti",
    )
    row = survivors.agg(
        F.sum("dl").cast("long").alias("s"),
        F.count("*").cast("long").alias("n"),
    ).first()
    assert (int(ptr["sum_dl"]), int(ptr["n_docs"])) == (
        int(row["s"]), int(row["n"])
    )


def test_forget_floor_survives_racing_normal_publish(tmp_path):
    """The reset-history race (round 14): a normal coordinator wins the
    CAS with the NEXT version — stacking the pre-forget head into
    history — before the forget's reset publish lands. The forget must
    still win the GUARANTEE: its retry raises the manifest floor on the
    racer's head and drops sub-floor history, so no pre-forget version
    is pinnable. A later normal publish carries the floor forward."""
    import os as _os

    from duckdb_streaming_patterns_spark.plans.commitio import (
        ObjectStoreSimIO,
    )

    run = str(tmp_path / "floorrace")
    _os.makedirs(run, exist_ok=True)

    class RacingIO:
        def __init__(self):
            self.inner = ObjectStoreSimIO()
            self.raced = False

        def __getattr__(self, name):
            return getattr(self.inner, name)

        def swap_pointer(self, path, obj, expected=None):
            if not self.raced and obj.get("floor") == 2:
                self.raced = True
                # the racer: a NORMAL publish of version 2 that read the
                # pre-forget head (version 1) and stacked it into hist
                patterns.publish_hybrid_manifest(
                    self.inner, run, version=2, lex_gen=5, ann_snapshot=2,
                    sum_dl=50, n_docs=5,
                )
            return self.inner.swap_pointer(path, obj, expected=expected)

    io = RacingIO()
    patterns.publish_hybrid_manifest(
        io.inner, run, version=0, lex_gen=1, ann_snapshot=0,
        sum_dl=10, n_docs=1,
    )
    patterns.publish_hybrid_manifest(
        io.inner, run, version=1, lex_gen=3, ann_snapshot=1,
        sum_dl=30, n_docs=3,
    )
    # the forget publishes version 2 with reset_history — and loses its
    # first CAS to the normal version-2 publish above
    patterns.publish_hybrid_manifest(
        io, run, version=2, lex_gen=4, ann_snapshot=2,
        sum_dl=20, n_docs=2, reset_history=True,
    )
    man = io.inner.read_json(patterns._hybrid_manifest_path(run))
    assert io.raced
    # the racer's head survives (version never regresses) ...
    assert man["version"] == 2 and man["lex_gen"] == 5
    # ... but the forget's guarantee holds: floor raised, pre-forget
    # versions gone from history
    assert man["floor"] == 2
    assert all(int(h["version"]) >= 2 for h in man.get("hist", []))
    # a later NORMAL publish carries the floor forward and keeps
    # sub-floor versions out of its stacked history
    patterns.publish_hybrid_manifest(
        io.inner, run, version=3, lex_gen=7, ann_snapshot=3,
        sum_dl=70, n_docs=7,
    )
    man = io.inner.read_json(patterns._hybrid_manifest_path(run))
    assert man["floor"] == 2
    assert [h["version"] for h in man["hist"]] == [2]


def test_forget_gen_clamp_repoints_stale_racing_head(tmp_path):
    """The generation clamp (round 15, ADVICE r14): the floor alone
    leaves a hole — a racing coordinator that resolved its indexes
    BEFORE the forget (lex_gen below the forget's) but won the version
    CAS AFTER it would serve with pre-forget scoping. The forget's
    covered-branch retry must RE-POINT such a head at its own
    post-purge index state, and a later normal publish carrying a
    pre-forget lex_gen must be refused outright."""
    import pytest as _pytest

    from duckdb_streaming_patterns_spark.plans.commitio import (
        ObjectStoreSimIO,
    )

    run = str(tmp_path / "genclamp")
    os.makedirs(run, exist_ok=True)

    class RacingIO:
        def __init__(self):
            self.inner = ObjectStoreSimIO()
            self.raced = False

        def __getattr__(self, name):
            return getattr(self.inner, name)

        def swap_pointer(self, path, obj, expected=None):
            if not self.raced and obj.get("floor") == 2:
                self.raced = True
                # the racer: resolved the generation pointer PRE-forget
                # (lex_gen 3 < the forget's 4) but publishes the next
                # version AFTER the forget began
                patterns.publish_hybrid_manifest(
                    self.inner, run, version=2, lex_gen=3, ann_snapshot=1,
                    sum_dl=30, n_docs=3,
                )
            return self.inner.swap_pointer(path, obj, expected=expected)

    io = RacingIO()
    patterns.publish_hybrid_manifest(
        io.inner, run, version=1, lex_gen=3, ann_snapshot=1,
        sum_dl=30, n_docs=3,
    )
    patterns.publish_hybrid_manifest(
        io, run, version=2, lex_gen=4, ann_snapshot=2,
        sum_dl=20, n_docs=2, reset_history=True,
    )
    man = io.inner.read_json(patterns._hybrid_manifest_path(run))
    assert io.raced
    # version never regresses, but the stale head's index state was
    # re-pointed at the forget's post-purge state
    assert man["version"] == 2
    assert man["lex_gen"] == 4 and man["ann_snapshot"] == 2
    assert man["sum_dl"] == 20 and man["n_docs"] == 2
    assert man["floor"] == 2 and man["forget_gen"] == 4
    assert all(int(h["lex_gen"]) >= 4 for h in man.get("hist", []))
    # a WOULD-INSTALL normal publish with a pre-forget lex_gen is
    # refused — that coordinator must re-resolve the generation pointer
    with _pytest.raises(ValueError, match="predates the forget"):
        patterns.publish_hybrid_manifest(
            io.inner, run, version=3, lex_gen=3, ann_snapshot=3,
            sum_dl=30, n_docs=3,
        )
    # a redelivery of an already-covered stale publish stays a quiet
    # no-op (idempotence is not sacrificed to the clamp)
    patterns.publish_hybrid_manifest(
        io.inner, run, version=1, lex_gen=3, ann_snapshot=1,
        sum_dl=30, n_docs=3,
    )
    # a post-forget normal publish proceeds and carries forget_gen
    patterns.publish_hybrid_manifest(
        io.inner, run, version=3, lex_gen=5, ann_snapshot=3,
        sum_dl=25, n_docs=2,
    )
    man = io.inner.read_json(patterns._hybrid_manifest_path(run))
    assert man["version"] == 3 and man["forget_gen"] == 4


def test_retrieval_forget_refuses_manifest_without_dense_dir(
    spark, sf_small
):
    """Layout invariant (round 15, ADVICE r14): a hybrid manifest
    attests a dense side — a forget on a run dir that has the manifest
    but no vec/ivf_index must refuse BEFORE mutating anything (the
    manifest republish would be skipped, leaving pre-forget versions
    pinnable with no floor raised)."""
    import pytest as _pytest

    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )

    run = staging.new_run_dir("tgdprnodense")
    patterns.pattern_streaming_bm25_index(
        spark,
        staging.stage_document_chunks(
            spark, sf_small, staging.new_run_dir("tgdprndc"), n_chunks=3
        ),
        os.path.join(run, "lex"),
        _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
        state_partitions=4, compact_every=2,
    )
    tf_log, _dl = patterns.bm25_reader_logs(spark, os.path.join(run, "lex"))
    # a hybrid manifest exists but the dense dir does not
    patterns.publish_hybrid_manifest(
        tf_log.io, run, version=0, lex_gen=1, ann_snapshot=0,
        sum_dl=10, n_docs=1,
    )
    ptr_before = tf_log.io.read_json(
        patterns._bm25_gen_path(os.path.join(run, "lex"))
    )
    feed = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError, match="layout invariant"):
        patterns.retrieval_forget(spark, run, feed)
    # refused BEFORE any mutation: pointer untouched, no tombstones
    assert tf_log.io.read_json(
        patterns._bm25_gen_path(os.path.join(run, "lex"))
    ) == ptr_before
    assert not patterns.bm25_tomb_log(
        spark, os.path.join(run, "lex")
    )._batch_dirs()


def test_tombstones_retire_after_purge_keeping_serve_exact(
    spark, sf_small
):
    """Tombstone retirement (round 15, verdict item 3): after a purged
    forget, the LIVE tomb log is empty — the serve takes the
    no-tombstone fast path (no anti-join at all) yet still excludes the
    forgotten docs (they are physically gone) — and the membership
    moves to the retired ledger so a re-forget stays a pure no-op.
    Under SEQUENTIAL forgets the live log stays bounded by the
    in-flight request, not the lifetime forget count."""
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )

    run = staging.new_run_dir("tgdprretire")
    chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("tgdprretc"), n_chunks=5
    )
    patterns.pattern_streaming_bm25_index(
        spark, chunks, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
        state_partitions=4, compact_every=2,
    )
    docs = load_table(spark, sf_small, "documents")
    out1 = patterns.retrieval_forget(
        spark, run, docs.filter(F.col("doc_id") % 5 == 1).select("doc_id")
    )
    assert out1["n_forgotten"] > 0
    assert out1["n_tombs_retired"] >= 1
    # live tomb log empty -> the serve-side probe returns None and the
    # serve plan carries NO tombstone anti-join
    assert patterns._bm25_tomb_or_none(spark, run) is None
    served1 = {
        tuple(r)
        for r in patterns.bm25_consistent_serve(
            spark, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5
        ).collect()
    }
    assert served1 and all(r[1] % 5 != 1 for r in served1)
    # a SECOND forget: its live tombstones are request-sized (bounded
    # by the in-flight forget, not cumulative), then retire too
    out2 = patterns.retrieval_forget(
        spark, run, docs.filter(F.col("doc_id") % 5 == 2).select("doc_id")
    )
    assert out2["n_forgotten"] > 0 and out2["gen"] == out1["gen"] + 1
    assert patterns._bm25_tomb_or_none(spark, run) is None
    served2 = {
        tuple(r)
        for r in patterns.bm25_consistent_serve(
            spark, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5
        ).collect()
    }
    assert served2 and all(r[1] % 5 not in (1, 2) for r in served2)
    # the retired ledger holds BOTH forgets' membership ...
    retired = patterns.bm25_retired_tomb_log(spark, run).read_latest()
    assert retired.count() == out1["n_forgotten"] + out2["n_forgotten"]
    # ... so re-forgetting the FIRST request is still a pure no-op:
    # no burned generation, no republished pointer
    out3 = patterns.retrieval_forget(
        spark, run, docs.filter(F.col("doc_id") % 5 == 1).select("doc_id")
    )
    assert out3["n_forgotten"] == 0 and out3["gen"] == out2["gen"]


def test_retire_tombstones_refuses_maintained_tomb_log(spark):
    """ADVICE r15: retirement selects raw generation dirs by id; a
    MERGED (negative-id) dir could fold tombstones from generations
    above the horizon, so deleting it by its synthetic id would drop
    in-flight forgets. Nothing in-repo maintains the tomb log — the
    guard pins that contract in the generic helper."""
    import pytest

    run = staging.new_run_dir("tretguard")
    tomb = patterns.bm25_tomb_log(spark, run)
    retired = patterns.bm25_retired_tomb_log(spark, run)
    tomb.append(spark.createDataFrame([(1,), (2,)], "doc_id long"), 1)
    tomb.append(spark.createDataFrame([(3,)], "doc_id long"), 2)
    tomb.maintain(fanout=2)  # folds the raw dirs into a negative-id dir
    with pytest.raises(RuntimeError, match="merged"):
        patterns._retire_tombstones(tomb, retired, horizon=2)


def test_streaming_release_equals_batch_at_every_version(spark, sf_small):
    """Round 15, verdict item 6: the streaming release ladder must be
    byte-identical to one-shot batch releases over the same corpus
    prefixes — version 1 (mid-stream, 3 of 6 chunks) equals the batch
    build over the prefix corpus, version 2 (head) equals the batch
    build over the full corpus, manifest fingerprints included; each
    version carries the micro-batch watermark it covers and stays
    pinnable through the history from one GET."""
    from duckdb_streaming_patterns_spark.queries import (  # noqa: F401
        QUERIES as _load_registry_chain,  # qp's oracle assembly needs it
    )
    from duckdb_streaming_patterns_spark import queries_pipeline as qp
    from duckdb_streaming_patterns_spark.plans.commitio import POSIX_IO

    run = staging.new_run_dir("tstrel")
    chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("tstrelc"), n_chunks=6
    )
    out = patterns.pattern_streaming_release(
        spark, chunks, run, release_every=3, at_version=1,
        state_partitions=4,
    )
    docs = load_table(spark, sf_small, "documents")
    n = docs.count()
    cut = 3 * ((n + 5) // 6)
    # batch twins over the same prefixes, in fresh release dirs
    man_mid = qp.corpus_release_build(
        spark, docs.filter(F.col("doc_id") < cut),
        staging.new_run_dir("tstrelmid"), version=1,
    )
    man_full = qp.corpus_release_build(
        spark, docs, staging.new_run_dir("tstrelfull"), version=1,
    )
    release_dir = os.path.join(run, "release")
    man = POSIX_IO.read_json(qp._release_manifest_path(release_dir))
    assert man["version"] == 2 and man["covers"] == 5
    assert [h["version"] for h in man["hist"]] == [1]
    # head == batch-over-full-corpus, attested shard for shard
    assert man["shards"] == man_full["shards"]
    assert man["mixture"] == man_full["mixture"]
    # mid-stream version == batch-over-prefix: its stored bytes
    # re-fingerprint to the batch twin's manifest, and the returned
    # consumer read (manifest GET -> history entry -> direct data
    # reads) row-equals the pinned read of the same version
    mid_rows = sorted(tuple(r) for r in out.collect())
    assert man_mid["shards"] == _mid_manifest_shards(spark, release_dir, qp)
    assert mid_rows == sorted(
        tuple(r)
        for r in qp.corpus_release_read(
            spark, release_dir, at_version=1
        ).collect()
    )


def _mid_manifest_shards(spark, release_dir, qp):
    """The mid-stream version's shard fingerprints, recomputed from its
    own stored data through the Merkle helper — proving the history
    entry's bytes, not just the head's, match the batch twin."""
    from duckdb_streaming_patterns_spark.plans.commitio import POSIX_IO

    man = POSIX_IO.read_json(qp._release_manifest_path(release_dir))
    mid = [h for h in man["hist"] if int(h["version"]) == 1][0]
    stored = spark.read.parquet(os.path.join(release_dir, mid["data"]))
    return sorted(
        (
            {
                "shard": int(r["shard"]),
                "n_docs": int(r["n_docs"]),
                "n_bins": int(r["n_bins"]),
                "n_clean_tokens": int(r["n_clean_tokens"]),
                "fingerprint": r["fingerprint"],
            }
            for r in qp._release_fingerprints(stored)
        ),
        key=lambda d: d["shard"],
    )


def test_streaming_release_tail_window_publishes(spark, sf_small):
    """A chunk count that does not divide the release cadence still
    publishes a head covering the FULL ingested corpus (the tail
    release), so a consumer never trains on a truncated ladder."""
    from duckdb_streaming_patterns_spark.queries import (  # noqa: F401
        QUERIES as _load_registry_chain,
    )
    from duckdb_streaming_patterns_spark import queries_pipeline as qp
    from duckdb_streaming_patterns_spark.plans.commitio import POSIX_IO

    run = staging.new_run_dir("tstreltail")
    chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("tstreltc"), n_chunks=5
    )
    out = patterns.pattern_streaming_release(
        spark, chunks, run, release_every=3, at_version=None,
        state_partitions=4,
    )
    man = POSIX_IO.read_json(
        qp._release_manifest_path(os.path.join(run, "release"))
    )
    # v1 covered batches 0-2; the tail v2 covers the remaining 2
    assert man["version"] == 2 and man["covers"] == 4
    docs = load_table(spark, sf_small, "documents")
    man_full = qp.corpus_release_build(
        spark, docs, staging.new_run_dir("tstreltf"), version=1,
    )
    assert man["shards"] == man_full["shards"]
    assert out.count() == sum(s["n_docs"] for s in man_full["shards"])


def test_streaming_release_funnel_state_is_incremental(
    spark, sf_small, monkeypatch
):
    """Round 16, verdict item 1: the ladder must never re-run the batch
    funnel — each doc's release metadata is computed ONCE, at the tick
    covering its arrival batch, and later release ticks re-READ it
    from state. Pins both halves: _funnel_keep_clean is poisoned for
    the whole run, and every reldocs row lives in exactly the state
    dir of its covering tick (tick 2 for chunks 0-2, tick 5 for
    chunks 3-5) — the second tick funneled only its own delta."""
    import glob as _glob

    from duckdb_streaming_patterns_spark.queries import (  # noqa: F401
        QUERIES as _load_registry_chain,  # qp's oracle assembly needs it
    )
    from duckdb_streaming_patterns_spark import queries_pipeline as qp

    def _boom(*a, **k):
        raise AssertionError("ladder re-ran the batch funnel")

    monkeypatch.setattr(qp, "_funnel_keep_clean", _boom)
    run = staging.new_run_dir("tstrelinc")
    chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("tstrelincc"), n_chunks=6
    )
    out = patterns.pattern_streaming_release(
        spark, chunks, run, release_every=3, at_version=None,
        state_partitions=4,
    )
    assert out.count() > 0
    base = sorted(_glob.glob(os.path.join(run, "fstate_e*")))[-1]
    rel = spark.read.option(
        "basePath", os.path.join(base, "reldocs")
    ).parquet(os.path.join(base, "reldocs"))
    assert rel.groupBy("doc_id").count().filter("count > 1").count() == 0
    docs = load_table(spark, sf_small, "documents")
    per = (docs.count() + 5) // 6
    rows = rel.select("doc_id", "__batch_id").collect()
    covering_tick = lambda c: (c // 3 + 1) * 3 - 1  # noqa: E731
    assert rows and all(
        covering_tick(r["doc_id"] // per) == r["__batch_id"]
        for r in rows
    )


def test_release_funnel_batch_retry_is_idempotent(spark, sf_small):
    """A crashed foreachBatch re-delivers its batch; the incremental
    funnel's before_batch-scoped reads + per-dir idempotent appends
    must make the re-delivered state bit-identical to a clean run."""
    docs = load_table(spark, sf_small, "documents")
    per = (docs.count() + 2) // 3
    b0 = docs.filter(F.col("doc_id") < per).localCheckpoint(eager=True)
    b1 = (
        docs.filter(
            (F.col("doc_id") >= per) & (F.col("doc_id") < 2 * per)
        ).localCheckpoint(eager=True)
    )
    runs = [staging.new_run_dir("trfbretry"), staging.new_run_dir("trfbclean")]
    both = [patterns.release_state_logs(spark, r) for r in runs]
    for logs in both:
        patterns.release_funnel_batch(spark, *logs, b0, 0)
        patterns.release_funnel_batch(spark, *logs, b1, 1)
    patterns.release_funnel_batch(spark, *both[0], b1, 1)  # the retry
    for i in range(4):
        a = sorted(tuple(r) for r in both[0][i].read_latest().collect())
        b = sorted(tuple(r) for r in both[1][i].read_latest().collect())
        assert a == b, f"state log {i} diverged after re-delivery"


def test_span_gram_state_probe_is_dpp_pruned(spark):
    """The incremental span removal's only state touch: the
    first-occurrence gram probe must carry a dynamic-partition-pruning
    subquery on the gram-bucketed log (broadcast batch keys with __kb
    derived on the build side), so a tick reads O(delta's buckets) of
    accumulated gram state — never the whole log."""
    run = staging.new_run_dir("tspanprobe")
    logs = patterns.release_state_logs(spark, run)
    gram_log = logs[2]
    gram_log.append(
        spark.createDataFrame(
            [(i * 7919,) for i in range(50)], "gram long"
        ),
        0,
    )
    g = spark.createDataFrame(
        [(1, 1, 7919), (1, 2, 123456789)], "__id long, pos long, gram long"
    )
    # build the probe's join WITHOUT the localCheckpoint tail (which
    # would hide the join from explain), through the same pieces the
    # probe composes
    import contextlib
    import io

    state = gram_log.read_latest(before_batch=1, keep_bucket=True)
    b_keys = (
        g.select("gram")
        .distinct()
        .filter(F.col("gram") >= F.lit(-(2 ** 63)))
        .withColumn("__kb", gram_log.bucket_of(F.col("gram")))
    )
    probe = state.join(F.broadcast(b_keys), ["gram", "__kb"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), plan[:3000]
    # and the evaluated probe returns exactly the state-present grams
    out = patterns._span_gram_state_hits(gram_log, g, 1)
    assert sorted(r["gram"] for r in out.collect()) == [7919]


def test_streaming_release_exact_when_benchmark_spans_batches(
    spark, sf_small
):
    """The exactness edge of the incremental split (round 16): when
    tiny chunking spreads the doc_id<50 contamination benchmark across
    several micro-batches, docs KEPT before the benchmark finished
    arriving are exactly the short (< 8-token) benchmark docs — which
    no bitset can ever flag — so the incremental ladder needs NO
    rebuild and must still equal the one-shot batch build at both
    rungs. Forced here with 20-doc chunks and docs 0-19 rewritten to a
    7-token quality-passing text: chunk 0 lands kept docs, chunks 1-2
    bring the rest of the benchmark's grams afterwards."""
    import glob as _glob

    from duckdb_streaming_patterns_spark.queries import (  # noqa: F401
        QUERIES as _load_registry_chain,
    )
    from duckdb_streaming_patterns_spark import queries_pipeline as qp
    from duckdb_streaming_patterns_spark.plans.commitio import POSIX_IO

    docs = (
        load_table(spark, sf_small, "documents")
        .filter(F.col("doc_id") < 120)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") < 20,
                F.concat(
                    F.lit("it was the best of times "),
                    F.col("doc_id").cast("string"),
                ),
            ).otherwise(F.col("text")),
        )
        .localCheckpoint(eager=True)
    )
    out_dir = staging.new_run_dir("tstrellatec")
    chunk = (F.col("doc_id") / F.lit(20)).cast("int").alias("__chunk")
    chunks_dir = os.path.join(out_dir, "chunks")
    (
        docs.select("*", chunk)
        .repartition("__chunk")
        .write.mode("overwrite")
        .partitionBy("__chunk")
        .parquet(chunks_dir)
    )
    staging._stamp_chunk_order(chunks_dir)
    run = staging.new_run_dir("tstrellate")
    out = patterns.pattern_streaming_release(
        spark, chunks_dir, run, release_every=3, at_version=None,
        state_partitions=4,
    )
    # the edge is genuinely exercised: short benchmark docs were kept
    # and released, and no epoch rebuild happened
    assert out.filter(F.col("doc_id") < 20).count() > 0
    eps = sorted(_glob.glob(os.path.join(run, "fstate_e*")))
    assert len(eps) == 1 and eps[0].endswith("e00000")
    release_dir = os.path.join(run, "release")
    man = POSIX_IO.read_json(qp._release_manifest_path(release_dir))
    man_full = qp.corpus_release_build(
        spark, docs, staging.new_run_dir("tstrellatef"), version=1
    )
    assert man["shards"] == man_full["shards"]
    assert man["mixture"] == man_full["mixture"]
    # the mid-stream rung equals the batch build over the 60-doc prefix
    man_mid = qp.corpus_release_build(
        spark, docs.filter(F.col("doc_id") < 60),
        staging.new_run_dir("tstrellatem"), version=1,
    )
    assert _mid_manifest_shards(spark, release_dir, qp) == man_mid["shards"]


def test_streaming_release_ladder_retention(spark, sf_small):
    """Round 16, verdict item 2: keep_last wired into the ladder —
    expired versions' data dirs are GONE from disk while the pinnable
    history still serves, and a read below the retained window raises."""
    import pytest

    from duckdb_streaming_patterns_spark.queries import (  # noqa: F401
        QUERIES as _load_registry_chain,
    )
    from duckdb_streaming_patterns_spark import queries_pipeline as qp
    from duckdb_streaming_patterns_spark.plans.commitio import POSIX_IO

    run = staging.new_run_dir("tstrelret")
    chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("tstrelretc"), n_chunks=6
    )
    out = patterns.pattern_streaming_release(
        spark, chunks, run, release_every=1, at_version=5,
        state_partitions=4, keep_last=2,
    )
    release_dir = os.path.join(run, "release")
    man = POSIX_IO.read_json(qp._release_manifest_path(release_dir))
    assert man["version"] == 6
    assert [h["version"] for h in man["hist"]] == [5]
    data_dirs = [
        n for n in os.listdir(release_dir) if n.startswith("data_v")
    ]
    assert len(data_dirs) == 2  # the head + the one retained rung
    assert out.count() > 0  # v5 still serves through the history
    with pytest.raises(ValueError, match="not in the manifest"):
        qp.corpus_release_read(spark, release_dir, at_version=4)


def test_streaming_release_ladder_forget_raises_floor(spark, sf_small):
    """Round 16, verdict item 5: GDPR forget composed into the LADDER —
    a mid-stream corpus delete tombstones AND vacuums the corpus-of-
    record, epoch-rebuilds the funnel state over the survivors, and
    publishes a forget release whose floor refuses every pre-delete
    version; the head must equal the one-shot batch release over the
    surviving corpus."""
    import pytest

    from duckdb_streaming_patterns_spark.queries import (  # noqa: F401
        QUERIES as _load_registry_chain,
    )
    from duckdb_streaming_patterns_spark import queries_pipeline as qp
    from duckdb_streaming_patterns_spark.plans.commitio import POSIX_IO

    run = staging.new_run_dir("tstrelfgt")
    chunks = staging.stage_document_chunks(
        spark, sf_small, staging.new_run_dir("tstrelfgtc"), n_chunks=6
    )
    out = patterns.pattern_streaming_release(
        spark, chunks, run, release_every=3, at_version=None,
        state_partitions=4,
        forget_predicate=F.col("doc_id") % 7 == 3,
        forget_after_batch=5,
    )
    release_dir = os.path.join(run, "release")
    man = POSIX_IO.read_json(qp._release_manifest_path(release_dir))
    assert man["version"] == 3  # v1 (batch 2) + the forget rung
    assert man["floor"] == 3 and man["hist"] == []
    assert out.filter(F.col("doc_id") % 7 == 3).count() == 0
    docs = load_table(spark, sf_small, "documents")
    man_full = qp.corpus_release_build(
        spark, docs.filter(~(F.col("doc_id") % 7 == 3)),
        staging.new_run_dir("tstrelfgtf"), version=1,
    )
    assert man["shards"] == man_full["shards"]
    assert man["mixture"] == man_full["mixture"]
    with pytest.raises(ValueError, match="forgotten"):
        qp.corpus_release_read(spark, release_dir, at_version=1)
    # the corpus-of-record is physically purged, not just tombstoned
    corpus = SnapshotTable(
        spark,
        os.path.join(run, "corpus"),
        "doc_id long, text string, source string",
    )
    assert corpus.read().filter(F.col("doc_id") % 7 == 3).count() == 0


def test_ann_forget_on_dense_only_run(spark, sf_small):
    """Round 15, verdict item 5: an ANN-only deployment (the
    pattern_streaming_ann_index layout — no BM25 pointer, which
    retrieval_forget refuses) can forget standalone: tombstone snapshot
    + vacuum; the head probe excludes the vectors AND an as-of probe
    pinned BELOW the delete snapshot cannot resurface them (the purge
    rewrote every generation to survivors only); a re-forget is a
    rows=0 no-op."""
    import json as _json

    import pytest

    from pyspark.sql import Row

    run = staging.new_run_dir("tannfgt")
    chunks = staging.stage_embedding_chunks(
        spark, sf_small, staging.new_run_dir("tannfgtc"), n_chunks=5
    )
    queries_df = load_table(spark, sf_small, "embeddings").filter(
        F.col("vec_id") < 3
    )
    before = patterns.pattern_streaming_ann_index(
        spark, chunks, run, queries_df, k=5, n_cells=8, n_probe=3,
        state_partitions=4,
    ).collect()
    victims = sorted({r["neighbor_id"] for r in before if r["rank"] <= 2})
    assert victims
    feed = spark.createDataFrame([(v,) for v in victims], "vec_id long")
    # the lexical-anchored forget refuses this layout — the factored
    # dense half is the supported path
    with pytest.raises(ValueError, match="generation pointer"):
        patterns.retrieval_forget(spark, run, feed.withColumnRenamed(
            "vec_id", "doc_id"
        ))
    index = SnapshotTable(
        spark,
        os.path.join(run, "ivf_index"),
        "vec_id long, embedding array<float>, cell_id long",
        partition_cols=["cell_id"],
    )
    pre_sid = index.max_snapshot_id()
    out = patterns.ann_forget(spark, run, feed)
    assert out["n_forgotten"] == len(victims)
    assert out["ann_delete_snapshot"] == pre_sid + 1
    with open(os.path.join(run, "anchors.json")) as f:
        anchors = [Row(aid=a, vec=v) for a, v in _json.load(f)]
    head = patterns.ann_probe(
        spark, index, anchors, queries_df, k=5, n_probe=3
    ).collect()
    assert head and not {r["neighbor_id"] for r in head} & set(victims)
    # the as-of probe BELOW the delete snapshot: purged, not resurfaced
    pinned = patterns.ann_probe(
        spark, index, anchors, queries_df, k=5, n_probe=3,
        as_of_snapshot=pre_sid,
    ).collect()
    assert pinned and not {r["neighbor_id"] for r in pinned} & set(victims)
    # idempotent re-forget of the SAME request: fenced to the ORIGINAL
    # tombstone — same snapshot, same measured count, no second ledger
    # entry (ADVICE r15: the request-derived fence key makes a replay —
    # crash-retry or caller re-issue — resolve the first commit instead
    # of committing a rows=0 duplicate and reporting 0)
    post_sid = index.max_snapshot_id()
    out2 = patterns.ann_forget(spark, run, feed)
    assert out2 == out
    assert index.max_snapshot_id() == post_sid
    # a DIFFERENT request (disjoint ids, nothing to delete) is its own
    # commit: a genuine rows=0 no-op, not a fence hit
    out3 = patterns.ann_forget(
        spark, run,
        spark.createDataFrame([(10_000_000,)], "vec_id long"),
    )
    assert out3["n_forgotten"] == 0 and out3["ann_delete_snapshot"] != out[
        "ann_delete_snapshot"
    ]


def test_bm25_and_ann_serve_false_leave_fully_servable_state(
    spark, sf_small
):
    """r16 optimization contract: ``serve=False`` on the two ingest
    patterns skips ONLY the drain serve/probe construction (the eager
    stats read / probe-cell collect a discarding composition pays for
    nothing) — it must change NOTHING about the durable state. Pinned
    by draining twice into twin run dirs, serve on/off, and comparing
    (a) the returned None, (b) the generation pointer byte-for-byte,
    (c) the consistent-serve answer row-for-row against the
    serve=True run's returned frame."""
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )
    from duckdb_streaming_patterns_spark.sources.tables import load_table
    from duckdb_streaming_patterns_spark.streaming import patterns, staging

    run_on = staging.new_run_dir("srvon")
    run_off = staging.new_run_dir("srvoff")
    chunks = staging.stage_document_chunks(
        spark, sf_small, run_on, n_chunks=5
    )
    served = patterns.pattern_streaming_bm25_index(
        spark, chunks, run_on, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
        state_partitions=4, compact_every=2,
    )
    out_off = patterns.pattern_streaming_bm25_index(
        spark, chunks, run_off, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
        state_partitions=4, compact_every=2, serve=False,
    )
    assert out_off is None
    tf_on, _ = patterns.bm25_reader_logs(spark, run_on)
    tf_off, _ = patterns.bm25_reader_logs(spark, run_off)
    ptr_on = tf_on.io.try_read_json(patterns._bm25_gen_path(run_on))
    ptr_off = tf_off.io.try_read_json(patterns._bm25_gen_path(run_off))
    assert ptr_on is not None and ptr_on == ptr_off
    key = lambda r: (r["query_id"], r["rank"], r["doc_id"])  # noqa: E731
    want = sorted(key(r) for r in served.collect())
    got = sorted(
        key(r)
        for r in patterns.bm25_consistent_serve(
            spark, run_off, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5
        ).collect()
    )
    assert got == want

    # dense half: serve=False returns None; the frozen-quantizer index
    # it leaves behind probes identically to the serve=True run's return
    emb_run = staging.new_run_dir("srvemb")
    emb_chunks = staging.stage_embedding_chunks(
        spark, sf_small, emb_run, n_chunks=5
    )
    queries_df = load_table(spark, sf_small, "embeddings").filter(
        "vec_id < 3"
    )
    vec_on = patterns.pattern_streaming_ann_index(
        spark, emb_chunks, os.path.join(emb_run, "on"), queries_df,
        k=5, state_partitions=4,
    )
    vec_off_out = patterns.pattern_streaming_ann_index(
        spark, emb_chunks, os.path.join(emb_run, "off"), queries_df,
        k=5, state_partitions=4, serve=False,
    )
    assert vec_off_out is None
    from duckdb_streaming_patterns_spark.plans.snapshots import (
        SnapshotTable,
    )
    import json as _json

    from pyspark.sql import Row

    off_dir = os.path.join(emb_run, "off")
    index = SnapshotTable(
        spark,
        os.path.join(off_dir, "ivf_index"),
        "vec_id long, embedding array<float>, cell_id long",
        partition_cols=["cell_id"],
    )
    with open(os.path.join(off_dir, "anchors.json")) as f:
        anchors = [Row(aid=a, vec=v) for a, v in _json.load(f)]
    vkey = lambda r: (r["query_id"], r["rank"], r["neighbor_id"])  # noqa: E731
    assert sorted(
        vkey(r)
        for r in patterns.ann_probe(
            spark, index, anchors, queries_df, k=5
        ).collect()
    ) == sorted(vkey(r) for r in vec_on.collect())
