"""Sketch-family tests (round 12): bottom-k quantile accuracy, streaming
KMV retry/crash-window contract + estimate accuracy, and the runtime
Bloom-filter join plan shape under production thresholds."""

from __future__ import annotations

import contextlib
import io
import os
import shutil

from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.queries import QUERIES


def test_kmv_quantile_rank_error_bounded(spark, sf_small):
    """The bottom-k hash sample's nearest-rank percentile must sit near
    the true percentile of the FULL per-language distribution: the
    empirical CDF of the estimate vs the target p within 3σ ≈
    3·sqrt(p(1-p)/k) (k=64 → ±0.19 at p=0.5), loosened slightly for
    nearest-rank discreteness on small groups."""
    from duckdb_streaming_patterns_spark.functions.text import tokens
    from duckdb_streaming_patterns_spark.sources.tables import load_table

    fn, _ = QUERIES["approx_quantiles_kmv"]
    est = {r["lang"]: r for r in fn(spark, sf_small).collect()}

    docs = load_table(spark, sf_small, "documents").select(
        "lang", F.size(tokens(F.col("text"))).cast("bigint").alias("val")
    )
    full: dict[str, list[int]] = {}
    for r in docs.collect():
        full.setdefault(r["lang"], []).append(r["val"])
    for vals in full.values():
        vals.sort()
    for lang, vals in full.items():
        n = len(vals)
        assert est[lang]["n_sample"] == min(64, n)
        for col, p in (("p50_tokens", 0.5), ("p90_tokens", 0.9)):
            v = est[lang][col]
            # empirical CDF of the estimated percentile value
            cdf = sum(1 for x in vals if x <= v) / n
            assert abs(cdf - p) <= 0.25, (lang, col, v, cdf, p)


def test_streaming_kmv_retries_idempotently_across_crash_windows(
    spark, tmp_path
):
    """KMV fold retry contract across both crash windows (fenced
    SummaryTable swap; read_prev on a re-delivered applied batch;
    batch-id-fenced estimate append): every delivery schedule must
    produce the identical estimate trajectory and the identical k-min
    state."""
    from duckdb_streaming_patterns_spark.operators.merge import (
        SummaryTable,
        UpsertLog,
    )
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        distinct_kmv_batch,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "user_id long, event_type string")

    b0 = mk([(1, "click"), (2, "click"), (1, "view")])
    b1 = mk([(2, "click"), (3, "click"), (9, "view")])
    b2 = mk([(4, "click")])

    results = {}
    for crash in (None, "redeliver", "after_merge"):
        root = str(tmp_path / f"kmv_{crash}")
        state = SummaryTable(
            spark,
            os.path.join(root, "kmv"),
            "event_type string, hx string, h60 long",
        )
        vlog = UpsertLog(
            spark,
            os.path.join(root, "estimates"),
            keys=["batch_seq", "event_type"],
            insert_only=True,
        )
        distinct_kmv_batch(state, vlog, b0, 0, 64)
        if crash == "after_merge":
            # estimate row lost AFTER the state swap committed — the
            # retry must rebuild it from read_prev, not double-fold
            distinct_kmv_batch(state, vlog, b1, 1, 64)
            shutil.rmtree(os.path.join(vlog.root, "__batch_id=1"))
        distinct_kmv_batch(state, vlog, b1, 1, 64)
        if crash == "redeliver":
            distinct_kmv_batch(state, vlog, b1, 1, 64)  # full re-delivery
        distinct_kmv_batch(state, vlog, b2, 2, 64)
        got = sorted(
            (r["batch_seq"], r["event_type"], r["est_users"])
            for r in vlog.read_latest().collect()
        )
        results[crash] = got
        st = sorted(
            (r["event_type"], r["hx"]) for r in state.read().collect()
        )
        # below k → the sketch IS the distinct set and est is exact:
        # click users {1,2,3,4}, view users {1,9}
        assert len(st) == 6
        assert (2, "click", 4.0) in got and (2, "view", 2.0) in got
    assert results[None] == results["redeliver"] == results["after_merge"]


def test_streaming_kmv_estimate_error_bounded(spark, sf_small):
    """End-to-end registered form: the drain-batch estimate per event
    type must land within the k=64 KMV error envelope (~3/sqrt(63) ≈
    38%) of the exact distinct-user count — the sketch has to be
    APPROXIMATELY RIGHT, not merely oracle-consistent."""
    from duckdb_streaming_patterns_spark.sources.tables import load_table

    fn, _ = QUERIES["pattern_streaming_distinct_kmv"]
    rows = fn(spark, sf_small).collect()
    last = max(r["batch_seq"] for r in rows)
    est = {
        r["event_type"]: r["est_users"]
        for r in rows
        if r["batch_seq"] == last
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_small, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, n in exact.items():
        assert abs(est[t] - n) <= max(2.0, 0.4 * n), (t, est[t], n)


def test_runtime_bloom_join_plan_injects_bloom_filter(spark, sf_small):
    """Under production-like thresholds (no broadcast; size gates open)
    the optimizer must inject the runtime row-level Bloom filter: a
    bloom_filter_agg over the filtered orders' keys and a
    might_contain(l_orderkey) predicate on the lineitem side — the
    semi-join reduction that drops ~4/5 of the big side before the
    shuffle at 100 TB. Values stay oracle-checked under default confs
    (the broadcast plan); this pins the scale plan."""
    fn, _ = QUERIES["runtime_bloom_join_revenue"]
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        df = fn(spark, sf_small)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        assert "bloom_filter_agg" in plan, "creation side did not build"
        assert "might_contain" in plan, "application side not filtered"
        # and the values survive the alternate physical plan
        got = sorted(
            (r["returnflag"], r["n_lines"]) for r in df.collect()
        )
        assert sum(n for _, n in got) > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_streaming_quantiles_retries_idempotently(spark, tmp_path):
    """Quantile-sample fold retry contract (same two crash windows as
    the KMV fold): identical trajectory under every delivery schedule,
    and the below-k samples make the estimates EXACT nearest-rank
    percentiles of the prefix."""
    from duckdb_streaming_patterns_spark.operators.merge import (
        SummaryTable,
        UpsertLog,
    )
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        quantiles_kmv_batch,
    )

    def mk(rows):
        return spark.createDataFrame(
            rows, "doc_id long, lang string, text string"
        )

    b0 = mk([(0, "en", "one two three"), (1, "en", "one")])
    b1 = mk([(2, "en", "one two three four five"), (3, "de", "ein zwei")])
    b2 = mk([(4, "en", "one two")])

    results = {}
    for crash in (None, "redeliver", "after_merge"):
        root = str(tmp_path / f"q_{crash}")
        state = SummaryTable(
            spark,
            os.path.join(root, "sample"),
            "lang string, doc_id long, val long, hx string, h60 long",
        )
        vlog = UpsertLog(
            spark,
            os.path.join(root, "estimates"),
            keys=["batch_seq", "lang"],
            insert_only=True,
        )
        quantiles_kmv_batch(state, vlog, b0, 0, 64)
        if crash == "after_merge":
            quantiles_kmv_batch(state, vlog, b1, 1, 64)
            shutil.rmtree(os.path.join(vlog.root, "__batch_id=1"))
        quantiles_kmv_batch(state, vlog, b1, 1, 64)
        if crash == "redeliver":
            quantiles_kmv_batch(state, vlog, b1, 1, 64)
        quantiles_kmv_batch(state, vlog, b2, 2, 64)
        got = sorted(
            (r["batch_seq"], r["lang"], r["n_sample"], r["p50_tokens"],
             r["p90_tokens"])
            for r in vlog.read_latest().collect()
        )
        results[crash] = got
    assert results[None] == results["redeliver"] == results["after_merge"]
    got = results[None]
    # en prefix at batch 2: vals {3,1,5,2} -> sorted [1,2,3,5]; m=4;
    # p50 idx=2 -> 2, p90 idx=4 -> 5
    assert (2, "en", 4, 2, 5) in got
    # de appears from batch 1 on, single val 2
    assert (1, "de", 1, 2, 2) in got and (2, "de", 1, 2, 2) in got


def test_streaming_mixture_retries_idempotently(spark, tmp_path):
    """Mixture-sampling fold retry contract: a redelivered batch must
    recompute the SAME post-batch histogram (from the already-merged
    summary) and therefore bit-identical thresholds + accepted rows —
    every delivery schedule converges to one trajectory."""
    from duckdb_streaming_patterns_spark.operators.merge import (
        SummaryTable,
        UpsertLog,
    )
    from duckdb_streaming_patterns_spark.streaming.patterns import (
        mixture_sample_batch,
    )

    def mk(rows):
        return spark.createDataFrame(rows, "doc_id long, source string")

    b0 = mk([(i, "a") for i in range(40)] + [(100 + i, "b") for i in range(4)])
    b1 = mk([(200 + i, "a") for i in range(40)] + [(300, "c")])
    b2 = mk([(400 + i, "b") for i in range(10)])

    results = {}
    for crash in (None, "redeliver", "after_merge"):
        root = str(tmp_path / f"mix_{crash}")
        counts = SummaryTable(
            spark, os.path.join(root, "hist"), "source string, n_docs long"
        )
        vlog = UpsertLog(
            spark,
            os.path.join(root, "accepted"),
            keys=["doc_id"],
            insert_only=True,
        )
        mixture_sample_batch(counts, vlog, b0, 0)
        if crash == "after_merge":
            mixture_sample_batch(counts, vlog, b1, 1)
            shutil.rmtree(os.path.join(vlog.root, "__batch_id=1"))
        mixture_sample_batch(counts, vlog, b1, 1)
        if crash == "redeliver":
            mixture_sample_batch(counts, vlog, b1, 1)
        mixture_sample_batch(counts, vlog, b2, 2)
        got = sorted(tuple(r) for r in vlog.read_latest().collect())
        results[crash] = got
        hist = {
            r["source"]: r["n_docs"] for r in counts.read().collect()
        }
        assert hist == {"a": 80, "b": 14, "c": 1}
        # small sources upweighted: c's threshold (when any c doc was
        # sampled-in or out) derives from rate min(1, ...) — with n=1
        # and alpha=.5 the rate caps at 1.0, so doc 300 MUST be accepted
        assert any(r[0] == 300 for r in got), got
    assert results[None] == results["redeliver"] == results["after_merge"]
