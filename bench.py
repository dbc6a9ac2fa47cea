"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Every query runs COLD exactly once (no warm-up pass of the query itself);
timing covers full plan execution via force_eval (hash-all-columns — see
its docstring for why count() under-measures). Session startup, Arrow
worker-pool and streaming-machinery warm-up, and one-time physical-layout
builds are excluded from every timed window. Queries from ISOLATE_FROM
onward each run in a fresh subprocess (``--one`` mode) so no session
debris contaminates them; the rest share one session with explicit GC at
query boundaries. Methodology flags are recorded in the output JSON.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from duckdb_streaming_patterns_spark import get_spark
from duckdb_streaming_patterns_spark.queries import QUERIES

# Streaming patterns (and everything ordered after them) run in FRESH
# SUBPROCESSES, one per query: a finished pattern's localCheckpoint blocks
# and broadcasts survive even explicit Python+JVM GC well enough to
# inflate later in-session queries 2-3x stochastically (round-5
# adjudication: pattern_streaming_full_funnel 63.7 s in-bench vs 31.0 s
# standalone on the same machine — the GC-at-boundaries mitigation was
# insufficient). Each subprocess pays session startup + warm-up OUTSIDE
# its timed window, exactly like scripts/scale_stress.py, so the recorded
# number measures the query, not the session's debris.
ISOLATE_FROM = "pattern_1_1_incremental_merge"

# Headline set: reference-parity core + star-schema joins + extended ops.
HEADLINE = [
    # reference parity
    "user_clicks",
    "user_clicks_top5",
    "event_type_counts",
    "reaggregate_partials",
    "distinct_users_per_type",
    "events_json_extract",
    "events_hourly_window",
    # star schema
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q9_product_type_profit",
    "q18_large_volume_customers",
    "q8_national_market_share",
    "q21_sole_returning_supplier",
    "top3_orders_per_customer",
    "rollup_region_nation_customers",
    # training-data ops
    "dedup_exact_hash",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "knn_bruteforce",
    "knn_lsh_ann",
    "knn_ivf_ann",
    "knn_pq_adc",
    "embedding_neardup_pairs",
    "embedding_neardup_lsh",
    "embedding_neardup_clusters",
    "semdedup_prune",
    "text_quality_scores",
    "text_language_id",
    "text_repetition_stats",
    "text_unigram_surprisal",
    "text_bm25_topk",
    "text_duplicated_spans",
    "text_remove_duplicated_spans",
    "doc_fingerprint",
    "dedup_minhash_clusters",
    "dedup_canonical_docs",
    "dedup_incremental_verdicts",
    "contamination_flags",
    "contamination_ngram_overlap",
    "train_val_test_split",
    "doc_chunks",
    "pack_token_bins",
    "mix_token_budget",
    "multimodal_payload_stats",
    "multimodal_ann_ivf",
    "hybrid_rrf_retrieval",
    "hybrid_rrf_retrieval_ivf",
    "approx_quantiles_kmv",
    "runtime_bloom_join_revenue",
    "mixture_temperature_sample",
    "text_pii_redact_positive",
    # physical layout
    "bucketed_join_revenue",
    "partition_pruned_daily_clicks",
    "dpp_pruned_daily_clicks",
    "zorder_boxed_clicks",
    "cdf_table_changes",
    "asof_join_last_click",
    "range_join_price_bands",
    # streaming patterns end-to-end
    "pattern_1_1_incremental_merge",
    "pattern_2_complete_overwrite",
    "pattern_2_insert_overwrite",
    "pattern_streaming_sessionization",
    "pattern_stream_stream_join",
    "sessionization_session_window",
    "pattern_streaming_corpus_dedup",
    "pattern_streaming_neardup_dedup",
    "pattern_gdpr_delete_propagation",
    "pattern_streaming_ann_index",
    "pattern_streaming_semdedup",
    "pattern_streaming_source_caps",
    "pattern_streaming_quality_drift",
    "pattern_streaming_ingest_funnel",
    "pattern_streaming_bm25_index",
    "pattern_streaming_bm25_midstream",
    "pattern_streaming_bm25_external_reader",
    "pattern_streaming_hybrid_retrieval",
    "pattern_streaming_hybrid_consistent",
    "pattern_streaming_hybrid_manifest",
    "pattern_streaming_retrieval_gdpr",
    "pattern_streaming_distinct_kmv",
    "pattern_streaming_quantiles_kmv",
    "pattern_streaming_mixture_sample",
    "pattern_streaming_asof_enrichment",
    "pattern_streaming_python_source",
    "pattern_streaming_python_sink",
    "pattern_streaming_full_funnel",
    "pattern_bootstrap_then_stream",
    "corpus_build_shards",
    "corpus_release_manifest",
    "pattern_streaming_release",
    "bonus_stateless_view_topk",
]


def force_eval(df) -> int:
    """Time FULL plan execution, not the count-pruned plan: ``count()``
    lets Catalyst prune every unreferenced output column — and with them
    whole operators. Measured examples: asof_join_last_click's window
    (last_click_ts unreferenced → window node gone, count times a bare
    scan+filter) and text_remove_duplicated_spans's rewrite (left join to
    a distinct-key aggregate with no right columns referenced → join AND
    gram pipeline eliminated; 0.24 s flat from x1 to x10 in the scale
    stress). Hashing every output column into one bit_xor aggregate
    (overflow-free under ANSI mode) forces the complete result while
    returning a single row; returns the row count. Falls back to count()
    for output types xxhash64 can't consume. Adopted round 4 — bench
    diffs vs r03 shift upward for projection-shaped queries because the
    old numbers under-measured, not because the engine got slower."""
    import pyspark.sql.functions as F

    try:
        hashed = df.select(
            F.xxhash64(*[F.col(c) for c in df.columns]).alias("__h")
        )
        row = hashed.agg(F.count("*").alias("n"), F.bit_xor("__h")).first()
        return row["n"]
    except Exception:
        return df.count()


def _warm_session(spark) -> None:
    """Session warm-up OUTSIDE any timed window: JVM/codegen path, the
    Arrow/Python-worker pool, and the Structured Streaming machinery
    (MicroBatchExecution, state-store provider, checkpoint I/O — ~10 s of
    one-time class loading that must not be charged to whichever query
    runs first). Queries themselves still run cold."""
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(_warm("id")).collect()

    import tempfile

    _warm_dir = tempfile.mkdtemp(prefix="bench_stream_warm_")
    spark.range(10).write.mode("overwrite").parquet(
        os.path.join(_warm_dir, "in")
    )
    (
        spark.readStream.schema("id long")
        .parquet(os.path.join(_warm_dir, "in"))
        .groupBy()
        .count()
        .writeStream.trigger(availableNow=True)
        .format("memory")
        .queryName("bench_stream_warm")
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(_warm_dir, "ckpt"))
        .start()
        .awaitTermination()
    )
    # One-time process costs every streaming PATTERN would otherwise be
    # charged for in its timed window (they were amortized across the
    # shared session before subprocess isolation): the foreachBatch
    # Python-callback plumbing, localCheckpoint block-manager setup, a
    # parquet sink commit, and the in-process DuckDB client import
    # (pattern-2's JDBC stand-in).
    (
        spark.readStream.schema("id long")
        .parquet(os.path.join(_warm_dir, "in"))
        .writeStream.trigger(availableNow=True)
        .foreachBatch(
            lambda df, bid: df.localCheckpoint(eager=True)
            .write.mode("overwrite")
            .parquet(os.path.join(_warm_dir, "fb_out"))
        )
        .option("checkpointLocation", os.path.join(_warm_dir, "ckpt_fb"))
        .start()
        .awaitTermination()
    )
    try:
        import duckdb  # noqa: F401

        duckdb.connect().execute("SELECT 1").fetchall()
    except ImportError:
        pass


def _calibrate(spark) -> float:
    """Time a FIXED, engine-independent reference workload (built-ins
    over ``spark.range`` — scan + codegen hash + small shuffle agg) and
    return its seconds. This measures the HOST AND WINDOW, not the
    engine: the workload never changes across rounds, so the ratio of
    two rounds' calibration times is the load/variance factor between
    their windows (this machine's background load drifts by tens of
    percent across minutes — round 8 measured 1.35x driver-vs-builder
    and >2x back-to-back variance on identical code, which made two
    consecutive cross-round diffs unanswerable). Runs once per
    subprocess after warm-up and twice (start/end) in the shared
    session; ``_diff_against_previous_round`` divides raw timings by
    the calibration ratio before flagging moves."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(30_000_000)
        .selectExpr("xxhash64(id) AS h", "id % 997 AS k")
        .groupBy("k")
        .agg(F.bit_xor("h").alias("x"))
        .agg(F.count("*").alias("n"), F.bit_xor("x"))
        .first()
    )
    return round(time.perf_counter() - t0, 4)


def _run_one(name: str, sf_dir: str) -> None:
    """Subprocess entry (``bench.py --one <query>``): fresh session, full
    warm-up untimed, one calibration probe (untimed window of its own),
    ONE cold query timed, one JSON line on stdout."""
    spark = get_spark(app_name=f"dsp-bench-{name}")
    _warm_session(spark)
    cal = _calibrate(spark)
    fn, _ = QUERIES[name]
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = force_eval(df)
    sec = round(time.perf_counter() - t0, 4)
    print(
        json.dumps(
            {"query": name, "sec": sec, "rows": int(n), "cal_sec": cal}
        )
    )


def _run_isolated(
    name: str, sf_dir: str
) -> tuple[float | None, float | None, str | None]:
    """Run one query via ``--one`` in a fresh subprocess and return
    ``(timed_seconds, calibration_seconds, None)`` — or
    ``(None, None, error_tail)`` if the child failed. One broken query
    must not abort the whole isolated block (ADVICE r6 low #4): the
    caller records the error and keeps timing the rest, so a single
    regression costs one number, not the round's entire bench tail."""
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    res = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--one", name],
        env=env,
        capture_output=True,
        text=True,
    )
    for line in reversed(res.stdout.strip().splitlines()):
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if d.get("query") == name:
            return float(d["sec"]), d.get("cal_sec"), None
    err = f"exit {res.returncode}: {res.stderr[-2000:]}"
    print(f"[bench] isolated run of {name} failed ({err})", file=sys.stderr)
    return None, None, err


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        _run_one(sys.argv[2], sf_dir)
        return
    spark = get_spark(app_name="dsp-bench")
    _warm_session(spark)

    # Pre-create the physical layouts and report their (one-time) write cost
    # separately — bucketing/partitioning pay a layout-time shuffle so every
    # subsequent join/scan is exchange-free; charging that write to the
    # query hid the steady-state number (and would hide a regression in the
    # join under layout noise).
    from duckdb_streaming_patterns_spark.operators import layout

    layout_setup: dict[str, float] = {}
    t0 = time.perf_counter()
    layout.bucketed_join_tables(spark, sf_dir)
    layout_setup["bucketed_join_tables"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    layout.partitioned_events(spark, sf_dir)
    layout_setup["partitioned_events"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    layout.zordered_events(spark, sf_dir)
    layout_setup["zordered_events"] = round(time.perf_counter() - t0, 4)
    # the CDF query's snapshot table is also a one-time layout (memoized) —
    # build it here so the timed query measures the pruned read, not
    # table construction
    from duckdb_streaming_patterns_spark import queries_streaming

    t0 = time.perf_counter()
    queries_streaming._cdf_table(spark, sf_dir)
    layout_setup["cdf_snapshot_table"] = round(time.perf_counter() - t0, 4)

    import gc

    isolate_idx = HEADLINE.index(ISOLATE_FROM)
    isolated_names = set(HEADLINE[isolate_idx:])
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    # calibration probes: the shared session samples the window at the
    # start and end of its block; each isolated subprocess samples its
    # own window (the bench runs ~15 min and the load drifts within it)
    calibration: dict[str, float] = {"__start__": _calibrate(spark)}
    for name in HEADLINE:
        if name not in QUERIES:
            continue
        if name in isolated_names:
            # fresh subprocess per streaming pattern — see ISOLATE_FROM
            sec, cal, err = _run_isolated(name, sf_dir)
            if err is not None:
                errors[name] = err
            else:
                timings[name] = round(sec, 4)
                if cal is not None:
                    calibration[name] = cal
            continue
        fn, _ = QUERIES[name]
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = force_eval(df)
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0
        # Inter-query hygiene, OUTSIDE the timed window: a finished
        # query's localCheckpoint blocks and broadcasts are reclaimed
        # only after their RDD/broadcast objects are GC'd (ContextCleaner
        # is weak-ref driven), and with a large heap the JVM can go many
        # queries without a collection — storage blocks pile up and push
        # later queries' execution memory into spills. One explicit GC
        # per query boundary makes each number a measurement of the
        # query, not of the session's debris. (Recorded in the output
        # metadata since round 5 — cross-round diffs against r01-r04
        # conflate this harness change with engine changes.)
        df = None
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    calibration["__end__"] = _calibrate(spark)
    total = round(sum(timings.values()), 4)
    # Derived throughput vs BASELINE.md's envelope (reference ceiling:
    # ~100 events/s): events ingested+aggregated per second through the
    # full pattern-1.1 incremental-merge pipeline (5 micro-batches,
    # staging included).
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        # a failed query appears with a null timing so its absence is
        # visible in the artifact, with the error tail alongside
        "queries": {**timings, **{n: None for n in errors}},
        "layout_setup_sec": layout_setup,
        "sf": sf,
        # methodology flags so round-over-round diffs are interpretable:
        # explicit Python+JVM GC between in-process queries (since r5),
        # and fresh-subprocess isolation of the streaming-pattern block
        # (since r6 — session startup/warm-up excluded from timed window)
        "gc_between_queries": True,
        "isolated_subprocess": sorted(n for n in timings if n in isolated_names),
        # window-load calibration (round-9 brief item 2): the fixed
        # reference workload's seconds at the session's start/end and in
        # each isolated subprocess — divide two rounds' timings by their
        # calibration ratio before reading a cross-round diff (see
        # _calibrate's docstring for the measured variance history)
        "calibration_sec": calibration,
    }
    # The §13 (SCALE.md) comparability gate, stated mechanically in the
    # artifact (round-12 verdict item 8): calibration normalization is
    # trustworthy only to ~2x — the probe is a point sample, load
    # arriving mid-run is invisible to it — so cross-round comparisons
    # must DROP queries whose window read cal_sec >= 2.0 rather than
    # normalize through the load. `loaded` lists exactly those queries.
    cal_vals = [v for v in calibration.values() if v is not None]
    cal_vals.sort()
    out["cal_gate"] = {
        "rule": "cross-round comparable iff window cal_sec < threshold",
        "threshold": 2.0,
        "median_cal": (
            round(cal_vals[len(cal_vals) // 2], 3) if cal_vals else None
        ),
        "loaded": sorted(
            n
            for n, v in calibration.items()
            if v is not None and v >= 2.0
        ),
    }
    if errors:
        # An errored query contributes nothing to `value`, which would
        # otherwise read round-over-round as a speedup — mark the total
        # incomparable explicitly instead of relying on the reader to
        # notice the errors key.
        out["complete"] = False
        out["errors"] = errors
    p11 = timings.get("pattern_1_1_incremental_merge")
    if p11:
        n_events = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
        out["ingest_events_per_sec"] = round(n_events / p11, 1)
    _diff_against_previous_round(timings, sf, isolated_names, calibration)
    # The driver records only a tail of stdout, which truncates the
    # per-query dict on long runs (the r6↔r7 diff lost its first ~33
    # queries twice; r13's 90-query line with the full calibration dict
    # overflowed the window entirely — BENCH_r13.json recorded
    # "parsed": null) — persist the COMPLETE result to the repo so every
    # round's full timings survive as bench_full_r{N}.json, and print a
    # COMPACT one-line summary to stdout: totals, the 10 slowest
    # queries only, cal median + loaded list, no calibration detail.
    # r14's 92-entry per-query dict was ~3 KB against the driver's
    # ~2.2 KB tail window — the line's HEAD (opening brace + totals)
    # was cut off and BENCH_r14.json recorded "parsed": null for the
    # second consecutive round. Capping `queries` at the 10 slowest
    # keeps the contract key while bounding the line at ~700 bytes;
    # the complete per-query dict lives in bench_full_latest.json.
    try:
        with open(os.path.join(_REPO_ROOT, "bench_full_latest.json"), "w") as f:
            json.dump(out, f, indent=1)
    except OSError:
        pass
    slowest = sorted(
        ((n, v) for n, v in out["queries"].items() if v is not None),
        key=lambda kv: -kv[1],
    )[:10]
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": sf,
        "queries": {n: round(v, 2) for n, v in slowest},
        "queries_total_count": len(out["queries"]),
        "cal_median": out["cal_gate"]["median_cal"],
        "loaded": out["cal_gate"]["loaded"],
        "full_artifact": "bench_full_latest.json",
    }
    if "ingest_events_per_sec" in out:
        compact["ingest_events_per_sec"] = out["ingest_events_per_sec"]
    if not out.get("complete", True):
        compact["complete"] = False
        compact["errors"] = sorted(errors)
    print(json.dumps(compact, separators=(",", ":")))


def _norm_factor(
    name: str,
    cal: dict[str, float] | None,
    prev_cal: dict[str, float] | None,
) -> float | None:
    """Window-load normalization factor for one query: current-round
    calibration seconds over previous-round's. Selection is purely by
    name membership in the calibration dict — a per-subprocess probe
    when the round recorded one for this query (isolated runs do), else
    the session start/end mean. None when either round lacks any probe
    (pre-round-10 artifacts)."""

    def probe(c: dict[str, float] | None) -> float | None:
        if not c:
            return None
        if name in c:
            return c[name]
        vals = [c[k] for k in ("__start__", "__end__") if c.get(k)]
        return sum(vals) / len(vals) if vals else None

    cur, prev = probe(cal), probe(prev_cal)
    if not cur or not prev:
        return None
    return cur / prev


def _diff_against_previous_round(
    timings: dict[str, float],
    sf: float,
    isolated: set[str],
    calibration: dict[str, float] | None = None,
) -> None:
    """Regression gate: diff per-query timings against the newest
    BENCH_r*.json at the repo root (same sf only) and report >3 s moves —
    the measured run-to-run noise bound — to stderr. When BOTH rounds
    carry calibration probes, timings are first divided by the
    window-load ratio (see _calibrate) and the normalized number is
    reported alongside the raw one — a uniform across-the-board shift
    with a metadata-only diff then reads as ~1.0x normalized instead of
    as 70 phantom regressions (the r8→r9 situation). Queries whose
    ISOLATION status changed since that round are skipped: an in-session
    (warm, debris-exposed) number and a fresh-subprocess (cold) number
    measure different things, and diffing them manufactures phantom
    regressions. Stdout stays the single-JSON-line contract."""
    import glob

    candidates = sorted(glob.glob(os.path.join(_REPO_ROOT, "BENCH_r*.json")))
    if not candidates:
        return
    try:
        with open(candidates[-1]) as f:
            prev = json.load(f)
    except (OSError, json.JSONDecodeError):
        return
    # the driver wraps the bench line under "parsed"
    if "parsed" in prev and isinstance(prev["parsed"], dict):
        prev = prev["parsed"]
    if prev.get("sf") != sf:
        return
    prev_q = prev.get("queries", {})
    prev_iso = set(prev.get("isolated_subprocess", []))
    prev_cal = prev.get("calibration_sec")
    for name, t in timings.items():
        if (name in isolated) != (name in prev_iso):
            continue  # methodology changed for this query — not comparable
        p = prev_q.get(name)
        if p is None:
            continue
        factor = _norm_factor(name, calibration, prev_cal)
        t_norm = t / factor if factor else t
        if abs(t_norm - p) > 3.0:
            direction = "slower" if t_norm > p else "faster"
            norm_note = (
                f" (load-normalized {t_norm:.1f}s at window factor "
                f"{factor:.2f})"
                if factor
                else " (no calibration in prior round — raw compare)"
            )
            print(
                f"[bench-diff vs {os.path.basename(candidates[-1])}] {name}: "
                f"{p:.1f}s -> {t:.1f}s ({direction}){norm_note}",
                file=sys.stderr,
            )
    # a query that timed last round but errored/vanished this round is a
    # REGRESSION, not a speedup — surface its absence explicitly
    for name, p in prev_q.items():
        if p is not None and name not in timings:
            print(
                f"[bench-diff vs {os.path.basename(candidates[-1])}] {name}: "
                f"{p:.1f}s -> ABSENT (errored or deregistered)",
                file=sys.stderr,
            )


if __name__ == "__main__":
    main()
