"""Sketch ERROR envelopes at scale (round 13, verdict item 6): the §15
operators' accuracy — not just their wall time — measured at sf0.1 (x1)
and the §7 harness's 10× synthesized corpus, plus the state-size pin
for the streaming folds at depth.

- KMV cardinality (k=64): per-event-type relative error of
  est = (k-1)·2^60/h_(k) vs the exact COUNT(DISTINCT user_id). The
  estimator's rsd is ~1/sqrt(k-2) ≈ 12.7%; the envelope reported is the
  max |rel err| across groups, checked against 3·rsd.
- Bottom-k quantiles (k=64): for each (lang, percentile) estimate, its
  TRUE rank in the exact per-lang token-count distribution; the rank
  error |cdf(est) - p| has sd ~ sqrt(p(1-p)/k); the envelope is max
  rank error across (lang, p) vs 3σ at p=0.5 (the widest).
- Streaming fold state bound: the distinct-KMV and quantile-KMV folds
  replayed at DEPTH (20 micro-batches, 4× the registered cadence) must
  hold state <= k rows x groups at the drain — the merge-law's memory
  claim, asserted, not assumed.

Usage: python scripts/sketch_error_stress.py /root/repo [factors...]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import math
import sys

REPO = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
FACTORS = [int(x) for x in sys.argv[2:]] or [1, 10]
sys.path.insert(0, REPO)
sys.path.insert(0, REPO + "/scripts")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402

from duckdb_streaming_patterns_spark import get_spark  # noqa: E402
from duckdb_streaming_patterns_spark.sources.tables import (  # noqa: E402
    load_table,
)

K = 64


def _h60(col: str):
    """Spark-side 60-bit integer view of an md5 hex column — the same
    value queries_sketch computes (top 15 hex digits, base-16 → long)."""
    return F.conv(F.substring(col, 1, 15), 16, 10).cast("long")


def kmv_cardinality_error(spark, sf_dir: str) -> dict:
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    h = (
        ev.select(
            "event_type", F.md5(F.col("user_id").cast("string")).alias("hx")
        )
        .distinct()
        .withColumn("h60", _h60("hx"))
    )
    r = h.select(
        "event_type",
        "h60",
        F.row_number()
        .over(W.partitionBy("event_type").orderBy("h60", "hx"))
        .alias("rn"),
        F.count("*").over(W.partitionBy("event_type")).alias("m"),
    )
    est = {
        row["event_type"]: (
            float(row["m"])
            if row["m"] < K
            else (K - 1) * 2.0**60 / float(row["h60"])
        )
        for row in r.filter(
            (F.col("rn") == K) | ((F.col("m") < K) & (F.col("rn") == 1))
        ).collect()
    }
    errs = {
        t: abs(est[t] - exact[t]) / exact[t] for t in exact if t in est
    }
    rsd = 1.0 / math.sqrt(K - 2)
    return {
        "metric": "kmv_cardinality",
        "k": K,
        "groups": len(errs),
        "max_rel_err": round(max(errs.values()), 4),
        "mean_rel_err": round(sum(errs.values()) / len(errs), 4),
        "bound_3rsd": round(3 * rsd, 4),
        "within": max(errs.values()) <= 3 * rsd,
    }


def quantile_rank_error(spark, sf_dir: str) -> dict:
    from duckdb_streaming_patterns_spark.registry import QUERIES

    fn, _ = QUERIES["approx_quantiles_kmv"]
    est_rows = fn(spark, sf_dir).collect()
    from duckdb_streaming_patterns_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.size(tokens(F.col("text"))).cast("long").alias("val")
    )
    counts = {
        (r["lang"],): r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    pcts = [("p50_tokens", 0.5), ("p90_tokens", 0.9), ("p99_tokens", 0.99)]
    worst = 0.0
    per = []
    for row in est_rows:
        for col, p in pcts:
            v = row[col]
            if v is None:
                continue
            below = docs.filter(
                (F.col("lang") == row["lang"]) & (F.col("val") <= v)
            ).count()
            cdf = below / counts[(row["lang"],)]
            err = abs(cdf - p)
            per.append({"lang": row["lang"], "p": p, "rank_err": round(err, 4)})
            worst = max(worst, err)
    bound = 3 * math.sqrt(0.25 / K)  # 3sigma at the widest percentile
    return {
        "metric": "kmv_quantile_rank",
        "k": K,
        "cells": len(per),
        "max_rank_err": round(worst, 4),
        "bound_3sigma_p50": round(bound, 4),
        "within": worst <= bound,
        "detail": per,
    }


def streaming_state_bound(spark, sf_dir: str, depth: int = 20) -> dict:
    import os

    from duckdb_streaming_patterns_spark.operators.merge import SummaryTable
    from duckdb_streaming_patterns_spark.streaming import patterns, staging

    run = staging.new_run_dir("sketchdepth")
    chunks = staging.stage_event_chunks(
        spark, sf_dir, run, n_chunks=depth, order_col="event_id"
    )
    patterns.pattern_streaming_distinct_kmv(
        spark, chunks, run, k=K, state_partitions=4, compact_every=4
    )
    state = SummaryTable(
        spark,
        os.path.join(run, "kmv"),
        "event_type string, hx string, h60 long",
    )
    rows = state.read().count()
    groups = state.read().select("event_type").distinct().count()
    return {
        "metric": "kmv_stream_state",
        "depth": depth,
        "state_rows": rows,
        "groups": groups,
        "bound_k_groups": K * groups,
        "within": rows <= K * groups,
    }


def main() -> None:
    from scale_stress import build_dir  # scripts/ sibling

    spark = get_spark(app_name="dsp-sketch-error")
    spark.range(1000).selectExpr("sum(id)").collect()
    for factor in FACTORS:
        d = build_dir(spark, factor)
        for fn in (kmv_cardinality_error, quantile_rank_error):
            out = fn(spark, d)
            out["factor"] = factor
            print(json.dumps(out), flush=True)
    out = streaming_state_bound(spark, build_dir(spark, 1))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
