"""Continuous-GDPR-traffic stress (round-15 verdict item 3): does the
consistent BM25 serve stay FLAT as the run's cumulative forget count
grows? Round 14's tomb log only ever grew — the serve-side anti-join
and the forget's cumulative collect scaled with lifetime forgets.
Round 15 retires purged tombstones into the membership-only ledger, so
after every completed (purged) forget the LIVE tomb log is empty and
the serve takes the no-tombstone fast path again.

Design: build the registered streaming BM25 index once (sf0.001, 5
micro-batches), then apply ``max(N)`` sequential purged forgets, each a
small disjoint doc slice (doc_id % 199 == k). At each checkpoint
depth, time ``bm25_consistent_serve`` (min of 3) and record the live
tomb dir count, the retired-ledger row count, and a fixed calibration
probe so cross-depth comparisons are load-honest.

    python scripts/forget_traffic_stress.py /root/repo 2 8 32

Prints one JSON line per checkpoint. Expected shape: serve latency and
live tomb dirs FLAT in cumulative forgets (live dirs = 0 — every
forget retired its own tombstones); retired rows grow with forgotten
docs (the membership ledger, never read by serves).
"""

from __future__ import annotations

import json
import sys
import time

REPO = sys.argv[1]
DEPTHS = sorted(int(x) for x in sys.argv[2:] if x.isdigit()) or [2, 8, 32]
sys.path.insert(0, REPO)

from duckdb_streaming_patterns_spark import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )
    from duckdb_streaming_patterns_spark.sources.tables import load_table
    from duckdb_streaming_patterns_spark.streaming import patterns, staging

    spark = get_spark()
    docs = load_table(spark, SF, "documents")

    def cal() -> float:
        t0 = time.monotonic()
        spark.range(0, 2_000_000).selectExpr("sum(id % 7)").collect()
        return time.monotonic() - t0

    run = staging.new_run_dir("fstress")
    chunks = staging.stage_document_chunks(
        spark, SF, staging.new_run_dir("fstressc"), n_chunks=5
    )
    patterns.pattern_streaming_bm25_index(
        spark, chunks, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5,
        state_partitions=4, compact_every=2,
    )

    def serve_sec() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            patterns.bm25_consistent_serve(
                spark, run, _BM25_QUERIES, _BM25_SCORE_EXPR, k=5
            ).collect()
            best = min(best, time.monotonic() - t0)
        return best

    total_forgotten = 0
    done = 0
    for depth in DEPTHS:
        while done < depth:
            feed = docs.filter(F.col("doc_id") % 199 == done).select(
                "doc_id"
            )
            out = patterns.retrieval_forget(spark, run, feed)
            total_forgotten += out["n_forgotten"]
            done += 1
        tomb = patterns.bm25_tomb_log(spark, run)
        retired = patterns.bm25_retired_tomb_log(spark, run)
        print(
            json.dumps(
                {
                    "cumulative_forgets": done,
                    "total_forgotten_docs": total_forgotten,
                    "serve_sec": round(serve_sec(), 3),
                    "live_tomb_dirs": len(tomb._batch_dirs()),
                    "retired_rows": retired.read_latest().count()
                    if retired._batch_dirs()
                    else 0,
                    "cal_sec": round(cal(), 3),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
