"""Streaming-BM25 index DEPTH stress (round-12 verdict item 5): serve
latency vs accumulated batch count for the token-bucketed tf log +
doc_id-bucketed dl log + fenced stats row — the retrieval-specific
companion to scripts/upsert_depth_stress.py's generic UpsertLog axis
(SCALE.md §12 proves the generic log reads flat; this measures the
actual ``_bm25_serve`` plan, whose two DPP-pruned state fetches and
broadcast candidate sides have their own depth behavior).

State is fabricated with pyarrow in the exact layout the pattern's
appends produce (``__batch_id=N/__kb=K/part-0.parquet``; bucket ids
precomputed with the log's own ``bucket_of`` expression so the DPP
probe targets real bucket dirs); the ``tiered`` variant interleaves the
REAL ``maintain_all`` tick at the production cadence (every 8, fanout
8), so fold manifests and bucket-preserving merges are the shipped code
under test. The stats row is committed through the real SummaryTable.

Each batch: 5 docs x 8 vocab tokens, dl=8 — fixed-rate ingest, so depth
is the ONLY axis. Serve correctness teeth: the two variants must return
identical top-k rows at equal depth.

Round 14 adds the TOKEN-FREQUENCY SKEW axis (verdict item 5): the tf
log buckets by token, so a stop-word-heavy corpus concentrates the head
terms' postings in a few buckets — pass ``zipf`` to draw each token
slot from a cubed-uniform rank (head token ≈ 25% of ALL draws, a proper
stop word) and the run reports per-bucket row skew plus the serve cost
split into a HEAD-term query set vs a TAIL-term one.

Run one code version per invocation (A/B via git worktree):

    python scripts/bm25_depth_stress.py /root/repo 256 1024 4096
    python scripts/bm25_depth_stress.py /root/repo zipf 256 1024

Prints one JSON line per (dist, variant, depth).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = sys.argv[1]
DIST = "zipf" if "zipf" in sys.argv[2:] else "uniform"
DEPTHS = [int(x) for x in sys.argv[2:] if x.isdigit()] or [256, 1024, 4096]
sys.path.insert(0, REPO)

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from duckdb_streaming_patterns_spark import get_spark  # noqa: E402
from duckdb_streaming_patterns_spark.operators.merge import (  # noqa: E402
    SummaryTable,
    UpsertLog,
    maintain_all,
)
from duckdb_streaming_patterns_spark.queries_text import (  # noqa: E402
    _BM25_SCORE_EXPR,
)
from duckdb_streaming_patterns_spark.streaming.patterns import (  # noqa: E402
    _BM25_STATS_DDL,
    _bm25_serve,
)

WORK = "/tmp/dsp_bm25_depth"
DOCS_PER_BATCH = 5
TOKS_PER_DOC = 8
VOCAB = [f"tok{i:02d}" for i in range(64)]
QUERIES = [
    (0, "tok01 tok02 tok03"),
    (1, "tok10 tok11"),
    (2, "tok20 tok21 tok22"),
]
N_BUCKETS = 16


# Zipf-ish head/tail query sets: tok00 draws ~25% of ALL zipf slots (a
# stop word); tok40+ are deep-tail terms. Serve cost is measured for
# each set separately so the hot bucket's contribution is visible.
ZIPF_HEAD_QUERIES = [(0, "tok00"), (1, "tok00 tok01")]
ZIPF_TAIL_QUERIES = [(0, "tok40 tok45"), (1, "tok50 tok55")]


def doc_tokens(doc_id: int, dist: str = "uniform") -> list[str]:
    if dist == "zipf":
        # deterministic cubed-uniform rank: P(rank=0) = (1/64)^(1/3)
        # ≈ 0.25 — the head token alone carries a quarter of the corpus
        out = []
        for j in range(TOKS_PER_DOC):
            u = ((doc_id * 2654435761 + j * 40503) % 4096) / 4096.0
            out.append(VOCAB[int(len(VOCAB) * u * u * u)])
        return out
    return [VOCAB[(doc_id * 7 + j) % len(VOCAB)] for j in range(TOKS_PER_DOC)]


def fabricate_batch(
    tf_root: str,
    dl_root: str,
    b: int,
    tok_kb: dict,
    doc_kb: dict,
    dist: str = "uniform",
    kb_rows: dict | None = None,
) -> None:
    """One batch in append()'s exact on-disk shape: hive __kb subdirs,
    payload columns only (the bucket rides in the dir name).
    ``kb_rows`` accumulates tf rows per bucket (the skew measurement)."""
    by_kb_tf: dict[int, list[tuple[int, str, int]]] = {}
    by_kb_dl: dict[int, list[tuple[int, int]]] = {}
    for d in range(b * DOCS_PER_BATCH, (b + 1) * DOCS_PER_BATCH):
        toks = doc_tokens(d, dist)
        for tok in set(toks):
            by_kb_tf.setdefault(tok_kb[tok], []).append(
                (d, tok, toks.count(tok))
            )
        by_kb_dl.setdefault(doc_kb[d], []).append((d, TOKS_PER_DOC))
    if kb_rows is not None:
        for kb, rows in by_kb_tf.items():
            kb_rows[kb] = kb_rows.get(kb, 0) + len(rows)
    for kb, rows in by_kb_tf.items():
        p = os.path.join(tf_root, f"__batch_id={b}", f"__kb={kb}")
        os.makedirs(p, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "tok": pa.array([r[1] for r in rows], pa.string()),
                    "tf": pa.array([r[2] for r in rows], pa.int64()),
                }
            ),
            os.path.join(p, "part-0.parquet"),
        )
    for kb, rows in by_kb_dl.items():
        p = os.path.join(dl_root, f"__batch_id={b}", f"__kb={kb}")
        os.makedirs(p, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "dl": pa.array([r[1] for r in rows], pa.int64()),
                }
            ),
            os.path.join(p, "part-0.parquet"),
        )


def run(
    spark,
    variant: str,
    depth: int,
    tok_kb: dict,
    doc_kb: dict,
    dist: str = "uniform",
) -> dict:
    root = os.path.join(WORK, f"{dist}_{variant}_{depth}")
    shutil.rmtree(root, ignore_errors=True)
    tf_log = UpsertLog(
        spark, os.path.join(root, "tf"), keys=["doc_id", "tok"],
        insert_only=True, bucket_col="tok", n_buckets=N_BUCKETS,
    )
    dl_log = UpsertLog(
        spark, os.path.join(root, "dl"), keys=["doc_id"],
        insert_only=True, bucket_col="doc_id", n_buckets=N_BUCKETS,
    )
    stats = SummaryTable(spark, os.path.join(root, "stats"), _BM25_STATS_DDL)
    t_maint = 0.0
    kb_rows: dict[int, int] = {}
    for b in range(depth):
        if variant == "tiered" and b > 0 and b % 8 == 0:
            t0 = time.perf_counter()
            maintain_all([tf_log, dl_log], before_batch=b)
            t_maint += time.perf_counter() - t0
        fabricate_batch(
            tf_log.root, dl_log.root, b, tok_kb, doc_kb, dist, kb_rows
        )
    n_docs = depth * DOCS_PER_BATCH
    stats.overwrite(
        spark.createDataFrame(
            [(0, n_docs * TOKS_PER_DOC, n_docs)], _BM25_STATS_DDL
        ),
        batch_id=depth - 1,
    )
    live = {
        "tf": len(tf_log._batch_dirs()) - len(set(tf_log._dead_batch_ids())),
        "dl": len(dl_log._batch_dirs()) - len(set(dl_log._dead_batch_ids())),
    }
    t0 = time.perf_counter()
    rows = _bm25_serve(
        spark, tf_log, dl_log, stats, QUERIES, _BM25_SCORE_EXPR, 5
    ).collect()
    t_serve = time.perf_counter() - t0
    assert rows and all(r["rank"] <= 5 for r in rows)
    res = {
        "dist": dist,
        "variant": variant,
        "depth": depth,
        "live_dirs": live,
        "serve_sec": round(t_serve, 2),
        "maintain_total_sec": round(t_maint, 2),
        "maintain_per_batch_ms": round(1000 * t_maint / depth, 1),
        "topk": sorted(
            (r["query_id"], r["doc_id"], r["rank"]) for r in rows
        ),
    }
    if dist == "zipf":
        # bucket skew: how concentrated the tf log really got, plus the
        # serve split into head-term vs tail-term query sets
        total_rows = sum(kb_rows.values())
        hot = max(kb_rows.values())
        res["tf_rows_total"] = total_rows
        res["hot_bucket_share"] = round(hot / total_rows, 3)
        res["bucket_skew_max_over_mean"] = round(
            hot / (total_rows / N_BUCKETS), 2
        )
        for label, qset in (
            ("head", ZIPF_HEAD_QUERIES),
            ("tail", ZIPF_TAIL_QUERIES),
        ):
            t0 = time.perf_counter()
            r2 = _bm25_serve(
                spark, tf_log, dl_log, stats, qset, _BM25_SCORE_EXPR, 5
            ).collect()
            res[f"serve_{label}_sec"] = round(time.perf_counter() - t0, 2)
            res[f"{label}_rows"] = len(r2)
    shutil.rmtree(root, ignore_errors=True)
    return res


def main() -> None:
    from pyspark.sql import functions as F

    spark = get_spark(app_name="dsp-bm25-depth")
    spark.range(1000).selectExpr("sum(id)").collect()
    probe = UpsertLog(
        spark, os.path.join(WORK, "probe"), keys=["k"],
        insert_only=True, bucket_col="k", n_buckets=N_BUCKETS,
    )
    tok_kb = {
        r["tok"]: r["kb"]
        for r in spark.createDataFrame(
            [(t,) for t in VOCAB], "tok string"
        ).select("tok", probe.bucket_of(F.col("tok")).alias("kb")).collect()
    }
    max_docs = max(DEPTHS) * DOCS_PER_BATCH
    doc_kb = {
        r["id"]: r["kb"]
        for r in spark.range(max_docs)
        .select("id", probe.bucket_of(F.col("id")).alias("kb"))
        .collect()
    }
    prev_topk: dict[int, list] = {}
    for depth in DEPTHS:
        for variant in ("none", "tiered"):
            res = run(spark, variant, depth, tok_kb, doc_kb, DIST)
            # exactness teeth: maintained == unmaintained top-k rows
            if depth in prev_topk:
                assert res["topk"] == prev_topk[depth], (variant, depth)
            prev_topk[depth] = res["topk"]
            res.pop("topk")
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
