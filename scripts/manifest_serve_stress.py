"""Hybrid-manifest SERVE stress vs version-history depth (round-14
verdict item 7): SCALE §19 documents the manifest serve's cost parity
with the pointer serve at fixture scale; this measures the axis the
manifest ADDS — the bounded version history riding inside the single
pointer document. The question: does a deep history (up to the
_HYBRID_HISTORY_CAP = 256) cost the serve anything — latency or
request-plane — at the head or for a history-resolved pinned version?

Design: build REAL two-index state once (sf0.001, the registered row's
unaligned 6-lexical/3-dense replay), then CAS-publish ``depth``
versions — every version maps to generations the state actually
resolves (the feed's v ⇔ lex 2v+1 ⇔ dense v map, clamped to the real
head) so pinned serves execute the full scoped read, and the padding
versions beyond the real generation range re-use the head pairing
(honest for THIS axis: history depth is the variable, state is fixed).
Serve latency is timed for the HEAD and for a mid-history pinned
version; CountingCommitIO counts every store round-trip.

    python scripts/manifest_serve_stress.py /root/repo 8 256

Prints one JSON line per depth. Expected shape: requests and latency
FLAT in depth (ONE manifest GET regardless — the history is inside the
document), manifest bytes linear in depth (the documented cap trade).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = sys.argv[1]
DEPTHS = [int(x) for x in sys.argv[2:] if x.isdigit()] or [8, 256]
sys.path.insert(0, REPO)

import pytest  # noqa: E402

from duckdb_streaming_patterns_spark import get_spark  # noqa: E402
from duckdb_streaming_patterns_spark.plans.commitio import (  # noqa: E402
    CountingCommitIO,
    ObjectStoreSimIO,
)

SF = "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_streaming_patterns_spark.operators import merge as merge_mod
    from duckdb_streaming_patterns_spark.plans import snapshots as snaps_mod
    from duckdb_streaming_patterns_spark.plans.snapshots import SnapshotTable
    from duckdb_streaming_patterns_spark.queries_text import (
        _BM25_QUERIES,
        _BM25_SCORE_EXPR,
    )
    from duckdb_streaming_patterns_spark.sources.tables import load_table
    from duckdb_streaming_patterns_spark.streaming import patterns, staging

    spark = get_spark(app_name="dsp-manifest-serve")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm-up

    io = CountingCommitIO(ObjectStoreSimIO())
    mp = pytest.MonkeyPatch()
    mp.setattr(snaps_mod, "POSIX_IO", io)
    mp.setattr(merge_mod, "POSIX_IO", io)

    # one REAL state build (the registered row's unaligned replay)
    run = staging.new_run_dir("manifstress")
    doc_chunks = staging.stage_document_chunks(
        spark, SF, staging.new_run_dir("manifsd"), n_chunks=6
    )
    emb_chunks = staging.stage_paired_embedding_chunks(
        spark, SF, staging.new_run_dir("manifse"), n_chunks=6
    )
    queries_df = load_table(spark, SF, "embeddings").filter(
        F.col("vec_id") < 3
    )
    lex_dir = os.path.join(run, "lex")
    patterns.pattern_streaming_bm25_index(
        spark, doc_chunks, lex_dir, _BM25_QUERIES, _BM25_SCORE_EXPR,
        k=20, state_partitions=4, compact_every=2,
        maintain_floor=2,  # keep version-1's prefix batch-resolvable
    )
    patterns.pattern_streaming_ann_index(
        spark, emb_chunks, os.path.join(run, "vec"), queries_df,
        k=20, state_partitions=4,
    )
    tf_log, dl_log = patterns.bm25_reader_logs(spark, lex_dir)
    lex_ptr = tf_log.io.read_json(patterns._bm25_gen_path(lex_dir))
    index = SnapshotTable(
        spark,
        os.path.join(run, "vec", "ivf_index"),
        "vec_id long, embedding array<float>, cell_id long",
        partition_cols=["cell_id"],
    )
    dense = sorted(
        (int(s["batch_id"]), int(s["snapshot_id"]))
        for s in index.snapshots()
        if s.get("kind", "insert") == "insert"
        and s.get("batch_id") is not None
    )
    real_head_gen = int(lex_ptr["gen"])
    man_path = patterns._hybrid_manifest_path(run)
    prev_versions = 0
    for depth in DEPTHS:
        # extend the published history to `depth` versions; the feed's
        # version map while it stays in real range, the head pairing
        # beyond it (state fixed — depth is the only axis)
        for v in range(prev_versions, depth):
            lex_gen = min(2 * v + 1, real_head_gen)
            covered = [sid for b, sid in dense if b <= max(v, 0)]
            sum_dl, n_docs = patterns._bm25_stats_at(
                lex_ptr, lex_gen, dl_log
            )
            patterns.publish_hybrid_manifest(
                tf_log.io, run, version=v, lex_gen=lex_gen,
                ann_snapshot=max(covered) if covered else dense[-1][1],
                sum_dl=sum_dl, n_docs=n_docs,
            )
        prev_versions = depth
        man_bytes = os.path.getsize(man_path)
        out = {"history_depth": depth, "manifest_bytes": man_bytes}
        for label, at_version in (
            ("head", None),
            ("pinned_v1", 1),  # history-resolved, real old prefix
        ):
            before = io.snapshot()
            t0 = time.perf_counter()
            rows = patterns.hybrid_manifest_serve(
                spark, run, _BM25_QUERIES, queries_df, _BM25_SCORE_EXPR,
                at_version=at_version,
            ).collect()
            out[f"serve_{label}_sec"] = round(time.perf_counter() - t0, 2)
            d = io.since(before)
            out[f"{label}_requests"] = {
                k: v for k, v in sorted(d.items()) if v
            }
            out[f"{label}_rows"] = len(rows)
            assert rows
        print(json.dumps(out), flush=True)
    mp.undo()


if __name__ == "__main__":
    main()
