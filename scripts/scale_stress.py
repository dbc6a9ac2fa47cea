"""Scale-stress harness: time-vs-rows curvature for the heavy operators.

Round-2 verdict item #4: the cheapest available proxy for the 100 TB claim
is to scale the fixture corpus ~10x and check the heavy set scales
~linearly. This script synthesizes x1/x3/x10 corpora from sf0.1 into /tmp
and times the five most expensive operator families once per factor,
printing one JSON line per (factor, query).

Scaling is designed so the WORK grows linearly (the honest test):

- documents: copy i>0 gets every whitespace token suffixed with `_si` —
  shingle/token/minhash/simhash sets across copies are disjoint, so the
  near-dup pair graph replicates per copy instead of exploding
  quadratically (10 verbatim copies of each doc would make every doc a
  member of a 10-clique: output — and any correct algorithm's cost —
  would be ~45x, measuring output blow-up, not engine curvature).
- events: copy i>0 shifts user_id (and event_id) by i*10^7 — per-key
  state for sessionization / stream-stream join stays constant while the
  key count scales, which is how a bigger corpus actually behaves.

Run:  python scripts/scale_stress.py [factors...]   (default: 1 3 10)
      SPARK_GRAFT_STRESS_ONLY=q1,q2 limits the run to named queries
      (incremental refresh after adding an operator — the full table is
      re-measured when the timing method or corpus synthesis changes).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import SparkSession, functions as F  # noqa: E402

from duckdb_streaming_patterns_spark import get_spark  # noqa: E402
from duckdb_streaming_patterns_spark.queries import QUERIES  # noqa: E402
from bench import force_eval  # noqa: E402  (count() would prune operators)

SRC_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/dsp_scale_stress"

HEAVY = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_minhash_clusters",
    "pattern_streaming_sessionization",
    "pattern_stream_stream_join",
    # round-3 additions
    "text_unigram_surprisal",
    "text_duplicated_spans",
    "pattern_streaming_corpus_dedup",
    "knn_pq_adc",
    # semdedup_prune is stressed specially (see run loop): its registered
    # form fixes n_cells=16, so a 10x corpus makes cells 10x fatter and
    # the intra-cell pair join ~100x — measuring parameterization, not
    # engine curvature. Production scales n_cells with the corpus (cell
    # size ~constant); the stress run does the same (n_cells = 16*factor).
    "semdedup_prune",
    # round-4 additions: the join/layout scale surfaces (verdict item 9)
    # plus the new operators of this round.
    "asof_join_last_click",
    "range_join_price_bands",
    "dpp_pruned_daily_clicks",
    "text_remove_duplicated_spans",
    "pattern_streaming_neardup_dedup",
    "knn_ivf_ann",
    # CDF-delete propagation + incremental ANN index maintenance
    "pattern_gdpr_delete_propagation",
    "pattern_streaming_ann_index",
    # round-5 additions: continuous-ingestion embedding dedup + the two
    # O(batch)-state patterns (quota caps, drift monitor) — expected flat
    "pattern_streaming_semdedup",
    "pattern_streaming_source_caps",
    "pattern_streaming_quality_drift",
    # round-6 additions (round-5 verdict item 5): the composed five-tier
    # funnel gets its OWN curvature row (it had only inherited its
    # tiers'), and snapshot vacuum — a deliberate O(live rows) rewrite,
    # so ~linear x10 is the EXPECTED verdict; the merit is O(live), not
    # O(history), and tombstone retirement being O(tombstones).
    "pattern_streaming_full_funnel",
    "snapshot_vacuum",
    # round-12 additions: the mergeable-sketch folds (state <= k rows per
    # group — expected ~flat beyond input scan), the streaming as-of
    # lookup (state = one row per clicking user, probe pruned to the
    # batch's buckets), and the custom Python source/sink loop (offset
    # contract + manifest-last publish — expected linear in rows moved).
    "approx_quantiles_kmv",
    "pattern_streaming_distinct_kmv",
    "pattern_streaming_quantiles_kmv",
    "pattern_streaming_asof_enrichment",
    "pattern_streaming_python_source",
    "pattern_streaming_python_sink",
    # round-15 additions: the release build re-measured after the Merkle
    # fingerprint + derived-shard rework (the r14 form's x10 was 4.9 with
    # an O(shard) fingerprint buffer and 8-way window parallelism — the
    # rework bounds buffers at bin size and scales n_shards with released
    # tokens), and the streaming release ladder (per-batch O(batch)
    # appends + 2 prefix-pass release builds — expected ~linear in corpus
    # like the batch build it wraps).
    "corpus_release_manifest",
    "pattern_streaming_release",
]

# rows_in attribution per query family (embedding-family rows were
# previously misreported as document counts — round-3 ADVICE item 3).
ROWS_TABLE = {
    "pattern_streaming_distinct_kmv": "events",
    "pattern_streaming_asof_enrichment": "events",
    "knn_pq_adc": "embeddings",
    "knn_ivf_ann": "embeddings",
    "semdedup_prune": "embeddings",
    "range_join_price_bands": "orders",
    "asof_join_last_click": "events",
    "dpp_pruned_daily_clicks": "events",
    "pattern_streaming_sessionization": "events",
    "pattern_stream_stream_join": "events",
    "pattern_gdpr_delete_propagation": "events",
    "pattern_streaming_ann_index": "embeddings",
    "pattern_streaming_semdedup": "embeddings",
    "pattern_streaming_source_caps": "documents",
    "pattern_streaming_quality_drift": "documents",
    "pattern_streaming_full_funnel": "documents",
    "snapshot_vacuum": "events",
    "corpus_release_manifest": "documents",
    "pattern_streaming_release": "documents",
}

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build_dir(spark: SparkSession, factor: int) -> str:
    out = os.path.join(WORK, f"x{factor}")
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        src = os.path.join(SRC_SF, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if factor == 1 or t not in ("documents", "events", "embeddings", "orders"):
            if not os.path.exists(dst):
                os.symlink(src, dst)
            continue
        copies = F.explode(F.array(*[F.lit(i) for i in range(factor)])).alias("__c")
        if t == "documents":
            df = spark.read.parquet(src).select("*", copies)
            # token-salt every copy>0: disjoint token/shingle space per copy
            salted = F.when(
                F.col("__c") == 0, F.col("text")
            ).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda tok: F.concat(
                            tok, F.lit("_s"), F.col("__c").cast("string")
                        ),
                    ),
                    " ",
                )
            )
            df = df.select(
                (F.col("doc_id") + F.col("__c") * F.lit(10_000_000)).alias("doc_id"),
                salted.alias("text"),
                "lang", "source", "n_chars",
            )
        elif t == "embeddings":
            # copy c gets its coordinates cyclically shifted by c: an
            # orthogonal transform, so every intra-copy cosine (and thus
            # each copy's near-dup/cell structure) is preserved exactly
            # while cross-copy vectors decorrelate — pair work replicates
            # per copy instead of exploding quadratically, same principle
            # as the token salt above.
            df = spark.read.parquet(src).select("*", copies)
            dim = 64
            shift = F.col("__c") % F.lit(dim)
            shifted = F.concat(
                F.slice(F.col("embedding"), shift + 1, F.lit(dim) - shift),
                F.slice(F.col("embedding"), F.lit(1), shift),
            )
            df = df.select(
                (F.col("vec_id") + F.col("__c") * F.lit(10_000_000)).alias(
                    "vec_id"
                ),
                shifted.alias("embedding"),
                "label",
            )
        elif t == "orders":
            # shift keys per copy; o_totalprice passes through, so the
            # price-band distribution (what range_join joins on) is
            # preserved per copy — work replicates linearly.
            df = spark.read.parquet(src).select("*", copies)
            df = df.select(
                (F.col("o_orderkey") + F.col("__c") * F.lit(10_000_000)).alias(
                    "o_orderkey"
                ),
                (F.col("o_custkey") + F.col("__c") * F.lit(10_000_000)).alias(
                    "o_custkey"
                ),
                *[
                    c
                    for c in spark.read.parquet(src).columns
                    if c not in ("o_orderkey", "o_custkey")
                ],
            )
        else:  # events
            # ts passes through unchanged (the nanosAsLong conf only
            # affects nanosecond fixtures; micros read natively) —
            # load_table's schema-adaptive branch reads the scaled file
            # identically to the original either way.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(src).select("*", copies)
            df = df.select(
                (F.col("event_id") + F.col("__c") * F.lit(10_000_000)).alias(
                    "event_id"
                ),
                "ts",
                (F.col("user_id") + F.col("__c") * F.lit(10_000_000)).alias(
                    "user_id"
                ),
                "event_type", "value", "props",
            )
        df.write.mode("overwrite").parquet(dst)
    return out


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 3, 10]
    spark = get_spark(app_name="dsp-scale-stress")
    # Set the nanos-as-long conf defensively (no-op on microsecond
    # fixtures) so nanosecond-precision events files, if the generator
    # reverts, are still readable exactly like sources/tables.load_table
    # reads them.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    results = []
    for factor in factors:
        d = build_dir(spark, factor)
        n_rows = {
            t: spark.read.parquet(os.path.join(d, f"{t}.parquet")).count()
            for t in ("documents", "events", "embeddings", "orders")
        }
        only = os.environ.get("SPARK_GRAFT_STRESS_ONLY")
        selected = only.split(",") if only else HEAVY
        for name in selected:
            t0 = time.perf_counter()
            if name == "semdedup_prune":
                # scale the quantizer with the corpus (cell size constant)
                from duckdb_streaming_patterns_spark.operators import (
                    similarity,
                )
                from duckdb_streaming_patterns_spark.sources.tables import (
                    load_table,
                )

                emb = load_table(spark, d, "embeddings")
                rows_out = force_eval(
                    similarity.semdedup_verdicts(
                        emb, n_cells=16 * factor, threshold=0.3
                    )
                )
            elif name == "pattern_streaming_semdedup":
                # round-6: the pattern re-quantizes ITSELF (√corpus cells
                # at power-of-2 epoch boundaries, state re-folded), so the
                # stress runs the REGISTERED parameterization — the
                # adversarial axis (fixed n_cells floor, growing corpus)
                # is exactly what the epoch schedule now bounds.
                from duckdb_streaming_patterns_spark.streaming import (
                    patterns as _pat,
                    staging as _stg,
                )

                run = _stg.new_run_dir("psem_stress")
                chunks = _stg.stage_embedding_chunks(spark, d, run, n_chunks=5)
                rows_out = force_eval(
                    _pat.pattern_streaming_semdedup(
                        spark, chunks, run, threshold=0.35,
                        n_cells=16, state_partitions=4,
                    )
                )
            elif name == "pattern_streaming_hybrid_manifest":
                # the synthesized x-factor corpora explode the arithmetic
                # chunk count (copies at 10M id offsets -> 6 chunks per
                # copy), so the registered form's fixed version map
                # (v -> 2v+1 over 6 batches) doesn't apply; the stress
                # serves the HEAD (newest coverable) version — the fleet
                # default — while still exercising the full coordinator
                # loop (one publish per covered version) and the scoped
                # serve at that depth
                from duckdb_streaming_patterns_spark.queries_text import (
                    _BM25_QUERIES as _BQ,
                    _BM25_SCORE_EXPR as _BS,
                )
                from duckdb_streaming_patterns_spark.sources.tables import (
                    load_table as _lt,
                )
                from duckdb_streaming_patterns_spark.streaming import (
                    patterns as _pat,
                    staging as _stg,
                )

                run = _stg.new_run_dir("phybm_stress")
                dchunks = _stg.stage_document_chunks(
                    spark, d, _stg.new_run_dir("phybmd_s"), n_chunks=6
                )
                echunks = _stg.stage_paired_embedding_chunks(
                    spark, d, _stg.new_run_dir("phybme_s"), n_chunks=6
                )
                qdf = _lt(spark, d, "embeddings").filter("vec_id < 3")
                rows_out = force_eval(
                    _pat.pattern_streaming_hybrid_manifest(
                        spark, dchunks, echunks, run, _BQ, qdf, _BS,
                        at_version=None, state_partitions=4,
                        compact_every=2,
                    )
                )
            elif name == "snapshot_vacuum":
                # setup (appends + tombstones) is UNTIMED — the measured
                # window is the vacuum rewrite itself + one post-vacuum
                # read proving the fast insert-only path is back
                import shutil as _sh

                from pyspark.sql import functions as F

                from duckdb_streaming_patterns_spark.plans.snapshots import (
                    SnapshotTable,
                )
                from duckdb_streaming_patterns_spark.sources.tables import (
                    load_table,
                )

                root = os.path.join(WORK, f"vac_x{factor}")
                _sh.rmtree(root, ignore_errors=True)
                ev = load_table(spark, d, "events").select(
                    "event_id", "user_id", "event_type"
                )
                t = SnapshotTable(
                    spark, root,
                    "event_id long, user_id long, event_type string",
                )
                for i in range(4):
                    t.append(
                        ev.filter(F.pmod(F.col("event_id"), F.lit(4)) == i),
                        batch_id=i,
                    )
                # two tombstone waves (~a third of the rows)
                t.delete(
                    F.col("event_type") == "click",
                    key_cols=["event_id"],
                    batch_id=10,
                )
                t.delete(
                    F.pmod(F.col("user_id"), F.lit(10)) == 3,
                    key_cols=["event_id"],
                    batch_id=11,
                )
                t0 = time.perf_counter()  # timed: vacuum + verify read
                t.vacuum(target_files=32)
                rows_out = force_eval(t.read())
            else:
                fn, _ = QUERIES[name]
                rows_out = force_eval(fn(spark, d))
            sec = round(time.perf_counter() - t0, 3)
            table = ROWS_TABLE.get(name)
            if table is None:
                table = (
                    "events"
                    if name.startswith("pattern")
                    and "corpus" not in name
                    and "neardup" not in name
                    else "documents"
                )
            rec = {
                "factor": factor,
                "query": name,
                "rows_in": n_rows[table],
                "rows_out": rows_out,
                "sec": sec,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
    # curvature: ratio of ideal-linear time (base scaled by factor) to the
    # measured time — 1.0 = perfectly linear, >1 = sublinear (fixed costs
    # amortizing), <1 = superlinear (a scale problem to investigate).
    base = {r["query"]: r["sec"] for r in results if r["factor"] == factors[0]}
    for r in results:
        ideal = base[r["query"]] * r["factor"] / factors[0]
        r["linear_ratio"] = round(ideal / r["sec"], 3) if r["sec"] else None
    print(json.dumps({"summary": results}), flush=True)


if __name__ == "__main__":
    main()
