"""LWW-maintenance A/B (round-7 verdict item 2): tiered adjacent-range
``maintain()`` vs no maintenance vs offline full ``compact()`` cadence,
on a sessionization-shaped last-writer-wins workload.

Workload: B batches; each batch inserts K fresh session keys and
RE-EMITS R keys from the previous batch (the "session extended" upsert
pattern that makes the log LWW). Variants (all identical data):

- tiered   — maintain(before_batch=b, fanout=2) every 2 batches, the
             registered sessionization parameterization
- tiered_c8 — same tiering, cadence 8 (carry propagation catches up;
             fanout 2 still implies ~B total merges, so this mostly
             probes invocation overhead, not merge count)
- tiered_f8 — cadence 8, fanout 8 (the production default): ~B/F
             merges total — fewer, fatter folds
- none     — appends only (what compact_every=0 gives)
- offline8 — full compact(before_batch=b) every 8 batches, the pre-r7
             bounded-state alternative (rewrites ALL state each time)

Reported per variant: in-loop maintenance seconds, append seconds,
final read_latest() force seconds, live dir count, and rows rewritten
by maintenance (write amplification proxy).

Run:  python scripts/lww_ab.py [B=64] [K=5000] [R=2500]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from pyspark.sql import functions as F  # noqa: E402

from duckdb_streaming_patterns_spark import get_spark  # noqa: E402
from duckdb_streaming_patterns_spark.operators.merge import UpsertLog  # noqa: E402

WORK = "/tmp/dsp_lww_ab"


def batch_df(spark, b: int, k: int, r: int):
    """k fresh keys [b*k, (b+1)*k) plus r re-emits of the previous
    batch's tail keys, all stamped with the emitting batch id."""
    fresh = spark.range(b * k, (b + 1) * k).select(
        F.col("id").alias("key"), F.lit(b).alias("emitted_in")
    )
    if b == 0 or r == 0:
        return fresh
    re_emit = spark.range(b * k - r, b * k).select(
        F.col("id").alias("key"), F.lit(b).alias("emitted_in")
    )
    return fresh.unionAll(re_emit)


def run_variant(spark, name: str, B: int, K: int, R: int) -> dict:
    root = os.path.join(WORK, name)
    shutil.rmtree(root, ignore_errors=True)
    log = UpsertLog(spark, root, keys=["key"])
    t_append = t_maint = 0.0
    rewritten = 0
    cadence = {"tiered": 2, "tiered_c8": 8, "tiered_f8": 8}.get(name)
    fanout = 8 if name == "tiered_f8" else 2
    for b in range(B):
        if cadence and b > 0 and b % cadence == 0:
            pre = _fold_dir_rows(log)
            t0 = time.perf_counter()
            log.maintain(before_batch=b, fanout=fanout)
            t_maint += time.perf_counter() - t0
            post = _fold_dir_rows(log)
            rewritten += sum(v for k, v in post.items() if k not in pre)
        elif name == "offline8" and b > 0 and b % 8 == 0:
            pre = _fold_dir_rows(log)
            t0 = time.perf_counter()
            log.compact(before_batch=b)
            t_maint += time.perf_counter() - t0
            post = _fold_dir_rows(log)
            rewritten += sum(v for k, v in post.items() if k not in pre)
        df = batch_df(spark, b, K, R)
        t0 = time.perf_counter()
        log.append(df, b)
        t_append += time.perf_counter() - t0
    live_dirs = len(
        [
            d
            for d in glob.glob(os.path.join(root, "__batch_id=*"))
            if int(d.rsplit("=", 1)[1]) not in set(log._dead_batch_ids())
        ]
    )
    t0 = time.perf_counter()
    out = log.read_latest()
    n = out.count()
    # LWW backstop with teeth: key κ is fresh in batch κ//K and
    # re-emitted in the NEXT batch iff it falls in the previous batch's
    # tail (κ%K >= K-R) and that next batch exists — its resolved
    # emitted_in must be the LATER emission, else the fold mis-ranked.
    base = F.floor(F.col("key") / K)
    expected = F.when(
        (F.col("key") % K >= K - R) & (base + 1 <= B - 1), base + 1
    ).otherwise(base)
    losses = out.filter(F.col("emitted_in") != expected).count()
    t_read = time.perf_counter() - t0
    assert n == B * K, (name, n)
    assert losses == 0, (name, losses)
    return {
        "variant": name,
        "batches": B,
        "new_per_batch": K,
        "reemit_per_batch": R,
        "append_sec": round(t_append, 2),
        "maintenance_sec": round(t_maint, 2),
        "read_latest_sec": round(t_read, 2),
        "live_dirs": live_dirs,
        "rows_rewritten": rewritten,
    }


def _fold_dir_rows(log) -> dict[int, int]:
    """{dir id: rows} for every fold-produced (negative-id) dir, via
    parquet footers — newly appearing entries after a maintenance call
    are exactly the rows that call physically rewrote."""
    import pyarrow.parquet as pq

    out: dict[int, int] = {}
    for d in glob.glob(os.path.join(log.root, "__batch_id=*")):
        did = int(d.rsplit("=", 1)[1])
        if did >= 0:
            continue
        out[did] = sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in glob.glob(
                os.path.join(d, "**", "*.parquet"), recursive=True
            )
        )
    return out


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 2500
    spark = get_spark(app_name="dsp-lww-ab")
    spark.range(1000).selectExpr("sum(id)").collect()
    variants = os.environ.get(
        "LWW_VARIANTS", "tiered,tiered_c8,tiered_f8,none,offline8"
    ).split(",")
    for name in variants:
        print(json.dumps(run_variant(spark, name, B, K, R)), flush=True)


if __name__ == "__main__":
    main()
