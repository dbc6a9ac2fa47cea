"""UpsertLog stream-DEPTH stress (round-9 brief item 7): read and
maintenance cost vs accumulated BATCH-DIR count at fixed data size —
the axis a long-running firehose stresses on the LSM side, the
companion to scripts/depth_stress.py's SnapshotTable ledger axis.

Every streaming pattern's state/verdict log gains one ``__batch_id=N``
directory per micro-batch. Without maintenance, ``read_latest()`` pays
a listing + per-dir parquet footer + an N-way LWW window over N dirs —
O(stream age). Tiered ``maintain()`` (cadence 8 / fanout 8, the
production defaults) keeps the live dir count O(log N), which should
make the read cost FLAT in stream age — this script measures whether it
actually does, at depths a month-long stream reaches.

Batch dirs are fabricated with pyarrow (a real ``append`` is a Spark
job; thousands of them would time the writer, not the reader) in the
exact layout ``UpsertLog.append`` produces for an un-partitioned log:
plain parquet under ``<root>/__batch_id=N/``. Maintenance in the
``tiered`` variant runs the log's own ``maintain()`` interleaved at the
production cadence, so fold manifests, carry chains, and dead-dir GC
are all the real code under test.

Workload shape: each batch K fresh keys + R re-emits of the previous
batch's tail (the LWW sessionization shape, same as scripts/lww_ab.py);
read_latest() must resolve every re-emit to its later emission.

Run one code version per invocation (A/B via git worktree, as
depth_stress.py):

    python scripts/upsert_depth_stress.py /root/repo 256 1024 4096

Prints one JSON line per (variant, depth).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = sys.argv[1]
DEPTHS = [int(x) for x in sys.argv[2:]] or [256, 1024, 4096]
sys.path.insert(0, REPO)

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from duckdb_streaming_patterns_spark import get_spark  # noqa: E402
from duckdb_streaming_patterns_spark.operators.merge import (  # noqa: E402
    UpsertLog,
)

WORK = "/tmp/dsp_upsert_depth"
K = 50  # fresh keys per batch
R = 25  # re-emits of the previous batch's tail


def fabricate_batch(root: str, b: int) -> None:
    keys = list(range(b * K, (b + 1) * K))
    if b > 0:
        keys += list(range(b * K - R, b * K))
    tbl = pa.table(
        {
            "key": pa.array(keys, pa.int64()),
            "emitted_in": pa.array([b] * len(keys), pa.int64()),
        }
    )
    d = os.path.join(root, f"__batch_id={b}")
    os.makedirs(d, exist_ok=True)
    pq.write_table(tbl, os.path.join(d, "part-0.parquet"))


def run(spark, variant: str, depth: int) -> dict:
    root = os.path.join(WORK, f"{variant}_{depth}")
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root, exist_ok=True)
    log = UpsertLog(spark, root, keys=["key"])
    t_maint = 0.0
    for b in range(depth):
        if variant == "tiered" and b > 0 and b % 8 == 0:
            t0 = time.perf_counter()
            log.maintain(before_batch=b, fanout=8)
            t_maint += time.perf_counter() - t0
        fabricate_batch(root, b)
    live_dirs = len(
        [d for d in log._batch_dirs()]
    ) - len(set(log._dead_batch_ids()))
    t0 = time.perf_counter()
    out = log.read_latest()
    n = out.count()
    t_read = time.perf_counter() - t0
    assert n == depth * K, (variant, depth, n)
    # LWW teeth: a re-emitted key resolves to the LATER emission
    from pyspark.sql import functions as F

    base = F.floor(F.col("key") / K)
    expected = F.when(
        (F.col("key") % K >= K - R) & (base + 1 <= depth - 1), base + 1
    ).otherwise(base)
    losses = out.filter(F.col("emitted_in") != expected).count()
    assert losses == 0, (variant, depth, losses)
    res = {
        "variant": variant,
        "depth": depth,
        "live_dirs": live_dirs,
        "read_latest_sec": round(t_read, 2),
        "maintain_total_sec": round(t_maint, 2),
        "maintain_per_batch_ms": round(1000 * t_maint / depth, 1),
    }
    shutil.rmtree(root, ignore_errors=True)
    return res


def main() -> None:
    spark = get_spark(app_name="dsp-upsert-depth")
    spark.range(1000).selectExpr("sum(id)").collect()
    for depth in DEPTHS:
        for variant in ("none", "tiered"):
            print(json.dumps(run(spark, variant, depth)), flush=True)


if __name__ == "__main__":
    main()
