"""Expiry-rewrite skew demo (round-9 brief item 8): why the
maintenance-rewrite distribution is an AQE REBALANCE, not a plain
repartition.

``expire_snapshots`` folds all history at-or-below the horizon into one
base snapshot and re-stamps every folded row at the SINGLE fold id. On
an unpartitioned table that makes the rewrite's shuffle key
(snapshot_id) maximally skewed: a plain
``repartition(snapshot_id, *partition_cols)`` hashes the entire folded
history — at 100 TB, ~the whole table — into ONE task, un-doing the
round-7 parallel-rewrite fix precisely on the operation that rewrites
the most data. AQE's RebalancePartitions (``df.hint("rebalance",
cols)``) shuffles by the same key but then splits any output partition
bigger than the advisory size across tasks (and coalesces small ones),
so the fold parallelizes no matter how skewed the key is.

This script measures exactly that A/B on a deliberately fold-heavy
table: N_SNAPS snapshots of ROWS_PER_SNAP rows each, expired through
the second-to-last snapshot, so ~all rows land in one fold id. Variants
run INTERLEAVED (pre, post, pre, post, ...) because this host's
background load drifts by tens of percent across minutes; each run uses
a fresh copy of the same fabricated table.

- ``rebalance``   — the shipped ``_rewrite_layout`` (AQE rebalance hint)
- ``repartition`` — the round-7..9 per-key repartition, monkeypatched in

Reported per run: expire wall seconds, max task-level part file size
share (1.0 = one file holds everything = one task wrote it), and part
file count in the fold leaf.

Run:  python scripts/expiry_skew_demo.py [N_SNAPS=32] [ROWS_PER_SNAP=200000] [PAIRS=3]
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
from duckdb_streaming_patterns_spark.plans.snapshots import (  # noqa: E402
    SnapshotTable,
)

WORK = "/tmp/dsp_expiry_skew"


def build_once(spark, n_snaps: int, rows_per_snap: int) -> str:
    """One fold-heavy UNPARTITIONED table (the worst case: no partition
    cols, so post-fold the shuffle key is the single fold id)."""
    root = os.path.join(WORK, "base")
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(spark, root, "id long, v double")
    for b in range(n_snaps):
        df = spark.range(
            b * rows_per_snap, (b + 1) * rows_per_snap
        ).select(F.col("id"), (F.rand(seed=b)).alias("v"))
        t.append(df, batch_id=b)
    return root


def run_once(spark, base_root: str, variant: str, through: int) -> dict:
    root = os.path.join(WORK, variant)
    shutil.rmtree(root, ignore_errors=True)
    shutil.copytree(base_root, root)
    t = SnapshotTable(spark, root, "id long, v double")
    if variant == "repartition":
        # the round-7..9 distribution, for the A/B
        t._rewrite_layout = lambda df, target_files: (
            df.repartition(
                F.col("snapshot_id"),
                *[F.col(c) for c in t.partition_cols],
            )
            if target_files == 1
            else df.coalesce(target_files)
        )
    t0 = time.perf_counter()
    fold_id = t.expire_snapshots(through=through)
    sec = time.perf_counter() - t0
    fold_leaf = glob.glob(
        os.path.join(t.data_dir, f"snapshot_id={fold_id}", "*.parquet")
    )
    sizes = sorted((os.path.getsize(p) for p in fold_leaf), reverse=True)
    total = sum(sizes) or 1
    out = {
        "variant": variant,
        "expire_sec": round(sec, 2),
        "fold_part_files": len(sizes),
        "max_file_share": round(sizes[0] / total, 3) if sizes else None,
        "fold_rows": t.read().count(),
    }
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    n_snaps = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="dsp-expiry-skew")
    spark.range(1000).selectExpr("sum(id)").collect()
    base = build_once(spark, n_snaps, rows)
    through = n_snaps - 2
    for _ in range(pairs):
        for variant in ("repartition", "rebalance"):
            print(
                json.dumps(run_once(spark, base, variant, through)),
                flush=True,
            )


if __name__ == "__main__":
    main()
