"""Stream-DEPTH stress for SnapshotTable metadata (round-7 verdict
item 2 / what's-wrong #1): probe cost vs stream AGE at fixed data size.

scale_stress.py grows the corpus; this grows the SNAPSHOT COUNT — the
axis a long-running 5 s-tick stream actually stresses. It fabricates a
cell-partitioned SnapshotTable of N tiny snapshots (pyarrow writes the
part files; the table code under test writes its own ledger via
_commit_ledger, so checkpointing behaves exactly as in production),
then times at each depth:

- ``snapshots()``  — the pure driver-side ledger scan
- probe construct  — ``read(partition_values={'cell': [0]})`` plan
  build (ledger scans + path enumeration + Spark schema inference)
- probe run        — count() of the probe (scan cost, identical for
  both code versions — included to show the metadata share)

Run one code version per invocation (the package name is identical, so
A/B needs separate processes):

    python scripts/depth_stress.py /root/repo 500 2000 8000
    git worktree add /tmp/r7ref <r7-sha>
    python scripts/depth_stress.py /tmp/r7ref 500 2000 8000

Prints one JSON line per depth.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = sys.argv[1]
DEPTHS = [int(x) for x in sys.argv[2:]] or [500, 2000, 8000]
sys.path.insert(0, REPO)

import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from duckdb_streaming_patterns_spark import get_spark  # noqa: E402
from duckdb_streaming_patterns_spark.plans.snapshots import (  # noqa: E402
    SnapshotTable,
)

WORK = "/tmp/dsp_depth_stress"
N_CELLS = 2
ROWS_PER_CELL = 4


def fabricate(spark, root: str, n_snaps: int) -> SnapshotTable:
    """N snapshots of a cell-partitioned table, bypassing Spark writes
    (a real append is a Spark job; 8000 of them would time the writer,
    not the reader). Ledger entries go through the version-under-test's
    own _commit_ledger so its checkpointing (if any) is exercised."""
    shutil.rmtree(root, ignore_errors=True)
    t = SnapshotTable(
        spark, root, "id long, v double, cell int", partition_cols=["cell"]
    )
    payload = pa.table(
        {
            "id": pa.array(range(ROWS_PER_CELL), type=pa.int64()),
            "v": pa.array([float(i) for i in range(ROWS_PER_CELL)]),
        }
    )
    parts = [f"cell={c}" for c in range(N_CELLS)]
    for sid in range(n_snaps):
        snap_dir = os.path.join(t.data_dir, f"snapshot_id={sid}")
        for p in parts:
            d = os.path.join(snap_dir, p)
            os.makedirs(d)
            pq.write_table(payload, os.path.join(d, "part-0.parquet"))
        t._commit_ledger(
            {
                "snapshot_id": sid,
                "kind": "insert",
                "batch_id": sid,
                "rows": ROWS_PER_CELL * N_CELLS,
                "columns": ["id", "v", "cell"],
                "committed_at": time.time(),
                "partitions": parts,
            }
        )
    return t


def main() -> None:
    spark = get_spark(app_name="dsp-depth-stress")
    spark.range(1000).selectExpr("sum(id)").collect()  # warm
    for depth in DEPTHS:
        root = os.path.join(WORK, f"d{depth}")
        t0 = time.perf_counter()
        t = fabricate(spark, root, depth)
        fab = time.perf_counter() - t0

        t0 = time.perf_counter()
        for _ in range(3):
            snaps = t.snapshots()
        snap_sec = (time.perf_counter() - t0) / 3
        assert len(snaps) == depth

        t0 = time.perf_counter()
        probe = t.read(partition_values={"cell": [0]})
        construct = time.perf_counter() - t0

        t0 = time.perf_counter()
        n = probe.count()
        run = time.perf_counter() - t0
        assert n == depth * ROWS_PER_CELL

        ledger_files = sum(
            1 for x in os.listdir(t.ledger_dir) if x.endswith(".json")
        )
        rec = {
            "repo": REPO,
            "depth": depth,
            "snapshots_sec": round(snap_sec, 4),
            "probe_construct_sec": round(construct, 4),
            "probe_run_sec": round(run, 4),
            "ledger_files": ledger_files,
            "fabricate_sec": round(fab, 2),
        }
        if hasattr(t, "expire_snapshots"):
            # round-8 expiry: fold the whole history, re-measure the
            # probe — the path count (and Spark's file-index share of
            # construct time) should go depth-independent
            t0 = time.perf_counter()
            t.expire_snapshots()
            rec["expire_sec"] = round(time.perf_counter() - t0, 2)
            t0 = time.perf_counter()
            probe2 = t.read(partition_values={"cell": [0]})
            rec["post_expiry_construct_sec"] = round(
                time.perf_counter() - t0, 4
            )
            t0 = time.perf_counter()
            n2 = probe2.count()
            rec["post_expiry_run_sec"] = round(time.perf_counter() - t0, 4)
            assert n2 == n
        print(json.dumps(rec), flush=True)
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
