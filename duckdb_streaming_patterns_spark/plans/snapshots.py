"""Snapshot ledger + change-data-feed emulation on plain Parquet
(SURVEY §4.3.2 — pattern 1.2 parity).

The reference's DuckLake surface:
- ``snapshots()``            → list snapshots (pattern_1_2.py:94)
- ``table_changes(t, a, b)`` → rows added between snapshots (pattern_1_2.py:105)
- compaction                 → merge small files (pattern_1_2.py:152-155)

Spark restatement: an append-only parquet table whose rows are stamped with
the writing ``snapshot_id``; a ``_snapshots`` ledger directory records one
JSON entry per commit. ``table_changes(from, to)`` is then a partition-pruned
filter ``snapshot_id > from AND snapshot_id <= to`` — the snapshot column is
the physical partition key, so a CDF read touches only the delta's files
(at 100 TB this is the difference between scanning the log tail and the
whole table). Snapshot boundaries coincide with micro-batch commits, which
keeps the incremental≡batch property exact (SURVEY §7 hard-part 3).

Crash-safety design (each a single atomic rename on the same filesystem):
- ``append`` stages the batch outside the data dir, then ``os.replace``s it
  into ``data/snapshot_id=N`` — a foreachBatch retry after a crash *clobbers*
  any orphaned half-append for the same snapshot id instead of appending a
  second copy beside it (exactly-once on the failure path, not just the
  fenced happy path).
- the ledger entry commits after the data rename; readers scope by ledger,
  so a crash between the two leaves an invisible orphan, never a torn read.
- ``compact`` rewrites into a new *generation* directory and swaps a pointer
  file (like SummaryTable) — readers mid-scan on the old generation keep a
  live directory; the previous generation is GC'd one compaction later.
  Compaction reads ledger-scoped, so orphaned uncommitted partitions are
  dropped, not materialized.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    """Append-only, snapshot-stamped, hive-partitioned parquet table."""

    def __init__(self, spark: SparkSession, root: str, schema_ddl: str):
        self.spark = spark
        self.root = root
        self.schema_ddl = schema_ddl
        self.ledger_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.ledger_dir, exist_ok=True)

    # -- generation pointer (compaction support) ---------------------------

    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.root, "_data.json")

    def _pointer(self) -> dict:
        if not os.path.exists(self._pointer_path):
            return {"generation": 0, "data": "data", "prev_data": None}
        with open(self._pointer_path) as f:
            return json.load(f)

    @property
    def data_dir(self) -> str:
        return os.path.join(self.root, self._pointer()["data"])

    # -- ledger ------------------------------------------------------------

    def snapshots(self) -> list[dict]:
        """Reference ``snapshots()`` (pattern_1_2.py:94)."""
        out = []
        for name in sorted(os.listdir(self.ledger_dir)):
            if not name.endswith(".json"):
                continue
            with open(os.path.join(self.ledger_dir, name)) as f:
                out.append(json.load(f))
        return out

    def max_snapshot_id(self) -> int:
        snaps = self.snapshots()
        return snaps[-1]["snapshot_id"] if snaps else -1

    # -- writes ------------------------------------------------------------

    def append(self, df: DataFrame, batch_id: int | None = None) -> int:
        """Append a batch as the next snapshot. The partition directory is
        staged then renamed into place (clobbering any orphan from a crashed
        prior attempt at the same id), and the ledger entry is written AFTER
        the data lands, so readers scoping by ledger never see a
        half-written snapshot. Returns the new snapshot id; -1 if fenced."""
        sid = self.max_snapshot_id() + 1
        if batch_id is not None:
            for s in self.snapshots():
                if s.get("batch_id") == batch_id:
                    return -1  # fenced: foreachBatch retry of an applied epoch
        staging_root = os.path.join(self.root, ".staging")
        # Single-writer: sweep staging wholesale so orphans from crashed
        # prior attempts (which got a different uuid suffix and would never
        # be clobbered by name) cannot accumulate.
        shutil.rmtree(staging_root, ignore_errors=True)
        os.makedirs(staging_root, exist_ok=True)
        staged = os.path.join(staging_root, f"{sid:09d}.{uuid.uuid4().hex[:8]}")
        # snapshot_id is carried by the hive partition directory name, so the
        # staged files hold only the payload columns.
        df.write.mode("overwrite").parquet(staged)
        # Row count from the freshly written footers (driver-side, metadata
        # only) — no second computation of the batch.
        n = _parquet_row_count(staged)
        final = os.path.join(self.data_dir, f"snapshot_id={sid}")
        if os.path.exists(final):
            shutil.rmtree(final)  # orphan from a crashed append: retry clobbers
        os.replace(staged, final)
        entry = {
            "snapshot_id": sid,
            "batch_id": batch_id,
            "rows": n,
            "committed_at": time.time(),
        }
        tmp = os.path.join(self.ledger_dir, f".{sid:09d}.tmp")
        with open(tmp, "w") as f:
            json.dump(entry, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.ledger_dir, f"{sid:09d}.json"))
        return sid

    # -- reads ---------------------------------------------------------------

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], self.schema_ddl + ", snapshot_id int")

    def read(self) -> DataFrame:
        """Full-table scan, scoped to committed snapshots."""
        return self.table_changes(-1, self.max_snapshot_id())

    def read_as_of(self, snapshot_id: int) -> DataFrame:
        """Time travel: the table as it stood after ``snapshot_id``
        committed (DuckLake reads any snapshot; the reference itself only
        reads latest). Same partition-pruned scan as table_changes —
        snapshots <= the asked version."""
        return self.table_changes(-1, snapshot_id)

    def table_changes(self, from_snapshot: int, to_snapshot: int) -> DataFrame:
        """Reference ``table_changes(tbl, from, to)`` (pattern_1_2.py:105):
        rows appended in snapshots (from, to]. Partition pruning on
        snapshot_id means only those snapshot directories are read."""
        if to_snapshot <= from_snapshot or self.max_snapshot_id() < 0:
            return self._empty()
        df = self.spark.read.parquet(self.data_dir)
        return df.filter(
            (F.col("snapshot_id") > from_snapshot)
            & (F.col("snapshot_id") <= to_snapshot)
        )

    # -- maintenance -----------------------------------------------------------

    def compact(self, target_files: int = 1) -> None:
        """Reference compaction (``ducklake_merge_adjacent_files``,
        pattern_1_2.py:152-155): rewrite committed data into ``target_files``
        files per snapshot partition in a NEW generation directory, then swap
        the generation pointer. Readers that resolved the old pointer keep a
        live directory (GC is deferred by one generation); the source read is
        ledger-scoped, so orphans from crashed appends are dropped here."""
        ptr = self._pointer()
        new_gen = ptr["generation"] + 1
        new_name = f"data_g{new_gen:04d}_{uuid.uuid4().hex[:8]}"
        new_dir = os.path.join(self.root, new_name)
        (
            self.read()  # ledger-scoped: uncommitted orphans do not survive
            .coalesce(target_files)
            .write.mode("overwrite")
            .partitionBy("snapshot_id")
            .parquet(new_dir)
        )
        new_ptr = {"generation": new_gen, "data": new_name, "prev_data": ptr["data"]}
        tmp = self._pointer_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_ptr, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer_path)  # atomic generation swap
        # Deferred GC: drop the generation BEFORE the one we just replaced —
        # in-flight readers of ptr["data"] are still scanning it.
        stale = ptr.get("prev_data")
        if stale and stale != new_name:
            shutil.rmtree(os.path.join(self.root, stale), ignore_errors=True)


def _parquet_row_count(directory: str) -> int:
    """Sum of footer row counts for the parquet files under ``directory`` —
    O(files) driver-side metadata reads, never a data scan."""
    import pyarrow.parquet as pq

    total = 0
    for path in glob.glob(os.path.join(directory, "*.parquet")):
        total += pq.ParquetFile(path).metadata.num_rows
    return total
