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
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    """Append-only, snapshot-stamped, hive-partitioned parquet table."""

    def __init__(self, spark: SparkSession, root: str, schema_ddl: str):
        self.spark = spark
        self.root = root
        self.schema_ddl = schema_ddl
        self.data_dir = os.path.join(root, "data")
        self.ledger_dir = os.path.join(root, "_snapshots")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.ledger_dir, exist_ok=True)

    # -- ledger ------------------------------------------------------------

    def snapshots(self) -> list[dict]:
        """Reference ``snapshots()`` (pattern_1_2.py:94)."""
        out = []
        for name in sorted(os.listdir(self.ledger_dir)):
            with open(os.path.join(self.ledger_dir, name)) as f:
                out.append(json.load(f))
        return out

    def max_snapshot_id(self) -> int:
        snaps = self.snapshots()
        return snaps[-1]["snapshot_id"] if snaps else -1

    # -- writes ------------------------------------------------------------

    def append(self, df: DataFrame, batch_id: int | None = None) -> int:
        """Append a batch as the next snapshot. Ledger entry is written
        AFTER the data lands, so readers scoping by ledger never see a
        half-written snapshot. Returns the new snapshot id; -1 if fenced."""
        sid = self.max_snapshot_id() + 1
        if batch_id is not None:
            for s in self.snapshots():
                if s.get("batch_id") == batch_id:
                    return -1  # fenced: foreachBatch retry of an applied epoch
        n = df.count()
        (
            df.withColumn("snapshot_id", F.lit(sid))
            .write.mode("append")
            .partitionBy("snapshot_id")
            .parquet(self.data_dir)
        )
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
        pattern_1_2.py:152-155): rewrite all committed data into
        ``target_files`` files per snapshot partition, atomically swapping
        the data directory."""
        current = self.spark.read.parquet(self.data_dir).coalesce(target_files)
        tmp_dir = self.data_dir + ".compacting"
        (
            current.write.mode("overwrite")
            .partitionBy("snapshot_id")
            .parquet(tmp_dir)
        )
        old = self.data_dir + ".old"
        os.replace(self.data_dir, old)
        os.replace(tmp_dir, self.data_dir)
        import shutil

        shutil.rmtree(old, ignore_errors=True)
