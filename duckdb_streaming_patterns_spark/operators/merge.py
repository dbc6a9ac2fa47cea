"""MERGE-upsert emulation on plain Parquet (SURVEY §4.3.1).

The reference upserts aggregated deltas into a summary table with
``MERGE INTO ... WHEN MATCHED THEN UPDATE (additive) WHEN NOT MATCHED THEN
INSERT`` (reference pattern_1_1.py:97-116). Plain OSS Spark has no MERGE, so
the engine provides:

- ``additive_merge``: the pure-DataFrame full-outer-join merge with additive
  coalesce — semantics identical to the reference's matched-update arithmetic
  (``dest.count + src.count``, pattern_1_1.py:111-112).
- ``SummaryTable``: a tiny parquet-backed mutable table with atomic
  write-temp-then-swap replacement and batch-id fencing for exactly-once
  behavior under foreachBatch retries (SURVEY §7 hard-part 1 and 2).

At scale the summary table is orders of magnitude smaller than the stream
(it has one row per group key), so rewriting it per merge is proportional to
state size, not stream size — the same cost profile as the reference's
in-place MERGE. For huge summary tables the swap can be partitioned by a
key-hash bucket so only touched buckets rewrite (noted in docstring; Delta
MERGE is the drop-in upgrade when the dependency is allowed).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def additive_merge(
    dest: DataFrame,
    src: DataFrame,
    keys: list[str],
    add_cols: list[str],
    max_cols: list[str],
) -> DataFrame:
    """Full-outer-join additive merge.

    matched   → add_cols summed, max_cols greatest  (reference :111-112)
    unmatched → inserted as-is                       (reference :114-115)
    """
    d = dest.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__d_{c}") for c in add_cols + max_cols],
    )
    s = src.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in add_cols + max_cols],
    )
    merged = d.join(s, on=keys, how="full_outer")
    out_cols = [F.col(k) for k in keys]
    for c in add_cols:
        out_cols.append(
            (
                F.coalesce(F.col(f"__d_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__s_{c}"), F.lit(0))
            ).alias(c)
        )
    for c in max_cols:
        out_cols.append(
            F.greatest(
                F.coalesce(F.col(f"__d_{c}"), F.col(f"__s_{c}")),
                F.coalesce(F.col(f"__s_{c}"), F.col(f"__d_{c}")),
            ).alias(c)
        )
    return merged.select(*out_cols)


def replace_merge(
    dest: DataFrame,
    src: DataFrame,
    keys: list[str],
    set_cols: list[str],
) -> DataFrame:
    """Full-outer-join replace merge: matched rows take the *source* values
    (the source carries new running totals, as in update-mode streaming
    output), unmatched dest rows carry over, unmatched src rows insert."""
    d = dest.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__d_{c}") for c in set_cols],
    )
    s = src.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"__s_{c}") for c in set_cols],
    )
    merged = d.join(s, on=keys, how="full_outer")
    out_cols = [F.col(k) for k in keys] + [
        F.coalesce(F.col(f"__s_{c}"), F.col(f"__d_{c}")).alias(c) for c in set_cols
    ]
    return merged.select(*out_cols)


class UpsertLog:
    """Log-structured upsert table: each micro-batch *appends* its emitted
    rows under ``<root>/__batch_id=N/``; readers resolve last-writer-wins
    per key with one window over the log.

    Write cost per batch is O(batch), not O(accumulated state) — the LSM
    trade the SummaryTable's swap-rewrite makes the other way. The right
    choice when the updated key-space per batch is small relative to total
    state (e.g. update-mode streaming output where only touched groups
    re-emit). Writing a batch directory is idempotent (mode=overwrite on
    the batch's own dir), so foreachBatch retries are exactly-once without
    a fence. Periodic compaction = read_latest → rewrite as a new base.
    """

    def __init__(self, spark: SparkSession, root: str, keys: list[str]):
        self.spark = spark
        self.root = root
        self.keys = keys
        os.makedirs(root, exist_ok=True)

    def append(self, batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("overwrite").parquet(
            os.path.join(self.root, f"__batch_id={batch_id}")
        )

    def read_latest(self, before_batch: int | None = None) -> DataFrame:
        """Resolved last-writer-wins state. ``before_batch`` scopes the
        read to batches strictly below that id — what a foreachBatch
        RETRY of batch N must read: resolving against the full log would
        include batch N's own (pre-crash) rows, change the recomputation,
        and let the idempotent overwrite of ``__batch_id=N`` diverge from
        what the first attempt wrote."""
        from pyspark.sql import Window as W

        log = self.spark.read.parquet(self.root)  # partition col __batch_id
        if before_batch is not None:
            log = log.filter(F.col("__batch_id") < before_batch)
        w = W.partitionBy(*self.keys).orderBy(F.col("__batch_id").desc())
        return (
            log.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__batch_id")
        )

    def compact(self, before_batch: int | None = None) -> None:
        """LSM-style maintenance: fold the log into one base batch
        directory so the read-side last-writer-wins window scans O(keys)
        rows again instead of O(batches × touched keys).

        ``before_batch`` scopes the fold to batch dirs STRICTLY BELOW that
        id — what an IN-LOOP compaction (inside a running foreachBatch)
        must pass: batches < the current id are checkpoint-committed and
        safe to fold, while the current batch may still be retried, and a
        fold that swallowed its rows would resolve a retry's
        ``read_latest(before_batch=batch_id)`` against state that already
        includes the first attempt — exactly the crash-window corruption
        the scoped read exists to prevent. Offline maintenance (no stream
        running) may omit it and fold everything.

        Crash-safety invariants:
        - The base gets a FRESH NEGATIVE batch id (one below the current
          minimum). Engine-delivered epochs are ≥ 0, so a foreachBatch
          retry of the newest uncommitted batch can never overwrite the
          folded base (folding into an existing id would let that retry
          replace the whole base with one batch's rows), and the base
          correctly LOSES to every re-delivered real batch.
        - Order of operations keeps every intermediate state resolvable:
          the resolved snapshot is fully written to a dot-prefixed temp
          (invisible to readers), atomically renamed to the new base
          (readers now see base + old dirs — last-writer-wins resolves
          identically since old dirs outrank the base), and only then are
          the old directories removed in ASCENDING numeric batch-id order
          (lexicographic order would drop __batch_id=10 before =2: a crash
          mid-GC could then leave an older dir alive while a newer one
          survives only inside the base, losing last-writer-wins). With
          ascending deletion any surviving suffix of dirs is the NEWEST
          batches, which outrank the base and every deleted batch — so
          every crash window still resolves to the same state."""
        import glob

        dirs = sorted(
            glob.glob(os.path.join(self.root, "__batch_id=*")),
            key=lambda d: int(d.rsplit("=", 1)[1]),
        )
        if before_batch is not None:
            dirs = [
                d for d in dirs if int(d.rsplit("=", 1)[1]) < before_batch
            ]
        if len(dirs) <= 1:
            return
        base_id = int(dirs[0].rsplit("=", 1)[1]) - 1
        tmp = os.path.join(self.root, f".compact_{uuid.uuid4().hex[:8]}")
        self.read_latest(before_batch=before_batch).write.mode(
            "overwrite"
        ).parquet(tmp)
        os.replace(tmp, os.path.join(self.root, f"__batch_id={base_id}"))
        for d in dirs:
            shutil.rmtree(d)


class SummaryTable:
    """Parquet-backed mutable summary table with atomic swap + batch fencing.

    Layout: ``<root>/data_vNNN/`` parquet dirs; ``<root>/_meta.json`` points
    at the current version and records the last applied batch id. Readers
    resolve the pointer then read an immutable directory — no torn reads
    (SURVEY §7 hard-part 2). A re-delivered foreachBatch epoch is skipped by
    the fence (hard-part 1: idempotent upserts keyed by batch id).
    """

    def __init__(self, spark: SparkSession, root: str, schema_ddl: str):
        self.spark = spark
        self.root = root
        self.schema_ddl = schema_ddl
        os.makedirs(root, exist_ok=True)

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "_meta.json")

    def _meta(self) -> dict:
        if not os.path.exists(self._meta_path):
            return {"version": -1, "last_batch_id": -1, "data": None}
        with open(self._meta_path) as f:
            return json.load(f)

    def read(self) -> DataFrame:
        meta = self._meta()
        if meta["data"] is None:
            return self.spark.createDataFrame([], self.schema_ddl)
        return self.spark.read.parquet(os.path.join(self.root, meta["data"]))

    def last_batch_id(self) -> int:
        return self._meta()["last_batch_id"]

    def overwrite(self, df: DataFrame, batch_id: int | None = None) -> None:
        """Atomically replace contents: write new version dir, fsync meta,
        point the reader at it. GC is deferred by one version — a reader that
        resolved the previous pointer just before the swap still has a live
        directory for its (lazy) scan; only version N-2 is deleted here."""
        meta = self._meta()
        new_version = meta["version"] + 1
        data_dir = f"data_v{new_version:06d}_{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(os.path.join(self.root, data_dir))
        new_meta = {
            "version": new_version,
            "last_batch_id": batch_id if batch_id is not None else meta["last_batch_id"],
            "data": data_dir,
            "prev_data": meta["data"],
            "written_at": time.time(),
        }
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(new_meta, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._meta_path)  # atomic pointer swap
        stale = meta.get("prev_data")
        if stale and stale != data_dir:
            shutil.rmtree(os.path.join(self.root, stale), ignore_errors=True)

    def merge_batch(
        self,
        delta: DataFrame,
        batch_id: int,
        keys: list[str],
        add_cols: list[str],
        max_cols: list[str],
    ) -> bool:
        """Apply one micro-batch delta with batch-id fencing; returns False
        if the batch was already applied (foreachBatch retry)."""
        if batch_id <= self.last_batch_id():
            return False
        merged = additive_merge(self.read(), delta, keys, add_cols, max_cols)
        self.overwrite(merged, batch_id=batch_id)
        return True

    def upsert_batch(
        self,
        delta: DataFrame,
        batch_id: int,
        keys: list[str],
        set_cols: list[str],
    ) -> bool:
        """Replace-style upsert (update-mode streaming output: the delta
        rows carry new running totals, not additive increments), with the
        same batch-id fence as merge_batch."""
        if batch_id <= self.last_batch_id():
            return False
        merged = replace_merge(self.read(), delta, keys, set_cols)
        self.overwrite(merged, batch_id=batch_id)
        return True

    def delete_keys(
        self,
        keys_df: DataFrame,
        batch_id: int,
        keys: list[str],
    ) -> bool:
        """Remove rows whose key appears in ``keys_df`` (MERGE ... WHEN
        MATCHED DELETE — the upsert surface's third verb, needed when
        delete propagation empties a group entirely). Broadcast anti-join
        + atomic swap, same batch-id fence as merge_batch."""
        if batch_id <= self.last_batch_id():
            return False
        remaining = self.read().join(
            F.broadcast(keys_df.select(*keys).distinct()), on=keys, how="left_anti"
        )
        self.overwrite(remaining, batch_id=batch_id)
        return True
