"""Snapshot ledger + change-data-feed emulation on plain Parquet
(SURVEY §4.3.2 — pattern 1.2 parity).

The reference's DuckLake surface:
- ``snapshots()``            → list snapshots (pattern_1_2.py:94)
- ``table_changes(t, a, b)`` → rows added between snapshots (pattern_1_2.py:105)
- compaction                 → merge small files (pattern_1_2.py:152-155)

Beyond the reference's insert-only usage, DuckLake's ``table_changes``
also reports DELETEs; this engine adds the same: ``delete(cond)`` commits a
tombstone snapshot (keys of the removed rows), reads apply tombstones with
an anti-join, ``table_changes(include_deletes=True)`` emits a
``_change_type`` column, and ``vacuum()`` physically rewrites the data with
tombstones applied (the Delta-VACUUM analogue). At 100 TB a delete is
O(|tombstone keys|) metadata + one broadcast anti-join on read — the raw
log is never rewritten until vacuum, which is the only full-table pass.

Spark restatement: an append-only parquet table whose rows are stamped with
the writing ``snapshot_id``; a ``_snapshots`` ledger directory records one
JSON entry per commit. ``table_changes(from, to)`` is then a partition-pruned
filter ``snapshot_id > from AND snapshot_id <= to`` — the snapshot column is
the physical partition key, so a CDF read touches only the delta's files
(at 100 TB this is the difference between scanning the log tail and the
whole table). Snapshot boundaries coincide with micro-batch commits, which
keeps the incremental≡batch property exact (SURVEY §7 hard-part 3).

Crash-safety design (every transactional step is one CommitIO verb —
atomic publish, write-once claim, pointer swap, directory promotion — so
the protocol ports to object storage by swapping the backend, SCALE.md §10):
- ``append`` stages the batch outside the data dir, then promotes it
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
import os
import re
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .commitio import POSIX_IO, READ_ABSENT


def _ckpt_key(name: str) -> tuple[int, int]:
    """Ordering key of a checkpoint filename. Two forms exist:
    ``checkpoint-<sid>.json`` (one per top snapshot id) and
    ``checkpoint-<sid>.<k>.json`` — the k-th RE-checkpoint at an
    unchanged top, written when a maintenance-only window (expire/vacuum
    flag re-commits, no new snapshot) crosses the cadence. The suffix
    keeps every checkpoint filename WRITE-ONCE, which the parse cache
    in ``snapshots()`` depends on; newest = max (sid, k)."""
    stem = name[len("checkpoint-"):-len(".json")]
    sid, _, k = stem.partition(".")
    return (int(sid), int(k) if k else 0)


#: Numeric widening lattice for schema TYPE evolution (round 11) — the
#: DuckLake surface: INT→BIGINT and the standard SQL promotions. Rank
#: orders each chain; mixing the integer and floating chains widens to
#: double (the SQL least-upper-bound, same rule both engines apply).
_WIDEN_RANK = {
    "tinyint": 0,
    "smallint": 1,
    "int": 2,
    "bigint": 3,
    "float": 0,
    "double": 1,
}
_INT_CHAIN = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_CHAIN = {"float", "double"}
#: Decimal digits needed to represent each integer type exactly — the
#: SQL mapping used when an era mixes integers with DECIMAL(p,s).
_INT_DIGITS = {"tinyint": 3, "smallint": 5, "int": 10, "bigint": 19}
_DECIMAL_RE = re.compile(r"decimal\((\d+),(\d+)\)")


def _widen_type(types: set[str]) -> str:
    """Least upper bound of one column's types across eras. Identical
    types pass through untouched (any type, not just numeric); genuine
    widening is supported for the numeric chains only — anything else
    raises, loudly, rather than guessing a lossy cast.

    DECIMAL(p,s) (round 12 — the other common lakehouse evolution):
    the LUB keeps max integer digits AND max scale —
    ``decimal(p, s) = (max(pᵢ-sᵢ) + max(sᵢ), max(sᵢ))`` — so every era's
    values fit exactly; integers join the lattice at their exact digit
    width (int→10, bigint→19). A LUB that would exceed DECIMAL's max
    precision 38 RAISES (a loud refusal, never a silent truncation),
    and mixing decimal with the float chain widens to double — the same
    union-type reconciliation rule Spark and DuckDB both apply."""
    if len(types) == 1:
        return next(iter(types))
    decs = {t for t in types if _DECIMAL_RE.fullmatch(t)}
    rest = types - decs
    if not rest <= (_INT_CHAIN | _FLOAT_CHAIN):
        raise ValueError(
            f"unsupported column type evolution {sorted(types)}: only "
            "numeric widening (tinyint→smallint→int→bigint, float→double, "
            "decimal(p,s) precision/scale growth, int/float/decimal "
            "mixes) is readable across eras"
        )
    if decs:
        if rest & _FLOAT_CHAIN:
            return "double"
        parts = [
            (int(m[1]) - int(m[2]), int(m[2]))
            for m in (_DECIMAL_RE.fullmatch(t) for t in decs)
        ]
        parts.extend((_INT_DIGITS[t], 0) for t in rest)
        int_digits = max(i for i, _ in parts)
        scale = max(s for _, s in parts)
        if int_digits + scale > 38:
            raise ValueError(
                f"decimal widening of {sorted(types)} needs "
                f"decimal({int_digits + scale},{scale}) — exceeds the "
                "maximum precision 38; refusing a lossy cast (re-type "
                "the column explicitly instead)"
            )
        return f"decimal({int_digits + scale},{scale})"
    if types & _INT_CHAIN and types & _FLOAT_CHAIN:
        return "double"
    chain = _INT_CHAIN if types <= _INT_CHAIN else _FLOAT_CHAIN
    return max(types & chain, key=_WIDEN_RANK.get)


class SnapshotTable:
    """Append-only, snapshot-stamped, hive-partitioned parquet table."""

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        schema_ddl: str,
        partition_cols: list[str] | None = None,
        checkpoint_every: int = 16,
        io=None,
    ):
        """``partition_cols`` sub-partitions every snapshot by payload
        columns (``snapshot_id=N/col=V/...``) — a table-level property so
        maintenance (compact/vacuum) preserves the layout the readers'
        pruning depends on.

        ``checkpoint_every`` is the ledger-checkpoint cadence (Delta-style
        log cleanup): every N loose entry files, ``_commit_ledger`` folds
        the full ledger into one ``checkpoint-<sid>.json`` and deletes the
        loose files it covers, so ``snapshots()`` opens O(N) files instead
        of O(total snapshots ever) — the long-stream metadata bound.

        ``io`` is the CommitIO backend (default POSIX) — every
        metadata read/commit, directory promotion, and GC delete goes
        through it, so porting the transaction protocol to object
        storage is one new backend, not a rewrite (SCALE.md §10)."""
        self.spark = spark
        self.root = root
        self.schema_ddl = schema_ddl
        self.partition_cols = list(partition_cols or [])
        self.checkpoint_every = max(int(checkpoint_every), 1)
        self.io = io if io is not None else POSIX_IO
        self.ledger_dir = os.path.join(root, "_snapshots")
        self.tombstone_dir = os.path.join(root, "_tombstones")
        self.io.ensure_dir(self.data_dir)
        self.io.ensure_dir(self.ledger_dir)

    # -- generation pointer (compaction support) ---------------------------

    @property
    def _pointer_path(self) -> str:
        return os.path.join(self.root, "_data.json")

    def _pointer(self) -> dict:
        ptr = self.io.try_read_json(self._pointer_path)
        # READ_ABSENT marks the bootstrap as synthesized-from-absence so
        # swap_pointer's CAS maps it to a conditional CREATE, not an
        # If-Match against a value that was never stored (commitio)
        return ptr if ptr is not None else {
            "generation": 0, "data": "data", "prev_data": None,
            READ_ABSENT: True,
        }

    @property
    def data_dir(self) -> str:
        return os.path.join(self.root, self._pointer()["data"])

    def _rewrite_layout(self, df: DataFrame, target_files: int) -> DataFrame:
        """Distribution for a maintenance rewrite (compact/vacuum/expire).
        ``target_files=1`` (the default everywhere) REBALANCES on the
        leaf-partition columns — AQE's RebalancePartitions shuffles by
        (snapshot_id, partition cols) like a plain repartition, then
        SPLITS any leaf bigger than the advisory partition size across
        tasks and coalesces small ones. A plain ``repartition`` funnels
        each leaf through exactly one task, which is precisely wrong for
        ``expire_snapshots``: the fold re-stamps ALL folded history at
        ONE snapshot_id, so an unpartitioned table's entire history —
        potentially ~the whole 100 TB table — would hash to a single
        task (round-9 brief item 8; measured: scripts/expiry_skew_demo.py
        / SCALE.md §11). The cost is that a skewed leaf may hold several
        part files instead of one — readers glob, nothing depends on the
        count. (The pre-round-7 ``coalesce(1)`` was the same single-task
        funnel for EVERY rewrite.) Larger ``target_files`` keeps the
        coalesce knob (an explicit small-scale file-count choice)."""
        if target_files == 1:
            return df.hint(
                "rebalance",
                *["snapshot_id", *self.partition_cols],
            )
        return df.coalesce(target_files)

    # -- ledger ------------------------------------------------------------

    def snapshots(self) -> list[dict]:
        """Reference ``snapshots()`` (pattern_1_2.py:94).

        Checkpointed read path (round-7 verdict item 1): one ``listdir``,
        then the NEWEST ``checkpoint-<sid>.json`` (the consolidated fold
        of every entry ≤ sid) plus each loose entry file — a loose file
        with an id the checkpoint also covers OVERRIDES the checkpoint's
        copy (``vacuum`` mutates old entries in place; the loose file is
        always at least as new as any checkpoint's copy because loose
        files are deleted only at checkpoint time and re-created only by
        a later mutation). Cost: O(checkpoint_every) file opens per call
        regardless of stream age, vs one open per snapshot ever before —
        a month-old 5 s-tick stream pays ~17 opens, not ~500 k.

        Robust against the benign filesystem races a multi-READER
        deployment can hit (writes stay single-writer): a stray
        non-numeric ``.json`` in the ledger dir is skipped, and a file
        deleted by another process's checkpoint cleanup between our
        listdir and open — a covered LOOSE entry or an older CHECKPOINT
        (cleanup deletes both) — triggers a full re-read. Cleanup
        commits its covering checkpoint (atomic rename) BEFORE deleting
        anything, so a fresh listdir is guaranteed to see a checkpoint
        that contains every vanished entry; each retry therefore means
        a WHOLE checkpoint cycle (``checkpoint_every`` commits) landed
        mid-read, which bounds the loop in practice. The final pass
        handles a vanished loose entry by RE-LISTING and rescanning
        (round-11 ADVICE: cleanup may commit its covering checkpoint
        AFTER our listing and delete the loose file before our open —
        skipping would serve the stale pre-override checkpointed copy,
        e.g. missing a re-published ``expired`` flag; the fresh listing
        sees the newer covering checkpoint). Only when that rescan
        budget is ALSO exhausted — seven consecutive race losses, each
        requiring a whole checkpoint cycle to land mid-read — is the
        entry skipped, and the residual staleness is bounded to that
        one entry's flag mutations. A vanished checkpoint still raises —
        a silently incomplete ledger view is never returned (it would
        corrupt ``max_snapshot_id`` and every fence built on it)."""
        for _ in range(3):
            try:
                return self._snapshots_scan(strict=True)
            except FileNotFoundError:
                continue
        return self._snapshots_scan(strict=False)

    def _snapshots_scan(self, strict: bool, relists: int = 3) -> list[dict]:
        names = self.io.list_names(self.ledger_dir)
        ckpt_key, ckpt_name = (-1, -1), None
        loose: list[tuple[int, str]] = []
        for name in names:
            if not name.endswith(".json"):
                continue
            if name.startswith("checkpoint-"):
                key = _ckpt_key(name)
                if key > ckpt_key:
                    ckpt_key, ckpt_name = key, name
            else:
                try:
                    loose.append((int(name[:-len(".json")]), name))
                except ValueError:
                    continue  # stray non-ledger .json: not ours, skip
        by_id: dict[int, dict] = {}
        if ckpt_name is not None:
            # Checkpoint files are write-once by name (a new checkpoint
            # gets a higher sid, or a same-top suffix when a maintenance
            # window re-checkpoints — see _maybe_checkpoint), so the
            # parse is cached per filename —
            # a long-running stream's driver re-parses the (O(age)-sized)
            # checkpoint once per CHECKPOINT, not once per read. Entries
            # are copied out — including the nested ``partitions`` /
            # ``columns`` / ``key_cols`` lists — so a caller's in-place
            # mutation (vacuum/expire set flags before re-committing;
            # any future caller touching the lists) can never alias the
            # cache and silently corrupt every later read.
            cached = getattr(self, "_ckpt_cache", None)
            if cached is None or cached[0] != ckpt_name:
                cached = (
                    ckpt_name,
                    self.io.read_json(
                        os.path.join(self.ledger_dir, ckpt_name)
                    ),
                )
                self._ckpt_cache = cached
            for entry in cached[1]:
                e = dict(entry)
                for k in ("partitions", "columns", "key_cols"):
                    if k in e:
                        e[k] = list(e[k])
                if "column_types" in e:
                    # nested [name, type] pairs — copy BOTH levels, or a
                    # caller's in-place type mutation (expire's widening
                    # re-stamp) aliases the parse cache (the round-9 bug
                    # class, one level deeper)
                    e["column_types"] = [list(ct) for ct in e["column_types"]]
                by_id[e["snapshot_id"]] = e
        for sid, name in loose:
            try:
                # loose overrides checkpoint
                by_id[sid] = self.io.read_json(
                    os.path.join(self.ledger_dir, name)
                )
            except FileNotFoundError:
                # Concurrent checkpoint cleanup deleted the loose file
                # between our listdir and open. strict=True (first
                # attempt): propagate, the caller re-reads and the fresh
                # listing must contain the covering checkpoint.
                # strict=False: re-list and rescan — the covering
                # checkpoint committed AFTER our listing (cleanup
                # commits it before deleting), so a fresh listing sees
                # it; serving this listing's OLDER checkpointed copy
                # could miss a flag mutation the vanished loose file
                # carried (vacuum/expire re-publish entries in place).
                # Budget exhausted (another full checkpoint cycle landed
                # mid-read, per attempt): skip — staleness is bounded to
                # this entry's flags and heals on the next read.
                if strict:
                    raise
                if relists > 0:
                    return self._snapshots_scan(
                        strict=False, relists=relists - 1
                    )
                continue
        return [by_id[sid] for sid in sorted(by_id)]

    def max_snapshot_id(self, snaps: list[dict] | None = None) -> int:
        snaps = self.snapshots() if snaps is None else snaps
        return snaps[-1]["snapshot_id"] if snaps else -1

    def max_insert_snapshot_id(self) -> int:
        """Highest INSERT-kind snapshot id — the ingestion high-water mark.
        Distinct from max_snapshot_id() once tombstones exist: a delete
        commits a snapshot too, and a consumer that fences its *ingest*
        progress on the overall max would skip delete feeds committed
        between its last read and the tombstone (the delete-propagation
        retry hole)."""
        ids = [
            s["snapshot_id"]
            for s in self.snapshots()
            if s.get("kind", "insert") == "insert"
        ]
        return max(ids) if ids else -1

    # -- writes ------------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        batch_id: int | None = None,
        partition_by: list[str] | None = None,
    ) -> int:
        """Append a batch as the next snapshot. The partition directory is
        staged then renamed into place (clobbering any orphan from a crashed
        prior attempt at the same id), and the ledger entry is written AFTER
        the data lands, so readers scoping by ledger never see a
        half-written snapshot. Returns the new snapshot id; -1 if fenced.

        ``partition_by`` sub-partitions the snapshot by payload columns
        (``snapshot_id=N/col=V/...``) so readers filtering on them get
        directory pruning WITHIN each snapshot — the at-rest layout a
        cell-partitioned ANN index or date-keyed log wants."""
        snaps = self.snapshots()
        sid = self.max_snapshot_id(snaps) + 1
        if batch_id is not None:
            for s in snaps:
                if s.get("batch_id") == batch_id:
                    return -1  # fenced: foreachBatch retry of an applied epoch
        staging_root = os.path.join(self.root, ".staging")
        # Single-writer: sweep staging wholesale so orphans from crashed
        # prior attempts (which got a different uuid suffix and would never
        # be clobbered by name) cannot accumulate.
        self.io.delete_tree(staging_root)
        self.io.ensure_dir(staging_root)
        staged = os.path.join(staging_root, f"{sid:09d}.{uuid.uuid4().hex[:8]}")
        # snapshot_id is carried by the hive partition directory name, so the
        # staged files hold only the payload columns.
        cols = partition_by if partition_by is not None else self.partition_cols
        writer = df.write.mode("overwrite")
        if cols:
            writer = writer.partitionBy(*cols)
        writer.parquet(staged)
        # Row count from the freshly written footers (driver-side, metadata
        # only) — no second computation of the batch.
        n = _parquet_row_count(staged)
        # Record the snapshot's partition subdirectories in its ledger
        # entry (one listdir of the freshly staged dir — O(values), paid
        # once at write time): the ledger then doubles as a Delta/Iceberg-
        # style file manifest at directory granularity, so readers can
        # enumerate exact leaf paths for a partition-value-scoped read
        # without EVER listing the table (see table_changes).
        parts = None
        if cols:
            parts = sorted(
                e
                for e in self.io.list_names(staged)
                if "=" in e and not e.startswith((".", "_"))
            )
        final = os.path.join(self.data_dir, f"snapshot_id={sid}")
        # orphan from a crashed append: retry clobbers
        self.io.promote_dir(staged, final)
        entry = {
            "snapshot_id": sid,
            "kind": "insert",
            "batch_id": batch_id,
            "rows": n,
            "columns": list(df.columns),
            # per-snapshot column TYPES (round 11): the ledger records the
            # era's schema, so the union read can detect TYPE evolution
            # (INT→BIGINT widening, DuckLake's second evolution axis) and
            # time travel can serve era-correct types — see table_changes
            "column_types": [
                [f.name, f.dataType.simpleString()] for f in df.schema
            ],
            "committed_at": time.time(),
        }
        if parts is not None:
            entry["partitions"] = parts
        self._commit_ledger(entry)
        return sid

    def _commit_ledger(self, entry: dict) -> None:
        # put_json (last-writer-wins), not put_json_if_absent: vacuum and
        # expire legitimately re-publish an existing id with new flags.
        sid = entry["snapshot_id"]
        self.io.put_json(
            os.path.join(self.ledger_dir, f"{sid:09d}.json"), entry
        )
        self._maybe_checkpoint()

    def _maybe_checkpoint(self) -> None:
        """Fold the ledger into ``checkpoint-<sid>.json`` once enough
        loose entry files accumulate, then delete the loose files and
        older checkpoints the new one covers (Delta-style log cleanup).
        Crash-safe at every window: the checkpoint commits by atomic
        rename BEFORE any deletion, and a loose file that survives a
        crashed cleanup merely duplicates (or, post-vacuum, overrides)
        the checkpoint's copy of the same entry — ``snapshots()``'s
        override rule makes both harmless. A vacuum's in-place rewrite
        of an already-checkpointed entry re-creates its loose file; the
        NEXT checkpoint folds the mutation in and re-deletes it."""
        names = [
            n
            for n in self.io.list_names(self.ledger_dir)
            if n.endswith(".json")
        ]
        loose = [n for n in names if not n.startswith("checkpoint-")]
        if len(loose) < self.checkpoint_every:
            return
        snaps = self.snapshots()
        if not snaps:
            return
        top = snaps[-1]["snapshot_id"]
        # Write-once filenames: a maintenance-only window (re-commits of
        # existing ids, no new snapshot) re-checkpoints at an unchanged
        # top — it must get a FRESH name (same-top suffix), never rewrite
        # an existing file the parse cache (ours or another reader
        # process's) is keyed on.
        prior_k = max(
            (
                _ckpt_key(n)[1]
                for n in names
                if n.startswith("checkpoint-") and _ckpt_key(n)[0] == top
            ),
            default=-1,
        )
        new_name = (
            f"checkpoint-{top:09d}.json"
            if prior_k < 0
            else f"checkpoint-{top:09d}.{prior_k + 1:04d}.json"
        )
        # Checkpoint names are write-once: if-absent is the correct verb
        # (a False means another author already owns this exact name — a
        # violated single-writer contract surfacing cleanly; their
        # cleanup covers the loose files, so just stand down).
        if not self.io.put_json_if_absent(
            os.path.join(self.ledger_dir, new_name), snaps
        ):
            return
        # The writer KNOWS the newest checkpoint's content — refresh the
        # parse cache rather than leaving a stale entry for the next read.
        self._ckpt_cache = (new_name, snaps)
        new_key = _ckpt_key(new_name)
        for n in loose:
            try:
                covered = int(n[: -len(".json")]) <= top
            except ValueError:
                continue  # stray non-ledger .json: not ours to delete
            if covered:
                self.io.delete(os.path.join(self.ledger_dir, n))
        for n in names:
            if n.startswith("checkpoint-") and _ckpt_key(n) < new_key:
                self.io.delete(os.path.join(self.ledger_dir, n))

    def delete(
        self,
        condition,
        key_cols: list[str] | None = None,
        batch_id: int | None = None,
    ) -> int:
        """Commit a DELETE as a tombstone snapshot (the DuckLake
        ``table_changes`` delete surface the reference never exercises,
        plus the right-to-be-forgotten operation a real corpus needs).

        The rows currently visible and matching ``condition`` are reduced
        to their distinct ``key_cols`` values (default: all payload
        columns, i.e. full-row deletion) and committed under
        ``_tombstones/snapshot_id=N`` with the same stage-rename-ledger
        discipline as ``append``. The data log is NOT rewritten — readers
        apply tombstones with a broadcast anti-join; ``vacuum()`` folds
        them in physically. A tombstone kills matching rows from snapshots
        BEFORE it; a later re-insert of the same key survives."""
        snaps = self.snapshots()
        sid = self.max_snapshot_id(snaps) + 1
        if batch_id is not None:
            for s in snaps:
                if s.get("batch_id") == batch_id:
                    return -1  # fenced retry
        matched = self._read_visible(sid - 1, snaps=snaps).filter(condition)
        cols = key_cols or [c for c in matched.columns if c != "snapshot_id"]
        keys = matched.select(*cols).distinct()
        staging_root = os.path.join(self.root, ".staging")
        self.io.delete_tree(staging_root)
        self.io.ensure_dir(staging_root)
        staged = os.path.join(staging_root, f"{sid:09d}.{uuid.uuid4().hex[:8]}")
        keys.write.mode("overwrite").parquet(staged)
        n = _parquet_row_count(staged)
        if n == 0:
            # No visible row matched: committing an EMPTY tombstone dir
            # would poison later reads (Spark may write zero part files,
            # so spark.read.parquet on the dir cannot infer a schema) and
            # even a readable empty dir adds a useless anti-join per read.
            # Commit only the ledger entry (rows=0, no data dir) so the
            # batch-id fence still holds; _tombstones() skips it.
            self.io.delete_tree(staging_root)
            self._commit_ledger(
                {
                    "snapshot_id": sid,
                    "kind": "delete",
                    "batch_id": batch_id,
                    "rows": 0,
                    "key_cols": cols,
                    "committed_at": time.time(),
                }
            )
            return sid
        self.io.ensure_dir(self.tombstone_dir)
        final = os.path.join(self.tombstone_dir, f"snapshot_id={sid}")
        self.io.promote_dir(staged, final)
        self._commit_ledger(
            {
                "snapshot_id": sid,
                "kind": "delete",
                "batch_id": batch_id,
                "rows": n,
                "key_cols": cols,
                "committed_at": time.time(),
            }
        )
        return sid

    # -- reads ---------------------------------------------------------------

    def _empty(self) -> DataFrame:
        return self.spark.createDataFrame([], self.schema_ddl + ", snapshot_id int")

    def read(
        self, partition_values: dict[str, list] | None = None
    ) -> DataFrame:
        """Full-table scan, scoped to committed snapshots, tombstones
        applied. ``partition_values`` scopes the scan to the named leaf
        partitions via the ledger's directory manifest (the ANN probe
        path): only those dirs are ever touched — see
        ``_ledger_paths``."""
        snaps = self.snapshots()
        return self._read_visible(
            self.max_snapshot_id(snaps),
            partition_values=partition_values,
            snaps=snaps,
        )

    def read_as_of(
        self,
        snapshot_id: int,
        partition_values: dict[str, list] | None = None,
    ) -> DataFrame:
        """Time travel: the table as it stood after ``snapshot_id``
        committed (DuckLake reads any snapshot; the reference itself only
        reads latest). Same partition-pruned scan as table_changes —
        snapshots <= the asked version; tombstones committed by then are
        applied, later ones are not (deletes time-travel too). History
        folded away by ``expire_snapshots`` cannot be travelled to —
        that raises rather than silently returning a partial table.
        ``partition_values`` scopes the as-of scan to the named leaf
        partitions exactly like ``read`` (round 12: lets an as-of ANN
        probe keep its probed-cell pruning — the cross-index consistent
        hybrid serve's missing piece).

        The guard honors ``pending_expired_through`` — the marker an
        in-flight expiry commits BEFORE its generation swap — exactly as
        ``table_changes`` does (round-11 ADVICE): in the post-swap /
        pre-stamp crash window the folded snapshot dirs are already
        gone, so a pre-fold time travel would otherwise stat-drop them
        and silently return a PARTIAL table — the unrecoverable failure
        class. The cost is the same deliberate conservatism as the CDF
        guard: after a pre-swap crash (history physically intact) the
        read refuses until the expiry is retried, trading a recoverable
        refusal for closing the silent-partial window."""
        snaps = self.snapshots()
        horizon = max(
            (
                max(
                    s.get("expired_through", -1),
                    s.get("pending_expired_through", -1),
                )
                for s in snaps
            ),
            default=-1,
        )
        if snapshot_id < horizon:
            raise ValueError(
                f"read_as_of({snapshot_id}): history expired through "
                f"snapshot {horizon} (expire_snapshots retention, "
                "committed or in flight — retry an interrupted expiry "
                "to settle the horizon)"
            )
        return self._read_visible(
            snapshot_id, partition_values=partition_values, snaps=snaps
        )

    def _read_visible(
        self,
        as_of: int,
        partition_values: dict[str, list] | None = None,
        snaps: list[dict] | None = None,
    ) -> DataFrame:
        snaps = self.snapshots() if snaps is None else snaps
        df = self.table_changes(
            -1, as_of, partition_values=partition_values, snaps=snaps
        )
        for sid, cols, keys in self._tombstones(as_of, snaps=snaps):
            # A tombstone kills matching rows appended before it. The key
            # set is one delete request's output — broadcast-sized by
            # construction (it was small enough to enumerate).
            cond = F.col("snapshot_id") < F.lit(sid)
            for c in cols:
                cond = cond & df[c].eqNullSafe(keys[c])
            df = df.join(F.broadcast(keys), on=cond, how="left_anti")
        return df

    def _tombstones(
        self, as_of: int, snaps: list[dict] | None = None
    ) -> list[tuple[int, list[str], DataFrame]]:
        """Committed tombstone snapshots ≤ ``as_of`` as
        (snapshot_id, key_cols, keys DataFrame), ledger-scoped. Cheap
        no-tombstone fast path: insert-only tables keep their original
        (partition-pruned, broadcast-free) plans byte-identical."""
        out = []
        for s in self.snapshots() if snaps is None else snaps:
            if s.get("vacuumed"):
                continue  # data already folded into the current generation
            if s.get("rows") == 0 and s.get("kind") == "delete":
                continue  # no-op delete: fence-only ledger entry, no data dir
            if s.get("kind") == "delete" and s["snapshot_id"] <= as_of:
                part = os.path.join(
                    self.tombstone_dir, f"snapshot_id={s['snapshot_id']}"
                )
                out.append(
                    (
                        s["snapshot_id"],
                        s["key_cols"],
                        self.spark.read.parquet(part),
                    )
                )
        return out

    def _ledger_paths(
        self,
        from_snapshot: int,
        to_snapshot: int,
        partition_values: dict[str, list] | None = None,
        snaps: list[dict] | None = None,
    ) -> list[str]:
        """Data paths for INSERT snapshots in (from, to], enumerated from
        the ``_snapshots`` ledger — the ledger-as-manifest read path
        (round-6 verdict item 1). The table's data directory is NEVER
        listed: a read's discovery cost is O(snapshots in range) driver-
        side path constructions + one existence stat each (a stat is a
        metadata lookup, not a directory listing — on a long-running
        stream the old hive discovery listed EVERY ``snapshot_id=N`` dir
        the stream ever committed, per read). Orphan dirs from crashed
        appends are invisible by construction: they are not in the
        ledger, so no path is ever built for them.

        ``partition_values`` (``{col: [v, ...]}``, first-level partition
        column only) narrows each snapshot to the named leaf dirs, using
        the ``partitions`` manifest recorded at append time — the probe
        path of a cell-partitioned ANN index touches O(range × probed
        cells) dirs, never the whole layout. The existence stat also
        drops dirs a vacuum's rewrite pruned empty (their rows were all
        tombstoned), which is the only way a ledger-named dir can be
        legitimately absent."""
        want = None
        col = None
        if partition_values:
            (col, vals), = partition_values.items()
            want = {f"{col}={v}" for v in vals}
        out: list[str] = []
        # ONE generation-pointer read for the whole enumeration: data_dir
        # is a property backed by a GET, and resolving it per snapshot
        # made a full-range read cost O(range) pointer round-trips on an
        # object store (found by the round-12 CountingCommitIO budget
        # probe — ~20-60 ms each on a real store)
        data_dir = self.data_dir
        for s in self.snapshots() if snaps is None else snaps:
            sid = s["snapshot_id"]
            if s.get("kind", "insert") != "insert":
                continue
            if not (from_snapshot < sid <= to_snapshot):
                continue
            if s.get("rows") == 0:
                # A zero-row append may have produced a dir with no
                # parquet part files (just _SUCCESS); enumerating it
                # breaks schema inference when every dir in range is
                # such, and contributes nothing otherwise.
                continue
            if s.get("expired"):
                # folded into a later snapshot's base dir by
                # expire_snapshots — its own dir no longer exists
                continue
            snap_dir = os.path.join(data_dir, f"snapshot_id={sid}")
            parts = s.get("partitions")
            if (
                want is not None
                and parts is not None
                and any(p.split("=", 1)[0] == col for p in parts)
            ):
                # Manifest prune applies only when the requested column
                # IS this snapshot's first-level partition column — for
                # any other column the manifest names tell us nothing
                # and the whole dir must be read (table_changes' explicit
                # value filter guarantees semantics either way).
                cand = [
                    os.path.join(snap_dir, p)
                    for p in parts
                    if p in want
                ]
            else:
                cand = [snap_dir]
            out.extend(p for p in cand if self.io.exists(p))
        return out

    def table_changes(
        self,
        from_snapshot: int,
        to_snapshot: int,
        include_deletes: bool = False,
        partition_values: dict[str, list] | None = None,
        snaps: list[dict] | None = None,
    ) -> DataFrame:
        """Reference ``table_changes(tbl, from, to)`` (pattern_1_2.py:105):
        rows appended in snapshots (from, to]. The scan reads ONLY the
        ledger-enumerated snapshot directories (``basePath`` keeps hive
        partition recovery; see ``_ledger_paths``) — discovery is scoped
        to the queried range instead of listing the whole table, and the
        ``snapshot_id`` partition filter on top keeps the pruned plan
        shape identical. With ``include_deletes=True`` the
        DuckLake-style ``_change_type`` column is added and tombstone key
        rows in range are unioned in (non-key payload columns null, as
        for a key-scoped delete). ``partition_values`` scopes the scan
        to named leaf partitions via the ledger's dir manifest — on BOTH
        sides of the feed: tombstone key rows are filtered on any
        requested partition column that is among their key columns
        (a tombstone keyed without the partition column cannot be
        scoped and is emitted whole).

        Schema evolution: when snapshots in the ledger carry different
        column sets (a later batch appended with new columns), the scan
        merges footer schemas and the result is PROJECTED to the union of
        the columns that existed in the queried range — so a time-travel
        read returns the schema of that era, and pre-evolution rows show
        the later columns as null only when the range spans the change.
        TYPE evolution (round 11, DuckLake's widening axis): a range
        spanning snapshots whose recorded column types differ is read
        era by era and unioned under an explicit cast to the numeric
        least upper bound (INT→BIGINT, float→double, mixed→double);
        a single-era range returns that era's own types untouched.
        Homogeneous tables keep their original single-footer plan.

        ``snaps`` memoizes the ledger: the whole call — path enumeration,
        evolution probe, column projection, tombstone scoping — reads the
        ledger exactly ONCE (one listdir + O(checkpoint_every) opens),
        whether passed in by a caller that already holds it or loaded
        here.

        Expiry guard (mirrors ``read_as_of``): an INCREMENTAL cursor
        (``from_snapshot >= 0``) below the ``expire_snapshots`` horizon
        raises — the fold re-stamped all folded history at the fold id,
        so such a consumer (exactly the reference pattern_1_2.py
        MERGE-on-table_changes loop) would re-receive rows it already
        consumed as "new" changes and silently double-count. A full read
        (``from_snapshot == -1``) is by definition not incremental and
        stays valid at any horizon.

        The guard honors ``pending_expired_through`` — the marker an
        in-flight ``expire_snapshots`` commits BEFORE its generation
        swap — as well as the final stamp, so it is armed across the
        whole expiry, including a crash between the swap (history
        physically folded) and the ``expired_through`` stamp. The cost
        is deliberate conservatism in the mirror window: after a crash
        BEFORE the swap (history still intact) cursors below the marker
        raise until the expiry is retried or abandoned — a full re-read
        is a correct, always-available recovery; a silent double-count
        is not. ``read_as_of`` honors the marker for exactly the same
        asymmetry (round-11 ADVICE): post-swap/pre-stamp its folded
        dirs are already gone and a pre-fold travel would silently
        return a partial table, so it too trades a recoverable pre-swap
        refusal for closing that window."""
        snaps = self.snapshots() if snaps is None else snaps
        if from_snapshot >= 0:
            horizon = max(
                (
                    max(
                        s.get("expired_through", -1),
                        s.get("pending_expired_through", -1),
                    )
                    for s in snaps
                ),
                default=-1,
            )
            if from_snapshot < horizon:
                raise ValueError(
                    f"table_changes(from_snapshot={from_snapshot}): "
                    f"history expired through snapshot {horizon} "
                    "(expire_snapshots retention) — the folded rows were "
                    f"re-stamped at {horizon}, so resuming this cursor "
                    "would double-count them. Re-read the full table "
                    "(from_snapshot=-1) and reset the watermark to "
                    f"{horizon}, or expire with a horizon that never "
                    "crosses a live consumer's cursor."
                )
        paths = (
            []
            if to_snapshot <= from_snapshot or self.max_snapshot_id(snaps) < 0
            else self._ledger_paths(
                from_snapshot, to_snapshot, partition_values, snaps=snaps
            )
        )
        if not paths:
            base = self._empty()
        else:
            col_sets = [
                s.get("columns")
                for s in snaps
                if s.get("kind", "insert") == "insert"
                and not s.get("expired")  # subsumed by the fold entry
            ]
            evolved = (
                all(c is not None for c in col_sets)
                and len({tuple(c) for c in col_sets}) > 1
            )
            # TYPE evolution (round 11): when the queried range spans
            # snapshots whose recorded column TYPES differ (a later era
            # widened INT→BIGINT etc.), footer-merge cannot reconcile the
            # conflict — the range is read ERA BY ERA (one scan per
            # distinct type signature, each a plain single-footer plan
            # over only that era's ledger paths) and unioned with an
            # explicit cast to the per-column least upper bound. A range
            # confined to one era never pays this: it keeps the plain
            # read and returns that era's own types (time travel is
            # era-correct).
            readable = [
                s
                for s in snaps
                if s.get("kind", "insert") == "insert"
                and not s.get("expired")
                and s.get("rows")
                and from_snapshot < s["snapshot_id"] <= to_snapshot
            ]
            known = [s for s in readable if s.get("column_types") is not None]
            unknown = [s for s in readable if s.get("column_types") is None]
            by_sig: dict[tuple, list] = {}
            for s in known:
                sig = tuple(tuple(ct) for ct in s["column_types"])
                by_sig.setdefault(sig, []).append(s)
            col_types: dict[str, set] = {}
            for sig in by_sig:
                for name, t in sig:
                    col_types.setdefault(name, set()).add(t)
            # Pre-round-11 ledger entries carry no column_types. When they
            # coexist with typed entries, each becomes its OWN era whose
            # footer schema contributes to the LUB — lumping them into a
            # plain merged read could fail or silently mis-type a
            # genuinely-divergent legacy file (round-12, ADVICE). A table
            # with no typed entries at all keeps the legacy plain read:
            # there is nothing recorded to widen against.
            unknown_eras: list[DataFrame] = []
            if known and unknown:
                for s in unknown:
                    era_paths = self._ledger_paths(
                        from_snapshot,
                        to_snapshot,
                        partition_values,
                        snaps=[s],
                    )
                    if not era_paths:
                        continue
                    edf = self.spark.read.option(
                        "basePath", self.data_dir
                    ).parquet(*era_paths)
                    for fld in edf.schema.fields:
                        if fld.name != "snapshot_id":
                            col_types.setdefault(fld.name, set()).add(
                                fld.dataType.simpleString()
                            )
                    unknown_eras.append(edf)
            types_differ = any(len(ts) > 1 for ts in col_types.values())
            era_read = types_differ and (len(by_sig) + len(unknown_eras)) > 1
            if era_read:
                # _widen_type raises on a non-numeric conflict — the loud
                # failure an untyped legacy era with incompatible footer
                # types must produce, never a null-producing cast.
                targets = {
                    name: _widen_type(ts) for name, ts in col_types.items()
                }

                def _cast_to_targets(edf: DataFrame) -> DataFrame:
                    sel = []
                    for fld in edf.schema.fields:
                        tgt = targets.get(fld.name)
                        if (
                            tgt is not None
                            and fld.dataType.simpleString() != tgt
                        ):
                            sel.append(
                                F.col(fld.name).cast(tgt).alias(fld.name)
                            )
                        else:
                            sel.append(F.col(fld.name))
                    return edf.select(*sel)

                frames = []
                for members in by_sig.values():
                    era_paths = self._ledger_paths(
                        from_snapshot,
                        to_snapshot,
                        partition_values,
                        snaps=members,
                    )
                    if not era_paths:
                        continue
                    edf = self.spark.read.option(
                        "basePath", self.data_dir
                    ).parquet(*era_paths)
                    frames.append(_cast_to_targets(edf))
                frames.extend(_cast_to_targets(e) for e in unknown_eras)
                if frames:
                    df = frames[0]
                    for f in frames[1:]:
                        df = df.unionByName(f, allowMissingColumns=True)
                else:
                    # every per-era re-enumeration came back empty — a
                    # concurrent expiry/vacuum deleted the dirs between
                    # the initial `paths` enumeration and the per-era
                    # re-stat (round-12, ADVICE): the range is readably
                    # empty now, not an IndexError
                    df = self._empty()
            else:
                reader = self.spark.read.option("basePath", self.data_dir)
                if evolved:
                    reader = reader.option("mergeSchema", "true")
                df = reader.parquet(*paths)
            base = df.filter(
                (F.col("snapshot_id") > from_snapshot)
                & (F.col("snapshot_id") <= to_snapshot)
            )
            if evolved or era_read:
                want: list[str] = []
                for s in snaps:
                    if (
                        s.get("kind", "insert") == "insert"
                        and not s.get("expired")
                        and from_snapshot < s["snapshot_id"] <= to_snapshot
                    ):
                        for c in s["columns"]:
                            if c not in want:
                                want.append(c)
                if want:
                    base = base.select(*want, "snapshot_id")
        if partition_values:
            # Path pruning above is best-effort (a snapshot appended
            # without a partition manifest, or partitioned on a different
            # column, is read whole); this explicit filter is what
            # GUARANTEES the partition_values semantics regardless of
            # which dirs the prune could or couldn't drop.
            for pcol, pvals in partition_values.items():
                base = base.filter(F.col(pcol).isin(list(pvals)))
        if not include_deletes:
            return base
        out = base.withColumn("_change_type", F.lit("insert"))
        payload = [c for c in out.columns if c not in ("_change_type",)]
        for sid, cols, keys in self._tombstones(to_snapshot, snaps=snaps):
            if sid <= from_snapshot:
                continue
            row = keys
            if partition_values:
                # Scope the DELETE side too: without this, tombstone key
                # rows from other partitions leak into a partition-scoped
                # change feed (the insert base above is filtered, the
                # union must match). Only possible when the partition
                # column is among the tombstone's key columns — a
                # tombstone keyed without it genuinely cannot be scoped
                # (its keys say nothing about partition membership), so
                # those rows pass through whole, documented above.
                for pcol, pvals in partition_values.items():
                    if pcol in cols:
                        row = row.filter(F.col(pcol).isin(list(pvals)))
            for c in payload:
                if c == "snapshot_id":
                    row = row.withColumn(c, F.lit(sid).cast("int"))
                elif c not in cols:
                    row = row.withColumn(c, F.lit(None))
            row = row.withColumn("_change_type", F.lit("delete"))
            out = out.unionByName(row.select(*payload, "_change_type"))
        return out

    def delete_changes(self, from_snapshot: int, to_snapshot: int) -> DataFrame:
        """Tombstone key rows committed in snapshots (from, to] — the
        delete side of the change feed, used to scope downstream
        propagation (recompute only the affected groups)."""
        snaps = self.snapshots()
        parts = [
            (sid, keys.withColumn("snapshot_id", F.lit(sid).cast("int")))
            for sid, _, keys in self._tombstones(to_snapshot, snaps=snaps)
            if sid > from_snapshot
        ]
        if not parts:
            # Empty window: return a frame that still carries the union of
            # the table's tombstone key columns (typed from the table
            # schema), so callers selecting key columns (the propagation
            # pattern's `.select("user_id")`) get an empty keyed frame
            # instead of an AnalysisException on a schema with only
            # snapshot_id.
            key_union: list[str] = []
            for s in snaps:
                if s.get("kind") == "delete":
                    for c in s.get("key_cols", []):
                        if c not in key_union:
                            key_union.append(c)
            fields = [
                f
                for f in self.spark.createDataFrame([], self.schema_ddl).schema
                if f.name in key_union
            ]
            ddl = ", ".join(
                [f"{f.name} {f.dataType.simpleString()}" for f in fields]
                + ["snapshot_id int"]
            )
            return self.spark.createDataFrame([], ddl)
        out = parts[0][1]
        for _, keys in parts[1:]:
            out = out.unionByName(keys, allowMissingColumns=True)
        return out

    # -- maintenance -----------------------------------------------------------

    def compact(self, target_files: int = 1) -> None:
        """Reference compaction (``ducklake_merge_adjacent_files``,
        pattern_1_2.py:152-155): rewrite committed data into ``target_files``
        files per snapshot partition in a NEW generation directory, then swap
        the generation pointer. Readers that resolved the old pointer keep a
        live directory (GC is deferred by one generation); the source read is
        ledger-scoped, so orphans from crashed appends are dropped here."""
        ptr = self._pointer()
        snaps = self.snapshots()
        new_gen = ptr["generation"] + 1
        new_name = f"data_g{new_gen:04d}_{uuid.uuid4().hex[:8]}"
        new_dir = os.path.join(self.root, new_name)
        (
            # Insert log only, ledger-scoped: uncommitted orphans do not
            # survive, and tombstones are NOT folded in — compaction
            # preserves CDF history (vacuum() is the physical-delete pass).
            self._rewrite_layout(
                self.table_changes(
                    -1, self.max_snapshot_id(snaps), snaps=snaps
                ),
                target_files,
            )
            .write.mode("overwrite")
            .partitionBy("snapshot_id", *self.partition_cols)
            .parquet(new_dir)
        )
        new_ptr = {"generation": new_gen, "data": new_name, "prev_data": ptr["data"]}
        # atomic generation swap (CAS against the pointer we read)
        self.io.swap_pointer(self._pointer_path, new_ptr, expected=ptr)
        # Deferred GC: drop the generation BEFORE the one we just replaced —
        # in-flight readers of ptr["data"] are still scanning it.
        stale = ptr.get("prev_data")
        if stale and stale != new_name:
            self.io.delete_tree(os.path.join(self.root, stale))

    def expire_snapshots(
        self, through: int | None = None, target_files: int = 1
    ) -> int:
        """Snapshot-history expiry (the DuckLake
        ``ducklake_delete_old_snapshots`` analogue, pattern_1_2.py:152's
        companion maintenance): fold every snapshot ≤ ``through`` into a
        SINGLE base directory ``snapshot_id=<through>`` in a new
        generation, apply (and retire) tombstones ≤ through, and mark
        the folded ledger entries expired. Returns the fold id.

        Why it exists, scale-wise: every read enumerates one path per
        live snapshot, so Spark's file index — not the (checkpointed)
        ledger — is the remaining O(stream-age) read cost on a
        long-running stream (measured: SCALE.md §8). Expiry bounds the
        live path count to O(snapshots since the last expiry): the
        streaming ANN index runs it on an operator cadence and its probe
        construct time goes flat with depth.

        The trade, stated honestly (the same one every lakehouse
        retention policy makes): time travel and CDF granularity BEFORE
        the fold are gone — ``read_as_of(s < through)`` raises, and
        ``table_changes(from < through, ...)`` reports the folded rows
        as one change at ``through``. Current-state reads, later
        tombstones (they only kill rows stamped before them — the fold
        re-stamps survivors AT ``through``, so a tombstone > through
        still kills them, one ≤ through was already applied), the
        batch-id retry fence (entries are kept, only marked), and
        schema evolution (the fold entry's columns become the folded
        era's union) are all preserved. Generation-swap discipline as
        compact()/vacuum(): in-flight readers keep a live directory, a
        crash between any two steps leaves a readable consistent state
        (un-expired entries whose dirs the new generation lacks are
        dropped by the existence stat, exactly like vacuum-pruned
        dirs)."""
        snaps = self.snapshots()
        high = self.max_snapshot_id(snaps)
        insert_ids = [
            s["snapshot_id"]
            for s in snaps
            if s.get("kind", "insert") == "insert" and not s.get("expired")
        ]
        if not insert_ids:
            return -1
        want = high if through is None else through
        # the fold id must be an INSERT snapshot (its data dir hosts the
        # folded rows); clamp to the newest insert at or below `want`
        eligible = [i for i in insert_ids if i <= want]
        if not eligible:
            return -1
        fold_id = max(eligible)
        folded = self._read_visible(fold_id, snaps=snaps).withColumn(
            "snapshot_id", F.lit(fold_id).cast("int")
        )
        tail = self.table_changes(fold_id, high, snaps=snaps)
        newdf = folded.unionByName(tail, allowMissingColumns=True)
        ptr = self._pointer()
        new_gen = ptr["generation"] + 1
        new_name = f"data_g{new_gen:04d}_{uuid.uuid4().hex[:8]}"
        new_dir = os.path.join(self.root, new_name)
        (
            self._rewrite_layout(newdf, target_files)
            .write.mode("overwrite")
            .partitionBy("snapshot_id", *self.partition_cols)
            .parquet(new_dir)
        )
        # (2) refresh the fold entry BEFORE the swap: its manifest must
        # describe the folded dir the moment the new generation goes
        # live (a crash here leaves a union manifest over the old
        # generation — absent leaf dirs are stat-dropped, harmless)
        fold_dir = os.path.join(new_dir, f"snapshot_id={fold_id}")
        fold_entry = next(
            s for s in snaps if s["snapshot_id"] == fold_id
        )
        fold_entry["rows"] = _parquet_row_count(fold_dir)
        fold_entry["columns"] = [
            c for c in folded.columns if c != "snapshot_id"
        ]
        # the rewrite physically normalizes every surviving dir to the
        # union frame's schema — record the fold era's (possibly widened)
        # types so the ledger keeps describing the bytes on disk
        fold_entry["column_types"] = [
            [f.name, f.dataType.simpleString()]
            for f in newdf.schema.fields
            if f.name != "snapshot_id"
        ]
        if self.partition_cols and self.io.exists(fold_dir):
            fold_entry["partitions"] = sorted(
                e
                for e in self.io.list_names(fold_dir)
                if "=" in e and not e.startswith((".", "_"))
            )
        # (2b) pending-expiry marker, committed in the SAME pre-swap
        # ledger write: the table_changes double-count guard honors it
        # (conservatively — see the guard), so a crash in the post-swap /
        # pre-stamp window below can never leave a stale incremental
        # cursor silently re-receiving the re-stamped fold as "new"
        # rows. read_as_of honors it too (round-11 ADVICE): post-swap
        # its folded dirs are gone and a pre-fold travel would silently
        # return a partial table; the pre-swap cost is a recoverable
        # refusal the retry clears by completing.
        fold_entry["pending_expired_through"] = fold_id
        self._commit_ledger(fold_entry)
        # (3) atomic generation swap
        new_ptr = {
            "generation": new_gen,
            "data": new_name,
            "prev_data": ptr["data"],
        }
        # (3) atomic generation swap (CAS against the pointer we read)
        self.io.swap_pointer(self._pointer_path, new_ptr, expected=ptr)
        # (4) stamp the time-travel horizon, mark folded inserts expired,
        # retire consumed tombstones. The expired_through stamp comes
        # AFTER the pointer swap deliberately: before the swap the live
        # generation still holds every folded snapshot intact, and a
        # crash in that window must not leave read_as_of permanently
        # refusing history that is fully readable. Post-swap the history
        # is genuinely gone, and a crash before the stamp lands merely
        # leaves pre-fold read_as_of returning the stat-dropped (empty)
        # dirs until the expiry is retried — the same transient step-4
        # window the expired flags already have. Incremental cursors are
        # NOT exposed to that window: the pending marker from (2b) keeps
        # the table_changes guard armed throughout.
        fold_entry.pop("pending_expired_through", None)
        fold_entry["expired_through"] = fold_id
        self._commit_ledger(fold_entry)
        union_types = {
            f.name: f.dataType.simpleString() for f in newdf.schema.fields
        }
        for s in snaps:
            sid = s["snapshot_id"]
            if (
                s.get("kind", "insert") == "insert"
                and sid < fold_id
                and not s.get("expired")
            ):
                s["expired"] = True
                self._commit_ledger(s)
            elif (
                s.get("kind", "insert") == "insert"
                and sid > fold_id
                and s.get("column_types") is not None
                and any(
                    union_types.get(n, t) != t for n, t in s["column_types"]
                )
            ):
                # the rewrite normalized the tail dirs' physical schema
                # to the union frame's (possibly widened) types — re-stamp
                # the entry's recorded types so era signatures keep
                # matching the bytes on disk
                s["column_types"] = [
                    [n, union_types.get(n, t)] for n, t in s["column_types"]
                ]
                self._commit_ledger(s)
            elif (
                s.get("kind") == "delete"
                and sid <= fold_id
                and not s.get("vacuumed")
            ):
                s["vacuumed"] = True
                self._commit_ledger(s)
                self.io.delete_tree(
                    os.path.join(self.tombstone_dir, f"snapshot_id={sid}")
                )
        # (5) deferred GC, as compact()
        stale = ptr.get("prev_data")
        if stale and stale != new_name:
            self.io.delete_tree(os.path.join(self.root, stale))
        return fold_id

    def vacuum(self, target_files: int = 1) -> None:
        """Physically apply tombstones (Delta ``VACUUM`` + DuckLake
        ``ducklake_delete_old_snapshots`` analogue): rewrite the data into
        a new generation with deleted rows removed, then retire the
        consumed tombstones. After vacuum, reads need no anti-join (the
        fast insert-only path applies again) but the change feed for the
        vacuumed range is truncated to the surviving rows — the documented
        retention trade every lakehouse makes. The same generation-swap
        discipline as compact keeps in-flight readers safe."""
        snaps = self.snapshots()
        high = self.max_snapshot_id(snaps)
        ptr = self._pointer()
        new_gen = ptr["generation"] + 1
        new_name = f"data_g{new_gen:04d}_{uuid.uuid4().hex[:8]}"
        new_dir = os.path.join(self.root, new_name)
        (
            self._rewrite_layout(self._read_visible(high, snaps=snaps), target_files)
            .write.mode("overwrite")
            .partitionBy("snapshot_id", *self.partition_cols)
            .parquet(new_dir)
        )
        new_ptr = {"generation": new_gen, "data": new_name, "prev_data": ptr["data"]}
        # atomic generation swap (CAS against the pointer we read)
        self.io.swap_pointer(self._pointer_path, new_ptr, expected=ptr)
        # Tombstones ≤ high are folded into the new generation: retire
        # them (ledger entries stay — history metadata survives, data
        # files do not, exactly like snapshot expiry).
        for s in snaps:
            if (
                s.get("kind") == "delete"
                and s["snapshot_id"] <= high
                and not s.get("vacuumed")
            ):
                # Flag first, delete second: a crash between the two
                # leaves an orphan tombstone dir that the vacuumed flag
                # already hides (the reverse order would leave a ledger
                # entry pointing at a missing dir — a read-time error).
                s["vacuumed"] = True
                self._commit_ledger(s)
                self.io.delete_tree(
                    os.path.join(
                        self.tombstone_dir, f"snapshot_id={s['snapshot_id']}"
                    )
                )
        stale = ptr.get("prev_data")
        if stale and stale != new_name:
            self.io.delete_tree(os.path.join(self.root, stale))


def _parquet_row_count(directory: str) -> int:
    """Sum of footer row counts for the parquet files under ``directory`` —
    O(files) driver-side metadata reads, never a data scan."""
    import pyarrow.parquet as pq

    total = 0
    for path in glob.glob(
        os.path.join(directory, "**", "*.parquet"), recursive=True
    ):
        total += pq.ParquetFile(path).metadata.num_rows
    return total
