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

from ..plans.commitio import POSIX_IO, PosixCommitIO, READ_ABSENT


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


def overlap(*thunks):
    """Run INDEPENDENT driver-side actions concurrently and return their
    results in argument order. A micro-batch loop often serializes
    actions that share no data dependency (state-log merge chains,
    end-of-batch appends of already-evaluated frames, a verdict-log
    append beside a fenced summary merge) — each a small Spark job
    dominated by job-launch latency, so serializing them multiplies
    that cost. Only pass thunks whose ORDER carries no crash-contract
    meaning (fenced merges and idempotent per-batch-dir appends
    qualify: a retry resolves identically whichever subset landed). A
    thunk's exception propagates, failing the batch exactly like the
    sequential form.

    Threads are ``pyspark.InheritableThread``, not a bare pool: they
    inherit the caller's JVM-local properties — the streaming query's
    job group and scheduler pool, so cancelling the query interrupts
    the child jobs too — and in py4j pinned-thread mode they clean up
    their JVM thread on exit instead of leaking one per call on an
    unbounded stream. The LAST thunk runs on the calling thread (it
    would only idle in join() otherwise), so the common 2-thunk case
    spawns exactly one thread per call. Under Spark Connect the active
    session is threaded through as InheritableThread's required
    ``session``.

    When SEVERAL thunks fail, the first (by argument order) is raised
    and every other failure is attached to it as an exception note with
    its full traceback — in a crash-retry investigation the suppressed
    concurrent failure is often the informative one, and silently
    dropping it costs a repro cycle."""
    if not thunks:
        return []
    if len(thunks) == 1:
        return [thunks[0]()]
    try:
        from pyspark import InheritableThread as _Thread
        from pyspark.sql import SparkSession

        _kw = {"session": SparkSession.getActiveSession()}
    except ImportError:  # pragma: no cover - ancient pyspark
        from threading import Thread as _Thread

        _kw = {}

    results: list = [None] * len(thunks)
    errors: list = [None] * len(thunks)  # slot per thunk: argument order

    def _runner(i, fn):
        def run():
            try:
                results[i] = fn()
            except BaseException as e:  # propagate to the caller below
                errors[i] = e

        return run

    threads = [
        _Thread(target=_runner(i, fn), daemon=True, **_kw)
        for i, fn in enumerate(thunks[:-1])
    ]
    for t in threads:
        t.start()
    _runner(len(thunks) - 1, thunks[-1])()
    for t in threads:
        t.join()
    failed = [e for e in errors if e is not None]
    if failed:
        import traceback as _tb

        primary = failed[0]
        for other in failed[1:]:
            # Attach, don't swallow: the note carries the other thunk's
            # full traceback into the raised exception's rendering.
            primary.add_note(
                "overlap(): a concurrent thunk ALSO failed:\n"
                + "".join(_tb.format_exception(other)).rstrip()
            )
        raise primary
    return results


def maintain_all(
    logs, before_batch: int | None = None, fanout: int = 8
) -> int:
    """Run tiered ``maintain()`` over INDEPENDENT state logs
    concurrently; returns total merges performed. A maintenance tick in
    the dedup patterns touches 3-4 logs, each merge a small blocking
    Spark job whose cost is dominated by job-launch latency, not data —
    run sequentially the tick pays (logs × merges-per-log) job launches
    end to end; the logs own disjoint directory trees and Spark
    schedules concurrently-submitted jobs fine, so the tick's wall cost
    is the one log with the longest carry chain (merges WITHIN a log
    stay sequential — carry propagation is inherently ordered). At
    cluster scale the same holds: state-log maintenance for independent
    tiers should overlap, not queue."""
    logs = [l for l in logs if l is not None]
    return sum(
        overlap(
            *[
                (
                    lambda l=l: l.maintain(
                        before_batch=before_batch, fanout=fanout
                    )
                )
                for l in logs
            ]
        )
        if logs
        else []
    )


def append_all(writes, batch_id: int) -> None:
    """Append ``(log, df)`` pairs to INDEPENDENT logs concurrently. A
    micro-batch of the dedup patterns ends with 2-4 state appends whose
    inputs are already evaluated (localCheckpoint'ed upstream), so each
    append is a small write job dominated by job-launch latency;
    sequential appends pay that latency per log. The logs own disjoint
    batch dirs, every append is idempotent on its own dir
    (mode=overwrite), and the crash contract is unchanged: a retry sees
    the pre-batch state regardless of WHICH subset of the appends
    landed, because all state reads are before_batch-scoped — the
    sequential order never carried meaning, only cost."""
    writes = list(writes)
    if writes:
        overlap(
            *[
                (lambda log=log, df=df: log.append(df, batch_id))
                for log, df in writes
            ]
        )


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

    ``insert_only=True`` declares that a key is written AT MOST ONCE
    across the whole log (retries overwriting their own batch dir aside —
    those rewrite the same keys bit-identically). Under that contract
    last-writer-wins is a no-op, so ``read_latest`` skips the
    row_number window entirely and returns a PLAIN SCAN of base + deltas
    — no Exchange, no per-read shuffle of the accumulated state. This is
    the difference between O(batch-dirs listed) and O(total state
    shuffled) per micro-batch for the continuous-ingestion dedup
    patterns, whose seen/bands/docs/verdict state is insert-only by
    construction (keys are content hashes / doc ids, each first-written
    exactly once). Keep the default (LWW window) for logs whose keys
    re-emit, e.g. update-mode streaming output.

    ``bucket_col`` hash-partitions every batch directory by
    ``pmod(xxhash64(bucket_col), n_buckets)`` (hive partition ``__kb``),
    so point-lookup-ish reads (``read_latest(buckets=[...])``) become
    partition-PRUNED scans: broadcast joins don't prune I/O, but a
    partition filter does — the candidate-verify fetch of the streaming
    near-dup pattern reads only the buckets its candidates live in
    instead of the whole accumulated corpus. Size n_buckets so one
    bucket ≈ a few files at the target state size (at 100 TB of state:
    tens of thousands of buckets; the default 16 fits the test SFs).

    Concurrency contract, stated explicitly (it differs from
    SnapshotTable's): reads, appends, and maintenance on ONE log are
    serialized by the owning driver (foreachBatch runs them in
    sequence; ``maintain_all``/``append_all`` overlap only ACROSS
    logs). EXTERNAL processes reading a log that is concurrently
    maintained can transiently fail: ``maintain``/``compact`` GC their
    folded source dirs in place, so a reader that file-listed before
    the fold can hit missing files mid-scan — unlike SnapshotTable,
    whose generation swap keeps a live directory for in-flight
    readers. The failure is clean (fold manifests commit BEFORE any
    delete, so a re-read resolves; dead dirs that survive a crashed GC
    are excluded by the manifest's dead-id filter, never double-read)
    — the same retry discipline as ``snapshots()``. A deployment that
    needs lock-free external readers sets ``deferred_gc=True`` (round
    11): folds PARK their dead sources for one maintenance cycle —
    results are already correct with dead dirs present, only the
    deletes raced — and the next call's sweep collects them; a reader
    thread across a fold is green under the flag
    (tests/test_streaming_patterns.py deferred-gc tests).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        keys: list[str],
        insert_only: bool = False,
        bucket_col: str | None = None,
        n_buckets: int = 16,
        partition_col: str | None = None,
        io=None,
        deferred_gc: bool | None = None,
    ):
        """``partition_col`` hive-partitions every batch dir by that RAW
        column's values (vs ``bucket_col``'s hashed ``__kb``) — for
        naturally low-cardinality layout keys like an IVF cell id, where
        reads pruned to a value subset should touch only those
        directories. Mutually exclusive with ``bucket_col``.

        ``io`` is the CommitIO backend (default POSIX) — fold-manifest
        reads/commits, merged-dir promotion, and GC deletes all go
        through it (the object-store port seam, SCALE.md §10).

        ``deferred_gc`` (round 11): park folded source dirs for ONE
        maintenance cycle instead of deleting them at the end of the
        fold that killed them — the next maintain()/compact() call's
        dead-dir sweep collects them. The dirs are logically dead the
        moment the fold manifest commits (read_latest filters their
        ids), so correctness is unchanged; what the flag buys is
        EXTERNAL-reader friendliness: a concurrent reader that listed
        the log before the fold can still finish scanning those dirs,
        the same grace SnapshotTable's generation swap gives its
        readers (README concurrency contract).

        Default (round 12): ``None`` resolves by BACKEND — ``False`` on
        the POSIX backend (single-process deployments where in-place GC
        is reader-safe by the deployment contract and promptest),
        ``True`` on any other CommitIO (object-store semantics: promote
        is a non-atomic multi-object copy and cross-process readers are
        the norm, so in-place fold GC can transiently fail an external
        reader — the race the round-11 sim backend exposed must be
        impossible to recreate by default). Pass an explicit bool to
        override either way."""
        if bucket_col is not None and partition_col is not None:
            raise ValueError("bucket_col and partition_col are exclusive")
        self.spark = spark
        self.root = root
        self.keys = keys
        self.insert_only = insert_only
        self.bucket_col = bucket_col
        self.n_buckets = n_buckets
        self.partition_col = partition_col
        self.io = io if io is not None else POSIX_IO
        # backend-resolved default: reader-safe by construction on any
        # non-POSIX CommitIO (see docstring); wrappers around POSIX get
        # the conservative True too — deferred GC is always CORRECT,
        # prompt GC is the POSIX-only optimization
        self.deferred_gc = (
            deferred_gc
            if deferred_gc is not None
            else not isinstance(self.io, PosixCommitIO)
        )
        self.io.ensure_dir(root)

    @property
    def _layout_col(self) -> str | None:
        """The hive partition column of each batch dir, whichever flavor."""
        return "__kb" if self.bucket_col is not None else self.partition_col

    def bucket_of(self, col) -> "F.Column":
        """The partition-bucket expression for a key value — usable on any
        frame carrying the key (e.g. a candidate list, to compute which
        buckets a pruned read must touch)."""
        return F.pmod(F.xxhash64(col), F.lit(self.n_buckets)).cast("int")

    def append(self, batch: DataFrame, batch_id: int) -> None:
        # Laid-out logs repartition the batch BY the layout column before
        # the partitioned write: without it every write task emits one
        # file into every value directory (tasks × values tiny files per
        # batch — at 10x stress the state read spent more time listing
        # footers than computing). The extra Exchange is O(batch) — the
        # LSM trade's cheap side — and each value dir gets ONE file.
        if self.bucket_col is not None:
            df = batch.withColumn("__kb", self.bucket_of(F.col(self.bucket_col)))
            writer = (
                df.repartition(F.col("__kb"))
                .write.mode("overwrite")
                .partitionBy("__kb")
            )
        elif self.partition_col is not None:
            writer = (
                batch.repartition(F.col(self.partition_col))
                .write.mode("overwrite")
                .partitionBy(self.partition_col)
            )
        else:
            writer = batch.write.mode("overwrite")
        writer.parquet(os.path.join(self.root, f"__batch_id={batch_id}"))

    def _batch_dirs(self) -> list[str]:
        """Full paths of every ``__batch_id=N`` dir, from ONE listing of
        the log root through the CommitIO backend (the only place the
        root is ever listed)."""
        return [
            os.path.join(self.root, n)
            for n in self.io.list_names(self.root)
            if n.startswith("__batch_id=")
        ]

    def _sweep_temp_dirs(self) -> None:
        """Remove orphaned ``.maintain_*`` / ``.compact_*`` temp dirs left
        by a crash after the merged output was written but before its
        rename. Dot-prefixed dirs are invisible to readers, so the sweep
        is purely hygienic — but without it crash debris accumulates
        unbounded on a long-running stream (each crashed attempt gets a
        fresh uuid suffix, so nothing ever clobbers it). Single-writer
        discipline makes the wholesale sweep safe: no other maintenance
        can be mid-flight when this one starts.

        Also swept (round 11): MANIFEST-LESS negative-id dirs — on a
        copy-based object-store backend a promote that crashed mid-copy
        leaves a partial merged dir without its (strictly-last-ordered)
        ``_folds.json``; readers already treat it as invisible, and its
        sources are all still live, so deleting it is a pure retry
        cleanup (the re-run merges the same sources again)."""
        for n in self.io.list_names(self.root):
            if n.startswith((".maintain_", ".compact_")):
                self.io.delete_tree(os.path.join(self.root, n))
            elif n.startswith("__batch_id=-") and not self.io.exists(
                os.path.join(self.root, n, "_folds.json")
            ):
                self.io.delete_tree(os.path.join(self.root, n))

    def read_latest(
        self,
        before_batch: int | None = None,
        buckets: list[int] | None = None,
        keep_bucket: bool = False,
    ) -> DataFrame:
        """Resolved state. ``before_batch`` scopes the read to batches
        strictly below that id — what a foreachBatch RETRY of batch N
        must read: resolving against the full log would include batch N's
        own (pre-crash) rows, change the recomputation, and let the
        idempotent overwrite of ``__batch_id=N`` diverge from what the
        first attempt wrote.

        ``buckets`` (requires a layout column) restricts the scan to
        those partition values — a real I/O prune (PartitionFilters in
        the plan), not just a post-scan filter: ints for ``bucket_col``'s
        ``__kb``, raw column values for ``partition_col``. ``keep_bucket``
        retains the synthetic ``__kb`` column in the result: join it equi
        on ``__kb`` (derived via ``bucket_of`` on the other side) under a
        broadcast join and Spark inserts a DYNAMIC partition-pruning
        subquery on the scan — the lazy, no-extra-action form of the same
        prune (the streaming near-dup verify fetch uses this). A
        ``partition_col`` is real payload (hive partition discovery
        restores it) and is ALWAYS retained; ``keep_bucket`` is a no-op
        for those logs.

        Insert-only logs return the plain scan (each key exists once by
        contract — nothing to resolve); otherwise one window computes
        last-writer-wins, which shuffles the scanned state on every call
        — the price of re-emitting keys."""
        # One manifest scan serves the uncommitted-dir prune, the
        # dead-dir prune, the straddle guard, and the LWW rank map below
        # — each open is a small-file round trip (3× listing+GET latency
        # per micro-batch read on object storage if scanned per
        # consumer). It runs BEFORE the Spark file listing on purpose
        # (round 11): a merged dir's COMMIT POINT is its manifest, which
        # a copy-based object-store promote orders strictly LAST — so a
        # manifest seen here guarantees the later listing sees that
        # dir's data complete, and a manifest NOT seen here means the
        # dir's sources are all still live and whatever partial data the
        # listing picks up is excluded by the whitelist filter below.
        # (Listing first inverts the guarantee: a manifest landing
        # between the two reads kills the sources while the listing only
        # saw the partial merge — an empty/short read.)
        #
        # Discovery is MANIFEST-DRIVEN (round 13): merged dirs enter the
        # scan as the explicit file lists their fold manifests recorded,
        # so read-time listing touches only the RAW dirs (bounded by the
        # maintenance cadence) — the live_dirs × buckets listing term
        # that grew with stream age is gone. basePath keeps hive
        # partition discovery (__batch_id + the layout column) intact.
        all_dirs = self._batch_dirs()
        manifests = self._read_fold_manifests(dirs=all_dirs)
        scan = self._scan_paths(manifests, all_dirs)
        if scan:
            log = self.spark.read.option("basePath", self.root).parquet(
                *scan
            )
        else:
            # empty log: preserve the legacy error shape of reading the
            # bare root (callers treat it as "no state yet")
            log = self.spark.read.parquet(self.root)
        # Negative-id (merged) dirs are visible ONLY through their
        # manifest: in-flight or aborted promotes (possible on object
        # stores; POSIX's atomic rename never exposes one) read as
        # absent, and their sources stay live — never a duplicate, never
        # a partial merge. Aborted leftovers are swept by the next
        # maintenance call.
        neg_ok = F.col("__batch_id") >= 0
        if manifests:
            neg_ok = neg_ok | F.col("__batch_id").isin(list(manifests))
        log = log.filter(neg_ok)
        dead = self._dead_batch_ids(manifests)
        if dead:
            # source dirs a surviving folded base already covers (compact
            # crashed mid-GC): logically dead — a partition filter, so
            # the prune is free and the insert-only read stays scan-shaped
            log = log.filter(~F.col("__batch_id").isin(dead))
        if before_batch is not None:
            # Straddle guard: a merged dir is admitted by its (synthetic,
            # below-all-raw) dir id, so if any LIVE fold's raw-id span
            # reaches past the scope boundary, rows from batches >=
            # before_batch would silently leak into a retry's state read.
            # Every in-repo loop runs maintain(before_batch=b) before
            # appending batch b, so live spans never straddle — this
            # asserts that invariant instead of trusting it.
            dead_set = set(dead)
            for did, (lo, hi, _io) in self._fold_ranges(manifests).items():
                if did in dead_set:
                    continue
                if did < before_batch and hi >= before_batch:
                    raise RuntimeError(
                        f"read_latest(before_batch={before_batch}): merged "
                        f"dir __batch_id={did} folds raw batches "
                        f"[{lo}, {hi}], which straddles the scope boundary "
                        "— rows from fenced batches would leak. Maintain "
                        "with before_batch <= the smallest id you will "
                        "later scope to."
                    )
            log = log.filter(F.col("__batch_id") < before_batch)
        if buckets is not None:
            if self._layout_col is None:
                raise ValueError("buckets= requires bucket_col/partition_col")
            # __kb buckets are ints by construction; partition_col values
            # are raw payload values of whatever type the column has (a
            # string layout key must not be int()-coerced)
            vals = (
                [int(b) for b in buckets]
                if self.bucket_col is not None
                else list(buckets)
            )
            log = log.filter(F.col(self._layout_col).isin(vals))
        # only the SYNTHETIC __kb is dropped by default; a partition_col
        # is real user payload (restored by hive partition discovery) and
        # is always retained — keep_bucket only governs __kb
        drop_cols = ["__batch_id"] + (
            ["__kb"] if self.bucket_col is not None and not keep_bucket else []
        )
        if self.insert_only:
            return log.drop(*drop_cols)
        from pyspark.sql import Window as W

        # Last-writer-wins order: a raw dir's rank is its batch id; a
        # MERGED dir (adjacent-range maintain) ranks as the HIGHEST raw
        # id of its recorded range — the rows inside it are already the
        # within-range winners, so ranking the dir at its range top makes
        # the cross-dir resolve identical to resolving over the raw dirs
        # (ranges are contiguous and disjoint by the adjacency rule). The
        # mapping is driver-side and bounded by the LIVE dir count
        # (O(fanout · log B) under tiering), folded into the plan as a
        # literal map — no extra scan, no join.
        order_col = F.col("__batch_id")
        ranges = self._fold_orders(manifests)
        if ranges:
            m = F.create_map(
                *[
                    x
                    for did, hi in sorted(ranges.items())
                    for x in (F.lit(did), F.lit(hi))
                ]
            )
            order_col = F.coalesce(
                m[F.col("__batch_id")], F.col("__batch_id")
            )
        w = W.partitionBy(*self.keys).orderBy(order_col.desc())
        return (
            log.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", *drop_cols)
        )

    def _read_fold_manifests(
        self, dirs: list[str] | None = None
    ) -> dict[int, dict]:
        """dir id → parsed ``_folds.json`` for every live merged dir —
        THE single driver-side glob+open pass over fold manifests.
        ``_dead_batch_ids`` / ``_fold_ranges`` / ``_fold_orders`` all
        derive from it; callers with several questions per read (e.g.
        ``read_latest``, ``maintain``'s per-iteration planning) scan once
        and pass the result through. ``dirs`` reuses a caller's existing
        ``_batch_dirs()`` listing (one LIST saved per call)."""
        out: dict[int, dict] = {}
        for d in self._batch_dirs() if dirs is None else dirs:
            try:
                m = self.io.try_read_json(os.path.join(d, "_folds.json"))
                if m is not None:
                    out[int(d.rsplit("=", 1)[1])] = m
            except (OSError, ValueError):
                continue
        return out

    def _fold_orders(
        self, manifests: dict[int, dict] | None = None
    ) -> dict[int, int]:
        """dir id → effective LWW rank (the ``range`` top of its fold
        manifest) for every live merged dir. Empty for logs that were
        never maintained (the common case keeps the plain ``__batch_id``
        ordering and an unchanged plan). Insert-only-written manifests
        are excluded: their span is a bounding box over non-adjacent
        sources, not an LWW ordering."""
        return {
            did: hi
            for did, (lo, hi, io) in self._fold_ranges(manifests).items()
            if not io
        }

    def _fold_ranges(
        self, manifests: dict[int, dict] | None = None
    ) -> dict[int, tuple[int, int, bool]]:
        """dir id → (lo, hi, written_by_insert_only_log) for every
        merged dir carrying a ``range`` manifest; shared by LWW ranking
        (``_fold_orders``) and the ``before_batch`` straddle guard in
        ``read_latest``."""
        if manifests is None:
            manifests = self._read_fold_manifests()
        out: dict[int, tuple[int, int, bool]] = {}
        for did, m in manifests.items():
            rng = m.get("range")
            if rng:
                out[did] = (
                    int(rng[0]),
                    int(rng[1]),
                    bool(m.get("insert_only")),
                )
        return out

    def _dead_batch_ids(
        self, manifests: dict[int, dict] | None = None
    ) -> list[int]:
        """Batch ids logically folded into a SURVIVING base (its
        ``_folds.json``) — their source dirs are dead even if a crashed
        compact's GC left them on disk. The set is bounded by the last
        fold's width, since a deleted base takes its manifest with it."""
        if manifests is None:
            manifests = self._read_fold_manifests()
        dead: set[int] = set()
        for m in manifests.values():
            dead.update(int(b) for b in m.get("folded", []))
        return sorted(dead)

    def compact(
        self, before_batch: int | None = None, transform=None
    ) -> None:
        """LSM-style maintenance: fold the log into one base batch
        directory so the read-side last-writer-wins window scans O(keys)
        rows again instead of O(batches × touched keys).

        ``transform`` (optional, DataFrame → DataFrame) rewrites the
        resolved rows before the folded write — the re-quantization hook:
        streaming SemDeDup re-assigns every state vector's ``cell_id``
        against a new epoch's codebook during the fold, so a
        re-partition of the whole state costs exactly one (already
        amortized) compaction instead of a separate pass. With a
        transform the fold runs even over a single directory (the
        re-assignment is the point, not the dir count); the transform
        must preserve the layout column's name.

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
          every crash window still resolves to the same state.
        - For INSERT-ONLY logs the outranking argument does not apply —
          the scan-shaped read has no last-writer-wins resolve, so
          base + a surviving not-yet-deleted source dir would DUPLICATE
          that dir's rows. The base therefore carries a ``_folds.json``
          manifest (written inside the temp, so it commits atomically
          with the base's rename) listing the folded source batch ids;
          ``read_latest`` partition-FILTERS those ids out whenever their
          dirs still exist. The base rename is the single commit point:
          before it, readers see only the sources; after it, the sources
          are logically dead no matter how far the GC got. (Spark
          ignores underscore-prefixed files, so the manifest never
          pollutes the scan.)"""
        self._sweep_temp_dirs()
        # collect dirs a prior fold already killed (crash-window debris,
        # or deferred_gc's parked sources from the previous cycle) so
        # they are neither re-folded nor left to accumulate — the same
        # sweep maintain() opens with. One listing + one manifest pass
        # serves the sweep, the fold candidate set, AND the base's
        # manifest write (the round-12 request-plane discipline).
        all_dirs = self._batch_dirs()
        manifests = self._read_fold_manifests(dirs=all_dirs)
        dead = set(self._dead_batch_ids(manifests))
        for d in all_dirs:
            if int(d.rsplit("=", 1)[1]) in dead:
                self.io.delete_tree(d)
        dirs = sorted(
            (d for d in all_dirs if int(d.rsplit("=", 1)[1]) not in dead),
            key=lambda d: int(d.rsplit("=", 1)[1]),
        )
        if before_batch is not None:
            dirs = [
                d for d in dirs if int(d.rsplit("=", 1)[1]) < before_batch
            ]
        if len(dirs) <= (0 if transform is not None else 1):
            return
        base_id = int(dirs[0].rsplit("=", 1)[1]) - 1
        tmp = os.path.join(self.root, f".compact_{uuid.uuid4().hex[:8]}")
        # the folded base must keep the hive layout or every later
        # partition-pruned read degrades to a full scan of the base
        if self.bucket_col is not None:
            folded = self.read_latest(before_batch=before_batch)
            if transform is not None:
                folded = transform(folded)
            (
                folded.withColumn("__kb", self.bucket_of(F.col(self.bucket_col)))
                .repartition(F.col("__kb"))
                .write.mode("overwrite")
                .partitionBy("__kb")
                .parquet(tmp)
            )
        elif self.partition_col is not None:
            folded = self.read_latest(
                before_batch=before_batch, keep_bucket=True
            )
            if transform is not None:
                folded = transform(folded)
            (
                folded.repartition(F.col(self.partition_col))
                .write.mode("overwrite")
                .partitionBy(self.partition_col)
                .parquet(tmp)
            )
        else:
            folded = self.read_latest(before_batch=before_batch)
            if transform is not None:
                folded = transform(folded)
            folded.write.mode("overwrite").parquet(tmp)
        # the fold manifest commits ATOMICALLY with the base's rename —
        # after the rename the source dirs are logically dead whether or
        # not the GC below finishes (see the crash-safety invariants)
        self._write_manifest(tmp, dirs, manifests)
        base_dir = os.path.join(self.root, f"__batch_id={base_id}")
        self.io.promote_dir(tmp, base_dir)
        if not self.deferred_gc:
            for d in dirs:
                self.io.delete_tree(d)
        self._prune_manifest(base_dir)

    def _manifest_of(self, d: str, manifests: dict[int, dict] | None):
        """One dir's parsed fold manifest: from the caller's
        ``_read_fold_manifests`` pass when provided (the request-plane
        fast path — maintain() reads every manifest ONCE per iteration,
        round 12), else one GET. None for raw batch dirs."""
        did = int(d.rsplit("=", 1)[1])
        if manifests is not None:
            return manifests.get(did)
        try:
            return self.io.try_read_json(os.path.join(d, "_folds.json"))
        except (OSError, ValueError):
            return None

    def _dir_weight(
        self, d: str, manifests: dict[int, dict] | None = None
    ) -> int:
        """How many RAW batch directories a dir represents: 1 for an
        engine-written batch dir, the recorded constituent count for a
        folded dir (its manifest's ``weight``). The tiered ``maintain``
        scheme merges dirs of equal weight-tier, so the weight must
        survive folds — without it a huge folded base would sit at tier 0
        and get rewritten by every small merge, which is exactly the
        write amplification the tiers exist to avoid."""
        m = self._manifest_of(d, manifests)
        if m is None:
            return 1
        return int(m.get("weight", len(m.get("folded", [])) or 1))

    def _dir_range(
        self, d: str, manifests: dict[int, dict] | None = None
    ) -> tuple[int, int]:
        """The contiguous RAW batch-id range a dir represents: (id, id)
        for an engine-written batch dir, the recorded ``range`` for a
        merged dir. The range is the adjacency metadata of the LWW
        maintain scheme — merges are only legal between dirs whose ranges
        are consecutive in the global order, and a merged dir's LWW rank
        is its range top."""
        did = int(d.rsplit("=", 1)[1])
        m = self._manifest_of(d, manifests)
        rng = m.get("range") if m is not None else None
        if rng:
            return (int(rng[0]), int(rng[1]))
        return (did, did)

    def _write_manifest(
        self, tmp: str, dirs: list, manifests: dict[int, dict] | None = None
    ) -> None:
        """Fold manifest for a merged/base dir written into its temp dir
        (commits atomically with the rename): ``folded`` lists the source
        dir ids TRANSITIVELY (each source's own dead list is unioned in,
        so a crashed earlier GC's leftover dirs stay dead even after the
        manifest that covered them is itself folded away), ``weight``
        records the raw-batch count for the tiering policy, and ``range``
        records the merged dirs' contiguous raw-id span — the LWW
        ordering + adjacency metadata (raw sources with non-negative ids
        only: a legacy full-fold base folds everything, so its sub-zero
        placement already orders correctly)."""
        folded: set[int] = set()
        weight = 0
        lo = hi = None
        for d in dirs:
            did = int(d.rsplit("=", 1)[1])
            folded.add(did)
            # ONE manifest lookup per source dir serves weight, range,
            # and the transitive death list (was three separate GETs —
            # round-12 request-plane fix)
            m = self._manifest_of(d, manifests)
            if m is None:
                weight += 1
                dlo = dhi = did
            else:
                weight += int(m.get("weight", len(m.get("folded", [])) or 1))
                rng = m.get("range")
                dlo, dhi = (
                    (int(rng[0]), int(rng[1])) if rng else (did, did)
                )
                folded.update(int(b) for b in m.get("folded", []))
            if dhi >= 0:  # skip legacy range-less negative bases
                lo = dlo if lo is None else min(lo, dlo)
                hi = dhi if hi is None else max(hi, dhi)
        manifest: dict = {"folded": sorted(folded), "weight": weight}
        # Record the merged dir's own DATA FILE list (relative paths):
        # readers can then add this dir to a scan with ZERO list calls —
        # the term that otherwise grows with stream age (round-12 verdict
        # finding #2: the maintained BM25 serve's live_dirs × n_buckets
        # LISTs). Enumerated here, at fold time, where the listing cost
        # is paid once and amortized over every later read.
        manifest["files"] = self._data_files_rel(tmp)
        if lo is not None:
            # For LWW logs this span is CONTIGUOUS (the adjacency rule in
            # maintain()) and drives read-side ranking; for insert-only
            # logs it is only a BOUNDING span of the folded raw ids (the
            # F-oldest policy merges non-adjacent dirs) — the flag below
            # tells _fold_orders to ignore it for ranking, so reopening
            # the same root with insert_only=False cannot mis-rank LWW
            # resolution on spans that never were contiguous (ADVICE r7).
            # Both flavors keep the span for the before_batch straddle
            # guard in read_latest.
            manifest["range"] = [lo, hi]
        if self.insert_only:
            manifest["insert_only"] = True
        self.io.put_json(os.path.join(tmp, "_folds.json"), manifest)

    def _data_files_rel(self, d: str) -> list[str]:
        """Relative paths of every data file under a (possibly one-level
        hive-partitioned) merged dir — one LIST per layout subdir, paid
        at FOLD time so the manifest hands readers the complete file set
        and read-time discovery never lists the dir again."""
        lcol = self._layout_col
        out: list[str] = []
        for n in self.io.list_names(d):
            # layout check FIRST: the synthetic bucket column "__kb"
            # itself starts with an underscore, so the metadata skip
            # below would otherwise swallow every hive subdir
            if lcol is not None and n.startswith(f"{lcol}="):
                for f in self.io.list_names(os.path.join(d, n)):
                    if not f.startswith(("_", ".")) and not f.endswith(
                        ".crc"
                    ):
                        out.append(f"{n}/{f}")
            elif n.startswith(("_", ".")) or n.endswith(".crc"):
                continue
            else:
                out.append(n)
        return sorted(out)

    def _scan_paths(
        self, manifests: dict[int, dict], dirs: list[str]
    ) -> list[str]:
        """Explicit scan roots for read_latest: merged dirs whose
        manifest records its file list contribute FILE paths (zero LISTs
        at read time), raw dirs and legacy manifests contribute their
        dir path (one bounded listing each — raw dir count is capped by
        the maintenance cadence, so the read-time listing term is FLAT
        in stream age instead of O(live_dirs × buckets)). Dead dirs and
        manifest-less negative dirs (in-flight/aborted promotes) are
        pruned here, at enumeration — the same visibility rules the
        filter path enforces."""
        dead = set(self._dead_batch_ids(manifests))
        paths: list[str] = []
        for d in dirs:
            did = int(d.rsplit("=", 1)[1])
            if did in dead:
                continue
            if did < 0:
                m = manifests.get(did)
                if m is None:
                    continue
                files = m.get("files")
                if files:
                    paths.extend(os.path.join(d, f) for f in files)
                else:
                    paths.append(d)
            else:
                paths.append(d)
        return paths

    def _prune_manifest(self, dir_path: str) -> None:
        """After a fold's GC completed, shrink the manifest's death list
        to ids whose dirs still exist on disk (normally none — a clean GC
        leaves an empty list). Without the prune the TRANSITIVE death
        lists grow with every fold — O(total batches ever) ids per
        manifest on a long-running stream, a driver-side JSON and an
        ``isin`` filter that both scale with stream age instead of with
        crash debris. Atomic replace; a crash before it just leaves the
        fat (still-correct) list for the next fold to prune. ``weight``
        is preserved — it is the tiering metadata, not a death list."""
        mf = os.path.join(dir_path, "_folds.json")
        try:
            m = self.io.try_read_json(mf)
            if m is None:
                return
            alive = [
                b
                for b in m.get("folded", [])
                if self.io.exists(
                    os.path.join(self.root, f"__batch_id={int(b)}")
                )
            ]
            if alive == m.get("folded", []):
                return
            m["folded"] = alive
            self.io.put_json(mf, m)
        except (OSError, ValueError):
            pass

    def maintain(
        self, before_batch: int | None = None, fanout: int = 8
    ) -> int:
        """Size-TIERED log maintenance for insert-only logs — the
        bounded-write-amplification replacement for calling ``compact()``
        on a cadence. Returns the number of merges performed.

        ``compact()`` folds the ENTIRE log into one base; invoked every K
        micro-batches it rewrites all accumulated state each time — over
        B batches that is Σ state(Ki) = O(B²/K) batch-writes, a
        quadratically-amplified write path no 100 TB stream survives
        (the whole corpus rewritten every K batches, forever). maintain()
        is the classic LSM size-tiered scheme instead, as an F-ary carry
        counter: every dir carries a WEIGHT (raw batch dirs = 1, merged
        dirs = sum of constituents, recorded in the fold manifest); a
        tier is floor(log_F weight); whenever a tier holds ≥ F live
        dirs, the F OLDEST merge into one dir of the next tier, and the
        loop re-checks until no tier is full (carry propagation). Each
        row is rewritten once per tier it climbs — O(log_F B) total
        writes per row instead of O(B/K) full-log rewrites — and the
        live dir count stays ≤ (F-1)·(log_F B + 1), so the read side's
        file listing stays bounded too.

        For INSERT-ONLY logs set-union semantics make merging an
        arbitrary dir subset order-free; the manifest death-list
        machinery (``_dead_batch_ids`` already unions every dir's
        manifest) gives the same single-commit-point crash story as
        compact(): merged output is fully written to a dot-temp
        (invisible), renamed into place (sources now logically dead via
        the manifest, transitively), then sources are GC'd — any crash
        window resolves identically. Leftover dead dirs from a crashed
        GC are swept at the start of each call (they are covered by a
        surviving manifest by construction, and sweeping them keeps
        them out of the merge candidate set — merging an already-folded
        dir would duplicate its rows).

        ``before_batch`` scopes eligibility exactly like compact(): only
        checkpoint-committed dirs (id strictly below) participate, so an
        in-loop call composes with foreachBatch retries the same way —
        the current batch's dir is never touched. A retried MAINTENANCE
        batch re-runs maintain() itself; that is safe: merges are
        deterministic given the dir set, and a re-run either finds the
        tier already collapsed (no-op) or completes a crashed merge's
        GC via the dead-dir sweep.

        LAST-WRITER-WINS logs are maintained too, with one extra rule:
        merges are restricted to dirs whose raw-id ranges are ADJACENT —
        consecutive in the range-sorted order of all live dirs, so the
        merged span [lo, hi] contains no id held by any surviving dir.
        Within that span LWW is resolved AT MERGE TIME (the winner per
        key by effective rank) and the manifest records the span; the
        read side then ranks the merged dir at its span top, which makes
        the cross-dir resolve provably identical to resolving over the
        raw dirs — exactly how ordered LSM runs handle upserts, and the
        adjacency precedent of the reference's own
        ``ducklake_merge_adjacent_files`` (pattern_1_2.py:154). A
        same-tier pair separated by a heavier dir is simply not merged
        (the carry stays pending until the gap dir joins the tier) —
        order preservation over merge eagerness."""
        if fanout < 2:
            # fanout 1 makes the tier loop (fanout**t <= w) non-terminating
            raise ValueError(f"maintain() fanout must be >= 2, got {fanout}")
        self._sweep_temp_dirs()
        # finish any crashed GC: dirs covered by a surviving manifest are
        # logically dead — delete them so the candidate set is live-only
        dead = set(self._dead_batch_ids())
        for d in self._batch_dirs():
            if int(d.rsplit("=", 1)[1]) in dead:
                self.io.delete_tree(d)
        merges = 0
        while True:
            # ONE manifest pass per iteration feeds the dead filter, the
            # weight tiering, the LWW adjacency sort, and the merged
            # dir's manifest write — each used to pay its own O(dirs)
            # GETs, ~4x the request count on an object store (round-12
            # CountingCommitIO finding)
            all_dirs = self._batch_dirs()
            manifests = self._read_fold_manifests(dirs=all_dirs)
            dead = set(self._dead_batch_ids(manifests))
            live = [
                d for d in all_dirs if int(d.rsplit("=", 1)[1]) not in dead
            ]
            if before_batch is not None:
                live = [
                    d
                    for d in live
                    if int(d.rsplit("=", 1)[1]) < before_batch
                ]
            tier_of: dict[str, int] = {}
            tiers: dict[int, list] = {}
            for d in live:
                w = self._dir_weight(d, manifests)
                t = 0
                while fanout**(t + 1) <= w:
                    t += 1
                tier_of[d] = t
                tiers.setdefault(t, []).append(d)
            full = sorted(t for t, ds in tiers.items() if len(ds) >= fanout)
            if not full:
                return merges
            ds: list | None = None
            if self.insert_only:
                # set-union semantics: any subset merges — collapse the
                # lowest full tier, F OLDEST dirs (deterministic, keeps
                # newest raw batches cheap to retry-overwrite)
                t = min(full)
                ds = sorted(
                    tiers[t], key=lambda d: int(d.rsplit("=", 1)[1])
                )[:fanout]
            else:
                # LWW: only an ADJACENT run of same-tier dirs may merge.
                # Scan the range-sorted live list for the first run of
                # >= fanout consecutive dirs in the lowest full tier
                # that has one; excluded newer batches (before_batch)
                # are a suffix in this order, so they never split a run.
                ordered = sorted(
                    live, key=lambda d: self._dir_range(d, manifests)[0]
                )
                for t in full:
                    run: list = []
                    for d in ordered:
                        if tier_of[d] == t:
                            run.append(d)
                            if len(run) == fanout:
                                ds = run
                                break
                        else:
                            run = []
                    if ds:
                        break
                if ds is None:
                    return merges  # full tiers exist but none adjacent
            merged_id = (
                min(int(d.rsplit("=", 1)[1]) for d in all_dirs) - 1
            )
            tmp = os.path.join(self.root, f".maintain_{uuid.uuid4().hex[:8]}")
            ids = [int(d.rsplit("=", 1)[1]) for d in ds]
            src = self.spark.read.parquet(self.root).filter(
                F.col("__batch_id").isin(ids)
            )
            if not self.insert_only:
                # resolve LWW within the merged span now, by each source
                # dir's effective rank (range top), so the merged dir
                # holds exactly the span winners
                from pyspark.sql import Window as W

                rank = {
                    did: self._dir_range(d, manifests)[1]
                    for did, d in zip(ids, ds)
                }
                m = F.create_map(
                    *[
                        x
                        for did in sorted(ids)
                        for x in (F.lit(did), F.lit(rank[did]))
                    ]
                )
                w = W.partitionBy(*self.keys).orderBy(
                    F.coalesce(
                        m[F.col("__batch_id")], F.col("__batch_id")
                    ).desc()
                )
                src = (
                    src.withColumn("__rn", F.row_number().over(w))
                    .filter(F.col("__rn") == 1)
                    .drop("__rn")
                )
            self._write_folded_dir(src.drop("__batch_id"), tmp)
            self._write_manifest(tmp, ds, manifests)
            new_dir = os.path.join(self.root, f"__batch_id={merged_id}")
            self.io.promote_dir(tmp, new_dir)
            # deferred_gc parks the sources instead: logically dead via
            # the manifest, excluded from the candidate set by the
            # per-iteration dead filter, collected by the NEXT call's
            # dead-dir sweep
            if not self.deferred_gc:
                for d in ds:
                    self.io.delete_tree(d)
            self._prune_manifest(new_dir)
            merges += 1

    def _write_folded_dir(self, df: DataFrame, tmp: str) -> None:
        """Write resolved/merged rows to ``tmp`` preserving the log's
        hive layout (one file per layout value — see append())."""
        if self.bucket_col is not None:
            # merged sources already carry __kb as a (restored) column
            cols = df.columns
            if "__kb" not in cols:
                df = df.withColumn(
                    "__kb", self.bucket_of(F.col(self.bucket_col))
                )
            (
                df.repartition(F.col("__kb"))
                .write.mode("overwrite")
                .partitionBy("__kb")
                .parquet(tmp)
            )
        elif self.partition_col is not None:
            (
                df.repartition(F.col(self.partition_col))
                .write.mode("overwrite")
                .partitionBy(self.partition_col)
                .parquet(tmp)
            )
        else:
            df.write.mode("overwrite").parquet(tmp)


class SummaryTable:
    """Parquet-backed mutable summary table with atomic swap + batch fencing.

    Layout: ``<root>/data_vNNN/`` parquet dirs; ``<root>/_meta.json`` points
    at the current version and records the last applied batch id. Readers
    resolve the pointer then read an immutable directory — no torn reads
    (SURVEY §7 hard-part 2). A re-delivered foreachBatch epoch is skipped by
    the fence (hard-part 1: idempotent upserts keyed by batch id).
    """

    def __init__(self, spark: SparkSession, root: str, schema_ddl: str, io=None):
        self.spark = spark
        self.root = root
        self.schema_ddl = schema_ddl
        self.io = io if io is not None else POSIX_IO
        self.io.ensure_dir(root)

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.root, "_meta.json")

    def _meta(self) -> dict:
        meta = self.io.try_read_json(self._meta_path)
        # READ_ABSENT marks the bootstrap as synthesized-from-absence so
        # swap_pointer's CAS maps it to a conditional CREATE, not an
        # If-Match against a value that was never stored (commitio)
        return meta if meta is not None else {
            "version": -1, "last_batch_id": -1, "data": None,
            READ_ABSENT: True,
        }

    def read(self) -> DataFrame:
        meta = self._meta()
        if meta["data"] is None:
            return self.spark.createDataFrame([], self.schema_ddl)
        return self.spark.read.parquet(os.path.join(self.root, meta["data"]))

    def last_batch_id(self) -> int:
        return self._meta()["last_batch_id"]

    def read_prev(self) -> DataFrame:
        """The PREVIOUS version's contents — what a foreachBatch retry
        must read when its own batch already committed (last_batch_id ==
        its batch id): the atomic swap keeps exactly one prior version
        on disk until the next overwrite (GC is deferred by one
        version), and foreachBatch is sequential, so for the newest
        batch the previous version IS the pre-batch state. Empty frame
        with the table schema when no previous version exists (a retry
        of the very first batch)."""
        meta = self._meta()
        prev = meta.get("prev_data")
        if prev is None:
            return self.spark.createDataFrame([], self.schema_ddl)
        return self.spark.read.parquet(os.path.join(self.root, prev))

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
        # atomic pointer swap (CAS against the meta we read)
        self.io.swap_pointer(self._meta_path, new_meta, expected=meta)
        stale = meta.get("prev_data")
        if stale and stale != data_dir:
            self.io.delete_tree(os.path.join(self.root, stale))

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
