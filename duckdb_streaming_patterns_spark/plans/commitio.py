"""Commit-IO abstraction for the metadata layer (SCALE.md §10).

Everything transactional in this engine — snapshot ledgers, checkpoint
files, fold manifests, generation pointers — commits through the small
interface below, so the *data* plane (parquet written by Spark, which
already speaks any Hadoop filesystem) and the *metadata* plane (tiny
JSON documents whose visibility ordering IS the transaction protocol)
can be ported to object storage independently. The reference makes the
same split: DuckLake keeps its catalog in a metadata database while data
files live wherever (``pattern_1_2.py:138`` ``ATTACH 'ducklake:...'``).

The interface is deliberately minimal — seven verbs, each with an exact
object-store mapping documented on the method. The invariants the
callers rely on (and any backend must honor):

1. **Atomic visibility**: ``put_json`` publishes a complete document or
   nothing — readers never observe a torn write. POSIX: write temp +
   fsync + ``os.replace``. S3/GCS: a single PUT is already atomic.
2. **Write-once fencing**: ``put_json_if_absent`` succeeds for exactly
   one writer per name. POSIX: ``open(O_CREAT|O_EXCL)``. S3: conditional
   PUT with ``If-None-Match: *``; GCS: ``x-goog-if-generation-match: 0``.
3. **Pointer CAS**: ``swap_pointer`` installs a new generation pointer;
   ``expected`` carries the value the writer last read so an
   object-store backend can reject a lost-update race. POSIX ignores it
   (single-writer contract + atomic rename make it redundant); S3 maps
   it to ``If-Match: <etag>`` (the backend would track ETags alongside
   the parsed JSON).
4. **List-after-write consistency**: ``list_names`` sees every name a
   completed ``put_json``/``promote_dir`` published. POSIX: trivially.
   S3/GCS: both are strongly consistent for LIST-after-PUT since 2020,
   so a plain prefix LIST suffices — no manifest indirection needed.
5. **Directory promotion**: ``promote_dir`` makes a staged directory of
   data files live under its final name, clobbering any orphan from a
   crashed prior attempt. POSIX: ``os.replace`` (one rename). Object
   stores have no rename — the port writes each attempt to a UNIQUE
   final prefix (suffix the attempt uuid the stager already generates)
   and records that prefix in the ledger entry / fold manifest, making
   the metadata commit (verb 1/2) the visibility point; orphan prefixes
   from crashed attempts are invisible (never referenced) and swept by
   GC. Readers here never list data directories — they construct paths
   from ledger entries and ``exists``-check them — which is exactly
   what makes the unique-prefix mapping a drop-in.

Single-writer contract, stated explicitly: each table/log root has ONE
writer process at a time (the streaming query's driver). Readers are
unlimited. On POSIX the contract is by deployment convention; on object
storage ``put_json_if_absent`` on the ledger-entry name is the fence
that turns a violated convention into a clean loser (the second writer's
conditional PUT fails) instead of silent corruption.
"""

from __future__ import annotations

import json
import os
import shutil


class PosixCommitIO:
    """The POSIX implementation — semantics identical to the direct
    os/json/shutil calls it replaced (round-9 refactor): every byte
    written, fsync'd, renamed, and deleted exactly as before."""

    # -- small-JSON metadata plane ----------------------------------------

    def list_names(self, dir_path: str) -> list[str]:
        """Names (not paths) under ``dir_path``; [] if it doesn't exist.
        Object store: LIST with prefix ``dir_path + '/'``, delimiter
        ``/`` (strongly consistent on S3/GCS)."""
        try:
            return os.listdir(dir_path)
        except FileNotFoundError:
            return []

    def read_json(self, path: str):
        """Parse one metadata document. FileNotFoundError propagates —
        ``snapshots()``'s race-retry logic depends on seeing it.
        Object store: GET."""
        with open(path) as f:
            return json.load(f)

    def try_read_json(self, path: str):
        """``read_json`` or None if absent (pointer bootstrap reads)."""
        try:
            return self.read_json(path)
        except FileNotFoundError:
            return None

    def put_json(self, path: str, obj) -> None:
        """Atomically publish a complete document at ``path``,
        last-writer-wins (ledger entries are re-published in place when
        vacuum/expire mutate flags). POSIX: temp + fsync + rename in the
        same directory. Object store: PUT (atomic by nature; durability
        is the store's contract, no fsync analogue needed). A failed
        write removes its temp (same hygiene as put_json_if_absent —
        the fixed temp name would self-heal on the next attempt, but
        until then it is litter in a dir other readers list)."""
        d, name = os.path.split(path)
        tmp = os.path.join(d, f".{name}.tmp")
        try:
            with open(tmp, "w") as f:
                json.dump(obj, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        except BaseException:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise

    def put_json_if_absent(self, path: str, obj) -> bool:
        """Publish ``obj`` at ``path`` only if no document exists there;
        returns False (writing nothing) if one does. The write-once
        fence for names that must have exactly one author ever —
        checkpoint files here; ledger entries on a multi-writer object
        store. POSIX: fsync a temp with the FULL content, then
        ``os.link`` it to the final name — link is an atomic
        claim-with-content (fails with FileExistsError if the name is
        taken, and a winner is never observable empty or partial). S3:
        PUT with ``If-None-Match: *`` is the same one-call atomic
        claim+content.

        Backend contract note: this implementation REQUIRES hard-link
        support in the target filesystem (some network/FUSE mounts lack
        it — ``os.link`` raises OSError there). Such mounts are object
        stores in spirit and should get the conditional-PUT backend, not
        this one. The temp is removed on every exit path — including a
        failed write — so a crash mid-dump never leaks ``.{name}.*.tmp``
        litter into the ledger dir for ``list_names`` to trip on. Only
        FileNotFoundError is suppressed on that cleanup (the one benign
        case: the write failed before creating the temp); any other
        unlink failure — e.g. EACCES on a misbehaving mount — DOES leave
        litter, and propagates so the condition is seen, not hidden."""
        d, name = os.path.split(path)
        tmp = os.path.join(d, f".{name}.{os.getpid()}.tmp")
        try:
            with open(tmp, "w") as f:
                json.dump(obj, f)
                f.flush()
                os.fsync(f.fileno())
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
        finally:
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass

    def swap_pointer(self, path: str, obj, expected=None) -> None:
        """Install a new generation pointer. ``expected`` is the pointer
        value the writer last read; POSIX ignores it (atomic rename +
        single-writer), an object-store backend maps it to a
        compare-and-swap (``If-Match: <etag>``) and raises on mismatch
        so a lost-update between two racing maintainers surfaces as an
        error, never as a silently dropped generation."""
        self.put_json(path, obj)

    def delete(self, path: str) -> None:
        """Best-effort single-document delete (checkpoint/loose-entry
        GC — absence is the goal, so a concurrent delete is success).
        Object store: DELETE (idempotent by nature)."""
        try:
            os.remove(path)
        except OSError:
            pass

    # -- data-directory plane ----------------------------------------------

    def promote_dir(self, staged: str, final: str) -> None:
        """Make a staged directory live at ``final``, clobbering any
        orphan from a crashed prior attempt at the same name. POSIX:
        rmtree-if-present + one atomic rename. Object store: no rename
        exists — see module docstring invariant 5 (unique final prefix
        + metadata commit as the visibility point)."""
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(staged, final)

    def delete_tree(self, path: str) -> None:
        """Best-effort recursive delete (staging sweeps, deferred
        generation GC, retired tombstone dirs). Object store: batched
        DELETE over the prefix listing."""
        shutil.rmtree(path, ignore_errors=True)

    def exists(self, path: str) -> bool:
        """Existence stat — a metadata lookup, never a listing. Object
        store: HEAD on the object, or a zero-key LIST on the prefix for
        directories (the _ledger_paths probe)."""
        return os.path.exists(path)

    def ensure_dir(self, path: str) -> None:
        """mkdir -p. Object store: no-op (prefixes need no creation)."""
        os.makedirs(path, exist_ok=True)


#: Shared default instance — stateless, so one is enough for every table.
POSIX_IO = PosixCommitIO()
