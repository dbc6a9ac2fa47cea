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
import threading


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


class PointerCasError(RuntimeError):
    """swap_pointer lost a compare-and-swap race: the pointer on the
    store no longer matches the value the writer read. The loser must
    re-read the pointer and re-plan — never retry blind (SCALE.md
    §10.2: a 412 on the conditional PUT means a concurrent maintainer
    won)."""


class ObjectStoreSimIO:
    """Object-store-SEMANTICS CommitIO backend over a local directory —
    the executable form of the SCALE.md §10 port spec. It restricts
    itself to the verbs an S3/GCS client has and enforces their
    semantics, so every ledger/fold/checkpoint/expiry code path that
    passes the contract tests on this backend is exercising exactly the
    protocol the real ``S3CommitIO`` would run:

    - **No rename, no hard links, ever.** ``promote_dir`` COPIES each
      staged object to the final prefix (the ``CopyObject`` mapping) and
      deletes the staged prefix; ``put_json_if_absent`` is a conditional
      PUT, not an ``os.link`` claim. (``os.replace`` appears below ONLY
      as the local stand-in for the store's atomic whole-object PUT
      visibility — a reader sees the old or the new complete document,
      never a torn one, which is precisely what a single PUT gives. No
      object is ever moved between names with it.)
    - **Write-once fence** = conditional PUT (``If-None-Match: *`` /
      ``x-goog-if-generation-match: 0``): exactly one writer per name
      succeeds; the loser writes nothing. The store's server-side
      check-and-commit atomicity is simulated with a process-wide lock —
      the sim models one store endpoint per process, which covers the
      single-writer deployment contract plus the reader/maintainer
      threads the tests spawn.
    - **Pointer CAS** (``If-Match: <etag>`` / generation match): a
      mismatch raises :class:`PointerCasError` instead of silently
      dropping a generation. ``expected`` carries the pointer VALUE the
      writer last read (absent reads come back as their bootstrap
      default, which never equals a stored document, so a racing first
      committer is caught too).
    - **LIST + GET reads**: ``list_names`` never shows the PUT
      simulation's in-flight temps (a real store has no temps at all —
      dot-prefixed names are reserved to the backend); ``exists`` is a
      HEAD-shaped stat.

    The multi-object ``promote_dir`` copy is not atomic — and does not
    need to be: readers never list data directories, they construct
    paths from ledger entries / fold manifests committed AFTER the
    promote returns (§10.3 — the metadata commit is the visibility
    point; an interrupted copy is an unreferenced orphan prefix swept by
    the next promote to the same name or by GC). The real port gets the
    same guarantee cheaper with unique final prefixes; the copy form is
    the drop-in that keeps deterministic path construction.
    """

    def __init__(self) -> None:
        # the "server side" of conditional operations: one endpoint per
        # process, serializing check-and-commit pairs
        self._lock = threading.Lock()

    # -- small-JSON metadata plane ----------------------------------------

    def list_names(self, dir_path: str) -> list[str]:
        """LIST with prefix: every completed PUT under the prefix, no
        in-flight temps (dot-names are backend-reserved)."""
        try:
            return [
                n for n in os.listdir(dir_path) if not n.startswith(".")
            ]
        except FileNotFoundError:
            return []

    def read_json(self, path: str):
        """GET (404 propagates as FileNotFoundError)."""
        with open(path) as f:
            return json.load(f)

    def try_read_json(self, path: str):
        try:
            return self.read_json(path)
        except FileNotFoundError:
            return None

    def _atomic_put(self, path: str, obj) -> None:
        """Atomic whole-object PUT: the document becomes visible
        complete or not at all. Locally simulated with a reserved
        dot-temp + one ``os.replace`` — the stand-in for the store's
        PUT atomicity, not a semantic rename (see class docstring)."""
        d, name = os.path.split(path)
        tmp = os.path.join(d, f".{name}.{os.getpid()}.put")
        try:
            with open(tmp, "w") as f:
                json.dump(obj, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, path)
        except BaseException:
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass
            raise

    def put_json(self, path: str, obj) -> None:
        """Unconditional PUT, last-writer-wins."""
        self._atomic_put(path, obj)

    def put_json_if_absent(self, path: str, obj) -> bool:
        """Conditional PUT (``If-None-Match: *``): claims name + content
        in one atomic step; returns False (writing NOTHING) when the
        name is taken. The lock is the store's server-side atomicity."""
        with self._lock:
            if os.path.exists(path):
                return False
            self._atomic_put(path, obj)
            return True

    def swap_pointer(self, path: str, obj, expected=None) -> None:
        """Pointer CAS (``If-Match: <etag>``): install ``obj`` only if
        the stored pointer still equals ``expected`` (the value the
        writer read; its bootstrap default when it read absence).
        Raises :class:`PointerCasError` on mismatch — the lost-update
        race between two maintainers surfaces as an error, never as a
        silently dropped generation. ``expected=None`` is an explicit
        unconditional install (callers that own the pointer outright)."""
        with self._lock:
            if expected is not None:
                current = self.try_read_json(path)
                if current is not None and current != expected:
                    raise PointerCasError(
                        f"swap_pointer({path}): pointer changed since it "
                        f"was read (CAS expected {expected!r}, found "
                        f"{current!r}) — re-read and re-plan"
                    )
            self._atomic_put(path, obj)

    def delete(self, path: str) -> None:
        """DELETE — idempotent, absence is the goal."""
        try:
            os.remove(path)
        except OSError:
            pass

    # -- data-directory plane ----------------------------------------------

    def promote_dir(self, staged: str, final: str) -> None:
        """Make a staged prefix live under ``final`` with object-store
        verbs only: delete any orphan at the final prefix (a crashed
        prior attempt — unreferenced, hence invisible), then COPY each
        staged object to the final prefix (``CopyObject``: GET+PUT
        server-side, one object at a time, each atomic), then delete the
        staged prefix. Never a rename.

        Copy ORDER is part of the contract (round 11 — found by the
        deferred-GC concurrent-reader test, the §10.3 atomicity nuance
        made executable): data objects first, underscore-prefixed
        metadata next, ``_folds.json`` strictly LAST. A multi-object
        copy is not atomic, so the manifest — the single object whose
        appearance readers treat as the merged dir's COMMIT POINT
        (UpsertLog ignores manifest-less merged dirs) — must become
        visible only after every data object it describes. POSIX's
        atomic rename got this for free; a copy-based backend must
        order."""
        if os.path.exists(final):
            shutil.rmtree(final)
        data: list[tuple[str, str]] = []
        meta: list[tuple[str, str]] = []
        manifest: list[tuple[str, str]] = []
        for root, _dirs, files in os.walk(staged):
            rel = os.path.relpath(root, staged)
            dest = final if rel == "." else os.path.join(final, rel)
            os.makedirs(dest, exist_ok=True)
            for name in files:
                pair = (os.path.join(root, name), os.path.join(dest, name))
                if name == "_folds.json":
                    manifest.append(pair)
                elif name.startswith(("_", ".")):
                    meta.append(pair)
                else:
                    data.append(pair)
        for src, dst in data + meta + manifest:
            # each object lands atomically (a real CopyObject is): local
            # stand-in = copy to a reserved dot-temp beside the target,
            # then one replace — a concurrent lister never sees a torn
            # object, only present-or-absent
            d, name = os.path.split(dst)
            tmp = os.path.join(d, f".{name}.{os.getpid()}.put")
            try:
                shutil.copyfile(src, tmp)
                os.replace(tmp, dst)
            except BaseException:
                try:
                    os.remove(tmp)
                except FileNotFoundError:
                    pass
                raise
        shutil.rmtree(staged, ignore_errors=True)

    def delete_tree(self, path: str) -> None:
        """Paged LIST + batched DELETE over the prefix."""
        shutil.rmtree(path, ignore_errors=True)

    def exists(self, path: str) -> bool:
        """HEAD on the object / zero-key LIST on the prefix."""
        return os.path.exists(path)

    def ensure_dir(self, path: str) -> None:
        """No-op on a real store (prefixes need no creation); locally the
        directory must exist for the simulation's files to land."""
        os.makedirs(path, exist_ok=True)


#: Shared default instance — stateless, so one is enough for every table.
POSIX_IO = PosixCommitIO()
