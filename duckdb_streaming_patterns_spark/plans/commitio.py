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


#: Marker key a pointer READER stamps into the bootstrap default it
#: synthesizes when the pointer object is ABSENT. ``swap_pointer`` uses
#: it to pick the right conditional verb: an absence-read ``expected``
#: maps to a conditional CREATE (``If-None-Match: *`` — succeeds only
#: while the pointer is still absent), a value-read ``expected`` maps to
#: ``If-Match`` — which a real store FAILS with 404/412 when the object
#: has meanwhile been deleted. Without the distinction the sim was more
#: permissive than the protocol it claims to enforce: a stale writer
#: racing a pointer delete would install silently (round-12, ADVICE).
#: The marker never reaches disk — writers always install fresh dicts.
READ_ABSENT = "__read_absent__"


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
        """Pointer CAS: install ``obj`` only if the store still holds
        what the writer read. Two conditional verbs, picked by what the
        read observed (see :data:`READ_ABSENT`):

        - ``expected`` read from a STORED pointer → ``If-Match: <etag>``:
          raises :class:`PointerCasError` when the stored value changed
          — or when the object is now ABSENT (a real store answers
          If-Match on a missing object with 404/412; a pointer deleted
          under a stale writer must not be silently re-installed).
        - ``expected`` synthesized from an ABSENT read (carries the
          ``READ_ABSENT`` marker) → conditional CREATE
          (``If-None-Match: *``): succeeds only while the pointer is
          still absent, so a racing first committer loses loudly.
        - ``expected=None`` is an explicit unconditional install
          (callers that own the pointer outright)."""
        with self._lock:
            if expected is not None:
                current = self.try_read_json(path)
                absent_read = (
                    isinstance(expected, dict) and expected.get(READ_ABSENT)
                )
                if absent_read:
                    if current is not None:
                        raise PointerCasError(
                            f"swap_pointer({path}): first-install race — "
                            f"the pointer was absent when read but now "
                            f"holds {current!r} — re-read and re-plan"
                        )
                elif current is None:
                    raise PointerCasError(
                        f"swap_pointer({path}): pointer deleted since it "
                        f"was read (If-Match expected {expected!r}, found "
                        f"absence) — re-read and re-plan"
                    )
                elif current != expected:
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


class CountingCommitIO:
    """Request-counting decorator over any CommitIO backend — makes the
    SCALE.md §10.4 request budget EXECUTABLE (round 12). Every verb call
    is one would-be store request (GET/PUT/LIST/HEAD/DELETE round-trip),
    counted per verb name, so tests can pin the metadata-plane request
    complexity of an operation — "one append is O(1) PUTs", "a
    snapshots() read is 1 LIST + ≤checkpoint_every GETs flat in table
    age" — and catch a change that quietly goes O(depth) on the request
    plane (the ledger-checkpoint test bounds file OPENS, which is only
    the same thing on POSIX).

    ``promote_dir`` / ``delete_tree`` count as ONE verb call each: their
    fan-out (a CopyObject / DELETE per object) is data-plane and
    proportional to batch file count, which the budget accounts
    separately — the metadata budget pins how often the protocol
    reaches for them, not the object count inside.
    """

    def __init__(self, inner) -> None:
        self.inner = inner
        self.counts: dict[str, int] = {}

    def _tick(self, verb: str) -> None:
        self.counts[verb] = self.counts.get(verb, 0) + 1

    # -- bookkeeping -------------------------------------------------------

    def snapshot(self) -> dict[str, int]:
        return dict(self.counts)

    def since(self, before: dict[str, int]) -> dict[str, int]:
        """Per-verb request deltas vs an earlier :meth:`snapshot`."""
        return {
            verb: n - before.get(verb, 0)
            for verb, n in self.counts.items()
            if n - before.get(verb, 0)
        }

    def reset(self) -> None:
        self.counts.clear()

    # -- counted verbs -----------------------------------------------------

    def list_names(self, dir_path: str) -> list[str]:
        self._tick("list_names")
        return self.inner.list_names(dir_path)

    def read_json(self, path: str):
        self._tick("read_json")
        return self.inner.read_json(path)

    def try_read_json(self, path: str):
        # one GET regardless of outcome — a 404 is still a request
        self._tick("try_read_json")
        return self.inner.try_read_json(path)

    def put_json(self, path: str, obj) -> None:
        self._tick("put_json")
        self.inner.put_json(path, obj)

    def put_json_if_absent(self, path: str, obj) -> bool:
        self._tick("put_json_if_absent")
        return self.inner.put_json_if_absent(path, obj)

    def swap_pointer(self, path: str, obj, expected=None) -> None:
        self._tick("swap_pointer")
        self.inner.swap_pointer(path, obj, expected=expected)

    def delete(self, path: str) -> None:
        self._tick("delete")
        self.inner.delete(path)

    def promote_dir(self, staged: str, final: str) -> None:
        self._tick("promote_dir")
        self.inner.promote_dir(staged, final)

    def delete_tree(self, path: str) -> None:
        self._tick("delete_tree")
        self.inner.delete_tree(path)

    def exists(self, path: str) -> bool:
        self._tick("exists")
        return self.inner.exists(path)

    def ensure_dir(self, path: str) -> None:
        # no-op on a real store (§10.2) — counted for completeness
        self._tick("ensure_dir")
        self.inner.ensure_dir(path)


#: Shared default instance — stateless, so one is enough for every table.
POSIX_IO = PosixCommitIO()
