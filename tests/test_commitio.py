"""CommitIO backend-contract tests (plans/commitio.py, SCALE.md §10) — no
Spark session needed; these pin the invariants any backend port must
honor and each implementation's crash hygiene. Parametrized over BOTH
backends (round-11): the POSIX one and the object-store-semantics
simulation, so the §10 contract is executed, not just specified."""

from __future__ import annotations

import json
import os

import pytest

from duckdb_streaming_patterns_spark.plans.commitio import (
    ObjectStoreSimIO,
    PointerCasError,
    PosixCommitIO,
    READ_ABSENT,
)


@pytest.fixture(params=["posix", "objstore"])
def io(request):
    return (
        PosixCommitIO() if request.param == "posix" else ObjectStoreSimIO()
    )


def test_put_json_atomic_and_readable(io, tmp_path):
    p = str(tmp_path / "doc.json")
    io.put_json(p, {"a": 1})
    assert io.read_json(p) == {"a": 1}
    io.put_json(p, {"a": 2})  # last-writer-wins republish
    assert io.read_json(p) == {"a": 2}
    assert io.try_read_json(str(tmp_path / "absent.json")) is None
    assert os.listdir(tmp_path) == ["doc.json"]  # no temp litter


def test_put_json_if_absent_is_write_once(io, tmp_path):
    p = str(tmp_path / "ckpt.json")
    assert io.put_json_if_absent(p, {"winner": 1}) is True
    assert io.put_json_if_absent(p, {"winner": 2}) is False
    assert io.read_json(p) == {"winner": 1}  # loser wrote nothing
    assert os.listdir(tmp_path) == ["ckpt.json"]


def test_put_json_if_absent_cleans_temp_on_failed_write(io, tmp_path):
    """Round-10 (ADVICE): a write that dies mid-dump must not leak its
    .{name}.{pid}.tmp into the dir — ledger listings would trip on the
    litter and the write-once name would stay claimable."""
    p = str(tmp_path / "ckpt.json")

    class Unserializable:
        pass

    with pytest.raises(TypeError):
        io.put_json_if_absent(p, {"bad": Unserializable()})
    assert os.listdir(tmp_path) == []  # no temp, no target
    # the name is still claimable by a healthy retry
    assert io.put_json_if_absent(p, {"ok": 1}) is True
    assert io.read_json(p) == {"ok": 1}


def test_put_json_cleans_temp_on_failed_write(io, tmp_path):
    p = str(tmp_path / "doc.json")

    with pytest.raises(TypeError):
        io.put_json(p, {"bad": object()})
    assert os.listdir(tmp_path) == []  # no temp litter, no torn target
    io.put_json(p, {"ok": 1})
    assert io.read_json(p) == {"ok": 1}


def test_list_names_and_exists(io, tmp_path):
    assert io.list_names(str(tmp_path / "nope")) == []
    io.ensure_dir(str(tmp_path / "d"))
    io.put_json(str(tmp_path / "d" / "x.json"), 1)
    assert io.list_names(str(tmp_path / "d")) == ["x.json"]
    assert io.exists(str(tmp_path / "d" / "x.json"))
    io.delete(str(tmp_path / "d" / "x.json"))
    io.delete(str(tmp_path / "d" / "x.json"))  # idempotent
    assert not io.exists(str(tmp_path / "d" / "x.json"))


def test_promote_dir_clobbers_orphan(io, tmp_path):
    staged = tmp_path / "staged"
    final = tmp_path / "final"
    for d, content in ((staged, "new"), (final, "orphan")):
        os.makedirs(d)
        (d / "part.txt").write_text(content)
    io.promote_dir(str(staged), str(final))
    assert (final / "part.txt").read_text() == "new"
    assert not staged.exists()
    io.delete_tree(str(final))
    io.delete_tree(str(final))  # idempotent
    assert not final.exists()


def test_swap_pointer_roundtrip(io, tmp_path):
    p = str(tmp_path / "ptr.json")
    io.swap_pointer(p, {"generation": 1}, expected=None)
    io.swap_pointer(p, {"generation": 2}, expected={"generation": 1})
    assert io.read_json(p) == {"generation": 2}


def test_objstore_swap_pointer_cas_rejects_lost_update(tmp_path):
    """The object-store backend enforces the §10.2 CAS: a maintainer
    whose read of the pointer went stale (a concurrent maintainer won)
    raises instead of silently dropping the winner's generation. An
    absence-read bootstrap (READ_ABSENT marker) maps to a conditional
    CREATE, so a first-install race is caught the same way."""
    io = ObjectStoreSimIO()
    p = str(tmp_path / "ptr.json")
    bootstrap = {
        "generation": 0, "data": "data", "prev_data": None,
        READ_ABSENT: True,
    }
    # writer A: read absence (bootstrap), install gen 1 — fine
    io.swap_pointer(p, {"generation": 1, "data": "g1"}, expected=bootstrap)
    # writer B: ALSO read absence before A won — must lose loudly
    with pytest.raises(PointerCasError, match="re-read"):
        io.swap_pointer(
            p, {"generation": 1, "data": "g1b"}, expected=bootstrap
        )
    # writer C: read gen 1, swaps to gen 2 — fine; stale D then loses
    cur = io.read_json(p)
    io.swap_pointer(p, {"generation": 2, "data": "g2"}, expected=cur)
    with pytest.raises(PointerCasError):
        io.swap_pointer(p, {"generation": 2, "data": "g2d"}, expected=cur)
    assert io.read_json(p)["data"] == "g2"


def test_objstore_swap_pointer_if_match_fails_on_deleted_pointer(tmp_path):
    """Round-12 (ADVICE): If-Match against a MISSING object is a 404/412
    on a real store — a stale writer racing a pointer delete must not
    silently re-install. Only an absence-read expected (the READ_ABSENT
    bootstrap) may install over absence."""
    io = ObjectStoreSimIO()
    p = str(tmp_path / "ptr.json")
    io.put_json(p, {"generation": 3, "data": "g3"})
    cur = io.read_json(p)  # a value-read: no marker
    io.delete(p)  # pointer deleted under the writer
    with pytest.raises(PointerCasError, match="deleted"):
        io.swap_pointer(p, {"generation": 4, "data": "g4"}, expected=cur)
    assert io.try_read_json(p) is None  # loser wrote nothing
    # a fresh absence-read CAN claim the now-absent name
    io.swap_pointer(
        p,
        {"generation": 1, "data": "fresh"},
        expected={"generation": 0, "data": "data", READ_ABSENT: True},
    )
    assert io.read_json(p)["data"] == "fresh"


def test_objstore_never_renames_or_links(tmp_path, monkeypatch):
    """The simulation's contract verbs use object-store primitives only:
    promote_dir copies object by object (CopyObject), never moves the
    staged tree or any directory; the write-once fence is a conditional
    PUT, never a hard link. os.replace IS allowed — but only as the
    per-object atomic-PUT stand-in: every call must install a single
    FILE from a reserved dot-temp beside it, never a directory and
    never anything from the staged prefix (asserted on each call), and
    the manifest must be the last object to land (round 11: the merged
    dir's commit point)."""
    io = ObjectStoreSimIO()
    staged = tmp_path / "staged"
    os.makedirs(staged / "sub")
    (staged / "part-0.parquet").write_text("a")
    (staged / "sub" / "part-1.parquet").write_text("b")
    (staged / "_folds.json").write_text('{"folded": []}')

    def forbid(*a, **k):  # any rename/move/link = contract breach
        raise AssertionError("rename/link used by object-store backend")

    landed: list = []
    real_replace = os.replace

    def put_only(src, dst):
        assert str(src).rsplit("/", 1)[-1].startswith("."), (
            "replace src must be a reserved dot-temp, got " + str(src)
        )
        assert not str(src).startswith(str(staged)), (
            "staged prefix must be copied, never renamed: " + str(src)
        )
        assert not os.path.isdir(src), "directory rename is forbidden"
        landed.append(os.path.basename(dst))
        return real_replace(src, dst)

    monkeypatch.setattr(os, "rename", forbid)
    monkeypatch.setattr(os, "replace", put_only)
    monkeypatch.setattr(os, "link", forbid)
    monkeypatch.setattr("shutil.move", forbid)
    io.promote_dir(str(staged), str(tmp_path / "final"))
    assert (tmp_path / "final" / "part-0.parquet").read_text() == "a"
    assert (tmp_path / "final" / "sub" / "part-1.parquet").read_text() == "b"
    assert not staged.exists()
    # data first, manifest strictly last — the commit-point ordering
    assert landed[-1] == "_folds.json" and len(landed) == 3
    # the write-once fence works with os.link forbidden (PUT atomicity
    # may use replace; the claim must not need links)
    monkeypatch.undo()
    monkeypatch.setattr(os, "link", forbid)
    p = str(tmp_path / "ckpt.json")
    assert io.put_json_if_absent(p, {"w": 1}) is True
    assert io.put_json_if_absent(p, {"w": 2}) is False
    assert io.read_json(p) == {"w": 1}


def test_objstore_list_hides_inflight_temps(tmp_path):
    """LIST shows completed PUTs only — a real store has no client temps;
    the simulation reserves dot-names and must never leak them into a
    ledger listing (snapshots() trips on unparseable names)."""
    io = ObjectStoreSimIO()
    d = str(tmp_path)
    io.put_json(os.path.join(d, "0.json"), {"snapshot_id": 0})
    # an in-flight temp from a crashed writer of another process
    with open(os.path.join(d, ".1.json.9999.put"), "w") as f:
        f.write("{torn")
    assert io.list_names(d) == ["0.json"]
