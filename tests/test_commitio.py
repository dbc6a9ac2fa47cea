"""PosixCommitIO contract tests (plans/commitio.py, SCALE.md §10) — no
Spark session needed; these pin the invariants any backend port must
honor and the POSIX implementation's crash hygiene."""

from __future__ import annotations

import json
import os

import pytest

from duckdb_streaming_patterns_spark.plans.commitio import PosixCommitIO


@pytest.fixture()
def io():
    return PosixCommitIO()


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
