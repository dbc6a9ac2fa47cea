"""bench.py harness behavior (no Spark session needed).

Round-7 verdict item 8 / ADVICE r6 low #4: one failed isolated
subprocess must not abort the whole bench tail — it is recorded as a
null timing + an ``errors`` entry and the run continues.
"""

from __future__ import annotations

import json
import subprocess
import sys
import types

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _fake_result(returncode: int, stdout: str = "", stderr: str = ""):
    r = types.SimpleNamespace()
    r.returncode = returncode
    r.stdout = stdout
    r.stderr = stderr
    return r


def test_run_isolated_returns_error_instead_of_raising(monkeypatch):
    monkeypatch.setattr(
        subprocess,
        "run",
        lambda *a, **kw: _fake_result(1, "", "Traceback: boom"),
    )
    sec, err = bench._run_isolated("some_query", "/tmp/sf")
    assert sec is None
    assert err is not None and "boom" in err


def test_run_isolated_parses_success_line(monkeypatch):
    line = json.dumps({"query": "q", "sec": 1.25, "rows": 3})
    monkeypatch.setattr(
        subprocess,
        "run",
        lambda *a, **kw: _fake_result(0, "noise\n" + line, ""),
    )
    sec, err = bench._run_isolated("q", "/tmp/sf")
    assert err is None and sec == 1.25


def test_bench_diff_skips_null_timings(tmp_path):
    sys.path.insert(0, "/root/repo/scripts")
    import bench_diff

    p = tmp_path / "BENCH_r99.json"
    p.write_text(
        json.dumps(
            {
                "queries": {"ok": 1.0, "broken": None},
                "errors": {"broken": "exit 1: ..."},
            }
        )
    )
    assert bench_diff.load_timings(str(p)) == {"ok": 1.0}


def test_bench_diff_prefers_full_artifact(tmp_path):
    sys.path.insert(0, "/root/repo/scripts")
    import bench_diff

    # the driver record: truncated tail, no queries dict
    (tmp_path / "BENCH_r42.json").write_text(
        json.dumps({"tail": '...runtime", "queries": {"a": 1.0}'})
    )
    # the full artifact beside it wins
    (tmp_path / "bench_full_r42.json").write_text(
        json.dumps({"queries": {"a": 1.0, "b": 2.0}})
    )
    got = bench_diff.load_timings(str(tmp_path / "BENCH_r42.json"))
    assert got == {"a": 1.0, "b": 2.0}
