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
    sec, cal, err = bench._run_isolated("some_query", "/tmp/sf")
    assert sec is None and cal is None
    assert err is not None and "boom" in err


def test_run_isolated_parses_success_line(monkeypatch):
    line = json.dumps({"query": "q", "sec": 1.25, "rows": 3, "cal_sec": 2.5})
    monkeypatch.setattr(
        subprocess,
        "run",
        lambda *a, **kw: _fake_result(0, "noise\n" + line, ""),
    )
    sec, cal, err = bench._run_isolated("q", "/tmp/sf")
    assert err is None and sec == 1.25 and cal == 2.5
    # a pre-round-10 child line without the probe still parses
    line_old = json.dumps({"query": "q", "sec": 1.25, "rows": 3})
    monkeypatch.setattr(
        subprocess,
        "run",
        lambda *a, **kw: _fake_result(0, line_old, ""),
    )
    sec, cal, err = bench._run_isolated("q", "/tmp/sf")
    assert err is None and sec == 1.25 and cal is None


def test_norm_factor_prefers_per_query_probe():
    """A query with its own subprocess probe in the calibration dict
    normalizes by it; others by the session start/end mean; missing
    probes on either side (pre-round-10 artifacts) mean no
    normalization. Selection is purely by dict membership (round-11
    ADVICE: the old `isolated` parameter was dead and dropped)."""
    cur = {"__start__": 2.0, "__end__": 4.0, "q_iso": 6.0}
    prev = {"__start__": 1.0, "__end__": 1.0, "q_iso": 2.0}
    assert bench._norm_factor("q_iso", cur, prev) == 3.0
    assert bench._norm_factor("q_sess", cur, prev) == 3.0
    # query missing its own probe falls back to session probes
    assert bench._norm_factor("q_other", cur, prev) == 3.0
    assert bench._norm_factor("q", cur, None) is None
    assert bench._norm_factor("q", None, prev) is None
    assert bench._norm_factor("q", {}, {}) is None


def test_bench_diff_normalizes_with_calibration(tmp_path, capsys):
    """scripts/bench_diff divides new timings by the window-load ratio
    when both artifacts carry calibration probes: a uniform 2x slowdown
    with a 2x calibration shift reports ZERO moves (the r8->r9 phantom
    regression shape), while a real regression still surfaces."""
    sys.path.insert(0, "/root/repo/scripts")
    import bench_diff

    old = tmp_path / "a.json"
    new = tmp_path / "b.json"
    old.write_text(
        json.dumps(
            {
                "queries": {"q_flat": 10.0, "q_regressed": 10.0},
                "calibration_sec": {"__start__": 1.0, "__end__": 1.0},
            }
        )
    )
    new.write_text(
        json.dumps(
            {
                # q_flat doubled WITH the window (pure load); q_regressed
                # doubled AGAIN on top of it (real)
                "queries": {"q_flat": 20.0, "q_regressed": 40.0},
                "calibration_sec": {"__start__": 2.0, "__end__": 2.0},
            }
        )
    )
    sys.argv = ["bench_diff.py", str(old), str(new), "3"]
    bench_diff.main()
    out = capsys.readouterr().out
    assert "q_flat" not in out.split("common")[0]  # no phantom move
    assert "q_regressed" in out
    assert "window-load factor" in out and "2.00x" in out


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
