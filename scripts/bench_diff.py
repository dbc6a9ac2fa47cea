"""Compare two bench outputs and report per-query moves.

The measured-probe discipline (round-3 verdict item 7): any |delta| above
the threshold must be explained — re-measure warm, fix what reproduces,
write off what doesn't in the commit message. This script is the first
step: it parses either bench.py's own JSON line or a driver BENCH_r{N}.json
record (whose 'tail' may be front-truncated — query timings are recovered
by regex) and prints new/removed queries and every move over threshold.

Run:  python scripts/bench_diff.py OLD.json NEW.json [threshold_sec=3]
"""

from __future__ import annotations

import json
import re
import sys


def load_calibration(path: str) -> dict[str, float]:
    """The bench run's calibration probes (round-10: fixed reference
    workload timed per window — see bench._calibrate). Empty dict for
    pre-round-10 artifacts."""
    import os

    m = re.search(r"BENCH_(r\d+)\.json$", path)
    if m:
        full = os.path.join(
            os.path.dirname(path), f"bench_full_{m.group(1)}.json"
        )
        if os.path.exists(full):
            path = full
    try:
        rec = json.loads(open(path).read().strip())
    except (OSError, json.JSONDecodeError):
        return {}
    cal = rec.get("calibration_sec") if isinstance(rec, dict) else None
    return cal if isinstance(cal, dict) else {}


def _cal_probe(cal: dict[str, float], name: str) -> float | None:
    if name in cal:
        return cal[name]
    vals = [cal[k] for k in ("__start__", "__end__") if cal.get(k)]
    return sum(vals) / len(vals) if vals else None


def load_timings(path: str) -> dict[str, float]:
    # Prefer the complete artifact: BENCH_r{N}.json carries only a
    # truncated stdout tail, but since round 8 each bench run writes the
    # full dict to bench_full_r{N}.json / bench_full_latest.json beside
    # it — use that when present.
    import os

    m = re.search(r"BENCH_(r\d+)\.json$", path)
    if m:
        full = os.path.join(
            os.path.dirname(path), f"bench_full_{m.group(1)}.json"
        )
        if os.path.exists(full):
            path = full
    raw = open(path).read().strip()
    rec: dict = {}
    for cand in (raw, raw.splitlines()[-1]):
        try:
            rec = json.loads(cand)
            break
        except json.JSONDecodeError:
            continue
    if isinstance(rec, dict) and isinstance(rec.get("queries"), dict):
        # null timing = the query errored that run (see bench.py errors)
        return {
            k: float(v)
            for k, v in rec["queries"].items()
            if v is not None
        }
    # driver record: timings live in a possibly front-truncated 'tail'
    tail = rec.get("tail", raw) if isinstance(rec, dict) else raw
    seg = tail.split('"layout_setup_sec"')[0]
    seg = seg.split('"queries"')[-1]
    return {
        k: float(v) for k, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', seg)
    }


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
    old, new = load_timings(old_path), load_timings(new_path)
    old_cal, new_cal = load_calibration(old_path), load_calibration(new_path)
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print("added:", {k: round(new[k], 2) for k in added})
    if removed:
        print("removed:", {k: round(old[k], 2) for k in removed})

    def norm(k: str, t: float) -> float:
        """New-round timing divided by the per-query window-load factor
        (both rounds' calibration probes required; raw otherwise)."""
        a, b = _cal_probe(old_cal, k), _cal_probe(new_cal, k)
        return t * a / b if a and b else t

    normalized = bool(old_cal) and bool(new_cal)
    if normalized:
        sess = [
            _cal_probe(new_cal, "__none__"),
            _cal_probe(old_cal, "__none__"),
        ]
        if sess[0] and sess[1]:
            print(
                f"window-load factor (session probes, new/old): "
                f"{sess[0] / sess[1]:.2f}x — moves below are "
                "load-NORMALIZED; raw shown alongside"
            )
    moves = sorted(
        (
            (k, old[k], new[k], norm(k, new[k]))
            for k in new
            if k in old and abs(norm(k, new[k]) - old[k]) > thr
        ),
        key=lambda x: -abs(x[3] - x[1]),
    )
    for k, a, b, bn in moves:
        extra = f" [raw {b:.2f}]" if normalized and abs(bn - b) > 0.005 else ""
        print(f"move>{thr}s: {k}: {a:.2f} -> {bn:.2f} ({bn - a:+.2f}){extra}")
    common = [k for k in new if k in old]
    print(
        f"common {len(common)} queries: "
        f"{sum(old[k] for k in common):.1f}s -> "
        f"{sum(norm(k, new[k]) for k in common):.1f}s"
        + (
            f" (raw {sum(new[k] for k in common):.1f}s)"
            if normalized
            else ""
        )
        + f"; {len(moves)} moves over {thr}s"
    )


if __name__ == "__main__":
    main()
