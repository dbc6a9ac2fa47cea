"""Probe-gated full-bench launcher (the r16 cal-gate discipline).

Run:  python scripts/gated_bench.py <out_json> [threshold] [max_wait_min]

Samples bench.py's fixed calibration workload in THIS process every
~2.5 min and launches the full bench (a fresh ``python bench.py``
subprocess, stdout captured to <out_json>.log, the one-line JSON tail
parsed into <out_json>) only after two consecutive probes under the
threshold (default 1.0 s). Publishing a run from a loaded window makes
cross-round comparison impossible (SCALE §13) — this automates the
"wait for a quiet window" step instead of hand-running probes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> None:
    out = sys.argv[1]
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    max_wait_min = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from duckdb_streaming_patterns_spark import get_spark
    import bench

    spark = get_spark(app_name="gated-bench-probe")
    bench._calibrate(spark)  # warm-up, discarded
    deadline = time.time() + max_wait_min * 60
    streak = 0
    while True:
        cal = bench._calibrate(spark)
        print(f"probe cal={cal:.3f} (streak {streak})", flush=True)
        streak = streak + 1 if cal < threshold else 0
        if streak >= 2:
            break
        if time.time() > deadline:
            print("gate: deadline reached without a quiet window; NOT launching", flush=True)
            sys.exit(3)
        time.sleep(150)
    spark.stop()
    print("gate open — launching full bench", flush=True)
    env = dict(os.environ)
    with open(out + ".log", "w") as log:
        rc = subprocess.run(
            [sys.executable, os.path.join(_REPO_ROOT, "bench.py")],
            stdout=log,
            stderr=subprocess.STDOUT,
            env=env,
        ).returncode
    tail = open(out + ".log").read().strip().splitlines()
    parsed = None
    for line in reversed(tail):
        if line.startswith("{"):
            try:
                parsed = json.loads(line)
                break
            except json.JSONDecodeError:
                continue
    with open(out, "w") as f:
        json.dump({"rc": rc, "parsed": parsed}, f, indent=2)
    print(json.dumps({"rc": rc, "total": parsed and parsed.get("value"), "cal_median": parsed and parsed.get("cal_median"), "loaded": parsed and parsed.get("loaded")}))


if __name__ == "__main__":
    main()
