"""Diagnostic A/B of one bench query under session-conf overrides.

Times ONE query exactly like ``bench.py --one`` (same warm-up, same
calibration probe, same force_eval) but with extra session conf applied,
so the per-batch driver floor can be DECOMPOSED: how much of a streaming
pattern's runtime is AQE stage re-planning, whole-stage codegen
compilation, constraint propagation, etc. Purely a measurement tool —
the bench itself never runs with these overrides (its conf is the
engine's shipped default; see session.py).

Run:  python scripts/conf_ab.py <query> [k=v ...]
e.g.  python scripts/conf_ab.py pattern_streaming_neardup_dedup \
          spark.sql.adaptive.enabled=false
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from duckdb_streaming_patterns_spark import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    conf = dict(kv.split("=", 1) for kv in sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"conf-ab-{name}", extra_conf=conf or None)
    import bench

    bench._warm_session(spark)
    cal = bench._calibrate(spark)
    from duckdb_streaming_patterns_spark.queries import QUERIES

    fn, _ = QUERIES[name]
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    n = bench.force_eval(df)
    sec = round(time.perf_counter() - t0, 4)
    print(
        json.dumps(
            {
                "query": name,
                "sec": sec,
                "rows": int(n),
                "cal_sec": cal,
                "conf": conf,
            }
        )
    )


if __name__ == "__main__":
    main()
