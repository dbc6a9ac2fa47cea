"""Count Spark jobs one bench query submits — window-independent
structural evidence (r16 methodology: `dagScheduler.nextJobId` delta).

Run:  python scripts/job_count.py <query> [<query> ...]
Env:  SPARK_GRAFT_SF_DIR (default sf0.01), SPARK_GRAFT_CPUS (default 8)
"""

from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from duckdb_streaming_patterns_spark import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="job-count")
    import bench

    bench._warm_session(spark)
    from duckdb_streaming_patterns_spark.queries import QUERIES

    sc = spark.sparkContext

    def next_job_id() -> int:
        nid = sc._jsc.sc().dagScheduler().nextJobId()
        # AtomicInteger in older Spark; a plain int in Spark 4's scala side
        return nid.get() if hasattr(nid, "get") else int(nid)

    for name in sys.argv[1:]:
        fn, _ = QUERIES[name]
        j0 = next_job_id()
        df = fn(spark, sf_dir)
        n = bench.force_eval(df)
        j1 = next_job_id()
        print(json.dumps({"query": name, "jobs": j1 - j0, "rows": int(n)}))


if __name__ == "__main__":
    main()
