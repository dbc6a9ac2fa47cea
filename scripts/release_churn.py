"""Measure inter-version placement churn of the release builder.

Run:  python scripts/release_churn.py <out_json> [sf_dir ...]

Runs the registered `release_version_diff` query (version 1 over the
3-chunk corpus prefix, version 2 over the full corpus, one release dir)
per scale factor and records the status histogram (added / removed /
moved / stable). This is the committed artifact behind the
OPTIMIZATION_r16.md "Not yet optimized #2" churn claim: near-total
placement churn between adjacent versions rules out incremental
bin-fingerprint / shard reuse as an optimization lever while the
assignment stays exactness-pinned.
"""

from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from duckdb_streaming_patterns_spark import get_spark  # noqa: E402


def main() -> None:
    out = sys.argv[1]
    sf_dirs = sys.argv[2:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark(app_name="release-churn")
    from duckdb_streaming_patterns_spark.queries import QUERIES

    fn, _ = QUERIES["release_version_diff"]
    result: dict[str, dict[str, int]] = {}
    for sf_dir in sf_dirs:
        df = fn(spark, sf_dir)
        # Histogram over the diff's status column: n_statuses rows.
        counts = {r["status"]: r["n"] for r in df.groupBy("status").count().withColumnRenamed("count", "n").collect()}
        result[os.path.basename(sf_dir.rstrip("/"))] = counts
    payload = {
        "query": "release_version_diff",
        "what": "status histogram of the cross-version release diff "
        "(v1 = 3-chunk corpus prefix, v2 = full corpus, same release dir)",
        "churn_by_sf": result,
        "read": "moved+removed vs stable: near-total churn means bin "
        "fingerprints have nothing to reuse between adjacent versions "
        "under the exactness-pinned global assignment",
    }
    with open(out, "w") as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
