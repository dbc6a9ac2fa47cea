"""Capture `explain("formatted")` of a registered query's returned frame.

Run:  python scripts/capture_plan.py <query> <out_file> [sf_dir]

Runs the query function (streaming patterns run their whole stream — the
plan captured is the RETURNED frame's, same convention as plans/r{14..16})
at sf0.01 by default, and writes the formatted physical plan to out_file.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from duckdb_streaming_patterns_spark import get_spark  # noqa: E402


def main() -> None:
    name, out = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    spark = get_spark(app_name=f"plan-{name}")
    from duckdb_streaming_patterns_spark.queries import QUERIES

    fn, _ = QUERIES[name]
    df = fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(out, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {out} ({len(buf.getvalue())} bytes)")


if __name__ == "__main__":
    main()
