"""Env-flag-gated integration smoke tests for the two sandbox-blocked
surfaces (round-7 verdict item 4): a live Kafka broker and a real
DuckDB JDBC sink. Both skip cleanly where the environment lacks them;
the day a broker / jdbc jar is available, these make the production
wiring in streaming/kafka.py and the pattern-2 sink executable
end-to-end with no code changes.

Env contract (documented in README):
- ``SPARK_GRAFT_KAFKA_BOOTSTRAP``  e.g. ``localhost:9092`` — enables the
  producer → ``read_kafka_stream`` → incremental-merge ≡ file-replay
  equivalence test. The subprocess adds
  ``org.apache.spark:spark-sql-kafka-0-10_2.13:<spark ver>`` via
  ``spark.jars.packages`` (needs network or a warm ivy cache).
- ``SPARK_GRAFT_JDBC_JAR``  path to a ``duckdb_jdbc`` jar — enables the
  Spark ``format("jdbc")`` overwrite test, verified by an in-process
  DuckDB read of the same database file.

Each test runs its Spark work in a SUBPROCESS with a dedicated session:
extra jars/packages must be on the JVM classpath at session start, and
the suite's shared session cannot be restarted mid-run.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import uuid

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_KAFKA_SCRIPT = r"""
import json, os, sys
sys.path.insert(0, "__REPO__")
from pyspark.sql import SparkSession
from pyspark import __version__ as spark_ver
from pyspark.sql import functions as F

bootstrap = os.environ["SPARK_GRAFT_KAFKA_BOOTSTRAP"]
topic = sys.argv[1]
scala = "2.13"
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config(
        "spark.jars.packages",
        f"org.apache.spark:spark-sql-kafka-0-10_{scala}:{spark_ver}",
    )
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from duckdb_streaming_patterns_spark.sources.tables import load_table
from duckdb_streaming_patterns_spark.streaming.kafka import (
    read_kafka_stream, write_kafka,
)
from duckdb_streaming_patterns_spark.operators.merge import SummaryTable
from duckdb_streaming_patterns_spark.operators.summary import CLICK

sf_dir = "/root/testdata/sf0.001"
events = (
    load_table(spark, sf_dir, "events")
    .orderBy("event_id").limit(500).cache()
)
# producer side: the reference's JSON wire (producer.py:81-87)
write_kafka(events, bootstrap, topic)

# consumer side: decoded stream -> pattern-1.1 incremental merge
import tempfile
run = tempfile.mkdtemp(prefix="kafka_smoke_")
summary = SummaryTable(
    spark, os.path.join(run, "summary"), "user_id long, click_count long"
)

def merge_batch(batch, batch_id):
    clicks = (
        batch.filter(F.col("event_type") == CLICK)
        .groupBy("user_id")
        .agg(F.count("*").alias("click_count"))
    )
    summary.merge_batch(
        clicks, batch_id,
        keys=["user_id"], add_cols=["click_count"], max_cols=[],
    )

(
    read_kafka_stream(spark, bootstrap, topic)
    .writeStream.trigger(availableNow=True)
    .foreachBatch(merge_batch)
    .option("checkpointLocation", os.path.join(run, "ckpt"))
    .start()
    .awaitTermination()
)
got = {
    (r["user_id"], r["click_count"]) for r in summary.read().collect()
}
# file-replay oracle: the same slice aggregated in one batch
want = {
    (r["user_id"], r["click_count"])
    for r in (
        events.filter(F.col("event_type") == CLICK)
        .groupBy("user_id")
        .agg(F.count("*").alias("click_count"))
        .collect()
    )
}
assert got == want, f"kafka path diverged: {len(got)} vs {len(want)} groups"
print(json.dumps({"ok": True, "groups": len(got)}))
"""

_JDBC_SCRIPT = r"""
import json, os, sys
sys.path.insert(0, "__REPO__")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

jar = os.environ["SPARK_GRAFT_JDBC_JAR"]
db_path = sys.argv[1]
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.jars", jar)
    .config("spark.driver.extraClassPath", jar)
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from duckdb_streaming_patterns_spark.sources.tables import load_table
from duckdb_streaming_patterns_spark.operators.summary import user_clicks

sf_dir = "/root/testdata/sf0.001"
agg = user_clicks(load_table(spark, sf_dir, "events"))
# the reference's JDBC overwrite (pattern_2.py:74-79), for real
(
    agg.write.format("jdbc")
    .option("url", f"jdbc:duckdb:{db_path}")
    .option("dbtable", "user_clicks")
    .option("driver", "org.duckdb.DuckDBDriver")
    .mode("overwrite")
    .save()
)
rows = agg.count()
print(json.dumps({"ok": True, "rows": int(rows)}))
"""


def _run_sub(script: str, *args: str) -> dict:
    res = subprocess.run(
        [sys.executable, "-c", script.replace("__REPO__", _REPO), *args],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert res.returncode == 0, f"subprocess failed:\n{res.stderr[-4000:]}"
    for line in reversed(res.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise AssertionError(f"no result line in:\n{res.stdout[-2000:]}")


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP"),
    reason="no Kafka broker: set SPARK_GRAFT_KAFKA_BOOTSTRAP=host:port",
)
def test_kafka_roundtrip_merge_equals_file_replay():
    """producer → read_kafka_stream → pattern-1.1 merge must equal the
    one-batch aggregate of the same rows (streaming/kafka.py:23,78)."""
    out = _run_sub(_KAFKA_SCRIPT, f"smoke-{uuid.uuid4().hex[:8]}")
    assert out["ok"] and out["groups"] > 0


@pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_JDBC_JAR"),
    reason="no duckdb_jdbc jar: set SPARK_GRAFT_JDBC_JAR=/path/to/jar",
)
def test_jdbc_overwrite_readable_by_duckdb(tmp_path):
    """Spark format('jdbc') overwrite into a DuckDB file, verified by an
    in-process DuckDB read — the real form of pattern-2's sink."""
    import duckdb

    db_path = str(tmp_path / "smoke.duckdb")
    out = _run_sub(_JDBC_SCRIPT, db_path)
    con = duckdb.connect(db_path)
    n = con.execute("SELECT count(*) FROM user_clicks").fetchone()[0]
    assert n == out["rows"] > 0


def test_gated_scripts_compile():
    """The embedded subprocess scripts must at least parse, so they
    cannot rot silently while the env gates keep them skipped here."""
    for script in (_KAFKA_SCRIPT, _JDBC_SCRIPT):
        compile(script.replace("__REPO__", _REPO), "<gated-script>", "exec")
