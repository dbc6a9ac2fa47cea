"""Fixture/table loading.

The engine's batch sources are Parquet tables (one file per table in the
test fixtures; a directory of files at scale — ``spark.read.parquet`` handles
both identically). Explicit, fixed schemas everywhere per the reference's
discipline (SURVEY §1.3: no inference on the hot path) — but since Parquet
carries its schema, we read the footer schema and *validate* rather than
infer.

At 100 TB each table would be a partitioned/bucketed directory; the loader's
contract (name → DataFrame) is unchanged, so every operator built on it
scales without modification.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# The full fixture family (TESTDATA.md). `events` doubles as the streaming
# fixture replayed through file sources for the reference's four patterns.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Reference analogue: DuckDB table scan
    (``FROM raw_events`` — reference pattern_1_1.py:104).

    ``events.ts`` arrives in whatever precision the fixture generator used:
    nanosecond parquet (which Spark's vectorized reader rejects — read as
    raw INT64 via the legacy conf and truncate to microseconds) or native
    microsecond ``isAdjustedToUTC=false`` (read directly as
    TIMESTAMP_NTZ). Both normalize to microsecond TIMESTAMP_NTZ — exactly
    what DuckDB's microsecond TIMESTAMP holds for the same file, so oracle
    comparisons agree either way. The branch keys off the *read* schema,
    not an assumption about the file.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if df.schema["ts"].dataType.simpleString() == "bigint":
            # nanos-as-long fixture: integer-divide to micros
            ts_ntz = F.timestamp_micros(F.expr("ts div 1000")).cast(
                "timestamp_ntz"
            )
        else:
            ts_ntz = F.col("ts").cast("timestamp_ntz")
        return df.withColumn("ts", ts_ntz)
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so operators can be
    expressed in SQL (reference analogue: DuckDB catalog / ``USE db`` —
    pattern_1_2.py:23)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
