"""Kafka source/sink declarations (SURVEY §2.1 S1/S2, §2.2 W7).

This container has no broker and no spark-sql-kafka package, so these
builders are exactly the production wiring (identical to the reference's own
Spark pipeline, pattern_2.py:38-43) but are exercised only on a real
cluster. The file-replay sources in streaming/staging.py are the test-time
stand-in; everything downstream of the source is shared.

Cluster prerequisite: ``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.streaming.staging import (
    JSON_WIRE_SCHEMA,
    TS_FMT,
)


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Streaming Kafka source (reference pattern_2.py:38-43) with the
    reference's JSON decode applied (pattern_2.py:46-51): binary value →
    string → from_json → flatten → event-time timestamp."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return _decode(raw)


def read_kafka_batch(
    spark: SparkSession, bootstrap_servers: str, topic: str
) -> DataFrame:
    """Batch full-topic scan — the `tributary_scan_topic` equivalent
    (reference bonus_pattern.py:22): stateless re-read from offset 0."""
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
        .load()
    )
    return _decode(raw)


def _decode(raw: DataFrame) -> DataFrame:
    return (
        raw.selectExpr("CAST(value AS STRING) AS json_str")
        .select(F.from_json("json_str", JSON_WIRE_SCHEMA).alias("data"))
        .select("data.*")
        .withColumn("ts", F.to_timestamp("timestamp", TS_FMT).cast("timestamp_ntz"))
        .drop("timestamp")
    )


def _encode(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Producer wire encode (reference scripts/producer.py:73-87): the
    full row as a JSON value keyed by ``key_col``, both as binary — the
    exact frame a Kafka sink transmits. Split out from write_kafka so the
    encode⇄decode round-trip is unit-testable without a broker."""
    return df.select(
        F.col(key_col).cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*df.columns)).cast("binary").alias("value"),
    )


def write_kafka(
    df: DataFrame, bootstrap_servers: str, topic: str, key_col: str = "user_id"
) -> None:
    """Kafka producer parity (reference scripts/producer.py:81-87): JSON
    value keyed by user_id."""
    (
        _encode(df, key_col)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .save()
    )
