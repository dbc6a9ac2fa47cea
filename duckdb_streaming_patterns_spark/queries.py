"""Query registry: every implemented operator from SURVEY.md §2 exposed as a
named query plus (where SQL-expressible) a DuckDB oracle string.

Registry shape: ``QUERIES[name] = (spark_fn, oracle_sql | None)`` where
``spark_fn(spark, sf_dir) -> DataFrame``. The driver (and our own tests) run
the Spark plan and the oracle SQL over identical parquet and hash-compare.

Determinism rules applied throughout so the order-insensitive value hash
matches across engines:
- every computed column is aliased identically on both sides;
- double aggregates are wrapped in ROUND(x, 2..6) on both sides (engines sum
  floats in different orders; rounding absorbs the last-ulp difference);
- every LIMIT/top-k has a total-order tiebreak so the selected *set* is
  deterministic.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from duckdb_streaming_patterns_spark.operators import summary
from duckdb_streaming_patterns_spark.sources.tables import load_table

# The registry itself lives in the leaf module ``registry`` (round 12:
# breaks the family-module import cycle); re-exported here so external
# callers keep their one import site — and importing THIS module is what
# populates the registry (the family imports at the tail).
from duckdb_streaming_patterns_spark.registry import (  # noqa: F401
    QUERIES,
    SparkQuery,
    _t,
    register,
)


# ---------------------------------------------------------------------------
# Reference parity — SURVEY §2.3-§2.8 over the `events` fixture
# ---------------------------------------------------------------------------


@register(
    "user_clicks",
    """
    SELECT user_id,
           count(*) AS count_of_clicks,
           max(ts)  AS updated_at
    FROM events
    WHERE event_type = 'click'
    GROUP BY user_id
    """,
)
def q_user_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: the invariant all four reference patterns maintain
    (reference pattern_1_1.py:96-116). Operators F1+A1+A2+A5."""
    return summary.user_clicks(_t(spark, sf_dir, "events"))


@register(
    "user_clicks_top5",
    """
    SELECT user_id, count(*) AS count_of_clicks
    FROM events
    WHERE event_type = 'click'
    GROUP BY user_id
    ORDER BY count_of_clicks DESC, user_id
    LIMIT 5
    """,
)
def q_user_clicks_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K O1 (reference bonus_pattern.py:50). TakeOrderedAndProject plan."""
    df = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("count_of_clicks"))
    )
    return summary.top_k(df, k=5)


@register(
    "scalar_max_ts",
    "SELECT max(ts) AS max_ts FROM events",
)
def q_scalar_max_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped scalar MAX A4 — the watermark probe (reference
    pattern_1_1.py:93)."""
    return _t(spark, sf_dir, "events").agg(F.max("ts").alias("max_ts"))


@register(
    "watermark_delta_bootstrap",
    """
    SELECT user_id, count(*) AS count_of_clicks, max(ts) AS updated_at
    FROM events
    WHERE (NULL IS NULL OR ts > NULL) AND event_type = 'click'
    GROUP BY user_id
    """,
)
def q_watermark_delta_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe high-watermark predicate F2, bootstrap path (watermark NULL →
    all rows; reference pattern_1_1.py:105)."""
    return summary.user_clicks_delta(_t(spark, sf_dir, "events"), watermark=None)


@register(
    "watermark_delta_incremental",
    """
    SELECT user_id, count(*) AS count_of_clicks, max(ts) AS updated_at
    FROM events
    WHERE (TIMESTAMP '2024-01-04 00:00:00' IS NULL
           OR ts > TIMESTAMP '2024-01-04 00:00:00')
      AND event_type = 'click'
    GROUP BY user_id
    """,
)
def q_watermark_delta_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 with a bound watermark — only rows newer than the high-water mark
    are re-aggregated (reference pattern_1_1.py:105)."""
    import datetime

    wm = datetime.datetime(2024, 1, 4)
    return summary.user_clicks_delta(_t(spark, sf_dir, "events"), watermark=wm)


@register(
    "events_exclude_props",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    """,
)
def q_events_exclude_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-but-one projection P2 (`SELECT * EXCLUDE message`, reference
    bonus_pattern.py:19-20) → `df.drop`. Column pruning reaches the scan."""
    return _t(spark, sf_dir, "events").drop("props")


@register(
    "events_json_extract",
    """
    SELECT event_id,
           CAST(props ->> '$.k' AS BIGINT) AS k
    FROM events
    WHERE CAST(props ->> '$.k' AS BIGINT) > 50
    """,
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction C2/C3 (`message ->> '$.user_id'`, reference
    bonus_pattern.py:33-36) → get_json_object."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") > 50)


@register(
    "events_cast_projection",
    """
    SELECT event_id,
           CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
           CAST(user_id AS VARCHAR)          AS user_id_str,
           CAST(floor(value) AS BIGINT)      AS value_int
    FROM events
    """,
)
def q_events_cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast projections P3/P4/C4/C5 (reference pattern_2.py:46,
    bonus_pattern.py:33). floor() before the int cast because engines differ
    on double→int rounding (Spark truncates, DuckDB rounds); date rendered
    as string for a representation-stable comparison."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("ts").cast("date").cast("string").alias("event_date"),
        F.col("user_id").cast("string").alias("user_id_str"),
        F.floor("value").cast("bigint").alias("value_int"),
    )


@register(
    "event_type_counts",
    """
    SELECT event_type,
           count(*) AS n,
           ROUND(sum(value), 2) AS total_value,
           max(ts) AS last_seen
    FROM events
    GROUP BY event_type
    """,
)
def q_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate hash agg A1/A2/A5 over a low-cardinality key."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max("ts").alias("last_seen"),
        )
    )


@register(
    "distinct_users_per_type",
    """
    SELECT event_type, count(DISTINCT user_id) AS users
    FROM events
    GROUP BY event_type
    """,
)
def q_distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — two-phase exact distinct aggregation (partial
    distinct per partition, final after shuffle)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("users"))
    )


@register(
    "reaggregate_partials",
    """
    SELECT user_id, CAST(sum(count_of_clicks) AS BIGINT) AS count_of_clicks
    FROM (
        SELECT user_id, CAST(ts AS DATE) AS d, count(*) AS count_of_clicks
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, CAST(ts AS DATE)
    )
    GROUP BY user_id
    """,
)
def q_reaggregate_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SUM-of-partial-counts A3 (reference pattern_2.py:102: re-aggregating
    per-batch partial counts) + subquery-as-relation P6."""
    ev = _t(spark, sf_dir, "events")
    partials = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg(F.count("*").alias("count_of_clicks"))
    )
    return partials.groupBy("user_id").agg(
        F.sum("count_of_clicks").alias("count_of_clicks")
    )


# Register the extended query surfaces (import side effect).
from duckdb_streaming_patterns_spark import queries_star  # noqa: E402,F401
from duckdb_streaming_patterns_spark import queries_tpch  # noqa: E402,F401
from duckdb_streaming_patterns_spark import queries_tpch2  # noqa: E402,F401
from duckdb_streaming_patterns_spark import queries_text  # noqa: E402,F401
from duckdb_streaming_patterns_spark import queries_sim  # noqa: E402,F401
from duckdb_streaming_patterns_spark import queries_streaming  # noqa: E402,F401
from duckdb_streaming_patterns_spark import queries_multimodal  # noqa: E402,F401
from duckdb_streaming_patterns_spark import queries_advanced  # noqa: E402,F401
from duckdb_streaming_patterns_spark import queries_pipeline  # noqa: E402,F401
from duckdb_streaming_patterns_spark import queries_sketch  # noqa: E402,F401
