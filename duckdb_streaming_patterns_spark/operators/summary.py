"""The reference's semantic core: the ``user_clicks`` summary aggregation.

Every one of the reference's four patterns maintains the invariant
(reference pattern_1_1.py:96-116)::

    user_clicks == SELECT user_id, count(*), max(timestamp)
                   FROM raw_events WHERE event_type = 'CLICK'
                   GROUP BY user_id

Here that is a declarative plan: filter → multi-key hash aggregate. Catalyst
plans it as parquet scan (with ``event_type = 'click'`` pushed into the scan
and only the 3 referenced columns read) → partial HashAggregate (map-side
combine) → shuffle on the group key → final HashAggregate. At 100 TB the
partial aggregation means shuffle volume is proportional to the number of
distinct users, not the number of events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# The fixture's event vocabulary is lowercase (`click`); the reference
# producer's is uppercase (`CLICK`, reference scripts/producer.py:22).
CLICK = "click"


def filter_clicks(events: DataFrame, event_type: str = CLICK) -> Column:
    """Equality predicate F1 (reference pattern_1_1.py:105)."""
    return events.filter(F.col("event_type") == event_type)


def user_clicks(
    events: DataFrame,
    group_keys: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    event_type: str = CLICK,
) -> DataFrame:
    """Aggregates A1/A2/A5 over filter F1 (reference pattern_1_1.py:99-106).

    Returns columns: group keys + ``count_of_clicks`` + ``updated_at``,
    matching the reference summary-table schema (pattern_1_1.py:32-39).
    """
    return (
        filter_clicks(events, event_type)
        .groupBy(*group_keys)
        .agg(
            F.count("*").alias("count_of_clicks"),
            F.max(ts_col).alias("updated_at"),
        )
    )


def user_clicks_delta(
    events: DataFrame,
    watermark,
    group_keys: tuple[str, ...] = ("user_id",),
    ts_col: str = "ts",
    event_type: str = CLICK,
) -> DataFrame:
    """The delta-aggregation with the null-safe high-watermark predicate F2
    (reference pattern_1_1.py:105: ``(? IS NULL OR timestamp > ?)``).

    ``watermark=None`` is the bootstrap path: all rows qualify.
    """
    wm = F.lit(watermark)
    return (
        events.filter(wm.isNull() | (F.col(ts_col) > wm))
        .filter(F.col("event_type") == event_type)
        .groupBy(*group_keys)
        .agg(
            F.count("*").alias("count_of_clicks"),
            F.max(ts_col).alias("updated_at"),
        )
    )


def summary_watermark(summary: DataFrame, ts_col: str = "updated_at"):
    """Scalar watermark probe F4/A4 (reference pattern_1_1.py:93):
    ``SELECT max(updated_at) FROM user_clicks``. Returns a Python value
    (None on empty summary — the bootstrap case)."""
    return summary.agg(F.max(ts_col).alias("wm")).first()["wm"]


def top_k(summary: DataFrame, k: int = 5, order_col: str = "count_of_clicks",
          tiebreak: str = "user_id") -> DataFrame:
    """Top-K O1 (reference bonus_pattern.py:50): ``ORDER BY count DESC
    LIMIT k``. Catalyst plans this as TakeOrderedAndProject — a per-partition
    heap + driver merge, no global sort, no full shuffle; the right plan at
    any scale. A deterministic tiebreak column makes the result set unique."""
    return summary.orderBy(F.col(order_col).desc(), F.col(tiebreak)).limit(k)
