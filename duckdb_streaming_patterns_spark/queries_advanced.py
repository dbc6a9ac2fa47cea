"""Advanced relational surface: sessionization, as-of join, range join,
percentiles, string/date functions, grouping sets, subqueries, richer
windows. All oracle-checked. These go beyond the reference's operator list
(SURVEY §2.6 notes they "come free in Spark … and should be exposed +
tested").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.registry import register, _t
from duckdb_streaming_patterns_spark.sources.tables import register_views

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds


@register(
    "sessionization",
    f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts, event_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def q_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min inactivity): lag + flag + running
    sum — one shuffle on user_id, then a same-partitioning aggregation."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select("user_id", "ts", "event_id", us.alias("us")).withColumn(
        "is_new",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "asof_join_last_click",
    """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
         c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.event_id, p.user_id, p.ts, c.ts AS last_click_ts
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — SURVEY pitfall list): for each
    purchase, the latest click at-or-before it. Composed as a union +
    last_value(ignoreNulls) window over the merged event-time order — one
    shuffle on user_id, linear scan, no range join blow-up. DuckDB oracle
    uses its native ASOF JOIN."""
    ev = _t(spark, sf_dir, "events")
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(F.col("event_type") == "click", F.col("ts")).alias("click_ts"),
    )
    # at equal ts, 'click' < 'purchase' lexicographically → the purchase row
    # sees a click with the same timestamp, matching ASOF's >= semantics
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_type", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    with_last = both.withColumn(
        "last_click_ts", F.last("click_ts", ignorenulls=True).over(w)
    )
    return with_last.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "last_click_ts"
    )


@register(
    "range_join_price_bands",
    """
    WITH bands(band, lo, hi) AS (
      VALUES ('p0_100k', 0.0, 100000.0),
             ('p100_200k', 100000.0, 200000.0),
             ('p200_350k', 200000.0, 350000.0),
             ('p350k_up', 350000.0, 1000000000.0)
    )
    SELECT band, count(*) AS n, ROUND(sum(o_totalprice), 2) AS total
    FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join against a tiny band dimension — broadcast nested
    loop on the broadcast side, the right plan for a 4-row dim at any fact
    size."""
    orders = _t(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("p0_100k", 0.0, 100_000.0),
            ("p100_200k", 100_000.0, 200_000.0),
            ("p200_350k", 200_000.0, 350_000.0),
            ("p350k_up", 350_000.0, 1_000_000_000.0),
        ],
        "band string, lo double, hi double",
    )
    joined = orders.join(
        F.broadcast(bands),
        (orders.o_totalprice >= bands.lo) & (orders.o_totalprice < bands.hi),
    )
    return joined.groupBy("band").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@register(
    "percentiles_by_segment",
    """
    SELECT c_mktsegment,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           ROUND(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`). At very large scale swap for
    `approx_percentile` (t-digest) — exposed but not oracle-comparable."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return j.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@register(
    "string_functions",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           replace(p_type, ' ', '_') AS type_snake,
           concat(p_brand, ':', CAST(p_size AS VARCHAR)) AS brand_size,
           regexp_extract(p_brand, '[0-9]+', 0) AS brand_num,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded
    FROM part
    """,
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface C-extensions: case, slice, length, replace,
    concat, regexp extraction, padding."""
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.concat_ws(":", "p_brand", F.col("p_size").cast("string")).alias("brand_size"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
    )


@register(
    "monthly_revenue",
    """
    SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS y,
           CAST(extract(month FROM o_orderdate) AS BIGINT) AS m,
           count(*) AS n_orders,
           ROUND(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY 1, 2
    """,
)
def q_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + time-bucketed aggregation."""
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "grouping_sets_revenue",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, ROUND(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube) via Spark SQL."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, ROUND(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "in_subquery_filter",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'MACHINERY')
      AND o_orderstatus = 'O'
    """,
)
def q_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (Catalyst rewrites to a semi join)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer
                            WHERE c_mktsegment = 'MACHINERY')
          AND o_orderstatus = 'O'
        """
    )


@register(
    "scalar_subquery_filter",
    """
    SELECT o_orderkey
    FROM orders
    WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (global-aggregate broadcast)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey
        FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@register(
    "having_filter",
    """
    SELECT o_custkey, count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 15
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


@register(
    "window_rank_functions",
    """
    SELECT o_custkey, o_orderkey,
           CAST(dense_rank() OVER w AS BIGINT) AS drank,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS prank,
           ROUND(cume_dist() OVER w, 6) AS cdist,
           first_value(o_orderkey) OVER w AS first_ok,
           lead(o_orderkey) OVER w AS next_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_rank_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window surface in one pass (single window spec →
    single shuffle + sort)."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.lead("o_orderkey").over(w).alias("next_ok"),
    )


@register(
    "conditional_aggregates",
    """
    SELECT user_id,
           count(*) FILTER (WHERE value > 100) AS n_big,
           ROUND(sum(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
             AS purchase_value,
           ROUND(avg(CASE WHEN event_type = 'click' THEN value END), 4)
             AS avg_click_value,
           max(event_type = 'error') AS had_error
    FROM events
    GROUP BY user_id
    """,
)
def q_conditional_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("value") > 100).alias("n_big"),
        F.round(
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    0.0
                )
            ),
            2,
        ).alias("purchase_value"),
        F.round(
            F.avg(F.when(F.col("event_type") == "click", F.col("value"))), 4
        ).alias("avg_click_value"),
        F.max(F.col("event_type") == "error").alias("had_error"),
    )


@register(
    "null_handling",
    """
    SELECT o_custkey, o_orderkey,
           coalesce(CAST(lag(o_orderkey) OVER w AS BIGINT), -1) AS prev_ok,
           CAST(nullif(o_orderstatus, 'O') IS NULL AS BOOLEAN) AS is_open
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.coalesce(F.lag("o_orderkey").over(w), F.lit(-1)).alias("prev_ok"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).isNull().alias("is_open"),
    )


# ---------------------------------------------------------------------------
# Skew mitigation (operators/skew.py) — salted plans, oracle = unsalted SQL
# ---------------------------------------------------------------------------

from duckdb_streaming_patterns_spark.operators import skew  # noqa: E402


@register(
    "user_clicks_salted",
    """
    SELECT user_id,
           count(*) AS count_of_clicks,
           max(ts)  AS updated_at
    FROM events
    WHERE event_type = 'click'
    GROUP BY user_id
    """,
)
def q_user_clicks_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship aggregation computed skew-safely: partial agg per
    (user_id, salt) then final per user_id. Oracle = the plain one-shuffle
    SQL — salting must not change any value."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    return skew.salted_two_phase_agg(
        ev,
        keys=["user_id"],
        salt_src="event_id",
        aggs={
            "count_of_clicks": ("*", "count"),
            "updated_at": ("ts", "max"),
        },
    )


@register(
    "salted_join_segment_revenue",
    """
    SELECT c_mktsegment, ROUND(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def q_salted_join_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment through a salted fact→dim join (customer
    replicated 8×, orders salted on o_orderkey). Oracle = the plain join —
    salting must be value-invisible."""
    orders = _t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    cust = _t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    joined = skew.salted_join(
        orders,
        cust.select("custkey", "c_mktsegment"),
        on=["custkey"],
        salt_src="o_orderkey",
        n_salts=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count("*").alias("n_orders"),
    )


@register(
    "rolling_30d_revenue",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
                 PARTITION BY o_custkey
                 ORDER BY date_diff('day', DATE '1970-01-01',
                                    CAST(o_orderdate AS DATE))
                 RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_30d
    FROM orders
    """,
)
def q_rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-customer 30-day trailing revenue per
    order. The frame key is integer days-since-epoch so the RANGE bounds
    are engine-identical (interval-literal frames differ subtly between
    dialects), and the frame sum runs in DECIMAL so peers' addition order
    cannot move the rounded output. One shuffle on the partition key;
    frame state per row is O(frame span), independent of history length."""
    orders = _t(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("rolling_30d"),
    )


@register(
    "bucketed_join_revenue",
    """
    SELECT o_orderstatus,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join through bucketed-at-rest tables (operators/layout.py):
    the SortMergeJoin reads co-located bucketed scans with zero Exchange
    (plan-asserted). Oracle = the plain join on raw parquet — physical
    layout must be value-invisible."""
    from duckdb_streaming_patterns_spark.operators import layout

    return layout.bucketed_revenue_by_status(spark, sf_dir)


@register(
    "partition_pruned_daily_clicks",
    """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
           count(*) AS n_clicks
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-12'
      AND event_type = 'click'
    GROUP BY 1
    """,
)
def q_partition_pruned_daily_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-window clicks from the date-partitioned layout
    (operators/layout.py): the range predicate becomes PartitionFilters on
    the scan, so only 3 of 30 day-directories are read. Oracle = the same
    aggregation over the unpartitioned raw table."""
    from duckdb_streaming_patterns_spark.operators import layout

    return layout.pruned_daily_clicks(spark, sf_dir, "2024-01-10", "2024-01-12")


@register(
    "zorder_boxed_clicks",
    """
    SELECT user_id, count(*) AS n_clicks
    FROM events
    WHERE event_type = 'click'
      AND user_id BETWEEN 3 AND 7
      AND CAST(ts AS DATE) BETWEEN DATE '2024-01-06' AND DATE '2024-01-10'
    GROUP BY user_id
    """,
)
def q_zorder_boxed_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimensional data skipping: clicks inside a (user × day) box,
    read from the Morton-z-clustered layout (operators/layout.py) with
    files skipped by parquet footer min/max stats — pruning a partition
    directory can't express (the box constrains TWO dimensions). The skip
    is stats-only; the exact predicate still applies, so the oracle over
    raw parquet checks layout-invisibility while
    tests/test_plans.py pins that files were actually skipped."""
    from duckdb_streaming_patterns_spark.operators import layout

    # day offsets 5..9 = 2024-01-06..2024-01-10 (fixture epoch 2024-01-01)
    return layout.zorder_boxed_clicks(spark, sf_dir, 3, 7, 5, 9)


@register(
    "sessionization_session_window",
    f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS seq
      FROM flagged
    )
    SELECT user_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM numbered GROUP BY user_id, seq
    """,
)
def q_sessionization_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization via the NATIVE ``F.session_window`` aggregation —
    Catalyst's own merging-session operator (one shuffle on user_id, windows
    merged inside the aggregation), vs. the lag+cumsum formulation above and
    the applyInPandasWithState streaming operator; all three agree with the
    same batch oracle. Boundary semantics: an event at exactly
    last_event + gap EXTENDS the session (gap-inclusive merge — pinned by
    a unit test with an exact-gap pair), so the oracle's break condition
    is strictly > gap, identical to the lag+cumsum formulation."""
    ev = _t(spark, sf_dir, "events")
    sw = F.session_window(F.col("ts").cast("timestamp"), "30 minutes")
    return (
        ev.groupBy("user_id", sw)
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "n_events", "session_start", "session_end")
    )


@register(
    "dpp_pruned_daily_clicks",
    """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS event_date,
           count(*) AS n_clicks
    FROM events
    WHERE day(CAST(ts AS DATE)) IN (5, 15, 25)
      AND event_type = 'click'
    GROUP BY 1
    """,
)
def q_dpp_pruned_daily_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning over the date-partitioned layout: the
    day filter lives on a broadcast dimension, so the fact scan's
    partition list is resolved at RUNTIME (dynamicpruningexpression in
    PartitionFilters, plan-asserted) — the star-schema complement of the
    static-literal pruning `partition_pruned_daily_clicks` proves."""
    from duckdb_streaming_patterns_spark.operators import layout

    return layout.dpp_daily_clicks(spark, sf_dir, (5, 15, 25))
