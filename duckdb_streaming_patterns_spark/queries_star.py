"""Star-schema query surface (SURVEY §2.5-§2.7 capability parity).

The reference expresses only one join (the MERGE upsert-join); capability
parity requires the full relational join/window/set-op surface, exercised
here over the TPC-H-ish fixtures. Every query is registered with a DuckDB
oracle.

Scale notes (the 100 TB story):
- dimension tables (region/nation/customer/supplier/part) are broadcast —
  no shuffle of the fact table for dim joins;
- fact-fact aggregation shuffles once on the group key with map-side
  partial aggregation;
- top-k is TakeOrderedAndProject (per-partition heap), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.registry import register, _t


# ---------------------------------------------------------------------------
# Aggregations over the fact table
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag,
           l_linestatus,
           ROUND(sum(l_quantity), 2)      AS sum_qty,
           ROUND(sum(l_extendedprice), 2) AS sum_base_price,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(avg(l_quantity), 4)      AS avg_qty,
           ROUND(avg(l_extendedprice), 4) AS avg_price,
           ROUND(avg(l_discount), 4)      AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → pushed filter → 2-key hash agg with 8
    aggregates. Partial aggregation keeps shuffle rows = #groups (6)."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → broadcast customer into
    orders, join lineitem, agg, top-10. customer is broadcast explicitly
    (dims are small relative to facts at every SF)."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp_ntz")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        li.join(
            F.broadcast(
                orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )
    return df.orderBy(F.col("revenue").desc(), F.col("l_orderkey")).limit(10)


@register(
    "q5_region_revenue",
    """
    SELECT n_name,
           ROUND(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join. All dims broadcast; the only
    shuffle is lineitem↔orders (co-partitioned on orderkey) + final 5-group
    agg."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    df = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )
    return df


@register(
    "top_customers_by_spend",
    """
    SELECT c_custkey, c_name,
           ROUND(sum(o_totalprice), 2) AS spend,
           count(*) AS n_orders
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY spend DESC, c_custkey
    LIMIT 10
    """,
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    df = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("spend"),
            F.count("*").alias("n_orders"),
        )
    )
    return df.orderBy(F.col("spend").desc(), F.col("c_custkey")).limit(10)


# ---------------------------------------------------------------------------
# Join-type surface: left / semi / anti / correlated-derived
# ---------------------------------------------------------------------------


@register(
    "customer_order_counts_left",
    """
    SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q_customer_order_counts_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving zero-order customers."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "customers_with_orders_semi",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join ↔ EXISTS."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "customers_without_urgent_orders_anti",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def q_customers_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join ↔ NOT EXISTS (filtered right side so the result is
    non-empty: the fixtures have full referential integrity)."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "orders_above_customer_avg",
    """
    SELECT o_orderkey
    FROM orders
    JOIN (SELECT o_custkey AS k, avg(o_totalprice) AS avg_price
          FROM orders GROUP BY o_custkey) sub
      ON o_custkey = k
    WHERE o_totalprice > avg_price
    """,
)
def q_orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-table self-join (decorrelated correlated subquery)."""
    orders = _t(spark, sf_dir, "orders")
    avg_per_cust = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.avg("o_totalprice").alias("avg_price")
    )
    return (
        orders.join(avg_per_cust, orders.o_custkey == avg_per_cust.k)
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@register(
    "top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group via row_number window — the scalable per-group top-k
    (single shuffle on the partition key, no global sort)."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", F.col("rn").cast("bigint").alias("rn"))
    )


@register(
    "customer_running_spend",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
    FROM orders
    """,
)
def q_customer_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total — explicit ROWS frame over a total order, so both
    engines accumulate in the identical sequence."""
    orders = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
    )


@register(
    "order_gap_days_lag",
    """
    SELECT o_custkey, o_orderkey,
           CAST(date_diff('day',
                lag(o_orderdate) OVER (PARTITION BY o_custkey
                                       ORDER BY o_orderdate, o_orderkey),
                o_orderdate) AS BIGINT) AS gap_days
    FROM orders
    """,
)
def q_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() + date arithmetic: days since the customer's previous order."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("bigint").alias("gap_days"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "keys_union_all",
    """
    SELECT k, count(*) AS n FROM (
      SELECT c_custkey AS k FROM customer
      UNION ALL
      SELECT o_custkey AS k FROM orders
    ) GROUP BY k
    """,
)
def q_keys_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k"))
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    return cust.unionAll(orders).groupBy("k").agg(F.count("*").alias("n"))


@register(
    "keys_intersect",
    """
    SELECT c_custkey FROM customer
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
    """,
)
def q_keys_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return cust.intersect(orders)


@register(
    "keys_except",
    """
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def q_keys_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    finished = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return cust.exceptAll(finished).distinct()


# ---------------------------------------------------------------------------
# Grouping sets / pivot
# ---------------------------------------------------------------------------


@register(
    "rollup_region_nation_customers",
    """
    SELECT r_name, n_name, count(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(F.count("*").alias("n_customers"))


@register(
    "cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, ROUND(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total")
    )


@register(
    "events_pivot_by_type",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS click,
           count(*) FILTER (WHERE event_type = 'view')     AS view,
           count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           count(*) FILTER (WHERE event_type = 'signup')   AS signup,
           count(*) FILTER (WHERE event_type = 'error')    AS error
    FROM events GROUP BY user_id
    """,
)
def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot — spark .pivot() with explicit value list (never let the engine
    scan for distinct pivot values at scale); nulls filled to 0 to match
    SQL's count FILTER semantics."""
    ev = _t(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


@register(
    "events_hourly_window",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           ROUND(sum(value), 2) AS total_value
    FROM events
    GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window T7 — the batch shape of the streaming
    windowed aggregation (same F.window drives Structured Streaming)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
