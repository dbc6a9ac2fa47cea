"""TPC-H completion set: the nine query shapes queries_tpch.py does not
cover (Q2, Q8, Q11, Q12, Q13, Q16, Q17, Q20, Q21), adapted to the fixture
schema. The fixtures have no partsupp table and no
l_shipmode/l_commitdate/l_receiptdate columns, so:

- partsupp is derived as the distinct (l_partkey, l_suppkey) relation from
  lineitem, with "supplycost" = min unit price and "value" = shipped
  revenue — the same correlated-min / threshold-HAVING plan shapes over an
  equivalent relation;
- Q12's shipmode split becomes a returnflag split, Q21's late-delivery
  predicate becomes a returned-line predicate — identical join/exists
  topology, different literal.

Scale notes (the 100 TB story), continuing queries_tpch.py:
- the derived partsupp aggregates lineitem once on (l_partkey, l_suppkey)
  — at scale this is THE shuffle; everything after it is
  broadcast-joinable because part×supplier cardinality << lineitem;
- correlated scalar subqueries (Q2 min, Q17 avg) become per-key
  aggregates joined back — never a per-row recomputation;
- EXISTS/NOT EXISTS with inequality correlation (Q21) becomes per-order
  distinct-supplier counts — one aggregation replaces two correlated
  scans of the fact table;
- threshold comparisons against floating sums (Q11) run in DECIMAL so the
  HAVING cut is exact and engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_streaming_patterns_spark.registry import register, _t


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


def _rev():
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _partsupp_cost(spark, sf_dir, part_keys=None):
    """Surrogate partsupp: min observed unit price per (part, supplier).

    ``part_keys`` (a one-column DataFrame of p_partkey) pre-filters the
    fact scan with a broadcast semi-join BEFORE the aggregation — at
    100 TB the part predicate must reach lineitem first, or the one big
    shuffle carries every part's rows just to drop most of them later."""
    li = _t(spark, sf_dir, "lineitem")
    if part_keys is not None:
        li = li.join(
            F.broadcast(part_keys),
            li.l_partkey == F.col(part_keys.columns[0]),
            "left_semi",
        )
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )


_PS_COST_SQL = """
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
"""


@register(
    "q2_min_cost_supplier",
    f"""
    WITH ps AS ({_PS_COST_SQL}),
    scoped AS (
      SELECT p_partkey, p_name, s_name, n_name, s_acctbal, supplycost
      FROM ps
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'PROMO'
    )
    SELECT ROUND(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name
    FROM scoped
    WHERE supplycost = (SELECT min(supplycost) FROM scoped s2
                        WHERE s2.p_partkey = scoped.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest supplier per part within a region. The
    correlated min-subquery becomes a groupBy-min on the region-scoped
    derived partsupp, broadcast back into an equality filter — the fact
    table is aggregated exactly once. The min is over identical IEEE
    division results on both engines, so the equality is exact. The part
    predicate pre-filters the lineitem aggregation via broadcast semi-join
    (the scoped relation only contains qualifying parts anyway)."""
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "PROMO"))
        .select("p_partkey", "p_name")
    )
    ps = _partsupp_cost(
        spark, sf_dir, part_keys=part.select(F.col("p_partkey").alias("pk"))
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    scoped = (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), ps.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "s_acctbal", "supplycost")
    )
    min_cost = scoped.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("supplycost").alias("min_cost")
    )
    return (
        scoped.join(
            F.broadcast(min_cost),
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q8_national_market_share",
    """
    SELECT o_year,
           ROUND(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of regional import volume by year.
    Seven-table join where every dimension side (part, supplier, customer,
    nation x2, region) broadcasts; lineitem->orders is the only shuffled
    join. The share is a conditional-sum ratio in one aggregation pass."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1998-01-01 00:00:00"))
    )
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nk"))
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk")
    ).select("c_custkey")
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    vol = _rev()
    target = F.when(F.col("nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(F.round(F.sum(target) / F.sum(vol), 6).alias("mkt_share"))
    )


@register(
    "q11_important_stock",
    """
    WITH ps AS (
      SELECT l_partkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS
                             DECIMAL(28,2)) AS value
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_1'
      GROUP BY l_partkey
    )
    SELECT l_partkey AS ps_partkey, CAST(value AS DOUBLE) AS part_value
    FROM ps
    WHERE value > (SELECT CAST(sum(value) * 0.001 AS DECIMAL(38,6)) FROM ps)
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing a significant fraction of one
    nation's shipped value. The threshold compare runs in DECIMAL — exact
    arithmetic, so the cut is identical on any engine and any partial-sum
    order (a double sum near the threshold would be nondeterministic).
    The scalar total is a one-row broadcast."""
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("value")
        )
    )
    total = ps.agg(
        (F.sum("value") * F.lit(0.001).cast("decimal(4,3)"))
        .cast("decimal(38,6)")
        .alias("threshold")
    )
    return (
        ps.join(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("value").cast("double").alias("part_value"),
        )
    )


@register(
    "q12_priority_by_returnflag",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('R', 'A')
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode -> returnflag: the fixture has no
    l_shipmode). Fact-fact equi-join on the order key with both date and
    flag predicates pushed to the lineitem scan, then a two-way
    conditional count — one shuffle, two output rows."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias(
                "high_line_count"
            ),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias(
                "low_line_count"
            ),
        )
    )


@register(
    "q13_customer_order_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, count(o_orderkey) AS c_count
          FROM customer LEFT OUTER JOIN orders
            ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
          GROUP BY c_custkey) c_orders
    GROUP BY c_count
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: histogram of orders-per-customer (customers with zero
    orders included via the outer join; the priority predicate lives in
    the join condition, not a post-filter, so unmatched customers
    survive). Two aggregations: per-customer, then per-count — the second
    input is tiny."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@register(
    "q16_supplier_part_counts",
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier diversity per part class, excluding
    flagged suppliers (acctbal < 0 stands in for the complaints LIKE —
    same NOT-IN -> anti-join plan). The distinct part-supplier pairs come
    from one lineitem aggregation; the exclusion list is tiny and
    broadcast as a left-anti join (keys are non-null, so NOT IN and anti
    are equivalent). The part predicate semi-joins into the fact scan
    BEFORE the distinct, so the dedup shuffle carries only qualifying
    parts' pairs."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.join(
            F.broadcast(part.select(F.col("p_partkey").alias("fk"))),
            li.l_partkey == F.col("fk"),
            "left_semi",
        )
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    flagged = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(part), ps.l_partkey == part.p_partkey)
        .join(F.broadcast(flagged), ps.l_suppkey == flagged.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    """
    SELECT ROUND(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3' AND p_size < 10
      AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost by eliminating small-quantity orders. The
    correlated per-part average becomes one groupBy over lineitem joined
    back by part key (quantities are exact integers in double, so the
    0.5*avg threshold is engine-stable). At scale the per-part averages
    relation is part-sized — broadcastable; its input is pre-filtered to
    qualifying part keys via broadcast semi-join so the aggregation never
    shuffles non-qualifying parts' rows (the correlated subquery only
    ever probes qualifying parts)."""
    li = _t(spark, sf_dir, "lineitem")
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10))
        .select("p_partkey")
    )
    avg_qty = (
        li.join(
            F.broadcast(part.select(F.col("p_partkey").alias("fk"))),
            li.l_partkey == F.col("fk"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("ak"))
        .agg(F.avg("l_quantity").alias("avg_qty"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(avg_qty), li.l_partkey == F.col("ak"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q20_promotable_suppliers",
    """
    SELECT s_name, ROUND(s_acctbal, 2) AS s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'SMALL'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 50)
    """,
)
def q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved real volume of a part class in
    a year (availqty threshold becomes a shipped-quantity threshold — no
    partsupp). Nested IN becomes: aggregate shipped qty per
    (supplier, part), filter, project supplier keys, left-semi join into
    the nation-filtered supplier table. Quantities are exact ints in
    double, so the HAVING cut is stable."""
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "SMALL")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-01-01 00:00:00"))
    )
    movers = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(movers, supp.s_suppkey == movers.l_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
    )


@register(
    "q21_sole_returning_supplier",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND n_name = 'NATION_1'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the supplier solely responsible for returns on
    multi-supplier finished orders (returnflag stands in for the
    receipt>commit lateness predicate). The EXISTS pair with inequality
    correlation is re-expressed as per-order distinct-supplier counts:
    n_supp >= 2 <=> another supplier exists; distinct returning suppliers
    == 1 <=> no OTHER supplier returned (l1 itself is returning), and
    numwait = that sole supplier's returned-line count. Lineitem is
    shuffled ONCE — a per-(order, supplier) aggregate — and both
    order-level stats come from a window over that (much smaller)
    relation; the order-status check joins against the aggregate, never
    the raw fact table. The classic decorrelation done by hand so the
    plan is join-shaped at 100 TB."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("n_r_lines")
    )
    w = Window.partitionBy("l_orderkey")
    stats = per_pair.select(
        "*",
        F.count("*").over(w).alias("n_supp"),
        F.sum((F.col("n_r_lines") > 0).cast("int")).over(w).alias("n_ret_supp"),
    )
    qual = stats.filter(
        (F.col("n_r_lines") > 0)
        & (F.col("n_supp") >= 2)
        & (F.col("n_ret_supp") == 1)
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    nation = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    return (
        qual.join(orders, qual.l_orderkey == orders.o_orderkey, "left_semi")
        .join(F.broadcast(supp), qual.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("n_r_lines").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
