"""Core relational queries (TPC-H-shaped) over the fixture star schema.

These exercise the heart of SURVEY §2B: scan → filter → project → join →
groupBy/agg → orderBy/limit. In the reference every one of these shapes is a
mapper/reducer executable pair over the seven dataflow primitives (SURVEY §2A
A3/A4/A5/A7/A8, reference worker/__main__.py:113-192); here each is a single
declarative DataFrame plan so Catalyst applies pushdown/pruning/join
selection and AQE handles skew at scale.

Scale notes (100 TB): lineitem/orders are the big fact tables — every query
below joins facts on their natural keys (shuffle on join key, map-side
partial aggregation automatic) and dimensions (region/nation/customer/
supplier/part) stay broadcast-able. Money aggregates follow the exact-decimal
policy of functions/numeric.py (no double summation, no rounding) so results
are bit-deterministic at any partition count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import broadcast, col

from map_reduce_group_spark.catalog import load_table
from map_reduce_group_spark.functions.numeric import (
    davg,
    dec2double,
    dsum,
    dsum_expr,
    money,
    rate,
    sql_davg,
    sql_dsum,
)
from map_reduce_group_spark.plans.registry import register

# exact decimal revenue term: price × (1 − discount), optionally × (1 + tax)
_DISC_PRICE_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))"
_CHARGE_SQL = f"{_DISC_PRICE_SQL} * (1 + CAST(l_tax AS DECIMAL(3,2)))"


def _disc_price() -> F.Column:
    return money("l_extendedprice") * (F.lit(1) - rate("l_discount"))


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
        l_returnflag,
        l_linestatus,
        {sql_dsum('l_quantity')}                          AS sum_qty,
        {sql_dsum('l_extendedprice')}                     AS sum_base_price,
        CAST(CAST(sum({_DISC_PRICE_SQL}) AS VARCHAR) AS DOUBLE)            AS sum_disc_price,
        CAST(CAST(sum({_CHARGE_SQL}) AS VARCHAR) AS DOUBLE)                AS sum_charge,
        {sql_davg('l_quantity')}                          AS avg_qty,
        {sql_davg('l_extendedprice')}                     AS avg_price,
        (CAST(CAST(sum(CAST(l_discount AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE) / count(*)) AS avg_disc,
        count(*)                                          AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan→filter→groupBy→multi-agg (flagship query).

    The canonical reduce pattern of the reference (worker/__main__.py:174-181)
    — Spark runs it as partial+final hash aggregate, no sort needed.
    """
    li = load_table(spark, sf_dir, "lineitem")
    charge = _disc_price() * (F.lit(1) + rate("l_tax"))
    return (
        li.filter(col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_expr(_disc_price()).alias("sum_disc_price"),
            dsum_expr(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            (dec2double(F.sum(rate("l_discount"))) / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT
        l_orderkey,
        CAST(CAST(sum({_DISC_PRICE_SQL}) AS VARCHAR) AS DOUBLE) AS revenue,
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
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-k.

    Joins are the canonical two-input MR pattern (SURVEY §2B joins table);
    here: broadcast the filtered customer dimension, shuffle-join the two
    facts on orderkey, TakeOrderedAndProject for the limit (no global sort).
    """
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(col("o_orderdate") < cutoff)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(col("l_shipdate") > cutoff)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(cust), col("o_custkey") == col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_expr(_disc_price()).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc(), col("l_orderkey"))
        .limit(10)
    )


@register(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS ⇒ left-semi join, then count by group.

    The MR realization is "reducer emits left rows iff right group non-empty"
    (SURVEY §2B); Spark's left_semi join does it without materializing the
    right side's payload.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (col("l_orderkey") == col("o_orderkey")) & (col("l_shipdate") > col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, CAST(CAST(sum({_DISC_PRICE_SQL}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey  = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (2 facts + 4 broadcast dims) + agg."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(col("r_name") == "ASIA")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(cust.select("c_custkey", "c_nationkey")), col("o_custkey") == col("c_custkey"))
        .join(
            broadcast(supp.select("s_suppkey", "s_nationkey")),
            (col("l_suppkey") == col("s_suppkey")) & (col("c_nationkey") == col("s_nationkey")),
        )
        .join(broadcast(nation), col("s_nationkey") == col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") == col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum_expr(_disc_price()).alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.06
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter+agg; all predicates push to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (col("l_discount") >= 0.04)
        & (col("l_discount") <= 0.06)
        & (col("l_quantity") < 24)
    ).agg(dsum_expr(money("l_extendedprice") * rate("l_discount")).alias("revenue"))


@register(
    "project_filter_compute",
    oracle=f"""
    SELECT
        l_orderkey,
        l_linenumber,
        CAST({_CHARGE_SQL} AS DOUBLE)                           AS charge,
        CASE WHEN l_quantity >= 25 THEN 'bulk' ELSE 'small' END AS qty_class
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity > 45
    """,
)
def project_filter_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-only job shape (SURVEY §2B projections/filters): select + computed
    columns + predicate, zero shuffles — the whole plan is one codegen stage.
    The computed charge is exact decimal arithmetic cast to double (per-row
    round() on doubles is engine-divergent — functions/numeric.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    charge = _disc_price() * (F.lit(1) + rate("l_tax"))
    return li.filter((col("l_returnflag") == "R") & (col("l_quantity") > 45)).select(
        "l_orderkey",
        "l_linenumber",
        charge.cast("double").alias("charge"),
        F.when(col("l_quantity") >= 25, "bulk").otherwise("small").alias("qty_class"),
    )


@register(
    "q7_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           CAST(CAST(sum({_DISC_PRICE_SQL}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two facts + the SAME dimension joined twice under
    different roles (supplier-nation vs customer-nation) + a disjunctive
    cross-role predicate + agg by (nation pair, year).

    Scale: the disjunctive pair predicate implies BOTH roles lie in the
    two-nation set, and Catalyst cannot distribute that OR through the
    joins on its own — so each fact side is pre-filtered through its
    broadcast dimension subset BEFORE the fact-fact shuffle (lineitem
    semi-reduced by the 2-nation supplier set, orders by the 2-nation
    customer set): ~8% of each fact reaches the orderkey join instead of
    100% (measured 35 s → ~8 s at the 100×/60M-row fixture). The residual
    pair filter then only rejects the two same-direction combinations."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    pair = ("NATION_3", "NATION_7")
    n1 = nation.select(
        col("n_nationkey").alias("n1_key"), col("n_name").alias("supp_nation")
    ).filter(col("supp_nation").isin(*pair))
    n2 = nation.select(
        col("n_nationkey").alias("n2_key"), col("n_name").alias("cust_nation")
    ).filter(col("cust_nation").isin(*pair))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    supp_f = supp.join(broadcast(n1), col("s_nationkey") == col("n1_key")).select(
        "s_suppkey", "supp_nation"
    )
    cust_f = cust.join(broadcast(n2), col("c_nationkey") == col("n2_key")).select(
        "c_custkey", "cust_nation"
    )
    li_f = li.join(broadcast(supp_f), col("l_suppkey") == col("s_suppkey"))
    orders_f = orders.join(broadcast(cust_f), col("o_custkey") == col("c_custkey"))
    return (
        li_f.join(orders_f, col("l_orderkey") == col("o_orderkey"))
        .filter(
            ((col("supp_nation") == pair[0]) & (col("cust_nation") == pair[1]))
            | ((col("supp_nation") == pair[1]) & (col("cust_nation") == pair[0]))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(dsum_expr(_disc_price()).alias("revenue"))
    )


@register(
    "q8_market_share",
    oracle=f"""
    WITH all_sales AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               {_DISC_PRICE_SQL} AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        JOIN part     ON l_partkey = p_partkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           (CAST(CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS VARCHAR) AS DOUBLE)
            / CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE)) AS mkt_share,
           CAST(CAST(sum(volume) AS VARCHAR) AS DOUBLE) AS total_volume
    FROM all_sales
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: 8-way join + conditional aggregation (one nation's
    share of regional volume per year). The numerator is sum(CASE WHEN ...)
    over the same rows as the denominator — one aggregate pass, not two
    scans. Both sums are exact decimal; the share is a single double
    division of two exact values (deterministic, functions/numeric.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        col("n_nationkey").alias("n1_key"), col("n_regionkey").alias("n1_region")
    )
    region = load_table(spark, sf_dir, "region").filter(col("r_name") == "ASIA")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n2 = load_table(spark, sf_dir, "nation").select(
        col("n_nationkey").alias("n2_key"), col("n_name").alias("supp_nation")
    )
    part = load_table(spark, sf_dir, "part").filter(col("p_type") == "PROMO").select("p_partkey")
    vol = _disc_price()
    num = F.sum(F.when(col("supp_nation") == "NATION_3", vol))
    den = F.sum(vol)
    return (
        li.join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") == col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") == col("n1_key"))
        .join(broadcast(region), col("n1_region") == col("r_regionkey"))
        .join(broadcast(supp), col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") == col("n2_key"))
        .join(broadcast(part), col("l_partkey") == col("p_partkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (dec2double(num) / dec2double(den)).alias("mkt_share"),
            dec2double(den).alias("total_volume"),
        )
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(CAST(sum({_DISC_PRICE_SQL}
                         - CAST(p_retailprice AS DECIMAL(12,2))
                           * CAST(l_quantity AS DECIMAL(12,2))
                           * CAST(0.10 AS DECIMAL(3,2))) AS VARCHAR) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%ring%'
    GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by (supplier nation, order year) for parts
    matching a name pattern. The fixture has no partsupp table, so unit cost
    is modeled as 10% of p_retailprice (the SHAPE — multi-fact join with a
    computed profit expression aggregated two levels up — is what Q9
    exercises). All money arithmetic stays in exact decimals until the final
    cast (functions/numeric.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(col("p_name").like("%ring%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    nation = load_table(spark, sf_dir, "nation")
    profit = _disc_price() - money("p_retailprice") * money("l_quantity") * rate(F.lit(0.10))
    return (
        li.join(broadcast(part), col("l_partkey") == col("p_partkey"))
        .join(broadcast(supp), col("l_suppkey") == col("s_suppkey"))
        .join(orders, col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(nation), col("s_nationkey") == col("n_nationkey"))
        .groupBy(
            col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(dsum_expr(profit).alias("sum_profit"))
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(CAST(sum({_DISC_PRICE_SQL}) AS VARCHAR) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-04-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter — 4-way
    join, agg keyed by the customer tuple, deterministic top-20
    (TakeOrderedAndProject; ties broken by c_custkey)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (col("o_orderdate") >= F.lit("1996-04-01 00:00:00").cast("timestamp"))
        & (col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") == col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") == col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum_expr(_disc_price()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc(), col("c_custkey"))
        .limit(20)
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               min(CAST(l_extendedprice AS DECIMAL(12,2))) AS supply_price
        FROM lineitem GROUP BY 1, 2
    ), eligible AS (
        SELECT partkey, suppkey, supply_price, s_name, n_name
        FROM ps
        JOIN supplier ON suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s_name, n_name, p_partkey, p_type,
           CAST(CAST(e.supply_price AS VARCHAR) AS DOUBLE) AS supply_price
    FROM eligible e
    JOIN part ON e.partkey = p_partkey
    WHERE p_size <= 10
      AND e.supply_price = (
        SELECT min(e2.supply_price) FROM eligible e2 WHERE e2.partkey = e.partkey
      )
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated min-aggregate subquery — for each small
    part, the EUROPE supplier(s) offering its minimum price. The fixture has
    no partsupp, so the part-supplier price relation is derived from
    lineitem (min extendedprice per part-supplier pair).

    The correlated subquery realizes as a per-part min window over the
    eligible relation + equality filter — one shuffle on partkey, no
    re-scan of the subquery side (Catalyst would do the same de-correlation
    for the SQL form). The price comparison is decimal = decimal (exact);
    the cast to double happens only on output."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    ps = (
        li.groupBy(col("l_partkey").alias("partkey"), col("l_suppkey").alias("suppkey"))
        .agg(F.min(money("l_extendedprice")).alias("supply_price"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey", "s_name")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(col("r_name") == "EUROPE")
    eligible = (
        ps.join(broadcast(supp), col("suppkey") == col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") == col("n_nationkey"))
        .join(broadcast(region), col("n_regionkey") == col("r_regionkey"))
        .select("partkey", "suppkey", "supply_price", "s_name", "n_name")
    )
    w = Window.partitionBy("partkey")
    best = eligible.withColumn("min_price", F.min("supply_price").over(w)).filter(
        col("supply_price") == col("min_price")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(col("p_size") <= 10)
        .select("p_partkey", "p_type")
    )
    return best.join(broadcast(part), col("partkey") == col("p_partkey")).select(
        "s_name",
        "n_name",
        "p_partkey",
        "p_type",
        dec2double(col("supply_price")).alias("supply_price"),
    )
