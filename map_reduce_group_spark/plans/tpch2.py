"""TPC-H shapes Q11-Q22 over the fixture star schema (continuation of
plans/tpch.py — kept separate only to bound file size).

The fixture omits several TPC-H columns (partsupp, l_shipmode, l_commitdate,
l_receiptdate, c_phone, comments); each query keeps the SHAPE the original
exercises — nested aggregates over joins, global-total scalar subqueries,
correlated averages, multi-EXISTS — and adapts the predicates to the
columns that exist.  Every adaptation is noted in the docstring.

Scale notes follow plans/tpch.py: lineitem/orders are the facts (shuffle on
natural keys, partial aggregation automatic), all dimension sides broadcast,
money stays in exact decimals until the final cast (functions/numeric.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
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

_DISC_PRICE_SQL = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(3,2)))"


def _disc_price() -> F.Column:
    return money("l_extendedprice") * (F.lit(1) - rate("l_discount"))


@register(
    "q11_important_stock",
    oracle="""
    WITH ps AS (
        SELECT l_partkey AS partkey,
               sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY 1
    )
    SELECT partkey, CAST(CAST(value AS VARCHAR) AS DOUBLE) AS value
    FROM ps
    WHERE value > (SELECT sum(value) FROM ps) * 60.0 / (SELECT count(*) FROM lineitem)
    ORDER BY value DESC, partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value vs a GLOBAL-total scalar subquery
    (HAVING value > fraction of the grand total). No partsupp in the fixture,
    so value = sum(extendedprice x quantity) of one nation's suppliers'
    lineitems.

    The threshold fraction is 60/|lineitem| — data-size-relative, mirroring
    TPC-H's own 0.0001/SF scaling (a FIXED fraction degenerates to the empty
    set as data grows: with ~n lineitems per part, relative deviation from
    the uniform share shrinks as 1/sqrt(n), measured 394 rows at sf0.01 but
    0 at sf0.1 under the fixed form).

    The scalar subqueries realize as 1-row aggregates cross-joined
    (broadcast) against the grouped relation — the grouped relation is
    computed ONCE and reused for both sides, not re-scanned."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(col("n_name") == "NATION_3")
    ps = (
        li.join(broadcast(supp), col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") == col("n_nationkey"))
        .groupBy(col("l_partkey").alias("partkey"))
        .agg(F.sum(money("l_extendedprice") * money("l_quantity")).alias("value"))
    )
    n_li = li.agg(F.count(F.lit(1)).alias("n_li"))
    total = ps.agg(F.sum("value").alias("grand_total")).crossJoin(broadcast(n_li)).select(
        (col("grand_total") * F.lit(60.0) / col("n_li")).alias("threshold")
    )
    return (
        ps.join(broadcast(total))
        .filter(col("value") > col("threshold"))
        .select("partkey", dec2double(col("value")).alias("value"))
        .orderBy(col("value").desc(), col("partkey"))
    )


@register(
    "q12_priority_by_status",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate > o_orderdate
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + dual conditional counts per group.
    The fixture has no l_shipmode/l_commitdate/l_receiptdate; l_linestatus
    stands in as the grouping dim and "shipped after ordering" as the lateness
    predicate — the shape (CASE-split counts inside one aggregate pass) is
    what Q12 exercises."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, col("o_orderkey") == col("l_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two-level aggregation — orders per customer (LEFT
    join keeps zero-order customers, with an ON-clause filter), then the
    histogram of those counts. The comment-pattern exclusion becomes a
    priority exclusion (no o_comment in the fixture).

    Scale: first agg shuffles on custkey; the histogram input is one row per
    customer, so the second shuffle is tiny."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (col("c_custkey") == col("o_custkey")) & (col("o_orderpriority") != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(col("custdist").desc(), col("c_count").desc())
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT (100.0 * CAST(CAST(sum(CASE WHEN p_type = 'PROMO' THEN {_DISC_PRICE_SQL} END) AS VARCHAR) AS DOUBLE)
            / CAST(CAST(sum({_DISC_PRICE_SQL}) AS VARCHAR) AS DOUBLE)) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo share of one month's revenue — conditional
    numerator over the same aggregate pass as the denominator; part side
    broadcast. Both sums exact decimal; one double division at the end."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    num = F.sum(F.when(col("p_type") == "PROMO", _disc_price()))
    den = F.sum(_disc_price())
    return (
        li.join(broadcast(part), col("l_partkey") == col("p_partkey"))
        .agg((F.lit(100.0) * dec2double(num) / dec2double(den)).alias("promo_revenue"))
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum({_DISC_PRICE_SQL}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name,
           CAST(CAST(total_revenue AS VARCHAR) AS DOUBLE) AS total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving the quarter's MAX revenue —
    a view aggregated once, then compared against its own global max (scalar
    subquery). Realized as 1-row max broadcast back over the view (computed
    once); the decimal = decimal equality is exact, so ties are kept exactly
    as the SQL does."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    revenue = li.groupBy(col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(broadcast(mx))
        .filter(col("total_revenue") == col("max_revenue"))
        .join(broadcast(supp), col("supplier_no") == col("s_suppkey"))
        .select("s_suppkey", "s_name", dec2double(col("total_revenue")).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "q16_part_supplier_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 7, 14, 23, 36, 45, 49, 3)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    bucket with NOT-predicates and an IN-list on the dimension. partsupp is
    derived from lineitem (who actually supplied the part). The supplier
    complaint NOT-EXISTS is dropped (no comments in fixture); the distinct
    aggregation + exclusion predicates are the exercised shape."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(
            (col("p_brand") != "Brand#1")
            & (col("p_type") != "PROMO")
            & col("p_size").isin(1, 7, 14, 23, 36, 45, 49, 3)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(broadcast(part), col("l_partkey") == col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
        SELECT 0.5 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated per-part average subquery — lines whose
    quantity is below half their part's average quantity. Realized as an
    avg window over partkey (one shuffle, no re-scan); the brand filter
    applies AFTER the per-part average so the correlated average is over
    ALL lineitems of the part, exactly as the SQL's inner query is.
    p_container doesn't exist; brand alone selects the part family."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    with_avg = li.withColumn("part_avg_qty", F.avg("l_quantity").over(w))
    part = (
        load_table(spark, sf_dir, "part")
        .filter(col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    return (
        with_avg.join(broadcast(part), col("l_partkey") == col("p_partkey"))
        .filter(col("l_quantity") < F.lit(0.5) * col("part_avg_qty"))
        .agg((dec2double(F.sum(money("l_extendedprice"))) / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 220
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (HAVING over a grouped semi-join set), re-joined to customer detail,
    deterministic top-100. The HAVING set is inherently TINY (orders above
    the quantity threshold), so after the one unavoidable full-fact groupBy
    that derives it, everything downstream is broadcast: the semi-join that
    filters orders and the display join back onto lineitem both ship the
    small side — the fact is never shuffled again (was a second full
    orderkey exchange; 14.3 s → 12.2 s at 100× — the residual cost is the
    unavoidable full-fact groupBy plus the second lineitem scan)."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("qty"))
        .filter(col("qty") > 220)
        .select("l_orderkey")
    )
    orders = load_table(spark, sf_dir, "orders").join(
        broadcast(big.withColumnRenamed("l_orderkey", "bigkey")),
        col("o_orderkey") == col("bigkey"),
        "left_semi",
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        li.join(broadcast(orders), col("l_orderkey") == col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") == col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            col("o_totalprice").cast("double").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(col("o_totalprice").desc(), col("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(CAST(sum({_DISC_PRICE_SQL}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: join under an OR-of-ANDs predicate mixing columns
    from both sides. Spark joins on the equi-key (partkey) and applies the
    disjunction as a post-join filter — Catalyst additionally pushes the
    single-side implications (brand IN-list, size ranges, quantity hull) down
    to each scan, which is the plan you want: the disjunction never forces a
    nested-loop join. No l_shipmode/l_shipinstruct in the fixture; the
    brand/size/quantity disjuncts carry the shape."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        ((col("p_brand") == "Brand#2") & col("p_size").between(1, 15)
         & (col("l_quantity") >= 1) & (col("l_quantity") <= 21))
        | ((col("p_brand") == "Brand#13") & col("p_size").between(1, 25)
           & (col("l_quantity") >= 10) & (col("l_quantity") <= 30))
        | ((col("p_brand") == "Brand#24") & col("p_size").between(1, 35)
           & (col("l_quantity") >= 20) & (col("l_quantity") <= 40))
    )
    return (
        li.join(broadcast(part), col("l_partkey") == col("p_partkey"))
        .filter(cond)
        .agg(dsum_expr(_disc_price()).alias("revenue"))
    )


@register(
    "q20_excess_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name IN ('NATION_1', 'NATION_5')
      AND s_suppkey IN (
        SELECT l_suppkey FROM shipped WHERE qty > (SELECT avg(qty) FROM shipped)
      )
    ORDER BY s_name
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries (parts by name pattern →
    suppliers who shipped an above-average quantity of them in a year →
    suppliers of a nation). Each IN realizes as a left-semi join; the
    original's availability threshold (no partsupp.availqty in the fixture)
    becomes "above the per-supplier average" — a scalar subquery over the
    SAME derived relation, which stays discriminating at every data size
    (a fixed absolute threshold saturates: measured all-81 pass at sf0.1,
    while >avg keeps ~half at any scale)."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(broadcast(part), col("l_partkey") == col("p_partkey"), "left_semi")
    )
    shipped = li.groupBy("l_suppkey").agg(F.sum(money("l_quantity")).alias("qty"))
    avg_qty = shipped.agg(F.avg("qty").alias("avg_qty"))
    qualified = (
        shipped.join(broadcast(avg_qty))
        .filter(col("qty") > col("avg_qty"))
        .select("l_suppkey")
    )
    nation = load_table(spark, sf_dir, "nation").filter(
        col("n_name").isin("NATION_1", "NATION_5")
    )
    return (
        load_table(spark, sf_dir, "supplier")
        .join(broadcast(nation), col("s_nationkey") == col("n_nationkey"))
        .join(qualified, col("s_suppkey") == col("l_suppkey"), "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    oracle="""
    WITH order_supp AS (
        SELECT l_orderkey, l_suppkey,
               max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS has_r
        FROM lineitem
        GROUP BY l_orderkey, l_suppkey
    )
    SELECT s_name, count(*) AS numwait
    FROM order_supp o1
    JOIN supplier ON o1.l_suppkey = s_suppkey
    JOIN orders   ON o1.l_orderkey = o_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND o1.has_r = 1
      AND n_name = 'NATION_2'
      AND EXISTS (
        SELECT 1 FROM order_supp o2
        WHERE o2.l_orderkey = o1.l_orderkey AND o2.l_suppkey <> o1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM order_supp o3
        WHERE o3.l_orderkey = o1.l_orderkey AND o3.l_suppkey <> o1.l_suppkey
          AND o3.has_r = 1
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT-EXISTS against the same derived
    relation — the supplier who was the ONLY one at fault on a multi-supplier
    finalized order. The fixture lacks commit/receipt dates, so "at fault" is
    l_returnflag = 'R' (returned goods); the correlated EXISTS pair realizes
    as a left-semi and a left-anti join on orderkey against per-(order,
    supplier) aggregates.

    Scale: the correlated pair collapses into per-order COUNTS over the
    same derived relation — "EXISTS another supplier" ⇔ the order has ≥ 2
    distinct suppliers, and (given o1 is itself at fault) "NOT EXISTS
    another faulty one" ⇔ the order has exactly 1 faulty supplier. That
    replaces two non-equi semi/anti self-joins of the 60M-row derived
    relation (inequality residuals defeat hash strategies; measured 78 s at
    100×) with window counts riding the aggregate's own exchange — ONE
    shuffle of the fact for the whole derivation (hash(orderkey) satisfies
    the (orderkey, suppkey) clustering, and the per-order window reuses
    it): 16.5 s at 100×, 4.7× faster.
    The oracle keeps the literal EXISTS/NOT-EXISTS spec, so the rewrite's
    equivalence is value-verified at every sweep."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    # ONE exchange for the whole derivation: hash(orderkey) satisfies the
    # clustering requirement of the (orderkey, suppkey) aggregate (equal
    # pairs share the orderkey), and the per-order counts then ride the
    # same partitioning as window aggregates — no second shuffle, no join
    order_supp = (
        li.repartition(col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(F.when(col("l_returnflag") == "R", 1).otherwise(0)).alias("has_r"))
    )
    wo = W.partitionBy("l_orderkey")
    only_fault = (
        order_supp.withColumn("n_supp", F.count(F.lit(1)).over(wo))
        .withColumn("n_fault", F.sum("has_r").over(wo))
        .filter((col("has_r") == 1) & (col("n_supp") >= 2) & (col("n_fault") == 1))
        .select("l_orderkey", "l_suppkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(col("o_orderstatus") == "F").select("o_orderkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").filter(col("n_name") == "NATION_2")
    return (
        only_fault.join(orders, col("l_orderkey") == col("o_orderkey"), "left_semi")
        .join(broadcast(supp), col("l_suppkey") == col("s_suppkey"))
        .join(broadcast(nation), col("s_nationkey") == col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(col("numwait").desc(), col("s_name"))
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
    WITH eligible AS (
        SELECT c_custkey, c_acctbal, c_custkey % 7 AS cntrycode
        FROM customer
        WHERE c_custkey % 7 IN (1, 2, 4, 6)
    )
    SELECT cntrycode, count(*) AS numcust,
           CAST(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS totacctbal
    FROM eligible e
    WHERE c_acctbal > (
        SELECT avg(c_acctbal) FROM eligible WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = e.c_custkey
              AND o_orderdate >= (SELECT max(o_orderdate) - INTERVAL 365 DAYS FROM orders)
      )
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-average subquery + NOT EXISTS (anti join) +
    group by a computed code. No c_phone in the fixture, so the country code
    is c_custkey % 7 with an IN-list — same computed-key semantics. The
    average is over the eligible set computed once (broadcast 1-row), the
    NOT EXISTS is a left-anti join against orders on custkey.

    Q22's spirit is "well-funded customers who HAVEN'T bought recently" —
    and in this fixture nearly every customer has ordered at some point, so
    the literal no-orders-ever anti join returned 0 rows at every sf (a
    vacuous 0=0 oracle match, CLAUDE.md rule 7). The anti-join right side
    is therefore orders in the final 365 days of the dataset (cutoff
    derived from max(o_orderdate), broadcast 1-row) — ~850 qualifying
    customers at sf0.1, stable fraction across scales."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .withColumn("cntrycode", col("c_custkey") % 7)
        .filter(col("cntrycode").isin(1, 2, 4, 6))
        .select("c_custkey", "c_acctbal", "cntrycode")
    )
    avg_bal = cust.filter(col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    cutoff = orders.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 365 DAYS")).alias("cutoff")
    )
    recent = (
        orders.join(broadcast(cutoff))
        .filter(col("o_orderdate") >= col("cutoff"))
        .select("o_custkey")
    )
    return (
        cust.join(broadcast(avg_bal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(recent, col("c_custkey") == col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dec2double(F.sum(money("c_acctbal"))).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )
