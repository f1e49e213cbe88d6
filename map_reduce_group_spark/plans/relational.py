"""Joins, aggregation variants, set ops, sorts — SURVEY §2B row by row.

Each query is one row of the capability matrix (SURVEY §2B tables "Joins",
"Aggregations", "Sorts / limits / top-k", "Set operations", "Scalar
functions"), implemented declaratively so Catalyst chooses the physical
strategy (broadcast vs sort-merge, partial aggregation, TakeOrdered).

In the reference all of these are mapper/reducer executable pairs over the
dataflow primitives (SURVEY §2A); e.g. a join is "tag records by source in
the mapper, pair within key group in the reducer" (reference
worker/__main__.py:137-144, 174-181).
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
    fp_floor,
    money,
)
from map_reduce_group_spark.plans.registry import register


# ---------------------------------------------------------------- joins ----


@register(
    "join_left_outer_counts",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           count(o_orderkey)  AS order_count,
           CAST(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(12,2))), 0) AS VARCHAR) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_outer_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders (MR: reducer
    emits unmatched with nulls). count(col) skips nulls on both engines."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            dec2double(
                F.coalesce(F.sum(money("o_totalprice")), F.lit(0).cast("decimal(12,2)"))
            ).alias("total_spend"),
        )
    )


@register(
    "join_anti_inactive_customers",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= (SELECT max(o_orderdate) - INTERVAL 365 DAYS FROM orders)
    )
    """,
)
def join_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (MR: reducer emits left rows iff right group empty):
    customers with NO orders in the final 365 days of the dataset.

    The cutoff is DERIVED (max(o_orderdate) − 365 days, a broadcast 1-row
    scalar) per CLAUDE.md rule 7: the synthetic fixture gives (nearly)
    every customer at least one order ever, so the original unrestricted
    "no orders at all" form returned 0 rows at every sf — a vacuous 0=0
    oracle match that never exercised the anti join. The lapsed-window form
    keeps ~21% of customers at every scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    cutoff = orders.agg(
        (F.max("o_orderdate") - F.expr("INTERVAL 365 DAYS")).alias("cutoff")
    )
    recent = (
        orders.join(F.broadcast(cutoff))
        .filter(col("o_orderdate") >= col("cutoff"))
        .select("o_custkey")
    )
    return cust.join(recent, cust.c_custkey == recent.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_full_outer_nation_activity",
    oracle="""
    SELECT
        coalesce(c.nk, s.nk) AS nationkey,
        coalesce(c.n_cust, 0) AS n_cust,
        coalesce(s.n_supp, 0) AS n_supp
    FROM      (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
    FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
      ON c.nk = s.nk
    """,
)
def join_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides. Aggregating BEFORE the
    join (partial-agg pushdown by hand) is the 100 TB-friendly shape: the
    join inputs shrink from row counts to key counts."""
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(col("c_nationkey").alias("c_nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(col("s_nationkey").alias("s_nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.c_nk == s.s_nk, "full").select(
        F.coalesce(col("c_nk"), col("s_nk")).alias("nationkey"),
        F.coalesce(col("n_cust"), F.lit(0)).alias("n_cust"),
        F.coalesce(col("n_supp"), F.lit(0)).alias("n_supp"),
    )


@register(
    "join_cross_region_nation",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (MR: map everything to one key). Only sane for small dims;
    Spark plans BroadcastNestedLoopJoin."""
    return load_table(spark, sf_dir, "region").select("r_name").crossJoin(
        load_table(spark, sf_dir, "nation").select("n_name")
    )


@register(
    "join_range_price_bands",
    oracle="""
    SELECT b.band_name, count(*) AS n_parts
    FROM part p
    JOIN (
        SELECT 'budget' AS band_name, 0.0 AS lo, 500.0 AS hi UNION ALL
        SELECT 'mid', 500.0, 1200.0 UNION ALL
        SELECT 'premium', 1200.0, 100000.0
    ) b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band_name
    """,
)
def join_range_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range join against a tiny banding table → broadcast nested loop.
    (MR realization: cartesian via single reducer — SURVEY §2B.)"""
    part = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1200.0), ("premium", 1200.0, 100000.0)],
        "band_name string, lo double, hi double",
    )
    return (
        part.join(
            broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band_name")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# ----------------------------------------------------------- aggregations ----


@register(
    "agg_distinct_counts",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_suppkey)  AS n_supp,
           count(DISTINCT l_partkey)  AS n_part,
           count(*)                   AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) — expands to two-phase aggregate; the reference's
    'key = value, emit once per group' reducer pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_rollup_order_status",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (MR: mapper replicates record per grouping set)."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice").alias("total"))
    )


@register(
    "agg_cube_returns",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two low-cardinality dims."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
    )


@register(
    "agg_having_big_orders",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders,
           (CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / count(o_totalprice)) AS avg_price
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 12
       AND (CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / count(o_totalprice)) > 20000
    """,
)
def agg_having_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ... HAVING — post-aggregation filter."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), davg("o_totalprice").alias("avg_price"))
        .filter((col("n_orders") >= 12) & (F.col("avg_price") > 20000))
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n_rows
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (the DataFrame rollup/cube cover
    the hierarchical cases; SQL covers arbitrary sets)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        """
    )


# ----------------------------------------------------- sorts / limit / topk ----


@register(
    "topk_expensive_orders",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def topk_expensive_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition local
    top-k then a k-way driver merge; no global sort, no full shuffle.
    (MR realization: mapper emits local top-k, single reducer merges.)"""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(col("o_totalprice").desc(), col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


# ------------------------------------------------------------------ set ops ----


@register(
    "setop_union_all_nations",
    oracle="""
    SELECT nationkey, count(*) AS n
    FROM (
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey FROM supplier
    ) GROUP BY nationkey
    """,
)
def setop_union_all_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag union) then count — reference: list both dirs as input."""
    c = load_table(spark, sf_dir, "customer").select(col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(col("s_nationkey").alias("nationkey"))
    return c.unionByName(s).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))


@register(
    "setop_intersect_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics on both engines)."""
    c = load_table(spark, sf_dir, "customer").select(col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "setop_except_nations",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT c_nationkey FROM (
        SELECT c_nationkey FROM customer
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 10
    )
    """,
)
def setop_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT — customer nations with nobody in the global top-10 by account
    balance (distinct semantics: ``subtract`` == EXCEPT DISTINCT on both
    engines; deterministic top-k tiebreak on c_custkey).

    The subtrahend is a top-k set per CLAUDE.md rule 7: the original
    "customer nations EXCEPT supplier nations" went 0-row from sf0.01 up
    (suppliers cover all 25 nations as data grows — a vacuous 0=0 oracle
    match). Top-10 customers span ≤10 nations, so the difference keeps
    ≥15 nations at every scale."""
    c = load_table(spark, sf_dir, "customer")
    top = (
        c.orderBy(col("c_acctbal").desc(), col("c_custkey"))
        .limit(10)
        .select(col("c_nationkey").alias("nationkey"))
    )
    return c.select(col("c_nationkey").alias("nationkey")).subtract(top)


@register(
    "setop_distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def setop_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT / dropDuplicates (MR: key=record, emit-once reducer)."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# -------------------------------------------------------- scalar functions ----


@register(
    "scalar_string_date_math",
    oracle="""
    SELECT
        o_orderkey,
        upper(o_orderstatus)                            AS status_uc,
        substr(o_orderpriority, 1, 1)                   AS prio_digit,
        concat(o_orderstatus, '_', o_orderpriority)     AS status_prio,
        length(o_orderpriority)                         AS prio_len,
        year(o_orderdate)                               AS order_year,
        month(o_orderdate)                              AS order_month,
        CAST(CAST(o_totalprice AS DECIMAL(12,2)) * CAST(0.001 AS DECIMAL(4,3)) AS DOUBLE) AS price_k,
        CAST(abs(CAST(o_totalprice AS DECIMAL(12,2)) - 20000) AS DOUBLE)                    AS dist_from_20k,
        pow(o_orderkey % 10, 2)                                 AS key_digit_sq
    FROM orders
    WHERE o_orderkey % 97 = 0
    """,
)
def scalar_string_date_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date/math scalar library (SURVEY §2B scalar functions) — in the
    reference all of this lives inside opaque user executables; here it is
    typed, codegen'd, and pushdown-friendly."""
    o = load_table(spark, sf_dir, "orders").filter(col("o_orderkey") % 97 == 0)
    return o.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_uc"),
        F.substring("o_orderpriority", 1, 1).alias("prio_digit"),
        F.concat_ws("_", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").cast("long").alias("prio_len"),
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        (money("o_totalprice") * F.lit("0.001").cast("decimal(4,3)"))
        .cast("double")
        .alias("price_k"),
        F.abs(money("o_totalprice") - F.lit(20000)).cast("double").alias("dist_from_20k"),
        F.pow(col("o_orderkey") % 10, F.lit(2)).alias("key_digit_sq"),
    )


@register(
    "scalar_regexp_extract",
    oracle="""
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS INTEGER) AS brand_num,
           lower(p_type) AS type_lc
    FROM part
    WHERE p_size >= 40
    """,
)
def scalar_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction + case-folding on part."""
    p = load_table(spark, sf_dir, "part").filter(col("p_size") >= 40)
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", "Brand#([0-9]+)", 1).cast("int").alias("brand_num"),
        F.lower("p_type").alias("type_lc"),
    )


@register(
    "scalar_array_ops",
    oracle="""
    SELECT vec_id,
           len(embedding)                          AS dim,
           (floor(CAST(embedding[1] AS DOUBLE) * 10000) / 10000.0) AS first_val,
           (floor(sqrt(list_sum(list_transform(embedding,
                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) * 10000)
            / 10000.0) AS l2_norm
    FROM embeddings
    WHERE vec_id % 10 = 0
    """,
)
def scalar_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ArrayType functions over embeddings (size / index / fold). The L2 norm
    is a JVM-side higher-order ``aggregate`` — no Python in the loop.
    Note DuckDB lists are 1-based; Spark arrays 0-based. Display values use
    engine-symmetric floor fixed point (functions/numeric.py:fp_floor):
    both engines fold the SAME float32 values in the SAME array order with
    exact float→double promotion, so floor sees bit-identical doubles —
    unlike round(), which takes Spark through a shortest-decimal-string
    detour DuckDB doesn't share (rule 1)."""
    e = load_table(spark, sf_dir, "embeddings").filter(col("vec_id") % 10 == 0)
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        fp_floor(col("embedding")[0].cast("double"), 10_000).alias("first_val"),
        fp_floor(
            F.sqrt(
                F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            ),
            10_000,
        ).alias("l2_norm"),
    )


@register(
    "setop_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey FROM supplier
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — keeps min multiplicity per value)."""
    c = load_table(spark, sf_dir, "customer").select(col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@register(
    "setop_except_all",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    EXCEPT ALL
    SELECT c_custkey FROM customer
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference — each right occurrence cancels one left
    occurrence; here: one order per customer cancelled)."""
    o = load_table(spark, sf_dir, "orders").select(col("o_custkey").alias("custkey"))
    c = load_table(spark, sf_dir, "customer").select(col("c_custkey").alias("custkey"))
    return o.exceptAll(c)


@register(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (o_orderpriority = '1-URGENT')        AS "1-URGENT",
           count(*) FILTER (o_orderpriority = '2-HIGH')          AS "2-HIGH",
           count(*) FILTER (o_orderpriority = '3-MEDIUM')        AS "3-MEDIUM",
           count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS "4-NOT SPECIFIED",
           count(*) FILTER (o_orderpriority = '5-LOW')           AS "5-LOW"
    FROM orders GROUP BY o_orderstatus
    """,
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native DataFrame pivot with an explicit value list (always pass the
    list at scale — otherwise Spark runs an extra distinct-values job)."""
    o = load_table(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", prios)
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "join_right_outer_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, c_mktsegment
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey % 13 = 0
    """,
)
def join_right_outer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (kept explicit for SURVEY §2B parity even though it
    is the mirrored left join — Catalyst normalizes it to one)."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").filter(col("c_custkey") % 13 == 0)
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_custkey", "c_mktsegment"
    )


@register(
    "scalar_map_functions",
    oracle="""
    SELECT event_id,
           element_at(MAP(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)]), 'type')[1]
               AS type_from_map,
           CAST(cardinality(MAP(['type', 'uid'], [event_type, CAST(user_id AS VARCHAR)])) AS INTEGER)
               AS map_size
    FROM events WHERE event_id % 101 = 0
    """,
)
def scalar_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType construction + element access (SURVEY §2B scalar functions,
    map family; events.props parsing exercises from_json elsewhere)."""
    e = load_table(spark, sf_dir, "events").filter(col("event_id") % 101 == 0)
    m = F.create_map(
        F.lit("type"), col("event_type"), F.lit("uid"), col("user_id").cast("string")
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_from_map"),
        F.size(m).alias("map_size"),
    )


@register(
    "scalar_date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 30 DAYS                          AS due_date,
           date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_95,
           quarter(o_orderdate)                                    AS order_quarter,
           isodow(o_orderdate) - 1                                 AS weekday_mon0,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)  AS month_end
    FROM orders WHERE o_orderkey % 251 = 0
    """,
)
def scalar_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval arithmetic family: interval add, day diff, quarter,
    weekday (normalized to Monday=0 — engines disagree on week start),
    end-of-month."""
    o = load_table(spark, sf_dir, "orders").filter(col("o_orderkey") % 251 == 0)
    return o.select(
        "o_orderkey",
        (col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_95"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.weekday("o_orderdate").cast("long").alias("weekday_mon0"),
        F.last_day(col("o_orderdate").cast("date")).cast("timestamp").alias("month_end"),
    )


@register(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, metric, value
    FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice
          FROM part WHERE p_partkey % 53 = 0)
    UNPIVOT (value FOR metric IN (p_size, p_retailprice))
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — wide→long reshaping (the inverse of pivot; feature
    tables at scale routinely flip layouts this way)."""
    p = load_table(spark, sf_dir, "part").filter(col("p_partkey") % 53 == 0)
    return p.select(
        "p_partkey", col("p_size").cast("double").alias("p_size"), "p_retailprice"
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    ).filter(col("value").isNotNull())  # DuckDB UNPIVOT drops NULLs; pin that semantic


@register(
    "agg_listagg_nations",
    oracle="""
    SELECT r_name,
           CAST(count(*) AS BIGINT)                 AS n_nations,
           string_agg(n_name, ',' ORDER BY n_name)  AS nations_csv
    FROM region JOIN nation ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
)
def agg_listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/string_agg) — collect_list has no
    deterministic order in a distributed engine, so the portable shape is
    array_sort(collect_list(...)) + array_join: the sort pins the result
    regardless of partitioning/shuffle arrival order (CLAUDE.md rule 1
    discipline applied to strings). Broadcast join on the 5-row dim."""
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n = load_table(spark, sf_dir, "nation").select("n_regionkey", "n_name")
    return (
        n.join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv"),
        )
    )


@register(
    "agg_mode_median_quantity",
    oracle="""
    WITH counts AS (
        SELECT l_returnflag, l_quantity, count(*) AS c
        FROM lineitem GROUP BY l_returnflag, l_quantity
    ), ranked AS (
        SELECT l_returnflag, l_quantity,
               row_number() OVER (PARTITION BY l_returnflag
                                  ORDER BY c DESC, l_quantity ASC) AS rn
        FROM counts
    )
    SELECT r.l_returnflag,
           r.l_quantity                       AS mode_qty,
           m.med                              AS median_qty
    FROM ranked r
    JOIN (SELECT l_returnflag, median(l_quantity) AS med
          FROM lineitem GROUP BY l_returnflag) m USING (l_returnflag)
    WHERE rn = 1
    """,
)
def agg_mode_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-set aggregates: mode with a DETERMINISTIC tie-break and exact
    median per group. Native mode() is free to pick any modal value on ties
    in both engines, so the portable plan derives it relationally —
    groupBy(group, value).count() then row_number ordered (count DESC, value
    ASC): two partial-agg shuffles on compact keys, no whole-group collect.
    Exact median of a value column whose domain is integral-valued doubles
    (avg of the two middles is representable — no float-sum hazard, rule 1).
    """
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    counts = li.groupBy("l_returnflag", "l_quantity").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("l_returnflag").orderBy(col("c").desc(), col("l_quantity").asc())
    mode = (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") == 1)
        .select("l_returnflag", col("l_quantity").alias("mode_qty"))
    )
    med = li.groupBy("l_returnflag").agg(F.median("l_quantity").alias("median_qty"))
    return mode.join(med, "l_returnflag").select("l_returnflag", "mode_qty", "median_qty")


@register(
    "agg_price_histogram",
    oracle="""
    WITH env AS (
        SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM orders
    ), b AS (
        SELECT least(CAST(floor(((o_totalprice - mn) /
                     (CASE WHEN mx = mn THEN 1.0 ELSE mx - mn END)) * 10) AS BIGINT),
                     9) AS bucket
        FROM orders, env
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n_orders
    FROM b GROUP BY bucket
    """,
)
def agg_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram with DATA-DERIVED edges (rule 7: bucket bounds
    come from the global min/max, so the query stays non-degenerate at any
    scale). Two-pass envelope: a 1-row min/max aggregate broadcast-cross-
    joined onto the fact scan, then floor-bucket + count — the same
    ((x-mn)/(mx-mn))*10 expression text in both engines so IEEE evaluation
    order is identical. Degenerate mx==mn guarded to bucket 0 (ADVICE r2
    precedent). Clamped so x==mx lands in the top bucket."""
    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    env = o.agg(F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx"))
    rng = F.when(col("mx") == col("mn"), F.lit(1.0)).otherwise(col("mx") - col("mn"))
    return (
        o.crossJoin(broadcast(env))
        .select(
            F.least(
                F.floor(((col("o_totalprice") - col("mn")) / rng) * 10).cast("long"),
                F.lit(9).cast("long"),
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "agg_mad_outliers",
    oracle="""
    WITH med AS (
        SELECT l_returnflag, median(l_quantity) AS med
        FROM lineitem GROUP BY l_returnflag
    ), dev AS (
        SELECT l.l_returnflag, l.l_quantity, m.med,
               abs(l.l_quantity - m.med) AS adev
        FROM lineitem l JOIN med m USING (l_returnflag)
    ), mad AS (
        SELECT l_returnflag, median(adev) AS mad FROM dev GROUP BY l_returnflag
    )
    SELECT d.l_returnflag,
           d.med                                                   AS median_qty,
           a.mad                                                   AS mad_qty,
           CAST(count(*) AS BIGINT)                                AS n_rows,
           CAST(sum(CASE WHEN d.adev > 3 * a.mad THEN 1 ELSE 0 END)
                AS BIGINT)                                         AS n_outliers
    FROM dev d JOIN mad a USING (l_returnflag)
    GROUP BY d.l_returnflag, d.med, a.mad
    """,
)
def agg_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: per group,
    med = median(x), MAD = median(|x - med|), outlier ⇔ |x - med| > 3·MAD —
    the standard robust z-score gate (immune to the outliers it hunts,
    unlike mean/stddev). Exact and cross-engine-stable: the value domain is
    integral-valued doubles, so both medians land on .0/.5 exactly and the
    3·MAD comparison is exact IEEE arithmetic, no float-sum anywhere
    (rule 1). The 3·MAD threshold is distribution-relative (rule 7). Shape:
    two compact medians broadcast back onto the fact scan, one counting
    pass — three shuffles on a 3-row key."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    med = li.groupBy("l_returnflag").agg(F.median("l_quantity").alias("med"))
    dev = li.join(broadcast(med), "l_returnflag").withColumn(
        "adev", F.abs(col("l_quantity") - col("med"))
    )
    mad = dev.groupBy("l_returnflag").agg(F.median("adev").alias("mad"))
    return (
        dev.join(broadcast(mad), "l_returnflag")
        .groupBy("l_returnflag", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(col("adev") > 3 * col("mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "l_returnflag",
            col("med").alias("median_qty"),
            col("mad").alias("mad_qty"),
            "n_rows",
            "n_outliers",
        )
    )


@register(
    "join_fuzzy_name_groups",
    oracle="""
    WITH dict AS (
        SELECT p_name, count(*) AS n_exact FROM part GROUP BY p_name
    ), pairs AS (
        SELECT a.p_name, b.p_name AS b_name, b.n_exact AS b_count
        FROM dict a JOIN dict b
          ON length(b.p_name) BETWEEN length(a.p_name) - 1 AND length(a.p_name) + 1
         AND levenshtein(a.p_name, b.p_name) <= 1
    )
    SELECT p_name,
           CAST(min(CASE WHEN b_name = p_name THEN b_count END) AS BIGINT) AS n_exact,
           CAST(count(*) - 1 AS BIGINT)  AS n_variants,
           CAST(sum(b_count) AS BIGINT)  AS n_fuzzy
    FROM pairs GROUP BY p_name
    """,
)
def join_fuzzy_name_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching (edit distance ≤ 1) done the 100 TB way: the
    match runs over the DISTINCT-value dictionary, never the fact table —
    the dictionary is orders of magnitude smaller (64 names for 2k..200k
    parts here; same asymmetry for real catalogs), and fact rows join back
    through it by exact key. Blocking is a LOSSLESS length band (|len(a) -
    len(b)| ≤ k is necessary for lev ≤ k), realized as an EQUI-join on an
    exploded [len-1, len, len+1] bucket key so Catalyst plans a hash join
    instead of a nested-loop theta join; the oracle's BETWEEN produces the
    identical candidate set. levenshtein itself has unit-cost semantics in
    both engines. Returns per name its exact count, the number of lev-1
    variant names, and the fuzzy group size (facts reachable within one
    typo) — the merge-candidate signal entity resolution pipelines gate
    on."""
    p = load_table(spark, sf_dir, "part")
    d = p.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_exact"))
    a = d.select(
        col("p_name").alias("a_name"),
        F.explode(
            F.array(
                F.length("p_name") - 1, F.length("p_name"), F.length("p_name") + 1
            )
        ).alias("blen"),
    )
    b = d.select(
        col("p_name").alias("b_name"),
        col("n_exact").alias("b_count"),
        F.length("p_name").alias("blen"),
    )
    pairs = a.join(b, "blen").filter(
        F.levenshtein(col("a_name"), col("b_name")) <= 1
    )
    return pairs.groupBy("a_name").agg(
        F.min(F.when(col("b_name") == col("a_name"), col("b_count")))
        .cast("long")
        .alias("n_exact"),
        (F.count(F.lit(1)) - 1).cast("long").alias("n_variants"),
        F.sum("b_count").cast("long").alias("n_fuzzy"),
    ).select(col("a_name").alias("p_name"), "n_exact", "n_variants", "n_fuzzy")


@register(
    "market_basket_lift",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS o, p.p_brand AS b
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), n AS (
        SELECT count(DISTINCT o) AS n_orders FROM ob
    ), singles AS (
        SELECT b, count(*) AS c FROM ob GROUP BY 1
    ), pairs AS (
        SELECT a.b AS brand_a, bb.b AS brand_b, count(*) AS cab
        FROM ob a JOIN ob bb USING (o)
        WHERE a.b < bb.b
        GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, CAST(cab AS BIGINT) AS n_co,
           CAST((10000 * n.n_orders * cab) // (sa.c * sb.c) AS BIGINT) AS lift_bp
    FROM pairs
    JOIN singles sa ON sa.b = brand_a
    JOIN singles sb ON sb.b = brand_b
    CROSS JOIN n
    WHERE cab * 1000 >= n.n_orders
    """,
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining: LIFT between part brands
    co-purchased in the same order — lift(a,b) = P(ab)/(P(a)·P(b)) =
    N·c_ab/(c_a·c_b) in integer basis points (DECIMAL(38,0) product before
    the exact ``div`` — 10⁴·N·c_ab overflows BIGINT at warehouse scale).
    The support floor is data-relative (c_ab ≥ N/1000, rule 7 — a fixed
    floor goes all-row or 0-row as data grows). Scale: the within-order
    self-join fans out per order-basket size (bounded by order width, not
    corpus), pair counts partial-agg on compact (brand, brand) keys, the
    brand dimension broadcasts, and N rides a one-row broadcast. The
    classic co-occurrence shape whose output is |brands|²-bounded."""
    from pyspark import StorageLevel

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # persist at the fanout: ob (the lineitem⋈part distinct — the expensive
    # pass) feeds the order count, the brand singles (read twice as sa/sb)
    # and BOTH sides of the basket self-join — unpersisted, that distinct
    # planned five times (guide §2.4)
    ob = (
        li.join(broadcast(pt), col("l_partkey") == col("p_partkey"))
        .select(col("l_orderkey").alias("o"), col("p_brand").alias("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = ob.agg(F.count_distinct("o").alias("n_orders"))
    singles = ob.groupBy("b").agg(F.count(F.lit(1)).alias("c")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    a, bb = ob.alias("x"), ob.alias("y")
    pairs = (
        a.join(bb, "o")
        .filter(col("x.b") < col("y.b"))
        .groupBy(col("x.b").alias("brand_a"), col("y.b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    sa = singles.select(col("b").alias("brand_a"), col("c").alias("ca"))
    sb = singles.select(col("b").alias("brand_b"), col("c").alias("cb"))
    return (
        pairs.join(broadcast(sa), "brand_a")
        .join(broadcast(sb), "brand_b")
        .crossJoin(broadcast(n))
        .filter(col("cab") * 1000 >= col("n_orders"))
        .select(
            "brand_a",
            "brand_b",
            col("cab").alias("n_co"),
            F.expr(
                "CAST(10000 * CAST(n_orders AS DECIMAL(38,0)) * cab AS DECIMAL(38,0))"
                " div CAST(CAST(ca AS DECIMAL(38,0)) * cb AS DECIMAL(38,0))"
            ).alias("lift_bp"),
        )
    )


@register(
    "orders_pareto_share",
    oracle="""
    WITH cust AS (
        SELECT o_custkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)) * 100) AS BIGINT) AS cents
        FROM orders GROUP BY 1
    ), g AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents) AS rn,
               count(*) OVER () AS n
        FROM cust
    ), b AS (
        SELECT min(CASE WHEN rn >= ceil(0.9 * n) THEN cents END) AS p90 FROM g
    )
    SELECT CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CASE WHEN c.cents >= b.p90 THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
           CAST(sum(CASE WHEN c.cents >= b.p90 THEN c.cents ELSE 0 END)
                AS BIGINT) AS top_cents,
           CAST(sum(c.cents) AS BIGINT) AS total_cents,
           CAST((10000 * sum(CASE WHEN c.cents >= b.p90 THEN c.cents ELSE 0 END))
                // sum(c.cents) AS BIGINT) AS top_share_bp
    FROM cust c CROSS JOIN b
    """,
)
def orders_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) audit: the share of total revenue
    held by customers at or above the exact p90 of per-customer spend, in
    integer basis points. The p90 bound is data-relative (rule 7) and
    found by the two-phase bucket-histogram percentile over exact integer
    cents (operators/quantiles.py — no per-group whole-partition sort; a
    constant group key keeps phase 1 fully parallel); sums accumulate in
    DECIMAL before the BIGINT cast (rule 1). Output is a single audit row
    at any scale."""
    from map_reduce_group_spark.operators.quantiles import grouped_percentile_disc

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        (F.sum(money("o_totalprice")) * 100).cast("long").alias("cents")
    )
    pct = grouped_percentile_disc(
        cust.withColumn("grp", F.lit(1)), "grp", "cents", [0.9]
    ).select(col("p90"))
    top = F.when(col("cents") >= col("p90"), col("cents")).otherwise(F.lit(0))
    return cust.crossJoin(broadcast(pct)).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum((col("cents") >= col("p90")).cast("long")).alias("n_top"),
        F.sum(top.cast("decimal(38,0)")).cast("long").alias("top_cents"),
        F.sum(col("cents").cast("decimal(38,0)")).cast("long").alias("total_cents"),
        F.expr(
            "CAST(10000 * sum(CASE WHEN cents >= p90 THEN CAST(cents AS DECIMAL(38,0))"
            " ELSE 0 END) AS DECIMAL(38,0))"
            " div sum(CAST(cents AS DECIMAL(38,0)))"
        ).alias("top_share_bp"),
    )
