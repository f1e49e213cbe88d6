"""Window functions: ranking, analytic (lag/lead), frame aggregates,
top-k-per-group, secondary sort (SURVEY §2B "Window functions" +
"secondary sort").

MR realization in the reference: composite key + the external sort /
k-way merge guarantee (SURVEY §1.4 rule 2, reference worker/__main__.py:149,
168) — the value-ordered key group IS a window partition. Here each query is
``Window.partitionBy(...).orderBy(...)``: one shuffle on the partition key,
sort within partitions, then a single pass.

Determinism: every ORDER BY carries a unique tie-break column so row
numbering matches the oracle exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import col

from map_reduce_group_spark.catalog import load_table
from map_reduce_group_spark.functions.numeric import dec2double, fp_ratio, money
from map_reduce_group_spark.plans.registry import register


@register(
    "window_rank_customers",
    oracle="""
    SELECT * FROM (
        SELECT
            c_mktsegment,
            c_custkey,
            c_acctbal AS acctbal,
            row_number() OVER w AS rn,
            rank()       OVER w AS rnk,
            dense_rank() OVER w AS drnk
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    ) WHERE rn <= 5
    """,
)
def window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank; top-5 per segment via rn filter."""
    w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc(), col("c_custkey"))
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            col("c_acctbal").alias("acctbal"),
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
        .filter(col("rn") <= 5)
    )


@register(
    "window_lag_lead_events",
    oracle="""
    SELECT event_id, user_id,
           value - lag(value)  OVER w AS delta_prev,
           lead(value) OVER w - value AS delta_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lag_lead_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over per-user event streams ordered by time."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        (col("value") - F.lag("value").over(w)).alias("delta_prev"),
        (F.lead("value").over(w) - col("value")).alias("delta_next"),
    )


@register(
    "window_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_spend,
           count(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)     AS order_seq
    FROM orders
    """,
)
def window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over an explicit ROWS frame: per-customer running spend."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        dec2double(F.sum(money("o_totalprice")).over(w)).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("order_seq"),
    )


@register(
    "window_ntile_quartiles",
    oracle="""
    SELECT quartile, count(*) AS n_cust, min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal
    FROM (
        SELECT c_acctbal, ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS quartile
        FROM customer
    ) GROUP BY quartile
    """,
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile bucketing then per-bucket stats — WITHOUT the global ORDER BY
    window (VERDICT r3 What's-wrong #1: ``ntile(4) OVER (ORDER BY …)``
    funnels the whole table through one partition; customer is 15M rows at
    sf100). Scale-safe shape: encode the strict sort key (c_acctbal,
    c_custkey) into one long (``cents·2³² + custkey`` — exact
    lexicographic order), find the three exact quartile boundary VALUES
    with the two-phase bucket-histogram selector
    (operators/quantiles.py:global_ntile_edges — the only global window
    runs over ≤ value_range/2³⁸ histogram buckets), broadcast the 1-row
    edge frame back, and assign ``quartile = 1 + Σ(key > eᵢ)``. Key
    uniqueness (custkey is unique) makes this EXACTLY SQL ntile — the
    DuckDB oracle keeps the plain ntile window formulation."""
    from map_reduce_group_spark.operators.quantiles import global_ntile_edges

    cust = load_table(spark, sf_dir, "customer").select(
        "c_acctbal",
        (
            (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
            * F.lit(4294967296).cast("long")
            + col("c_custkey")
        ).alias("key"),
    )
    edges = global_ntile_edges(cust, "key", 4)
    return (
        cust.crossJoin(F.broadcast(edges))
        .select(
            "c_acctbal",
            (
                1
                + (col("key") > col("e1")).cast("long")
                + (col("key") > col("e2")).cast("long")
                + (col("key") > col("e3")).cast("long")
            ).alias("quartile"),
        )
        .groupBy("quartile")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
        )
    )


@register(
    "topk_per_group_parts",
    oracle="""
    SELECT * FROM (
        SELECT p_type, p_partkey, p_retailprice AS price,
               row_number() OVER (PARTITION BY p_type
                                  ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    ) WHERE rn <= 3
    """,
)
def topk_per_group_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the window idiom (one shuffle; at scale prefer this
    over self-join-max by a wide margin)."""
    w = Window.partitionBy("p_type").orderBy(col("p_retailprice").desc(), col("p_partkey"))
    return (
        load_table(spark, sf_dir, "part")
        .select(
            "p_type",
            "p_partkey",
            col("p_retailprice").alias("price"),
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(col("rn") <= 3)
    )


@register(
    "secondary_sort_line_numbers",
    oracle="""
    SELECT l_orderkey,
           string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS line_seq,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_orderkey % 101 = 0
    GROUP BY l_orderkey
    """,
)
def secondary_sort_line_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Secondary sort: value-ordered groups (the reference's sorted-merge
    grouping guarantee, SURVEY §1.4) via sort_array(collect_list(...)) —
    grouping without requiring a sorted shuffle."""
    li = load_table(spark, sf_dir, "lineitem").filter(col("l_orderkey") % 101 == 0)
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            # native cast of the whole array — no interpreted transform
            # lambda (rule 2); int→string cast distributes over elements
            F.sort_array(F.collect_list("l_linenumber")).cast("array<string>"),
            ",",
        ).alias("line_seq"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_similar_price
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based bounds, vs the ROWS frames elsewhere): how
    many of the customer's orders fall within ±1000 of each order's price."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-1000, 1000)
    )
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.count(F.lit(1)).over(w).alias("n_similar_price")
    )


@register(
    "window_distribution_functions",
    oracle="""
    SELECT c_custkey,
           (CAST(((rank() OVER w - 1) * 1000000)
                 // greatest(count(*) OVER pw - 1, 1) AS DOUBLE)
            / 1000000.0) AS pct_rank,
           (CAST(((count(*) OVER pw - rank() OVER wrev + 1) * 1000000)
                 // count(*) OVER pw AS DOUBLE)
            / 1000000.0) AS cume,
           first_value(c_custkey) OVER w   AS richest_in_segment,
           nth_value(c_custkey, 2) OVER (PARTITION BY c_mktsegment
                                         ORDER BY c_acctbal DESC, c_custkey
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS second_richest
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey),
           pw AS (PARTITION BY c_mktsegment),
           wrev AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey DESC)
    """,
)
def window_distribution_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions as exact integer fixed point (rule 1):
    percent_rank ≡ (rank−1)/(n−1) and cume_dist ≡ peers_le/n are integer
    ratios, so display them via the 1/10^6 integer-div recipe instead of
    round(double). peers_le (rows ordered at-or-before the last peer) is
    n − rank_over_reversed_order + 1 — exact under ties, and every count
    is partition-local (bounded by segment size, no ×10^6 headroom risk).
    Plus first/nth value navigation."""
    w = Window.partitionBy("c_mktsegment").orderBy(col("c_acctbal").desc(), col("c_custkey"))
    wrev = Window.partitionBy("c_mktsegment").orderBy(
        col("c_acctbal").asc(), col("c_custkey").desc()
    )
    pw = Window.partitionBy("c_mktsegment")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        load_table(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.rank().over(w).alias("_rk"),
            F.rank().over(wrev).alias("_rkd"),
            F.count(F.lit(1)).over(pw).alias("_n"),
            F.first("c_custkey").over(w).alias("richest_in_segment"),
            F.nth_value("c_custkey", 2).over(w_full).alias("second_richest"),
        )
        .select(
            "c_custkey",
            fp_ratio("_rk - 1", "greatest(_n - 1, 1)").alias("pct_rank"),
            fp_ratio("_n - _rkd + 1", "_n").alias("cume"),
            "richest_in_segment",
            "second_richest",
        )
    )
