"""Advanced aggregates, SQL subqueries, the Python-UDF surface, and
skew-handling patterns (SURVEY §2B "UDF/UDAF/UDTF surface", "Aggregations";
§4 scale levers).

UDF policy: every Python hop is Arrow-batched (pandas_udf / applyInPandas /
cogroup.applyInPandas) — never row-at-a-time ``udf`` in a hot path. The UDF
queries here use exact integer arithmetic so they remain oracle-checkable;
statistical aggregates are computed from exact decimal power sums (see
functions/numeric.py for why).
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col, pandas_udf

from map_reduce_group_spark.catalog import load_table
from map_reduce_group_spark.functions.numeric import dec2double, money
from map_reduce_group_spark.plans.registry import register


@register(
    "agg_stats_exact",
    oracle="""
    WITH s AS (
        SELECT l_returnflag,
               count(*) AS n,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)       AS sx,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)  AS sy,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)     AS sxx,
               CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS syy,
               CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))
                        * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (sx / n) AS mean_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           ((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)))
               AS corr_qty_price
    FROM s
    """,
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (mean/stddev/corr) computed from EXACT decimal
    power sums, finished in double arithmetic with the identical formula on
    both engines — bit-deterministic, unlike the built-in streaming-moment
    stddev/corr whose result depends on partition merge order."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p = money("l_quantity"), money("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        dec2double(F.sum(q)).alias("sx"),
        dec2double(F.sum(p)).alias("sy"),
        dec2double(F.sum(q * q)).alias("sxx"),
        dec2double(F.sum(p * p)).alias("syy"),
        dec2double(F.sum(q * p)).alias("sxy"),
    )
    n, sx, sy = col("n"), col("sx"), col("sy")
    sxx, syy, sxy = col("sxx"), col("syy"), col("sxy")
    return s.select(
        "l_returnflag",
        "n",
        (sx / n).alias("mean_qty"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_qty"),
        ((n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))).alias(
            "corr_qty_price"
        ),
    )


@register(
    "agg_max_by_order",
    oracle="""
    SELECT o_orderstatus,
           max(struct_pack(p := o_totalprice, k := o_orderkey)).k AS biggest_order,
           max(o_totalprice) AS biggest_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_max_by_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax per group via max(struct(value, tiebreak-key)) — deterministic
    under value ties, unlike bare max_by on both engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.max(F.struct(col("o_totalprice").alias("p"), col("o_orderkey").alias("k")))["k"].alias(
            "biggest_order"
        ),
        F.max("o_totalprice").alias("biggest_price"),
    )


@register(
    "agg_quantiles_qty",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_quantiles_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quantiles (R-7, the definition both engines
    share). Quantity is small-integer-valued so the interpolation arithmetic
    is exact in double on both engines. For 100 TB use approx_percentile —
    registered separately rows-only (sketches are engine-specific)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.25)).alias("q25"),
        F.percentile("l_quantity", F.lit(0.50)).alias("q50"),
        F.percentile("l_quantity", F.lit(0.75)).alias("q75"),
    )


@register("agg_approx_sketches")  # sketch internals are engine-specific — rows-only
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates for 100 TB interactive use: HLL++ distinct
    counts and quantile sketches — fixed memory regardless of cardinality."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias("approx_median"),
    )


@register(
    "sql_correlated_subqueries",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
      AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 40000)
      AND EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def sql_correlated_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL entry point with scalar, IN, and correlated-EXISTS subqueries —
    Catalyst decorrelates all three into joins (scalar → broadcast agg; IN /
    EXISTS → semi joins); the identical ANSI text runs on both engines.

    avg() in the scalar subquery is only a FILTER threshold (not output), so
    engine fp drift could matter only if a customer's balance sat within
    1e-12 of the average — not possible for 2-decimal data vs a long-decimal
    average.
    """
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
          AND c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 40000)
          AND EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
        """
    )


# ------------------------------------------------------------ UDF surface ----


def _doc_signature_fn(n_chars: pd.Series) -> pd.Series:
    # deterministic integer arithmetic → oracle-checkable Python hop
    return (n_chars * 31 + 7) % 1000003


@register(
    "udf_pandas_scalar",
    oracle="SELECT doc_id, (n_chars * 31 + 7) % 1000003 AS sig FROM documents",
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas_udf (the ONLY acceptable Python-UDF shape
    in a hot path — row-at-a-time ``udf`` pays per-row pickling). Exact
    integer arithmetic keeps it oracle-checkable."""
    sig = pandas_udf(_doc_signature_fn, "bigint")
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", sig("n_chars").alias("sig"))


def _total_chars_fn(n_chars: pd.Series) -> int:
    return int(n_chars.sum())


def _doc_count_fn(n_chars: pd.Series) -> int:
    return int(len(n_chars))


@register(
    "udf_pandas_grouped_agg",
    oracle="SELECT lang, CAST(sum(n_chars) AS BIGINT) AS total_chars, count(*) AS n_docs FROM documents GROUP BY lang",
)
def udf_pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas_udf — the reference's 'reducer executable' as a
    typed vectorized aggregate (SURVEY §2B UDAF row)."""
    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg();
    # use a second pandas aggregate for the count
    total_chars = pandas_udf(_total_chars_fn, "bigint", functionType=F.PandasUDFType.GROUPED_AGG)
    n_docs = pandas_udf(_doc_count_fn, "bigint", functionType=F.PandasUDFType.GROUPED_AGG)
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        total_chars("n_chars").alias("total_chars"), n_docs("n_chars").alias("n_docs")
    )


def _source_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "source": [pdf["source"].iloc[0]],
            "n_docs": [len(pdf)],
            "max_chars": [int(pdf["n_chars"].max())],
            "first_doc": [int(pdf["doc_id"].min())],
        }
    )


@register(
    "udf_apply_in_pandas",
    oracle="""
    SELECT source, count(*) AS n_docs, max(n_chars) AS max_chars,
           min(doc_id) AS first_doc
    FROM documents GROUP BY source
    """,
)
def udf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas: arbitrary per-group logic — the exact generalization of
    the reference's reducer contract (whole key group in one call,
    worker/__main__.py:174-181), Arrow-batched. One shuffle by group key;
    each group must fit in one Python worker's memory — at 100 TB keep
    groups bounded (salt or pre-aggregate if a group can exceed ~100MB)."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").applyInPandas(
        _source_stats, "source string, n_docs bigint, max_chars bigint, first_doc bigint"
    )


def _purchase_click_ratio(key, purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_purchase": [len(purchases)],
            "n_click": [len(clicks)],
        }
    )


@register(
    "udf_cogroup_in_pandas",
    oracle="""
    WITH p AS (SELECT user_id, count(*) AS n_purchase FROM events
               WHERE event_type = 'purchase' GROUP BY user_id),
         c AS (SELECT user_id, count(*) AS n_click FROM events
               WHERE event_type = 'click' GROUP BY user_id)
    SELECT coalesce(p.user_id, c.user_id) AS user_id,
           coalesce(n_purchase, 0) AS n_purchase,
           coalesce(n_click, 0)    AS n_click
    FROM p FULL JOIN c ON p.user_id = c.user_id
    """,
)
def udf_cogroup_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cogroup().applyInPandas — the two-input reducer (reduce-side join,
    the canonical MR join pattern, SURVEY §2B joins) with arbitrary Python
    pairing logic."""
    e = load_table(spark, sf_dir, "events")
    # explicit key repartition: AQE's BYTE-based coalescing squeezed the
    # exchange feeding the Python cogroup stage to ONE task (~0.5 MB of
    # keys < the 1 MB minPartitionSize), serializing every per-group
    # Python call — byte cost is the wrong model for Python-eval stages
    # (guide §4). A user repartition with an explicit count is exempt
    # from coalescing and is reused by the cogroup's own distribution;
    # results are per-group, so partitioning never changes them.
    # Measured 4.4 s -> 2.1 s at sf0.1.
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    purchases = (
        e.filter(col("event_type") == "purchase")
        .select("user_id", "event_id")
        .repartition(n_shuffle, "user_id")
    )
    clicks = (
        e.filter(col("event_type") == "click")
        .select("user_id", "event_id")
        .repartition(n_shuffle, "user_id")
    )
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            _purchase_click_ratio, "user_id bigint, n_purchase bigint, n_click bigint"
        )
    )


# ---------------------------------------------------------- skew handling ----


@register(
    "skew_salted_type_counts",
    oracle="""
    SELECT event_type, count(*) AS n, CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total
    FROM events GROUP BY event_type
    """,
)
def skew_salted_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation: stage 1 groups by (key, salt) spreading
    a hot key over 16 partitions; stage 2 merges the partials. Result is
    identical to the direct groupBy (the oracle) — this registers the SKEW
    PATTERN itself as a checked query. event_type has only 5 values, i.e.
    maximum skew for a 32-way shuffle: exactly the shape that needs salt.

    (For built-in mitigation AQE skew-join handles joins; salting is the
    lever for aggregations and for deterministic partition sizing.)"""
    e = load_table(spark, sf_dir, "events")
    salted = e.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(16)))
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum(money("value")).alias("pt")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"), dec2double(F.sum("pt")).alias("total")
    )


@register(
    "events_funnel_signup_purchase",
    oracle="""
    SELECT user_id,
           min(ts) FILTER (event_type = 'signup')   AS first_signup,
           min(ts) FILTER (event_type = 'purchase') AS first_purchase
    FROM events
    GROUP BY user_id
    HAVING min(ts) FILTER (event_type = 'signup') IS NOT NULL
       AND min(ts) FILTER (event_type = 'purchase') IS NOT NULL
       AND min(ts) FILTER (event_type = 'signup')
         < min(ts) FILTER (event_type = 'purchase')
    """,
)
def events_funnel_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step detection (signup before first purchase) via conditional
    min aggregates — one shuffle, no self-join."""
    e = load_table(spark, sf_dir, "events")
    first_signup = F.min(F.when(col("event_type") == "signup", col("ts")))
    first_purchase = F.min(F.when(col("event_type") == "purchase", col("ts")))
    return (
        e.groupBy("user_id")
        .agg(first_signup.alias("first_signup"), first_purchase.alias("first_purchase"))
        .filter(
            col("first_signup").isNotNull()
            & col("first_purchase").isNotNull()
            & (col("first_signup") < col("first_purchase"))
        )
    )


@register("sample_seeded")  # sampling algorithms are engine-specific — rows-only
def sample_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli sample + stratified sampleBy — deterministic within
    Spark (fixed seed + stable partitioning), not across engines. At 100 TB
    sampling is the first step of profiling/quantile estimation."""
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")
    strat = (
        load_table(spark, sf_dir, "orders")
        .sampleBy("o_orderstatus", {"O": 0.2, "F": 0.05, "P": 1.0}, seed=42)
        .select(col("o_orderkey").alias("l_orderkey"), F.lit(-1).alias("l_linenumber"))
    )
    return plain.unionByName(strat)


@register(
    "udtf_explode_tokens",
    oracle="""
    SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                      x -> x <> '')) AS tok
    FROM documents WHERE doc_id % 97 = 0
    """,
)
def udtf_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (one row in → n rows out) — the typed, vectorizable
    analog of the reference's fan-out mapper executable (SURVEY §2B
    "row UDF / UDTF"). The lateralJoin form keeps the expansion declarative.
    useArrow=True: without it the plan carries a row-at-a-time
    BatchEvalPythonUDTF (pickled row hop per document — the one Python
    eval mode banned by CLAUDE.md rule 2); with it the input batches
    cross as Arrow record batches like every other Python stage here."""
    from pyspark.sql.functions import udtf

    import re as _re

    @udtf(returnType="tok: string", useArrow=True)
    class TokenizeUDTF:
        def eval(self, text: str):
            for t in _re.split(r"[^a-z]+", (text or "").lower()):
                if t:
                    yield (t,)

    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    d = load_table(spark, sf_dir, "documents").filter(col("doc_id") % 97 == 0)
    d.createOrReplaceTempView("docs_for_udtf")
    return spark.sql(
        "SELECT doc_id, t.tok FROM docs_for_udtf, LATERAL tokenize_udtf(text) t"
    )


@register(
    "sample_hash_deterministic",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substr(md5(text), 1, 1) IN ('0', '1')
    """,
)
def sample_hash_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash sampling: keep documents whose md5(text)
    starts with one of 2 of the 16 hex digits — an exactly-reproducible 1/8
    systematic sample, the form a training-data pipeline should prefer over
    seeded RNG sampling (same selection on ANY engine, any partitioning, any
    run — so ablations and holdouts are re-derivable from the data alone;
    the seeded twin `sample_seeded` stays rows-only precisely because RNG
    streams are engine-private). Map-only: the predicate evaluates in the
    scan stage, no shuffle, and composes with any downstream operator."""
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.substring(F.md5(col("text").cast("binary")), 1, 1).isin("0", "1")).select(
        "doc_id", "lang", "n_chars"
    )


def _synthetic_oracle() -> str:
    from map_reduce_group_spark.sources.synthetic import _LANGS, _WORDS

    words_sql = "[" + ",".join(f"'{w}'" for w in _WORDS) + "]"
    langs_sql = "[" + ",".join(f"'{l}'" for l in _LANGS) + "]"
    n = len(_WORDS)
    return f"""
    WITH ids AS (SELECT unnest(range(0, 2000)) AS doc_id),
    h AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('42:' || doc_id), 1, 2)) AS INT) AS b0,
               CAST(('0x' || substr(md5('42:' || doc_id), 3, 2)) AS INT) AS b1,
               CAST(('0x' || substr(md5('42:' || doc_id), 5, 2)) AS INT) AS b2
        FROM ids
    ),
    words AS (
        SELECT doc_id, i,
               {words_sql}[CAST(('0x' || substr(md5('42:' || doc_id || ':' || i), 1, 2)) AS INT)
                           % {n} + 1] AS w
        FROM h, unnest(range(0, 5 + b0 % 20)) AS t(i)
    ),
    texts AS (
        SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS text FROM words GROUP BY doc_id
    )
    SELECT {langs_sql}[b1 % 4 + 1] AS lang,
           'src' || (b2 % 8)       AS source,
           count(*)                AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM h JOIN texts USING (doc_id)
    GROUP BY 1, 2
    """


@register("source_synthetic_docs", oracle=_synthetic_oracle())
def source_synthetic_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom Python DataSource (sources/synthetic.py) under the full
    driver oracle gate: scan 2,000 generated docs (partition-parallel Arrow
    batches, seed 42) and aggregate per (lang, source). The DuckDB oracle
    REGENERATES the corpus from the same md5 derivations in pure SQL — a
    cross-engine proof that the source's content contract (pure function of
    doc_id and seed) holds, which is what makes golden tests and
    EXCEPT-diff pipeline testing on generated data sound. The fixed size is
    inherent to a generator query (nothing here reads sf_dir)."""
    from map_reduce_group_spark.sources.synthetic import SyntheticDocsDataSource

    spark.dataSource.register(SyntheticDocsDataSource)
    d = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 2000)
        # generator parallelism tracks the session (guide §2.6 idle capacity):
        # content is a pure function of (doc_id, seed) — the oracle regenerates
        # it independently of the split count — so partitions is a pure
        # throughput knob; a constant 8 wasted 3/4 of a 32-core session.
        .option("n_partitions", spark.sparkContext.defaultParallelism)
        .option("seed", 42)
        .option("pushdown", "false")  # vanilla sessions lack the pushdown conf
        .load()
    )
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "quality_checks_relational",
    oracle="""
    SELECT 'orders_pk_unique' AS check_name,
           CAST(sum(n - 1) AS BIGINT) AS violations,
           CAST(sum(n) AS BIGINT) AS total,
           sum(n - 1) = 0 AS passed
    FROM (SELECT o_orderkey, count(*) AS n FROM orders GROUP BY 1)
    UNION ALL
    SELECT 'orders_custkey_fk',
           -- NULL child keys are not FK violations (standard SQL semantics,
           -- mirrored in operators/quality.py:check_foreign_key)
           CAST((SELECT count(*) FROM orders o
                 WHERE o.o_custkey IS NOT NULL
                   AND NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
           CAST((SELECT count(*) FROM orders) AS BIGINT),
           (SELECT count(*) FROM orders o
            WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)) = 0
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(sum(CASE WHEN l_discount IS NOT NULL
                          AND l_discount NOT BETWEEN 0 AND 1
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT),
           sum(CASE WHEN l_discount IS NOT NULL
                     AND l_discount NOT BETWEEN 0 AND 1
                    THEN 1 ELSE 0 END) = 0
    FROM lineitem
    UNION ALL
    SELECT 'events_value_not_null',
           CAST(count(*) - count(value) AS BIGINT),
           CAST(count(*) AS BIGINT),
           count(*) - count(value) = 0
    FROM events
    """,
)
def quality_checks_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality validation pass (operators/quality.py):
    PK uniqueness, FK integrity (anti-join with distinct-parent-key build
    side), semantic range rule, and null-rate — each check a pruned
    scan-aggregate, unioned into the publish-gate report a pipeline stores
    next to the table it validated."""
    from map_reduce_group_spark.operators import quality as Q

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")
    return Q.run_checks(
        [
            Q.check_unique(orders, ["o_orderkey"], "orders_pk_unique"),
            Q.check_foreign_key(
                orders, "o_custkey", customer, "c_custkey", "orders_custkey_fk"
            ),
            Q.check_in_range(
                lineitem, "l_discount", 0.0, 1.0, "lineitem_discount_range"
            ),
            Q.check_not_null(events, "value", "events_value_not_null"),
        ]
    )


@register(
    "scd2_customer_balance_history",
    oracle="""
    WITH upd AS (
        SELECT o_custkey AS c_custkey,
               CAST(o_orderdate AS TIMESTAMP) AS ts,
               max(o_totalprice)              AS balance
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1995-02-01'
        GROUP BY 1, 2
    ), mn AS (
        SELECT c_custkey, min(ts) AS new_ts FROM upd GROUP BY c_custkey
    ), existing AS (
        SELECT c_custkey, c_acctbal AS balance,
               TIMESTAMP '1992-01-01'    AS valid_from,
               CAST(NULL AS TIMESTAMP)   AS valid_to,
               true                      AS is_current
        FROM customer
    ), closed AS (
        SELECT e.c_custkey, e.balance, e.valid_from,
               CASE WHEN mn.c_custkey IS NOT NULL THEN mn.new_ts
                    ELSE e.valid_to END                          AS valid_to,
               CASE WHEN mn.c_custkey IS NOT NULL THEN false
                    ELSE e.is_current END                        AS is_current
        FROM existing e LEFT JOIN mn USING (c_custkey)
    ), fresh AS (
        SELECT c_custkey, balance, ts AS valid_from,
               lead(ts) OVER w                AS valid_to,
               lead(ts) OVER w IS NULL        AS is_current
        FROM upd WINDOW w AS (PARTITION BY c_custkey ORDER BY ts)
    )
    SELECT * FROM closed
    UNION ALL
    SELECT * FROM fresh
    """,
)
def scd2_customer_balance_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 MERGE as a pure relational plan
    (operators/incremental.py:scd2_merge — the same core scd2_apply wraps
    with partition pruning + the dynamic-overwrite sink): the customer
    snapshot is the open history, one month of orders is the update batch
    (balance := that day's max order price; multiple updates per key CHAIN
    into consecutive versions, round-2 ADVICE semantics). Shape: one
    broadcast min-ts aggregate of the increment joined onto history + one
    window over the increment — untouched keys stream through, so the merge
    scales with the increment, not the table. The one-month slice is a
    fixed fraction of the fixture's fixed 1992-1998 date span (rule 7)."""
    from map_reduce_group_spark.operators.incremental import scd2_init, scd2_merge

    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    existing = scd2_init(
        cust.select(
            "c_custkey",
            col("c_acctbal").alias("balance"),
            F.lit("1992-01-01").cast("timestamp").alias("ts"),
        ),
        "ts",
    ).drop("ts")
    upd = (
        orders.filter(
            (col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (col("o_orderdate") < F.lit("1995-02-01").cast("timestamp"))
        )
        .groupBy(col("o_custkey").alias("c_custkey"), col("o_orderdate").alias("ts"))
        .agg(F.max("o_totalprice").alias("balance"))
    )
    return scd2_merge(existing, upd, ["c_custkey"], "ts")


@register(
    "agg_winsorized_revenue",
    oracle="""
    WITH c AS (
        SELECT o_orderpriority,
               CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM orders
    ), g AS (
        SELECT o_orderpriority, cents,
               row_number() OVER (PARTITION BY o_orderpriority ORDER BY cents) AS rn,
               count(*)    OVER (PARTITION BY o_orderpriority)                 AS n
        FROM c
    ), b AS (
        SELECT o_orderpriority,
               min(CASE WHEN rn >= ceil(0.05 * n) THEN cents END) AS lo_cents,
               min(CASE WHEN rn >= ceil(0.95 * n) THEN cents END) AS hi_cents
        FROM g GROUP BY 1
    )
    SELECT c.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(max(b.lo_cents) AS BIGINT) AS lo_cents,
           CAST(max(b.hi_cents) AS BIGINT) AS hi_cents,
           CAST(sum(CASE WHEN c.cents < b.lo_cents OR c.cents > b.hi_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           CAST(sum(least(greatest(c.cents, b.lo_cents), b.hi_cents))
                AS BIGINT) AS winsorized_cents
    FROM c JOIN b USING (o_orderpriority)
    GROUP BY 1
    """,
)
def agg_winsorized_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized revenue per order priority: clip order totals at the exact
    per-group p5/p95 DISCONTINUOUS percentiles, then aggregate — the
    outlier-robust accounting rollup (and the standard guard before fitting
    anything to heavy-tailed revenue). Percentile bounds are data-relative
    (rule 7) and computed by the two-phase bucket-histogram percentile
    (operators/quantiles.py:grouped_percentile_disc — never a per-group
    whole-partition sort), over exact integer CENTS (2-decimal money × 100
    through DECIMAL — rule 1: no double rounding, and the winsorized sum is
    a pure BIGINT aggregate accumulated in DECIMAL(38,0) for overflow
    safety at scale). The tiny per-group bounds frame broadcasts back onto
    the fact scan; one partial-agg shuffle finishes."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        (money("o_totalprice") * 100).cast("long").alias("cents"),
    )
    from map_reduce_group_spark.operators.quantiles import grouped_percentile_disc

    pct = grouped_percentile_disc(o, "o_orderpriority", "cents", [0.05, 0.95])
    j = o.join(F.broadcast(pct), "o_orderpriority")
    clipped = F.least(F.greatest(col("cents"), col("p5")), col("p95"))
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("p5").alias("lo_cents"),
        F.max("p95").alias("hi_cents"),
        F.sum(
            ((col("cents") < col("p5")) | (col("cents") > col("p95"))).cast("long")
        ).alias("n_clipped"),
        F.sum(clipped.cast("decimal(38,0)")).cast("long").alias("winsorized_cents"),
    )


@register(
    "quality_k_anonymity",
    oracle="""
    WITH g AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS n
        FROM customer GROUP BY 1, 2
    ), stats AS (
        SELECT count(*) AS n_groups, sum(n) AS nc FROM g
    )
    SELECT g.c_nationkey, g.c_mktsegment, CAST(g.n AS BIGINT) AS group_size,
           (2 * g.n * s.n_groups < s.nc) AS below_half_avg
    FROM g CROSS JOIN stats s
    """,
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier (nation, market
    segment): the size of every equivalence class, flagging classes
    smaller than HALF THE AVERAGE class size — the re-identification
    screen run before releasing grouped data. The threshold is
    data-relative (2·n·n_groups < total, pure BIGINT cross-multiplication
    — no division, rule 1; a fixed k goes vacuous as data grows, rule 7).
    Scale: one partial-agg shuffle to class sizes (output is
    |quasi-identifier domain|-bounded); the two-scalar stats frame is a
    broadcast crossJoin."""
    c = load_table(spark, sf_dir, "customer")
    g = c.groupBy("c_nationkey", "c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
    stats = g.agg(
        F.count(F.lit(1)).alias("n_groups"), F.sum("n").alias("nc")
    )
    return g.crossJoin(F.broadcast(stats)).select(
        "c_nationkey",
        "c_mktsegment",
        col("n").alias("group_size"),
        (2 * col("n") * col("n_groups") < col("nc")).alias("below_half_avg"),
    )


_SKEW_LEGS = [
    ("lineitem", "l_orderkey", "lineitem.l_orderkey"),
    ("lineitem", "l_partkey", "lineitem.l_partkey"),
    ("orders", "o_custkey", "orders.o_custkey"),
    ("events", "user_id", "events.user_id"),
    ("events", "event_type", "events.event_type"),
    ("documents", "source", "documents.source"),
]
_SKEW_CTES = ", ".join(
    f"c{i} AS (SELECT coalesce(CAST({k} AS VARCHAR), '<NULL>') AS k, "
    f"CAST(count(*) AS BIGINT) AS c FROM {t} GROUP BY 1), "
    f"s{i} AS (SELECT CAST(sum(c) AS BIGINT) AS t, "
    f"CAST(count(*) AS BIGINT) AS d, CAST(max(c) AS BIGINT) AS mx FROM c{i})"
    for i, (t, k, _) in enumerate(_SKEW_LEGS)
)
_SKEW_SELECTS = " UNION ALL ".join(
    # HUGEINT == Spark DECIMAL(38,0): count*distinct wraps int64 at scale
    f"SELECT '{lbl}' AS join_key, t AS total_rows, d AS n_keys, "
    f"mx AS max_key_count, "
    f"CAST((CAST(mx AS HUGEINT) * d * 100) // t AS BIGINT) AS skew_x_fp, "
    f"(SELECT min(k) FROM c{i}, s{i} WHERE c{i}.c = s{i}.mx) AS hot_key, "
    f"(SELECT CAST(count(*) AS BIGINT) FROM c{i}, s{i} "
    f" WHERE CAST(c{i}.c AS HUGEINT) * s{i}.d > 5 * CAST(s{i}.t AS HUGEINT)) AS n_over_factor "
    f"FROM s{i}"
    for i, (_, _, lbl) in enumerate(_SKEW_LEGS)
)


@register("diag_join_key_skew", oracle="WITH " + _SKEW_CTES + " " + _SKEW_SELECTS)
def diag_join_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-planning skew audit (operators/diagnostics.py:join_skew_report):
    one summary row per prospective join key — total rows, distinct keys,
    hottest-key count, hot/mean ratio in 1/100 fixed point, the hot key
    itself (smallest under ties), and how many keys exceed 5× the uniform
    mean (AQE's skewedPartitionFactor convention, integer
    cross-multiplied). The measure-before-salting audit a 100 TB pipeline
    runs before choosing broadcast vs shuffle vs salt per join; NULL keys
    bucket to a sentinel because a real hash join sends them to one
    partition. One groupBy shuffle per key; every downstream frame is a
    one-row scalar on a broadcast."""
    from map_reduce_group_spark.operators.diagnostics import join_skew_report

    frames = {t: load_table(spark, sf_dir, t) for t in
              {leg[0] for leg in _SKEW_LEGS}}
    return join_skew_report([(frames[t], k, lbl) for t, k, lbl in _SKEW_LEGS])
