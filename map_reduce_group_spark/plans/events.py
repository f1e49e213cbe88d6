"""Time-series / event-stream analytics over the ``events`` fixture —
batch time-window operators (SURVEY §2B "Streaming" scope: tumbling +
sliding + session windows, as-of join, JSON functions).

The reference has no time semantics at all (batch only, typeless); these are
the north-star extensions. Each is a single-shuffle declarative plan; the
Structured Streaming variants of the window aggregations live in
:mod:`map_reduce_group_spark.streaming`.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.functions import col

from map_reduce_group_spark.catalog import load_table
from map_reduce_group_spark.functions.numeric import davg, dsum
from map_reduce_group_spark.operators.asof import asof_join
from map_reduce_group_spark.plans.registry import register


@register(
    "events_json_extract",
    oracle="""
    SELECT event_id, user_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           CAST(json_extract_string(props, '$.k') AS INTEGER) % 7 AS k_mod
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the ``props`` column (get_json_object =
    JSONPath, JVM-side; no Python UDF)."""
    e = load_table(spark, sf_dir, "events").filter(col("event_type") == "purchase")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select("event_id", "user_id", k.alias("k"), (k % 7).alias("k_mod"))


@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation via the native ``window()``
    operator (epoch-aligned, so window.start == date_trunc('hour'))."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
        .select(
            col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "events_sliding_windows",
    oracle="""
    SELECT w_start, count(*) AS n_events,
           (CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) / count(value)) AS avg_value
    FROM (
        SELECT unnest([
            time_bucket(INTERVAL 30 MINUTES, ts),
            time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES
        ]) AS w_start, value
        FROM events
    )
    GROUP BY w_start
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour windows every 30 minutes. Spark's ``window``
    replicates each row into size/slide windows; the oracle unnests the same
    two bucket starts explicitly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), davg("value").alias("avg_value"))
        .select(col("w.start").alias("w_start"), "n_events", "avg_value")
    )


@register(
    "events_sessionization",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 30 MINUTES
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), sessioned AS (
        SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM flagged
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           min(ts) AS session_start,
           max(ts) AS session_end,
           count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS session_value
    FROM sessioned
    GROUP BY user_id, session_seq
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-minute inactivity gap) via gaps-and-islands window
    functions — one shuffle by user, one in-partition sort, then a grouped
    aggregate. The Structured Streaming ``session_window`` variant lives in
    streaming/ (same semantics, incremental state)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    # microsecond-precision gap, matching the oracle's full-precision
    # interval comparison (cast('long') would truncate to whole seconds and
    # misclassify gaps in (1800, 1801))
    gap_us = F.unix_micros(col("ts")) - F.unix_micros(prev_ts)
    new_session = F.when(prev_ts.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (
        e.withColumn("new_session", new_session)
        .withColumn("session_seq", F.sum("new_session").over(wrun))
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("session_value"),
        )
    )


@register(
    "events_asof_join",
    oracle="""
    WITH purchases AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), clicks AS (
        SELECT user_id, ts, max(event_id) AS click_event_id
        FROM events WHERE event_type = 'click'
        GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts,
           c.click_event_id AS click_event_id_asof,
           c.ts             AS click_ts_asof
    FROM purchases p
    ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase gets the latest preceding click of the same
    user (operators/asof.py — union + last(ignoreNulls) window; one shuffle)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    clicks = (
        e.filter(col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_event_id"))
        .withColumn("click_ts", col("ts"))
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        right_payload=["click_event_id", "click_ts"],
    )
    return joined.select("event_id", "user_id", "ts", "click_event_id_asof", "click_ts_asof")


@register(
    "events_type_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS n_click,
           count(*) FILTER (event_type = 'view')     AS n_view,
           count(*) FILTER (event_type = 'purchase') AS n_purchase,
           count(*) FILTER (event_type = 'signup')   AS n_signup,
           count(*) FILTER (event_type = 'error')    AS n_error
    FROM events
    GROUP BY user_id
    """,
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot / conditional aggregation — one shuffle, map-side partials."""
    e = load_table(spark, sf_dir, "events")
    aggs = [
        F.count(F.when(col("event_type") == t, 1)).alias(f"n_{t}")
        for t in ("click", "view", "purchase", "signup", "error")
    ]
    return e.groupBy("user_id").agg(*aggs)


@register(
    "events_from_json_typed",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER)     AS k_typed,
           CAST(json_extract_string(props, '$.k') AS INTEGER) * 2 AS k_doubled
    FROM events
    WHERE event_type = 'signup' AND event_id % 7 = 0
    """,
)
def events_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-applied JSON parsing (``from_json`` into a typed struct —
    vs the JSONPath extraction in events_json_extract). At scale prefer
    from_json once into a struct over repeated get_json_object calls:
    one parse per row instead of one per field."""
    e = load_table(spark, sf_dir, "events").filter(
        (col("event_type") == "signup") & (col("event_id") % 7 == 0)
    )
    parsed = F.from_json("props", "k int")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        (parsed.getField("k") * 2).alias("k_doubled"),
    )


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
    )
    SELECT f.cohort_week,
           count(DISTINCT f.user_id) AS cohort_size,
           count(DISTINCT CASE WHEN a.active_week = f.cohort_week + INTERVAL 7 DAYS
                               THEN a.user_id END) AS retained_next_week
    FROM firsts f
    LEFT JOIN activity a ON a.user_id = f.user_id
    GROUP BY f.cohort_week
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted again if active the following week — two aggregations and one
    join, no self-join of the raw fact (the cohort and activity tables are
    user-cardinality, not event-cardinality — the 100 TB-safe shape)."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", col("ts")).alias("active_week")
    ).distinct()
    joined = firsts.join(activity, "user_id", "left")
    return joined.groupBy("cohort_week").agg(
        F.countDistinct("user_id").alias("cohort_size"),
        F.countDistinct(
            F.when(
                col("active_week") == col("cohort_week") + F.expr("INTERVAL 7 DAYS"),
                col("user_id"),
            )
        ).alias("retained_next_week"),
    )


@register(
    "events_ohlc_resample",
    oracle="""
    SELECT user_id,
           time_bucket(INTERVAL 15 MINUTES, ts) AS bucket_start,
           CAST(count(*) AS BIGINT)   AS n_ticks,
           arg_min(value, ts)         AS open_v,
           max(value)                 AS high_v,
           min(value)                 AS low_v,
           arg_max(value, ts)         AS close_v,
           CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
               AS total_v
    FROM (
        SELECT user_id, value, ts,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) AS rn
        FROM events
    ) WHERE rn = 1
    GROUP BY 1, 2
    """,
)
def events_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling to 15-minute OHLC bars per user — the
    hypertable-rollup / financial-bars shape: open/close via
    min_by/max_by(value, ts) (one shuffle keyed by (user, bucket), all
    JVM-side; the continuous aggregate a time-series store would maintain
    incrementally — compose with operators/incremental.py:refresh_rollup
    for that). Ties on ts are broken to the lowest event_id BEFORE the
    aggregate (both engines), making arg_min/arg_max deterministic; money
    totals follow the exact-decimal policy."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy("event_id")
    dedup = (
        e.withColumn("rn", F.row_number().over(w)).filter(col("rn") == 1)
    )
    return dedup.groupBy(
        "user_id", F.window("ts", "15 minutes").start.alias("bucket_start")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
        F.min_by("value", "ts").alias("open_v"),
        F.max("value").alias("high_v"),
        F.min("value").alias("low_v"),
        F.max_by("value", "ts").alias("close_v"),
        dsum("value").alias("total_v"),
    )


@register(
    "events_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ), active AS (
        SELECT DISTINCT e.user_id, f.cohort_week,
               CAST(date_diff('day', f.cohort_week,
                              date_trunc('week', e.ts)) / 7 AS BIGINT) AS week_offset
        FROM events e JOIN firsts f USING (user_id)
    ), cohort_sizes AS (
        SELECT cohort_week, count(*) AS n_cohort FROM firsts GROUP BY cohort_week
    )
    SELECT a.cohort_week, a.week_offset,
           CAST(count(*) AS BIGINT)        AS n_active,
           CAST(s.n_cohort AS BIGINT)      AS n_cohort,
           count(*) / CAST(s.n_cohort AS DOUBLE) AS retention
    FROM active a JOIN cohort_sizes s USING (cohort_week)
    GROUP BY a.cohort_week, a.week_offset, s.n_cohort
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix — the standard product-analytics triangle:
    users are cohorted by the ISO week of their first event, and each
    (cohort_week, week_offset) cell counts distinct users from that cohort
    active offset weeks later, with the retention rate relative to cohort
    size (rule 7: every cell is a fraction of a data-derived denominator).
    Exact integer counts + one final division — no float aggregation.
    Shape: one min-agg by user (map-side combined), a broadcastable
    first-week table joined back onto the event scan, distinct on compact
    (user, week) keys, then a count by cell — all shuffles carry keys,
    never event payloads. Both engines truncate weeks to ISO Monday."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", col("ts")), col("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    sizes = firsts.groupBy("cohort_week").agg(F.count(F.lit(1)).alias("n_cohort"))
    return (
        active.join(sizes, "cohort_week")
        .groupBy("cohort_week", "week_offset", "n_cohort")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            "cohort_week",
            "week_offset",
            "n_active",
            "n_cohort",
            (col("n_active") / col("n_cohort").cast("double")).alias("retention"),
        )
    )


@register(
    "events_inter_arrival_stats",
    oracle="""
    WITH d AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    ), g AS (
        SELECT event_type, gap_us,
               row_number() OVER (PARTITION BY event_type ORDER BY gap_us) AS rn,
               count(*)    OVER (PARTITION BY event_type)                  AS n
        FROM d WHERE gap_us IS NOT NULL
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT)                                     AS n_gaps,
           CAST(min(gap_us) AS BIGINT)                                AS min_gap_us,
           CAST(min(CASE WHEN rn >= ceil(0.5 * n)  THEN gap_us END) AS BIGINT) AS p50_gap_us,
           CAST(min(CASE WHEN rn >= ceil(0.95 * n) THEN gap_us END) AS BIGINT) AS p95_gap_us,
           CAST(max(gap_us) AS BIGINT)                                AS max_gap_us
    FROM g GROUP BY event_type
    """,
)
def events_inter_arrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISCONTINUOUS percentiles (p50/p95) of per-user inter-arrival
    gaps by event type — the latency/heartbeat profile an event pipeline
    monitors. percentile_disc semantics (first element at-or-past rank
    ceil(q·n)) so both engines pick the IDENTICAL element, where
    percentile_cont implementations interpolate with engine-specific float
    op order (rule 1 discipline). Gaps are exact integer microseconds
    (unix_micros — the rule-1 interval policy).

    Shape: one shuffle by (user, type) for the lag, then the TWO-PHASE
    bucket-histogram percentile (operators/quantiles.py) — the original
    ``row_number() OVER (PARTITION BY event_type ORDER BY gap_us)`` capped
    parallelism at the number of event types (5 partitions sorting 2M rows
    each at the 100× fixture, measured 30 s); the two-phase plan ranks only
    the target buckets and holds at any event volume. The oracle keeps the
    literal single-window spec — the rewrite is value-identical by
    construction and the hash compare proves it."""
    from map_reduce_group_spark.operators.quantiles import grouped_percentile_disc

    e = load_table(spark, sf_dir, "events")
    per_user = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    d = e.select(
        "event_type",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(per_user)
        ).alias("gap_us"),
    ).filter(col("gap_us").isNotNull())
    base = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )
    pct = grouped_percentile_disc(d, "event_type", "gap_us", [0.5, 0.95])
    return base.join(pct, "event_type").select(
        "event_type",
        "n_gaps",
        "min_gap_us",
        col("p50").cast("long").alias("p50_gap_us"),
        col("p95").cast("long").alias("p95_gap_us"),
        "max_gap_us",
    )


@register(
    "events_hourly_gapfill",
    oracle="""
    WITH top_users AS (
        SELECT user_id FROM events
        GROUP BY 1 ORDER BY count(*) DESC, user_id LIMIT 3
    ), obs AS (
        SELECT user_id, epoch_us(ts) // 3600000000 AS bucket,
               CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
        FROM events
        WHERE user_id IN (SELECT user_id FROM top_users)
        GROUP BY 1, 2
    ), spine AS (
        SELECT user_id, unnest(range(mn, mx + 1)) AS bucket
        FROM (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx FROM obs GROUP BY 1)
    ), j AS (
        SELECT s.user_id, s.bucket, o.cents
        FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.bucket = o.bucket
    ), w AS (
        SELECT user_id, bucket, cents,
            last_value(cents IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf,
            last_value(cents IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
            last_value(CASE WHEN cents IS NOT NULL THEN bucket END IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pb,
            first_value(cents IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
            first_value(CASE WHEN cents IS NOT NULL THEN bucket END IGNORE NULLS) OVER (
                PARTITION BY user_id ORDER BY bucket
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nb
        FROM j
    )
    SELECT user_id, bucket, cents IS NOT NULL AS observed, cents AS cents_obs,
           locf AS locf_cents,
           CASE WHEN cents IS NOT NULL THEN cents
                WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
                     pv + CAST(FLOOR(((nv - pv) * (bucket - pb)) * 1.0 / (nb - pb)) AS BIGINT)
                ELSE NULL END AS interp_cents
    FROM w
    """,
)
def events_hourly_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time_bucket gapfill + locf + interpolate
    (operators/timeseries.py:bucketed_gapfill_locf) over the 3 most active
    users' hourly value series — TimescaleDB's rollup-fill primitive,
    which the reference cannot express at all (batch, typeless).

    Scale stability (rule 7): the series keys are TOP-K BY ACTIVITY (never
    a fixed id list), so the query selects real series at any SF; spine
    volume is keys × time-range, independent of event count; fill windows
    partition per key. Determinism: integer-cents DECIMAL sums, exact
    bucket indexes (`unix_micros div`), and one terminal FLOOR(double
    division of exact small integers) for the interpolation — the same
    single-division contract as weighted_systematic_sample."""
    from map_reduce_group_spark.operators.timeseries import bucketed_gapfill_locf

    e = load_table(spark, sf_dir, "events")
    top = (
        e.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "user_id")
        .limit(3)
        .select("user_id")
    )
    picked = e.join(F.broadcast(top), "user_id")
    return bucketed_gapfill_locf(picked, "user_id", "ts", "value")


@register(
    "events_anomaly_mad",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
        FROM events GROUP BY 1, 2
    ), med AS (
        SELECT event_type, CAST(median(2 * n) AS BIGINT) AS med2
        FROM hourly GROUP BY 1
    ), dev AS (
        SELECT h.event_type, h.hour, h.n, abs(2 * h.n - m.med2) AS dev2
        FROM hourly h JOIN med m USING (event_type)
    ), mad AS (
        SELECT event_type, CAST(median(2 * dev2) AS BIGINT) AS mad4
        FROM dev GROUP BY 1
    )
    SELECT d.event_type, d.hour, CAST(d.n AS BIGINT) AS n,
           CAST(d.dev2 AS BIGINT) AS dev2, CAST(m.mad4 AS BIGINT) AS mad4,
           (2 * d.dev2 > 3 * m.mad4) AS is_anomaly
    FROM dev d JOIN mad m USING (event_type)
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust time-series anomaly flags: hourly event counts per type,
    flagged where the deviation from the per-type MEDIAN exceeds 3× the
    median absolute deviation — the median/MAD robust-z screen that survives
    the outliers a mean/stddev screen is distorted by. All medians run on
    DOUBLED integers (median of an even-cardinality set of even integers is
    integral → exact in both engines; the 3×MAD comparison is pure BIGINT —
    no float medians cross the oracle, CLAUDE.md rule 1). The 3×MAD
    threshold is data-relative (rule 7): the flagged fraction is stable as
    the corpus grows. Scale: one partial-agg shuffle to hourly counts
    (output is hours×types — calendar-bounded, not event-bounded), then
    per-type medians over that bounded frame; the med/mad frames are
    type-cardinality broadcast dims."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    med = hourly.groupBy("event_type").agg(
        F.median(2 * col("n")).cast("long").alias("med2")
    )
    dev = hourly.join(F.broadcast(med), "event_type").select(
        "event_type", "hour", "n", F.abs(2 * col("n") - col("med2")).alias("dev2")
    )
    mad = dev.groupBy("event_type").agg(
        F.median(2 * col("dev2")).cast("long").alias("mad4")
    )
    return dev.join(F.broadcast(mad), "event_type").select(
        "event_type",
        "hour",
        "n",
        "dev2",
        "mad4",
        (2 * col("dev2") > 3 * col("mad4")).alias("is_anomaly"),
    )


@register(
    "events_hourly_trend",
    oracle="""
    WITH hourly AS (
        SELECT event_type, epoch_us(ts) // 3600000000 AS x, count(*) AS y
        FROM events GROUP BY 1, 2
    ), base AS (
        SELECT event_type, min(x) AS x0 FROM hourly GROUP BY 1
    ), xy AS (
        SELECT h.event_type, h.x - b.x0 AS x, h.y
        FROM hourly h JOIN base b USING (event_type)
    ), s AS (
        SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
               sum(x * x) AS sxx, sum(x * y) AS sxy
        FROM xy GROUP BY 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_hours,
           CAST(sy AS BIGINT) AS total_events,
           CAST((1000000 * (n * sxy - sx * sy))
                // (n * sxx - sx * sx) AS BIGINT) AS slope_micro_per_hour
    FROM s
    """,
)
def events_hourly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event-rate TREND: exact OLS slope of hourly counts against
    the hour index, in integer micro-events/hour — the "is this metric
    growing" monitor. The closed-form slope (n·Σxy − Σx·Σy)/(n·Σx² −
    (Σx)²) runs entirely in integers: hour indexes are unix_micros ``div``
    3600e6 (rule-1 interval policy) re-based to each type's first hour, the
    1e6-scaled numerator accumulates in DECIMAL(38,0) (a 100 TB corpus
    overflows BIGINT there), and the final ``div`` truncates identically
    to DuckDB ``//`` (both toward zero, verified on negatives). Scale: one
    partial-agg shuffle to hourly counts (calendar-bounded frame), then a
    per-type scalar aggregate; no windows, no sorts."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.expr("unix_micros(ts) div 3600000000").alias("x")
    ).agg(F.count(F.lit(1)).alias("y"))
    base = hourly.groupBy("event_type").agg(F.min("x").alias("x0"))
    xy = hourly.join(F.broadcast(base), "event_type").select(
        "event_type", (col("x") - col("x0")).alias("x"), "y"
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    s = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(col("x") * col("x")).alias("sxx"),
        F.sum(dec(col("x")) * dec(col("y"))).alias("sxy"),
    )
    return s.select(
        "event_type",
        col("n").cast("long").alias("n_hours"),
        col("sy").cast("long").alias("total_events"),
        F.expr(
            "CAST(1000000 * (CAST(n AS DECIMAL(38,0)) * sxy"
            " - CAST(sx AS DECIMAL(38,0)) * sy) AS DECIMAL(38,0))"
            " div CAST(CAST(n AS DECIMAL(38,0)) * sxx"
            " - CAST(sx AS DECIMAL(38,0)) * sx AS DECIMAL(38,0))"
        ).alias("slope_micro_per_hour"),
    )


@register(
    "events_dow_seasonality",
    oracle="""
    WITH d AS (
        SELECT event_type,
               CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS dow,
               count(*) AS c
        FROM events GROUP BY 1, 2
    ), t AS (
        SELECT event_type, sum(c) AS total FROM d GROUP BY 1
    )
    SELECT d.event_type, d.dow, CAST(d.c AS BIGINT) AS n_events,
           CAST((10000 * 7 * d.c) // t.total AS BIGINT) AS share_bp_of_uniform
    FROM d JOIN t USING (event_type)
    """,
)
def events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: each weekday's share
    relative to a uniform week, in integer basis points (10 000 = exactly
    1/7 of the type's events) — the weekly-rhythm diagnostic behind traffic
    forecasting. The weekday derives from pure epoch arithmetic
    ((unix_micros div 86 400e6 + 4) mod 7; 1970-01-01 was a Thursday, so
    0 = Sunday) rather than engine calendar functions, whose week-start
    conventions differ (rule-1 interval policy). Scale: one partial-agg
    shuffle to the |types|×7 matrix; integer ``div`` fixed point."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.expr("(unix_micros(ts) div 86400000000 + 4) % 7").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("c"))
    t = d.groupBy("event_type").agg(F.sum("c").alias("total"))
    return d.join(F.broadcast(t), "event_type").select(
        "event_type",
        "dow",
        col("c").alias("n_events"),
        F.expr("(10000 * 7 * c) div total").alias("share_bp_of_uniform"),
    )
