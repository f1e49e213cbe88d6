"""Time-series gapfill — the hypertable/rollup primitive (TimescaleDB
`time_bucket_gapfill` + `locf` + `interpolate`, InfluxDB `fill()`): bucket an
event stream into a dense fixed-step time spine and fill the empty buckets
from their observed neighbors, per series key.

Why an engine needs it: downstream consumers of a rollup (dashboards,
feature stores, anomaly detectors) require a REGULAR series — one row per
(key, bucket) even where no event landed — and the fill policy (carry the
last observation forward / linearly interpolate) is a relational transform,
not a client-side patch, once the series count is large.

Scale shape: the spine is generated per key from that key's own [min, max]
bucket range (``sequence`` + ``explode`` — codegen, no Python), so spine
volume is Σ_key range_k / step — proportional to key-count × time-range,
NOT to event-count; the fill windows partition by key (never a global
window), so state per task is one series. At 100 TB the bucketing
aggregation is the only data-sized shuffle; everything after operates on the
pre-reduced (key, bucket) relation.

Determinism (repo rule 1): the bucketed value is 2-decimal money summed in
DECIMAL and carried as integer cents; bucket indexes are exact
``unix_micros div step`` BIGINTs; the one interpolation division is a single
IEEE-754 double division of exact small integers followed by FLOOR —
bit-reproducible on any engine (same contract as
operators/sampling.py:weighted_systematic_sample's terminal division note).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import col

#: one hour in microseconds — the default gapfill step.
HOUR_US = 3_600_000_000


def bucketed_gapfill_locf(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    bucket_us: int = HOUR_US,
) -> DataFrame:
    """Dense per-key time series with LOCF and linear-interpolation fill.

    Returns one row per (key, bucket) over each key's own observed bucket
    span: ``(key, bucket, observed, cents_obs, locf_cents, interp_cents)``
    where ``bucket = unix_micros(ts) div bucket_us``, ``cents_obs`` is the
    bucket's DECIMAL(18,2) value sum in integer cents (NULL where no event
    landed), ``locf_cents`` carries the last observed value forward
    (NULL before the first observation), and ``interp_cents`` linearly
    interpolates between the surrounding observations
    (= the observation itself on observed rows; NULL outside the
    observed hull).
    """
    obs = (
        events.select(
            col(key_col).alias("k"),
            F.expr(f"unix_micros({ts_col}) div {bucket_us}").alias("bucket"),
            col(value_col).cast("decimal(18,2)").alias("v"),
        )
        .groupBy("k", "bucket")
        .agg((F.sum("v") * 100).cast("long").alias("cents"))
    )
    spine = (
        obs.groupBy("k")
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select("k", F.explode(F.sequence(col("mn"), col("mx"))).alias("bucket"))
    )
    j = spine.join(obs, ["k", "bucket"], "left")

    past = Window.partitionBy("k").orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    strict_past = Window.partitionBy("k").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    future = Window.partitionBy("k").orderBy("bucket").rowsBetween(1, Window.unboundedFollowing)
    obs_bucket = F.when(col("cents").isNotNull(), col("bucket"))

    filled = j.select(
        "k",
        "bucket",
        col("cents").isNotNull().alias("observed"),
        col("cents").alias("cents_obs"),
        F.last("cents", ignorenulls=True).over(past).alias("locf_cents"),
        F.last("cents", ignorenulls=True).over(strict_past).alias("pv"),
        F.last(obs_bucket, ignorenulls=True).over(strict_past).alias("pb"),
        F.first("cents", ignorenulls=True).over(future).alias("nv"),
        F.first(obs_bucket, ignorenulls=True).over(future).alias("nb"),
    )
    interp = (
        F.when(col("cents_obs").isNotNull(), col("cents_obs"))
        .when(
            col("pv").isNotNull() & col("nv").isNotNull(),
            col("pv")
            + F.floor(
                ((col("nv") - col("pv")) * (col("bucket") - col("pb")))
                / (col("nb") - col("pb"))
            ).cast("long"),
        )
        .otherwise(F.lit(None).cast("long"))
    )
    return filled.select(
        col("k").alias(key_col),
        "bucket",
        "observed",
        "cents_obs",
        "locf_cents",
        interp.alias("interp_cents"),
    )
