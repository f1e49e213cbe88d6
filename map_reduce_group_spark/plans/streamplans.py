"""Structured Streaming queries registered in the main query surface.

Each builder runs a real streaming query (file source → watermarked
stateful aggregation → availableNow trigger → memory sink) and returns the
result table — so the DRIVER'S ORACLE CHECKS RUN AGAINST A STREAMING
EXECUTION: the streaming operators must reproduce the batch SQL answer
exactly (same oracle strings as their batch twins in plans/events.py).
"""

from __future__ import annotations

import itertools
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from map_reduce_group_spark.plans.registry import register
from map_reduce_group_spark.streaming import events_stream as es

_COUNTER = itertools.count()
_STREAM_DIRS: dict[str, str] = {}


def _events_stream_dir(sf_dir: str) -> str:
    """File stream sources need a directory; expose the single events
    parquet file via a symlinked temp dir (testdata is read-only).
    Cached per sf_dir so repeated builder invocations don't leak dirs."""
    if sf_dir not in _STREAM_DIRS:
        d = tempfile.mkdtemp(prefix="mrg_stream_src_")
        os.symlink(os.path.join(sf_dir, "events.parquet"), os.path.join(d, "events.parquet"))
        _STREAM_DIRS[sf_dir] = d
    return _STREAM_DIRS[sf_dir]


@register(
    "stream_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start,
           event_type,
           count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming watermarked tumbling-window aggregation, executed with an
    availableNow trigger — must match the BATCH oracle bit-for-bit (same
    exact-decimal totals). State: one row per (window, event_type)."""
    stream = es.read_events_stream(spark, _events_stream_dir(sf_dir))
    return es.run_to_memory(
        es.tumbling_counts(stream), f"q_stream_tumbling_{next(_COUNTER)}"
    )


@register(
    "stream_sessionization",
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
    SELECT user_id,
           min(ts) AS session_start,
           count(*) AS n_events,
           CAST(CAST(sum(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS session_value
    FROM sessioned
    GROUP BY user_id, session_seq
    """,
)
def stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ``session_window`` (30-min gap) under availableNow — checked
    against the batch gaps-and-islands oracle: the incremental session-merge
    state machine must produce the identical session set."""
    stream = es.read_events_stream(spark, _events_stream_dir(sf_dir))
    return es.run_to_memory(
        es.session_aggregate(stream), f"q_stream_sessions_{next(_COUNTER)}"
    )
