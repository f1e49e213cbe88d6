"""Driver contract for the spark-graft builder (PySpark target).

Thin façade over :mod:`map_reduce_group_spark.plans.registry` — every
implemented operator from SURVEY.md §2 registers a named query (and, when
SQL-expressible, a DuckDB oracle) there.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from map_reduce_group_spark.plans import oracles as _oracles
from map_reduce_group_spark.plans import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-shaped pricing
    summary (scan→filter→groupBy→multi-agg over lineitem)."""
    return _queries()["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracles()
