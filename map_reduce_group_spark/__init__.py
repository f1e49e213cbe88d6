"""map_reduce_group_spark — a PySpark-native analytics engine.

A ground-up rebuild of the query / data-processing capabilities of the
reference MapReduce framework (``pfjaco/map-reduce-group``, surveyed in
SURVEY.md) on Apache Spark:

- the reference's literal job API (map/reduce over keyed text records via
  arbitrary stdin/stdout executables) lives in :mod:`map_reduce_group_spark.mr`
  as a thin layer over ``rdd.pipe`` (SURVEY §2A rows A3/A8);
- the full capability matrix those jobs classically express (SURVEY §2B:
  scans, projections, filters, joins, aggregations, windows, sorts, set ops,
  scalar functions) is exposed as first-class DataFrame operators in
  :mod:`map_reduce_group_spark.plans` / :mod:`map_reduce_group_spark.operators`;
- north-star LLM-pipeline operators (dedup, similarity search, text analysis,
  multimodal columns) live in :mod:`map_reduce_group_spark.operators` and are
  registered as queries alongside everything else.

Everything is declarative DataFrame/SQL so Catalyst + AQE pick physical
strategies; Python-side execution (Pandas UDFs) appears only where built-ins
cannot express the semantics.
"""

__version__ = "0.1.0"

from map_reduce_group_spark.catalog import TABLES, load_table, load_tables
from map_reduce_group_spark.session import get_session

__all__ = ["TABLES", "get_session", "load_table", "load_tables", "__version__"]
