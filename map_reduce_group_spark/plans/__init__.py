"""Query plans — importing this package populates the registry."""

from map_reduce_group_spark.plans import (  # noqa: F401
    advanced,
    events,
    llm,
    mrplans,
    relational,
    streamplans,
    tpch,
    windows,
)
from map_reduce_group_spark.plans.registry import REGISTRY, oracles, queries

__all__ = ["REGISTRY", "oracles", "queries"]
