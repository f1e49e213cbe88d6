"""Query registry: the single source of truth for the engine's query surface.

Every operator/capability from SURVEY §2 that we implement registers here as
a named query:

- ``builder(spark, sf_dir) -> DataFrame`` — the PySpark-native implementation;
- ``oracle`` — equivalent ANSI SQL for the DuckDB oracle (None for queries
  whose semantics are not SQL-expressible; the driver then records a weaker
  rows-only check).

``__spark_entry__.queries()`` / ``oracle_sql()`` are direct views over this
registry. Column names are aliased identically on both sides because the
driver's comparator sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn`` as query ``name`` with optional oracle SQL."""

    def wrap(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")

        def guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
            # determinism confs (time zone etc.) regardless of session origin
            from map_reduce_group_spark.session import apply_runtime_confs

            apply_runtime_confs(spark)
            return fn(spark, sf_dir)

        guarded.__name__ = fn.__name__
        guarded.__doc__ = fn.__doc__
        REGISTRY[name] = QuerySpec(name=name, builder=guarded, oracle=oracle, doc=fn.__doc__ or "")
        return guarded

    return wrap


def queries() -> dict[str, Builder]:
    import map_reduce_group_spark.plans  # noqa: F401  (populates REGISTRY)

    return {name: spec.builder for name, spec in REGISTRY.items()}


def oracles() -> dict[str, str]:
    import map_reduce_group_spark.plans  # noqa: F401

    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
