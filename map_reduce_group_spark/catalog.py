"""Fixture catalog: the driver-generated parquet tables (TESTDATA.md).

The reference's only "catalog" is a directory listing (SURVEY §2A A1,
reference manager/__main__.py:371-374); ours is schema-on-read parquet via
Spark's built-in FileScan, which brings column pruning + predicate pushdown
for free. At 100 TB these tables would be partitioned/bucketed directories;
the loader is a single seam where that layout knowledge would live.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Catalog-level schema resolution (guide §6: repeated listing/footer work is
# driver-side overhead a real catalog amortizes — Hive/Iceberg store the
# schema in the metastore/manifest; per-query schema inference re-reads the
# parquet footer as a driver job, ~60-75 ms per load_table call on the bench
# host, and the heavy builders load 2-4 tables each). Cache the RESOLVED
# StructType per (absolute path, mtime_ns, size); any rewrite of the fixture
# invalidates the key. Only metadata is cached — every query still scans and
# computes from the parquet bytes.
_SCHEMA_CACHE: dict[tuple[str, int, int], object] = {}


def _file_key(path: str) -> tuple[str, int, int]:
    st = os.stat(path)
    return (os.path.abspath(path), st.st_mtime_ns, st.st_size)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects outright; read it as raw nanos (legacy conf) and
        # floor-convert to microseconds — exactly what DuckDB's TIMESTAMP
        # (µs) does, so oracle comparisons agree.
        # The conf is consumed when the parquet relation's schema is
        # resolved, so it is saved and restored around the read — a later
        # TIMESTAMP(NANOS) read by OTHER code in the same (possibly
        # externally-owned) session keeps its own semantics instead of
        # silently coming back as bigint. The conf stays scoped around the
        # schema-cached read too: the scan consults it when the relation is
        # constructed, whether the schema is inferred or supplied.
        from pyspark.sql import functions as F

        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        prior = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, "true")
        try:
            key = _file_key(path)
            cached = _SCHEMA_CACHE.get(key)
            if cached is not None:
                df = spark.read.schema(cached).parquet(path)
            else:
                df = spark.read.parquet(path)
                _SCHEMA_CACHE[key] = df.schema
        finally:
            if prior is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prior)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # µs parquet written without UTC adjustment (e.g. by DuckDB):
            # under a UTC session the instant is identical; normalize so
            # instant functions (unix_micros, window) apply uniformly
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    key = _file_key(path)
    cached = _SCHEMA_CACHE.get(key)
    if cached is not None:
        return spark.read.schema(cached).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMA_CACHE[key] = df.schema
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose the catalog as temp views so users can work in pure SQL:
    ``register_views(spark, sf); spark.sql("SELECT ... FROM lineitem ...")``.
    Views are lazy references to the normalized loaders (events keeps its
    timestamp normalization), so predicate pushdown / pruning apply exactly
    as through the DataFrame API — Catalyst sees the same logical plan."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run an ANSI-SQL query against the catalog tables (the user-facing
    SQL entry point — the same engine surface as the DataFrame builders;
    every registered query could equivalently be phrased through here)."""
    register_views(spark, sf_dir)
    return spark.sql(query)
