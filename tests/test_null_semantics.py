"""Cross-engine NULL semantics on a shared parquet file — fixtures are
null-free, so pin the conventions that differ between engines before they
bite: aggregate null-skipping, null grouping keys, and ORDER BY null
placement (Spark defaults NULLS FIRST asc, DuckDB NULLS LAST — always
spell it out)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from tests.helpers import canonicalize


def _shared_parquet(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    df = spark.createDataFrame(
        [(1, 10.0), (1, None), (2, None), (None, 5.0), (None, None), (3, 7.0)],
        "g int, v double",
    )
    df.coalesce(1).write.mode("overwrite").parquet(p)
    return p


def test_null_aggregation_and_grouping(spark, tmp_path):
    p = _shared_parquet(spark, tmp_path)
    got = canonicalize(
        spark.read.parquet(p)
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_vals"),
            F.sum("v").alias("s"),
            F.max("v").alias("mx"),
        )
        .toPandas()
    )
    want = canonicalize(
        duckdb.sql(
            f"""SELECT g, count(*) AS n_rows, count(v) AS n_vals,
                       sum(v) AS s, max(v) AS mx
                FROM read_parquet('{p}/*.parquet') GROUP BY g"""
        ).fetchdf()
    )
    assert got == want  # null keys group together; aggregates skip nulls


def test_null_ordering_explicit(spark, tmp_path):
    p = _shared_parquet(spark, tmp_path)
    got = [
        (r["g"], r["v"])
        for r in spark.read.parquet(p)
        .orderBy(F.col("v").asc_nulls_last(), F.col("g").asc_nulls_last())
        .collect()
    ]
    want = duckdb.sql(
        f"""SELECT g, v FROM read_parquet('{p}/*.parquet')
            ORDER BY v ASC NULLS LAST, g ASC NULLS LAST"""
    ).fetchall()

    def norm(rows):
        return [tuple(None if x is None or x != x else x for x in r) for r in rows]

    assert norm(got) == norm(want)


def test_foreign_key_check_ignores_null_child_keys(spark):
    """Standard SQL FK semantics: a NULL reference references nothing, so
    it is not an orphan (round-2 ADVICE) — but it still counts in total."""
    import pyspark.sql.functions as F

    from map_reduce_group_spark.operators.quality import check_foreign_key

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, None), (4, 99), (5, None)], "id int, fk int"
    )
    parent = spark.createDataFrame([(10,), (20,)], "k int")
    row = check_foreign_key(child, "fk", parent, "k", "fk").collect()[0]
    assert row["violations"] == 1  # only fk=99; the two NULLs pass
    assert row["total"] == 5
    assert row["passed"] is False
