"""The exact-decimal aggregation policy's load-bearing claims
(functions/numeric.py): results are independent of partition count and
equal to true decimal arithmetic."""

from __future__ import annotations

import random
from decimal import Decimal

import pyspark.sql.functions as F

from map_reduce_group_spark.functions.numeric import davg, dsum


def _data(n=10_000, groups=50, seed=11):
    rng = random.Random(seed)
    return [(rng.randrange(groups), round(rng.uniform(-1000, 1000), 2)) for _ in range(n)]


def test_dsum_equals_true_decimal_sum(spark):
    rows = _data()
    df = spark.createDataFrame(rows, "g int, v double")
    got = {r["g"]: r["s"] for r in df.groupBy("g").agg(dsum("v").alias("s")).collect()}

    want: dict[int, Decimal] = {}
    for g, v in rows:
        want[g] = want.get(g, Decimal(0)) + Decimal(f"{v:.2f}")
    assert got == {g: float(s) for g, s in want.items()}


def test_aggregates_independent_of_partitioning(spark):
    """Identical bits whether the data lives in 1, 7, or 64 partitions —
    the property raw double sums do NOT have."""
    rows = _data()
    results = []
    for parts in (1, 7, 64):
        df = spark.createDataFrame(rows, "g int, v double").repartition(parts)
        res = sorted(
            (r["g"], r["s"], r["a"])
            for r in df.groupBy("g")
            .agg(dsum("v").alias("s"), davg("v").alias("a"))
            .collect()
        )
        results.append(res)
    assert results[0] == results[1] == results[2]


def test_input_file_name_observable(spark, tmp_path):
    """SURVEY §2B 'deterministic file order': per-row provenance via
    input_file_name()."""
    for i in range(3):
        (tmp_path / f"f{i}.txt").write_text(f"line-from-{i}\n")
    df = spark.read.text(str(tmp_path)).withColumn(
        "src", F.regexp_extract(F.input_file_name(), r"(f\d)\.txt", 1)
    )
    rows = {(r["value"], r["src"]) for r in df.collect()}
    assert rows == {(f"line-from-{i}", f"f{i}") for i in range(3)}


def test_negative_paths(spark):
    import pytest as _pytest

    from map_reduce_group_spark.catalog import load_table
    from map_reduce_group_spark.operators.text import chunk_documents

    with _pytest.raises(KeyError):
        load_table(spark, "/root/testdata/sf0.001", "nope")
    with _pytest.raises(ValueError):
        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        chunk_documents(d, "doc_id", "text", chunk_size=8, overlap=8)
