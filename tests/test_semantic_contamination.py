"""Planted-paraphrase property tests for embedding-level benchmark
decontamination (VERDICT r8 #3): a paraphrased benchmark item shares NO
token n-gram with its source, so the n-gram sweep
(operators/dedup.py:benchmark_contamination) must structurally miss it,
while the semantic sweep (operators/similarity.py:semantic_contamination)
must catch it through the near-parallel embedding.
"""

from __future__ import annotations

import numpy as np
import pytest

from map_reduce_group_spark.operators.dedup import benchmark_contamination
from map_reduce_group_spark.operators.similarity import semantic_contamination

pytestmark = pytest.mark.quick


def _unit(v):
    a = np.asarray(v, dtype=np.float64)
    return (a / np.sqrt((a * a).sum())).tolist()


def test_planted_paraphrase_ngram_misses_semantic_catches(spark):
    # benchmark item and its token-disjoint paraphrase: zero shared
    # 3-grams (zero shared TOKENS, even), near-parallel embeddings
    bench_text = "the quick brown fox jumps over the lazy dog tonight"
    para_text = "a speedy umber vulpine leaps across one idle hound nightly"
    clean_text = "completely unrelated text about parquet shuffle planning"

    docs = spark.createDataFrame(
        [(1, bench_text), (10, para_text), (11, clean_text)],
        "doc_id long, text string",
    )
    ng = benchmark_contamination(
        docs.filter("doc_id >= 10"),
        docs.filter("doc_id = 1"),
        "doc_id",
        "text",
        n=3,
    )
    shared = {r["id"]: r["n_shared"] for r in ng.collect()}
    assert shared == {10: 0, 11: 0}  # n-gram pass blind to the paraphrase

    rng = np.random.default_rng(7)
    bench_vec = _unit(rng.normal(size=16))
    para_vec = _unit(np.asarray(bench_vec) + 0.01 * rng.normal(size=16))
    clean_vec = _unit(rng.normal(size=16))
    emb = spark.createDataFrame(
        [(1, bench_vec), (10, para_vec), (11, clean_vec)],
        "vec_id long, embedding array<double>",
    )
    sem = semantic_contamination(
        emb.filter("vec_id >= 10"), emb.filter("vec_id = 1"), threshold=0.9
    )
    rows = {r["id"]: r for r in sem.collect()}
    assert set(rows) == {10, 11}  # exactly one row per corpus vector
    assert rows[10]["contaminated"] and rows[10]["bench_id"] == 1
    assert rows[10]["cos"] > 0.99
    assert not rows[11]["contaminated"]


def test_tie_break_and_empty_bench(spark):
    v = _unit([1.0] * 8 + [0.0] * 8)
    emb = spark.createDataFrame(
        [(100, v)], "vec_id long, embedding array<double>"
    )
    # two IDENTICAL bench vectors -> rounded-cosine tie -> lowest bench id
    bench = spark.createDataFrame(
        [(7, v), (3, v)], "vec_id long, embedding array<double>"
    )
    out = semantic_contamination(emb, bench, threshold=0.5).collect()
    assert len(out) == 1 and out[0]["bench_id"] == 3 and out[0]["contaminated"]

    empty = semantic_contamination(emb, bench.filter("vec_id < 0"))
    assert empty.count() == 0
    assert set(empty.columns) == {"id", "bench_id", "cos", "contaminated"}


def test_bounded_bench_raises(spark):
    v = _unit(list(range(1, 9)))
    emb = spark.createDataFrame(
        [(i, v) for i in range(5)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="benchmark rows"):
        semantic_contamination(emb, emb, max_bench=3)
