"""Similarity search over embedding columns (north-star, BASELINE.json).

- brute-force cosine top-k: the exact baseline — query×corpus join with a
  JVM-side fold for the dot product (zip_with + aggregate; no Python).
- IVF-style bucketed ANN: deterministic hyperplane LSH code per vector;
  query probes only its bucket (and optionally neighbors) — the scale path:
  corpus is pre-partitioned by bucket, each query touches 1/2^p of it.

Scale (100 TB of embeddings): brute force is a full corpus scan per query
batch — fine when queries are few (it's one broadcast join), wrong for many
queries. IVF buckets make the join key (bucket) the shuffle key, so the
corpus shuffles once and stays partitioned; multiprobe trades recall for
fan-out. Signatures/centroids would be trained (k-means) in a real system —
here hyperplanes are fixed/deterministic so results are reproducible and
oracle-checkable.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.functions import col


def _dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in double precision, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 5,
) -> DataFrame:
    """Exact brute-force cosine top-k: (q_id, c_id, cos, rank).

    Norms are precomputed per side (O(n·d)) so the pair loop is one fold.
    The per-query ranking uses the ROUNDED cosine with id tie-break so
    ordering is reproducible across engines. Self-matches are excluded.

    Physical plan: broadcast the (small) query side, scan the corpus once,
    TakeOrdered per query via window row_number.
    """
    q = queries.select(
        col(id_col).alias("q_id"),
        col(vec_col).alias("q_vec"),
        _norm(col(vec_col)).alias("q_norm"),
    )
    c = corpus.select(
        col(id_col).alias("c_id"),
        col(vec_col).alias("c_vec"),
        _norm(col(vec_col)).alias("c_norm"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(col("q_id") != col("c_id"))
        .withColumn(
            "cos",
            F.round(_dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), round_digits),
        )
    )
    w = Window.partitionBy("q_id").orderBy(col("cos").desc(), col("c_id"))
    return (
        pairs.select("q_id", "c_id", "cos", F.row_number().over(w).alias("rank"))
        .filter(col("rank") <= k)
    )


# deterministic hyperplanes: plane[p][i] = ((i*31 + p*17) % 13) - 6
# — integer, reproducible anywhere, spread across dimensions.
def _plane_component(p: int, i: Column) -> Column:
    return ((i * 31 + F.lit(p * 17)) % 13 - 6).cast("double")


def lsh_bucket(vec: Column, n_planes: int = 4) -> Column:
    """Hyperplane-LSH code: bit p = sign(vec · plane_p) → int bucket 0..2^p-1."""
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double") * _plane_component(p, i),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    round_digits: int = 5,
) -> DataFrame:
    """ANN top-k: probe only the query's LSH bucket (1/2^p of the corpus).

    Approximate — neighbors in other buckets are missed (hyperplane LSH
    bounds the miss probability by the angular distance). Equi-join on
    bucket instead of a cross join: corpus shuffles/partitions by bucket
    once and can be reused across query batches.
    """
    q = queries.select(
        col(id_col).alias("q_id"),
        col(vec_col).alias("q_vec"),
        _norm(col(vec_col)).alias("q_norm"),
        lsh_bucket(col(vec_col), n_planes).alias("bucket"),
    )
    c = corpus.select(
        col(id_col).alias("c_id"),
        col(vec_col).alias("c_vec"),
        _norm(col(vec_col)).alias("c_norm"),
        lsh_bucket(col(vec_col), n_planes).alias("bucket"),
    )
    pairs = (
        q.join(c, "bucket")
        .filter(col("q_id") != col("c_id"))
        .withColumn(
            "cos",
            F.round(_dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm")), round_digits),
        )
    )
    w = Window.partitionBy("q_id").orderBy(col("cos").desc(), col("c_id"))
    return (
        pairs.select("q_id", "c_id", "bucket", "cos", F.row_number().over(w).alias("rank"))
        .filter(col("rank") <= k)
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 4,
    round_digits: int = 5,
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket with hyperplane LSH, verify
    cosine within buckets (approximate recall, exact precision)."""
    v = df.select(
        col(id_col).alias("id"),
        col(vec_col).alias("vec"),
        _norm(col(vec_col)).alias("nrm"),
        lsh_bucket(col(vec_col), n_planes).alias("bucket"),
    )
    x, y = v.alias("x"), v.alias("y")
    return (
        x.join(y, "bucket")
        .filter(col("x.id") < col("y.id"))
        .withColumn(
            "cos",
            F.round(_dot(col("x.vec"), col("y.vec")) / (col("x.nrm") * col("y.nrm")), round_digits),
        )
        .filter(col("cos") >= threshold)
        .select(col("x.id").alias("id_a"), col("y.id").alias("id_b"), "cos")
    )
