"""DSIR-style importance scoring for training-data selection — rank every
document by how much its hashed-bigram distribution looks like a TARGET
subcorpus relative to the raw corpus (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling": hashed n-gram features,
a target/raw likelihood ratio per feature bucket, per-document sums).

Exactness policy (CLAUDE.md rule 1): DSIR's log-likelihood ratio is
replaced by the repo's integer fixed-point ratio convention (the
bigram_surprisal pattern) — per-bucket weight

    w_b = ((t_b + 1) · N_corpus · 1024) div ((c_b + 1) · N_target)

an add-one-smoothed target/corpus rate ratio in 1/1024 fixed point,
normalized by the two feature totals so the score is scale-free. Every
operand is an integer (DECIMAL(38,0) where products can pass BIGINT), so
a DuckDB oracle replays scores and keep flags bit-for-bit; hash buckets
come from the md5-derived :func:`~map_reduce_group_spark.operators.dedup.
portable_hash60` (always positive, so ``%`` and ``pmod`` agree across
engines).

Scale shape (100 TB): bigrams assemble with posexplode + a doc-partitioned
lead window (rule-2 shape, no interpreted lambdas); the corpus collapses
to ≤ ``n_buckets`` (bucket, corpus_count, target_count) rows in ONE
map-side-combined aggregation (the target count rides along as a
conditional sum — no second pass over the data); the weight table and the
two scalar envelopes broadcast; per-document scoring is one key-partitioned
groupBy. Nothing driver-side, no global sort — the keep flag is
"above corpus-average importance", an integer cross-multiplication against
a one-row broadcast envelope (data-size-relative per CLAUDE.md rule 7,
where a fixed score threshold would drift with corpus size).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.functions import col

from map_reduce_group_spark.operators.dedup import portable_hash60
from map_reduce_group_spark.operators.text import spread_small_scan, tokens


def hashed_bigram_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    n_buckets: int,
) -> DataFrame:
    """Per-bigram hashed feature rows (id, is_target, bucket) — the shared
    front half of :func:`importance_scores` and the perceptron's feature
    builder (operators/classifier.py:_features): tokenize → posexplode →
    doc-partitioned lead window → pmod(md5-hash, n_buckets). Split out so a
    composite audit (corpus_filter_agreement) can run the corpus-sized
    tokenize+hash pass ONCE and feed both branches — the two derivations
    are bit-identical, so sharing cannot change either output (guide-§2.3
    class: one scan+exchange instead of two)."""
    base = spread_small_scan(
        df.select(
            col(id_col).alias("id"),
            col(text_col).alias("text"),
            # null-safe label (ADVICE r9): a NULL target must classify as
            # non-target (0), matching the oracle twins' CASE WHEN … ELSE 0.
            # A bare cast("int") maps NULL → NULL, which groups separately
            # downstream and nulls the perceptron's y = 2·is_target − 1.
            F.when(target, F.lit(1)).otherwise(F.lit(0)).alias("is_target"),
        )
    )
    t = base.select(
        "id", "is_target", F.posexplode(tokens("text")).alias("pos", "tok")
    )
    w = Window.partitionBy("id").orderBy("pos")
    bg = t.select(
        "id",
        "is_target",
        col("tok").alias("a"),
        F.lead("tok", 1).over(w).alias("b"),
    ).filter(col("b").isNotNull())
    return bg.select(
        "id",
        "is_target",
        F.pmod(
            portable_hash60(F.concat_ws(" ", "a", "b")), F.lit(n_buckets)
        ).alias("bucket"),
    )


def importance_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    n_buckets: int = 4096,
    bigram_buckets: DataFrame | None = None,
) -> DataFrame:
    """Per-document DSIR-style importance: (id, n_feats, score_fp, kept).

    ``target`` is a boolean Column over ``df``'s rows selecting the target
    subcorpus (must be non-empty — the rate ratio is undefined against an
    empty target, and the weight division nulls out). ``score_fp`` is the
    sum of the document's per-bigram bucket weights (1/1024 fixed point);
    ``kept`` = 1 iff the document's mean feature weight exceeds the corpus
    mean (score_fp·Σn_feats > Σscore_fp·n_feats — exact integers, no
    division). Documents with fewer than 2 tokens carry no bigrams and are
    absent, identically in both engines.

    ``bigram_buckets`` optionally injects a precomputed
    :func:`hashed_bigram_buckets` frame (same df/target/n_buckets) so a
    composite caller shares the tokenize+hash pass; None (the default)
    keeps this operator self-contained and byte-identical to before.
    """
    from pyspark import StorageLevel

    # feat feeds the bucket-count aggregation (itself read twice: totals
    # and weights) AND the per-doc scoring join — unpersisted, the
    # tokenize→hash head planned three times (guide §2.4). An injected
    # precomputed frame is already materialized by the caller, so only the
    # self-built path persists.
    feat = (
        bigram_buckets
        if bigram_buckets is not None
        else hashed_bigram_buckets(df, id_col, text_col, target, n_buckets).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    # corpus + target counts in ONE aggregation — ≤ n_buckets rows survive
    bc = feat.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("c"), F.sum("is_target").alias("t")
    )
    totals = bc.agg(F.sum("c").alias("nc"), F.sum("t").alias("nt"))
    wt = bc.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.expr(
            "CAST(CAST(t + 1 AS DECIMAL(38,0)) * nc * 1024"
            " div (CAST(c + 1 AS DECIMAL(38,0)) * nt) AS BIGINT)"
        ).alias("w_fp"),
    )
    # doc is read twice (the corpus-mean envelope and the final select);
    # 3 longs per document, spillable
    doc = (
        feat.join(F.broadcast(wt), "bucket")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_feats"), F.sum("w_fp").alias("score_fp"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    env = doc.agg(F.sum("score_fp").alias("gs"), F.sum("n_feats").alias("gn"))
    return doc.crossJoin(F.broadcast(env)).select(
        "id",
        "n_feats",
        "score_fp",
        F.expr(
            "CAST(CASE WHEN CAST(score_fp AS DECIMAL(38,0)) * gn"
            " > CAST(gs AS DECIMAL(38,0)) * n_feats THEN 1 ELSE 0 END AS INT)"
        ).alias("kept"),
    )
