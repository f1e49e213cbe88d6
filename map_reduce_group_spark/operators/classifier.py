"""Learned quality filter: a fastText-style hashed-bigram linear classifier
trained with a deterministic integer batch perceptron.

This is the LEARNED member of the corpus-filtering triad (CCNet/Gopher/DSIR):

- rule-based  — operators/text.py:quality_rules (Gopher rules);
- distributional — operators/importance.py (DSIR likelihood-ratio);
- learned     — this module: a discriminative linear model over hashed
  bigram counts, the fastText-classifier shape CCNet (Wenzek et al. 2020)
  uses for its quality/language filter, with the same hashed-feature
  convention as importance.py (md5-derived portable_hash60 % n_buckets).

Exactness policy (CLAUDE.md rule 1): SGD is replaced by the BATCH
perceptron — per epoch, score EVERY document against the current weights,
then apply one aggregate update

    w_{e+1}[b] = w_e[b] + Σ_{misclassified i} y_i · x_i[b]

with y ∈ {+1, −1} and x_i[b] the document's integer bucket count. Updates
are order-free integer SUMS (unlike per-row SGD, whose result depends on
pass order), so training replays bit-for-bit in any engine and any
partitioning — the same batched-serial-equivalence trick as BPE's merge
selection (operators/bpe.py). Epoch 1 from zero weights degenerates to
w_1 = Σ_i y_i·x_i (score 0 ⇒ every doc misclassified), so it is a single
aggregation. A DuckDB oracle unrolls the epochs as CTEs and replays every
weight and score exactly.

Scale shape (100 TB): feature assembly is the rule-2 posexplode + lead
shape; the feature matrix (id, y, bucket, x) materializes ONCE via an
eager localCheckpoint and is reused across epochs (blocks are
ContextCleaner-released when the plan is dropped; the trade — ADVICE
r8 #3 — is truncated lineage: a lost block aborts rather than recomputes,
acceptable for the driver/bench harness, swap to persist + explicit
unpersist where executor-loss recovery matters). Per epoch: one
broadcast join against the ≤ n_buckets+1-row weight table, one
doc-partitioned sum, one bucket-partitioned update aggregation. Driver
state is exactly the weight vector (≤ n_buckets+1 collected rows per
epoch, n_buckets ≤ 2^18 by contract) — never document data. Scoring
products are computed in DECIMAL(38,0) (== DuckDB HUGEINT): w is bounded
by epochs · max-bucket corpus count (~10^9 at 10^12 corpus tokens), x by
the document length, so w·x sums brush int64 at full scale and non-ANSI
Spark would wrap silently (the ADVICE r7 #1 headroom class).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.functions import col

from map_reduce_group_spark.operators.dedup import portable_hash60
from map_reduce_group_spark.operators.text import tokens

BIAS_BUCKET = -1  # constant-1 feature; lives beside the hashed buckets


def _features(df: DataFrame, id_col: str, text_col: str, target: Column,
              n_buckets: int, bigram_buckets: DataFrame | None = None) -> DataFrame:
    """(id, y, bucket, x): per-document hashed-bigram counts + a bias row.

    y ∈ {+1, −1}; documents with < 2 tokens carry no bigrams and are
    absent (identically in both engines), so every emitted doc has the
    bias row x=1 at bucket −1.

    ``bigram_buckets`` optionally injects a precomputed per-bigram
    (id, is_target, bucket) frame (operators/importance.py:
    hashed_bigram_buckets, same df/target/n_buckets) so a composite caller
    (corpus_filter_agreement) runs the corpus-sized tokenize+hash pass
    once for both the DSIR and classifier branches; is_target is derived
    null-safely there (NULL target → 0 → y = −1, the oracle's CASE … ELSE
    semantics), so y = 2·is_target − 1 is identical whether the frame is
    injected or built inline.
    """
    from map_reduce_group_spark.operators.importance import hashed_bigram_buckets

    bb = (
        bigram_buckets
        if bigram_buckets is not None
        else hashed_bigram_buckets(df, id_col, text_col, target, n_buckets)
    )
    feat = (
        bb.select(
            "id",
            (col("is_target") * 2 - 1).alias("y"),
            "bucket",
        )
        .groupBy("id", "y", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("x"))
    )
    bias = feat.select("id", "y").distinct().select(
        "id", "y", F.lit(BIAS_BUCKET).cast("long").alias("bucket"),
        F.lit(1).cast("long").alias("x"),
    )
    return feat.select("id", "y", col("bucket").cast("long"), "x").unionByName(bias)


def perceptron_quality_classifier(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    n_buckets: int = 4096,
    epochs: int = 3,
    bigram_buckets: DataFrame | None = None,
) -> DataFrame:
    """Train the batch perceptron for ``epochs`` epochs, then score.

    Returns (id, n_feats, score, pred, is_target):

    - ``score``  — the final-epoch decision value Σ_b w[b]·x[b], computed
      exactly in DECIMAL(38,0) and emitted as double via the exact decimal
      string (overflow-free at any scale; see the output-cast note below);
    - ``pred``   — score > 0 (predicted member of the target class);
    - ``is_target`` — the training label (pred vs is_target gives the
      train confusion matrix downstream);
    - ``n_feats`` — distinct feature buckets incl. the bias row.

    Deterministic by construction: every epoch update is an order-free
    integer sum, so the trained weights are identical for any partitioning
    and replayable by the unrolled-CTE oracle. Driver state per epoch is
    the collected weight delta (≤ n_buckets+1 rows, bounded).
    """
    if n_buckets > (1 << 18):
        raise ValueError(f"n_buckets {n_buckets} > 2^18 breaks the driver-state bound")
    feat = _features(df, id_col, text_col, target, n_buckets, bigram_buckets).localCheckpoint(
        eager=True
    )
    spark = df.sparkSession

    # epoch 1 from w=0: every doc scores 0, y·0 <= 0 ⇒ all misclassified
    weights = {
        int(r["bucket"]): int(r["dw"])
        for r in feat.groupBy("bucket")
        .agg(F.sum(col("y") * col("x")).cast("long").alias("dw"))
        .collect()
    }
    for _ in range(epochs - 1):
        w_df = F.broadcast(
            spark.createDataFrame(
                [(b, w) for b, w in sorted(weights.items())], "bucket long, w long"
            )
        )
        scored = (
            feat.join(w_df, "bucket")
            .groupBy("id", "y")
            # DECIMAL(38,0): w·x sums brush int64 at 100 TB (module docstring)
            .agg(F.sum(F.expr("CAST(w AS DECIMAL(38,0)) * x")).alias("s"))
        )
        delta = (
            feat.join(scored.filter(col("y") * col("s") <= 0), ["id", "y"])
            .groupBy("bucket")
            .agg(F.sum(col("y") * col("x")).cast("long").alias("dw"))
            .collect()
        )
        for r in delta:
            weights[int(r["bucket"])] = weights.get(int(r["bucket"]), 0) + int(r["dw"])

    w_df = F.broadcast(
        spark.createDataFrame(
            [(b, w) for b, w in sorted(weights.items())], "bucket long, w long"
        )
    )
    return (
        feat.join(w_df, "bucket")
        .groupBy("id", "y")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            # ADVICE r8 #1: the w·x sum needs DECIMAL(38,0) precisely
            # because it brushes int64 at full scale — casting it BACK to
            # BIGINT reintroduced the silent-NULL-on-overflow class
            # (non-ANSI Spark nulls, DuckDB errors). Emit as double via
            # the exact decimal STRING (numeric.dec2double policy): no
            # overflow at any magnitude, both engines parse the same
            # decimal string to the same correctly-rounded double, and the
            # sign (hence pred) is always preserved.
            F.expr(
                "CAST(CAST(sum(CAST(w AS DECIMAL(38,0)) * x) AS STRING) AS DOUBLE)"
            ).alias("score"),
        )
        .select(
            "id",
            "n_feats",
            "score",
            (col("score") > 0).alias("pred"),
            (col("y") > 0).alias("is_target"),
        )
    )
