"""Embedding-distribution DRIFT audit — the "did my new snapshot move"
check run between two corpus versions before retraining: per (label,
dimension), compare the mean embedding of cohort A vs cohort B with
EXACT integer arithmetic (qx = floor(v·2^20), the repo's portable
fixed-point convention — power-of-two scaling is exact in IEEE doubles),
so the DuckDB oracle replays every sum and every rank bit-for-bit.

Mean comparison never divides: |mean_a − mean_b| ranks by the
cross-multiplied |sum_a·n_b − sum_b·n_a| (DECIMAL(38,0) — the product
overflows BIGINT past ~1e9 vectors), and the reported magnitude is that
product ``div`` n_a·n_b — the mean gap in 2^20 fixed point, BIGINT-safe
at any scale.

Scale shape: one Arrow pass emits ONE partial row per (batch, label,
cohort) — counts plus a 64-long per-dimension sum array (the
dimension_envelope pattern, operators/similarity.py:396) — so the
vector column itself never shuffles; only partials (partitions × labels
× 2 rows) explode to (label, cohort, dim) for the final groupBy."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import col


def cohort_centroid_drift(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    cohort: "F.Column | None" = None,
    top_dims: int = 5,
) -> DataFrame:
    """Top-``top_dims`` drifting dimensions per label between cohorts:
    (label, dim, n_a, n_b, drift_mean_fp, rank). ``cohort`` defaults to
    ``vec_id % 2`` (even = A, odd = B)."""
    cohort = cohort if cohort is not None else (col("vec_id") % 2)
    flat = df.select(
        col(label_col).alias("label"), cohort.alias("cohort"), col(vec_col).alias("v")
    )
    # label dtype follows the INPUT column (the similarity.py _id_type
    # convention — ADVICE r6 #3: a hardcoded `label int` crashed the Arrow
    # pass for string/long label columns)
    label_t = dict(flat.dtypes)["label"]

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            rows = []
            for (lab, coh), grp in pdf.groupby(["label", "cohort"]):
                m = np.stack(grp["v"].to_numpy())
                qx = np.floor(m.astype(np.float64) * 1048576.0).astype(np.int64)
                rows.append((lab, int(coh), len(grp), qx.sum(axis=0).tolist()))
            yield pd.DataFrame(rows, columns=["label", "cohort", "n", "sums"])

    p = flat.mapInPandas(
        partials, f"label {label_t}, cohort int, n long, sums array<long>"
    )
    # partials are tiny (partitions × labels × 2) — exploding them is free
    per_dim = (
        p.select("label", "cohort", "n", F.posexplode("sums").alias("dim", "s"))
        .groupBy("label", "cohort", "dim")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )
    a = per_dim.filter(col("cohort") == 0).select(
        "label", "dim", col("s").alias("sa"), col("n").alias("n_a")
    )
    b = per_dim.filter(col("cohort") == 1).select(
        "label", "dim", col("s").alias("sb"), col("n").alias("n_b")
    )
    j = a.join(b, ["label", "dim"]).select(
        "label",
        "dim",
        "n_a",
        "n_b",
        F.expr(
            "abs(CAST(sa AS DECIMAL(38,0)) * n_b - CAST(sb AS DECIMAL(38,0)) * n_a)"
        ).alias("dfp"),
    )
    w = Window.partitionBy("label").orderBy(col("dfp").desc(), col("dim").asc())
    return (
        j.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(col("rank") <= top_dims)
        .select(
            "label",
            col("dim").cast("long").alias("dim"),
            "n_a",
            "n_b",
            F.expr(
                "CAST(dfp div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS BIGINT)"
            ).alias("drift_mean_fp"),
            "rank",
        )
    )
