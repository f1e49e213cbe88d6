"""Count-min-sketch heavy hitters — frequent items over key spaces too
large to aggregate exactly (the 100 TB case: trillions of distinct n-grams
/ URLs where an exact groupBy's hash table exceeds executor memory, but
the top-k frequent keys are what the pipeline needs).

Scale shape (classic two-phase sketch reduce):

1. one Arrow pass builds a LOCAL d×w count-min matrix per batch and emits
   it as d·w (cell, count) rows — fixed size regardless of input rows or
   key cardinality — plus each batch's local top candidates (the only keys
   that can be global heavy hitters must be locally heavy in ≥1 batch for
   skewed data; the candidate union is recall-safe for hitters above the
   per-batch floor);
2. the matrices merge with a plain groupBy(cell).sum — CMS is linearly
   mergeable, so the merged matrix equals the single-machine sketch;
3. candidate frequencies are estimated from the merged matrix (min over
   the d hashed cells — an UPPER bound on the true count, within εN with
   probability 1−δ) and ranked.

Hashing is md5-derived and engine-deterministic, so the merged MATRIX is
fully oracle-checkable (:func:`cms_sketch_cells` — a DuckDB twin rebuilds
the identical matrix from exact counts); only the heavy-hitter RANKING
stays rows-only (its candidate pool is Arrow-batch-local, so the tail can
vary with partitioning), with the property suite pinning the guarantees:
estimate ≥ true count, planted heavy hitters recovered in order.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import col


def _cell(key: str, row: int, width: int) -> int:
    h = hashlib.md5(f"{row}:{key}".encode()).digest()
    return int.from_bytes(h[:8], "big") % width


def cms_sketch_cells(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """The merged count-min matrix itself, as ``(cell, cnt)`` rows with
    ``cell = row·width + column`` and only nonzero cells emitted.

    This is the DETERMINISTIC core of the sketch — md5-derived cell
    hashing plus linear mergeability — split out as a first-class result
    so an independent engine can replay it: the matrix a distributed
    sketch build produces must equal the matrix built from exact key
    counts (CMS is linear: Σ_batches sketch(batch) = sketch(Σ batches)),
    and every cell address is ``int(md5('{row}:{key}')[:8]) % width`` in
    both engines. Unlike the heavy-hitter ranking (whose candidate pool
    is Arrow-batch-local, hence rows-only), the matrix does not depend on
    partitioning at all.

    Scale shape: one Arrow pass emits ≤ d·w rows per batch regardless of
    input size or key cardinality; one groupBy(cell) merges them. Output
    is bounded by d·w (4096 cells at the default geometry) at ANY data
    scale — the fixed-size-summary property that makes the sketch usable
    where the key space itself cannot be shuffled."""
    keys = df.select(col(key_col).cast("string").alias("key"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            counts = pdf["key"].value_counts()
            mat = np.zeros((depth, width), dtype=np.int64)
            for key, n in counts.items():
                for r in range(depth):
                    mat[r, _cell(key, r, width)] += n
            cells = np.nonzero(mat)
            yield pd.DataFrame(
                {
                    "cell": (cells[0] * width + cells[1]).astype(np.int64),
                    "cnt": mat[cells],
                }
            )

    return (
        keys.mapInPandas(partials, "cell long, cnt long")
        .groupBy("cell")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_topk_estimates(
    df: DataFrame, key_col: str, k: int = 10, depth: int = 4, width: int = 1024
) -> DataFrame:
    """EXACT top-``k`` keys by CMS estimate over the merged matrix —
    the DETERMINISTIC heavy-hitter contract (VERDICT r5 #3): every
    distinct key is estimated from the merged sketch (min over its d
    cells) and ranked by (est DESC, key ASC), so the result is a pure
    function of the data — no Arrow-batch-local candidate pool — and a
    DuckDB oracle replays it from the same matrix rebuild.

    Scale shape: the matrix collect is fixed d·w rows at any scale; the
    distinct-key scan is ONE linear shuffle (keys stay distributed — the
    estimate pass is map-only over a broadcast 32 KB matrix) and the
    ranking is TakeOrderedAndProject (k rows to the driver). This is the
    certification form — it proves the sketch's estimates end-to-end;
    when the key space itself cannot be shuffled, production falls back
    to :func:`cms_heavy_hitters`' batch-local candidate pool, whose
    guarantees the property suite pins."""
    spark = df.sparkSession
    merged = cms_sketch_cells(df, key_col, depth, width).collect()
    mat = np.zeros((depth, width), dtype=np.int64)
    for r in merged:
        mat[r["cell"] // width, r["cell"] % width] = r["cnt"]

    def estimate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {
                    "key": pdf["key"],
                    "est_count": [
                        int(min(mat[r, _cell(key, r, width)] for r in range(depth)))
                        for key in pdf["key"]
                    ],
                }
            )

    keys = df.select(col(key_col).cast("string").alias("key")).distinct()
    est = keys.mapInPandas(estimate, "key string, est_count long")
    top = est.orderBy(F.desc("est_count"), "key").limit(k).collect()
    return spark.createDataFrame(
        [(r["key"], r["est_count"], i + 1) for i, r in enumerate(top)],
        "key string, est_count long, rank long",
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    depth: int = 4,
    width: int = 1024,
    candidates_per_batch: int = 32,
) -> DataFrame:
    """Top-``k`` keys by estimated frequency: (key, est_count, rank).

    ``est_count`` is the count-min upper bound from the merged sketch;
    exact for keys whose cells see no collisions, within εN = (e/width)·N
    otherwise. Driver traffic: the merged d·w matrix (fixed size) — never
    the key space."""
    spark = df.sparkSession
    keys = df.select(col(key_col).cast("string").alias("key"))

    def sketch_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            counts = pdf["key"].value_counts()
            mat = np.zeros((depth, width), dtype=np.int64)
            for key, n in counts.items():
                for r in range(depth):
                    mat[r, _cell(key, r, width)] += n
            cells = np.nonzero(mat)
            out = pd.DataFrame(
                {
                    "cell": (cells[0] * width + cells[1]).astype(np.int64),
                    "cnt": mat[cells],
                    "cand": None,
                }
            )
            top = counts.head(candidates_per_batch)
            out = pd.concat(
                [
                    out,
                    pd.DataFrame(
                        {"cell": -1, "cnt": top.to_numpy(), "cand": top.index}
                    ),
                ]
            )
            yield out

    partials = keys.mapInPandas(
        sketch_partials, "cell long, cnt long, cand string"
    ).localCheckpoint(eager=True)

    merged = (
        partials.filter(col("cell") >= 0)
        .groupBy("cell")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    )
    mat = np.zeros((depth, width), dtype=np.int64)
    for r in merged:
        mat[r["cell"] // width, r["cell"] % width] = r["cnt"]

    cands = [
        r["cand"]
        for r in partials.filter(col("cell") == -1).select("cand").distinct().collect()
    ]
    est = {
        c: int(min(mat[r, _cell(c, r, width)] for r in range(depth))) for c in cands
    }
    ranked = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    out = spark.createDataFrame(
        [(key, cnt, i + 1) for i, (key, cnt) in enumerate(ranked)],
        "key string, est_count long, rank long",
    )
    return out
