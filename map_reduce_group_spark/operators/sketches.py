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

Hashing is md5-derived and engine-deterministic; the sketch contents are
still registered rows-only (the estimate depends on sketch geometry, not
SQL-expressible semantics) with the property suite pinning the guarantees:
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
