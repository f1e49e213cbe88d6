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


# ---------------------------------------------------------------------------
# HyperLogLog — distinct-count sketch (Flajolet et al. 2007), deterministic
# variant: both hash slices are md5-derived, so the register array (and the
# raw estimator computed from it) is a pure function of the KEY SET — no
# partitioning dependence, no RNG — and a DuckDB twin can rebuild it
# bit-for-bit from the same data. This is what makes the sketch
# oracle-checkable end-to-end, unlike Spark's builtin approx_count_distinct
# whose HLL++ register encoding is engine-private (that builtin remains
# covered rows-only by `agg_approx_sketches`).
#
# Geometry: m = 2^p buckets. bucket(key) = first 32 md5 hex chars' slice
# int(md5(key)[0:8], 16) % m; the rank observable w = int(md5(key)[16:28],
# 16) is an INDEPENDENT 48-bit slice of the same digest, rank(key) =
# (#leading zeros of w in 48 bits) + 1 = 49 - bitlength(w) (w = 0 -> 49).
# Register M_j = max rank over keys in bucket j. Registers merge by MAX, so
# the distributed build is one groupBy(bucket).max — the partial-aggregate
# (map-side combine) form Spark picks automatically — and the shuffle is
# bounded by m rows per map task at ANY input scale: the fixed-size-summary
# property that lets a 100 TB corpus answer "how many distinct URLs" with a
# 2 KB state merge instead of a key-space shuffle.
# ---------------------------------------------------------------------------

#: rank observable width in bits: md5 hex chars [17, 28] = 48 bits.
_HLL_WBITS = 48


def hll_registers(df: DataFrame, key_col: str, p: int = 10) -> DataFrame:
    """The HLL register array over ``df[key_col]`` as ``(bucket, register)``
    rows, one per OCCUPIED bucket (empty buckets are implicit zeros —
    emitting only occupied cells keeps the result a set, mergeable with
    another sketch by groupBy(bucket).max).

    Everything is JVM-side codegen (md5 / conv / bin / length — no Python
    in the data path): one narrow projection, one bounded groupBy. The
    per-key work is two fixed md5-hex slices; `conv(hex, 16, 10)` yields
    exact BIGINTs (32- and 48-bit — far inside the 60-bit exactness
    ceiling used across this repo, e.g. operators/dedup.py:523).
    """
    return hll_registers_by(df, key_col, [], p)


def hll_registers_by(
    df: DataFrame, key_col: str, by: list[str], p: int = 10
) -> DataFrame:
    """Grouped register arrays — one independent HLL per ``by`` group, as
    ``(*by, bucket, register)`` rows (HLL as a GROUPED aggregate: ≤ m
    state rows PER GROUP, the shape of "distinct docs per language/domain"
    data-card metrics at corpus scale)."""
    m = 1 << p
    k = col(key_col).cast("string")
    h = F.md5(k.cast("binary"))
    bucket = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % m
    w = F.conv(F.substring(h, 17, 12), 16, 10).cast("long")
    rank = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(w))
    )
    return (
        df.select(*by, bucket.alias("bucket"), rank.cast("long").alias("rank"))
        .groupBy(*by, "bucket")
        .agg(F.max("rank").alias("register"))
    )


def hll_alpha_numerator(p: int) -> float:
    """The raw-estimator numerator α_m · m² · 2^48 as ONE double literal.

    The HLL raw estimate is E = α_m·m² / Σ_j 2^(−M_j). With registers
    ≤ 49, the denominator rescales to the exact integer
    N = Σ_j 2^(48 − M_j) (absent buckets contribute 2^48), leaving E =
    (α_m·m²·2^48) / N — a single IEEE-754 division of one shared double
    literal by an exact BIGINT, which both engines round identically
    (determinism rule: never ACCUMULATE doubles; one exactly-specified
    terminal division is reproducible). α_m = 0.7213/(1 + 1.079/m) for
    m ≥ 128 (Flajolet et al. 2007, fig. 3)."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    return alpha * m * m * float(1 << _HLL_WBITS)


def hll_estimate(df: DataFrame, key_col: str, p: int = 10) -> DataFrame:
    """One-row distinct-count estimate from the merged register array:
    ``(m, occupied_buckets, zero_buckets, inv_sum_num, est_raw)``.

    ``inv_sum_num`` = Σ_j 2^(48 − M_j) over ALL m buckets (exact BIGINT,
    ≤ m·2^48 < 2^63 for p ≤ 14); ``est_raw`` = alpha-numerator /
    inv_sum_num — the raw HLL estimator, within ~1.04/√m relative error
    (3.25 % at p = 10). Small-range (linear-counting) and large-range
    corrections are driver-side policy on top of these integers — kept out
    of the contract because they need ln(), whose last-ulp behavior is
    libm-specific, while this form is bit-reproducible.

    Scale shape: registers flow in pre-reduced (≤ m rows); the finisher is
    a single-row aggregate. Total driver traffic is one row."""
    return hll_estimate_by(df, key_col, [], p)


def hll_estimate_by(
    df: DataFrame, key_col: str, by: list[str], p: int = 10
) -> DataFrame:
    """Per-group raw estimates — one row per ``by`` group with the same
    columns as :func:`hll_estimate` (one row total when ``by`` is empty).
    The estimate pass runs over groups' register rows (≤ m per group), so
    its cost is groups × m regardless of data volume."""
    regs = hll_registers_by(df, key_col, by, p)
    m = 1 << p
    num = F.lit(hll_alpha_numerator(p))
    occupied = F.count(F.lit(1))
    inv_present = F.sum(F.expr(f"shiftleft(1L, {_HLL_WBITS} - register)"))
    inv_absent = (F.lit(m) - occupied) * F.lit(1 << _HLL_WBITS).cast("long")
    aggs = [
        F.lit(m).cast("long").alias("m"),
        occupied.cast("long").alias("occupied_buckets"),
        (F.lit(m) - occupied).cast("long").alias("zero_buckets"),
        (inv_present + inv_absent).cast("long").alias("inv_sum_num"),
        (num / (inv_present + inv_absent)).alias("est_raw"),
    ]
    return regs.groupBy(*by).agg(*aggs) if by else regs.agg(*aggs)


# ---------------------------------------------------------------------------
# Bloom filter — set membership over key spaces too large to broadcast as
# exact sets (the 100 TB case: "is this URL / fingerprint in the blocklist /
# previously-ingested corpus?" where the reference set has billions of keys
# but the filter is m bits). Deterministic variant: the k probe positions
# are md5-derived (seed i -> int(md5('i:key')[:15 hex], 16) % m), so the
# bit-set IS a pure function of the reference key set and a DuckDB twin
# rebuilds it exactly — membership verdicts, including the false-positive
# set, are oracle-checkable. The filter build is a bounded groupBy (≤ m
# distinct positions out of any input size) and probing is a broadcast join
# against ≤ m position rows: linear scans, no key-space shuffle.
# ---------------------------------------------------------------------------


def _bloom_pos(seed_col, key, m_bits: int):
    """Position of (seed, key): 60-bit md5-derived integer mod ``m_bits``
    (same exact-conv convention as operators/dedup.py:523)."""
    h = F.md5(F.concat(seed_col.cast("string"), F.lit(":"), key).cast("binary"))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % m_bits


def bloom_build(df: DataFrame, key_col: str, m_bits: int = 16384, k: int = 5) -> DataFrame:
    """The set bit positions of a Bloom filter over ``df[key_col]`` as
    distinct ``(pos)`` rows (the sparse encoding of the m-bit array;
    mergeable with another filter by plain union+distinct = bitwise OR).

    Output ≤ ``m_bits`` rows regardless of input size; the build is one
    explode-by-k projection plus one distinct."""
    key = col(key_col).cast("string")
    seed = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed")
    rows = df.select(key.alias("key"), seed).select(
        _bloom_pos(col("seed"), col("key"), m_bits).alias("pos")
    )
    return rows.distinct()


def bloom_probe(
    bits: DataFrame, probe: DataFrame, key_col: str, m_bits: int = 16384, k: int = 5
) -> DataFrame:
    """Membership verdict per distinct probe key: ``(key, bloom_member)``.

    ``bloom_member`` is true iff ALL of the key's k positions are set —
    counted as distinct positions on both sides, so md5 self-collisions
    (two seeds of one key hashing to one position) cannot inflate the
    required hit count. The bit-set side is ≤ m_bits rows and broadcast;
    the probe side stays distributed, so the verdict pass is a map-side
    join at any probe-set scale. False positives occur at the classic
    (1 − e^(−kn/m))^k rate and are part of the deterministic contract."""
    keys = probe.select(col(key_col).cast("string").alias("key")).distinct()
    seed = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("seed")
    kp = keys.select("key", seed).select(
        "key", _bloom_pos(col("seed"), col("key"), m_bits).alias("pos")
    ).distinct()
    hits = (
        kp.join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("need"),
            F.count("hit").alias("got"),
        )
    )
    return hits.select("key", (col("need") == col("got")).alias("bloom_member"))
