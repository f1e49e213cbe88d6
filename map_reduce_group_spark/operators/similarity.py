"""Similarity search over embedding columns (north-star, BASELINE.json).

- brute-force cosine top-k: the exact baseline — corpus hash-sharded with
  queries replicated per shard (fully distributed, no driver collect),
  NumPy matmul per shard with local top-k pruning, then one k-bounded
  global ranking; an opt-in bounded broadcast path keeps the corpus scan
  narrow when the query set is provably tiny.
- IVF-style bucketed ANN: deterministic hyperplane LSH code per vector;
  per-bucket NumPy matmul via cogrouped applyInPandas — the scale path:
  each query touches 1/2^p of the corpus and the shuffle key is the bucket.
- near-dup pairs: per-bucket C·Cᵀ with thresholding.

Implementation note (measured): dense dot products MUST NOT be expressed
with Spark's higher-order array lambdas (zip_with/aggregate are interpreted
per element — the pair loop measured 50-65× superlinear at 10× data).
Dense linear algebra is the one place Arrow+NumPy beats JVM expressions:
the matmul is C-vectorized, the Arrow transfer is columnar, and per-batch
top-k pruning bounds both memory and shuffle to O(queries × k) per batch.

Determinism: cosines are computed in float64 and rounded to 5 decimals
BEFORE ranking; ordering ties break on candidate id — reproducible across
engines and partitionings (the DuckDB oracle rounds identically).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from map_reduce_group_spark.functions.numeric import fp_floor
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import col

def _id_type(df: DataFrame, col_name: str) -> str:
    return dict(df.dtypes)[col_name]


def _matrix(series: pd.Series) -> np.ndarray:
    return np.stack(series.to_numpy()).astype(np.float64)


def _unit_rows(m: np.ndarray) -> np.ndarray:
    norms = np.sqrt((m * m).sum(axis=1))
    norms[norms == 0] = 1.0
    return m / norms[:, None]


def _local_topk(
    q_ids: np.ndarray,
    qm: np.ndarray,
    c_ids: np.ndarray,
    cm: np.ndarray,
    k: int,
    round_digits: int,
) -> pd.DataFrame:
    """Per-block exact top-k: rank Q·Cᵀ cosines by (cos desc, c_id asc) and
    keep k per query, excluding self-pairs. The local order equals the final
    global ranking order, so per-block pruning never drops a global winner
    (global top-k ⊆ union of block top-k)."""
    sims = np.round(qm @ cm.T, round_digits)  # (Q, C)
    out_q, out_c, out_s = [], [], []
    for qi in range(sims.shape[0]):
        mask = c_ids != q_ids[qi]  # exclude self
        cand_ids, cand_sims = c_ids[mask], sims[qi][mask]
        if not len(cand_ids):
            continue
        order = np.lexsort((cand_ids, -cand_sims))[:k]
        out_q.extend([q_ids[qi]] * len(order))
        out_c.extend(cand_ids[order])
        out_s.extend(cand_sims[order])
    return pd.DataFrame({"q_id": out_q, "c_id": out_c, "cos": out_s})


def _rank_topk(flat: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("q_id").orderBy(col("cos").desc(), col("c_id"))
    return flat.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        col("rank") <= k
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 5,
    n_shards: int | None = None,
    max_broadcast_queries: int | None = None,
) -> DataFrame:
    """Exact brute-force cosine top-k: (q_id, c_id, cos, rank).

    Default (distributed, no driver-side collect): the corpus is salted into
    ``n_shards`` hash shards and the queries — the small side — replicate
    once per shard; a cogrouped applyInPandas runs the NumPy Q·Bᵀ kernel per
    shard with local top-k pruning, and one window merges shard winners.
    Each corpus row lives in exactly one shard and each query visits every
    shard, so the result is exact and independent of ``n_shards``. Shuffle
    volume: corpus once + queries × n_shards — both sides stay on executors.

    ``max_broadcast_queries=N`` selects the shuffle-free fast path for small
    query sets: queries are collected (bounded — raises if more than N rows)
    and broadcast as one unit-row matrix, and the corpus is scanned narrowly
    with per-Arrow-batch pruning. Optimal when Q is tiny and the corpus is
    huge; the default path is the one that survives unbounded Q.
    """
    spark = corpus.sparkSession
    id_t = _id_type(corpus, id_col)
    out_schema = f"q_id {id_t}, c_id {id_t}, cos double"

    if max_broadcast_queries is not None:
        qpdf = (
            queries.select(col(id_col).alias("q_id"), col(vec_col).alias("v"))
            .limit(max_broadcast_queries + 1)
            .toPandas()
        )
        if len(qpdf) > max_broadcast_queries:
            raise ValueError(
                f"cosine_topk broadcast path got > {max_broadcast_queries} "
                "queries; raise max_broadcast_queries or use the default "
                "distributed path"
            )
        if not len(qpdf):  # no queries → empty result with the right schema
            return spark.createDataFrame([], out_schema + ", rank bigint")
        bq = spark.sparkContext.broadcast(
            (qpdf["q_id"].to_numpy(), _unit_rows(_matrix(qpdf["v"])))
        )

        def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            ids, qmat = bq.value
            for pdf in batches:
                if not len(pdf):
                    continue
                yield _local_topk(
                    ids, qmat, pdf["c_id"].to_numpy(), _unit_rows(_matrix(pdf["v"])),
                    k, round_digits,
                )

        flat = corpus.select(
            col(id_col).alias("c_id"), col(vec_col).alias("v")
        ).mapInPandas(score, out_schema)
        return _rank_topk(flat, k)

    if n_shards is None:
        n_shards = max(spark.sparkContext.defaultParallelism, 8)
    q = queries.select(
        col(id_col).alias("id"),
        col(vec_col).alias("v"),
        F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("shard"),
    )
    c = corpus.select(col(id_col).alias("id"), col(vec_col).alias("v")).withColumn(
        "shard", F.pmod(F.xxhash64(col("id")), F.lit(n_shards)).cast("int")
    )

    def shard_topk(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"q_id": [], "c_id": [], "cos": []})
        return _local_topk(
            qpdf["id"].to_numpy(), _unit_rows(_matrix(qpdf["v"])),
            cpdf["id"].to_numpy(), _unit_rows(_matrix(cpdf["v"])),
            k, round_digits,
        )

    flat = (
        q.groupBy("shard")
        .cogroup(c.groupBy("shard"))
        .applyInPandas(shard_topk, out_schema)
    )
    return _rank_topk(flat, k)


def semantic_contamination(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    round_digits: int = 5,
    max_bench: int = 65536,
) -> DataFrame:
    """Embedding-level benchmark decontamination (VERDICT r8 #3) — the
    SEMANTIC pass modern pipelines run beside n-gram decontamination
    (GPT-3 App. C's 13-gram overlap → Llama/DataComp practice adds an
    embedding-similarity sweep): a paraphrased benchmark item shares no
    13-gram with its source, so the n-gram check
    (operators/dedup.py:benchmark_contamination) structurally misses it,
    while its embedding stays nearly parallel (property-tested in
    tests/test_semantic_contamination.py).

    For every corpus vector, returns its single most-similar benchmark
    item and whether it clears ``threshold``:
    (id, bench_id, cos, contaminated) — ties broken by lowest bench id;
    exactly one row per corpus vector at any scale.

    PORTABLE fixed-point cosine (the embed_ann_ivf recontract pattern —
    NOT the round-5 float contract, which showed last-digit divergence on
    this operator's 490-row argmax surface): components quantize to
    floor(x·2^20) int64; dot products and squared norms are integer sums
    whose every partial sum stays < 2^53 for dim < 8192, so they are
    EXACT and order-free in both engines; the final
    num/(sqrt(na)·sqrt(nb)) is three IEEE ops on bit-identical operands
    (int→double exact, sqrt correctly rounded), and the display is
    engine-symmetric floor fixed point at 1/10^5 — no round() anywhere.
    Quantization error vs true cosine is ≤ ~2^-19 per unit vector,
    irrelevant at any plausible contamination threshold.

    Scale shape: eval benchmarks are megabytes against a 100 TB corpus —
    the bench side is collected ONCE (bounded: raises past ``max_bench``
    rows) and broadcast as a unit-row float64 matrix; the corpus streams
    through one narrow Arrow mapInPandas pass (id + vector columns only,
    NumPy batch×benchᵀ matmul), emitting one row per vector. Zero
    shuffles, no corpus-side state, output linear in corpus size. The
    fixed cosine threshold is scale-stable (pair geometry, not a count —
    unlike the absolute-count thresholds rule 7 bans); 0.4 is
    high-percentile for the random fixture embeddings (max pairwise
    cosine ≈ 0.5 — the embed_semdedup_prune convention), real corpora
    use 0.9+.
    """
    spark = corpus.sparkSession
    id_t = _id_type(corpus, id_col)
    out_schema = f"id {id_t}, bench_id {id_t}, cos double"
    bpdf = (
        bench.select(col(id_col).alias("b_id"), col(vec_col).alias("v"))
        .limit(max_bench + 1)
        .toPandas()
    )
    if len(bpdf) > max_bench:
        raise ValueError(
            f"semantic_contamination got > {max_bench} benchmark rows; the "
            "bench side must stay broadcast-small (raise max_bench only "
            "with executor memory to match)"
        )
    if not len(bpdf):  # no benchmark → nothing can be contaminated
        return spark.createDataFrame([], out_schema + ", contaminated boolean")
    # sort by bench id so argmax's first-hit == lowest id on quantized ties
    bpdf = bpdf.sort_values("b_id", kind="mergesort").reset_index(drop=True)

    def _quant(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        q = np.floor(m * 1048576.0).astype(np.int64)
        norm = np.sqrt((q * q).sum(axis=1).astype(np.float64))
        norm[norm == 0.0] = 1.0  # zero vector → cos 0 against everything
        return q, norm

    bq, bnorm = _quant(_matrix(bpdf["v"]))
    bb = spark.sparkContext.broadcast((bpdf["b_id"].to_numpy(), bq, bnorm))
    scale = 10 ** round_digits

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_ids, bqm, bnm = bb.value
        for pdf in batches:
            if not len(pdf):
                continue
            cq, cnorm = _quant(_matrix(pdf["v"]))
            num = cq @ bqm.T  # exact int64 matmul, order-free
            sims = num.astype(np.float64) / (cnorm[:, None] * bnm[None, :])
            disp = np.floor(sims * scale) / scale  # fp_floor twin
            best = disp.argmax(axis=1)  # first max → lowest bench id
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "bench_id": b_ids[best],
                    "cos": disp[np.arange(len(best)), best],
                }
            )

    flat = corpus.select(col(id_col).alias("id"), col(vec_col).alias("v")).mapInPandas(
        score, out_schema
    )
    return flat.select(
        "id", "bench_id", "cos", (col("cos") >= threshold).alias("contaminated")
    )


# deterministic hyperplanes: plane[p][i] = ((i*31 + p*17) % 13) - 6
# — integer, reproducible anywhere, spread across dimensions.
def _planes(n_planes: int, dim: int) -> np.ndarray:
    i = np.arange(dim)
    return np.stack([((i * 31 + p * 17) % 13 - 6).astype(np.float64) for p in range(n_planes)])


def _planes_int(n_planes: int, dim: int) -> np.ndarray:
    """Integer form of the deterministic hyperplanes (portable bucketing)."""
    return _planes(n_planes, dim).astype(np.int64)


def lsh_bucket(vec: F.Column, n_planes: int = 4) -> F.Column:
    """Hyperplane-LSH code: bit p = sign(vec · plane_p) → int bucket.

    JVM expression form (used where a pure-SQL bucket is handy); the NumPy
    operators below compute the identical code vectorized."""
    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, i: x.cast("double") * ((i * 31 + F.lit(p * 17)) % 13 - 6).cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def _bucketize(
    df: DataFrame, id_col: str, vec_col: str, n_planes: int, portable: bool = False
) -> DataFrame:
    """(id, v, bucket) with the hyperplane code computed via NumPy.
    Schema (id and vector element types) is preserved from the input.

    ``portable=True`` computes the projection in 1/2^20 fixed point
    (``q_i = floor(v_i · 2^20)`` — exact in IEEE doubles, the
    random_project_fp convention) against the INTEGER plane matrix, so the
    bit pattern ``sign(Σ q_i · plane_pi)`` is an order-free integer sum a
    SQL oracle replays exactly. The float path keeps one fewer rounding
    step for library use; bucket geometry differs only for vectors whose
    projection magnitude is below the quantization noise."""
    out_schema = f"id {_id_type(df, id_col)}, v {_id_type(df, vec_col)}, bucket int"

    def code(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = _matrix(pdf["v"])
            if planes is None:
                planes = (
                    _planes_int(n_planes, m.shape[1])
                    if portable
                    else _planes(n_planes, m.shape[1])
                )
            if portable:
                q = np.floor(m * 1048576.0).astype(np.int64)
                bits = (q @ planes.T) >= 0  # exact int64 — order-free
            else:
                bits = (m @ planes.T) >= 0  # (B, P)
            bucket = (bits * (1 << np.arange(n_planes))).sum(axis=1)
            yield pd.DataFrame({"id": pdf["id"], "v": pdf["v"], "bucket": bucket})

    flat = df.select(col(id_col).alias("id"), col(vec_col).alias("v"))
    return flat.mapInPandas(code, out_schema)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    probe_hamming: int = 1,
    round_digits: int = 5,
    portable: bool = False,
) -> DataFrame:
    """ANN top-k with multiprobe: each query probes its own LSH bucket plus
    every bucket within ``probe_hamming`` code-bit flips (hamming-1 ⇒
    1+n_planes of 2^n_planes buckets). The corpus stays partitioned by its
    single bucket; only query rows replicate (queries ≪ corpus, so the
    fan-out is cheap). A candidate lives in exactly one corpus bucket, so
    multiprobe introduces no duplicate pairs; the final per-query window
    merges probes. Recall/fan-out trades directly via ``probe_hamming``
    (0 = single-probe).

    cogroup by bucket → per-bucket NumPy matmul → per-bucket top-k →
    global per-query top-k."""
    if probe_hamming not in (0, 1):
        raise ValueError("probe_hamming supports 0 (single-probe) or 1 (hamming-1)")
    q = _bucketize(queries, id_col, vec_col, n_planes, portable=portable)
    if probe_hamming >= 1:
        # Hamming-1 expansion: the original code plus each single-bit flip
        flips = F.array(
            F.col("bucket"),
            *[F.col("bucket").bitwiseXOR(F.lit(1 << b)) for b in range(n_planes)],
        )
        q = q.select("id", "v", F.explode(flips).alias("bucket"))
    c = _bucketize(corpus, id_col, vec_col, n_planes, portable=portable)

    def bucket_topk(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"q_id": [], "c_id": [], "bucket": [], "cos": []})
        out = _local_topk(
            qpdf["id"].to_numpy(), _unit_rows(_matrix(qpdf["v"])),
            cpdf["id"].to_numpy(), _unit_rows(_matrix(cpdf["v"])),
            k, round_digits,
        )
        out["bucket"] = key[0]
        return out[["q_id", "c_id", "bucket", "cos"]]

    id_t = _id_type(corpus, id_col)
    flat = q.groupBy("bucket").cogroup(c.groupBy("bucket")).applyInPandas(
        bucket_topk, f"q_id {id_t}, c_id {id_t}, bucket int, cos double"
    )
    return _rank_topk(flat, k)


def ivf_trained_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 8,
    train_iters: int = 2,
    nprobe: int = 2,
    levels: int = 256,
    round_digits: int = 5,
) -> DataFrame:
    """ANN top-k over a TRAINED coarse quantizer (VERDICT r6 #7) — the
    standard production IVF shape (FAISS IVFFlat; Jégou et al. PAMI'11
    product-quantization coarse stage): cells are k-means centroids
    learned from the corpus, not data-blind hyperplane buckets, so cell
    populations track the data distribution and recall per probed
    candidate strictly improves at the same cost model as
    :func:`ivf_topk`.

    Everything upstream of the final float cosine is integer:

    - quantize with the corpus-wide min/max envelope
      (``floor((x−mn)·(levels−1)/rng + 0.5)`` — the exact
      ``quantize_embeddings`` arithmetic, already hash-proven);
    - train ``n_cells`` centroids with the fixed-point Lloyd recipe of
      :func:`kmeans_assign_fixedpoint` (lowest-id init, integer dist²,
      ties to the lowest cell, round-half-up integer mean update), so a
      SQL oracle replays the learned cells bit-for-bit;
    - corpus rows land in their ONE nearest cell; each query probes its
      ``nprobe`` nearest cells (dist² asc, cell asc — stable argsort),
      giving multiprobe recall without duplicate pairs (a candidate
      lives in exactly one cell).

    Scale shape: training moves only partitions × n_cells sufficient-
    statistic rows to the driver per iteration; assignment and probing
    are map-only Arrow passes against the broadcast k×dim integer
    centroid table; the only shuffle is the cell cogroup for the exact
    cosine rerank — identical to :func:`ivf_topk`'s bucket cogroup, with
    the corpus partitioned by its single cell and only query rows
    fanning out ``nprobe``-fold.

    Returns (q_id, c_id, cell, cos, rank).
    """
    env = dimension_envelope(corpus, vec_col)
    id_t = _id_type(corpus, id_col)
    v_t = _id_type(corpus, vec_col)
    if env is None:
        return corpus.sparkSession.createDataFrame(
            [], f"q_id {id_t}, c_id {id_t}, cell int, cos double, rank long"
        )
    mn, mx = env
    rng = mx - mn
    rng[rng == 0] = 1.0
    scale = float(levels - 1)
    bc_env = corpus.sparkSession.sparkContext.broadcast((mn, rng))

    def _codes(m: np.ndarray, b_mn: np.ndarray, b_rng: np.ndarray) -> np.ndarray:
        # identical IEEE op sequence to quantize_embeddings
        return np.floor((m - b_mn) * scale / b_rng + 0.5).astype(np.int64)

    cflat = corpus.select(col(id_col).alias("id"), col(vec_col).alias("v"))
    qflat = queries.select(col(id_col).alias("id"), col(vec_col).alias("v"))

    # deterministic init: codes of the n_cells smallest corpus ids
    init = cflat.orderBy("id").limit(n_cells).toPandas()
    cents = _codes(_matrix(init["v"]), mn, rng)
    dim = cents.shape[1]

    def make_partials(cents_now: np.ndarray):
        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            b_mn, b_rng = bc_env.value
            for pdf in batches:
                if not len(pdf):
                    continue
                m = _codes(_matrix(pdf["v"]), b_mn, b_rng)
                d2 = ((m[:, None, :] - cents_now[None, :, :]) ** 2).sum(axis=2)
                a = d2.argmin(axis=1)
                rows = [
                    (int(c), int((a == c).sum()), m[a == c].sum(axis=0).tolist())
                    for c in np.unique(a)
                ]
                yield pd.DataFrame(rows, columns=["cluster", "n", "sums"])

        return partials

    for _ in range(train_iters - 1):
        got = cflat.mapInPandas(
            make_partials(cents), "cluster int, n long, sums array<long>"
        ).collect()
        counts = np.zeros(n_cells, dtype=np.int64)
        sums = np.zeros((n_cells, dim), dtype=np.int64)
        for r in got:
            counts[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["sums"], dtype=np.int64)
        ne = counts > 0
        cents = cents.copy()
        # round-half-up mean without floats: (2*sum + n) // (2*n)
        cents[ne] = (2 * sums[ne] + counts[ne, None]) // (2 * counts[ne, None])

    cents_f = cents

    def assign_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_mn, b_rng = bc_env.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = _codes(_matrix(pdf["v"]), b_mn, b_rng)
            d2 = ((m[:, None, :] - cents_f[None, :, :]) ** 2).sum(axis=2)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "v": pdf["v"],
                    "cell": d2.argmin(axis=1).astype(np.int32),
                }
            )

    c = cflat.mapInPandas(assign_cells, f"id {id_t}, v {v_t}, cell int")

    np_probe = min(nprobe, n_cells)

    def probe_cells(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_mn, b_rng = bc_env.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = _codes(_matrix(pdf["v"]), b_mn, b_rng)
            d2 = ((m[:, None, :] - cents_f[None, :, :]) ** 2).sum(axis=2)
            # stable sort: equal dist² keeps index order -> lowest cell wins
            order = np.argsort(d2, axis=1, kind="stable")[:, :np_probe]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy().repeat(np_probe),
                    "v": pdf["v"].to_numpy().repeat(np_probe),
                    "cell": order.ravel().astype(np.int32),
                }
            )

    q = qflat.mapInPandas(probe_cells, f"id {id_t}, v {v_t}, cell int")

    def cell_topk(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"q_id": [], "c_id": [], "cell": [], "cos": []})
        out = _local_topk(
            qpdf["id"].to_numpy(), _unit_rows(_matrix(qpdf["v"])),
            cpdf["id"].to_numpy(), _unit_rows(_matrix(cpdf["v"])),
            k, round_digits,
        )
        out["cell"] = key[0]
        return out[["q_id", "c_id", "cell", "cos"]]

    flat = q.groupBy("cell").cogroup(c.groupBy("cell")).applyInPandas(
        cell_topk, f"q_id {id_t}, c_id {id_t}, cell int, cos double"
    )
    return _rank_topk(flat, k)


def _keyed_cosine_pairs(
    keyed: DataFrame,
    key_col: str,
    id_t: str,
    threshold: float,
    round_digits: int,
    n_blocks: int | None = None,
) -> DataFrame:
    """All within-group pairs with rounded cosine ≥ ``threshold`` over a
    (id, v, ``key_col``) frame — the quadratic term TILED into block pairs
    so no task ever materializes a whole group's similarity matrix.

    Each vector hashes to one of ``n_blocks`` blocks; a cogroup per
    (key, block_i ≤ block_j) computes the (n/B)×(n/B) NumPy tile. Every
    unordered pair lands in exactly one tile (same block → upper triangle
    once; different blocks → the (min,max) ordered tile once), so the
    output is identical to the single-group form for ANY block count —
    blocks only partition the work. Per-task memory drops from O(group²)
    to O((group/B)²). Replication cost: each vector joins ≤ B tiles per
    side — which is why B must track the data. ``n_blocks=None`` (the
    default) sizes it from the LARGEST group: B = ceil(max_group/3500),
    bounding every tile near 3500² sims (~100 MB of float64) while a
    small-group workload degenerates to B=1 — no replication, one tile
    per group. The old fixed B=8 paid 8× input replication on small
    groups AND still overflowed task memory past ~28k-vector groups; a
    constant block count is wrong in both directions (guide §2.5 — the
    synthetic-partitioning trap). The keyed frame is persisted in auto
    mode so the sizing aggregate and the tile pass share one upstream
    materialization.
    """
    if n_blocks is None:
        from pyspark import StorageLevel

        keyed = keyed.persist(StorageLevel.MEMORY_AND_DISK)
        mx = (
            keyed.groupBy(key_col)
            .count()
            .agg(F.max("count").alias("m"))
            .collect()[0]["m"]
        )
        n_blocks = max(1, -(-int(mx or 1) // 3500))
    B = n_blocks
    blocks = F.array(*[F.lit(j) for j in range(B)])
    v = keyed.withColumn("b", F.pmod(F.xxhash64(col("id")), F.lit(B)).cast("int"))
    # one side-tagged frame instead of a cogroup: left role (side 0) joins
    # every tile row bj ≥ its block, right role (side 1) every bi ≤ it —
    # a union of two selects over the same lineage, immune to Spark's
    # ambiguous-self-join analysis that a cogroup of the two would trip
    left = (
        v.withColumn("bj", F.explode(blocks))
        .filter(col("bj") >= col("b"))
        .select(key_col, col("b").alias("bi"), "bj", "id", "v", F.lit(0).alias("side"))
    )
    right = (
        v.withColumn("bi", F.explode(blocks))
        .filter(col("bi") <= col("b"))
        .select(key_col, "bi", col("b").alias("bj"), "id", "v", F.lit(1).alias("side"))
    )

    def tile_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": [], "id_b": [], "cos": []})
        _, bi, bj = key
        lpdf = pdf[pdf["side"] == 0]
        if not len(lpdf):
            return empty
        lm = _unit_rows(_matrix(lpdf["v"]))
        lids = lpdf["id"].to_numpy()
        if bi == bj:  # same block: both sides hold the same rows — triangle once
            if len(lids) < 2:
                return empty
            sims = np.round(lm @ lm.T, round_digits)
            iu = np.triu_indices(len(lids), k=1)
            keep = sims[iu] >= threshold
            a, b = lids[iu[0][keep]], lids[iu[1][keep]]
            cs = sims[iu][keep]
        else:  # cross tile: every (left, right) pair exactly once
            rpdf = pdf[pdf["side"] == 1]
            if not len(rpdf):
                return empty
            rm = _unit_rows(_matrix(rpdf["v"]))
            rids = rpdf["id"].to_numpy()
            sims = np.round(lm @ rm.T, round_digits)
            ii, jj = np.nonzero(sims >= threshold)
            a, b, cs = lids[ii], rids[jj], sims[ii, jj]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": cs})

    return (
        left.unionByName(right)
        .groupBy(key_col, "bi", "bj")
        .applyInPandas(tile_pairs, f"id_a {id_t}, id_b {id_t}, cos double")
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 4,
    round_digits: int = 5,
    portable: bool = False,
) -> DataFrame:
    """Embedding near-duplicate pairs: bucket with hyperplane LSH, then a
    per-bucket C·Cᵀ with thresholding (approximate recall, exact precision).
    Bucket size bounds the quadratic term; add planes to shrink buckets,
    and the per-bucket work is tiled into block-pair cogroups
    (:func:`_keyed_cosine_pairs`) so a hot bucket never materializes its
    whole similarity matrix in one task. ``portable=True`` buckets in
    fixed point (see :func:`_bucketize`) so a SQL oracle replays the exact
    candidate structure."""
    v = _bucketize(df, id_col, vec_col, n_planes, portable=portable).select(
        "id", "v", "bucket"
    )
    return _keyed_cosine_pairs(
        v, "bucket", _id_type(df, id_col), threshold, round_digits
    )


def dimension_envelope(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray] | None:
    """Global per-dimension (min, max) arrays for a vector column, via one
    Arrow pass emitting ONE partial row per batch (executor-side reduce;
    only partitions × 2·D doubles reach the driver). Exact regardless of
    partitioning — min/max are order-insensitive. None on an empty frame."""

    def partial_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = _matrix(pdf[vec_col])
            yield pd.DataFrame(
                {"mins": [m.min(axis=0).tolist()], "maxs": [m.max(axis=0).tolist()]}
            )

    partials = df.select(vec_col).mapInPandas(
        partial_stats, "mins array<double>, maxs array<double>"
    ).collect()
    if not partials:
        return None
    return (
        np.min([r["mins"] for r in partials], axis=0),
        np.max([r["maxs"] for r in partials], axis=0),
    )


def dequantize_embeddings(
    codes_df: DataFrame,
    mn: np.ndarray,
    mx: np.ndarray,
    id_col: str = "id",
    codes_col: str = "codes",
    vec_col: str = "v",
    levels: int = 256,
) -> DataFrame:
    """Reconstruct float vectors from integer codes: ``mn + code · step``
    with ``step = (mx-mn)/(levels-1)`` — the fixed IEEE op sequence the
    DuckDB oracle replays, so reconstructed values are bit-identical
    cross-engine. Map-only with broadcast scales."""
    rng = mx - mn
    rng = np.where(rng == 0, 1.0, rng)
    step = rng / float(levels - 1)
    bc = codes_df.sparkSession.sparkContext.broadcast((mn, step))

    def deq(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_mn, b_step = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            codes = np.stack(pdf[codes_col].to_numpy()).astype(np.float64)
            vecs = b_mn + codes * b_step
            yield pd.DataFrame({"id": pdf[id_col], "v": list(vecs)})

    id_t = _id_type(codes_df, id_col)
    return codes_df.mapInPandas(deq, f"id {id_t}, {vec_col} array<double>")


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 256,
) -> DataFrame:
    """Per-dimension scalar quantization of an embedding column to integer
    codes in [0, levels-1] — the storage/bandwidth lever for 100 TB vector
    corpora (float32 → uint8 is a 4× shrink; ANN recall loss at 8 bits is
    typically negligible, and codes dequantize to mn + code·rng/(levels-1)).

    Scale shape (no O(data) shuffle anywhere):

    1. stats pass — one Arrow ``mapInPandas`` sweep emits ONE partial row per
       batch (per-dimension mins/maxs arrays); only partitions × 1 rows of
       2·D doubles leave the executors, reduced to the global per-dimension
       envelope driver-side (same O(partitions) scalar class as the k-means
       sufficient statistics below);
    2. quantize pass — mn/range broadcast; a map-only NumPy pass computes
       ``floor((x - mn) * (levels-1) / (mx - mn) + 0.5)``. Shuffle-free.

    min/max are order-insensitive (exact regardless of partitioning) and the
    quantize expression is a fixed IEEE-double op sequence, so codes are
    bit-deterministic across engines — the DuckDB oracle replays the same
    arithmetic. Degenerate dimensions (mx == mn) code to 0.

    Returns (id, codes array<int>). Production storage would pack codes to
    binary/tinyint; int keeps the oracle comparison engine-neutral.
    """
    flat = df.select(col(id_col).alias("id"), col(vec_col).alias("v"))

    env = dimension_envelope(df, vec_col)
    if env is None:
        return df.sparkSession.createDataFrame(
            [], f"id {_id_type(df, id_col)}, codes array<int>"
        )
    mn, mx = env
    rng = mx - mn
    rng[rng == 0] = 1.0  # degenerate dims: x == mn everywhere -> code 0
    scale = float(levels - 1)
    bc = df.sparkSession.sparkContext.broadcast((mn, rng))

    def quantize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_mn, b_rng = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = _matrix(pdf["v"])
            codes = np.floor((m - b_mn) * scale / b_rng + 0.5).astype(np.int32)
            yield pd.DataFrame({"id": pdf["id"], "codes": list(codes)})

    return flat.mapInPandas(quantize, f"id {_id_type(df, id_col)}, codes array<int>")


def random_project_fp(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k_out: int = 8,
    dim: int = 64,
    salt: str = "rp",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction by a Rademacher (±1)
    random projection (Achlioptas 2003: database-friendly random
    projections) — the cheap front-end that shrinks embedding storage and
    ANN candidate math before exact reranking at corpus scale.

    The sign matrix is content-addressed, not RNG: s(j, k) = parity of the
    first hex digit of md5(salt‖j‖'_'‖k), so any engine rebuilds the exact
    same projection from the data alone (same property as hash_uniform in
    operators/sampling.py). Inputs are quantized to 1/2^20 fixed point —
    q_j = floor(x_j · 2^20), exact in IEEE doubles since 2^20 scaling only
    shifts the exponent — and each output code is the INTEGER sum
    Σ_j s(j,k)·q_j: order-independent, bit-identical across engines, no
    float-sum nondeterminism. The float value is reconstructed once at the
    end as code / 2^20 / sqrt(k_out) (JL scaling; sqrt is IEEE
    correctly-rounded).

    Scale shape: one map-only Arrow pass — the NumPy int64 matmul
    (N_batch × dim) @ (dim × k_out) — with zero shuffles; output is k_out
    rows per vector in long format (id, k, code) so no array-typed column
    ever reaches a driver/canonicalizer (VERDICT r02 lesson).

    Returns (id, k, code, value).
    """
    import hashlib

    signs = np.array(
        [
            [
                1 if int(hashlib.md5(f"{salt}{j}_{k}".encode()).hexdigest()[0], 16) % 2 == 0 else -1
                for k in range(k_out)
            ]
            for j in range(dim)
        ],
        dtype=np.int64,
    )
    flat = df.select(col(id_col).alias("id"), col(vec_col).alias("v"))
    id_t = _id_type(df, id_col)
    bc = df.sparkSession.sparkContext.broadcast(signs)

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = _matrix(pdf["v"]).astype(np.float64)
            assert m.shape[1] == s.shape[0], f"dim mismatch {m.shape[1]} != {s.shape[0]}"
            q = np.floor(m * 1048576.0).astype(np.int64)
            codes = q @ s  # exact int64 matmul — order-free
            n, ko = codes.shape
            yield pd.DataFrame(
                {
                    "id": np.repeat(pdf["id"].to_numpy(), ko),
                    "k": np.tile(np.arange(ko, dtype=np.int64), n),
                    "code": codes.reshape(-1),
                }
            )

    out = flat.mapInPandas(project, f"id {id_t}, k long, code long")
    return out.select(
        "id",
        "k",
        "code",
        # engine-symmetric floor fixed point (functions/numeric.py:fp_floor):
        # code is int64 with |code| < 2^53 (int64->double cast exact), the
        # two divisions are IEEE ops on identical operands in both engines,
        # so floor sees bit-identical doubles — no round() decimal detour
        fp_floor(col("code") / 1048576.0 / float(np.sqrt(k_out))).alias("value"),
    )


def semdedup_prune(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    round_digits: int = 5,
) -> DataFrame:
    """SemDeDup-style semantic pruning: k-means-cluster the embeddings, then
    within each cluster greedily drop vectors whose cosine to an already-KEPT
    earlier-id vector is >= ``threshold`` (Abbas et al. 2023 prune semantic
    duplicates inside k-means clusters; the greedy lowest-id-keeper rule makes
    the survivor set deterministic and order-independent).

    Scale shape: clustering via :func:`kmeans_assign` (map-only passes +
    O(partitions·k) sufficient statistics); the prune is a per-cluster
    ``applyInPandas`` — one shuffle keyed by cluster id, quadratic only
    WITHIN a cluster (k bounds the quadratic term exactly like the LSH
    bucket does for :func:`cosine_neardup_pairs`; raise k to shrink
    clusters). Cross-cluster near-dups are out of scope by construction —
    the SemDeDup trade: recall bounded by clustering quality, precision
    exact.

    Returns (id, cluster, keep, pruned_by): ``pruned_by`` is the kept
    earlier vector that shadowed this one (null for keepers).
    """
    assigned = kmeans_assign(df, id_col, vec_col, k=k, iters=iters).select(
        "id", "cluster"
    )
    vecs = df.select(col(id_col).alias("id"), col(vec_col).alias("v"))
    clustered = vecs.join(assigned, "id")

    id_t = _id_type(df, id_col)

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id").reset_index(drop=True)
        m = _unit_rows(_matrix(pdf["v"]))
        ids = pdf["id"].to_numpy()
        n = len(ids)
        kept_rows: list[int] = []
        keep = np.zeros(n, dtype=bool)
        pruned_by = np.full(n, None, dtype=object)
        for i in range(n):
            if kept_rows:
                sims = np.round(m[kept_rows] @ m[i], round_digits)
                hit = np.nonzero(sims >= threshold)[0]
                if len(hit):
                    pruned_by[i] = ids[kept_rows[hit[0]]]
                    continue
            keep[i] = True
            kept_rows.append(i)
        return pd.DataFrame(
            {
                "id": ids,
                "cluster": pdf["cluster"],
                "keep": keep,
                "pruned_by": pruned_by,
            }
        )

    return clustered.groupBy("cluster").applyInPandas(
        prune, f"id {id_t}, cluster bigint, keep boolean, pruned_by {id_t}"
    )


def semdedup_prune_cc(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.95,
    round_digits: int = 5,
) -> DataFrame:
    """SemDeDup pruning with CONNECTED-COMPONENT duplicate families — the
    fully oracle-replayable variant of :func:`semdedup_prune`.

    Same two stages as the greedy form, with both sources of
    engine-privacy removed: clustering is the fixed-point integer Lloyd
    (:func:`kmeans_assign_fixedpoint` — bit-exact across engines, already
    hash-proven by embed_kmeans_assign), and the prune rule is
    algorithm-independent — vectors whose rounded cosine ≥ ``threshold``
    within a cluster form edges, a semantic-duplicate FAMILY is a
    connected component of that graph, and the family's lowest id is the
    keeper. min-of-component is canonical (the same contract that makes
    dedup_clusters' recursive-CTE oracle engine-neutral), where the greedy
    survivor set depends on scan order and keeps chain-distant members.

    Scale shape: fixed-point k-means (map-only passes, O(P·k) driver
    scalars) → per-cluster pair generation TILED into block-pair cogroups
    (:func:`_keyed_cosine_pairs` — quadratic only within a (cluster, tile),
    so a hot cluster never materializes its whole similarity matrix in one
    task; raise k to shrink clusters, n_blocks to shrink tiles) →
    :func:`~map_reduce_group_spark.operators.clusters.connected_components`
    over the pair list (O(log d) label-propagation rounds, edges shuffled
    once). Cross-cluster near-dups are out of scope by construction — the
    SemDeDup trade.

    Returns (id, cluster, keep, pruned_by): ``pruned_by`` is the family
    keeper (null for keepers and singletons).
    """
    from map_reduce_group_spark.operators.clusters import connected_components

    from pyspark import StorageLevel

    assigned = kmeans_assign_fixedpoint(df, id_col, vec_col, k=k, iters=iters).select(
        "id", "cluster"
    )
    vecs = df.select(col(id_col).alias("id"), col(vec_col).alias("v"))
    # clustered feeds the pair generation AND the final keep/pruned_by join —
    # unpersisted, the k-means final-assign Arrow pass (and its broadcast
    # join) re-ran once per consumer (guide §2.4 fanout persist)
    clustered = vecs.join(assigned, "id").persist(StorageLevel.MEMORY_AND_DISK)
    id_t = _id_type(df, id_col)

    pairs = _keyed_cosine_pairs(
        clustered.select("id", "v", "cluster"), "cluster", id_t, threshold, round_digits
    ).select("id_a", "id_b")
    comp = connected_components(pairs).select(
        col("id").alias("c_id"), col("cluster_id").alias("family")
    )
    return (
        clustered.join(comp, clustered.id == comp.c_id, "left")
        .select(
            "id",
            "cluster",
            (col("family").isNull() | (col("family") == col("id"))).alias("keep"),
            F.when(col("family") != col("id"), col("family"))
            .otherwise(F.lit(None))
            .alias("pruned_by"),
        )
    )


def kmeans_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
) -> DataFrame:
    """Lloyd k-means over an embedding column — the clustering kernel behind
    cluster-based corpus curation (SemDeDup prunes semantic duplicates
    within k-means clusters; cluster-balanced sampling uses the same
    assignment). Deterministic init: the centroids start as the vectors of
    the ``k`` smallest ids.

    Scale shape per iteration (no O(data) driver traffic):

    - assignment + partial sufficient statistics in ONE Arrow
      ``mapInPandas`` pass: each batch emits at most k rows of
      (cluster, count, per-dimension sums) — NumPy matmul against the
      broadcast centroid matrix, argmin with ties to the lowest cluster id;
    - the P·k partial rows (partitions × clusters, not data) are combined
      driver-side into new means — same O(partitions) scalar class as the
      pack_sequences offsets and the connected-components convergence
      check; empty clusters keep their previous centroid.

    A final pass emits (id, cluster, dist) with dist rounded to 5 decimals
    for cross-run display stability. Registered rows-only: float summation
    order makes exact centroid bits engine-private (the same reason the
    MinHash family is rows-only); the property suite pins the semantics
    (nearest-centroid invariant, planted-cluster recovery, determinism).
    """
    spark = df.sparkSession
    init = (
        df.orderBy(col(id_col))
        .limit(k)
        .select(vec_col)
        .toPandas()[vec_col]
    )
    centroids = np.stack(init.to_numpy()).astype(np.float64)

    flat = df.select(col(id_col).alias("id"), col(vec_col).alias("vec"))

    def make_partials(cents: np.ndarray):
        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                m = _matrix(pdf["vec"])
                d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)  # np.argmin: first (lowest) index wins ties
                rows = []
                for c in np.unique(assign):
                    sel = m[assign == c]
                    rows.append((int(c), len(sel), sel.sum(axis=0).tolist()))
                yield pd.DataFrame(rows, columns=["cluster", "n", "sums"])

        return partials

    dim = centroids.shape[1]
    for _ in range(iters):
        got = flat.mapInPandas(
            make_partials(centroids), "cluster int, n long, sums array<double>"
        ).collect()
        counts = np.zeros(k)
        sums = np.zeros((k, dim))
        for r in sorted(got, key=lambda r: r["cluster"]):
            counts[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["sums"])
        nonempty = counts > 0
        centroids = centroids.copy()
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]

    cents = centroids

    def assign_final(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = _matrix(pdf["vec"])
            d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "cluster": a.astype(np.int64),
                    "dist": np.round(np.sqrt(d2[np.arange(len(a)), a]), 5),
                }
            )

    out_id_type = _id_type(df, id_col)
    return flat.mapInPandas(
        assign_final, f"id {out_id_type}, cluster bigint, dist double"
    )


def kmeans_assign_fixedpoint(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    levels: int = 256,
) -> DataFrame:
    """Fixed-point (int8-quantized) Lloyd k-means — identical distributed
    shape to :func:`kmeans_assign`, but EVERY number is an integer, so the
    result is exactly reproducible by a SQL oracle (VERDICT r3 #2: the
    float variant is rows-only because float summation order is
    engine-private; integer sums are order-insensitive).

    Quantized k-means is also the realistic 100 TB practice: clustering for
    curation (SemDeDup / cluster-balanced sampling) runs fine on uint8
    codes at 4× less bandwidth, and the assignment kernel becomes integer
    SIMD. Contract, all exact:

    - vectors -> per-dimension uint8 codes (``quantize_embeddings``: the
      min/max envelope is order-insensitive, the code arithmetic a fixed
      IEEE sequence — already hash-proven by embed_quantize_int8);
    - init: centroids = codes of the ``k`` smallest ids, cluster j = the
      j-th smallest (deterministic);
    - assignment: argmin_j Σ_i (x_i − c_ji)² over integers, ties to the
      lowest j (np.argmin first-wins == SQL ORDER BY dist2, cluster);
    - update: c_ji = round-half-up of the cluster mean, computed WITHOUT
      floats as ``(2·Σx + n) div (2n)`` (exact integer division in both
      engines); empty clusters keep their previous centroid.

    Scale shape per iteration is unchanged from kmeans_assign: one Arrow
    mapInPandas pass emitting ≤ k partial rows (cluster, count, int sums)
    per batch; only P·k scalar rows reach the driver.

    Returns (id, cluster, dist2) with dist2 the exact integer squared
    distance to the winning centroid.
    """
    codes = quantize_embeddings(df, id_col, vec_col, levels=levels)
    init = codes.orderBy("id").limit(k).select("codes").toPandas()["codes"]
    centroids = np.stack(init.to_numpy()).astype(np.int64)
    dim = centroids.shape[1]

    flat = codes.select("id", col("codes").alias("vec"))

    def make_partials(cents: np.ndarray):
        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
                d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                rows = []
                for c in np.unique(assign):
                    sel = m[assign == c]
                    rows.append((int(c), len(sel), sel.sum(axis=0).tolist()))
                yield pd.DataFrame(rows, columns=["cluster", "n", "sums"])

        return partials

    for _ in range(iters - 1):
        got = flat.mapInPandas(
            make_partials(centroids), "cluster int, n long, sums array<long>"
        ).collect()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, dim), dtype=np.int64)
        for r in got:
            counts[r["cluster"]] += r["n"]
            sums[r["cluster"]] += np.asarray(r["sums"], dtype=np.int64)
        nonempty = counts > 0
        centroids = centroids.copy()
        # round-half-up mean without floats: (2*sum + n) // (2*n)
        centroids[nonempty] = (2 * sums[nonempty] + counts[nonempty, None]) // (
            2 * counts[nonempty, None]
        )

    cents = centroids

    def assign_final(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
            d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "cluster": a.astype(np.int64),
                    "dist2": d2[np.arange(len(a)), a].astype(np.int64),
                }
            )

    out_id_type = _id_type(df, id_col)
    return flat.mapInPandas(
        assign_final, f"id {out_id_type}, cluster bigint, dist2 bigint"
    )


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_subspaces: int = 4,
    n_codes: int = 8,
    train_iters: int = 2,
    levels: int = 256,
    n_shards: int | None = None,
) -> DataFrame:
    """Product-quantization ANN with asymmetric distance computation
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    PAMI'11): the vector dimension splits into ``n_subspaces`` blocks, each
    block trains its own ``n_codes``-centroid codebook, and every corpus
    vector compresses to ``n_subspaces`` small codes — dim·4 bytes down to
    M codes, the memory shape that lets a 100 TB vector corpus fit its
    scan working set in RAM. Queries stay UNcompressed: ADC builds one
    (M × K) integer distance table per query and scores a corpus vector as
    the sum of M table lookups — no decompression, no per-pair vector math.

    Exactness: vectors quantize to integer codes with the corpus-wide
    envelope (``quantize_embeddings`` arithmetic); each subspace codebook
    trains with the fixed-point Lloyd recipe of
    :func:`kmeans_assign_fixedpoint` (lowest-id init — the same seed rows
    sliced per subspace — integer dist², ties to the lowest centroid,
    round-half-up integer mean updates); encoding and ADC are integer
    argmin/sums. End-to-end integer ⇒ a DuckDB oracle replays codebooks,
    codes, and every ADC score bit-for-bit. Top-k by (adc_d2 ASC, c_id
    ASC), self-pairs excluded.

    Scale shape (mirrors :func:`cosine_topk`'s default path): training
    moves only partitions × M × K sufficient-statistic rows per iteration;
    encoding is a map-only Arrow pass against broadcast codebooks; the
    encoded corpus (M ints per row) is hash-sharded once and queries — the
    small side — replicate per shard into a cogrouped ADC kernel with
    per-shard top-k pruning (local order == global order, so shard pruning
    never drops a winner); one window merges shard winners. The raw corpus
    vectors are read once for training/encoding and never shuffle.

    Returns (q_id, c_id, adc_d2, rank).
    """
    spark = corpus.sparkSession
    id_t = _id_type(corpus, id_col)
    env = dimension_envelope(corpus, vec_col)
    if env is None:
        return spark.createDataFrame(
            [], f"q_id {id_t}, c_id {id_t}, adc_d2 bigint, rank bigint"
        )
    mn, mx = env
    rng = mx - mn
    rng[rng == 0] = 1.0
    scale = float(levels - 1)
    bc_env = spark.sparkContext.broadcast((mn, rng))

    def _codes(m: np.ndarray, b_mn: np.ndarray, b_rng: np.ndarray) -> np.ndarray:
        return np.floor((m - b_mn) * scale / b_rng + 0.5).astype(np.int64)

    cflat = corpus.select(col(id_col).alias("id"), col(vec_col).alias("v"))
    qflat = queries.select(col(id_col).alias("id"), col(vec_col).alias("v"))

    # deterministic init: the n_codes smallest corpus ids, sliced per subspace
    init = cflat.orderBy("id").limit(n_codes).toPandas()
    seed = _codes(_matrix(init["v"]), mn, rng)  # (K, dim)
    dim = seed.shape[1]
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    sub = dim // n_subspaces
    # (M, K, sub)
    books = seed.reshape(n_codes, n_subspaces, sub).transpose(1, 0, 2).copy()

    def make_partials(books_now: np.ndarray):
        def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            b_mn, b_rng = bc_env.value
            for pdf in batches:
                if not len(pdf):
                    continue
                m3 = _codes(_matrix(pdf["v"]), b_mn, b_rng).reshape(
                    len(pdf), n_subspaces, sub
                )
                rows = []
                for mi in range(n_subspaces):
                    d2 = (
                        (m3[:, mi, None, :] - books_now[mi][None, :, :]) ** 2
                    ).sum(axis=2)
                    a = d2.argmin(axis=1)
                    for j in np.unique(a):
                        sel = m3[a == j, mi, :]
                        rows.append(
                            (mi, int(j), int(sel.shape[0]), sel.sum(axis=0).tolist())
                        )
                yield pd.DataFrame(rows, columns=["m", "cluster", "n", "sums"])

        return partials

    for _ in range(train_iters - 1):
        got = cflat.mapInPandas(
            make_partials(books), "m int, cluster int, n long, sums array<long>"
        ).collect()
        counts = np.zeros((n_subspaces, n_codes), dtype=np.int64)
        sums = np.zeros((n_subspaces, n_codes, sub), dtype=np.int64)
        for r in got:
            counts[r["m"], r["cluster"]] += r["n"]
            sums[r["m"], r["cluster"]] += np.asarray(r["sums"], dtype=np.int64)
        books = books.copy()
        ne = counts > 0
        books[ne] = (2 * sums[ne] + counts[ne, None]) // (2 * counts[ne, None])

    books_f = books

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_mn, b_rng = bc_env.value
        for pdf in batches:
            if not len(pdf):
                continue
            m3 = _codes(_matrix(pdf["v"]), b_mn, b_rng).reshape(
                len(pdf), n_subspaces, sub
            )
            cs = np.empty((len(pdf), n_subspaces), dtype=np.int32)
            for mi in range(n_subspaces):
                d2 = ((m3[:, mi, None, :] - books_f[mi][None, :, :]) ** 2).sum(axis=2)
                cs[:, mi] = d2.argmin(axis=1)  # first occurrence = lowest code
            yield pd.DataFrame({"id": pdf["id"], "codes": list(cs)})

    enc = cflat.mapInPandas(encode, f"id {id_t}, codes array<int>")

    if n_shards is None:
        n_shards = max(spark.sparkContext.defaultParallelism, 8)
    c = enc.withColumn(
        "shard", F.pmod(F.xxhash64(col("id")), F.lit(n_shards)).cast("int")
    )
    q = qflat.select(
        "id",
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(n_shards - 1))).alias("shard"),
    )

    def shard_adc(key, qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(qpdf) or not len(cpdf):
            return pd.DataFrame({"q_id": [], "c_id": [], "adc_d2": []})
        b_mn, b_rng = bc_env.value
        q3 = _codes(_matrix(qpdf["v"]), b_mn, b_rng).reshape(
            len(qpdf), n_subspaces, sub
        )
        # per-query ADC tables: (Q, M, K)
        tables = (
            (q3[:, :, None, :] - books_f[None, :, :, :]) ** 2
        ).sum(axis=3)
        codes = np.stack(cpdf["codes"].to_numpy()).astype(np.int64)  # (C, M)
        c_ids = cpdf["id"].to_numpy()
        q_ids = qpdf["id"].to_numpy()
        # adc[qi, ci] = sum_m tables[qi, m, codes[ci, m]]
        adc = tables[:, np.arange(n_subspaces)[None, :], codes[:, :]].sum(axis=2)
        out_q, out_c, out_d = [], [], []
        for qi in range(len(q_ids)):
            mask = c_ids != q_ids[qi]
            cand_ids, cand_d = c_ids[mask], adc[qi][mask]
            if not len(cand_ids):
                continue
            order = np.lexsort((cand_ids, cand_d))[:k]
            out_q.extend([q_ids[qi]] * len(order))
            out_c.extend(cand_ids[order])
            out_d.extend(cand_d[order])
        return pd.DataFrame({"q_id": out_q, "c_id": out_c, "adc_d2": out_d})

    flat = (
        q.groupBy("shard")
        .cogroup(c.groupBy("shard"))
        .applyInPandas(shard_adc, f"q_id {id_t}, c_id {id_t}, adc_d2 bigint")
    )
    w = Window.partitionBy("q_id").orderBy(col("adc_d2").asc(), col("c_id").asc())
    return flat.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        col("rank") <= k
    )
