"""Connected components over similarity edges — the final step of
large-scale dedup (near-dup PAIRS → duplicate CLUSTERS, keep one canonical
doc per cluster).

Algorithm: iterative min-label propagation (hash-to-min) — every vertex
repeatedly takes the minimum label among itself and its neighbors until
fixpoint. The cluster id is therefore min(doc_id) over the component:
canonical and algorithm-independent, which is what makes the recursive-CTE
oracle comparable.

Scale: each round is a neighbor-min join plus one pointer-jump join
(label := label(label)), so label chains HALVE per round — O(log diameter)
rounds even on adversarial path graphs (tested on a 2000-node chain), with
near-dup graphs (star-shaped boilerplate families) converging in 2-3.
``localCheckpoint`` cuts the lineage each round so the plan doesn't grow
unboundedly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import col


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list — the
    link-centrality signal corpus curation uses for domain quality
    (Common-Crawl-style host ranking feeds "keep high-authority domains"
    filters). Returns (id, rank) with Σrank = 1.

    Scale shape per iteration: one join (ranks ⋈ edges on src) + one
    groupBy(dst) sum + one join back onto the vertex table. The edge and
    vertex tables are hash-partitioned on their join keys ONCE before the
    loop (``localCheckpoint`` preserves partitioning — the
    connected_components trick), so the per-round joins are all
    co-partitioned: the only exchange each round is the contribution
    groupBy's own partial→final shuffle. Dangling-node mass is
    redistributed uniformly; its sum rides each round's checkpoint
    materialization via ``observe()`` over a precomputed ``has_out`` flag
    (one Spark job per round, not two — no separate aggregate action).
    ``localCheckpoint`` also cuts the growing lineage.

    Float summation order is partition-order-dependent, so exact rank bits
    are engine-private — rows-only query; semantics pinned by the property
    suite (closed-form graphs, mass conservation, determinism bounds).
    """
    from pyspark.sql import Observation

    # materialize the (possibly expensive — e.g. a similarity join) edge
    # list ONCE, pre-partitioned by src; everything the loop touches roots
    # at checkpointed frames, or each iteration would re-run the
    # edge-producing DAG
    e = (
        edges.select(col(src).alias("src"), col(dst).alias("dst"))
        .distinct()
        .repartition(col("src"))
        .localCheckpoint(eager=True)
    )
    # degrees/contrib_edges group and join on src — no exchange, and the
    # src partitioning carries into contrib_edges through the checkpoint
    degrees = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    contrib_edges = (
        e.join(degrees, "src")
        .select("src", "dst", (F.lit(1.0) / col("deg")).alias("w"))
        .localCheckpoint(eager=True)
    )
    # vertex table with a dangling flag, hash-partitioned by id so the
    # per-round contribution join (id = dst) and rank join (src = id) are
    # both co-partitioned with their shuffled counterparts
    out_ids = e.select("src").distinct().withColumn("has_out", F.lit(True))
    vertices = (
        e.select(col("src").alias("id"))
        .unionByName(e.select(col("dst").alias("id")))
        .distinct()
        .join(out_ids, F.col("id") == out_ids.src, "left")
        .select("id", F.coalesce("has_out", F.lit(False)).alias("has_out"))
        .repartition(col("id"))
        .localCheckpoint(eager=True)
    )
    # one aggregate for both setup scalars (was two separate count jobs)
    n, n_dangling = vertices.agg(
        F.count(F.lit(1)), F.count(F.when(~col("has_out"), 1))
    ).first()
    if n == 0:  # empty graph (e.g. an over-capped similarity join) — no ranks
        return vertices.select("id", F.lit(0.0).alias("rank"))

    ranks = vertices.select("id", "has_out", F.lit(1.0 / n).alias("rank"))
    dangling = n_dangling * (1.0 / n)  # Σ rank over dangling vertices
    for _ in range(iters):
        contribs = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.id)
            .select("dst", (col("rank") * col("w")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        obs = Observation()
        ranks = (
            vertices.join(contribs, vertices.id == contribs.dst, "left")
            .select(
                "id",
                "has_out",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .observe(
                obs,
                F.sum(F.when(~col("has_out"), col("rank")).otherwise(F.lit(0.0))).alias(
                    "dangling"
                ),
            )
            .localCheckpoint(eager=True)
        )
        dangling = obs.get["dangling"]
    return ranks.select("id", "rank")


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 8,
    scale: int = 10**12,
    damping_num: int = 85,
    damping_den: int = 100,
) -> DataFrame:
    """Fixed-point integer PageRank — bit-exact across engines.

    Same power iteration and plan shape as :func:`pagerank`, but every
    quantity is a BIGINT in units of ``1/scale`` and every division is
    integer division, so the result is independent of summation order and
    an independent SQL engine replays it exactly (the float version's rank
    bits are partition-order-private — the reason it is rows-only):

        r0(v)       = scale div n
        contrib(v)  = Σ_{u→v} r(u) div deg(u)
        r'(v)       = (den−num)·scale div (den·n)
                      + num·(contrib(v) + dang div n) div den

    with ``dang = Σ r(u)`` over out-degree-0 vertices. Truncation sheds a
    few units of mass per round (deterministically); ranks stay within
    [0, scale], and ``num·(…)`` peaks below 2·den·scale ≈ 2·10¹⁴ — no
    BIGINT overflow. Same co-partitioned per-round joins, observe()-based
    dangling mass (one job per round) and localCheckpoint lineage cuts as
    the float operator. Returns (id, rank_micro: long).
    """
    from pyspark.sql import Observation

    e = (
        edges.select(col(src).alias("src"), col(dst).alias("dst"))
        .distinct()
        .repartition(col("src"))
        .localCheckpoint(eager=True)
    )
    degrees = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    contrib_edges = (
        e.join(degrees, "src").select("src", "dst", "deg").localCheckpoint(eager=True)
    )
    out_ids = e.select("src").distinct().withColumn("has_out", F.lit(True))
    vertices = (
        e.select(col("src").alias("id"))
        .unionByName(e.select(col("dst").alias("id")))
        .distinct()
        .join(out_ids, F.col("id") == out_ids.src, "left")
        .select("id", F.coalesce("has_out", F.lit(False)).alias("has_out"))
        .repartition(col("id"))
        .localCheckpoint(eager=True)
    )
    # one aggregate for both setup scalars (was two separate count jobs)
    n, n_out = vertices.agg(
        F.count(F.lit(1)), F.count(F.when(col("has_out"), 1))
    ).first()
    if n == 0:
        return vertices.select("id", F.lit(0).cast("long").alias("rank_micro"))

    base = (damping_den - damping_num) * scale // (damping_den * n)
    ranks = vertices.select(
        "id", "has_out", F.lit(scale // n).cast("long").alias("rank")
    )
    dang = (n - n_out) * (scale // n)
    for _ in range(iters):
        contribs = (
            contrib_edges.join(ranks, contrib_edges.src == ranks.id)
            .select("dst", F.expr("rank div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("contrib"))
        )
        dang_share = dang // n
        obs = Observation()
        ranks = (
            vertices.join(contribs, vertices.id == contribs.dst, "left")
            .select(
                "id",
                "has_out",
                (
                    F.lit(base).cast("long")
                    + F.expr(
                        f"({damping_num} * (coalesce(contrib, 0) + {dang_share}))"
                        f" div {damping_den}"
                    )
                ).alias("rank"),
            )
            .observe(
                obs,
                F.sum(
                    F.when(~col("has_out"), col("rank")).otherwise(F.lit(0))
                ).alias("dang"),
            )
            .localCheckpoint(eager=True)
        )
        dang = int(obs.get["dang"] or 0)
    return ranks.select("id", col("rank").alias("rank_micro"))


def connected_components(
    pairs: DataFrame, src: str = "id_a", dst: str = "id_b", max_iter: int = 20
) -> DataFrame:
    """(id, cluster_id) for every vertex appearing in ``pairs``;
    cluster_id = min vertex id of the component."""
    from pyspark.sql import Observation

    # repartition by src BEFORE the iteration: the per-round join keys on
    # src, and localCheckpoint preserves partitioning — so the EDGE table
    # (the big side at 100 TB) is shuffled exactly once for the whole
    # algorithm; each round only moves the label table.
    # Symmetrization is a single-pass explode(array(fwd, rev)) — the
    # two-branch union planned the ENTIRE pair-producing subtree (often a
    # similarity join) twice, exactly the r6 jaccard_topmatch lesson;
    # row multiset identical to the union.
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(col(src).alias("src"), col(dst).alias("dst")),
                    F.struct(col(dst).alias("src"), col(src).alias("dst")),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        .repartition(col("src"))
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(col("src").alias("id")).distinct().withColumn("label", col("id"))
    )
    # labels are monotonically non-increasing under min-propagation, so the
    # label SUM is a strictly-decreasing-until-fixpoint potential function:
    # convergence detection is one cheap aggregate, not a self-join diff.
    # (summed as decimal(38,0): int64 ids could overflow a LongType sum)
    # prev_sum starts as None — no round-0 job; the first round can only
    # "converge" against None when the graph is empty, which is correct
    prev_sum = None
    converged = False
    for it in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("label").alias("nmin"))
        )
        stepped = labels.join(neighbor_min, labels.id == neighbor_min.dst, "left").select(
            "id",
            F.least(col("label"), F.coalesce(col("nmin"), col("label"))).alias("label"),
        )
        if it >= 1:
            # pointer jumping: follow label -> label(label) once per round,
            # halving label chains — O(log diameter) on path graphs. Engaged
            # from round 2: round 1 labels are still mostly self-pointers
            # (nothing to jump through), after that the extra join trades
            # one label-sized shuffle for whole saved rounds. Labels stay
            # ≥ the component minimum and monotone non-increasing, so the
            # fixpoint argument is unchanged.
            lookup = stepped.select(col("id").alias("l_id"), col("label").alias("l_label"))
            stepped = stepped.join(lookup, stepped.label == lookup.l_id, "left").select(
                "id",
                F.least(col("label"), F.coalesce(col("l_label"), col("label"))).alias("label"),
            )
        # the convergence aggregate rides the checkpoint materialization via
        # observe() — one Spark job per round, not two
        obs = Observation()
        labels = stepped.observe(
            obs, F.sum(col("label").cast("decimal(38,0)")).alias("label_sum")
        ).localCheckpoint(eager=True)
        cur_sum = obs.get["label_sum"]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} iterations "
            "(2^max_iter exceeded by component diameter); raise max_iter"
        )
    return labels.select("id", col("label").alias("cluster_id"))
