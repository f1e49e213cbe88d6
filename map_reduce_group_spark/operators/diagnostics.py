"""Pre-join planning diagnostics: per-key skew profiles.

Shuffle-join cost at 100 TB is governed by the hottest key: one key holding
5× the average partition volume stalls the whole stage (the reason AQE's
skew-join split exists, `spark.sql.adaptive.skewJoin.skewedPartitionFactor`
default 5). The engine already *mitigates* skew (plans/advanced.py salting,
AQE split pinned in tests/test_plan_shapes.py); this module *measures* it —
the audit a pipeline runs before choosing broadcast vs shuffle vs salt for
each join, instead of discovering the straggler in production.

All ratios are integer fixed point (cross-multiplied — CLAUDE.md rule 1) and
every threshold is data-relative (count·n_keys vs factor·total — rule 7).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(
    df: DataFrame, key_col: str, label: str, skew_factor: int = 5
) -> DataFrame:
    """One summary row for ``key_col`` as a prospective join key:

    (join_key, total_rows, n_keys, max_key_count, skew_x_fp, hot_key,
    n_over_factor) where skew_x_fp = hottest-key count over the uniform
    mean in 1/100 fixed point ((max·n_keys·100) div total) and
    n_over_factor counts keys exceeding ``skew_factor``× the mean
    (AQE's skewedPartitionFactor convention) via the integer
    cross-multiplication c·n_keys > factor·total. hot_key is the
    smallest key among those at the max count (deterministic under ties).

    Scale shape: one groupBy shuffle on the key (the same aggregation any
    skew probe needs); the counts relation is materialized once via an
    eager localCheckpoint and reused for the totals scalar, the hot-key
    pick, and the over-factor census — all downstream frames are one-row
    scalars riding broadcasts. localCheckpoint, not persist: the blocks
    are ContextCleaner-released when the returned plan is dropped, so a
    long-lived session re-invoking the profile (the bench loop does) does
    not accumulate cached blocks for its lifetime (ADVICE r7 #4); the
    trade (ADVICE r8 #3) is truncated lineage — a lost block is
    unrecoverable rather than recomputed, acceptable for this audit
    harness, revisit (persist + teardown unpersist) where executor-loss
    recovery matters. NULL
    keys count as a key (they hash to one partition in a real join —
    exactly the skew this audit exists to catch) via a sentinel bucket.
    """
    c = (
        df.select(
            F.coalesce(F.col(key_col).cast("string"), F.lit("<NULL>")).alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = c.agg(
        F.sum("c").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("d"),
        F.max("c").cast("long").alias("mx"),
    )
    hot = (
        c.join(F.broadcast(tot))
        .where(F.col("c") == F.col("mx"))
        .agg(F.min("k").alias("hot_key"))
    )
    over = (
        c.join(F.broadcast(tot))
        # DECIMAL(38,0): count*distinct products wrap int64 on high-
        # cardinality keys at full scale (ADVICE r7 #1 headroom class)
        .where(F.expr(f"CAST(c AS DECIMAL(38,0)) * d > {skew_factor} * CAST(t AS DECIMAL(38,0))"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_over_factor"))
    )
    return (
        tot.join(F.broadcast(hot)).join(F.broadcast(over))
        .select(
            F.lit(label).alias("join_key"),
            F.col("t").alias("total_rows"),
            F.col("d").alias("n_keys"),
            F.col("mx").alias("max_key_count"),
            F.expr("(CAST(mx AS DECIMAL(38,0)) * d * 100) div t").alias("skew_x_fp"),
            "hot_key",
            "n_over_factor",
        )
    )


def join_skew_report(
    profiles: list[tuple[DataFrame, str, str]], skew_factor: int = 5
) -> DataFrame:
    """Union of :func:`key_skew_profile` rows for a list of
    (df, key_col, label) join-key candidates — the one-page audit that
    decides broadcast vs shuffle vs salt per join.

    The per-leg profiles are INDEPENDENT jobs (each roots at its own eager
    localCheckpoint); submitting them from a small thread pool lets each
    leg's tail back-fill the executors freed by the previous leg instead
    of running the N groupBy jobs strictly serially (optimization guide
    §2.6). Output order is pinned by ``pool.map`` (list order unchanged),
    and each profile is deterministic, so the result is bit-identical to
    the serial loop."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(len(profiles), 4)) as pool:
        parts = list(
            pool.map(
                lambda p: key_skew_profile(p[0], p[1], p[2], skew_factor), profiles
            )
        )
    return reduce(lambda a, b: a.unionByName(b), parts)
