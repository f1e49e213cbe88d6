"""Corpus sampling operators: deterministic hash-uniforms and domain-mixture
rebalancing (north-star: the "data mixing" stage of LLM corpus prep — The
Pile / Llama-style per-source reweighting).

Everything is content/key-addressed (md5-derived uniforms), never seeded
RNG: the same selection falls out on any engine, any partitioning, any run,
so mixtures and ablations are re-derivable from the data alone — and every
formula has a byte-identical ANSI-SQL twin for the DuckDB oracles.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from map_reduce_group_spark.functions.numeric import fp_floor, fp_ratio
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql.functions import col

_TWO32 = 4294967296.0


def hash_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform in [0, 1): the first 8 hex chars of
    md5(salt || key) as a 32-bit integer, scaled. Cross-engine reproducible
    (DuckDB twin: ``CAST(('0x' || substr(md5(s), 1, 8)) AS UBIGINT) / 2^32``).
    """
    h = F.md5(F.concat(F.lit(salt), key.cast("string")).cast("binary"))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_TWO32)


def mixture_rebalance(
    df: DataFrame,
    id_col: str,
    source_col: str,
    weight: Column,
    salt: str = "mix",
) -> DataFrame:
    """Rebalance a multi-source corpus toward target mixture weights by
    deterministic downsampling — the data-mixing pass run before training
    (Pile/Llama report per-source mixture weights; the pipeline must turn
    those into per-document keep decisions).

    Given per-source target weights ``weight`` (any positive relative
    scale), the acceptance rate for source s is

        a_s = min(1, (W_s / p_s) · k),   k = min_s(p_s / W_s)

    where p_s is the source's observed document share and W_s the
    normalized target — i.e. downsample-only rebalancing, normalized so the
    most under-represented source keeps 100 % of its documents. Every input
    is data-relative (observed shares, a global min over sources), so the
    selection stays non-degenerate at any corpus size (CLAUDE.md rule 7).

    Scale shape: rates are computed on the per-source count table (one
    groupBy over the corpus, then window math over ``n_sources`` rows —
    orders of magnitude below data size) and broadcast back; the keep
    decision is a map-side ``hash_uniform(id) < a_s`` predicate. One
    corpus-wide shuffle total (the count groupBy).

    Returns the per-source audit table (source, n_docs, n_kept,
    accept_rate, kept_frac) — the artifact a mixture job must publish.
    """
    tagged = df.select(
        col(id_col).alias("id"), col(source_col).alias("source"), weight.alias("w")
    )
    counts = tagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.first("w").alias("w")
    )
    everything = Window.partitionBy()
    p = col("n_docs") / F.sum("n_docs").over(everything)
    big_w = col("w") / F.sum("w").over(everything)
    k = F.min(p / big_w).over(everything)
    rates = counts.select(
        "source", "n_docs", F.least(F.lit(1.0), big_w / p * k).alias("accept_rate")
    )
    kept = (
        tagged.join(F.broadcast(rates.select("source", "accept_rate")), "source")
        .filter(hash_uniform(col("id"), salt) < col("accept_rate"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            col("n_docs").cast("long").alias("n_docs"),
            F.coalesce(col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            # accept_rate is irreducibly float (min over weight ratios /
            # a correctly-rounded sqrt) -> engine-symmetric floor fixed
            # point; kept_frac is an integer ratio -> exact integer fp6
            # (both: rule 1, never round() a double)
            fp_floor(col("accept_rate")).alias("accept_rate"),
            fp_ratio("coalesce(n_kept, 0)", "n_docs").alias("kept_frac"),
        )
    )


def stratified_cap(
    df,
    id_col: str,
    stratum_col: str,
    cap: int,
    salt: str = "cap",
):
    """Balanced downsampling: keep AT MOST ``cap`` rows per stratum,
    selected by deterministic md5 order (hash_uniform, tie-broken by id) —
    the "no domain may dominate" cap a mixture builder applies after
    rebalancing rates. Content-hash selection means the kept set is
    re-derivable on any engine/partitioning (same property as
    sample_hash_deterministic); one shuffle keyed by the stratum, and
    Spark's WindowGroupLimit pushes the rank<=cap predicate map-side so the
    shuffle carries at most cap rows per stratum per map task.

    Returns the capped rows with their selection rank (1..cap).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(
        hash_uniform(F.col(id_col), salt), F.col(id_col)
    )
    return (
        df.withColumn("sel_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sel_rank") <= cap)
    )


def mixture_temperature(
    df: DataFrame, id_col: str, source_col: str, salt: str = "temp"
) -> DataFrame:
    """Temperature-scaled mixture sampling at T = 0.5: downsample so the
    kept per-source shares are proportional to sqrt(observed share) — the
    exponent-smoothing trick multilingual corpus builders use (mBERT /
    XLM-R exponent-smoothed sampling, Conneau et al. 2020) to damp dominant
    sources without flattening the mixture entirely.

    The downsample-only acceptance rate collapses algebraically to

        a_s = sqrt(n_min / n_s)

    (kept_s = n_s · a_s ∝ sqrt(n_s) ∝ sqrt(p_s); the smallest source keeps
    100 %). The exponent is fixed at 1/2 deliberately: sqrt is the ONE
    power IEEE 754 requires to be correctly rounded, so the rate — and
    therefore every keep decision — is bit-identical across engines, where
    a general pow(p, α) can drift a ulp between libm and the JVM. Every
    input is data-relative (counts and their min), so rates stay
    non-degenerate at any corpus size (CLAUDE.md rule 7).

    Scale shape: identical to mixture_rebalance — one count groupBy, rate
    math over n_sources rows, broadcast back, map-side md5-uniform keep
    predicate. Returns the per-source audit table.
    """
    tagged = df.select(col(id_col).alias("id"), col(source_col).alias("source"))
    counts = tagged.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = F.min("n_docs").over(Window.partitionBy())
    rates = counts.select(
        "source",
        "n_docs",
        F.sqrt(n_min.cast("double") / col("n_docs")).alias("accept_rate"),
    )
    kept = (
        tagged.join(F.broadcast(rates.select("source", "accept_rate")), "source")
        .filter(hash_uniform(col("id"), salt) < col("accept_rate"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            col("n_docs").cast("long").alias("n_docs"),
            F.coalesce(col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            # accept_rate is irreducibly float (min over weight ratios /
            # a correctly-rounded sqrt) -> engine-symmetric floor fixed
            # point; kept_frac is an integer ratio -> exact integer fp6
            # (both: rule 1, never round() a double)
            fp_floor(col("accept_rate")).alias("accept_rate"),
            fp_ratio("coalesce(n_kept, 0)", "n_docs").alias("kept_frac"),
        )
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    train_frac: float = 0.9,
    val_frac: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split assignment: each row's split is a
    pure function of its id (md5-uniform thresholds), so the split is
    reproducible on any engine, any partitioning, any run — and stable
    under corpus growth (a document never migrates between splits when new
    data arrives, the property hash-splits are chosen for over RNG splits
    in every production training pipeline).

    Map-only: no shuffle, no state; the split column composes with any
    downstream filter/write. Returns the input with a ``split`` column.
    """
    u = hash_uniform(col(id_col), salt)
    return df.withColumn(
        "split",
        F.when(u < train_frac, "train")
        .when(u < train_frac + val_frac, "val")
        .otherwise("test"),
    )


def weighted_systematic_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    salt: str = "wsys",
    num_partitions: int = 32,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling: pick ~``n``
    rows with inclusion probability ∝ an integer weight (the token-budget
    sampler of corpus curation — "draw a 10 B-token ablation whose docs
    are chosen proportional to their token counts", Mad-Lab/DoReMi-style
    ablation draws), deterministically.

    Method (classic systematic PPS, Madow 1949): order rows by a
    content-addressed key (md5(salt||id), tie-broken by id — a
    deterministic stand-in for the random permutation), take the running
    weight sum W_i, and select row i iff the half-open interval
    (W_{i-1}, W_i] contains a selection tick — equivalently
    ``floor(W_i·n/W) > floor(W_{i-1}·n/W)`` with W the corpus total. All
    arithmetic is exact BIGINT (products ≤ W·n must stay under 2^63:
    fine to ~10^15 corpus tokens at n ≤ 10^3; switch the two products to
    DECIMAL(38,0) beyond), so any engine reproduces the identical sample.
    A row heavier than W/n absorbs several ticks: ``multiplicity`` > 1
    (it would be certainty-selected in any PPS design).

    The global prefix sum uses the same two-pass distributed scan as
    pack_sequences (operators/text.py:300) — range-partition by the order
    key, per-partition subtotals, O(P) driver offsets broadcast back —
    NEVER a partition-less Window: the corpus-size cumsum stays
    distributed, the driver sees P scalars.

    Returns ``(id, weight, multiplicity)`` for selected rows only
    (≈ n rows at any corpus scale — a top-k-like bounded output).
    """
    t = (
        df.select(
            col(id_col).alias("id"),
            col(weight_col).cast("long").alias("wt"),
            F.md5(F.concat(F.lit(salt), col(id_col).cast("string")).cast("binary")).alias("ord"),
        )
        .filter(col("wt") > 0)
        .repartitionByRange(num_partitions, "ord", "id")
        .withColumn("pid", F.spark_partition_id())
    )
    t = t.localCheckpoint()  # pin pid across the two uses (pack_sequences precedent)
    subtotal_rows = sorted(
        (r["pid"], r["s"]) for r in t.groupBy("pid").agg(F.sum("wt").alias("s")).collect()
    )
    offsets, running = [], 0
    for pid, s in subtotal_rows:
        offsets.append((pid, running))
        running += s
    total = running
    if total == 0:
        return t.select("id", col("wt").alias("weight")).withColumn(
            "multiplicity", F.lit(0).cast("long")
        ).limit(0)
    spark = df.sparkSession
    off = F.broadcast(spark.createDataFrame(offsets, "pid int, off long"))
    w = Window.partitionBy("pid").orderBy("ord", "id")
    return (
        t.join(off, "pid")
        .withColumn("cum", col("off") + F.sum("wt").over(w))
        # exact BIGINT: `div` is integer division (DuckDB twin: `//`);
        # operands are non-negative so truncation == floor on both engines
        .withColumn(
            "multiplicity",
            F.expr(f"(cum * {n}) div {total} - ((cum - wt) * {n}) div {total}").cast("long"),
        )
        .filter(col("multiplicity") > 0)
        .select("id", col("wt").alias("weight"), "multiplicity")
    )
