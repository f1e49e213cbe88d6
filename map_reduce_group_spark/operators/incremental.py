"""Incremental table maintenance: rollup refresh and keyed upsert over
partitioned parquet — the operational layer between "rerun the whole job"
and a full lakehouse format.

At 100 TB you cannot recompute an aggregate table because one hour of new
events arrived, and you cannot rewrite a 100 TB table to update 0.1 % of
its rows. Both primitives below touch ONLY the partitions the incoming
batch lands in:

1. derive the affected partition values from the batch (one cheap
   distinct over the batch, never a scan of the base table);
2. recompute/merge just those partitions (for upsert: anti-join the
   existing partition slice against the incoming keys, union the updates);
3. swap them in atomically-per-partition via dynamic partition overwrite
   (``sources/io.py:overwrite_partitions``) — sibling partitions are never
   read, written, or locked.

Work scales with the size of the INCREMENT × partition granularity, not
the base table. The same pattern maintains any downstream aggregate
(hypertable-style rollups) or slowly-changing keyed table.

Both functions return the affected partition values so callers can chain
cascading refreshes (raw → hourly → daily) touching only what changed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from map_reduce_group_spark.sources.io import overwrite_partitions


def affected_partitions(batch: DataFrame, part_col: str) -> list:
    """Distinct partition values present in an incoming batch (the driver
    receives only the distinct list — O(partitions touched), not O(rows))."""
    return sorted(
        r[part_col] for r in batch.select(part_col).distinct().collect()
    )


def refresh_rollup(
    events: DataFrame,
    batch: DataFrame,
    rollup_path: str,
    part_col: str,
    group_cols: list[str],
    agg_exprs: list,
) -> list:
    """Incrementally refresh an aggregate table: recompute ONLY the
    ``part_col`` partitions that appear in ``batch`` — from ``events`` (the
    full base relation, so the refreshed partitions are exact, not
    merge-approximated) — and dynamic-overwrite them in ``rollup_path``.

    The base-table read is partition-pruned to the affected values (pass an
    ``events`` frame backed by a ``part_col``-partitioned layout and the
    filter becomes a directory listing). Aggregates need no merge algebra:
    within-partition recompute handles non-decomposable aggregates
    (distincts, exact quantiles) that delta-merging cannot.
    """
    parts = affected_partitions(batch, part_col)
    if not parts:
        return parts
    fresh = (
        events.filter(F.col(part_col).isin(parts))
        .groupBy(part_col, *group_cols)
        .agg(*agg_exprs)
        # cluster sized to the affected-partition count — one file per
        # refreshed dir instead of shuffle.partitions writer tasks
        # (guide §6; see upsert_by_key)
        .repartition(len(parts), F.col(part_col))
    )
    overwrite_partitions(fresh, rollup_path, [part_col])
    return parts


def scd2_init(df: DataFrame, ts_col: str) -> DataFrame:
    """Dress a snapshot as an SCD2 history table: every row becomes the
    current version effective from its ``ts_col``."""
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lit(None).cast(dict(df.dtypes)[ts_col]))
        .withColumn("is_current", F.lit(True))
    )


def scd2_apply(
    updates: DataFrame,
    table_path: str,
    key_cols: list[str],
    ts_col: str,
    part_col: str,
) -> list:
    """Slowly-changing-dimension type-2 merge: instead of overwriting a
    key's row (``upsert_by_key`` = SCD1), CLOSE the key's current version
    (``valid_to`` = the update's effective timestamp, ``is_current`` =
    false) and append the update as the new open version — the full change
    history stays queryable ("value as of T" = ``valid_from <= T AND
    (valid_to IS NULL OR valid_to > T)``).

    Same partition-scoped shape as ``upsert_by_key``: only the ``part_col``
    partitions the updates land in are read and rewritten (valid as long as
    ``part_col`` is a function of the key), and the updated-key set joins
    broadcast. History rows and current rows of untouched keys pass through
    untouched.

    Multiple updates for one key in a single batch CHAIN: each version's
    ``valid_to`` is the next update's timestamp (``lead`` over the key's
    ts order) and only the latest is ``is_current`` — N same-key updates
    previously left N simultaneously-open versions (round-2 ADVICE).
    Rejected with ``ValueError`` (cheap O(batch) checks on the
    broadcast-sized increment, caught before any partition is rewritten):
    duplicate ``(key, ts)`` rows — no deterministic chain order exists —
    and backdated updates (``ts <= `` the open version's ``valid_from``),
    which would interleave with already-closed history.
    """
    spark = updates.sparkSession
    parts = affected_partitions(updates, part_col)
    if not parts:
        return parts
    n_dup = (
        updates.groupBy(*key_cols, ts_col)
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    if n_dup:
        raise ValueError(
            f"scd2_apply: {n_dup} duplicate (key, {ts_col}) groups in batch — "
            "version chain order would be ambiguous"
        )
    new_ts = F.broadcast(
        updates.groupBy(*key_cols).agg(F.min(ts_col).alias("__new_ts"))
    )
    existing = spark.read.parquet(table_path).filter(F.col(part_col).isin(parts))
    n_backdated = (
        existing.filter(F.col("is_current"))
        .join(new_ts, key_cols)
        .filter(F.col("__new_ts") <= F.col("valid_from"))
        .count()
    )
    if n_backdated:
        raise ValueError(
            f"scd2_apply: {n_backdated} keys have updates at or before the "
            "open version's valid_from — backdated merges would corrupt history"
        )
    merged = scd2_merge(existing, updates, key_cols, ts_col).repartition(
        # one file per rewritten partition dir (guide §6; see upsert_by_key)
        len(parts), F.col(part_col)
    )
    overwrite_partitions(merged, table_path, [part_col])
    return parts


def scd2_merge(
    existing: DataFrame, updates: DataFrame, key_cols: list[str], ts_col: str
) -> DataFrame:
    """The pure-relational core of the SCD2 merge (no I/O, no actions):
    close each updated key's open version at its first update timestamp,
    chain same-key updates into consecutive versions (``valid_to`` =
    ``lead(valid_from)`` over the key's ts order, only the last open), and
    union. ``existing`` must carry ``valid_from``/``valid_to``/``is_current``
    (``scd2_init``); ``updates`` carries the new attribute values + ``ts_col``.

    Shape at scale: one broadcastable min-ts aggregate of the increment
    joined onto the history slice, one window over the increment — history
    rows of untouched keys pass through untouched. ``scd2_apply`` wraps this
    with partition pruning, batch validation, and the dynamic-overwrite sink.
    """
    new_ts = F.broadcast(
        updates.groupBy(*key_cols).agg(F.min(ts_col).alias("__new_ts"))
    )
    closed = (
        existing.join(new_ts, key_cols, "left")
        .withColumn(
            "valid_to",
            F.when(
                F.col("is_current") & F.col("__new_ts").isNotNull(),
                F.col("__new_ts"),
            ).otherwise(F.col("valid_to")),
        )
        .withColumn(
            "is_current",
            F.col("is_current") & F.col("__new_ts").isNull(),
        )
        .drop("__new_ts")
    )
    chain = Window.partitionBy(*key_cols).orderBy(F.col(ts_col).asc())
    fresh = (
        scd2_init(updates, ts_col)
        .withColumn("valid_to", F.lead("valid_from").over(chain))
        .withColumn("is_current", F.col("valid_to").isNull())
        .select(*closed.columns)
    )
    return closed.unionByName(fresh)


def upsert_by_key(
    updates: DataFrame,
    table_path: str,
    key_cols: list[str],
    part_col: str,
    parts: list | None = None,
) -> list:
    """Keyed upsert into a ``part_col``-partitioned parquet table: rows in
    ``updates`` replace same-key rows, new keys append — rewriting only the
    partitions the updates land in (classic MERGE semantics without a table
    format, correct as long as ``part_col`` is a function of the key, i.e.
    a key's partition never changes).

    Shape: read ONLY affected partitions (partition-pruned scan), anti-join
    away the updated keys, union the updates, dynamic-overwrite. The
    anti-join's build side is the update batch — broadcastable whenever the
    increment is small, which is the whole premise.

    ``parts`` optionally supplies the affected partition values when the
    caller PROVABLY knows them (e.g. the MinHash band upsert: every doc
    emits every band, so a non-empty batch touches exactly range(bands)) —
    skipping the distinct-collect job, which is a measurable share of a
    micro-batch increment's wall. The default derives them from the batch.
    """
    spark = updates.sparkSession
    if parts is None:
        parts = affected_partitions(updates, part_col)
    else:
        parts = sorted(parts)
    if not parts:
        return parts
    existing = spark.read.parquet(table_path).filter(F.col(part_col).isin(parts))
    survivors = existing.join(
        F.broadcast(updates.select(*key_cols).distinct()), key_cols, "left_anti"
    )
    merged = survivors.unionByName(updates.select(*existing.columns))
    # cluster by the partition column, sized to the AFFECTED partition
    # count (known driver-side, data-relative): without it every task of
    # the scan∪batch union writes its own file into each partition dir it
    # touches — up to tasks × |parts| tiny files per upsert (guide §6
    # small files), and on high-latency filesystems the per-file
    # create/commit wait dominates the whole write (measured on this
    # host: 1.9 s for a 32-file tiny parquet write vs 0.27 s for 4).
    merged = merged.repartition(len(parts), F.col(part_col))
    overwrite_partitions(merged, table_path, [part_col])
    return parts
