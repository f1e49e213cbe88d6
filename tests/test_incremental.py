"""Incremental maintenance: rollup refresh and keyed upsert must equal
their full-recompute twins while touching only affected partitions."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from map_reduce_group_spark.catalog import load_table
from map_reduce_group_spark.operators import incremental as inc


def _mtimes(path: str) -> dict[str, float]:
    return {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if "=" in d
    }


def test_refresh_rollup_touches_only_affected_partitions(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    rollup = f"{tmp_path}/rollup"
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
    ]
    # initial full build
    full = events.groupBy("day", "event_type").agg(*aggs)
    from map_reduce_group_spark.sources.io import overwrite_partitions

    overwrite_partitions(full, rollup, ["day"])
    before = _mtimes(rollup)

    # a "new batch" lands on the two most recent days
    days = sorted(r["day"] for r in events.select("day").distinct().collect())
    batch = events.filter(F.col("day").isin(days[-2:]))
    touched = inc.refresh_rollup(
        events, batch, rollup, "day", ["event_type"], aggs
    )
    assert touched == days[-2:]

    after = _mtimes(rollup)
    rewritten = {d for d in after if after[d] != before.get(d)}
    assert rewritten == {f"day={d.isoformat()}" for d in days[-2:]}

    # and the refreshed table equals the full recompute
    got = spark.read.parquet(rollup).select(*full.columns)
    assert got.exceptAll(full).count() == 0 and full.exceptAll(got).count() == 0


def test_upsert_by_key_merges_and_preserves(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    table = f"{tmp_path}/orders_keyed"
    from map_reduce_group_spark.sources.io import overwrite_partitions

    overwrite_partitions(orders, table, ["o_orderstatus"])
    before = _mtimes(table)

    # update 50 existing F-partition orders and insert 5 brand-new ones
    updates_existing = (
        orders.filter(F.col("o_orderstatus") == "F")
        .limit(50)
        .withColumn("o_totalprice", F.lit(-1.0))
    )
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    inserts = (
        orders.filter(F.col("o_orderstatus") == "F")
        .limit(5)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(max_key + 1000))
        .withColumn("o_totalprice", F.lit(-2.0))
    )
    updates = updates_existing.unionByName(inserts)
    touched = inc.upsert_by_key(updates, table, ["o_orderkey"], "o_orderstatus")
    assert touched == ["F"]

    after = _mtimes(table)
    assert {d for d in after if after[d] != before.get(d)} == {"o_orderstatus=F"}

    got = spark.read.parquet(table)
    assert got.count() == orders.count() + 5
    assert got.filter(F.col("o_totalprice") == -1.0).count() == 50
    assert got.filter(F.col("o_totalprice") == -2.0).count() == 5
    # untouched rows identical to the original (outside the updated keys)
    upd_keys = [r["o_orderkey"] for r in updates.select("o_orderkey").collect()]
    want_rest = orders.filter(~F.col("o_orderkey").isin(upd_keys))
    got_rest = got.filter(~F.col("o_orderkey").isin(upd_keys)).select(
        *want_rest.columns
    )
    assert got_rest.exceptAll(want_rest).count() == 0
    assert want_rest.exceptAll(got_rest).count() == 0


def test_scd2_apply_tracks_history(spark, sf_dir, tmp_path):
    """SCD2 merge: an update closes the key's current version at the
    update's effective timestamp and opens a new current one; history and
    untouched keys pass through; as-of queries see the right version."""
    orders = load_table(spark, sf_dir, "orders")
    table = f"{tmp_path}/orders_scd2"
    from map_reduce_group_spark.sources.io import overwrite_partitions

    init = inc.scd2_init(orders, "o_orderdate")
    overwrite_partitions(init, table, ["o_orderstatus"])

    upd_keys = [r["o_orderkey"] for r in
                orders.filter(F.col("o_orderstatus") == "F").limit(20).collect()]
    updates = (
        orders.filter(F.col("o_orderkey").isin(upd_keys))
        .withColumn("o_totalprice", F.lit(999.99))
        .withColumn("o_orderdate", F.lit("2030-01-01").cast("date"))
    )
    touched = inc.scd2_apply(
        updates, table, ["o_orderkey"], "o_orderdate", "o_orderstatus"
    )
    assert touched == ["F"]

    t = spark.read.parquet(table)
    assert t.count() == orders.count() + 20  # history kept, versions added
    hist = t.filter(F.col("o_orderkey").isin(upd_keys))
    closed = hist.filter(~F.col("is_current"))
    current = hist.filter(F.col("is_current"))
    assert closed.count() == 20 and current.count() == 20
    assert closed.filter(F.col("valid_to") != F.lit("2030-01-01").cast("date")).count() == 0
    assert current.filter(F.col("o_totalprice") != 999.99).count() == 0
    assert current.filter(F.col("valid_to").isNotNull()).count() == 0
    # untouched keys: still exactly one current open version
    rest = t.filter(~F.col("o_orderkey").isin(upd_keys))
    assert rest.count() == orders.count() - 20
    assert rest.filter(~F.col("is_current") | F.col("valid_to").isNotNull()).count() == 0
    # as-of query: before the update ts the OLD price is visible
    asof = t.filter(
        (F.col("valid_from") <= F.lit("2029-12-31").cast("date"))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit("2029-12-31").cast("date")))
    ).filter(F.col("o_orderkey").isin(upd_keys))
    assert asof.count() == 20
    assert asof.filter(F.col("o_totalprice") == 999.99).count() == 0


def test_quality_violations_df(spark, sf_dir):
    """violations_df returns the capped offending rows for quarantine."""
    import pyspark.sql.functions as F

    from map_reduce_group_spark.operators.quality import violations_df

    li = load_table(spark, sf_dir, "lineitem")
    bad = F.col("l_discount") > 0.05  # stand-in "violation" predicate
    rows = violations_df(li, bad, limit=10)
    assert rows.count() == 10
    assert rows.filter(~bad).count() == 0


def test_refresh_rollup_empty_batch_is_noop(spark, sf_dir, tmp_path):
    """An empty increment must touch nothing and return no partitions."""
    import pyspark.sql.functions as F

    from map_reduce_group_spark.operators import incremental as inc
    from map_reduce_group_spark.sources.io import overwrite_partitions

    events = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    rollup = f"{tmp_path}/rollup"
    aggs = [F.count(F.lit(1)).alias("n_events")]
    overwrite_partitions(events.groupBy("day").agg(*aggs), rollup, ["day"])
    before = _mtimes(rollup)
    touched = inc.refresh_rollup(
        events, events.filter(F.lit(False)), rollup, "day", [], aggs
    )
    assert touched == []
    assert _mtimes(rollup) == before


def test_upsert_creates_new_partition(spark, sf_dir, tmp_path):
    """Upserting keys whose partition value doesn't exist yet must create
    the partition without touching siblings."""
    import pyspark.sql.functions as F

    from map_reduce_group_spark.operators import incremental as inc
    from map_reduce_group_spark.sources.io import overwrite_partitions

    orders = load_table(spark, sf_dir, "orders")
    table = f"{tmp_path}/orders_grow"
    overwrite_partitions(orders, table, ["o_orderstatus"])
    before = _mtimes(table)

    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    newbies = (
        orders.limit(7)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(max_key + 10))
        .withColumn("o_orderstatus", F.lit("X"))
    )
    touched = inc.upsert_by_key(newbies, table, ["o_orderkey"], "o_orderstatus")
    assert touched == ["X"]
    after = _mtimes(table)
    assert "o_orderstatus=X" in after
    assert all(after[d] == before[d] for d in before)  # siblings untouched
    got = spark.read.parquet(table)
    assert got.filter(F.col("o_orderstatus") == "X").count() == 7
    assert got.count() == orders.count() + 7


def test_scd2_apply_chains_multiple_updates_per_key(spark, sf_dir, tmp_path):
    """N same-key updates in ONE batch chain into N versions (valid_to =
    next update's ts) with exactly one current — round-2 ADVICE: the old
    code left N simultaneously-open versions."""
    orders = load_table(spark, sf_dir, "orders")
    table = f"{tmp_path}/orders_scd2_chain"
    from map_reduce_group_spark.sources.io import overwrite_partitions

    init = inc.scd2_init(orders, "o_orderdate")
    overwrite_partitions(init, table, ["o_orderstatus"])

    key = orders.filter(F.col("o_orderstatus") == "F").first()["o_orderkey"]
    base = orders.filter(F.col("o_orderkey") == key)
    updates = None
    for i, day in enumerate(["2030-01-01", "2030-02-01", "2030-03-01"]):
        u = base.withColumn("o_totalprice", F.lit(100.0 + i)).withColumn(
            "o_orderdate", F.lit(day).cast("date")
        )
        updates = u if updates is None else updates.unionByName(u)
    inc.scd2_apply(updates, table, ["o_orderkey"], "o_orderdate", "o_orderstatus")

    hist = (
        spark.read.parquet(table)
        .filter(F.col("o_orderkey") == key)
        .orderBy("valid_from")
        .collect()
    )
    assert len(hist) == 4  # original + 3 chained versions
    assert [bool(r["is_current"]) for r in hist] == [False, False, False, True]
    # each version closes exactly where the next opens
    for a, b in zip(hist, hist[1:]):
        assert a["valid_to"] == b["valid_from"]
    assert hist[-1]["valid_to"] is None and hist[-1]["o_totalprice"] == 102.0


def test_scd2_apply_rejects_ambiguous_and_backdated(spark, sf_dir, tmp_path):
    """Duplicate (key, ts) rows and updates at/before the open version's
    valid_from raise before any partition is rewritten."""
    import pytest

    orders = load_table(spark, sf_dir, "orders")
    table = f"{tmp_path}/orders_scd2_guard"
    from map_reduce_group_spark.sources.io import overwrite_partitions

    init = inc.scd2_init(orders, "o_orderdate")
    overwrite_partitions(init, table, ["o_orderstatus"])
    before = spark.read.parquet(table).count()

    row = orders.filter(F.col("o_orderstatus") == "F").first()
    key = row["o_orderkey"]
    base = orders.filter(F.col("o_orderkey") == key)

    dup = base.withColumn("o_orderdate", F.lit("2030-01-01").cast("date"))
    with pytest.raises(ValueError, match="duplicate"):
        inc.scd2_apply(
            dup.unionByName(dup), table, ["o_orderkey"], "o_orderdate", "o_orderstatus"
        )

    backdated = base.withColumn("o_orderdate", F.col("o_orderdate") - F.expr("INTERVAL 1 DAY"))
    with pytest.raises(ValueError, match="backdated"):
        inc.scd2_apply(
            backdated, table, ["o_orderkey"], "o_orderdate", "o_orderstatus"
        )
    assert spark.read.parquet(table).count() == before  # nothing rewritten


def test_scd2_merge_chain_invariants(spark):
    """Randomized batches against the SCD2 contract: after a pure merge,
    every key's history is a valid version chain — exactly one open
    version, closed versions link contiguously (valid_to == successor's
    valid_from), no overlaps, and untouched keys pass through bit-identical.
    """
    import random

    from map_reduce_group_spark.operators.incremental import scd2_init, scd2_merge

    rng = random.Random(11)
    base_rows = [(k, float(k * 10), 1000) for k in range(20)]
    existing = scd2_init(
        spark.createDataFrame(base_rows, "k long, val double, ts long"), "ts"
    )
    upd_rows = []
    for k in range(0, 20, 2):  # update half the keys, 1-3 versions each
        for i in range(rng.randrange(1, 4)):
            upd_rows.append((k, float(k * 100 + i), 2000 + i * 7))
    updates = spark.createDataFrame(upd_rows, "k long, val double, ts long")

    hist = scd2_merge(existing, updates, ["k"], "ts").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    n_upd = {k: len([1 for kk, *_ in upd_rows if kk == k]) for k in range(20)}
    for k, rows in by_key.items():
        rows.sort(key=lambda r: r["valid_from"])
        opens = [r for r in rows if r["is_current"]]
        assert len(opens) == 1, f"key {k}: {len(opens)} open versions"
        assert rows[-1]["is_current"] and rows[-1]["valid_to"] is None
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"], f"key {k}: gap/overlap"
            assert not a["is_current"]
        assert len(rows) == 1 + n_upd.get(k, 0)
    untouched = [r for r in hist if r["k"] % 2 == 1]
    for r in untouched:
        assert r["is_current"] and r["valid_to"] is None and r["valid_from"] == 1000
