"""Round-trip and layout tests for sources/sinks, including the bucketed
no-shuffle join and partition pruning."""

from __future__ import annotations

import io
import os
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from map_reduce_group_spark.catalog import load_table
from map_reduce_group_spark.sources import io as sio


def explain_str(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_csv_json_text_roundtrip(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    base = str(tmp_path)

    sio.write_csv(nation, f"{base}/nation_csv")
    back_csv = sio.read_csv(
        spark, f"{base}/nation_csv", "n_nationkey int, n_name string, n_regionkey int"
    )
    assert sorted(back_csv.collect()) == sorted(nation.collect())

    sio.write_json(nation, f"{base}/nation_json")
    back_json = sio.read_json(
        spark, f"{base}/nation_json", "n_nationkey int, n_name string, n_regionkey int"
    ).select("n_nationkey", "n_name", "n_regionkey")
    assert sorted(back_json.collect()) == sorted(nation.collect())

    sio.write_text(nation.select(F.concat_ws("\t", "n_nationkey", "n_name").alias("value")),
                   f"{base}/nation_text", num_files=2)
    back_text = sio.read_text_dir(spark, f"{base}/nation_text")
    assert back_text.count() == nation.count()
    parts = [f for f in os.listdir(f"{base}/nation_text") if f.startswith("part-")]
    assert len(parts) == 2  # reference-style one file per partition


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    path = f"{tmp_path}/orders_by_status"
    sio.write_partitioned(orders, path, ["o_orderstatus"])
    assert set(os.listdir(path)) >= {"o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"}

    back = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    assert back.count() == orders.filter(F.col("o_orderstatus") == "F").count()
    plan = explain_str(back)
    # partition pruning: the F predicate must land in PartitionFilters
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split("PushedFilters")[0]


def test_bucketed_join_no_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    sio.write_bucketed(orders, "b_orders", ["o_custkey"], num_buckets=8)
    sio.write_bucketed(cust, "b_customer", ["c_custkey"], num_buckets=8)

    # disable broadcast + AQE so the join strategy is decided by bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        j = spark.table("b_orders").join(
            spark.table("b_customer"), F.col("o_custkey") == F.col("c_custkey")
        )
        plan = explain_str(j)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert j.count() == orders.join(cust, orders.o_custkey == cust.c_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_compact_parquet_small_files(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    frag = f"{tmp_path}/fragmented"
    orders.repartition(64).write.parquet(frag)  # simulate small-file mess
    import os

    n_in = sum(1 for f in os.listdir(frag) if f.endswith(".parquet"))
    assert n_in == 64
    out = f"{tmp_path}/compacted"
    sio.compact_parquet(spark, frag, out, target_file_bytes=1 * 1024 * 1024)
    n_out = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert n_out < n_in
    assert spark.read.parquet(out).count() == orders.count()


def test_schema_evolution_merge(spark, tmp_path):
    """mergeSchema read across parquet parts with evolving columns —
    schema-on-read the way long-lived 100TB tables actually evolve."""
    base = f"{tmp_path}/evolving"
    spark.createDataFrame([(1, "a")], "id int, s string").write.parquet(f"{base}/p=1")
    spark.createDataFrame([(2, "b", 9.5)], "id int, s string, score double").write.parquet(
        f"{base}/p=2"
    )
    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) >= {"id", "s", "score"}
    rows = {r["id"]: (r["s"], r["score"]) for r in df.collect()}
    assert rows[1] == ("a", None) and rows[2] == ("b", 9.5)


def test_orc_roundtrip_and_pushdown(spark, sf_dir, tmp_path):
    nation = load_table(spark, sf_dir, "nation")
    path = f"{tmp_path}/nation_orc"
    sio.write_orc(nation, path)
    back = sio.read_orc(spark, path)
    assert sorted(back.collect()) == sorted(nation.collect())
    # the ORC scan must push filters and prune columns like parquet
    p = explain_str(back.filter(F.col("n_regionkey") == 1).select("n_name"))
    assert "PushedFilters" in p and "n_regionkey" in p, p
    assert "n_comment" not in p.split("ReadSchema")[-1], p


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """Dynamic partition pruning: joining a partitioned fact to a FILTERED
    dim on the partition column must inject a runtime subquery into the
    fact scan's PartitionFilters (``dynamicpruning`` expression) so only
    the dim-selected partitions are read — at 100 TB this is the difference
    between scanning one date partition and scanning the table. Static
    pruning can't do this: the partition set is only known after the dim
    filter runs."""
    orders = load_table(spark, sf_dir, "orders")
    path = f"{tmp_path}/orders_by_prio"
    sio.write_partitioned(orders, path, ["o_orderpriority"])
    fact = spark.read.parquet(path)
    dim = (
        orders.select("o_orderpriority")
        .distinct()
        .filter(F.col("o_orderpriority").startswith("1"))
    )
    joined = fact.join(dim, "o_orderpriority")
    plan = explain_str(joined)
    part_filters = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("dynamicpruning" in ln for ln in part_filters), plan
    # and the result is the statically-filtered row set
    want = orders.filter(F.col("o_orderpriority").startswith("1")).count()
    assert joined.count() == want


def test_dynamic_partition_overwrite(spark, sf_dir, tmp_path):
    """overwrite_partitions must replace only the partitions present in the
    incoming frame (idempotent daily reload) — static overwrite would
    truncate every other partition."""
    orders = load_table(spark, sf_dir, "orders")
    path = f"{tmp_path}/orders_dyn"
    sio.write_partitioned(orders, path, ["o_orderstatus"])
    before = {
        r["o_orderstatus"]: r["n"]
        for r in spark.read.parquet(path).groupBy("o_orderstatus").count()
        .withColumnRenamed("count", "n").collect()
    }

    # reload ONLY the F partition, with a marker mutation (totalprice = 0)
    f_only = orders.filter(F.col("o_orderstatus") == "F").withColumn(
        "o_totalprice", F.lit(0.0)
    )
    sio.overwrite_partitions(f_only, path, ["o_orderstatus"])

    back = spark.read.parquet(path)
    after = {
        r["o_orderstatus"]: r["n"]
        for r in back.groupBy("o_orderstatus").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert after == before  # same partition set, same counts
    # F partition rewritten...
    assert back.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") != 0)).count() == 0
    # ...others untouched
    assert back.filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") == 0)).count() == 0
    # and the conf was restored (write-scoped, not session-leaked)
    assert spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC").upper() == "STATIC"


def test_permissive_json_quarantines_bad_rows(spark, tmp_path):
    """A malformed line must neither fail the read nor silently vanish: it
    lands whole in the corrupt-record column for quarantine."""
    src = tmp_path / "raw"
    src.mkdir()
    (src / "a.json").write_text(
        '{"id": 1, "v": "ok"}\n'
        'THIS IS NOT JSON\n'
        '{"id": 2, "v": "also ok"}\n'
        '{"id": "not-a-number", "v": "half bad"}\n'
    )
    df = sio.read_json_permissive(spark, str(src), "id bigint, v string").cache()
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert sorted(r["id"] for r in good.collect()) == [1, 2]
    assert bad.count() == 2  # the non-JSON line and the type-mismatched row
    assert any("NOT JSON" in r["_corrupt_record"] for r in bad.collect())
    df.unpersist()


def test_sql_entry_point_matches_dataframe_api(spark, sf_dir):
    """catalog.sql: pure-SQL access to the catalog must produce the same
    result AND the same pushdown behavior as the DataFrame API (views are
    lazy loader references, so Catalyst sees one logical plan)."""
    from map_reduce_group_spark import catalog

    got = catalog.sql(
        spark,
        sf_dir,
        """
        SELECT n_name, count(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > 0
        GROUP BY n_name
        """,
    )
    want = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 0)
        .join(
            load_table(spark, sf_dir, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # pushdown reaches the scan through the view layer too
    p = explain_str(got)
    assert "PushedFilters" in p and "c_acctbal" in p
    # events view keeps the timestamp normalization from the loader
    ts_type = dict(
        catalog.sql(spark, sf_dir, "SELECT ts FROM events LIMIT 1").dtypes
    )["ts"]
    assert ts_type == "timestamp"


def test_synthetic_docs_datasource(spark):
    """Custom Python DataSource: deterministic partition-parallel generation
    with doc_id range pushdown narrowing the partitions themselves."""
    from map_reduce_group_spark.sources.synthetic import (
        SyntheticDocsDataSource,
        SyntheticDocsPushdownReader,
    )

    spark.dataSource.register(SyntheticDocsDataSource)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 500)
        .option("n_partitions", 7)
        .option("seed", 42)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 500
    assert dict(df.dtypes)["doc_id"] == "bigint"
    # deterministic: a second scan produces the identical corpus
    again = (
        spark.read.format("synthetic_docs")
        .option("n_docs", 500).option("n_partitions", 3).option("seed", 42).load()
    )
    assert df.exceptAll(again).count() == 0 and again.exceptAll(df).count() == 0
    # filters produce correct results (pushed or not)
    sub = df.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 120))
    ids = sorted(r["doc_id"] for r in sub.select("doc_id").collect())
    assert ids == list(range(100, 120))

    # the pushdown contract, unit-level: range predicates narrow the
    # generation bounds and the partition set; others are yielded back
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan, StringContains

    r = SyntheticDocsPushdownReader({"n_docs": "1000", "n_partitions": "8"})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("doc_id",), 900),
                LessThan(("doc_id",), 950),
                StringContains(("text",), "spark"),
            ]
        )
    )
    assert [type(f).__name__ for f in leftover] == ["StringContains"]
    parts = r.partitions()
    assert sum(p.end - p.start for p in parts) == 50  # O(selected), not O(n_docs)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def test_zorder_write_improves_two_axis_skipping(spark, sf_dir, tmp_path):
    """Z-order layout: every output file must cover a small hyper-rectangle
    of (o_custkey, o_totalprice) — measured from real parquet footer stats —
    so min/max skipping prunes files for predicates on EITHER column. A
    single-column sort gives narrow ranges on its leading column only."""
    import pyarrow.parquet as pq

    orders = load_table(spark, sf_dir, "orders")
    zpath, spath = f"{tmp_path}/z", f"{tmp_path}/s"
    sio.write_zordered(orders, zpath, ["o_custkey", "o_totalprice"], num_files=16)
    # baseline: lexicographic sort by custkey only
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite").parquet(spath)
    )

    def mean_file_spread(path: str, col: str) -> float:
        spreads, lo, hi = [], None, None
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            mns, mxs = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        mns.append(c.statistics.min)
                        mxs.append(c.statistics.max)
            if mns:
                spreads.append(max(mxs) - min(mns))
                lo = min(mns) if lo is None else min(lo, min(mns))
                hi = max(mxs) if hi is None else max(hi, max(mxs))
        return sum(spreads) / len(spreads) / ((hi - lo) or 1)

    # on the custkey axis the plain sort is optimal; z-order must still be
    # far better than "every file spans everything" (spread ~1.0)
    assert mean_file_spread(zpath, "o_custkey") < 0.5
    # on the SECOND axis the plain sort cannot skip at all (~full spread),
    # z-order must retain real pruning power there too
    z2 = mean_file_spread(zpath, "o_totalprice")
    s2 = mean_file_spread(spath, "o_totalprice")
    assert z2 < 0.5 < s2, (z2, s2)
    # layout change must not lose rows
    assert spark.read.parquet(zpath).count() == orders.count()


def test_bench_line_fits_driver_capture_window():
    """The external driver records only the last 2000 bytes of bench stdout:
    the compact line must stay under that for any plausible query map, keep
    valid JSON with the headline metric first, and degrade by dropping
    slow-map entries, not by truncating mid-JSON."""
    import json as _json

    from bench import compact_line

    timings = {f"query_with_a_rather_long_name_{i:03d}": i * 0.137 for i in range(400)}
    errors = {f"broken_query_{i}": "x" * 500 for i in range(10)}
    out = {"metric": "total_query_wall_sec", "value": 1.0, "unit": "sec", "sf": 0.1}
    line = compact_line(out, timings, errors)
    assert len(line) <= 1800, len(line)
    parsed = _json.loads(line)
    assert parsed["metric"] == "total_query_wall_sec"
    assert parsed["n_queries_total"] == 400 and parsed["n_errors"] == 10
    # slowest entries survive the shrink
    assert "query_with_a_rather_long_name_399" in parsed["queries"]
    # empty map edge: still valid and inside the window
    assert len(compact_line(out, {}, {})) <= 1800


def test_registry_enumeration_is_cross_process_deterministic():
    """The external driver sweeps the FIRST 50 enumerated queries — the
    whole coverage-rotation mechanism rests on the enumeration being
    identical in every fresh interpreter. Spawn a subprocess and compare
    its full ordering to ours; also pin the invariant that every query
    without a green CORRECTNESS row sits inside the front-50 window."""
    import glob
    import json as _json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from map_reduce_group_spark.plans import REGISTRY; "
        "import json; print(json.dumps(list(REGISTRY)))" % repo
    )
    sub = _json.loads(
        subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, check=True
        ).stdout
    )
    from map_reduce_group_spark.plans import REGISTRY

    assert sub == list(REGISTRY)

    recorded: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        with open(path) as fh:
            for name, row in _json.load(fh).items():
                ok = row.get("hash_match") is True or row.get("err") == "no_oracle"
                recorded[name] = recorded.get(name, 0) + (1 if ok else 0)
    zero = [n for n in sub if recorded.get(n, 0) == 0]
    late = [n for n in zero if sub.index(n) >= 50]
    assert not late, f"never-verified queries outside the driver's 50-query window: {late}"
