#!/usr/bin/env python3
"""Scale-differential oracle sweep: run every oracle-checked query on a
REPLICATED fixture (tools/scale_fixture.py output) and hash-compare Spark
vs DuckDB there — the defense against coincidental fixture matches (a
query can MATCH at sf0.01 while computing the wrong statistic; the r2 BPE
pair-counting bug was exactly this class, caught only by eye).

Oracles whose SQL is inherently quadratic at scale (all-pairs joins) are
skipped with a SKIP line — their Spark sides have separate wall-ratio
measurements in SCALING.md; everything else gets full value verification.
A watchdog interrupts any DuckDB oracle running past --oracle-timeout so
one heavy CTE can't hang the sweep.

Usage: python tools/diff_scale.py [sf_dir=/tmp/sf10x] [name_prefix_filter]
(the filter accepts a comma-separated list of prefixes; a fragment ending
in "$" requires an exact name match; empty fragments are ignored)
"""
from __future__ import annotations

import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

from tests.helpers import TABLES, canonicalize, dtype_skew  # noqa: E402

# The r1-r3 skip list is EMPTY as of round 4 (VERDICT r3 #3). What changed:
# tools/scale_fixture.py now replicates documents into BOUNDED clone families
# (10-way at any factor, per-group alphabet rotation) — duplicate-family size
# in a real corpus does not grow with corpus size, and the unbounded families
# made every pair contract quadratic BY CONSTRUCTION (the r3 ENOSPC). On the
# bounded fixture the pair graph, the cluster CTE, and the contamination join
# all stay linear in the corpus. Queries whose DRIVER oracle is deliberately
# naive/all-pairs (that naivety is itself the losslessness check at sf0.01)
# get a value-identical pruned stand-in at scale via plans/llm.SCALE_ORACLES.
SKIP_AT_SCALE: set[str] = set()


def run_oracle_guarded(sql: str, sf_dir: str, timeout_s: float) -> "object":
    con = duckdb.connect()
    try:
        # bound DuckDB below what the Spark JVM leaves free and give it a
        # spill dir — the default (80% of RAM, no temp dir for :memory:
        # connections) dies with "bad allocation" next to a 48g driver
        con.execute(f"SET memory_limit='{os.environ.get('DIFF_DUCK_MEM', '40GB')}'")
        # optional throttle so a multi-hour 1000x oracle can run alongside
        # other work without saturating the host (default: all cores)
        if os.environ.get("DIFF_DUCK_THREADS"):
            con.execute(f"SET threads={int(os.environ['DIFF_DUCK_THREADS'])}")
        # PER-PROCESS spill dir: two concurrent harness runs sharing one
        # temp_directory clash on DuckDB's temp-file names and read each
        # other's spilled blocks — observed as a bogus INT64-overflow with
        # (k<<56)-patterned garbage operands during a concurrent sweep
        spill = f"/tmp/duck_spill/{os.getpid()}"
        os.makedirs(spill, exist_ok=True)
        con.execute(f"SET temp_directory='{spill}'")
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        try:
            return con.execute(sql).fetchdf()
        finally:
            timer.cancel()
    finally:
        con.close()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10x"
    # drop empty fragments so a stray trailing comma can't widen the filter
    # to every query (startswith("") matches everything); no filter at all
    # still means "run all"
    raw = sys.argv[2] if len(sys.argv) > 2 else ""
    prefixes = tuple(p for p in raw.split(",") if p) or ("",)
    oracle_timeout = float(os.environ.get("DIFF_ORACLE_TIMEOUT", "240"))

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("diff-scale")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("DIFF_DRIVER_MEM", "48g"))
        # the harness COLLECTS full result sets for value comparison — at a
        # replicated 100x fixture a pair-family query's result alone can
        # exceed the 1g default (simhash at 100x: 1.2 GiB of task results)
        .config("spark.driver.maxResultSize", os.environ.get("DIFF_MAX_RESULT", "16g"))
        # the replicated fixtures are SINGLE parquet files; at 10×/100× the
        # default 128 MB split width gives the scan only 3-4 input
        # partitions, so tokenize-heavy map stages ran on 3 of 32 cores
        # (r8 profiling). 32 MB restores scan parallelism at small decades
        # without touching product sessions.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("DIFF_MAX_PART_BYTES", str(32 * 1024 * 1024)),
        )
        .getOrCreate()
    )
    import __spark_entry__ as e
    from map_reduce_group_spark.plans.llm import SCALE_ORACLES

    qs, osql = e.queries(), e.oracle_sql()
    osql.update(SCALE_ORACLES)  # value-identical pruned stand-ins at scale
    fails, skips, errs = [], [], []
    for name in qs:
        selected = any(
            name == p[:-1] if p.endswith("$") else name.startswith(p)
            for p in prefixes
        )
        if not selected or name not in osql:
            continue
        if name in SKIP_AT_SCALE:
            print(f"{name:36s}SKIP (all-pairs oracle; see SCALING.md)", flush=True)
            skips.append(name)
            continue
        t0 = time.perf_counter()
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            t_spark = time.perf_counter() - t0
            # flush the engine measurement BEFORE the oracle phase: at
            # 1000x some oracles are intractable by design, and an
            # ORACLE_TIMEOUT row must still record the Spark wall
            print(
                f"{name:36s}spark done rows={len(sdf)}  spark={t_spark:.1f}s"
                "  (oracle running...)",
                flush=True,
            )
            t0 = time.perf_counter()
            ddf = run_oracle_guarded(osql[name], sf_dir, oracle_timeout)
            t_duck = time.perf_counter() - t0
        except KeyboardInterrupt:
            raise
        except Exception as exc:
            msg = (str(exc).splitlines() or [repr(exc)])[0][:160]
            # typed check, not message-substring (ADVICE r3): a DuckDB
            # wording change must not misfile timeouts as hard errors
            kind = (
                "ORACLE_TIMEOUT"
                if isinstance(exc, duckdb.InterruptException)
                else "ERR"
            )
            print(f"{name:36s}{kind}: {msg}", flush=True)
            (skips if kind == "ORACLE_TIMEOUT" else errs).append(name)
            continue
        skew = dtype_skew(sdf, ddf)
        ok = (
            canonicalize(sdf) == canonicalize(ddf)
            and sorted(sdf.columns) == sorted(ddf.columns)
            and not skew
        )
        status = "MATCH" if ok else "MISMATCH"
        if not ok:
            fails.append(name)
        print(
            f"{name:36s}{status:10s}rows={len(sdf)}  spark={t_spark:.1f}s duck={t_duck:.1f}s",
            flush=True,
        )
    print(f"FAILURES: {fails or 'none'}")
    print(f"ERRORS: {errs or 'none'}")
    print(f"SKIPPED: {len(skips)}")


if __name__ == "__main__":
    main()
