#!/usr/bin/env python3
"""Check a handful of named queries against their oracles (fast inner loop
for new-operator work — same canonicalization as tools/drive_contract.py).

Usage: python tools/check_one.py name [name ...] [--sf DIR]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

args = []
sf = "/root/testdata/sf0.01"
_argv = sys.argv[1:]
i = 0
while i < len(_argv):
    if _argv[i] == "--sf":
        sf = _argv[i + 1]
        i += 2
    elif not _argv[i].startswith("--"):
        args.append(_argv[i])
        i += 1
    else:
        i += 1

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("check-one")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import __spark_entry__ as e
from tests.helpers import canonicalize, dtype_skew, run_oracle

qs, osql = e.queries(), e.oracle_sql()
fails = []
for name in args:
    t0 = time.perf_counter()
    sdf = qs[name](spark, sf).toPandas()
    if name not in osql:
        print(f"{name:35s} rows-only({len(sdf)}) {time.perf_counter()-t0:6.2f}s")
        continue
    ddf = run_oracle(osql[name], sf)
    got, want = canonicalize(sdf), canonicalize(ddf)
    skew = dtype_skew(sdf, ddf)
    ok = got == want and sorted(sdf.columns) == sorted(ddf.columns) and not skew
    status = ("VACUOUS(0=0)" if ok and not got else "MATCH") if ok else "MISMATCH"
    print(f"{name:35s} {status:12s} rows={len(got)}/{len(want)} {time.perf_counter()-t0:6.2f}s")
    if not ok:
        fails.append(name)
        if skew:
            print(f"  dtype skew: {skew}")
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"  cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}")
        if len(got) == len(want):
            print("  first diffs:", [(a, b) for a, b in zip(got, want) if a != b][:3])
        else:
            ws = set(want)
            gs = set(got)
            print("  spark-only:", [r for r in got if r not in ws][:3])
            print("  duck-only:", [r for r in want if r not in gs][:3])

print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
