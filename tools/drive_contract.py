#!/usr/bin/env python3
"""Emulate the external driver: vanilla SparkSession (the driver's own
confs, NOT our session factory), entry() smoke at sf0.001, then every
queries() entry compared against its oracle_sql() via DuckDB — the real
correctness gate, runnable at any scale factor.

Usage: python tools/drive_contract.py [sf_dir]   (default sf0.01)
"""
import sys, time, math, datetime, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

# vanilla session, like an external harness would build — NOT get_session()
spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-emulation")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

import __spark_entry__ as e

df = e.entry(spark)
rows = df.collect()
print(f"ENTRY: {len(rows)} rows, schema={df.schema.simpleString()}")
assert len(rows) > 0

import duckdb, pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
qs, osql = e.queries(), e.oracle_sql()
print(f"{len(qs)} queries, {len(osql)} oracles")


def canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("N")
            elif isinstance(v, float):
                r = round(v, 6)
                vals.append("0" if r == 0 else f"{r:.6f}".rstrip("0").rstrip("."))
            elif isinstance(v, (pd.Timestamp, datetime.datetime)):
                vals.append(pd.Timestamp(v).isoformat())
            elif hasattr(v, "tolist"):
                vals.append(str(v.tolist()))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

fails = []
for name in sorted(qs):
    t0 = time.perf_counter()
    sdf = qs[name](spark, SF).toPandas()
    if name in osql:
        odf = con.execute(osql[name]).fetchdf()
        ok = canon(sdf) == canon(odf)
        status = "MATCH" if ok else "MISMATCH"
        if not ok:
            fails.append(name)
            g, w = canon(sdf), canon(odf)
            print(f"  rows spark={len(g)} duck={len(w)}")
            diff = [(a, b) for a, b in zip(g, w) if a != b][:2]
            print(f"  first diffs: {diff}")
    else:
        status = f"rows-only({len(sdf)})"
    print(f"{name:35s} {status:12s} {time.perf_counter()-t0:6.2f}s")

print("FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
