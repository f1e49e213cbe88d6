#!/usr/bin/env python3
"""Replicate the sf0.1 fixtures N× with key offsets — the corpus behind
every SCALING.md measurement (10×/100× sweeps), now reproducible:

    python tools/scale_fixture.py /tmp/sf10x 10 documents lineitem orders

Replicated tables get their primary key offset by copy-index × (max+1) so
keys stay unique; every other table is symlinked unchanged. The documents
replication deliberately creates N-way EXACT-clone families (same text,
different doc_id) — the worst case for near-dup operators and the fixture
SCALING.md's dedup numbers are measured on.
"""

from __future__ import annotations

import os
import sys

import duckdb

BASE = "/root/testdata/sf0.1"
ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
# table -> (key column to offset, passthrough columns)
KEYED = {
    "documents": ("doc_id", ["text", "lang", "source", "n_chars"]),
    "orders": ("o_orderkey", ["o_custkey", "o_orderstatus", "o_totalprice",
                              "o_orderdate", "o_orderpriority"]),
    "lineitem": ("l_orderkey", ["l_partkey", "l_suppkey", "l_linenumber",
                                "l_quantity", "l_extendedprice", "l_discount",
                                "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"]),
    "events": ("event_id", ["ts", "user_id", "event_type", "value", "props"]),
    "embeddings": ("vec_id", ["embedding"]),
}


def main() -> None:
    if len(sys.argv) < 4:
        sys.exit(__doc__)
    out_dir, factor, tables = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    unknown = set(tables) - set(KEYED)
    if unknown:
        sys.exit(f"no replication recipe for: {sorted(unknown)} (have {sorted(KEYED)})")
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in tables:
        key, cols = KEYED[t]
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        (offset,) = con.execute(f"SELECT max({key})+1 FROM '{src}'").fetchone()
        collist = ", ".join([f"{key} + i*{offset} AS {key}"] + cols)
        if os.path.lexists(dst):
            os.remove(dst)
        con.execute(
            f"COPY (SELECT {collist} FROM '{src}' CROSS JOIN "
            f"(SELECT unnest(range({factor})) AS i)) TO '{dst}' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE 1048576)"
        )
        (n,) = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()
        print(f"{t}: {n} rows ({factor}x)")
    for t in ALL_TABLES:
        if t in tables:
            continue
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.lexists(dst):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), dst)
    print(f"fixture ready: {out_dir}")


if __name__ == "__main__":
    main()
