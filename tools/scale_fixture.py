#!/usr/bin/env python3
"""Replicate the sf0.1 fixtures N× with key offsets — the corpus behind
every SCALING.md measurement (10×/100× sweeps), now reproducible:

    python tools/scale_fixture.py /tmp/sf10x 10 documents lineitem orders

Replicated tables get their primary key offset by copy-index × (max+1) so
keys stay unique; every other table is symlinked unchanged.

Documents replication creates BOUNDED clone families: copies are grouped
into families of SCALE_FIXTURE_FAMILY (default 10, env-overridable; 0 =
unbounded, the old pure-clone behavior), and each family group g gets its
text passed through a per-group Caesar rotation of the alphabet
(translate), so copies within a group are EXACT clones while different
groups share (almost) no token and therefore no shingle. Rationale:
duplicate-family size in a real corpus does NOT grow with corpus size —
a fixture whose families are N-way at N× replication makes every
pair-family contract quadratic BY CONSTRUCTION (the r3 100× sweep's
ENOSPC on dedup_ngram_jaccard_capped, VERDICT r3 What's-wrong #2) and
measures fixture pathology, not operator scaling. With family=10 the 10×
fixture is bit-identical to the old behavior (one group), and the 100×
fixture holds family size at 10 while the corpus grows 100× — the shape a
100 TB corpus actually has. Rotation preserves token boundaries (the
tokenizer splits on [^a-z]+), token lengths, and n_chars, so every
text-statistics query sees the same per-document numbers.
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
    "embeddings": ("vec_id", ["embedding", "label"]),
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
    family = int(os.environ.get("SCALE_FIXTURE_FAMILY", "10"))
    for t in tables:
        key, cols = KEYED[t]
        src = os.path.join(BASE, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        (offset,) = con.execute(f"SELECT max({key})+1 FROM '{src}'").fetchone()
        if t == "documents" and family > 0 and factor > family:
            az = "abcdefghijklmnopqrstuvwxyz"
            AZ = az.upper()

            # per-group AFFINE alphabet permutation i -> (a·i + b) mod 26:
            # plain Caesar rotation (a=1) collides past 26 groups (g%26), so
            # a 1000x fixture would silently MERGE clone families (two groups
            # with the same rotation produce byte-identical texts). The 12
            # units of Z/26 × 26 shifts give 312 distinct permutations;
            # a=1 for g<26 keeps the 10x/100x fixtures bit-identical to the
            # historical rotation behavior. Token boundaries, lengths, and
            # n_chars are preserved exactly as before.
            mults = [1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25]

            def perm(s: str, g: int) -> str:
                a, b = mults[(g // 26) % len(mults)], g % 26
                return "".join(s[(i * a + b) % 26] for i in range(26))

            n_groups = (factor + family - 1) // family
            if n_groups > 26 * len(mults):
                sys.exit(
                    f"{n_groups} groups exceed the {26 * len(mults)} distinct "
                    "alphabet permutations — clone families would merge"
                )
            cases = " ".join(
                f"WHEN i // {family} = {g} THEN "
                f"translate(text, '{az}{AZ}', '{perm(az, g)}{perm(AZ, g)}')"
                for g in range(n_groups)
            )
            cols = [c if c != "text" else f"(CASE {cases} END) AS text" for c in cols]
        collist = ", ".join([f"{key} + i*{offset} AS {key}"] + cols)
        if os.path.lexists(dst):
            os.remove(dst)
        # SCALE_FIXTURE_ROW_GROUP: rows per parquet row group. The sf0.1
        # fixtures are single-row-group files, which a parquet reader cannot
        # split — every scan runs as ONE task and per-query scaling ratios
        # flatline at ≈1 (VERDICT r9 scaling block). Writing replicas with
        # bounded row groups makes scan parallelism REAL on the replica, so
        # optimization claims for the heavy family are falsifiable again.
        # 0 (default) keeps DuckDB-sized groups for bit-compatibility with
        # historical sweep fixtures.
        rg = int(os.environ.get("SCALE_FIXTURE_ROW_GROUP", "0")) or 1048576
        con.execute(
            f"COPY (SELECT {collist} FROM '{src}' CROSS JOIN "
            f"(SELECT unnest(range({factor})) AS i)) TO '{dst}' "
            f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
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
