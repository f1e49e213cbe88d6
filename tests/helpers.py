"""DuckDB-oracle comparison harness (SURVEY §5.2).

Mirrors the driver's check: run the Spark query and the oracle SQL on the
same parquet, canonicalize (sort columns by name, stringify values with
fixed float formatting, sort rows), compare. Canonicalization lives HERE,
not in the engine (SURVEY §7 risk register item 2).
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pandas as pd

from map_reduce_group_spark.catalog import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canon_value(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        r = round(v, 6)
        return "0" if r == 0 else f"{r:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, (pd.Timestamp, datetime.datetime, datetime.date)):
        # datetime.date too: Spark DATE collects as date, DuckDB as
        # datetime64 — normalize both to the same midnight timestamp
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon_value(x) for x in seq) + "]"
    return str(v)


def dtype_skew(got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    """Columns where one engine yields integer dtype and the other float.

    The external driver stringifies values WITHOUT normalizing numeric
    dtype, so DuckDB's sum(INTEGER) -> HUGEINT -> pandas float64 ("413.0")
    hash-mismatches Spark's int64 ("413") even when values are equal
    (q12, CORRECTNESS_r02). Our rounded canon hides that class; this check
    surfaces it locally. Only the int-vs-float axis is flagged — other kind
    differences (date object vs datetime64) are normalized by the driver too
    (date-outputting queries pass its sweeps)."""
    bad = []
    for c in set(got.columns) & set(want.columns):
        a, b = got[c].dtype.kind, want[c].dtype.kind
        if {a, b} <= {"i", "u", "f"} and ("f" in (a, b)) != (a == b == "f"):
            bad.append(f"{c}: spark={got[c].dtype} oracle={want[c].dtype}")
    return bad


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_canon_value(v) for v in row))
    return sorted(out)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str, name: str = "") -> None:
    got_pdf = spark_df.toPandas()
    want_pdf = run_oracle(sql, sf_dir)
    # the driver compares schema as well as values (CLAUDE.md rule 4):
    # identical column NAMES, not just identically-ordered values
    assert sorted(got_pdf.columns) == sorted(want_pdf.columns), (
        f"{name}: column names differ: spark={sorted(got_pdf.columns)} "
        f"oracle={sorted(want_pdf.columns)}"
    )
    skew = dtype_skew(got_pdf, want_pdf)
    assert not skew, f"{name}: int-vs-float dtype skew (driver would HASH_FAIL): {skew}"
    got = canonicalize(got_pdf)
    want = canonicalize(want_pdf)
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    mismatches = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[:3]}"
