"""Declarative data-quality checks — the validation pass a pipeline runs
before publishing a table (dbt-test / Deequ-style, expressed as plain
aggregations so Catalyst prunes each check's scan to the columns it
touches).

Each check reduces to (check_name, violations, total, passed) — one row
per check, computed distributed and unioned. At 100 TB every check is a
single scan-aggregate (the FK check one broadcastable-or-shuffled
anti-join); nothing materializes violating ROWS unless you ask
(``violations_df`` returns them for quarantine, capped by the caller).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _result(name: str, violations: Column, total: Column) -> list[Column]:
    return [
        F.lit(name).alias("check_name"),
        violations.cast("long").alias("violations"),
        total.cast("long").alias("total"),
        (violations == 0).alias("passed"),
    ]


def check_unique(df: DataFrame, cols: list[str], name: str) -> DataFrame:
    """Violations = rows beyond the first per key (0 ⇔ key is unique)."""
    return df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n")).agg(
        *_result(name, F.sum(F.col("n") - 1), F.sum("n"))
    )


def check_not_null(df: DataFrame, col: str, name: str) -> DataFrame:
    return df.agg(
        *_result(
            name,
            F.count(F.lit(1)) - F.count(col),  # count(col) skips NULLs
            F.count(F.lit(1)),
        )
    )


def check_in_range(
    df: DataFrame, col: str, lo: float, hi: float, name: str
) -> DataFrame:
    """Semantic domain rule (e.g. a discount is a fraction): NULLs are not
    range violations — pair with check_not_null when both matter."""
    bad = F.when(
        F.col(col).isNotNull() & ~F.col(col).between(lo, hi), 1
    ).otherwise(0)
    return df.agg(*_result(name, F.sum(bad), F.count(F.lit(1))))


def check_foreign_key(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    name: str,
) -> DataFrame:
    """Orphaned children (anti-join against the parent key set). The parent
    side projects to its key column only, so the join build side is the
    DISTINCT parent keys — broadcastable for dimension parents.

    NULL child keys are NOT violations (standard SQL FK semantics: a null
    reference references nothing) — pair with ``check_not_null`` when an
    optional FK must also be present. ``total`` still counts all child rows."""
    orphans = child.filter(F.col(child_col).isNotNull()).select(
        F.col(child_col).alias("k")
    ).join(
        parent.select(F.col(parent_col).alias("k")).distinct(),
        "k",
        "left_anti",
    )
    total = child.agg(F.count(F.lit(1)).alias("n"))
    return orphans.agg(F.count(F.lit(1)).alias("v")).crossJoin(total).select(
        *_result(name, F.col("v"), F.col("n"))
    )


def run_checks(checks: list[DataFrame]) -> DataFrame:
    """Union per-check results into the validation report table."""
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def violations_df(df: DataFrame, bad: Column, limit: int = 1000) -> DataFrame:
    """The rows a check flagged, capped for quarantine/inspection — the
    companion to the aggregate report when a gate fails and someone needs
    to SEE the offending rows (capped: at 100 TB an unbounded violation
    dump can be the table)."""
    return df.filter(bad).limit(limit)
