"""Deterministic numeric aggregation policy.

Cross-engine float determinism rules (learned the hard way against the
DuckDB oracle; see tests/helpers.py):

1. **Never round() a double whose true decimal expansion has a '5' at the
   cut position.** Spark rounds the value's shortest decimal string
   (BigDecimal.valueOf), DuckDB rounds the binary value scaled by 10^k —
   they disagree on exactly those values, and 2-decimal money data hits
   them constantly (x.5 at the 3rd decimal after sums/avgs).
2. **Never sum doubles when the result must hash-match another engine.**
   Partial-aggregation order differs; the last ulp differs.

Policy: the fixture's money-like columns are exactly 2-decimal, so cast to
DECIMAL before aggregating — sums become EXACT — and cast the final result
back to double (exact → nearest-double is deterministic and identical on
both engines). No rounding anywhere. Per-row arithmetic on identical
doubles is already bit-identical across engines as long as the expression
shape (associativity) matches.

At 100 TB this is also the *correct* accounting choice: decimal partial
aggregation is exact and overflow-checked at any scale, while double sums
silently drift with partition count.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

MONEY = "decimal(12,2)"  # fits ±10^10 with 2-decimal money values, exactly
RATE = "decimal(3,2)"  # discount/tax rates in [0,1), 2-decimal


def money(c: Column | str) -> Column:
    """Exact decimal view of a 2-decimal money double."""
    return (F.col(c) if isinstance(c, str) else c).cast(MONEY)


def rate(c: Column | str) -> Column:
    return (F.col(c) if isinstance(c, str) else c).cast(RATE)


def dec2double(c: Column) -> Column:
    """Decimal → double via the decimal STRING: IEEE-754 string parsing is
    correctly rounded on every engine, whereas direct decimal→double casts
    double-round once the value exceeds ~15 significant digits (observed: a
    1-ulp q1 divergence at a 2.8e11 sum over 60M rows)."""
    return c.cast("string").cast("double")


def dsum(c: Column | str) -> Column:
    """Exact sum of a 2-decimal money column, returned as double."""
    return dec2double(F.sum(money(c)))


def dsum_expr(expr: Column) -> Column:
    """Exact sum of an already-decimal expression, returned as double."""
    return dec2double(F.sum(expr))


def davg(c: Column | str) -> Column:
    """Deterministic average: exact decimal sum, then one double division
    (identical operands ⇒ identical quotient on every IEEE-754 engine)."""
    return dec2double(F.sum(money(c))) / F.count(F.col(c) if isinstance(c, str) else c)


#: Default display scale for fixed-point ratios (6 decimals, matching the
#: former round(x, 6) presentation columns).
FP6 = 1_000_000


def fp_ratio(num_sql: str, den_sql: str, scale: int = FP6) -> Column:
    """Display ratio ``num/den`` in 1/``scale`` integer fixed point — the
    rule-1 replacement for ``F.round(num/den, k)`` on integer inputs.

    ``(num*scale) div den`` is exact integer arithmetic (truncation toward
    zero, identical on every engine for the non-negative counts these
    display columns hold), then one exact int→double cast and one division
    by a power of ten — no decimal rounding step anywhere, so the
    Spark-BigDecimal-HALF_UP vs DuckDB-scaled-binary divergence class
    (module docstring, rule 1) cannot arise. Arguments are SQL fragments
    resolved against the frame (struct field paths allowed). The numerator
    is widened to BIGINT before ×scale: int-typed inputs (rank(), count()
    over a window partition, …) overflow int32 under ANSI the moment
    num > ~2147 at scale 10⁶ — hit by window_distribution_functions at
    sf0.1 (r9). Numerator must stay within int64 after ×scale — callers
    with corpus-scale counts use :func:`fp_ratio_dec38` instead.
    """
    return (
        F.expr(f"(CAST(({num_sql}) AS BIGINT) * {scale}) div ({den_sql})").cast(
            "double"
        )
        / float(scale)
    )


def sql_fp_ratio(num_sql: str, den_sql: str, scale: int = FP6) -> str:
    """DuckDB twin of :func:`fp_ratio` (``//`` == floor division ≡
    truncation for the non-negative inputs these sites hold)."""
    return f"(CAST((({num_sql}) * {scale}) // ({den_sql}) AS DOUBLE) / {scale}.0)"


def fp_ratio_dec38(num_sql: str, den_sql: str, scale: int = FP6) -> Column:
    """:func:`fp_ratio` with DECIMAL(38,0) numerator headroom, for
    numerators that are corpus-scale counts (×scale brushes int64 past
    ~10¹² rows)."""
    return (
        F.expr(
            f"CAST(CAST(({num_sql}) AS DECIMAL(38,0)) * {scale} AS DECIMAL(38,0))"
            f" div ({den_sql})"
        ).cast("double")
        / float(scale)
    )


def sql_fp_ratio_dec38(num_sql: str, den_sql: str, scale: int = FP6) -> str:
    """DuckDB twin of :func:`fp_ratio_dec38` (sum(BIGINT) is already
    HUGEINT in DuckDB, so plain ``//`` carries the headroom)."""
    return f"(CAST((({num_sql}) * {scale}) // ({den_sql}) AS DOUBLE) / {scale}.0)"


def fp_floor(c: Column, scale: int = FP6) -> Column:
    """Engine-symmetric fixed-point display for a genuinely-float value:
    ``floor(x·scale)/scale``.

    Why this is safe where ``round(x, k)`` is not: the round hazard
    (module docstring) is that Spark rounds the value's *shortest decimal
    string* while DuckDB rounds the *binary* value scaled by 10^k — two
    different functions of the same double. ``floor`` has no decimal
    detour: both engines apply IEEE floor to the bit-identical product
    ``x·scale`` (one IEEE multiply of identical operands), so the result
    is identical whenever the input doubles are — which the callers
    guarantee by computing ``x`` with the same expression shape on both
    sides. Use only when the value is irreducibly float (e.g. a min over
    ratios of arbitrary weights); prefer :func:`fp_ratio` for integer
    numerator/denominator."""
    return F.floor(c * scale).cast("double") / float(scale)


def sql_fp_floor(expr: str, scale: int = FP6) -> str:
    """DuckDB twin of :func:`fp_floor`."""
    return f"(floor(({expr}) * {scale}) / {scale}.0)"


# Oracle-side (DuckDB SQL) fragments implementing the same policy.
def sql_dsum(col: str) -> str:
    return f"CAST(CAST(sum(CAST({col} AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)"


def sql_davg(col: str) -> str:
    return (
        f"(CAST(CAST(sum(CAST({col} AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)"
        f" / count({col}))"
    )
