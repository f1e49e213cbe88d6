"""As-of (point-in-time) join — an operator Spark lacks natively for batch.

Semantics: for each left row, attach the latest right row with
``right.ts <= left.ts`` within the same key (SURVEY §2B "as-of / interval
join"; MR realization: sort-merge within key group).

Implementation: the union + last(ignoreNulls) window pattern —

1. union left and right with a side tag (right sorts before left on ts ties
   so ``right.ts == left.ts`` matches);
2. one window pass per key ordered by (ts, side): ``last(right_payload,
   ignorenulls=True)`` over an unbounded-preceding frame carries the most
   recent right row forward;
3. keep the left rows.

Scale: exactly ONE shuffle (by key) + one in-partition sort — this is the
100 TB-friendly shape. The alternatives (broadcast range join, or a
per-key ``applyInPandas`` merge) either need a small side or pay Python
serialization; this stays entirely in the JVM. Skewed keys are handled by
AQE only at the shuffle, not the window — for a pathologically hot key,
pre-split by time bucket first.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import col


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row with right_ts <= left_ts per key.

    Right rows must be unique per (key, right_ts) — pre-aggregate if not,
    otherwise which duplicate wins is undefined (same as other engines'
    ASOF joins).
    """
    keys = [on] if isinstance(on, str) else list(on)
    payload_struct = F.struct(*[col(c) for c in right_payload])

    lhs = left.withColumn("__side", F.lit(1)).withColumn("__rp", F.lit(None).cast(
        right.select(payload_struct.alias("s")).schema["s"].dataType
    )).withColumn("__ts", col(left_ts))
    rhs = (
        right.select(*keys, col(right_ts).alias("__ts"), payload_struct.alias("__rp"))
        .withColumn("__side", F.lit(0))
    )
    # SQL ASOF equality never matches on NULL keys: drop null-key right rows
    # so null-key left rows fall through with a NULL payload (they share a
    # window partition, but it then contains no right rows).
    for k in keys:
        rhs = rhs.filter(col(k).isNotNull())

    # align columns for the union: left keeps all its columns; right rows
    # carry nulls for them
    left_cols = [c for c in left.columns]
    rhs_full = rhs.select(
        *[
            col(c) if c in keys else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left_cols
        ],
        "__side",
        "__rp",
        "__ts",
    )
    unioned = lhs.select(*left_cols, "__side", "__rp", "__ts").unionByName(rhs_full)

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn("__match", F.last("__rp", ignorenulls=True).over(w))

    out = matched.filter(col("__side") == 1).select(
        *left_cols,
        *[
            col("__match").getField(p).alias(f"{p}{suffix}")
            for p in right_payload
        ],
    )
    return out
