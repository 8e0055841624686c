"""As-of (most-recent-prior) join — a custom operator Spark lacks built-in.

For each left row, attach the latest right row whose timestamp is ≤ the left
timestamp (optionally within matching partition keys). Implemented as the
scalable union+window trick, NOT a correlated subquery or a range cross-join:

1. tag both sides and union their (key, ts) streams;
2. one window pass sorted by (key, ts, side) carries the last-seen right
   payload forward (``last(..., ignorenulls=True)``);
3. keep the left rows.

Cost: one shuffle on (key), one sort within partitions — the same price as a
sort-merge join, with no data-dependent blowup. This is the idiomatic
DataFrame expression of pandas ``merge_asof`` and kdb ``aj``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: list[str] | None = None,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Attach, to each ``left`` row, the ``value_cols`` of the most recent
    ``right`` row with ``right.right_ts <= left.left_ts`` (ties: right wins —
    a right row at exactly the left timestamp matches)."""
    by = by or []
    value_cols = value_cols or [c for c in right.columns if c != right_ts and c not in by]

    lhs = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rhs = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
    )
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    for c in rhs.columns:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None))
    unioned = lhs.unionByName(rhs)

    # Right rows sort before left rows at the same __ts (side 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row.
    w = (
        Window.partitionBy(*by)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    for c in value_cols:
        filled = filled.withColumn(
            f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w)
        )
    return filled.filter(F.col("__side") == 1).drop("__ts", "__side")
