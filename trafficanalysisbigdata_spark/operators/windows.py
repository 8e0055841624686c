"""Window-function operators (SURVEY.md §2.5).

The reference has no window computations; these are the idiomatic Spark forms
of its closest shapes — "peak hour per street" is top-1-per-group (F17), the
latest-date filter (P7) is a max-over-window — plus the standard analytics
the engine exposes as first-class surface: ranking, lag/lead deltas, rolling
means, running totals.

Scale note: a window with ``partitionBy`` shuffles once on the partition keys
and sorts within partitions — same cost envelope as a groupBy. Windows
WITHOUT partitionBy (global order) funnel everything into one task; the only
one used here operates on an already-aggregated daily series (≤ one row per
day), never on raw facts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame, part_cols: list[str], order_col: str, tie_breakers: list[str], n: int
) -> DataFrame:
    """Top-n rows per group via row_number — the distributed form of the
    reference's per-street argmax (F17, ref proto:210)."""
    w = Window.partitionBy(*part_cols).orderBy(
        F.desc(order_col), *[F.asc(c) for c in tie_breakers]
    )
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n)
        .drop("rn")
    )


def lag_delta(df: DataFrame, order_col: str, value_col: str, alias: str) -> DataFrame:
    """Period-over-period delta on an (already aggregated) ordered series."""
    w = Window.orderBy(order_col)
    return df.withColumn(alias, F.col(value_col) - F.lag(value_col, 1).over(w))


def rolling_mean(
    df: DataFrame, order_col: str, value_col: str, n_rows: int, alias: str
) -> DataFrame:
    """Trailing n-row mean over an ordered series, computed as exact-sum ÷
    count so the result is engine-independent."""
    w = Window.orderBy(order_col).rowsBetween(-(n_rows - 1), 0)
    return df.withColumn(
        alias,
        F.sum(F.col(value_col).cast("decimal(18,6)")).over(w).cast("double")
        / F.count(value_col).over(w),
    )


def running_total(
    df: DataFrame, part_cols: list[str], order_cols: list[str], value_col: str, alias: str
) -> DataFrame:
    """Cumulative sum per partition (exact decimal, emitted double)."""
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        alias, F.sum(F.col(value_col).cast("decimal(18,6)")).over(w).cast("double")
    )
