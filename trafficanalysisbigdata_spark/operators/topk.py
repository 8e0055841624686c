"""Sort / limit / top-k operators (SURVEY.md §2.6, T1–T4).

``orderBy(desc).limit(k)`` compiles to ``TakeOrderedAndProject`` — each task
keeps a k-row heap and the driver merges #partitions × k rows, so top-k never
global-sorts the data. Every top-k carries a deterministic tie-break so
results are stable under any partitioning (and match a single-node oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_col: str, k: int, tie_breakers: list[str]) -> DataFrame:
    """T1–T3 (ref TrafficAnalysis.py:272, Dash.py:196, proto:218):
    sort-desc then head(k) / nlargest(k)."""
    keys: list[Column] = [F.desc(order_col)] + [F.asc(c) for c in tie_breakers]
    return df.orderBy(*keys).limit(k)


def argmax_row(df: DataFrame, order_col: str, tie_breakers: list[str]) -> DataFrame:
    """T4 (ref proto:316 idxmax()): the single max row."""
    return top_k(df, order_col, 1, tie_breakers)
