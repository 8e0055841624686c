"""Labeled bucket binning (SURVEY.md §2.8, F9/F15).

``pd.cut(vol, bins=[0,50,200,inf], labels=[...], right=False)`` at
TrafficAnalysis.py:354-356 — bins are LEFT-closed: [0,50) Low, [50,200)
Medium, [200,∞) High; negative or NULL input yields NULL (pd.cut out-of-range
→ NaN category).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def traffic_category(c: Column) -> Column:
    """F9: three-level volume bucket with pd.cut(right=False) edge semantics."""
    return (
        F.when(c.isNull() | (c < 0), F.lit(None).cast("string"))
        .when(c < 50, "Low")
        .when(c < 200, "Medium")
        .otherwise("High")
    )


def flag(cond: Column) -> Column:
    """F15: boolean expression → 0/1 int (ref TrafficAnalysis.py:386/:413)."""
    return cond.cast("int")
