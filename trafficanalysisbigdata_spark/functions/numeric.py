"""Numeric helpers for oracle-exact, order-independent aggregation.

Double-precision sums depend on addition order, which differs between Spark's
partial/final aggregation tree and any single-node oracle — and between runs
once partitioning changes. For measures that are low-precision reals (prices,
quantities: ≤2 decimal digits in the fixtures), summing DECIMAL(18,6) casts is
exact and associative, so results are bit-identical at any parallelism. This is
also the right call at 100 TB: decimal aggregation costs a constant factor but
makes results reproducible across cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dec(c: Column | str) -> Column:
    """Cast a measure to the engine's exact-aggregation decimal type."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


def sum_exact(c: Column | str, alias: str) -> Column:
    """Exact decimal sum emitted as DOUBLE.

    The decimal accumulation is order-independent; the final cast to double is
    a single deterministic conversion, so the emitted float is bit-identical
    across engines and cluster sizes (a raw double sum is neither). DECIMAL
    stays internal — boundaries speak float64 so downstream consumers (pandas,
    Arrow, the oracle harness) agree on dtype.
    """
    return F.sum(dec(c)).cast("double").alias(alias)


def avg_exact(c: Column | str, alias: str) -> Column:
    """Average as exact-decimal sum ÷ count, emitted as DOUBLE.

    Spark's avg(decimal) widens scale differently from other engines; dividing
    the exact sum by the exact count as doubles is a single IEEE operation and
    therefore reproducible anywhere.
    """
    col = F.col(c) if isinstance(c, str) else c
    return (F.sum(dec(col)).cast("double") / F.count(col)).alias(alias)


def round6(c: Column, alias: str) -> Column:
    """Round an inherently-floating statistic (stddev, corr, percentile) so
    last-ulp differences between algorithms don't break value-hash equality."""
    return F.round(c, 6).alias(alias)
