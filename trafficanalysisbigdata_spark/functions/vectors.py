"""Vector (embedding) column math over ``array<float>`` columns.

Pure Catalyst lambdas — zip_with for elementwise product, aggregate for the
reduction — so the dot product runs JVM-side inside codegen, no Python. The
fold order is array order, which makes the float result deterministic and
engine-comparable (rounded at the boundary).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = as_double(a), as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def cosine_prenorm(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Pair cosine with per-row precomputed norms (``norm(as_double(v))``).

    Scoring n_pairs candidates with ``cosine()`` folds THREE array reductions
    per pair (dot + both norms); carrying each row's norm through the join
    leaves one fold per pair — ~3× less interpreted-lambda work (these
    higher-order folds are CodegenFallback). The norm value is the identical
    expression either way, so results are bit-identical to ``cosine()``.
    """
    return dot(as_double(a), as_double(b)) / (na * nb)
