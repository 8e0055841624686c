"""Similarity search over embedding columns (``array<float>``).

Two tiers:

* ``brute_force_topk`` — exact cosine top-k. The probe set is broadcast, so
  cost is |probes| × |corpus| dot products with zero shuffle of the corpus;
  fine for interactive k-NN at any corpus size when |probes| is small.
* ``lsh_topk`` — random-hyperplane LSH: sign-bit signatures bucket the
  corpus; probes only score candidates sharing a bucket. The scale path for
  probe sets too large to cross-join — candidate generation is an equi-join
  on the bucket key. Hyperplanes are derived deterministically (md5 of
  (plane, dimension)) so results are reproducible without a stored model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def brute_force_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each probe (self-matches excluded).

    Ranking happens on the ROUNDED cosine with an id tie-break, so the result
    set is stable under float reassociation across engines/partitionings.
    """
    p = probes.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    scored = (
        c.crossJoin(F.broadcast(p))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("query_vec"), F.col("vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def _hyperplane(plane: int, dim: int) -> F.Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    md5-derived, engine-independent, no stored state."""
    h = F.md5(F.lit(f"plane{plane}|dim{dim}"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(float(16**8))) - 0.5


def signatures(df: DataFrame, n_planes: int, dim: int, vec_col: str = "embedding") -> DataFrame:
    """Sign-bit LSH signature: bit p = (v · plane_p) >= 0."""
    sig = None
    v = F.col(vec_col)
    for p in range(n_planes):
        d = None
        for i in range(dim):
            term = F.get(v, i).cast("double") * _hyperplane(p, i)
            d = term if d is None else d + term
        bit = F.when(d >= 0, F.lit(1 << p)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return df.withColumn("bucket", sig.cast("int"))


def lsh_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates in the probe's bucket."""
    c = signatures(corpus, n_planes, dim, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"), "bucket"
    )
    p = signatures(probes, n_planes, dim, vec_col).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"), "bucket"
    )
    scored = (
        c.join(p, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("query_vec"), F.col("vec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def threshold_pairs(
    corpus: DataFrame, threshold: float, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """All-pairs cosine ≥ threshold (embedding near-dup detection). O(n²) —
    the correctness baseline; the LSH bucket join above is the scale path."""
    a = corpus.select(F.col(id_col).alias("id1"), F.col(vec_col).alias("v1"))
    b = corpus.select(F.col(id_col).alias("id2"), F.col(vec_col).alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select("id1", "id2", F.round(cosine(F.col("v1"), F.col("v2")), 6).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
