"""Similarity-search queries over ``embeddings`` (array<float>, dim 64)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import brute_force_topk, lsh_topk, threshold_pairs
from .registry import register


@register(
    "sim1_ann_topk_bruteforce",
    oracle="""
    WITH probes AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS query_vec FROM embeddings WHERE vec_id < 10
    ), scored AS (
      SELECT p.query_id, e.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(p.query_vec, CAST(e.embedding AS DOUBLE[])), 6) AS cos
      FROM embeddings e CROSS JOIN probes p
      WHERE e.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cos FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos DESC, neighbor_id) AS rn
      FROM scored
    ) t WHERE rn <= 5
    """,
    tags=("similarity", "ann"),
    tables=("embeddings",),
)
def sim1_ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for 10 probe vectors: probes broadcast over the
    corpus scan (no corpus shuffle), ranking on rounded cosine for stability.
    The dot product is a Catalyst zip_with/aggregate lambda — JVM-side."""
    emb = spark.table("embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, probes, k=5)


@register(
    "sim2_embedding_neardup_pairs",
    oracle="""
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
    """,
    tags=("similarity", "dedup", "embedding"),
    tables=("embeddings",),
)
def sim2_embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (threshold 0.3 for this near-random
    corpus). All-pairs is the correctness baseline; sim3's LSH bucketing is
    the scale path."""
    return threshold_pairs(spark.table("embeddings"), threshold=0.3)


@register(
    "sim3_ann_topk_lsh",
    oracle=None,  # hyperplane derivation uses conv(hex) — not expressible in
    # the oracle dialect; recall vs sim1 is asserted in tests/test_similarity.py
    tags=("similarity", "ann", "lsh"),
    tables=("embeddings",),
)
def sim3_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-k: probes only score candidates sharing an
    8-bit sign-signature bucket (~1/256 of the corpus per probe). The
    candidate generation is an equi-join on the bucket key — the shape that
    survives a 100 TB corpus where the brute-force cross join cannot."""
    emb = spark.table("embeddings")
    probes = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, probes, k=5, n_planes=8, dim=64)
