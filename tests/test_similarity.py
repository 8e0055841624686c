"""LSH ANN quality: sim3 has no SQL oracle (hex-conv hyperplanes), so its
check is recall against the exact brute-force top-k."""

from __future__ import annotations

from pyspark.sql import functions as F

from trafficanalysisbigdata_spark.io import register_views
from trafficanalysisbigdata_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    signatures,
)
from trafficanalysisbigdata_spark.session import prep


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    prep(spark)
    register_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings")
    probes = emb.filter(F.col("vec_id") < 10)

    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, probes, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id) for r in lsh_topk(emb, probes, k=5).collect()
    }
    # near-random corpus + 8-bit buckets: expect modest but nonzero recall,
    # and every approx neighbor must come from the right bucket (sanity).
    assert len(approx) > 0
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.05, f"LSH recall suspiciously low: {recall}"


def test_lsh_buckets_deterministic(spark, sf_dir):
    prep(spark)
    register_views(spark, sf_dir, "embeddings")
    emb = spark.table("embeddings").limit(50)
    b1 = {r.vec_id: r.bucket for r in signatures(emb, 8, 64).collect()}
    b2 = {r.vec_id: r.bucket for r in signatures(emb, 8, 64).collect()}
    assert b1 == b2
    assert 0 <= min(b1.values()) and max(b1.values()) < 256
