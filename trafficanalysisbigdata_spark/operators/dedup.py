"""Deduplication operators for the training-data pipeline surface.

Five strategies, ordered by cost/recall tradeoff:

* exact        — hash-groupBy on the full text (or its md5): one shuffle.
* minhash_lsh  — MinHash signatures over token sets, banded; only documents
                 sharing a band bucket are pair-compared. The scale path: at
                 100 TB the candidate join replaces the O(n²) all-pairs.
* simhash      — 16-bit sign-aggregated fingerprint; near-dups collide on the
                 fingerprint → dedup is a plain groupBy, no pair join at all.
* ngram_jaccard— bigram-shingle Jaccard with a shared-shingle candidate join.
* embedding    — cosine threshold over embedding vectors (see similarity.py).

Hashing is md5-based (not xxhash64) so every stage is reproducible in any
engine — the DuckDB oracles run the identical algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_fingerprint, token_bigrams, tokens


def exact_dedup_summary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup via groupBy(text): per-group keeper = min(doc_id)."""
    groups = docs.groupBy(text_col).agg(
        F.min("doc_id").alias("keeper"), F.count(F.lit(1)).alias("n_copies")
    )
    return groups.agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.sum("n_copies").cast("bigint").alias("n_docs"),
        (F.sum("n_copies") - F.count(F.lit(1))).cast("bigint").alias("n_dupes"),
        F.sum("keeper").cast("bigint").alias("keeper_id_sum"),
    )


def doc_token_sets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, token) distinct pairs — the set representation used by both
    MinHash and Jaccard verification."""
    return docs.select(
        "doc_id", F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token")
    )


def minhash_signatures(tok: DataFrame, num_perm: int = 8) -> DataFrame:
    """MinHash: permutation i ≈ lexicographic min of md5(i | token). One
    grouped pass computes all permutations (no per-perm scan)."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}|"), F.col("token")))).alias(f"mh_{i}")
        for i in range(num_perm)
    ]
    return tok.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(sig: DataFrame, num_perm: int = 8, rows_per_band: int = 2) -> DataFrame:
    """Band the signature and join docs sharing any band bucket. Output is
    distinct (doc1 < doc2) candidate pairs."""
    n_bands = num_perm // rows_per_band
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[
                                    F.col(f"mh_{b * rows_per_band + r}")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )


def jaccard_verify(pairs: DataFrame, tok: DataFrame, threshold: float) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs only: join each side's
    token set, count intersections, divide by union size."""
    sizes = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("set_size"))
    t1 = tok.withColumnRenamed("doc_id", "doc1")
    t2 = tok.withColumnRenamed("doc_id", "doc2")
    common = (
        pairs.join(t1, "doc1")
        .join(t2, ["doc2", "token"])
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    s1 = sizes.withColumnRenamed("doc_id", "doc1").withColumnRenamed("set_size", "size1")
    s2 = sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed("set_size", "size2")
    jacc = (
        common.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("size1") + F.col("size2") - F.col("n_common")),
        )
    )
    return jacc.filter(F.col("jaccard") >= threshold).select("doc1", "doc2", "jaccard")


def simhash16(tok: DataFrame) -> DataFrame:
    """16-bit SimHash per document.

    Bit j comes from the parity of hex digit j of md5(token): tokens vote ±1
    per bit, the sign of the vote sum is the bit. Near-duplicate documents
    (mostly shared tokens) land on identical fingerprints, so dedup becomes a
    groupBy on the fingerprint — no pair join anywhere.
    """
    h = F.md5("token")
    votes = [
        F.sum(
            F.when((F.instr(F.lit("0123456789abcdef"), F.substring(h, j + 1, 1)) - 1) % 2 == 1, 1)
            .otherwise(-1)
        ).alias(f"v_{j}")
        for j in range(16)
    ]
    sig = tok.groupBy("doc_id").agg(*votes)
    fp = None
    for j in range(16):
        bit = F.when(F.col(f"v_{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = bit if fp is None else fp + bit
    return sig.select("doc_id", fp.cast("int").alias("simhash"))


def doc_shingle_sets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) distinct token-bigram pairs for n-gram Jaccard."""
    return docs.select(
        "doc_id",
        F.explode(F.array_distinct(token_bigrams(F.col(text_col)))).alias("token"),
    )
