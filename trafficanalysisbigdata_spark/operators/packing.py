"""Sequence packing — the pretraining step that turns a document corpus into
fixed-length training sequences (concat-then-chunk, GPT-style): documents are
hash-sharded, concatenated in deterministic order within each shard, and the
token stream is cut every ``seq_len`` tokens. Documents may straddle a cut —
that is the standard trade (no padding except each shard's final chunk).

Scale shape: the only non-trivial machinery is one window cumsum PER SHARD
(``sum(n_tokens) over (partition by shard order by doc_id)``). The shard
count is the parallelism dial — shards are independent, so at 100 TB you run
~10⁴ shards of a few GB each and every shard's running offset is one sorted
task; no global order, no driver state. Assignment is pure hash arithmetic
(md5-fraction, the pipe4 idiom), reproducible on any engine — the DuckDB
oracle runs the identical program.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count

_HEX_MOD = float(16**8)


def _hash_frac(col: Column) -> Column:
    """md5-first-8-hex-digits of the id, scaled to [0, 1) — deterministic,
    engine-portable shard randomization (same as pipe4's sampler)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) / F.lit(_HEX_MOD)


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign every document its packed position: (doc_id, shard, n_tokens,
    start_off, seq_id, end_seq, straddles).

    ``seq_id`` is the training sequence the document STARTS in
    (``floor(start_off / seq_len)``), ``end_seq`` the one it ends in;
    ``straddles`` marks documents cut by a sequence boundary.
    """
    shard = F.floor(_hash_frac(F.col(id_col)) * n_shards).cast("int")
    w = Window.partitionBy("shard").orderBy(id_col)
    out = docs.select(
        F.col(id_col), shard.alias("shard"), token_count(F.col(text_col)).alias("n_tokens")
    ).withColumn("start_off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "start_off",
        F.floor(F.col("start_off") / seq_len).cast("bigint").alias("seq_id"),
        F.floor((F.col("start_off") + F.col("n_tokens") - 1) / seq_len)
        .cast("bigint")
        .alias("end_seq"),
    ).withColumn("straddles", (F.col("end_seq") > F.col("seq_id")).cast("int"))
