"""Composite training-data pipeline queries: the end-to-end funnel a
pretraining corpus build runs — quality gate → language gate → exact dedup →
SimHash near-dup collapse → token budget — and the per-language training-mix
report over the survivors.

Each stage is an already-verified operator (functions/text.py,
operators/dedup.py); these queries prove the COMPOSITION holds end-to-end,
oracle-checked as one relational program. Every stage is a groupBy or a
per-row expression — no pair joins, no driver actions — so the funnel's cost
at 100 TB is a handful of shuffles on (text-hash, doc_id, simhash) keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import lang_guess, lexical_diversity, token_count
from ..operators.dedup import doc_token_sets, simhash16
from .registry import register

# SQL twins shared with the text/dedup oracles (same algorithms, same hashes)
from .queries_dedup import _SIMHASH_FP, _SIMHASH_VOTES
from .queries_text import _NSTOP_EN, _NSTOP_ES, _TOKS

_MIN_TOKENS = 5
_MIN_DIVERSITY = 0.3

_QUALITY_SQL = f"""
      len({_TOKS}) >= {_MIN_TOKENS}
      AND CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS}) >= {_MIN_DIVERSITY}
      AND ({_NSTOP_EN} + {_NSTOP_ES}) > 0
"""


def _quality_gate(text: Column) -> Column:
    """Keep prose-like docs: long enough, not boilerplate-repetitive, and
    with at least one known-language stopword hit (lang_guess != 'und' ⟺
    en_hits + es_hits > 0)."""
    return (
        (token_count(text) >= _MIN_TOKENS)
        & (lexical_diversity(text) >= _MIN_DIVERSITY)
        & (lang_guess(text) != "und")
    )


@register(
    "pipe1_pretrain_funnel",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, text FROM documents
      WHERE {_QUALITY_SQL}
    ), raw AS (
      SELECT COUNT(*) AS n_raw FROM documents
    ), nq AS (
      SELECT COUNT(*) AS n_quality FROM q
    ), exact AS (
      SELECT MIN(doc_id) AS doc_id, text FROM q GROUP BY text
    ), ne AS (
      SELECT COUNT(*) AS n_exact FROM exact
    ), tok AS (
      SELECT DISTINCT doc_id, unnest({_TOKS}) AS token FROM exact
    ), votes AS (
      SELECT doc_id,
             {_SIMHASH_VOTES}
      FROM tok GROUP BY doc_id
    ), fp AS (
      SELECT doc_id, CAST({_SIMHASH_FP} AS INT) AS simhash FROM votes
    ), grp AS (
      SELECT MIN(doc_id) AS keeper FROM fp GROUP BY simhash
    ), fin AS (
      SELECT COUNT(*) AS n_final,
             CAST(SUM(len({_TOKS.replace("text", "e.text")})) AS BIGINT) AS tokens_final
      FROM grp JOIN exact e ON e.doc_id = grp.keeper
    )
    SELECT n_raw, n_quality, n_exact, n_final, tokens_final
    FROM raw, nq, ne, fin
    """,
    tags=("pipeline", "dedup", "quality", "funnel"),
    tables=("documents",),
)
def pipe1_pretrain_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-build funnel as ONE relational program:

    raw → quality gate (≥5 tokens, lexical diversity ≥0.3, lang != und)
        → exact dedup (groupBy text, keeper = min doc_id)
        → SimHash-16 near-dup collapse (groupBy fingerprint, keeper = min)
        → survivor count + token budget.

    One row out: n_raw, n_quality, n_exact, n_final, tokens_final. The
    survivor-stage aggregates are single-row frames crossJoined back
    together — Spark broadcasts them, so no stage adds a driver action."""
    docs = spark.table("documents")
    stage1 = docs.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(_quality_gate(F.col("text")).cast("bigint")).alias("n_quality"),
    )
    q = docs.filter(_quality_gate(F.col("text")))
    exact = q.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    fp = simhash16(doc_token_sets(exact))
    keepers = fp.groupBy("simhash").agg(F.min("doc_id").alias("keeper"))
    fin = (
        keepers.join(exact, keepers.keeper == exact.doc_id)
        .agg(
            F.count(F.lit(1)).alias("n_final"),
            F.sum(token_count(F.col("text"))).cast("bigint").alias("tokens_final"),
        )
    )
    return (
        stage1.crossJoin(F.broadcast(n_exact))
        .crossJoin(F.broadcast(fin))
        .select("n_raw", "n_quality", "n_exact", "n_final", "tokens_final")
    )


@register(
    "pipe2_training_mix",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, text,
             CASE WHEN {_NSTOP_EN} >= {_NSTOP_ES} AND {_NSTOP_EN} > 0 THEN 'en'
                  WHEN {_NSTOP_ES} > {_NSTOP_EN} THEN 'es'
                  ELSE 'und' END AS lang_guess
      FROM documents
      WHERE {_QUALITY_SQL}
    ), exact AS (
      SELECT MIN(doc_id) AS doc_id, text, lang_guess FROM q GROUP BY text, lang_guess
    ), per_lang AS (
      SELECT lang_guess,
             COUNT(*) AS n_docs,
             CAST(SUM(len({_TOKS})) AS BIGINT) AS total_tokens
      FROM exact GROUP BY lang_guess
    ), tot AS (
      SELECT CAST(SUM(total_tokens) AS DOUBLE) AS all_tokens FROM per_lang
    )
    SELECT lang_guess, n_docs, total_tokens,
           ROUND(total_tokens / all_tokens, 6) AS token_share
    FROM per_lang, tot
    ORDER BY lang_guess
    """,
    tags=("pipeline", "mix", "lang"),
    tables=("documents",),
)
def pipe2_training_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language training-mix report over the quality-gated, exact-deduped
    corpus: docs, token budget, and each language's share of total tokens —
    the table a sampling-weights step consumes. Two groupBys plus a broadcast
    scalar; lang_guess rides the same scan as the gate."""
    docs = spark.table("documents")
    q = docs.filter(_quality_gate(F.col("text"))).select(
        "doc_id", "text", lang_guess(F.col("text")).alias("lang_guess")
    )
    exact = q.groupBy("text", "lang_guess").agg(F.min("doc_id").alias("doc_id"))
    per_lang = exact.groupBy("lang_guess").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text"))).cast("bigint").alias("total_tokens"),
    )
    tot = per_lang.agg(F.sum("total_tokens").cast("double").alias("all_tokens"))
    return (
        per_lang.crossJoin(F.broadcast(tot))
        .select(
            "lang_guess",
            "n_docs",
            "total_tokens",
            F.round(F.col("total_tokens") / F.col("all_tokens"), 6).alias("token_share"),
        )
        .orderBy("lang_guess")
    )
