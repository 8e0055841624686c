"""Set-operation queries (SURVEY.md §2.7): cohort algebra over ``events`` —
purchasers vs clickers as UNION / INTERSECT / EXCEPT, one summary row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.setops import except_distinct, intersect_distinct, union_distinct
from .registry import register


@register(
    "set1_cohort_algebra",
    oracle="""
    WITH buyers AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ), clickers AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    )
    SELECT (SELECT COUNT(*) FROM (SELECT user_id FROM buyers
                                  UNION SELECT user_id FROM clickers)) AS n_union,
           (SELECT COUNT(*) FROM (SELECT user_id FROM buyers
                                  INTERSECT SELECT user_id FROM clickers)) AS n_both,
           (SELECT COUNT(*) FROM (SELECT user_id FROM buyers
                                  EXCEPT SELECT user_id FROM clickers)) AS n_buy_only,
           (SELECT COUNT(*) FROM (SELECT user_id FROM clickers
                                  EXCEPT SELECT user_id FROM buyers)) AS n_click_only
    """,
    tags=("setops", "cohort"),
    tables=("events",),
)
def set1_cohort_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort set algebra: purchasers ∪/∩/∖ clickers, counted. Each set op
    runs on the DISTINCT single-column user projection — the shuffles move
    8-byte ids, and intersect/except compile to semi/anti joins."""
    ev = spark.table("events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()

    def _n(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias(name))

    return (
        _n(union_distinct(buyers, clickers), "n_union")
        .crossJoin(F.broadcast(_n(intersect_distinct(buyers, clickers), "n_both")))
        .crossJoin(F.broadcast(_n(except_distinct(buyers, clickers), "n_buy_only")))
        .crossJoin(F.broadcast(_n(except_distinct(clickers, buyers), "n_click_only")))
    )


@register(
    "set2_multiset_algebra",
    oracle="""
    WITH a AS (
      SELECT user_id FROM events WHERE event_type = 'purchase'
    ), b AS (
      SELECT user_id FROM events WHERE event_type = 'click'
    ), ia AS (
      SELECT user_id FROM a INTERSECT ALL SELECT user_id FROM b
    ), ea AS (
      SELECT user_id FROM a EXCEPT ALL SELECT user_id FROM b
    )
    SELECT (SELECT COUNT(*) FROM ia) AS n_intersect_all,
           (SELECT COUNT(*) FROM ea) AS n_except_all,
           (SELECT CAST(COALESCE(SUM(user_id), 0) AS BIGINT) FROM ea)
             AS except_id_sum
    """,
    tags=("setops", "multiset"),
    tables=("events",),
)
def set2_multiset_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set algebra — the ALL forms set1's DISTINCT algebra cannot
    express: INTERSECT ALL keeps min(n_a, n_b) copies per value, EXCEPT ALL
    keeps the excess n_a - n_b. The bag forms are what event-ledger
    reconciliation needs ('how many purchase events lack a matching click
    event', counting MULTIPLICITY) — a distinct-based diff would report a
    user once no matter how lopsided their counts.

    Scale posture: Spark plans intersectAll/exceptAll as per-side count
    aggregates + a generate over the count delta — the shuffle carries
    (value, count) pairs, never multiplicity-expanded rows, so a key with
    a million duplicates costs one row in flight. The id-sum fold makes
    the multiset CONTENT (not just its size) hash-checked."""
    from ..operators.setops import except_all, intersect_all

    ev = spark.table("events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "click").select("user_id")
    ia = intersect_all(a, b)
    ea = except_all(a, b)
    return (
        ia.agg(F.count(F.lit(1)).alias("n_intersect_all"))
        .crossJoin(
            F.broadcast(
                ea.agg(
                    F.count(F.lit(1)).alias("n_except_all"),
                    F.coalesce(F.sum("user_id"), F.lit(0))
                    .cast("bigint")
                    .alias("except_id_sum"),
                )
            )
        )
        .select("n_intersect_all", "n_except_all", "except_id_sum")
    )
