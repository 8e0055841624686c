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
