"""Top-k queries (SURVEY.md §2.6, T1–T4) on the driver fixtures."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import avg_exact, dec, sum_exact
from ..operators.topk import argmax_row, top_k
from .registry import register


@register(
    "t2_top10_parts_by_revenue",
    oracle="""
    SELECT l_partkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM lineitem GROUP BY l_partkey
    ORDER BY revenue DESC, l_partkey LIMIT 10
    """,
    tags=("topk", "T1", "T2"),
    tables=("lineitem",),
)
def t2_top10_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 top-10 busiest streets analog (ref TrafficAnalysis.py:265-281):
    groupBy-sum then sort-desc-limit (TakeOrderedAndProject, no global sort).

    The discount multiply happens in double (same IEEE op as the oracle), the
    sum in exact decimal.
    """
    li = spark.table("lineitem")
    revenue = dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    per_part = li.groupBy("l_partkey").agg(
        F.sum(revenue).cast("double").alias("revenue"),
        sum_exact("l_quantity", "total_qty"),
    )
    return top_k(per_part, "revenue", 10, ["l_partkey"])


@register(
    "t3_top5_users_by_value",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value) AS avg_val
    FROM events GROUP BY user_id ORDER BY total DESC, user_id LIMIT 5
    """,
    tags=("topk", "T3"),
    tables=("events",),
)
def t3_top5_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 nlargest(5) analog (ref Dash.py:195-196)."""
    per_user = spark.table("events").groupBy("user_id").agg(
        sum_exact("value", "total"), avg_exact("value", "avg_val")
    )
    return top_k(per_user, "total", 5, ["user_id"])


@register(
    "t4_busiest_day",
    oracle="""
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events GROUP BY d ORDER BY total DESC, d LIMIT 1
    """,
    tags=("topk", "T4"),
    tables=("events",),
)
def t4_busiest_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 busiest-date argmax (ref proto:316 idxmax)."""
    daily = spark.table("events").groupBy(F.to_date("ts").cast("string").alias("d")).agg(
        sum_exact("value", "total")
    )
    return argmax_row(daily, "total", ["d"])
