"""Scalar-function queries (SURVEY.md §2.8: F1–F15) over the driver fixtures.

The WKT and lenient-cast queries synthesize their string inputs from integer
columns (never from floats — float→string formatting differs across engines)
so the oracle comparison stays bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.binning import flag, traffic_category
from ..functions.numeric import sum_exact
from ..functions.timeparts import with_time_parts
from ..functions.wkt import wkt_x, wkt_y
from .registry import register

# --- F1–F6: time-part derivations -------------------------------------------


@register(
    "f2_time_parts_profile",
    oracle="""
    SELECT CAST(isodow(ts) - 1 AS INT) AS day_of_week,
           CAST(CASE WHEN isodow(ts) - 1 >= 5 THEN 1 ELSE 0 END AS INT) AS is_weekend,
           CAST(weekofyear(ts) AS INT) AS week_of_year,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events
    GROUP BY day_of_week, is_weekend, week_of_year
    ORDER BY week_of_year, day_of_week
    """,
    tags=("functions", "F1", "F2", "F3", "F4", "F5", "F6"),
    tables=("events",),
)
def f2_time_parts_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2/F3/F4 weekday(0=Mon)/is_weekend/ISO-week derivation then profile
    (ref TrafficAnalysis.py:80-84)."""
    ev = with_time_parts(spark.table("events"))
    return (
        ev.groupBy("day_of_week", "is_weekend", "week_of_year")
        .agg(F.count(F.lit(1)).alias("n"), sum_exact("value", "total"))
        .orderBy("week_of_year", "day_of_week")
    )


@register(
    "f1_date_roundtrip",
    oracle="""
    SELECT CAST(CAST(make_date(CAST(year(ts) AS INT), CAST(month(ts) AS INT),
                               CAST(day(ts) AS INT)) AS DATE) AS VARCHAR) AS d,
           COUNT(*) AS n
    FROM events GROUP BY d ORDER BY d
    """,
    tags=("functions", "F1"),
    tables=("events",),
)
def f1_date_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 date-from-parts (ref TrafficAnalysis.py:80): decompose ts then
    reassemble with make_date — must round-trip exactly."""
    ev = spark.table("events")
    d = F.make_date(F.year("ts"), F.month("ts"), F.dayofmonth("ts")).cast("string")
    return ev.groupBy(d.alias("d")).agg(F.count(F.lit(1)).alias("n")).orderBy("d")


# --- F7: WKT point parse -----------------------------------------------------


@register(
    "f7_wkt_parse",
    oracle="""
    WITH pts AS (
      SELECT event_id,
             CASE WHEN event_id % 97 = 0 THEN 'POINT(bad'
                  ELSE 'POINT (' || CAST(user_id AS VARCHAR) || ' '
                       || CAST(event_id % 1000 AS VARCHAR) || ')' END AS geometry
      FROM events
    ), parsed AS (
      SELECT event_id,
             TRY_CAST(NULLIF(regexp_extract(geometry,
               'POINT \\((-?[0-9][0-9.]*) (-?[0-9][0-9.]*)\\)', 1), '') AS DOUBLE) AS x_coord,
             TRY_CAST(NULLIF(regexp_extract(geometry,
               'POINT \\((-?[0-9][0-9.]*) (-?[0-9][0-9.]*)\\)', 2), '') AS DOUBLE) AS y_coord
      FROM pts
    )
    SELECT COUNT(*) AS n,
           CAST(COUNT(x_coord) AS BIGINT) AS n_parsed,
           CAST(SUM(CAST(x_coord AS DECIMAL(18,6))) AS DOUBLE) AS sum_x,
           CAST(SUM(CAST(y_coord AS DECIMAL(18,6))) AS DOUBLE) AS sum_y
    FROM parsed
    """,
    tags=("functions", "F7", "U2", "U3"),
    tables=("events",),
)
def f7_wkt_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 WKT POINT parse (ref TrafficAnalysis.py:87-95, Dash.py:14-23):
    regexp-extract x/y as doubles, NULL pair on malformed input. WKT strings
    are synthesized from integer columns (with every 97th malformed) so both
    engines parse identical inputs."""
    ev = spark.table("events")
    geom = F.when(F.col("event_id") % 97 == 0, F.lit("POINT(bad")).otherwise(
        F.concat(
            F.lit("POINT ("),
            F.col("user_id").cast("string"),
            F.lit(" "),
            (F.col("event_id") % 1000).cast("string"),
            F.lit(")"),
        )
    )
    parsed = ev.select(
        "event_id", wkt_x(geom).alias("x_coord"), wkt_y(geom).alias("y_coord")
    )
    return parsed.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("x_coord").cast("bigint").alias("n_parsed"),
        sum_exact("x_coord", "sum_x"),
        sum_exact("y_coord", "sum_y"),
    )


# --- F9/F15: labeled bins ----------------------------------------------------


@register(
    "f9_traffic_category",
    oracle="""
    SELECT CASE WHEN value IS NULL OR value < 0 THEN NULL
                WHEN value < 50 THEN 'Low'
                WHEN value < 200 THEN 'Medium'
                ELSE 'High' END AS traffic_category,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
    FROM events GROUP BY traffic_category ORDER BY traffic_category
    """,
    tags=("functions", "F9"),
    tables=("events",),
)
def f9_traffic_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9 pd.cut(right=False) buckets (ref TrafficAnalysis.py:354-356):
    [0,50) Low / [50,200) Medium / [200,∞) High."""
    ev = spark.table("events")
    return (
        ev.groupBy(traffic_category(F.col("value")).alias("traffic_category"))
        .agg(F.count(F.lit(1)).alias("n"), sum_exact("value", "total"))
        .orderBy("traffic_category")
    )


@register(
    "f15_bool_flag_counts",
    oracle="""
    SELECT CAST(CASE WHEN value > 100 THEN 1 ELSE 0 END AS INT) AS is_heavy,
           COUNT(*) AS n
    FROM events GROUP BY is_heavy ORDER BY is_heavy
    """,
    tags=("functions", "F15"),
    tables=("events",),
)
def f15_bool_flag_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15 boolean→int cast (ref TrafficAnalysis.py:386)."""
    ev = spark.table("events")
    return (
        ev.groupBy(flag(F.col("value") > 100).alias("is_heavy"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("is_heavy")
    )


# --- F10–F12: lenient casts and fills ---------------------------------------


@register(
    "f10_lenient_casts",
    oracle="""
    SELECT COUNT(*) AS n,
           CAST(COUNT(TRY_CAST(NULLIF(regexp_extract(props, '([0-9]+)', 1), '') AS INT)) AS BIGINT) AS n_props_num,
           CAST(SUM(TRY_CAST(NULLIF(regexp_extract(props, '([0-9]+)', 1), '') AS INT)) AS BIGINT) AS sum_props_num,
           CAST(COUNT(TRY_CAST(event_type AS DOUBLE)) AS BIGINT) AS n_type_num,
           CAST(SUM(COALESCE(TRY_CAST(event_type AS DOUBLE), 0)) AS BIGINT) AS sum_type_filled
    FROM events
    """,
    tags=("functions", "F10", "F11", "F12"),
    tables=("events",),
)
def f10_lenient_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10 lenient numeric coercion (ref TrafficAnalysis.py:104-107): digits
    embedded in props parse to INT; non-numeric event_type coerces to NULL
    (count 0), then F12 fillna(0) makes the sum well-defined."""
    ev = spark.table("events")
    props_num = F.regexp_extract("props", r"([0-9]+)", 1).try_cast("int")
    type_num = F.col("event_type").try_cast("double")
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(props_num).cast("bigint").alias("n_props_num"),
        F.sum(props_num).cast("bigint").alias("sum_props_num"),
        F.count(type_num).cast("bigint").alias("n_type_num"),
        F.sum(F.coalesce(type_num, F.lit(0))).cast("bigint").alias("sum_type_filled"),
    )
