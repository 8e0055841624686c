"""Ingest-layer queries: oracle coverage for P1/S4/P4/P5/F10/F11 (SURVEY.md
§2.1/§2.2) — the preprocess surface that round 1 left driver-invisible.

The fixtures carry no all-strings traffic table, so each query SYNTHESIZES
one relationally from ``events`` (stringified columns with deterministic
malformed-value rates keyed on event_id) and pushes it through the real
ingest code (sources/traffic.py). The oracle rebuilds the identical strings
and applies the same semantics in SQL — TRY_CAST ≡ try_cast, make_date with
NULL parts ≡ try_make_timestamp, isodow−1 ≡ weekday.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.casts import to_timestamp_lenient
from ..sources.traffic import normalize_traffic
from .registry import register

# Deterministic corruption rates (mod event_id) shared by both sides
_VOL_BAD, _WKT_BAD, _BORO_NULL = 37, 29, 41

_RAW_SQL = f"""
      SELECT CAST(event_id AS VARCHAR) AS requestid,
             CASE WHEN event_id % {_BORO_NULL} = 0 THEN NULL ELSE event_type END AS boro,
             CAST(year(ts) AS VARCHAR) AS yr,
             CAST(month(ts) AS VARCHAR) AS m,
             CAST(day(ts) AS VARCHAR) AS d,
             CAST(hour(ts) AS VARCHAR) AS hh,
             CAST(minute(ts) AS VARCHAR) AS mm,
             CASE WHEN event_id % {_VOL_BAD} = 0 THEN 'n/a'
                  ELSE CAST(CAST(floor(value) AS INT) AS VARCHAR) END AS vol,
             CAST(user_id AS VARCHAR) AS segmentid,
             CASE WHEN event_id % {_WKT_BAD} = 0 THEN 'bad'
                  ELSE 'POINT (' || CAST(913000 + (event_id * 7919) % 155000 AS VARCHAR)
                       || ' ' || CAST(120000 + (event_id * 104729) % 152000 AS VARCHAR) || ')'
             END AS wktgeom,
             'S' || CAST(user_id % 50 AS VARCHAR) AS street,
             'A' AS fromst, 'B' AS tost,
             CASE user_id % 4 WHEN 0 THEN 'NB' WHEN 1 THEN 'SB'
                              WHEN 2 THEN 'EB' ELSE 'WB' END AS direction
      FROM events
"""


def _raw_traffic_strings(spark: SparkSession) -> DataFrame:
    """The Spark twin of _RAW_SQL: an all-strings traffic frame from events."""
    ev = spark.table("events")
    eid, uid, ts = F.col("event_id"), F.col("user_id"), F.col("ts")
    return ev.select(
        eid.cast("string").alias("requestid"),
        F.when(eid % _BORO_NULL == 0, None).otherwise(F.col("event_type")).alias("boro"),
        F.year(ts).cast("string").alias("yr"),
        F.month(ts).cast("string").alias("m"),
        F.dayofmonth(ts).cast("string").alias("d"),
        F.hour(ts).cast("string").alias("hh"),
        F.minute(ts).cast("string").alias("mm"),
        F.when(eid % _VOL_BAD == 0, F.lit("n/a"))
        .otherwise(F.floor("value").cast("int").cast("string"))
        .alias("vol"),
        uid.cast("string").alias("segmentid"),
        F.when(eid % _WKT_BAD == 0, F.lit("bad"))
        .otherwise(
            F.concat(
                F.lit("POINT ("),
                (F.lit(913000) + (eid * 7919) % 155000).cast("string"),
                F.lit(" "),
                (F.lit(120000) + (eid * 104729) % 152000).cast("string"),
                F.lit(")"),
            )
        )
        .alias("wktgeom"),
        F.concat(F.lit("S"), (uid % 50).cast("string")).alias("street"),
        F.lit("A").alias("fromst"),
        F.lit("B").alias("tost"),
        F.when(uid % 4 == 0, "NB")
        .when(uid % 4 == 1, "SB")
        .when(uid % 4 == 2, "EB")
        .otherwise("WB")
        .alias("direction"),
    )


@register(
    "ing1_traffic_normalize",
    oracle=f"""
    WITH raw AS ({_RAW_SQL}
    ), typed AS (
      SELECT TRY_CAST(yr AS INT) AS y, TRY_CAST(m AS INT) AS mo,
             TRY_CAST(d AS INT) AS dd, TRY_CAST(hh AS INT) AS h,
             TRY_CAST(vol AS INT) AS volume, TRY_CAST(segmentid AS INT) AS segment_id,
             boro, street, wktgeom, direction
      FROM raw
    ), kept AS (
      SELECT *, make_date(y, mo, dd) AS dt,
             TRY_CAST(regexp_extract(wktgeom,
                 'POINT \\((-?[0-9][0-9.]*) (-?[0-9][0-9.]*)\\)', 1) AS DOUBLE) AS x_coord
      FROM typed
      WHERE volume IS NOT NULL AND h IS NOT NULL AND segment_id IS NOT NULL
        AND boro IS NOT NULL AND street IS NOT NULL
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(volume) AS BIGINT) AS sum_volume,
           CAST(SUM(CASE WHEN x_coord IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_coords,
           CAST(SUM(CASE WHEN date_part('isodow', dt) - 1 >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend,
           CAST(SUM(date_part('isodow', dt) - 1) AS BIGINT) AS sum_dow,
           CAST(SUM(weekofyear(dt)) AS BIGINT) AS sum_week,
           CAST(SUM(CASE direction WHEN 'EB' THEN 0 WHEN 'NB' THEN 1
                                   WHEN 'SB' THEN 2 WHEN 'WB' THEN 3
                                   ELSE -1 END) AS BIGINT) AS sum_dircode
    FROM kept
    """,
    tags=("ingest", "P1", "S4", "P4", "F10", "F7"),
    tables=("events",),
)
def ing1_traffic_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end ingest parity: synthesized all-strings traffic frame →
    normalize_traffic (P1 rename → F10 coerce → P4 drop → F1-F6 derive →
    F7 WKT → direction codes) → one summary row the oracle can rebuild."""
    norm = normalize_traffic(_raw_traffic_strings(spark))
    return norm.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("volume").cast("bigint").alias("sum_volume"),
        F.sum(F.col("x_coord").isNull().cast("int")).cast("bigint").alias("n_null_coords"),
        F.sum("is_weekend").cast("bigint").alias("n_weekend"),
        F.sum("day_of_week").cast("bigint").alias("sum_dow"),
        F.sum("week_of_year").cast("bigint").alias("sum_week"),
        F.sum("direction_code").cast("bigint").alias("sum_dircode"),
    )


@register(
    "p5_drop_half_missing",
    oracle="""
    WITH sparse AS (
      SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS a,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE user_id END AS b,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS c,
             CASE WHEN event_id % 2 = 0 THEN NULL ELSE 'x' END AS d
      FROM events
    )
    SELECT COUNT(*) AS n_kept,
           CAST(SUM(CASE WHEN a IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_a
    FROM sparse
    WHERE (CASE WHEN a IS NULL THEN 0 ELSE 1 END +
           CASE WHEN b IS NULL THEN 0 ELSE 1 END +
           CASE WHEN c IS NULL THEN 0 ELSE 1 END +
           CASE WHEN d IS NULL THEN 0 ELSE 1 END) >= 3
    """,
    tags=("ingest", "P5"),
    tables=("events",),
)
def p5_drop_half_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 (ref proto:84, dropna(thresh)): keep rows with ≥3 of 4 synthetic
    nullable fields present — na.drop(thresh=3) over the value columns."""
    ev = spark.table("events")
    eid = F.col("event_id")
    sparse = ev.select(
        "event_id",
        F.when(eid % 3 == 0, None).otherwise(F.col("value")).alias("a"),
        F.when(eid % 5 == 0, None).otherwise(F.col("user_id")).alias("b"),
        F.when(eid % 7 == 0, None).otherwise(F.col("event_type")).alias("c"),
        F.when(eid % 2 == 0, None).otherwise(F.lit("x")).alias("d"),
    )
    kept = sparse.na.drop(thresh=3, subset=["a", "b", "c", "d"])
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("a").isNotNull().cast("int")).cast("bigint").alias("n_a"),
    )


@register(
    "p4_drop_null_subset",
    oracle="""
    WITH sparse AS (
      SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS a,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE user_id END AS b,
             CASE WHEN event_id % 7 = 0 THEN NULL ELSE event_type END AS c
      FROM events
    )
    SELECT COUNT(*) AS n_kept,
           CAST(SUM(b) AS BIGINT) AS sum_b,
           COUNT(DISTINCT c) AS n_types
    FROM sparse
    WHERE a IS NOT NULL AND b IS NOT NULL
    """,
    tags=("ingest", "P4"),
    tables=("events",),
)
def p4_drop_null_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (ref TrafficAnalysis.py:76-77, dropna(subset=...)): drop rows where
    ANY of the subset columns is NULL — na.drop(subset) over two synthetic
    nullable fields; a third nullable column must survive untouched."""
    from ..operators.filters import drop_null_rows

    ev = spark.table("events")
    eid = F.col("event_id")
    sparse = ev.select(
        "event_id",
        F.when(eid % 3 == 0, None).otherwise(F.col("value")).alias("a"),
        F.when(eid % 5 == 0, None).otherwise(F.col("user_id")).alias("b"),
        F.when(eid % 7 == 0, None).otherwise(F.col("event_type")).alias("c"),
    )
    kept = drop_null_rows(sparse, ["a", "b"])
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("b").cast("bigint").alias("sum_b"),
        F.countDistinct("c").alias("n_types"),
    )


@register(
    "f11_lenient_dates",
    oracle="""
    WITH raw AS (
      SELECT event_id,
             CASE WHEN event_id % 23 = 0 THEN 'not-a-date'
                  ELSE CAST(CAST(ts AS DATE) AS VARCHAR) END AS date_str
      FROM events
    ), parsed AS (
      SELECT event_id, TRY_CAST(date_str AS TIMESTAMP) AS dt FROM raw
    )
    SELECT CAST(SUM(CASE WHEN dt IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed,
           COUNT(dt) AS n_parsed,
           CAST(MIN(dt) AS VARCHAR) AS min_dt,
           CAST(MAX(dt) AS VARCHAR) AS max_dt
    FROM parsed
    """,
    tags=("ingest", "F11"),
    tables=("events",),
)
def f11_lenient_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F11 (ref TrafficAnalysis.py:289, pd.to_datetime errors='coerce'):
    ~4% malformed date strings coerce to NULL, the rest parse."""
    ev = spark.table("events")
    raw = ev.select(
        "event_id",
        F.when(F.col("event_id") % 23 == 0, F.lit("not-a-date"))
        .otherwise(F.to_date("ts").cast("string"))
        .alias("date_str"),
    )
    parsed = raw.select(to_timestamp_lenient(F.col("date_str")).alias("dt"))
    return parsed.agg(
        F.sum(F.col("dt").isNull().cast("int")).cast("bigint").alias("n_malformed"),
        F.count("dt").alias("n_parsed"),
        F.min("dt").cast("string").alias("min_dt"),
        F.max("dt").cast("string").alias("max_dt"),
    )


@register(
    "s4_from_json_props",
    oracle="""
    SELECT CAST(SUM(TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n,
           COUNT(DISTINCT TRY_CAST(regexp_extract(props, '([0-9]+)', 1) AS BIGINT)) AS n_distinct_k
    FROM events
    """,
    tags=("ingest", "S4"),
    tables=("events",),
)
def s4_from_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 (ref TrafficAnalysis.py:57-58, JSON list → table): parse the events
    ``props`` JSON column with from_json and aggregate the extracted field.
    (The oracle extracts the same value by regex — same result, different
    mechanism, which is the point of a differential check.)"""
    ev = spark.table("events")
    k = F.from_json(F.col("props"), "k BIGINT").getField("k")
    return ev.select(k.alias("k")).agg(
        F.sum("k").cast("bigint").alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("k").alias("n_distinct_k"),
    )
