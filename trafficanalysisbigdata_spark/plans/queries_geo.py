"""Geo reprojection query (SURVEY.md F18/U4 — ref Dash.py:133-139).

The fixtures carry no state-plane coordinates, so the query synthesizes
deterministic EPSG:2263 points from event ids inside the FIXTURES.md §1.1
envelope (x∈[913k,1.068M], y∈[120k,272k] ftUS) and reprojects them with the
closed-form Lambert inverse. The oracle re-derives the identical math in
SQL — all projection constants are inlined at full double precision from
the same Python derivation, so both engines run the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import geo
from .registry import register

_PHI_STEP = (
    "pi()/2 - 2*atan(t * pow((1.0 - {E}*sin(phi))/(1.0 + {E}*sin(phi)), {EH}))"
).format(E=repr(geo.E), EH=repr(geo.E / 2))

_ITER_CTES = ",\n    ".join(
    f"i{k + 1} AS (SELECT event_id, theta, t, {_PHI_STEP} AS phi FROM i{k})"
    for k in range(geo.PHI_ITERS)
)

_GEO_ORACLE = f"""
    WITH base AS (
      SELECT event_id,
             CAST(913000.0 + (event_id * 7919) % 155000 AS DOUBLE) AS x_ft,
             CAST(120000.0 + (event_id * 104729) % 152000 AS DOUBLE) AS y_ft
      FROM events WHERE event_id < 1000
    ), m AS (
      SELECT event_id,
             x_ft * {repr(geo.FT_US)} - {repr(geo.FALSE_EASTING_M)} AS xm,
             {repr(geo.RHO0)} - y_ft * {repr(geo.FT_US)} AS dy
      FROM base
    ), p AS (
      SELECT event_id, atan2(xm, dy) AS theta,
             pow(sqrt(xm*xm + dy*dy) / {repr(geo.AF)}, {repr(1.0 / geo.N_CONE)}) AS t
      FROM m
    ), i0 AS (
      SELECT event_id, theta, t, pi()/2 - 2*atan(t) AS phi FROM p
    ),
    {_ITER_CTES}
    SELECT event_id,
           ROUND(degrees(theta / {repr(geo.N_CONE)}) + ({repr(geo.LON0_DEG)}), 6) AS lon,
           ROUND(degrees(phi), 6) AS lat
    FROM i{geo.PHI_ITERS}
"""


@register(
    "f18_reproject_epsg2263",
    oracle=_GEO_ORACLE,
    tags=("functions", "geo", "F18", "U4"),
    tables=("events",),
)
def f18_reproject_epsg2263(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EPSG:2263 → WGS84 over synthesized state-plane points: pure Catalyst
    column math (atan2/pow/sin — whole-stage codegen, no Python), rounded to
    6 decimals ≈ 11 cm, well past any cross-engine float divergence."""
    ev = spark.table("events").filter(F.col("event_id") < 1000)
    pts = ev.select(
        "event_id",
        (F.lit(913000.0) + (F.col("event_id") * 7919) % 155000)
        .cast("double")
        .alias("x_ft"),
        (F.lit(120000.0) + (F.col("event_id") * 104729) % 152000)
        .cast("double")
        .alias("y_ft"),
    )
    return pts.select(
        "event_id",
        F.round(geo.epsg2263_lon(F.col("x_ft"), F.col("y_ft")), 6).alias("lon"),
        F.round(geo.epsg2263_lat(F.col("x_ft"), F.col("y_ft")), 6).alias("lat"),
    )


@register(
    "f21_geo_cell_counts",
    oracle=f"""
    WITH g AS ({_GEO_ORACLE})
    SELECT CAST(floor(lon / 0.02) AS BIGINT) AS cell_lon,
           CAST(floor(lat / 0.02) AS BIGINT) AS cell_lat,
           COUNT(*) AS n,
           CAST(MIN(event_id) AS BIGINT) AS first_event
    FROM g
    GROUP BY 1, 2 ORDER BY cell_lon, cell_lat
    """,
    tags=("functions", "geo", "cells", "dashboard"),
    tables=("events",),
)
def f21_geo_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-tile cell aggregation — the dashboard heat-map layer (ref
    Dash.py renders per-point scatter; a 100 TB engine aggregates to fixed
    grid cells server-side and ships cells, not points). Reuses f18's
    Catalyst Lambert inverse, buckets the rounded lat/lon into 0.02-degree
    cells (~2 km), and counts per cell; the oracle nests the identical
    projection CTE chain.

    Scale posture: projection is whole-stage-codegen column math on the
    scan, the only shuffle is the partial/final cell-count agg (bounded by
    grid size, not event volume) — the cells table a tile server reads is
    calendar-independent and tiny. Flooring the ROUNDED 6-dp coordinates
    keeps the cell assignment engine-identical even for points within float
    noise of a cell edge."""
    ev = spark.table("events").filter(F.col("event_id") < 1000)
    pts = ev.select(
        "event_id",
        (F.lit(913000.0) + (F.col("event_id") * 7919) % 155000)
        .cast("double")
        .alias("x_ft"),
        (F.lit(120000.0) + (F.col("event_id") * 104729) % 152000)
        .cast("double")
        .alias("y_ft"),
    )
    proj = pts.select(
        "event_id",
        F.round(geo.epsg2263_lon(F.col("x_ft"), F.col("y_ft")), 6).alias("lon"),
        F.round(geo.epsg2263_lat(F.col("x_ft"), F.col("y_ft")), 6).alias("lat"),
    )
    return (
        proj.groupBy(
            F.floor(F.col("lon") / 0.02).cast("bigint").alias("cell_lon"),
            F.floor(F.col("lat") / 0.02).cast("bigint").alias("cell_lat"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("event_id").cast("bigint").alias("first_event"),
        )
        .orderBy("cell_lon", "cell_lat")
    )
