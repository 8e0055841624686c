"""Window-function queries (SURVEY.md §2.5) with exact-arithmetic oracles."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import sum_exact
from ..operators.windows import lag_delta, rolling_mean, running_total, top_n_per_group
from .registry import register


@register(
    "w1_top3_items_per_flag",
    oracle="""
    SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
    FROM (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) t WHERE rn <= 3
    """,
    tags=("window", "F17"),
    tables=("lineitem",),
)
def w1_top3_items_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per group — the distributed per-group argmax (F17)."""
    li = spark.table("lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return top_n_per_group(
        li, ["l_returnflag"], "l_extendedprice", ["l_orderkey", "l_linenumber"], 3
    )


@register(
    "w2_daily_delta",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM events GROUP BY d
    )
    SELECT d, total, total - LAG(total, 1) OVER (ORDER BY d) AS delta
    FROM daily ORDER BY d
    """,
    tags=("window", "lag"),
    tables=("events",),
)
def w2_daily_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day change of the A4 daily series. The global window is safe:
    it runs on the aggregated series (one row per day), not raw events."""
    daily = (
        spark.table("events")
        .groupBy(F.to_date("ts").cast("string").alias("d"))
        .agg(sum_exact("value", "total"))
    )
    return lag_delta(daily, "d", "total", "delta").orderBy("d")


@register(
    "w3_weekly_moving_avg",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
             SUM(CAST(value AS DECIMAL(18,6))) AS total_dec
      FROM events GROUP BY d
    )
    SELECT d, CAST(total_dec AS DOUBLE) AS total,
           CAST(SUM(total_dec) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / COUNT(total_dec) OVER (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
    FROM daily ORDER BY d
    """,
    tags=("window", "rolling"),
    tables=("events",),
)
def w3_weekly_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day mean of daily totals (exact sum ÷ count)."""
    daily = (
        spark.table("events")
        .groupBy(F.to_date("ts").cast("string").alias("d"))
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("total_dec"))
    )
    out = rolling_mean(daily, "d", "total_dec", 7, "ma7")
    return out.select(
        "d", F.col("total_dec").cast("double").alias("total"), "ma7"
    ).orderBy("d")


@register(
    "w4_running_user_totals",
    oracle="""
    SELECT user_id, event_id, value,
           CAST(SUM(CAST(value AS DECIMAL(18,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
    FROM events WHERE user_id % 50 = 0
    """,
    tags=("window", "running"),
    tables=("events",),
)
def w4_running_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user cumulative value over event time (deterministic tie-break on
    event_id). Partitioned window: one shuffle on user_id, scales linearly."""
    ev = spark.table("events").filter(F.col("user_id") % 50 == 0)
    out = running_total(ev, ["user_id"], ["ts", "event_id"], "value", "running_total")
    return out.select("user_id", "event_id", "value", "running_total")


@register(
    "w5_type_rank_by_day",
    oracle="""
    WITH per AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d, event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM events GROUP BY d, event_type
    )
    SELECT d, event_type, total,
           CAST(RANK() OVER (PARTITION BY d ORDER BY total DESC, event_type) AS INT) AS rnk,
           CAST(DENSE_RANK() OVER (PARTITION BY d ORDER BY total DESC, event_type) AS INT) AS drnk
    FROM per
    """,
    tags=("window", "rank"),
    tables=("events",),
)
def w5_type_rank_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank of event types within each day."""
    from pyspark.sql import Window

    per = (
        spark.table("events")
        .groupBy(F.to_date("ts").cast("string").alias("d"), "event_type")
        .agg(sum_exact("value", "total"))
    )
    w = Window.partitionBy("d").orderBy(F.desc("total"), "event_type")
    return per.withColumn("rnk", F.rank().over(w)).withColumn(
        "drnk", F.dense_rank().over(w)
    )


@register(
    "w6_daily_distribution_ranks",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM events GROUP BY d
    )
    SELECT d, total,
           NTILE(4)       OVER (ORDER BY total, d) AS quartile,
           ROUND(PERCENT_RANK() OVER (ORDER BY total, d), 6) AS pct_rank,
           ROUND(CUME_DIST()    OVER (ORDER BY total, d), 6) AS cume
    FROM daily ORDER BY d
    """,
    tags=("window", "distribution"),
    tables=("events",),
)
def w6_daily_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution ranks (ntile/percent_rank/cume_dist) over the daily
    series — the §2.5 ranking family beyond row_number/rank. Window order
    carries the date tie-break so ranks are engine-independent; global window
    is safe on the one-row-per-day aggregate, never on raw events."""
    from pyspark.sql import Window

    daily = (
        spark.table("events")
        .groupBy(F.to_date("ts").cast("string").alias("d"))
        .agg(sum_exact("value", "total"))
    )
    w = Window.orderBy("total", "d")
    return daily.select(
        "d",
        "total",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    ).orderBy("d")


@register(
    "w7_range_frame_weekly",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_num,
             SUM(CAST(value AS DECIMAL(18,6))) AS total_dec
      FROM events GROUP BY 1, 2
    )
    SELECT d, CAST(total_dec AS DOUBLE) AS total,
           CAST(SUM(total_dec) OVER w AS DOUBLE) AS sum7d,
           COUNT(*) OVER w AS n7d
    FROM daily
    WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    ORDER BY d
    """,
    tags=("window", "range_frame"),
    tables=("events",),
)
def w7_range_frame_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-calendar-DAY window via a RANGE frame keyed on days since
    epoch — unlike w3's ROWS frame, calendar gaps shrink the window instead
    of silently reaching further back, which is the semantics a time-series
    SLA metric needs. Decimal accumulation inside the frame keeps the sums
    engine-exact; the global window is safe on the one-row-per-day series."""
    from pyspark.sql import Window

    from ..functions.numeric import dec

    daily = (
        spark.table("events")
        .groupBy(
            F.to_date("ts").cast("string").alias("d"),
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
                "day_num"
            ),
        )
        .agg(F.sum(dec("value")).alias("total_dec"))
    )
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return (
        daily.select(
            "d",
            F.col("total_dec").cast("double").alias("total"),
            F.sum("total_dec").over(w).cast("double").alias("sum7d"),
            F.count(F.lit(1)).over(w).alias("n7d"),
        )
        .orderBy("d")
    )


@register(
    "w8_forward_fill",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM events GROUP BY d
    ), gapped AS (
      SELECT d,
             CASE WHEN substr(md5(d), 1, 1) < '4' THEN NULL ELSE total END
               AS observed
      FROM daily
    )
    SELECT d, observed,
           LAST_VALUE(observed IGNORE NULLS) OVER (
             ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled
    FROM gapped ORDER BY d
    """,
    tags=("window", "ffill", "F12"),
    tables=("events",),
)
def w8_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (pandas ``ffill``, the reference's gap-repair idiom) as a
    window: last non-null observation carried forward in date order. Gaps
    are knocked out deterministically (md5(d) < '4' ≈ 25% of days) so the
    fill actually exercises multi-row carries. The global window is safe on
    the one-row-per-day series; a keyed series would partition by the key
    and scale out."""
    from pyspark.sql import Window

    daily = (
        spark.table("events")
        .groupBy(F.to_date("ts").cast("string").alias("d"))
        .agg(sum_exact("value", "total"))
    )
    gapped = daily.select(
        "d",
        F.when(F.substring(F.md5("d"), 1, 1) < "4", F.lit(None))
        .otherwise(F.col("total"))
        .alias("observed"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return gapped.select(
        "d",
        "observed",
        F.last("observed", ignorenulls=True).over(w).alias("filled"),
    ).orderBy("d")


@register(
    "w9_running_distinct_users",
    oracle="""
    WITH firstday AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_d FROM events GROUP BY user_id
    ), daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS d,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    ), new_users AS (
      SELECT CAST(first_d AS VARCHAR) AS d, COUNT(*) AS n_new FROM firstday GROUP BY 1
    )
    SELECT daily.d, dau,
           CAST(COALESCE(n_new, 0) AS BIGINT) AS n_new,
           CAST(SUM(COALESCE(n_new, 0)) OVER (ORDER BY daily.d
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM daily LEFT JOIN new_users ON new_users.d = daily.d
    ORDER BY daily.d
    """,
    tags=("windows", "distinct", "growth"),
    tables=("events",),
)
def w9_running_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT-user count by day — the growth-curve metric a
    windowed COUNT(DISTINCT) cannot express (Spark rejects DISTINCT in
    window frames, and any engine that accepted it would drag per-user
    state through every frame). The scalable decomposition: distinct is a
    FIRST-SEEN event, so cumulative-distinct = running sum of per-day
    first-seen counts — one user-keyed groupBy (min day) + a running sum
    over the tiny daily series.

    Scale posture: the heavy lifting is two partial/final aggs (per-user
    min; per-day counts) that shuffle user-sized and day-sized rows; the
    only window runs over one row per DAY — calendar-bounded, safe
    unpartitioned (w2's documented exception). At 100 TB the same shape
    maintains incrementally: yesterday's cum_users + today's first-seen
    count (s16's refresh pattern)."""
    from pyspark.sql.window import Window

    ev = spark.table("events")
    firstday = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_d")
    )
    daily = (
        ev.groupBy(F.to_date("ts").cast("string").alias("d"))
        .agg(F.countDistinct("user_id").alias("dau"))
    )
    new_users = firstday.groupBy(F.col("first_d").cast("string").alias("d")).agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(new_users, "d", "left")
        .select(
            "d",
            "dau",
            F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint").alias("n_new"),
        )
        .withColumn("cum_users", F.sum("n_new").over(w).cast("bigint"))
        .orderBy("d")
    )


@register(
    "w10_rolling_median",
    oracle="""
    SELECT event_id, user_id, CAST(ts AS VARCHAR) AS ts, value,
           quantile_disc(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rolling_median
    FROM events WHERE user_id < 30
    ORDER BY user_id, ts, event_id
    """,
    tags=("window", "median", "composition"),
    tables=("events",),
)
def w10_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling (trailing-7-row) MEDIAN per user — an aggregate Spark's
    window functions don't ship (no percentile over a moving frame), built
    as a composition of existing ops: collect_list over the ROWS frame ->
    array_sort -> element_at(ceil(n/2)), which picks exactly the
    discrete-median element DuckDB's quantile_disc(0.5) picks (smallest
    value with cumulative share >= 0.5). The robust-smoothing primitive for
    noisy operational series, where a rolling MEAN chases every spike.

    Scale posture: the frame is ROWS-bounded (7 elements), so the
    per-row array is constant-size regardless of stream length and the
    whole computation stays inside the one user-partitioned sort the
    window already pays — no self-join, no explode. The median element is
    PICKED, not computed (zero float arithmetic), so cross-engine equality
    is exact."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    return (
        spark.table("events")
        .filter(F.col("user_id") < 30)
        .select(
            "event_id",
            "user_id",
            F.col("ts").cast("string").alias("ts"),
            "value",
            F.element_at(
                arr, F.ceil(F.size(arr) / 2).cast("int")
            ).alias("rolling_median"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


@register(
    "w11_sessionize_gap30",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id,
             date_diff('microseconds', TIMESTAMP '2024-01-01 00:00:00', ts) AS us
      FROM events
    ), g AS (
      SELECT user_id, event_id, us,
             CASE WHEN LAG(us) OVER w IS NULL
                       OR us - LAG(us) OVER w > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ), s AS (
      SELECT user_id, us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    ), per AS (
      SELECT user_id, session_id, COUNT(*) AS n_ev,
             MAX(us) - MIN(us) AS span_us
      FROM s GROUP BY user_id, session_id
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(n_ev) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(n_ev) AS DOUBLE) / COUNT(*), 6)
             AS avg_events_per_session,
           ROUND(CAST(SUM(span_us) AS DOUBLE) / 1000000.0, 3)
             AS total_active_s
    FROM per GROUP BY user_id ORDER BY user_id
    """,
    tags=("window", "sessionize", "composition"),
    tables=("events",),
)
def w11_sessionize_gap30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: gap-based session assignment (a new session
    starts after >30 min of per-user silence) via the classic
    lag -> boundary-flag -> running-sum composition, then per-user session
    stats. The batch twin of the streaming session windows (st-family);
    training-data pipelines use the same shape to segment interaction logs
    into conversations.

    Cross-engine discipline: the gap compare and span arithmetic run on
    INTEGER microseconds measured from a fixed NAIVE epoch (timestampdiff /
    date_diff on TIMESTAMP_NTZ — no timezone touches the session boundary
    decision); the two ROUND'd doubles at the end are computed from
    identical exact integers on both engines.

    Scale posture: ONE shuffle on user_id serves both window passes and
    the session aggregation (same partitioning key, Catalyst reuses the
    exchange); state per user is the sort the window already pays. No
    driver action, no explode — the 100 TB shape for log segmentation."""
    from pyspark.sql.window import Window

    e = spark.table("events").select(
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '2024-01-01 00:00:00', ts)"
        ).alias("us"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(w)
    g = e.withColumn(
        "new_s",
        F.when(prev.isNull() | ((F.col("us") - prev) > 1_800_000_000), 1).otherwise(0),
    )
    s = g.select(
        "user_id",
        "us",
        F.sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("session_id"),
    )
    per = s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_ev"),
        (F.max("us") - F.min("us")).alias("span_us"),
    )
    return (
        per.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_ev").cast("bigint").alias("n_events"),
            F.round(F.sum("n_ev").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_events_per_session"
            ),
            F.round(F.sum("span_us").cast("double") / 1_000_000.0, 3).alias(
                "total_active_s"
            ),
        )
        .orderBy("user_id")
    )


@register(
    "w12_hourly_grid_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type,
             CAST(FLOOR(EPOCH(ts) / 3600) AS BIGINT) AS h,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT event_type, MIN(h) AS h0, MAX(h) AS h1 FROM hourly GROUP BY 1
    ), grid AS (
      SELECT event_type, UNNEST(GENERATE_SERIES(h0, h1)) AS h FROM bounds
    ), gapped AS (
      SELECT g.event_type, g.h,
             CASE WHEN substr(md5(g.event_type || ':' || CAST(g.h AS VARCHAR)), 1, 1)
                       < 'a' THEN NULL ELSE hr.total END AS observed
      FROM grid g LEFT JOIN hourly hr
        ON hr.event_type = g.event_type AND hr.h = g.h
    ), anchored AS (
      SELECT event_type, h, observed,
             LAST_VALUE(observed IGNORE NULLS) OVER wp AS prev_v,
             LAST_VALUE(CASE WHEN observed IS NOT NULL THEN h END IGNORE NULLS)
               OVER wp AS prev_h,
             FIRST_VALUE(observed IGNORE NULLS) OVER wf AS next_v,
             FIRST_VALUE(CASE WHEN observed IS NOT NULL THEN h END IGNORE NULLS)
               OVER wf AS next_h
      FROM gapped
      WINDOW wp AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY event_type ORDER BY h
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, h, ROUND(observed, 6) AS observed,
           ROUND(CASE
             WHEN observed IS NOT NULL THEN observed
             WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
               prev_v + (next_v - prev_v) * (h - prev_h) * 1.0 / (next_h - prev_h)
             ELSE COALESCE(prev_v, next_v) END, 6) AS filled
    FROM anchored ORDER BY event_type, h
    """,
    tags=("window", "timeseries", "interpolate"),
    tables=("events",),
)
def w12_hourly_grid_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling + linear interpolation — the telemetry op w8
    (forward fill) stops short of: the hourly grid is GENERATED (sequence +
    explode per series, so missing hours become real rows, not just NULL
    values), each gap is filled by the line between its bracketing
    observations, and series edges fall back to nearest-anchor. The md5
    gate nulls a deterministic ~60% of hours so the fixtures exercise real
    multi-hour gaps on both engines identically.

    The bracketing anchors come from two IGNORE NULLS window passes per
    series (running last non-null forward, first non-null backward) — no
    self-join, no per-gap search. Windows are PARTITION BY event_type: at
    100 TB the per-series sort is the standard time-series layout (series
    id × time), never a global ORDER BY over the fact table. Grid rows per
    series = span/hour — generated, not shuffled from facts; a year is
    8.8k rows per series regardless of fact volume.
    """
    from pyspark.sql import Window

    from ..functions.numeric import dec

    hourly = (
        spark.table("events")
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 3600).cast("bigint").alias("h"),
        )
        .agg(F.sum(dec("value")).cast("double").alias("total"))
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("h0"), F.col("h1"))).alias("h"),
        )
    )
    gapped = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.when(
            F.substring(
                F.md5(F.concat_ws(":", F.col("event_type"), F.col("h").cast("string"))),
                1,
                1,
            )
            < "a",
            F.lit(None).cast("double"),
        )
        .otherwise(F.col("total"))
        .alias("observed"),
    )
    wp = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("observed").isNotNull(), F.col("h"))
    anchored = gapped.select(
        "event_type",
        "h",
        "observed",
        F.last("observed", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("prev_h"),
        F.first("observed", ignorenulls=True).over(wf).alias("next_v"),
        F.first(obs_h, ignorenulls=True).over(wf).alias("next_h"),
    )
    interp = (
        F.col("prev_v")
        + (F.col("next_v") - F.col("prev_v"))
        * (F.col("h") - F.col("prev_h"))
        / (F.col("next_h") - F.col("prev_h"))
    )
    return anchored.select(
        "event_type",
        "h",
        F.round("observed", 6).alias("observed"),
        F.round(
            F.when(F.col("observed").isNotNull(), F.col("observed"))
            .when(
                F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(), interp
            )
            .otherwise(F.coalesce("prev_v", "next_v")),
            6,
        ).alias("filled"),
    ).orderBy("event_type", "h")
