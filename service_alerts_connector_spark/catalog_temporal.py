"""Catalog — temporal joins (as-of, bucketed range) over the events table.

Oracle determinism (see ``catalog`` docstring): timestamps surface as
formatted strings, money/values as integer cents, and every "latest" pick
carries an id tiebreak.  The DuckDB oracles deliberately use a DIFFERENT
formulation (LEFT JOIN LATERAL with ORDER BY ... LIMIT 1; a plain
inequality join) than the engine's union-window / bucket-join plans, so a
hash match checks semantics, not a shared code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_alerts_connector_spark.catalog import _events
from service_alerts_connector_spark.operators.temporal import (
    asof_join,
    bucketed_range_join,
)

_FMT = "yyyy-MM-dd HH:mm:ss"


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the latest at-or-before click
    by the same user (ties on ts broken by max event_id)."""
    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.round(F.col("value") * 100).cast("long").alias("click_value_cents"),
    )
    joined = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["click_event_id", "click_value_cents"],
        right_tiebreak="click_event_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _FMT).alias("purchase_ts"),
        "click_event_id",
        "click_value_cents",
    )


SQL_ASOF = """
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       c.click_event_id, c.click_value_cents
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN LATERAL (
    SELECT e.event_id AS click_event_id,
           CAST(round(e.value * 100) AS BIGINT) AS click_value_cents
    FROM events e
    WHERE e.user_id = p.user_id AND e.event_type = 'click' AND e.ts <= p.ts
    ORDER BY e.ts DESC, e.event_id DESC
    LIMIT 1
) c ON TRUE
"""


def q_range_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join: the 500 highest-value events open one-hour
    half-open windows; count/sum ALL events falling in each window (no
    user equi-key — a pure range predicate a naive plan nested-loops)."""
    ev = _events(spark, sf_dir)
    intervals = (
        ev.orderBy(F.desc("value"), F.asc("event_id"))
        .limit(500)
        .select(
            F.col("event_id").alias("interval_id"),
            F.col("ts").alias("start_ts"),
            F.timestamp_add("SECOND", F.lit(3600), F.col("ts")).alias("end_ts"),
        )
    )
    points = ev.select(
        F.col("event_id").alias("point_id"),
        F.col("ts").alias("point_ts"),
        F.round(F.col("value") * 100).cast("long").alias("value_cents"),
    )
    pairs = bucketed_range_join(
        points,
        intervals,
        point_ts="point_ts",
        start_col="start_ts",
        end_col="end_ts",
        bucket_s=3600,
    )
    hits = pairs.groupBy("interval_id").agg(
        F.count("point_id").alias("n_events"),
        F.sum("value_cents").alias("sum_value_cents"),
    )
    # Left-join back so an interval with zero points still surfaces (the
    # bucketed inner join drops them); every interval contains at least its
    # own defining event here, but the contract is left-join semantics.
    return intervals.join(hits, on="interval_id", how="left").select(
        "interval_id",
        F.date_format("start_ts", _FMT).alias("start_ts"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.coalesce("sum_value_cents", F.lit(0)).alias("sum_value_cents"),
    )


SQL_RANGE = """
WITH iv AS (
    SELECT event_id AS interval_id, ts AS start_ts,
           ts + INTERVAL 3600 SECOND AS end_ts
    FROM events
    ORDER BY value DESC, event_id
    LIMIT 500
)
SELECT iv.interval_id,
       strftime(iv.start_ts, '%Y-%m-%d %H:%M:%S') AS start_ts,
       count(e.event_id) AS n_events,
       CAST(coalesce(sum(CAST(round(e.value * 100) AS BIGINT)), 0) AS BIGINT)
           AS sum_value_cents
FROM iv
LEFT JOIN events e ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
GROUP BY iv.interval_id, iv.start_ts
"""


def q_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user value resample with LOCF over each user's own
    [first, last] observation span; day surfaces as a formatted string and
    money as integer cents (catalog determinism rules)."""
    from service_alerts_connector_spark.operators.temporal import gap_fill_locf

    ev = _events(spark, sf_dir).select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = gap_fill_locf(ev, "user_id", "day", "cents")
    return out.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "cents_locf",
        "is_observed",
    )


SQL_GAP_FILL = """
WITH per_day AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         count(*) AS n_events,
         sum(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), bounds AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM per_day
  GROUP BY user_id
), calendar AS (
  SELECT user_id,
         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT c.user_id,
       strftime(c.day, '%Y-%m-%d') AS day,
       CAST(coalesce(p.n_events, 0) AS BIGINT) AS n_events,
       CAST(last_value(p.cents IGNORE NULLS)
         OVER (PARTITION BY c.user_id ORDER BY c.day) AS BIGINT) AS cents_locf,
       p.n_events IS NOT NULL AS is_observed
FROM calendar c
LEFT JOIN per_day p ON p.user_id = c.user_id AND p.day = c.day
"""



def q_gap_fill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user resample with exact-integer LINEAR INTERPOLATION
    across gap days (`operators/temporal.gap_fill_interp`) — the
    level-series counterpart to `gap_fill_locf`; both bracketing windows
    share one exchange+sort."""
    from service_alerts_connector_spark.operators.temporal import (
        gap_fill_interp,
    )

    ev = _events(spark, sf_dir).select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.floor(F.col("value") * 100).cast("long").alias("cents"),
    )
    out = gap_fill_interp(ev, "user_id", "day", "cents")
    return out.select(
        "user_id",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "n_events",
        "cents_filled",
        "is_observed",
    )


SQL_GAP_FILL_INTERP = """
WITH per_day AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         count(*) AS n_events,
         sum(CAST(floor(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), bounds AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM per_day
  GROUP BY user_id
), calendar AS (
  SELECT user_id,
         CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), staged AS (
  SELECT c.user_id, c.day,
         coalesce(p.n_events, 0) AS n_events,
         p.cents,
         last_value(p.cents IGNORE NULLS)
           OVER (PARTITION BY c.user_id ORDER BY c.day) AS pc,
         last_value(CASE WHEN p.cents IS NOT NULL THEN c.day END IGNORE NULLS)
           OVER (PARTITION BY c.user_id ORDER BY c.day) AS pd,
         first_value(p.cents IGNORE NULLS)
           OVER (PARTITION BY c.user_id ORDER BY c.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nc,
         first_value(CASE WHEN p.cents IS NOT NULL THEN c.day END IGNORE NULLS)
           OVER (PARTITION BY c.user_id ORDER BY c.day
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
  FROM calendar c
  LEFT JOIN per_day p ON p.user_id = c.user_id AND p.day = c.day
)
SELECT user_id,
       strftime(day, '%Y-%m-%d') AS day,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(CASE WHEN cents IS NOT NULL THEN cents
            ELSE (pc * date_diff('day', day, nd)
                  + nc * date_diff('day', pd, day))
                 // date_diff('day', pd, nd)
       END AS BIGINT) AS cents_filled,
       cents IS NOT NULL AS is_observed
FROM staged
"""


TEMPORAL_QUERIES = {
    "asof_join": q_asof_join,
    "range_join_agg": q_range_join_agg,
    "gap_fill_locf": q_gap_fill_locf,
    "gap_fill_interp": q_gap_fill_interp,
}

TEMPORAL_ORACLES = {
    "asof_join": SQL_ASOF,
    "range_join_agg": SQL_RANGE,
    "gap_fill_locf": SQL_GAP_FILL,
    "gap_fill_interp": SQL_GAP_FILL_INTERP,
}
