"""Flagship end-to-end catalog entry: the engine's real Fixer chain
(plans/fixer.clean_alerts — F1-F8, P1, P2) over SharePoint-shaped dirty data
synthesized deterministically from ``orders``, oracle-checked against a full
SQL reimplementation of the cleaning semantics.

This is the strongest parity proof in the catalog: the *production* cleaning
function (not a query-shaped copy) against an independent DuckDB program.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_alerts_connector_spark.plans.fixer import clean_alerts


def _dirty_bronze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → SharePoint-shaped bronze with deterministic dirt:
    every residue class of o_orderkey exercises a different repair path."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # oracle tz parity
    from service_alerts_connector_spark.shipping import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(spark)
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    k = F.col("o_orderkey")
    date_s = F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss")
    return o.select(
        k.alias("Id"),
        F.concat(F.lit("Alert "), k.cast("string")).alias("Title1"),
        F.col("o_orderpriority").alias("Service_x0020_Area12"),
        F.concat(F.lit("Order "), k.cast("string"), F.lit(" description"))
        .alias("Description12"),
        F.when(k % 3 == 0, F.lit(None).cast("string"))
        .otherwise(F.lit("subtitle"))
        .alias("Subtitle"),
        F.when(k % 2 == 0, F.lit("Planned"))
        .when(k % 7 == 0, F.lit("TBC"))  # unknown label → null flag
        .otherwise(F.lit("Unplanned"))
        .alias("Planned_x0020_Unplanned"),
        F.lit("SONEIKE").alias("Area"),
        F.when(k % 5 == 0, F.lit("Citywide"))
        .otherwise(F.lit("Official Planning Suburb"))
        .alias("Areatype"),
        # F8 paths: null / prefix-duplicate of description / distinct
        F.when(k % 4 == 0, F.lit(None).cast("string"))
        .when(k % 4 == 1, F.concat(F.lit("Order "), k.cast("string")))
        .otherwise(F.concat(F.lit("Corner of "), k.cast("string")))
        .alias("Address_x0020_Location_x0020_2"),
        F.when(k % 6 == 0, F.lit(""))
        .otherwise(F.lit("Fallback Street"))
        .alias("All_x0020_Location_x0020_Selected"),
        # P2: every 11th row has no publish date → dropped
        F.when(k % 11 == 0, F.lit(None).cast("string"))
        .otherwise(date_s)
        .alias("Publish_x0020_Date"),
        date_s.alias("Effective_x0020_Date"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 2 DAYS"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("Alert_x0020_Expiry_x0020_Date"),
        # F6 dirt classes for start time
        F.when(k % 4 == 0, F.lit("06:00"))
        .when(k % 4 == 1, F.lit("23:60"))
        .when(k % 4 == 2, F.lit("Select..."))
        .otherwise(F.lit("garbage"))
        .alias("Start_x0020_Time"),
        # F4b rollover: end 05:00 with start 06:00 rolls to next day
        F.when(k % 5 == 0, F.lit("14:00"))
        .when(k % 5 == 1, F.lit("05:00"))
        .when(k % 5 == 2, F.lit("1:60"))
        .otherwise(F.lit(None).cast("string"))
        .alias("Forecast_x0020_End_x0020_Time"),
        # F1 classes: valid 10-digit / garbage / empty
        F.when(k % 3 == 0, F.format_string("%010d", k))
        .when(k % 3 == 1, F.lit("n/a"))
        .otherwise(F.lit(""))
        .alias("Reference_x0020_No"),
        F.col("o_orderstatus").alias("Status12"),
        k.alias("_ingest_seq"),
    )


def q_fixer_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _spread before the cleaning chain: the one-row-group orders file
    # scans as a single task, serializing the regex/make_timestamp-heavy
    # projection on one of 32 cores (guide §2.5 stragglers; same move as
    # the media codec inputs).  The narrow exchange costs ~20 ms; the
    # chain's wall time drops 1.68 -> 1.24 s best (same-session A/B,
    # results proven identical by exceptAll both ways).  clean_alerts
    # itself stays single-projection (plan-shape test).
    from service_alerts_connector_spark.operators.textdedup import _spread

    silver = clean_alerts(_spread(_dirty_bronze(spark, sf_dir)))
    return silver.select(
        F.col("Id").alias("id"),
        F.col("service_area"),
        F.col("location"),
        F.col("planned"),
        F.col("notification_number"),
        F.date_format("publish_date", "yyyy-MM-dd HH:mm:ss").alias("publish_ts"),
        F.date_format("expiry_date", "yyyy-MM-dd HH:mm:ss").alias("expiry_ts"),
        F.date_format("start_timestamp", "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format("forecast_end_timestamp", "yyyy-MM-dd HH:mm:ss").alias(
            "end_ts"
        ),
        F.col("status"),
    )


SQL_FIXER_CHAIN = """
WITH bronze AS (
  SELECT o_orderkey AS id,
         o_orderpriority AS service_area,
         'Order ' || CAST(o_orderkey AS VARCHAR) || ' description' AS description,
         CASE WHEN o_orderkey % 2 = 0 THEN 'Planned'
              WHEN o_orderkey % 7 = 0 THEN 'TBC'
              ELSE 'Unplanned' END AS planned_raw,
         CASE WHEN o_orderkey % 4 = 0 THEN NULL
              WHEN o_orderkey % 4 = 1 THEN 'Order ' || CAST(o_orderkey AS VARCHAR)
              ELSE 'Corner of ' || CAST(o_orderkey AS VARCHAR) END AS loc_raw,
         CASE WHEN o_orderkey % 6 = 0 THEN '' ELSE 'Fallback Street' END AS sel_raw,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL
              ELSE strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') END AS publish_raw,
         o_orderdate AS effective_ts,
         o_orderdate + INTERVAL 2 DAY AS expiry_raw,
         CASE WHEN o_orderkey % 4 = 0 THEN '06:00'
              WHEN o_orderkey % 4 = 1 THEN '23:60'
              WHEN o_orderkey % 4 = 2 THEN 'Select...'
              ELSE 'garbage' END AS start_raw,
         CASE WHEN o_orderkey % 5 = 0 THEN '14:00'
              WHEN o_orderkey % 5 = 1 THEN '05:00'
              WHEN o_orderkey % 5 = 2 THEN '1:60'
              ELSE NULL END AS end_raw,
         CASE WHEN o_orderkey % 3 = 0 THEN printf('%010d', o_orderkey)
              WHEN o_orderkey % 3 = 1 THEN 'n/a'
              ELSE '' END AS ref_raw,
         o_orderstatus AS status
  FROM orders
), repaired AS (
  SELECT *,
         regexp_replace(regexp_replace(trim(start_raw), ':60$', ':59'),
                        '^Select.*$', '00:00') AS start_fix,
         regexp_replace(regexp_replace(trim(coalesce(end_raw, '')), ':60$', ':59'),
                        '^Select.*$', '00:00') AS end_fix
  FROM bronze
  WHERE publish_raw IS NOT NULL
), timed AS (
  SELECT *,
         CASE WHEN regexp_matches(start_fix, '^[0-9]{2}:[0-9]{2}$')
                   AND TRY_CAST(substr(start_fix, 1, 2) AS INTEGER) <= 23
                   AND TRY_CAST(substr(start_fix, 4, 2) AS INTEGER) <= 59
              THEN CAST(strftime(effective_ts, '%Y-%m-%d') || ' ' || start_fix || ':00'
                        AS TIMESTAMP) END AS start_ts0,
         CASE WHEN regexp_matches(end_fix, '^[0-9]{2}:[0-9]{2}$')
                   AND TRY_CAST(substr(end_fix, 1, 2) AS INTEGER) <= 23
                   AND TRY_CAST(substr(end_fix, 4, 2) AS INTEGER) <= 59
              THEN CAST(strftime(effective_ts, '%Y-%m-%d') || ' ' || end_fix || ':00'
                        AS TIMESTAMP) END AS end_ts0
  FROM repaired
)
SELECT id, service_area,
       CASE
         WHEN loc_raw IS NOT NULL AND NOT (
              substr(trim(loc_raw), 1, least(length(trim(loc_raw)), length(trim(description))))
                = substr(trim(description), 1, least(length(trim(loc_raw)), length(trim(description)))))
           THEN trim(loc_raw)
         WHEN trim(sel_raw) <> '' THEN trim(sel_raw)
       END AS location,
       CASE planned_raw WHEN 'Planned' THEN TRUE
                        WHEN 'Unplanned' THEN FALSE END AS planned,
       CASE WHEN regexp_matches(trim(ref_raw), '^[0-9]{10}$')
            THEN printf('%012d', TRY_CAST(trim(ref_raw) AS BIGINT)) END
         AS notification_number,
       strftime(CAST(publish_raw AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS publish_ts,
       strftime(expiry_raw + INTERVAL 1 DAY, '%Y-%m-%d %H:%M:%S') AS expiry_ts,
       strftime(start_ts0, '%Y-%m-%d %H:%M:%S') AS start_ts,
       strftime(CASE WHEN end_ts0 IS NOT NULL AND start_ts0 IS NOT NULL
                          AND end_ts0 <= start_ts0
                     THEN end_ts0 + INTERVAL 1 DAY ELSE end_ts0 END,
                '%Y-%m-%d %H:%M:%S') AS end_ts,
       status
FROM timed
"""

FIXER_QUERIES = {"fixer_chain": q_fixer_chain}
FIXER_ORACLES = {"fixer_chain": SQL_FIXER_CHAIN}
