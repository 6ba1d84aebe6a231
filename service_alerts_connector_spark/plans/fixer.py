"""The Fixer — bronze → silver (the reference's relational core).

Re-expresses ServiceAlertFixer.py (clean → rename/project → request-number
lookup → last-wins dedup) as one declarative Spark plan.  The reference's
``.assign`` chain plus three ``apply(axis=1)`` Python loops
(ServiceAlertFixer.py:23-107) fold here into a single ``select()`` of Column
expressions — one ProjectExec, fully whole-stage-codegen'd; the stage is one
job with at most one shuffle (the dedup window; the lookup join broadcasts).

Lifecycle parity (SURVEY §3.1):
  1. scan bronze                          (S2)
  2. clean+type+project                   (F1-F8, P1, P2)
  3. request-number lookup                (J1, S3 — pruned+filtered dim scan)
  4. upsert onto previous silver          (A3/W4 last-wins)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from service_alerts_connector_spark.constants import ID_COL
from service_alerts_connector_spark.functions import cleaning as C
from service_alerts_connector_spark.operators.dedup import (
    dedup_last_wins,
    upsert,
)
from service_alerts_connector_spark.operators.joins import lookup_join


def clean_alerts(raw: DataFrame) -> DataFrame:
    """Bronze → silver-schema transform chain (reference _clean_sa_df,
    ServiceAlertFixer.py:23-107)."""
    publish = C.parse_sast_timestamp(F.col("Publish_x0020_Date"))
    effective = C.parse_sast_timestamp(F.col("Effective_x0020_Date"))
    expiry = C.expiry_plus_one_day(F.col("Alert_x0020_Expiry_x0020_Date"))
    start_ts = C.combine_date_time(effective, F.col("Start_x0020_Time"))
    end_raw = C.combine_date_time(effective, F.col("Forecast_x0020_End_x0020_Time"))
    end_ts = C.rollover_end_timestamp(start_ts, end_raw)

    return (
        raw
        # P2 — drop rows with no publish date (also applied at ingest).
        .na.drop(subset=["Publish_x0020_Date"])
        .select(
            F.col(ID_COL),
            F.col("Service_x0020_Area12").alias("service_area"),
            F.col("Title1").alias("title"),
            F.col("Subtitle").alias("subtitle"),
            F.col("Description12").alias("description"),
            F.col("Areatype").alias("area_type"),
            F.col("Area").alias("area"),
            C.coalesce_location(
                F.col("Address_x0020_Location_x0020_2"),
                F.col("Description12"),
                F.col("All_x0020_Location_x0020_Selected"),
            ).alias("location"),
            publish.alias("publish_date"),
            effective.alias("effective_date"),
            expiry.alias("expiry_date"),
            start_ts.alias("start_timestamp"),
            end_ts.alias("forecast_end_timestamp"),
            C.planned_flag(F.col("Planned_x0020_Unplanned")).alias("planned"),
            F.col("Status12").alias("status"),
            C.clean_notification_number(F.col("Reference_x0020_No")).alias(
                "notification_number"
            ),
            F.col("_ingest_seq"),
        )
    )


def lookup_request_number(
    silver: DataFrame, notifications: DataFrame
) -> DataFrame:
    """J1 — left many-to-one join against the service-notifications dimension.

    Reference ServiceAlertFixer.py:110-131: the dimension is scanned
    column-pruned to ``ReferenceNumber`` and filtered non-null (S3 — Catalyst
    pushes both into the parquet scan), validated unique, then broadcast.
    The joined value surfaces as ``request_number``.
    """
    dim = (
        notifications.select("ReferenceNumber")
        .where(F.col("ReferenceNumber").isNotNull())
        .distinct()
        .withColumn("request_number", F.col("ReferenceNumber"))
    )
    joined = lookup_join(
        silver,
        dim,
        on=silver["notification_number"] == dim["ReferenceNumber"],
        how="left",
        validate_unique=["ReferenceNumber"],
    )
    return joined.drop("ReferenceNumber")


def fix_alerts(
    raw: DataFrame,
    notifications: DataFrame | None = None,
    previous_silver: DataFrame | None = None,
) -> DataFrame:
    """Full Fixer stage: clean → lookup → upsert onto previous silver."""
    silver = clean_alerts(raw)
    if notifications is not None:
        silver = lookup_request_number(silver, notifications)
    else:
        silver = silver.withColumn(
            "request_number", F.lit(None).cast("string")
        )
    if previous_silver is not None:
        silver = upsert(previous_silver, silver, key=ID_COL, order_col="_ingest_seq")
    else:
        # a first batch can still carry several versions of one alert
        # (multi-page backfill: the same Id updated across staged poll
        # cycles) — without this, duplicate Ids leak into silver and
        # every downstream Id-keyed join multiplies them (found by the
        # batch≡stream pipeline equivalence test).  upsert() covers the
        # previous_silver branch: it last-wins over old ∪ new as one
        # window, reference ServiceAlertFixer.py:148-159.
        silver = dedup_last_wins(silver, key=ID_COL, order_col="_ingest_seq")
    return silver
