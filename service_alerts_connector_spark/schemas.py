"""Explicit schemas for every pipeline layer.

The reference infers schemas at ingest and pins them contractually at output
(SURVEY §1.2; service-alerts-api.yaml:188-326).  The Spark engine is
schema-first: each layer has a StructType, and the four additive API versions
are column-list projections (reference ServiceAlertBroadcaster.py:43-49,
``V0_COLS ⊂ V1_COLS ⊂ V1_1_COLS ⊂ V1_2_COLS``).
"""

from __future__ import annotations

from pyspark.sql import types as T

from service_alerts_connector_spark.constants import CHECKSUM_COL, ID_COL

# ---------------------------------------------------------------------------
# Bronze: SharePoint-shaped raw records (reference ServiceAlertConnector.py:15-21
# SP_CRM_COLS; FIXTURES.md §1).  Everything arrives stringly; nulls are common.
# ---------------------------------------------------------------------------
RAW_SCHEMA = T.StructType(
    [
        T.StructField(ID_COL, T.LongType(), False),
        T.StructField("Title1", T.StringType(), True),
        T.StructField("Service_x0020_Area12", T.StringType(), True),
        T.StructField("Description12", T.StringType(), True),
        T.StructField("Subtitle", T.StringType(), True),
        T.StructField("Planned_x0020_Unplanned", T.StringType(), True),
        T.StructField("Area", T.StringType(), True),
        T.StructField("Areatype", T.StringType(), True),
        T.StructField("Address_x0020_Location_x0020_2", T.StringType(), True),
        T.StructField("All_x0020_Location_x0020_Selected", T.StringType(), True),
        T.StructField("Publish_x0020_Date", T.StringType(), True),
        T.StructField("Effective_x0020_Date", T.StringType(), True),
        T.StructField("Alert_x0020_Expiry_x0020_Date", T.StringType(), True),
        T.StructField("Start_x0020_Time", T.StringType(), True),
        T.StructField("Forecast_x0020_End_x0020_Time", T.StringType(), True),
        T.StructField("Reference_x0020_No", T.StringType(), True),
        T.StructField("Status12", T.StringType(), True),
        # Ingest-sequence column added by the connector: Spark has no pandas
        # positional order, so recency is explicit (SURVEY §7 hard-point (c)).
        T.StructField("_ingest_seq", T.LongType(), True),
    ]
)

# Rename map bronze -> silver (reference ServiceAlertFixer.py:89-103, P1).
RAW_TO_SILVER_RENAME = {
    "Title1": "title",
    "Service_x0020_Area12": "service_area",
    "Description12": "description",
    "Subtitle": "subtitle",
    "Area": "area",
    "Areatype": "area_type",
    "Status12": "status",
}

# ---------------------------------------------------------------------------
# Silver: the fixed 16-column sanitised schema (reference
# ServiceAlertFixer.py:97-103; FIXTURES.md §4) + request_number after the J1
# lookup join + the explicit ingest-sequence column.
# ---------------------------------------------------------------------------
SILVER_COLUMNS = [
    ID_COL,
    "service_area",
    "title",
    "subtitle",
    "description",
    "area_type",
    "area",
    "location",
    "publish_date",
    "effective_date",
    "expiry_date",
    "start_timestamp",
    "forecast_end_timestamp",
    "planned",
    "status",
    "notification_number",
]

SILVER_SCHEMA = T.StructType(
    [
        T.StructField(ID_COL, T.LongType(), False),
        T.StructField("service_area", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("subtitle", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
        T.StructField("area_type", T.StringType(), True),
        T.StructField("area", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("publish_date", T.TimestampType(), True),
        T.StructField("effective_date", T.TimestampType(), True),
        T.StructField("expiry_date", T.TimestampType(), True),
        T.StructField("start_timestamp", T.TimestampType(), True),
        T.StructField("forecast_end_timestamp", T.TimestampType(), True),
        T.StructField("planned", T.BooleanType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("notification_number", T.StringType(), True),
        T.StructField("request_number", T.StringType(), True),
        T.StructField("_ingest_seq", T.LongType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Gold: silver + enrichment columns (FIXTURES.md §5; reference
# ServiceAlertAugmenter.py outputs).
# ---------------------------------------------------------------------------
GOLD_EXTRA_FIELDS = [
    T.StructField(CHECKSUM_COL, T.StringType(), True),
    T.StructField("tweet_text", T.StringType(), True),
    T.StructField("toot_text", T.StringType(), True),
    T.StructField("geospatial_footprint", T.StringType(), True),  # WKT, 6 dp
    T.StructField("inferred_suburbs", T.ArrayType(T.StringType()), True),
    T.StructField("inferred_wards", T.ArrayType(T.StringType()), True),
    T.StructField("image_filename", T.StringType(), True),
]

GOLD_SCHEMA = T.StructType(list(SILVER_SCHEMA.fields) + GOLD_EXTRA_FIELDS)

# ---------------------------------------------------------------------------
# API version views (reference ServiceAlertBroadcaster.py:43-49): nested
# supersets selected off the gold table.
# ---------------------------------------------------------------------------
V0_COLS = [
    ID_COL,
    "service_area",
    "title",
    "description",
    "area",
    "location",
    "publish_date",
    "effective_date",
    "expiry_date",
    "start_timestamp",
    "forecast_end_timestamp",
    "planned",
    "status",
    "request_number",
]
V1_COLS = V0_COLS + ["tweet_text", "toot_text"]
V1_1_COLS = V1_COLS + ["geospatial_footprint", "inferred_suburbs", "inferred_wards"]
V1_2_COLS = V1_1_COLS + ["area_type", "image_filename"]

API_VERSION_COLS = {"v0": V0_COLS, "v1": V1_COLS, "v1.1": V1_1_COLS, "v1.2": V1_2_COLS}

# Lookup dimension (reference __init__.py:12, ServiceAlertFixer.py:110-127).
NOTIFICATIONS_SCHEMA = T.StructType(
    [T.StructField("ReferenceNumber", T.StringType(), True)]
)
