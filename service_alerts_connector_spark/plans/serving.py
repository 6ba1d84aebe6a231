"""SQL serving surface: the four API versions as queryable views.

The reference's API versions are column lists over the gold feed
(ServiceAlertBroadcaster.py:43-49); registering them as temp views gives
SQL users the same contract the JSON feeds expose:

    register_api_views(spark, gold)
    spark.sql("SELECT * FROM service_alerts_v1_2 WHERE planned")

Views are zero-cost projections — Catalyst collapses them into the gold
scan, so all pushdown/pruning still applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from service_alerts_connector_spark.schemas import API_VERSION_COLS


def view_name(version: str) -> str:
    return "service_alerts_" + version.replace(".", "_")


def register_api_views(spark: SparkSession, gold: DataFrame) -> list[str]:
    """Create/replace one temp view per API version; returns view names."""
    gold.createOrReplaceTempView("service_alerts_gold")
    names = []
    for version, cols in API_VERSION_COLS.items():
        present = [c for c in cols if c in gold.columns]
        name = view_name(version)
        gold.select(*present).createOrReplaceTempView(name)
        names.append(name)
    return names
