"""Bucketed co-located join: both sides bucketed on the join key →
sort-merge join with ZERO exchanges.  This is the 100 TB fact-fact join
strategy (e.g. alerts ⋈ per-alert delivery log): pay the shuffle once at
write time, never at query time."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # spark.sql.warehouse.dir is fixed at session start; point tables at a
    # temp database location instead
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdb LOCATION '{loc}'")
    yield "bucketdb"
    spark.sql("DROP DATABASE IF EXISTS bucketdb CASCADE")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    facts = spark.range(0, 10_000).select(
        F.col("id").alias("alert_id"),
        (F.col("id") % 97).alias("payload"),
    )
    log = spark.range(0, 30_000).select(
        (F.col("id") % 10_000).alias("alert_id"),
        F.col("id").alias("delivery_id"),
    )
    (
        facts.write.mode("overwrite")
        .bucketBy(8, "alert_id")
        .sortBy("alert_id")
        .saveAsTable(f"{warehouse}.alerts_bucketed")
    )
    (
        log.write.mode("overwrite")
        .bucketBy(8, "alert_id")
        .sortBy("alert_id")
        .saveAsTable(f"{warehouse}.deliveries_bucketed")
    )

    a = spark.table(f"{warehouse}.alerts_bucketed")
    d = spark.table(f"{warehouse}.deliveries_bucketed")
    joined = a.join(d, "alert_id")

    # disable auto-broadcast so the join must co-locate via bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing removed both shuffles
        assert joined.count() == 30_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
