"""Gold-table partitioning (SURVEY §7 step 9): hive-partition the serving
table by month so feed predicates partition-prune at the source."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from service_alerts_connector_spark.sources.parquet_io import (
    read_dataset,
    write_dataset,
)


def test_partitioned_gold_prunes(spark, tmp_path):
    rows = [
        (i, datetime(2024, 1 + (i % 6), 1 + i % 27), f"alert {i}")
        for i in range(200)
    ]
    gold = spark.createDataFrame(
        rows, "Id long, publish_date timestamp, title string"
    ).withColumn("publish_month", F.date_format("publish_date", "yyyy-MM"))

    write_dataset(
        gold, str(tmp_path), "gold", partition_by=["publish_month"]
    )
    reloaded = read_dataset(spark, str(tmp_path), "gold")
    assert reloaded.count() == 200

    pruned = reloaded.where(F.col("publish_month") == "2024-03")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter must reach the scan, not a post-scan Filter
    assert "PartitionFilters" in plan
    assert "publish_month" in plan.split("PartitionFilters:")[1].splitlines()[0]
    # and only the matching month's rows come back (inputFiles() reports the
    # pre-pruning relation listing, so the plan + count are the evidence)
    assert pruned.count() == len([r for r in rows if r[1].month == 3])


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """A filter on a DIMENSION must prune the partitioned FACT at runtime
    (Spark DPP: the dim-side subquery becomes a dynamicpruning partition
    filter on the fact scan) — the plan shape that keeps a 100 TB
    partitioned fact from full-scanning on every dim-filtered join."""
    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(i, i % 12, float(i)) for i in range(2000)],
        "k long, part_key int, v double",
    )
    fact.write.mode("overwrite").partitionBy("part_key").parquet(
        str(tmp_path / "fact")
    )
    dim = spark.createDataFrame(
        [(m, "keep" if m == 3 else "drop") for m in range(12)],
        "part_key int, tag string",
    )

    prev = spark.conf.get("spark.sql.optimizer.dynamicPartitionPruning.enabled")
    try:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true"
        )
        f = spark.read.parquet(str(tmp_path / "fact"))
        joined = f.join(dim.where(F.col("tag") == "keep"), "part_key")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        expected = sum(1 for i in range(2000) if i % 12 == 3)
        assert joined.count() == expected  # only partition 3's rows
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )
