"""Streaming CMS heavy-hitters: cross-batch merge equals one-shot batch."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.sketches import (
    cms_estimate,
    count_min_sketch,
)
from service_alerts_connector_spark.streaming.heavy_hitters import (
    heavy_hitter_estimates,
    merge_sketch_batch,
    read_sketch,
)
from service_alerts_connector_spark.streaming.runner import run_available_now


def _write_jsonl(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_streamed_sketch_equals_batch_sketch(spark, tmp_path):
    state = str(tmp_path / "state")
    staged = tmp_path / "staged"
    all_rows = []
    for b in range(3):
        rows = [{"k": f"k{(i + b) % 5}"} for i in range(50)]
        all_rows += rows
        _write_jsonl(staged / f"batch{b}.jsonl", rows)

    stream = (
        spark.readStream.schema("k string")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    run_available_now(
        stream,
        lambda df, bid: merge_sketch_batch(spark, state, df, "k", 3, 64),
        str(tmp_path / "ckpt"),
    )

    merged = {
        (r["row"], r["col"]): r["cnt"]
        for r in read_sketch(spark, state).collect()
    }
    batch_df = spark.createDataFrame([(r["k"],) for r in all_rows], "k string")
    oneshot = {
        (r["row"], r["col"]): r["cnt"]
        for r in count_min_sketch(batch_df, "k", 3, 64).collect()
    }
    assert merged == oneshot  # mergeability: stream of batches == one batch

    probes = spark.createDataFrame([("k0",), ("k4",), ("nope",)], "k string")
    est = {
        r["k"]: r["est_n"]
        for r in heavy_hitter_estimates(spark, state, probes, "k", 3, 64).collect()
    }
    true = {
        r["k"]: r["n"]
        for r in batch_df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert est["k0"] >= true["k0"] and est["k4"] >= true["k4"]


def test_estimates_before_any_batch_are_zero(spark, tmp_path):
    probes = spark.createDataFrame([("x",)], "k string")
    out = heavy_hitter_estimates(
        spark, str(tmp_path / "nostate"), probes, "k"
    ).collect()
    assert out[0]["est_n"] == 0
