"""Watermarked windowed aggregation: late-within-watermark rows merge into
their window; the streaming result equals the batch aggregation."""

from __future__ import annotations

import json

from service_alerts_connector_spark.streaming.windows import (
    windowed_event_counts,
)

EVENTS_B1 = [
    {"ts": "2024-01-01 10:05:00", "event_type": "click", "value": 1.5},
    {"ts": "2024-01-01 10:55:00", "event_type": "click", "value": 2.0},
    {"ts": "2024-01-01 11:10:00", "event_type": "view", "value": 3.0},
]
# batch 2 carries a LATE click for the 10:00 window (within the watermark)
EVENTS_B2 = [
    {"ts": "2024-01-01 10:30:00", "event_type": "click", "value": 4.0},
    {"ts": "2024-01-01 11:40:00", "event_type": "view", "value": 5.0},
]


def test_late_rows_merge_into_window(spark, tmp_path):
    staged = tmp_path / "in"
    staged.mkdir()
    for name, batch in [("b1", EVENTS_B1), ("b2", EVENTS_B2)]:
        with open(staged / f"{name}.jsonl", "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    # update-mode sink via foreachBatch: keep the latest row per (hour, etype)
    results: dict[tuple, tuple] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            results[(r["hour"], r["etype"])] = (r["n"], r["sum_value"])

    q = (
        windowed_event_counts(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # the late 10:30 click (batch 2) merged into the 10:00 window
    assert results[("2024-01-01 10:00:00", "click")] == (3, 7.5)
    assert results[("2024-01-01 11:00:00", "view")] == (2, 8.0)

    # streaming result == batch aggregation over the same rows
    batch_df = spark.read.schema(
        "ts timestamp, event_type string, value double"
    ).json(str(staged))
    from service_alerts_connector_spark.streaming.windows import (
        windowed_event_counts as agg,
    )

    batch = {
        (r["hour"], r["etype"]): (r["n"], r["sum_value"])
        for r in agg(batch_df.withWatermark("ts", "2 hours")).collect()
    }
    assert batch == results
