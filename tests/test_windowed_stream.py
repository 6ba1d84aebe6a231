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


def test_session_window_stream_merges_and_splits(spark, tmp_path):
    """session_window: events within the gap merge into one session; a
    larger gap opens a new one.  Streaming result equals the batch
    sessionize rollup on the same rows."""
    from service_alerts_connector_spark.streaming.windows import (
        session_window_counts,
    )

    rows = [
        {"ts": "2024-01-01 10:00:00", "user_id": 1},
        {"ts": "2024-01-01 10:20:00", "user_id": 1},  # within 30-min gap
        {"ts": "2024-01-01 12:00:00", "user_id": 1},  # new session
        {"ts": "2024-01-01 10:05:00", "user_id": 2},
    ]
    staged = tmp_path / "in"
    staged.mkdir()
    with open(staged / "b1.jsonl", "w") as f:
        for e in rows:
            f.write(json.dumps(e) + "\n")

    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .json(str(staged))
    )
    results: dict[tuple, int] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            results[(r["user_id"], r["session_start"])] = r["n_events"]

    # session_window aggregations reject update mode (sessions can merge);
    # complete re-emits the full session state per batch
    q = (
        session_window_counts(stream)
        .writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert results == {
        (1, "2024-01-01 10:00:00"): 2,
        (1, "2024-01-01 12:00:00"): 1,
        (2, "2024-01-01 10:05:00"): 1,
    }

    # batch sessionize groups the same rows into the same sessions
    from service_alerts_connector_spark.operators.sessions import sessionize
    from pyspark.sql import functions as F

    batch_df = (
        spark.read.schema("ts timestamp, user_id long")
        .json(str(staged))
        .withColumn("event_id", F.monotonically_increasing_id())
    )
    batch = {
        (r["user_id"], r["session_idx"]): r["n"]
        for r in sessionize(batch_df)
        .groupBy("user_id", "session_idx")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert batch == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_streaming_ohlc_late_row_rewrites_open(spark, tmp_path):
    """A late-but-within-watermark row EARLIER than the current window
    open must rewrite open_cents on the next trigger, and the final
    streaming state must equal the batch aggregation."""
    from service_alerts_connector_spark.streaming.windows import windowed_ohlc

    b1 = [
        {"ts": "2024-01-01 10:30:00", "event_type": "click", "value": 2.0},
        {"ts": "2024-01-01 10:45:00", "event_type": "click", "value": 5.0},
    ]
    # late 10:05 row: becomes the new OPEN of the 10:00 window
    b2 = [{"ts": "2024-01-01 10:05:00", "event_type": "click", "value": 3.0}]
    staged = tmp_path / "in"
    staged.mkdir()
    for name, batch in [("b1", b1), ("b2", b2)]:
        with open(staged / f"{name}.jsonl", "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")
    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    results: dict[tuple, tuple] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            results[(r["hour"], r["etype"])] = (
                r["open_cents"], r["high_cents"], r["low_cents"],
                r["close_cents"], r["n"],
            )

    q = (
        windowed_ohlc(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # open rewritten to the late 10:05 value (300), close stays 10:45 (500)
    assert results[("2024-01-01 10:00:00", "click")] == (300, 500, 200, 500, 3)

    batch_df = spark.read.schema(
        "ts timestamp, event_type string, value double"
    ).json(str(staged))
    batch = {
        (r["hour"], r["etype"]): (
            r["open_cents"], r["high_cents"], r["low_cents"],
            r["close_cents"], r["n"],
        )
        for r in windowed_ohlc(batch_df).collect()
    }
    assert batch == results
