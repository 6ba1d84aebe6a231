"""Stream-stream attribution join: within-window clicks match, beyond-
window clicks don't, and the streaming result equals the batch join on
the same rows."""

from __future__ import annotations

import json


IMPRESSIONS = [
    {"ad_id": 1, "imp_ts": "2024-01-01 10:00:00"},
    {"ad_id": 2, "imp_ts": "2024-01-01 10:05:00"},
    {"ad_id": 3, "imp_ts": "2024-01-01 10:10:00"},
]
CLICKS = [
    # ad 1: click 10 min after impression -> attributed
    {"ad_id": 1, "click_ts": "2024-01-01 10:10:00"},
    # ad 2: click 45 min after -> OUTSIDE the 30-min window, dropped
    {"ad_id": 2, "click_ts": "2024-01-01 10:50:00"},
    # ad 3: click BEFORE the impression -> dropped
    {"ad_id": 3, "click_ts": "2024-01-01 10:00:00"},
    # ad 1: second click still inside the window -> also attributed
    {"ad_id": 1, "click_ts": "2024-01-01 10:25:00"},
]

EXPECTED = {(1, "2024-01-01 10:10:00", 600), (1, "2024-01-01 10:25:00", 1500)}


def _write_jsonl(path, rows):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_stream_attribution_join(spark, tmp_path):
    from service_alerts_connector_spark.streaming.joins import (
        attribution_join,
    )

    _write_jsonl(tmp_path / "imp" / "b1.jsonl", IMPRESSIONS)
    _write_jsonl(tmp_path / "clk" / "b1.jsonl", CLICKS)

    imp = (
        spark.readStream.schema("ad_id long, imp_ts timestamp")
        .json(str(tmp_path / "imp"))
    )
    clk = (
        spark.readStream.schema("ad_id long, click_ts timestamp")
        .json(str(tmp_path / "clk"))
    )
    joined = attribution_join(imp, clk)

    got = set()

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            got.add(
                (
                    r["ad_id"],
                    r["click_ts"].strftime("%Y-%m-%d %H:%M:%S"),
                    r["delay_s"],
                )
            )

    q = (
        joined.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got == EXPECTED

    # batch equivalence: the same definition over static frames
    imp_b = spark.createDataFrame(
        [(r["ad_id"], r["imp_ts"]) for r in IMPRESSIONS],
        "ad_id long, imp_ts string",
    ).selectExpr("ad_id", "CAST(imp_ts AS TIMESTAMP) AS imp_ts")
    clk_b = spark.createDataFrame(
        [(r["ad_id"], r["click_ts"]) for r in CLICKS],
        "ad_id long, click_ts string",
    ).selectExpr("ad_id", "CAST(click_ts AS TIMESTAMP) AS click_ts")
    batch = {
        (
            r["ad_id"],
            r["click_ts"].strftime("%Y-%m-%d %H:%M:%S"),
            r["delay_s"],
        )
        for r in attribution_join(imp_b, clk_b).collect()
    }
    assert batch == EXPECTED
