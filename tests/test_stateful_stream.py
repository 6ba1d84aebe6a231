"""applyInPandasWithState: status transitions across micro-batches with
per-key engine state."""

from __future__ import annotations

import json

from service_alerts_connector_spark.streaming.stateful import (
    detect_status_transitions,
)


def test_status_transitions_across_batches(spark, tmp_path):
    staged = tmp_path / "in"
    staged.mkdir()
    # batch 1: alert 1 Open, alert 2 Open
    with open(staged / "b1.jsonl", "w") as f:
        f.write(json.dumps({"Id": 1, "status": "Open", "_ingest_seq": 0}) + "\n")
        f.write(json.dumps({"Id": 2, "status": "Open", "_ingest_seq": 1}) + "\n")
    # batch 2: alert 1 unchanged (no emit), alert 2 progresses twice in-batch
    with open(staged / "b2.jsonl", "w") as f:
        f.write(json.dumps({"Id": 1, "status": "Open", "_ingest_seq": 2}) + "\n")
        f.write(json.dumps({"Id": 2, "status": "Crew on Site", "_ingest_seq": 3}) + "\n")
        f.write(json.dumps({"Id": 2, "status": "Issue Resolved", "_ingest_seq": 4}) + "\n")

    stream = (
        spark.readStream.schema("Id long, status string, _ingest_seq long")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    transitions: list[tuple] = []

    def sink(batch_df, batch_id):
        transitions.extend(
            (r["Id"], r["old_status"], r["new_status"], r["is_new_alert"])
            for r in batch_df.collect()
        )

    q = (
        detect_status_transitions(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # stateful timeouts keep the query alive past the drain under
    # availableNow — wait for both input batches, then stop explicitly
    import time

    deadline = time.time() + 120
    while time.time() < deadline and len(transitions) < 4:
        time.sleep(1)
    q.stop()

    key = lambda t: (t[0], t[1] or "", t[2])  # noqa: E731
    assert sorted(transitions, key=key) == [
        (1, None, "Open", True),
        (2, None, "Open", True),
        (2, "Crew on Site", "Issue Resolved", False),
        (2, "Open", "Crew on Site", False),
    ]
    # alert 1's unchanged redelivery emitted nothing — state suppressed it
