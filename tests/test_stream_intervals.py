"""Streaming interval coalescing: watermark-sealed islands must equal the
batch operator's islands (streaming/intervals.py)."""

from __future__ import annotations

import json


def test_stream_islands_match_batch(spark, tmp_path):
    from service_alerts_connector_spark.operators.temporal import (
        coalesce_intervals,
    )
    from service_alerts_connector_spark.streaming.intervals import (
        coalesce_intervals_stream,
    )

    # base epoch 2024-01-01; intervals in seconds offsets for readability.
    # user 7: [0,100] swallows [10,20]; [100,110] touches -> one island;
    #         [5000,5010] separate; user 8: [3,4] alone.  A final
    #         high-watermark row (user 9) pushes event time far enough for
    #         every earlier island to seal.
    base = 1704067200
    batches = [
        [(7, 0, 100), (7, 10, 20), (8, 3, 4)],
        [(7, 100, 110), (7, 5000, 5010)],
        [(9, 100000, 100001)],  # watermark pusher
    ]
    staged = tmp_path / "in"
    staged.mkdir()
    for i, rows in enumerate(batches):
        with open(staged / f"b{i}.jsonl", "w") as f:
            for u, s, e in rows:
                f.write(
                    json.dumps(
                        {
                            "user_id": u,
                            "ts_s": base + s,
                            "start_s": base + s,
                            "end_s": base + e,
                        }
                    )
                    + "\n"
                )
    stream = (
        spark.readStream.schema(
            "user_id long, ts_s long, start_s long, end_s long"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
        .selectExpr(
            "user_id",
            "CAST(ts_s AS TIMESTAMP) AS ts",
            "start_s",
            "end_s",
        )
    )
    sealed: list[tuple] = []

    def sink(batch_df, batch_id):
        sealed.extend(
            (r["user_id"], r["island_start"], r["island_end"], r["n_intervals"])
            for r in batch_df.collect()
        )

    q = (
        coalesce_intervals_stream(stream, watermark_delay="10 minutes")
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    import time

    deadline = time.time() + 120
    while time.time() < deadline and len(sealed) < 3:
        time.sleep(1)
    q.stop()

    # batch reference on users 7/8 only (9 is the watermark pusher whose
    # island stays open — the final watermark is 100001-600 < its end)
    rows = [
        (u, base + s, base + e, i)
        for i, (u, s, e) in enumerate(
            [r for b in batches[:2] for r in b]
        )
    ]
    batch_islands = {
        (r["user_id"], r["island_start"], r["island_end"], r["n_intervals"])
        for r in coalesce_intervals(
            spark.createDataFrame(
                rows, "user_id long, s long, e long, tb long"
            ),
            "user_id", "s", "e", "tb",
        ).collect()
    }
    assert set(sealed) == batch_islands
    assert len(sealed) == 3  # [0,110]x3, [5000,5010]x1 for 7; [3,4] for 8
