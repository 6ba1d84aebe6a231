"""Streaming online evaluation: late-within-watermark rows rewrite their
window's confusion cells (and thus accuracy/kappa), and the final
streaming state equals the batch aggregation over the same rows."""

from __future__ import annotations

import json

from service_alerts_connector_spark.streaming.metrics import (
    label_events,
    windowed_confusion,
)

SCHEMA = "ts timestamp, pred boolean, label boolean"

B1 = [
    # 10:00 window: 2 agree-positive, 1 disagree
    {"ts": "2024-01-01 10:05:00", "pred": True, "label": True},
    {"ts": "2024-01-01 10:20:00", "pred": True, "label": True},
    {"ts": "2024-01-01 10:40:00", "pred": True, "label": False},
    # 11:00 window: 1 agree-negative
    {"ts": "2024-01-01 11:10:00", "pred": False, "label": False},
]
# batch 2: a LATE disagreeing row for the 10:00 window (inside the
# watermark) — accuracy and kappa for that window must drop
B2 = [
    {"ts": "2024-01-01 10:50:00", "pred": False, "label": True},
    {"ts": "2024-01-01 11:30:00", "pred": True, "label": True},
]


def _run_stream(spark, tmp_path):
    staged = tmp_path / "in"
    staged.mkdir()
    for name, batch in [("b1", B1), ("b2", B2)]:
        with open(staged / f"{name}.jsonl", "w") as f:
            for e in batch:
                f.write(json.dumps(e) + "\n")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    results: dict[str, dict] = {}

    def sink(batch_df, batch_id):
        for r in batch_df.collect():
            results[r["window_start"]] = r.asDict()

    q = (
        windowed_confusion(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return staged, results


def test_late_row_rewrites_confusion_and_kappa(spark, tmp_path):
    staged, results = _run_stream(spark, tmp_path)

    w10 = results["2024-01-01 10:00:00"]
    # after the late row: 4 rows, 2 TP, 1 FP, 1 FN
    assert (w10["n"], w10["n11"], w10["n10"], w10["n01"], w10["n00"]) == (
        4,
        2,
        1,
        1,
        0,
    )
    assert w10["accuracy_ppm"] == (2 * 1_000_000) // 4
    # direct formula
    pe = (2 + 1) * (2 + 1) + (1 + 0) * (1 + 0)
    num, den = 4 * 2 - pe, 16 - pe
    assert (w10["num"], w10["den"]) == (num, den)
    assert w10["kappa_ppm"] == (num * 1_000_000) // den  # python // floors

    # streaming final state == batch aggregation over the same rows
    batch_df = spark.read.schema(SCHEMA).json(str(staged))
    batch = {
        r["window_start"]: r.asDict()
        for r in windowed_confusion(batch_df).collect()
    }
    assert batch == results


def test_negative_kappa_floors_identically(spark, tmp_path):
    """A window where labelers disagree more than chance → negative num;
    the explicit floor-division branch must equal python's // exactly."""
    rows = [
        # anti-correlated: preds mostly opposite to labels
        {"ts": "2024-01-01 09:05:00", "pred": True, "label": False},
        {"ts": "2024-01-01 09:10:00", "pred": True, "label": False},
        {"ts": "2024-01-01 09:15:00", "pred": False, "label": True},
        {"ts": "2024-01-01 09:20:00", "pred": True, "label": True},
    ]
    df = spark.createDataFrame(
        [(r["ts"], r["pred"], r["label"]) for r in rows],
        "ts string, pred boolean, label boolean",
    ).selectExpr("CAST(ts AS TIMESTAMP) ts", "pred", "label")
    out = {
        r["window_start"]: r.asDict() for r in windowed_confusion(df).collect()
    }
    w = out["2024-01-01 09:00:00"]
    assert w["num"] < 0
    assert w["kappa_ppm"] == (w["num"] * 1_000_000) // w["den"]


def test_label_events_matches_batch_kappa_surface(spark):
    """label_events + windowed_confusion on the real events parquet:
    summing the window cells reproduces the batch cohens_kappa counters
    (same labelers, same rows — the windowing must not lose or double
    count anything)."""
    from service_alerts_connector_spark.catalog_stats import q_cohens_kappa

    sf = "/root/testdata/sf0.001"
    from service_alerts_connector_spark.catalog import _t

    ev = label_events(_t(spark, sf, "events"))
    windows = windowed_confusion(ev, window_duration="7 days").collect()
    totals = {
        k: sum(r[k] for r in windows) for k in ("n", "n11", "n10", "n01", "n00")
    }
    ref = q_cohens_kappa(spark, sf).collect()[0]
    for k in totals:
        assert totals[k] == ref[k], k
