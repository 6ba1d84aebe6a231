"""Gap-based sessionization unit tests."""

from __future__ import annotations

from datetime import datetime

from service_alerts_connector_spark.operators.sessions import sessionize


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp"
    )


def test_sessionize_gap_boundary(spark):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, 7, t0),
        (2, 7, datetime(2024, 1, 1, 0, 30, 0)),   # gap = 1800 -> same session
        (3, 7, datetime(2024, 1, 1, 1, 0, 1)),    # gap = 1801 -> new session
        (4, 8, t0),                                # other user -> own session
    ]
    got = {
        r["event_id"]: (r["user_id"], r["session_idx"])
        for r in sessionize(_ev(spark, rows), gap_s=1800).collect()
    }
    assert got == {1: (7, 1), 2: (7, 1), 3: (7, 2), 4: (8, 1)}


def test_sessionize_tiebreak_deterministic(spark):
    # same-timestamp events order by event_id; repartition must not change it
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [(i, 1, t0) for i in range(6)]
    out = sessionize(_ev(spark, rows).repartition(5), gap_s=60).collect()
    assert {r["session_idx"] for r in out} == {1}  # all one session
