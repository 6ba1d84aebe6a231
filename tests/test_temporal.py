"""As-of join and bucketed range join unit tests (operators/temporal.py)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.temporal import (
    asof_join,
    bucketed_range_join,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_inclusive_with_ties(spark):
    left = _df(
        spark,
        [
            (1, 7, T0 + timedelta(minutes=10)),  # after both clicks
            (2, 7, T0),                          # exactly at tied clicks
            (3, 7, T0 - timedelta(minutes=1)),   # before any click
            (4, 8, T0 + timedelta(hours=1)),     # other user
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = _df(
        spark,
        [
            (100, 7, T0, 11.0),   # tied ts with 101
            (101, 7, T0, 22.0),   # same ts, larger id -> wins ties
            (102, 7, T0 + timedelta(minutes=5), 33.0),
            (103, 8, T0, 44.0),
        ],
        "click_id long, user_id long, ts timestamp, v double",
    )
    out = asof_join(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["click_id", "v"],
        right_tiebreak="click_id",
    )
    got = {r["event_id"]: (r["click_id"], r["v"]) for r in out.collect()}
    assert got == {
        1: (102, 33.0),   # latest at-or-before 00:10
        2: (101, 22.0),   # inclusive at equal ts; max id wins the tie
        3: (None, None),  # no prior right row -> left-join nulls
        4: (103, 44.0),
    }


def test_asof_atomic_payload_with_null_value(spark):
    # A legitimately-null payload field must come from the MATCHED row, not
    # fall back to an older row's non-null value.
    left = _df(spark, [(1, 5, T0 + timedelta(minutes=9))],
               "event_id long, user_id long, ts timestamp")
    right = _df(
        spark,
        [(200, 5, T0, 1.5), (201, 5, T0 + timedelta(minutes=5), None)],
        "click_id long, user_id long, ts timestamp, v double",
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        payload_cols=["click_id", "v"], right_tiebreak="click_id",
    ).collect()
    assert (out[0]["click_id"], out[0]["v"]) == (201, None)


def test_asof_repartition_invariant(spark):
    left = _df(
        spark,
        [(i, i % 3, T0 + timedelta(minutes=i)) for i in range(30)],
        "event_id long, user_id long, ts timestamp",
    )
    right = _df(
        spark,
        [(100 + i, i % 3, T0 + timedelta(minutes=2 * i), float(i)) for i in range(15)],
        "click_id long, user_id long, ts timestamp, v double",
    )
    kw = dict(on="user_id", left_ts="ts", right_ts="ts",
              payload_cols=["click_id", "v"], right_tiebreak="click_id")
    a = sorted(asof_join(left, right, **kw).collect())
    b = sorted(asof_join(left.repartition(7), right.repartition(3), **kw).collect())
    assert a == b


def _naive_range_join(points, intervals):
    return {
        (p[0], iv[0])
        for p in points
        for iv in intervals
        if iv[1] <= p[1] < iv[2]
    }


def test_bucketed_range_join_matches_naive(spark):
    # Intervals spanning multiple buckets, zero-match intervals, and points
    # sitting exactly on start (in) and end (out) boundaries.
    intervals = [
        (1, T0, T0 + timedelta(hours=3)),            # spans 4 buckets
        (2, T0 + timedelta(minutes=30), T0 + timedelta(minutes=40)),
        (3, T0 + timedelta(days=2), T0 + timedelta(days=2, hours=1)),  # empty
    ]
    points = [
        (10, T0),                           # == start of 1 -> in
        (11, T0 + timedelta(hours=3)),      # == end of 1 -> out (half-open)
        (12, T0 + timedelta(minutes=35)),   # in 1 and 2
        (13, T0 + timedelta(hours=2, minutes=59)),  # in 1 only
        (14, T0 - timedelta(seconds=1)),    # before everything
    ]
    pdf = _df(spark, points, "point_id long, point_ts timestamp")
    ivdf = _df(spark, intervals,
               "interval_id long, start_ts timestamp, end_ts timestamp")
    got = {
        (r["point_id"], r["interval_id"])
        for r in bucketed_range_join(
            pdf, ivdf, point_ts="point_ts", start_col="start_ts",
            end_col="end_ts", bucket_s=3600,
        ).collect()
    }
    assert got == _naive_range_join(points, intervals)
    # bucket width must not change results, only replication
    got_wide = {
        (r["point_id"], r["interval_id"])
        for r in bucketed_range_join(
            pdf, ivdf, point_ts="point_ts", start_col="start_ts",
            end_col="end_ts", bucket_s=86400,
        ).collect()
    }
    assert got_wide == got


def test_temporal_plans_have_no_nested_loop(spark):
    left = _df(spark, [(1, 7, T0)], "event_id long, user_id long, ts timestamp")
    right = _df(spark, [(100, 7, T0, 1.0)],
                "click_id long, user_id long, ts timestamp, v double")
    plan_a = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        payload_cols=["click_id"], right_tiebreak="click_id",
    )._jdf.queryExecution().executedPlan().toString()
    pdf = _df(spark, [(10, T0)], "point_id long, point_ts timestamp")
    ivdf = _df(spark, [(1, T0, T0 + timedelta(hours=1))],
               "interval_id long, start_ts timestamp, end_ts timestamp")
    plan_r = bucketed_range_join(
        pdf, ivdf, point_ts="point_ts", start_col="start_ts",
        end_col="end_ts",
    )._jdf.queryExecution().executedPlan().toString()
    for plan in (plan_a, plan_r):
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
