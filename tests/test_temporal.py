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


def _naive_coalesce(rows):
    """Pure-Python interval union: rows = (key, start, end, tiebreak)."""
    from collections import defaultdict

    out = {}
    by_key = defaultdict(list)
    for k, s, e, t in rows:
        by_key[k].append((s, t, e))
    for k, ivs in by_key.items():
        ivs.sort()
        islands = []
        cur_start = cur_end = None
        n = 0
        for s, _t, e in ivs:
            if cur_start is None or s > cur_end:
                if cur_start is not None:
                    islands.append((cur_start, cur_end, n))
                cur_start, cur_end, n = s, e, 1
            else:
                cur_end = max(cur_end, e)
                n += 1
        islands.append((cur_start, cur_end, n))
        for i, (s, e, cnt) in enumerate(islands, start=1):
            out[(k, i)] = (s, e, cnt)
    return out


def test_coalesce_intervals_matches_naive(spark):
    from service_alerts_connector_spark.operators.temporal import (
        coalesce_intervals,
    )

    # the case that distinguishes running-max from lag(prev end): a long
    # early interval [0, 100] swallows [10, 20] and [30, 40]; a lag-based
    # implementation would break at 30 because the PREVIOUS row ended at 20.
    rows = [
        (7, 0, 100, 1),
        (7, 10, 20, 2),
        (7, 30, 40, 3),
        (7, 100, 110, 4),   # touching (start == running end) -> merges
        (7, 112, 120, 5),   # strict gap -> new island
        (8, 5, 6, 6),       # other key
        (8, 6, 7, 7),
        (9, 1, 1, 8),       # zero-length interval, alone
    ]
    got = {
        (r["user_id"], r["island_id"]): (
            r["island_start"], r["island_end"], r["n_intervals"]
        )
        for r in coalesce_intervals(
            spark.createDataFrame(
                rows, "user_id long, s long, e long, tb long"
            ),
            "user_id", "s", "e", "tb",
        ).collect()
    }
    assert got == _naive_coalesce(rows)


def test_coalesce_intervals_randomized(spark):
    import random

    from service_alerts_connector_spark.operators.temporal import (
        coalesce_intervals,
    )

    rng = random.Random(42)
    rows = []
    for i in range(400):
        k = rng.randrange(5)
        s = rng.randrange(0, 500)
        rows.append((k, s, s + rng.randrange(0, 80), i))
    got = {
        (r["user_id"], r["island_id"]): (
            r["island_start"], r["island_end"], r["n_intervals"]
        )
        for r in coalesce_intervals(
            spark.createDataFrame(
                rows, "user_id long, s long, e long, tb long"
            ),
            "user_id", "s", "e", "tb",
        ).collect()
    }
    assert got == _naive_coalesce(rows)


def test_coalesce_intervals_single_exchange(spark):
    """The island-extent groupBy must reuse the window's hash partitioning
    (grouping key has the window key as a prefix): exactly ONE Exchange."""
    from service_alerts_connector_spark.operators.temporal import (
        coalesce_intervals,
    )

    df = spark.createDataFrame(
        [(7, 0, 10, 1), (7, 5, 20, 2)], "user_id long, s long, e long, tb long"
    )
    plan = (
        coalesce_intervals(df, "user_id", "s", "e", "tb")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_gap_fill_interp_hand_computed(spark):
    """Gap days draw the exact integer line between brackets: observations
    at day 0 (100c) and day 4 (500c) fill 200/300/400; an uneven span
    floors: day 1..2 between 0c@0 and 100c@3 -> 33, 66."""
    from datetime import date

    from service_alerts_connector_spark.operators.temporal import (
        gap_fill_interp,
    )

    rows = [
        (1, date(2024, 1, 1), 100),
        (1, date(2024, 1, 5), 500),
        (2, date(2024, 1, 1), 0),
        (2, date(2024, 1, 4), 100),
    ]
    df = spark.createDataFrame(rows, "user_id long, day date, cents long")
    got = {
        (r["user_id"], str(r["day"])): (r["cents_filled"], r["is_observed"])
        for r in gap_fill_interp(df, "user_id", "day", "cents").collect()
    }
    assert got[(1, "2024-01-01")] == (100, True)
    assert got[(1, "2024-01-02")] == (200, False)
    assert got[(1, "2024-01-03")] == (300, False)
    assert got[(1, "2024-01-04")] == (400, False)
    assert got[(1, "2024-01-05")] == (500, True)
    assert got[(2, "2024-01-02")] == (33, False)
    assert got[(2, "2024-01-03")] == (66, False)
