"""Skew-mitigation operator tests: salted results must equal plain results."""

from __future__ import annotations

from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_left,
)


def test_salted_aggregate_matches_plain(spark):
    # hot key: 'dup' carries 90% of rows
    rows = [("dup" if i % 10 else f"k{i}", float(i)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k string, v double")
    plain = {
        r["k"]: (r["n"], r["s"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["n"], r["s"])
        for r in salted_aggregate(
            df,
            ["k"],
            [F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")],
            [F.sum("n").alias("n"), F.sum("s").alias("s")],
        ).collect()
    }
    assert salted == plain


def test_salted_aggregate_min_max_merge(spark):
    rows = [(f"g{i % 3}", i) for i in range(300)]
    df = spark.createDataFrame(rows, "k string, v long")
    out = {
        r["k"]: (r["lo"], r["hi"])
        for r in salted_aggregate(
            df,
            ["k"],
            [F.min("v").alias("lo"), F.max("v").alias("hi")],
            [F.min("lo").alias("lo"), F.max("hi").alias("hi")],
        ).collect()
    }
    assert out["g0"] == (0, 297)
    assert out["g1"] == (1, 298)


def test_salted_broadcast_left_matches_plain(spark):
    probe = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", 0), ("miss", 1)],
        "k string, v long",
    )
    build = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unused", "U")], "k string, label string"
    )
    plain = sorted(
        (r["k"], r["v"], r["label"])
        for r in probe.join(build, "k", "left").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["label"])
        for r in salted_broadcast_left(probe, build, "k").collect()
    )
    assert salted == plain  # same rows incl. the unmatched 'miss' -> null
