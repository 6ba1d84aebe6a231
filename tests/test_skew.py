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


def test_stratified_sample_exact_counts_and_determinism(spark):
    from pyspark.sql import functions as F

    from service_alerts_connector_spark.operators.topk import (
        stratified_sample_exact,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 90 else "small") for i in range(100)],
        "k long, grp string",
    )
    hk = F.md5(F.col("k").cast("string").cast("binary"))
    outs = []
    for parts in (1, 7):
        out = stratified_sample_exact(df.repartition(parts), ["grp"], 20, hk)
        rows = sorted((r["grp"], r["k"]) for r in out.collect())
        outs.append(rows)
        by_grp = {}
        for g, _ in rows:
            by_grp[g] = by_grp.get(g, 0) + 1
        assert by_grp == {"big": 20, "small": 10}  # small stratum kept whole
    assert outs[0] == outs[1]  # membership independent of partitioning
