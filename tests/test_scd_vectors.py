"""SCD2 history build, vector normalization, shard packing."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from service_alerts_connector_spark.functions.vectors import (
    dim_stats_micro,
    normalize_embeddings,
)
from service_alerts_connector_spark.operators.chunking import pack_bins
from service_alerts_connector_spark.operators.scd import scd2_from_changelog


def test_scd2_collapses_runs_and_orders_versions(spark):
    rows = [
        # user 1: A A B A  -> 3 intervals
        (1, 1, "A"), (2, 1, "A"), (3, 1, "B"), (4, 1, "A"),
        # user 2: single state
        (1, 2, "Z"),
    ]
    df = spark.createDataFrame(rows, "ts long, uid long, st string")
    hist = scd2_from_changelog(df, "uid", "st", "ts", "ts").collect()
    got = {
        (r["uid"], r["version"]): (r["st"], r["valid_from"], r["valid_to"])
        for r in hist
    }
    assert got == {
        (1, 1): ("A", 1, 3),
        (1, 2): ("B", 3, 4),
        (1, 3): ("A", 4, None),
        (2, 1): ("Z", 1, None),
    }


def test_scd2_equal_ts_uses_tiebreak(spark):
    rows = [(5, 10, "A"), (5, 11, "B"), (6, 12, "B")]
    df = spark.createDataFrame(rows, "ts long, eid long, st string")
    df = df.withColumn("k", F.lit(1))
    hist = {
        r["version"]: (r["st"], r["valid_from"], r["valid_to"])
        for r in scd2_from_changelog(df, "k", "st", "ts", "eid").collect()
    }
    # eid tiebreak puts A before B at ts=5; the B run then absorbs ts=6
    assert hist == {1: ("A", 5, 5), 2: ("B", 5, None)}


def test_normalize_embeddings_unit_norm(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = {r["vec_id"]: r for r in normalize_embeddings(df).collect()}
    assert out[1]["norm"] == 5.0
    assert out[1]["unit"] == [0.6, 0.8]
    assert out[2]["unit"] == [0.0, 0.0]  # zero vector survives
    n = math.sqrt(sum(x * x for x in out[1]["unit"]))
    assert abs(n - 1.0) < 1e-12


def test_dim_stats_micro_exact(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0]), (2, [0.25, 2.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["dim"]: r for r in dim_stats_micro(df).collect()}
    assert got[0]["sum_micro"] == 750_000 and got[0]["n"] == 2
    assert got[1]["sum_micro"] == 1_000_000
    assert got[1]["min_micro"] == -1_000_000 and got[1]["max_micro"] == 2_000_000


def test_pack_bins_next_fit_per_shard(spark):
    rows = [(i, "s", 100) for i in range(6)]  # 600 tokens, capacity 256
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    got = {
        r["doc_id"]: (r["bin_idx"], r["offset_in_bin"])
        for r in pack_bins(df, capacity=256).collect()
    }
    # cumulative starts: 0,100,200,300,400,500
    assert got == {
        0: (0, 0), 1: (0, 100), 2: (0, 200),
        3: (1, 44), 4: (1, 144), 5: (1, 244),
    }
    # shards pack independently
    df2 = spark.createDataFrame(
        [(1, "a", 300), (2, "b", 300)], "doc_id long, source string, n_tokens int"
    )
    got2 = {r["doc_id"]: r["bin_idx"] for r in pack_bins(df2, capacity=256).collect()}
    assert got2 == {1: 0, 2: 0}
