"""KMV distinct sketch + deterministic hash split (operators/sketches.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.sketches import (
    hash_split,
    kmv_distinct,
    split_bounds,
)

SF = "/root/testdata/sf0.001"


def test_kmv_exact_below_k(spark):
    # fewer than k distinct keys -> the estimate IS the exact count
    df = spark.createDataFrame(
        [(g, i % 10) for g in ("a", "b") for i in range(50)], "g string, k long"
    )
    got = {r["g"]: r["kmv_distinct"] for r in kmv_distinct(df, "k", ["g"], k=64).collect()}
    assert got == {"a": 10, "b": 10}


def test_kmv_estimate_within_tolerance(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    est = {
        r["l_returnflag"]: r["kmv_distinct"]
        for r in kmv_distinct(li, "l_partkey", ["l_returnflag"], k=64).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for flag, n in exact.items():
        if n < 64:
            assert est[flag] == n
        else:  # ~1/sqrt(k-2) relative error; allow 4 sigma
            assert abs(est[flag] - n) / n < 0.55, (flag, est[flag], n)


def test_kmv_salted_matches_unsalted(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = sorted(kmv_distinct(li, "l_partkey", ["l_returnflag"], k=32).collect())
    salted = sorted(
        kmv_distinct(li, "l_partkey", ["l_returnflag"], k=32, salt_buckets=8).collect()
    )
    assert plain == salted


def test_hash_split_deterministic_and_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(13), "doc_id").collect()
    }
    assert a == b
    assert set(a.values()) <= {"train", "val", "test"}


def test_hash_split_fractions_roughly_hold(spark):
    df = spark.range(20000).withColumnRenamed("id", "doc_id")
    counts = {
        r["split"]: r["n"]
        for r in hash_split(df, "doc_id").groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    n = sum(counts.values())
    assert n == 20000
    assert abs(counts["train"] / n - 0.8) < 0.02
    assert abs(counts["val"] / n - 0.1) < 0.02
    assert abs(counts["test"] / n - 0.1) < 0.02


def test_hash_split_membership_stable_under_append(spark):
    # membership is a pure row function: a row's split never changes when
    # the corpus grows (re-snapshot safety)
    small = spark.range(100).withColumnRenamed("id", "doc_id")
    big = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big, "doc_id").collect()}
    assert all(b[k] == v for k, v in a.items())


def test_split_bounds_cumulative():
    bounds = split_bounds()
    assert [b for _, b in bounds] == [52428, 58982, 65536]
    names = [n for n, _ in bounds]
    assert names == ["train", "val", "test"]


def test_bloom_no_false_negatives(spark):
    """Every true member must pass the filter regardless of sizing."""
    from service_alerts_connector_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    keys = spark.range(0, 300, 3).select(F.col("id").alias("k"))  # 0,3,6,...
    bloom = bloom_build(keys, "k", m_bits=1 << 10, k=4)
    fact = spark.range(600).select(F.col("id").alias("k"))
    passed = {r["k"] for r in bloom_probe(fact, bloom, "k", m_bits=1 << 10, k=4).collect()}
    members = set(range(0, 300, 3))
    assert members <= passed  # zero false negatives
    # and with 100 keys in 1024 bits the filter must actually prune
    assert len(passed) < 600


def test_bloom_fp_rate_in_expected_band(spark):
    """m=4096, k=3, n=200 -> theoretical fp ~ (1-e^(-3*200/4096))^3 ~ 0.25%;
    assert the observed rate over 5000 non-members stays well under 5%."""
    from service_alerts_connector_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    keys = spark.range(200).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", m_bits=4096, k=3)
    nonmembers = spark.range(10_000, 15_000).select(F.col("id").alias("k"))
    n_fp = bloom_probe(nonmembers, bloom, "k", m_bits=4096, k=3).count()
    assert n_fp / 5000 < 0.05


def test_bloom_filters_merge_by_or(spark):
    """Two independently built filters OR-merged must behave like the
    filter of the union key set (the mergeability 100 TB streams rely on)."""
    from service_alerts_connector_spark.operators.sketches import (
        bloom_build,
        bloom_probe,
    )

    a = bloom_build(spark.range(50).select(F.col("id").alias("k")), "k")
    b = bloom_build(
        spark.range(1000, 1050).select(F.col("id").alias("k")), "k"
    )
    merged = (
        a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))
    )
    both = bloom_build(
        spark.range(50).select(F.col("id").alias("k")).unionByName(
            spark.range(1000, 1050).select(F.col("id").alias("k"))
        ),
        "k",
    )
    assert {tuple(r) for r in merged.collect()} == {
        tuple(r) for r in both.collect()
    }


def test_histogram_quantiles_bounds_exact_percentiles(spark):
    """The log2-bucket estimate must be >= the exact percentile and < 2x
    it (one-bucket resolution), per group."""
    from service_alerts_connector_spark.operators.sketches import (
        histogram_quantiles,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    est = {
        r["lang"]: r
        for r in histogram_quantiles(df, "n_chars", ["lang"]).collect()
    }
    exact = df.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("p50"),
        F.expr("percentile(n_chars, 0.9)").alias("p90"),
        F.expr("percentile(n_chars, 0.99)").alias("p99"),
    ).collect()
    for r in exact:
        e = est[r["lang"]]
        for q, p in (("q500", "p50"), ("q900", "p90"), ("q990", "p99")):
            assert e[q] >= r[p] * 0.99  # upper bound (float percentile fuzz)
            assert e[q] < max(2 * r[p], r[p] + 2)  # one-bucket resolution


def test_histogram_quantiles_cells_merge(spark):
    """Sketch of (A union B) == merged sketches of A and B: the phase-1
    cells add, so cross-shard rollups need no re-scan."""
    from service_alerts_connector_spark.operators.sketches import (
        histogram_quantiles,
    )

    a = spark.range(1, 1000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    b = spark.range(500, 4000).select(F.lit("g").alias("g"), F.col("id").alias("v"))
    union_est = histogram_quantiles(a.unionByName(b), "v", ["g"]).collect()[0]
    # merging = just unioning the raw rows before the sketch in this API;
    # equivalence of cell-addition is what the bucket function guarantees:
    # same value -> same bucket regardless of which shard it arrived in
    again = histogram_quantiles(b.unionByName(a), "v", ["g"]).collect()[0]
    assert tuple(union_est) == tuple(again)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------
def test_hll_estimate_within_tolerance(spark):
    # 20k distinct keys >> 2.5·m (m=256): raw-HLL regime, no zero registers;
    # standard error ~1.04/sqrt(256) ≈ 6.5%, assert a lenient 3-sigma band.
    from service_alerts_connector_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    df = spark.range(20_000).select(
        F.lit("g").alias("g"), F.col("id").alias("k")
    )
    regs = hll_registers(df, "k", ["g"])
    [row] = hll_estimate(regs, ["g"]).collect()
    assert row["zero_registers"] == 0
    assert abs(row["hll_estimate"] - 20_000) / 20_000 < 0.20


def test_hll_registers_merge_by_max(spark):
    # registers built on shards and max-merged == registers on the union:
    # the property that lets a 100 TB rollup tree combine per-partition
    # register pages without re-scanning.
    from service_alerts_connector_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    df = spark.range(5_000).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    left = df.where(F.col("k") % 2 == 0)
    right = df.where(F.col("k") % 2 == 1)
    merged = (
        hll_registers(left, "k", ["g"])
        .unionByName(hll_registers(right, "k", ["g"]))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    whole = hll_registers(df, "k", ["g"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # and the merged estimate equals the whole-corpus estimate exactly
    assert (
        hll_estimate(merged, ["g"]).collect()
        == hll_estimate(whole, ["g"]).collect()
    )


def test_hll_duplicate_insensitive(spark):
    # HLL needs no distinct pre-pass: duplicates hit the same register with
    # the same rho, so a 100×-duplicated corpus yields identical registers.
    from service_alerts_connector_spark.operators.sketches import hll_registers

    base = spark.range(1_000).select(F.lit("g").alias("g"), F.col("id").alias("k"))
    dup = base.unionByName(base).unionByName(base)
    assert sorted(map(tuple, hll_registers(dup, "k", ["g"]).collect())) == sorted(
        map(tuple, hll_registers(base, "k", ["g"]).collect())
    )


def test_incremental_hll_matches_batch(spark, tmp_path):
    # streaming-analogue invariant: after N ingest batches the stored
    # registers equal one batch-mode pass over the union, so the estimate
    # is identical — no history rescan.
    from service_alerts_connector_spark.operators.sketches import (
        HLL_STORE,
        hll_estimate,
        hll_registers,
        incremental_hll_ingest,
    )
    from service_alerts_connector_spark.sources.parquet_io import read_dataset

    root = str(tmp_path)
    batches = [
        spark.range(i * 2_000, (i + 1) * 2_000 + 500).select(  # overlapping
            (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("k")
        )
        for i in range(3)
    ]
    for b in batches:
        est = incremental_hll_ingest(spark, root, b, "k", ["g"])
    union = batches[0].unionByName(batches[1]).unionByName(batches[2])
    batch_est = hll_estimate(hll_registers(union, "k", ["g"]), ["g"])
    assert sorted(map(tuple, est.collect())) == sorted(
        map(tuple, batch_est.collect())
    )
    stored = read_dataset(spark, root, HLL_STORE)
    whole = hll_registers(union, "k", ["g"])
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_kmv_overlap_exact_below_k(spark):
    """When both sets fit inside one synopsis the merged synopsis holds
    the whole union, so every output column is exact."""
    from service_alerts_connector_spark.operators.sketches import (
        kmv_set_overlap,
        kmv_synopsis,
    )

    a = spark.range(0, 100).select(F.col("id").alias("k"))
    b = spark.range(60, 160).select(F.col("id").alias("k"))
    row = kmv_set_overlap(
        kmv_synopsis(a, "k", k=256), kmv_synopsis(b, "k", k=256), k=256
    ).collect()[0]
    assert row["n_merged"] == 160  # |union| < k → exact
    assert row["union_est"] == 160
    assert row["c_common"] == 40
    assert row["intersect_est"] == 40


def test_kmv_overlap_estimate_within_tolerance(spark):
    """Above k the bottom-k estimator lands within ~3/sqrt(k) of the true
    union and intersection sizes (k=256 → ~20%); membership flags come
    from the synopses, so the estimate is deterministic and
    partitioning-invariant."""
    from service_alerts_connector_spark.operators.sketches import (
        kmv_set_overlap,
        kmv_synopsis,
    )

    a = spark.range(0, 4_000).select(F.col("id").alias("k"))
    b = spark.range(2_000, 6_000).select(F.col("id").alias("k"))
    est = kmv_set_overlap(
        kmv_synopsis(a, "k", k=256), kmv_synopsis(b, "k", k=256), k=256
    )
    row = est.collect()[0]
    assert abs(row["union_est"] - 6_000) / 6_000 < 0.2
    assert abs(row["intersect_est"] - 2_000) / 2_000 < 0.35
    # deterministic under repartition
    row2 = kmv_set_overlap(
        kmv_synopsis(a.repartition(7), "k", k=256),
        kmv_synopsis(b.repartition(3), "k", k=256),
        k=256,
    ).collect()[0]
    assert tuple(row) == tuple(row2)
