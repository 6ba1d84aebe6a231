"""Count-min sketch, source mixing, quality deciles."""

from __future__ import annotations

from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.sketches import (
    cms_estimate,
    count_min_sketch,
    source_mixing,
)


def test_cms_estimate_one_sided(spark):
    rows = [(f"k{i % 7}",) for i in range(200)] + [("rare",)]
    df = spark.createDataFrame(rows, "k string")
    sketch = count_min_sketch(df, "k", depth=3, width=32)
    true = df.groupBy("k").agg(F.count(F.lit(1)).alias("true_n"))
    est = cms_estimate(sketch, true.select("k"), "k", depth=3, width=32)
    joined = true.join(est, "k").collect()
    assert len(joined) == 8
    for r in joined:
        assert r["est_n"] >= r["true_n"]  # never undercounts


def test_cms_sketch_bounded_size(spark):
    df = spark.createDataFrame([(f"k{i}",) for i in range(5000)], "k string")
    sketch = count_min_sketch(df, "k", depth=3, width=64)
    assert sketch.count() <= 3 * 64  # sparse cells never exceed depth×width
    total = sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    assert all(r["s"] == 5000 for r in total)  # each hash row sees every key


def test_cms_unseen_key_estimates_small(spark):
    df = spark.createDataFrame([("a",)] * 10, "k string")
    sketch = count_min_sketch(df, "k", depth=3, width=256)
    probe = spark.createDataFrame([("never-seen",)], "k string")
    est = cms_estimate(sketch, probe, "k", depth=3, width=256).collect()
    # with one hot key and 256 buckets, at least one of the 3 probe cells
    # is empty with overwhelming probability -> min is 0
    assert est[0]["est_n"] in (0, 10)


def test_source_mixing_rates_and_determinism(spark):
    docs = spark.createDataFrame(
        [(i, "hi" if i % 2 else "lo") for i in range(2000)],
        "doc_id long, source string",
    )
    config = spark.createDataFrame(
        [("hi", 49152), ("lo", 6554)], "source string, keep_per_65536 long"
    )
    out = source_mixing(docs, config)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    # hi keeps ~75% of 1000, lo ~10% of 1000 (hash-uniform within ~5 pp)
    assert 680 < counts["hi"] < 820
    assert 60 < counts["lo"] < 150
    # allowlist semantics: a source missing from config drops entirely
    config2 = spark.createDataFrame([("hi", 65536)], "source string, keep_per_65536 long")
    assert source_mixing(docs, config2).where("source = 'lo'").count() == 0
    # pure row function: same rows kept on re-run
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in source_mixing(docs, config).collect())
    assert a == b


def test_quality_deciles_partitioned_and_balanced(spark):
    from service_alerts_connector_spark.catalog_corpus import q_quality_deciles

    out = q_quality_deciles(spark, "/root/testdata/sf0.001")
    per = out.groupBy("source", "decile").count().collect()
    by_source: dict[str, list[int]] = {}
    for r in per:
        by_source.setdefault(r["source"], []).append(r["count"])
    for source, sizes in by_source.items():
        assert len(sizes) == 10, source  # every source fills all 10 bins
        assert max(sizes) - min(sizes) <= 1  # ntile balance property


def test_bpe_ish_token_count(spark):
    from service_alerts_connector_spark.functions.text import (
        bpe_ish_token_count,
        tokens_per_word_micro,
    )

    df = spark.createDataFrame(
        [
            (1, "hello world"),          # 2 words, 2 runs
            (2, "don't stop"),           # don ' t stop -> 4
            (3, "v2.5-beta!"),           # v 2 . 5 - beta ! -> 7
            (4, ""),                     # empty
        ],
        "id long, t string",
    )
    got = {
        r["id"]: (r["n"], r["f"])
        for r in df.select(
            "id",
            bpe_ish_token_count(F.col("t")).alias("n"),
            tokens_per_word_micro(F.col("t")).alias("f"),
        ).collect()
    }
    assert got[1] == (2, 1_000_000)
    assert got[2] == (4, 2_000_000)
    assert got[3] == (7, 7_000_000)
    assert got[4] == (0, 0)


def test_project_embeddings_deterministic_shape(spark):
    from service_alerts_connector_spark.operators.similarity import (
        project_embeddings,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {r["vec_id"]: r["projected"] for r in project_embeddings(emb, 16).collect()}
    b = {r["vec_id"]: r["projected"] for r in project_embeddings(emb, 16).collect()}
    assert a == b  # bit-deterministic
    assert all(len(v) == 16 for v in a.values())
    # different seed -> different projection
    c = {r["vec_id"]: r["projected"] for r in project_embeddings(emb, 16, seed=8).collect()}
    assert a != c
