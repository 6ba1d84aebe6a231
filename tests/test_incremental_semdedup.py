"""Incremental SemDeDup vs batch-mode first-wins: the sequential-ingest
equivalence the store machinery claims (`operators/similarity.py
incremental_semantic_dedup`), plus redelivery idempotence.  The crash-
convergence chaos test lives with the other store chaos tests in
tests/test_chaos_stores.py.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.similarity import (
    SEMDEDUP_STORE,
    incremental_semantic_dedup,
    semantic_dedup,
)
from service_alerts_connector_spark.sources.parquet_io import read_dataset

SF_DIR = "/root/testdata/sf0.001"
SHIFT = 10_000_000


def _corpus(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    shifted = emb.select(
        (F.col("vec_id") + F.lit(SHIFT)).alias("vec_id"), "embedding"
    )
    return emb, emb.unionByName(shifted)


def _centroids(emb):
    rows = (
        emb.where(F.col("vec_id").between(1, 4))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    )
    return [
        [math.floor(float(x) * 1000.0) for x in r["embedding"]] for r in rows
    ]


def _verdicts(df):
    return {r["vec_id"]: (r["cell"], r["d2_milli"], r["kept"]) for r in df.collect()}


def test_sequential_ingest_equals_batch_first_wins(spark, tmp_path):
    """Three id-increasing batches through the persistent store must
    reproduce batch-mode semantic_dedup(keep='first') over the
    concatenated corpus EXACTLY — per-vector cell, distance, verdict."""
    emb, corpus = _corpus(spark)
    cents = _centroids(emb)
    batch = dict(threshold=0.9, n_planes=32, n_bands=4, seed=7)

    expected = _verdicts(semantic_dedup(corpus, cents, keep="first", **batch))

    root = str(tmp_path / "store")
    b1 = corpus.where(F.col("vec_id") < 250)
    b2 = corpus.where(F.col("vec_id").between(250, 499))
    b3 = corpus.where(F.col("vec_id") >= SHIFT)
    got: dict = {}
    for b in (b1, b2, b3):
        got.update(
            _verdicts(incremental_semantic_dedup(spark, root, b, cents, **batch))
        )
    assert got == expected
    # every original must survive its shifted twin; every twin must drop
    kept_orig = sum(1 for k, v in got.items() if k < SHIFT and v[2])
    kept_twin = sum(1 for k, v in got.items() if k >= SHIFT and v[2])
    assert kept_orig == 500 and kept_twin == 0


def test_redelivery_is_idempotent(spark, tmp_path):
    """At-least-once: redelivering an already-ingested batch repeats its
    verdicts verbatim and leaves the store row count unchanged."""
    emb, corpus = _corpus(spark)
    cents = _centroids(emb)
    root = str(tmp_path / "store")
    b1 = corpus.where(F.col("vec_id") < 250)
    b2 = corpus.where(
        (F.col("vec_id") >= 250) & (F.col("vec_id") < SHIFT + 250)
    )
    incremental_semantic_dedup(spark, root, b1, cents)
    first = _verdicts(incremental_semantic_dedup(spark, root, b2, cents))
    n_store = read_dataset(spark, root, SEMDEDUP_STORE).count()
    redelivered = _verdicts(incremental_semantic_dedup(spark, root, b2, cents))
    assert redelivered == first
    assert read_dataset(spark, root, SEMDEDUP_STORE).count() == n_store


def test_store_side_cap_bounds_pairs(spark):
    """The store↔batch candidate join must expand at most
    min(stored, max_bucket) × batch pairs per (cell, band, bucket) —
    the round-10 uncapped-expansion finding — keeping the SMALLEST
    stored ids (the first-wins-consistent choice)."""
    from service_alerts_connector_spark.operators.similarity import (
        _store_batch_candidates,
        store_bucket_overflow,
    )

    schema = "_id long, cell int, _bkts array<int>"
    prev = spark.createDataFrame(
        [(i, 0, [7, 9]) for i in range(100)], schema
    )
    batch = spark.createDataFrame(
        [(100 + j, 0, [7, 9]) for j in range(5)], schema
    )
    cand = _store_batch_candidates(prev, batch, max_bucket=3).collect()
    # 2 bands × (3 capped store ids × 5 batch ids) = 30, never 100×5
    assert len(cand) == 30
    assert {r["id_a"] for r in cand} == {0, 1, 2}
    ov = store_bucket_overflow(prev, max_bucket=3).collect()
    assert len(ov) == 2
    assert all(r["n_ids"] == 100 and r["n_overflow"] == 97 for r in ov)


def test_hot_bucket_capped_ingest_stays_bounded_and_monotone(
    spark, tmp_path
):
    """Three ingests of identical vectors into ONE hot bucket with
    max_bucket=2: the capped semantics must stay prefix-monotone —
    batch 1's capped within-batch verdicts (only the 2 smallest ids
    pair), every LATER batch still fully dropped against the capped
    store side (smallest stored id survives the cap and matches all) —
    and the overflow audit must flag the truncation."""
    emb, _ = _corpus(spark)
    cents = _centroids(emb)
    one = emb.where(F.col("vec_id") == 1).select("embedding")
    clones = (
        spark.range(30).select(F.col("id").alias("vec_id")).crossJoin(one)
    )
    root = str(tmp_path / "store")
    got: dict = {}
    for lo in (0, 10, 20):
        b = clones.where(F.col("vec_id").between(lo, lo + 9))
        got.update(
            _verdicts(
                incremental_semantic_dedup(
                    spark, root, b, cents, max_bucket=2
                )
            )
        )
    kept = {k for k, v in got.items() if v[2]}
    # batch 1 under cap: only (0, 1) paired -> 1 dropped, 2..9 capped out
    assert kept == {0} | set(range(2, 10))
    # batches 2-3: store cap keeps smallest ids {0, 1}; id 0 drops all
    assert all(not got[k][2] for k in range(10, 30))
    from service_alerts_connector_spark.operators.similarity import (
        store_bucket_overflow,
    )

    store = read_dataset(spark, root, SEMDEDUP_STORE)
    ov = store_bucket_overflow(store, max_bucket=2)
    rows = ov.collect()
    assert rows and all(r["n_ids"] == 30 and r["n_overflow"] == 28 for r in rows)


def test_streaming_semdedup_loop(spark, tmp_path):
    """Resident-stream semantic dedup: id-increasing micro-batches
    replayed through run_semdedup_ingest must land exactly the
    batch-mode semantic_dedup(keep='first') verdicts of the
    concatenated corpus in the output dataset."""
    import json

    from service_alerts_connector_spark.streaming.dedup_stream import (
        run_semdedup_ingest,
    )

    emb, _ = _corpus(spark)
    cents = _centroids(emb)
    small = emb.where(F.col("vec_id") < 60)
    twins = small.select(
        (F.col("vec_id") + F.lit(SHIFT)).alias("vec_id"), "embedding"
    )
    corpus = small.unionByName(twins)

    staged = tmp_path / "staged"
    staged.mkdir()
    for b, batch_df in enumerate((small, twins)):
        with open(staged / f"b{b}.jsonl", "w") as f:
            for r in batch_df.orderBy("vec_id").collect():
                f.write(
                    json.dumps(
                        {
                            "vec_id": r["vec_id"],
                            "embedding": [float(x) for x in r["embedding"]],
                        }
                    )
                    + "\n"
                )

    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    run_semdedup_ingest(
        spark,
        stream,
        state_root=str(tmp_path / "state"),
        verdicts_root=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        centroids_milli=cents,
    )
    got = _verdicts(
        read_dataset(spark, str(tmp_path / "out"), "semdedup_verdicts")
    )
    expected = _verdicts(semantic_dedup(corpus, cents, keep="first"))
    assert got == expected
    # every original survives its shifted twin; every twin drops
    assert all(v[2] for k, v in got.items() if k < SHIFT)
    assert all(not v[2] for k, v in got.items() if k >= SHIFT)
