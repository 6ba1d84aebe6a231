"""Chaos/interruption coverage for the persistent versioned stores.

The stateful ingest loops (textdedup.incremental_dedup_batch,
sketches.incremental_hll_ingest) claim convergence to the batch-mode
answer under at-least-once redelivery.  Happy-path tests can't prove
that; these interrupt a real ingest at the two crash points the
snapshot-write-last discipline (CLAUDE.md) exposes:

* AFTER the version directory commits but BEFORE the ``current``
  snapshot refresh (injected by a write_dataset wrapper that skips the
  latest copy and then raises, modeling a process death between the two
  filesystem operations);
* MID version write — a torn directory with data files but no
  ``_SUCCESS`` commit marker (built directly on disk, modeling a killed
  Spark write job).

After each crash the batch is redelivered and the test asserts the
store and the returned answer converge to exactly what an uninterrupted
run produces.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import service_alerts_connector_spark.sources.parquet_io as pio
from service_alerts_connector_spark.operators.sketches import (
    HLL_STORE,
    hll_estimate,
    hll_registers,
    incremental_hll_ingest,
)
from service_alerts_connector_spark.operators.textdedup import (
    BAND_STORE,
    incremental_dedup_batch,
)
from service_alerts_connector_spark.sources.parquet_io import (
    list_versions,
    read_dataset,
)


@pytest.fixture()
def crash_before_snapshot(monkeypatch):
    """Arm write_dataset to die between the version commit and the
    ``current`` refresh — exactly once, then restore normal behavior
    (the restart)."""
    real = pio.write_dataset
    state = {"armed": False}

    def wrapper(df, root, dataset, **kw):
        if state["armed"]:
            state["armed"] = False
            kw["latest_copy"] = False
            real(df, root, dataset, **kw)
            raise RuntimeError("injected crash: died before snapshot refresh")
        return real(df, root, dataset, **kw)

    monkeypatch.setattr(pio, "write_dataset", wrapper)

    def arm():
        state["armed"] = True

    return arm


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _uniq(n: int) -> str:
    return " ".join(f"w{n}x{j}" for j in range(10))


def _store_rows(spark, root, dataset):
    return sorted(map(tuple, read_dataset(spark, root, dataset).collect()))


def test_dedup_ingest_crash_before_snapshot_converges(
    spark, tmp_path, crash_before_snapshot
):
    """Kill the band-store ingest after its version write; redeliver the
    batch.  The store must equal an uninterrupted run's store (each
    admitted doc's bands exactly once — no double admission), and the
    redelivery must admit nothing it already stored."""
    chaos, control = str(tmp_path / "chaos"), str(tmp_path / "control")
    batch1 = _docs(spark, [(i, _uniq(i * 7919)) for i in range(3)])
    batch2 = _docs(
        spark,
        [
            (10, _uniq(0)),      # exact dup of doc 0 (batch 1)
            (11, _uniq(999)),    # genuinely new
            (12, _uniq(999)),    # intra-batch dup of 11
        ],
    )

    for root in (chaos, control):
        admitted1 = sorted(
            r["doc_id"]
            for r in incremental_dedup_batch(spark, root, batch1).collect()
        )
        assert admitted1 == [0, 1, 2]

    crash_before_snapshot()
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_dedup_batch(spark, chaos, batch2).collect()

    # restart: the batch is redelivered at-least-once
    retry = incremental_dedup_batch(spark, chaos, batch2)
    # everything in batch2 now collides with the crashed attempt's own
    # stored bands — nothing is admitted twice
    assert retry.count() == 0

    clean = sorted(
        r["doc_id"]
        for r in incremental_dedup_batch(spark, control, batch2).collect()
    )
    assert clean == [11]

    chaos_store = _store_rows(spark, chaos, BAND_STORE)
    control_store = _store_rows(spark, control, BAND_STORE)
    assert chaos_store == control_store
    assert len(chaos_store) == len(set(chaos_store))  # no duplicated bands


def test_hll_ingest_crash_before_snapshot_converges(
    spark, tmp_path, crash_before_snapshot
):
    """Kill the HLL register ingest after its version write; redeliver.
    Max-merge is idempotent, so the re-merged store and the estimate must
    equal one batch-mode pass over the union of all batches."""
    root = str(tmp_path)
    b1 = spark.range(0, 2_000).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("k")
    )
    b2 = spark.range(1_500, 3_500).select(  # overlaps b1
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("k")
    )
    incremental_hll_ingest(spark, root, b1, "k", ["g"])

    crash_before_snapshot()
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_hll_ingest(spark, root, b2, "k", ["g"])

    est = incremental_hll_ingest(spark, root, b2, "k", ["g"])

    union = b1.unionByName(b2)
    batch_est = hll_estimate(hll_registers(union, "k", ["g"]), ["g"])
    assert sorted(map(tuple, est.collect())) == sorted(
        map(tuple, batch_est.collect())
    )
    assert _store_rows(spark, root, HLL_STORE) == sorted(
        map(tuple, hll_registers(union, "k", ["g"]).collect())
    )


def test_torn_version_dir_is_invisible_and_swept(spark, tmp_path):
    """A write killed mid-job leaves a version directory without
    _SUCCESS.  It must never be listed (a restarted ingest would
    otherwise pin its reads to torn state), and the next successful
    write sweeps it."""
    root = str(tmp_path)
    b1 = spark.range(0, 1_000).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("k")
    )
    incremental_hll_ingest(spark, root, b1, "k", ["g"])
    good = list_versions(root, HLL_STORE)
    assert len(good) == 1

    torn = tmp_path / HLL_STORE / "versions" / "99991231T235959999999"
    torn.mkdir(parents=True)
    (torn / "part-00000.parquet").write_bytes(b"\x00garbage: not parquet")
    assert list_versions(root, HLL_STORE) == good  # torn dir invisible

    # the redelivered batch pins its read to the committed version and
    # converges exactly as if the torn write never happened
    b2 = spark.range(500, 2_000).select(
        (F.col("id") % 2).cast("string").alias("g"), F.col("id").alias("k")
    )
    est = incremental_hll_ingest(spark, root, b2, "k", ["g"])
    union = b1.unionByName(b2)
    batch_est = hll_estimate(hll_registers(union, "k", ["g"]), ["g"])
    assert sorted(map(tuple, est.collect())) == sorted(
        map(tuple, batch_est.collect())
    )
    assert not torn.exists()  # swept by the successful write's prune pass


def test_substring_store_crash_before_snapshot_converges(
    spark, tmp_path, crash_before_snapshot
):
    """Kill the shingle-store ingest after its version write; redeliver.
    Distinct-union merge is idempotent: the store equals an
    uninterrupted run's, and the redelivered batch finds all its
    shingles stored — every doc strips to nothing new (no span is ever
    double-admitted)."""
    from service_alerts_connector_spark.operators.textdedup import (
        SHINGLE_STORE,
        incremental_substring_strip,
    )

    chaos, control = str(tmp_path / "chaos"), str(tmp_path / "control")
    b1 = _docs(spark, [(1, _uniq(7)), (2, _uniq(8))])
    b2 = _docs(spark, [(10, _uniq(9)), (11, _uniq(7))])  # 11 dups doc 1

    for root in (chaos, control):
        assert incremental_substring_strip(spark, root, b1, k=8).count() == 2

    crash_before_snapshot()
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_substring_strip(spark, chaos, b2, k=8).collect()

    retry = {
        r["doc_id"]: r["n_tokens_dropped"]
        for r in incremental_substring_strip(spark, chaos, b2, k=8).collect()
    }
    # redelivery: every batch-2 shingle is already stored, so both docs
    # strip fully and vanish — nothing is admitted twice
    assert retry == {}

    clean = {
        r["doc_id"]: r["n_tokens_dropped"]
        for r in incremental_substring_strip(spark, control, b2, k=8).collect()
    }
    assert 11 not in clean and clean[10] == 0  # normal run: 10 novel, 11 dup

    assert _store_rows(spark, chaos, SHINGLE_STORE) == _store_rows(
        spark, control, SHINGLE_STORE
    )


def test_semdedup_store_crash_before_snapshot_converges(
    spark, tmp_path, crash_before_snapshot
):
    """Kill the semdedup vector-store ingest after its version write;
    redeliver.  The distinct-by-id merge is idempotent: the store equals
    an uninterrupted run's and the redelivered batch's verdicts repeat
    verbatim (a redelivered vector meets its own id only on the excluded
    equal-id join side)."""
    import math

    from pyspark.sql import functions as F

    from service_alerts_connector_spark.operators.similarity import (
        SEMDEDUP_STORE,
        incremental_semantic_dedup,
    )

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    cents = [
        [math.floor(float(x) * 1000.0) for x in r["embedding"]]
        for r in emb.where(F.col("vec_id").between(1, 4))
        .orderBy("vec_id")
        .select("embedding")
        .collect()
    ]
    b1 = emb.where(F.col("vec_id") < 100)
    b2 = emb.where(F.col("vec_id").between(100, 199)).unionByName(
        emb.where(F.col("vec_id") < 50).select(
            (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"),
            "embedding",
        )
    )  # batch 2 carries twins of batch 1's first 50 vectors

    chaos, control = str(tmp_path / "chaos"), str(tmp_path / "control")
    for root in (chaos, control):
        incremental_semantic_dedup(spark, root, b1, cents).collect()

    crash_before_snapshot()
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_semantic_dedup(spark, chaos, b2, cents).collect()

    def verd(root):
        return {
            r["vec_id"]: r["kept"]
            for r in incremental_semantic_dedup(
                spark, root, b2, cents
            ).collect()
        }

    retry, clean = verd(chaos), verd(control)
    assert retry == clean
    # the 50 twins drop against the stored batch-1 vectors on both paths
    assert sum(1 for k, v in clean.items() if k >= 10_000_000 and not v) == 50

    def store_ids(root):
        return sorted(
            r["_id"]
            for r in read_dataset(spark, root, SEMDEDUP_STORE)
            .select("_id")
            .collect()
        )

    assert store_ids(chaos) == store_ids(control)


def test_sample_store_crash_before_snapshot_converges(
    spark, tmp_path, crash_before_snapshot
):
    """Kill the sample ingest after its version write; redeliver.
    Bottom-k-by-hash is a min-merge, so the re-merged store must equal
    one batch-mode bottom-k over the union of all batches."""
    from service_alerts_connector_spark.operators.topk import (
        SAMPLE_STORE,
        incremental_sample_ingest,
    )

    root = str(tmp_path)
    k = 16

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("doc_id"))

    incremental_sample_ingest(
        spark, root, batch(0, 500), "doc_id", ["doc_id"], k
    )

    crash_before_snapshot()
    with pytest.raises(RuntimeError, match="injected crash"):
        incremental_sample_ingest(
            spark, root, batch(400, 900), "doc_id", ["doc_id"], k
        )

    got = incremental_sample_ingest(
        spark, root, batch(400, 900), "doc_id", ["doc_id"], k
    )
    expected = (
        batch(0, 900)
        .select(
            F.md5(F.col("doc_id").cast("string")).alias("_h"), "doc_id"
        )
        .orderBy("_h")
        .limit(k)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, expected.collect())
    )
    assert read_dataset(spark, root, SAMPLE_STORE).count() == k


def test_compaction_preserves_data_and_survives_crash(
    spark, tmp_path, crash_before_snapshot
):
    """compact_dataset must (a) reduce the file count without changing a
    single row, (b) land as a NEW committed version with history intact,
    and (c) inherit the store crash discipline: a compaction killed
    after its version write leaves the store fully serviceable and the
    retry converges."""
    from service_alerts_connector_spark.sources.parquet_io import (
        compact_dataset,
        dataset_files,
        write_dataset,
    )

    root = str(tmp_path)
    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("string").alias("g"),
    )
    write_dataset(df.repartition(16), root, "wide")
    assert dataset_files(root, "wide") == 16
    before = _store_rows(spark, root, "wide")

    compact_dataset(spark, root, "wide", target_files=2)
    assert dataset_files(root, "wide") == 2
    assert _store_rows(spark, root, "wide") == before
    assert len(list_versions(root, "wide")) == 2  # history preserved

    # crash between the compaction's version write and snapshot refresh
    crash_before_snapshot()
    with pytest.raises(RuntimeError, match="injected crash"):
        compact_dataset(spark, root, "wide", target_files=1)
    # the store still serves identical data...
    assert _store_rows(spark, root, "wide") == before
    # ...and the redelivered compaction converges
    compact_dataset(spark, root, "wide", target_files=1)
    assert dataset_files(root, "wide") == 1
    assert _store_rows(spark, root, "wide") == before


def test_compaction_detects_concurrent_commit_during_rewrite(
    spark, tmp_path, monkeypatch
):
    """Round-12 advice: the pre-rewrite version re-check cannot see an
    ingest that commits WHILE the rewrite job runs — the compacted
    snapshot of the older pinned state then supersedes it (lost update).
    compact_dataset must re-verify after its write returns and raise, so
    the violation of the single-writer contract is detected (the lost
    batch's ledger is absent from the compacted latest, so an
    exactly-once redelivery converges)."""
    import service_alerts_connector_spark.sources.parquet_io as pio

    root = str(tmp_path)
    df = spark.range(0, 1_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("string").alias("g"),
    )
    pio.write_dataset(df.repartition(8), root, "wide")
    before = _store_rows(spark, root, "wide")

    real = pio.write_dataset
    state = {"armed": True}

    def racing(d, r, name, **kw):
        if state["armed"]:
            state["armed"] = False
            # a concurrent ingest commits just as the rewrite's own
            # write begins — past the pre-check, inside the race window
            real(
                spark.range(5).selectExpr(
                    "id AS k", "CAST(id % 7 AS STRING) AS g"
                ),
                root,
                "wide",
            )
        return real(d, r, name, **kw)

    monkeypatch.setattr(pio, "write_dataset", racing)
    with pytest.raises(RuntimeError, match="committed while the rewrite"):
        pio.compact_dataset(spark, root, "wide", target_files=1)
    # the store still serves a committed snapshot (the stale compaction —
    # detection, not rollback; redelivering the lost batch converges)
    assert len(_store_rows(spark, root, "wide")) == len(before)
