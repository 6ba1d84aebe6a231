"""Resident-stream ANALYZE maintenance (streaming/stats_stream.py):
micro-batch replay through the colstats and HLL ingest loops must land
exactly the batch-mode result over the concatenated input — the same
streamed ≡ batch invariant the dedup stream wrappers pin."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.colstats import (
    COLSTATS_STORE,
    _LEDGER,
    column_cells,
    stats_from_cells,
)
from service_alerts_connector_spark.operators.sketches import (
    HLL_STORE,
    hll_estimate,
    hll_registers,
)
from service_alerts_connector_spark.sources.parquet_io import read_dataset
from service_alerts_connector_spark.streaming.stats_stream import (
    run_colstats_ingest,
    run_hll_ingest,
)


def _stage(tmp_path, batches):
    staged = tmp_path / "staged"
    staged.mkdir()
    for b, rows in enumerate(batches):
        with open(staged / f"b{b}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return staged


def _cols():
    return [
        ("grp", F.col("grp").cast("string")),
        ("parity", (F.col("k") % 2).cast("string")),
    ]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_streaming_colstats_loop(spark, tmp_path):
    batches = [
        [{"k": n, "grp": f"g{n % 3}"} for n in range(200)],
        [{"k": n, "grp": f"g{n % 3}"} for n in range(200, 350)],
    ]
    staged = _stage(tmp_path, batches)
    stream = (
        spark.readStream.schema("k long, grp string")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    run_colstats_ingest(
        spark,
        stream,
        state_root=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        cols_fn=_cols,
    )
    store = read_dataset(spark, str(tmp_path / "state"), COLSTATS_STORE)
    got = _rows(
        stats_from_cells(store.where(F.col("col_name") != _LEDGER))
    )
    union = spark.createDataFrame(
        [(r["k"], r["grp"]) for rows in batches for r in rows],
        "k long, grp string",
    )
    expected = _rows(stats_from_cells(column_cells(union, _cols())))
    assert got == expected
    # the ledger names both engine-assigned micro-batch epochs under the
    # checkpoint-scoped namespace (bare batch ids would collide across
    # checkpoint rebuilds — see _checkpoint_namespace)
    ledger = {
        r["val"]
        for r in store.where(F.col("col_name") == _LEDGER).collect()
    }
    assert len(ledger) == 2
    prefixes = {v.rsplit("-", 1)[0] for v in ledger}
    suffixes = {v.rsplit("-", 1)[1] for v in ledger}
    assert len(prefixes) == 1 and suffixes == {"0", "1"}
    marker = tmp_path / "ckpt" / "ledger_namespace.txt"
    assert marker.read_text() == prefixes.pop()


def test_streaming_hll_loop(spark, tmp_path):
    batches = [
        [{"k": n % 400, "grp": f"g{n % 2}"} for n in range(500)],
        [{"k": n % 700, "grp": f"g{n % 2}"} for n in range(600)],
    ]
    staged = _stage(tmp_path, batches)
    stream = (
        spark.readStream.schema("k long, grp string")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    run_hll_ingest(
        spark,
        stream,
        state_root=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        key_col="k",
        group_cols=["grp"],
    )
    store = read_dataset(spark, str(tmp_path / "state"), HLL_STORE)
    got = _rows(hll_estimate(store, ["grp"]))
    union = spark.createDataFrame(
        [(r["k"], r["grp"]) for rows in batches for r in rows],
        "k long, grp string",
    )
    expected = _rows(hll_estimate(hll_registers(union, "k", ["grp"]), ["grp"]))
    assert got == expected


def test_incremental_sample_sequential_equals_batch(spark, tmp_path):
    """The mergeable-reservoir store: 3 id-increasing ingests must hold
    exactly the batch-mode bottom-k-by-md5 sample of the concatenation;
    a redelivered batch is a no-op; the store never exceeds k rows."""
    from service_alerts_connector_spark.operators.topk import (
        SAMPLE_STORE,
        incremental_sample_ingest,
    )

    root = str(tmp_path / "store")
    k = 16

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("p"), F.col("id").cast("string")).alias("payload"),
        )

    for lo, hi in ((0, 100), (100, 250), (250, 300)):
        got = incremental_sample_ingest(
            spark, root, batch(lo, hi), "doc_id", ["doc_id", "payload"], k
        )
    expected = _rows(
        batch(0, 300)
        .select(
            F.md5(F.col("doc_id").cast("string")).alias("_h"),
            "doc_id",
            "payload",
        )
        .orderBy("_h")
        .limit(k)
    )
    assert _rows(got) == expected
    assert len(expected) == k
    # redelivery of an already-folded batch changes nothing
    again = incremental_sample_ingest(
        spark, root, batch(100, 250), "doc_id", ["doc_id", "payload"], k
    )
    assert _rows(again) == expected
    assert (
        read_dataset(spark, root, SAMPLE_STORE).count() == k
    )


def test_streaming_sample_loop(spark, tmp_path):
    from service_alerts_connector_spark.operators.topk import (
        SAMPLE_STORE,
    )
    from service_alerts_connector_spark.streaming.stats_stream import (
        run_sample_ingest,
    )

    batches = [
        [{"doc_id": n} for n in range(150)],
        [{"doc_id": n} for n in range(150, 400)],
    ]
    staged = _stage(tmp_path, batches)
    stream = (
        spark.readStream.schema("doc_id long")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    run_sample_ingest(
        spark,
        stream,
        state_root=str(tmp_path / "state"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        key_col="doc_id",
        payload_cols=["doc_id"],
        k=32,
    )
    got = _rows(read_dataset(spark, str(tmp_path / "state"), SAMPLE_STORE))
    union = spark.createDataFrame(
        [(r["doc_id"],) for rows in batches for r in rows], "doc_id long"
    )
    expected = _rows(
        union.select(
            F.md5(F.col("doc_id").cast("string")).alias("_h"), "doc_id"
        )
        .orderBy("_h")
        .limit(32)
    )
    assert got == expected


def test_sample_store_rejects_changed_k(spark, tmp_path):
    """Bottom-k truncation is irreversible: re-ingesting with a
    different k must raise instead of silently biasing the sample."""
    import pytest as _pytest

    from service_alerts_connector_spark.operators.topk import (
        incremental_sample_ingest,
    )

    root = str(tmp_path / "store")
    b = spark.range(0, 50).select(F.col("id").alias("doc_id"))
    incremental_sample_ingest(spark, root, b, "doc_id", ["doc_id"], k=16)
    with _pytest.raises(ValueError, match="k=16"):
        incremental_sample_ingest(
            spark, root, b, "doc_id", ["doc_id"], k=32
        )


def test_colstats_second_stream_same_store_not_dropped(spark, tmp_path):
    """Two streams (separate checkpoints) sharing one stats store: the
    second stream's batch 0 must NOT alias the first stream's batch-0
    ledger key — with a bare batch_id key its counts would be silently
    dropped as an already-committed redelivery."""
    batches_a = [[{"k": n, "grp": f"g{n % 3}"} for n in range(100)]]
    batches_b = [[{"k": n, "grp": f"g{n % 3}"} for n in range(100, 300)]]
    state = str(tmp_path / "state")

    for tag, batches in (("a", batches_a), ("b", batches_b)):
        sub = tmp_path / tag
        sub.mkdir()
        staged = _stage(sub, batches)
        stream = (
            spark.readStream.schema("k long, grp string")
            .option("maxFilesPerTrigger", 1)
            .json(str(staged))
        )
        run_colstats_ingest(
            spark,
            stream,
            state_root=state,
            checkpoint_dir=str(sub / "ckpt"),
            cols_fn=_cols,
        )

    store = read_dataset(spark, state, COLSTATS_STORE)
    got = _rows(stats_from_cells(store.where(F.col("col_name") != _LEDGER)))
    union = spark.createDataFrame(
        [
            (r["k"], r["grp"])
            for rows in batches_a + batches_b
            for r in rows
        ],
        "k long, grp string",
    )
    expected = _rows(stats_from_cells(column_cells(union, _cols())))
    assert got == expected  # stream B's counts present, not dropped


def test_streaming_colstats_loop_with_auto_compaction(spark, tmp_path):
    """Loop-integrated compaction (round-11 verdict #4): with
    compact_every=2 over 4 micro-batches the store compacts twice, the
    newest version is a single file, history stays committed-only, and
    the stats still equal one batch-mode pass over the concatenation."""
    from service_alerts_connector_spark.sources.parquet_io import (
        dataset_files,
        list_versions,
    )

    batches = [
        [{"k": n, "grp": f"g{n % 3}"} for n in range(lo, hi)]
        for lo, hi in ((0, 120), (120, 200), (200, 260), (260, 400))
    ]
    staged = _stage(tmp_path, batches)
    stream = (
        spark.readStream.schema("k long, grp string")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    state = str(tmp_path / "state")
    run_colstats_ingest(
        spark,
        stream,
        state_root=state,
        checkpoint_dir=str(tmp_path / "ckpt"),
        cols_fn=_cols,
        compact_every=2,
    )
    store = read_dataset(spark, state, COLSTATS_STORE)
    got = _rows(stats_from_cells(store.where(F.col("col_name") != _LEDGER)))
    union = spark.createDataFrame(
        [(r["k"], r["grp"]) for rows in batches for r in rows],
        "k long, grp string",
    )
    assert got == _rows(stats_from_cells(column_cells(union, _cols())))
    # the final batch (id 3) triggered compaction: newest version = 1 file
    assert dataset_files(state, COLSTATS_STORE) == 1
    # 4 ingest versions + 2 compaction versions, retention cap 5
    assert len(list_versions(state, COLSTATS_STORE)) == 5
    # the ledger still names exactly the 4 engine batches (compaction
    # rewrites rows, never counts)
    ledger = {
        r["val"]
        for r in store.where(F.col("col_name") == _LEDGER).collect()
    }
    assert len(ledger) == 4


def test_streaming_colstats_crash_mid_compaction_converges(
    spark, tmp_path, monkeypatch
):
    """Kill the loop DURING its in-loop compaction (torn dir, no
    _SUCCESS, query dies).  On restart the engine redelivers the batch:
    the ledger makes the re-ingest a no-op, the retried compaction
    succeeds, the torn dir is swept, and the stats equal batch-mode —
    counts are neither lost nor doubled."""
    import service_alerts_connector_spark.sources.parquet_io as pio
    from service_alerts_connector_spark.sources.parquet_io import (
        dataset_files,
    )

    real_compact = pio.compact_dataset
    state = {"armed": True}

    def crashing_compact(spark_, root_, dataset_, **kw):
        if state["armed"]:
            state["armed"] = False
            torn = (
                pio._dataset_root(root_, dataset_)
                / "versions"
                / "99991231T235959999998"
            )
            torn.mkdir(parents=True)
            (torn / "part-00000.parquet").write_bytes(b"\x00torn")
            raise RuntimeError("injected crash: died mid-compaction")
        return real_compact(spark_, root_, dataset_, **kw)

    monkeypatch.setattr(pio, "compact_dataset", crashing_compact)

    batches = [
        [{"k": n, "grp": f"g{n % 3}"} for n in range(lo, hi)]
        for lo, hi in ((0, 100), (100, 250))
    ]
    staged = _stage(tmp_path, batches)

    def make_stream():
        return (
            spark.readStream.schema("k long, grp string")
            .option("maxFilesPerTrigger", 1)
            .json(str(staged))
        )

    state_root = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    with __import__("pytest").raises(Exception, match="injected crash"):
        run_colstats_ingest(
            spark,
            make_stream(),
            state_root=state_root,
            checkpoint_dir=ckpt,
            cols_fn=_cols,
            compact_every=2,
        )

    # restart the loop on the same checkpoint: batch 1 is redelivered
    run_colstats_ingest(
        spark,
        make_stream(),
        state_root=state_root,
        checkpoint_dir=ckpt,
        cols_fn=_cols,
        compact_every=2,
    )
    store = read_dataset(spark, state_root, COLSTATS_STORE)
    got = _rows(stats_from_cells(store.where(F.col("col_name") != _LEDGER)))
    union = spark.createDataFrame(
        [(r["k"], r["grp"]) for rows in batches for r in rows],
        "k long, grp string",
    )
    assert got == _rows(stats_from_cells(column_cells(union, _cols())))
    assert dataset_files(state_root, COLSTATS_STORE) == 1  # retry compacted
    torn_dirs = [
        p.name
        for p in (
            pio._dataset_root(state_root, COLSTATS_STORE) / "versions"
        ).iterdir()
        if not (p / "_SUCCESS").exists()
    ]
    assert torn_dirs == []  # swept by the post-restart writes
