"""Incremental corpus dedup against the persistent band store."""

from __future__ import annotations

from service_alerts_connector_spark.operators.textdedup import (
    incremental_dedup_batch,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def UNIQ_format(n: int) -> str:
    # genuinely distinct texts: every token carries the id, so two docs
    # with different n share no shingles at all
    return " ".join(f"w{n}x{j}" for j in range(10))


class UNIQ:  # keeps call sites readable: UNIQ.format(n)
    format = staticmethod(UNIQ_format)


def test_first_batch_admits_unique_drops_internal_dups(spark, tmp_path):
    root = str(tmp_path)
    batch1 = _docs(
        spark,
        [(i, UNIQ.format(i * 7919)) for i in range(5)]
        + [(100, "identical duplicate text common to several rows here")]
        + [(101, "identical duplicate text common to several rows here")],
    )
    admitted = incremental_dedup_batch(spark, root, batch1)
    ids = sorted(r["doc_id"] for r in admitted.collect())
    # both copies collide in-batch; the lowest id is the representative
    assert 100 in ids and 101 not in ids
    assert set(range(5)).issubset(ids)


def test_second_batch_dedups_against_store_not_just_batch(spark, tmp_path):
    root = str(tmp_path)
    incremental_dedup_batch(
        spark,
        root,
        _docs(spark, [(1, UNIQ.format(1)), (2, UNIQ.format(2))]),
    )
    batch2 = _docs(
        spark,
        [
            (10, UNIQ.format(1)),   # exact dup of stored doc 1 -> dropped
            (11, UNIQ.format(999)), # fresh -> admitted
        ],
    )
    admitted = sorted(
        r["doc_id"] for r in incremental_dedup_batch(spark, root, batch2).collect()
    )
    assert admitted == [11]
    # the store grew: a third batch repeating doc 11's text is now dropped
    batch3 = _docs(spark, [(20, UNIQ.format(999))])
    assert incremental_dedup_batch(spark, root, batch3).count() == 0


def test_returned_frame_survives_store_overwrite(spark, tmp_path):
    """The admitted DataFrame must stay readable after the NEXT batch
    overwrites the store (reads are pinned to immutable version dirs)."""
    root = str(tmp_path)
    a1 = incremental_dedup_batch(spark, root, _docs(spark, [(1, UNIQ.format(1))]))
    incremental_dedup_batch(spark, root, _docs(spark, [(2, UNIQ.format(2))]))
    # a1 still evaluates correctly post-overwrite
    assert [r["doc_id"] for r in a1.collect()] == [1]


def test_streaming_ingest_loop_dedups_across_batches(spark, tmp_path):
    import json

    from service_alerts_connector_spark.sources.parquet_io import read_dataset
    from service_alerts_connector_spark.streaming.dedup_stream import (
        run_dedup_ingest,
    )

    staged = tmp_path / "staged"
    staged.mkdir()
    batches = [
        [{"doc_id": 1, "text": UNIQ.format(1)},
         {"doc_id": 2, "text": UNIQ.format(2)}],
        [{"doc_id": 10, "text": UNIQ.format(1)},   # dup of stored doc 1
         {"doc_id": 11, "text": UNIQ.format(3)}],  # fresh
    ]
    for b, rows in enumerate(batches):
        with open(staged / f"b{b}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    run_dedup_ingest(
        spark, stream,
        state_root=str(tmp_path / "state"),
        admitted_root=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    admitted = sorted(
        r["doc_id"]
        for r in read_dataset(spark, str(tmp_path / "out"), "admitted_docs").collect()
    )
    assert admitted == [1, 2, 11]  # the re-ingested duplicate never lands


def test_incremental_bloom_screen_routes_batches(spark, tmp_path):
    """Persistent Bloom pre-screen: keys seen in ANY earlier batch must
    land in maybe_dup (no false negatives ever), definitely_new must be
    truly new, and the bitmap store must saturate — not grow — across
    batches."""
    from pyspark.sql import functions as F

    from service_alerts_connector_spark.operators.sketches import (
        BLOOM_STORE,
        incremental_bloom_screen,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        list_versions,
        read_dataset,
    )

    root = str(tmp_path)

    def keys(lo, hi):
        return spark.range(lo, hi).select(F.col("id").alias("k"))

    new1, dup1 = incremental_bloom_screen(spark, root, keys(0, 200), "k")
    assert dup1.count() == 0  # empty store -> nothing can be a dup
    assert new1.count() == 200

    # batch 2 overlaps 100..199 with batch 1
    new2, dup2 = incremental_bloom_screen(spark, root, keys(100, 300), "k")
    seen = set(range(100, 200))
    got_dup = {r["k"] for r in dup2.collect()}
    got_new = {r["k"] for r in new2.collect()}
    assert seen <= got_dup  # every true repeat flagged (no false negatives)
    assert got_new.isdisjoint(seen)  # definitely_new is exact
    assert got_new | got_dup == set(range(100, 300))

    # batch 3: all repeats -> nothing definitely new
    new3, dup3 = incremental_bloom_screen(spark, root, keys(0, 300), "k")
    assert new3.count() == 0
    assert dup3.count() == 300

    # the store saturates by OR, never grows beyond m/32 word rows
    versions = list_versions(root, BLOOM_STORE)
    assert len(versions) == 3
    sizes = [
        read_dataset(spark, root, BLOOM_STORE, version=v).count()
        for v in versions
    ]
    assert sizes[0] <= sizes[1] <= sizes[2] <= (1 << 20) // 32


def test_incremental_bloom_screen_intra_batch_repeat(spark, tmp_path):
    """A key arriving twice WITHIN one batch must route to maybe_dup, not
    definitely_new: the bitmap merges only after routing, so without the
    intra-batch repeat check both copies would be declared never-seen."""
    from pyspark.sql import functions as F

    from service_alerts_connector_spark.operators.sketches import (
        incremental_bloom_screen,
    )

    batch = (
        spark.range(0, 10)
        .select(F.col("id").alias("k"))
        .unionAll(spark.range(3, 5).select(F.col("id").alias("k")))
    )  # keys 3 and 4 appear twice
    new, dup = incremental_bloom_screen(spark, str(tmp_path), batch, "k")
    got_dup = sorted(r["k"] for r in dup.collect())
    got_new = sorted(r["k"] for r in new.collect())
    assert got_dup == [3, 3, 4, 4]  # both copies of each repeat flagged
    assert got_new == [0, 1, 2, 5, 6, 7, 8, 9]

    # a later batch still sees the repeats as known keys
    new2, dup2 = incremental_bloom_screen(
        spark, str(tmp_path), spark.range(3, 5).select(F.col("id").alias("k")), "k"
    )
    assert new2.count() == 0
    assert dup2.count() == 2


def test_incremental_substring_strip_equals_batch_mode(spark, tmp_path):
    """Sequential-ingest invariant: with doc ids increasing across
    batches, N incremental batches against the shingle store produce
    exactly the batch-mode strip of the concatenated corpus."""
    from service_alerts_connector_spark.operators.textdedup import (
        incremental_substring_strip,
        strip_duplicate_spans,
    )

    root = str(tmp_path)
    base = "alpha beta gamma delta epsilon zeta eta theta"
    batches = [
        [(1, f"{base} one1 one2"), (2, "unique2 text2 with2 enough2 tokens2 here2 now2 ok2")],
        [(10, f"{base} ten1 ten2"),           # repeats batch-1 substring
         (11, "unique2 text2 with2 enough2 tokens2 here2 now2 ok2")],  # exact dup of 2
        [(20, "fresh20 tokens20 each20 time20 brand20 new20 stuff20 here20"),
         (21, f"lead21 {base} tail21")],      # repeat at shifted alignment
    ]
    out = {}
    for rows in batches:
        b = spark.createDataFrame(rows, "doc_id long, text string")
        for r in incremental_substring_strip(spark, root, b, k=8).collect():
            out[r["doc_id"]] = (
                r["text"], r["n_tokens_kept"], r["n_tokens_dropped"]
            )

    union = spark.createDataFrame(
        [r for rows in batches for r in rows], "doc_id long, text string"
    )
    expected = {
        r["doc_id"]: (r["text"], r["n_tokens_kept"], r["n_tokens_dropped"])
        for r in strip_duplicate_spans(union, k=8).collect()
    }
    assert out == expected
    assert 11 not in out            # exact dup vanished
    assert out[10][2] == 8          # the repeated 8-token span stripped
    assert out[21][0].startswith("lead21") and out[21][0].endswith("tail21")


def test_streaming_substring_strip_loop(spark, tmp_path):
    """Resident-stream substring strip: micro-batches replayed through
    run_substring_strip_ingest must land exactly the batch-mode strip of
    the concatenated corpus in the output dataset."""
    import json

    from service_alerts_connector_spark.operators.textdedup import (
        strip_duplicate_spans,
    )
    from service_alerts_connector_spark.sources.parquet_io import read_dataset
    from service_alerts_connector_spark.streaming.dedup_stream import (
        run_substring_strip_ingest,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    batches = [
        [{"doc_id": 1, "text": f"{base} one1 one2"}],
        [{"doc_id": 10, "text": f"{base} ten1 ten2"},       # repeated span
         {"doc_id": 11, "text": f"{base}"}],                # fully covered
    ]
    staged = tmp_path / "staged"
    staged.mkdir()
    for b, rows in enumerate(batches):
        with open(staged / f"b{b}.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(staged))
    )
    run_substring_strip_ingest(
        spark, stream,
        state_root=str(tmp_path / "state"),
        stripped_root=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        k=8,
    )
    got = {
        r["doc_id"]: (r["text"], r["n_tokens_kept"], r["n_tokens_dropped"])
        for r in read_dataset(
            spark, str(tmp_path / "out"), "stripped_docs"
        ).collect()
    }
    union = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for rows in batches for r in rows],
        "doc_id long, text string",
    )
    expected = {
        r["doc_id"]: (r["text"], r["n_tokens_kept"], r["n_tokens_dropped"])
        for r in strip_duplicate_spans(union, k=8).collect()
    }
    assert got == expected
    assert 11 not in got and got[10][2] == 8
