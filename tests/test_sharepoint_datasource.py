"""The SharePoint Python DataSource (S1's at-scale mapping): partitioned
page reads, driver-side injectable fetcher, streaming offsets over the
append-only staged layout, and the full pipeline driven through
``spark.readStream.format("sharepoint")``."""

from __future__ import annotations

import json
from datetime import datetime

import pytest

from service_alerts_connector_spark.schemas import RAW_SCHEMA
from service_alerts_connector_spark.sources.sharepoint_datasource import (
    SEQ_STRIDE,
    register,
)
from tests.fixtures import RAW_ALERTS


@pytest.fixture()
def sharepoint_format(spark):
    register(spark)
    return spark


def _stage_pages(tmp_path, pages):
    staged = tmp_path / "staged"
    staged.mkdir(exist_ok=True)
    for i, recs in enumerate(pages):
        with open(staged / f"page-{i:04d}.jsonl", "w") as f:
            for rec in recs:
                f.write(json.dumps(rec) + "\n")
    return staged


def _dirty(rec, **extra):
    out = dict(rec)
    out.pop("_ingest_seq", None)
    out.update(
        __metadata={"type": "SP.Data.Item"},
        Attachments=[{"href": "x"}],
    )
    out.update(extra)
    return out


def test_batch_path_mode_partitioned(sharepoint_format, tmp_path):
    spark = sharepoint_format
    pages = [
        [_dirty(RAW_ALERTS[0]), _dirty(RAW_ALERTS[1])],
        [
            _dirty(RAW_ALERTS[2]),
            {"Title1": "no id", "Publish_x0020_Date": "2024-01-01T00:00:00Z"},
        ],
        [_dirty(RAW_ALERTS[3], Publish_x0020_Date=None)],  # P2-gated
    ]
    staged = _stage_pages(tmp_path, pages)
    df = spark.read.format("sharepoint").option("path", str(staged)).load()
    assert df.schema == RAW_SCHEMA
    # one partition per page file — the distributed page parse
    assert df.rdd.getNumPartitions() == 3
    rows = {r["Id"]: r for r in df.collect()}
    ids = {RAW_ALERTS[i]["Id"] for i in range(3)}
    assert set(rows) == ids  # no-Id and null-publish rows dropped
    # page-major ingest sequence: page 0 rows 0,1; page 1 row 0
    assert rows[RAW_ALERTS[0]["Id"]]["_ingest_seq"] == 0
    assert rows[RAW_ALERTS[1]["Id"]]["_ingest_seq"] == 1
    assert rows[RAW_ALERTS[2]["Id"]]["_ingest_seq"] == SEQ_STRIDE
    # record hygiene matches read_sharepoint: strings stay strings
    assert rows[RAW_ALERTS[1]["Id"]]["Start_x0020_Time"] == "23:60"


def test_batch_fetcher_mode(sharepoint_format):
    spark = sharepoint_format
    df = (
        spark.read.format("sharepoint")
        .option("fetcher", "tests.fixtures:sharepoint_demo_fetcher")
        .load()
    )
    assert df.schema == RAW_SCHEMA
    rows = {r["Id"]: r for r in df.collect()}
    # 901 gated (no publish date), no-Id row dropped by normalize
    assert set(rows) == {900, 902}
    assert rows[900]["Title1"] == "Fetched alert"
    # seq gaps where gated rows sat — identical to read_sharepoint, which
    # numbers normalized records BEFORE the publish-date gate
    assert [rows[900]["_ingest_seq"], rows[902]["_ingest_seq"]] == [0, 2]


def test_batch_requires_path_or_fetcher(sharepoint_format, tmp_path):
    spark = sharepoint_format
    with pytest.raises(Exception, match="path.*fetcher|fetcher.*path"):
        spark.read.format("sharepoint").load().collect()


def test_streaming_incremental_pages(sharepoint_format, tmp_path):
    """Offsets advance by consumed page count: a restart with the same
    checkpoint reads ONLY pages staged after the last batch."""
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    spark = sharepoint_format
    staged = _stage_pages(
        tmp_path, [[_dirty(RAW_ALERTS[0])], [_dirty(RAW_ALERTS[1])]]
    )
    ckpt = str(tmp_path / "ckpt")
    seen: list[set[int]] = []

    def batch_fn(bdf, bid):
        seen.append({r["Id"] for r in bdf.collect()})

    def stream():
        return (
            spark.readStream.format("sharepoint")
            .option("path", str(staged))
            .load()
        )

    run_available_now(stream(), batch_fn, ckpt)
    assert set().union(*seen) == {RAW_ALERTS[0]["Id"], RAW_ALERTS[1]["Id"]}

    first_rounds = len(seen)
    with open(staged / "page-0002.jsonl", "w") as f:
        f.write(json.dumps(_dirty(RAW_ALERTS[2])) + "\n")
    run_available_now(stream(), batch_fn, ckpt)
    new = set().union(*seen[first_rounds:]) if len(seen) > first_rounds else set()
    assert new == {RAW_ALERTS[2]["Id"]}  # pages 0-1 not re-delivered


def test_pipeline_through_sharepoint_source(sharepoint_format, tmp_path):
    """The whole micro-batch DAG driven from the registered source: the
    'switch the connector, keep the pipeline' path a reference user takes."""
    from service_alerts_connector_spark.constants import AUGMENTED_DATASET
    from service_alerts_connector_spark.plans.pipeline import (
        PipelineSinks,
        run_micro_batch,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    spark = sharepoint_format
    staged = _stage_pages(tmp_path, [[_dirty(r) for r in RAW_ALERTS[:3]]])
    sinks = PipelineSinks(feeds_root=str(tmp_path / "feeds"))

    def batch_fn(bdf, bid):
        run_micro_batch(
            bdf,
            str(tmp_path / "lake"),
            sinks=sinks,
            now=datetime(2024, 2, 14, 12, 0),
        )

    def stream():
        return (
            spark.readStream.format("sharepoint")
            .option("path", str(staged))
            .load()
        )

    ckpt = str(tmp_path / "ckpt")
    run_available_now(stream(), batch_fn, ckpt)
    # next poll cycle: a new page lands with an update; the resumed stream
    # delivers ONLY that page and the upsert takes it (ST7 through the
    # registered source)
    with open(staged / "page-0001.jsonl", "w") as f:
        f.write(json.dumps(_dirty(RAW_ALERTS[0], Status12="Issue Resolved")) + "\n")
    run_available_now(stream(), batch_fn, ckpt)

    gold = {
        r["Id"]: r
        for r in read_dataset(
            spark, str(tmp_path / "lake"), AUGMENTED_DATASET
        ).collect()
    }
    assert set(gold) == {RAW_ALERTS[i]["Id"] for i in range(3)}
    # both pages may land in one availableNow batch; last-wins upsert must
    # still pick the higher-_ingest_seq update (page-major seq ordering)
    assert gold[RAW_ALERTS[0]["Id"]]["status"] == "Issue Resolved"
    assert (tmp_path / "feeds" / "v1.2" / "service-alerts").exists()


def test_streaming_checkpoint_rebuild_redelivers_idempotently(
    sharepoint_format, tmp_path
):
    """A lost/rebuilt checkpoint restarts page offsets at 0 — the source's
    documented at-least-once contract across a rebuild.  The pipeline's
    last-wins upsert makes the redelivery harmless: gold after the rebuilt
    run equals gold after the first (same ids, same status)."""
    from service_alerts_connector_spark.constants import AUGMENTED_DATASET
    from service_alerts_connector_spark.plans.pipeline import run_micro_batch
    from service_alerts_connector_spark.sources.parquet_io import (
        read_dataset,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    spark = sharepoint_format
    staged = _stage_pages(tmp_path, [[_dirty(r) for r in RAW_ALERTS[:2]]])

    def batch_fn(bdf, bid):
        run_micro_batch(
            bdf, str(tmp_path / "lake"), now=datetime(2024, 2, 14, 12, 0)
        )

    def stream():
        return (
            spark.readStream.format("sharepoint")
            .option("path", str(staged))
            .load()
        )

    run_available_now(stream(), batch_fn, str(tmp_path / "ckpt1"))
    gold1 = sorted(
        map(
            tuple,
            read_dataset(
                spark, str(tmp_path / "lake"), AUGMENTED_DATASET
            ).collect(),
        )
    )

    # checkpoint lost: a FRESH checkpoint dir replays every page
    run_available_now(stream(), batch_fn, str(tmp_path / "ckpt2"))
    gold2 = sorted(
        map(
            tuple,
            read_dataset(
                spark, str(tmp_path / "lake"), AUGMENTED_DATASET
            ).collect(),
        )
    )
    assert [r[:1] for r in gold1] == [r[:1] for r in gold2]  # same ids
    ids = {r[0] for r in gold2}
    assert ids == {RAW_ALERTS[0]["Id"], RAW_ALERTS[1]["Id"]}


def test_streaming_partitioned_vs_simple_modes(sharepoint_format, tmp_path):
    """Both stream readers share the page-count offset contract: the
    default partitioned reader (executor-side parse, one partition per
    new page) and mode=simple (driver prefetch) deliver identical row
    sets over the same staged layout, each exactly once per checkpoint."""
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    spark = sharepoint_format
    staged = _stage_pages(
        tmp_path,
        [[_dirty(RAW_ALERTS[0])], [_dirty(RAW_ALERTS[1])],
         [_dirty(RAW_ALERTS[2])]],
    )

    def drain(mode, ckpt):
        rows: list[tuple] = []

        def batch_fn(bdf, bid):
            rows.extend(map(tuple, bdf.collect()))

        reader = (
            spark.readStream.format("sharepoint")
            .option("path", str(staged))
        )
        if mode:
            reader = reader.option("mode", mode)
        run_available_now(reader.load(), batch_fn, str(tmp_path / ckpt))
        return sorted(rows)

    part_rows = drain(None, "ckpt_part")
    simple_rows = drain("simple", "ckpt_simple")
    assert part_rows == simple_rows
    assert len(part_rows) == 3
    ids = {r[0] for r in part_rows}
    assert ids == {RAW_ALERTS[i]["Id"] for i in range(3)}

    # incremental resume works on the partitioned path too
    with open(staged / "page-0003.jsonl", "w") as f:
        f.write(json.dumps(_dirty(RAW_ALERTS[3])) + "\n")
    more = drain(None, "ckpt_part")  # same checkpoint: only the new page
    assert {r[0] for r in more} == {RAW_ALERTS[3]["Id"]}


def test_shrunk_staging_listing_fails_loudly(tmp_path):
    """Round-12 advice: stream offsets are INDICES into the sorted page
    listing, so a deleted or renamed page file shifts every later index
    — checkpointed replay must surface that as an error, never a
    silently truncated (or wrong-file) read."""
    from service_alerts_connector_spark.sources.sharepoint_datasource import (
        _SharePointPartitionedStreamReader,
        _SharePointStreamReader,
    )

    staged = _stage_pages(
        tmp_path,
        [[_dirty(RAW_ALERTS[i])] for i in range(3)],
    )
    opts = {"path": str(staged)}
    simple = _SharePointStreamReader(opts)
    part = _SharePointPartitionedStreamReader(opts)
    # healthy replay of the committed slice works in both readers
    assert len(list(simple.readBetweenOffsets({"pages": 0}, {"pages": 3}))) == 3
    assert len(part.partitions({"pages": 0}, {"pages": 3})) == 3

    (staged / "page-0002.jsonl").unlink()  # violate append-only staging
    with pytest.raises(RuntimeError, match="staging contract violated"):
        list(simple.readBetweenOffsets({"pages": 0}, {"pages": 3}))
    with pytest.raises(RuntimeError, match="staging contract violated"):
        part.partitions({"pages": 0}, {"pages": 3})
    with pytest.raises(RuntimeError, match="staging contract violated"):
        simple.read({"pages": 3})
    # the surviving prefix still replays — the guard is exact, not jumpy
    assert len(list(simple.readBetweenOffsets({"pages": 0}, {"pages": 2}))) == 2
