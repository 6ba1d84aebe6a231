"""The composed pipeline over two streaming micro-batches: every stage,
every state table, update semantics, CDC, and email idempotence."""

from __future__ import annotations

import json
from datetime import datetime

from service_alerts_connector_spark.plans.emailer import EmailConfig
from service_alerts_connector_spark.plans.pipeline import (
    PipelineSinks,
    run_micro_batch,
)
from service_alerts_connector_spark.streaming.runner import (
    run_available_now,
    stream_raw_alerts,
)
from tests.fixtures import RAW_ALERTS

NOW = datetime(2024, 2, 14, 12, 0)


def test_two_microbatch_pipeline(spark, tmp_path):
    # session is shared across the test suite: measure cache hygiene as a
    # delta, not an absolute (another module's cache may legitimately live)
    n_cached_before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    staged = tmp_path / "staged"
    staged.mkdir()
    with open(staged / "p1.jsonl", "w") as f:
        for rec in RAW_ALERTS[:3]:
            f.write(json.dumps(rec) + "\n")
    updated = dict(RAW_ALERTS[0])
    updated["Status12"] = "Issue Resolved"
    updated["_ingest_seq"] = 100
    with open(staged / "p2.jsonl", "w") as f:
        f.write(json.dumps(updated) + "\n")

    notifications_log: list[int] = []
    outbox: list[tuple] = []
    sinks = PipelineSinks(
        feeds_root=str(tmp_path / "feeds"),
        recon_root=str(tmp_path / "recon"),
        notifier=notifications_log.extend,
        email_transport=lambda to, s, h: outbox.append((to, s)),
        email_configs=[
            EmailConfig(
                name="water-unplanned",
                recipients=("w@example.org",),
                service_area="Water & Sanitation",
                planned=False,
            )
        ],
    )

    def batch_fn(bdf, bid):
        run_micro_batch(
            bdf, str(tmp_path / "lake"), sinks=sinks, now=NOW
        )

    stream = stream_raw_alerts(spark, str(staged), max_files_per_trigger=1)
    run_available_now(stream, batch_fn, str(tmp_path / "ckpt"))

    # batch 1: alerts 23121-23123 created; batch 2: 23121 status updated
    from service_alerts_connector_spark.constants import AUGMENTED_DATASET
    from service_alerts_connector_spark.sources.parquet_io import read_dataset

    gold = {
        r["Id"]: r
        for r in read_dataset(
            spark, str(tmp_path / "lake"), AUGMENTED_DATASET
        ).collect()
    }
    assert set(gold) == {23121, 23122, 23123}
    assert gold[23121]["status"] == "Issue Resolved"  # ST7 update won
    assert gold[23121]["tweet_text"]  # re-enriched after checksum change

    # CDC: batch 1 notified all three as new; batch 2 notified nothing new
    assert sorted(notifications_log) == [23121, 23122, 23123]
    # recon wrote status-aware objects for the update
    assert (tmp_path / "recon" / "v1.2" / "23121.Issue Resolved.json").exists()

    # feeds exist and the current/unplanned v1.2 feed holds the updated row
    feed = json.loads(
        (tmp_path / "feeds" / "v1.2/service-alerts/all/unplanned.json").read_text()
    )
    ids = {r["Id"] for r in feed}
    assert 23121 in ids

    # email: exactly one send for the water unplanned alert, across BOTH
    # batches (sent-log idempotence) — plus one more when status changed
    # (new delivery key per status, reference ST6 semantics)
    assert len(outbox) == 2
    subjects = sorted(s for _, s in outbox)
    assert subjects[0].startswith("Service Alert:")  # first sight
    assert subjects[1].startswith("Updated Service Alert:")  # status change

    # cache hygiene: the email fan-out cache is released per batch — the
    # two-batch run must not leave any extra DataFrame pinned (the old
    # pending_emails-owned cache leaked one per micro-batch)
    n_cached_after = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    assert n_cached_after <= n_cached_before
