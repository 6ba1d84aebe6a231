"""Streaming-native dedup/upsert semantics (ST7 as a resident stream).

The batch path handles late/updated alerts with a window upsert
(operators/dedup.py).  A resident Structured Streaming deployment instead
uses engine state:

* ``dedup_by_checksum_stream`` — ``dropDuplicates`` on (Id, InputChecksum)
  with a processing-time watermark bounding state (the reference's cache
  compares against *all* history because its world is 10⁴ alerts; a 100 TB
  stream must age state out — the watermark is that policy, made explicit);
* the gold upsert itself stays in ``foreachBatch`` (parquet/Delta MERGE) —
  engine-state output modes can't express keyed last-wins to files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from service_alerts_connector_spark.constants import CHECKSUM_COL, ID_COL


def dedup_by_checksum_stream(
    stream_df: DataFrame,
    watermark_delay: str = "1 hour",
    event_time_col: str = "_arrival_ts",
) -> DataFrame:
    """Drop re-deliveries of the same (Id, checksum) within the watermark
    horizon.  Adds a processing-time arrival column if absent (file sources
    carry no event time for this feed — arrival order IS the event order,
    SURVEY §1.4: no event-time windows exist in the domain)."""
    if event_time_col not in stream_df.columns:
        stream_df = stream_df.withColumn(
            event_time_col, F.current_timestamp()
        )
    return stream_df.withWatermark(
        event_time_col, watermark_delay
    ).dropDuplicates([ID_COL, CHECKSUM_COL])


def throttle_stream(
    stream_df: DataFrame,
    key_cols: list[str] | None = None,
    event_time_col: str = "ts",
    bucket_s: int = 300,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Resident-stream analogue of the batch event throttle
    (catalog_events.q_event_throttle): at most one event per
    (user, type, tumbling bucket), enforced with
    ``dropDuplicatesWithinWatermark`` engine state instead of a window
    rank — state for a bucket ages out ``watermark_delay`` after the
    bucket's event time passes, so memory is bounded by the live horizon,
    not the stream's history.

    Semantics note vs the batch form: streaming keeps the FIRST ARRIVAL in
    each bucket (arrival order), while the batch query keeps the earliest
    event time; they agree whenever arrival order respects event time
    within a bucket (the in-order replay the e2e test drives)."""
    keys = key_cols if key_cols is not None else ["user_id", "event_type"]
    bucketed = stream_df.withColumn(
        "bucket_s",
        F.col(event_time_col).cast("long")
        - (F.col(event_time_col).cast("long") % bucket_s),
    )
    return bucketed.withWatermark(event_time_col, watermark_delay).dropDuplicatesWithinWatermark(
        keys + ["bucket_s"]
    )


def run_dedup_ingest(
    spark,
    stream_df: DataFrame,
    state_root: str,
    admitted_root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    compact_every: int | None = None,
) -> None:
    """Resident-stream corpus ingestion with near-dup admission: each
    micro-batch runs ``incremental_dedup_batch`` (O(batch) signatures + one
    semi-join against the persistent band store) and appends the admitted
    docs to a versioned dataset.  The corpus text is never re-read — the
    only cross-batch state is the band store, so the loop's per-batch cost
    is flat no matter how large the admitted corpus grows.
    ``compact_every`` compacts BOTH the band store and the admitted
    dataset every Nth batch (``parquet_io.compact_if_due`` — between
    ingests on the loop's own thread, the single-writer window
    compaction requires)."""
    from service_alerts_connector_spark.operators.textdedup import (
        BAND_STORE,
        incremental_dedup_batch,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        compact_if_due,
        read_dataset,
        write_dataset,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        admitted = incremental_dedup_batch(
            spark, state_root, batch_df, text_col, id_col
        )
        try:
            prev = read_dataset(spark, admitted_root, "admitted_docs")
            merged = prev.unionByName(admitted)
        except FileNotFoundError:
            merged = admitted
        write_dataset(merged, admitted_root, "admitted_docs")
        compact_if_due(
            spark, state_root, BAND_STORE, batch_id, compact_every
        )
        compact_if_due(
            spark, admitted_root, "admitted_docs", batch_id, compact_every
        )

    run_available_now(stream_df, _step, checkpoint_dir)


def run_substring_strip_ingest(
    spark,
    stream_df: DataFrame,
    state_root: str,
    stripped_root: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    compact_every: int | None = None,
) -> None:
    """Resident-stream SUBSTRING-level dedup: each micro-batch runs
    ``incremental_substring_strip`` (O(batch) shingles + one semi-join
    against the persistent distinct-digest store) and appends the
    stripped survivors to a versioned dataset.  The substring-granular
    sibling of ``run_dedup_ingest``: where that loop admits or rejects
    whole documents, this one deletes exactly the spans already seen
    corpus-wide and keeps each document's novel remainder.  Cross-batch
    state is only the digest store — per-batch cost stays flat as the
    corpus grows, and the sequential-ingest invariant (N micro-batches ≡
    one batch-mode ``strip_duplicate_spans`` of the concatenation, for
    increasing ids) carries over from the operator unchanged.
    ``compact_every`` compacts the digest store and the stripped dataset
    every Nth batch (see ``run_dedup_ingest``)."""
    from service_alerts_connector_spark.operators.textdedup import (
        SHINGLE_STORE,
        incremental_substring_strip,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        compact_if_due,
        read_dataset,
        write_dataset,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        stripped = incremental_substring_strip(
            spark, state_root, batch_df, id_col, text_col, k
        )
        try:
            prev = read_dataset(spark, stripped_root, "stripped_docs")
            merged = prev.unionByName(stripped)
        except FileNotFoundError:
            merged = stripped
        write_dataset(merged, stripped_root, "stripped_docs")
        compact_if_due(
            spark, state_root, SHINGLE_STORE, batch_id, compact_every
        )
        compact_if_due(
            spark, stripped_root, "stripped_docs", batch_id, compact_every
        )

    run_available_now(stream_df, _step, checkpoint_dir)


def run_semdedup_ingest(
    spark,
    stream_df: DataFrame,
    state_root: str,
    verdicts_root: str,
    checkpoint_dir: str,
    centroids_milli: list[list[int]],
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 32,
    n_bands: int = 4,
    seed: int = 7,
    max_bucket: int = 10_000,
    compact_every: int | None = None,
) -> None:
    """Resident-stream SEMANTIC dedup: each micro-batch of embedding rows
    runs ``incremental_semantic_dedup`` (O(batch) assignment/hashing +
    capped equi-joins against the persistent vector store) and appends
    the per-vector verdicts to a versioned dataset.  The embedding
    sibling of ``run_dedup_ingest``/``run_substring_strip_ingest``:
    cross-batch state is only the (cell, band, bucket)-keyed vector
    store, so per-batch cost stays flat as the corpus grows, and the
    operator's sequential-ingest invariant (id-increasing micro-batches
    ≡ batch-mode ``semantic_dedup(keep="first")`` of the concatenation)
    carries over unchanged.  Verdicts are keyed by id and deterministic,
    so the output merge dedups by id — a foreachBatch redelivery after a
    crash rewrites identical rows instead of duplicating them.
    ``compact_every`` compacts the vector store and the verdict dataset
    every Nth batch (see ``run_dedup_ingest``)."""
    from service_alerts_connector_spark.operators.similarity import (
        SEMDEDUP_STORE,
        incremental_semantic_dedup,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        compact_if_due,
        read_dataset,
        write_dataset,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        verdicts = incremental_semantic_dedup(
            spark,
            state_root,
            batch_df,
            centroids_milli,
            threshold=threshold,
            vec_col=vec_col,
            id_col=id_col,
            n_planes=n_planes,
            n_bands=n_bands,
            seed=seed,
            max_bucket=max_bucket,
        )
        try:
            prev = read_dataset(spark, verdicts_root, "semdedup_verdicts")
            merged = prev.unionByName(verdicts).dropDuplicates([id_col])
        except FileNotFoundError:
            merged = verdicts
        write_dataset(merged, verdicts_root, "semdedup_verdicts")
        compact_if_due(
            spark, state_root, SEMDEDUP_STORE, batch_id, compact_every
        )
        compact_if_due(
            spark, verdicts_root, "semdedup_verdicts", batch_id, compact_every
        )

    run_available_now(stream_df, _step, checkpoint_dir)
