"""Resident-stream maintenance of the two optimizer-statistics stores —
the streaming face of the incremental ANALYZE tier, mirroring
``streaming/dedup_stream.py``'s foreachBatch pattern:

* ``run_colstats_ingest`` — additive (col, val → cnt) cell histogram.
  Counts are NOT redelivery-idempotent, so the operator's exactly-once
  ledger does the deduplication: the micro-batch's engine-assigned
  ``batch_id`` (stable across Structured Streaming replays of the same
  epoch) IS the ledger key, making a crash-replayed foreachBatch call a
  committed no-op — the engine's at-least-once contract composes with
  the store's ledger into exactly-once counts.
* ``run_hll_ingest`` — per-group HLL register pages.  Max-merge is
  associative and duplicate-insensitive, so redelivery needs no ledger;
  the store saturates at groups × m rows however long the stream runs.

Both loops touch only the arriving batch plus the bounded store —
per-batch cost is flat regardless of stream history (the invariant every
incremental operator in this engine keeps).
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame


def _checkpoint_namespace(checkpoint_dir: str) -> str:
    """A ledger namespace that lives and dies WITH the checkpoint.

    Structured Streaming's ``batch_id`` is only unique within one
    checkpoint lineage: if the checkpoint is lost and rebuilt (or a
    second stream shares the state root), batch numbering restarts at 0
    and a bare ``stream-0`` ledger key would make genuinely new batches
    look already-committed — silently DROPPING their counts.  Pairing
    the key with a namespace persisted inside the checkpoint dir makes
    every checkpoint lineage's keys distinct: replays within one
    lineage stay exactly-once, and a rebuilt checkpoint (which replays
    the whole source — at-least-once across the rebuild, the engine's
    own contract) ingests under fresh keys instead of silently
    no-op'ing.  Callers who rebuild the checkpoint but keep the state
    root must therefore also re-seed or accept re-ingest — documented
    here because no ledger can distinguish 'new data' from 'replayed
    data' once the source position is lost."""
    import os
    import uuid

    os.makedirs(checkpoint_dir, exist_ok=True)
    marker = os.path.join(checkpoint_dir, "ledger_namespace.txt")
    if not os.path.exists(marker):
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write(uuid.uuid4().hex)
        os.replace(tmp, marker)
    with open(marker) as f:
        return f.read().strip()


def run_colstats_ingest(
    spark,
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    cols_fn: Callable[[], Sequence[tuple[str, "Column"]]],
    compact_every: int | None = None,
) -> None:
    """Drain the stream through ``incremental_column_stats_ingest``.

    ``cols_fn`` builds the (stat name, string expression) pairs per batch
    (Column objects need a live session — CLAUDE.md's module-level
    ``F.col`` rule — so the caller passes a builder, not columns).  The
    exactly-once ledger key is ``<checkpoint namespace>-<batch_id>`` —
    see ``_checkpoint_namespace`` for why the bare batch_id is not
    enough.  ``compact_every`` runs the loop-integrated small-file
    compaction (``parquet_io.compact_if_due``) after every Nth batch,
    between ingests on the loop's own thread (the single-writer window
    compaction requires)."""
    from service_alerts_connector_spark.operators.colstats import (
        COLSTATS_STORE,
        incremental_column_stats_ingest,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        compact_if_due,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    ns = _checkpoint_namespace(checkpoint_dir)

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        # the ingest's write_dataset commits the store; the returned
        # stats frame is lazy convenience for interactive callers — no
        # forcing needed (a per-batch collect would recompute the full
        # Σ NDV(col) aggregation with no consumer)
        incremental_column_stats_ingest(
            spark, state_root, batch_df, cols_fn(), f"{ns}-{batch_id}"
        )
        compact_if_due(
            spark, state_root, COLSTATS_STORE, batch_id, compact_every
        )

    run_available_now(stream_df, _step, checkpoint_dir)


def run_hll_ingest(
    spark,
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    key_col: str,
    group_cols: Sequence[str],
    compact_every: int | None = None,
) -> None:
    """Drain the stream through ``incremental_hll_ingest`` (register
    max-merge — naturally idempotent under replay).  ``compact_every``
    compacts the register store every Nth batch (see
    ``run_colstats_ingest``)."""
    from service_alerts_connector_spark.operators.sketches import (
        HLL_STORE,
        incremental_hll_ingest,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        compact_if_due,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        # store committed inside the ingest; returned estimate is lazy
        incremental_hll_ingest(
            spark, state_root, batch_df, key_col, list(group_cols)
        )
        compact_if_due(
            spark, state_root, HLL_STORE, batch_id, compact_every
        )

    run_available_now(stream_df, _step, checkpoint_dir)


def run_sample_ingest(
    spark,
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    key_col: str,
    payload_cols: Sequence[str],
    k: int = 256,
    compact_every: int | None = None,
) -> None:
    """Drain the stream through ``incremental_sample_ingest`` (bottom-k
    by content hash — min-merge, idempotent under replay like HLL).
    ``compact_every`` compacts the ≤k-row store every Nth batch (see
    ``run_colstats_ingest``)."""
    from service_alerts_connector_spark.operators.topk import (
        SAMPLE_STORE,
        incremental_sample_ingest,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        compact_if_due,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        # store committed inside the ingest; returned sample is lazy
        incremental_sample_ingest(
            spark, state_root, batch_df, key_col, list(payload_cols), k
        )
        compact_if_due(
            spark, state_root, SAMPLE_STORE, batch_id, compact_every
        )

    run_available_now(stream_df, _step, checkpoint_dir)


def run_novelty_ingest(
    spark,
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    shingle_k: int = 3,
    compact_every: int | None = None,
) -> None:
    """Drain a document stream through ``incremental_novelty_ingest`` —
    resident-stream maintenance of the first-occurrence shingle store
    (corpus saturation tracking, the streaming face of
    ``catalog_novelty.q_ngram_novelty``'s batch attribution).

    Set-union with first-wins attribution is replay-idempotent at the
    SET level, but the per-batch novelty METRIC is not (a replayed
    batch would re-report 0 — everything already stored), so the
    operator's ledger does the deduplication keyed on
    ``<checkpoint namespace>-<batch_id>`` (see ``_checkpoint_namespace``
    for why the bare engine batch_id is not enough).  The saturation
    curve re-derives from the store alone at any time
    (``operators/novelty.py novelty_curve``) — no separate metric log
    to keep consistent.  ``compact_every`` compacts the digest store
    every Nth batch (see ``run_colstats_ingest``)."""
    from service_alerts_connector_spark.operators.novelty import (
        NOVELTY_STORE,
        incremental_novelty_ingest,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        compact_if_due,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    ns = _checkpoint_namespace(checkpoint_dir)

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        # store committed inside the ingest; the returned 1-row stats
        # frame is eagerly checkpointed by the operator (it must be
        # forced before the version commit anyway), so it costs nothing
        # to drop here — consumers read the curve from the store.
        # Zero-padded epoch: novelty_curve orders batch_ids as STRINGS,
        # and an unpadded 'ns-10' sorts before 'ns-2' — the lpad rule
        # (lexicographic == numeric for fixed-width non-negatives).
        incremental_novelty_ingest(
            spark, state_root, batch_df, f"{ns}-{batch_id:012d}",
            k=shingle_k,
        )
        compact_if_due(
            spark, state_root, NOVELTY_STORE, batch_id, compact_every
        )

    run_available_now(stream_df, _step, checkpoint_dir)


def run_docfreq_ingest(
    spark,
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    compact_every: int | None = None,
) -> None:
    """Drain a document stream through ``incremental_docfreq_ingest`` —
    resident maintenance of the global document-frequency cells that
    ``rarity_scores_from_store`` prices new batches against.  Additive
    counts need the ledger (colstats class): keys are
    ``<checkpoint namespace>-<batch_id>``."""
    from service_alerts_connector_spark.operators.novelty import (
        DOCFREQ_STORE,
        incremental_docfreq_ingest,
    )
    from service_alerts_connector_spark.sources.parquet_io import (
        compact_if_due,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    ns = _checkpoint_namespace(checkpoint_dir)

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        # zero-padded epoch for lexicographic == arrival order (see
        # run_novelty_ingest)
        incremental_docfreq_ingest(
            spark, state_root, batch_df, f"{ns}-{batch_id:012d}"
        )
        compact_if_due(
            spark, state_root, DOCFREQ_STORE, batch_id, compact_every
        )

    run_available_now(stream_df, _step, checkpoint_dir)
