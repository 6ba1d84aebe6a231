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


def run_colstats_ingest(
    spark,
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    cols_fn: Callable[[], Sequence[tuple[str, "Column"]]],
) -> None:
    """Drain the stream through ``incremental_column_stats_ingest``.

    ``cols_fn`` builds the (stat name, string expression) pairs per batch
    (Column objects need a live session — CLAUDE.md's module-level
    ``F.col`` rule — so the caller passes a builder, not columns)."""
    from service_alerts_connector_spark.operators.colstats import (
        incremental_column_stats_ingest,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        incremental_column_stats_ingest(
            spark, state_root, batch_df, cols_fn(), f"stream-{batch_id}"
        ).collect()

    run_available_now(stream_df, _step, checkpoint_dir)


def run_hll_ingest(
    spark,
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    key_col: str,
    group_cols: Sequence[str],
) -> None:
    """Drain the stream through ``incremental_hll_ingest`` (register
    max-merge — naturally idempotent under replay)."""
    from service_alerts_connector_spark.operators.sketches import (
        incremental_hll_ingest,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        incremental_hll_ingest(
            spark, state_root, batch_df, key_col, list(group_cols)
        ).collect()

    run_available_now(stream_df, _step, checkpoint_dir)


def run_sample_ingest(
    spark,
    stream_df: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    key_col: str,
    payload_cols: Sequence[str],
    k: int = 256,
) -> None:
    """Drain the stream through ``incremental_sample_ingest`` (bottom-k
    by content hash — min-merge, idempotent under replay like HLL)."""
    from service_alerts_connector_spark.operators.topk import (
        incremental_sample_ingest,
    )
    from service_alerts_connector_spark.streaming.runner import (
        run_available_now,
    )

    def _step(batch_df: DataFrame, batch_id: int) -> None:
        incremental_sample_ingest(
            spark, state_root, batch_df, key_col, list(payload_cols), k
        ).collect()

    run_available_now(stream_df, _step, checkpoint_dir)
