"""Watermarked event-time windowed aggregation (streaming form of the
batch ``w5_windowed_agg`` catalog query).

The alert domain needs no event-time windows (SURVEY §1.4 — its "windows"
are publish-time filter predicates), but the engine's training-data side
does: event streams aggregate per tumbling window with a watermark bounding
both state and lateness.  Late rows within the watermark still merge into
their window; rows later than the watermark are dropped by the engine —
the explicit lateness policy a 100 TB stream must declare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def session_window_counts(
    stream_df: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming analogue of ``operators/sessions.sessionize``: per-key
    sessions closed after ``gap`` of inactivity, via ``F.session_window``
    in a watermarked aggregation — incremental session state instead of a
    batch sort, same gap semantics.  Run with append mode to emit each
    session once the watermark passes its close (update mode is rejected —
    sessions can merge), or complete mode to re-emit full state; state is
    bounded by watermark + gap either way."""
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.session_window(ts_col, gap).alias("w"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
    )


def windowed_event_counts(
    stream_df: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window count + value sum per key with bounded lateness."""
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(ts_col, window_duration).alias("w"),
            F.col(key_col).alias("etype"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0
            ).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "etype",
            "n",
            "sum_value",
        )
    )


def windowed_ohlc(
    stream_df: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Streaming form of the batch ``ohlc_downsample`` catalog query:
    open/high/low/close per (key, tumbling window) via ``min_by`` /
    ``max_by`` on a zero-padded epoch selector key, incrementally
    maintained under a watermark — late-within-watermark rows can still
    REWRITE the open/close of their window (min_by merges like any
    algebraic aggregate), which the batch≡stream equivalence test pins.

    State per group is O(1) (six scalars), so a key × window explosion is
    bounded by the watermark horizon exactly like the count/sum form.
    Ties on the selector break by the value itself (cents appended) so
    the result is deterministic without an event-id column.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    sel = F.concat(
        F.lpad(F.col(ts_col).cast("long").cast("string"), 12, "0"),
        F.lit("-"),
        F.lpad(cents.cast("string"), 16, "0"),
    )
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .select(F.col(ts_col), F.col(key_col), cents.alias("_c"), sel.alias("_k"))
        .groupBy(
            F.window(ts_col, window_duration).alias("w"),
            F.col(key_col).alias("etype"),
        )
        .agg(
            F.min_by("_c", "_k").alias("open_cents"),
            F.max("_c").alias("high_cents"),
            F.min("_c").alias("low_cents"),
            F.max_by("_c", "_k").alias("close_cents"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "etype",
            "open_cents",
            "high_cents",
            "low_cents",
            "close_cents",
            "n",
        )
    )
