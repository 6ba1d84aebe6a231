"""Streaming online evaluation — windowed confusion counts under a
watermark (the streaming form of the batch ``cohens_kappa`` /
``rule_eval_confusion`` catalog queries).

A model gate in a live pipeline tracks agreement between a deployed rule
and arriving ground truth per time window.  The four confusion counters
are plain algebraic aggregates, so late-within-watermark rows MERGE into
their window's cells exactly like a count — the derived metrics
(accuracy, Cohen's kappa) are post-aggregation projections over the four
counters and re-emit corrected whenever a late row lands.  State per
(window) group is four longs; the watermark bounds the number of open
windows, which is the whole memory story at any stream rate.

Kappa reuses the batch query's engine-exact signed floor division
(``catalog_stats.q_cohens_kappa``): num/den are emitted raw beside the
ppm value so a monitoring sink can re-derive at any precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_confusion(
    stream_df: DataFrame,
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    pred_col: str = "pred",
    label_col: str = "label",
) -> DataFrame:
    """Per tumbling window: confusion counts of boolean ``pred`` vs
    ``label`` plus accuracy_ppm and kappa_ppm.  Works identically on a
    static frame (batch ≡ stream pinned in tests/test_streaming_metrics).
    """
    agg = (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window_duration).alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(
                F.when(F.col(pred_col) & F.col(label_col), 1).otherwise(0)
            )
            .cast("long")
            .alias("n11"),
            F.sum(
                F.when(F.col(pred_col) & ~F.col(label_col), 1).otherwise(0)
            )
            .cast("long")
            .alias("n10"),
            F.sum(
                F.when(~F.col(pred_col) & F.col(label_col), 1).otherwise(0)
            )
            .cast("long")
            .alias("n01"),
            F.sum(
                F.when(~F.col(pred_col) & ~F.col(label_col), 1).otherwise(0)
            )
            .cast("long")
            .alias("n00"),
        )
    )
    scaled = agg.select(
        F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        (
            F.col("n") * (F.col("n11") + F.col("n00"))
            - (
                (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
                + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
            )
        ).alias("num"),
        (
            F.col("n") * F.col("n")
            - (
                (F.col("n11") + F.col("n10")) * (F.col("n11") + F.col("n01"))
                + (F.col("n01") + F.col("n00")) * (F.col("n10") + F.col("n00"))
            )
        ).alias("den"),
    )
    return scaled.select(
        "window_start",
        "n",
        "n11",
        "n10",
        "n01",
        "n00",
        F.expr("((n11 + n00) * 1000000) div n").alias("accuracy_ppm"),
        "num",
        "den",
        F.expr(
            "CASE WHEN den = 0 THEN NULL "
            "WHEN num >= 0 THEN (num * 1000000) div den "
            "ELSE -(((-num) * 1000000 + den - 1) div den) END"
        )
        .cast("long")
        .alias("kappa_ppm"),
    )


def label_events(
    df: DataFrame,
    value_threshold_cents: int = 5000,
    k_threshold: int = 50,
) -> DataFrame:
    """The batch tier's deterministic labelers on the events schema:
    pred = value cents ≥ threshold, label = props k ≥ threshold — so the
    streaming metrics run on exactly the surface ``cohens_kappa``
    certifies in batch."""
    return df.select(
        "ts",
        (
            F.floor(F.col("value") * 100).cast("long")
            >= value_threshold_cents
        ).alias("pred"),
        (
            F.from_json(F.col("props"), "k INT").getField("k")
            >= k_threshold
        ).alias("label"),
    )
