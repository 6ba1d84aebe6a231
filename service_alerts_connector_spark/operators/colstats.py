"""Incremental optimizer-statistics maintenance — the ANALYZE pass as a
streaming ingest (batch form: ``catalog_stats.q_column_stats_mcv``, which
derives its result through this module's ``stats_from_cells``).

State is the (col_name, val → cnt) cell histogram, merged per batch by
count ADDITION.  That changes the crash story versus the HLL register
store: max-merge is idempotent, so redelivering a batch after a crash
converges for free — additive counts would DOUBLE.  Exactly-once lands
via an ingested-batch ledger committed ATOMICALLY with the counts: the
ledger rows ride in the same DataFrame (sentinel ``col_name``), so one
``write_dataset`` job commits both under one ``_SUCCESS`` marker.  A
crash after the version write but before anything else leaves a
committed version whose ledger already names the batch — the redelivery
is recognized and skipped.  A crash mid-write leaves a torn dir that
``list_versions`` never surfaces (CLAUDE.md store invariants).

Store size is bounded at Σ NDV(col) (+1 ledger row per batch) however
many rows arrive — the categorical-column contract the batch query
documents.  Stats (row/null/NDV counts, top-3 MCVs) re-derive from the
store in cell-frame work, never rescanning history.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

COLSTATS_STORE = "column_stat_cells"
_LEDGER = " ingested_batch"  # space-prefixed: collides with no identifier


def column_pairs(
    df: DataFrame, cols: Sequence[tuple[str, Column]]
) -> DataFrame:
    """Unpivot the pinned columns into raw (col_name, val) pairs — one
    narrow explode, no join, no second scan.  ``cols`` pairs each stat
    name with the string-typed expression that produces engine-stable
    text (the caller's job: never a raw double→string cast).  The shared
    first step of BOTH ANALYZE representations: ``column_cells`` reduces
    the pairs to exact count cells (Σ NDV-bounded state), and the
    sketch path feeds them to ``sketches.incremental_hll_ingest`` with
    ``group_cols=["col_name"]`` (m-bounded state for high-NDV keys —
    see ``planner.est_ndv_from_hll_store``)."""
    return df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("col_name"), expr.alias("val")
                    )
                    for name, expr in cols
                ]
            )
        ).alias("p")
    ).select("p.col_name", "p.val")


def column_cells(
    df: DataFrame, cols: Sequence[tuple[str, Column]]
) -> DataFrame:
    """Exact ANALYZE cells: ``column_pairs`` reduced to (col_name, val →
    cnt) count cells."""
    return column_pairs(df, cols).groupBy("col_name", "val").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def ndv_from_cells(cells: DataFrame) -> DataFrame:
    """(col_name, n_rows, ndv) per column from a cell histogram — the
    ≤#columns-row statistic a PLAN decision reads from the persisted
    store, never from the analyzed table.  Unlike ``stats_from_cells``
    (whose MCV ranking needs a per-column window), this is one plain
    groupBy over the cell frame: n_rows = Σcnt (nulls included, ≡
    count(*)), ndv = #non-null cells (≡ count(DISTINCT col)).  Ledger
    sentinel rows are excluded, so the frame works both on a raw
    ``column_cells`` result and on a store version that carries the
    exactly-once ledger."""
    return (
        cells.where(F.col("col_name") != _LEDGER)
        .groupBy("col_name")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.count(F.when(F.col("val").isNotNull(), F.lit(1)))
            .cast("long")
            .alias("ndv"),
        )
    )


def stats_from_cells(cells: DataFrame) -> DataFrame:
    """Per-column stats + top-3 MCVs from a cell histogram in ONE
    aggregation over a col_name-partitioned rank window (NULL cells sort
    last; ties by (cnt DESC, val ASC)) — the plan certified by the
    ``column_stats_mcv`` oracle."""
    rk_w = Window.partitionBy("col_name").orderBy(
        F.col("val").isNull().asc(), F.col("cnt").desc(), F.col("val").asc()
    )
    ranked = cells.withColumn("rk", F.row_number().over(rk_w))
    pick = lambda i, c: F.min(
        F.when((F.col("rk") == i) & F.col("val").isNotNull(), F.col(c))
    )
    return (
        ranked.groupBy("col_name")
        .agg(
            F.sum("cnt").cast("long").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("val").isNull(), F.col("cnt"))), F.lit(0)
            )
            .cast("long")
            .alias("n_null"),
            F.count(F.when(F.col("val").isNotNull(), F.lit(1)))
            .cast("long")
            .alias("ndv"),
            *[
                x
                for i in (1, 2, 3)
                for x in (
                    pick(i, "val").alias(f"mcv{i}"),
                    pick(i, "cnt").cast("long").alias(f"mcv{i}_cnt"),
                )
            ],
        )
        .orderBy("col_name")
    )


def ingested_batches(store_cells: DataFrame) -> list[str]:
    """Batch ids committed into a store frame (ledger sentinel rows)."""
    return [
        r["val"]
        for r in store_cells.where(F.col("col_name") == _LEDGER).collect()
    ]


def incremental_column_stats_ingest(
    spark,
    root: str,
    batch: DataFrame,
    cols: Sequence[tuple[str, Column]],
    batch_id: str,
) -> DataFrame:
    """O(batch) ANALYZE maintenance: add the arriving batch's cells into
    the persistent store (exactly once — a redelivered ``batch_id`` is a
    committed no-op) and return the refreshed stats.

    Invariant (pinned in tests/test_incremental_colstats.py): after any
    sequence of batches with any crash/redelivery interleaving, the
    store equals one batch-mode ``column_cells`` over the union of the
    DISTINCT delivered batches, and the stats equal
    ``stats_from_cells`` of that.  Store reads pin to the latest
    committed version; the returned stats read the newly written one
    (snapshot-write-last discipline).

    Contract limit: batches must partition the fact rows — a row
    re-sent under a NEW batch_id double-counts, and unlike the docfreq
    store (``operators/novelty.py``, whose rows carry a unique doc_id
    and therefore get a KMV doc-overlap tripwire) these batches have
    no universal row key, so the overlap is undetectable in principle:
    two batches may legitimately contain identical-valued rows.  Given
    a keyed fact, callers wanting the tripwire should ingest through a
    key-bearing wrapper and probe the novelty-store pattern.
    """
    from service_alerts_connector_spark.sources.parquet_io import (
        list_versions,
        read_dataset,
        write_dataset,
    )

    batch_cells = column_cells(batch, cols)
    ledger_row = spark.createDataFrame(
        [(_LEDGER, batch_id, 0)], "col_name string, val string, cnt long"
    )
    versions = list_versions(root, COLSTATS_STORE)
    if versions:
        prev = read_dataset(spark, root, COLSTATS_STORE, version=versions[-1])
        if batch_id in ingested_batches(prev):
            # redelivery of a committed batch: counts are additive, so
            # merging again would double-count — the ledger makes the
            # retry a no-op and the stats re-derive from what's stored
            return stats_from_cells(
                prev.where(F.col("col_name") != _LEDGER)
            )
        merged = (
            prev.unionByName(batch_cells)
            .unionByName(ledger_row)
            .groupBy("col_name", "val")
            .agg(F.sum("cnt").cast("long").alias("cnt"))
        )
    else:
        merged = batch_cells.unionByName(ledger_row)
    write_dataset(merged, root, COLSTATS_STORE)
    fresh = read_dataset(spark, root, COLSTATS_STORE)
    return stats_from_cells(fresh.where(F.col("col_name") != _LEDGER))
