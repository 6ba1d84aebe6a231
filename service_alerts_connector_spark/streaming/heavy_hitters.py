"""Streaming heavy-hitter tracking: a count-min sketch maintained across
micro-batches.

The CMS is MERGEABLE — two sketches over disjoint streams add cell-wise —
so the streaming form is exactly the batch operator run per micro-batch
plus a cell-wise merge into a tiny state table (≤ depth × width rows,
kilobytes at any corpus size).  That bounded state is the whole point: a
true heavy-hitter table over an unbounded key stream cannot be kept exact
without unbounded state, while the sketch's one-sided error (est ≥ true,
est ≤ true + εN) is fixed by (depth, width) forever.

State lives in the same versioned-parquet datasets the pipeline uses
(sources/parquet_io.py), following the snapshot-write-last rule: the
merged sketch is fully materialized (the union reads the old snapshot
lazily) before the new version is written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_alerts_connector_spark.operators.sketches import (
    cms_estimate,
    count_min_sketch,
)
from service_alerts_connector_spark.sources.parquet_io import (
    read_dataset,
    write_dataset,
)

CMS_DATASET = "cms_state"


def read_sketch(spark: SparkSession, root: str) -> DataFrame | None:
    try:
        return read_dataset(spark, root, CMS_DATASET)
    except FileNotFoundError:
        return None


def merge_sketch_batch(
    spark: SparkSession,
    root: str,
    batch_df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 256,
) -> None:
    """One micro-batch step: sketch the batch, add cell-wise into the
    stored sketch, write the new snapshot LAST (every lazy read of the old
    state is forced by the union before the overwrite — the
    plans/pipeline.py rule)."""
    batch_sketch = count_min_sketch(batch_df, key_col, depth, width)
    prev = read_sketch(spark, root)
    if prev is not None:
        merged = (
            batch_sketch.unionByName(prev.select("row", "col", "cnt"))
            .groupBy("row", "col")
            .agg(F.sum("cnt").alias("cnt"))
        )
    else:
        merged = batch_sketch
    write_dataset(merged, root, CMS_DATASET)


def heavy_hitter_estimates(
    spark: SparkSession,
    root: str,
    probes: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 256,
) -> DataFrame:
    """Point estimates for ``probes`` against the accumulated sketch —
    identical semantics to the batch ``cms_estimate`` over the full stream
    history, with only the sketch ever stored."""
    sketch = read_sketch(spark, root)
    if sketch is None:
        return probes.select(
            F.col(key_col), F.lit(0).cast("long").alias("est_n")
        )
    return cms_estimate(sketch, probes, key_col, depth, width)
