"""MERGE (upsert-on-key) over the dataset store — the Delta Lake seam.

SURVEY §7's build plan names Delta Lake as the production backing for the
mutable datasets (gold cache, seen-store, band store).  This module makes
that swap explicit instead of implicit prose:

* with ``delta-spark`` importable (a lakehouse deployment), ``merge_upsert_
  dataset`` compiles to a real ``DeltaTable.merge`` — ACID row-level
  upsert, no table rewrite, concurrent-writer safe.  The branch is
  import-gated and contract-tested with a mock (tests/test_lakehouse.py,
  same discipline as the Sedona gate in tests/test_sedona_contract.py);
  this container has no delta-spark, so it never executes live here.
* without it, the fallback reproduces MERGE semantics over the versioned
  parquet store (``parquet_io``): read the previous version PINNED to its
  immutable directory, apply ``operators.dedup.upsert`` (last-wins per
  key, new batch preferred on order ties — reference
  ServiceAlertFixer.py:148-159), and write a NEW version.  Write
  amplification is the whole table per merge — the honest cost of MERGE
  on plain parquet, and exactly what the Delta branch removes.

Both branches agree on semantics by construction: the update batch is
first deduped per key (Delta's MERGE requires unique source keys; the
fallback gets the identical result through the same window), and the
match-update condition ``u.order >= t.order`` mirrors the fallback's
(order desc, new-batch-wins-ties) ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from service_alerts_connector_spark.constants import ID_COL

try:  # pragma: no cover — delta-spark is not installed in this container
    from delta.tables import DeltaTable  # type: ignore  # noqa: F401

    HAVE_DELTA = True
except ImportError:
    HAVE_DELTA = False


def merge_upsert_dataset(
    spark: SparkSession,
    root: str,
    dataset: str,
    updates: DataFrame,
    key: str | list[str] = ID_COL,
    order_col: str = "_ingest_seq",
    use_delta: bool | None = None,
) -> None:
    """MERGE ``updates`` into ``<root>/<dataset>`` by ``key``.

    Matched rows update when the incoming ``order_col`` is >= the stored
    one (ties go to the new batch); unmatched rows insert.  Equivalent to
    ``operators.dedup.upsert(old, new)`` materialized — asserted by
    tests/test_lakehouse.py::test_fallback_merge_matches_upsert.
    """
    from service_alerts_connector_spark.operators.dedup import (
        dedup_last_wins,
        upsert,
    )

    keys = [key] if isinstance(key, str) else list(key)
    # unique source keys: Delta MERGE rejects multi-match sources, and the
    # fallback wants the same one-row-per-key batch for parity
    batch = dedup_last_wins(updates, key=keys, order_col=order_col)

    if use_delta is None:
        use_delta = HAVE_DELTA
    if use_delta:
        target = DeltaTable.forPath(spark, f"{root}/{dataset}")
        cond = " AND ".join(f"t.`{k}` = u.`{k}`" for k in keys)
        (
            target.alias("t")
            .merge(batch.alias("u"), cond)
            .whenMatchedUpdateAll(
                condition=f"u.`{order_col}` >= t.`{order_col}`"
            )
            .whenNotMatchedInsertAll()
            .execute()
        )
        return

    from service_alerts_connector_spark.sources.parquet_io import (
        list_versions,
        read_dataset,
        write_dataset,
    )

    versions = list_versions(root, dataset)
    if versions:
        # pinned to the immutable version dir — snapshot-write-last: the
        # lazy read must survive the store gaining a new version below
        old = read_dataset(spark, root, dataset, version=versions[-1])
        merged = upsert(old, batch, key=keys, order_col=order_col)
    else:
        merged = batch
    write_dataset(merged, root, dataset)
