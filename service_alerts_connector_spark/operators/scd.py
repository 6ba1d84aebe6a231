"""Slowly-changing-dimension (type 2) history from a changelog or snapshot
stream — the lakehouse operator behind "what was this entity's state at
time T?".

``scd2_from_changelog`` collapses an ordered per-key event stream into
validity intervals: consecutive runs of the same attribute value merge into
one row with ``valid_from`` (first ts of the run) and ``valid_to`` (start
of the next run, NULL while current).  Two window scans over the same
(key × order) partitioning — Catalyst reuses ONE shuffle for both — so the
cost at 100 TB is a single exchange on the entity key, the minimum any
history build needs.  No per-group arrays are materialized: both passes are
streaming lag/lead scans, so a hot entity with millions of changes never
becomes a single giant row.

Reference parity: the reference keeps only latest-state snapshots and diffs
them (CDC, ServiceAlertBroadcaster — see ``operators/dedup.py cdc_diff``);
SCD2 is the natural extension once history must be queryable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """(key, attr, valid_from, valid_to, version) — type-2 intervals from an
    event stream.  ``version`` numbers the runs per key from 1; the open
    interval (``valid_to`` NULL) is the current state.

    Determinism: the event order is (ts, tiebreak) — the repo's rule that
    every ordering carries a key tiebreak — so equal-timestamp changes
    resolve identically everywhere."""
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    # first row of the key (lag(ts) NULL — ts itself is never null in a
    # changelog) or a null-safe attribute change
    changed: Column = F.lag(ts_col).over(w).isNull() | ~F.col(
        attr_col
    ).eqNullSafe(F.lag(attr_col).over(w))
    points = df.withColumn("_chg", changed).where(F.col("_chg"))
    w2 = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(tiebreak_col))
    return (
        points.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead("valid_from").over(w2))
        .withColumn("version", F.row_number().over(w2))
        .select(key_col, attr_col, "valid_from", "valid_to", "version")
    )
