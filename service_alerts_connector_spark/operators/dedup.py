"""Key-based dedup / upsert operators (SURVEY A3, A4, W4, U1-U3).

The reference's ``pd.concat((old, new)).drop_duplicates(subset=[Id],
keep='last')`` (ServiceAlertFixer.py:148-159) depends on positional order;
Spark has none, so recency is an explicit column and "last wins" is a window
``row_number() == 1`` over ``(key) ORDER BY recency DESC`` — the standard
scalable upsert plan (one shuffle on the key, AQE-skew-safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from service_alerts_connector_spark.constants import ID_COL


def dedup_last_wins(
    df: DataFrame,
    key: str | list[str] = ID_COL,
    order_col: str = "_ingest_seq",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """A3/W4 — keep the most recent row per key.

    ``tiebreak`` columns make the pick total when ``order_col`` ties (the
    reference resolves ties positionally; the engine resolves them
    deterministically).
    """
    keys = [key] if isinstance(key, str) else key
    order = [F.desc(order_col)] + [F.desc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def upsert(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str] = ID_COL,
    order_col: str = "_ingest_seq",
) -> DataFrame:
    """U1 + A3 — union old and new, last-wins per key, new preferred on ties.

    Reference ServiceAlertFixer.py:148-159 (dedup_old_data).  ``_src`` breaks
    order ties in favour of the new batch, mirroring ``keep='last'`` where new
    rows were concatenated after old ones.
    """
    keys = [key] if isinstance(key, str) else key
    tagged = old.withColumn("_src", F.lit(0)).unionByName(
        new.withColumn("_src", F.lit(1)), allowMissingColumns=True
    )
    w = Window.partitionBy(*keys).orderBy(F.desc(order_col), F.desc("_src"))
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def difference_by_key(
    df: DataFrame, remove: DataFrame, key: str | list[str] = ID_COL
) -> DataFrame:
    """U2 — rows of ``df`` whose key is absent from ``remove``
    (reference ``cache_data.drop(moving_from_cache.index)``,
    ServiceAlertAugmenter.py:569)."""
    keys = [key] if isinstance(key, str) else key
    return df.join(remove.select(*keys), keys, "left_anti")


def snapshot_diff(
    current: DataFrame, previous: DataFrame | None, keys: list[str]
) -> DataFrame:
    """J8/U3 — CDC: rows whose key-tuple is new vs the previous snapshot.

    Reference alerts-recon.py:37-47 diffs ``(Id, status)`` pairs.  With no
    previous snapshot everything is new (first run).
    """
    if previous is None:
        return current
    return current.join(previous.select(*keys), keys, "left_anti")
