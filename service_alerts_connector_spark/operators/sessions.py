"""Gap-based sessionization (event-stream analytics).

Beyond the reference's operator surface (its feeds are snapshot-based),
but core to any event/training-data pipeline: group a user's events into
sessions separated by inactivity gaps.  Pure window expressions — one
shuffle on the user key, no Python.

At 100 TB: the two windows share the same (user, ts) partitioning, so
Catalyst plans one Exchange + one Sort reused by both; skewed hub users
are single partitions — pre-filter bots or salt via ``operators/skew``.
The streaming analogue is ``F.session_window`` in a watermarked
aggregation (`streaming/`): same session semantics, incremental state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_s: int = 1800,
) -> DataFrame:
    """Assign a per-user ``session_idx`` (1-based): a new session starts
    when the gap from the user's previous event exceeds ``gap_s`` seconds.

    Gap arithmetic is on floor-to-second epochs (``ts.cast("long")``) so
    any engine reproduces the same boundaries — sub-second timestamp
    representations differ across engines, floored seconds do not.
    Ordering carries the ``id_col`` tiebreak (repo determinism rule).
    """
    order = [F.asc(ts_col), F.asc(id_col)]
    w = Window.partitionBy(user_col).orderBy(*order)
    sec = F.col(ts_col).cast("long")
    prev = F.lag(sec).over(w)
    new_sess = F.when(
        prev.isNull() | ((sec - prev) > gap_s), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # two projections: a window function can't nest inside a window
    # aggregate; both windows share the (user, ts) sort, so Catalyst plans
    # one Exchange + one Sort feeding both
    return (
        events.withColumn("_new_session", new_sess)
        .withColumn("session_idx", F.sum("_new_session").over(wsum))
        .drop("_new_session")
    )
