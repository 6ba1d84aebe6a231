"""Config-driven serving fan-out (SURVEY P3-P5, §3.3).

The reference enumerates 24 feed configs = {all, 7days, current} ×
{planned, unplanned} × {v0, v1, v1.1, v1.2} in Python lists
(ServiceAlertBroadcaster.py:51-59) and loops them.  The engine keeps the
configs as *data* and fans out lightweight ``filter().select()`` plans from
one cached gold scan — Catalyst reuses the scan across all 24 plans, so the
fan-out costs one pass over gold regardless of feed count.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from service_alerts_connector_spark.schemas import API_VERSION_COLS

# Reference ServiceAlertBroadcaster.py:51-59.
WINDOWS = ("all", "7days", "current")
PLANNED_STATES = (True, False)
VERSIONS = ("v0", "v1", "v1.1", "v1.2")


@dataclass(frozen=True)
class FeedConfig:
    """One serving feed = time window × planned flag × API version."""

    window: str  # 'all' | '7days' | 'current'
    planned: bool
    version: str  # 'v0' | 'v1' | 'v1.1' | 'v1.2'

    @property
    def path(self) -> str:
        kind = "planned" if self.planned else "unplanned"
        return f"{self.version}/service-alerts/{self.window}/{kind}.json"


def all_feed_configs() -> list[FeedConfig]:
    """The full 24-feed matrix (reference ServiceAlertBroadcaster.py:51-59)."""
    return [
        FeedConfig(w, p, v)
        for v in VERSIONS
        for w in WINDOWS
        for p in PLANNED_STATES
    ]


def time_window_predicate(
    df: DataFrame,
    window: str,
    now: datetime,
    expiry_col: str = "expiry_date",
):
    """P4 — ``expiry_date > anchor`` where the anchor depends on the window:

    * ``current`` → now                 (Δ = 0)
    * ``7days``   → now - 7 days        (Δ = 7d)
    * ``all``     → min(expiry) - 1 day (Δ = ∞; anchor from an agg, reference
                                         ServiceAlertBroadcaster.py:79-90/A2)

    The 'all' anchor is computed as a scalar subquery-style min() so the
    predicate shape stays uniform; at scale this is one cheap agg over a
    column that parquet stores min/max stats for.
    """
    if window == "current":
        return F.col(expiry_col) > F.lit(now)
    if window == "7days":
        return F.col(expiry_col) > F.lit(now) - F.expr("INTERVAL 7 DAYS")
    if window == "all":
        anchor = df.agg(
            (F.min(expiry_col) - F.expr("INTERVAL 1 DAY")).alias("a")
        ).collect()[0]["a"]
        if anchor is None:
            return F.lit(True)
        return F.col(expiry_col) > F.lit(anchor)
    raise ValueError(f"unknown window {window!r}")


def feed_dataframe(
    gold: DataFrame, cfg: FeedConfig, now: datetime
) -> DataFrame:
    """P4 + P5 + P3 — window predicate, planned predicate, version projection."""
    cols = [c for c in API_VERSION_COLS[cfg.version] if c in gold.columns]
    return (
        gold.where(time_window_predicate(gold, cfg.window, now))
        .where(F.col("planned") == F.lit(cfg.planned))  # P5
        .select(*cols)  # P3
    )


def generate_feeds(
    gold: DataFrame, now: datetime, configs: list[FeedConfig] | None = None
) -> Iterator[tuple[FeedConfig, DataFrame]]:
    """Yield (config, filtered DataFrame) pairs off one cached gold scan
    (reference generator at ServiceAlertBroadcaster.py:78-98)."""
    gold = gold.cache()
    for cfg in configs or all_feed_configs():
        yield cfg, feed_dataframe(gold, cfg, now)
