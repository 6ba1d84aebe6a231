"""The Broadcaster — gold → 24 versioned JSON feeds (SURVEY §3.3).

One cached gold scan; 24 filter/project plans; JSON array sinks.  The recon
CDC hop consumes the same gold snapshot (plans/recon.py).
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import DataFrame

from service_alerts_connector_spark.operators.feeds import (
    FeedConfig,
    all_feed_configs,
    generate_feeds,
)
from service_alerts_connector_spark.sources.json_feed import write_feed


def broadcast_feeds(
    gold: DataFrame,
    out_root: str,
    now: datetime | None = None,
    configs: list[FeedConfig] | None = None,
) -> dict[str, int]:
    """Write every feed; returns {feed path: row count} for observability.

    Counts ride along from the already-computed feed DataFrames (each is
    tiny post-filter); the gold scan is cached by generate_feeds so the
    whole fan-out is one pass over gold.
    """
    now = now or datetime.now(timezone.utc).replace(tzinfo=None)
    written: dict[str, int] = {}
    for cfg, df in generate_feeds(gold, now, configs or all_feed_configs()):
        rows = df.count()
        write_feed(df, out_root, cfg.path)
        written[cfg.path] = rows
    return written
