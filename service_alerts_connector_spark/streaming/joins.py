"""Watermarked stream-stream interval join (ad-attribution shape).

The one Structured Streaming join a training-data/event pipeline runs
constantly: match a follow-up event stream (clicks) to its trigger stream
(impressions) within an attribution window.  Both sides carry watermarks
and the join condition carries the time interval, so Spark bounds the
buffered state on each side — impressions are evicted once the click
watermark passes ``imp_ts + max_delay``, clicks once they can no longer
match any retained impression.  Without BOTH the watermarks and the
interval bound, stream-stream join state grows forever; this module
exists to keep that policy explicit and tested.

Semantics are identical to the batch interval join (asserted in
tests/test_stream_join.py by replaying the same rows through a static
join), so batch backfill and streaming serving share one definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribution_join(
    impressions: DataFrame,
    clicks: DataFrame,
    key_col: str = "ad_id",
    imp_ts_col: str = "imp_ts",
    click_ts_col: str = "click_ts",
    max_delay: str = "30 minutes",
    imp_watermark: str = "2 hours",
    click_watermark: str = "1 hour",
) -> DataFrame:
    """Inner join: a click attributes to an impression with the same key
    when ``imp_ts <= click_ts <= imp_ts + max_delay``.

    Works on both streaming and static frames (watermarks are no-ops on
    static inputs).  Output: key, both timestamps, and ``delay_s`` —
    the integer attribution latency.
    """
    imp = impressions.withWatermark(imp_ts_col, imp_watermark).alias("i")
    clk = clicks.withWatermark(click_ts_col, click_watermark).alias("c")
    cond = F.expr(
        f"i.{key_col} = c.{key_col} "
        f"AND c.{click_ts_col} >= i.{imp_ts_col} "
        f"AND c.{click_ts_col} <= i.{imp_ts_col} + interval {max_delay}"
    )
    return imp.join(clk, cond, "inner").select(
        F.col(f"i.{key_col}").alias(key_col),
        F.col(f"i.{imp_ts_col}").alias(imp_ts_col),
        F.col(f"c.{click_ts_col}").alias(click_ts_col),
        (
            F.col(f"c.{click_ts_col}").cast("long")
            - F.col(f"i.{imp_ts_col}").cast("long")
        ).alias("delay_s"),
    )
