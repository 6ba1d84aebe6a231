"""Streaming interval coalescing: watermark-finalized gaps-and-islands.

Streaming counterpart of ``operators/temporal.coalesce_intervals`` — the
union of variable-length intervals per key, maintained incrementally with
``applyInPandasWithState``.  Per-key state holds the OPEN islands (parallel
start/end/count arrays); each micro-batch merges its intervals in, then
emits every island the watermark has sealed.

Why the emitted islands are EXACTLY the batch result (the equivalence
``tests/test_stream_intervals.py`` pins): an island finalizes only when
``island_end < watermark``, and Spark's watermark filter admits only rows
with event time ≥ watermark, whose intervals therefore have
``start ≥ watermark > island_end`` — strictly past the break condition
(``start > running_end``), so no admissible future row could have merged
into a sealed island.  Late rows beyond the watermark delay are dropped by
the engine before the operator, which is the same explicit lateness policy
as the windowed aggregations in ``streaming/windows.py``.

State is bounded by the watermark horizon: an island stays open only while
``end ≥ watermark``, so per key at most the islands inside the delay window
are resident; the event-time timeout flushes keys that stop arriving
(their islands emit when the global watermark passes them).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ISLAND_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("island_start", T.LongType()),
        T.StructField("island_end", T.LongType()),
        T.StructField("n_intervals", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("ends", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
    ]
)


def _merge(islands: list, intervals: list) -> list:
    """Union sorted-by-start (start, end, n) islands with new (start, end)
    intervals — same break rule as the batch operator: new island iff
    start > running max end (touching merges)."""
    items = sorted(
        [(s, e, n) for s, e, n in islands]
        + [(s, e, 1) for s, e in intervals]
    )
    out: list = []
    for s, e, n in items:
        if out and s <= out[-1][1]:
            prev_s, prev_e, prev_n = out[-1]
            out[-1] = (prev_s, max(prev_e, e), prev_n + n)
        else:
            out.append((s, e, n))
    return out


def _coalesce(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    islands = (
        list(zip(state.get[0], state.get[1], state.get[2]))
        if state.exists
        else []
    )
    if not state.hasTimedOut:
        batch = []
        for pdf in pdfs:
            batch.extend(
                (int(s), int(e))
                for s, e in zip(pdf["start_s"], pdf["end_s"])
            )
        islands = _merge(islands, batch)
    wm_s = state.getCurrentWatermarkMs() // 1000
    sealed = [i for i in islands if i[1] < wm_s]
    open_ = [i for i in islands if i[1] >= wm_s]
    if state.hasTimedOut:
        # key went quiet and the watermark passed its horizon: flush all
        sealed, open_ = islands, []
    if open_:
        state.update(
            (
                [s for s, _, _ in open_],
                [e for _, e, _ in open_],
                [n for _, _, n in open_],
            )
        )
        # wake when the watermark can seal the earliest open island
        state.setTimeoutTimestamp((min(e for _, e, _ in open_) + 1) * 1000)
    else:
        state.remove()
    if sealed:
        yield pd.DataFrame(
            [(user_id, s, e, n) for s, e, n in sealed],
            columns=["user_id", "island_start", "island_end", "n_intervals"],
        )


def coalesce_intervals_stream(
    stream_df: DataFrame,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Input stream schema: (user_id long, ts timestamp, start_s long,
    end_s long) where ``ts`` is the event-time of ``start_s``.  Output:
    one row per SEALED island (append semantics — an island emits exactly
    once, when the watermark proves nothing can extend it)."""
    return (
        stream_df.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _coalesce,
            outputStructType=ISLAND_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
