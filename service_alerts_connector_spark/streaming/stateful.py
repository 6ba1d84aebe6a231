"""Custom stateful streaming operator: per-alert status-transition detection.

The reference's recon Lambda diffs each feed snapshot against a stored
``(Id, status)`` JSON object (alerts-recon.py:37-47) — state in S3, diff in
Python.  A resident stream does this natively with
``applyInPandasWithState``: per-key engine state holds the last seen status;
each micro-batch emits only genuine transitions (including first sight),
with a processing-time timeout aging out alerts that stop arriving.

This is the engine's demonstration of arbitrary stateful processing — the
tool for any operator the built-in streaming aggregations can't express
(session logic, custom CDC, windowless dedup with TTL).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from service_alerts_connector_spark.constants import ID_COL

TRANSITION_SCHEMA = T.StructType(
    [
        T.StructField(ID_COL, T.LongType()),
        T.StructField("old_status", T.StringType()),
        T.StructField("new_status", T.StringType()),
        T.StructField("is_new_alert", T.BooleanType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("last_status", T.StringType())])


def _transitions(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (alert_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    last = state.get[0] if state.exists else None
    out = []
    for pdf in pdfs:
        # within a batch, apply updates in ingest order
        if "_ingest_seq" in pdf.columns:
            pdf = pdf.sort_values("_ingest_seq")
        for status in pdf["status"]:
            if status != last:
                out.append((alert_id, last, status, last is None))
                last = status
    state.update((last,))
    state.setTimeoutDuration(24 * 3600 * 1000)  # age out idle alerts
    if out:
        yield pd.DataFrame(
            out, columns=[ID_COL, "old_status", "new_status", "is_new_alert"]
        )


def detect_status_transitions(stream_df: DataFrame) -> DataFrame:
    """Input stream schema must include (Id, status[, _ingest_seq]).
    Output: one row per observed transition."""
    return stream_df.groupBy(ID_COL).applyInPandasWithState(
        _transitions,
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
