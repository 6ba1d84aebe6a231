"""S7/S8 — JSON feed sinks.

The reference serializes each feed as a single records-oriented JSON array
object with ISO dates (ServiceAlertBroadcaster.py:100-114) and, in the recon
hop, one JSON object per alert per API version (alerts-recon.py:50-81).

Feed volumes are small (these are serving artifacts, not data lakes), so the
engine renders rows JVM-side with ``to_json(struct(*))`` — null keys dropped,
ISO timestamps — and materializes the array on the driver.  The heavy lifting
(filter/project) stayed distributed; only the final tiny byte-string is
driver-side, exactly where an object-store PUT has to happen anyway.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dataframe_to_json_records(df: DataFrame) -> str:
    """Render a (small, already-filtered) DataFrame as a JSON array string
    with ISO-8601 timestamps and nulls stripped — the reference's
    ``to_json(orient='records', date_format='iso')`` contract."""
    rows = df.select(
        F.to_json(
            F.struct(*df.columns), {"timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSS"}
        ).alias("j")
    ).collect()
    return "[" + ",".join(r["j"] for r in rows) + "]"


def write_feed(df: DataFrame, out_root: str, rel_path: str) -> str:
    """S7 — write one feed file (local path or mounted object store)."""
    payload = dataframe_to_json_records(df)
    path = Path(out_root) / rel_path
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(payload)
    return str(path)


def write_per_alert_objects(
    df: DataFrame,
    out_root: str,
    version_drops: dict[str, list[str]],
    id_col: str = "Id",
    status_col: str = "status",
) -> list[str]:
    """S8 — one JSON object per alert per API version prefix.

    ``version_drops`` maps version prefix → columns to drop for that version
    (reference alerts-recon.py:50-81 deep-copies and deletes fields; the
    engine projects).  Filenames are status-aware and deterministic —
    idempotent re-delivery (ST6).
    """
    written: list[str] = []
    rows = df.collect()  # CDC deltas are small by construction
    for version, drops in version_drops.items():
        keep = [c for c in df.columns if c not in drops]
        for row in rows:
            rec = {k: row[k] for k in keep if row[k] is not None}
            name = f"{row[id_col]}.{row[status_col]}.json"
            path = Path(out_root) / version / name
            path.parent.mkdir(parents=True, exist_ok=True)
            path.write_text(json.dumps(rec, default=str))
            written.append(str(path))
    return written
