"""S1 — SharePoint-OData-shaped record source.

The reference pages through a CRM list REST API, flattens each JSON item,
drops ``__metadata``/nested/null fields, and builds a DataFrame
(ServiceAlertConnector.py:14-64).  The engine separates *fetch* (driver-side
or staged, injectable for tests) from *normalize* (pure function) so the
Spark plan starts from an explicit-schema DataFrame:

* small feeds (the reference's reality, tens of rows): fetch on the driver,
  ``spark.createDataFrame(records, RAW_SCHEMA)``;
* at scale: stage raw page dumps to object storage and
  ``spark.read.schema(RAW_SCHEMA).json(staged_path)`` — same normalize logic,
  executed distributed.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

from service_alerts_connector_spark.schemas import RAW_SCHEMA

# A fetcher yields raw OData item dicts; injectable (tests pass a stub, prod
# passes a paginated HTTP client honouring __next continuations).
Fetcher = Callable[[], Iterable[dict[str, Any]]]

_RAW_FIELD_NAMES = [f.name for f in RAW_SCHEMA.fields if f.name != "_ingest_seq"]


def normalize_records(
    records: Iterable[dict[str, Any]],
) -> Iterator[dict[str, Any]]:
    """Flatten/clean one page of OData items.

    Mirrors the reference's record hygiene (ServiceAlertConnector.py:31-41):
    drop ``__metadata``, nested objects/lists, and null values; keep only
    known raw-schema fields.
    """
    for rec in records:
        out: dict[str, Any] = {}
        for k, v in rec.items():
            if k == "__metadata" or isinstance(v, (dict, list)) or v is None:
                continue
            if k in _RAW_FIELD_NAMES:
                out[k] = str(v) if k != "Id" else int(v)
        if "Id" in out:
            yield out


def read_sharepoint(
    spark: SparkSession,
    fetcher: Fetcher,
    ingest_seq_start: int = 0,
) -> DataFrame:
    """Fetch → normalize → DataFrame with RAW_SCHEMA + `_ingest_seq`.

    ``_ingest_seq`` materializes arrival order as data (monotonic per fetch),
    because every downstream "last wins"/"tail" semantic needs an explicit
    recency column in a distributed engine (SURVEY §7(c)).

    P2 — rows with no publish date are dropped at the gate
    (reference ServiceAlertConnector.py:78).
    """
    rows = []
    for i, rec in enumerate(normalize_records(fetcher())):
        rec = dict(rec)
        rec["_ingest_seq"] = ingest_seq_start + i
        rows.append(rec)
    df = spark.createDataFrame(rows, RAW_SCHEMA)  # type: ignore[arg-type]
    return df.na.drop(subset=["Publish_x0020_Date"])


def read_staged_pages(spark: SparkSession, staged_path: str) -> DataFrame:
    """Scale path: read staged OData page dumps (JSONL) with the explicit
    raw schema, then apply the same gate.  Catalyst prunes/pushes down."""
    df = spark.read.schema(RAW_SCHEMA).json(staged_path)
    return df.na.drop(subset=["Publish_x0020_Date"])
