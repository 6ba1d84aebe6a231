"""Robust CSV / JSON-Lines ingestion with corrupt-record quarantine.

A 100 TB lake's rawest tier arrives as delimited text and JSONL, and at
that volume malformed rows are a certainty, not an edge case.  The ingest
contract here is the standard medallion gate: parse with an EXPLICIT
schema (never inference — an inference pass is a full extra scan, and a
bad sample can silently re-type a column), run in ``PERMISSIVE`` mode with
a ``_corrupt_record`` capture column, and split the result into a typed
good frame and a quarantine frame carrying the raw text for replay.

Reference parity: the reference ingests SharePoint JSON and trusts it
(`ServiceAlertConnector.py` drops only missing-Id/date rows); this is the
generalized gate the same pipeline needs once the source is a raw file
drop instead of a well-formed API.

Why not ``badRecordsPath``: that option writes rejects as side-effect
files, which breaks the pure-DataFrame contract (and is a Databricks-only
extension); the capture-column split keeps both halves as queryable
frames in one plan.

Caveat (documented Spark behavior): a row is only corrupt if it fails
PARSING.  A parseable row with a wrong TYPE yields nulls in PERMISSIVE
mode, so the splitter also quarantines rows where any ``required``
column came back null while the raw record is non-null.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_capture(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema already defines {CORRUPT_COL}")
    return StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType(), True)]
    )


def _split(
    parsed: DataFrame, required: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    # Spark requires the capture column to be materialized (cached or
    # re-selected) before filtering on it; referencing it straight off the
    # reader can raise AnalysisException per the docs — a projection
    # through all columns makes the dependency explicit.
    cols = parsed.columns
    mat = parsed.select(*cols)
    corrupt = F.col(CORRUPT_COL).isNotNull()
    for c in required:
        corrupt = corrupt | F.col(c).isNull()
    good = mat.where(~corrupt).drop(CORRUPT_COL)
    bad = mat.where(corrupt)
    return good, bad


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    required: Sequence[str] = (),
) -> tuple[DataFrame, DataFrame]:
    """JSON-Lines ingest gate.  Returns ``(good, quarantine)``; the
    quarantine frame keeps every schema column (nulls) plus the raw line
    in ``_corrupt_record`` for replay after a parser fix."""
    parsed = spark.read.schema(_with_capture(schema)).json(
        path, mode="PERMISSIVE", columnNameOfCorruptRecord=CORRUPT_COL
    )
    return _split(parsed, required)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: StructType,
    required: Sequence[str] = (),
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """CSV ingest gate with the same contract as ``read_jsonl``.  Explicit
    schema only — no ``inferSchema`` extra scan."""
    parsed = spark.read.schema(_with_capture(schema)).csv(
        path,
        mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL,
        header=header,
        sep=sep,
        enforceSchema=True,
    )
    return _split(parsed, required)
