"""S1 at scale — the SharePoint feed as a Spark Python DataSource.

``sources/sharepoint.py`` separates *fetch* from *normalize* and documents
the at-scale mapping as "stage raw page dumps, read them distributed".
This module makes that mapping a first-class source: registering
:class:`SharePointDataSource` lets any consumer write

    spark.read.format("sharepoint").option("path", staged_dir).load()
    spark.readStream.format("sharepoint").option("path", staged_dir).load()

against the ``read_staged_pages`` layout (one JSONL page dump per file —
the OData ``__next`` pagination unit, reference
ServiceAlertConnector.py:14-64), with the same record hygiene
(``normalize_records``: drop ``__metadata``/nested/null fields, require
``Id``) and the same publish-date gate (P2, reference
ServiceAlertConnector.py:78) applied inside the source.

Execution model (PySpark 4 Python Data Source API):

* **batch, ``path`` mode** — one :class:`InputPartition` per page file,
  so N staged pages parse on N cores with no driver bottleneck: the
  partitioned page read SURVEY §2 S1 names as the scale path.  Workers
  re-import this module, so registration ships the package zip
  (``shipping.ensure_package_on_executors``).
* **batch, ``fetcher`` mode** — the injectable driver-side fetch of
  ``read_sharepoint`` (the reference's reality: tens of rows per run).
  The dotted-path callable resolves ON THE DRIVER at plan time and the
  normalized rows travel by value inside the single partition — workers
  never import the fetcher, so tests/prod can inject anything picklable
  by name.
* **streaming, ``path`` mode** — offsets are counts of consumed page
  files under the sorted directory listing.  Page dumps must be
  append-only with lexicographically increasing names (the stager's
  timestamped layout guarantees it); replay between checkpointed offsets
  re-reads the same file slice, so recovery is exactly-once per page.
  Two readers share that offset contract: the DEFAULT partitioned
  :class:`DataSourceStreamReader` plans one partition per new page and
  parses ON EXECUTORS (N fresh pages ingest on N cores — the scale
  path), while ``.option("mode", "simple")`` selects the
  :class:`SimpleDataSourceStreamReader` that prefetches on the driver
  (tiny feeds; no executor package shipping needed).

``_ingest_seq`` is page-major: ``page_index * SEQ_STRIDE + line_number``
(SEQ_STRIDE = 1e6 » any OData page length), preserving the
monotonic-arrival contract every downstream last-wins semantic needs
without requiring a global row count across partitions.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.errors import PySparkNotImplementedError
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

SEQ_STRIDE = 1_000_000


def _raw_field_names() -> list[str]:
    from service_alerts_connector_spark.schemas import RAW_SCHEMA

    return [f.name for f in RAW_SCHEMA.fields]


def _list_pages(path: str) -> list[str]:
    """Sorted page-dump files (the stager writes one JSONL file per OData
    page with a lexicographically increasing name)."""
    return sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith((".jsonl", ".json")) and not f.startswith("_")
    )


def _pages_for_replay(path: str, needed: int) -> list[str]:
    """Sorted page listing, validated against a checkpointed offset: the
    stream offsets are INDICES into this listing, so the append-only /
    stable-name staging contract is load-bearing — if a page file was
    deleted or renamed, every later index silently shifts and a
    checkpointed replay would truncate or read the WRONG files.  Raise
    loudly instead of losing data silently."""
    pages = _list_pages(path)
    if len(pages) < needed:
        raise RuntimeError(
            f"sharepoint staging contract violated: checkpointed offset "
            f"{needed} exceeds the {len(pages)} page files now under "
            f"{path!r} — page dumps must be append-only with stable "
            "lexicographic names; refusing to silently truncate replay"
        )
    return pages


def _parse_page(page_path: str, page_idx: int) -> Iterator[tuple]:
    """One staged page → normalized RAW_SCHEMA tuples with page-major
    ``_ingest_seq`` and the publish-date gate applied."""
    from service_alerts_connector_spark.sources.sharepoint import (
        normalize_records,
    )

    fields = _raw_field_names()

    def records():
        with open(page_path) as f:
            for line in f:
                line = line.strip()
                if line:
                    yield json.loads(line)

    for i, rec in enumerate(normalize_records(records())):
        if rec.get("Publish_x0020_Date") is None:
            continue  # P2 gate, same as read_sharepoint/read_staged_pages
        rec["_ingest_seq"] = page_idx * SEQ_STRIDE + i
        yield tuple(rec.get(name) for name in fields)


def _resolve_fetcher(dotted: str):
    """'pkg.module:callable' (or dotted attr path) → the callable, resolved
    driver-side only."""
    import importlib

    if ":" in dotted:
        mod_name, attr = dotted.split(":", 1)
    else:
        mod_name, attr = dotted.rsplit(".", 1)
    obj = importlib.import_module(mod_name)
    for part in attr.split("."):
        obj = getattr(obj, part)
    return obj


class _SharePointBatchReader(DataSourceReader):
    def __init__(self, options: dict[str, str]):
        self._path = options.get("path")
        self._fetched_rows: list[tuple] | None = None
        if self._path is None:
            dotted = options.get("fetcher")
            if not dotted:
                raise ValueError(
                    "sharepoint source needs .option('path', <staged page "
                    "dir>) or .option('fetcher', 'module:callable')"
                )
            from service_alerts_connector_spark.sources.sharepoint import (
                normalize_records,
            )

            fields = _raw_field_names()
            rows = []
            seq_start = int(options.get("ingest_seq_start", "0"))
            for i, rec in enumerate(
                normalize_records(_resolve_fetcher(dotted)())
            ):
                if rec.get("Publish_x0020_Date") is None:
                    continue
                rec["_ingest_seq"] = seq_start + i
                rows.append(tuple(rec.get(name) for name in fields))
            self._fetched_rows = rows

    def partitions(self) -> list[InputPartition]:
        if self._fetched_rows is not None:
            # driver-side fetch: rows travel by value, one partition (the
            # reference's tens-of-rows reality)
            return [InputPartition(("rows", self._fetched_rows))]
        return [
            InputPartition(("page", idx, p))
            for idx, p in enumerate(_list_pages(self._path))
        ] or [InputPartition(("rows", []))]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        kind = partition.value[0]
        if kind == "rows":
            yield from partition.value[1]
        else:
            _, idx, page_path = partition.value
            yield from _parse_page(page_path, idx)


class _SharePointStreamReader(SimpleDataSourceStreamReader):
    """Offset = number of page files consumed from the sorted listing.
    Append-only, lexicographically increasing page names are the layout
    contract; replay between offsets re-reads the same slice."""

    def __init__(self, options: dict[str, str]):
        path = options.get("path")
        if path is None:
            raise ValueError(
                "streaming sharepoint source requires .option('path', ...)"
            )
        self._path = path

    def initialOffset(self) -> dict:
        return {"pages": 0}

    def _slice(self, lo: int, hi: int) -> list[tuple]:
        # materialized, not a generator: the engine PICKLES the prefetched
        # rows alongside the offset (simple-reader contract).  hi is a
        # committed offset — a listing shorter than it is a staging
        # contract violation, never a clamp.
        pages = _pages_for_replay(self._path, hi)
        return [
            row
            for idx in range(lo, hi)
            for row in _parse_page(pages[idx], idx)
        ]

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = int(start["pages"])
        n = len(_pages_for_replay(self._path, lo))
        return iter(self._slice(lo, n)), {"pages": n}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter(self._slice(int(start["pages"]), int(end["pages"])))


class _SharePointPartitionedStreamReader(DataSourceStreamReader):
    """The scale path for streaming: offsets are page-file counts (same
    contract as the simple reader — append-only, lexicographically
    increasing names), but each micro-batch plans one InputPartition per
    new page and the JSONL parse runs ON EXECUTORS, so N freshly staged
    pages ingest on N cores and the driver never materializes rows.
    This is the default; pass .option("mode", "simple") for the
    driver-side prefetch reader (tiny feeds, no executor package
    shipping needed)."""

    def __init__(self, options: dict[str, str]):
        path = options.get("path")
        if path is None:
            raise ValueError(
                "streaming sharepoint source requires .option('path', ...)"
            )
        self._path = path

    def initialOffset(self) -> dict:
        return {"pages": 0}

    def latestOffset(self) -> dict:
        return {"pages": len(_list_pages(self._path))}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # end is a committed offset: validate the listing instead of
        # clamping, so a violated append-only contract fails loudly
        pages = _pages_for_replay(self._path, int(end["pages"]))
        return [
            InputPartition(("page", i, pages[i]))
            for i in range(int(start["pages"]), int(end["pages"]))
        ]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        _, idx, page_path = partition.value
        yield from _parse_page(page_path, idx)

    def commit(self, end: dict) -> None:
        # offsets are derived from the immutable staged listing; nothing
        # to clean up on commit
        pass


class SharePointDataSource(DataSource):
    """``spark.read.format("sharepoint")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "sharepoint"

    def schema(self) -> StructType:
        from service_alerts_connector_spark.schemas import RAW_SCHEMA

        return RAW_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SharePointBatchReader(dict(self.options))

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if self.options.get("mode", "partitioned") == "simple":
            # raising this exact class makes the engine fall back to
            # simpleStreamReader (pyspark datasource_internal._streamReader)
            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader"},
            )
        return _SharePointPartitionedStreamReader(dict(self.options))

    def simpleStreamReader(
        self, schema: StructType
    ) -> SimpleDataSourceStreamReader:
        return _SharePointStreamReader(dict(self.options))


def register(spark) -> None:
    """Register the source on a session (idempotent) and ship the package
    so executor Python workers can re-import this module for the
    partitioned page reads."""
    from service_alerts_connector_spark.shipping import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(spark)
    spark.dataSource.register(SharePointDataSource)
