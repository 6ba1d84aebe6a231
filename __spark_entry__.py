"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary aggregation at sf0.001;
``queries()`` / ``oracle_sql()`` expose the engine's operator catalog
(service_alerts_connector_spark.catalog) — every SURVEY §2 operator mapped
onto the driver's TPC-H-ish tables with a DuckDB-equivalent oracle.
"""

from __future__ import annotations

import os
import sys

# importable no matter how the harness loaded this file (spec-from-path,
# different cwd, scrubbed env)
_ROOT = os.path.dirname(os.path.abspath(__file__))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from service_alerts_connector_spark.catalog import (
    CORE_ORACLES,
    CORE_QUERIES,
    q_pricing_summary,
)
from service_alerts_connector_spark.catalog_analytics import (
    ANALYTICS_ORACLES,
    ANALYTICS_QUERIES,
)
from service_alerts_connector_spark.catalog_corpus import (
    CORPUS_ORACLES,
    CORPUS_QUERIES,
)
from service_alerts_connector_spark.catalog_events import (
    EVENTS_ORACLES,
    EVENTS_QUERIES,
)
from service_alerts_connector_spark.catalog_extras import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
)
from service_alerts_connector_spark.catalog_fixer import (
    FIXER_ORACLES,
    FIXER_QUERIES,
)
from service_alerts_connector_spark.catalog_geo import (
    GEO_ORACLES,
    GEO_QUERIES,
)
from service_alerts_connector_spark.catalog_temporal import (
    TEMPORAL_ORACLES,
    TEMPORAL_QUERIES,
)
from service_alerts_connector_spark.catalog_text import (
    TEXT_ORACLES,
    TEXT_QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    training-data pipeline operators (dedup/similarity/text analysis)."""
    return {
        **CORE_QUERIES,
        **TEXT_QUERIES,
        **FIXER_QUERIES,
        **ANALYTICS_QUERIES,
        **GEO_QUERIES,
        **TEMPORAL_QUERIES,
        **CORPUS_QUERIES,
        **EVENTS_QUERIES,
        **EXTRA_QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query.  Most
    EXTRA_QUERIES (stubbed enrichment / planar-geometry ops) intentionally
    have no oracle — the driver records the weaker rows-only check — but
    the multimodal decode/resize pair is oracled via its closed-form pixel
    recipe."""
    return {
        **CORE_ORACLES,
        **TEXT_ORACLES,
        **FIXER_ORACLES,
        **ANALYTICS_ORACLES,
        **GEO_ORACLES,
        **TEMPORAL_ORACLES,
        **CORPUS_ORACLES,
        **EVENTS_ORACLES,
        **EXTRA_ORACLES,
    }
