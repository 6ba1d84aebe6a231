"""Driver-contract invariants for __spark_entry__: no silent name
collisions between catalog modules, every oracle has a query, and the
rows-only set is exactly the documented non-SQL-expressible operators."""

from __future__ import annotations

import __spark_entry__ as E

# The x-stubs graduated to full md5-algebra oracles in r15; what
# remains is genuinely non-SQL-expressible (encoded-byte sha256,
# planar geometry, iterative codebook/centroid training).
EXPECTED_ROWS_ONLY = {
    "multimodal_features",
    "geo_overlay",
    "ann_ivf",
    "ann_pq",
}


def test_no_name_collisions():
    from service_alerts_connector_spark.catalog import CORE_QUERIES
    from service_alerts_connector_spark.catalog_analytics import (
        ANALYTICS_QUERIES,
    )
    from service_alerts_connector_spark.catalog_corpus import CORPUS_QUERIES
    from service_alerts_connector_spark.catalog_events import EVENTS_QUERIES
    from service_alerts_connector_spark.catalog_extras import EXTRA_QUERIES
    from service_alerts_connector_spark.catalog_fixer import FIXER_QUERIES
    from service_alerts_connector_spark.catalog_geo import GEO_QUERIES
    from service_alerts_connector_spark.catalog_temporal import (
        TEMPORAL_QUERIES,
    )
    from service_alerts_connector_spark.catalog_novelty import (
        NOVELTY_QUERIES,
    )
    from service_alerts_connector_spark.catalog_round7 import (
        ROUND7_QUERIES,
    )
    from service_alerts_connector_spark.catalog_stats import STATS_QUERIES
    from service_alerts_connector_spark.catalog_text import TEXT_QUERIES
    from service_alerts_connector_spark.catalog_tpch import TPCH_QUERIES

    parts = [
        TPCH_QUERIES,
        ROUND7_QUERIES,
        STATS_QUERIES,
        CORE_QUERIES,
        TEXT_QUERIES,
        FIXER_QUERIES,
        ANALYTICS_QUERIES,
        GEO_QUERIES,
        TEMPORAL_QUERIES,
        CORPUS_QUERIES,
        EVENTS_QUERIES,
        EXTRA_QUERIES,
        NOVELTY_QUERIES,
    ]
    total = sum(len(p) for p in parts)
    assert len(E.queries()) == total  # a collision would silently drop one


def test_every_oracle_has_a_query():
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert set(qs) - set(oracles) == EXPECTED_ROWS_ONLY


def test_rows_only_queries_emit_scalar_columns(spark):
    """The driver's rows-only canonicalizer factorizes every column to
    sort, and raw array/map/struct cells are unhashable in pandas — the
    round-10 ``geo_overlay`` red.  Pin the rule forever: every query
    WITHOUT an oracle must expose a scalar-only schema (flatten nested
    output with ``array_join(array_sort(...), '|')`` — see
    q_geo_overlay / q_x2_stub_locations)."""
    import os

    from pyspark.sql.types import ArrayType, MapType, StructType

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        import pytest

        pytest.skip("testdata not present")
    qs = E.queries()
    for name in sorted(EXPECTED_ROWS_ONLY):
        schema = qs[name](spark, sf_dir).schema
        nested = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        assert not nested, (
            f"rows-only query {name!r} emits non-scalar columns {nested}: "
            "the driver canonicalizer cannot hash them (r10 geo_overlay red)"
        )


def test_all_queries_are_callables():
    for name, fn in E.queries().items():
        assert callable(fn), name
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name
