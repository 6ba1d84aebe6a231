"""Differential tests: every catalog query vs its DuckDB oracle at sf0.001
(a local mirror of the driver's CORRECTNESS gate)."""

from __future__ import annotations

import os

import pytest

from service_alerts_connector_spark.catalog import CORE_ORACLES, CORE_QUERIES
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
from service_alerts_connector_spark.catalog_novelty import (
    NOVELTY_ORACLES,
    NOVELTY_QUERIES,
)
from service_alerts_connector_spark.catalog_round7 import (
    ROUND7_ORACLES,
    ROUND7_QUERIES,
)
from service_alerts_connector_spark.catalog_stats import (
    STATS_ORACLES,
    STATS_QUERIES,
)
from service_alerts_connector_spark.catalog_temporal import (
    TEMPORAL_ORACLES,
    TEMPORAL_QUERIES,
)
from service_alerts_connector_spark.catalog_text import (
    TEXT_ORACLES,
    TEXT_QUERIES,
)
from service_alerts_connector_spark.catalog_tpch import (
    TPCH_ORACLES,
    TPCH_QUERIES,
)
from tests.oracle_util import compare, duck_connection

CORE_QUERIES = {
    **CORE_QUERIES, **TEXT_QUERIES, **FIXER_QUERIES,
    **ANALYTICS_QUERIES, **GEO_QUERIES, **TEMPORAL_QUERIES,
    **CORPUS_QUERIES, **EVENTS_QUERIES, **TPCH_QUERIES, **ROUND7_QUERIES,
    **STATS_QUERIES, **NOVELTY_QUERIES,
    # only the oracled subset of EXTRA_QUERIES (the rest are rows-only)
    **{k: EXTRA_QUERIES[k] for k in EXTRA_ORACLES},
}
CORE_ORACLES = {
    **CORE_ORACLES, **TEXT_ORACLES, **FIXER_ORACLES,
    **ANALYTICS_ORACLES, **GEO_ORACLES, **TEMPORAL_ORACLES,
    **CORPUS_ORACLES, **EVENTS_ORACLES, **TPCH_ORACLES, **EXTRA_ORACLES,
    **ROUND7_ORACLES, **STATS_ORACLES, **NOVELTY_ORACLES,
}

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata not present at {SF_DIR}"
)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


def test_every_query_has_an_oracle():
    assert set(CORE_QUERIES) == set(CORE_ORACLES)


@pytest.mark.parametrize("name", sorted(CORE_QUERIES))
def test_matches_oracle(spark, duck, name):
    df = CORE_QUERIES[name](spark, SF_DIR)
    r = compare(df, duck, CORE_ORACLES[name])
    assert r["cols_match"], f"{name}: {r['spark_cols']} != {r['duck_cols']}"
    assert r["count_match"], f"{name}: {r['spark_count']} != {r['duck_count']}"
    assert r["values_match"], f"{name}: value mismatch {r.get('sample_diffs')}"


def test_a1_array_variant(spark, duck):
    """Array-typed collect_set (the driver-facing q_a1_collect_list now joins
    to a string because the external canonicalizer cannot hash list cells;
    this pins the original array<string> semantics)."""
    from pyspark.sql import functions as F

    from service_alerts_connector_spark.catalog import _t

    li = _t(spark, SF_DIR, "lineitem")
    df = (
        li.where(F.col("l_orderkey") % 50 == 0)
        .groupBy(F.col("l_orderkey").alias("id"))
        .agg(
            F.array_sort(
                F.collect_set(F.col("l_suppkey").cast("string"))
            ).alias("suppliers")
        )
    )
    sql = """
    SELECT l_orderkey AS id,
           list_sort(list(DISTINCT CAST(l_suppkey AS VARCHAR))) AS suppliers
    FROM lineitem WHERE l_orderkey % 50 = 0
    GROUP BY l_orderkey
    """
    r = compare(df, duck, sql)
    assert r["cols_match"] and r["count_match"] and r["values_match"], r
