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
from service_alerts_connector_spark.catalog_fixer import (
    FIXER_ORACLES,
    FIXER_QUERIES,
)
from service_alerts_connector_spark.catalog_text import (
    TEXT_ORACLES,
    TEXT_QUERIES,
)
from tests.oracle_util import compare, duck_connection

CORE_QUERIES = {**CORE_QUERIES, **TEXT_QUERIES, **FIXER_QUERIES, **ANALYTICS_QUERIES}
CORE_ORACLES = {**CORE_ORACLES, **TEXT_ORACLES, **FIXER_ORACLES, **ANALYTICS_ORACLES}

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
