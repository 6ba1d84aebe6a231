"""Config-predicate translator tests: pandas query dialect → Spark SQL,
validated by actually filtering a DataFrame with the translated string."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from service_alerts_connector_spark.functions.predicates import (
    translate_pandas_query,
)

ROWS = [
    (1, "Grassy Park", "Official Planning Suburb", "Open", 5.0, None),
    (2, "grassy  park", "Citywide", "Closed", -1.0, "x"),
    (3, "Woodstock", "Official Planning Suburb", "Open", 2.0, "y"),
    (4, None, None, "Assigned", 9.0, "z"),
]
SCHEMA = "Id long, suburb string, area_type string, status string, score double, note string"


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _ids(df, sql):
    return sorted(r["Id"] for r in df.filter(sql).collect())


def test_reference_style_predicate(df):
    # the actual idiom shape from the reference's email configs
    sql = translate_pandas_query(
        "suburb.astype('str').str.lower().str.contains('grassy\\\\W?park') "
        "and area_type != 'Citywide'"
    )
    assert _ids(df, sql) == [1]


def test_at_var_binding(df):
    sql = translate_pandas_query("score > @threshold", {"threshold": 4.5})
    assert _ids(df, sql) == [1, 4]
    sql2 = translate_pandas_query("status == @s", {"s": "Open"})
    assert _ids(df, sql2) == [1, 3]


def test_notna_isin_ampersand(df):
    sql = translate_pandas_query("note.notna() & status.isin(['Open', 'Assigned'])")
    assert _ids(df, sql) == [3, 4]


def test_isna_tilde(df):
    sql = translate_pandas_query("~suburb.isna()")
    assert _ids(df, sql) == [1, 2, 3]


def test_strip_upper(df):
    sql = translate_pandas_query("suburb.str.strip().str.upper() == 'GRASSY PARK'")
    assert _ids(df, sql) == [1]


def test_unknown_method_fails_loudly():
    with pytest.raises(ValueError, match="unsupported"):
        translate_pandas_query("x.str.extract('(a)')")


def test_unbound_var_fails_loudly():
    with pytest.raises(KeyError):
        translate_pandas_query("score > @missing")
