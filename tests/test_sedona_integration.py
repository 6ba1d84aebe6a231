"""REAL-Sedona integration test for `overlay_inference_sedona`.

`tests/test_sedona_contract.py` proves the branch's SQL construction and
semantics against planar stub ST_* UDFs; this module is the missing other
half: run the identical fixture through a genuinely Sedona-registered
session when the dependency is present, and auto-skip with an explicit
reason when it is not (this container ships no Sedona jars or wheel —
see SCALE.md "Sedona execution contract" for the exact jar coordinates a
real cluster needs).

Skip conditions, each with its own message so CI output says WHY the
integration leg did not run:
  1. `sedona.spark` python package absent  -> skip (wheel not installed)
  2. SedonaContext.create fails            -> skip (jars not on classpath)
Anything past those two points is a real failure, not a skip: once Sedona
registers, the overlay MUST run and agree with the planar fallback.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

sedona_spark = pytest.importorskip(
    "sedona.spark",
    reason="apache-sedona wheel not installed in this container; "
    "integration leg covered by the stub contract test "
    "(tests/test_sedona_contract.py) — see SCALE.md 'Sedona execution "
    "contract' for the jar/wheel versions a real cluster needs",
)


@pytest.fixture(scope="module")
def sedona(spark):
    try:
        return sedona_spark.SedonaContext.create(spark)
    except Exception as exc:  # jars missing / version mismatch
        pytest.skip(
            "sedona python package importable but SedonaContext.create "
            f"failed ({exc!r}): Sedona jars absent from the Spark "
            "classpath — see SCALE.md 'Sedona execution contract'"
        )


def test_sedona_overlay_matches_planar_fallback(sedona):
    from service_alerts_connector_spark.operators.spatial import (
        overlay_inference,
        overlay_inference_sedona,
    )

    sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    small = "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))"
    far = "POLYGON ((100 100, 101 100, 101 101, 100 101, 100 100))"
    alerts = sedona.createDataFrame(
        [(1, sq), (2, far)], ["Id", "geospatial_footprint"]
    )
    layer = sedona.createDataFrame(
        [("zone_a", small), ("zone_b", far)], ["name", "WKT"]
    )
    got = (
        overlay_inference_sedona(alerts, layer, "zones")
        .orderBy("Id")
        .select("Id", F.array_sort("zones").alias("zones"))
        .collect()
    )
    want = (
        overlay_inference(alerts, layer, "zones")
        .orderBy("Id")
        .select("Id", F.array_sort("zones").alias("zones"))
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
