"""Contract tests for the import-gated Sedona spatial branch.

The container has no Apache Sedona, so ``overlay_inference_sedona``
(`operators/spatial.py`) would otherwise be dead code in CI.  Two tests
keep it honest without the dependency:

* the import gate itself, by injecting a mock ``sedona.spark`` module and
  reloading the operator module;
* the branch's SQL construction AND semantics, by registering planar
  stub ``ST_*`` UDFs (backed by the repo's own ``geo`` lib) so the
  ST_Intersects / ST_Area(ST_Intersection) join analyzes, runs, and must
  agree with the pure-Python fallback on the same fixture.

Reference surface: the 5%-proportional-overlap overlay at
ServiceAlertAugmenter.py:649-681.
"""

from __future__ import annotations

import importlib
import sys
import types

from pyspark.sql import functions as F

from service_alerts_connector_spark.geo import ops as G
from service_alerts_connector_spark.operators import spatial

# geometries are carried as WKT strings by the stub ST_* functions; an
# intersection is a token joining both operands (WKT never contains \x1f)
_ISEP = "\x1f"


def _register_stub_st_functions(spark):
    def geom_from_wkt(wkt):
        return wkt

    def intersects(ga, gb):
        pa, pb = spatial._to_polys(ga), spatial._to_polys(gb)
        return any(G.polygons_intersect(a, b) for a in pa for b in pb)

    def intersection(ga, gb):
        return ga + _ISEP + gb

    def area(g):
        if _ISEP in g:
            ga, gb = g.split(_ISEP)
            pa, pb = spatial._to_polys(ga), spatial._to_polys(gb)
            return float(
                sum(G.intersection_area(a, b) for a in pa for b in pb)
            )
        return float(sum(G.polygon_area(p) for p in spatial._to_polys(g)))

    spark.udf.register("ST_GeomFromWKT", geom_from_wkt, "string")
    spark.udf.register("ST_Intersects", intersects, "boolean")
    spark.udf.register("ST_Intersection", intersection, "string")
    spark.udf.register("ST_Area", area, "double")


def _rect(x0, y0, x1, y1):
    return (
        f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
    )


def test_sedona_import_gate_detects_mock_module(monkeypatch):
    """HAVE_SEDONA flips on when a ``sedona.spark`` module is importable
    and auto-selects the Sedona branch; removing the module restores the
    pure-Python default."""
    fake_pkg = types.ModuleType("sedona")
    fake_spark = types.ModuleType("sedona.spark")
    fake_spark.SedonaContext = object
    fake_pkg.spark = fake_spark
    monkeypatch.setitem(sys.modules, "sedona", fake_pkg)
    monkeypatch.setitem(sys.modules, "sedona.spark", fake_spark)
    try:
        importlib.reload(spatial)
        assert spatial.HAVE_SEDONA is True

        captured = {}

        def sentinel(alerts, layer, out_col, *a, **k):
            captured["called"] = True
            return "SENTINEL"

        monkeypatch.setattr(spatial, "overlay_inference_sedona", sentinel)
        assert spatial.overlay_inference(None, None, "x") == "SENTINEL"
        assert captured["called"]
    finally:
        monkeypatch.delitem(sys.modules, "sedona", raising=False)
        monkeypatch.delitem(sys.modules, "sedona.spark", raising=False)
        importlib.reload(spatial)
    assert spatial.HAVE_SEDONA is False


def test_sedona_branch_matches_pure_python_fallback(spark):
    """With planar stub ST_* functions registered, the Sedona branch's
    generated join must analyze, execute, and reproduce the pure-Python
    overlay exactly: same hits (5% rule both directions), same sorted
    name arrays, same null rows for alerts with no footprint."""
    _register_stub_st_functions(spark)

    alerts = spark.createDataFrame(
        [
            # sits fully inside suburb A and covers >5% of it
            (1, _rect(0, 0, 4, 4)),
            # straddles A/B boundary: >5% of the ALERT lies in each
            (2, _rect(8, 0, 12, 1)),
            # overlaps C only marginally: intersection is 50 = 4.5% of the
            # alert (1100) and 0.5% of C (10000) -> below 5% both ways
            (3, _rect(115, -100, 125, 10)),
            # no footprint -> left-join null
            (4, None),
        ],
        "Id long, geospatial_footprint string",
    )
    layer = spark.createDataFrame(
        [
            ("A", _rect(0, 0, 10, 10)),
            ("B", _rect(10, 0, 20, 10)),
            ("C", _rect(20, 0, 120, 100)),
        ],
        "name string, WKT string",
    )

    sed = spatial.overlay_inference(
        alerts, layer, "suburbs", use_sedona=True
    )
    plan = sed._jdf.queryExecution().analyzed().toString().lower()
    for fn in ("st_geomfromwkt", "st_intersects", "st_intersection", "st_area"):
        assert fn in plan, fn

    pure = spatial.overlay_inference(
        alerts, layer, "suburbs", use_sedona=False
    )

    def rows(df):
        return {
            r["Id"]: tuple(r["suburbs"]) if r["suburbs"] is not None else None
            for r in df.select("Id", "suburbs").collect()
        }

    got_sed, got_pure = rows(sed), rows(pure)
    assert got_sed == got_pure
    assert got_sed == {1: ("A",), 2: ("A", "B"), 3: None, 4: None}
