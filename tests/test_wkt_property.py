"""Hypothesis property tests for the WKT codec: parse(serialize(x)) == x
(at codec precision) for arbitrary polygons/multipolygons/points."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from service_alerts_connector_spark.geo import wkt as W

coord = st.tuples(
    st.floats(-180, 180, allow_nan=False).map(lambda v: round(v, 6)),
    st.floats(-90, 90, allow_nan=False).map(lambda v: round(v, 6)),
)


def closed_ring(points: list[tuple[float, float]]) -> list[tuple[float, float]]:
    return points + [points[0]]


ring = st.lists(coord, min_size=3, max_size=8).map(closed_ring)
polygon = st.lists(ring, min_size=1, max_size=2)
multipolygon = st.lists(polygon, min_size=1, max_size=3)


@settings(max_examples=200, deadline=None)
@given(coord)
def test_point_roundtrip(pt):
    x, y = pt
    kind, (px, py) = W.parse_wkt(W.point_to_wkt(x, y))
    assert kind == "point"
    assert abs(px - x) < 1e-6 and abs(py - y) < 1e-6


@settings(max_examples=200, deadline=None)
@given(polygon)
def test_polygon_roundtrip(poly):
    kind, parsed = W.parse_wkt(W.polygon_to_wkt(poly))
    assert kind == "polygon"
    assert len(parsed) == len(poly)
    for r_in, r_out in zip(poly, parsed):
        assert len(r_in) == len(r_out)
        for (x1, y1), (x2, y2) in zip(r_in, r_out):
            assert abs(x1 - x2) < 1e-6 and abs(y1 - y2) < 1e-6


@settings(max_examples=100, deadline=None)
@given(multipolygon)
def test_multipolygon_roundtrip(mp):
    kind, parsed = W.parse_wkt(W.multipolygon_to_wkt(mp))
    assert kind == "multipolygon"
    assert len(parsed) == len(mp)
    for p_in, p_out in zip(mp, parsed):
        assert len(p_in) == len(p_out)


@settings(max_examples=100, deadline=None)
@given(ring)
def test_area_non_negative_and_scale_invariant(r):
    from service_alerts_connector_spark.geo import ops as G

    a = G.ring_area(r)
    assert a >= 0
    shifted = [(x + 1.0, y + 1.0) for x, y in r]
    assert abs(G.ring_area(shifted) - a) < 1e-6
