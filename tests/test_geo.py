"""Pure-Python geometry fallback tests (WKT codec + planar ops)."""

from __future__ import annotations

import pytest

from service_alerts_connector_spark.geo import ops as G
from service_alerts_connector_spark.geo import wkt as W

SQUARE = [[(0.0, 0.0), (2.0, 0.0), (2.0, 2.0), (0.0, 2.0), (0.0, 0.0)]]
SHIFTED = [[(1.0, 1.0), (3.0, 1.0), (3.0, 3.0), (1.0, 3.0), (1.0, 1.0)]]
FAR = [[(10.0, 10.0), (11.0, 10.0), (11.0, 11.0), (10.0, 11.0), (10.0, 10.0)]]


def test_wkt_roundtrip_polygon():
    wkt = W.polygon_to_wkt(SQUARE)
    kind, shape = W.parse_wkt(wkt)
    assert kind == "polygon" and shape == SQUARE


def test_wkt_point_and_precision():
    assert W.point_to_wkt(18.1234567, -33.9999999) == "POINT (18.123457 -34)"
    kind, (x, y) = W.parse_wkt("POINT (18.5 -33.9)")
    assert kind == "point" and (x, y) == (18.5, -33.9)


def test_wkt_multipolygon_roundtrip():
    mp = [SQUARE, FAR]
    kind, shape = W.parse_wkt(W.multipolygon_to_wkt(mp))
    assert kind == "multipolygon" and shape == mp


def test_area_and_intersection():
    assert G.polygon_area(SQUARE) == 4.0
    assert G.polygons_intersect(SQUARE, SHIFTED)
    assert not G.polygons_intersect(SQUARE, FAR)
    assert G.intersection_area(SQUARE, SHIFTED) == pytest.approx(1.0)
    assert G.intersection_area(SQUARE, FAR) == 0.0


def test_containment_counts_as_intersect():
    inner = [[(0.5, 0.5), (1.0, 0.5), (1.0, 1.0), (0.5, 1.0), (0.5, 0.5)]]
    assert G.polygons_intersect(SQUARE, inner)
    assert G.intersection_area(SQUARE, inner) == pytest.approx(0.25)


def test_point_in_ring():
    assert G.point_in_ring((1.0, 1.0), SQUARE[0])
    assert not G.point_in_ring((5.0, 5.0), SQUARE[0])
    assert G.point_in_ring((0.0, 1.0), SQUARE[0])  # boundary


def test_make_valid_closes_ring():
    open_ring = [(0.0, 0.0), (1.0, 0.0), (1.0, 0.0), (1.0, 1.0)]
    fixed = G.make_valid(open_ring)
    assert fixed[0] == fixed[-1]
    assert (1.0, 0.0) in fixed and fixed.count((1.0, 0.0)) == 1


def _rect(minx, miny, maxx, maxy):
    return [[(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy), (minx, miny)]]


def test_grid_index_matches_exhaustive_scan():
    # deterministic pseudo-random rectangle layer
    import random

    rng = random.Random(7)
    boxes = []
    for _ in range(300):
        x = rng.uniform(0, 100)
        y = rng.uniform(0, 100)
        boxes.append((x, y, x + rng.uniform(0.1, 3), y + rng.uniform(0.1, 3)))
    grid = G.GridIndex(boxes)
    for _ in range(50):
        qx = rng.uniform(0, 100)
        qy = rng.uniform(0, 100)
        q = (qx, qy, qx + 2, qy + 2)
        expect = {i for i, b in enumerate(boxes) if G.bboxes_overlap(q, b)}
        got = grid.candidates(q)
        # grid may over-approximate (cell granularity) but never misses
        assert expect <= got


def test_grid_index_prunes():
    boxes = [(float(i), 0.0, float(i) + 0.5, 0.5) for i in range(256)]
    grid = G.GridIndex(boxes)
    cands = grid.candidates((0.0, 0.0, 1.0, 1.0))
    assert len(cands) < 64  # far fewer than the 256-feature scan
    assert 0 in cands and 1 in cands


def test_grid_index_handles_empty_and_none():
    assert G.GridIndex([]).candidates((0, 0, 1, 1)) == set()
    grid = G.GridIndex([None, (0.0, 0.0, 1.0, 1.0)])
    assert grid.candidates((0.5, 0.5, 2.0, 2.0)) == {1}


def test_merge_bboxes():
    assert G.merge_bboxes([]) is None
    assert G.merge_bboxes([(0, 0, 1, 1), (2, -1, 3, 0.5)]) == (0, -1, 3, 1)


def test_as_axis_rect_detection():
    # closed axis-aligned rectangle -> detected, any vertex order
    r = G.as_axis_rect([[(0, 0), (4, 0), (4, 3), (0, 3), (0, 0)]])
    assert r == (0, 0, 4, 3)
    # open ring (no closing vertex) also detected
    assert G.as_axis_rect([[(4, 3), (0, 3), (0, 0), (4, 0)]]) == (0, 0, 4, 3)
    # rotated square -> not axis-aligned
    assert G.as_axis_rect([[(0, 1), (1, 0), (2, 1), (1, 2), (0, 1)]]) is None
    # triangle / pentagon -> None
    assert G.as_axis_rect([[(0, 0), (2, 0), (1, 2), (0, 0)]]) is None
    # degenerate sliver (zero width) -> None (falls to generic path)
    assert G.as_axis_rect([[(0, 0), (0, 0), (0, 3), (0, 3), (0, 0)]]) is None
    # polygon with a hole -> None
    outer = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]
    hole = [(4, 4), (6, 4), (6, 6), (4, 6), (4, 4)]
    assert G.as_axis_rect([outer, hole]) is None
    # repeated-vertex ring: every edge axis-parallel, two distinct values
    # per axis, but shoelace area 0 — must NOT classify as the full rect
    bad = [[(0, 0), (1, 0), (1, 1), (1, 0), (0, 0)]]
    assert G.as_axis_rect(bad) is None
    # and intersection_area against a covering rect stays ~0, not bbox area
    cover = [[(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]]
    assert G.intersection_area(bad, cover) == pytest.approx(0.0, abs=1e-9)


def test_rect_fast_path_matches_clipping():
    """intersection_area's rect fast path must equal the Sutherland-
    Hodgman result on every overlap configuration (disjoint, touching,
    partial, containment) — checked by sweeping one rect across another."""
    import random

    rng = random.Random(7)
    base = [[(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0), (0.0, 0.0)]]
    for _ in range(60):
        x0 = rng.uniform(-8, 12)
        y0 = rng.uniform(-8, 12)
        w = rng.uniform(0.5, 14)
        h = rng.uniform(0.5, 14)
        other = [[(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                  (x0, y0 + h), (x0, y0)]]
        got = G.intersection_area(base, other)
        # generic path, forced: perturb a vertex by 0 via a 5th point so
        # as_axis_rect rejects it (collinear midpoint on one edge)
        bent = [[(x0, y0), (x0 + w / 2, y0), (x0 + w, y0),
                 (x0 + w, y0 + h), (x0, y0 + h), (x0, y0)]]
        ref = G.intersection_area(base, bent)
        assert got == pytest.approx(ref, abs=1e-9)
        # expected interval arithmetic
        iw = min(10, x0 + w) - max(0, x0)
        ih = min(10, y0 + h) - max(0, y0)
        exp = iw * ih if (iw > 0 and ih > 0) else 0.0
        assert got == pytest.approx(exp, abs=1e-9)
