"""Minimal WKT codec: POINT / LINESTRING / POLYGON / MULTIPOLYGON.

Round-trips the 6-decimal-place precision contract of the reference
(ServiceAlertAugmenter.py:523-531, 773-775; service-alerts-api.yaml:307-310).
Rings are lists of (x, y) tuples; polygons are [exterior, *holes];
multipolygons are lists of polygons.
"""

from __future__ import annotations

import re

Ring = list[tuple[float, float]]
Polygon = list[Ring]
MultiPolygon = list[Polygon]


def _fmt(v: float, precision: int = 6) -> str:
    s = f"{round(v, precision):.{precision}f}".rstrip("0").rstrip(".")
    return s if s not in ("-0", "") else "0"


def _ring_to_wkt(ring: Ring, precision: int) -> str:
    return "(" + ", ".join(f"{_fmt(x, precision)} {_fmt(y, precision)}" for x, y in ring) + ")"


def polygon_to_wkt(poly: Polygon, precision: int = 6) -> str:
    return "POLYGON (" + ", ".join(_ring_to_wkt(r, precision) for r in poly) + ")"


def multipolygon_to_wkt(mp: MultiPolygon, precision: int = 6) -> str:
    inner = ", ".join(
        "(" + ", ".join(_ring_to_wkt(r, precision) for r in poly) + ")"
        for poly in mp
    )
    return "MULTIPOLYGON (" + inner + ")"


def point_to_wkt(x: float, y: float, precision: int = 6) -> str:
    return f"POINT ({_fmt(x, precision)} {_fmt(y, precision)})"


_NUM = r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?"
_COORD_RE = re.compile(rf"({_NUM})\s+({_NUM})")


def _parse_rings(body: str) -> list[Ring]:
    rings: list[Ring] = []
    depth = 0
    start = 0
    for i, ch in enumerate(body):
        if ch == "(":
            if depth == 0:
                start = i + 1
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                seg = body[start:i]
                rings.append(
                    [(float(m[0]), float(m[1])) for m in _COORD_RE.findall(seg)]
                )
    return rings


def parse_wkt(wkt: str) -> tuple[str, object]:
    """Parse WKT → (kind, shape).  kind ∈ {point, linestring, polygon,
    multipolygon}.  point → (x, y); linestring → Ring; polygon → Polygon;
    multipolygon → MultiPolygon.  Raises ValueError on unsupported input."""
    s = wkt.strip()
    upper = s.upper()
    if upper.startswith("POINT"):
        m = _COORD_RE.search(s)
        if not m:
            raise ValueError(f"bad POINT: {wkt!r}")
        return "point", (float(m[1]), float(m[2]))
    if upper.startswith("LINESTRING"):
        coords = [(float(m[0]), float(m[1])) for m in _COORD_RE.findall(s)]
        return "linestring", coords
    if upper.startswith("MULTIPOLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        polys: MultiPolygon = []
        depth = 0
        start = 0
        for i, ch in enumerate(body):
            if ch == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    # strip the polygon-group parens so _parse_rings sees the
                    # ring list (else hole rings merge into the exterior)
                    polys.append(_parse_rings(body[start + 1 : i]))
        return "multipolygon", polys
    if upper.startswith("POLYGON"):
        body = s[s.index("(") + 1 : s.rindex(")")]
        return "polygon", _parse_rings("(" + body + ")" if "(" not in body else body)
    raise ValueError(f"unsupported WKT: {wkt[:40]!r}")
