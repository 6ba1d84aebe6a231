"""S5 — GeoJSON layer source (dependency-free).

The reference loads an Overture-derived street-network GeoJSON into a
GeoDataFrame (ServiceAlertAugmenter.py:124-130) and ArcGIS layers per area
type (S4).  The engine reads GeoJSON into a plain DataFrame of properties +
WKT — the layer shape every spatial operator here consumes; with Sedona
installed, ``spark.read.format("geojson")`` replaces this reader unchanged
downstream.

Layers are dimension-sized (thousands of features), so parsing happens on
the driver and the result broadcasts; a planet-scale layer would be stored
as parquet-with-WKT and read distributed instead.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _coords_to_wkt(geom: dict[str, Any]) -> str | None:
    gtype = geom.get("type", "")
    coords = geom.get("coordinates")
    if coords is None:
        return None

    def ring(points) -> str:
        return "(" + ", ".join(f"{x} {y}" for x, y, *_ in points) + ")"

    if gtype == "Point":
        x, y = coords[0], coords[1]
        return f"POINT ({x} {y})"
    if gtype == "LineString":
        return "LINESTRING " + ring(coords)
    if gtype == "MultiLineString":
        return "MULTILINESTRING (" + ", ".join(ring(l) for l in coords) + ")"
    if gtype == "Polygon":
        return "POLYGON (" + ", ".join(ring(r) for r in coords) + ")"
    if gtype == "MultiPolygon":
        return (
            "MULTIPOLYGON ("
            + ", ".join(
                "(" + ", ".join(ring(r) for r in poly) + ")" for poly in coords
            )
            + ")"
        )
    return None


def read_geojson_layer(
    spark: SparkSession,
    path: str,
    property_cols: list[str] | None = None,
) -> DataFrame:
    """FeatureCollection file → DataFrame of (selected properties…, WKT).

    ``property_cols`` limits which feature properties surface (all string-
    cast); omitted → every property key seen in the first feature.
    Features with unsupported/missing geometry are dropped.
    """
    with open(path) as f:
        doc = json.load(f)
    features = doc.get("features", [])
    if not features:
        return spark.createDataFrame([], "WKT string")
    if property_cols is None:
        property_cols = sorted((features[0].get("properties") or {}).keys())
    rows = []
    for feat in features:
        wkt = _coords_to_wkt(feat.get("geometry") or {})
        if wkt is None:
            continue
        props = feat.get("properties") or {}
        rows.append(
            tuple(
                str(props[k]) if props.get(k) is not None else None
                for k in property_cols
            )
            + (wkt,)
        )
    schema = ", ".join(f"`{c}` string" for c in property_cols) + ", WKT string"
    return spark.createDataFrame(rows, schema)
