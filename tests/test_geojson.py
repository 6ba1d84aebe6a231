"""GeoJSON layer source test: FeatureCollection → (properties, WKT) layer
consumable by the spatial operators."""

from __future__ import annotations

import json

from service_alerts_connector_spark.operators.spatial import overlay_inference
from service_alerts_connector_spark.sources.geojson import read_geojson_layer

DOC = {
    "type": "FeatureCollection",
    "features": [
        {
            "type": "Feature",
            "properties": {"name": "OBSERVATORY", "class": "suburb"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 1], [0, 0]]],
            },
        },
        {
            "type": "Feature",
            "properties": {"name": "Main Road", "class": "street"},
            "geometry": {
                "type": "LineString",
                "coordinates": [[0.1, 0.1], [0.9, 0.9]],
            },
        },
        {
            "type": "Feature",
            "properties": {"name": "broken", "class": "x"},
            "geometry": None,
        },
    ],
}


def test_read_geojson_layer(spark, tmp_path):
    p = tmp_path / "layer.geojson"
    p.write_text(json.dumps(DOC))
    layer = read_geojson_layer(spark, str(p))
    rows = {r["name"]: r for r in layer.collect()}
    assert set(rows) == {"OBSERVATORY", "Main Road"}  # broken geometry dropped
    assert rows["OBSERVATORY"]["WKT"].startswith("POLYGON")
    assert rows["Main Road"]["WKT"] == "LINESTRING (0.1 0.1, 0.9 0.9)"
    assert rows["OBSERVATORY"]["class"] == "suburb"


def test_geojson_layer_feeds_overlay(spark, tmp_path):
    p = tmp_path / "layer.geojson"
    p.write_text(json.dumps(DOC))
    layer = read_geojson_layer(spark, str(p)).where("class = 'suburb'")
    alerts = spark.createDataFrame(
        [(1, "POLYGON ((0.2 0.2, 0.8 0.2, 0.8 0.8, 0.2 0.8, 0.2 0.2))")],
        "Id long, geospatial_footprint string",
    )
    out = overlay_inference(alerts, layer, "inferred_suburbs").collect()
    assert out[0]["inferred_suburbs"] == ["OBSERVATORY"]
