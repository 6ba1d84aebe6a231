"""Catalog — oracled spatial overlay on rectangle fixtures.

The pure-Python planar overlay (J5, ``operators/spatial.py``) is
rows-only-checked on arbitrary polygons, but its *threshold semantics* —
the reference's 5% proportional-overlap rule
(ServiceAlertAugmenter.py:649-681) — are SQL-expressible on axis-aligned
rectangles via interval arithmetic:

    inter = max(0, min(ax1, bx1) - max(ax0, bx0))
          * max(0, min(ay1, by1) - max(ay0, by0))

so the full Spark path (WKT format → parse → grid-index candidate pruning →
Sutherland–Hodgman clip → 5% rule → sorted collect) gets a hash-matched
DuckDB differential.  All coordinates are small integers: shoelace and
clipping are exact in IEEE doubles, and every threshold comparison
(integer/100 vs 0.05) evaluates identically in both engines.

Fixture: alerts are 6×6 boxes derived from ``customer`` keys; the layer is
nation (25 features) as a 5×5 grid of 10×10 cells covering [0,50)².
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_alerts_connector_spark.catalog import _t
from service_alerts_connector_spark.operators.spatial import overlay_inference


def _rect_wkt(x0, y0, side: int):
    x1 = x0 + side
    y1 = y0 + side
    return F.format_string(
        "POLYGON ((%d %d, %d %d, %d %d, %d %d, %d %d))",
        x0, y0, x1, y0, x1, y1, x0, y1, x0, y0,
    )


def q_geo_overlay_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    ax0 = (F.col("c_custkey") * 7) % 40
    ay0 = (F.col("c_custkey") * 13) % 40
    alerts = cust.select(
        F.col("c_custkey").alias("Id"),
        _rect_wkt(ax0, ay0, 6).alias("geospatial_footprint"),
    )
    fx0 = (F.col("n_nationkey") % 5) * 10
    fy0 = F.floor(F.col("n_nationkey") / 5).cast("long") * 10
    layer = nation.select(
        F.col("n_name").alias("name"),
        _rect_wkt(fx0, fy0, 10).alias("WKT"),
    )
    out = overlay_inference(alerts, layer, "zones", use_sedona=False)
    # no final orderBy: row-per-alert output, order-insensitive gate
    # (guide §2.4 — the sort was a rangepartitioning Exchange + Sort)
    return out.select("Id", F.array_join("zones", ",").alias("zones"))


SQL_GEO_OVERLAY_RECT = """
WITH alerts AS (
  SELECT c_custkey AS Id,
         CAST((c_custkey * 7) % 40 AS DOUBLE) AS ax0,
         CAST((c_custkey * 13) % 40 AS DOUBLE) AS ay0
  FROM customer
), feats AS (
  SELECT n_name,
         CAST((n_nationkey % 5) * 10 AS DOUBLE) AS fx0,
         CAST(CAST(floor(n_nationkey / 5) AS BIGINT) * 10 AS DOUBLE) AS fy0
  FROM nation
), pairs AS (
  SELECT a.Id, f.n_name,
         greatest(0, least(a.ax0 + 6, f.fx0 + 10) - greatest(a.ax0, f.fx0)) *
         greatest(0, least(a.ay0 + 6, f.fy0 + 10) - greatest(a.ay0, f.fy0))
           AS inter
  FROM alerts a CROSS JOIN feats f
), hits AS (
  SELECT Id, n_name FROM pairs
  WHERE inter > 0 AND (inter / 100.0 > 0.05 OR inter / 36.0 > 0.05)
), agg AS (
  SELECT Id,
         array_to_string(list_sort(list(DISTINCT n_name)), ',') AS zones
  FROM hits GROUP BY Id
)
SELECT a.Id, agg.zones
FROM alerts a LEFT JOIN agg ON a.Id = agg.Id
ORDER BY a.Id
"""



def q_geo_zone_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Layer-side rollup of the SAME overlay result: alerts-per-zone —
    the "how many incidents touch each suburb" report operators read,
    and a second hash-matched angle on the planar J5 path (the per-alert
    `geo_overlay_rect` zones explode and re-aggregate by feature, so any
    clipping/threshold defect that survives one projection breaks the
    other)."""
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    ax0 = (F.col("c_custkey") * 7) % 40
    ay0 = (F.col("c_custkey") * 13) % 40
    alerts = cust.select(
        F.col("c_custkey").alias("Id"),
        _rect_wkt(ax0, ay0, 6).alias("geospatial_footprint"),
    )
    fx0 = (F.col("n_nationkey") % 5) * 10
    fy0 = F.floor(F.col("n_nationkey") / 5).cast("long") * 10
    layer = nation.select(
        F.col("n_name").alias("name"),
        _rect_wkt(fx0, fy0, 10).alias("WKT"),
    )
    out = overlay_inference(alerts, layer, "zones", use_sedona=False)
    return (
        out.select("Id", F.explode("zones").alias("zone"))
        .groupBy("zone")
        .agg(F.count(F.lit(1)).cast("long").alias("n_alerts"))
        .orderBy("zone")
    )


SQL_GEO_ZONE_ROLLUP = """
WITH alerts AS (
  SELECT c_custkey AS Id,
         CAST((c_custkey * 7) % 40 AS DOUBLE) AS ax0,
         CAST((c_custkey * 13) % 40 AS DOUBLE) AS ay0
  FROM customer
), feats AS (
  SELECT n_name,
         CAST((n_nationkey % 5) * 10 AS DOUBLE) AS fx0,
         CAST(CAST(floor(n_nationkey / 5) AS BIGINT) * 10 AS DOUBLE) AS fy0
  FROM nation
), pairs AS (
  SELECT a.Id, f.n_name,
         greatest(0, least(a.ax0 + 6, f.fx0 + 10) - greatest(a.ax0, f.fx0)) *
         greatest(0, least(a.ay0 + 6, f.fy0 + 10) - greatest(a.ay0, f.fy0))
           AS inter
  FROM alerts a CROSS JOIN feats f
), hits AS (
  SELECT DISTINCT Id, n_name FROM pairs
  WHERE inter > 0 AND (inter / 100.0 > 0.05 OR inter / 36.0 > 0.05)
)
SELECT n_name AS zone, count(*) AS n_alerts
FROM hits
GROUP BY zone
ORDER BY zone
"""


GEO_QUERIES = {
    "geo_overlay_rect": q_geo_overlay_rect,
    "geo_zone_rollup": q_geo_zone_rollup,
}

GEO_ORACLES = {
    "geo_overlay_rect": SQL_GEO_OVERLAY_RECT,
    "geo_zone_rollup": SQL_GEO_ZONE_ROLLUP,
}
