"""Spatial operators (SURVEY J4-J7, A6, F19-F20) — Sedona-shaped semantics
on the pure-Python geo fallback.

Execution model: GIS layers are small dimensions (suburbs/wards/regions —
thousands of polygons).  They broadcast to every executor as plain Python
lists; the alert side streams through ``mapInPandas`` in Arrow batches.  No
shuffle is introduced: each output row keys back to the alert ``Id``, and
downstream aggregation (collect_list of inferred areas) groups on that key.

At 100 TB-scale layers (e.g. planet-wide parcels) this swaps for Sedona's
spatially-partitioned joins; the operator signatures are deliberately
join-shaped so the swap is local to this module.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from service_alerts_connector_spark.constants import ID_COL
from service_alerts_connector_spark.geo import ops as G
from service_alerts_connector_spark.geo import wkt as W

# Import-gated Sedona branch (mirrors the PIL gate in sources/multimodal.py).
# When Apache Sedona is on the classpath + pip-installed, the spatial
# operators (J5/J6/J7) compile to ST_* expression joins that Sedona's
# optimizer turns into spatially-partitioned range joins — the 100 TB path.
# This container has no Sedona (CLAUDE.md), so the pure-Python geo fallback
# runs; the branch is selected automatically, overridable per-call.
try:  # pragma: no cover — Sedona is not installed in this container
    from sedona.spark import SedonaContext  # type: ignore  # noqa: F401

    HAVE_SEDONA = True
except ImportError:
    HAVE_SEDONA = False

# Area types excluded from spatial inference (reference
# ServiceAlertAugmenter.py:64 AREA_TYPE_EXCLUSION_SET — P9).
AREA_TYPE_EXCLUSION = ("Citywide", "Driving Licence Testing Centre",
                       "Driving License Testing Centre")


def _to_polys(wkt_str: str) -> list[W.Polygon]:
    kind, shape = W.parse_wkt(wkt_str)
    if kind == "polygon":
        return [shape]  # type: ignore[list-item]
    if kind == "multipolygon":
        return list(shape)  # type: ignore[arg-type]
    if kind == "point":
        x, y = shape  # type: ignore[misc]
        return [G.bbox_polygon(x - 1e-4, y - 1e-4, x + 1e-4, y + 1e-4)]
    if kind == "linestring":
        minx, miny, maxx, maxy = G.bbox(shape)  # type: ignore[arg-type]
        return [G.bbox_polygon(minx - 1e-4, miny - 1e-4, maxx + 1e-4, maxy + 1e-4)]
    raise ValueError(kind)


def area_lookup_join(
    alerts: DataFrame,
    gis_dim: DataFrame,
    area_type_col: str = "area_type",
    area_col: str = "area",
    wkt_col: str = "WKT",
) -> DataFrame:
    """J4 — area polygon by composite (area_type, area) key.

    The reference builds per-type dicts of stripped name → WKT
    (ServiceAlertAugmenter.py:509-535); here it's a broadcast equi-join with
    trim+lower normalization on the build side and a case-normalized probe.
    """
    dim = gis_dim.select(
        F.col(area_type_col).alias("_at"),
        F.lower(F.trim(F.col(area_col))).alias("_an"),
        F.col(wkt_col).alias("area_wkt"),
    )
    joined = alerts.join(
        F.broadcast(dim),
        (F.col(area_type_col) == F.col("_at"))
        & (F.lower(F.trim(F.col(area_col))) == F.col("_an")),
        "left",
    )
    return joined.drop("_at", "_an")


def overlay_inference_sedona(
    alerts: DataFrame,
    layer: DataFrame,
    out_col: str,
    footprint_col: str = "geospatial_footprint",
    layer_name_col: str = "name",
    layer_wkt_col: str = "WKT",
    min_overlap: float = 0.05,
) -> DataFrame:
    """J5/J6 on Sedona: ST_Intersects predicate join + proportional-overlap
    filter via ST_Area(ST_Intersection), then collect_set per alert.

    Requires a Sedona-registered SparkSession (``SedonaContext.create``).
    Sedona rewrites the ST_Intersects theta-join into a spatial range join
    with its own spatial partitioning — no broadcast-collect of the layer,
    so this is the branch that survives country-scale layers.  Semantics
    match ``overlay_inference`` (the reference's 5% rule,
    ServiceAlertAugmenter.py:649-681).
    """
    a = (
        alerts.select(ID_COL, footprint_col)
        .where(F.col(footprint_col).isNotNull())
        .withColumn("_ag", F.expr(f"ST_GeomFromWKT(`{footprint_col}`)"))
    )
    lay = layer.select(
        F.col(layer_name_col).cast("string").alias("_fname"),
        F.expr(f"ST_GeomFromWKT(`{layer_wkt_col}`)").alias("_fg"),
    )
    pairs = a.join(lay, F.expr("ST_Intersects(_ag, _fg)"))
    scored = (
        pairs.withColumn("_inter", F.expr("ST_Area(ST_Intersection(_ag, _fg))"))
        .withColumn("_fa", F.expr("ST_Area(_fg)"))
        .withColumn("_aa", F.expr("ST_Area(_ag)"))
    )
    hits = scored.where(
        ((F.col("_fa") > 0) & (F.col("_inter") / F.col("_fa") > min_overlap))
        | ((F.col("_aa") > 0) & (F.col("_inter") / F.col("_aa") > min_overlap))
    )
    inferred = hits.groupBy(ID_COL).agg(
        F.sort_array(F.collect_set("_fname")).alias(out_col)
    )
    return alerts.join(inferred, ID_COL, "left")


def overlay_inference(
    alerts: DataFrame,
    layer: DataFrame,
    out_col: str,
    footprint_col: str = "geospatial_footprint",
    layer_name_col: str = "name",
    layer_wkt_col: str = "WKT",
    min_overlap: float = 0.05,
    use_sedona: bool | None = None,
) -> DataFrame:
    """J5 + A1 — proportional-overlap spatial inference.

    For each alert footprint, collect the layer features whose intersection
    covers >``min_overlap`` of either geometry (the reference's 5% rule,
    ServiceAlertAugmenter.py:649-681), as a sorted array in ``out_col``.

    The layer is collected (small dimension) and broadcast via closure;
    alerts stream through mapInPandas.  Output joins back on Id — the base
    DataFrame is never widened row-by-row (J9 → join semantics).

    Candidate pruning: each task builds a uniform-grid index over the layer
    features' bboxes once (``geo.ops.GridIndex``), so per alert only the
    features in bbox-overlapping grid cells reach the exact intersection —
    sub-quadratic in layer size instead of the naive O(alerts × features)
    scan (the reference gets the same pruning from geopandas' R-tree,
    ServiceAlertAugmenter.py:649-681).  At truly large layers the Sedona
    branch (``overlay_inference_sedona``, auto-selected when Sedona
    imports) replaces the broadcast-collect wholesale.
    """
    if use_sedona is None:
        use_sedona = HAVE_SEDONA
    if use_sedona:
        return overlay_inference_sedona(
            alerts, layer, out_col, footprint_col,
            layer_name_col, layer_wkt_col, min_overlap,
        )
    layer_rows = [
        (r[layer_name_col], _to_polys(r[layer_wkt_col]))
        for r in layer.select(layer_name_col, layer_wkt_col).collect()
    ]
    spark = alerts.sparkSession
    blayer = spark.sparkContext.broadcast(layer_rows)

    # CPU-bound Python stage: a small-file scan arrives in one partition
    # and would run the whole overlay on one worker — rebalance up to the
    # cluster's parallelism first (no-op on an already-partitioned corpus;
    # same rationale as textdedup._spread)
    from service_alerts_connector_spark.operators.textdedup import _spread

    alerts = _spread(alerts)

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        feats = blayer.value
        feat_areas = [
            sum(G.polygon_area(p) for p in polys) for _, polys in feats
        ]
        feat_bboxes = [
            G.merge_bboxes([G.bbox(p[0]) for p in polys if p])
            for _, polys in feats
        ]
        grid = G.GridIndex(feat_bboxes)
        for pdf in batches:
            ids, names = [], []
            for alert_id, wkt_str in zip(
                pdf[ID_COL].tolist(), pdf[footprint_col].tolist()
            ):
                if wkt_str is None or (
                    isinstance(wkt_str, float) and pd.isna(wkt_str)
                ):
                    continue
                try:
                    fp = _to_polys(wkt_str)
                except ValueError:
                    continue
                fp_area = sum(G.polygon_area(p) for p in fp)
                fp_bbox = G.merge_bboxes([G.bbox(p[0]) for p in fp if p])
                if fp_bbox is None:
                    continue
                hits = []
                for fi in grid.candidates(fp_bbox):
                    fbox = feat_bboxes[fi]
                    if fbox is None or not G.bboxes_overlap(fp_bbox, fbox):
                        continue
                    fname, fpolys = feats[fi]
                    farea = feat_areas[fi]
                    inter = 0.0
                    for a in fp:
                        for b in fpolys:
                            inter += G.intersection_area(a, b)
                    if inter <= 0:
                        continue
                    if (farea > 0 and inter / farea > min_overlap) or (
                        fp_area > 0 and inter / fp_area > min_overlap
                    ):
                        hits.append(str(fname))
                if hits:
                    ids.append(alert_id)
                    names.append(sorted(set(hits)))
            yield pd.DataFrame(
                {
                    ID_COL: pd.Series(ids, dtype="int64"),
                    # object dtype: Arrow rejects numpy-converted list columns
                    out_col: pd.Series(names, dtype="object"),
                }
            )

    inferred = alerts.select(ID_COL, footprint_col).mapInPandas(
        infer, f"{ID_COL} long, {out_col} array<string>"
    )
    return alerts.join(inferred, ID_COL, "left")


def exclude_area_types(
    df: DataFrame, area_type_col: str = "area_type"
) -> DataFrame:
    """P9 — drop rows whose area_type is excluded from spatial work."""
    return df.where(
        ~F.coalesce(F.col(area_type_col), F.lit("")).isin(*AREA_TYPE_EXCLUSION)
    )


def fuzzy_street_match(
    alerts: DataFrame,
    streets: DataFrame,
    street_query_col: str = "location",
    street_name_col: str = "street_name",
    street_wkt_col: str = "WKT",
    bounding_wkt_col: str = "area_wkt",
    max_distance: int = 5,
    use_sedona: bool | None = None,
) -> DataFrame:
    """J7/W3 — fuzzy street geocoding: Levenshtein ≤ N against a broadcast
    street dimension, constrained to streets intersecting the alert's
    bounding polygon, best (lowest) score wins, same-name segments unioned.

    Plan shape: broadcast theta-join on the Levenshtein bound (JVM-side
    expression), spatial constraint via the geo fallback in a follow-up
    filter stage (or an ST_Intersects expression when Sedona is present —
    fully JVM-side, no Python gate), then a window top-1 per alert.
    Returns Id → street_wkt.
    """
    if use_sedona is None:
        use_sedona = HAVE_SEDONA
    cand = alerts.select(
        ID_COL, street_query_col, bounding_wkt_col
    ).join(
        F.broadcast(
            streets.select(
                F.col(street_name_col).alias("_sname"),
                F.col(street_wkt_col).alias("_swkt"),
            )
        ),
        # threshold form: banded DP early-exits beyond the bound (-1),
        # O(len × bound) per candidate pair instead of O(len²)
        F.levenshtein(
            F.lower(F.trim(F.col(street_query_col))),
            F.lower(F.col("_sname")),
            max_distance,
        )
        != F.lit(-1),
    ).withColumn(
        "_score",
        F.levenshtein(
            F.lower(F.trim(F.col(street_query_col))),
            F.lower(F.col("_sname")),
            max_distance,
        ),
    )

    def spatial_gate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = []
            for bound, swkt in zip(
                pdf[bounding_wkt_col].tolist(), pdf["_swkt"].tolist()
            ):
                if bound is None or (
                    isinstance(bound, float) and pd.isna(bound)
                ):
                    keep.append(True)  # no bounding polygon → accept
                    continue
                try:
                    bpolys = _to_polys(bound)
                    spolys = _to_polys(swkt)
                except ValueError:
                    keep.append(False)
                    continue
                keep.append(
                    any(
                        G.polygons_intersect(s, b)
                        for s in spolys
                        for b in bpolys
                    )
                )
            yield pdf[pd.Series(keep, index=pdf.index)]

    if use_sedona:
        gated = cand.where(
            F.col(bounding_wkt_col).isNull()
            | F.expr(
                f"ST_Intersects(ST_GeomFromWKT(`{bounding_wkt_col}`),"
                " ST_GeomFromWKT(_swkt))"
            )
        )
    else:
        gated = cand.mapInPandas(spatial_gate, cand.schema)
    from pyspark.sql import Window

    w = Window.partitionBy(ID_COL).orderBy(
        F.asc("_score"), F.asc("_sname"), F.asc("_swkt")
    )
    best = (
        gated.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(ID_COL, F.col("_sname").alias("matched_street"))
    )
    # same-name segment union (A6): all segments sharing the winning name
    segs = gated.join(best, ID_COL).where(
        F.col("_sname") == F.col("matched_street")
    )
    return (
        segs.groupBy(ID_COL, "matched_street")
        .agg(F.sort_array(F.collect_set("_swkt")).alias("segment_wkts"))
    )
