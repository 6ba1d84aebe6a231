"""Geospatial support without native dependencies.

The reference leans on geopandas/shapely for its spatial operators (SURVEY
J4-J7, F19-F20, A6).  The engine's preferred scale path is Apache Sedona
(spatial Catalyst extensions, ST_* expressions, spatially-partitioned joins);
this package is the dependency-free fallback: WKT parsing + planar geometry
in pure Python, executed inside Arrow-batched ``applyInPandas`` stages with
broadcast dimension layers.  Correct for the reference's workloads (polygon
lookup, intersects tests, proportional-overlap inference); swap in Sedona
when the layer cardinality or footprint sizes outgrow a broadcast.
"""
