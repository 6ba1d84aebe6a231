"""Catalog entries for genuinely non-SQL-expressible operators.

These run in the driver harness as rows-only checks (no ``oracle_sql``
entry): enrichment stages with injectable stub clients (X1/X3), multimodal
decode plumbing, and pure-Python spatial overlay — operators whose semantics
live outside ANSI SQL (stateful external calls, binary decode, planar
geometry).  All are deterministic via stub clients and synthesized inputs,
so row counts and schemas are stable run-to-run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from service_alerts_connector_spark.enrichment.geocode import (
    StubGeocoder,
    geocode_tail,
)
from service_alerts_connector_spark.enrichment.llm import (
    StubLLMClient,
    draft_posts,
)
from service_alerts_connector_spark.operators.spatial import overlay_inference
from service_alerts_connector_spark.sources.multimodal import media_features


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from service_alerts_connector_spark.shipping import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_x1_stub_drafts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 — LLM post drafting over pseudo-alerts built from documents,
    deterministic stub client, DRAFT_LIMIT cap + coalesced concurrency."""
    alerts = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 40)
        .select(
            F.col("doc_id").alias("Id"),
            F.col("text").alias("description"),
            F.col("source").alias("service_area"),
        )
    )
    return draft_posts(
        alerts,
        [StubLLMClient("draft")],
        lambda rec: f"Draft a post for: {rec.get('description', '')[:200]}",
        limit=10,
    ).orderBy("Id")


def q_x3_stub_geocode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 — rate-limited geocoder tail with the deterministic stub."""
    queries = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 30)
        .select(
            F.col("doc_id").alias("Id"),
            F.concat(F.lit("location "), F.col("doc_id").cast("string")).alias(
                "location"
            ),
        )
    )
    return geocode_tail(
        queries, StubGeocoder(), bounding_wkt_col=None
    ).orderBy("Id")


def q_x2_stub_locations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 — LLM location extraction (array<array<string>> output with
    JSON-shape repair) via the deterministic stub client."""
    from service_alerts_connector_spark.enrichment.llm import (
        extract_locations,
    )

    alerts = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 25)
        .select(
            F.col("doc_id").alias("Id"),
            F.col("text").alias("description"),
        )
    )
    out = extract_locations(
        alerts,
        [StubLLMClient("locations")],
        lambda rec: f"Extract locations from: {rec.get('description', '')[:150]}",
    )
    return out.select(
        "Id",
        F.size(F.flatten("suggested_locations")).alias("n_suggestions"),
        F.array_join(F.flatten("suggested_locations"), "|").alias("joined"),
    ).orderBy("Id")


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing — binary media column (synthesized from text
    bytes) through the Arrow-batched decode-stub feature extractor."""
    media = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 50)
        .select(
            F.col("doc_id").alias("media_id"),
            F.encode(F.col("text"), "utf-8").alias("content"),
        )
    )
    out = media_features(media)
    return out.select(
        "media_id",
        F.size("feature").alias("feature_dim"),
        "content_sha256",
    ).orderBy("media_id")


def q_geo_overlay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 — proportional-overlap inference on synthesized footprints: each
    doc gets a deterministic 0.5°×0.5° box on a grid; the layer is four
    quadrant polygons.  Pure-Python planar geometry in Arrow batches."""
    alerts = (
        _docs(spark, sf_dir)
        .where(F.col("doc_id") < 60)
        .select(
            F.col("doc_id").alias("Id"),
            F.concat(
                F.lit("POLYGON (("),
                (F.col("doc_id") % 4).cast("string"), F.lit(" "),
                ((F.col("doc_id") / 4).cast("int") % 4).cast("string"),
                F.lit(", "),
                (F.col("doc_id") % 4 + 1).cast("string"), F.lit(" "),
                ((F.col("doc_id") / 4).cast("int") % 4).cast("string"),
                F.lit(", "),
                (F.col("doc_id") % 4 + 1).cast("string"), F.lit(" "),
                ((F.col("doc_id") / 4).cast("int") % 4 + 1).cast("string"),
                F.lit(", "),
                (F.col("doc_id") % 4).cast("string"), F.lit(" "),
                ((F.col("doc_id") / 4).cast("int") % 4 + 1).cast("string"),
                F.lit("))"),
            ).alias("geospatial_footprint"),
        )
    )
    layer = spark.createDataFrame(
        [
            ("SW", "POLYGON ((0 0, 2.5 0, 2.5 2.5, 0 2.5, 0 0))"),
            ("SE", "POLYGON ((2.5 0, 5 0, 5 2.5, 2.5 2.5, 2.5 0))"),
            ("NW", "POLYGON ((0 2.5, 2.5 2.5, 2.5 5, 0 5, 0 2.5))"),
            ("NE", "POLYGON ((2.5 2.5, 5 2.5, 5 5, 2.5 5, 2.5 2.5))"),
        ],
        "name string, WKT string",
    )
    return (
        overlay_inference(alerts, layer, "inferred_zones")
        .select("Id", "inferred_zones")
        .orderBy("Id")
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic lite-kmeans cells, probe the 2 nearest of 4
    cells with exact cosine top-k.  Iterative training (Lloyd steps) is not
    SQL-expressible → rows-only check."""
    from service_alerts_connector_spark.operators.similarity import (
        ivf_topk,
        train_centroids_kmeanspp_lite,
    )

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from service_alerts_connector_spark.shipping import (
        ensure_package_on_executors,
    )

    ensure_package_on_executors(spark)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = train_centroids_kmeanspp_lite(emb, k=4, sample=64, iterations=1)
    row = emb.where(F.col("vec_id") == 0).select("embedding").collect()[0]
    q = [float(x) for x in row["embedding"]]
    return ivf_topk(emb, cents, q, k=10, n_probe=2)


EXTRA_QUERIES = {
    "x1_stub_drafts": q_x1_stub_drafts,
    "x2_stub_locations": q_x2_stub_locations,
    "x3_stub_geocode": q_x3_stub_geocode,
    "multimodal_features": q_multimodal_features,
    "geo_overlay": q_geo_overlay,
    "ann_ivf": q_ann_ivf,
}
