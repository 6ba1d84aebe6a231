"""X4/S10 — map-image links with a content-addressed artifact cache.

The reference renders a folium map per alert footprint through headless
Firefox, stores the PNG in an object bucket, and caches on a deterministic
filename (base64 name parts, sha256 when long, salt —
ServiceAlertAugmenter.py:412-506, 636-647).  The screenshot itself is an
edge side effect, not a query operator; what the *engine* owns is:

* the deterministic filename expression (F10/F11 + salt — ST8 invalidation);
* the set-based cache probe: an inventory DataFrame of existing object keys
  anti-joined against the needed keys (S10) — replacing the reference's
  per-row bucket listings with one join;
* the render fan-out of only the missing keys to an injectable renderer
  (stubbed here: no browser in a data-plane container).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from service_alerts_connector_spark.constants import ID_COL
from service_alerts_connector_spark.functions.checksum import content_address

# Bumping invalidates every cached image (reference AREA_IMAGE_SALT).
AREA_IMAGE_SALT = "20240928"


def image_filename(
    footprint_wkt: Column, salt: str = AREA_IMAGE_SALT
) -> Column:
    """Deterministic content-addressed PNG key for a footprint."""
    return F.when(
        footprint_wkt.isNotNull(),
        F.concat(
            content_address(F.concat(footprint_wkt, F.lit(salt)), max_len=32),
            F.lit(".png"),
        ),
    )


def with_image_links(
    gold: DataFrame, footprint_col: str = "geospatial_footprint"
) -> DataFrame:
    return gold.withColumn(
        "image_filename", image_filename(F.col(footprint_col))
    )


def missing_images(
    gold: DataFrame, inventory: DataFrame | None
) -> DataFrame:
    """S10 — (Id, image_filename, footprint) rows whose artifact does not
    exist yet.  ``inventory`` is a one-column DataFrame of existing object
    keys (from a bucket listing); None means nothing rendered yet."""
    needed = gold.where(F.col("image_filename").isNotNull()).select(
        ID_COL, "image_filename", "geospatial_footprint"
    )
    if inventory is None:
        return needed
    return needed.join(
        inventory.select(F.col(inventory.columns[0]).alias("image_filename")),
        "image_filename",
        "left_anti",
    )


Renderer = Callable[[str, str], bytes]
"""(filename, footprint_wkt) → PNG bytes."""


def stub_renderer(filename: str, footprint_wkt: str) -> bytes:
    """Deterministic fake PNG payload — the real renderer needs a headless
    browser (reference: folium + selenium/Firefox, 600×600 px, 5 s delay)
    and plugs in here unchanged."""
    return b"\x89PNG-stub:" + filename.encode()


def render_missing(
    missing: DataFrame,
    renderer: Renderer = stub_renderer,
    sink: Callable[[str, bytes], None] | None = None,
) -> list[str]:
    """S12 — render + store each missing artifact.  Volumes are bounded by
    the incremental cap upstream, so this collects; each render is seconds
    of wall-clock (browser), dwarfing any data-plane cost."""
    rendered = []
    for row in missing.collect():
        png = renderer(row["image_filename"], row["geospatial_footprint"])
        if sink is not None:
            sink(row["image_filename"], png)
        rendered.append(row["image_filename"])
    return rendered
