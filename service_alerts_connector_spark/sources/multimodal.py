"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media alongside text.  The engine's contract:

* media is an opaque ``binary`` column plus a metadata struct (mime type,
  dims/duration, source uri) — Spark shuffles/stores it like any column;
* decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages.  The codec libraries (PIL/ffmpeg/torchaudio) are
  not in this container, so the decode kernel is STUBBED: a deterministic
  fake decoder behind the same signature, with the real import gated —
  the Spark-side plumbing (schema, batch shape, partitioning, join-back
  key) is real and tested.

Partitioning note for 100 TB: media rows are orders of magnitude wider than
text rows — repartition by byte-size budget (``maxPartitionBytes`` down to
~32 MB) before decode stages so one Arrow batch fits executor memory, and
keep decode output (features) in a separate narrow table keyed by id.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("source_uri", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16


def _decode_image(content: bytes) -> list[float]:
    """Decode + feature-extract one image.

    STUB: the container has no image codecs.  The real implementation
    (PIL/torchvision) is import-gated below; the fake derives a
    deterministic unit-norm feature vector from the content hash so every
    downstream stage (similarity, dedup, joins) exercises real data flow.
    """
    try:  # pragma: no cover — not installed in this environment
        from PIL import Image  # noqa: F401

        raise NotImplementedError(
            "real decode path requires a codec build; wire PIL here"
        )
    except ImportError:
        pass
    h = hashlib.sha256(content or b"").digest()
    raw = [b / 255.0 - 0.5 for b in h[:FEATURE_DIM]]
    norm = sum(x * x for x in raw) ** 0.5 or 1.0
    return [x / norm for x in raw]


def media_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Decode media → (media_id, feature array<float>, content_sha256).

    Output is a narrow table for join-back; the wide binary column never
    leaves this stage.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, hashes = [], [], []
            for _, row in pdf.iterrows():
                content = row[content_col] or b""
                ids.append(row[id_col])
                feats.append(_decode_image(bytes(content)))
                hashes.append(hashlib.sha256(bytes(content)).hexdigest())
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "feature": feats,
                    "content_sha256": hashes,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        run, f"{id_col} long, feature array<float>, content_sha256 string"
    )


def exact_media_dedup(df: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Exact media dedup by content digest (JVM-side sha2 on the binary
    column — no Python for the pure-dedup case)."""
    return (
        df.select(
            F.col(id_col), F.sha2(F.col("content"), 256).alias("content_sha256")
        )
        .groupBy("content_sha256")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )
