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


def resize_images(
    df: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    id_col: str = "media_id",
    content_col: str = "content",
    meta_col: str = "meta",
) -> DataFrame:
    """Resize stage: (media_id, content, meta) → same shape with meta dims
    rewritten to the target and content replaced by the resized bytes.

    STUB kernel (import-gated like ``_decode_image``): the fake "resize"
    re-digests the content salted with the target dims — deterministic,
    content-addressed, and size-plausible — while the Spark plumbing
    (binary-in/binary-out mapInPandas, struct metadata rewrite, Arrow batch
    shape) is the real contract a PIL/torchvision kernel drops into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, metas = [], [], []
            for _, row in pdf.iterrows():
                content = bytes(row[content_col] or b"")
                try:  # pragma: no cover — not installed here
                    from PIL import Image  # noqa: F401

                    raise NotImplementedError(
                        "real resize requires a codec build; wire PIL here"
                    )
                except ImportError:
                    pass
                fake = hashlib.sha256(
                    content + f":{target_w}x{target_h}".encode()
                ).digest()
                meta = dict(row[meta_col] or {})
                meta["width"], meta["height"] = target_w, target_h
                ids.append(row[id_col])
                blobs.append(fake)
                metas.append(meta)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), content_col: blobs,
                 meta_col: metas}
            )

    return df.select(id_col, content_col, meta_col).mapInPandas(
        run, MEDIA_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 32,
    id_col: str = "media_id",
    content_col: str = "content",
    meta_col: str = "meta",
) -> DataFrame:
    """Frame sampling: one row per sampled frame —
    (media_id, frame_idx, frame_ts_ms, feature).

    A one-to-many ``mapInPandas`` (the video analogue of explode): frame
    count = min(duration_ms div every_ms + 1, max_frames), timestamps on
    the sampling grid.  ``max_frames`` is the row-size-bomb cap (same
    discipline as the LSH bucket caps) — a 10-hour video cannot emit 36 k
    rows into one batch unaudited.  STUB kernel: per-frame features derive
    from sha256(content ‖ frame_idx); an ffmpeg/torchvision kernel drops
    into the same signature."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, feats = [], [], [], []
            for _, row in pdf.iterrows():
                content = bytes(row[content_col] or b"")
                meta = row[meta_col] or {}
                duration = int(meta.get("duration_ms") or 0)
                n = min(duration // every_ms + 1, max_frames) if duration > 0 else 1
                for i in range(n):
                    h = hashlib.sha256(content + f":frame{i}".encode()).digest()
                    raw = [b / 255.0 - 0.5 for b in h[:FEATURE_DIM]]
                    norm = sum(x * x for x in raw) ** 0.5 or 1.0
                    ids.append(row[id_col])
                    idxs.append(i)
                    tss.append(i * every_ms)
                    feats.append([x / norm for x in raw])
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "feature": feats,
                }
            )

    return df.select(id_col, content_col, meta_col).mapInPandas(
        run,
        f"{id_col} long, frame_idx int, frame_ts_ms long, feature array<float>",
    )
