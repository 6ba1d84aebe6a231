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


def _spread_codec_input(df: DataFrame, key_col: str = "media_id") -> DataFrame:
    """Hash-spread narrow (id, seed) rows across the session's cores before
    a Python codec stage.

    The synth generators are typically fed by a scan of a small dimension
    slice — one parquet split — so without this every row's encode work
    lands on ONE task and the whole codec tier runs serially on a single
    core (optimization-guide §2.5: input parallelism; measured sf0.1:
    multimodal_video_frames 1.87 → 0.66 s best-warm).  The exchange moves
    only (id, seed) rows — trivial bytes at any scale.  The partition
    count must be EXPLICIT: AQE's size-based coalescing sees a few KB and
    would merge the exchange back to one task, which is exactly the
    serialization being removed.  Hash partitioning on the id is
    deterministic under task retry (no round-robin/rand key, SPARK-38388).
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, F.col(key_col))


def _decode_image(content: bytes) -> list[float]:
    """Decode + feature-extract one image.

    REAL path: 24-bit uncompressed BMP decodes via the stdlib codec
    (``media/bmp.py``) — the feature vector is the FEATURE_DIM-bin
    grayscale histogram as exact pixel-count fractions (L1-normalized;
    count/total is float-exact for power-of-two pixel counts, which is
    what makes the SQL oracle able to reproduce it bit-for-bit).

    Compressed formats (PNG/JPEG/...) need a codec library that is not in
    this container: the PIL gate below is where it wires in; until then
    non-BMP content falls back to a deterministic content-hash fake so
    downstream stages (similarity, dedup, joins) still exercise real data
    flow.
    """
    try:  # pragma: no cover — not installed in this environment
        from PIL import Image  # noqa: F401

        raise NotImplementedError(
            "real decode path requires a codec build; wire PIL here"
        )
    except ImportError:
        pass
    from service_alerts_connector_spark import media
    from service_alerts_connector_spark.media import bmp

    try:
        w, h, px = media.decode_auto(bytes(content))
        counts = bmp.gray_histogram(px, bins=FEATURE_DIM)
        total = float(w * h)
        return [c / total for c in counts]
    except ValueError:
        # unknown magic OR truncated/corrupt blob behind a real magic:
        # fall through to the hash fake rather than failing the whole
        # Arrow batch (media_decode_stats makes the same call, emits nulls)
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


def synth_bmp_media(
    df: DataFrame,
    id_col: str = "media_id",
    seed_col: str = "seed",
    width: int = 16,
    height: int = 16,
    spread: bool = False,
) -> DataFrame:
    """Synthesize a REAL 16×16 grayscale BMP per row: pixel p's luma is
    ``(seed*31 + p*7) % 256`` with r=g=b — a closed-form recipe a SQL
    oracle reproduces without ever touching bytes, while the Spark side
    encodes genuine BMP streams for the decode stages to parse back.
    Output: (id, content binary, meta struct) in MEDIA_SCHEMA shape."""
    from service_alerts_connector_spark.media import bmp

    n_px = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, metas = [], [], []
            for _, row in pdf.iterrows():
                seed = int(row[seed_col])
                px = bytearray(n_px * 3)
                for p in range(n_px):
                    g = (seed * 31 + p * 7) % 256
                    px[p * 3 : p * 3 + 3] = bytes((g, g, g))
                ids.append(row[id_col])
                blobs.append(bmp.encode_bmp24(width, height, bytes(px)))
                metas.append(
                    {
                        "mime": "image/bmp",
                        "width": width,
                        "height": height,
                        "duration_ms": None,
                        "source_uri": f"synth://bmp/{row[id_col]}",
                    }
                )
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "content": blobs, "meta": metas}
            )

    sel = df.select(
        F.col(id_col).alias("media_id"),
        F.col(seed_col).cast("long").alias(seed_col),
    )
    if spread:
        sel = _spread_codec_input(sel, "media_id")
    return sel.mapInPandas(run, MEDIA_SCHEMA)


def synth_png_media(
    df: DataFrame,
    id_col: str = "media_id",
    seed_col: str = "seed",
    width: int = 16,
    height: int = 16,
    spread: bool = False,
) -> DataFrame:
    """PNG twin of ``synth_bmp_media``: same closed-form pixel recipe
    (luma = (seed*31 + p*7) % 256, r=g=b) serialized as a REAL 8-bit RGB
    PNG — DEFLATE via zlib, CRC-framed chunks — with the scanline filter
    cycling y % 5, so decoding exercises every unfilter path
    (None/Sub/Up/Average/Paeth) on genuine bytes.  A SQL oracle reproduces
    the decoded stats from the recipe without touching bytes, which makes
    the *decoder* the thing under differential test."""
    from service_alerts_connector_spark.media import png

    n_px = width * height
    filters = [y % 5 for y in range(height)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, metas = [], [], []
            for _, row in pdf.iterrows():
                seed = int(row[seed_col])
                px = bytearray(n_px * 3)
                for p in range(n_px):
                    g = (seed * 31 + p * 7) % 256
                    px[p * 3 : p * 3 + 3] = bytes((g, g, g))
                ids.append(row[id_col])
                blobs.append(
                    png.encode_png(width, height, bytes(px), filters=filters)
                )
                metas.append(
                    {
                        "mime": "image/png",
                        "width": width,
                        "height": height,
                        "duration_ms": None,
                        "source_uri": f"synth://png/{row[id_col]}",
                    }
                )
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "content": blobs, "meta": metas}
            )

    sel = df.select(
        F.col(id_col).alias("media_id"),
        F.col(seed_col).cast("long").alias(seed_col),
    )
    if spread:
        sel = _spread_codec_input(sel, "media_id")
    return sel.mapInPandas(run, MEDIA_SCHEMA)


def media_decode_stats(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    bins: int = FEATURE_DIM,
) -> DataFrame:
    """REAL decode → integer stats: (id, width, height, gray_sum,
    hist array<int>).  Every value is integer-exact (luma = (r+g+b)//3,
    bin = luma*bins//256), so a SQL oracle can assert each one; rows no
    codec accepts (magic-dispatched BMP/PNG) surface null dims rather
    than fake numbers."""
    from service_alerts_connector_spark import media
    from service_alerts_connector_spark.media import bmp

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, sums, hists = [], [], [], [], []
            for _, row in pdf.iterrows():
                content = bytes(row[content_col] or b"")
                ids.append(row[id_col])
                try:
                    w, h, px = media.decode_auto(content)
                except ValueError:
                    ws.append(None); hs.append(None)
                    sums.append(None); hists.append(None)
                    continue
                grays = bmp.gray_values(px)
                ws.append(w); hs.append(h)
                sums.append(sum(grays))
                hists.append(bmp.gray_histogram(px, bins=bins))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "gray_sum": pd.Series(sums, dtype="Int64"),
                    "hist": hists,
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        run,
        f"{id_col} long, width int, height int, gray_sum long, hist array<int>",
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

    REAL kernel for BMP *and PNG* content: magic-dispatched stdlib decode
    (``media.decode_auto``) → nearest-neighbor resample (integer index
    map ``x*w//tw``) → re-encode in the source format, so the output of
    this stage feeds straight back into any decode stage.  Other
    compressed formats (JPEG/WebP) still await a codec build (PIL gate,
    import-gated like ``_decode_image``) and fall back to a deterministic
    content-hash fake; either way the Spark plumbing (binary-in/binary-out
    mapInPandas, struct metadata rewrite, Arrow batch shape) is the real
    contract a PIL/torchvision kernel drops into."""
    from service_alerts_connector_spark import media
    from service_alerts_connector_spark.media import bmp, png

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
                blob = None
                try:
                    w, h, px = media.decode_auto(content)
                    resized = bmp.resize_nearest(
                        w, h, px, target_w, target_h
                    )
                    # re-encode in the source format so the output feeds
                    # straight back into any decode stage
                    if content[:2] == b"BM":
                        blob = bmp.encode_bmp24(
                            target_w, target_h, resized
                        )
                    else:
                        blob = png.encode_png(target_w, target_h, resized)
                except ValueError:
                    # unknown magic or corrupt blob: degrade to the hash
                    # fake instead of failing the whole stage
                    blob = None
                if blob is None:
                    blob = hashlib.sha256(
                        content + f":{target_w}x{target_h}".encode()
                    ).digest()
                meta = dict(row[meta_col] or {})
                meta["width"], meta["height"] = target_w, target_h
                ids.append(row[id_col])
                blobs.append(blob)
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
    into the same signature.  For MJPEG-AVI content the REAL path exists:
    ``video_frame_stats`` below extracts and JPEG-decodes actual frames
    (media/avi.py) — this stub remains for formats whose codecs are
    genuinely outside stdlib (H.264/VP9)."""

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


def synth_wav_media(
    df: DataFrame,
    id_col: str = "media_id",
    seed_col: str = "seed",
    sample_rate: int = 8000,
    n_samples: int = 2048,
    spread: bool = False,
) -> DataFrame:
    """Audio twin of ``synth_bmp_media``: sample i of a REAL mono PCM16 WAV
    is ``((seed*37 + i*11) % 4096) - 2048`` — a closed-form integer recipe
    a SQL oracle reproduces without touching bytes, while the Spark side
    serializes genuine RIFF/WAVE streams (chunked, padded) for the decode
    stage to walk back.  Output rows are MEDIA_SCHEMA with
    ``duration_ms = n·1000 div rate``."""
    from service_alerts_connector_spark.media import wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, metas = [], [], []
            for _, row in pdf.iterrows():
                seed = int(row[seed_col])
                samples = [
                    ((seed * 37 + i * 11) % 4096) - 2048
                    for i in range(n_samples)
                ]
                ids.append(row[id_col])
                blobs.append(wav.encode_wav_pcm16(sample_rate, samples))
                metas.append(
                    {
                        "mime": "audio/wav",
                        "width": None,
                        "height": None,
                        "duration_ms": n_samples * 1000 // sample_rate,
                        "source_uri": f"synth://wav/{row[id_col]}",
                    }
                )
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "content": blobs, "meta": metas}
            )

    sel = df.select(
        F.col(id_col).alias("media_id"),
        F.col(seed_col).cast("long").alias(seed_col),
    )
    if spread:
        sel = _spread_codec_input(sel, "media_id")
    return sel.mapInPandas(run, MEDIA_SCHEMA)


AUDIO_FRAME = 256  # samples per energy frame


def audio_decode_stats(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    frame: int = AUDIO_FRAME,
) -> DataFrame:
    """REAL WAV decode → integer audio features: sample counts, peak,
    total absolute amplitude, and the loudest ``frame``-sample energy
    window (the VAD/energy-contour primitive).  All integers (energy =
    Σ s², ≤ 2048²·frame ≪ 2⁶³), so each value is SQL-assertable;
    non-WAV or corrupt blobs surface null stats rather than fake numbers
    (image-tier convention)."""
    from service_alerts_connector_spark.media import wav

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "id", "rate", "n", "dur", "sabs", "peak", "fidx", "fen")}
            for _, row in pdf.iterrows():
                out["id"].append(row[id_col])
                try:
                    d = wav.decode_wav_pcm16(bytes(row[content_col] or b""))
                except ValueError:
                    for k in ("rate", "n", "dur", "sabs", "peak", "fidx", "fen"):
                        out[k].append(None)
                    continue
                s = d["samples"]
                out["rate"].append(d["sample_rate"])
                out["n"].append(len(s))
                out["dur"].append(len(s) * 1000 // d["sample_rate"])
                out["sabs"].append(sum(abs(x) for x in s))
                out["peak"].append(max((abs(x) for x in s), default=0))
                best_i, best_e = 0, -1
                for fi in range(0, len(s), frame):
                    e = sum(x * x for x in s[fi : fi + frame])
                    if e > best_e:
                        best_i, best_e = fi // frame, e
                out["fidx"].append(best_i if s else None)
                out["fen"].append(best_e if s else None)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(out["id"], dtype="int64"),
                    "sample_rate": pd.Series(out["rate"], dtype="Int32"),
                    "n_samples": pd.Series(out["n"], dtype="Int64"),
                    "duration_ms": pd.Series(out["dur"], dtype="Int64"),
                    "sum_abs": pd.Series(out["sabs"], dtype="Int64"),
                    "peak_abs": pd.Series(out["peak"], dtype="Int32"),
                    "max_frame_idx": pd.Series(out["fidx"], dtype="Int32"),
                    "max_frame_energy": pd.Series(out["fen"], dtype="Int64"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        run,
        f"{id_col} long, sample_rate int, n_samples long, duration_ms long,"
        " sum_abs long, peak_abs int, max_frame_idx int, max_frame_energy long",
    )


def synth_gif_media(
    df: DataFrame,
    id_col: str = "media_id",
    seed_col: str = "seed",
    width: int = 16,
    height: int = 16,
    spread: bool = False,
) -> DataFrame:
    """GIF twin of ``synth_bmp_media``/``synth_png_media``: the same
    closed-form pixel recipe (luma = (seed*31 + p*7) % 256) serialized as
    a REAL LZW-compressed GIF87a with a grayscale palette — so the decode
    stage exercises variable-width LZW (dictionary growth, clear codes),
    a second compressed family beside PNG's DEFLATE, on genuine bytes."""
    from service_alerts_connector_spark.media import gif

    n_px = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, metas = [], [], []
            for _, row in pdf.iterrows():
                seed = int(row[seed_col])
                gray = bytes((seed * 31 + p * 7) % 256 for p in range(n_px))
                ids.append(row[id_col])
                blobs.append(gif.encode_gif_gray(width, height, gray))
                metas.append(
                    {
                        "mime": "image/gif",
                        "width": width,
                        "height": height,
                        "duration_ms": None,
                        "source_uri": f"synth://gif/{row[id_col]}",
                    }
                )
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "content": blobs, "meta": metas}
            )

    sel = df.select(
        F.col(id_col).alias("media_id"),
        F.col(seed_col).cast("long").alias(seed_col),
    )
    if spread:
        sel = _spread_codec_input(sel, "media_id")
    return sel.mapInPandas(run, MEDIA_SCHEMA)


def synth_jpeg_media(
    df: DataFrame,
    id_col: str = "media_id",
    seed_col: str = "seed",
    blocks: int = 2,
    spread: bool = True,
) -> DataFrame:
    """JPEG twin of the other synths, adapted to a LOSSY codec: each 8×8
    block is CONSTANT (value = (seed*31 + block*7) % 256), which makes
    the whole encode→Huffman→IDCT pipeline bit-exact (see media/jpeg.py
    docstring) while the streams remain genuine baseline JPEGs with the
    standard Annex K Huffman tables — so a closed-form SQL oracle still
    applies to the dominant crawl format."""
    from service_alerts_connector_spark.media import jpeg

    side = blocks * 8

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, metas = [], [], []
            for _, row in pdf.iterrows():
                seed = int(row[seed_col])
                gray = bytearray(side * side)
                for by in range(blocks):
                    for bx in range(blocks):
                        v = (seed * 31 + (by * blocks + bx) * 7) % 256
                        for y in range(8):
                            base = (by * 8 + y) * side + bx * 8
                            gray[base : base + 8] = bytes([v] * 8)
                ids.append(row[id_col])
                blobs.append(jpeg.encode_jpeg_gray(side, side, bytes(gray)))
                metas.append(
                    {
                        "mime": "image/jpeg",
                        "width": side,
                        "height": side,
                        "duration_ms": None,
                        "source_uri": f"synth://jpeg/{row[id_col]}",
                    }
                )
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "content": blobs, "meta": metas}
            )

    sel = df.select(
        F.col(id_col).alias("media_id"),
        F.col(seed_col).cast("long").alias(seed_col),
    )
    if spread:
        sel = _spread_codec_input(sel, "media_id")
    return sel.mapInPandas(run, MEDIA_SCHEMA)


def synth_avi_media(
    df: DataFrame,
    id_col: str = "media_id",
    seed_col: str = "seed",
    n_frames: int = 6,
    blocks: int = 2,
    fps: int = 5,
    spread: bool = True,
) -> DataFrame:
    """Video twin of the other synths: a REAL MJPEG AVI per row — RIFF
    container wrapping genuine baseline JPEGs — where frame f's block b is
    the constant (seed*31 + f*13 + b*7) % 256, so sampled-frame stats have
    a closed-form oracle while the decode path walks real container and
    entropy bytes (media/avi.py, media/jpeg.py)."""
    from service_alerts_connector_spark.media import avi, jpeg

    side = blocks * 8

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, metas = [], [], []
            for _, row in pdf.iterrows():
                seed = int(row[seed_col])
                frames = []
                for f in range(n_frames):
                    gray = bytearray(side * side)
                    for by in range(blocks):
                        for bx in range(blocks):
                            v = (seed * 31 + f * 13 + (by * blocks + bx) * 7) % 256
                            for y in range(8):
                                base = (by * 8 + y) * side + bx * 8
                                gray[base : base + 8] = bytes([v] * 8)
                    frames.append(jpeg.encode_jpeg_gray(side, side, bytes(gray)))
                ids.append(row[id_col])
                blobs.append(avi.encode_avi_mjpeg(side, side, frames, fps=fps))
                metas.append(
                    {
                        "mime": "video/x-msvideo",
                        "width": side,
                        "height": side,
                        "duration_ms": n_frames * 1000 // fps,
                        "source_uri": f"synth://avi/{row[id_col]}",
                    }
                )
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "content": blobs, "meta": metas}
            )

    sel = df.select(
        F.col(id_col).alias("media_id"),
        F.col(seed_col).cast("long").alias(seed_col),
    )
    if spread:
        sel = _spread_codec_input(sel, "media_id")
    return sel.mapInPandas(run, MEDIA_SCHEMA)


def video_frame_stats(
    df: DataFrame,
    every_n: int = 2,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """REAL video frame sampling: every Nth frame of each MJPEG AVI is
    extracted from the container and JPEG-decoded, yielding one row per
    sampled frame with integer pixel stats — the actual shape of a
    video-pretraining frame pipeline (one blob in, K frame rows out).
    Corrupt/non-AVI blobs yield a single null-stats row (codec-tier
    convention)."""
    from service_alerts_connector_spark.media import avi

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("id", "fidx", "w", "h", "gsum")}
            for _, row in pdf.iterrows():
                content = bytes(row[content_col] or b"")
                try:
                    sampled = avi.sample_decoded_frames(content, every_n=every_n)
                except ValueError:
                    out["id"].append(row[id_col])
                    for k in ("fidx", "w", "h", "gsum"):
                        out[k].append(None)
                    continue
                for idx, w, h, bgr in sampled:
                    out["id"].append(row[id_col])
                    out["fidx"].append(idx)
                    out["w"].append(w)
                    out["h"].append(h)
                    out["gsum"].append(sum(bgr[0::3]))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(out["id"], dtype="int64"),
                    "frame_idx": pd.Series(out["fidx"], dtype="Int32"),
                    "width": pd.Series(out["w"], dtype="Int32"),
                    "height": pd.Series(out["h"], dtype="Int32"),
                    "gray_sum": pd.Series(out["gsum"], dtype="Int64"),
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        run,
        f"{id_col} long, frame_idx int, width int, height int, gray_sum long",
    )
