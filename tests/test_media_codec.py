"""Unit + property tests for the stdlib BMP codec and the real decode /
resize kernels in sources/multimodal.py."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from service_alerts_connector_spark.media import bmp, decode_auto, png


def _px(vals):
    return bytes(vals)


# ---------------------------------------------------------------------------
# PNG codec (media/png.py)
# ---------------------------------------------------------------------------
def test_png_roundtrip_every_filter_type():
    """Each scanline filter (None/Sub/Up/Average/Paeth) must survive a
    full encode → inflate → unfilter round trip."""
    px = bytes((i * 37 + 11) % 256 for i in range(5 * 7 * 3))
    for f in range(5):
        blob = png.encode_png(5, 7, px, filters=[f] * 7)
        assert png.decode_png(blob) == (5, 7, px), f"filter {f}"
    # mixed per-row plan (the synth media uses y % 5)
    blob = png.encode_png(5, 7, px, filters=[y % 5 for y in range(7)])
    assert png.decode_png(blob) == (5, 7, px)


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_png_roundtrip_property(data):
    w = data.draw(st.integers(1, 8))
    h = data.draw(st.integers(1, 8))
    px = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    assert png.decode_png(png.encode_png(w, h, px, filters=filters)) == (
        w, h, px,
    )


def test_png_grayscale_and_rgba_decode():
    """Color types 0 (gray → r=g=b) and 6 (RGBA → alpha dropped) decode;
    hand-built chunk streams since encode_png only writes RGB."""
    import struct
    import zlib

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # 2x2 grayscale, filter 0 rows: lumas 10,20 / 30,40
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = bytes([0, 10, 20, 0, 30, 40])
    blob = (png.SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert png.decode_png(blob) == (
        2, 2, _px([10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40])
    )

    # 1x2 RGBA: (R=1,G=2,B=3,A=9), (R=4,G=5,B=6,A=0) -> BGR, alpha gone
    ihdr = struct.pack(">IIBBBBB", 1, 2, 8, 6, 0, 0, 0)
    raw = bytes([0, 1, 2, 3, 9, 0, 4, 5, 6, 0])
    blob = (png.SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert png.decode_png(blob) == (1, 2, _px([3, 2, 1, 6, 5, 4]))


def test_png_corruption_raises_value_error():
    blob = bytearray(png.encode_png(3, 2, bytes(18)))
    blob[20] ^= 0xFF  # flip a bit inside IHDR -> CRC mismatch
    with pytest.raises(ValueError):
        png.decode_png(bytes(blob))
    with pytest.raises(ValueError):
        png.decode_png(png.SIGNATURE + b"\x00\x00")  # truncated
    with pytest.raises(ValueError):
        png.decode_png(b"\x89PNX" + bytes(20))  # wrong magic


def test_decode_auto_dispatches_by_magic():
    px = _px([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
    assert decode_auto(bmp.encode_bmp24(2, 2, px)) == (2, 2, px)
    assert decode_auto(png.encode_png(2, 2, px)) == (2, 2, px)
    with pytest.raises(ValueError):
        decode_auto(b"GIF89a junk")


def test_roundtrip_simple():
    # 2x2, distinct BGR triples, width*3=6 -> 2 pad bytes per row
    pixels = _px([1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12])
    data = bmp.encode_bmp24(2, 2, pixels)
    assert data[:2] == b"BM"
    w, h, out = bmp.decode_bmp24(data)
    assert (w, h) == (2, 2)
    assert out == pixels


def test_stride_padding_rows_are_4_byte_aligned():
    # width 3 -> row bytes 9 -> stride 12
    pixels = bytes(range(27))
    data = bmp.encode_bmp24(3, 3, pixels)
    assert (len(data) - 54) == 12 * 3
    assert bmp.decode_bmp24(data)[2] == pixels


def test_top_down_negative_height_decodes():
    import struct

    pixels = _px([10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40])
    data = bytearray(bmp.encode_bmp24(2, 2, pixels))
    # rewrite height to -2 and flip the row order to top-down
    struct.pack_into("<i", data, 22, -2)
    stride = 8
    body = bytes(data[54:])
    data[54:] = body[stride:] + body[:stride]
    w, h, out = bmp.decode_bmp24(bytes(data))
    assert (w, h) == (2, 2)
    assert out == pixels


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"BM",
        b"PNG" + b"\x00" * 60,
        bmp.encode_bmp24(1, 1, b"\x00\x00\x00")[:30],  # truncated
    ],
)
def test_decode_rejects_non_bmp(bad):
    with pytest.raises(ValueError):
        bmp.decode_bmp24(bad)


def test_resize_nearest_index_map():
    # 4x2 -> 2x1: target (tx,ty)=(0,0)->src(0,0), (1,0)->src(2,0)
    pixels = bytes(
        [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3,
         4, 4, 4, 5, 5, 5, 6, 6, 6, 7, 7, 7]
    )
    out = bmp.resize_nearest(4, 2, pixels, 2, 1)
    assert out == bytes([0, 0, 0, 2, 2, 2])


def test_resize_identity():
    pixels = bytes(range(12))
    assert bmp.resize_nearest(2, 2, pixels, 2, 2) == pixels


def test_gray_histogram_bins():
    # lumas 0, 15 -> bin 0; 16 -> bin 1; 255 -> bin 15
    pixels = _px([0, 0, 0, 15, 15, 15, 16, 16, 16, 255, 255, 255])
    hist = bmp.gray_histogram(pixels, bins=16)
    assert hist[0] == 2 and hist[1] == 1 and hist[15] == 1
    assert sum(hist) == 4


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 9),
    h=st.integers(1, 9),
    data=st.data(),
)
def test_roundtrip_property(w, h, data):
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    assert bmp.decode_bmp24(bmp.encode_bmp24(w, h, pixels)) == (w, h, pixels)


def test_media_features_real_decode_path(spark):
    """BMP content through media_features must produce the exact histogram
    fractions of the decoded pixels — not the hash fallback."""
    from service_alerts_connector_spark.sources.multimodal import (
        media_features,
    )

    # 2x2 with lumas 0,0,128,255 -> bins {0: 2, 8: 1, 15: 1}
    pixels = _px([0, 0, 0, 0, 0, 0, 128, 128, 128, 255, 255, 255])
    blob = bmp.encode_bmp24(2, 2, pixels)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    )
    row = media_features(df).collect()[0]
    feats = list(row["feature"])
    expect = [0.0] * 16
    expect[0], expect[8], expect[15] = 0.5, 0.25, 0.25
    assert feats == pytest.approx(expect)


def test_resize_images_real_bmp_roundtrip(spark):
    """resize_images on BMP content must emit decodable BMP bytes of the
    target dims whose pixels follow the nearest-neighbor index map."""
    from service_alerts_connector_spark.sources.multimodal import (
        resize_images,
    )

    n = 16 * 16
    px = bytearray(n * 3)
    for p in range(n):
        g = (p * 7) % 256
        px[p * 3 : p * 3 + 3] = bytes((g, g, g))
    blob = bmp.encode_bmp24(16, 16, bytes(px))
    df = spark.createDataFrame(
        [
            (
                7,
                bytearray(blob),
                {
                    "mime": "image/bmp",
                    "width": 16,
                    "height": 16,
                    "duration_ms": None,
                    "source_uri": "synth://7",
                },
            )
        ],
        "media_id long, content binary, "
        "meta struct<mime string, width int, height int, duration_ms long, "
        "source_uri string>",
    )
    row = resize_images(df, target_w=8, target_h=8).collect()[0]
    assert row["meta"]["width"] == 8 and row["meta"]["height"] == 8
    w, h, out = bmp.decode_bmp24(bytes(row["content"]))
    assert (w, h) == (8, 8)
    for tp in range(64):
        src = 32 * (tp // 8) + 2 * (tp % 8)
        assert out[tp * 3] == (src * 7) % 256


def test_resize_images_png_roundtrip(spark):
    """PNG content through resize_images must decode → resample →
    re-encode AS PNG, with pixels following the nearest-neighbor map."""
    from service_alerts_connector_spark.sources.multimodal import (
        resize_images,
    )

    n = 16 * 16
    px = bytearray(n * 3)
    for p in range(n):
        g = (p * 7) % 256
        px[p * 3 : p * 3 + 3] = bytes((g, g, g))
    blob = png.encode_png(16, 16, bytes(px), filters=[y % 5 for y in range(16)])
    df = spark.createDataFrame(
        [(7, bytearray(blob), {"mime": "image/png", "width": 16,
                               "height": 16, "duration_ms": None,
                               "source_uri": "synth://7"})],
        "media_id long, content binary, "
        "meta struct<mime string, width int, height int, duration_ms long, "
        "source_uri string>",
    )
    row = resize_images(df, target_w=8, target_h=8).collect()[0]
    out_blob = bytes(row["content"])
    assert out_blob[:8] == png.SIGNATURE  # stays PNG
    w, h, out = png.decode_png(out_blob)
    assert (w, h) == (8, 8)
    for tp in range(64):
        src = 32 * (tp // 8) + 2 * (tp % 8)
        assert out[tp * 3] == (src * 7) % 256


def test_corrupt_bm_magic_degrades_not_fails(spark):
    """A truncated blob whose first two bytes are 'BM' must degrade to the
    deterministic hash fallback — not raise inside the mapInPandas kernel
    and fail the whole stage (decode and resize paths both)."""
    import hashlib

    from service_alerts_connector_spark.sources.multimodal import (
        media_features,
        resize_images,
    )

    junk = b"BM\x01\x02\x03"  # BMP magic, garbage body
    df = spark.createDataFrame(
        [(1, bytearray(junk))], "media_id long, content binary"
    )
    row = media_features(df).collect()[0]
    h = hashlib.sha256(junk).digest()
    raw = [b / 255.0 - 0.5 for b in h[:16]]
    norm = sum(x * x for x in raw) ** 0.5
    assert list(row["feature"]) == pytest.approx([x / norm for x in raw])

    rdf = spark.createDataFrame(
        [(1, bytearray(junk), {"mime": "image/bmp", "width": None,
                               "height": None, "duration_ms": None,
                               "source_uri": "synth://bad"})],
        "media_id long, content binary, "
        "meta struct<mime string, width int, height int, duration_ms long, "
        "source_uri string>",
    )
    out = resize_images(rdf, target_w=4, target_h=4).collect()[0]
    assert bytes(out["content"]) == hashlib.sha256(junk + b":4x4").digest()
    assert out["meta"]["width"] == 4 and out["meta"]["height"] == 4


# ---------------------------------------------------------------------------
# WAV PCM16 codec (media/wav.py)
# ---------------------------------------------------------------------------
def test_wav_roundtrip_mono_and_stereo():
    from service_alerts_connector_spark.media import wav

    mono = [(-1) ** i * (i * 13 % 2048) for i in range(999)]  # odd count, pad path
    d = wav.decode_wav_pcm16(wav.encode_wav_pcm16(16000, mono))
    assert d == {"sample_rate": 16000, "n_channels": 1, "samples": mono}

    stereo = [v for i in range(100) for v in (i, -i)]
    d2 = wav.decode_wav_pcm16(wav.encode_wav_pcm16(44100, stereo, channels=2))
    assert d2["n_channels"] == 2 and d2["samples"] == stereo


def test_wav_decoder_walks_unknown_chunks():
    # real encoders emit LIST/fact chunks between fmt and data — the chunk
    # walk must skip them (with odd-size padding) instead of assuming
    # data follows fmt immediately.
    import struct
    from service_alerts_connector_spark.media import wav

    base = wav.encode_wav_pcm16(8000, [1, -2, 3])
    hdr, rest = base[:12], base[12:]
    fmt_chunk, data_chunk = rest[: 8 + 16], rest[8 + 16 :]
    junk = struct.pack("<4sI", b"LIST", 5) + b"abcde" + b"\x00"  # odd, padded
    blob = (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt_chunk) + len(junk) + len(data_chunk), b"WAVE")
        + fmt_chunk + junk + data_chunk
    )
    assert wav.decode_wav_pcm16(blob)["samples"] == [1, -2, 3]


def test_wav_decoder_rejects_corrupt():
    import pytest
    from service_alerts_connector_spark.media import wav

    good = wav.encode_wav_pcm16(8000, [0] * 8)
    for bad in (
        b"",                         # empty
        b"RIFX" + good[4:],          # wrong magic
        good[:20],                   # truncated mid-chunk
        good.replace(b"WAVE", b"AVI "),  # wrong form type
    ):
        with pytest.raises(ValueError):
            wav.decode_wav_pcm16(bad)


def test_audio_stats_null_on_corrupt(spark):
    # image-tier convention: junk blobs yield null stats, not a failed stage
    from service_alerts_connector_spark.sources.multimodal import (
        audio_decode_stats,
    )
    from service_alerts_connector_spark.media import wav

    rows = [
        (1, bytearray(wav.encode_wav_pcm16(8000, [5, -5, 7]))),
        (2, bytearray(b"RIFFgarbage-not-a-wav")),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r for r in audio_decode_stats(df).collect()}
    assert got[1]["n_samples"] == 3 and got[1]["peak_abs"] == 7
    assert got[2]["n_samples"] is None and got[2]["sum_abs"] is None


# ---------------------------------------------------------------------------
# GIF codec (media/gif.py)
# ---------------------------------------------------------------------------
def test_gif_roundtrip_compressed_and_literal():
    from service_alerts_connector_spark.media import gif

    gray = bytes(((9 * 31 + p * 7) % 256) for p in range(16 * 16))
    for compress in (True, False):
        w, h, bgr = gif.decode_gif(
            gif.encode_gif_gray(16, 16, gray, compress=compress)
        )
        assert (w, h) == (16, 16)
        assert bgr[0::3] == gray and bgr[1::3] == gray and bgr[2::3] == gray


def test_gif_lzw_dictionary_growth_paths():
    # runs exercise KwKwK; noise grows the table to the 4096 clear; both
    # must survive the variable-width reader.
    import random
    from service_alerts_connector_spark.media import gif

    rnd = random.Random(3)
    for gray in (
        bytes([7] * 4096),
        bytes(rnd.randrange(256) for _ in range(8192)),
    ):
        w = 64
        h = len(gray) // w
        got = gif.decode_gif(gif.encode_gif_gray(w, h, gray))[2][0::3]
        assert got == gray


def test_gif_skips_extensions_and_rejects_corrupt():
    import pytest
    import struct
    from service_alerts_connector_spark.media import gif

    gray = bytes(range(16)) * 16
    blob = gif.encode_gif_gray(16, 16, gray)
    # splice a GIF89a comment extension between the color table and the
    # image descriptor (13-byte header + 768-byte GCT)
    ext = b"\x21\xfe\x05hello\x00"
    spliced = blob[: 13 + 768] + ext + blob[13 + 768 :]
    assert gif.decode_gif(spliced)[2][0::3] == gray

    with pytest.raises(ValueError):
        gif.decode_gif(blob[:40])  # truncated
    with pytest.raises(ValueError):
        gif.decode_gif(b"NOTGIF" + blob[6:])
    # interlace flag set -> explicit unsupported error
    bad = bytearray(blob)
    bad[13 + 768 + 9 - 1] |= 0x40  # packed byte of the image descriptor
    with pytest.raises(ValueError):
        gif.decode_gif(bytes(bad))


# ---------------------------------------------------------------------------
# JPEG codec (media/jpeg.py)
# ---------------------------------------------------------------------------
def test_jpeg_constant_blocks_bit_exact():
    # the oracle property: DC-only blocks survive the lossy pipeline exactly
    from service_alerts_connector_spark.media import jpeg

    w = h = 16
    gray = bytearray(w * h)
    for by in range(2):
        for bx in range(2):
            v = (7 * 31 + (by * 2 + bx) * 7) % 256
            for y in range(8):
                base = (by * 8 + y) * w + bx * 8
                gray[base : base + 8] = bytes([v] * 8)
    dw, dh, bgr = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(w, h, bytes(gray)))
    assert (dw, dh) == (w, h) and bgr[0::3] == bytes(gray)


def test_jpeg_general_content_near_lossless_at_q1():
    # random and gradient content exercises AC runs/ZRL/EOB; with a flat
    # quant of 1 the only loss is DCT float rounding: |err| <= 1.
    import random
    from service_alerts_connector_spark.media import jpeg

    rnd = random.Random(11)
    for gray, w, h in (
        (bytes(rnd.randrange(256) for _ in range(24 * 24)), 24, 24),
        (bytes(((x * 3 + y * 5) % 256) for y in range(17) for x in range(13)), 13, 17),
    ):
        dw, dh, bgr = jpeg.decode_jpeg_gray(jpeg.encode_jpeg_gray(w, h, gray))
        assert (dw, dh) == (w, h)
        assert max(abs(a - b) for a, b in zip(bgr[0::3], gray)) <= 1


def test_jpeg_byte_stuffing_roundtrip():
    # content tuned to produce 0xFF entropy bytes must unstuff cleanly
    from service_alerts_connector_spark.media import jpeg

    gray = bytes((p * 97) % 256 for p in range(32 * 8))
    blob = jpeg.encode_jpeg_gray(32, 8, gray)
    assert b"\xff\x00" in blob  # stuffing actually occurred
    dw, dh, bgr = jpeg.decode_jpeg_gray(blob)
    assert max(abs(a - b) for a, b in zip(bgr[0::3], gray)) <= 1


def test_jpeg_rejects_progressive_and_corrupt():
    import pytest
    from service_alerts_connector_spark.media import jpeg

    blob = jpeg.encode_jpeg_gray(8, 8, bytes(range(64)))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray(blob.replace(b"\xff\xc0", b"\xff\xc2", 1))
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray(blob[:50])
    with pytest.raises(ValueError):
        jpeg.decode_jpeg_gray(b"NOTJPEG")


# ---------------------------------------------------------------------------
# AVI/MJPEG container (media/avi.py)
# ---------------------------------------------------------------------------
def test_avi_container_roundtrip_and_sampling():
    from service_alerts_connector_spark.media import avi, jpeg

    frames = [
        jpeg.encode_jpeg_gray(16, 16, bytes([(f * 40 + 10) % 256] * 256))
        for f in range(5)
    ]
    blob = avi.encode_avi_mjpeg(16, 16, frames, fps=4)
    meta = avi.decode_avi_frames(blob)
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["n_frames"] == 5 and meta["us_per_frame"] == 250_000
    assert meta["frames"] == frames  # byte-identical extraction

    sampled = avi.sample_decoded_frames(blob, every_n=2)
    assert [s[0] for s in sampled] == [0, 2, 4]
    for idx, w, h, bgr in sampled:
        assert bgr[0::3] == bytes([(idx * 40 + 10) % 256] * 256)


def test_avi_rejects_non_avi_and_truncated():
    import pytest
    from service_alerts_connector_spark.media import avi, jpeg, wav

    with pytest.raises(ValueError):
        avi.decode_avi_frames(wav.encode_wav_pcm16(8000, [0] * 4))  # RIFF/WAVE
    blob = avi.encode_avi_mjpeg(
        16, 16, [jpeg.encode_jpeg_gray(16, 16, bytes(256))]
    )
    with pytest.raises(ValueError):
        avi.decode_avi_frames(blob[:30])


def test_video_frame_stats_null_on_corrupt(spark):
    from service_alerts_connector_spark.media import avi, jpeg
    from service_alerts_connector_spark.sources.multimodal import (
        video_frame_stats,
    )

    good = avi.encode_avi_mjpeg(
        16, 16, [jpeg.encode_jpeg_gray(16, 16, bytes([9] * 256))] * 3
    )
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a video"))],
        "media_id long, content binary",
    )
    rows = video_frame_stats(df, every_n=1).collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert len(by_id[1]) == 3 and all(r["gray_sum"] == 9 * 256 for r in by_id[1])
    assert len(by_id[2]) == 1 and by_id[2][0]["frame_idx"] is None


def test_media_features_fuzz_never_fails_stage(spark):
    """Adversarial blob fuzz through the full mapInPandas feature path:
    random bytes, magic-prefixed truncations of every real format, and
    valid-header-corrupt-body blobs must DEGRADE (hash fallback / null
    stats), never raise and kill the Spark stage."""
    import random

    from service_alerts_connector_spark.media import bmp, gif, png, wav
    from service_alerts_connector_spark.sources.multimodal import (
        media_features,
    )

    rng = random.Random(99)
    blobs = []
    # pure junk of assorted sizes
    for i in range(20):
        blobs.append(bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64))))
    # magic-prefixed truncations: the decoder is committed to the format
    # and must still fail gracefully
    real = [
        bmp.encode_bmp24(4, 4, bytes(48)),
        png.encode_png(4, 4, bytes(48)),
        gif.encode_gif_gray(4, 4, bytes(16)),
        wav.encode_wav_pcm16(8000, [0] * 64),
    ]
    for blob in real:
        for cut in (2, 8, len(blob) // 2, len(blob) - 1):
            blobs.append(blob[:cut])
        # valid header, flipped body byte
        body = bytearray(blob)
        body[len(body) // 2] ^= 0xFF
        blobs.append(bytes(body))
    rows = [(i, b) for i, b in enumerate(blobs)]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = media_features(df).collect()  # must not raise
    assert len(out) == len(blobs)
