"""Stdlib-only media codecs: real binary decode paths that run in a
container with no PIL/ffmpeg, so the multimodal operators exercise actual
encode → bytes → decode round trips instead of hash stubs."""

from __future__ import annotations


def decode_auto(content: bytes) -> tuple[int, int, bytes]:
    """Magic-dispatched decode → (width, height, top-down BGR bytes).

    Covers the four real codecs (24-bit BMP, 8-bit PNG, GIF87a/89a,
    baseline grayscale JPEG);
    raises ValueError for anything else so callers keep their existing
    degrade-to-fallback behavior regardless of which codec rejected the
    bytes.
    """
    from service_alerts_connector_spark.media import bmp, gif, jpeg, png

    if content[:2] == b"\xff\xd8":
        return jpeg.decode_jpeg_gray(content)
    if content[:2] == b"BM":
        return bmp.decode_bmp24(content)
    if content[: len(png.SIGNATURE)] == png.SIGNATURE:
        return png.decode_png(content)
    if content[:6] in gif.HEADERS:
        return gif.decode_gif(content)
    raise ValueError("no codec for content magic")
