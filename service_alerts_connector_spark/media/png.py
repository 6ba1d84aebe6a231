"""PNG codec on stdlib ``zlib`` + ``struct`` — no PIL required.

PNG is the one *compressed* raster format a bare Python container can
decode for real: the DEFLATE stream is stdlib ``zlib`` and the rest of the
spec (chunk framing with CRC-32, scanline filters 0-4) is pure byte
arithmetic.  This extends ``media/bmp.py``'s closed-form-oracle pattern to
a format real web crawls actually contain — the multimodal tier's decode
stage now covers a compressed format end-to-end instead of gating it
behind an absent codec library.

Supported subset (the overwhelmingly common web case): 8-bit depth,
color types 0 (grayscale), 2 (RGB) and 6 (RGBA, alpha dropped), no
interlacing.  All five scanline filters (None/Sub/Up/Average/Paeth) are
implemented — encoders routinely emit filtered rows, so ``encode_png``
accepts a per-row filter plan precisely so tests can force every
unfilter path through real bytes.

In-memory pixel convention matches ``bmp.py``: row-major TOP-DOWN BGR
triples, so every downstream kernel (``gray_values``, ``resize_nearest``,
``gray_histogram``) is codec-agnostic.
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels_bgr: bytes,
    filters: list[int] | None = None,
) -> bytes:
    """Serialize top-down BGR triples into an 8-bit RGB PNG.

    ``filters`` optionally assigns a scanline filter (0-4) per row —
    forward-filtering is applied before DEFLATE, so a decoder must run the
    matching unfilter to recover the pixels.  Default: all rows type 0.
    """
    if len(pixels_bgr) != width * height * 3:
        raise ValueError(
            f"need {width * height * 3} pixel bytes, got {len(pixels_bgr)}"
        )
    if filters is None:
        filters = [0] * height
    if len(filters) != height:
        raise ValueError("one filter type per row required")
    stride = width * 3
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        # BGR in memory → RGB on the wire
        line = bytearray(stride)
        row = pixels_bgr[y * stride : (y + 1) * stride]
        for x in range(width):
            line[x * 3] = row[x * 3 + 2]
            line[x * 3 + 1] = row[x * 3 + 1]
            line[x * 3 + 2] = row[x * 3]
        f = filters[y]
        if f not in (0, 1, 2, 3, 4):
            raise ValueError(f"bad filter type {f}")
        filt = bytearray(stride)
        for i in range(stride):
            a = line[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                pred = _paeth(a, b, c)
            filt[i] = (line[i] - pred) & 0xFF
        raw.append(f)
        raw += filt
        prev = bytes(line)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """Parse a PNG → (width, height, top-down BGR bytes).

    Real decode: chunk framing with CRC-32 verification, zlib inflate,
    per-row unfilter (all five filter types).  Grayscale expands to
    r=g=b; RGBA drops alpha.  Raises ValueError on anything outside the
    supported subset or on corrupt streams.
    """
    if len(data) < len(SIGNATURE) + 12 or data[: len(SIGNATURE)] != SIGNATURE:
        raise ValueError("not a PNG stream")
    pos = len(SIGNATURE)
    width = height = channels = -1
    idat: list[bytes] = []
    seen_ihdr = seen_iend = False
    while pos + 12 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk body")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color})"
                )
            if comp or filt or interlace:
                raise ValueError("unsupported compression/filter/interlace")
            if w <= 0 or h <= 0:
                raise ValueError("degenerate dimensions")
            width, height, channels = w, h, _CHANNELS[color]
            seen_ihdr = True
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
    if not seen_ihdr or not seen_iend or not idat:
        raise ValueError("missing IHDR/IDAT/IEND")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"bad DEFLATE stream: {exc}") from None
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("scanline data size mismatch")
    out = bytearray(width * height * 3)
    prev = bytes(stride)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = bytearray(
            raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        )
        if f == 1:
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter type {f}")
        row = y * width * 3
        if channels == 1:
            for x in range(width):
                g = line[x]
                out[row + x * 3 : row + x * 3 + 3] = bytes((g, g, g))
        else:
            for x in range(width):
                # RGB(A) on the wire → BGR in memory, alpha dropped
                out[row + x * 3] = line[x * channels + 2]
                out[row + x * 3 + 1] = line[x * channels + 1]
                out[row + x * 3 + 2] = line[x * channels]
        prev = bytes(line)
    return width, height, bytes(out)
