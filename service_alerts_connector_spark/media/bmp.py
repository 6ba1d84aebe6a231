"""24-bit uncompressed BMP codec + pixel kernels, stdlib ``struct`` only.

Why BMP: it is the one ubiquitous raster format a bare Python container
can decode for real — fixed little-endian headers, raw BGR pixel rows —
so the engine's multimodal stages (decode → features → resize) run on
genuine bytes end-to-end instead of stubbing behind an absent codec
library (the PIL/torchvision gate in ``sources/multimodal.py`` stays for
compressed formats).  The pixel kernels are deliberately integer-exact so
a SQL oracle can reproduce every output value closed-form.

Layout written/accepted here (the common denominator of the BMP spec):
14-byte BITMAPFILEHEADER + 40-byte BITMAPINFOHEADER, bpp=24,
compression=BI_RGB(0), bottom-up rows, each row padded to 4 bytes.
Pixels in-memory are row-major TOP-DOWN bytes in BGR triple order.
"""

from __future__ import annotations

import struct

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")
_HEADER_BYTES = 14 + 40


def _row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3


def encode_bmp24(width: int, height: int, pixels_bgr: bytes) -> bytes:
    """Serialize top-down BGR triples into a bottom-up 24-bit BMP."""
    if len(pixels_bgr) != width * height * 3:
        raise ValueError(
            f"need {width * height * 3} pixel bytes, got {len(pixels_bgr)}"
        )
    stride = _row_stride(width)
    pad = b"\x00" * (stride - width * 3)
    body = b"".join(
        pixels_bgr[y * width * 3 : (y + 1) * width * 3] + pad
        for y in range(height - 1, -1, -1)
    )
    file_size = _HEADER_BYTES + len(body)
    return (
        _FILE_HEADER.pack(b"BM", file_size, 0, 0, _HEADER_BYTES)
        + _INFO_HEADER.pack(40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + body
    )


def decode_bmp24(data: bytes) -> tuple[int, int, bytes]:
    """Parse a 24-bit uncompressed BMP → (width, height, top-down BGR bytes).

    Accepts both bottom-up (positive height — what ``encode_bmp24`` writes
    and most encoders emit) and top-down (negative height) row orders.
    Raises ValueError on any other BMP flavor.
    """
    if len(data) < _HEADER_BYTES or data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    _, _, _, _, offset = _FILE_HEADER.unpack_from(data, 0)
    (hdr_size, width, height, _planes, bpp, compression, *_rest) = (
        _INFO_HEADER.unpack_from(data, 14)
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (hdr={hdr_size}, bpp={bpp}, comp={compression})"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError("degenerate dimensions")
    stride = _row_stride(width)
    if offset + stride * height > len(data):
        raise ValueError("truncated pixel array")
    rows = range(height) if top_down else range(height - 1, -1, -1)
    out = b"".join(
        data[offset + y * stride : offset + y * stride + width * 3]
        for y in rows
    )
    return width, height, out


def resize_nearest(
    width: int, height: int, pixels_bgr: bytes, target_w: int, target_h: int
) -> bytes:
    """Nearest-neighbor resample (integer source index ``x*w//tw`` — the
    deterministic mapping a SQL oracle reproduces exactly)."""
    out = bytearray(target_w * target_h * 3)
    for ty in range(target_h):
        sy = ty * height // target_h
        src_row = sy * width * 3
        dst_row = ty * target_w * 3
        for tx in range(target_w):
            sx = tx * width // target_w
            s = src_row + sx * 3
            d = dst_row + tx * 3
            out[d : d + 3] = pixels_bgr[s : s + 3]
    return bytes(out)


def gray_values(pixels_bgr: bytes) -> list[int]:
    """Integer luma per pixel: (r + g + b) // 3 — exact in any engine."""
    return [
        (pixels_bgr[i] + pixels_bgr[i + 1] + pixels_bgr[i + 2]) // 3
        for i in range(0, len(pixels_bgr), 3)
    ]

def gray_histogram(pixels_bgr: bytes, bins: int = 16) -> list[int]:
    """Counts of integer luma bucketed into ``bins`` equal 256/bins-wide
    bins (bin = gray * bins // 256)."""
    counts = [0] * bins
    for g in gray_values(pixels_bgr):
        counts[g * bins // 256] += 1
    return counts
