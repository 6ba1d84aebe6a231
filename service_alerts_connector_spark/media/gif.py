"""Dependency-free GIF87a/89a codec — third real compressed image format.

Like ``media/png.py``, this exists so "compressed media decode" is a real
capability, not an import-gated stub: GIF's LZW is a genuinely different
compression family from PNG's DEFLATE (dictionary codes vs LZ77+Huffman),
so the decode differential exercises a second compressed path end-to-end.

Decoder: full variable-width LZW (clear/EOI codes, dictionary growth to
4095, deferred-clear tolerant), global color table, extension-block
skipping.  Single-image, non-interlaced streams only — interlaced GIFs
raise ValueError (documented; the four-pass reorder adds nothing to the
decode-correctness claim).  Animation (multiple image descriptors) decodes
the FIRST frame, the same convention real thumbnailers use.

Encoder: palette-indexed with the standard "uncompressed GIF" technique —
every index emitted as a literal LZW code with a clear code every 254
symbols so the code width never grows.  Decoders must accept this per the
spec (it is plain LZW output), which keeps the encoder ~20 lines while the
DECODER handles arbitrary real-world streams.
"""

from __future__ import annotations

import struct

HEADERS = (b"GIF87a", b"GIF89a")


# ---------------------------------------------------------------------------
# bit-stream helpers
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, width: int) -> None:
        self._acc |= code << self._nbits
        self._nbits += width
        while self._nbits >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def flush(self) -> bytes:
        if self._nbits:
            self.out.append(self._acc & 0xFF)
            self._acc, self._nbits = 0, 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, width: int) -> int:
        end = self.pos + width
        if end > len(self.data) * 8:
            raise ValueError("LZW stream exhausted mid-code")
        v = 0
        for i in range(width):
            byte = self.data[(self.pos + i) >> 3]
            v |= ((byte >> ((self.pos + i) & 7)) & 1) << i
        self.pos = end
        return v


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------
def _lzw_encode(min_code: int, data: bytes) -> bytes:
    """Genuine dictionary-building LZW (variable width, clear at 4096) —
    the compressing path, so the decoder's growth/KwKwK handling is
    exercised by real compressed streams, not just the literal-code
    encoder below."""
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    bw = _BitWriter()

    def reset() -> tuple[dict, int, int]:
        return (
            {bytes((i,)): i for i in range(1 << min_code)},
            eoi + 1,
            min_code + 1,
        )

    table, next_code, width = reset()
    bw.write(clear, width)
    run = b""
    for byte in data:
        cand = run + bytes((byte,))
        if cand in table:
            run = cand
            continue
        bw.write(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code > 4095:
            bw.write(clear, width)
            table, next_code, width = reset()
        run = bytes((byte,))
    if run:
        bw.write(table[run], width)
    bw.write(eoi, width)
    return bw.flush()


def encode_gif_gray(
    width: int, height: int, gray: bytes, compress: bool = True
) -> bytes:
    """Serialize one gray value per pixel (top-down row-major) as a real
    GIF87a with a 256-entry grayscale global color table.  ``compress``
    selects genuine LZW (default); ``False`` emits the literal-code
    variant (useful to prove decoders accept both framings)."""
    if len(gray) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    out = bytearray()
    out += b"GIF87a"
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256 entries
    for i in range(256):
        out += bytes((i, i, i))
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)  # descriptor
    min_code = 8
    if compress:
        data = _lzw_encode(min_code, gray)
    else:
        clear, eoi = 1 << min_code, (1 << min_code) + 1
        bw = _BitWriter()
        bw.write(clear, min_code + 1)
        for i, px in enumerate(gray):
            bw.write(px, min_code + 1)
            if i % 254 == 253:
                bw.write(clear, min_code + 1)  # keep the width at 9 bits
        bw.write(eoi, min_code + 1)
        data = bw.flush()
    out.append(min_code)
    for i in range(0, len(data), 255):  # ≤255-byte sub-blocks
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------
def _lzw_decode(min_code: int, data: bytes, n_expected: int) -> bytearray:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    base = [(i,) for i in range(1 << min_code)] + [(), ()]
    table = list(base)
    width = min_code + 1
    br = _BitReader(data)
    out = bytearray()
    prev: tuple[int, ...] | None = None
    while len(out) < n_expected:
        code = br.read(width)
        if code == clear:
            table = list(base)
            width = min_code + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("first LZW code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):  # KwKwK case
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("LZW code beyond table")
        if len(table) == (1 << width) and width < 12:
            width += 1
        out.extend(entry)
        prev = entry
    return out


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """Decode the first frame → (width, height, top-down BGR bytes) —
    the same output convention as ``bmp.decode_bmp24`` so the shared gray
    kernels apply unchanged."""
    if data[:6] not in HEADERS:
        raise ValueError("not a GIF87a/89a stream")
    if len(data) < 13:
        raise ValueError("truncated logical screen descriptor")
    _sw, _sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise ValueError("truncated global color table")
        gct = data[pos : pos + 3 * n]
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(data) and data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        _l, _t, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        if ipacked & 0x40:
            raise ValueError("interlaced GIF not supported")
        lct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            lct = data[pos : pos + 3 * n]
            pos += 3 * n
        if lct is None:
            raise ValueError("no color table for image")
        if pos >= len(data):
            raise ValueError("missing LZW minimum code size")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 8:
            raise ValueError(f"bad LZW minimum code size {min_code}")
        lzw = bytearray()
        while pos < len(data) and data[pos]:
            size = data[pos]
            pos += 1
            if pos + size > len(data):
                raise ValueError("truncated LZW sub-block")
            lzw += data[pos : pos + size]
            pos += size
        pos += 1  # block terminator
        idx = _lzw_decode(min_code, bytes(lzw), w * h)
        if len(idx) < w * h:
            raise ValueError("LZW data ended before raster complete")
        bgr = bytearray(w * h * 3)
        n_colors = len(lct) // 3
        for p in range(w * h):
            c = idx[p]
            if c >= n_colors:
                raise ValueError("palette index out of range")
            r, g, b = lct[c * 3 : c * 3 + 3]
            bgr[p * 3 : p * 3 + 3] = bytes((b, g, r))
        return w, h, bytes(bgr)
    raise ValueError("no image descriptor in GIF stream")
