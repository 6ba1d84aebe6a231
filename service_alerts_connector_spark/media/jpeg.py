"""Dependency-free baseline JPEG codec (grayscale) — the flagship codec gap.

Closes the "compressed formats stay behind a PIL gate" caveat for the
dominant crawl format: a REAL baseline-DCT JPEG decoder (marker parse,
DQT/DHT table build, canonical Huffman entropy decode with byte
unstuffing, DC prediction, zig-zag dequant, float IDCT) plus an encoder
(forward DCT, standard Annex K luminance Huffman tables) so differential
tests run on genuine self-produced streams.  Scope: single-component
(grayscale) baseline, 8-bit — the decoder rejects progressive (SOF2) and
multi-component frames explicitly rather than mis-decoding them; color
YCbCr stays honestly out of scope (it multiplies table plumbing without
adding decode-correctness signal).

Oracle strategy (same philosophy as BMP/PNG/GIF): JPEG is lossy, so a
generic closed-form oracle is impossible — EXCEPT for blocks that are
CONSTANT: their forward DCT is exactly DC = 8·(v−128), AC = 0; with a
quantization table of all ones the quantized DC is that exact integer,
and any faithful IDCT returns DC/8 = v−128 exactly in IEEE arithmetic
(division by 8 is exact).  ``synth_jpeg_media`` therefore colors each
8×8 block with one recipe value, making the full encode→Huffman→decode
pipeline bit-exact and SQL-assertable, while the decoder itself remains a
general baseline decoder (run-length AC, ZRL, EOB, restart-free scans).
"""

from __future__ import annotations

import math
import struct

# Zig-zag order (index: zig-zag position -> block position)
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Standard luminance Huffman tables (JPEG Annex K) — BITS then HUFFVAL
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for u in range(8)]
    for x in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) canonical Huffman assignment."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value for the decoder."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _category(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


class _JBitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc, self._n = 0, 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self._acc = (self._acc << 1) | ((code >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)
                self._acc, self._n = 0, 0

    def flush(self) -> bytes:
        while self._n:
            self.write(1, 1)  # pad with 1-bits per spec
        return bytes(self.out)


class _JBitReader:
    """MSB-first reader over entropy data with 0xFF00 unstuffing."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.byte_pos = 0
        self.bit_pos = 0

    def read_bit(self) -> int:
        while True:
            if self.byte_pos >= len(self.data):
                raise ValueError("entropy data exhausted")
            b = self.data[self.byte_pos]
            if b == 0xFF:
                nxt = (
                    self.data[self.byte_pos + 1]
                    if self.byte_pos + 1 < len(self.data)
                    else None
                )
                if nxt != 0x00:
                    raise ValueError("unexpected marker in entropy data")
            bit = (b >> (7 - self.bit_pos)) & 1
            self.bit_pos += 1
            if self.bit_pos == 8:
                self.bit_pos = 0
                self.byte_pos += 2 if b == 0xFF else 1
            return bit

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------
def encode_jpeg_gray(
    width: int, height: int, gray: bytes, quant: int = 1
) -> bytes:
    """Serialize grayscale pixels as a baseline JFIF JPEG (single
    component, flat quantization table of ``quant``, standard Huffman
    tables).  ``quant=1`` keeps constant 8×8 blocks bit-exact through the
    whole pipeline (module docstring)."""
    if len(gray) != width * height:
        raise ValueError("pixel buffer does not match dimensions")
    if not 1 <= quant <= 255:
        raise ValueError("quant out of range")
    dc_codes = _build_codes(DC_BITS, DC_VALS)
    ac_codes = _build_codes(AC_BITS, AC_VALS)
    bw = _JBitWriter()
    prev_dc = 0
    bw_blocks_w = (width + 7) // 8
    bw_blocks_h = (height + 7) // 8
    for by in range(bw_blocks_h):
        for bx in range(bw_blocks_w):
            # edge-replicated 8x8 block, level-shifted
            block = [
                gray[min(by * 8 + y, height - 1) * width + min(bx * 8 + x, width - 1)]
                - 128
                for y in range(8)
                for x in range(8)
            ]
            # forward DCT -> zig-zag quantized coefficients
            coeffs = [0] * 64
            for zz in range(64):
                pos = ZIGZAG[zz]
                u, v = pos % 8, pos // 8
                s = 0.0
                for y in range(8):
                    cy = _COS[y][v]
                    row = y * 8
                    for x in range(8):
                        s += block[row + x] * _COS[x][u] * cy
                val = 0.25 * _C[u] * _C[v] * s
                coeffs[zz] = round(val / quant)
            diff = coeffs[0] - prev_dc
            prev_dc = coeffs[0]
            t = _category(diff)
            code, ln = dc_codes[t]
            bw.write(code, ln)
            if t:
                bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
            run = 0
            last_nz = max((i for i in range(1, 64) if coeffs[i]), default=0)
            for i in range(1, last_nz + 1):
                if coeffs[i] == 0:
                    run += 1
                    if run == 16:
                        zc, zl = ac_codes[0xF0]  # ZRL
                        bw.write(zc, zl)
                        run = 0
                    continue
                t = _category(coeffs[i])
                sc, sl = ac_codes[(run << 4) | t]
                bw.write(sc, sl)
                v = coeffs[i]
                bw.write(v if v >= 0 else v + (1 << t) - 1, t)
                run = 0
            if last_nz < 63:
                ec, el = ac_codes[0x00]  # EOB
                bw.write(ec, el)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0x00]) + bytes([quant] * 64))  # DQT, table 0
    out += seg(
        0xFFC0, struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    )  # SOF0
    out += seg(0xFFC4, bytes([0x00]) + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS
    out += entropy
    out += b"\xff\xd9"  # EOI
    return out


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------
def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """Decode a baseline single-component JPEG → (width, height, top-down
    BGR bytes), the shared codec output convention.  Rejects progressive
    (SOF2), multi-component, and restart-interval scans explicitly."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (no SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = None
    qsel = None
    scan_start = None
    dc_sel = ac_sel = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = struct.unpack_from(">H", data, pos)[0]
        if marker == 0xFFD9:
            break
        if marker in (0xFFC2,):
            raise ValueError("progressive JPEG not supported")
        length = struct.unpack_from(">H", data, pos + 2)[0]
        payload = data[pos + 4 : pos + 2 + length]
        if marker == 0xFFDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                p += 1
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                qtables[tq] = list(payload[p : p + 64])
                p += 64
        elif marker == 0xFFC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xFFC0:
            precision, height, width, ncomp = struct.unpack_from(
                ">BHHB", payload, 0
            )
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            if ncomp != 1:
                raise ValueError("only single-component (grayscale) supported")
            # component spec: id, sampling, quant selector at payload[6:9]
            if payload[7] != 0x11:
                raise ValueError("subsampled grayscale is malformed")
            qsel = payload[8]
        elif marker == 0xFFDD:
            raise ValueError("restart intervals not supported")
        elif marker == 0xFFDA:
            ns = payload[0]
            if ns != 1:
                raise ValueError("multi-component scan not supported")
            dc_sel, ac_sel = payload[2] >> 4, payload[2] & 0x0F
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    if scan_start is None or width is None or qsel is None:
        raise ValueError("missing SOF/SOS")
    if qsel not in qtables:
        raise ValueError("quant table not defined")
    dc_tab = htables.get((0, dc_sel))
    ac_tab = htables.get((1, ac_sel))
    if dc_tab is None or ac_tab is None:
        raise ValueError("huffman tables not defined")
    q = qtables[qsel]

    br = _JBitReader(data[scan_start:])

    def read_code(tab: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.read_bit()
            length += 1
            if (length, code) in tab:
                return tab[(length, code)]
        raise ValueError("invalid huffman code")

    bw_ = (width + 7) // 8
    bh_ = (height + 7) // 8
    gray = bytearray(width * height)
    prev_dc = 0
    for by in range(bh_):
        for bx in range(bw_):
            coeffs = [0] * 64
            t = read_code(dc_tab)
            diff = _extend(br.read_bits(t), t) if t else 0
            prev_dc += diff
            coeffs[0] = prev_dc * q[0]
            i = 1
            while i < 64:
                rs = read_code(ac_tab)
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    i += 16
                    continue
                run, t = rs >> 4, rs & 0x0F
                i += run
                if i > 63:
                    raise ValueError("AC run overflows block")
                coeffs[i] = _extend(br.read_bits(t), t) * q[i]
                i += 1
            # dezigzag + IDCT
            blk = [0] * 64
            for zz in range(64):
                blk[ZIGZAG[zz]] = coeffs[zz]
            for y in range(8):
                py = by * 8 + y
                if py >= height:
                    break
                for x in range(8):
                    px_ = bx * 8 + x
                    if px_ >= width:
                        continue
                    s = 0.0
                    for v in range(8):
                        cv = _C[v] * _COS[y][v]
                        row = v * 8
                        for u in range(8):
                            c = blk[row + u]
                            if c:
                                s += _C[u] * c * _COS[x][u] * cv
                    val = round(s / 4) + 128
                    gray[py * width + px_] = max(0, min(255, val))
    bgr = bytearray(width * height * 3)
    for p in range(width * height):
        g = gray[p]
        bgr[p * 3 : p * 3 + 3] = bytes((g, g, g))
    return width, height, bytes(bgr)
