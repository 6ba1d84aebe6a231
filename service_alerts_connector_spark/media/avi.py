"""Dependency-free AVI (MJPEG) container codec — real video frame sampling.

Completes the modality set: with WAV (audio) and BMP/PNG/GIF/JPEG (image)
real, video no longer needs to be a stub either.  Motion-JPEG-in-AVI is a
genuine, widely-produced format (webcams, older cameras, OpenCV's default
writer) whose container is RIFF — the same chunk discipline as WAV — and
whose frames are baseline JPEGs, which ``media/jpeg.py`` already decodes.
So frame extraction ("give me every Nth frame decoded") runs end-to-end on
real bytes: RIFF walk → LIST movi → 00dc chunks → JPEG entropy decode.

Modern codecs (H.264/VP9/AV1) stay behind an import gate like compressed
audio — inter-frame prediction is out of stdlib scope — but the *container*
walking, frame indexing, and sampling logic here is exactly what those
paths share.
"""

from __future__ import annotations

import struct

CHUNK = struct.Struct("<4sI")


def encode_avi_mjpeg(
    width: int,
    height: int,
    frames: list[bytes],
    fps: int = 10,
) -> bytes:
    """Wrap pre-encoded JPEG frames in a minimal valid AVI (vids/MJPG
    stream, correct avih/strh/strf headers, movi chunk list)."""
    if not frames:
        raise ValueError("at least one frame required")

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) % 2 else b""
        return CHUNK.pack(cid, len(payload)) + payload + pad

    def list_chunk(kind: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", kind + payload)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0x10,        # max bytes/s, padding, flags (HASINDEX off)
        len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0,
        1, fps, 0, len(frames),  # scale, rate, start, length
        0, 0xFFFFFFFF, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = list_chunk(
        b"hdrl",
        chunk(b"avih", avih)
        + list_chunk(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = list_chunk(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return CHUNK.pack(b"RIFF", len(body)) + body


def _walk(data: bytes, pos: int, end: int):
    while pos + CHUNK.size <= end:
        cid, size = CHUNK.unpack_from(data, pos)
        payload_start = pos + CHUNK.size
        if payload_start + size > len(data):
            raise ValueError(f"chunk {cid!r} overruns container")
        yield cid, payload_start, size
        pos = payload_start + size + (size % 2)


def decode_avi_frames(data: bytes) -> dict:
    """Parse an AVI and return
    ``{"width", "height", "n_frames", "us_per_frame", "frames"}`` with
    frames as the raw per-frame byte blobs (JPEG for MJPG streams) in
    stream order.  Raises ValueError for non-AVI/truncated containers."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    width = height = n_frames = us_per_frame = None
    frames: list[bytes] = []
    for cid, start, size in _walk(data, 12, len(data)):
        if cid != b"LIST":
            continue
        kind = data[start : start + 4]
        if kind == b"hdrl":
            for c2, s2, z2 in _walk(data, start + 4, start + size):
                if c2 == b"avih":
                    if z2 < 40:
                        raise ValueError("avih too short")
                    vals = struct.unpack_from("<IIIIIIIIII", data, s2)
                    us_per_frame, n_frames = vals[0], vals[4]
                    width, height = vals[8], vals[9]
        elif kind == b"movi":
            for c2, s2, z2 in _walk(data, start + 4, start + size):
                if c2[2:4] in (b"dc", b"db"):  # compressed / uncompressed frame
                    frames.append(data[s2 : s2 + z2])
    if width is None:
        raise ValueError("missing avih header")
    if not frames:
        raise ValueError("no frame chunks in movi list")
    return {
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "us_per_frame": us_per_frame,
        "frames": frames,
    }


def sample_decoded_frames(
    data: bytes, every_n: int = 1
) -> list[tuple[int, int, int, bytes]]:
    """Real frame sampling: every Nth frame of an MJPEG AVI, decoded to
    (frame_index, width, height, BGR bytes) via the stdlib JPEG decoder."""
    from service_alerts_connector_spark.media import jpeg

    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    meta = decode_avi_frames(data)
    out = []
    for i in range(0, len(meta["frames"]), every_n):
        w, h, bgr = jpeg.decode_jpeg_gray(meta["frames"][i])
        out.append((i, w, h, bgr))
    return out
