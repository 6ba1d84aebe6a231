"""Dependency-free RIFF/WAVE PCM16 codec — the audio tier's real decoder.

Same role as ``media/bmp.py`` and ``media/png.py`` for images: the audio
modality should not be a pure stub just because torchaudio/ffmpeg aren't in
the container.  WAV PCM is a real-world container (voice datasets,
telephony dumps) parseable with ``struct`` alone, so the Spark-side
plumbing (binary column → mapInPandas decode → integer feature frame) runs
against genuine bytes and a differential oracle can check the decoder
closed-form.  Compressed audio (MP3/FLAC/Opus) stays behind an import
gate, like JPEG for images.

Format notes (RIFF spec): little-endian chunks, each ``<4s id><u32 size>``
padded to even length; ``fmt `` must declare PCM (tag 1) 16-bit; unknown
chunks (LIST, fact, cue…) are skipped — real encoders emit them, and a
decoder that assumes ``data`` follows ``fmt `` immediately breaks on half
the files in a crawl.
"""

from __future__ import annotations

import struct

HDR = struct.Struct("<4sI4s")
CHUNK = struct.Struct("<4sI")
FMT = struct.Struct("<HHIIHH")


def encode_wav_pcm16(
    sample_rate: int, samples: list[int], channels: int = 1
) -> bytes:
    """Serialize interleaved PCM16 samples as a minimal valid WAV file."""
    if channels < 1:
        raise ValueError("channels must be >= 1")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channels")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    fmt = FMT.pack(1, channels, sample_rate, sample_rate * block_align,
                   block_align, 16)
    body = (
        CHUNK.pack(b"fmt ", len(fmt)) + fmt
        + CHUNK.pack(b"data", len(data)) + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return HDR.pack(b"RIFF", 4 + len(body), b"WAVE") + body


def decode_wav_pcm16(blob: bytes) -> dict:
    """Parse a PCM16 WAV blob by walking the chunk list.

    Returns ``{"sample_rate", "n_channels", "samples"}`` (samples
    interleaved).  Raises ``ValueError`` on anything that is not valid
    PCM16 WAVE — callers in decode kernels catch it and emit null rows,
    matching the image tier's corrupt-blob convention.
    """
    if len(blob) < HDR.size:
        raise ValueError("truncated RIFF header")
    riff, riff_size, wave = HDR.unpack_from(blob, 0)
    if riff != b"RIFF" or wave != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = HDR.size, min(len(blob), 8 + riff_size)
    fmt = None
    data = None
    while pos + CHUNK.size <= end:
        cid, size = CHUNK.unpack_from(blob, pos)
        pos += CHUNK.size
        if pos + size > len(blob):
            raise ValueError(f"chunk {cid!r} overruns blob")
        payload = blob[pos : pos + size]
        if cid == b"fmt ":
            if size < FMT.size:
                raise ValueError("fmt chunk too short")
            fmt = FMT.unpack_from(payload, 0)
        elif cid == b"data":
            data = payload
        pos += size + (size % 2)  # chunks pad to even length
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, block_align, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"not PCM16 (format={audio_format}, bits={bits})")
    if block_align != n_channels * 2:
        raise ValueError("block_align inconsistent with PCM16")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "samples": samples,
    }
