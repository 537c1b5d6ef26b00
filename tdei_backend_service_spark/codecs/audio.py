"""WAV (RIFF PCM16 mono) codec — pure numpy, no external libraries.

PCM WAV is a public, trivially-parseable container (RIFF chunks + raw
little-endian samples), so unlike jpeg/mp4 the audio path needs no
codec library: encode and decode here are REAL, making audio feature
extraction (pipeline/multimodal.py) a fully tested operator rather than
an environment stub. Compressed audio (mp3/aac/flac) remains out of
scope for this container and raises ValueError at parse.
"""

from __future__ import annotations

import struct

import numpy as np


def wav_bytes(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Serialize int16 mono samples to a canonical PCM16 WAV blob."""
    s = np.asarray(samples, dtype="<i2")
    data = s.tobytes()
    byte_rate = sample_rate * 2
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 36 + len(data)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                             byte_rate, 2, 16),
        b"data", struct.pack("<I", len(data)),
    ])
    return hdr + data


def parse_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """Parse a PCM16 mono WAV blob -> (int16 sample array, sample_rate).

    Walks RIFF chunks properly (tolerates extra chunks like LIST before
    data). Raises ValueError on non-RIFF input, non-PCM encodings, or
    bit depths other than 16."""
    b = bytes(blob)
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    rate: int | None = None
    channels = 1
    data: bytes | None = None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4:pos + 8])
        body = b[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            # both the DECLARED size and the ACTUAL bytes must cover the
            # 16-byte PCM header — a blob truncated mid-chunk otherwise
            # surfaces struct.error instead of the documented ValueError
            # (ADVICE r3 low #2)
            if size < 16 or len(body) < 16:
                raise ValueError("truncated fmt chunk")
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if fmt_tag != 1:
                raise ValueError(f"non-PCM WAV (format tag {fmt_tag})")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if channels > 1:  # average to mono (deterministic int floor-div)
        n = (samples.size // channels) * channels
        samples = (samples[:n].reshape(-1, channels)
                   .astype(np.int64).sum(axis=1) // channels).astype(np.int16)
    return samples.astype(np.int16), int(rate)
