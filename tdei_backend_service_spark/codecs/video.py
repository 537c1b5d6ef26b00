"""'vraw' video container — deterministic raw-RGB frame stack, pure numpy.

Real video codecs (h264/vp9/mp4) need native libraries this container
lacks, so the engine defines a minimal UNCOMPRESSED container for the
frame-sampling path to be real and testable end-to-end:

    b"VRAW" | u32 n_frames | u32 width | u32 height | frames...

where each frame is width*height*3 raw RGB bytes. The frame-sampling
operator (pipeline/multimodal.sample_video_frames) parses this for
fmt='vraw' and raises ValueError for compressed formats — production
drops a real decoder into the same parse hook with no plumbing change.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"VRAW"


def vraw_bytes(frames: np.ndarray) -> bytes:
    """Serialize (n, h, w, 3) uint8 frames to a vraw blob."""
    f = np.ascontiguousarray(frames, dtype=np.uint8)
    if f.ndim != 4 or f.shape[3] != 3:
        raise ValueError("frames must be (n, h, w, 3) uint8")
    n, h, w, _ = f.shape
    return MAGIC + struct.pack("<III", n, w, h) + f.tobytes()


def parse_vraw(blob: bytes) -> np.ndarray:
    """Parse a vraw blob -> (n, h, w, 3) uint8 frame array."""
    b = bytes(blob)
    if len(b) < 16 or b[:4] != MAGIC:
        raise ValueError("not a vraw blob")
    n, w, h = struct.unpack("<III", b[4:16])
    need = n * w * h * 3
    body = np.frombuffer(b, dtype=np.uint8, count=need, offset=16)
    if body.size != need:
        raise ValueError("truncated vraw payload")
    return body.reshape(n, h, w, 3)
