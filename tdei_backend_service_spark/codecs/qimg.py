"""Deterministic lossy codec 'qimg' (quantize + zlib) — the jpeg stand-in.

No jpeg library exists in this environment, but the input_hint invariant
("PSNR >= 40 dB for lossy") needs a *real* lossy round-trip to verify.
qimg quantizes 8-bit channels with step Q (mid-rise reconstruct) and
zlib-compresses the result. Worst-case per-pixel error is Q/2, so with
the default Q=4 the RMSE is <= ~1.16 -> PSNR >= 46 dB, comfortably above
the 40 dB gate while actually losing information (bytes differ, pixels
differ). Header: b'QIMG' | ver u8 | channels u8 | w u32 | h u32 | q u8.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"QIMG"
DEFAULT_Q = 4


def encode_qimg(img: np.ndarray, q: int = DEFAULT_Q) -> bytes:
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    quant = (img.astype(np.uint16) // q).astype(np.uint8)
    header = _MAGIC + struct.pack("<BBIIB", 1, c, w, h, q)
    return header + zlib.compress(quant.tobytes(), 6)


def decode_qimg(data: bytes) -> np.ndarray:
    data = bytes(data)
    if data[:4] != _MAGIC:
        raise ValueError("not a qimg")
    ver, c, w, h, q = struct.unpack_from("<BBIIB", data, 4)
    raw = np.frombuffer(zlib.decompress(data[15:]), dtype=np.uint8).reshape(h, w, c)
    # mid-rise reconstruction: center of the quantization bin
    out = np.minimum(raw.astype(np.uint16) * q + q // 2, 255).astype(np.uint8)
    return out[:, :, 0] if c == 1 else out
