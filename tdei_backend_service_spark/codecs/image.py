"""Format-dispatching image helpers + perceptual hash + PSNR.

`fmt` column values: 'png' (lossless) and 'qimg' (deterministic lossy —
the jpeg stand-in; see qimg.py). A real 'jpeg' path is stubbed: the
container has no jpeg library, so decode_image('jpeg') raises
NotImplementedError with a clear message, per the multimodal-stub
guidance. All Spark-side plumbing (binary column, mapInPandas batch
shape) is identical for a real jpeg codec.
"""

from __future__ import annotations

import numpy as np

from .png import decode_png, encode_png
from .qimg import decode_qimg, encode_qimg

LOSSLESS_FMTS = {"png"}
LOSSY_FMTS = {"qimg", "jpeg"}


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(img)
    if fmt == "qimg":
        return encode_qimg(img)
    if fmt == "jpeg":
        raise NotImplementedError("no jpeg codec in this environment; use fmt='qimg' (deterministic lossy stand-in)")
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "qimg":
        return decode_qimg(data)
    if fmt == "jpeg":
        raise NotImplementedError("no jpeg codec in this environment; use fmt='qimg' (deterministic lossy stand-in)")
    raise ValueError(f"unknown fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical images)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0 ** 2 / mse))


def _to_gray(img: np.ndarray) -> np.ndarray:
    if img.ndim == 3:
        return (0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2])
    return img.astype(np.float64)


def ahash64(img: np.ndarray) -> int:
    """64-bit average hash: mean-pool to 8x8 gray, threshold at the mean.

    Deterministic and quantization-tolerant — identical pixels always give
    identical hashes, and qimg round-trips preserve it, so duplicate
    images share phash by construction (FIXTURES.md T1).
    """
    g = _to_gray(np.asarray(img))
    h, w = g.shape
    if h == 8 and w == 8:
        # the dominant fixture shape: pooling onto an 8x8 grid is the
        # identity (each cell is a single pixel), so skip the 64
        # slice-mean calls — bit-identical, ~20x less per-call overhead
        pooled = g
    else:
        # integral-free mean pooling onto an 8x8 grid (handles non-multiples)
        ys = (np.arange(9) * h) // 8
        xs = (np.arange(9) * w) // 8
        pooled = np.empty((8, 8))
        for i in range(8):
            for j in range(8):
                pooled[i, j] = g[ys[i]:max(ys[i + 1], ys[i] + 1),
                                 xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
    bits = (pooled > pooled.mean()).ravel()
    # MSB-first pack == the former (val << 1) | bit loop, minus 64
    # Python-int ops per image
    val = int.from_bytes(np.packbits(bits).tobytes(), "big")
    # fold to signed int64 range
    if val >= 1 << 63:
        val -= 1 << 64
    return val
