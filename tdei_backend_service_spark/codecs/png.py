"""Minimal pure-python PNG codec (numpy + zlib; 8-bit gray / RGB).

PIL/opencv are not available in this environment, yet the input_hint's
per-row invariant ("decoded-pixel allclose, PSNR>=40dB for lossy;
caption equality") requires real, decodable image bytes. PNG is just
zlib-compressed filtered scanlines inside CRC'd chunks, so a compact
deterministic codec is implementable directly. Encoding always uses
filter type 0 (None); decoding supports filters 0-4 for robustness.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return struct.pack(">I", len(data)) + tag + data + struct.pack(
        ">I", zlib.crc32(tag + data) & 0xFFFFFFFF)


def encode_png(img: np.ndarray) -> bytes:
    """img: uint8 array (h, w) grayscale or (h, w, 3) RGB -> PNG bytes."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, channels = 0, 1
        img = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError("expected (h,w) gray or (h,w,3) RGB uint8")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), img.reshape(h, w * channels)], axis=1
    ).tobytes()
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)
    out = np.zeros_like(data)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        f = ftypes[r]
        cur = data[r].copy()
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif f == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[r] = cur
        prev = cur
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (h, w) or (h, w, 3)."""
    if bytes(data[:8]) != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    idat = b""
    w = h = color_type = None
    data = bytes(data)
    while pos < len(data):
        ln, tag = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8: pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError("unsupported PNG variant")
            if color_type not in (0, 2):
                raise ValueError("only gray/RGB supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    channels = 1 if color_type == 0 else 3
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    if (np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)[:, 0] == 0).all():
        img = raw.reshape(h, stride + 1)[:, 1:]
    else:
        img = _unfilter(raw, h, stride, channels)
    img = img.reshape(h, w, channels)
    return img[:, :, 0] if channels == 1 else img
