import numpy as np
import pytest

from tdei_backend_service_spark.codecs import (ahash64, decode_image,
                                               decode_png, decode_qimg,
                                               encode_image, encode_png,
                                               encode_qimg, psnr)


def test_png_roundtrip_rgb():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    out = decode_png(encode_png(img))
    assert np.array_equal(out, img)


def test_png_roundtrip_gray():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img)), img)


def test_qimg_lossy_psnr_gate():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    blob = encode_qimg(img)
    out = decode_qimg(blob)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)  # genuinely lossy
    assert psnr(img, out) >= 40.0        # input_hint invariant
    # deterministic
    assert blob == encode_qimg(img)


def test_psnr_identical_inf():
    img = np.zeros((4, 4), dtype=np.uint8)
    assert psnr(img, img) == float("inf")


def test_jpeg_stubbed():
    with pytest.raises(NotImplementedError):
        encode_image(np.zeros((4, 4), dtype=np.uint8), "jpeg")
    with pytest.raises(NotImplementedError):
        decode_image(b"xx", "jpeg")


def test_ahash_stable_under_quantization():
    rng = np.random.default_rng(3)
    # smooth image: quantization shouldn't flip mean-threshold bits
    x = np.linspace(0, 255, 32)
    img = np.clip(np.add.outer(x, x) / 2 + rng.normal(0, 4, (32, 32)), 0, 255).astype(np.uint8)
    h1 = ahash64(img)
    h2 = ahash64(decode_qimg(encode_qimg(img)))
    assert h1 == h2
    assert isinstance(h1, int)
