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


# ---------------------------------------------------------------------------
# WAV (PCM16) and vraw codecs
# ---------------------------------------------------------------------------


def test_wav_roundtrip_and_chunk_walk():
    import struct

    import numpy as np

    from tdei_backend_service_spark.codecs.audio import parse_wav, wav_bytes
    rng = np.random.default_rng(4)
    s = rng.integers(-30000, 30000, 777, dtype=np.int16)
    blob = wav_bytes(s, 22050)
    back, rate = parse_wav(blob)
    assert rate == 22050 and np.array_equal(back, s)
    # extra chunk BEFORE data must be skipped (word-aligned walk)
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = blob[:36] + extra + blob[36:]
    riff = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back2, _ = parse_wav(riff)
    assert np.array_equal(back2, s)
    # stereo averages to mono
    st = np.stack([s, s.astype(np.int32) + 2], axis=1).astype(np.int16)
    hdr = wav_bytes(np.zeros(0, np.int16), 22050)
    stereo = (hdr[:22] + struct.pack("<H", 2) + hdr[24:40]
              + struct.pack("<I", st.size * 2) + st.astype("<i2").tobytes())
    back3, _ = parse_wav(stereo)
    assert np.array_equal(back3, (s.astype(np.int64) * 2 + 2) // 2)


def test_wav_rejects_non_pcm():
    import struct

    import numpy as np
    import pytest

    from tdei_backend_service_spark.codecs.audio import parse_wav, wav_bytes
    with pytest.raises(ValueError):
        parse_wav(b"not audio at all")
    blob = bytearray(wav_bytes(np.zeros(4, np.int16)))
    blob[20:22] = struct.pack("<H", 3)  # float PCM tag
    with pytest.raises(ValueError):
        parse_wav(bytes(blob))


def test_vraw_roundtrip_and_errors():
    import numpy as np
    import pytest

    from tdei_backend_service_spark.codecs.video import parse_vraw, vraw_bytes
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (6, 3, 5, 3), dtype=np.uint8)
    assert np.array_equal(parse_vraw(vraw_bytes(frames)), frames)
    with pytest.raises(ValueError):
        parse_vraw(b"MPEG....")
    with pytest.raises(ValueError):
        parse_vraw(vraw_bytes(frames)[:-10])  # truncated payload


def test_wav_truncated_fmt_raises_valueerror():
    """A blob cut off mid-fmt-chunk (declared size 16, fewer body bytes
    present) must raise the documented ValueError, not struct.error
    (ADVICE r3 low #2)."""
    import numpy as np
    import pytest

    from tdei_backend_service_spark.codecs.audio import parse_wav, wav_bytes
    blob = wav_bytes(np.zeros(4, np.int16), 8000)
    truncated = blob[:30]  # fmt body ends at offset 36; only 10 bytes left
    with pytest.raises(ValueError):
        parse_wav(truncated)
