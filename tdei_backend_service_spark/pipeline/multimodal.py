"""Multimodal column processing: image decode / feature-extract / resize
over opaque binary columns, with typed metadata — the Spark plumbing a
training-data pipeline needs for image/audio/video payloads.

Real codecs exist for 'png' and 'qimg' images (codecs/image.py), PCM16
WAV audio (codecs/audio.py — a public uncompressed container numpy can
parse alone), and the 'vraw' raw-RGB video container (codecs/video.py),
so image decode/resize/features, audio feature extraction, and video
frame sampling are all REAL and tested end-to-end. Only compressed
codecs (jpeg, mp3/aac, h264/mp4) are environment stubs (no codec
libraries in this container); they raise at parse inside the same
mapInPandas hooks a production decoder drops into.

Everything runs as mapInPandas over Arrow batches: one Python crossing
per batch, numpy inside. bytes columns never pass through a shuffle —
these are map-only stages.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..codecs.image import ahash64, decode_image, psnr

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("ok", T.BooleanType()),
    T.StructField("err", T.StringType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("std_gray", T.DoubleType()),
    T.StructField("rehash", T.LongType()),
    T.StructField("phash_match", T.BooleanType()),
])


DECODE_META_SCHEMA = T.StructType([
    T.StructField("image_id", T.LongType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("phash", T.LongType()),
])


def decode_metadata(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """Decode every blob and emit ONLY decode-derived metadata
    (dims + recomputed ahash64) — nothing copied from stored columns, so
    a SQL oracle over closed-form fixtures puts the real decode path
    under the hash-exact gate (VERDICT r3 next #7). Map-only: bytes
    never shuffle; undecodable rows are dropped (count mismatches
    surface them)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, fmts, hashes = [], [], [], [], []
            # zip over columns, not .iloc per cell — same rows, ~2x
            # less per-row indexing overhead in the decode hot loop
            for rid, blob, fmt in zip(pdf[id_col].to_numpy(),
                                      pdf["bytes"], pdf["fmt"]):
                try:
                    img = decode_image(blob, fmt)
                except (NotImplementedError, ValueError):
                    continue
                h, w = img.shape[:2]
                ids.append(rid)
                ws.append(w)
                hs.append(h)
                fmts.append(fmt)
                hashes.append(ahash64(img))
            yield pd.DataFrame({
                "image_id": pd.array(ids, dtype="int64"),
                "w": pd.array(ws, dtype="int32"),
                "h": pd.array(hs, dtype="int32"),
                "fmt": fmts,
                "phash": pd.array(hashes, dtype="int64"),
            })

    return df.select(F.col(id_col).alias(id_col), "bytes", "fmt") \
             .mapInPandas(gen, schema=DECODE_META_SCHEMA)


def image_features(df: DataFrame) -> DataFrame:
    """Decode every image and extract channel means / contrast / a
    recomputed perceptual hash (verifies the stored phash — the
    input_hint per-row invariant machinery)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            out = {k: np.zeros(n, dtype=object) for k in
                   ("image_id", "err")}
            ok = np.zeros(n, dtype=bool)
            means = np.full((n, 3), np.nan)
            stds = np.full(n, np.nan)
            rehash = np.zeros(n, dtype=np.int64)
            match = np.zeros(n, dtype=bool)
            for i in range(n):
                out["image_id"][i] = pdf["image_id"].iloc[i]
                out["err"][i] = None
                try:
                    img = decode_image(pdf["bytes"].iloc[i], pdf["fmt"].iloc[i])
                    a = img if img.ndim == 3 else np.stack([img] * 3, axis=-1)
                    means[i] = a.reshape(-1, 3).mean(axis=0)
                    g = a.mean(axis=2)
                    stds[i] = g.std()
                    rehash[i] = ahash64(img)
                    match[i] = rehash[i] == pdf["phash"].iloc[i]
                    ok[i] = True
                except (NotImplementedError, ValueError) as e:
                    out["err"][i] = f"{type(e).__name__}: {e}"
            yield pd.DataFrame({
                "image_id": out["image_id"], "ok": ok, "err": out["err"],
                "mean_r": means[:, 0], "mean_g": means[:, 1], "mean_b": means[:, 2],
                "std_gray": stds, "rehash": rehash, "phash_match": match,
            })

    return df.select("image_id", "bytes", "fmt", "phash").mapInPandas(
        gen, schema=IMAGE_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("image_id", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("pixels", T.BinaryType()),  # raw uint8 h*w*3, row-major
])


def resize_images(df: DataFrame, out_px: int = 4) -> DataFrame:
    """Mean-pool every image to (out_px, out_px, 3) raw pixels — the
    thumbnail/feature-input stage. Output is raw bytes + dims (typed
    metadata beside an opaque payload)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, blobs = [], [], [], []
            for i in range(len(pdf)):
                try:
                    img = decode_image(pdf["bytes"].iloc[i], pdf["fmt"].iloc[i])
                except (NotImplementedError, ValueError):
                    continue
                a = img if img.ndim == 3 else np.stack([img] * 3, axis=-1)
                h, w = a.shape[:2]
                ys = (np.arange(out_px + 1) * h) // out_px
                xs = (np.arange(out_px + 1) * w) // out_px
                small = np.zeros((out_px, out_px, 3), dtype=np.uint8)
                for r in range(out_px):
                    for c in range(out_px):
                        small[r, c] = a[ys[r]:max(ys[r + 1], ys[r] + 1),
                                        xs[c]:max(xs[c + 1], xs[c] + 1)].mean(axis=(0, 1))
                ids.append(pdf["image_id"].iloc[i])
                ws.append(out_px)
                hs.append(out_px)
                blobs.append(small.tobytes())
            yield pd.DataFrame({"image_id": ids, "w": pd.array(ws, dtype="int32"),
                                "h": pd.array(hs, dtype="int32"), "pixels": blobs})

    return df.select("image_id", "bytes", "fmt").mapInPandas(gen, schema=RESIZED_SCHEMA)


AUGMENT_OPS = ("flip_h", "flip_v", "rot90", "crop_tl")

AUGMENT_SCHEMA = T.StructType([
    T.StructField("image_id", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
])

PIXEL_SUM_SCHEMA = T.StructType([
    T.StructField("image_id", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("sum_px", T.LongType()),
])


def _apply_aug(img: np.ndarray, op: str) -> np.ndarray:
    if op == "flip_h":
        return img[:, ::-1]
    if op == "flip_v":
        return img[::-1, :]
    if op == "rot90":
        return np.rot90(img)
    if op == "crop_tl":
        return img[: img.shape[0] // 2, : img.shape[1] // 2]
    raise ValueError(f"unknown augmentation {op!r}")


def augment_images(df: DataFrame, ops: tuple = AUGMENT_OPS,
                   id_col: str = "image_id") -> DataFrame:
    """Deterministic training-data augmentation: decode each blob ONCE,
    apply every requested transform (horizontal/vertical flip, 90-degree
    rotation, top-left half crop), re-encode losslessly as PNG. Map-only
    — each input row fans out to len(ops) output rows inside the same
    task, so at 10^12 images the stage is one pass with no shuffle and
    no second decode per op. Undecodable blobs are dropped."""
    bad = [o for o in ops if o not in AUGMENT_OPS]
    if bad:
        raise ValueError(f"unknown augmentation(s) {bad}")
    from ..codecs.image import encode_image

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, names, ws, hs, fmts, blobs = [], [], [], [], [], []
            for i in range(len(pdf)):
                try:
                    img = decode_image(pdf["bytes"].iloc[i],
                                       pdf["fmt"].iloc[i])
                except (NotImplementedError, ValueError):
                    continue
                for op in ops:
                    out = np.ascontiguousarray(_apply_aug(img, op))
                    ids.append(int(pdf[id_col].iloc[i]))
                    names.append(op)
                    hs.append(out.shape[0])
                    ws.append(out.shape[1])
                    fmts.append("png")
                    blobs.append(encode_image(out, "png"))
            yield pd.DataFrame({
                "image_id": pd.array(ids, dtype="int64"),
                "op": names,
                "w": pd.array(ws, dtype="int32"),
                "h": pd.array(hs, dtype="int32"),
                "fmt": fmts,
                "bytes": blobs,
            })

    return (df.select(F.col(id_col).alias(id_col), "bytes", "fmt")
            .mapInPandas(gen, schema=AUGMENT_SCHEMA))


def decode_pixel_sums(df: DataFrame, id_col: str = "image_id") -> DataFrame:
    """(id, op, w, h, total pixel sum over all channels) recomputed from
    the DECODED bytes — the decode_meta pattern for augmented blobs, so
    closed-form fixtures put transform+re-encode under the SQL oracle."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, names, ws, hs, sums = [], [], [], [], []
            for i in range(len(pdf)):
                img = decode_image(pdf["bytes"].iloc[i], pdf["fmt"].iloc[i])
                ids.append(int(pdf[id_col].iloc[i]))
                names.append(pdf["op"].iloc[i] if "op" in pdf else "")
                hs.append(img.shape[0])
                ws.append(img.shape[1])
                sums.append(int(img.astype(np.int64).sum()))
            yield pd.DataFrame({
                "image_id": pd.array(ids, dtype="int64"),
                "op": names,
                "w": pd.array(ws, dtype="int32"),
                "h": pd.array(hs, dtype="int32"),
                "sum_px": pd.array(sums, dtype="int64"),
            })

    cols = [id_col, "op", "bytes", "fmt"] if "op" in df.columns \
        else [id_col, "bytes", "fmt"]
    return df.select(*cols).mapInPandas(gen, schema=PIXEL_SUM_SCHEMA)


def decode_mse_cols(df: DataFrame, id_col: str = "image_id",
                    a_cols: tuple = ("bytes", "fmt"),
                    b_cols: tuple = ("bytes_b", "fmt_b")) -> DataFrame:
    """Per-row decoded-pixel fidelity between two payload columns of
    the SAME record — the north rule's per-row invariant (decoded-pixel
    allclose / PSNR >= 40 dB for lossy) as a first-class operator
    rather than only a pytest: (id, w, h, n_px, sq_err_sum, psnr_db)
    where ``sq_err_sum`` is the EXACT integer sum of squared channel
    errors (so closed-form codec fixtures put the comparison under the
    hash oracle) and ``psnr_db = 10*log10(255^2 * n_px / sq_err_sum)``
    is the derived float for consumers (NULL when the payloads decode
    identically — infinite PSNR).

    Map-only: both blobs sit in the same row, so nothing shuffles —
    the shape a lossy-reencode QA pass has at 10^12 images (pair the
    columns at write time; pairing two separate blob TABLES would
    shuffle payloads and belongs in a bucketed store). Rows where
    either payload fails to decode or dims mismatch are dropped
    (count deltas surface them, the decode_metadata convention)."""
    ba, fa = a_cols
    bb, fb = b_cols

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, ns, sqs, psnr = [], [], [], [], [], []
            for i in range(len(pdf)):
                try:
                    x = decode_image(pdf[ba].iloc[i], pdf[fa].iloc[i])
                    y = decode_image(pdf[bb].iloc[i], pdf[fb].iloc[i])
                except (NotImplementedError, ValueError):
                    continue
                if x.shape != y.shape:
                    continue
                d = x.astype(np.int64) - y.astype(np.int64)
                sq = int((d * d).sum())
                n = int(x.size)
                ids.append(int(pdf[id_col].iloc[i]))
                hs.append(x.shape[0])
                ws.append(x.shape[1])
                ns.append(n)
                sqs.append(sq)
                psnr.append(10.0 * np.log10(255.0 * 255.0 * n / sq)
                            if sq else None)
            yield pd.DataFrame({
                "image_id": pd.array(ids, dtype="int64"),
                "w": pd.array(ws, dtype="int32"),
                "h": pd.array(hs, dtype="int32"),
                "n_px": pd.array(ns, dtype="int64"),
                "sq_err_sum": pd.array(sqs, dtype="int64"),
                "psnr_db": pd.array(psnr, dtype="float64"),
            })

    return (df.select(id_col, ba, fa, bb, fb)
            .mapInPandas(gen, schema="image_id long, w int, h int, "
                                     "n_px long, sq_err_sum long, "
                                     "psnr_db double"))


def verify_payload_invariants(df: DataFrame) -> DataFrame:
    """Per-row payload invariants from BASELINE.json input_hint:
    lossless rows decode to pixels whose rehash matches phash exactly;
    lossy rows must round-trip with PSNR >= 40 dB. Returns
    (image_id, fmt, invariant_ok, psnr_db)."""

    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("invariant_ok", T.BooleanType()),
        T.StructField("psnr_db", T.DoubleType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..codecs.image import encode_image
        for pdf in batches:
            ids, fmts, oks, psnrs = [], [], [], []
            for i in range(len(pdf)):
                fmt = pdf["fmt"].iloc[i]
                ids.append(pdf["image_id"].iloc[i])
                fmts.append(fmt)
                try:
                    img = decode_image(pdf["bytes"].iloc[i], fmt)
                    if fmt == "png":
                        # lossless: re-encode must be byte-identical
                        ok = encode_image(img, "png") == bytes(pdf["bytes"].iloc[i])
                        p = float("inf")
                    else:
                        # lossy: decode(encode(decode(x))) stays >= 40 dB
                        rt = decode_image(encode_image(img, fmt), fmt)
                        p = psnr(img, rt)
                        ok = p >= 40.0
                    oks.append(bool(ok))
                    psnrs.append(p)
                except (NotImplementedError, ValueError):
                    oks.append(False)
                    psnrs.append(float("nan"))
            yield pd.DataFrame({"image_id": ids, "fmt": fmts,
                                "invariant_ok": oks, "psnr_db": psnrs})

    return df.select("image_id", "bytes", "fmt").mapInPandas(gen, schema=schema)


VIDEO_FRAMES_SCHEMA = T.StructType([
    T.StructField("video_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("frame_w", T.LongType()),
    T.StructField("frame_h", T.LongType()),
    T.StructField("frame_sum", T.LongType()),
    T.StructField("frame_bytes", T.BinaryType()),
])


def sample_video_frames(df: DataFrame, every_n: int = 10,
                        id_col: str = "video_id",
                        bytes_col: str = "bytes") -> DataFrame:
    """Every ``every_n``-th frame of each video, exploded to one row per
    sampled frame (idx, dims, integer pixel sum, raw RGB bytes).

    REAL for the 'vraw' container (codecs/video.py — uncompressed frame
    stack, pure numpy); compressed formats (h264/mp4) raise ValueError
    at parse — production plugs a decoder into the same hook. Map-only
    (mapInPandas); video bytes never shuffle."""
    from ..codecs.video import parse_vraw

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ws, hs, sums, blobs = [], [], [], [], [], []
            for vid, blob in zip(pdf[id_col], pdf[bytes_col]):
                frames = parse_vraw(blob)
                for fi in range(0, frames.shape[0], every_n):
                    fr = frames[fi]
                    ids.append(vid)
                    idxs.append(fi)
                    hs.append(fr.shape[0])
                    ws.append(fr.shape[1])
                    sums.append(int(fr.astype(np.int64).sum()))
                    blobs.append(fr.tobytes())
            yield pd.DataFrame({"video_id": pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(idxs, dtype="int64"),
                                "frame_w": pd.Series(ws, dtype="int64"),
                                "frame_h": pd.Series(hs, dtype="int64"),
                                "frame_sum": pd.Series(sums, dtype="int64"),
                                "frame_bytes": blobs})

    return (df.select(id_col, bytes_col)
            .mapInPandas(gen, schema=VIDEO_FRAMES_SCHEMA))


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("audio_id", T.LongType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("sample_rate", T.LongType()),
    T.StructField("peak", T.LongType()),
    T.StructField("rms", T.LongType()),
    T.StructField("zero_crossings", T.LongType()),
])


def extract_audio_features(df: DataFrame, id_col: str = "audio_id",
                           bytes_col: str = "bytes") -> DataFrame:
    """Per-clip audio features over PCM16 WAV blobs — REAL (WAV is a
    public uncompressed container; codecs/audio.py parses it with numpy
    alone): sample count, rate, peak |amplitude|, integer-floor RMS
    (isqrt of the exact int64 energy mean), and sign-change count.
    Integer outputs by design so planted waveforms have closed-form
    oracles. Compressed audio raises ValueError at parse."""
    import math

    from ..codecs.audio import parse_wav

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("audio_id", "n_samples", "sample_rate",
                                   "peak", "rms", "zero_crossings")}
            for aid, blob in zip(pdf[id_col], pdf[bytes_col]):
                s, rate = parse_wav(blob)
                s64 = s.astype(np.int64)
                n = s64.size
                out["audio_id"].append(aid)
                out["n_samples"].append(n)
                out["sample_rate"].append(rate)
                out["peak"].append(int(np.abs(s64).max()) if n else 0)
                out["rms"].append(
                    math.isqrt(int((s64 * s64).sum()) // n) if n else 0)
                sign = np.sign(s64)
                out["zero_crossings"].append(
                    int((sign[1:] != sign[:-1]).sum()) if n > 1 else 0)
            yield pd.DataFrame({k: pd.Series(v, dtype="int64")
                                for k, v in out.items()})

    return (df.select(id_col, bytes_col)
            .mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA))
