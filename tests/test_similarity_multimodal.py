import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tdei_backend_service_spark.datagen import synth_images_df
from tdei_backend_service_spark.pipeline import multimodal as MM
from tdei_backend_service_spark.pipeline import similarity as S


@pytest.fixture(scope="module")
def vectors(spark):
    """Clustered vectors: 8 clusters x 40 points in 16-d."""
    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 16)).astype("float32") * 3
    rows = []
    vid = 0
    for c in range(8):
        for _ in range(40):
            v = centers[c] + rng.standard_normal(16).astype("float32") * 0.3
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    return spark.createDataFrame(pdf).cache(), pdf


def test_brute_force_topk_matches_numpy(spark, vectors):
    df, pdf = vectors
    queries = df.limit(5).select(F.col("vec_id").alias("q_id"), "embedding")
    out = S.brute_force_topk(df, queries, k=5)
    got = {(r.q_id, r.rank): r.vec_id for r in out.collect()}

    M = np.stack(pdf.embedding.to_numpy())
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    for q in range(5):
        sims = Mn @ Mn[q]
        order = np.lexsort((np.arange(len(sims)), -sims))[:5]
        for rank, vid in enumerate(order, start=1):
            assert got[(q, rank)] == vid
    # self always ranks first with cos ~ 1
    assert got[(0, 1)] == 0


def test_ivf_recall(spark, vectors):
    df, pdf = vectors
    queries = df.sample(0.1, seed=4).limit(8).select(
        F.col("vec_id").alias("q_id"), "embedding")
    exact = S.brute_force_topk(df, queries, k=10)
    approx = S.ivf_topk(df, queries, k=10, n_centroids=8, nprobe=3)
    e = {(r.q_id, r.vec_id) for r in exact.collect()}
    a = {(r.q_id, r.vec_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.9  # clustered data, 3 of 8 probes


def test_ivf_quantized_exact_at_full_probe(spark, vectors):
    """With every bucket probed and the exact float re-rank, the
    int8-scan path returns the exact brute-force top-k (the contract-
    row configuration)."""
    df, _ = vectors
    queries = df.limit(5).select(F.col("vec_id").alias("q_id"), "embedding")
    exact = S.brute_force_topk(df, queries, k=5)
    quant = S.ivf_topk_quantized(df, queries, k=5, n_centroids=8, nprobe=8,
                                 rerank=32)
    e = sorted((r.q_id, r.rank, r.vec_id) for r in exact.collect())
    q = sorted((r.q_id, r.rank, r.vec_id) for r in quant.collect())
    assert e == q


def test_ivf_quantized_recall_not_below_ivf_minus_eps(spark, vectors):
    """At nprobe < n_centroids the quantized scan+rerank recalls at
    least (within one hit) what the float IVF path recalls — the int8
    approximation must not cost recall beyond the epsilon the re-rank
    absorbs."""
    df, _ = vectors
    queries = df.sample(0.1, seed=4).limit(8).select(
        F.col("vec_id").alias("q_id"), "embedding")
    exact = {(r.q_id, r.vec_id)
             for r in S.brute_force_topk(df, queries, k=10).collect()}
    ivf = {(r.q_id, r.vec_id)
           for r in S.ivf_topk(df, queries, k=10, n_centroids=8,
                               nprobe=3).collect()}
    quant = {(r.q_id, r.vec_id)
             for r in S.ivf_topk_quantized(df, queries, k=10, n_centroids=8,
                                           nprobe=3, rerank=40).collect()}
    r_ivf = len(exact & ivf) / len(exact)
    r_quant = len(exact & quant) / len(exact)
    assert r_quant >= r_ivf - 1 / len(exact)


def test_ivf_scans_fraction_of_corpus(spark, vectors):
    df, _ = vectors
    C = S.train_centroids(df, 8)
    assert C.shape[1] == 16
    # buckets are balanced enough that nprobe/ncentroids bounds the scan
    assign = S._assign_udf(C, 1)
    sizes = (df.withColumn("b", assign(F.col("embedding"))[0])
             .groupBy("b").count().collect())
    assert len(sizes) >= 6  # clusters actually spread over centroids


def test_train_centroids_unbiased_on_sorted_corpus(spark):
    """Regression (VERDICT r2 wrong #3): sample(fraction=1.0).limit(n)
    was a partition prefix, so a clustered+sorted corpus trained all
    centroids on the first region. The seeded-hash TakeOrdered sample
    must see every region: with 4 orthogonal direction clusters laid out
    cluster-by-cluster across partitions, the 4 trained centroids must
    align (cos > 0.9) with >= 3 distinct cluster directions."""
    dims = 16
    dirs = np.eye(4, dims, dtype="float32")  # orthogonal cluster axes
    rng = np.random.default_rng(2)
    rows = []
    vid = 0
    for c in range(4):  # sorted: all of cluster c before cluster c+1
        for _ in range(3000):
            v = dirs[c] * 5 + rng.standard_normal(dims).astype("float32") * 0.1
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    # 8 partitions, no shuffle: partition prefix == cluster 0 only
    df = spark.createDataFrame(pdf).repartitionByRange(8, "vec_id")
    C = S.train_centroids(df, 4, seed=17)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-9)
    hit = {int(np.argmax(Cn[j] @ dirs.T)) for j in range(4)
           if float(np.max(Cn[j] @ dirs.T)) > 0.9}
    assert len(hit) >= 3, f"centroids collapsed onto clusters {hit}"


def test_image_features_phash_and_means(spark):
    df = synth_images_df(spark, 60, with_bytes=True, img_px=8)
    feats = MM.image_features(df)
    rows = feats.collect()
    assert len(rows) == 60
    assert all(r.ok for r in rows)
    # recomputed perceptual hash matches the stored one for every row
    assert all(r.phash_match for r in rows)
    assert all(0 <= r.mean_r <= 255 for r in rows)


def test_resize_images(spark):
    df = synth_images_df(spark, 10, with_bytes=True, img_px=8)
    out = MM.resize_images(df, out_px=4).collect()
    assert len(out) == 10
    for r in out:
        assert (r.w, r.h) == (4, 4)
        assert len(r.pixels) == 4 * 4 * 3


def test_payload_invariants(spark):
    df = synth_images_df(spark, 40, with_bytes=True, img_px=8)
    out = MM.verify_payload_invariants(df).collect()
    assert len(out) == 40
    assert all(r.invariant_ok for r in out)
    lossy = [r for r in out if r.fmt == "qimg"]
    assert lossy and all(r.psnr_db >= 40.0 for r in lossy)
    lossless = [r for r in out if r.fmt == "png"]
    assert lossless and all(np.isinf(r.psnr_db) for r in lossless)


def test_multimodal_compressed_formats_rejected(spark):
    """Audio/video are REAL for the uncompressed containers (WAV, vraw);
    compressed payloads (mp3/mp4-shaped bytes) raise ValueError at parse
    inside the same mapInPandas hook a production decoder drops into."""
    from pyspark.errors import PythonException
    adf = spark.createDataFrame(
        pd.DataFrame([(1, b"ID3\x03fake-mp3")], columns=["audio_id", "bytes"]))
    with pytest.raises(PythonException, match="RIFF"):
        MM.extract_audio_features(adf).collect()
    vdf = spark.createDataFrame(
        pd.DataFrame([(1, b"\x00\x00\x00 ftypisom")], columns=["video_id", "bytes"]))
    with pytest.raises(PythonException, match="vraw"):
        MM.sample_video_frames(vdf).collect()


def test_audio_features_known_waveform(spark):
    """Square wave with closed-form features through the full WAV
    encode -> Spark mapInPandas -> parse -> DSP path."""
    from tdei_backend_service_spark.codecs.audio import wav_bytes
    rows = []
    for k, (p, L, a) in enumerate([(2, 100, 500), (5, 999, 32000),
                                   (7, 1000, 1)]):
        i = np.arange(L)
        s = np.where((i // p) % 2 == 0, a, -a).astype(np.int16)
        rows.append((k, wav_bytes(s)))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["audio_id", "bytes"]))
    got = {r.audio_id: r for r in MM.extract_audio_features(df).collect()}
    for k, (p, L, a) in enumerate([(2, 100, 500), (5, 999, 32000),
                                   (7, 1000, 1)]):
        r = got[k]
        assert (r.n_samples, r.peak, r.rms) == (L, a, a)
        assert r.zero_crossings == (L - 1) // p
        assert r.sample_rate == 16000


def test_video_frame_sampling(spark):
    """vraw container end-to-end: every 3rd frame sampled, dims, sums,
    and raw bytes round-trip."""
    from tdei_backend_service_spark.codecs.video import vraw_bytes
    frames = np.stack([np.full((2, 3, 3), f * 10, dtype=np.uint8)
                       for f in range(7)])
    df = spark.createDataFrame(
        pd.DataFrame([(9, vraw_bytes(frames))], columns=["video_id", "bytes"]))
    out = MM.sample_video_frames(df, every_n=3).collect()
    assert sorted(r.frame_idx for r in out) == [0, 3, 6]
    for r in out:
        assert (r.frame_w, r.frame_h) == (3, 2)
        assert r.frame_sum == 2 * 3 * 3 * r.frame_idx * 10 // 1
        assert bytes(r.frame_bytes) == frames[r.frame_idx].tobytes()


def test_decode_metadata_matches_closed_form(spark):
    """decode_metadata's output is decode-DERIVED (dims from the decoded
    array, ahash recomputed) and matches the part_images closed form:
    dims 8s, phash = phash_class_value(k % 127)."""
    from tdei_backend_service_spark import fixtures_tpch as FX
    imgs = FX.part_images(spark, "/root/testdata/sf0.001")
    out = {r.image_id: r for r in MM.decode_metadata(imgs).collect()}
    assert len(out) == 200  # every part decodes (zero false negatives)
    for k, r in out.items():
        s = 1 + k % 3
        assert (r.w, r.h) == (8 * s, 8 * s)
        assert r.fmt == ("png" if k % 2 == 0 else "qimg")
        assert r.phash == FX.phash_class_value(k % 127)


def test_decode_metadata_drops_undecodable(spark):
    import pandas as pd
    rows = [(1, b"garbage", "png"), (2, b"\x00\x01", "qimg"),
            (3, None, "jpeg")]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "fmt"]))
    assert MM.decode_metadata(df).count() == 0


def test_quantize_embeddings_reconstruction_and_edges(spark):
    import pandas as pd
    from tdei_backend_service_spark.pipeline.similarity import \
        quantize_embeddings
    rows = [
        (0, [0.5, -1.0, 0.25, 0.0]),
        (1, [0.0, 0.0, 0.0, 0.0]),          # zero vector edge
        (2, [3.0]),                          # single max element
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    out = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    # codes in [-127, 127]; max-|x| element quantizes to +/-127 exactly
    assert out[0].q_embedding == [64, -127, 32, 0]
    assert out[0].q_scale == 1.0
    assert out[1].q_embedding == [0, 0, 0, 0] and out[1].q_scale == 0.0
    assert out[2].q_embedding == [127]
    # reconstruction error bound: |q*s/127 - x| <= s/254 per element
    for r in (out[0], out[2]):
        s = r.q_scale
        for q, x in zip(r.q_embedding, dict(rows)[r.vec_id]):
            assert abs(q * s / 127.0 - x) <= s / 254.0 + 1e-12


def test_ivf_indexed_matches_in_memory_and_prunes_partitions(spark, vectors,
                                                             tmp_path):
    """The persistent index returns IDENTICAL results to the in-memory
    ivf_topk at every nprobe (same seeded centroids), and a partial
    probe's parquet scan carries the bucket predicate as a
    PartitionFilter — unprobed buckets' files are never opened."""
    df, _ = vectors
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(df, idx, n_centroids=8)
    queries = df.sample(0.1, seed=4).limit(8).select(
        F.col("vec_id").alias("q_id"), "embedding")

    for nprobe in (3, 8):
        mem = S.ivf_topk(df, queries, k=10, n_centroids=8, nprobe=nprobe)
        ind = S.ivf_topk_indexed(spark, idx, queries, k=10, nprobe=nprobe)
        assert (sorted((r.q_id, r.rank, r.vec_id) for r in mem.collect())
                == sorted((r.q_id, r.rank, r.vec_id) for r in ind.collect()))

    out = S.ivf_topk_indexed(spark, idx, queries, k=10, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    m = re.search(r"PartitionFilters: \[([^\]]*bucket[^\]]*)\]", plan)
    assert m, plan[:2000]


def test_ivf_indexed_exact_at_full_probe(spark, vectors, tmp_path):
    df, _ = vectors
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(df, idx, n_centroids=8)
    queries = df.limit(4).select(F.col("vec_id").alias("q_id"), "embedding")
    exact = S.brute_force_topk(df, queries, k=5)
    ind = S.ivf_topk_indexed(spark, idx, queries, k=5, nprobe=8)
    assert (sorted((r.q_id, r.rank, r.vec_id) for r in exact.collect())
            == sorted((r.q_id, r.rank, r.vec_id) for r in ind.collect()))


# -- deterministic augmentation (flip / rot90 / crop) ----------------------

def test_augment_images_pixel_exact(spark):
    """Every op's decoded pixels == the numpy transform of the decoded
    source, through the real codecs (png lossless; qimg source decodes
    to its reconstruction levels first), incl. a NON-square image so
    rot90's dimension swap is visible."""
    import numpy as np
    import pandas as pd
    from tdei_backend_service_spark.codecs.image import (
        decode_image, encode_image)
    from tdei_backend_service_spark.pipeline.multimodal import (
        AUGMENT_OPS, augment_images, _apply_aug)

    rng = np.random.default_rng(31)
    rows = []
    for i, (h, w, fmt) in enumerate([(6, 10, "png"), (8, 8, "qimg"),
                                     (12, 4, "png")]):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        rows.append({"image_id": i, "bytes": encode_image(img, fmt),
                     "fmt": fmt})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = {(r["image_id"], r["op"]): r
           for r in augment_images(df).collect()}
    assert len(out) == 3 * len(AUGMENT_OPS)
    for row in rows:
        src = decode_image(row["bytes"], row["fmt"])  # post-codec truth
        for op in AUGMENT_OPS:
            got_row = out[(row["image_id"], op)]
            got = decode_image(bytes(got_row["bytes"]), "png")
            want = _apply_aug(src, op)
            np.testing.assert_array_equal(got, want)
            assert (got_row["w"], got_row["h"]) == (want.shape[1],
                                                    want.shape[0])


def test_augment_images_rejects_unknown_op(spark):
    import pandas as pd
    import pytest as _pt
    from tdei_backend_service_spark.pipeline.multimodal import augment_images
    df = spark.createDataFrame(pd.DataFrame(
        [{"image_id": 0, "bytes": b"", "fmt": "png"}]))
    with _pt.raises(ValueError):
        augment_images(df, ops=("flip_h", "sharpen"))


def test_augment_images_drops_undecodable(spark):
    import numpy as np
    import pandas as pd
    from tdei_backend_service_spark.codecs.image import encode_image
    from tdei_backend_service_spark.pipeline.multimodal import augment_images
    ok = encode_image(np.zeros((4, 4, 3), dtype=np.uint8), "png")
    df = spark.createDataFrame(pd.DataFrame([
        {"image_id": 0, "bytes": ok, "fmt": "png"},
        {"image_id": 1, "bytes": b"garbage", "fmt": "png"},
    ]))
    got = augment_images(df, ops=("flip_h",)).collect()
    assert [r["image_id"] for r in got] == [0]


def test_decode_mse_cols_psnr_and_drops(spark):
    from tdei_backend_service_spark.codecs.image import encode_image
    base = np.full((8, 8, 3), 200, dtype=np.uint8)
    off2 = np.full((8, 8, 3), 202, dtype=np.uint8)   # every sample +2
    rows = [
        # 0: constant +2 error -> sq = 4 * 192, psnr = 42.11 dB
        {"image_id": 0, "bytes": encode_image(base, "png"), "fmt": "png",
         "bytes_b": encode_image(off2, "png"), "fmt_b": "png"},
        # 1: identical payloads -> sq 0, psnr NULL (infinite)
        {"image_id": 1, "bytes": encode_image(base, "png"), "fmt": "png",
         "bytes_b": encode_image(base, "png"), "fmt_b": "png"},
        # 2: dims mismatch -> dropped
        {"image_id": 2, "bytes": encode_image(base, "png"), "fmt": "png",
         "bytes_b": encode_image(np.zeros((4, 4, 3), dtype=np.uint8),
                                 "png"), "fmt_b": "png"},
        # 3: undecodable second payload -> dropped
        {"image_id": 3, "bytes": encode_image(base, "png"), "fmt": "png",
         "bytes_b": b"junk", "fmt_b": "png"},
    ]
    out = {r["image_id"]: r for r in
           MM.decode_mse_cols(spark.createDataFrame(
               pd.DataFrame(rows))).collect()}
    assert set(out) == {0, 1}
    r0 = out[0]
    assert (r0["n_px"], r0["sq_err_sum"]) == (192, 768)
    assert abs(r0["psnr_db"] - 10 * np.log10(255**2 / 4)) < 1e-9
    assert r0["psnr_db"] >= 40.0  # the north-rule lossy gate
    assert out[1]["sq_err_sum"] == 0 and out[1]["psnr_db"] is None
