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


def test_multimodal_stubs_raise(spark):
    df = synth_images_df(spark, 1, with_bytes=False)
    with pytest.raises(NotImplementedError):
        MM.sample_video_frames(df)
    with pytest.raises(NotImplementedError):
        MM.extract_audio_features(df)
