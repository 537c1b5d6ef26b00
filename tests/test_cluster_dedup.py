"""Semantic-cluster dedup: connected components over the verified
near-dup pair graph (hash_cluster_dedup / embedding_cluster_dedup) vs
the pairwise larger-id-loses rule. Reference semantics: SemDeDup-style
one-representative-per-cluster collapse; the reference repo's union
path keeps min-rank per proximity cluster (src/services/union.service.ts
dedup step) — these operators lift that collapse to the hamming and
cosine tiers."""

import numpy as np
from pyspark.sql import functions as F

from tdei_backend_service_spark.pipeline.dedup import (
    embedding_cluster_dedup, embedding_dedup, hash_cluster_dedup,
    hash_neardup)


def _hash_frame(spark, rows):
    return spark.createDataFrame(rows, "image_id long, phash long")


def test_hash_cluster_collapses_chain_pairwise_does_not(spark):
    """Path a~b~c (hamming 3 per link, 6 end-to-end) with ids (1,9,2):
    pairwise keeps both endpoints, cc keeps only the min."""
    base = 0x0123_4567_89AB_0000
    rows = [(1, base), (9, base ^ 0b111), (2, base ^ 0b111111)]
    df = _hash_frame(spark, rows)
    cc = sorted(r["image_id"]
                for r in hash_cluster_dedup(df, "phash", "image_id").collect())
    pw = sorted(r["image_id"]
                for r in hash_neardup(df, "phash", "image_id").collect())
    assert cc == [1]
    assert pw == [1, 2]


def test_hash_cluster_singletons_and_far_classes_survive(spark):
    rows = [(1, 0), (2, -1), (3, 0x00FF_00FF_00FF_00FF)]
    df = _hash_frame(spark, rows)
    out = sorted(r["image_id"]
                 for r in hash_cluster_dedup(df, "phash", "image_id").collect())
    assert out == [1, 2, 3]


def test_hash_cluster_exact_copy_hot_bucket_star_cap(spark):
    """A hot bucket above bucket_cap of exact copies still collapses to
    one survivor: star edges route connectivity through the anchor."""
    rows = [(i, 42) for i in range(40)]
    df = _hash_frame(spark, rows)
    out = hash_cluster_dedup(df, "phash", "image_id", bucket_cap=8).collect()
    assert [r["image_id"] for r in out] == [0]


def test_hash_cluster_long_chain_one_survivor(spark):
    """A 21-member drift chain (3 fresh bits per hop, 20 hops x 3 bits
    staying inside 64 bits, shuffled ids) collapses to the min id even
    though no pairwise rule ordering would find it."""
    h = 0
    rows, rng = [], np.random.default_rng(3)
    ids = rng.permutation(21) + 100
    for j in range(21):
        rows.append((int(ids[j]), h))
        h ^= 0b111 << (3 * j)
    df = _hash_frame(spark, rows)
    out = hash_cluster_dedup(df, "phash", "image_id").collect()
    assert [r["image_id"] for r in out] == [int(ids.min())]


def test_embedding_cluster_chain_vs_pairwise(spark):
    """Transitive cosine chain a~b~c with cos(a,c) below threshold and
    ids (1,9,2): cc keeps {1}, pairwise keeps {1,2}. planes=2/bands=4
    with multiprobe make candidate recall effectively certain at this
    scale; the assertion is on the exact survivor sets."""
    a = np.zeros(16); a[0] = 1.0
    c = np.zeros(16); c[0] = np.cos(np.deg2rad(24)); c[1] = np.sin(np.deg2rad(24))
    b = (a + c) / np.linalg.norm(a + c)  # 12 deg from each endpoint
    thr = float(np.cos(np.deg2rad(15)))  # links ~0.978 >= thr, ends ~0.913 < thr
    rows = [(1, [float(x) for x in a]), (9, [float(x) for x in b]),
            (2, [float(x) for x in c])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kw = dict(threshold=thr, planes=2, bands=4, multiprobe=True)
    cc = sorted(r["vec_id"]
                for r in embedding_cluster_dedup(df, **kw).collect())
    pw = sorted(r["vec_id"] for r in embedding_dedup(df, **kw).collect())
    assert cc == [1]
    assert pw == [1, 2]


def test_embedding_cluster_empty_frame(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert embedding_cluster_dedup(df).count() == 0


def test_hash_neardup_unchanged_by_refactor(spark):
    """The pairwise path still removes exactly the larger ids of
    verified pairs (regression guard on the _hash_pairs extraction)."""
    rows = [(5, 100), (6, 100), (7, 100 ^ 0b1), (8, 1 << 40)]
    df = _hash_frame(spark, rows)
    out = sorted(r["image_id"]
                 for r in hash_neardup(df, "phash", "image_id").collect())
    assert out == [5, 8]


def _sig_cache_hit(spark, df) -> bool:
    """True when the cacheManager still holds a plan equivalent to
    _hash_pairs' internal signature projection of ``df``."""
    proj = df.select("image_id", F.col("phash").alias("_hc"))
    cm = spark._jsparkSession.sharedState().cacheManager()
    return not cm.lookupCachedData(proj._jdf).isEmpty()


def test_cluster_release_cache_drops_signature_frame(spark):
    """release_cache=True leaves no cached signature frame behind —
    the cc propagation is eager, so the cache dies inside the call.
    (The RDD-count assertion used elsewhere can't see this: _cc_losers'
    localCheckpoint bookkeeping adds its own narrow blocks.) The
    release_cache=False arm is the positive control proving the
    cacheManager lookup actually finds the projection."""
    df = _hash_frame(spark, [(i, i * 1000) for i in range(50)])
    hash_cluster_dedup(df, "phash", "image_id").count()
    assert not _sig_cache_hit(spark, df)

    out = hash_cluster_dedup(df, "phash", "image_id", release_cache=False)
    out.count()
    assert _sig_cache_hit(spark, df)
    df.select("image_id", F.col("phash").alias("_hc")).unpersist()


def test_hash_cluster_keep_best_picks_max_quality(spark):
    """keep_by: the chain {1, 9, 2} keeps its highest-quality member
    (id 9), not the min id; singletons keep their row regardless of
    quality; ties break to the smaller id."""
    base = 0x0123_4567_89AB_0000
    rows = [(1, base, 10.0), (9, base ^ 0b111, 99.0),
            (2, base ^ 0b111111, 50.0),
            (77, 0x00FF_00FF_00FF_00FF, -1.0)]
    df = spark.createDataFrame(rows, "image_id long, phash long, q double")
    out = sorted(r["image_id"]
                 for r in hash_cluster_dedup(df, "phash", "image_id",
                                             keep_by="q").collect())
    assert out == [9, 77]


def test_hash_cluster_keep_best_tie_breaks_min_id(spark):
    rows = [(5, 42, 1.0), (3, 42, 1.0), (8, 42, 1.0)]
    df = spark.createDataFrame(rows, "image_id long, phash long, q double")
    out = hash_cluster_dedup(df, "phash", "image_id", keep_by="q").collect()
    assert [r["image_id"] for r in out] == [3]


def test_embedding_cluster_keep_best(spark):
    """Two exact-copy cosine cliques: each keeps its max-quality
    member under keep_by, min id without it."""
    a, b = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
    rows = [(1, a, 0.1), (2, a, 0.9), (10, b, 0.5), (11, b, 0.2)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, q double")
    best = sorted(r["vec_id"] for r in embedding_cluster_dedup(
        df, threshold=0.98, keep_by="q").collect())
    minid = sorted(r["vec_id"] for r in embedding_cluster_dedup(
        df, threshold=0.98).collect())
    assert best == [2, 10]
    assert minid == [1, 10]
