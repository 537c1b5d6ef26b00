import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tdei_backend_service_spark.core import geom
from tdei_backend_service_spark.core.manifest import Manifest
from tdei_backend_service_spark.operators.union_dataset import \
    incremental_union_dataset
from tdei_backend_service_spark.pipeline.ingest_drop import (admit_drop,
                                                             read_admitted)

M = 1.0 / geom.M_PER_DEG_LAT


@pytest.fixture()
def corpus(spark):
    rows = [(i * 5.0 * M, 0.0, i, "c") for i in range(40)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["lat", "lon", "phash", "caption"]))


def _drop(spark, ids, corpus_dup_frac=0.5):
    """ids: batch pks. Even-index rows duplicate corpus record (pk % 40)
    at +0.2 m (lose); odd-index rows are fresh phash (survive)."""
    rows = []
    for k, pk in enumerate(ids):
        base = pk % 40
        if k % 2 == 0:
            rows.append((pk, (base * 5.0 + 0.2) * M, 0.0, base, "c"))
        else:
            rows.append((pk, (base * 5.0 + 0.2) * M, 0.0,
                         1_000_000 + pk, "c"))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "lat", "lon",
                                    "phash", "caption"]))


def test_admit_drop_writes_lineage_and_matches_operator(spark, tmp_path,
                                                        corpus):
    run = str(tmp_path / "run")
    batch = _drop(spark, list(range(100, 140)))
    rec = admit_drop(batch, corpus, run, "d1")
    direct = incremental_union_dataset(batch, corpus)
    want = sorted(r.image_id for r in direct.collect())
    got = sorted(r.image_id for r in read_admitted(spark, run, "d1").collect())
    assert got == want and len(want) == 20  # odd-index fresh rows
    # per-shard lineage: rows + bytes recorded, totals match
    st = json.load(open(os.path.join(run, "manifest.json")))["stages"]["admit_d1"]
    assert st["status"] == "complete"
    assert sum(p["rows"] for p in st["partitions"].values()) == 20
    assert all(p["bytes"] > 0 for p in st["partitions"].values())
    assert rec["rows"] == 20


def test_admit_drop_resumes_only_failed_shards(spark, tmp_path, corpus):
    run = str(tmp_path / "run")
    batch = _drop(spark, list(range(200, 280)))
    admit_drop(batch, corpus, run, "d1")
    m = Manifest(run)
    st = m.stage("admit_d1")
    # simulate a mid-run crash: one shard's write never committed
    victim = json.loads(next(iter(st["partitions"])))
    m.fail_partition("admit_d1", victim)
    before = dict(m.stage("admit_d1")["partitions"])
    rec = admit_drop(batch, corpus, run, "d1")
    assert rec["skipped"] is False
    after = Manifest(run).stage("admit_d1")
    assert after["status"] == "complete"
    # untouched shards keep their original commit records
    for k, v in before.items():
        if v.get("status") == "committed":
            assert after["partitions"][k]["rows"] == v["rows"]
    # and the recovered output is byte-for-byte the full survivor set
    direct = incremental_union_dataset(batch, corpus)
    assert (sorted(r.image_id for r in read_admitted(spark, run, "d1").collect())
            == sorted(r.image_id for r in direct.collect()))


def test_admit_drop_complete_stage_skips(spark, tmp_path, corpus):
    run = str(tmp_path / "run")
    batch = _drop(spark, list(range(300, 320)))
    admit_drop(batch, corpus, run, "d1")
    rec = admit_drop(batch, corpus, run, "d1")
    assert rec["skipped"] is True


def test_sequential_drops_grow_the_corpus(spark, tmp_path, corpus):
    """Drop 2 is admitted against corpus + drop 1's survivors: a record
    duplicating a drop-1 survivor must lose even though the ORIGINAL
    corpus never saw it."""
    run = str(tmp_path / "run")
    d1 = _drop(spark, list(range(400, 420)))
    admit_drop(d1, corpus, run, "d1")
    s1 = read_admitted(spark, run, "d1")
    assert s1.count() == 10
    grown = corpus.unionByName(s1.select(*corpus.columns))

    # one survivor of d1 to duplicate (odd-index -> fresh phash)
    surv = s1.collect()[0]
    rows = [
        (500, surv.lat + 0.2 * M, surv.lon, surv.phash, "c"),  # dup of d1 survivor -> loses
        (501, 39 * 5.0 * M, 0.0, 2_000_000, "c"),              # fresh -> survives
    ]
    d2 = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "lat", "lon",
                                    "phash", "caption"]))
    admit_drop(d2, grown, run, "d2")
    assert [r.image_id for r in read_admitted(spark, run, "d2").collect()] \
        == [501]


def test_signature_store_parity_and_zero_corpus_exchange(spark, tmp_path):
    """SignatureStore.dedup_batch returns the same survivor set as
    incremental_hash_neardup, and its candidate join reads the corpus
    bucketed: distinct + join satisfied in place, the ONLY exchange on
    the (band, bucket) keys is the small batch side."""
    from pyspark.sql import functions as F

    from tdei_backend_service_spark.pipeline.dedup import (
        _banded16, incremental_hash_neardup)
    from tdei_backend_service_spark.pipeline.ingest_drop import \
        SignatureStore

    corpus = spark.range(5000).select(
        (F.col("id") * 2654435761).alias("phash"))
    batch = spark.range(4000, 7000).select(
        F.col("id").alias("image_id"),
        (F.col("id") * 2654435761).alias("phash"))
    store = SignatureStore(spark, "sig_store_test", n_buckets=4,
                           path=str(tmp_path / "sigs"))
    store.write(corpus)

    got = sorted(r["image_id"] for r in
                 store.dedup_batch(batch, "phash", "image_id").collect())
    want = sorted(r["image_id"] for r in incremental_hash_neardup(
        batch, corpus, "phash", "image_id").collect())
    assert got == want and len(got) == 2000

    # plan shape, with broadcast forced off so the shuffle-join case
    # (the only case that matters at corpus scale) is what's planned
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        corpus_b = (store.read()
                    .dropDuplicates(["band", "bucket", "_hc"])
                    .select("band", "bucket", F.col("_hc").alias("_ch")))
        batch_b = _banded16(batch.select(
            "image_id", F.col("phash").alias("_hc")), ["image_id"])
        cross = (batch_b.join(corpus_b, ["band", "bucket"])
                 .filter(F.bit_count(F.col("_hc").bitwiseXOR(F.col("_ch")))
                         <= 3).select("image_id"))
        plan = cross._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert "SelectedBucketsCount" in plan
        bb_exchanges = [ln for ln in plan.splitlines()
                        if "Exchange hashpartitioning" in ln
                        and "band" in ln]
        assert len(bb_exchanges) == 1, plan  # batch side only
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_signature_store_append_grows_corpus(spark, tmp_path):
    """After appending the admitted survivors' signatures, re-running
    the SAME drop admits nothing — the store now contains every hash
    the drop carries."""
    from pyspark.sql import functions as F

    from tdei_backend_service_spark.pipeline.ingest_drop import \
        SignatureStore

    corpus = spark.range(1000).select(
        (F.col("id") * 2654435761).alias("phash"))
    batch = spark.range(500, 1500).select(
        F.col("id").alias("image_id"),
        (F.col("id") * 2654435761).alias("phash"))
    store = SignatureStore(spark, "sig_store_grow", n_buckets=4,
                           path=str(tmp_path / "sigs2"))
    store.write(corpus)
    survivors = store.dedup_batch(batch, "phash", "image_id")
    assert survivors.count() == 500
    store.append(survivors, "phash")
    again = store.dedup_batch(batch, "phash", "image_id")
    assert again.count() == 0


def test_vector_store_parity_and_bucketed_plan(spark, tmp_path):
    """VectorStore.dedup_batch == incremental_embedding_dedup on the
    planted copy/negation fixture, and the corpus side of its
    candidate join reads bucketed with zero (_band, _bkt) exchange."""
    from pyspark.sql import functions as F

    import tdei_backend_service_spark.fixtures_tpch as FX
    from tdei_backend_service_spark.pipeline.dedup import \
        incremental_embedding_dedup
    from tdei_backend_service_spark.pipeline.ingest_drop import VectorStore

    corpus, batch = FX.planted_embedding_batch(
        spark, "/root/testdata/sf0.001")
    store = VectorStore(spark, "vec_store_test", n_buckets=4,
                        path=str(tmp_path / "vecs"))
    store.write(corpus)
    got = sorted(r["vec_id"] for r in
                 store.dedup_batch(batch, threshold=0.98).collect())
    want = sorted(r["vec_id"] for r in incremental_embedding_dedup(
        batch, corpus, threshold=0.98).collect())
    assert got == want and len(got) > 0

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        b_keyed = store._keyed(batch.select(
            F.col("embedding").alias("embedding")), "embedding") \
            .withColumnRenamed("_cv", "_bv")
        cross = b_keyed.join(store.read(), ["_band", "_bkt"])
        plan = cross._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        bb = [ln for ln in plan.splitlines()
              if "Exchange hashpartitioning" in ln and "_band" in ln]
        assert len(bb) == 1, plan  # batch side only
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_vector_store_append_grows_corpus(spark, tmp_path):
    from pyspark.sql import functions as F

    import tdei_backend_service_spark.fixtures_tpch as FX
    from tdei_backend_service_spark.pipeline.ingest_drop import VectorStore

    corpus, batch = FX.planted_embedding_batch(
        spark, "/root/testdata/sf0.001")
    store = VectorStore(spark, "vec_store_grow", n_buckets=4,
                        path=str(tmp_path / "vecs2"))
    store.write(corpus)
    survivors = store.dedup_batch(batch, threshold=0.98)
    n = survivors.count()
    assert n > 0
    store.append(survivors)
    assert store.dedup_batch(batch, threshold=0.98).count() == 0
