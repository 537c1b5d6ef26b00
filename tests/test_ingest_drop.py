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
