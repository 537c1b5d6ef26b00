import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tdei_backend_service_spark.core import geom
from tdei_backend_service_spark.core.manifest import Manifest, read_stage
from tdei_backend_service_spark.core.schema import EDGES_SCHEMA
from tdei_backend_service_spark.datagen import synth_edges_df, synth_images_df
from tdei_backend_service_spark.io.geojson import export_geojson, extract_dataset
from tdei_backend_service_spark.io.osm_xml import NotFoundException, export_osm_xml
from tdei_backend_service_spark.operators.pagination import dynamic_query


def test_export_geojson_points(spark, tmp_path):
    df = synth_images_df(spark, 50, with_bytes=False)
    path = export_geojson(df, str(tmp_path), "node", {"name": "testset"})
    assert path and path.endswith("osw.nodes.geojson")
    doc = json.load(open(path))
    assert doc["type"] == "FeatureCollection"
    assert doc["name"] == "testset"
    assert "$schema" in doc
    assert len(doc["features"]) == 50
    f = doc["features"][0]
    assert f["geometry"]["type"] == "Point"
    assert len(f["geometry"]["coordinates"]) == 2
    assert "image_id" in f["properties"]
    assert "highway" in f["properties"]
    assert "bytes" not in f["properties"]


def test_export_geojson_lines_roundtrip(spark, tmp_path):
    df = synth_edges_df(spark, 10)
    path = export_geojson(df, str(tmp_path), "edge")
    doc = json.load(open(path))
    f = doc["features"][0]
    assert f["geometry"]["type"] == "LineString"
    assert len(f["geometry"]["coordinates"]) >= 2
    assert f["properties"]["highway"] in ("footway", "residential")


def test_export_geojson_empty_returns_none(spark, tmp_path):
    df = synth_images_df(spark, 10, with_bytes=False).filter(F.lit(False))
    assert export_geojson(df, str(tmp_path), "node") is None


def test_export_geojson_sharded(spark, tmp_path):
    import glob
    import json as J
    from tdei_backend_service_spark.io.geojson import export_geojson_sharded
    df = synth_images_df(spark, 200, with_bytes=False)
    d = export_geojson_sharded(df, str(tmp_path), "node", shards=4)
    parts = glob.glob(os.path.join(d, "part-*"))
    assert len(parts) == 4
    feats = [J.loads(l) for p in parts for l in open(p) if l.strip()]
    assert len(feats) == 200
    assert all(f["type"] == "Feature" for f in feats)


def test_extract_dataset_layers(spark, tmp_path):
    layers = {"node": synth_images_df(spark, 20, with_bytes=False),
              "edge": synth_edges_df(spark, 6)}
    out = extract_dataset(layers, "ds-a", str(tmp_path / "x"))
    assert set(out) == {"node", "edge"}
    for p in out.values():
        assert os.path.exists(p)


def test_osm_xml_export(spark, tmp_path):
    layers = {"images": synth_images_df(spark, 15, with_bytes=False),
              "edges": synth_edges_df(spark, 5)}
    path = export_osm_xml(layers, "ds-a", str(tmp_path))
    text = open(path).read()
    assert text.startswith('<?xml version="1.0"')
    assert text.count("<node id=") == 15
    assert text.count("<way id=") == 5
    assert text.count("<nd ref=") == 10
    assert text.rstrip().endswith("</osm>")
    with pytest.raises(NotFoundException):
        export_osm_xml(layers, "missing-ds", str(tmp_path))


def test_manifest_resume_and_metrics(spark, tmp_path):
    run = str(tmp_path / "run1")
    df = synth_images_df(spark, 300, with_bytes=False)
    m = Manifest(run)
    r1 = m.run_stage("ingest", df, keys=["dataset_id"])
    assert not r1["skipped"]
    assert r1["rows"] == 300
    # manifest file exists with per-partition rows+bytes
    st = json.load(open(os.path.join(run, "manifest.json")))["stages"]["ingest"]
    assert st["status"] == "complete"
    part = st["partitions"]['["ds-a"]']
    assert part["rows"] == 300 and part["bytes"] > 0

    # complete stage: skipped without recompute
    m2 = Manifest(run)
    r2 = m2.run_stage("ingest", df, keys=["dataset_id"])
    assert r2["skipped"]

    back = read_stage(spark, run, "ingest")
    assert back.count() == 300


def test_manifest_partial_resume(spark, tmp_path):
    run = str(tmp_path / "run2")
    a = synth_images_df(spark, 100, with_bytes=False, dataset_id="ds-a")
    b = synth_images_df(spark, 80, with_bytes=False, dataset_id="ds-b")
    both = a.unionByName(b)
    m = Manifest(run)
    m.run_stage("ingest", both, keys=["dataset_id"])
    # simulate a failed partition: mark ds-b failed -> next run recomputes
    # ONLY ds-b (ds-a stays committed and is anti-joined away)
    m.fail_partition("ingest", ["ds-b"])
    assert not m.is_complete("ingest")
    r = m.run_stage("ingest", both, keys=["dataset_id"])
    assert not r["skipped"]
    back = read_stage(spark, run, "ingest")
    assert back.groupBy("dataset_id").count().count() == 2
    assert back.count() == 180  # no duplication after the partial rerun


def test_dynamic_query_pagination(spark):
    df = spark.range(200).withColumn("k", F.col("id") % 3)
    page1 = dynamic_query(df, order_by=("id", "ASC"), page_no=1, page_size=10).collect()
    page2 = dynamic_query(df, order_by=("id", "ASC"), page_no=2, page_size=10).collect()
    assert [r.id for r in page1] == list(range(10))
    assert [r.id for r in page2] == list(range(10, 20))
    # cap at 50 (dynamic-query-object.ts:52)
    big = dynamic_query(df, order_by=("id", "ASC"), page_size=500).collect()
    assert len(big) == 50
    filtered = dynamic_query(df, where=[("k", 1)], order_by=("id", "DESC"),
                             page_size=5).collect()
    assert [r.id for r in filtered] == [199, 196, 193, 190, 187]


def test_dynamic_query_join_and_select(spark):
    left = spark.range(10).withColumn("name", F.concat(F.lit("n"), F.col("id")))
    right = spark.range(5).withColumn("extra", F.col("id") * 2)
    out = dynamic_query(left, select=["id", "name", "extra"],
                        join=(right, "id"), order_by=("id", "ASC"))
    rows = out.collect()
    assert len(rows) == 5
    assert rows[3].extra == 6


def test_read_stage_resolves_out_subdir_keys(spark, tmp_path):
    """A stage written with out_subdir != name must still resolve its
    partition keys when read back by DIRECTORY name — numeric-looking
    key values stay strings (ADVICE r3 low #1)."""
    run = str(tmp_path / "run3")
    df = synth_images_df(spark, 60, with_bytes=False, dataset_id="20240101")
    Manifest(run).run_stage("ingest-v2", df, keys=["dataset_id"],
                            out_subdir="ingest")
    back = read_stage(spark, run, "ingest")
    assert dict(back.dtypes)["dataset_id"] == "string"
    assert back.select("dataset_id").distinct().collect()[0][0] == "20240101"
    assert back.count() == 60


def test_read_stage_layout_fallback_keeps_strings(spark, tmp_path):
    """No manifest key record at all (pre-r3 layout): key names derive
    from the key=value directory chain and still read as strings."""
    out = str(tmp_path / "bare" / "ingest")
    df = synth_images_df(spark, 40, with_bytes=False, dataset_id="777")
    df.write.partitionBy("dataset_id").parquet(out)
    back = read_stage(spark, str(tmp_path / "bare"), "ingest")
    assert dict(back.dtypes)["dataset_id"] == "string"
    assert back.select("dataset_id").distinct().collect()[0][0] == "777"
    assert back.count() == 40
