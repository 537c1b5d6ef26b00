"""End-to-end job lifecycle — the reference's canonical path (SURVEY.md
§3.1): queue message -> validate/dispatch -> bbox_intersect -> per-layer
GeoJSON files -> zip -> response message. Plus the §3.3 tag_road path:
kNN tag -> new catalog snapshot -> re-extract."""

import json
import os
import zipfile

import pytest
from pyspark.sql import functions as F

from tdei_backend_service_spark.backend_service import Catalog as SvcCatalog
from tdei_backend_service_spark.backend_service import dispatch
from tdei_backend_service_spark.core.ingest import encode_cells, encode_geom_meta
from tdei_backend_service_spark.datagen import synth_edges_df, synth_images_df
from tdei_backend_service_spark.io.catalog import Catalog as TableCatalog
from tdei_backend_service_spark.io.geojson import extract_dataset
from tdei_backend_service_spark.io.package import response_message
from tdei_backend_service_spark.operators.tag_road import dataset_tag_road


@pytest.fixture(scope="module")
def svc(spark):
    return SvcCatalog(
        images=encode_cells(synth_images_df(spark, 800, with_bytes=False)).cache(),
        edges=encode_geom_meta(synth_edges_df(spark, 30)).cache(),
    )


def test_bbox_job_lifecycle(spark, svc, tmp_path):
    """message -> dispatch -> per-layer export -> zip -> success response."""
    msg = {"messageId": "job-1", "messageType": "bbox_intersect",
           "data": {"service": "bbox_intersect",
                    "parameters": {"tdei_dataset_id": "ds-a",
                                   "bbox": "-122.34,47.61,-122.28,47.67"}}}
    layers = dispatch(svc, msg)
    out_dir = str(tmp_path / "job-1")
    files = extract_dataset(
        {"node": layers["images"], "edge": layers["edges"]}, "ds-a", out_dir,
        metadata={"name": "e2e"})
    assert set(files) == {"node", "edge"}
    resp = response_message("job-1", "bbox_intersect", out_dir, success=True)
    assert resp["data"]["success"]
    with zipfile.ZipFile(resp["data"]["file_upload_path"]) as z:
        names = z.namelist()
        assert "osw.nodes.geojson" in names and "osw.edges.geojson" in names
        doc = json.loads(z.read("osw.nodes.geojson"))
        assert doc["name"] == "e2e"
        assert len(doc["features"]) > 0
    assert json.load(open(os.path.join(out_dir, "job_response.json")))["data"]["success"]


def test_bbox_job_no_data_response(spark, svc, tmp_path):
    msg = {"messageId": "job-2", "messageType": "bbox_intersect",
           "data": {"service": "bbox_intersect",
                    "parameters": {"tdei_dataset_id": "ds-a",
                                   "bbox": "10,10,11,11"}}}
    layers = dispatch(svc, msg)
    out_dir = str(tmp_path / "job-2")
    files = extract_dataset({"node": layers["images"]}, "ds-a", out_dir)
    assert files == {}
    resp = response_message("job-2", "bbox_intersect", out_dir, success=True)
    assert not resp["data"]["success"]
    assert "No data found" in resp["data"]["message"]


def test_tag_road_snapshot_lifecycle(spark, svc, tmp_path):
    """§3.3: mutate-as-snapshot then re-extract from the new snapshot."""
    wh = TableCatalog(str(tmp_path / "wh"))
    wh.write_snapshot("images", svc.images)
    v0 = wh.current_snapshot("images")

    tagged = dataset_tag_road(wh.read(spark, "images"), "ds-a",
                              svc.edges, "ds-a", cutoff_m=400.0)
    wh.write_snapshot("images", tagged)
    assert wh.current_snapshot("images") == v0 + 1

    latest = wh.read(spark, "images")
    assert latest.count() == 800
    n_tagged = latest.filter(F.col("nearest_edge_id").isNotNull()).count()
    assert n_tagged > 0
    # the extract of the NEW snapshot carries the grafted tag:highway
    out_dir = str(tmp_path / "extract")
    files = extract_dataset({"node": latest.drop("nearest_dist_m", "nearest_edge_id")},
                            "ds-a", out_dir)
    doc = json.load(open(files["node"]))
    assert any("tag:highway" in f["properties"] for f in doc["features"])
    # old snapshot untouched
    assert "nearest_edge_id" not in wh.read(spark, "images", snapshot=v0).columns
