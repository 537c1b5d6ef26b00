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


def test_extension_layers_and_info_headers(spark, tmp_path):
    """The reference's content.extension_file registry + per-layer info
    blobs (osw-backend-abstract.ts:131-189): extract_dataset emits every
    registered extension as osw.<name>s.geojson with file_meta spliced
    into its header, and standard layers carry their dataset info blob."""
    images = encode_cells(synth_images_df(spark, 100, with_bytes=False))
    ext_rows = spark.createDataFrame(
        [("ds-a", "crossing", -122.31 + i * 1e-4, 47.63, {"curb": "lowered"})
         for i in range(5)],
        "dataset_id string, name string, lon double, lat double, "
        "props map<string,string>")
    ext_reg = spark.createDataFrame(
        [("ds-a", "crossing",
          json.dumps({"ext_ver": "1.1", "$schema": "https://example/ext.json"})),
         ("ds-a", "empty_ext", json.dumps({"note": "no rows"}))],
        "dataset_id string, name string, file_meta string")
    info = spark.createDataFrame(
        [("ds-a", "node", json.dumps({"node_ver": "0.2", "region": "uw"}))],
        "dataset_id string, layer string, info_json string")
    svc = SvcCatalog(images=images, dataset_info=info,
                     extension_files=ext_reg, extensions=ext_rows)
    out_dir = str(tmp_path / "ext-job")
    files = extract_dataset({"node": svc.images}, "ds-a", out_dir,
                            layer_metadata=svc.layer_metadata("ds-a"),
                            extensions=svc.extension_layers("ds-a"))
    assert set(files) == {"node", "crossing"}  # empty_ext skipped (no rows)
    node_doc = json.loads(open(files["node"]).read())
    assert node_doc["node_ver"] == "0.2" and node_doc["region"] == "uw"
    assert "$schema" in node_doc  # default added when info lacks one
    ext_doc = json.loads(open(files["crossing"]).read())
    assert files["crossing"].endswith("osw.crossings.geojson")
    assert ext_doc["ext_ver"] == "1.1"
    assert ext_doc["$schema"] == "https://example/ext.json"  # not overridden
    assert len(ext_doc["features"]) == 5
    assert ext_doc["features"][0]["properties"]["curb"] == "lowered"


def test_build_atlas_job_resume_and_read(spark, tmp_path):
    """The atlas spark-submit entry (tools/build_atlas_job.py) builds
    all four layers through the manifest, re-runs as a no-op, and the
    stored gallery layer serves pruned viewport reads."""
    import json
    import sys

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    sys.path.insert(0, "tools")
    import build_atlas_job

    from tdei_backend_service_spark.codecs.image import encode_image
    from tdei_backend_service_spark.io.tile_store import read_viewport

    blob = encode_image(np.full((8, 8, 3), 90, dtype=np.uint8), "png")
    n = 1 << 15
    tl = lambda i: (i + 0.5) * 360.0 / n - 180.0
    pdf = pd.DataFrame([
        {"image_id": i, "bytes": blob, "fmt": "png",
         "caption": f"cap w{i % 3}", "lon": tl(900 + 31 * i), "lat": 47.0}
        for i in range(6)])
    images = str(tmp_path / "imgs.parquet")
    spark.createDataFrame(pdf).write.parquet(images)
    run_dir = str(tmp_path / "atlas")

    argv = ["--images", images, "--run-dir", run_dir, "--z", "15"]
    assert build_atlas_job.main(argv) == 0
    rec2 = {}
    # second run: every layer skips (capture by re-invoking the writes)
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert build_atlas_job.main(argv) == 0
    rec2 = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert all(v["skipped"] for v in rec2.values())
    g = read_viewport(spark, run_dir, 15, 0, n, 0, n, stage="gallery")
    rows = g.collect()
    assert len(rows) == 6 and all(bytes(r["bytes"]) for r in rows)


def test_refresh_atlas_job_equals_full_build(spark, tmp_path):
    """The incremental refresh entry (tools/refresh_atlas_job.py)
    produces an atlas version identical — tile bytes included — to a
    full rebuild over corpus + drop, for all seven stages."""
    import sys

    import numpy as np
    import pandas as pd

    sys.path.insert(0, "tools")
    import build_atlas_job
    import refresh_atlas_job

    from tdei_backend_service_spark.codecs.image import encode_image
    from tdei_backend_service_spark.core.manifest import read_stage

    n = 1 << 15
    tl = lambda i: (i + 0.5) * 360.0 / n - 180.0
    mk = lambda rows: pd.DataFrame(
        [{"image_id": i, "bytes": encode_image(
            np.full((8, 8, 3), v, dtype=np.uint8), "png"),
          "fmt": "png", "caption": cap, "lon": tl(c), "lat": 47.0}
         for i, v, cap, c in rows])
    corpus = [(0, 10, "park zebra", 500), (2, 200, "park", 500),
              (4, 90, "dog", 800)]
    drop = [(1, 50, "zebra zebra", 500), (3, 7, "cat", 1200)]
    pc, pdrop, pall = (str(tmp_path / f"{k}.parquet")
                       for k in ("c", "d", "a"))
    spark.createDataFrame(mk(corpus)).write.parquet(pc)
    spark.createDataFrame(mk(drop)).write.parquet(pdrop)
    spark.createDataFrame(mk(corpus + drop)).write.parquet(pall)
    v1, v2, full = (str(tmp_path / k) for k in ("v1", "v2", "full"))

    assert build_atlas_job.main(["--images", pc, "--run-dir", v1]) == 0
    assert refresh_atlas_job.main(
        ["--prev-run-dir", v1, "--drop", pdrop, "--run-dir", v2]) == 0
    assert build_atlas_job.main(["--images", pall, "--run-dir", full]) == 0

    for stage in ("density_pix", "density", "brightness_sums",
                  "brightness", "gallery", "term_counts", "terms"):
        a = read_stage(spark, v2, stage).drop("xs").toPandas()
        b = read_stage(spark, full, stage).drop("xs").toPandas()
        for df in (a, b):
            if "bytes" in df.columns:
                df["bytes"] = df["bytes"].map(lambda x: bytes(x).hex())
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b), stage
