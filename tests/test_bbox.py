import numpy as np
import pytest

from tdei_backend_service_spark.core import ingest
from tdei_backend_service_spark.datagen import (REGION, synth_edges_df,
                                                synth_images_df,
                                                synth_zones_df)
from tdei_backend_service_spark.operators import bbox as bbox_op

BBOX = (-122.33, 47.62, -122.29, 47.66)


@pytest.fixture(scope="module")
def layers(spark):
    images = ingest.encode_cells(
        synth_images_df(spark, 2000, seed=42, with_bytes=False)).cache()
    edges = ingest.encode_geom_meta(synth_edges_df(spark, 60)).cache()
    zones = ingest.encode_geom_meta(synth_zones_df(spark, 16)).cache()
    return {"images": images, "edges": edges, "zones": zones}


def test_parse_bbox_validation():
    assert bbox_op.parse_bbox("1,2,3,4") == (1, 2, 3, 4)
    assert bbox_op.parse_bbox([1, 2, 3, 4]) == (1, 2, 3, 4)
    with pytest.raises(bbox_op.InputException):
        bbox_op.parse_bbox("1,2,3")
    with pytest.raises(bbox_op.InputException):
        bbox_op.parse_bbox("a,b,c,d")
    with pytest.raises(bbox_op.InputException):
        bbox_op.parse_bbox("5,2,3,4")


def test_bbox_points_matches_bruteforce(layers):
    got = set(r.image_id for r in
              bbox_op.bbox_filter_points(layers["images"], BBOX, "ds-a")
              .select("image_id").collect())
    pdf = layers["images"].select("image_id", "lon", "lat").toPandas()
    exp = set(pdf.image_id[(pdf.lon >= BBOX[0]) & (pdf.lon <= BBOX[2])
                           & (pdf.lat >= BBOX[1]) & (pdf.lat <= BBOX[3])])
    assert got == exp and len(got) > 0


def test_bbox_edges_matches_bruteforce(layers):
    from tdei_backend_service_spark.core import geom
    got = set(r.edge_id for r in
              bbox_op.bbox_filter_geoms(layers["edges"], BBOX, "ds-a")
              .select("edge_id").collect())
    pdf = layers["edges"].select("edge_id", "geometry").toPandas()
    g = geom.parse_wkb_batch(pdf.geometry)
    exp = set()
    for i, eid in enumerate(pdf.edge_id):
        c = g.coords[g.offsets[i]:g.offsets[i + 1]]
        # brute force: sample densely along each segment
        for s in range(len(c) - 1):
            ts = np.linspace(0, 1, 2001)
            xs = c[s, 0] + ts * (c[s + 1, 0] - c[s, 0])
            ys = c[s, 1] + ts * (c[s + 1, 1] - c[s, 1])
            if np.any((xs >= BBOX[0]) & (xs <= BBOX[2]) & (ys >= BBOX[1]) & (ys <= BBOX[3])):
                exp.add(eid)
    assert got == exp and len(got) > 0


def test_bbox_zones_contains_bbox(layers):
    # a bbox strictly inside one zone must return that zone
    tiny = (-122.349, 47.601, -122.348, 47.602)
    got = [r.zone_id for r in
           bbox_op.bbox_filter_geoms(layers["zones"], tiny, "ds-a").collect()]
    assert 0 in got


def test_bbox_full_operator_layers(layers):
    out = bbox_op.bbox_intersect(layers, "ds-a", BBOX)
    assert set(out) == {"images", "edges", "zones"}
    for df in out.values():
        assert df.count() > 0


def test_points_plan_is_pushed_down(layers, spark):
    # the point path must stay UDF-free so filters reach the scan
    df = bbox_op.bbox_filter_points(layers["images"], BBOX, "ds-a")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "pythonUDF" not in plan.lower()


def test_ingest_cell_columns(layers):
    row = layers["images"].select("lon", "lat", "cell_r8", "cell_p5",
                                  "tile_z", "tile_x", "tile_y").first()
    from tdei_backend_service_spark.core import cells
    exp = cells.encode(np.array([row.lon]), np.array([row.lat]),
                       cells.RES_GRID[8])[0]
    assert row.cell_r8 == exp
    assert cells.cell_depth(np.array([row.cell_p5]))[0] == cells.RES_GRID[5]
    tx, ty = cells.lonlat_to_tile(np.array([row.lon]), np.array([row.lat]), row.tile_z)
    assert (row.tile_x, row.tile_y) == (tx[0], ty[0])
