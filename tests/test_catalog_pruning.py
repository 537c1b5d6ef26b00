import numpy as np
import pytest
from pyspark.sql import functions as F

from tdei_backend_service_spark.core import cells
from tdei_backend_service_spark.core.ingest import encode_cells
from tdei_backend_service_spark.datagen import synth_images_df
from tdei_backend_service_spark.io.catalog import Catalog
from tdei_backend_service_spark.operators.bbox import bbox_filter_points


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh"))
    cat = Catalog(wh)
    df = encode_cells(synth_images_df(spark, 5000, with_bytes=False))
    cat.write_snapshot("images", df)
    return cat


def test_snapshot_roundtrip(spark, warehouse):
    back = warehouse.read(spark, "images")
    assert back.count() == 5000
    assert "cell_p5" in back.columns


def test_partition_pruning_in_plan(spark, warehouse):
    """A bbox query against the partitioned table must show BOTH
    directory-level partition pruning (cell_p5 in PartitionFilters) and
    parquet row-group pushdown (lon/lat in PushedFilters)."""
    back = warehouse.read(spark, "images")
    bbox = (-122.34, 47.61, -122.30, 47.65)
    cover = [int(c) for c in cells.cover_bbox(*bbox, depth=cells.RES_GRID[5])]
    q = bbox_filter_points(back, bbox).filter(F.col("cell_p5").isin(cover))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "cell_p5" in plan.split("PartitionFilters")[1][:400]
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:400]
    assert "lon" in pushed and "lat" in pushed
    # and the result is still exactly right
    got = {r.image_id for r in q.collect()}
    exp = {r.image_id for r in bbox_filter_points(back, bbox).collect()}
    assert got == exp and len(got) > 0


def test_snapshot_semantics_tag_road_style(spark, warehouse):
    """In-place UPDATE -> new snapshot: write v1 (tagged), verify v0
    still readable, current() moves forward."""
    v0 = warehouse.current_snapshot("images")
    tagged = warehouse.read(spark, "images").withColumn(
        "props", F.map_concat(F.col("props"),
                              F.create_map(F.lit("tag:x"), F.lit("1"))))
    v1 = warehouse.write_snapshot("images", tagged)
    assert v1 == v0 + 1
    old = warehouse.read(spark, "images", snapshot=v0)
    new = warehouse.read(spark, "images")
    assert "tag:x" not in old.first().props
    assert new.first().props["tag:x"] == "1"
    assert old.count() == new.count() == 5000
