"""io/tile_store + operators/raster incremental maintenance."""

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tdei_backend_service_spark.io.tile_store import (
    read_viewport, write_tile_layout)
from tdei_backend_service_spark.operators import raster

Z, PX = 11, 16


def _points_df(spark, seed, n=400):
    rng = np.random.default_rng(seed)
    return spark.createDataFrame(pd.DataFrame({
        "lon": -122.35 + rng.random(n) * 0.08,
        "lat": 47.60 + rng.random(n) * 0.06,
    }))


def test_viewport_roundtrip_and_partition_pruning(spark, tmp_path):
    tiles = raster.rasterize(_points_df(spark, 3), Z, PX)
    run_dir = str(tmp_path / "store")
    res = write_tile_layout(tiles, run_dir)
    assert not res["skipped"] and res["partitions"] >= 1

    all_rows = {(r["tile_x"], r["tile_y"]): bytes(r["bytes"])
                for r in tiles.collect()}
    xs = sorted({x for x, _ in all_rows})
    ys = sorted({y for _, y in all_rows})
    vp = read_viewport(spark, run_dir, Z, xs[0], xs[0], ys[0], ys[-1])
    got = {(r["tile_x"], r["tile_y"]): bytes(r["bytes"])
           for r in vp.collect()}
    want = {k: v for k, v in all_rows.items() if k[0] == xs[0]}
    assert got == want  # byte-identical through the store

    plan = vp._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the z/xs predicates reached the directory level
    assert plan.count("xs#") >= 1 and "PushedFilters" in plan


def test_write_is_idempotent_resume(spark, tmp_path):
    tiles = raster.rasterize(_points_df(spark, 5), Z, PX)
    run_dir = str(tmp_path / "store")
    write_tile_layout(tiles, run_dir)
    res2 = write_tile_layout(tiles, run_dir)
    assert res2["skipped"]  # complete stage never rewrites


def test_manifest_records_per_stripe_lineage(spark, tmp_path):
    tiles = raster.rasterize(_points_df(spark, 7), Z, PX)
    run_dir = str(tmp_path / "store")
    write_tile_layout(tiles, run_dir)
    import json
    with open(os.path.join(run_dir, "manifest.json")) as f:
        st = json.load(f)["stages"]["tiles"]
    assert st["status"] == "complete" and st["keys"] == ["z", "xs"]
    parts = st["partitions"]
    assert parts and all(p["rows"] > 0 and p["bytes"] > 0
                         for p in parts.values())


def test_incremental_raster_equals_recompute(spark):
    """Localized drop: merged layer == full re-render, and untouched
    tiles keep their committed BYTES (no re-encode)."""
    base = _points_df(spark, 11, 500)
    # drop confined to a corner of the extent -> some tiles untouched
    rng = np.random.default_rng(13)
    drop = spark.createDataFrame(pd.DataFrame({
        "lon": -122.35 + rng.random(60) * 0.01,
        "lat": 47.60 + rng.random(60) * 0.01,
    }))
    cpix = raster.pixel_counts(base, Z, PX)
    ctiles = raster.rasterize(base, Z, PX)
    merged = raster.incremental_raster_tiles(cpix, ctiles, drop, Z, PX)

    full = raster.rasterize(base.unionByName(drop), Z, PX)
    got = {(r["tile_x"], r["tile_y"]): bytes(r["bytes"])
           for r in merged.collect()}
    want = {(r["tile_x"], r["tile_y"]): bytes(r["bytes"])
            for r in full.collect()}
    assert got == want  # byte-identical to the recompute

    affected = {(r["tile_x"], r["tile_y"])
                for r in raster.pixel_counts(drop, Z, PX)
                .select("tile_x", "tile_y").distinct().collect()}
    committed = {(r["tile_x"], r["tile_y"]): bytes(r["bytes"])
                 for r in ctiles.collect()}
    untouched = set(committed) - affected
    assert untouched  # the fixture really leaves tiles untouched
    for k in untouched:
        assert got[k] == committed[k]


def test_merge_pixel_counts_is_monoid(spark):
    a = raster.pixel_counts(_points_df(spark, 17, 200), Z, PX)
    b = raster.pixel_counts(_points_df(spark, 19, 200), Z, PX)
    m = raster.merge_pixel_counts(a, b, PX)
    total = m.agg(F.sum("n")).collect()[0][0]
    assert total == 400


def test_write_tile_layout_validates_stripe(spark, tmp_path):
    tiles = raster.rasterize(_points_df(spark, 23, 50), Z, PX)
    with pytest.raises(ValueError):
        write_tile_layout(tiles, str(tmp_path / "s"), stripe=0)


def test_gallery_layer_through_store(spark, tmp_path):
    """The browse layer composes with the manifest store like any
    rendered layer: gallery tiles (thumb bytes + winner id) round-trip
    byte-identically and viewport reads prune to the stripe."""
    from tdei_backend_service_spark.codecs.image import encode_image
    from tdei_backend_service_spark.operators.geo_visual import tile_gallery

    n = 1 << 15
    tl = lambda i: (i + 0.5) * 360.0 / n - 180.0
    rows = [{"image_id": 10 + i,
             "bytes": encode_image(np.full((8, 8), 60 + i,
                                           dtype=np.uint8), "png"),
             "fmt": "png", "lon": tl(1000 + 40 * i), "lat": 47.0}
            for i in range(4)]
    g = tile_gallery(spark.createDataFrame(pd.DataFrame(rows)), 15, 16)
    run_dir = str(tmp_path / "gstore")
    res = write_tile_layout(g, run_dir)
    assert not res["skipped"]

    all_rows = {(r["tile_x"], r["tile_y"]):
                (bytes(r["bytes"]), r["image_id"]) for r in g.collect()}
    assert len(all_rows) == 4
    xs = sorted({x for x, _ in all_rows})
    vp = read_viewport(spark, run_dir, 15, xs[0], xs[1], 0, n)
    got = {(r["tile_x"], r["tile_y"]): (bytes(r["bytes"]), r["image_id"])
           for r in vp.collect()}
    want = {k: v for k, v in all_rows.items() if k[0] in (xs[0], xs[1])}
    assert got == want  # thumbs AND winner ids survive the store
