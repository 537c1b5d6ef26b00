import numpy as np
import pytest

from tdei_backend_service_spark.core import cells


def test_morton_roundtrip():
    rng = np.random.default_rng(42)
    x = rng.integers(0, 1 << 29, 10_000).astype(np.uint64)
    y = rng.integers(0, 1 << 29, 10_000).astype(np.uint64)
    m = cells.morton2(x, y)
    x2, y2 = cells.unmorton2(m)
    assert np.array_equal(x, x2) and np.array_equal(y, y2)


def test_encode_decode_roundtrip():
    rng = np.random.default_rng(1)
    lon = rng.uniform(-180, 179.999, 5000)
    lat = rng.uniform(-90, 89.999, 5000)
    for depth in (11, 15, 19):
        c = cells.encode(lon, lat, depth)
        assert np.all(cells.cell_depth(c) == depth)
        lo0, la0, lo1, la1 = cells.cell_bounds(c)
        assert np.all((lon >= lo0) & (lon < lo1 + 1e-9))
        assert np.all((lat >= la0) & (lat < la1 + 1e-9))


def test_parent_is_prefix():
    lon = np.array([-122.3, 10.0])
    lat = np.array([47.6, -5.0])
    child = cells.encode(lon, lat, 19)
    parent = cells.cell_parent(child, 11)
    direct = cells.encode(lon, lat, 11)
    assert np.array_equal(parent, direct)


def test_neighbors_ring():
    c = cells.encode(np.array([0.0]), np.array([0.0]), 10)
    ring1 = cells.neighbors(c, cells.ring_offsets(1))
    assert ring1.shape == (1, 8)
    assert np.all(ring1 >= 0)
    assert len(np.unique(ring1)) == 8
    disk = cells.neighbors(c, cells.disk_offsets(1))
    assert disk.shape == (1, 9)
    assert c[0] in disk


def test_neighbors_wrap_and_clamp():
    # cell at the antimeridian wraps in x; cell at the pole clamps y to -1
    c = cells.encode(np.array([-179.99]), np.array([89.99]), 8)
    nb = cells.neighbors(c, cells.ring_offsets(1))
    assert np.sum(nb == -1) == 3  # the three "north of the pole row" offsets
    assert np.all(nb[nb >= 0] >= 0)


def test_cover_bbox_contains_points():
    rng = np.random.default_rng(7)
    bbox = (-122.35, 47.60, -122.25, 47.70)
    cover = cells.cover_bbox(*bbox, depth=15)
    lon = rng.uniform(bbox[0], bbox[2], 1000)
    lat = rng.uniform(bbox[1], bbox[3], 1000)
    pts = cells.encode(lon, lat, 15)
    assert np.all(np.isin(pts, cover))


def test_cover_segments_superset():
    # any point sampled along a segment must land in the cover
    rng = np.random.default_rng(3)
    x0 = rng.uniform(-122.35, -122.25, 50)
    y0 = rng.uniform(47.6, 47.7, 50)
    x1 = x0 + rng.uniform(-0.01, 0.01, 50)
    y1 = y0 + rng.uniform(-0.01, 0.01, 50)
    seg_idx, cover = cells.cover_segments(x0, y0, x1, y1, depth=17)
    for t in np.linspace(0, 1, 9):
        px = x0 + t * (x1 - x0)
        py = y0 + t * (y1 - y0)
        pc = cells.encode(px, py, 17)
        for i in range(50):
            assert pc[i] in cover[seg_idx == i]


def test_cover_segments_pad():
    x0, y0 = np.array([-122.30]), np.array([47.65])
    seg_idx, unpadded = cells.cover_segments(x0, y0, x0, y0, depth=17)
    _, padded = cells.cover_segments(x0, y0, x0, y0, depth=17,
                                     pad_deg=2 * cells.cell_size_deg(17))
    assert padded.size > unpadded.size


def test_depth_for_radius():
    d = cells.depth_for_radius_m(100.0)
    # the LAT extent (tighter axis) must cover the radius at d, not at d+1
    assert cells.cell_lat_m(d) >= 100.0
    assert cells.cell_lat_m(d + 1) < 100.0


def test_tiles_deterministic_boundary():
    # west/north edge inclusive convention (FIXTURES.md T4 tiling fixture)
    z = 10
    n = 1 << z
    lon_edge = -180.0 + 360.0 / n  # exact boundary between tile 0 and 1
    x, y = cells.lonlat_to_tile(np.array([lon_edge]), np.array([0.0]), z)
    assert x[0] == 1
    key = cells.tile_key(z, x, y)
    assert cells.cell_depth(key)[0] == z


def test_expr_encoders_match_numpy(spark):
    # Catalyst expression encoders must be bit-identical to the numpy
    # kernels over random + boundary coordinates
    import numpy as np
    from pyspark.sql import functions as F

    from tdei_backend_service_spark.core import cells as C
    rng = np.random.default_rng(9)
    lon = np.concatenate([rng.uniform(-180, 180, 4000),
                          [-180.0, 0.0, 179.999999, 180.0 - 1e-12]])
    lat = np.concatenate([rng.uniform(-90, 90, 4000),
                          [-90.0, 0.0, 89.999999, 85.05112878]])
    import pandas as pd
    df = spark.createDataFrame(pd.DataFrame({"lon": lon, "lat": lat}))
    for depth in (11, 15, 19):
        got = np.array([r[0] for r in df.select(
            C.encode_expr(F.col("lon"), F.col("lat"), depth)).collect()])
        want = C.encode(lon, lat, depth)
        assert (got == want).all(), depth
    for z in (8, 15):
        tx, ty, tk = C.tile_expr(F.col("lon"), F.col("lat"), z)
        got = df.select(tx.alias("x"), ty.alias("y"), tk.alias("k")).toPandas()
        wx, wy = C.lonlat_to_tile(lon, lat, z)
        wk = C.tile_key(z, wx, wy)
        assert (got["x"].to_numpy() == wx).all(), z
        assert (got["y"].to_numpy() == wy).all(), z
        assert (got["k"].to_numpy() == wk).all(), z
