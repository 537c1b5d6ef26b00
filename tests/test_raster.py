"""operators/raster: vector->raster tiles, pyramids, image-space mosaic.

Every test pins the rendered PIXELS (decoded from the real PNG bytes)
against a numpy reference computed straight from the web-mercator
formula — not against the operator's own intermediate relations.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tdei_backend_service_spark.codecs.image import decode_image
from tdei_backend_service_spark.core import cells
from tdei_backend_service_spark.operators import raster

Z, PX = 11, 16
ZP = Z + 4  # global pixel zoom


def _points_df(spark, lons, lats):
    pdf = pd.DataFrame({"lon": lons, "lat": lats})
    return spark.createDataFrame(pdf)


def _ref_pixels(lons, lats):
    """numpy reference: global pixel coords at zoom ZP."""
    gx, gy = cells.lonlat_to_tile(np.asarray(lons, dtype=np.float64),
                                  np.asarray(lats, dtype=np.float64), ZP)
    return gx, gy


def _tile_arrays(tiles_df):
    """{(z, tx, ty): decoded uint8 (px, px)} from rendered tile rows."""
    out = {}
    for r in tiles_df.collect():
        img = decode_image(bytes(r["bytes"]), r["fmt"])
        if img.ndim == 3:
            img = img[:, :, 0]
        out[(r["z"], r["tile_x"], r["tile_y"])] = img
    return out


def test_rasterize_pixels_match_reference(spark):
    rng = np.random.default_rng(7)
    lons = -122.35 + rng.random(500) * 0.08
    lats = 47.60 + rng.random(500) * 0.06
    tiles = raster.rasterize(_points_df(spark, lons, lats), Z, PX)
    arrays = _tile_arrays(tiles)

    gx, gy = _ref_pixels(lons, lats)
    ref = {}
    for x, y in zip(gx, gy):
        key = (Z, int(x) // PX, int(y) // PX)
        ref.setdefault(key, np.zeros((PX, PX), dtype=np.int64))
        ref[key][int(y) % PX, int(x) % PX] += 1
    assert set(arrays) == set(ref)
    for key, img in arrays.items():
        np.testing.assert_array_equal(img, np.minimum(ref[key], 255))


def test_rasterize_clips_at_255(spark):
    # 300 coincident points -> single pixel, clipped to 255
    tiles = raster.rasterize(
        _points_df(spark, [-122.3] * 300, [47.61] * 300), Z, PX)
    arrays = _tile_arrays(tiles)
    (img,) = arrays.values()
    assert img.max() == 255 and (img > 0).sum() == 1
    # but n_points keeps the raw count
    assert tiles.collect()[0]["n_points"] == 300


def test_pyramid_level_equals_direct_aggregation(spark):
    """z10 from pyramid halving == pixel_counts recomputed at z10."""
    rng = np.random.default_rng(11)
    lons = -122.35 + rng.random(400) * 0.08
    lats = 47.60 + rng.random(400) * 0.06
    df = _points_df(spark, lons, lats)
    pix = raster.pixel_counts(df, Z, PX)
    pyr = raster.pyramid_pixel_counts(pix, Z, Z - 1, PX)
    got = {tuple(r) for r in pyr.filter(F.col("z") == Z - 1)
           .select("gx", "gy", "n").collect()}
    want = {tuple(r) for r in raster.pixel_counts(df, Z - 1, PX)
            .select("gx", "gy", "n").collect()}
    assert got == want


def test_mosaic_pools_children_exactly(spark):
    """Parent pixels = 2x2 child-block sum DIV 4, missing children = 0."""
    rng = np.random.default_rng(13)
    lons = -122.35 + rng.random(600) * 0.08
    lats = 47.60 + rng.random(600) * 0.06
    tiles = raster.rasterize(_points_df(spark, lons, lats), Z, PX)
    children = _tile_arrays(tiles)
    parents = _tile_arrays(raster.mosaic_tiles(tiles, PX))

    ref = {}
    for (z, tx, ty), img in children.items():
        pk = (z - 1, tx // 2, ty // 2)
        canvas = ref.setdefault(pk, np.zeros((2 * PX, 2 * PX), dtype=np.int64))
        canvas[(ty % 2) * PX:(ty % 2) * PX + PX,
               (tx % 2) * PX:(tx % 2) * PX + PX] = img
    assert set(parents) == set(ref)
    for pk, canvas in ref.items():
        pooled = canvas.reshape(PX, 2, PX, 2).sum(axis=(1, 3)) // 4
        np.testing.assert_array_equal(parents[pk], pooled)


def test_decode_tile_stats_roundtrip(spark):
    rng = np.random.default_rng(17)
    lons = -122.35 + rng.random(300) * 0.08
    lats = 47.60 + rng.random(300) * 0.06
    tiles = raster.rasterize(_points_df(spark, lons, lats), Z, PX)
    arrays = _tile_arrays(tiles)
    stats = {(r["z"], r["tile_x"], r["tile_y"]):
             (r["nonzero_px"], r["sum_px"], r["max_px"])
             for r in raster.decode_tile_stats(tiles).collect()}
    assert set(stats) == set(arrays)
    for key, img in arrays.items():
        v = img.astype(np.int64)
        assert stats[key] == (int((v > 0).sum()), int(v.sum()), int(v.max()))


def test_pixel_counts_single_exchange(spark):
    """The corpus-side plan is ONE hash aggregate exchange, all JVM —
    no Python node before the pixel relation exists."""
    df = _points_df(spark, [-122.3, -122.31], [47.61, 47.62])
    plan = raster.pixel_counts(df, Z, PX)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_px_validation():
    with pytest.raises(ValueError):
        raster._log2_px(12)
    with pytest.raises(ValueError):
        raster._log2_px(512)


# -- property-based parity vs the numpy tile kernel ------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_lon = st.floats(min_value=-179.9, max_value=179.9, allow_nan=False)
_lat = st.floats(min_value=-84.9, max_value=84.9, allow_nan=False)
_pts = st.lists(st.tuples(_lon, _lat), min_size=1, max_size=30)


@settings(max_examples=6, deadline=None)
@given(_pts)
def test_pixel_counts_match_kernel_prop(spark, pts):
    """The Catalyst pixel lattice == the numpy tile kernel at zoom z+4
    for arbitrary world coordinates (incl. ones near tile edges)."""
    lons = np.array([p[0] for p in pts])
    lats = np.array([p[1] for p in pts])
    df = spark.createDataFrame(pd.DataFrame({"lon": lons, "lat": lats}))
    got = {(r["gx"], r["gy"]): r["n"]
           for r in raster.pixel_counts(df, Z, PX).collect()}
    gx, gy = cells.lonlat_to_tile(lons, lats, ZP)
    want = {}
    for x, y in zip(gx, gy):
        want[(int(x), int(y))] = want.get((int(x), int(y)), 0) + 1
    assert got == want


def test_raster_to_points_roundtrip(spark):
    """rasterize -> raster_to_points == the clipped pixel lattice, and
    a threshold drops exactly the below-threshold pixels."""
    rng = np.random.default_rng(41)
    lons = -122.35 + rng.random(400) * 0.02
    lats = 47.60 + rng.random(400) * 0.02
    df = _points_df(spark, lons, lats)
    tiles = raster.rasterize(df, Z, PX)
    got = {(r["gx"], r["gy"]): r["v"]
           for r in raster.raster_to_points(tiles, min_value=1).collect()}
    want = {(r["gx"], r["gy"]): min(r["n"], 255)
            for r in raster.pixel_counts(df, Z, PX).collect()}
    assert got == want
    got2 = {(r["gx"], r["gy"]): r["v"]
            for r in raster.raster_to_points(tiles, min_value=2).collect()}
    assert got2 == {k: v for k, v in want.items() if v >= 2}
    with pytest.raises(ValueError):
        raster.raster_to_points(tiles, min_value=300)


def _pix_df(spark, counts, z=Z):
    """pixel relation from {(gx, gy): n} dict."""
    rows = [{"z": z, "tile_x": gx // PX, "tile_y": gy // PX,
             "gx": gx, "gy": gy, "px_x": gx % PX, "px_y": gy % PX, "n": n}
            for (gx, gy), n in counts.items()]
    return spark.createDataFrame(
        pd.DataFrame(rows),
        schema="z int, tile_x int, tile_y int, gx long, gy long,"
               " px_x int, px_y int, n long")


def test_focal_sum_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    counts = {}
    for _ in range(120):  # sparse blob spanning several tiles
        counts[(int(rng.integers(5240, 5280)),
                int(rng.integers(11420, 11460)))] = int(rng.integers(1, 9))
    for radius in (0, 1, 2):
        got = {(r["gx"], r["gy"]): r["n"]
               for r in raster.focal_sum(_pix_df(spark, counts), PX,
                                         radius).collect()}
        ref = {}
        for (gx, gy), n in counts.items():
            for dx in range(-radius, radius + 1):
                for dy in range(-radius, radius + 1):
                    k = (gx + dx, gy + dy)
                    ref[k] = ref.get(k, 0) + n
        assert got == ref
    # derived tile/pixel columns stay consistent with the global coords
    row = raster.focal_sum(_pix_df(spark, counts), PX, 1).collect()[0]
    assert row["tile_x"] == row["gx"] // PX and row["px_x"] == row["gx"] % PX


def test_combine_pixel_counts_ops_match_bruteforce(spark):
    rng = np.random.default_rng(12)
    keys = [(int(rng.integers(5240, 5260)), int(rng.integers(11420, 11440)))
            for _ in range(60)]
    a = {k: int(rng.integers(1, 9)) for k in keys[:40]}
    b = {k: int(rng.integers(1, 9)) for k in keys[20:]}
    ops = {"add": lambda x, y: x + y, "absdiff": lambda x, y: abs(x - y),
           "max": max, "min": min}
    for op, fn in ops.items():
        got = {(r["gx"], r["gy"]): r["n"]
               for r in raster.combine_pixel_counts(
                   _pix_df(spark, a), _pix_df(spark, b), PX, op).collect()}
        ref = {k: fn(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
        ref = {k: v for k, v in ref.items() if v > 0}
        assert got == ref, op
    with pytest.raises(ValueError):
        raster.combine_pixel_counts(_pix_df(spark, a), _pix_df(spark, b),
                                    PX, "sub")


def test_combine_add_equals_merge(spark):
    """'add' is the merge monoid: parity with merge_pixel_counts."""
    rng = np.random.default_rng(13)
    a = {(int(rng.integers(5240, 5250)), int(rng.integers(11420, 11430))):
         int(rng.integers(1, 5)) for _ in range(30)}
    b = {(int(rng.integers(5240, 5250)), int(rng.integers(11420, 11430))):
         int(rng.integers(1, 5)) for _ in range(30)}
    got = raster.combine_pixel_counts(_pix_df(spark, a), _pix_df(spark, b),
                                      PX, "add")
    ref = raster.merge_pixel_counts(_pix_df(spark, a), _pix_df(spark, b), PX)
    assert ({tuple(r) for r in got.collect()}
            == {tuple(r) for r in ref.collect()})


def test_zonal_stats_matches_bruteforce(spark):
    from tdei_backend_service_spark import fixtures_tpch as FX
    rng = np.random.default_rng(14)
    counts = {(int(rng.integers(5244, 5260)),
               int(rng.integers(11428, 11448))): int(rng.integers(1, 300))
              for _ in range(200)}
    pix = _pix_df(spark, counts).withColumn("v", F.col("n"))
    zones = FX.pixel_zones(spark)
    got = {r["zone_id"]: (r["n_px"], r["sum_v"], r["max_v"])
           for r in raster.zonal_stats(pix, zones, PX).collect()}
    ref = {}
    for zr in FX._pixel_zone_rows():
        vals = [n for (gx, gy), n in counts.items()
                if zr["gx0"] <= gx <= zr["gx1"] and zr["gy0"] <= gy <= zr["gy1"]]
        if vals:
            ref[zr["zone_id"]] = (len(vals), sum(vals), max(vals))
    assert got == ref
    assert ref  # the planted window must actually intersect zones


def test_zonal_stats_plan_is_equi_join(spark):
    """The zone cover joins on the tile key — no nested-loop join."""
    from tdei_backend_service_spark import fixtures_tpch as FX
    pix = _pix_df(spark, {(5246, 11430): 3}).withColumn("v", F.col("n"))
    plan = (raster.zonal_stats(pix, FX.pixel_zones(spark), PX)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_hotspots_deterministic_topk(spark):
    rng = np.random.default_rng(15)
    counts = {(int(rng.integers(5240, 5250)), int(rng.integers(11420, 11430))):
              int(rng.integers(1, 4)) for _ in range(80)}
    got = [(r["gx"], r["gy"], r["v"])
           for r in raster.hotspots(_pix_df(spark, counts), 10).collect()]
    ref = sorted(((gx, gy, n) for (gx, gy), n in counts.items()),
                 key=lambda t: (-t[2], t[0], t[1]))[:10]
    assert got == ref


def test_rasterize_zones_burns_exact_area(spark):
    from tdei_backend_service_spark import fixtures_tpch as FX
    zones = FX.pixel_zones(spark)
    got = {(r["gx"], r["gy"]): r["n"]
           for r in raster.rasterize_zones(
               zones, Z, PX, weight=F.col("zone_id") + 1).collect()}
    ref = {}
    for zr in FX._pixel_zone_rows():
        for gx in range(zr["gx0"], zr["gx1"] + 1):
            for gy in range(zr["gy0"], zr["gy1"] + 1):
                ref[(gx, gy)] = ref.get((gx, gy), 0) + zr["zone_id"] + 1
    assert got == ref
    # fixture zones are disjoint: burned area == sum of rectangle areas
    assert len(got) == 30 * 2 * 3


def test_rasterize_zones_overlap_sums_weights(spark):
    zones = spark.createDataFrame(
        pd.DataFrame([{"zone_id": 0, "gx0": 10, "gy0": 20, "gx1": 12,
                       "gy1": 21},
                      {"zone_id": 1, "gx0": 11, "gy0": 20, "gx1": 11,
                       "gy1": 22}]),
        schema="zone_id long, gx0 long, gy0 long, gx1 long, gy1 long")
    got = {(r["gx"], r["gy"]): r["n"]
           for r in raster.rasterize_zones(zones, Z, PX).collect()}
    assert got[(11, 20)] == 2 and got[(11, 21)] == 2
    assert got[(10, 20)] == 1 and got[(11, 22)] == 1
    assert sum(got.values()) == 6 + 3


# ---------------------------------------------------------------------------
# segment_pixels (line burn-in)
# ---------------------------------------------------------------------------

def _ref_segment_cover(fx0, fy0, fx1, fy1):
    """python replica of the DDA sampling rule."""
    import math
    kk = max(1, math.ceil(max(abs(fx1 - fx0), abs(fy1 - fy0))))
    return {(math.floor(fx0 + (fx1 - fx0) * (k / kk)),
             math.floor(fy0 + (fy1 - fy0) * (k / kk)))
            for k in range(kk + 1)}


def _fpix(lon, lat, zp):
    import math
    n = 1 << zp
    return ((lon + 180.0) / 360.0 * n,
            (1.0 - math.asinh(math.tan(math.radians(lat))) / math.pi)
            / 2.0 * n)


def _segs_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["seg_id", "lon0", "lat0",
                                      "lon1", "lat1"])
    return spark.createDataFrame(pdf)


def test_segment_pixels_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    rows = []
    for i in range(40):
        lon0, lon1 = rng.uniform(0.0, 0.05, 2)
        lat0, lat1 = 47.0 + rng.uniform(0.0, 0.05, 2)
        rows.append((i, lon0, lat0, lon1, lat1))
    rows.append((40, 0.01, 47.01, 0.01, 47.01))       # zero length
    rows.append((41, rows[0][1], rows[0][2], rows[0][3], rows[0][4]))
    # ^ duplicate geometry under a second id -> pixel n must count 2
    out = raster.segment_pixels(_segs_df(spark, rows), Z, PX)
    exp: dict[tuple, int] = {}
    for sid, lon0, lat0, lon1, lat1 in rows:
        fx0, fy0 = _fpix(lon0, lat0, ZP)
        fx1, fy1 = _fpix(lon1, lat1, ZP)
        for p in _ref_segment_cover(fx0, fy0, fx1, fy1):
            exp[p] = exp.get(p, 0) + 1
    got = {(r["gx"], r["gy"]): r["n"] for r in out.collect()}
    assert got == exp
    # both endpoint pixels of every segment are always covered
    for sid, lon0, lat0, lon1, lat1 in rows:
        fx0, fy0 = _fpix(lon0, lat0, ZP)
        fx1, fy1 = _fpix(lon1, lat1, ZP)
        assert (int(np.floor(fx0)), int(np.floor(fy0))) in got
        assert (int(np.floor(fx1)), int(np.floor(fy1))) in got


def test_segment_pixels_cover_is_8_connected(spark):
    # consecutive DDA samples move <= 1 pixel per axis, so a segment's
    # cover always contains an 8-connected endpoint-to-endpoint chain
    # (zoom-17 lattice so the fixture lines span long pixel chains)
    Z2, ZP2 = 13, 17
    rows = [(0, 0.0, 47.0, 0.049, 47.001),   # shallow long line
            (1, 0.001, 47.002, 0.002, 47.049)]  # steep long line
    for sid, lon0, lat0, lon1, lat1 in rows:
        fx0, fy0 = _fpix(lon0, lat0, ZP2)
        fx1, fy1 = _fpix(lon1, lat1, ZP2)
        import math
        kk = max(1, math.ceil(max(abs(fx1 - fx0), abs(fy1 - fy0))))
        pts = [(math.floor(fx0 + (fx1 - fx0) * (k / kk)),
                math.floor(fy0 + (fy1 - fy0) * (k / kk)))
               for k in range(kk + 1)]
        assert kk > 10  # the fixture really exercises long chains
        for (x0, y0), (x1, y1) in zip(pts, pts[1:]):
            assert abs(x1 - x0) <= 1 and abs(y1 - y0) <= 1
    out = raster.segment_pixels(_segs_df(spark, rows), Z2, PX)
    exp = set()
    for sid, lon0, lat0, lon1, lat1 in rows:
        fx0, fy0 = _fpix(lon0, lat0, ZP2)
        fx1, fy1 = _fpix(lon1, lat1, ZP2)
        exp |= _ref_segment_cover(fx0, fy0, fx1, fy1)
    assert {(r["gx"], r["gy"]) for r in out.collect()} == exp


def test_segment_pixels_two_exchanges(spark):
    rows = [(i, 0.001 * i, 47.0, 0.001 * i + 0.01, 47.01)
            for i in range(20)]
    plan = raster.segment_pixels(_segs_df(spark, rows), Z, PX) \
        ._jdf.queryExecution().executedPlan().toString()
    # per-segment pixel distinct + the pixel aggregate, nothing more
    assert plan.count("Exchange hashpartitioning") == 2, plan
