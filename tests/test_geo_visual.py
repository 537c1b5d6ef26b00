"""operators/geo_visual: co-located AND visually-near-dup min-winner."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tdei_backend_service_spark.codecs.image import encode_image
from tdei_backend_service_spark.core import cells
from tdei_backend_service_spark.operators.geo_visual import (
    decode_phash_points, geo_visual_dedup)

M_LAT = cells.M_PER_DEG_LAT


def _img_bytes(pattern: int, flip_bits: tuple = ()) -> bytes:
    """8x8 gray blocks from a 64-bit pattern (the ahash64 fixture law:
    constant blocks above/below the mean reproduce the pattern)."""
    v = pattern
    for b in flip_bits:
        v ^= 1 << b
    cell = np.array([[(v >> (63 - (8 * i + j))) & 1 for j in range(8)]
                     for i in range(8)], dtype=np.uint8)
    return encode_image(np.where(cell == 1, 200, 40).astype(np.uint8), "png")


BASE = 0x5A5A_3C3C_A5A5_C3C3


def _rows():
    lon0, lat0 = -122.30, 47.61
    return [
        # 0: survivor (smallest id at site A)
        {"image_id": 0, "bytes": _img_bytes(BASE), "fmt": "png",
         "lon": lon0, "lat": lat0},
        # 1: same site, hamming 2 -> loses to 0
        {"image_id": 1, "bytes": _img_bytes(BASE, (3, 17)), "fmt": "png",
         "lon": lon0, "lat": lat0 + 1.0 / M_LAT},
        # 2: same site, hamming 9 > budget 8 -> survives
        {"image_id": 2, "bytes": _img_bytes(BASE, tuple(range(9))),
         "fmt": "png", "lon": lon0, "lat": lat0},
        # 3: identical pixels to 0 but 20 m away -> survives
        {"image_id": 3, "bytes": _img_bytes(BASE), "fmt": "png",
         "lon": lon0, "lat": lat0 + 20.0 / M_LAT},
        # 4: identical pixels, 4.9 m away -> loses to 0
        {"image_id": 4, "bytes": _img_bytes(BASE), "fmt": "png",
         "lon": lon0, "lat": lat0 + 4.9 / M_LAT},
        # 5: undecodable blob at site A -> passes through untouched
        {"image_id": 5, "bytes": b"not an image", "fmt": "png",
         "lon": lon0, "lat": lat0},
    ]


def test_geo_visual_min_winner(spark):
    df = spark.createDataFrame(pd.DataFrame(_rows()))
    out = geo_visual_dedup(df, radius_m=5.0, max_hamming=8)
    assert sorted(r["image_id"] for r in out.collect()) == [0, 2, 3, 5]


def test_geo_visual_boundary_hamming_inclusive(spark):
    """hamming == budget still loses (<=, not <)."""
    rows = [r for r in _rows() if r["image_id"] in (0,)]
    rows.append({"image_id": 9, "bytes": _img_bytes(BASE, tuple(range(8))),
                 "fmt": "png", "lon": rows[0]["lon"], "lat": rows[0]["lat"]})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = geo_visual_dedup(df, radius_m=5.0, max_hamming=8)
    assert sorted(r["image_id"] for r in out.collect()) == [0]


def test_decode_phash_points_drops_undecodable(spark):
    df = spark.createDataFrame(pd.DataFrame(_rows()))
    keyed = decode_phash_points(df)
    ids = sorted(r["image_id"] for r in keyed.collect())
    assert ids == [0, 1, 2, 3, 4]  # 5 is undecodable


def test_geo_visual_survivors_keep_full_width(spark):
    df = spark.createDataFrame(pd.DataFrame(_rows()))
    out = geo_visual_dedup(df, radius_m=5.0, max_hamming=8)
    assert set(out.columns) == set(df.columns)


def test_geo_visual_releases_cache(spark):
    """The dedup-tier cache-lifetime rule: after the call, at most the
    checkpointed narrow loser ids remain as persisted blocks."""
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    df = spark.createDataFrame(pd.DataFrame(_rows()))
    geo_visual_dedup(df, radius_m=5.0, max_hamming=8).count()
    after = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert after - before <= 1


# -- property-based parity vs a pure-python reference ---------------------

from hypothesis import given, settings
from hypothesis import strategies as st

from tdei_backend_service_spark.operators.geo_visual import geo_visual_losers

# hashes biased around two base values so hamming-<=budget collisions
# actually occur; coords on a 0.5 m grid within ~25 m
_BASES = (0x0123456789ABCDEF, 0x7EDCBA9876543210)
def _fold64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


_hash = st.tuples(st.sampled_from(_BASES),
                  st.sets(st.integers(0, 63), max_size=6)).map(
    lambda t: _fold64(t[0] ^ sum(1 << b for b in t[1])))
_rec = st.tuples(st.integers(0, 50), st.integers(0, 50), _hash)
_batch = st.lists(st.tuples(st.integers(0, 10_000), _rec),
                  min_size=1, max_size=22, unique_by=lambda t: t[0])


def _ll(xhm: int, yhm: int) -> tuple:
    return (xhm / 2.0 / cells.M_PER_DEG_LON_EQ,
            yhm / 2.0 / cells.M_PER_DEG_LAT)


def _dist_m(a: tuple, b: tuple) -> float:
    # EXACTLY the operator's formula (same op order, float64 throughout)
    return (((a[0] - b[0]) * cells.M_PER_DEG_LON_EQ) ** 2
            + ((a[1] - b[1]) * cells.M_PER_DEG_LAT) ** 2) ** 0.5


@settings(max_examples=6, deadline=None)
@given(_batch)
def test_geo_visual_losers_match_bruteforce(spark, rows):
    """Randomized parity with the O(n^2) definition: id loses iff a
    smaller id sits within 5 m with hamming(phash) <= 3 — the padded
    cover and the bit_count verify must surface every true pair."""
    recs = [(pk, *_ll(x, y), ph) for pk, (x, y, ph) in rows]
    keyed = spark.createDataFrame(
        pd.DataFrame(recs, columns=["image_id", "lon", "lat", "phash"]),
        schema="image_id long, lon double, lat double, phash long")
    got = sorted(r.image_id for r in
                 geo_visual_losers(keyed, radius_m=5.0, max_hamming=3,
                                   pk="image_id").collect())
    pts = {pk: (_ll(x, y), ph) for pk, (x, y, ph) in rows}
    want = sorted(
        pk for pk, (p, ph) in pts.items()
        if any(pk2 < pk
               and bin((ph ^ ph2) & ((1 << 64) - 1)).count("1") <= 3
               and _dist_m(p, p2) <= 5.0
               for pk2, (p2, ph2) in pts.items()))
    assert got == want


def test_incremental_geo_visual_admission(spark):
    """Drop admission vs a committed narrow corpus: a batch record
    loses to ANY corpus match within radius+hamming (no id rule), a
    batch-internal dup falls to min-winner, and far / visually-distant
    records survive."""
    from tdei_backend_service_spark.operators.geo_visual import \
        incremental_geo_visual
    lon0, lat0 = -122.30, 47.61
    corpus = spark.createDataFrame(pd.DataFrame([
        {"phash": BASE, "lon": lon0, "lat": lat0},
    ]), schema="phash long, lon double, lat double")
    batch = spark.createDataFrame(pd.DataFrame([
        # 0: matches the corpus (hamming 2, 1 m away) -> rejected
        {"image_id": 0, "bytes": _img_bytes(BASE, (5, 9)), "fmt": "png",
         "lon": lon0, "lat": lat0 + 1.0 / M_LAT},
        # 1: same pixels as corpus but 30 m away -> admitted
        {"image_id": 1, "bytes": _img_bytes(BASE), "fmt": "png",
         "lon": lon0, "lat": lat0 + 30.0 / M_LAT},
        # 2: co-located with corpus, hamming 12 > 8 -> admitted
        {"image_id": 2, "bytes": _img_bytes(BASE, tuple(range(12))),
         "fmt": "png", "lon": lon0, "lat": lat0},
        # 3: batch-internal dup of 1 (same spot, hamming 1) -> rejected
        {"image_id": 3, "bytes": _img_bytes(BASE, (40,)), "fmt": "png",
         "lon": lon0, "lat": lat0 + 30.0 / M_LAT},
    ]))
    out = incremental_geo_visual(batch, corpus, radius_m=5.0,
                                 max_hamming=8)
    assert sorted(r["image_id"] for r in out.collect()) == [1, 2]


def test_viewport_similar_ranks_by_recomputed_hamming(spark):
    from tdei_backend_service_spark.operators.geo_visual import \
        viewport_similar
    lon0, lat0 = -122.30, 47.61
    rows = []
    # inside the viewport: hamming i to BASE (flip the i lowest bits)
    for i in range(6):
        rows.append({"image_id": 10 + i,
                     "bytes": _img_bytes(BASE, tuple(range(i))),
                     "fmt": "png", "lon": lon0 + i * 1e-4, "lat": lat0})
    # a perfect match OUTSIDE the viewport must never appear
    rows.append({"image_id": 99, "bytes": _img_bytes(BASE), "fmt": "png",
                 "lon": lon0 + 1.0, "lat": lat0})
    # an undecodable blob inside the viewport is dropped, not ranked
    rows.append({"image_id": 98, "bytes": b"junk", "fmt": "png",
                 "lon": lon0, "lat": lat0})
    df = spark.createDataFrame(pd.DataFrame(rows))
    bbox = (lon0 - 0.01, lat0 - 0.01, lon0 + 0.01, lat0 + 0.01)
    got = [(r["image_id"], r["hamming"])
           for r in viewport_similar(df, BASE, bbox, k=4).collect()]
    assert got == [(10, 0), (11, 1), (12, 2), (13, 3)]


def test_viewport_similar_tie_breaks_on_id(spark):
    from tdei_backend_service_spark.operators.geo_visual import \
        viewport_similar
    lon0, lat0 = -122.30, 47.61
    rows = [{"image_id": i, "bytes": _img_bytes(BASE), "fmt": "png",
             "lon": lon0, "lat": lat0} for i in (7, 3, 5)]
    df = spark.createDataFrame(pd.DataFrame(rows))
    bbox = (lon0 - 0.01, lat0 - 0.01, lon0 + 0.01, lat0 + 0.01)
    got = [r["image_id"]
           for r in viewport_similar(df, BASE, bbox, k=2).collect()]
    assert got == [3, 5]


def test_brightness_pixels_integer_mean(spark):
    from tdei_backend_service_spark.operators.geo_visual import (
        brightness_pixels, brightness_raster)
    from tdei_backend_service_spark.operators.raster import decode_tile_stats
    z, px = 11, 16
    nt = 1 << (z + 4)

    def grid(lon, lat):
        import math
        gx = math.floor((lon + 180.0) / 360.0 * nt)
        gy = math.floor((1.0 - math.log(math.tan(math.radians(lat))
                         + 1.0 / math.cos(math.radians(lat)))
                         / math.pi) / 2.0 * nt)
        return gx, gy

    flat = lambda v, s=8: encode_image(
        np.full((s, s), v, dtype=np.uint8), "png")
    lon0, lat0 = -122.30, 47.61
    rows = [
        # two images share one pixel: mean = (64*200+64*40)//128 = 120
        {"image_id": 0, "bytes": flat(200), "fmt": "png",
         "lon": lon0, "lat": lat0},
        {"image_id": 1, "bytes": flat(40), "fmt": "png",
         "lon": lon0, "lat": lat0},
        # lone image in a far pixel, different dims: mean 7
        {"image_id": 2, "bytes": flat(7, 16), "fmt": "png",
         "lon": lon0 + 1.0, "lat": lat0},
        # undecodable blob: dropped, not zero-filled
        {"image_id": 3, "bytes": b"junk", "fmt": "png",
         "lon": lon0 + 2.0, "lat": lat0},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    pix = {(r["gx"], r["gy"]): r for r in
           brightness_pixels(df, z, px).collect()}
    assert len(pix) == 2
    a = pix[grid(lon0, lat0)]
    assert a["n"] == 120
    assert (a["tile_x"], a["tile_y"]) == (a["gx"] // px, a["gy"] // px)
    assert (a["px_x"], a["px_y"]) == (a["gx"] % px, a["gy"] % px)
    assert pix[grid(lon0 + 1.0, lat0)]["n"] == 7
    # the full render path agrees with the pixel relation
    stats = {(r["tile_x"], r["tile_y"]): r for r in
             decode_tile_stats(brightness_raster(df, z, px)).collect()}
    gxa, gya = grid(lon0, lat0)
    st = stats[(gxa // px, gya // px)]
    assert (st["nonzero_px"], st["max_px"]) == (1, 120)


def test_tile_gallery_min_id_thumbnail(spark):
    from tdei_backend_service_spark.operators.geo_visual import tile_gallery
    from tdei_backend_service_spark.codecs.image import decode_image
    z = 15
    n = 1 << z
    tile_lon = lambda i: (i + 0.5) * 360.0 / n - 180.0
    rows = [
        # tile A: ids 7 and 3 -> 3 wins (min id), 16x16 source of 9s
        {"image_id": 7, "bytes": encode_image(
            np.full((8, 8), 5, dtype=np.uint8), "png"), "fmt": "png",
         "lon": tile_lon(1000), "lat": 47.0},
        {"image_id": 3, "bytes": encode_image(
            np.full((16, 16), 9, dtype=np.uint8), "png"), "fmt": "png",
         "lon": tile_lon(1000), "lat": 47.0},
        # tile B: lone non-square image; nearest-neighbor must handle
        # w != h (24 x 8 source of 11s)
        {"image_id": 12, "bytes": encode_image(
            np.full((24, 8), 11, dtype=np.uint8), "png"), "fmt": "png",
         "lon": tile_lon(2000), "lat": 47.0},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    g = tile_gallery(df, z, 16)
    # blobs must reach the winner join without shuffling: the tiny rep
    # relation is broadcast
    assert "BroadcastHashJoin" in \
        g._jdf.queryExecution().executedPlan().toString()
    out = {r["image_id"]: r for r in g.collect()}
    assert set(out) == {3, 12}
    a = out[3]
    assert (a["w"], a["h"]) == (16, 16)
    img = decode_image(bytes(a["bytes"]), a["fmt"])
    assert img.shape[:2] == (16, 16) and int(img.max()) == 9
    b = decode_image(bytes(out[12]["bytes"]), out[12]["fmt"])
    assert b.shape[:2] == (16, 16) and int(b.min()) == 11


def test_gallery_pyramid_winner_nesting(spark):
    from tdei_backend_service_spark.operators.geo_visual import (
        gallery_pyramid)
    from tdei_backend_service_spark.codecs.image import decode_image
    z = 15
    n = 1 << z
    # four points in the four z15 children of one z14 tile
    tl = lambda i: (i + 0.5) * 360.0 / n - 180.0
    # latitudes of two vertically adjacent z15 rows near 47N
    import math
    def lat_of_row(gy):
        yy = math.pi * (1.0 - 2.0 * (gy + 0.5) / n)
        return math.degrees(math.atan(math.sinh(yy)))
    gy0 = 11000  # even -> rows 11000/11001 share the z14 parent
    gx0 = 2000   # even -> cols 2000/2001 share the z14 parent
    rows = []
    for k, (dx, dy) in enumerate(((0, 0), (1, 0), (0, 1), (1, 1))):
        rows.append({"image_id": 5 + k,
                     "bytes": encode_image(np.full((8, 8), 50 + k,
                                           dtype=np.uint8), "png"),
                     "fmt": "png",
                     "lon": tl(gx0 + dx), "lat": lat_of_row(gy0 + dy)})
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = gallery_pyramid(df, z, z - 2, 16).collect()
    by_level = {}
    for r in out:
        by_level.setdefault(r["z"], []).append(r)
    assert sorted(len(v) for v in by_level.values()) == [1, 1, 4]
    # parent winner = min of child winners, at both coarse levels
    assert by_level[14][0]["image_id"] == 5
    assert by_level[13][0]["image_id"] == 5
    assert (by_level[14][0]["tile_x"], by_level[14][0]["tile_y"]) \
        == (gx0 // 2, gy0 // 2)
    # the shared winner's thumbnail bytes are identical at every zoom
    # (one decode fans out) and decode to image 5's constant value
    b14, b13 = bytes(by_level[14][0]["bytes"]), bytes(by_level[13][0]["bytes"])
    b15 = bytes(next(r for r in by_level[15]
                     if r["image_id"] == 5)["bytes"])
    assert b14 == b13 == b15
    assert int(decode_image(b14, "png").max()) == 50


def test_incremental_gallery_equals_rebuild(spark):
    from tdei_backend_service_spark.operators.geo_visual import (
        incremental_gallery, tile_gallery)
    z = 15
    n = 1 << z
    tl = lambda i: (i + 0.5) * 360.0 / n - 180.0
    blob = lambda v: encode_image(np.full((8, 8), v, dtype=np.uint8), "png")
    mk = lambda rows: spark.createDataFrame(pd.DataFrame(
        [{"image_id": i, "bytes": blob(40 + i), "fmt": "png",
          "lon": tl(c), "lat": 47.0} for i, c in rows]))
    # committed corpus: tile A winner 10, tile B winner 20
    corpus = mk([(10, 500), (14, 500), (20, 700)])
    committed = tile_gallery(corpus, z, 16)
    # drop: loses tile A (id 12 > 10), WINS tile B (id 4 < 20),
    # opens tile C (id 30)
    drop = mk([(12, 500), (4, 700), (30, 900)])
    merged = {(r["tile_x"], r["tile_y"]): (r["image_id"], bytes(r["bytes"]))
              for r in incremental_gallery(drop, committed, z, 16)
              .collect()}
    # must equal the full rebuild over the union, byte for byte
    full = {(r["tile_x"], r["tile_y"]): (r["image_id"], bytes(r["bytes"]))
            for r in tile_gallery(
                mk([(10, 500), (14, 500), (20, 700),
                    (12, 500), (4, 700), (30, 900)]), z, 16).collect()}
    assert merged == full
    assert sorted(i for i, _ in merged.values()) == [4, 10, 30]
    # the lost tile kept the COMMITTED bytes verbatim
    cA = {(r["tile_x"], r["tile_y"]): bytes(r["bytes"])
          for r in committed.collect() if r["image_id"] == 10}
    (kA, bA), = cA.items()
    assert merged[kA][1] == bA


def test_incremental_brightness_monoid_merge(spark):
    from tdei_backend_service_spark.operators.geo_visual import (
        brightness_pixel_sums, brightness_raster,
        incremental_brightness_tiles, pixels_from_sums)
    from tdei_backend_service_spark.operators.raster import encode_tiles
    z, px = 11, 16
    nt = 1 << (z + 4)
    tl = lambda i: (i + 0.5) * 360.0 / nt - 180.0
    blob = lambda v: encode_image(np.full((8, 8), v, dtype=np.uint8), "png")
    mk = lambda rows: spark.createDataFrame(pd.DataFrame(
        [{"image_id": i, "bytes": blob(v), "fmt": "png",
          "lon": tl(c), "lat": 47.0} for i, v, c in rows]))
    committed_imgs = mk([(0, 10, 5000), (1, 80, 9000)])
    csums = brightness_pixel_sums(committed_imgs, z, px)
    ctiles = encode_tiles(pixels_from_sums(csums), px)
    # drop: 3 bright images land in pixel 5000 + one opens pixel 12000
    drop = mk([(2, 50, 5000), (3, 50, 5000), (4, 50, 5000),
               (5, 7, 12000)])
    merged = incremental_brightness_tiles(csums, ctiles, drop, z, px)
    got = {(r["tile_x"], r["tile_y"]): bytes(r["bytes"])
           for r in merged.collect()}
    # bit-identical to the full re-render over the union
    full = {(r["tile_x"], r["tile_y"]): bytes(r["bytes"])
            for r in brightness_raster(
                mk([(0, 10, 5000), (1, 80, 9000), (2, 50, 5000),
                    (3, 50, 5000), (4, 50, 5000), (5, 7, 12000)]),
                z, px).collect()}
    assert got == full
    # the shared pixel's value is the mean over SUMS (10+3*50)/4 = 40,
    # not the mean of means (30) — the monoid point
    from tdei_backend_service_spark.codecs.image import decode_image
    ty = next(iter(got))[1]  # all points share lat 47.0 -> one tile row
    img = decode_image(got[(5000 // px, ty)], "png")
    assert 40 in set(int(x) for x in img.ravel())
    # untouched tile (pixel 9000) kept its committed bytes verbatim
    cmap = {(r["tile_x"], r["tile_y"]): bytes(r["bytes"])
            for r in ctiles.collect()}
    assert got[(9000 // px, ty)] == cmap[(9000 // px, ty)]


def test_viewport_similar_caption_token_prefilters(spark):
    from tdei_backend_service_spark.operators.geo_visual import (
        viewport_similar)
    lon0, lat0 = -122.30, 47.61
    rows = [
        {"image_id": 0, "bytes": _img_bytes(BASE), "fmt": "png",
         "lon": lon0, "lat": lat0, "caption": "Curb RAMP east"},
        # better visual match but caption misses the token -> excluded
        {"image_id": 1, "bytes": _img_bytes(BASE), "fmt": "png",
         "lon": lon0, "lat": lat0, "caption": "crosswalk"},
        # caption matches (case-insensitive) but outside bbox
        {"image_id": 2, "bytes": _img_bytes(BASE), "fmt": "png",
         "lon": lon0 + 5.0, "lat": lat0, "caption": "ramp west"},
        # matches token, worse visually -> ranked after 0
        {"image_id": 3, "bytes": _img_bytes(BASE, (1, 2, 3)), "fmt": "png",
         "lon": lon0, "lat": lat0, "caption": "steep ramp"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    bbox = (lon0 - 0.01, lat0 - 0.01, lon0 + 0.01, lat0 + 0.01)
    got = [(r["image_id"], r["hamming"]) for r in
           viewport_similar(df, BASE, bbox, k=10,
                            caption_token="Ramp").collect()]
    assert got == [(0, 0), (3, 3)]
