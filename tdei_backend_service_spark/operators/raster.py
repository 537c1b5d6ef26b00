"""Vector -> raster tile rendering: density rasters, pyramids, mosaics.

The geospatial x image composition the graft's tier is named for: point
corpora are aggregated into per-tile pixel-count lattices (pure
Catalyst, ONE exchange over the whole corpus), rendered into real PNG
tiles by the in-repo codec, and rolled up two ways —

* count-space pyramid (``pyramid_pixel_counts``): integer-halving of
  global pixel coordinates, exactly the tile_pyramid rollup at pixel
  resolution — every level is bit-identical to re-aggregating the
  corpus at the coarser zoom because floor nests;
* image-space mosaic (``mosaic_tiles``): decode 2x2 child PNG tiles,
  stitch, and 2x2-block integer downsample (sum DIV 4) — the real
  overview-generation path a map server runs over already-rendered
  tiles, without touching the point corpus again.

The reference has no raster output (its exports are GeoJSON/OSM XML —
osw-query-service.ts / osm-query-service.ts); tiles are this engine's
image-payload output layout, so the render tier is built Spark-first:

* pixel assignment is the web-mercator tile formula at zoom
  ``z + log2(px)`` — a tile's pixel (i, j) IS the (z+log2(px)) tile
  whose coords are (tile_x*px + i, tile_y*px + j), so the whole lattice
  is one ``cells.tile_expr`` projection in whole-stage codegen;
* the only data that ever reaches Python is the NONZERO pixel-count
  relation (at most px*px narrow int rows per occupied tile, bounded by
  min(corpus rows, 4^(z+log2(px))) overall) — bytes are produced, never
  consumed, by the shuffle;
* per-tile rendering is ``applyInPandas`` grouped on the tile key: at
  1000 executors every tile renders independently, and a hot tile is
  still at most px*px rows.

Pixel values clip at 255 (uint8 gray) with LEAST semantics shared by
the SQL oracle; pyramid levels sum RAW counts and clip only at encode,
so coarser zooms don't inherit saturation error.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, functions as F, types as T

from ..core import cells
from ..codecs.image import decode_image, encode_image

TILE_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType()),
    T.StructField("tile_x", T.IntegerType()),
    T.StructField("tile_y", T.IntegerType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("n_points", T.LongType()),
])

TILE_STATS_SCHEMA = T.StructType([
    T.StructField("z", T.IntegerType()),
    T.StructField("tile_x", T.IntegerType()),
    T.StructField("tile_y", T.IntegerType()),
    T.StructField("nonzero_px", T.LongType()),
    T.StructField("sum_px", T.LongType()),
    T.StructField("max_px", T.LongType()),
])


def _log2_px(px: int) -> int:
    p = int(px).bit_length() - 1
    if px <= 0 or (1 << p) != px or p > 8:
        raise ValueError("px must be a power of two in [1, 256]")
    return p


def pixel_counts(df: DataFrame, z: int, px: int, lon_col: str = "lon",
                 lat_col: str = "lat") -> DataFrame:
    """Nonzero pixel counts of the ``px x px`` raster of every occupied
    zoom-``z`` tile: (z, tile_x, tile_y, gx, gy, px_x, px_y, n).

    (gx, gy) are GLOBAL pixel coords — the tile coords at zoom
    ``z + log2(px)`` — kept so pyramid levels can integer-halve them;
    (px_x, px_y) = (gx % px, gy % px) index within the tile. One
    corpus-wide exchange (map-side partial combine), all JVM."""
    p = _log2_px(px)
    gx, gy, _ = cells.tile_expr(F.col(lon_col), F.col(lat_col), z + p)
    return (df.select(gx.cast("long").alias("gx"), gy.cast("long").alias("gy"))
            .groupBy("gx", "gy")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(z).cast("int").alias("z"),
                    (F.col("gx") / px).cast("int").alias("tile_x"),
                    (F.col("gy") / px).cast("int").alias("tile_y"),
                    "gx", "gy",
                    (F.col("gx") % px).cast("int").alias("px_x"),
                    (F.col("gy") % px).cast("int").alias("px_y"),
                    F.col("n").cast("long").alias("n")))


def pyramid_pixel_counts(base: DataFrame, z_base: int, z_min: int,
                         px: int) -> DataFrame:
    """Pixel-count pyramid over ``pixel_counts`` output: every zoom in
    ``[z_min, z_base]``. Level z-1's global pixel (gx DIV 2, gy DIV 2)
    sums level z's RAW counts — floor nesting makes each level equal to
    re-running pixel_counts at that zoom, while each rollup shuffles
    only the previous level's nonzero-pixel relation (at most
    4^(z+log2(px)) rows), never the corpus."""
    if z_min > z_base:
        raise ValueError("z_min must be <= z_base")
    levels = [base]
    cur = base.select("gx", "gy", "n")
    for z in range(z_base - 1, z_min - 1, -1):
        cur = (cur.groupBy((F.col("gx") / 2).cast("long").alias("gx"),
                           (F.col("gy") / 2).cast("long").alias("gy"))
               .agg(F.sum("n").alias("n")))
        levels.append(cur.select(
            F.lit(z).cast("int").alias("z"),
            (F.col("gx") / px).cast("int").alias("tile_x"),
            (F.col("gy") / px).cast("int").alias("tile_y"),
            "gx", "gy",
            (F.col("gx") % px).cast("int").alias("px_x"),
            (F.col("gy") % px).cast("int").alias("px_y"),
            F.col("n").cast("long").alias("n")))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def encode_tiles(pix: DataFrame, px: int, fmt: str = "png") -> DataFrame:
    """Render one ``px x px`` grayscale image tile per (z, tile_x,
    tile_y) group of a pixel-count relation: value = min(n, 255),
    absent pixels 0. Input rows are narrow ints (bytes are CREATED
    here, after the shuffle); a group is at most px*px rows."""
    _log2_px(px)

    def render(key, pdf):
        img = np.zeros((px, px), dtype=np.uint8)
        img[pdf["px_y"].to_numpy(np.int64),
            pdf["px_x"].to_numpy(np.int64)] = np.minimum(
                pdf["n"].to_numpy(np.int64), 255).astype(np.uint8)
        return pd.DataFrame({
            "z": pd.array([key[0]], dtype="int32"),
            "tile_x": pd.array([key[1]], dtype="int32"),
            "tile_y": pd.array([key[2]], dtype="int32"),
            "w": pd.array([px], dtype="int32"),
            "h": pd.array([px], dtype="int32"),
            "fmt": [fmt],
            "bytes": [encode_image(img, fmt)],
            "n_points": pd.array([int(pdf["n"].sum())], dtype="int64"),
        })

    return (pix.select("z", "tile_x", "tile_y", "px_x", "px_y", "n")
            .groupBy("z", "tile_x", "tile_y")
            .applyInPandas(render, schema=TILE_SCHEMA))


def rasterize(df: DataFrame, z: int, px: int, lon_col: str = "lon",
              lat_col: str = "lat", fmt: str = "png") -> DataFrame:
    """points -> rendered PNG density tiles at zoom ``z`` (the full
    render path: one corpus exchange + per-tile encode)."""
    return encode_tiles(pixel_counts(df, z, px, lon_col, lat_col), px, fmt)


def mosaic_tiles(tiles: DataFrame, px: int) -> DataFrame:
    """Image-space overview build: decode each parent's <=4 child PNG
    tiles, stitch them into a 2px x 2px canvas, and downsample by
    2x2-block integer mean (sum DIV 4 — exact, max 4*255 DIV 4 = 255
    fits uint8). Groups are keyed by (z-1, tile_x DIV 2, tile_y DIV 2);
    only already-rendered tile rows shuffle, never the corpus. Missing
    children are zero canvas — identical to empty-tile semantics."""
    _log2_px(px)

    def stitch(key, pdf):
        canvas = np.zeros((2 * px, 2 * px), dtype=np.int64)
        n_points = 0
        for i in range(len(pdf)):
            child = decode_image(bytes(pdf["bytes"].iloc[i]),
                                 pdf["fmt"].iloc[i])
            if child.ndim == 3:  # gray encoded as RGB: take one channel
                child = child[:, :, 0]
            oy = (int(pdf["tile_y"].iloc[i]) % 2) * px
            ox = (int(pdf["tile_x"].iloc[i]) % 2) * px
            canvas[oy:oy + px, ox:ox + px] = child
            n_points += int(pdf["n_points"].iloc[i])
        pooled = (canvas.reshape(px, 2, px, 2).sum(axis=(1, 3)) // 4
                  ).astype(np.uint8)
        return pd.DataFrame({
            "z": pd.array([key[0]], dtype="int32"),
            "tile_x": pd.array([key[1]], dtype="int32"),
            "tile_y": pd.array([key[2]], dtype="int32"),
            "w": pd.array([px], dtype="int32"),
            "h": pd.array([px], dtype="int32"),
            "fmt": [str(pdf["fmt"].iloc[0])],
            "bytes": [encode_image(pooled, str(pdf["fmt"].iloc[0]))],
            "n_points": pd.array([n_points], dtype="int64"),
        })

    return (tiles.groupBy((F.col("z") - 1).cast("int").alias("z"),
                          (F.col("tile_x") / 2).cast("int").alias("tile_x"),
                          (F.col("tile_y") / 2).cast("int").alias("tile_y"))
            .applyInPandas(stitch, schema=TILE_SCHEMA))


def _tile_cols(pix: DataFrame, px: int) -> DataFrame:
    """Re-derive (tile_x, tile_y, px_x, px_y) from global pixel coords —
    the canonical pixel-relation shape every raster operator emits."""
    return pix.select(
        F.col("z").cast("int").alias("z"),
        (F.col("gx") / px).cast("int").alias("tile_x"),
        (F.col("gy") / px).cast("int").alias("tile_y"),
        "gx", "gy",
        (F.col("gx") % px).cast("int").alias("px_x"),
        (F.col("gy") % px).cast("int").alias("px_y"),
        F.col("n").cast("long").alias("n"))


def merge_pixel_counts(committed: DataFrame, dpix: DataFrame,
                       px: int) -> DataFrame:
    """Monoid-sum two pixel-count relations (state maintenance for a
    live raster layer — the pixel-resolution analogue of
    tiling.incremental_tile_counts). Counts are commutative, so the
    merge equals a recompute over corpus+drop without rescanning the
    corpus; the shuffle is bounded by the nonzero-pixel relation, never
    corpus rows."""
    cols = ["gx", "gy", "n"]
    merged = (committed.select("z", *cols).unionByName(dpix.select("z", *cols))
              .groupBy("z", "gx", "gy").agg(F.sum("n").alias("n")))
    return _tile_cols(merged, px)


def focal_sum(pix: DataFrame, px: int, radius: int = 1) -> DataFrame:
    """(2r+1) x (2r+1) moving-window (focal/box) sum over the GLOBAL
    pixel lattice — the kernel-density smoothing pass a heat-map layer
    runs before rendering. The box kernel is separable, so this is two
    rank-1 passes: each explodes the nonzero relation by only (2r+1)
    shifted copies and partially aggregates before its exchange —
    O((2r+1) * nnz) shuffled rows per pass instead of the naive
    O((2r+1)^2 * nnz) single pass, and never the corpus. Windows span
    tile borders for free because the lattice is global (pixel (i, j)
    of a tile IS a zoom-(z+log2(px)) tile); output pixels that spill
    into previously-empty tiles simply materialize those tiles.
    All JVM: explode over a literal offset array + two hash aggregates.
    """
    if radius < 0:
        raise ValueError("radius must be >= 0")
    offs = F.array(*[F.lit(d) for d in range(-radius, radius + 1)])
    cur = pix.select("z", "gx", "gy", "n")
    for axis in ("gx", "gy"):
        other = "gy" if axis == "gx" else "gx"
        cur = (cur.select("z", other, axis, "n",
                          F.explode(offs).alias("_d"))
               .select("z", other, (F.col(axis) + F.col("_d")).alias(axis),
                       "n")
               .groupBy("z", "gx", "gy").agg(F.sum("n").alias("n")))
    return _tile_cols(cur, px)


_COMBINE_OPS = {
    "add": lambda a, b: a + b,
    "absdiff": lambda a, b: F.abs(a - b),
    "max": lambda a, b: F.greatest(a, b),
    "min": lambda a, b: F.least(a, b),
}


def combine_pixel_counts(a: DataFrame, b: DataFrame, px: int,
                         op: str = "add") -> DataFrame:
    """Raster algebra: pixel-wise combine of two layers of the same
    lattice (change detection via ``absdiff``, compositing via ``add``
    / ``max``, intersection via ``min``). One full-outer sort-merge
    join on the (z, gx, gy) key over the two NONZERO relations —
    missing pixels count 0, and result-0 pixels drop so the output
    stays a nonzero pixel relation (empty tiles never materialize).
    At 10^12 points per layer the join still only moves each layer's
    occupied-pixel rows, bounded by min(corpus, 4^(z+log2(px)))."""
    if op not in _COMBINE_OPS:
        raise ValueError(f"op must be one of {sorted(_COMBINE_OPS)}")
    key = ["z", "gx", "gy"]
    ja = a.select(*key, F.col("n").alias("_na"))
    jb = b.select(*key, F.col("n").alias("_nb"))
    combined = (ja.join(jb, key, "full_outer")
                .select(*key,
                        _COMBINE_OPS[op](
                            F.coalesce(F.col("_na"), F.lit(0).cast("long")),
                            F.coalesce(F.col("_nb"), F.lit(0).cast("long")),
                        ).alias("n"))
                .filter(F.col("n") > 0))
    return _tile_cols(combined, px)


def rasterize_zones(zones: DataFrame, z: int, px: int,
                    weight=None) -> DataFrame:
    """Burn axis-aligned zone rectangles (GLOBAL pixel bounds,
    inclusive: zone_id, gx0, gy0, gx1, gy1) into the pixel lattice —
    the areal-feature side of vector->raster (points go through
    ``pixel_counts``). Each zone explodes to exactly the pixels it
    covers via two ``F.sequence`` explodes (pure Catalyst; work is
    proportional to the burned AREA, distributed across however many
    partitions hold the zone rows), and overlapping zones sum their
    weights — the same count monoid the rest of the tier uses, so the
    result composes with ``combine_pixel_counts`` / ``encode_tiles`` /
    pyramids unchanged. ``weight`` is a Column (default 1 per zone)."""
    w = F.lit(1) if weight is None else weight
    burn = (zones.select("gx0", "gy0", "gx1", "gy1",
                         w.cast("long").alias("_w"))
            .select("gy0", "gy1", "_w",
                    F.explode(F.sequence("gx0", "gx1")).alias("gx"))
            .select("gx", "_w",
                    F.explode(F.sequence("gy0", "gy1")).alias("gy"))
            .groupBy("gx", "gy").agg(F.sum("_w").alias("n"))
            .select(F.lit(z).cast("int").alias("z"), "gx", "gy", "n"))
    return _tile_cols(burn, px)


def segment_pixels(segs: DataFrame, z: int, px: int, *,
                   seg_col: str = "seg_id",
                   lon0_col: str = "lon0", lat0_col: str = "lat0",
                   lon1_col: str = "lon1", lat1_col: str = "lat1"
                   ) -> DataFrame:
    """Burn line segments into the pixel lattice — the LINE side of
    vector->raster (points: ``pixel_counts``; axis-aligned areas:
    ``rasterize_zones``). Pixel value n = how many DISTINCT segments
    touch the pixel, so a route corpus (operators/trajectory.
    trip_segments) renders as a route-density layer that composes with
    ``encode_tiles`` / pyramids / ``combine_pixel_counts`` unchanged.

    Rasterization is DDA sampling in CONTINUOUS pixel space: both
    endpoints project through ``cells.tile_float_expr`` (the tile
    formula WITHOUT the floor — quantizing endpoints first would snap
    the segment to pixel centers), the segment lerps over
    K = max(1, ceil(chebyshev pixel length)) equal steps (step <= 1
    pixel per axis, so consecutive samples land on the same or an
    8-adjacent pixel; corner-clipped pixels the ideal supercover
    includes may be skipped — sampling semantics, documented), and the
    floor happens ONCE per sample. Every op (lerp, floor, distinct,
    count) is engine-exact IEEE/integer, so the layer carries a full
    SQL oracle (generate_series + unnest mirrors F.sequence+explode).

    Scale: pure Catalyst — explode is map-side (work proportional to
    total burned length, spread over the segment rows' partitions),
    then a (seg, pixel) distinct and the pixel aggregate, both
    partially aggregated before their exchange; only narrow int rows
    shuffle, bounded by total path length in pixels. An ultra-long
    segment (K ~ 10^6) stays in one input partition — pre-split such
    segments upstream (trip steps are ping-to-ping, naturally short).
    """
    p = _log2_px(px)
    fx0, fy0 = cells.tile_float_expr(F.col(lon0_col), F.col(lat0_col), z + p)
    fx1, fy1 = cells.tile_float_expr(F.col(lon1_col), F.col(lat1_col), z + p)
    b = (segs.select(F.col(seg_col).alias("_sid"),
                     fx0.alias("_fx0"), fy0.alias("_fy0"),
                     fx1.alias("_fx1"), fy1.alias("_fy1"))
         # NB: Spark resolves column names case-insensitively, so the
         # step counter and step index need distinct spellings
         .withColumn("_nstep", F.greatest(
             F.lit(1).cast("long"),
             F.ceil(F.greatest(F.abs(F.col("_fx1") - F.col("_fx0")),
                               F.abs(F.col("_fy1") - F.col("_fy0"))))
             .cast("long")))
         .withColumn("_i", F.explode(
             F.sequence(F.lit(0).cast("long"), F.col("_nstep")))))
    t = F.col("_i").cast("double") / F.col("_nstep").cast("double")
    gx = F.floor(F.col("_fx0") + (F.col("_fx1") - F.col("_fx0")) * t)
    gy = F.floor(F.col("_fy0") + (F.col("_fy1") - F.col("_fy0")) * t)
    cov = (b.select("_sid", gx.cast("long").alias("gx"),
                    gy.cast("long").alias("gy"))
           .distinct()
           .groupBy("gx", "gy").agg(F.count(F.lit(1)).alias("n"))
           .select(F.lit(int(z)).cast("int").alias("z"), "gx", "gy", "n"))
    return _tile_cols(cov, px)


def zonal_stats(pix: DataFrame, zones: DataFrame, px: int,
                value_col: str = "v") -> DataFrame:
    """Zonal statistics over a pixel-value relation: per-zone pixel
    count / sum / max for axis-aligned zones given in GLOBAL pixel
    coordinates (zone_id, gx0, gy0, gx1, gy1; bounds inclusive).

    Scales like the engine's cell joins, not like a nested-loop range
    join: each zone explodes into the bounded set of ``px x px`` tiles
    its rectangle covers (``F.sequence`` — pure Catalyst), the pixel
    relation equi-joins that cover on the tile key, and the exact
    range test refines inside the join. With the zone-cover broadcast
    (zones are small relative to pixels) the pixel side never
    shuffles; the only exchange is the final per-zone aggregate. Feed
    it ``raster_to_points`` output to compute zonal stats of a
    RENDERED layer — decode sits upstream, map-only."""
    cover = zones.select(
        "zone_id", "gx0", "gy0", "gx1", "gy1",
        F.explode(F.sequence((F.col("gx0") / px).cast("long"),
                             (F.col("gx1") / px).cast("long"))).alias("_tx"))
    cover = cover.select(
        "zone_id", "gx0", "gy0", "gx1", "gy1", "_tx",
        F.explode(F.sequence((F.col("gy0") / px).cast("long"),
                             (F.col("gy1") / px).cast("long"))).alias("_ty"))
    keyed = pix.select((F.col("gx") / px).cast("long").alias("_tx"),
                       (F.col("gy") / px).cast("long").alias("_ty"),
                       "gx", "gy", F.col(value_col).alias("_v"))
    joined = keyed.join(
        F.broadcast(cover),
        on=[keyed["_tx"] == cover["_tx"], keyed["_ty"] == cover["_ty"],
            F.col("gx").between(F.col("gx0"), F.col("gx1")),
            F.col("gy").between(F.col("gy0"), F.col("gy1"))])
    return (joined.groupBy("zone_id")
            .agg(F.count(F.lit(1)).alias("n_px"),
                 F.sum("_v").alias("sum_v"),
                 F.max("_v").alias("max_v")))


def hotspots(pix: DataFrame, k: int, value_col: str = "n") -> DataFrame:
    """Top-k densest lattice pixels (deterministic total order: value
    desc, then gx, gy). Catalyst turns the global sort + limit into
    TakeOrderedAndProject — per-partition heaps of k rows, no full
    sort, no single-partition shuffle. Compose with ``focal_sum`` for
    neighborhood-density hotspots rather than single-pixel spikes."""
    return (pix.select("z", "gx", "gy", F.col(value_col).alias("v"))
            .orderBy(F.desc("v"), "gx", "gy").limit(k))


def incremental_raster_tiles(committed_pix: DataFrame,
                             committed_tiles: DataFrame, drop: DataFrame,
                             z: int, px: int, lon_col: str = "lon",
                             lat_col: str = "lat",
                             fmt: str = "png") -> DataFrame:
    """Maintain a rendered tile layer when a new point drop lands:
    re-encode ONLY the tiles the drop touches. The drop aggregates to
    its pixel relation (one pass over the DROP); affected tile keys
    semi-join the committed pixel relation; merged counts re-render
    those tiles; every untouched tile keeps its committed bytes via an
    anti-join — at 10^12 committed images with a localized drop, the
    decode/encode work is proportional to the drop's tile footprint,
    not the corpus, yet the result is bit-identical to a full
    re-render (merge == recompute, oracle-pinned)."""
    dpix = pixel_counts(drop, z, px, lon_col, lat_col)
    affected = dpix.select("z", "tile_x", "tile_y").distinct()
    cpix_aff = committed_pix.join(affected, ["z", "tile_x", "tile_y"],
                                  "left_semi")
    merged_aff = merge_pixel_counts(cpix_aff, dpix, px)
    new_tiles = encode_tiles(merged_aff, px, fmt)
    untouched = committed_tiles.join(affected, ["z", "tile_x", "tile_y"],
                                     "left_anti")
    return untouched.unionByName(new_tiles)


def raster_to_points(tiles: DataFrame, min_value: int = 1) -> DataFrame:
    """The raster->vector direction: decode rendered tiles and emit one
    row per pixel at/above ``min_value`` as (z, gx, gy, v) — global
    pixel coords on the same integer lattice ``pixel_counts`` produces,
    so rasterize -> raster_to_points is an exact round trip on the
    clipped counts (and the extracted relation feeds any vector-side
    operator: cell joins, pyramids, viewport cuts). Map-only over tile
    rows; a tile emits at most px*px rows."""
    if not 0 <= min_value <= 255:
        raise ValueError("min_value must be in [0, 255]")

    def gen(batches):
        for pdf in batches:
            zs, gxs, gys, vs = [], [], [], []
            for i in range(len(pdf)):
                img = decode_image(bytes(pdf["bytes"].iloc[i]),
                                   pdf["fmt"].iloc[i])
                if img.ndim == 3:
                    img = img[:, :, 0]
                ys, xs = np.nonzero(img >= min_value)
                v = img[ys, xs].astype(np.int64)
                px = img.shape[1]
                bx = int(pdf["tile_x"].iloc[i]) * px
                by = int(pdf["tile_y"].iloc[i]) * px
                zs.append(np.full(len(xs), int(pdf["z"].iloc[i]),
                                  dtype=np.int32))
                gxs.append(bx + xs.astype(np.int64))
                gys.append(by + ys.astype(np.int64))
                vs.append(v)
            if zs:
                yield pd.DataFrame({
                    "z": np.concatenate(zs),
                    "gx": np.concatenate(gxs),
                    "gy": np.concatenate(gys),
                    "v": np.concatenate(vs),
                })

    return (tiles.select("z", "tile_x", "tile_y", "fmt", "bytes")
            .mapInPandas(gen, schema="z int, gx long, gy long, v long"))


def decode_tile_stats(tiles: DataFrame,
                      carry: tuple = ()) -> DataFrame:
    """Per-tile stats recomputed FROM THE DECODED PIXELS — nothing read
    from stored metadata, so closed-form fixtures put the full
    render -> encode -> decode path under the hash-exact SQL oracle
    (the decode_meta pattern, multimodal.py:51). Map-only. ``carry``
    columns ride through unchanged (e.g. tile_gallery's chosen
    ``image_id``, so the selection rule sits under the oracle too)."""
    carry = tuple(carry)
    carry_types = dict(tiles.dtypes)

    def gen(batches):
        for pdf in batches:
            zs, xs, ys, nz, sm, mx = [], [], [], [], [], []
            cv: dict = {c: [] for c in carry}
            for i in range(len(pdf)):
                img = decode_image(bytes(pdf["bytes"].iloc[i]),
                                   pdf["fmt"].iloc[i])
                if img.ndim == 3:
                    img = img[:, :, 0]
                v = img.astype(np.int64)
                zs.append(int(pdf["z"].iloc[i]))
                xs.append(int(pdf["tile_x"].iloc[i]))
                ys.append(int(pdf["tile_y"].iloc[i]))
                nz.append(int((v > 0).sum()))
                sm.append(int(v.sum()))
                mx.append(int(v.max()))
                for c in carry:
                    cv[c].append(pdf[c].iloc[i])
            out = pd.DataFrame({
                "z": pd.array(zs, dtype="int32"),
                "tile_x": pd.array(xs, dtype="int32"),
                "tile_y": pd.array(ys, dtype="int32"),
                "nonzero_px": pd.array(nz, dtype="int64"),
                "sum_px": pd.array(sm, dtype="int64"),
                "max_px": pd.array(mx, dtype="int64"),
            })
            for c in carry:
                out[c] = cv[c]
            yield out

    schema = TILE_STATS_SCHEMA
    if carry:
        base = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                         for f in TILE_STATS_SCHEMA.fields)
        schema = (base + ", "
                  + ", ".join(f"{c} {carry_types[c]}" for c in carry))
    return (tiles.select("z", "tile_x", "tile_y", "fmt", "bytes", *carry)
            .mapInPandas(gen, schema=schema))
