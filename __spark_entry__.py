"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (plus the training-data pipeline ops); ``oracle_sql()``
gives the DuckDB-equivalent SQL. Spatial inputs are derived from TPC-H
keys with exact integer arithmetic (tdei_backend_service_spark/
fixtures_tpch.py) so spatial answers are SQL-expressible; the Spark side
runs the REAL operators (two-phase cell join, ring-expansion kNN,
union-dedup, tiling) — the SQL uses the closed-form fixture geometry.

Float columns are either bit-identically derived in both engines
(verified: same IEEE op sequences) or avoided in favor of ints/strings.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from tdei_backend_service_spark import fixtures_tpch as FX
from tdei_backend_service_spark.operators.bbox import bbox_filter_points
from tdei_backend_service_spark.operators.pagination import dynamic_query
from tdei_backend_service_spark.operators.spatial_join import spatial_join
from tdei_backend_service_spark.operators.tag_road import (
    dataset_tag_road, knn_join)
from tdei_backend_service_spark.operators.graph import (
    hop_distance as graph_hop_distance,
    network_distance as graph_network_distance,
    pagerank as graph_pagerank,
    triangle_count as graph_triangle_count,
    kcore as graph_kcore,
    neighbor_jaccard as graph_neighbor_jaccard,
    connected_components as graph_connected_components,
    PR_SCALE as GRAPH_PR_SCALE)
from tdei_backend_service_spark.operators import temporal as TP
from tdei_backend_service_spark.operators import trajectory as TJ
from tdei_backend_service_spark.operators.tiling import assign_tiles
from tdei_backend_service_spark.operators.union_dataset import (
    incremental_union_dataset, union_dataset)
from tdei_backend_service_spark.pipeline import dedup as DD
from tdei_backend_service_spark.pipeline import similarity as SIM
from tdei_backend_service_spark.pipeline import text as TX

BBOX = (-122.33, 47.62, -122.29, 47.66)
CELL_DEPTH = 16
TILE_Z = 15
KNN_CUTOFF_M = 300.0

_LON = FX.SQL_LON.format(k="o_orderkey")
_LAT = FX.SQL_LAT.format(k="o_orderkey")
SQL_LON_S = FX.SQL_LON.format(k="s_suppkey")
SQL_LAT_S = FX.SQL_LAT.format(k="s_suppkey")
_PTS = f"(SELECT o_orderkey, {_LON} AS lon, {_LAT} AS lat FROM orders)"
# nearest grid edge: k = clamp(round((lat-47.605)/0.01), 0..9)
_PTS_K = ("(SELECT o_orderkey, lon, lat, "
          " CAST(LEAST(GREATEST(ROUND((lat - 47.605) / 0.01), 0), 9) AS BIGINT) AS k,"
          " ABS(lat - (47.605 + CAST(LEAST(GREATEST(ROUND((lat - 47.605) / 0.01), 0), 9) AS BIGINT) * 0.01)) * 110540.0 AS dist_m"
          f" FROM {_PTS})")

_NORM_TEXT = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_WORDS = "list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> ''))"


def _sw_sql(code: str) -> str:
    words = ", ".join(f"'{w}'" for w in TX.STOPWORDS[code])
    return f"len(list_intersect({_WORDS}, [{words}]))"


# ---------------------------------------------------------------------------
# query implementations (spark, sf_dir) -> DataFrame
# ---------------------------------------------------------------------------


def _q_bbox(spark: SparkSession, sf: str) -> DataFrame:
    pts = FX.orders_points(spark, sf)
    return (bbox_filter_points(pts, BBOX, "tpch")
            .select("o_orderkey", "lon", "lat"))


def _q_cell_grid(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import types as T

    from tdei_backend_service_spark.core import cells

    @F.pandas_udf(T.StructType([T.StructField("cell_x", T.LongType()),
                                T.StructField("cell_y", T.LongType())]))
    def _xy(lon: pd.Series, lat: pd.Series) -> pd.DataFrame:
        # full encode->morton->decode roundtrip (exercises the index)
        c = cells.encode(lon.to_numpy(np.float64), lat.to_numpy(np.float64),
                         CELL_DEPTH)
        x, y = cells.cell_xy(c)
        return pd.DataFrame({"cell_x": x, "cell_y": y})

    pts = FX.orders_points(spark, sf)
    return (pts.withColumn("_xy", _xy(F.col("lon"), F.col("lat")))
            .groupBy(F.col("_xy.cell_x").alias("cell_x"),
                     F.col("_xy.cell_y").alias("cell_y"))
            .agg(F.count(F.lit(1)).alias("n")))


def _q_tiles(spark: SparkSession, sf: str) -> DataFrame:
    pts = FX.orders_points(spark, sf)
    return (assign_tiles(pts, TILE_Z)
            .groupBy("tile_x", "tile_y")
            .agg(F.count(F.lit(1)).alias("n")))


def _q_incremental_tiles(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental tile-count maintenance (operators/tiling.
    incremental_tile_counts): the committed z15 tile table (orders
    points) absorbs a customer-point drop by aggregating ONLY the drop
    and monoid-summing — the oracle recomputes over the union, so the
    row pins merge == recompute without the corpus rescan."""
    from tdei_backend_service_spark.operators.tiling import \
        incremental_tile_counts
    committed = _q_tiles(spark, sf)
    drop = FX.customer_images(spark, sf, "A").select("lon", "lat")
    return incremental_tile_counts(committed, drop, TILE_Z)


def _q_knn_tag(spark: SparkSession, sf: str) -> DataFrame:
    pts = FX.orders_points(spark, sf)
    edges = FX.grid_edges(spark)
    out = dataset_tag_road(pts, "tpch", edges, "tpch-edges",
                           attrs=["highway"], cutoff_m=KNN_CUTOFF_M,
                           pk="o_orderkey")
    return out.select("o_orderkey", "nearest_edge_id")


def _q_knn_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Ranked k-nearest-edges join (operators/tag_road.knn_join):
    top-3 grid edges within 2.5 km per point — the k>1 generalization
    of knn_tag, same padded-cover candidate join, ranked by the exact
    distance with edge-id tie-break."""
    pts = FX.orders_points(spark, sf)
    # exclude lattice points with equidistant line PAIRS — exact
    # midpoints (lat unit 5000 mod 10000) and points sitting ON a line
    # (unit 0 mod 10000, equidistant to both neighbors): their rank
    # order depends on float-ulp noise and is engine-dependent; every
    # other point's distance gaps are >= one lattice step (0.11 m),
    # far above ulp scale
    w = (F.col("o_orderkey") * 40503 + 12345) % 100000
    pts = pts.filter(w % 5000 != 0)
    edges = FX.grid_edges(spark)
    out = knn_join(pts, "tpch", edges, "tpch-edges", k=3,
                   cutoff_m=2500.0, pk="o_orderkey")
    return out.select("o_orderkey", "knn_rank",
                      F.col("edge_id").cast("long").alias("edge_id"))


def _q_join_count(spark: SparkSession, sf: str) -> DataFrame:
    pts = FX.orders_points(spark, sf)
    edges = FX.grid_edges(spark)
    out = spatial_join(edges, "edge", "tpch-edges", pts, "point", "tpch",
                       f"ST_DWithin(geometry_target, geometry_source, {KNN_CUTOFF_M})",
                       ["count(*) as n"])
    return out.select("edge_id",
                      F.col("props").getItem("ext:n").cast("bigint").alias("n"))


def _q_union(spark: SparkSession, sf: str) -> DataFrame:
    a = FX.customer_images(spark, sf, "A")
    b = FX.customer_images(spark, sf, "B")
    return union_dataset(a, "ds-A", b, "ds-B").select("image_id")


def _q_pagination(spark: SparkSession, sf: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    return dynamic_query(orders, select=["o_orderkey"],
                         order_by=("o_orderkey", "DESC"),
                         page_no=3, page_size=20)


def _q_proj_join(spark: SparkSession, sf: str) -> DataFrame:
    customer = spark.read.parquet(f"{sf}/customer.parquet")
    nation = (spark.read.parquet(f"{sf}/nation.parquet")
              .withColumnRenamed("n_nationkey", "c_nationkey"))
    return dynamic_query(customer, select=["c_custkey", "n_name"],
                         join=(nation, "c_nationkey"),
                         where=[("c_mktsegment", "BUILDING")],
                         order_by=("c_custkey", "ASC"), page_size=50)


def _q_groupby(spark: SparkSession, sf: str) -> DataFrame:
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
                 F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
                 .alias("sum_price_cents"),
                 F.count(F.lit(1)).alias("n")))


def _q_topk(spark: SparkSession, sf: str) -> DataFrame:
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    return (orders.groupBy("o_custkey")
            .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
                 .alias("total_cents"))
            .orderBy(F.desc("total_cents"), F.asc("o_custkey"))
            .limit(10))


def _q_events_rollup(spark: SparkSession, sf: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return (ev.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.round(F.col("value") * 100).cast("bigint"))
                 .alias("sum_value_cents"),
                 F.countDistinct("user_id").alias("n_users")))


def _q_events_top_per_user(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window
    ev = spark.read.parquet(f"{sf}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (ev.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("user_id", "event_id", "event_type"))


def _q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based batch sessionization + per-session rollup
    (operators/temporal.sessionize): one exchange on user_id feeds
    both the window and the (user, session) aggregate."""
    ev = spark.read.parquet(f"{sf}/events.parquet")
    return TP.session_stats(ev, gap_s=21600)


def _q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """Backward as-of join (operators/temporal.asof_join): each click
    gains the most recent view by the same user within 2 h — the
    union-tag single-window plan, no range join."""
    ev = spark.read.parquet(f"{sf}/events.parquet")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value")
    return (TP.asof_join(clicks, views, on="user_id",
                         carry=["value"], tolerance_s=7200)
            .select("event_id",
                    F.col("asof_event_id").alias("match_id"),
                    F.col("asof_value").alias("match_value")))


def _q_map_match(spark: SparkSession, sf: str) -> DataFrame:
    """Trajectory map matching (operators/trajectory.map_match): snap
    each GPS ping to a grid edge with one-step hysteresis — keep the
    previous ping's nearest edge while it stays within 1500 m, else
    take the current nearest (candidates complete within 2500 m). The
    Spark side runs the real broadcast cover-index probe + exact
    vectorized distances; the oracle works in closed-form lattice units
    (0.11054 m each, thresholds 22616/13569 units sit >= 2 cm from the
    float cutoffs, far above ulp noise)."""
    pings = FX.event_pings(spark, sf)
    edges = FX.grid_edges(spark)
    return TJ.map_match(pings, edges, "tpch-edges", cutoff_m=2500.0,
                        keep_within_m=1500.0).select(
        "event_id", "nearest_edge_id", "matched_edge_id", "n_cand")


def _q_trip_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-sessionized trips with exact-integer path length
    (operators/trajectory.trip_geo_stats): each planar step floors to
    whole millimeters BEFORE the sum, so len_mm is independent of
    partitioning and addition order — both engines evaluate the same
    IEEE expression tree bit-for-bit."""
    return TJ.trip_geo_stats(FX.event_pings(spark, sf), gap_s=21600)


def _q_od_matrix(spark: SparkSession, sf: str) -> DataFrame:
    """Origin/destination matrix (operators/trajectory.od_matrix):
    per-trip first/last ping through the REAL polygon PIP join against
    the half-lattice quad zones (no ping can sit on a zone edge, so
    the zone of an endpoint is pure integer arithmetic for the
    oracle)."""
    pings = FX.event_pings(spark, sf)
    zones = FX.quad_zones(spark, side=4, dataset_id="tpch-z")
    return TJ.od_matrix(pings, zones, "tpch-z", gap_s=21600)


def _q_coverage_gaps(spark: SparkSession, sf: str) -> DataFrame:
    """Spatial ANTI join (operators/trajectory.coverage_gaps): pings
    with NO grid edge within 300 m — the complement of
    dataset_tag_road's tagged set. 300 m = 2713.9 lattice units, so
    the covered/gap decision is >= 5 cm from the threshold for every
    lattice point."""
    pings = FX.event_pings(spark, sf)
    edges = FX.grid_edges(spark)
    return TJ.coverage_gaps(pings, edges, "tpch-edges", pk="event_id",
                            cutoff_m=300.0).select("event_id", "lon", "lat")


def _q_trip_segments(spark: SparkSession, sf: str) -> DataFrame:
    """Trajectory polyline decomposition (operators/trajectory.
    trip_segments): consecutive same-trip ping pairs as directed
    segments — the shared primitive under the speed raster and the
    route burn-in. One key exchange; steps crossing a session gap are
    dropped (both engines apply the identical lag/session rule)."""
    return TJ.trip_segments(FX.event_pings(spark, sf))


def _q_speed_raster(spark: SparkSession, sf: str) -> DataFrame:
    """Mean-step-speed raster (operators/trajectory.speed_pixels):
    each trip step lands floor(step_mm * 1e6 / dt_us) mm/s on its
    destination ping's zoom-17 lattice pixel (z13 tiles at 16 px);
    the pixel value n is the pure-integer DIV mean clipped at 255 —
    every op is exact-int or the proven IEEE step expression, so the
    full layer sits under the hash oracle."""
    return TJ.speed_pixels(FX.event_pings(spark, sf), TILE_Z - 2,
                           RASTER_PX)


def _q_route_raster(spark: SparkSession, sf: str) -> DataFrame:
    """Route-density burn-in (operators/raster.segment_pixels): trip
    segments DDA-sample the CONTINUOUS pixel lattice (tile formula
    without the floor, cells.tile_float_expr), pixels dedup per
    segment, coverage counts render through the real PNG
    encode->decode (decode_tile_stats) — line rasterization joins
    points (pixel_counts) and areas (rasterize_zones) under the same
    decoded-stats oracle."""
    from tdei_backend_service_spark.operators import raster
    segs = TJ.trip_segments(FX.event_pings(spark, sf))
    pix = raster.segment_pixels(segs, TILE_Z - 2, RASTER_PX)
    return raster.decode_tile_stats(raster.encode_tiles(pix, RASTER_PX))


def _q_stay_points(spark: SparkSession, sf: str) -> DataFrame:
    """Dwell detection (operators/trajectory.stay_points): maximal
    linked-step runs (every step <= 3 km of its predecessor, floored
    integer millimeters vs an integer threshold) spanning >= 12 h.
    One window pass — the sessionize cumsum trick applied to space."""
    return TJ.stay_points(FX.event_pings(spark, sf), radius_m=3000.0,
                          min_duration_s=43_200)


def _q_co_location(spark: SparkSession, sf: str) -> DataFrame:
    """Space-time encounter join (operators/trajectory.co_location):
    ping pairs of different users within 3 km AND 30 min, aggregated
    per user pair. Candidates via the padded 4-corner cell cover x a
    +-1 time-bucket triple; refine is exact integer |dt| and floored-mm
    distance, so the engine's banded join and the oracle's lattice
    bucketing provably produce the same pair set (brute-force-verified
    at sf0.001/sf0.01)."""
    return TJ.co_location(FX.event_pings(spark, sf), radius_m=3000.0,
                          window_s=1800)


def _q_edge_usage(spark: SparkSession, sf: str) -> DataFrame:
    """Road-segment usage rollup (operators/trajectory.edge_usage):
    map-match with the full hysteresis rule, then per-edge ping count /
    DISTINCT collector count / first-last observation epoch — the
    aggregate a transportation agency serves from matched
    trajectories. Oracle composes the map_match lattice closed form
    with a plain GROUP BY."""
    return TJ.edge_usage(FX.event_pings(spark, sf), FX.grid_edges(spark),
                         "tpch-edges", cutoff_m=2500.0,
                         keep_within_m=1500.0)


def _q_co_travelers(spark: SparkSession, sf: str) -> DataFrame:
    """Cell-visit-set similarity (operators/trajectory.co_travelers):
    pairs sharing >= 5 distinct zoom-17 tiles with integer-permille
    Jaccard — pure set counts + one integer DIV, fully oracled. The
    tile coords materialize in the distinct projection so the
    self-join key is a plain attribute, never the asinh expression."""
    return TJ.co_travelers(FX.event_pings(spark, sf), 17, min_common=5)


def _q_zone_visits(spark: SparkSession, sf: str) -> DataFrame:
    """Geofence visit episodes (operators/trajectory.zone_visits): per
    (user, quad zone) the maximal in-zone runs separated by <= 6 h —
    enter/exit epoch, ping count, span. Membership runs the REAL
    polygon PIP join; the oracle replays it as integer arithmetic on
    the key hash (half-lattice zone boundaries, od_matrix's closed
    form) plus the same gap-cumsum window in microseconds."""
    pings = FX.event_pings(spark, sf)
    zones = FX.quad_zones(spark, side=4, dataset_id="tpch-z")
    return TJ.zone_visits(pings, zones, "tpch-z", max_gap_s=21600)


def _q_brightness_raster(spark: SparkSession, sf: str) -> DataFrame:
    """Visual raster layer (operators/geo_visual.brightness_pixels +
    raster.encode_tiles): geotagged planted blobs decode ONCE to
    (location, pixel sum, pixel count), aggregate into the z11/16px
    lattice as integer mean brightness, render as PNG tiles, and the
    returned stats are recomputed FROM THE DECODED TILE PIXELS — the
    A+B render path (image decode -> raster encode -> decode) under
    one hash-exact oracle: per-key sums are integer polynomials in
    popcount(V) (augment_meta's closed form) and the lattice is the
    verified z15 grid."""
    from tdei_backend_service_spark.operators import raster
    from tdei_backend_service_spark.operators.geo_visual import \
        brightness_raster
    imgs = FX.part_images_spread(spark, sf)
    return raster.decode_tile_stats(
        brightness_raster(imgs, TILE_Z - 4, RASTER_PX))


def _q_tile_gallery(spark: SparkSession, sf: str) -> DataFrame:
    """Visual browse layer (operators/geo_visual.tile_gallery): the
    min-id image per occupied z15 tile, decoded and nearest-neighbor
    thumbnailed to 16x16 — stats AND the chosen id recomputed from the
    decoded tile bytes (decode_tile_stats carry). Oracle: winner = MIN
    key per tile; each logical 8x8 block of the planted pattern lands
    exactly 4 thumbnail samples regardless of source scale s (16 = 2*8
    and block edges divide evenly), so sum_px = 4*(hi*pop+lo*(64-pop))
    and max = hi — pure popcount(V) arithmetic."""
    from tdei_backend_service_spark.operators import raster
    from tdei_backend_service_spark.operators.geo_visual import tile_gallery
    imgs = FX.part_images_spread(spark, sf)
    g = tile_gallery(imgs, TILE_Z, RASTER_PX)
    return raster.decode_tile_stats(g, carry=("image_id",))


def _q_incremental_gallery(spark: SparkSession, sf: str) -> DataFrame:
    """Live browse-layer maintenance (operators/geo_visual.
    incremental_gallery): an odd-key image drop merges into the
    committed even-key gallery by re-thumbnailing ONLY tiles the drop
    wins (min-id winners nest); untouched tiles keep committed bytes
    via anti-join and corpus blobs are never re-read. The oracle is
    the FULL-rebuild closed form over all keys — merge == recompute."""
    from tdei_backend_service_spark.operators import raster
    from tdei_backend_service_spark.operators.geo_visual import (
        incremental_gallery, tile_gallery)
    imgs = FX.part_images_spread(spark, sf)
    committed = tile_gallery(imgs.filter(F.col("image_id") % 2 == 0),
                             TILE_Z, RASTER_PX)
    merged = incremental_gallery(imgs.filter(F.col("image_id") % 2 == 1),
                                 committed, TILE_Z, RASTER_PX)
    return raster.decode_tile_stats(merged, carry=("image_id",))


def _q_incremental_brightness(spark: SparkSession, sf: str) -> DataFrame:
    """Live visual-layer maintenance (operators/geo_visual.
    incremental_brightness_tiles): an odd-key image drop decodes alone,
    its (ps, np) totals merge into the committed even-key sums (the
    monoid — division only at render), and ONLY drop-touched tiles
    re-encode. The oracle is the full brightness closed form over all
    keys — merge == recompute."""
    from tdei_backend_service_spark.operators import raster
    from tdei_backend_service_spark.operators.geo_visual import (
        brightness_pixel_sums, incremental_brightness_tiles,
        pixels_from_sums)
    imgs = FX.part_images_spread(spark, sf)
    committed_sums = brightness_pixel_sums(
        imgs.filter(F.col("image_id") % 2 == 0), TILE_Z - 4, RASTER_PX)
    committed_tiles = raster.encode_tiles(
        pixels_from_sums(committed_sums), RASTER_PX)
    merged = incremental_brightness_tiles(
        committed_sums, committed_tiles,
        imgs.filter(F.col("image_id") % 2 == 1), TILE_Z - 4, RASTER_PX)
    return raster.decode_tile_stats(merged)


def _q_gallery_pyramid(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-zoom browse layer (operators/geo_visual.gallery_pyramid):
    z15/z14/z13 representative thumbnails from ONE corpus pass — the
    min-id winner nests under integer tile halving, so coarse levels
    roll up the narrow winner relation and each DISTINCT winner
    decodes once. Oracle: per level winner = MIN key per halved tile,
    decoded sums = the tile_gallery popcount(V) polynomial."""
    from tdei_backend_service_spark.operators import raster
    from tdei_backend_service_spark.operators.geo_visual import \
        gallery_pyramid
    imgs = FX.part_images_spread(spark, sf)
    g = gallery_pyramid(imgs, TILE_Z, TILE_Z - 2, RASTER_PX)
    return raster.decode_tile_stats(g, carry=("image_id",))


def _q_tile_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Caption-side map labeling (operators/tiling.tile_top_terms):
    dominant lowercased-alnum caption term per z15 tile, ties to the
    smallest term — split/explode map-side, one (tile, term) exchange,
    top-1 window on the bounded term relation. Oracle replays the
    identical split law and tie order in SQL."""
    from tdei_backend_service_spark.operators.tiling import tile_top_terms
    parts = spark.read.parquet(f"{sf}/part.parquet")
    df = FX.derive_lonlat(parts, "p_partkey").select(
        "lon", "lat",
        F.concat(F.lit("scene"), (F.col("p_partkey") % 5).cast("string"),
                 F.lit(" tag"), (F.col("p_partkey") % 11).cast("string"))
        .alias("caption"))
    return tile_top_terms(df, TILE_Z)


def _q_decode_mse(spark: SparkSession, sf: str) -> DataFrame:
    """Per-row payload fidelity as an operator (pipeline/multimodal.
    decode_mse_cols): each record carries the SAME planted pattern in
    both codecs; the integer squared-error sum between the decoded
    pairs is closed-form (qimg shifts every sample by exactly 2 ->
    sq_err_sum = 768 s^2), putting the north rule's PSNR invariant
    under the hash oracle. The float psnr_db column (42.11 dB >= the
    40 dB gate) is pinned in pytest, not hashed."""
    from tdei_backend_service_spark.pipeline.multimodal import \
        decode_mse_cols
    pairs = FX.part_image_pairs(spark, sf)
    return decode_mse_cols(pairs).select(
        "image_id", "w", "h", "n_px", "sq_err_sum")


def _q_incremental_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Live caption-layer maintenance (operators/tiling.
    incremental_tile_terms): an odd-key caption drop tokenizes alone,
    merges into the committed even-key (tile, term) counts (the
    monoid), and the top-1 window recomputes only over drop-touched
    tiles. Oracle = the full tile_terms closed form over all keys."""
    from tdei_backend_service_spark.operators.tiling import (
        incremental_tile_terms, tile_term_counts, tile_top_terms)
    parts = spark.read.parquet(f"{sf}/part.parquet")
    df = FX.derive_lonlat(parts, "p_partkey").select(
        "p_partkey", "lon", "lat",
        F.concat(F.lit("scene"), (F.col("p_partkey") % 5).cast("string"),
                 F.lit(" tag"), (F.col("p_partkey") % 11).cast("string"))
        .alias("caption"))
    even = df.filter(F.col("p_partkey") % 2 == 0)
    odd = df.filter(F.col("p_partkey") % 2 == 1)
    return incremental_tile_terms(odd, tile_term_counts(even, TILE_Z),
                                  tile_top_terms(even, TILE_Z), TILE_Z)


def _q_token_count(spark: SparkSession, sf: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return TX.with_token_counts(docs).select(
        "doc_id",
        F.col("n_tokens_ws").cast("long").alias("n_tokens_ws"),
        F.col("n_tokens_bpe").cast("long").alias("n_tokens_bpe"))


def _q_quality(spark: SparkSession, sf: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (TX.with_quality(docs)
            .select("doc_id",
                    F.col("n_chars_m").cast("long").alias("n_chars_m"),
                    F.col("stopword_hits").cast("long").alias("stopword_hits"),
                    "quality_score"))


def _q_langid(spark: SparkSession, sf: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (TX.with_langid(docs).groupBy("lang_pred")
            .agg(F.count(F.lit(1)).alias("n")))


def _q_corpus_report(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source data card (pipeline/text.corpus_report): doc counts,
    exact token totals/extremes, fixed-point quality sum, language mix
    — all integers, one partial-aggregated exchange."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return TX.corpus_report(docs, key_col="source")


def _q_exact_dedup(spark: SparkSession, sf: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return DD.exact_dedup(docs).select("doc_id")


def _q_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return TX.with_fingerprint(docs).select("doc_id", "fingerprint")


def _q_embed_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = (emb.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("q_id"), "embedding"))
    return (SIM.brute_force_topk(emb, queries, k=5)
            .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank")))


# --- LSH dedup queries over planted corpora (closed-form survivor sets;
#     see fixtures_tpch.planted_documents/planted_embeddings docstrings
#     for the recall/precision guarantees that make these oracle-exact) ---


def _q_minhash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    docs = FX.planted_documents(spark, sf)
    return DD.minhash_dedup(docs, threshold=0.8).select("doc_id")


def _q_simhash(spark: SparkSession, sf: str) -> DataFrame:
    docs = FX.planted_documents(spark, sf)
    return DD.simhash_dedup(docs, max_hamming=3).select("doc_id")


def _q_embed_neardup(spark: SparkSession, sf: str) -> DataFrame:
    emb = FX.planted_embeddings(spark, sf)
    return DD.embedding_dedup(emb, threshold=0.98).select("vec_id")


def _q_hamming_cluster(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic-cluster collapse in hamming space (pipeline/dedup.
    hash_cluster_dedup): ONE survivor per connected component of the
    verified near-dup graph, over planted 3-chains whose id order is
    non-monotone along the path (fixtures_tpch.chain_hashes) — the
    pairwise larger-id rule would keep BOTH path endpoints, so this
    oracle pins the transitive-closure semantics, with candidate
    generation pigeonhole-guaranteed (bands 1-3 identical in-class)
    and cross-class merges impossible (hamming >= 6 by code design)."""
    imgs = FX.chain_hashes(spark, sf)
    return (DD.hash_cluster_dedup(imgs, "phash", "image_id")
            .select("image_id"))


def _q_cluster_keep_best(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-best survivor policy (pipeline/dedup.hash_cluster_dedup
    keep_by=): per connected component of the planted hamming 3-chains
    the member with the LARGEST deterministic quality score survives
    (ties -> min id) instead of the min id — so the expected survivor
    set differs from hamming_cluster_dedup's on every chain whose
    argmax is not the min member, pinning the policy, not just the
    components."""
    imgs = FX.chain_hashes(spark, sf).withColumn(
        "qual", ((F.col("image_id") * F.lit(2654435761)) % 97)
        .cast("long"))
    return (DD.hash_cluster_dedup(imgs, "phash", "image_id",
                                  keep_by="qual")
            .select("image_id"))


def _q_embedding_cluster(spark: SparkSession, sf: str) -> DataFrame:
    """SemDeDup-style cluster collapse over embeddings (pipeline/dedup.
    embedding_cluster_dedup): connected components of the cosine
    near-dup graph, min id survives. On the planted copy/negation
    fixture every component is a {original, exact copy} clique, so the
    survivor set is closed-form (same as embedding_neardup's); the
    chain-vs-clique differential — where this operator and the
    pairwise rule disagree — is pinned in tests/test_cluster_dedup.py,
    since non-exact chain links cannot carry an LSH recall guarantee."""
    emb = FX.planted_embeddings(spark, sf)
    return DD.embedding_cluster_dedup(emb, threshold=0.98).select("vec_id")


def _q_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF with nprobe = n_centroids probes every bucket -> exact top-k,
    so the *scale-path plan* (bucketed equi-join, no cross join) gets a
    brute-force SQL oracle. Recall at nprobe < n_centroids is measured
    separately in tests/test_similarity_multimodal.py."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = (emb.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("q_id"), "embedding"))
    return (SIM.ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=8)
            .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank")))


def _q_ivf_indexed(spark: SparkSession, sf: str) -> DataFrame:
    """Persistent-IVF search (similarity.build_ivf_index /
    ivf_topk_indexed): the corpus is written partitioned by
    nearest-centroid bucket and the search scan opens ONLY the probed
    buckets' files (PartitionFilters). At nprobe = n_centroids every
    bucket is probed, so the scan is complete and the result exact —
    the partition-pruned physical layout gets the brute-force oracle."""
    import os
    import tempfile
    from tdei_backend_service_spark.pipeline.similarity import (
        build_ivf_index, ivf_topk_indexed)
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = (emb.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("q_id"), "embedding"))
    # build-once/search-many is the point of the persistent index: the
    # built index is itself a deterministic fixture of (sf, seed,
    # n_centroids), so it caches per SF like the blob tables — a bench
    # row then measures the partition-pruned SEARCH, not the build
    root = FX._cache_root()
    if root is None:
        idx = tempfile.mkdtemp(prefix="ivf_index_")
        build_ivf_index(emb, idx, n_centroids=8)
    else:
        tag = sf.strip("/").replace("/", "_")
        idx = os.path.join(root, f"v{FX._CACHE_VERSION}", tag, "ivf_index_c8")
        if not os.path.exists(os.path.join(idx, "corpus", "_SUCCESS")):
            build_ivf_index(emb, idx, n_centroids=8)
    return (ivf_topk_indexed(spark, idx, queries, k=5, nprobe=8)
            .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank")))


def _q_ivf_quantized(spark: SparkSession, sf: str) -> DataFrame:
    """Quantized IVF (similarity.ivf_topk_quantized): the bucket scan
    reads int8 codes + scale only (4x smaller), the exact float kernel
    re-ranks the best 32 candidates per query. At nprobe = n_centroids
    the result is the exact brute-force top-k, so the memory-optimized
    scan plan shares the brute-force SQL oracle."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries = (emb.filter(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("q_id"), "embedding"))
    return (SIM.ivf_topk_quantized(emb, queries, k=5, n_centroids=8,
                                   nprobe=8, rerank=32)
            .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank")))


def _payload_rows_for(sf: str) -> int:
    """Synthesized-image count scales with the scale factor (VERDICT r2
    next #8): sf0.001 -> 200, sf0.01 -> 2000, sf0.1 -> 20000."""
    import re
    m = re.search(r"sf([0-9.]+)", sf)
    return max(int(float(m.group(1)) * 200_000), 50) if m else 200


def _q_payload_invariants(spark: SparkSession, sf: str) -> DataFrame:
    """Rows-only by nature (pixel PSNR is non-SQL), but ZERO-FN-pinned:
    every synthesized image must pass its decode invariant, so the
    driver-recorded row count equals the generated count exactly
    (pytest pins this; a single false negative changes the count)."""
    from tdei_backend_service_spark.datagen import synth_images_df
    from tdei_backend_service_spark.pipeline.multimodal import \
        verify_payload_invariants
    imgs = synth_images_df(spark, _payload_rows_for(sf), with_bytes=True,
                           img_px=8)
    return (verify_payload_invariants(imgs)
            .filter(F.col("invariant_ok"))
            .select("image_id", "fmt"))


def _q_winnow(spark: SparkSession, sf: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return TX.with_winnow_fingerprint(docs).select("doc_id", "winnow_fp")


# bbox for the edge-layer query, bounds on half-lattice offsets (u/v
# lattice units 39999.5..69999.5 x 29999.5..69999.5): no derived edge
# endpoint can touch a bbox side, so intersection is integer-exact
_EB = (FX.LON0 + 39999.5e-6, FX.LAT0 + 29999.5e-6,
       FX.LON0 + 69999.5e-6, FX.LAT0 + 69999.5e-6)


def _q_bbox_edges(spark: SparkSession, sf: str) -> DataFrame:
    """bbox_intersect on a LINE layer: envelope-column prefilter + exact
    vectorized segment-clip refine (operators/bbox.py:70), oracle-exact
    because the horizontal supplier edges and half-lattice bbox reduce
    to integer range tests."""
    from tdei_backend_service_spark.operators.bbox import bbox_filter_geoms
    edges = FX.supplier_edges(spark, sf)
    return (bbox_filter_geoms(edges, _EB, "tpch-sedges")
            .select("edge_id"))


def _q_tri_zone_pip(spark: SparkSession, sf: str) -> DataFrame:
    """PIP join against NON-axis-aligned polygons (diagonal-edge
    triangles): the ray-casting refine runs on real slanted edges while
    the answer stays integer-exact (fixtures_tpch.tri_zones)."""
    zones = FX.tri_zones(spark, dataset_id="tpch-tri")
    pts = FX.orders_points(spark, sf)
    out = spatial_join(zones, "zone", "tpch-tri", pts, "point", "tpch",
                       "ST_Intersects(geometry_target, geometry_source)",
                       ["count(*) as n"])
    return out.select("zone_id",
                      F.col("props").getItem("ext:n").cast("bigint").alias("n"))


def _q_zone_pip(spark: SparkSession, sf: str) -> DataFrame:
    """Polygon-target PIP join: points per quad zone. The zones sit on
    half-lattice boundaries (fixtures_tpch.quad_zones) so no point is
    ever on an edge and the answer is closed-form integer arithmetic —
    a full SQL oracle despite running the real polygon PIP path."""
    zones = FX.quad_zones(spark, side=4, dataset_id="tpch-z")
    pts = FX.orders_points(spark, sf)
    out = spatial_join(zones, "zone", "tpch-z", pts, "point", "tpch",
                       "ST_Intersects(geometry_target, geometry_source)",
                       ["count(*) as n"])
    return out.select("zone_id",
                      F.col("props").getItem("ext:n").cast("bigint").alias("n"))


def _q_zone_contains(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Contains predicate (compiler vocabulary, r6): points per quad
    zone under `ST_Contains(geometry_target, geometry_source)` — the
    containment refine (core/geom.pair_contains) through the same
    two-phase join. The half-lattice zone boundaries keep every point
    interior, where ST_Contains and unbuffered ST_Intersects agree, so
    the closed-form integer oracle carries over while the Spark side
    exercises the new predicate path end to end."""
    zones = FX.quad_zones(spark, side=4, dataset_id="tpch-z")
    pts = FX.orders_points(spark, sf)
    out = spatial_join(zones, "zone", "tpch-z", pts, "point", "tpch",
                       "ST_Contains(geometry_target, geometry_source)",
                       ["count(*) as n"])
    return out.select("zone_id",
                      F.col("props").getItem("ext:n").cast("bigint").alias("n"))


def _q_dwithin_local(spark: SparkSession, sf: str) -> DataFrame:
    """ST_DWithin under the opt-in cos(lat) LOCAL metric (r6,
    two_phase_join metric_lat): points within 600 m of each vertical
    grid edge. Every point's lat sits inside the edge span, so the
    distance is purely longitudinal — |dlon| * 111320 * cos(47.6) —
    and the oracle is the same one-cos closed form (boundary margin
    ~1.9 cm, far beyond FP drift). Under the default equator metric
    the counts would be ~1.48x smaller, so the row pins the metric
    actually being applied."""
    edges = FX.vgrid_edges(spark)
    pts = FX.orders_points(spark, sf)
    out = spatial_join(edges, "edge", "tpch-vedges", pts, "point", "tpch",
                       "ST_DWithin(geometry_target, geometry_source, 600)",
                       ["count(*) as n"], metric_lat=FX.LAT0)
    return out.select("edge_id",
                      F.col("props").getItem("ext:n").cast("bigint").alias("n"))


def _q_knn_local_tag(spark: SparkSession, sf: str) -> DataFrame:
    """kNN tagging under the opt-in cos(lat) LOCAL metric (r6,
    dataset_tag_road metric_lat): nearest vertical grid edge per order
    point. Lats always fall inside the edge span, so the distance is
    purely longitudinal and the winner is pure integer arithmetic on
    the lon hash — round to the nearest 10000-unit edge, exact-midpoint
    ties (u = 5000 mod 10000, float-ulp order) excluded. The 800 m
    cutoff pins the metric: every point is within 750.5 m locally, but
    up to 1113 m under the equator convention, so a wrong metric leaves
    nulls the oracle never produces."""
    pts = FX.orders_points(spark, sf)
    u = (F.col("o_orderkey") * 2654435761) % 100000
    pts = pts.filter(u % 10000 != 5000)
    edges = FX.vgrid_edges(spark)
    out = dataset_tag_road(pts, "tpch", edges, "tpch-vedges",
                           attrs=["highway"], cutoff_m=800.0,
                           pk="o_orderkey", metric_lat=FX.LAT0)
    return out.select("o_orderkey",
                      F.col("nearest_edge_id").cast("long")
                      .alias("nearest_edge_id"))


def _q_gaps_local(spark: SparkSession, sf: str) -> DataFrame:
    """coverage_gaps under the cos(lat) LOCAL metric (r6, trajectory
    tier): order points vs the vertical-edge lattice, 300 m local
    cutoff. Distance to the nearest edge is purely longitudinal —
    d units of 1e-6 deg -> d * 0.111320 * cos(47.6) meters — so the
    gap set is an integer-threshold residue query (d >= 3997; the
    boundary has ~4 cm slack on both sides, 7 orders above fp noise).
    Under the equator convention the threshold would be 2695, so the
    row count itself pins the metric."""
    pts = FX.orders_points(spark, sf)
    edges = FX.vgrid_edges(spark)
    out = TJ.coverage_gaps(pts, edges, "tpch-vedges", pk="o_orderkey",
                        cutoff_m=300.0, metric_lat=FX.LAT0)
    return out.select("o_orderkey")


def _q_union_local(spark: SparkSession, sf: str) -> DataFrame:
    """union_dataset under the opt-in cos(lat) LOCAL metric (r6,
    union_dataset metric_lat): B-side duplicates are lon-shifted 6e-6
    deg = 0.668 m under the pinned equator convention (NO merge at
    proximity 0.5) but 0.450 m under cos(47.6 deg) (merge, 5 cm
    margin). The survivor set itself pins which metric ran: the local
    metric drops all 299 planted dups, the equator metric drops none."""
    a = FX.customer_images(spark, sf, "A")
    b = FX.customer_images(spark, sf, "B", dup_dlon=6e-6, dup_dlat=0.0)
    return union_dataset(a, "ds-A", b, "ds-B",
                         metric_lat=FX.LAT0).select("image_id")


def _q_edge_cross(spark: SparkSession, sf: str) -> DataFrame:
    """ST_Crosses line-line join (r6, geom.pair_line_relate): vertical
    lattice edges x horizontal supplier segments. A supplier segment
    (span 10000 lon-hash units) properly crosses vertical edge k iff
    its start u lies strictly inside ((k-1)*10000, k*10000) and its lat
    is strictly inside the edge span — pure integer arithmetic after
    excluding the touch-risk residues (u % 10000 == 0: endpoint ON the
    edge; v == 0: segment through the edge's global endpoint, which is
    ST_Touches not ST_Crosses — those exact-equality fixtures are FP-
    fragile cross-engine and are pinned by pytest instead). The
    axis-aligned fixture keeps every orientation sign exact (the
    degenerate cross-product subtraction is exactly 0)."""
    tgt = FX.vgrid_edges(spark)
    src = FX.supplier_edges(spark, sf)
    u = (F.col("edge_id") * 2654435761) % 100000
    v = (F.col("edge_id") * 40503 + 12345) % 100000
    src = src.filter((u % 10000 != 0) & (v != 0))
    out = spatial_join(tgt, "edge", "tpch-vedges", src, "line",
                       "tpch-sedges",
                       "ST_Crosses(geometry_target, geometry_source)",
                       ["count(*) as n"])
    return out.select("edge_id",
                      F.col("props").getItem("ext:n").cast("bigint")
                      .alias("n"))


def _q_angle_join(spark: SparkSession, sf: str) -> DataFrame:
    """PURE-ANGLE join condition — unbounded predicate, so this drives
    the dataset cross-join path (core/join.py:435), the reference's
    second observed join condition shape (spatial-query.test.ts:111).
    Sources are oriented supplier edges (0/45/90 deg by s_suppkey % 3) vs
    horizontal grid edges, so `degrees(ST_Angle(...)) < 30` reduces to
    s_suppkey % 3 = 0 — exact integer oracle."""
    edges = FX.grid_edges(spark)
    src = FX.supplier_edges_oriented(spark, sf)
    out = spatial_join(edges, "edge", "tpch-edges", src, "line",
                       "tpch-soedges",
                       "degrees(ST_Angle(geometry_target, geometry_source)) < 30",
                       ["count(*) as n"])
    return out.select("edge_id",
                      F.col("props").getItem("ext:n").cast("bigint").alias("n"))


def _q_angle_buffer_join(spark: SparkSession, sf: str) -> DataFrame:
    """The reference's full combined condition — buffer AND angle
    (spatial-query.test.ts:111) — through the BOUNDED two-phase path
    with the angle refine. Matches per horizontal grid edge k: oriented
    supplier edges that are horizontal (angle 0 < 30) AND within 600 m
    (|lat diff| * 110540, closed form; nearest lattice values sit
    ~0.011 m off the threshold, far beyond FP drift)."""
    edges = FX.grid_edges(spark)
    src = FX.supplier_edges_oriented(spark, sf)
    out = spatial_join(
        edges, "edge", "tpch-edges", src, "line", "tpch-soedges",
        "ST_Intersects(ST_Buffer(geometry_target, 600), geometry_source) "
        "and degrees( ST_Angle(geometry_target, geometry_source) ) < 30",
        ["count(*) as n"])
    return out.select("edge_id",
                      F.col("props").getItem("ext:n").cast("bigint").alias("n"))


def _q_osm_ways(spark: SparkSession, sf: str) -> DataFrame:
    """O5 OSM XML export — the <way> line builder (io/osm_xml.py:57,
    reference streaming at osm-backend-abstract.ts:77-99) over supplier-
    derived ways. The props bag carries &, < and \" so the XML escape
    chain (&amp; first, then &lt;, then &quot;) is under the oracle."""
    from tdei_backend_service_spark.io import osm_xml
    return osm_xml.way_lines(FX.supplier_ways(spark, sf))


def _q_geojson_lines(spark: SparkSession, sf: str) -> DataFrame:
    """O6 GeoJSON export — the per-row Feature builder (io/geojson.py:57,
    reference osw-backend-abstract.ts:112-145) over the supplier line
    layer: WKB decode -> geometry JSON + typed properties. Exact oracle
    because Python json.dumps and DuckDB VARCHAR casts both print
    shortest-round-trip doubles (verified on the derived lattice)."""
    from tdei_backend_service_spark.io.geojson import feature_lines
    edges = (FX.supplier_edges(spark, sf)
             .select("edge_id", "geometry", "dataset_id")
             .withColumn("props", F.create_map().cast("map<string,string>")))
    return feature_lines(edges)


def _q_windowed_events(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked windowed streaming aggregation driven end-to-end over
    the events table (streaming/windows.py): 1-hour event-time windows,
    30-minute watermark, APPEND mode — so the sink holds exactly the
    windows whose end the final watermark (max ts - 30 min) passed.
    That emission rule is closed-form over the static table, giving the
    watermark/window operator a full SQL oracle."""
    import os
    import tempfile

    from pyspark.sql import types as T

    from tdei_backend_service_spark.streaming.windows import \
        run_windowed_counts
    base = tempfile.mkdtemp(prefix="stream_win_q_")
    landing = os.path.join(base, "landing")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    schema = T.StructType([T.StructField("event_id", T.LongType()),
                           T.StructField("ts", T.TimestampType()),
                           T.StructField("event_type", T.StringType())])
    (spark.read.parquet(f"{sf}/events.parquet")
     .select("event_id", "ts", "event_type")
     .write.mode("overwrite").parquet(landing))
    run_windowed_counts(spark, landing, out, ckpt, schema)
    # hour-aligned bounds as strings: pandas timestamp dtypes differ
    # between Spark (ns) and DuckDB (us) even for identical values
    return (spark.read.parquet(out)
            .select(F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                    F.date_format("window_end", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_end"),
                    "event_type", F.col("n").cast("long")))


def _q_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    """Watermarked SESSION-window streaming aggregation driven
    end-to-end (streaming/windows.session_window_counts): 10-minute
    gap sessions per event_type, 30-minute watermark, APPEND mode —
    the sink holds exactly the sessions whose end (last event + gap)
    the final watermark (max ts - 30 min) passed. Both the merge rule
    (strictly-greater gap break, same as operators/temporal.sessionize)
    and the emission rule are closed-form over the static table, so
    the stateful session operator gets a full SQL oracle."""
    import os
    import tempfile

    from pyspark.sql import types as T

    from tdei_backend_service_spark.streaming.windows import \
        run_session_counts
    base = tempfile.mkdtemp(prefix="stream_sess_q_")
    landing = os.path.join(base, "landing")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    schema = T.StructType([T.StructField("event_id", T.LongType()),
                           T.StructField("ts", T.TimestampType()),
                           T.StructField("event_type", T.StringType())])
    (spark.read.parquet(f"{sf}/events.parquet")
     .select("event_id", "ts", "event_type")
     .write.mode("overwrite").parquet(landing))
    run_session_counts(spark, landing, out, ckpt, schema)
    return (spark.read.parquet(out)
            .select(F.date_format("session_start", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_start"),
                    F.date_format("session_end", "yyyy-MM-dd HH:mm:ss")
                    .alias("session_end"),
                    "event_type", F.col("n").cast("long")))


def _q_streaming_tiles(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming tile-count maintenance driven end-to-end (streaming/
    raster.py): geotagged events aggregate into per-(hour-window, z15
    tile) counts under a 30-minute watermark, APPEND mode — the sink
    holds exactly the windows the final watermark sealed, a rule that
    is closed-form over the static table, so the streaming front end
    of the live tile layer carries a full SQL oracle."""
    import os
    import tempfile

    from pyspark.sql import types as T

    from tdei_backend_service_spark.streaming.raster import run_tile_counts
    base = tempfile.mkdtemp(prefix="stream_tiles_q_")
    landing = os.path.join(base, "landing")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    schema = T.StructType([T.StructField("ts", T.TimestampType()),
                           T.StructField("lon", T.DoubleType()),
                           T.StructField("lat", T.DoubleType())])
    ev = spark.read.parquet(f"{sf}/events.parquet")
    (FX.derive_lonlat(ev, "event_id").select("ts", "lon", "lat")
     .write.mode("overwrite").parquet(landing))
    run_tile_counts(spark, landing, out, ckpt, schema, TILE_Z)
    return (spark.read.parquet(out)
            .select(F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                    "tile_x", "tile_y", F.col("n").cast("long").alias("n")))


def _q_streaming_zones(spark: SparkSession, sf: str) -> DataFrame:
    """Streaming geofence occupancy driven end-to-end (streaming/
    zones.py): geotagged events pass the REAL broadcast ray-cast PIP
    against the quad zones and aggregate into per-(hour-window, zone)
    counts under a 30-minute watermark, APPEND mode. The sink holds
    exactly the windows the final watermark sealed — closed-form over
    the static table (zone = od_matrix's integer formula, half-lattice
    boundaries keep every point interior), so the streaming front end
    of the zone tier carries a full SQL oracle."""
    import os
    import tempfile

    from pyspark.sql import types as T

    from tdei_backend_service_spark.streaming.zones import run_zone_counts
    base = tempfile.mkdtemp(prefix="stream_zones_q_")
    landing = os.path.join(base, "landing")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    schema = T.StructType([T.StructField("ts", T.TimestampType()),
                           T.StructField("lon", T.DoubleType()),
                           T.StructField("lat", T.DoubleType())])
    ev = spark.read.parquet(f"{sf}/events.parquet")
    (FX.derive_lonlat(ev, "event_id").select("ts", "lon", "lat")
     .write.mode("overwrite").parquet(landing))
    zones = FX.quad_zones(spark, side=4, dataset_id="tpch-z")
    run_zone_counts(spark, landing, out, ckpt, schema, zones, "tpch-z")
    return (spark.read.parquet(out)
            .select(F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
                    .alias("window_start"),
                    F.col("zone_id").cast("long").alias("zone_id"),
                    F.col("n").cast("long").alias("n")))


def _q_tile_pyramid(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-zoom tile rollup (z15 down to z11): the corpus aggregates
    once at the base zoom, coarser levels integer-halve the previous
    level's tile table — floor nesting makes each level bit-identical
    to recomputing the tile formula at that zoom, so the whole pyramid
    is oracle-exact."""
    from tdei_backend_service_spark.operators.tiling import tile_pyramid
    pts = FX.orders_points(spark, sf)
    return (tile_pyramid(pts, TILE_Z, TILE_Z - 4)
            .select(F.col("z").cast("int"), F.col("tile_x").cast("int"),
                    F.col("tile_y").cast("int"), F.col("n").cast("long")))


RASTER_PX = 16  # z11 tiles at 16px -> pixel lattice == the verified z15 grid


def _q_tile_raster(spark: SparkSession, sf: str) -> DataFrame:
    """Vector->raster rendering (operators/raster.rasterize): the point
    corpus aggregates ONCE into the nonzero pixel-count lattice (pure
    Catalyst — pixel (i,j) of a z11 tile IS the z15 tile at coords
    tile*16+i, the hash-verified grid), per-tile PNG tiles are encoded
    by the in-repo codec, and the returned stats are recomputed FROM
    THE DECODED PIXELS — render, encode, and decode all sit under the
    hash-exact oracle. Bytes are created after the shuffle and never
    shuffled again."""
    from tdei_backend_service_spark.operators import raster
    pts = FX.orders_points(spark, sf)
    tiles = raster.rasterize(pts, TILE_Z - 4, RASTER_PX)
    return raster.decode_tile_stats(tiles)


def _q_raster_pyramid(spark: SparkSession, sf: str) -> DataFrame:
    """Count-space raster pyramid (operators/raster.pyramid_pixel_counts
    + encode_tiles): z11 and z10 tile images from ONE corpus exchange —
    the coarser level integer-halves the nonzero-pixel relation (raw
    counts, clip only at encode), so every decoded level matches the
    floor-arithmetic oracle exactly."""
    from tdei_backend_service_spark.operators import raster
    pts = FX.orders_points(spark, sf)
    pix = raster.pixel_counts(pts, TILE_Z - 4, RASTER_PX)
    pyr = raster.pyramid_pixel_counts(pix, TILE_Z - 4, TILE_Z - 5, RASTER_PX)
    return raster.decode_tile_stats(raster.encode_tiles(pyr, RASTER_PX))


def _q_tile_mosaic(spark: SparkSession, sf: str) -> DataFrame:
    """Image-space overview build (operators/raster.mosaic_tiles): the
    rendered z11 tiles — not the corpus — are decoded in 2x2 sibling
    groups, stitched, and integer-downsampled (2x2 block sum DIV 4) into
    z10 tiles. The oracle replays the same integer arithmetic on the
    pixel lattice, so the decode->stitch->pool->re-encode path is
    hash-exact."""
    from tdei_backend_service_spark.operators import raster
    pts = FX.orders_points(spark, sf)
    tiles = raster.rasterize(pts, TILE_Z - 4, RASTER_PX)
    return raster.decode_tile_stats(raster.mosaic_tiles(tiles, RASTER_PX))


def _q_incremental_geo_visual(spark: SparkSession, sf: str) -> DataFrame:
    """Geo-visual drop admission vs a committed corpus (operators/
    geo_visual.incremental_geo_visual): the corpus ships only its
    narrow (phash, lon, lat) relation — batch records lose to ANY
    corpus match within 5 m + hamming 8 (no id rule: the corpus is
    published) or to a smaller batch id; history is never re-paired.
    Corpus = joint classes k%1270 < 635, batch = classes >= 400 — the
    overlap re-delivery all loses, survivors are exactly the min batch
    key of each batch-only class."""
    from tdei_backend_service_spark.operators.geo_visual import (
        decode_phash_points, incremental_geo_visual)
    imgs = FX.part_images_geo(spark, sf)
    corpus = decode_phash_points(
        imgs.filter(F.col("image_id") % 1270 < 635)).select(
            "phash", "lon", "lat")
    batch = imgs.filter(F.col("image_id") % 1270 >= 400)
    return (incremental_geo_visual(batch, corpus,
                                   radius_m=5.0, max_hamming=8)
            .select(F.col("image_id").cast("long")))


def _q_tile_viewport(spark: SparkSession, sf: str) -> DataFrame:
    """Tile-store round trip (io/tile_store.py): rendered z11 tiles
    land as (z, xs)-partitioned parquet THROUGH the checkpoint manifest
    (per-stripe lineage, resumable), then a viewport read prunes to the
    requested stripes at the directory level (PartitionFilters — pinned
    in tests/test_tile_store.py) before decoding. Stats come from the
    decoded bytes that survived the store round trip."""
    import tempfile
    from tdei_backend_service_spark.io.tile_store import (
        read_viewport, write_tile_layout)
    from tdei_backend_service_spark.operators import raster
    pts = FX.orders_points(spark, sf)
    run_dir = tempfile.mkdtemp(prefix="tile_store_")
    write_tile_layout(raster.rasterize(pts, TILE_Z - 4, RASTER_PX), run_dir)
    vp = read_viewport(spark, run_dir, TILE_Z - 4, 327, 327, 714, 715)
    return raster.decode_tile_stats(
        vp.select(F.lit(TILE_Z - 4).cast("int").alias("z"),
                  "tile_x", "tile_y", "fmt", "bytes"))


def _q_incremental_raster(spark: SparkSession, sf: str) -> DataFrame:
    """Live raster-layer maintenance (operators/raster.
    incremental_raster_tiles): a customer-point drop merges into the
    committed orders-point layer by re-encoding ONLY the tiles the drop
    touches (untouched tiles keep their committed bytes via anti-join).
    The oracle recomputes the whole layer over the union, pinning
    merge == recompute without the corpus rescan."""
    from tdei_backend_service_spark.operators import raster
    committed_pix = raster.pixel_counts(FX.orders_points(spark, sf),
                                        TILE_Z - 4, RASTER_PX)
    committed_tiles = raster.encode_tiles(committed_pix, RASTER_PX)
    drop = FX.customer_images(spark, sf, "A").select("lon", "lat")
    merged = raster.incremental_raster_tiles(
        committed_pix, committed_tiles, drop, TILE_Z - 4, RASTER_PX)
    return raster.decode_tile_stats(merged)


def _q_raster_extract(spark: SparkSession, sf: str) -> DataFrame:
    """The raster->vector round trip (operators/raster.raster_to_points):
    points rasterize into PNG tiles, the tiles decode back into the
    pixel relation at threshold 2 — exactly the lattice rows whose
    clipped count reaches 2, so the full vector->raster->vector loop
    sits under one hash-exact oracle."""
    from tdei_backend_service_spark.operators import raster
    pts = FX.orders_points(spark, sf)
    tiles = raster.rasterize(pts, TILE_Z - 4, RASTER_PX)
    return raster.raster_to_points(tiles, min_value=2)


def _q_raster_focal(spark: SparkSession, sf: str) -> DataFrame:
    """Focal (moving-window) 3x3 box sum over the rendered lattice
    (operators/raster.focal_sum) — heat-map smoothing as two separable
    rank-1 passes, each shuffling only (2r+1) x the nonzero relation.
    The smoothed layer re-encodes into PNG tiles and the stats come
    from the decoded pixels, so smoothing + render sit under the
    floor-arithmetic oracle (clip at encode, AFTER the window sum)."""
    from tdei_backend_service_spark.operators import raster
    pts = FX.orders_points(spark, sf)
    pix = raster.pixel_counts(pts, TILE_Z - 4, RASTER_PX)
    sm = raster.focal_sum(pix, RASTER_PX, radius=1)
    return raster.decode_tile_stats(raster.encode_tiles(sm, RASTER_PX))


def _q_raster_algebra(spark: SparkSession, sf: str) -> DataFrame:
    """Raster algebra / change detection (operators/raster.
    combine_pixel_counts): the order corpus splits into two layers by
    key parity, each rasterizes once, and the pixel-wise |A - B| layer
    renders into tiles — a full-outer join over the two NONZERO pixel
    relations (never corpus rows), zero-difference pixels dropped.
    Stats are recomputed from the decoded diff tiles."""
    from tdei_backend_service_spark.operators import raster
    pts = FX.orders_points(spark, sf)
    a = raster.pixel_counts(pts.filter(F.col("o_orderkey") % 2 == 0),
                            TILE_Z - 4, RASTER_PX)
    b = raster.pixel_counts(pts.filter(F.col("o_orderkey") % 2 == 1),
                            TILE_Z - 4, RASTER_PX)
    diff = raster.combine_pixel_counts(a, b, RASTER_PX, "absdiff")
    return raster.decode_tile_stats(raster.encode_tiles(diff, RASTER_PX))


def _q_zonal_raster(spark: SparkSession, sf: str) -> DataFrame:
    """Zonal statistics over a RENDERED raster (operators/raster.
    zonal_stats): tiles decode back to the pixel-value relation
    (raster_to_points, map-only) and integer zone rectangles aggregate
    count/sum/max per zone through the tile-cover equi-join (zones
    explode to the tiles they span; no nested-loop range join — pinned
    in tests). Zone bounds are deliberately misaligned with the tile
    grid, so windows crossing tile borders are exercised."""
    from tdei_backend_service_spark.operators import raster
    pts = FX.orders_points(spark, sf)
    tiles = raster.rasterize(pts, TILE_Z - 4, RASTER_PX)
    pix = raster.raster_to_points(tiles, min_value=1)
    return (raster.zonal_stats(pix, FX.pixel_zones(spark), RASTER_PX)
            .select(F.col("zone_id").cast("long"),
                    F.col("n_px").cast("long"),
                    F.col("sum_v").cast("long"),
                    F.col("max_v").cast("long")))


def _q_zonal_brightness(spark: SparkSession, sf: str) -> DataFrame:
    """Composition: zonal statistics over the VISUAL layer — the
    decoded-brightness lattice (geo_visual.brightness_pixels) feeds
    the same tile-cover zonal join as any density layer (operators/
    raster.zonal_stats), answering 'how bright is the imagery per
    district' in one pass. Oracle composes the popcount(V) brightness
    closed form with the zone rectangles."""
    from tdei_backend_service_spark.operators import raster
    from tdei_backend_service_spark.operators.geo_visual import \
        brightness_pixels
    imgs = FX.part_images_spread(spark, sf)
    pix = brightness_pixels(imgs, TILE_Z - 4, RASTER_PX)
    return (raster.zonal_stats(pix, FX.pixel_zones(spark), RASTER_PX,
                               value_col="n")
            .select(F.col("zone_id").cast("long"),
                    F.col("n_px").cast("long"),
                    F.col("sum_v").cast("long"),
                    F.col("max_v").cast("long")))


def _q_raster_hotspots(spark: SparkSession, sf: str) -> DataFrame:
    """Neighborhood-density hotspots: 3x3 focal sum over the lattice,
    then the top 20 pixels under the deterministic total order (value
    desc, gx, gy) — Catalyst plans the sort+limit as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    from tdei_backend_service_spark.operators import raster
    pts = FX.orders_points(spark, sf)
    pix = raster.pixel_counts(pts, TILE_Z - 4, RASTER_PX)
    sm = raster.focal_sum(pix, RASTER_PX, radius=1)
    return (raster.hotspots(sm, 20)
            .select(F.col("gx").cast("long"), F.col("gy").cast("long"),
                    F.col("v").cast("long")))


def _q_zone_burnin(spark: SparkSession, sf: str) -> DataFrame:
    """Areal vector->raster (operators/raster.rasterize_zones): the
    integer zone rectangles burn into the lattice at weight zone_id+1
    (two sequence explodes — work = burned area), the result
    monoid-adds onto the order-point density layer
    (combine_pixel_counts 'add'), and the composite renders to tiles.
    Stats come from the decoded pixels, so burn + combine + render sit
    under one floor-arithmetic oracle."""
    from tdei_backend_service_spark.operators import raster
    pts = FX.orders_points(spark, sf)
    pix = raster.pixel_counts(pts, TILE_Z - 4, RASTER_PX)
    burn = raster.rasterize_zones(FX.pixel_zones(spark), TILE_Z - 4,
                                  RASTER_PX, weight=F.col("zone_id") + 1)
    layer = raster.combine_pixel_counts(pix, burn, RASTER_PX, "add")
    return raster.decode_tile_stats(raster.encode_tiles(layer, RASTER_PX))


VIEWPORT_QUERY_CLASS = 37
VIEWPORT_BBOX = (-121.9975, 47.0025, -121.9935, 47.0065)  # sites 3..6


def _q_viewport_similar(spark: SparkSession, sf: str) -> DataFrame:
    """Viewport visual search (operators/geo_visual.viewport_similar):
    top-25 images inside the bbox (planted sites 3..6) by hamming
    distance between a query hash (class 37's closed-form value) and
    the phash RECOMPUTED from each decoded blob. The bbox filter runs
    before the decode (only viewport rows reach Python) and the ranked
    cut is TakeOrderedAndProject. The oracle recomputes every distance
    in SQL from the planted hash law — xor + 61-term popcount."""
    from tdei_backend_service_spark.operators.geo_visual import \
        viewport_similar
    imgs = FX.part_images_geo(spark, sf)
    qh = FX.phash_class_value(VIEWPORT_QUERY_CLASS)
    return (viewport_similar(imgs, qh, VIEWPORT_BBOX, k=25)
            .select(F.col("image_id").cast("long"),
                    F.col("hamming").cast("long")))


def _q_viewport_caption_similar(spark: SparkSession, sf: str) -> DataFrame:
    """Three-tier atlas search (geo x caption x visual) in ONE query
    (operators/geo_visual.viewport_similar with caption_token): bbox
    and caption-substring filters precede the decode — only matching
    viewport rows ever reach Python — then the ranked hamming cut.
    Oracle: the viewport_similar closed form with the caption LIKE
    restriction on the planted 'cap-<k%89>' captions."""
    from tdei_backend_service_spark.operators.geo_visual import \
        viewport_similar
    imgs = FX.part_images_geo(spark, sf).withColumn(
        "caption", F.concat(F.lit("cap-"),
                            (F.col("image_id") % 89).cast("string")))
    qh = FX.phash_class_value(VIEWPORT_QUERY_CLASS)
    return (viewport_similar(imgs, qh, VIEWPORT_BBOX, k=25,
                             caption_token="cap-7")
            .select(F.col("image_id").cast("long"),
                    F.col("hamming").cast("long")))


def _q_geo_visual_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """The A+B flagship composition (operators/geo_visual.py): a record
    loses iff a smaller id sits within 5 m AND within hamming 8 of its
    RECOMPUTED perceptual hash (real decode -> ahash64, padded-cell
    candidate join, JVM bit_count verify). The planted 10-site lattice
    disagrees with the 127 pixel classes on purpose, so survivors are
    exactly the min of each joint k % 1270 class."""
    from tdei_backend_service_spark.operators.geo_visual import \
        geo_visual_dedup
    imgs = FX.part_images_geo(spark, sf)
    return (geo_visual_dedup(imgs, radius_m=5.0, max_hamming=8)
            .select(F.col("image_id").cast("long")))


def _q_union_cc(spark: SparkSession, sf: str) -> DataFrame:
    """The engine's one ITERATIVE algorithm under the oracle: exact
    connected components (union_dataset collapse='cc', pointer-jumped
    min-label propagation with localCheckpoint lineage cuts) over
    planted 4-member proximity CHAINS whose duplicate relation is a
    path — the default min-winner pass would keep extra members; cc
    must keep exactly the min-rank node per chain."""
    imgs = FX.chain_images(spark, sf)
    return (union_dataset(imgs, "ds-A", imgs, "ds-B", collapse="cc")
            .select("image_id"))


def _q_audio_features(spark: SparkSession, sf: str) -> DataFrame:
    """REAL audio path: PCM16 WAV blobs (codecs/audio.py, a public
    container parsed with numpy alone) carrying planted square waves
    with closed-form integer features (fixtures_tpch.supplier_audio) —
    WAV parse + DSP get a full SQL oracle."""
    from tdei_backend_service_spark.pipeline.multimodal import \
        extract_audio_features
    return extract_audio_features(FX.supplier_audio(spark, sf))


def _q_video_frames(spark: SparkSession, sf: str) -> DataFrame:
    """REAL video frame sampling over the vraw container
    (codecs/video.py): every 2nd frame of planted constant-fill videos;
    sampled (idx, dims, pixel sum) are closed-form integers."""
    from tdei_backend_service_spark.pipeline.multimodal import \
        sample_video_frames
    return (sample_video_frames(FX.supplier_videos(spark, sf), every_n=2)
            .select("video_id", "frame_idx", "frame_w", "frame_h",
                    "frame_sum"))


def _q_decode_meta(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decode under the HASH oracle (VERDICT r3 next #7):
    png/qimg blobs planted over part keys (fixtures_tpch.part_images)
    are decoded by mapInPandas and ONLY decode-derived values are
    emitted — dims from the decoded array, phash recomputed by ahash64.
    The fixture's constant-row-block construction makes both closed-form
    (ahash bits = bits of an even m, so the 64-bit hash is an integer
    polynomial SQL can state), leaving only pixel PSNR to pytest."""
    from tdei_backend_service_spark.pipeline.multimodal import decode_metadata
    return decode_metadata(FX.part_images(spark, sf))


def _q_augment_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic augmentation under the hash oracle (pipeline/
    multimodal.augment_images): each planted blob decodes once, fans out
    to flip_h / rot90 / crop_tl, re-encodes losslessly, and the returned
    (w, h, sum_px) are recomputed FROM THE RE-DECODED augmented bytes.
    Flips/rotation preserve the total pixel sum; the top-left crop keeps
    exactly the quadrant bits of the planted pattern — both closed-form
    integer SQL (popcounts of V stated as 61-term bit extractions)."""
    from tdei_backend_service_spark.pipeline.multimodal import (
        augment_images, decode_pixel_sums)
    aug = augment_images(FX.part_images(spark, sf),
                         ops=("flip_h", "rot90", "crop_tl"))
    return decode_pixel_sums(aug)


def _q_pack_docs(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing (pipeline/curation.pack_documents): shard ->
    window token-cumsum -> document-boundary block pack assignment.
    Pure Catalyst window arithmetic over the same ws-token expression the
    token_count oracle pins, so every (shard, pack_id, pack_offset) is
    SQL-exact."""
    from tdei_backend_service_spark.pipeline.curation import pack_documents
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    toks = TX.with_token_counts(docs).select(
        "doc_id", F.col("n_tokens_ws").cast("long").alias("n_tokens"))
    return (pack_documents(toks, budget=256, n_shards=8)
            .select("doc_id", "n_tokens", "shard", "pack_id", "pack_offset"))


def _q_sample_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sampling (pipeline/curation.
    sample_per_key): 20 docs per source domain, ranked by a seeded
    integer scramble both engines compute bit-identically — the
    reproducible eval-set construction op. The oracle row pins the
    ``method="scramble"`` path (affine Knuth permutation, ANSI-exact in
    range-validated int64); the production default is ``xxhash64``,
    differential-tested in tests/test_curation.py against stride-
    patterned ids the affine map would bias."""
    from tdei_backend_service_spark.pipeline.curation import sample_per_key
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (sample_per_key(docs, "source", k=20, method="scramble")
            .select("doc_id", "source"))


MIX_WEIGHTS = {"src0": (3, 1), "src1": (1, 3), "src2": (2, 3),
               "src3": (5, 2)}


def _q_mix_domains(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted domain-mixture resampling (pipeline/curation.
    mix_domains): per-source rational target rates (src0 3x up, src1
    1/3 down, src2 2/3, src3 5/2, rest unchanged) via the telescoping
    integer copy rule — floor(rk*num/den) - floor((rk-1)*num/den)
    replicas per rank — so every emitted (doc_id, copy) row is
    SQL-exact. One window exchange + a map explode."""
    from tdei_backend_service_spark.pipeline.curation import mix_domains
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (mix_domains(docs, "source", MIX_WEIGHTS, method="scramble")
            .select("doc_id", "source",
                    F.col("copy").cast("long").alias("copy")))


def _q_geo_split(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-aware geo holdout (pipeline/curation.geo_split, r6):
    every record in the same depth-20 grid cell (~343 m lon x 172 m
    lat blocks) gets the same train/val/test label, so co-located
    near-duplicates never straddle an eval boundary. Pure narrow map —
    two JVM floors + the affine scramble hash + a CASE; zero shuffle.
    The oracle replays the identical closed form (pow-2 cell divisions
    are exact exponent shifts, so the floors are engine-identical)."""
    from tdei_backend_service_spark.pipeline.curation import geo_split
    pts = FX.orders_points(spark, sf)
    out = geo_split(pts, {"train": 0.8, "val": 0.1, "test": 0.1},
                    depth=20, method="scramble")
    return out.select("o_orderkey", "split")


def _q_domain_split(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-holdout split (geo_split group_col mode, r6): the split
    unit is the SOURCE domain (integer suffix of 'src<k>'), so entire
    domains land in one split — the held-out-domain eval practice.
    Same pure narrow map as the cell path; scramble keeps it
    SQL-exact."""
    from tdei_backend_service_spark.pipeline.curation import geo_split
    docs = (spark.read.parquet(f"{sf}/documents.parquet")
            .withColumn("_gid", F.substring("source", 4, 10).cast("long")))
    out = geo_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                    group_col="_gid", method="scramble")
    return out.select("doc_id", "source", "split")


def _q_split_leak(spark: SparkSession, sf: str) -> DataFrame:
    """Split leakage audit (pipeline/curation.split_leak_audit, r6):
    planted A/B duplicate pairs (0.22 m apart, equal phash+caption)
    where side A is all 'train' and side B is labeled by phash parity
    — exactly the odd-custkey dup pairs leak. Same banded candidate
    shape as union_dataset (cover explode + (cell, payload) equi-join
    + refine); never all-pairs."""
    from tdei_backend_service_spark.pipeline.curation import split_leak_audit
    a = (FX.customer_images(spark, sf, "A")
         .withColumn("split", F.lit("train")))
    b = (FX.customer_images(spark, sf, "B")
         .withColumn("split", F.when(F.col("phash") % 2 == 0,
                                     F.lit("train")).otherwise(F.lit("test"))))
    return split_leak_audit(a.unionByName(b))


def _q_ngram_top(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus bigram statistics (pipeline/text.ngram_counts): top 50
    bigrams with counts — transform-over-sequence n-gram build on the
    pinned whitespace split, one partial-aggregated exchange,
    TakeOrderedAndProject top-k with a deterministic tie-break."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return TX.ngram_counts(docs, n=2, top_k=50)


def _q_quantize_vecs(spark: SparkSession, sf: str) -> DataFrame:
    """Int8 embedding quantization (similarity.quantize_embeddings) —
    pure Catalyst, every step a deterministic IEEE double op, so the
    per-vector integer summaries of the codes (sum / min / max / L1)
    are SQL-exact over the organic embeddings table."""
    q = SIM.quantize_embeddings(
        spark.read.parquet(f"{sf}/embeddings.parquet"))
    code = F.col("q_embedding")
    as_long = F.transform(code, lambda x: x.cast("long"))
    return q.select(
        "vec_id",
        F.aggregate(as_long, F.lit(0).cast("long"),
                    lambda a, x: a + x).alias("q_sum"),
        F.array_min(code).cast("long").alias("q_min"),
        F.array_max(code).cast("long").alias("q_max"),
        F.aggregate(as_long, F.lit(0).cast("long"),
                    lambda a, x: a + F.abs(x)).alias("q_l1"))


def _q_quality_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Per-domain quality-percentile cut (pipeline/curation.
    filter_top_fraction): keep the top HALF of each source domain by
    the pinned quality_score — the keep rule is integer rank
    arithmetic, so the survivor set is SQL-exact (score values are
    engine-identical per the text_quality oracle; ties break on id)."""
    from tdei_backend_service_spark.pipeline.curation import \
        filter_top_fraction
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    scored = TX.with_quality(docs)
    return (filter_top_fraction(scored, "quality_score", "source",
                                num=1, den=2)
            .select("doc_id", "source"))


# eval set = documents with doc_id % 41 == 0 AND doc_id < 500: a FIXED
# 13-doc benchmark at every SF (an eval set does not grow with the
# training corpus; unbounded growth would trigram-saturate the 31-word
# vocabulary and contaminate everything at sf0.1)
DECONTAM_MOD = 41
DECONTAM_CAP = 500
_EV_PRED_SQL = f"(doc_id % {DECONTAM_MOD} = 0 AND doc_id < {DECONTAM_CAP})"


def _decontam_tables(spark: SparkSession, sf: str):
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    is_ev = (F.col("doc_id") % DECONTAM_MOD == 0) & \
            (F.col("doc_id") < DECONTAM_CAP)
    return docs.filter(~is_ev), docs.filter(is_ev)


def _q_decontam_hits(spark: SparkSession, sf: str) -> DataFrame:
    """Eval-set decontamination evidence (pipeline/cleanse.
    contamination_hits): distinct word trigrams of each training doc
    matched against the broadcast eval-trigram set — per-doc hit
    counts, the GPT-3-style n-gram overlap rule. Corpus side is a
    map-only explode into the broadcast join; only matches shuffle."""
    from tdei_backend_service_spark.pipeline.cleanse import \
        contamination_hits
    train, ev = _decontam_tables(spark, sf)
    return (contamination_hits(train, ev, n=3)
            .select("doc_id", F.col("n_hits").cast("long").alias("n_hits")))


def _q_decontam_survivors(spark: SparkSession, sf: str) -> DataFrame:
    """Decontaminated corpus (pipeline/cleanse.decontaminate): training
    docs with >= 1 distinct trigram shared with the eval set are
    dropped via a broadcast anti join — the corpus never shuffles."""
    from tdei_backend_service_spark.pipeline.cleanse import decontaminate
    train, ev = _decontam_tables(spark, sf)
    return decontaminate(train, ev, n=3, min_hits=1).select(
        "doc_id", "source")


def _q_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate line removal (pipeline/cleanse.dedup_lines) over the
    lined corpus (fixtures_tpch.lined_documents: 8-word lines + two
    planted boilerplate lines on the %3/%5 residues): lines recurring
    in > 30 docs are killed via a broadcast frequent-line relation and
    surviving lines reassemble in original order — cleaned text plus
    kept/removed counts, all SQL-replicable."""
    from tdei_backend_service_spark.pipeline.cleanse import dedup_lines
    docs = FX.lined_documents(spark, sf)
    return (dedup_lines(docs, max_doc_freq=30)
            .select("doc_id", "text",
                    F.col("n_lines_kept").cast("long").alias("n_lines_kept"),
                    F.col("n_lines_removed").cast("long")
                    .alias("n_lines_removed")))


def _q_zonal_image_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Zonal statistics over geotagged IMAGE METADATA — the A+B
    composition: the real polygon PIP join (two-phase cell join +
    ray-cast refine) aggregating per-zone image counts and size stats
    (count/sum/max through the reference's null-filtered aggregate
    graft), while the closed-form key lattice keeps every aggregate
    integer-exact for the SQL oracle."""
    zones = FX.quad_zones(spark, side=4, dataset_id="tpch-z")
    imgs = FX.orders_images(spark, sf)
    out = spatial_join(zones, "zone", "tpch-z", imgs, "point", "tpch",
                       "ST_Intersects(geometry_target, geometry_source)",
                       ["count(*) as n", "sum(w) as sum_w",
                        "max(h) as max_h"])
    p = F.col("props")
    return out.select("zone_id",
                      p.getItem("ext:n").cast("bigint").alias("n"),
                      p.getItem("ext:sum_w").cast("bigint").alias("sum_w"),
                      p.getItem("ext:max_h").cast("bigint").alias("max_h"))


def _q_curate_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """Composed curation flagship: per-domain quality cut (top half by
    the pinned quality_score) THEN eval-set decontamination (trigram
    overlap vs the %41 eval residue) — two oracled tiers chained in one
    query, proving the stages compose without re-reading the corpus.
    Survivor set stays integer/rank-exact, so the composition carries a
    full SQL oracle (nested CTEs of the two stage oracles)."""
    from tdei_backend_service_spark.pipeline.cleanse import decontaminate
    from tdei_backend_service_spark.pipeline.curation import \
        filter_top_fraction
    train, ev = _decontam_tables(spark, sf)
    scored = TX.with_quality(train)
    kept = filter_top_fraction(scored, "quality_score", "source",
                               num=1, den=2)
    return decontaminate(kept, ev, n=3, min_hits=1).select(
        "doc_id", "source")


def _q_corpus_shuffle(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global corpus shuffle (pipeline/curation.
    global_shuffle): every doc's dense training-order position under
    the seeded permutation, via the distributed two-phase rank (top-bit
    range buckets -> one exchange + per-bucket row_number -> driver
    cumsum of bucket counts) — NOT a single-partition global window.
    The oracle row pins the scramble permutation; xxhash64 is the
    production default, differential-tested in tests/test_curation.py."""
    from tdei_backend_service_spark.pipeline.curation import global_shuffle
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return (global_shuffle(docs, method="scramble")
            .select("doc_id", "shuffle_pos"))


def _q_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """PII scrubbing (pipeline/cleanse.redact_pii) over the planted-PII
    corpus (fixtures_tpch.pii_documents): emails then phone numbers
    replaced by tokens with per-doc counts — map-only regex stages in
    whole-stage codegen, patterns restricted to the Java-regex/RE2
    common subset so the redacted text itself is oracle-exact."""
    from tdei_backend_service_spark.pipeline.cleanse import redact_pii
    return redact_pii(FX.pii_documents(spark, sf))


def _q_image_phash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Image near-dedup by PERCEPTUAL HASH — the canonical image-corpus
    dedup for training data — run over the REAL decode path: part_images
    blobs -> mapInPandas decode + ahash64 recompute (decode_metadata) ->
    generic banded-hamming LSH dedup (pipeline/dedup.hash_neardup, the
    same core simhash_dedup uses). Keys sharing k%127 are planted
    pixel-identical duplicates; the survivor set is closed-form
    (min key per residue class) because cross-class hashes sit >= 17
    bits apart and every class owns its own bucket in all 4 bands."""
    from tdei_backend_service_spark.pipeline.dedup import hash_neardup
    from tdei_backend_service_spark.pipeline.multimodal import decode_metadata
    # persist the decode output: hash_neardup's final anti-join
    # re-evaluates its input plan, and a second pass here would mean
    # decoding every image twice
    meta = decode_metadata(FX.part_images(spark, sf)).persist()
    return (hash_neardup(meta, "phash", "image_id", max_hamming=3)
            .select("image_id"))


def _q_incremental_phash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental ingest dedup (pipeline/dedup.incremental_hash_neardup)
    over the REAL decode path: the committed corpus is the stored narrow
    phash relation of classes k%127 < 80; a new drop delivers classes
    k%127 >= 60 — 20 classes overlap (re-delivery; every such batch row
    loses to the corpus, no id comparison), classes >= 80 are new (the
    ordinary within-batch min-id rule admits one winner each). Survivors
    = min part key per batch-only class, closed-form because classes are
    pixel-identical within and >= 17 hamming bits apart across
    (fixtures_tpch.phash_class_value)."""
    from tdei_backend_service_spark.pipeline.dedup import \
        incremental_hash_neardup
    from tdei_backend_service_spark.pipeline.multimodal import decode_metadata
    # decode once, split after: the corpus side only needs the narrow
    # (phash) relation, exactly what a previous drop would have stored
    meta = decode_metadata(FX.part_images(spark, sf)).persist()
    corpus = meta.filter(F.col("image_id") % 127 < 80).select("phash")
    batch = (meta.filter(F.col("image_id") % 127 >= 60)
             .select("image_id", "phash"))
    return (incremental_hash_neardup(batch, corpus, "phash", "image_id",
                                     max_hamming=3)
            .select("image_id"))


def _q_store_phash_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """The incremental_phash_dedup scenario served from the BUCKETED
    signature store (pipeline/ingest_drop.SignatureStore): the corpus
    phashes are committed once with bucketBy(band, bucket), then the
    drop dedups against the store — same survivor set as the plain
    incremental operator (same oracle), but the corpus side of the
    candidate join is scanned pre-partitioned with zero exchange."""
    import re
    import tempfile

    from tdei_backend_service_spark.pipeline.ingest_drop import \
        SignatureStore
    from tdei_backend_service_spark.pipeline.multimodal import decode_metadata
    meta = decode_metadata(FX.part_images(spark, sf)).persist()
    corpus = meta.filter(F.col("image_id") % 127 < 80).select("phash")
    batch = (meta.filter(F.col("image_id") % 127 >= 60)
             .select("image_id", "phash"))
    table = "sig_store_" + re.sub(r"\W", "_", sf).strip("_")
    store = SignatureStore(spark, table, n_buckets=8,
                           path=tempfile.mkdtemp(prefix="sigstore_"))
    store.write(corpus)
    return (store.dedup_batch(batch, "phash", "image_id", max_hamming=3)
            .select("image_id"))


def _q_incremental_union(spark: SparkSession, sf: str) -> DataFrame:
    """Geospatial incremental ingest: admit a new drop into an
    already-unioned dataset (operators/union_dataset.
    incremental_union_dataset) — a batch record loses to any committed
    record within proximity sharing the payload keys (no rank rule), or
    to the min-winner rule within the drop. Scenarios per custkey % 4
    exercise corpus-proximity loss, payload-key mismatch survival,
    within-batch loss, and distance survival — see
    fixtures_tpch.planted_union_batch."""
    corpus, batch = FX.planted_union_batch(spark, sf)
    return (incremental_union_dataset(batch, corpus)
            .select("image_id"))


def _q_incremental_minhash(spark: SparkSession, sf: str) -> DataFrame:
    """Text-tier incremental ingest dedup
    (pipeline/dedup.incremental_minhash_dedup): the committed corpus
    ships ONLY its stored MinHash signature relation (no texts); exact
    copies in the drop agree on every signature component and lose,
    near-misses (Jaccard ~0.33) stay far below the 0.8 agreement
    threshold and survive, and exact copies of those near-misses lose
    within the batch under the full exact verify. Survivors = the
    near-miss rows exactly — see fixtures_tpch.planted_document_batch."""
    from tdei_backend_service_spark.pipeline.dedup import (
        incremental_minhash_dedup, minhash_signatures)
    corpus, batch = FX.planted_document_batch(spark, sf)
    corpus_sigs = minhash_signatures(corpus).select("minhash")
    return (incremental_minhash_dedup(batch, corpus_sigs, threshold=0.8)
            .select("doc_id"))


def _q_incremental_embedding_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Vector-side incremental ingest dedup
    (pipeline/dedup.incremental_embedding_dedup): the committed corpus
    is the base embeddings table (vector-only relation); the new drop
    carries exact copies of corpus vectors (lose to the corpus, no id
    rule), negated vectors (cos = -1 vs parent — far from the whole
    corpus), and exact copies of those negated vectors (lose WITHIN the
    batch to the smaller id). Survivors = the negated rows exactly —
    see fixtures_tpch.planted_embedding_batch."""
    from tdei_backend_service_spark.pipeline.dedup import \
        incremental_embedding_dedup
    corpus, batch = FX.planted_embedding_batch(spark, sf)
    return (incremental_embedding_dedup(batch, corpus, threshold=0.98)
            .select("vec_id"))


def _q_store_embedding_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """The incremental_embedding_dedup scenario served from the
    BUCKETED vector store (pipeline/ingest_drop.VectorStore): corpus
    vectors committed once hyperplane-keyed and bucketed on
    (_band, _bkt); the drop joins them with zero corpus-side exchange.
    Same survivor semantics, same oracle."""
    import re
    import tempfile

    from tdei_backend_service_spark.pipeline.ingest_drop import VectorStore
    corpus, batch = FX.planted_embedding_batch(spark, sf)
    table = "vec_store_" + re.sub(r"\W", "_", sf).strip("_")
    store = VectorStore(spark, table, n_buckets=8,
                        path=tempfile.mkdtemp(prefix="vecstore_"))
    store.write(corpus)
    return store.dedup_batch(batch, threshold=0.98).select("vec_id")


def _q_cross_modal_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-modal (image OR caption) dedup in one pass
    (pipeline/dedup.cross_modal_dedup): real decode -> recomputed-phash
    banded-hamming losers, UNIONed with exact caption-fingerprint
    losers, one anti-join. The planted fixture makes the modalities
    disagree on purpose (pixel classes k%127 vs caption classes k%89),
    so the survivor set is closed-form: keys that are the minimum of
    BOTH classes. Decode runs exactly once (plan-pinned in
    tests/test_dedup.py)."""
    from tdei_backend_service_spark.pipeline.dedup import cross_modal_dedup
    imgs = FX.part_images_captioned(spark, sf)
    return (cross_modal_dedup(imgs, "image_id", "caption", max_hamming=3)
            .select("image_id"))


def _q_streaming_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Stateful STREAMING dedup (applyInPandasWithState, streaming/
    dedup.py) driven end-to-end: two micro-batch drops — the documents
    corpus, then planted cross-batch duplicates (+1e6 ids, same text)
    plus genuinely-new docs (+3e6 ids, text suffixed) — through the
    first-seen-wins stateful operator with a restart between drops (the
    checkpoint carries keyed state). The admitted set is closed-form:
    all originals + the new docs; every planted duplicate must be
    dropped by state. Returned as a batch read of the sink, so the
    custom stateful streaming op gets a FULL SQL oracle."""
    import os
    import tempfile

    from pyspark.sql import types as T

    from tdei_backend_service_spark.streaming.dedup import start_dedup_ingest
    from tdei_backend_service_spark.streaming.state import \
        stream_state_partitions
    base = tempfile.mkdtemp(prefix="stream_dedup_q_")
    landing = os.path.join(base, "landing")
    out = os.path.join(base, "out")
    ckpt = os.path.join(base, "ckpt")
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    def _drain(q, what: str) -> None:
        # confirm the availableNow run actually finished before touching
        # the checkpoint again — a silent q.stop() here would read a
        # partial sink or break the second start (ADVICE r3 low #3)
        q.awaitTermination(240)
        if q.isActive:
            q.stop()
            raise TimeoutError(f"streaming dedup {what} drop did not "
                               f"drain within 240s")

    docs = (spark.read.parquet(f"{sf}/documents.parquet")
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text"))
    # each drop lands as ONE file: the min-doc_id winner rule is
    # per-micro-batch, so a drop must not be chunked across batches
    docs.coalesce(1).write.mode("overwrite").parquet(landing)
    # state partitions pinned for the query's lifetime at first start
    # (streaming/state.py); the restart reuses the checkpoint's value
    with stream_state_partitions(spark):
        _drain(start_dedup_ingest(spark, landing, out, ckpt, schema),
               "first")
        dups = (docs.filter(F.col("doc_id") % 5 == 0)
                .select((F.col("doc_id") + 1_000_000).alias("doc_id"),
                        "text"))
        fresh = (docs.filter(F.col("doc_id") % 11 == 0)
                 .select((F.col("doc_id") + 3_000_000).alias("doc_id"),
                         F.concat(F.col("text"), F.lit(" v2"))
                         .alias("text")))
        (dups.unionByName(fresh).coalesce(1)
             .write.mode("append").parquet(landing))
        _drain(start_dedup_ingest(spark, landing, out, ckpt, schema),
               "second")
    return spark.read.parquet(out).select("doc_id")


# ---------------------------------------------------------------------------
# contract functions
# ---------------------------------------------------------------------------


def _q_graph_hops(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-source BFS (operators/graph.hop_distance): hop counts
    within 20 traversals from the corridor-start seeds over the
    chain+shortcut customer graph. The Spark side runs the real
    frontier iteration (two-layer anti-join, localCheckpoint lineage
    cuts); the oracle is DuckDB WITH RECURSIVE over the identical
    integer edge rule — layered walk enumeration reduced by MIN(hops),
    exact because hops are bounded and deduplicated per (node, hops)."""
    return graph_hop_distance(
        FX.chain_graph(spark, sf), FX.chain_graph_seeds(spark, sf),
        max_hops=20)


def _q_network_distance(spark: SparkSession, sf: str) -> DataFrame:
    """Hop-bounded shortest network distance (operators/graph.
    network_distance): synchronous Bellman-Ford over the integer
    meter weights, 20 relaxation rounds — shortcut edges (130 m vs
    ~500 m of chain) must win wherever they help. Exact long
    arithmetic end to end."""
    return graph_network_distance(
        FX.chain_graph(spark, sf), FX.chain_graph_seeds(spark, sf),
        max_rounds=20)


def _q_triangle_count(spark: SparkSession, sf: str) -> DataFrame:
    """Per-node triangle counts (operators/graph.triangle_count) over
    the triangle-rich chain+wedge customer graph: degree-ordered
    orientation on the Spark side (each triangle found once at its
    lowest-rank corner, out-degree capped ~sqrt(E) on any skew); the
    oracle enumerates 3-cliques by id-ordering — same set, so the
    per-node participation counts agree exactly. Reversed-duplicate
    fixture edges pin the canonicalization."""
    return graph_triangle_count(FX.tri_graph(spark, sf))


def _q_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Integer-exact damped PageRank (operators/graph.pagerank), five
    synchronous power iterations over the DIRECTED chain+shortcut
    graph in 10^-12 fixed-point units — every division is integer DIV
    so DuckDB's unrolled-CTE replica lands on identical longs. The
    corridor shape makes ranks genuinely non-uniform: corridor heads
    lose their upstream source, shortcut targets gain a second
    in-edge."""
    return graph_pagerank(FX.chain_graph(spark, sf), n_iter=5)


def _q_connected_components(spark: SparkSession, sf: str) -> DataFrame:
    """Connected components (operators/graph.connected_components):
    REAL min-label propagation with pointer jumping over the
    chain+shortcut graph — the "which sidewalk islands exist" query.
    The corridor construction makes components closed-form: node n
    belongs to corridor floor((n-1)/100), whose minimum node id is
    100*floor((n-1)/100)+1, so the oracle is pure integer SQL while
    the Spark side runs the full O(log d) iterative collapse."""
    return graph_connected_components(FX.chain_graph(spark, sf))


def _q_tfidf_search(spark: SparkSession, sf: str) -> DataFrame:
    """Keyword retrieval (pipeline/text.tfidf_topk): top-25 documents
    for a 4-term query under rational TF-IDF — integer idf weights
    (N*1e6 DIV df), tf filtered to the query vocabulary before any
    exchange, TakeOrderedAndProject for the cut. Ties break on doc_id
    so the LIMIT boundary is deterministic in both engines."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return TX.tfidf_topk(docs, ["spark", "hash", "window", "vector"], k=25)


def _q_kcore(spark: SparkSession, sf: str) -> DataFrame:
    """2-core of the chain+shortcut graph (operators/graph.kcore):
    REAL iterative peeling on the Spark side — drop degree<2 nodes,
    induce, repeat to fixpoint. The oracle is the closed form the
    corridor shape implies: each corridor's 2-core runs from its
    first shortcut base to the end of its last COMPLETE 6-cycle
    (chain tails and any trailing incomplete cycle peel away; paths
    BETWEEN cycles survive because both anchors persist)."""
    return graph_kcore(FX.chain_graph(spark, sf), k=2)


def _q_link_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Link prediction (operators/graph.neighbor_jaccard): top-60
    non-edge pairs of the triangle-rich graph by integer neighbor
    Jaccard (common*1e6 DIV (du+dv-common)) — wedge-generated
    candidates, existing edges anti-joined out, (score, u, v) total
    order at the cut."""
    return graph_neighbor_jaccard(FX.tri_graph(spark, sf), k=60)


def _q_service_area(spark: SparkSession, sf: str) -> DataFrame:
    """Network service area x image corpus — the full A+B composition:
    every geotagged point kNN-tags to its nearest grid edge through
    the REAL two-phase padded-cover join (dataset_tag_road), connector
    edges chain the ten grid edges into one corridor (node 2k+1 ->
    2k+2), the REAL multi-source BFS (operators/graph.hop_distance)
    measures hops from depot node 0, and a point belongs to the
    12-hop service area iff min(hops at its edge's endpoints) <= 12.
    The oracle replays both closed forms: nearest edge k from the lat
    lattice, and node 2k sitting exactly 2k hops down the corridor —
    so the row verifies the composed pipeline, while graph_hops /
    knn_tag verify each kernel in isolation."""
    pts = FX.orders_points(spark, sf)
    edges = FX.grid_edges(spark)
    tagged = (dataset_tag_road(pts, "tpch", edges, "tpch-edges",
                               attrs=["highway"], cutoff_m=KNN_CUTOFF_M,
                               pk="o_orderkey")
              .filter(F.col("nearest_edge_id").isNotNull()))
    grid_nodes = edges.select("edge_id", "orig_node_id", "dest_node_id")
    conn = spark.range(9).select(
        (2 * F.col("id") + 1).alias("orig_node_id"),
        (2 * F.col("id") + 2).alias("dest_node_id"))
    g = grid_nodes.select("orig_node_id", "dest_node_id").unionByName(conn)
    seeds = spark.range(1).select(F.lit(0).cast("long").alias("node"))
    hops = graph_hop_distance(g, seeds, max_hops=12)
    edge_hops = (grid_nodes
                 .join(hops.withColumnsRenamed(
                     {"node": "orig_node_id", "hops": "h1"}),
                     "orig_node_id", "left")
                 .join(hops.withColumnsRenamed(
                     {"node": "dest_node_id", "hops": "h2"}),
                     "dest_node_id", "left")
                 .select("edge_id", F.least("h1", "h2").alias("edge_hops"))
                 .filter(F.col("edge_hops").isNotNull()))
    return (tagged.join(edge_hops,
                        tagged["nearest_edge_id"] == edge_hops["edge_id"])
            .select("o_orderkey", "edge_id",
                    F.col("edge_hops").cast("int")))


def _q_postings(spark: SparkSession, sf: str) -> DataFrame:
    """Inverted-index construction (pipeline/text.build_postings):
    one row per vocabulary term with df and the ascending
    comma-joined posting list. Terms dedupe within each document
    map-side, so the exchange carries exactly the index size; the
    posting list is a string so the oracle equality is plain value
    comparison in both engines."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return TX.build_postings(docs)


def _q_cooccur_pmi(spark: SparkSession, sf: str) -> DataFrame:
    """Windowed co-occurrence + integer PMI (pipeline/text.
    cooccur_pmi): ordered token pairs within a 2-token window,
    scored (c_uv * T * 1e6) DIV (c_u * c_v) — Spark generates pairs
    map-side via nested transform-over-sequence (no positional
    self-join); the oracle replays them with a positional self-join.
    Same multiset, bit-identical scores."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return TX.cooccur_pmi(docs, window=2, k=50, min_count=2)


def _q_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 retrieval (pipeline/text.bm25_topk): top-25 documents for
    a 4-term query under the rational BM25 saturation law (k1=6/5,
    b=3/4) — clearing denominators by 20*S turns the per-term
    saturation fraction into ONE integer division, so the score is
    pure int64 and DuckDB replays the ranking bit-exactly. Unlike
    tfidf_search, long documents are length-normalized and repeated
    terms saturate."""
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    return TX.bm25_topk(docs, ["merge", "vector", "scan", "hash"], k=25)


def _q_viewport_tfidf(spark: SparkSession, sf: str) -> DataFrame:
    """Geo-scoped keyword search — the A+B retrieval composition: the
    engine's bbox operator (pure-Catalyst pushdown) scopes geotagged
    documents to the standard viewport FIRST, then tfidf_topk ranks
    inside it with viewport-LOCAL idf (df and N measured over the
    scoped corpus — rarity inside the viewport is what matters to a
    map search box). Two tiers compose without a new operator."""
    docs = FX.derive_lonlat(
        spark.read.parquet(f"{sf}/documents.parquet"), "doc_id")
    scoped = bbox_filter_points(docs, BBOX)
    return TX.tfidf_topk(scoped, ["merge", "vector", "scan"], k=15)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: two-phase spatial join (edge x derived points) at sf0.001."""
    return _q_join_count(spark, "/root/testdata/sf0.001")


#: Driver-verification rotation (VERDICT r5 next #1): the correctness
#: driver hashes the FIRST ~50 rows of queries(), so rows lead in order
#: of driver-coverage staleness — the 41 rows never driver-hashed, this
#: round's new rows, then the oldest (r4-verified) rows; everything else
#: keeps its r4/r5 green plus the check_oracle sweep. Rotate per round.
_LEAD_ROWS = ['corpus_report', 'hamming_cluster_dedup', 'cluster_keep_best', 'embedding_cluster_dedup', 'ivf_quantized_topk', 'ivf_indexed_topk', 'augment_meta', 'cross_modal_dedup', 'incremental_phash_dedup', 'store_phash_dedup', 'incremental_embedding_dedup', 'store_embedding_dedup', 'incremental_union', 'incremental_minhash_dedup', 'mix_domains', 'decontam_hits', 'decontam_survivors', 'line_dedup', 'zonal_image_stats', 'curate_corpus', 'pii_redact', 'tile_raster', 'raster_pyramid', 'tile_mosaic', 'raster_extract', 'raster_focal', 'raster_algebra', 'zonal_raster', 'zonal_brightness', 'raster_hotspots', 'zone_burnin', 'viewport_similar', 'viewport_caption_similar', 'geo_visual_dedup', 'incremental_geo_visual', 'tile_viewport', 'incremental_raster', 'session_windows', 'streaming_tiles', 'streaming_zones', 'connected_components', 'zone_contains_count', 'dwithin_local_count', 'knn_local_tag', 'union_local_dedup', 'geo_split_assign', 'domain_split_assign', 'split_leak_pairs', 'coverage_gaps_local', 'edge_cross_count', 'bbox_edges', 'zone_pip_count', 'tri_zone_pip', 'angle_join', 'angle_buffer_join', 'osm_ways']


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = {
        "bbox_points": _q_bbox,
        "cell_grid_agg": _q_cell_grid,
        "tile_assign": _q_tiles,
        "incremental_tiles": _q_incremental_tiles,
        "knn_tag": _q_knn_tag,
        "knn_rank": _q_knn_rank,
        "spatial_join_count": _q_join_count,
        "union_dedup": _q_union,
        "pagination": _q_pagination,
        "proj_filter_join": _q_proj_join,
        "groupby_pricing": _q_groupby,
        "topk_customers": _q_topk,
        "events_rollup": _q_events_rollup,
        "events_top_per_user": _q_events_top_per_user,
        "sessionize": _q_sessionize,
        "asof_join": _q_asof_join,
        # trajectory tier: hysteresis map matching, exact-integer trip
        # geometry, PIP OD matrix, spatial-anti coverage gaps
        "map_match": _q_map_match,
        "trip_stats": _q_trip_stats,
        "od_matrix": _q_od_matrix,
        "coverage_gaps": _q_coverage_gaps,
        # trajectory x raster: step segments, speed heat-map layer, and
        # the DDA route burn-in through the real PNG encode/decode
        "trip_segments": _q_trip_segments,
        "speed_raster": _q_speed_raster,
        "route_raster": _q_route_raster,
        # dwell detection + the space-time encounter self-join
        "stay_points": _q_stay_points,
        "co_location": _q_co_location,
        # per-edge usage rollup + cell-visit-set similarity
        "edge_usage": _q_edge_usage,
        "co_travelers": _q_co_travelers,
        "zone_visits": _q_zone_visits,
        "graph_hops": _q_graph_hops,
        "network_distance": _q_network_distance,
        "triangle_count": _q_triangle_count,
        "pagerank": _q_pagerank,
        "tfidf_search": _q_tfidf_search,
        "bm25_search": _q_bm25_search,
        "viewport_tfidf": _q_viewport_tfidf,
        "postings": _q_postings,
        "cooccur_pmi": _q_cooccur_pmi,
        "service_area": _q_service_area,
        "kcore": _q_kcore,
        "connected_components": _q_connected_components,
        "link_jaccard": _q_link_jaccard,
        "brightness_raster": _q_brightness_raster,
        "tile_gallery": _q_tile_gallery,
        "gallery_pyramid": _q_gallery_pyramid,
        "incremental_gallery": _q_incremental_gallery,
        "incremental_brightness": _q_incremental_brightness,
        "tile_terms": _q_tile_terms,
        "incremental_terms": _q_incremental_terms,
        "decode_mse": _q_decode_mse,
        "token_count": _q_token_count,
        "text_quality": _q_quality,
        "langid": _q_langid,
        "corpus_report": _q_corpus_report,
        "exact_dedup": _q_exact_dedup,
        "fingerprint": _q_fingerprint,
        "embedding_topk": _q_embed_topk,
        # LSH dedup over planted corpora + exact-mode IVF: oracle-checked
        # (closed-form survivor sets / brute-force-equivalent settings)
        "minhash_dedup": _q_minhash_dedup,
        "simhash_dedup": _q_simhash,
        "embedding_neardup": _q_embed_neardup,
        "hamming_cluster_dedup": _q_hamming_cluster,
        "cluster_keep_best": _q_cluster_keep_best,
        "embedding_cluster_dedup": _q_embedding_cluster,
        "ivf_topk": _q_ivf_topk,
        # int8-scan + float-rerank IVF (exact at full probe)
        "ivf_quantized_topk": _q_ivf_quantized,
        # persistent bucket-partitioned IVF index (partition-pruned scan)
        "ivf_indexed_topk": _q_ivf_indexed,
        # rows-only: pixel decode invariants are genuinely non-SQL
        "payload_invariants": _q_payload_invariants,
        "winnow_fingerprint": _q_winnow,
        "zone_pip_count": _q_zone_pip,
        "zone_contains_count": _q_zone_contains,
        "dwithin_local_count": _q_dwithin_local,
        "knn_local_tag": _q_knn_local_tag,
        "coverage_gaps_local": _q_gaps_local,
        "edge_cross_count": _q_edge_cross,
        "union_local_dedup": _q_union_local,
        "geo_split_assign": _q_geo_split,
        "domain_split_assign": _q_domain_split,
        "split_leak_pairs": _q_split_leak,
        "bbox_edges": _q_bbox_edges,
        "tri_zone_pip": _q_tri_zone_pip,
        # angle predicate (cross-join + bounded combined paths) and the
        # O5/O6 export line builders — r3 proof-gap closures
        "angle_join": _q_angle_join,
        "angle_buffer_join": _q_angle_buffer_join,
        "osm_ways": _q_osm_ways,
        "geojson_lines": _q_geojson_lines,
        # custom stateful streaming operator, driven to a batch-readable
        # sink so it still gets a full oracle
        "streaming_dedup": _q_streaming_dedup,
        # real audio (WAV) / video (vraw) payload operators over planted
        # closed-form content
        "audio_features": _q_audio_features,
        "video_frames": _q_video_frames,
        # real image decode with decode-derived dims + recomputed ahash
        # under the hash oracle (only pixel PSNR stays pytest-only)
        "decode_meta": _q_decode_meta,
        # flip/rotate/crop augmentation under the re-decoded-sum oracle
        "augment_meta": _q_augment_meta,
        # perceptual-hash image dedup over the real decode path
        "image_phash_dedup": _q_image_phash_dedup,
        # one-pass cross-modal (phash OR caption) dedup composition
        "cross_modal_dedup": _q_cross_modal_dedup,
        # incremental ingest dedup vs a committed corpus (no history re-pair)
        "incremental_phash_dedup": _q_incremental_phash_dedup,
        "store_phash_dedup": _q_store_phash_dedup,
        "incremental_embedding_dedup": _q_incremental_embedding_dedup,
        "store_embedding_dedup": _q_store_embedding_dedup,
        "incremental_union": _q_incremental_union,
        "incremental_minhash_dedup": _q_incremental_minhash,
        # corpus curation: sequence packing + stratified sampling
        "pack_docs": _q_pack_docs,
        "sample_per_key": _q_sample_per_key,
        "mix_domains": _q_mix_domains,
        "quality_filter": _q_quality_filter,
        "quantize_vecs": _q_quantize_vecs,
        "ngram_top": _q_ngram_top,
        # iterative connected-components collapse over planted chains
        # r5 continuation: cleansing tier + zonal image stats
        "decontam_hits": _q_decontam_hits,
        "decontam_survivors": _q_decontam_survivors,
        "line_dedup": _q_line_dedup,
        "zonal_image_stats": _q_zonal_image_stats,
        "curate_corpus": _q_curate_corpus,
        "pii_redact": _q_pii_redact,
        "corpus_shuffle": _q_corpus_shuffle,
        "union_cc": _q_union_cc,
        # multi-zoom tile rollup (one corpus pass + per-level halving)
        "tile_pyramid": _q_tile_pyramid,
        # raster render tier: real PNG encode->decode under the oracle
        "tile_raster": _q_tile_raster,
        "raster_pyramid": _q_raster_pyramid,
        "tile_mosaic": _q_tile_mosaic,
        # raster -> vector extraction (the round trip)
        "raster_extract": _q_raster_extract,
        # raster analytics: focal smoothing, layer algebra, zonal stats
        "raster_focal": _q_raster_focal,
        "raster_algebra": _q_raster_algebra,
        "zonal_raster": _q_zonal_raster,
        "zonal_brightness": _q_zonal_brightness,
        "raster_hotspots": _q_raster_hotspots,
        # areal burn-in composited onto the point-density layer
        "zone_burnin": _q_zone_burnin,
        # bbox-scoped visual top-k over recomputed perceptual hashes
        "viewport_similar": _q_viewport_similar,
        "viewport_caption_similar": _q_viewport_caption_similar,
        # proximity AND visual near-dup over the real decode path
        "geo_visual_dedup": _q_geo_visual_dedup,
        # geo-visual drop admission vs the committed narrow corpus
        "incremental_geo_visual": _q_incremental_geo_visual,
        # manifest-lineage tile store + partition-pruned viewport read
        "tile_viewport": _q_tile_viewport,
        # drop-merge re-encoding only affected tiles (merge == recompute)
        "incremental_raster": _q_incremental_raster,
        # watermarked windowed streaming aggregation (append-mode seals)
        "windowed_events": _q_windowed_events,
        "session_windows": _q_session_windows,
        # streaming front end of the live tile layer
        "streaming_tiles": _q_streaming_tiles,
        "streaming_zones": _q_streaming_zones,
    }
    ordered = {k: base[k] for k in _LEAD_ROWS}
    ordered.update({k: v for k, v in base.items() if k not in ordered})
    return ordered


# zoom-17 lattice (z13 tiles at 16 px) used by the trajectory rasters
_N_SEG = 1 << 17

# shared trajectory-step CTE: the trip_stats lag/session window; a
# step row exists iff its predecessor ping is in the same session
_SEGS_SQL = f"""
    WITH p AS (
      SELECT event_id, user_id, epoch_us(ts) AS us,
             {FX.SQL_LON.format(k="event_id")} AS lon,
             {FX.SQL_LAT.format(k="event_id")} AS lat
      FROM events
      WHERE (event_id * 40503 + 12345) % 5000 <> 0),
    t AS (
      SELECT *, LAG(us) OVER w AS prev_us,
             LAG(lon) OVER w AS lon0,
             LAG(lat) OVER w AS lat0
      FROM p WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
    s AS (
      SELECT *, SUM(CASE WHEN prev_us IS NULL
                           OR us - prev_us > 21600000000
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY us, event_id
                      ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM t),
    seg AS (
      SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             event_id AS seg_id, lon0, lat0, lon AS lon1, lat AS lat1,
             CAST(us - prev_us AS BIGINT) AS dt_us
      FROM s WHERE prev_us IS NOT NULL AND us - prev_us <= 21600000000)
"""


def oracle_sql() -> dict[str, str]:
    sw_cases = " ".join(
        f"WHEN h_{c} = best THEN '{c}'" for c in sorted(TX.STOPWORDS))
    hits_exprs_named = "GREATEST(" + ", ".join(
        f"h_{c}" for c in sorted(TX.STOPWORDS)) + ")"
    n_tile = 1 << TILE_Z
    n_cell = 1 << CELL_DEPTH
    # pagerank: the 5 integer power iterations unrolled as CTEs —
    # DuckDB's // floors and Spark's div truncates, identical on the
    # always-positive ranks
    pr_base = ((20 - 17) * GRAPH_PR_SCALE) // 20
    pr_iters = ",\n".join(f"""
            r{i + 1} AS (
              SELECT n.node,
                     CAST({pr_base} + (17 * COALESCE(s.m, 0)) // 20
                          AS BIGINT) AS r
              FROM pr_nodes n LEFT JOIN (
                SELECT de.dst AS node, SUM(r{i}.r // od.c) AS m
                FROM r{i} JOIN de ON de.src = r{i}.node
                JOIN od ON od.src = de.src
                GROUP BY 1) s ON s.node = n.node)""" for i in range(5))
    pr_sql = f"""
            WITH {FX.CHAIN_GRAPH_SQL},
            de AS (SELECT DISTINCT src, dst FROM edges),
            pr_nodes AS (SELECT src AS node FROM de
                         UNION SELECT dst AS node FROM de),
            od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS c
                   FROM de GROUP BY 1),
            r0 AS (SELECT node, CAST({GRAPH_PR_SCALE} AS BIGINT) AS r
                   FROM pr_nodes),
            {pr_iters}
            SELECT node, r AS pr FROM r5
    """
    return {
        "bbox_points": f"""
            SELECT o_orderkey, lon, lat FROM {_PTS}
            WHERE lon >= {BBOX[0]} AND lon <= {BBOX[2]}
              AND lat >= {BBOX[1]} AND lat <= {BBOX[3]}
        """,
        "cell_grid_agg": f"""
            SELECT CAST(FLOOR((lon + 180.0) / 360.0 * {n_cell}) AS BIGINT) AS cell_x,
                   CAST(FLOOR((lat + 90.0) / 180.0 * {n_cell}) AS BIGINT) AS cell_y,
                   COUNT(*) AS n
            FROM {_PTS} GROUP BY 1, 2
        """,
        "tile_assign": f"""
            SELECT CAST(FLOOR((lon + 180.0) / 360.0 * {n_tile}) AS INT) AS tile_x,
                   CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * {n_tile}) AS INT) AS tile_y,
                   COUNT(*) AS n
            FROM {_PTS} GROUP BY 1, 2
        """,
        # merge == recompute: the incremental path only aggregates the
        # drop, so the oracle recomputes tile counts over the union
        "incremental_tiles": f"""
            WITH u AS (
              SELECT {_LON} AS lon, {_LAT} AS lat FROM orders
              UNION ALL
              SELECT {FX.SQL_LON.format(k="c_custkey")} AS lon,
                     {FX.SQL_LAT.format(k="c_custkey")} AS lat
              FROM customer)
            SELECT CAST(FLOOR((lon + 180.0) / 360.0 * {n_tile}) AS INT) AS tile_x,
                   CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * {n_tile}) AS INT) AS tile_y,
                   COUNT(*) AS n
            FROM u GROUP BY 1, 2
        """,
        "knn_tag": f"""
            SELECT o_orderkey,
                   CASE WHEN dist_m <= {KNN_CUTOFF_M} THEN k END AS nearest_edge_id
            FROM {_PTS_K}
        """,
        # ranked top-3 edges within 2.5 km: grid lines sit at
        # lat 47.605 + k*0.01, so the ordered distances per point are
        # closed-form |lat - line_k| * 110540 with edge-id tie-break
        "knn_rank": f"""
            SELECT o_orderkey, knn_rank, edge_id FROM (
              SELECT p.o_orderkey, j.k AS edge_id,
                     ABS(p.lat - (47.605 + j.k * 0.01)) * 110540.0 AS dist_m,
                     ROW_NUMBER() OVER (PARTITION BY p.o_orderkey
                         ORDER BY ABS(p.lat - (47.605 + j.k * 0.01)), j.k)
                       AS knn_rank
              FROM {_PTS} p,
                   (SELECT CAST(range AS BIGINT) AS k FROM range(10)) j
              WHERE (p.o_orderkey * 40503 + 12345) % 5000 <> 0)
            WHERE knn_rank <= 3 AND dist_m <= 2500.0
        """,
        "spatial_join_count": f"""
            SELECT r.range AS edge_id, COALESCE(c.n, 0) AS n
            FROM range(10) r LEFT JOIN (
              SELECT k, COUNT(*) AS n FROM {_PTS_K}
              WHERE dist_m <= {KNN_CUTOFF_M} GROUP BY k) c
            ON r.range = c.k
        """,
        "union_dedup": """
            SELECT 'A-' || c_custkey AS image_id FROM customer
            UNION ALL
            SELECT 'B-' || c_custkey AS image_id FROM customer
            WHERE c_custkey >= 300
        """,
        # same survivor set as union_dedup — but only because the local
        # metric merges the 0.668 m-equator lon-shifted dups (0.450 m
        # local < 0.5); under the equator convention every B row
        # survives and the row count itself fails
        "union_local_dedup": """
            SELECT 'A-' || c_custkey AS image_id FROM customer
            UNION ALL
            SELECT 'B-' || c_custkey AS image_id FROM customer
            WHERE c_custkey >= 300
        """,
        "pagination": """
            SELECT o_orderkey FROM orders ORDER BY o_orderkey DESC
            LIMIT 20 OFFSET 40
        """,
        "proj_filter_join": """
            SELECT c_custkey, n_name FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            WHERE c_mktsegment = 'BUILDING'
            ORDER BY c_custkey LIMIT 50
        """,
        "groupby_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   COUNT(*) AS n
            FROM lineitem GROUP BY 1, 2
        """,
        "topk_customers": """
            SELECT o_custkey,
                   CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM orders GROUP BY o_custkey
            ORDER BY total_cents DESC, o_custkey LIMIT 10
        """,
        "events_rollup": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents,
                   COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "events_top_per_user": """
            SELECT user_id, event_id, event_type FROM (
              SELECT user_id, event_id, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id) AS rk
              FROM events) WHERE rk = 1
        """,
        # gap sessionization: session boundary iff the microsecond gap
        # to the previous event (per user, (ts, event_id) order)
        # exceeds 21600 s; stats are exact-integer (count/min/span_us)
        "sessionize": """
            WITH t AS (
              SELECT user_id, event_id, epoch_us(ts) AS us,
                     LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                         ORDER BY epoch_us(ts), event_id) AS prev
              FROM events),
            s AS (
              SELECT user_id, event_id, us,
                     SUM(CASE WHEN prev IS NULL OR us - prev > 21600000000
                              THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY us, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM t)
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   COUNT(*) AS n_events, MIN(event_id) AS first_event,
                   CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us
            FROM s GROUP BY user_id, session_seq
        """,
        # backward as-of join via the same union-tag running-last plan
        # the Spark operator uses: right rows (tag 0) sort before left
        # rows (tag 1) at equal timestamps -> inclusive; largest rid
        # wins a right-side timestamp tie; 2 h tolerance else NULL
        "asof_join": """
            WITH r AS (SELECT user_id, epoch_us(ts) AS us,
                              event_id AS rid, value
                       FROM events WHERE event_type = 'view'),
            l AS (SELECT user_id, epoch_us(ts) AS us, event_id
                  FROM events WHERE event_type = 'click'),
            u AS (
              SELECT user_id, us, 0 AS tag, rid, value,
                     CAST(NULL AS BIGINT) AS event_id FROM r
              UNION ALL
              SELECT user_id, us, 1 AS tag, CAST(NULL AS BIGINT),
                     CAST(NULL AS DOUBLE), event_id FROM l),
            f AS (
              SELECT *,
                     LAST_VALUE(rid IGNORE NULLS) OVER w AS a_rid,
                     LAST_VALUE(value IGNORE NULLS) OVER w AS a_val,
                     LAST_VALUE(CASE WHEN tag = 0 THEN us END IGNORE NULLS)
                       OVER w AS a_us
              FROM u
              WINDOW w AS (PARTITION BY user_id
                           ORDER BY us ASC, tag ASC, rid ASC NULLS FIRST
                           ROWS UNBOUNDED PRECEDING))
            SELECT event_id,
                   CASE WHEN a_us IS NOT NULL AND us - a_us <= 7200000000
                        THEN a_rid END AS match_id,
                   CASE WHEN a_us IS NOT NULL AND us - a_us <= 7200000000
                        THEN a_val END AS match_value
            FROM f WHERE tag = 1
        """,
        # trajectory tier over the event-ping fixture: lon/lat derive
        # from event_id (lattice units of 1e-6 deg = 0.11054 m vs the
        # grid edges); rows with lat-hash % 5000 == 0 are excluded —
        # on-line / equidistant points where argmin tie order is
        # float-ulp-dependent (the knn_rank exclusion). 2500 m = units
        # <= 22616 (2499.97), 1500 m = units <= 13569 (1499.92): every
        # lattice distance sits >= 2 cm from the float threshold.
        "map_match": """
            WITH p AS (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     (event_id * 40503 + 12345) % 100000 AS v
              FROM events
              WHERE (event_id * 40503 + 12345) % 5000 <> 0),
            c AS (
              SELECT p.*, j.k, ABS(p.v - (5000 + j.k * 10000)) AS du
              FROM p, (SELECT CAST(range AS BIGINT) AS k FROM range(10)) j
              WHERE ABS(p.v - (5000 + j.k * 10000)) <= 22616),
            n AS (
              SELECT event_id, user_id, us, v,
                     COUNT(*) AS n_cand,
                     arg_min(k, du) AS nearest_edge_id
              FROM c GROUP BY 1, 2, 3, 4),
            f AS (
              SELECT *, LAG(nearest_edge_id) OVER (
                  PARTITION BY user_id ORDER BY us, event_id) AS prev_e
              FROM n)
            SELECT event_id, nearest_edge_id,
                   CASE WHEN prev_e IS NOT NULL
                         AND ABS(v - (5000 + prev_e * 10000)) <= 13569
                        THEN prev_e ELSE nearest_edge_id END
                     AS matched_edge_id,
                   n_cand
            FROM f
        """,
        # planar steps replicate the operator's exact IEEE expression
        # (dlon*111320, dlat*110540, floor(sqrt*1000) per step)
        "trip_stats": f"""
            WITH p AS (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     {FX.SQL_LON.format(k="event_id")} AS lon,
                     {FX.SQL_LAT.format(k="event_id")} AS lat
              FROM events
              WHERE (event_id * 40503 + 12345) % 5000 <> 0),
            t AS (
              SELECT *, LAG(us) OVER w AS prev_us,
                     LAG(lon) OVER w AS prev_lon,
                     LAG(lat) OVER w AS prev_lat
              FROM p WINDOW w AS (PARTITION BY user_id
                                  ORDER BY us, event_id)),
            s AS (
              SELECT *, SUM(CASE WHEN prev_us IS NULL
                                   OR us - prev_us > 21600000000
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM t),
            st AS (
              SELECT *, LAG(session_seq) OVER (
                  PARTITION BY user_id ORDER BY us, event_id) AS prev_seq
              FROM s)
            SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                   COUNT(*) AS n_pings, MIN(event_id) AS first_ping,
                   CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us,
                   CAST(SUM(CASE WHEN prev_seq = session_seq THEN
                     CAST(FLOOR(SQRT(
                       (lon - prev_lon) * 111320.0
                         * ((lon - prev_lon) * 111320.0)
                       + (lat - prev_lat) * 110540.0
                         * ((lat - prev_lat) * 110540.0)) * 1000.0)
                       AS BIGINT) ELSE 0 END) AS BIGINT) AS len_mm
            FROM st GROUP BY user_id, session_seq
        """,
        # endpoint zone = integer arithmetic on the key hash (quad
        # zones sit on half-lattice boundaries; every ping is interior)
        "od_matrix": """
            WITH p AS (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     ((event_id * 40503 + 12345) % 100000) // 25000 * 4
                     + ((event_id * 2654435761) % 100000) // 25000
                       AS zone_id
              FROM events
              WHERE (event_id * 40503 + 12345) % 5000 <> 0),
            s AS (
              SELECT *, SUM(CASE WHEN prev_us IS NULL
                                   OR us - prev_us > 21600000000
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_seq
              FROM (SELECT *, LAG(us) OVER (PARTITION BY user_id
                        ORDER BY us, event_id) AS prev_us FROM p)),
            r AS (
              SELECT user_id, session_seq, zone_id,
                     ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                                        ORDER BY us, event_id) AS ra,
                     ROW_NUMBER() OVER (PARTITION BY user_id, session_seq
                                        ORDER BY us DESC, event_id DESC)
                       AS rd
              FROM s)
            SELECT o.zone_id AS o_zone, d.zone_id AS d_zone,
                   COUNT(*) AS n_trips
            FROM (SELECT user_id, session_seq, zone_id
                  FROM r WHERE ra = 1) o
            JOIN (SELECT user_id, session_seq, zone_id
                  FROM r WHERE rd = 1) d
            USING (user_id, session_seq)
            GROUP BY 1, 2
        """,
        # gap iff EVERY grid line is > 300 m away (2713 units = 299.89,
        # 2714 = 300.006 — no lattice point near the float threshold)
        "coverage_gaps": f"""
            SELECT event_id,
                   {FX.SQL_LON.format(k="event_id")} AS lon,
                   {FX.SQL_LAT.format(k="event_id")} AS lat
            FROM events
            WHERE (event_id * 40503 + 12345) % 5000 <> 0
              AND NOT EXISTS (
                SELECT 1 FROM range(10) j
                WHERE ABS((event_id * 40503 + 12345) % 100000
                          - (5000 + CAST(j.range AS BIGINT) * 10000))
                      <= 2713)
        """,
        # shared lag/session rule (same window as trip_stats); a step
        # exists iff its predecessor is in the same session
        "trip_segments": _SEGS_SQL + """
            SELECT * FROM seg
        """,
        # destination-pixel speed layer: floor-to-mm, floor-to-mm/s per
        # step, pure-integer DIV mean per pixel, LEAST-255 clip
        "speed_raster": _SEGS_SQL + f"""
            , g AS (
              SELECT CAST(FLOOR((lon1 + 180.0) / 360.0 * {_N_SEG}) AS BIGINT)
                       AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat1))
                         + 1.0 / cos(radians(lat1))) / pi()) / 2.0
                         * {_N_SEG}) AS BIGINT) AS gy,
                     CAST(FLOOR(CAST(FLOOR(SQRT(
                       (lon1 - lon0) * 111320.0 * ((lon1 - lon0) * 111320.0)
                       + (lat1 - lat0) * 110540.0
                         * ((lat1 - lat0) * 110540.0)
                     ) * 1000.0) AS BIGINT) * 1000000.0 / dt_us) AS BIGINT)
                       AS mmps
              FROM seg WHERE dt_us > 0),
            pix AS (
              SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n_steps,
                     CAST(SUM(mmps) AS BIGINT) AS sum_mmps
              FROM g GROUP BY 1, 2)
            SELECT CAST(13 AS INT) AS z,
                   CAST(gx // 16 AS INT) AS tile_x,
                   CAST(gy // 16 AS INT) AS tile_y,
                   gx, gy,
                   CAST(gx % 16 AS INT) AS px_x,
                   CAST(gy % 16 AS INT) AS px_y,
                   n_steps, sum_mmps,
                   LEAST(CAST(255 AS BIGINT), sum_mmps // n_steps) AS n
            FROM pix
        """,
        # DDA burn-in: continuous pixel coords, K = ceil(chebyshev
        # length) lerp steps, floor once per sample, per-segment pixel
        # dedup, LEAST-255 clip replayed over the decoded PNG stats
        "route_raster": _SEGS_SQL + f"""
            , par AS (
              SELECT seg_id,
                     (lon0 + 180.0) / 360.0 * {_N_SEG} AS fx0,
                     (1.0 - ln(tan(radians(lat0))
                        + 1.0 / cos(radians(lat0))) / pi()) / 2.0
                        * {_N_SEG} AS fy0,
                     (lon1 + 180.0) / 360.0 * {_N_SEG} AS fx1,
                     (1.0 - ln(tan(radians(lat1))
                        + 1.0 / cos(radians(lat1))) / pi()) / 2.0
                        * {_N_SEG} AS fy1
              FROM seg),
            par2 AS (
              SELECT *, GREATEST(CAST(1 AS BIGINT),
                                 CAST(CEIL(GREATEST(ABS(fx1 - fx0),
                                                    ABS(fy1 - fy0)))
                                      AS BIGINT)) AS kk
              FROM par),
            samp AS (
              SELECT seg_id,
                     CAST(FLOOR(fx0 + (fx1 - fx0)
                       * (CAST(u.k AS DOUBLE) / CAST(kk AS DOUBLE)))
                       AS BIGINT) AS gx,
                     CAST(FLOOR(fy0 + (fy1 - fy0)
                       * (CAST(u.k AS DOUBLE) / CAST(kk AS DOUBLE)))
                       AS BIGINT) AS gy
              FROM par2, UNNEST(generate_series(0, kk)) AS u(k)),
            cov AS (SELECT DISTINCT seg_id, gx, gy FROM samp),
            pix AS (SELECT gx, gy, COUNT(*) AS n FROM cov GROUP BY 1, 2)
            SELECT CAST(13 AS INT) AS z,
                   CAST(gx // 16 AS INT) AS tile_x,
                   CAST(gy // 16 AS INT) AS tile_y,
                   CAST(COUNT(*) AS BIGINT) AS nonzero_px,
                   CAST(SUM(LEAST(n, 255)) AS BIGINT) AS sum_px,
                   CAST(MAX(LEAST(n, 255)) AS BIGINT) AS max_px
            FROM pix GROUP BY 1, 2, 3
        """,
        # the map_match lattice closed form + a per-edge GROUP BY
        # (every fixture ping has candidates: max lattice distance to an
        # edge is 5000 units < the 22616-unit cutoff, so no-candidate
        # drop semantics never diverge between the engines here)
        "edge_usage": """
            WITH p AS (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     (event_id * 40503 + 12345) % 100000 AS v
              FROM events
              WHERE (event_id * 40503 + 12345) % 5000 <> 0),
            c AS (
              SELECT p.*, j.k, ABS(p.v - (5000 + j.k * 10000)) AS du
              FROM p, (SELECT CAST(range AS BIGINT) AS k FROM range(10)) j
              WHERE ABS(p.v - (5000 + j.k * 10000)) <= 22616),
            n AS (
              SELECT event_id, user_id, us, v,
                     arg_min(k, du) AS nearest_edge_id
              FROM c GROUP BY 1, 2, 3, 4),
            f AS (
              SELECT *, LAG(nearest_edge_id) OVER (
                  PARTITION BY user_id ORDER BY us, event_id) AS prev_e
              FROM n),
            mm AS (
              SELECT user_id, us,
                     CASE WHEN prev_e IS NOT NULL
                           AND ABS(v - (5000 + prev_e * 10000)) <= 13569
                          THEN prev_e ELSE nearest_edge_id END AS edge_id
              FROM f)
            SELECT edge_id, CAST(COUNT(*) AS BIGINT) AS n_pings,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
                   CAST(MIN(us) AS BIGINT) AS first_us,
                   CAST(MAX(us) AS BIGINT) AS last_us
            FROM mm GROUP BY 1
        """,
        # distinct (user, zoom-17 tile) visits -> cell self-join ->
        # integer set counts + one integer DIV
        "co_travelers": f"""
            WITH p AS (
              SELECT user_id,
                     {FX.SQL_LON.format(k="event_id")} AS lon,
                     {FX.SQL_LAT.format(k="event_id")} AS lat
              FROM events
              WHERE (event_id * 40503 + 12345) % 5000 <> 0),
            v AS (
              SELECT DISTINCT user_id,
                     CAST(FLOOR((lon + 180.0) / 360.0 * {1 << 17})
                       AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat))
                         + 1.0 / cos(radians(lat))) / pi()) / 2.0
                         * {1 << 17}) AS BIGINT) AS gy
              FROM p),
            cnt AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS nc
                    FROM v GROUP BY 1),
            inter AS (
              SELECT a.user_id AS user_a, b.user_id AS user_b,
                     CAST(COUNT(*) AS BIGINT) AS n_common
              FROM v a JOIN v b ON a.gx = b.gx AND a.gy = b.gy
                               AND a.user_id < b.user_id
              GROUP BY 1, 2 HAVING COUNT(*) >= 5)
            SELECT user_a, user_b, n_common, ca.nc AS n_a, cb.nc AS n_b,
                   (n_common * 1000) // (ca.nc + cb.nc - n_common)
                     AS jaccard_pm
            FROM inter
            JOIN cnt ca ON ca.user_id = user_a
            JOIN cnt cb ON cb.user_id = user_b
        """,
        # geofence episodes: od_matrix's closed-form zone on the key
        # hash + the gap-cumsum window per (user, zone), all in integer
        # microseconds
        "zone_visits": """
            WITH p AS (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     ((event_id * 40503 + 12345) % 100000) // 25000 * 4
                     + ((event_id * 2654435761) % 100000) // 25000
                       AS zone_id
              FROM events
              WHERE (event_id * 40503 + 12345) % 5000 <> 0),
            s AS (
              SELECT *, SUM(CASE WHEN prev_us IS NULL
                                   OR us - prev_us > 21600000000
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id, zone_id
                              ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS visit_seq
              FROM (SELECT *, LAG(us) OVER (PARTITION BY user_id, zone_id
                        ORDER BY us, event_id) AS prev_us FROM p))
            SELECT user_id, CAST(zone_id AS BIGINT) AS zone_id,
                   CAST(visit_seq AS BIGINT) AS visit_seq,
                   CAST(COUNT(*) AS BIGINT) AS n_pings,
                   CAST(MIN(us) AS BIGINT) AS enter_us,
                   CAST(MAX(us) AS BIGINT) AS exit_us,
                   CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us
            FROM s GROUP BY 1, 2, 3
        """,
        # multi-source BFS: layered walk enumeration (hops-bounded, so
        # the recursive UNION's (node, hops) dedup keeps it polynomial)
        # reduced by MIN — exactly the hop_distance definition
        "graph_hops": f"""
            WITH RECURSIVE {FX.CHAIN_GRAPH_SQL},
            r(node, hops) AS (
              SELECT node, 0 FROM seeds
              UNION
              SELECT s.dst, r.hops + 1
              FROM r JOIN sym s ON s.src = r.node
              WHERE r.hops < 20
            )
            SELECT CAST(node AS BIGINT) AS node,
                   CAST(MIN(hops) AS INT) AS hops
            FROM r GROUP BY node
        """,
        # hop-bounded Bellman-Ford: min total weight over walks of
        # <= 20 edges; Spark's early-converged fixpoint equals the
        # bounded min whenever it exits early (no walk improves it)
        "network_distance": f"""
            WITH RECURSIVE {FX.CHAIN_GRAPH_SQL},
            r(node, dist, hops) AS (
              SELECT node, CAST(0 AS BIGINT), 0 FROM seeds
              UNION
              SELECT s.dst, r.dist + s.w, r.hops + 1
              FROM r JOIN sym s ON s.src = r.node
              WHERE r.hops < 20
            )
            SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
            FROM r GROUP BY node
        """,
        # triangles by id-ordered 3-clique enumeration (the Spark
        # side's degree-ordering finds the same set, once each)
        "triangle_count": f"""
            WITH {FX.TRI_GRAPH_SQL},
            ce AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                   FROM tri_edges WHERE src <> dst GROUP BY 1, 2),
            t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                  FROM ce e1 JOIN ce e2 ON e2.a = e1.b
                  JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b),
            corner AS (SELECT x AS node FROM t
                       UNION ALL SELECT y AS node FROM t
                       UNION ALL SELECT z AS node FROM t)
            SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
            FROM corner GROUP BY node
        """,
        "pagerank": pr_sql,
        # rational TF-IDF retrieval: same whitespace split law as the
        # token counters, integer idf = (N*1e6) // df, id tie-break at
        # the LIMIT cut
        "tfidf_search": """
            WITH w AS (
              SELECT doc_id,
                     unnest(list_filter(regexp_split_to_array(lower(text),
                            '\\s+'), x -> x <> '')) AS term
              FROM documents
            ),
            tf AS (
              SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM w WHERE term IN ('spark', 'hash', 'window', 'vector')
              GROUP BY 1, 2
            ),
            dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                      FROM tf GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
            SELECT doc_id,
                   CAST(SUM(tf * ((n.n * 1000000) // dfreq.df))
                        AS BIGINT) AS score
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
            GROUP BY doc_id
            ORDER BY score DESC, doc_id LIMIT 25
        """,
        # 2-core closed form: corridor runs from the first shortcut
        # base to the end of its last complete 6-cycle (k+4 <= N);
        # chain tails and incomplete trailing cycles peel
        # connected components: the corridor construction is closed-form
        # (node n sits in corridor floor((n-1)/100); shortcut edges never
        # cross a corridor boundary), so component = min id of the
        # corridor while Spark runs the real iterative collapse
        "connected_components": f"""
            WITH {FX.CHAIN_GRAPH_SQL},
            gnodes AS (SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst AS node FROM edges))
            SELECT node,
                   CAST(((node - 1) // 100) * 100 + 1 AS BIGINT)
                     AS component
            FROM gnodes
        """,
        "kcore": f"""
            WITH {FX.CHAIN_GRAPH_SQL},
            b AS (SELECT CAST(c_custkey AS BIGINT) AS k,
                         CAST((c_custkey - 1) // 100 AS BIGINT) AS cor
                  FROM customer
                  WHERE c_custkey % 25 = 2
                    AND c_custkey + 4 <= (SELECT MAX(c_custkey)
                                          FROM customer)),
            r AS (SELECT cor, MIN(k) AS f, MAX(k) + 5 AS l
                  FROM b GROUP BY cor),
            gnodes AS (SELECT DISTINCT node FROM (
                SELECT src AS node FROM edges
                UNION ALL SELECT dst AS node FROM edges))
            SELECT n.node FROM gnodes n JOIN r
              ON CAST((n.node - 1) // 100 AS BIGINT) = r.cor
             AND n.node BETWEEN r.f AND r.l
        """,
        # neighbor Jaccard via the same wedge shape in SQL; existing
        # edges excluded; integer score with (score, u, v) total order
        "link_jaccard": f"""
            WITH {FX.TRI_GRAPH_SQL},
            ce AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
                   FROM tri_edges WHERE src <> dst GROUP BY 1, 2),
            sym AS (SELECT a AS m, b AS x FROM ce
                    UNION ALL SELECT b AS m, a AS x FROM ce),
            deg AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS c
                    FROM sym GROUP BY 1),
            pr AS (SELECT s1.x AS u, s2.x AS v,
                          CAST(COUNT(*) AS BIGINT) AS common
                   FROM sym s1 JOIN sym s2
                     ON s1.m = s2.m AND s1.x < s2.x
                   GROUP BY 1, 2),
            ne AS (SELECT pr.* FROM pr WHERE NOT EXISTS (
                     SELECT 1 FROM ce
                     WHERE ce.a = pr.u AND ce.b = pr.v))
            SELECT ne.u, ne.v, ne.common,
                   CAST(ne.common * 1000000 //
                        (du.c + dv.c - ne.common) AS BIGINT)
                     AS jaccard_scaled
            FROM ne JOIN deg du ON du.m = ne.u
            JOIN deg dv ON dv.m = ne.v
            ORDER BY jaccard_scaled DESC, u, v LIMIT 60
        """,
        # service area: nearest-edge closed form (lat lattice) x the
        # corridor hop closed form (node 2k sits 2k hops from depot 0,
        # so edge k enters the 12-hop area iff k <= 6)
        "service_area": f"""
            SELECT o_orderkey, k AS edge_id,
                   CAST(2 * k AS INT) AS edge_hops
            FROM {_PTS_K}
            WHERE dist_m <= {KNN_CUTOFF_M} AND k <= 6
        """,
        # inverted index: same within-doc dedup + split law; posting
        # list = ascending comma-joined doc ids as a plain string
        "postings": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(list_distinct(list_filter(
                            regexp_split_to_array(lower(text), '\\s+'),
                            x -> x <> ''))) AS term
              FROM documents
            )
            SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
                   string_agg(CAST(doc_id AS VARCHAR), ','
                              ORDER BY doc_id) AS postings
            FROM toks GROUP BY term
        """,
        # windowed co-occurrence via positional self-join (the Spark
        # side builds the same ordered-pair multiset map-side)
        "cooccur_pmi": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text),
                            '\\s+'), x -> x <> '') AS w
              FROM documents
            ),
            pos AS (SELECT doc_id, unnest(w) AS term,
                           generate_subscripts(w, 1) AS i FROM toks),
            uni AS (SELECT term AS tok, CAST(COUNT(*) AS BIGINT) AS c
                    FROM pos GROUP BY 1),
            tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM pos),
            pr AS (SELECT a.term AS u, b.term AS v,
                          CAST(COUNT(*) AS BIGINT) AS c_uv
                   FROM pos a JOIN pos b
                     ON a.doc_id = b.doc_id
                    AND b.i BETWEEN a.i + 1 AND a.i + 2
                   GROUP BY 1, 2 HAVING COUNT(*) >= 2)
            SELECT pr.u, pr.v, pr.c_uv,
                   CAST(pr.c_uv * tt.t * 1000000 // (cu.c * cv.c)
                        AS BIGINT) AS pmi_scaled
            FROM pr JOIN uni cu ON cu.tok = pr.u
            JOIN uni cv ON cv.tok = pr.v CROSS JOIN tt
            ORDER BY pmi_scaled DESC, u, v LIMIT 50
        """,
        # rational BM25: saturation fraction cleared to one integer
        # division by 20*S (S = corpus tokens, N = corpus size), same
        # integer idf and split law as tfidf_search
        "bm25_search": """
            WITH toks AS (
              SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text),
                            '\\s+'), x -> x <> '') AS w
              FROM documents
            ),
            g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                         CAST(SUM(len(w)) AS BIGINT) AS s FROM toks),
            x AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl,
                         unnest(w) AS term FROM toks),
            tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf,
                          MIN(dl) AS dl
                   FROM x WHERE term IN ('merge', 'vector', 'scan', 'hash')
                   GROUP BY 1, 2),
            dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                      FROM tf GROUP BY 1)
            SELECT doc_id,
                   CAST(SUM(((g.n * 1000000) // dfreq.df)
                            * ((44 * g.s * tf.tf * 100000) //
                               (20 * g.s * tf.tf + 6 * g.s
                                + 18 * tf.dl * g.n)))
                        AS BIGINT) AS score
            FROM tf JOIN dfreq USING (term) CROSS JOIN g
            GROUP BY doc_id
            ORDER BY score DESC, doc_id LIMIT 25
        """,
        # bbox-scoped TF-IDF: idf measured over the viewport-local
        # corpus (df AND N from the scoped set), same split law
        "viewport_tfidf": f"""
            WITH scoped AS (
              SELECT doc_id, text,
                     {FX.SQL_LON.format(k="doc_id")} AS lon,
                     {FX.SQL_LAT.format(k="doc_id")} AS lat
              FROM documents
              WHERE lon BETWEEN -122.33 AND -122.29
                AND lat BETWEEN 47.62 AND 47.66
            ),
            w AS (
              SELECT doc_id,
                     unnest(list_filter(regexp_split_to_array(lower(text),
                            '\\s+'), x -> x <> '')) AS term
              FROM scoped
            ),
            tf AS (
              SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
              FROM w WHERE term IN ('merge', 'vector', 'scan')
              GROUP BY 1, 2
            ),
            dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                      FROM tf GROUP BY 1),
            n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scoped)
            SELECT doc_id,
                   CAST(SUM(tf * ((n.n * 1000000) // dfreq.df))
                        AS BIGINT) AS score
            FROM tf JOIN dfreq USING (term) CROSS JOIN n
            GROUP BY doc_id
            ORDER BY score DESC, doc_id LIMIT 15
        """,
        # linked-step dwell: same cumsum-of-breaks window as trip_stats
        # but keyed on the floored-mm step threshold
        "stay_points": f"""
            WITH p AS (
              SELECT event_id, user_id, epoch_us(ts) AS us,
                     {FX.SQL_LON.format(k="event_id")} AS lon,
                     {FX.SQL_LAT.format(k="event_id")} AS lat
              FROM events
              WHERE (event_id * 40503 + 12345) % 5000 <> 0),
            t AS (
              SELECT *, LAG(us) OVER w AS prev_us,
                     LAG(lon) OVER w AS lon0, LAG(lat) OVER w AS lat0
              FROM p WINDOW w AS (PARTITION BY user_id
                                  ORDER BY us, event_id)),
            m AS (
              SELECT *, SUM(CASE WHEN prev_us IS NULL
                                   OR CAST(FLOOR(SQRT(
                                        (lon - lon0) * 111320.0
                                          * ((lon - lon0) * 111320.0)
                                        + (lat - lat0) * 110540.0
                                          * ((lat - lat0) * 110540.0)
                                      ) * 1000.0) AS BIGINT) > 3000000
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS dwell_seq
              FROM t)
            SELECT user_id, CAST(dwell_seq AS BIGINT) AS dwell_seq,
                   COUNT(*) AS n_pings,
                   CAST(MIN(us) AS BIGINT) AS start_us,
                   CAST(MAX(us) AS BIGINT) AS end_us,
                   CAST(MAX(us) - MIN(us) AS BIGINT) AS span_us,
                   MIN(event_id) AS anchor_id,
                   arg_min(lon, event_id) AS lon,
                   arg_min(lat, event_id) AS lat
            FROM m GROUP BY 1, 2
            HAVING MAX(us) - MIN(us) >= 43200000000
        """,
        # encounter join: candidates from a 0.03-deg lattice x +-1
        # buckets (any complete scheme yields the same refined set);
        # refine = integer |dt| + floored-mm distance
        "co_location": f"""
            WITH p AS (
              SELECT *, CAST(FLOOR(lon / 0.03) AS BIGINT) AS bx,
                     CAST(FLOOR(lat / 0.03) AS BIGINT) AS by2,
                     us // 1800000000 AS bt
              FROM (
                SELECT event_id, user_id, epoch_us(ts) AS us,
                       {FX.SQL_LON.format(k="event_id")} AS lon,
                       {FX.SQL_LAT.format(k="event_id")} AS lat
                FROM events
                WHERE (event_id * 40503 + 12345) % 5000 <> 0)),
            a AS (
              SELECT p.*, bx + dx.d AS jbx, by2 + dy.d AS jby,
                     bt + dt.d AS jbt
              FROM p, UNNEST([-1, 0, 1]) dx(d), UNNEST([-1, 0, 1]) dy(d),
                   UNNEST([-1, 0, 1]) dt(d)),
            pr AS (
              SELECT a.user_id AS user_a, b.user_id AS user_b,
                     a.us AS usa, b.us AS usb
              FROM a JOIN p b ON a.jbx = b.bx AND a.jby = b.by2
                             AND a.jbt = b.bt
              WHERE a.user_id < b.user_id
                AND ABS(a.us - b.us) <= 1800000000
                AND CAST(FLOOR(SQRT(
                      (b.lon - a.lon) * 111320.0
                        * ((b.lon - a.lon) * 111320.0)
                      + (b.lat - a.lat) * 110540.0
                        * ((b.lat - a.lat) * 110540.0)
                    ) * 1000.0) AS BIGINT) <= 3000000)
            SELECT user_a, user_b, CAST(COUNT(*) AS BIGINT) AS n_encounters,
                   CAST(MIN(LEAST(usa, usb)) AS BIGINT) AS first_us,
                   CAST(MAX(GREATEST(usa, usb)) AS BIGINT) AS last_us
            FROM pr GROUP BY 1, 2
        """,
        "token_count": r"""
            SELECT doc_id,
                   len(list_filter(regexp_split_to_array(lower(text), '\s+'),
                       x -> x <> '')) AS n_tokens_ws,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_tokens_bpe
            FROM documents
        """,
        "text_quality": _quality_sql(),
        "langid": f"""
            WITH hits AS (
              SELECT doc_id,
                     {", ".join(f"{_sw_sql(c)} AS h_{c}" for c in sorted(TX.STOPWORDS))}
              FROM documents),
            scored AS (
              SELECT doc_id, {hits_exprs_named} AS best,
                     {", ".join(f"h_{c}" for c in sorted(TX.STOPWORDS))}
              FROM hits)
            SELECT lang_pred, COUNT(*) AS n FROM (
              SELECT CASE WHEN best = 0 THEN 'und' {sw_cases} END AS lang_pred
              FROM scored) GROUP BY lang_pred
        """,
        # one-pass per-source data card: every metric an exact integer
        # (token sums, micro-quality fixed point, language counts)
        "corpus_report": f"""
            WITH q AS ({_quality_sql(", source")}),
            h AS (
              SELECT doc_id,
                     len(list_filter(regexp_split_to_array(lower(text),
                         '\\s+'), x -> x <> '')) AS n_ws,
                     {", ".join(f"{_sw_sql(c)} AS h_{c}"
                                for c in sorted(TX.STOPWORDS))}
              FROM documents),
            d AS (
              SELECT doc_id, n_ws,
                     CASE WHEN {hits_exprs_named} = 0 THEN 'und'
                          {sw_cases.replace("= best", f"= {hits_exprs_named}")}
                     END AS lang_pred
              FROM h)
            SELECT q.source AS source,
                   COUNT(*) AS n_docs,
                   CAST(SUM(d.n_ws) AS BIGINT) AS total_tokens_ws,
                   MIN(d.n_ws) AS min_tokens_ws,
                   MAX(d.n_ws) AS max_tokens_ws,
                   CAST(SUM(CAST(ROUND(q.quality_score * 1000000) AS BIGINT))
                        AS BIGINT) AS quality_micros,
                   {", ".join(
                       "CAST(SUM(CASE WHEN lang_pred = '" + c +
                       "' THEN 1 ELSE 0 END) AS BIGINT) AS n_" + c
                       for c in sorted(TX.STOPWORDS) + ["und"])}
            FROM q JOIN d USING (doc_id)
            GROUP BY q.source
        """,
        "exact_dedup": f"""
            SELECT MIN(doc_id) AS doc_id FROM documents
            GROUP BY md5({_NORM_TEXT})
        """,
        "fingerprint": f"""
            SELECT doc_id, md5({_NORM_TEXT}) AS fingerprint FROM documents
        """,
        "embedding_topk": _TOPK_SQL,
        # IVF with nprobe = n_centroids is exact, so the scale-path plan
        # shares the brute-force oracle.
        "ivf_topk": _TOPK_SQL,
        # quantized scan + exact float re-rank at full probe: also exact
        "ivf_quantized_topk": _TOPK_SQL,
        # persistent index probes every bucket at full nprobe: exact
        "ivf_indexed_topk": _TOPK_SQL,
        # Planted-corpus dedup survivor sets (closed-form; see
        # fixtures_tpch.planted_documents / planted_embeddings for why
        # removal AND survival are deterministic, not probabilistic).
        "minhash_dedup": f"""
            SELECT doc_id FROM documents
            UNION ALL
            SELECT doc_id + {FX.PLANT_NEAR_OFFSET} AS doc_id
            FROM documents WHERE doc_id % 7 = 3
        """,
        "simhash_dedup": f"""
            SELECT doc_id FROM documents
            UNION ALL
            SELECT doc_id + {FX.PLANT_NEAR_OFFSET} AS doc_id
            FROM documents WHERE doc_id % 7 = 3
        """,
        "embedding_neardup": f"""
            SELECT vec_id FROM embeddings
            UNION ALL
            SELECT vec_id + {FX.PLANT_NEAR_OFFSET} AS vec_id
            FROM embeddings WHERE vec_id % 7 = 3
        """,
        # cc cluster collapse over planted hamming 3-chains: exactly
        # the min-id member (3k) of every chain survives — the pairwise
        # rule would also emit 3k+1, so extra rows fail this oracle
        "hamming_cluster_dedup": """
            SELECT CAST(c_custkey * 3 AS BIGINT) AS image_id
            FROM customer
        """,
        # keep-best policy over the same 3-chains: component of chain k
        # is exactly {3k, 3k+1, 3k+2}, survivor = argmax of the affine
        # quality score (ties -> min id)
        "cluster_keep_best": """
            WITH m AS (
              SELECT CAST(c_custkey AS BIGINT) * 3 + t.off AS image_id
              FROM customer, (VALUES (0), (1), (2)) AS t(off)),
            q AS (SELECT image_id,
                         (image_id * 2654435761) % 97 AS qual,
                         image_id // 3 AS comp FROM m)
            SELECT image_id FROM (
              SELECT image_id,
                     ROW_NUMBER() OVER (PARTITION BY comp
                                        ORDER BY qual DESC, image_id) AS rk
              FROM q) WHERE rk = 1
        """,
        # every component of the planted copy/negation fixture is a
        # 2-clique, so cc survivors = the pairwise survivor set
        "embedding_cluster_dedup": f"""
            SELECT vec_id FROM embeddings
            UNION ALL
            SELECT vec_id + {FX.PLANT_NEAR_OFFSET} AS vec_id
            FROM embeddings WHERE vec_id % 7 = 3
        """,
        # quad_zones boundaries sit between lattice points, so zone
        # membership is exact integer arithmetic on the key hash.
        # vertical edges at u = 10000k; point-edge distance is purely
        # longitudinal, one cos factor (local metric at 47.6N); margin
        # to the 600 m threshold ~1.9 cm on the integer u lattice
        "dwithin_local_count": """
            SELECT e.edge_id, COALESCE(c.n, 0) AS n
            FROM (SELECT CAST(range AS BIGINT) AS edge_id FROM range(10)) e
            LEFT JOIN (
              SELECT ed.edge_id, COUNT(*) AS n
              FROM (SELECT CAST(range AS BIGINT) AS edge_id
                    FROM range(10)) ed
              JOIN (SELECT (o_orderkey * 2654435761) % 100000 AS u
                    FROM orders) p
                ON ABS(p.u - ed.edge_id * 10000)
                   * (111320 * COS(RADIANS(47.6))) <= 600 * 1000000
              GROUP BY ed.edge_id) c USING (edge_id)
        """,
        # nearest vertical edge = lon hash rounded to the 10000-unit
        # lattice (midpoint ties excluded; lower-id tie-break never
        # fires); the 800 m local cutoff tags every surviving point
        "knn_local_tag": """
            SELECT o_orderkey,
                   LEAST((u + 4999) // 10000, 9) AS nearest_edge_id
            FROM (SELECT o_orderkey,
                         (o_orderkey * 2654435761) % 100000 AS u
                  FROM orders)
            WHERE u % 10000 <> 5000
        """,
        # proper-crossing count per vertical lattice edge: one segment
        # per supplier whose start-u falls strictly inside the previous
        # lattice interval (touch-risk residues excluded on both sides)
        "edge_cross_count": """
            SELECT r.range AS edge_id, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
            FROM range(10) r LEFT JOIN (
              SELECT u // 10000 + 1 AS k, COUNT(*) AS n
              FROM (SELECT (s_suppkey * 2654435761) % 100000 AS u,
                           (s_suppkey * 40503 + 12345) % 100000 AS v
                    FROM supplier)
              WHERE u % 10000 <> 0 AND v <> 0 AND u < 90000
              GROUP BY 1) c ON r.range = c.k
        """,
        # trajectory local metric: gap iff the lattice distance (units
        # of 1e-6 deg lon) exceeds 300 m / (0.111320 * cos(47.6)) =
        # 3996.45 -> integer threshold 3997 (equator would be 2695)
        "coverage_gaps_local": """
            SELECT o_orderkey FROM (
              SELECT o_orderkey,
                     CASE WHEN u > 90000 THEN u - 90000
                          ELSE LEAST(u % 10000, 10000 - u % 10000)
                     END AS d
              FROM (SELECT o_orderkey,
                           (o_orderkey * 2654435761) % 100000 AS u
                    FROM orders))
            WHERE d >= 3997
        """,
        # same closed form as zone_pip_count: every fixture point is
        # interior, where contains == unbuffered intersects
        "zone_contains_count": """
            SELECT z.zone_id, COALESCE(c.n, 0) AS n
            FROM (SELECT CAST(range AS BIGINT) AS zone_id FROM range(16)) z
            LEFT JOIN (
              SELECT ((o_orderkey * 40503 + 12345) % 100000) // 25000 * 4
                   + ((o_orderkey * 2654435761) % 100000) // 25000 AS zone_id,
                     COUNT(*) AS n
              FROM orders GROUP BY 1) c USING (zone_id)
        """,
        "zone_pip_count": """
            SELECT z.zone_id, COALESCE(c.n, 0) AS n
            FROM (SELECT CAST(range AS BIGINT) AS zone_id FROM range(16)) z
            LEFT JOIN (
              SELECT ((o_orderkey * 40503 + 12345) % 100000) // 25000 * 4
                   + ((o_orderkey * 2654435761) % 100000) // 25000 AS zone_id,
                     COUNT(*) AS n
              FROM orders GROUP BY 1) c USING (zone_id)
        """,
        # horizontal edge (u..u+10000, v) intersects the half-lattice
        # bbox iff u,v fall in the integer ranges below
        "bbox_edges": """
            SELECT s_suppkey AS edge_id FROM (
              SELECT s_suppkey,
                     (s_suppkey * 2654435761) % 100000 AS u,
                     (s_suppkey * 40503 + 12345) % 100000 AS v
              FROM supplier)
            WHERE v BETWEEN 30000 AND 69999
              AND u <= 69999 AND u + 10000 >= 40000
        """,
        # anti-diagonal split: zone 0 iff u + v <= 99999
        "tri_zone_pip": """
            SELECT z.zone_id, COALESCE(c.n, 0) AS n
            FROM (SELECT CAST(range AS BIGINT) AS zone_id FROM range(2)) z
            LEFT JOIN (
              SELECT CAST(CASE WHEN (o_orderkey * 2654435761) % 100000
                              + (o_orderkey * 40503 + 12345) % 100000 <= 99999
                          THEN 0 ELSE 1 END AS BIGINT) AS zone_id,
                     COUNT(*) AS n
              FROM orders GROUP BY 1) c USING (zone_id)
        """,
        # oriented supplier edges: angle vs horizontal targets is exactly
        # 0/45/90 deg, so `degrees(ST_Angle) < 30` <=> s_suppkey % 3 = 0;
        # pure angle is unbounded, so every target matches the same set
        "angle_join": """
            SELECT CAST(r.range AS BIGINT) AS edge_id,
                   (SELECT COUNT(*) FROM supplier WHERE s_suppkey % 3 = 0) AS n
            FROM range(10) r
        """,
        # buffer 600 m AND angle < 30: horizontal sources within
        # |lat diff| * 110540 <= 600 of grid edge k (closed form; nearest
        # lattice offsets are >= 0.011 m from the threshold)
        "angle_buffer_join": """
            SELECT z.edge_id, COALESCE(c.n, 0) AS n
            FROM (SELECT CAST(range AS BIGINT) AS edge_id FROM range(10)) z
            LEFT JOIN (
              SELECT e.range AS edge_id, COUNT(*) AS n
              FROM range(10) e, supplier s
              WHERE s.s_suppkey % 3 = 0
                AND ABS((47.60 + ((s.s_suppkey * 40503 + 12345) % 100000) / 1000000.0)
                        - (47.605 + e.range * 0.01)) * 110540.0 <= 600.0
              GROUP BY e.range) c USING (edge_id)
        """,
        # exact replica of io/osm_xml.py way_lines + _xml_escape
        # (& first, then <, then ") over the supplier_ways fixture
        "osm_ways": """
            SELECT '<way id="' || s_suppkey || '" version="1">'
                || '<nd ref="' || (s_suppkey * 2) || '"/>'
                || '<nd ref="' || (s_suppkey * 2 + 1) || '"/>'
                || '<tag k="highway" v="'
                || CASE WHEN s_suppkey % 2 = 0 THEN 'footway'
                        ELSE 'residential' END || '"/>'
                || '<tag k="name" v="'
                || replace(replace(replace('s<' || s_suppkey || '> & "co"',
                     '&', '&amp;'), '<', '&lt;'), '"', '&quot;')
                || '"/></way>' AS line
            FROM supplier
        """,
        # exact replica of io/geojson.py feature_lines over the supplier
        # line layer: json.dumps spacing for the geometry object, to_json
        # (no spaces) for properties; doubles print shortest-round-trip
        # identically in Python and DuckDB
        "geojson_lines": f"""
            SELECT '{{"type":"Feature","geometry":{{"type": "LineString", "coordinates": [['
                || CAST(lon AS VARCHAR) || ', ' || CAST(lat AS VARCHAR) || '], ['
                || CAST(lon + 0.01 AS VARCHAR) || ', ' || CAST(lat AS VARCHAR)
                || ']]}},"properties":{{"edge_id":"' || s_suppkey
                || '","dataset_id":"tpch-sedges"}}}}' AS feature
            FROM (SELECT s_suppkey, {SQL_LON_S} AS lon, {SQL_LAT_S} AS lat
                  FROM supplier)
        """,

        # append-mode emission rule is closed-form on a static table:
        # exactly the hour windows whose end <= max(ts) - 30 minutes
        "windowed_events": """
            WITH m AS (SELECT MAX(ts) AS mx FROM events)
            SELECT strftime(window_start, '%Y-%m-%d %H:%M:%S') AS window_start,
                   strftime(window_end, '%Y-%m-%d %H:%M:%S') AS window_end,
                   event_type, n FROM (
              SELECT date_trunc('hour', ts) AS window_start,
                     date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
                     event_type, COUNT(*) AS n
              FROM events GROUP BY 1, 2, 3) w, m
            WHERE w.window_end <= m.mx - INTERVAL 30 MINUTE
        """,
        # streaming tile maintenance: same tile formula + the windowed
        # emission rule (window end <= max ts - 30 min)
        "streaming_tiles": f"""
            WITH m AS (SELECT MAX(ts) AS mx FROM events),
            e AS (
              SELECT date_trunc('hour', ts) AS ws,
                     date_trunc('hour', ts) + INTERVAL 1 HOUR AS we,
                     CAST(FLOOR(({FX.SQL_LON.format(k="event_id")} + 180.0)
                                / 360.0 * 32768) AS INT) AS tile_x,
                     CAST(FLOOR((1.0 - ln(tan(radians({FX.SQL_LAT.format(k="event_id")}))
                                          + 1.0 / cos(radians({FX.SQL_LAT.format(k="event_id")})))
                                 / pi()) / 2.0 * 32768) AS INT) AS tile_y
              FROM events)
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
                   tile_x, tile_y, CAST(COUNT(*) AS BIGINT) AS n
            FROM e, m WHERE we <= mx - INTERVAL 30 MINUTE
            GROUP BY 1, 2, 3
        """,
        # streaming geofence: zone = the od_matrix integer formula over
        # ALL events (no edge-tie exclusion needed: quad boundaries sit
        # between lattice points); sealed iff window end <= max ts - 30m
        "streaming_zones": """
            WITH m AS (SELECT MAX(ts) AS mx FROM events),
            e AS (
              SELECT date_trunc('hour', ts) AS ws,
                     date_trunc('hour', ts) + INTERVAL 1 HOUR AS we,
                     ((event_id * 40503 + 12345) % 100000) // 25000 * 4
                     + ((event_id * 2654435761) % 100000) // 25000
                       AS zone_id
              FROM events)
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
                   CAST(zone_id AS BIGINT) AS zone_id,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM e, m WHERE we <= mx - INTERVAL 30 MINUTE
            GROUP BY 1, 2
        """,
        # session merge rule: strictly-greater 10-min gap breaks (an
        # event exactly gap after the previous merges — pinned against
        # F.session_window in tests); emission: session end (last event
        # + gap) <= final watermark (max ts - 30 min)
        "session_windows": """
            WITH m AS (SELECT MAX(ts) AS mx FROM events),
            t AS (
              SELECT event_type, ts, event_id,
                     CASE WHEN LAG(ts) OVER (PARTITION BY event_type
                               ORDER BY ts, event_id) IS NULL
                            OR ts - LAG(ts) OVER (PARTITION BY event_type
                               ORDER BY ts, event_id) > INTERVAL 10 MINUTE
                          THEN 1 ELSE 0 END AS brk
              FROM events),
            s AS (
              SELECT event_type, ts,
                     SUM(brk) OVER (PARTITION BY event_type
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM t),
            g AS (
              SELECT event_type,
                     MIN(ts) AS session_start,
                     MAX(ts) + INTERVAL 10 MINUTE AS session_end,
                     COUNT(*) AS n
              FROM s GROUP BY event_type, sid)
            SELECT strftime(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
                   strftime(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
                   event_type, n
            FROM g, m WHERE session_end <= mx - INTERVAL 30 MINUTE
        """,
        # base tiles from the proven z15 formula; coarser levels are
        # exact integer floor-division chains (floor nests)
        "tile_pyramid": f"""
            WITH t AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS INT) AS x,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS INT) AS y
              FROM {_PTS})
            SELECT CAST(15 AS INT) AS z, CAST(x // 1 AS INT) AS tile_x, CAST(y // 1 AS INT) AS tile_y, COUNT(*) AS n FROM t GROUP BY 1, 2, 3
            UNION ALL
            SELECT CAST(14 AS INT) AS z, CAST(x // 2 AS INT) AS tile_x, CAST(y // 2 AS INT) AS tile_y, COUNT(*) AS n FROM t GROUP BY 1, 2, 3
            UNION ALL
            SELECT CAST(13 AS INT) AS z, CAST(x // 4 AS INT) AS tile_x, CAST(y // 4 AS INT) AS tile_y, COUNT(*) AS n FROM t GROUP BY 1, 2, 3
            UNION ALL
            SELECT CAST(12 AS INT) AS z, CAST(x // 8 AS INT) AS tile_x, CAST(y // 8 AS INT) AS tile_y, COUNT(*) AS n FROM t GROUP BY 1, 2, 3
            UNION ALL
            SELECT CAST(11 AS INT) AS z, CAST(x // 16 AS INT) AS tile_x, CAST(y // 16 AS INT) AS tile_y, COUNT(*) AS n FROM t GROUP BY 1, 2, 3
        """,
        # raster render: pixel lattice = the z15 grid (tile*16 + px);
        # decoded-pixel stats replay as floor arithmetic + LEAST clip
        "tile_raster": f"""
            WITH g AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy
              FROM {_PTS}),
            pix AS (SELECT gx, gy, COUNT(*) AS n FROM g GROUP BY 1, 2)
            SELECT CAST(11 AS INT) AS z,
                   CAST(gx // 16 AS INT) AS tile_x,
                   CAST(gy // 16 AS INT) AS tile_y,
                   CAST(COUNT(*) AS BIGINT) AS nonzero_px,
                   CAST(SUM(LEAST(n, 255)) AS BIGINT) AS sum_px,
                   CAST(MAX(LEAST(n, 255)) AS BIGINT) AS max_px
            FROM pix GROUP BY 1, 2, 3
        """,
        # visual layer: per-key decoded pixel sums are polynomials in
        # popcount(V) (augment_meta's closed form), the lattice is the
        # verified z15 grid, pixel value = integer mean, then the
        # decoded-tile stats replay as floor arithmetic
        "brightness_raster": f"""
            WITH v AS (
              SELECT p_partkey,
                     CAST((CAST(p_partkey % 127 + 1 AS HUGEINT)
                           * 11400714819323198485)
                          % 2305843009213693952 AS BIGINT) AS V,
                     1 + p_partkey % 3 AS s,
                     CASE WHEN p_partkey % 2 = 0 THEN 200 ELSE 202 END AS hi,
                     CASE WHEN p_partkey % 2 = 0 THEN 40 ELSE 42 END AS lo,
                     {FX.SQL_LON.format(k="p_partkey")} AS lon,
                     {FX.SQL_LAT.format(k="p_partkey")} AS lat
              FROM part),
            q AS (
              SELECT *,
                     ({" + ".join(f"((V // {1 << i}) % 2)" for i in range(61))}) AS pop
              FROM v),
            e AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy,
                     CAST(3 * s * s AS BIGINT)
                       * (hi * pop + lo * (64 - pop)) AS ps,
                     CAST(192 AS BIGINT) * s * s AS np
              FROM q),
            pix AS (SELECT gx, gy,
                           LEAST(SUM(ps) // SUM(np), 255) AS vv
                    FROM e GROUP BY 1, 2)
            SELECT CAST(11 AS INT) AS z,
                   CAST(gx // 16 AS INT) AS tile_x,
                   CAST(gy // 16 AS INT) AS tile_y,
                   CAST(COUNT(*) AS BIGINT) AS nonzero_px,
                   CAST(SUM(vv) AS BIGINT) AS sum_px,
                   CAST(MAX(vv) AS BIGINT) AS max_px
            FROM pix GROUP BY 1, 2, 3
        """,
        # incremental == full recompute: (ps, np) is a monoid
        "incremental_brightness": f"""
            WITH v AS (
              SELECT p_partkey,
                     CAST((CAST(p_partkey % 127 + 1 AS HUGEINT)
                           * 11400714819323198485)
                          % 2305843009213693952 AS BIGINT) AS V,
                     1 + p_partkey % 3 AS s,
                     CASE WHEN p_partkey % 2 = 0 THEN 200 ELSE 202 END AS hi,
                     CASE WHEN p_partkey % 2 = 0 THEN 40 ELSE 42 END AS lo,
                     {FX.SQL_LON.format(k="p_partkey")} AS lon,
                     {FX.SQL_LAT.format(k="p_partkey")} AS lat
              FROM part),
            q AS (
              SELECT *,
                     ({" + ".join(f"((V // {1 << i}) % 2)" for i in range(61))}) AS pop
              FROM v),
            e AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy,
                     CAST(3 * s * s AS BIGINT)
                       * (hi * pop + lo * (64 - pop)) AS ps,
                     CAST(192 AS BIGINT) * s * s AS np
              FROM q),
            pix AS (SELECT gx, gy,
                           LEAST(SUM(ps) // SUM(np), 255) AS vv
                    FROM e GROUP BY 1, 2)
            SELECT CAST(11 AS INT) AS z,
                   CAST(gx // 16 AS INT) AS tile_x,
                   CAST(gy // 16 AS INT) AS tile_y,
                   CAST(COUNT(*) AS BIGINT) AS nonzero_px,
                   CAST(SUM(vv) AS BIGINT) AS sum_px,
                   CAST(MAX(vv) AS BIGINT) AS max_px
            FROM pix GROUP BY 1, 2, 3
        """,
        # gallery: winner = MIN key per z15 tile; nearest-neighbor
        # 16x16 thumbnails sample each logical 8x8 block exactly 4x
        # (16 = 2*8, block edges divide evenly for every s = 1+k%3),
        # so the decoded sums are again popcount(V) polynomials
        "tile_gallery": f"""
            WITH v AS (
              SELECT p_partkey,
                     CAST((CAST(p_partkey % 127 + 1 AS HUGEINT)
                           * 11400714819323198485)
                          % 2305843009213693952 AS BIGINT) AS V,
                     CASE WHEN p_partkey % 2 = 0 THEN 200 ELSE 202 END AS hi,
                     CASE WHEN p_partkey % 2 = 0 THEN 40 ELSE 42 END AS lo,
                     {FX.SQL_LON.format(k="p_partkey")} AS lon,
                     {FX.SQL_LAT.format(k="p_partkey")} AS lat
              FROM part),
            t AS (
              SELECT *,
                     CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS tx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS ty
              FROM v),
            r AS (SELECT tx, ty, MIN(p_partkey) AS k
                  FROM t GROUP BY 1, 2),
            q AS (
              SELECT r.tx, r.ty, t.p_partkey, t.hi, t.lo,
                     ({" + ".join(f"((V // {1 << i}) % 2)" for i in range(61))}) AS pop
              FROM r JOIN t ON t.p_partkey = r.k)
            SELECT CAST(15 AS INT) AS z,
                   CAST(tx AS INT) AS tile_x,
                   CAST(ty AS INT) AS tile_y,
                   CAST(256 AS BIGINT) AS nonzero_px,
                   CAST(4 * (hi * pop + lo * (64 - pop)) AS BIGINT) AS sum_px,
                   CAST(hi AS BIGINT) AS max_px,
                   CAST(p_partkey AS BIGINT) AS image_id
            FROM q
        """,
        # codec-pair fidelity: qimg shifts every decoded sample by
        # exactly 2, so the squared error is 4 per channel sample
        "decode_mse": """
            SELECT CAST(p_partkey AS BIGINT) AS image_id,
                   CAST(8 * (1 + p_partkey % 3) AS INT) AS w,
                   CAST(8 * (1 + p_partkey % 3) AS INT) AS h,
                   CAST(192 * (1 + p_partkey % 3) * (1 + p_partkey % 3)
                        AS BIGINT) AS n_px,
                   CAST(768 * (1 + p_partkey % 3) * (1 + p_partkey % 3)
                        AS BIGINT) AS sq_err_sum
            FROM part
        """,
        # dominant caption term per tile: identical split law (split on
        # non-alnum after lower, drop empties), ties to smallest term
        "tile_terms": f"""
            WITH p AS (
              SELECT {FX.SQL_LON.format(k="p_partkey")} AS lon,
                     {FX.SQL_LAT.format(k="p_partkey")} AS lat,
                     'scene' || CAST(p_partkey % 5 AS VARCHAR)
                       || ' tag' || CAST(p_partkey % 11 AS VARCHAR)
                       AS caption
              FROM part),
            t AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS tx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS ty,
                     unnest(list_filter(regexp_split_to_array(
                         lower(caption), '[^a-z0-9]+'),
                         x -> x <> '')) AS term
              FROM p),
            c AS (SELECT tx, ty, term, COUNT(*) AS n
                  FROM t GROUP BY 1, 2, 3),
            r AS (SELECT *,
                         ROW_NUMBER() OVER (PARTITION BY tx, ty
                                            ORDER BY n DESC, term) AS rk,
                         SUM(n) OVER (PARTITION BY tx, ty) AS tot
                  FROM c)
            SELECT CAST(15 AS INT) AS z,
                   tx AS tile_x, ty AS tile_y, term,
                   CAST(n AS BIGINT) AS n_term,
                   CAST(tot AS BIGINT) AS n_total_terms
            FROM r WHERE rk = 1
        """,
        # incremental == full recompute: term counts are a monoid
        "incremental_terms": f"""
            WITH p AS (
              SELECT {FX.SQL_LON.format(k="p_partkey")} AS lon,
                     {FX.SQL_LAT.format(k="p_partkey")} AS lat,
                     'scene' || CAST(p_partkey % 5 AS VARCHAR)
                       || ' tag' || CAST(p_partkey % 11 AS VARCHAR)
                       AS caption
              FROM part),
            t AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS tx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS ty,
                     unnest(list_filter(regexp_split_to_array(
                         lower(caption), '[^a-z0-9]+'),
                         x -> x <> '')) AS term
              FROM p),
            c AS (SELECT tx, ty, term, COUNT(*) AS n
                  FROM t GROUP BY 1, 2, 3),
            r AS (SELECT *,
                         ROW_NUMBER() OVER (PARTITION BY tx, ty
                                            ORDER BY n DESC, term) AS rk,
                         SUM(n) OVER (PARTITION BY tx, ty) AS tot
                  FROM c)
            SELECT CAST(15 AS INT) AS z,
                   tx AS tile_x, ty AS tile_y, term,
                   CAST(n AS BIGINT) AS n_term,
                   CAST(tot AS BIGINT) AS n_total_terms
            FROM r WHERE rk = 1
        """,
        # incremental admission == full rebuild: min nests, so the
        # merged layer is exactly the tile_gallery closed form over
        # ALL keys
        "incremental_gallery": f"""
            WITH v AS (
              SELECT p_partkey,
                     CAST((CAST(p_partkey % 127 + 1 AS HUGEINT)
                           * 11400714819323198485)
                          % 2305843009213693952 AS BIGINT) AS V,
                     CASE WHEN p_partkey % 2 = 0 THEN 200 ELSE 202 END AS hi,
                     CASE WHEN p_partkey % 2 = 0 THEN 40 ELSE 42 END AS lo,
                     {FX.SQL_LON.format(k="p_partkey")} AS lon,
                     {FX.SQL_LAT.format(k="p_partkey")} AS lat
              FROM part),
            t AS (
              SELECT *,
                     CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS tx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS ty
              FROM v),
            r AS (SELECT tx, ty, MIN(p_partkey) AS k
                  FROM t GROUP BY 1, 2),
            q AS (
              SELECT r.tx, r.ty, t.p_partkey, t.hi, t.lo,
                     (((V // 1) % 2) + ((V // 2) % 2) + ((V // 4) % 2) + ((V // 8) % 2) + ((V // 16) % 2) + ((V // 32) % 2) + ((V // 64) % 2) + ((V // 128) % 2) + ((V // 256) % 2) + ((V // 512) % 2) + ((V // 1024) % 2) + ((V // 2048) % 2) + ((V // 4096) % 2) + ((V // 8192) % 2) + ((V // 16384) % 2) + ((V // 32768) % 2) + ((V // 65536) % 2) + ((V // 131072) % 2) + ((V // 262144) % 2) + ((V // 524288) % 2) + ((V // 1048576) % 2) + ((V // 2097152) % 2) + ((V // 4194304) % 2) + ((V // 8388608) % 2) + ((V // 16777216) % 2) + ((V // 33554432) % 2) + ((V // 67108864) % 2) + ((V // 134217728) % 2) + ((V // 268435456) % 2) + ((V // 536870912) % 2) + ((V // 1073741824) % 2) + ((V // 2147483648) % 2) + ((V // 4294967296) % 2) + ((V // 8589934592) % 2) + ((V // 17179869184) % 2) + ((V // 34359738368) % 2) + ((V // 68719476736) % 2) + ((V // 137438953472) % 2) + ((V // 274877906944) % 2) + ((V // 549755813888) % 2) + ((V // 1099511627776) % 2) + ((V // 2199023255552) % 2) + ((V // 4398046511104) % 2) + ((V // 8796093022208) % 2) + ((V // 17592186044416) % 2) + ((V // 35184372088832) % 2) + ((V // 70368744177664) % 2) + ((V // 140737488355328) % 2) + ((V // 281474976710656) % 2) + ((V // 562949953421312) % 2) + ((V // 1125899906842624) % 2) + ((V // 2251799813685248) % 2) + ((V // 4503599627370496) % 2) + ((V // 9007199254740992) % 2) + ((V // 18014398509481984) % 2) + ((V // 36028797018963968) % 2) + ((V // 72057594037927936) % 2) + ((V // 144115188075855872) % 2) + ((V // 288230376151711744) % 2) + ((V // 576460752303423488) % 2) + ((V // 1152921504606846976) % 2)) AS pop
              FROM r JOIN t ON t.p_partkey = r.k)
            SELECT CAST(15 AS INT) AS z,
                   CAST(tx AS INT) AS tile_x,
                   CAST(ty AS INT) AS tile_y,
                   CAST(256 AS BIGINT) AS nonzero_px,
                   CAST(4 * (hi * pop + lo * (64 - pop)) AS BIGINT) AS sum_px,
                   CAST(hi AS BIGINT) AS max_px,
                   CAST(p_partkey AS BIGINT) AS image_id
            FROM q
        """,
        # winner nesting under halving: parent winner = min of child
        # winners = min key per halved tile; same thumbnail polynomial
        "gallery_pyramid": f"""
            WITH v AS (
              SELECT p_partkey,
                     CAST((CAST(p_partkey % 127 + 1 AS HUGEINT)
                           * 11400714819323198485)
                          % 2305843009213693952 AS BIGINT) AS V,
                     CASE WHEN p_partkey % 2 = 0 THEN 200 ELSE 202 END AS hi,
                     CASE WHEN p_partkey % 2 = 0 THEN 40 ELSE 42 END AS lo,
                     {FX.SQL_LON.format(k="p_partkey")} AS lon,
                     {FX.SQL_LAT.format(k="p_partkey")} AS lat
              FROM part),
            t AS (
              SELECT *,
                     CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS tx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS ty
              FROM v),
            w AS (
              SELECT 15 AS z, tx, ty, MIN(p_partkey) AS k
              FROM t GROUP BY 2, 3
              UNION ALL
              SELECT 14, tx // 2, ty // 2, MIN(p_partkey)
              FROM t GROUP BY 2, 3
              UNION ALL
              SELECT 13, tx // 4, ty // 4, MIN(p_partkey)
              FROM t GROUP BY 2, 3),
            q AS (
              SELECT w.z, w.tx, w.ty, t.p_partkey, t.hi, t.lo,
                     ({" + ".join(f"((V // {1 << i}) % 2)" for i in range(61))}) AS pop
              FROM w JOIN t ON t.p_partkey = w.k)
            SELECT CAST(z AS INT) AS z,
                   CAST(tx AS INT) AS tile_x,
                   CAST(ty AS INT) AS tile_y,
                   CAST(256 AS BIGINT) AS nonzero_px,
                   CAST(4 * (hi * pop + lo * (64 - pop)) AS BIGINT) AS sum_px,
                   CAST(hi AS BIGINT) AS max_px,
                   CAST(p_partkey AS BIGINT) AS image_id
            FROM q
        """,
        # count-space pyramid: z10 halves raw counts BEFORE the clip
        "raster_pyramid": f"""
            WITH g AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy
              FROM {_PTS}),
            pix AS (SELECT gx, gy, COUNT(*) AS n FROM g GROUP BY 1, 2),
            lv AS (
              SELECT 11 AS z, gx, gy, n FROM pix
              UNION ALL
              SELECT 10 AS z, gx // 2 AS gx, gy // 2 AS gy, SUM(n) AS n
              FROM pix GROUP BY 2, 3)
            SELECT CAST(z AS INT) AS z,
                   CAST(gx // 16 AS INT) AS tile_x,
                   CAST(gy // 16 AS INT) AS tile_y,
                   CAST(COUNT(*) AS BIGINT) AS nonzero_px,
                   CAST(SUM(LEAST(n, 255)) AS BIGINT) AS sum_px,
                   CAST(MAX(LEAST(n, 255)) AS BIGINT) AS max_px
            FROM lv GROUP BY 1, 2, 3
        """,
        # image-space mosaic: children clip at encode, parents pool the
        # CLIPPED child pixels (sum DIV 4); zero pixels don't count
        "tile_mosaic": f"""
            WITH g AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy
              FROM {_PTS}),
            pix AS (SELECT gx, gy, COUNT(*) AS n FROM g GROUP BY 1, 2),
            cp AS (SELECT gx // 2 AS gx, gy // 2 AS gy,
                          CAST(SUM(LEAST(n, 255)) // 4 AS BIGINT) AS v
                   FROM pix GROUP BY 1, 2)
            SELECT CAST(10 AS INT) AS z,
                   CAST(gx // 16 AS INT) AS tile_x,
                   CAST(gy // 16 AS INT) AS tile_y,
                   CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonzero_px,
                   CAST(SUM(v) AS BIGINT) AS sum_px,
                   CAST(MAX(v) AS BIGINT) AS max_px
            FROM cp GROUP BY 1, 2, 3
        """,
        # store round trip changes nothing: the viewport stats equal the
        # lattice stats restricted to the requested tile range
        "tile_viewport": f"""
            WITH g AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy
              FROM {_PTS}),
            pix AS (SELECT gx, gy, COUNT(*) AS n FROM g GROUP BY 1, 2)
            SELECT CAST(11 AS INT) AS z,
                   CAST(gx // 16 AS INT) AS tile_x,
                   CAST(gy // 16 AS INT) AS tile_y,
                   CAST(COUNT(*) AS BIGINT) AS nonzero_px,
                   CAST(SUM(LEAST(n, 255)) AS BIGINT) AS sum_px,
                   CAST(MAX(LEAST(n, 255)) AS BIGINT) AS max_px
            FROM pix
            WHERE gx // 16 = 327 AND gy // 16 BETWEEN 714 AND 715
            GROUP BY 1, 2, 3
        """,
        # merge == recompute: the incremental path re-encodes only
        # drop-touched tiles, the oracle renders the whole union
        "incremental_raster": f"""
            WITH u AS (
              SELECT {_LON} AS lon, {_LAT} AS lat FROM orders
              UNION ALL
              SELECT {FX.SQL_LON.format(k="c_custkey")} AS lon,
                     {FX.SQL_LAT.format(k="c_custkey")} AS lat
              FROM customer),
            g AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy
              FROM u),
            pix AS (SELECT gx, gy, COUNT(*) AS n FROM g GROUP BY 1, 2)
            SELECT CAST(11 AS INT) AS z,
                   CAST(gx // 16 AS INT) AS tile_x,
                   CAST(gy // 16 AS INT) AS tile_y,
                   CAST(COUNT(*) AS BIGINT) AS nonzero_px,
                   CAST(SUM(LEAST(n, 255)) AS BIGINT) AS sum_px,
                   CAST(MAX(LEAST(n, 255)) AS BIGINT) AS max_px
            FROM pix GROUP BY 1, 2, 3
        """,
        # vector->raster->vector round trip: extracted pixels are the
        # lattice rows whose clipped count reaches the threshold
        "raster_extract": f"""
            WITH g AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy
              FROM {_PTS}),
            pix AS (SELECT gx, gy, COUNT(*) AS n FROM g GROUP BY 1, 2)
            SELECT CAST(11 AS INT) AS z, gx, gy,
                   CAST(LEAST(n, 255) AS BIGINT) AS v
            FROM pix WHERE LEAST(n, 255) >= 2
        """,
        # 3x3 focal sum over raw counts, clip only at encode; the box
        # kernel is the cross join with the 9 integer offsets
        "raster_focal": f"""
            WITH g AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy
              FROM {_PTS}),
            pix AS (SELECT gx, gy, COUNT(*) AS n FROM g GROUP BY 1, 2),
            o AS (SELECT a.dx, b.dy
                  FROM (VALUES (-1), (0), (1)) a(dx)
                  CROSS JOIN (VALUES (-1), (0), (1)) b(dy)),
            f AS (SELECT gx + dx AS gx, gy + dy AS gy, SUM(n) AS n
                  FROM pix CROSS JOIN o GROUP BY 1, 2)
            SELECT CAST(11 AS INT) AS z,
                   CAST(gx // 16 AS INT) AS tile_x,
                   CAST(gy // 16 AS INT) AS tile_y,
                   CAST(COUNT(*) AS BIGINT) AS nonzero_px,
                   CAST(SUM(LEAST(n, 255)) AS BIGINT) AS sum_px,
                   CAST(MAX(LEAST(n, 255)) AS BIGINT) AS max_px
            FROM f GROUP BY 1, 2, 3
        """,
        # |A - B| over the parity-split layers: full outer join of the
        # two nonzero lattices, zero-diff pixels drop before encode
        "raster_algebra": f"""
            WITH g AS (
              SELECT o_orderkey,
                     CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy
              FROM {_PTS}),
            pa AS (SELECT gx, gy, COUNT(*) AS n FROM g
                   WHERE o_orderkey % 2 = 0 GROUP BY 1, 2),
            pb AS (SELECT gx, gy, COUNT(*) AS n FROM g
                   WHERE o_orderkey % 2 = 1 GROUP BY 1, 2),
            d AS (SELECT COALESCE(pa.gx, pb.gx) AS gx,
                         COALESCE(pa.gy, pb.gy) AS gy,
                         ABS(COALESCE(pa.n, 0) - COALESCE(pb.n, 0)) AS n
                  FROM pa FULL OUTER JOIN pb
                  ON pa.gx = pb.gx AND pa.gy = pb.gy)
            SELECT CAST(11 AS INT) AS z,
                   CAST(gx // 16 AS INT) AS tile_x,
                   CAST(gy // 16 AS INT) AS tile_y,
                   CAST(COUNT(*) AS BIGINT) AS nonzero_px,
                   CAST(SUM(LEAST(n, 255)) AS BIGINT) AS sum_px,
                   CAST(MAX(LEAST(n, 255)) AS BIGINT) AS max_px
            FROM d WHERE n > 0 GROUP BY 1, 2, 3
        """,
        # zonal stats of the DECODED layer: clipped pixel values joined
        # to the shared integer zone rectangles (inclusive bounds)
        # zonal stats over the visual layer: brightness closed form
        # (popcount polynomial, integer mean) -> zone rectangles
        "zonal_brightness": f"""
            WITH v AS (
              SELECT p_partkey,
                     CAST((CAST(p_partkey % 127 + 1 AS HUGEINT)
                           * 11400714819323198485)
                          % 2305843009213693952 AS BIGINT) AS V,
                     1 + p_partkey % 3 AS s,
                     CASE WHEN p_partkey % 2 = 0 THEN 200 ELSE 202 END AS hi,
                     CASE WHEN p_partkey % 2 = 0 THEN 40 ELSE 42 END AS lo,
                     {FX.SQL_LON.format(k="p_partkey")} AS lon,
                     {FX.SQL_LAT.format(k="p_partkey")} AS lat
              FROM part),
            q AS (
              SELECT *,
                     (((V // 1) % 2) + ((V // 2) % 2) + ((V // 4) % 2) + ((V // 8) % 2) + ((V // 16) % 2) + ((V // 32) % 2) + ((V // 64) % 2) + ((V // 128) % 2) + ((V // 256) % 2) + ((V // 512) % 2) + ((V // 1024) % 2) + ((V // 2048) % 2) + ((V // 4096) % 2) + ((V // 8192) % 2) + ((V // 16384) % 2) + ((V // 32768) % 2) + ((V // 65536) % 2) + ((V // 131072) % 2) + ((V // 262144) % 2) + ((V // 524288) % 2) + ((V // 1048576) % 2) + ((V // 2097152) % 2) + ((V // 4194304) % 2) + ((V // 8388608) % 2) + ((V // 16777216) % 2) + ((V // 33554432) % 2) + ((V // 67108864) % 2) + ((V // 134217728) % 2) + ((V // 268435456) % 2) + ((V // 536870912) % 2) + ((V // 1073741824) % 2) + ((V // 2147483648) % 2) + ((V // 4294967296) % 2) + ((V // 8589934592) % 2) + ((V // 17179869184) % 2) + ((V // 34359738368) % 2) + ((V // 68719476736) % 2) + ((V // 137438953472) % 2) + ((V // 274877906944) % 2) + ((V // 549755813888) % 2) + ((V // 1099511627776) % 2) + ((V // 2199023255552) % 2) + ((V // 4398046511104) % 2) + ((V // 8796093022208) % 2) + ((V // 17592186044416) % 2) + ((V // 35184372088832) % 2) + ((V // 70368744177664) % 2) + ((V // 140737488355328) % 2) + ((V // 281474976710656) % 2) + ((V // 562949953421312) % 2) + ((V // 1125899906842624) % 2) + ((V // 2251799813685248) % 2) + ((V // 4503599627370496) % 2) + ((V // 9007199254740992) % 2) + ((V // 18014398509481984) % 2) + ((V // 36028797018963968) % 2) + ((V // 72057594037927936) % 2) + ((V // 144115188075855872) % 2) + ((V // 288230376151711744) % 2) + ((V // 576460752303423488) % 2) + ((V // 1152921504606846976) % 2)) AS pop
              FROM v),
            e AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy,
                     CAST(3 * s * s AS BIGINT)
                       * (hi * pop + lo * (64 - pop)) AS ps,
                     CAST(192 AS BIGINT) * s * s AS np
              FROM q),
            pix AS (SELECT gx, gy, LEAST(SUM(ps) // SUM(np), 255) AS vv
                    FROM e GROUP BY 1, 2),
            zz AS (SELECT * FROM {FX.pixel_zones_sql()} z)
            SELECT CAST(zone_id AS BIGINT) AS zone_id,
                   CAST(COUNT(*) AS BIGINT) AS n_px,
                   CAST(SUM(vv) AS BIGINT) AS sum_v,
                   CAST(MAX(vv) AS BIGINT) AS max_v
            FROM pix JOIN zz
            ON pix.gx BETWEEN zz.gx0 AND zz.gx1
               AND pix.gy BETWEEN zz.gy0 AND zz.gy1
            GROUP BY 1
        """,
        "zonal_raster": f"""
            WITH g AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy
              FROM {_PTS}),
            pix AS (SELECT gx, gy, LEAST(COUNT(*), 255) AS v
                    FROM g GROUP BY 1, 2),
            zz AS (SELECT * FROM {FX.pixel_zones_sql()} z)
            SELECT CAST(zone_id AS BIGINT) AS zone_id,
                   CAST(COUNT(*) AS BIGINT) AS n_px,
                   CAST(SUM(v) AS BIGINT) AS sum_v,
                   CAST(MAX(v) AS BIGINT) AS max_v
            FROM pix JOIN zz
            ON pix.gx BETWEEN zz.gx0 AND zz.gx1
               AND pix.gy BETWEEN zz.gy0 AND zz.gy1
            GROUP BY 1
        """,
        # top-20 focal-density pixels under the deterministic total
        # order (v desc, gx, gy) — (gx, gy) is unique, so no rank ties
        "raster_hotspots": f"""
            WITH g AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy
              FROM {_PTS}),
            pix AS (SELECT gx, gy, COUNT(*) AS n FROM g GROUP BY 1, 2),
            o AS (SELECT a.dx, b.dy
                  FROM (VALUES (-1), (0), (1)) a(dx)
                  CROSS JOIN (VALUES (-1), (0), (1)) b(dy)),
            f AS (SELECT gx + dx AS gx, gy + dy AS gy, SUM(n) AS n
                  FROM pix CROSS JOIN o GROUP BY 1, 2)
            SELECT gx, gy, CAST(n AS BIGINT) AS v
            FROM f ORDER BY n DESC, gx, gy LIMIT 20
        """,
        # areal burn-in: zones expand by the constant W x H offset grid
        # (rectangles are uniform), weights sum onto the point lattice
        "zone_burnin": f"""
            WITH g AS (
              SELECT CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT) AS gx,
                     CAST(FLOOR((1.0 - ln(tan(radians(lat)) + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768) AS BIGINT) AS gy
              FROM {_PTS}),
            ppix AS (SELECT gx, gy, COUNT(*) AS n FROM g GROUP BY 1, 2),
            zz AS (SELECT * FROM {FX.pixel_zones_sql()} z),
            ox AS (SELECT * FROM (VALUES {", ".join(f"({i})" for i in range(FX.PIXEL_ZONE_W))}) t(dx)),
            oy AS (SELECT * FROM (VALUES {", ".join(f"({i})" for i in range(FX.PIXEL_ZONE_H))}) t(dy)),
            burn AS (SELECT gx0 + dx AS gx, gy0 + dy AS gy,
                            SUM(zone_id + 1) AS n
                     FROM zz CROSS JOIN ox CROSS JOIN oy GROUP BY 1, 2),
            m AS (SELECT gx, gy, SUM(n) AS n FROM (
                    SELECT gx, gy, n FROM ppix
                    UNION ALL SELECT gx, gy, n FROM burn)
                  GROUP BY 1, 2)
            SELECT CAST(11 AS INT) AS z,
                   CAST(gx // 16 AS INT) AS tile_x,
                   CAST(gy // 16 AS INT) AS tile_y,
                   CAST(COUNT(*) AS BIGINT) AS nonzero_px,
                   CAST(SUM(LEAST(n, 255)) AS BIGINT) AS sum_px,
                   CAST(MAX(LEAST(n, 255)) AS BIGINT) AS max_px
            FROM m GROUP BY 1, 2, 3
        """,
        # viewport visual search: the planted hash law reproduces every
        # recomputed phash in SQL, so the ranked distances are exact —
        # xor + 61-term popcount, ties broken by id
        "viewport_similar": f"""
            WITH v AS (
              SELECT p_partkey,
                     CAST((CAST(p_partkey % 127 + 1 AS HUGEINT)
                           * 11400714819323198485)
                          % 2305843009213693952 AS BIGINT) AS h
              FROM part WHERE p_partkey % 10 BETWEEN 3 AND 6),
            x AS (SELECT p_partkey,
                         xor(h, {FX.phash_class_value(VIEWPORT_QUERY_CLASS)}) AS xv
                  FROM v),
            d AS (SELECT p_partkey,
                         ({" + ".join(f"((xv // {1 << i}) % 2)" for i in range(61))}) AS hamming
                  FROM x)
            SELECT CAST(p_partkey AS BIGINT) AS image_id,
                   CAST(hamming AS BIGINT) AS hamming
            FROM d ORDER BY hamming, p_partkey LIMIT 25
        """,
        # same ranked search restricted to captions containing the token
        "viewport_caption_similar": f"""
            WITH v AS (
              SELECT p_partkey,
                     CAST((CAST(p_partkey % 127 + 1 AS HUGEINT)
                           * 11400714819323198485)
                          % 2305843009213693952 AS BIGINT) AS h
              FROM part WHERE p_partkey % 10 BETWEEN 3 AND 6
                AND ('cap-' || CAST(p_partkey % 89 AS VARCHAR))
                    LIKE '%cap-7%'),
            x AS (SELECT p_partkey,
                         xor(h, {FX.phash_class_value(VIEWPORT_QUERY_CLASS)}) AS xv
                  FROM v),
            d AS (SELECT p_partkey,
                         ({" + ".join(f"((xv // {1 << i}) % 2)" for i in range(61))}) AS hamming
                  FROM x)
            SELECT CAST(p_partkey AS BIGINT) AS image_id,
                   CAST(hamming AS BIGINT) AS hamming
            FROM d ORDER BY hamming, p_partkey LIMIT 25
        """,
        # co-located (k%10 site) AND visually duplicate (k%127 pixel
        # class) -> min of the joint class k%1270 survives; the planted
        # cross-class hamming floor (17) and ~157 m site spacing make
        # every other pair fail exactly one of the two conditions
        "geo_visual_dedup": """
            SELECT CAST(MIN(p_partkey) AS BIGINT) AS image_id
            FROM part GROUP BY p_partkey % 1270
        """,
        # drop admission: overlap classes (635 <= r < ... shared with the
        # corpus r < 635 range via 400 <= r < 635) all lose to the
        # corpus; survivors = min batch key per batch-only class
        "incremental_geo_visual": """
            SELECT CAST(MIN(p_partkey) AS BIGINT) AS image_id
            FROM part WHERE p_partkey % 1270 >= 635
            GROUP BY p_partkey % 1270
        """,
        # planted 4-member proximity chains: cc keeps exactly the
        # min-rank member (dataset A, id k*10) per chain; singles survive
        "union_cc": """
            SELECT CAST(c_custkey * 10 AS BIGINT) AS image_id
            FROM customer WHERE c_custkey % 50 = 0
            UNION ALL
            SELECT CAST(c_custkey * 10 + 9 AS BIGINT) AS image_id
            FROM customer WHERE c_custkey % 50 <> 0
        """,
        # planted square wave (period p=2+k%7, length L=1000+k%100,
        # amplitude a=1000+(k*37)%1000): every feature is closed-form —
        # peak=rms=a, zero crossings=(L-1)//p
        "audio_features": """
            SELECT CAST(s_suppkey AS BIGINT) AS audio_id,
                   CAST(1000 + s_suppkey % 100 AS BIGINT) AS n_samples,
                   CAST(16000 AS BIGINT) AS sample_rate,
                   CAST(1000 + (s_suppkey * 37) % 1000 AS BIGINT) AS peak,
                   CAST(1000 + (s_suppkey * 37) % 1000 AS BIGINT) AS rms,
                   CAST(((1000 + s_suppkey % 100) - 1)
                        // (2 + s_suppkey % 7) AS BIGINT) AS zero_crossings
            FROM supplier
        """,
        # augmented planted images: V's bits drive the pixel blocks, so
        # the re-decoded sums are integer polynomials in popcount(V)
        # (full 61-bit popcount for flips/rotation, the top-left-quadrant
        # 13 live bits for the crop); qimg sources decode to 202/42
        "augment_meta": f"""
            WITH v AS (
              SELECT p_partkey,
                     CAST((CAST(p_partkey % 127 + 1 AS HUGEINT)
                           * 11400714819323198485)
                          % 2305843009213693952 AS BIGINT) AS V,
                     1 + p_partkey % 3 AS s,
                     CASE WHEN p_partkey % 2 = 0 THEN 200 ELSE 202 END AS hi,
                     CASE WHEN p_partkey % 2 = 0 THEN 40 ELSE 42 END AS lo
              FROM part),
            p AS (
              SELECT *,
                     ({" + ".join(f"((V // {1 << i}) % 2)" for i in range(61))}) AS pop,
                     ({" + ".join(f"((V // {1 << e}) % 2)" for e in [60, 55, 54, 53, 52, 47, 46, 45, 44, 39, 38, 37, 36])}) AS qpop
              FROM v)
            SELECT CAST(p_partkey AS BIGINT) AS image_id, 'flip_h' AS op,
                   CAST(8 * s AS INT) AS w, CAST(8 * s AS INT) AS h,
                   CAST(3 * s * s * (hi * pop + lo * (64 - pop)) AS BIGINT) AS sum_px
            FROM p
            UNION ALL
            SELECT CAST(p_partkey AS BIGINT), 'rot90',
                   CAST(8 * s AS INT), CAST(8 * s AS INT),
                   CAST(3 * s * s * (hi * pop + lo * (64 - pop)) AS BIGINT)
            FROM p
            UNION ALL
            SELECT CAST(p_partkey AS BIGINT), 'crop_tl',
                   CAST(4 * s AS INT), CAST(4 * s AS INT),
                   CAST(3 * s * s * (hi * qpop + lo * (16 - qpop)) AS BIGINT)
            FROM p
        """,
        # planted pixel-block images (part_images): decoded dims are
        # 8s x 8s with s=1+k%3, and ahash64's pooled 8x8 grid reproduces
        # the 64 bits of V = ((k%127+1) * golden-ratio-odd) % 2^61
        # MSB-first -> the recomputed phash IS V (HUGEINT intermediate:
        # the product overflows int64 before the modulo)
        "decode_meta": """
            SELECT CAST(p_partkey AS BIGINT) AS image_id,
                   CAST(8 * (1 + p_partkey % 3) AS INT) AS w,
                   CAST(8 * (1 + p_partkey % 3) AS INT) AS h,
                   CASE WHEN p_partkey % 2 = 0 THEN 'png'
                        ELSE 'qimg' END AS fmt,
                   CAST((CAST(p_partkey % 127 + 1 AS HUGEINT)
                         * 11400714819323198485)
                        % 2305843009213693952 AS BIGINT) AS phash
            FROM part
        """,
        # document-boundary block packing: shard by id%8, window token
        # cumsum in doc_id order, pack = start div budget — the same ws
        # token expression the token_count oracle pins
        "pack_docs": r"""
            WITH t AS (
              SELECT doc_id,
                     len(list_filter(regexp_split_to_array(lower(text),
                         '\s+'), x -> x <> '')) AS n_tokens,
                     doc_id % 8 AS shard
              FROM documents),
            c AS (
              SELECT doc_id, n_tokens, shard,
                     SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       - n_tokens AS start
              FROM t)
            SELECT CAST(doc_id AS BIGINT) AS doc_id,
                   CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(shard AS BIGINT) AS shard,
                   CAST(start // 256 AS BIGINT) AS pack_id,
                   CAST(start % 256 AS BIGINT) AS pack_offset
            FROM c
        """,
        # stratified sample: row_number per source ordered by the seeded
        # Knuth scramble (bit-identical integer arithmetic), ties on id
        "sample_per_key": """
            SELECT doc_id, source FROM (
              SELECT doc_id, source,
                     ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY ((doc_id + 7) * 2654435761) % 4294967296,
                                doc_id) AS rk
              FROM documents) WHERE rk <= 20
        """,
        # weighted domain-mixture resampling: the telescoping integer
        # copy rule over the scramble permutation, replicas via
        # unnest(range(copies)) (empty range drops the row, exactly
        # like Spark's explode of an empty array)
        "mix_domains": """
            WITH r AS (
              SELECT doc_id, source,
                     CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 1
                                 WHEN 'src2' THEN 2 WHEN 'src3' THEN 5
                                 ELSE 1 END AS num,
                     CASE source WHEN 'src0' THEN 1 WHEN 'src1' THEN 3
                                 WHEN 'src2' THEN 3 WHEN 'src3' THEN 2
                                 ELSE 1 END AS den,
                     ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY ((doc_id + 7) * 2654435761) % 4294967296,
                                doc_id) AS rk
              FROM documents),
            c AS (
              SELECT doc_id, source,
                     (rk * num) // den - ((rk - 1) * num) // den AS copies
              FROM r)
            SELECT doc_id, source,
                   CAST(unnest(range(copies)) AS BIGINT) AS copy
            FROM c
        """,
        # leakage-aware geo holdout: the depth-20 cell (pow-2 divisions
        # = exact exponent shifts, floors engine-identical on the same
        # doubles) packed ix*2^32+iy, scrambled mod-prime then bucketed
        # in ppm; unit is always >= 0 so % == pmod here
        "geo_split_assign": f"""
            SELECT o_orderkey,
                   CASE WHEN bkt < 800000 THEN 'train'
                        WHEN bkt < 900000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT o_orderkey,
                         ((CAST(FLOOR(({_LON} + 180.0)
                                      / (360.0 / 1048576.0)) AS BIGINT)
                             * 4294967296
                           + CAST(FLOOR(({_LAT} + 90.0)
                                        / (180.0 / 1048576.0)) AS BIGINT))
                          % 999983 + 7) * 2654435761 % 1000000 AS bkt
                  FROM orders)
        """,
        # domain-holdout split: the scramble bucket of the integer
        # domain suffix, bucketed in ppm
        "domain_split_assign": """
            SELECT doc_id, source,
                   CASE WHEN bkt < 800000 THEN 'train'
                        WHEN bkt < 900000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id, source,
                         ((CAST(SUBSTR(source, 4) AS BIGINT) % 999983 + 7)
                          * 2654435761) % 1000000 AS bkt
                  FROM documents)
        """,
        # the planted leak set in closed form: dup pairs are custkey<300
        # (0.22 m apart, equal payload); side B's parity label differs
        # from side A's 'train' exactly on odd custkeys
        "split_leak_pairs": """
            SELECT 'A-' || c_custkey AS pk_a, 'B-' || c_custkey AS pk_b,
                   'train' AS split_a, 'test' AS split_b
            FROM customer
            WHERE c_custkey < 300 AND c_custkey % 2 = 1
        """,
        # bigram build mirrored as a list comprehension over the same
        # whitespace split; deterministic (count desc, ngram asc) top-k
        "ngram_top": f"""
            WITH w AS (
              SELECT list_filter(regexp_split_to_array(lower(text),
                     '\\s+'), x -> x <> '') AS ws
              FROM documents),
            g AS (
              SELECT unnest([ws[i] || ' ' || ws[i + 1]
                             for i in range(1, len(ws))]) AS ngram
              FROM w WHERE len(ws) >= 2)
            SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n FROM g
            GROUP BY ngram ORDER BY n DESC, ngram ASC LIMIT 50
        """,
        # int8 symmetric quantization: q_i = floor(x/s*127 + 0.5) with
        # s = max|x| — identical IEEE double ops in both engines; the
        # oracle pins integer summaries of the codes
        "quantize_vecs": """
            WITH s AS (
              SELECT vec_id, embedding,
                     list_max(list_transform(embedding,
                       x -> abs(CAST(x AS DOUBLE)))) AS sc
              FROM embeddings),
            q AS (
              SELECT vec_id,
                     CASE WHEN sc = 0
                       THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
                       ELSE list_transform(embedding,
                         x -> CAST(floor(CAST(x AS DOUBLE) / sc * 127.0
                                         + 0.5) AS BIGINT)) END AS qv
              FROM s)
            SELECT vec_id,
                   CAST(list_sum(qv) AS BIGINT) AS q_sum,
                   CAST(list_min(qv) AS BIGINT) AS q_min,
                   CAST(list_max(qv) AS BIGINT) AS q_max,
                   CAST(list_sum(list_transform(qv, x -> abs(x)))
                        AS BIGINT) AS q_l1
            FROM q
        """,
        # per-domain top-half quality cut: integer rank rule over the
        # pinned quality_score replica (ties on doc_id)
        "quality_filter": f"""
            WITH q AS ({_quality_sql(", source")}),
            r AS (SELECT doc_id, source,
                    ROW_NUMBER() OVER (PARTITION BY source
                      ORDER BY quality_score DESC, doc_id) AS rk,
                    COUNT(*) OVER (PARTITION BY source) AS n
                  FROM q)
            SELECT doc_id, source FROM r WHERE rk * 2 <= n
        """,
        # eval-set decontamination: distinct word trigrams per doc
        # (same whitespace split the token oracle pins), eval = the
        # doc_id % 41 residue, hits counted over the join
        "decontam_hits": _DECONTAM_GRAMS + f"""
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
            FROM g JOIN ev USING (gram)
            WHERE NOT {_EV_PRED_SQL}
            GROUP BY doc_id
        """,
        # survivors = training docs with zero eval-trigram overlap
        "decontam_survivors": _DECONTAM_GRAMS + f"""
            SELECT d.doc_id, d.source FROM documents d
            WHERE NOT {_EV_PRED_SQL.replace('doc_id', 'd.doc_id')}
              AND NOT EXISTS (
                SELECT 1 FROM g JOIN ev USING (gram)
                WHERE g.doc_id = d.doc_id)
        """,
        # boilerplate line removal over the lined corpus: rule-exact
        # replica — line doc-frequency > 30 kills the line, survivors
        # reassemble ORDER BY position, counts via FILTER
        "line_dedup": _line_dedup_sql(),
        # zonal image-metadata stats: the zone_pip closed form plus the
        # planted integer size laws w = 8*(1+k%3), h = 8*(1+k%5);
        # COUNT grafts 0 for empty zones, SUM/MAX stay NULL (O2d) —
        # every zone is non-empty at all three SFs so no NULL reaches
        # the hash compare
        "zonal_image_stats": """
            SELECT z.zone_id, COALESCE(c.n, 0) AS n, c.sum_w, c.max_h
            FROM (SELECT CAST(range AS BIGINT) AS zone_id FROM range(16)) z
            LEFT JOIN (
              SELECT ((o_orderkey * 40503 + 12345) % 100000) // 25000 * 4
                   + ((o_orderkey * 2654435761) % 100000) // 25000 AS zone_id,
                     COUNT(*) AS n,
                     CAST(SUM(8 * (1 + o_orderkey % 3)) AS BIGINT) AS sum_w,
                     CAST(MAX(8 * (1 + o_orderkey % 5)) AS BIGINT) AS max_h
              FROM orders GROUP BY 1) c USING (zone_id)
        """,
        # composed curation flagship: quality-cut ranks computed over
        # the TRAINING residue, then the decontamination NOT EXISTS —
        # nested replicas of the two stage oracles
        "curate_corpus": f"""
            WITH q AS ({_quality_sql(", source")}),
            r AS (SELECT doc_id, source,
                    ROW_NUMBER() OVER (PARTITION BY source
                      ORDER BY quality_score DESC, doc_id) AS rk,
                    COUNT(*) OVER (PARTITION BY source) AS n
                  FROM q WHERE NOT {_EV_PRED_SQL}),
            k AS (SELECT doc_id, source FROM r WHERE rk * 2 <= n),
            w AS (SELECT doc_id,
                         list_filter(regexp_split_to_array(lower(text),
                                     '\\s+'), x -> x <> '') AS ws
                  FROM documents),
            g AS (SELECT doc_id,
                         unnest(list_distinct(
                           [ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
                            for i in range(1, len(ws) - 1)])) AS gram
                  FROM w WHERE len(ws) >= 3),
            ev AS (SELECT DISTINCT gram FROM g WHERE {_EV_PRED_SQL})
            SELECT k.doc_id, k.source FROM k
            WHERE NOT EXISTS (
              SELECT 1 FROM g JOIN ev USING (gram)
              WHERE g.doc_id = k.doc_id)
        """,
        # deterministic global shuffle: dense rank under the scramble
        # permutation (ties on id) — the two-phase bucket rank must
        # equal the flat ROW_NUMBER by construction
        "corpus_shuffle": """
            SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (
                     ORDER BY ((doc_id + 7) * 2654435761) % 4294967296,
                              doc_id) - 1 AS BIGINT) AS shuffle_pos
            FROM documents
        """,
        # PII redaction: replicate the planted corpus (email on %4,
        # phone on %6), then the same regex chain — emails first —
        # with RE2-compatible patterns and 'g' replacement
        "pii_redact": f"""
            WITH p AS (
              SELECT doc_id,
                     text
                     || CASE WHEN doc_id % 4 = 0
                          THEN ' contact user' || doc_id || '@example.com now'
                          ELSE '' END
                     || CASE WHEN doc_id % 6 = 0
                          THEN ' call 206-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
                          ELSE '' END AS text
              FROM documents),
            e AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '{_EMAIL_RE_SQL}'))
                       AS n_emails,
                     regexp_replace(text, '{_EMAIL_RE_SQL}', '<EMAIL>', 'g')
                       AS text
              FROM p)
            SELECT doc_id,
                   regexp_replace(text, '{_PHONE_RE_SQL}', '<PHONE>', 'g')
                     AS text,
                   CAST(n_emails AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(text, '{_PHONE_RE_SQL}'))
                        AS BIGINT) AS n_phones
            FROM e
        """,
        # perceptual-hash near-dedup over the REAL decode path: keys
        # sharing k%127 carry identical planted pixels -> identical
        # recomputed ahash (hamming 0); cross-class hashes are >= 17
        # bits apart and every class owns a dedicated 16-bit bucket per
        # band (verified offline, fixtures_tpch.phash_class_value), so
        # the survivor set is exactly the min part key per residue class
        "image_phash_dedup": """
            SELECT CAST(MIN(p_partkey) AS BIGINT) AS image_id
            FROM part GROUP BY p_partkey % 127
        """,
        # incremental ingest dedup: batch = classes k%127 >= 60; the
        # 20 overlapping classes (60..79) lose to the committed corpus
        # (classes < 80), so survivors are exactly the min batch key of
        # each batch-only class (>= 80)
        "incremental_phash_dedup": """
            SELECT CAST(MIN(p_partkey) AS BIGINT) AS image_id
            FROM part WHERE p_partkey % 127 >= 80
            GROUP BY p_partkey % 127
        """,
        # same scenario through the bucketed signature store: survivor
        # semantics are identical by construction (parity-tested)
        "store_phash_dedup": """
            SELECT CAST(MIN(p_partkey) AS BIGINT) AS image_id
            FROM part WHERE p_partkey % 127 >= 80
            GROUP BY p_partkey % 127
        """,
        # geospatial incremental ingest: scenario table per custkey % 4
        # (see fixtures_tpch.planted_union_batch) — survivors are the
        # payload-mismatch record, the within-batch min winner, and the
        # out-of-proximity record
        "incremental_union": """
            SELECT CAST(c_custkey * 10 + 1 AS BIGINT) AS image_id
            FROM customer WHERE c_custkey % 4 IN (1, 2)
            UNION ALL
            SELECT CAST(c_custkey * 10 + 3 AS BIGINT) AS image_id
            FROM customer WHERE c_custkey % 4 = 3
        """,
        # text-tier incremental dedup vs the stored signature relation:
        # exact copies agree on all 64 MinHash components and lose;
        # near-misses (J ~ 0.33) never reach 0.8 agreement; their
        # in-batch exact copies lose to the smaller id
        "incremental_minhash_dedup": """
            SELECT CAST(doc_id + 2000000 AS BIGINT) AS doc_id
            FROM documents WHERE doc_id % 7 = 3
        """,
        # vector-side incremental dedup: copies of corpus vectors lose
        # to the corpus, negated vectors are far from everything
        # (|cos| bounded ~0.6 organically), their batch-internal copies
        # lose to the smaller id -> survivors = the negated rows
        "incremental_embedding_dedup": """
            SELECT CAST(vec_id + 2000000 AS BIGINT) AS vec_id
            FROM embeddings WHERE vec_id % 7 = 3
        """,
        # same scenario through the bucketed vector store: survivor
        # semantics identical by construction (parity-tested)
        "store_embedding_dedup": """
            SELECT CAST(vec_id + 2000000 AS BIGINT) AS vec_id
            FROM embeddings WHERE vec_id % 7 = 3
        """,
        # cross-modal survivor rule: a key survives iff it is the min of
        # BOTH its pixel class (k%127, recomputed-phash relation) and
        # its caption class (k%89, exact-fingerprint relation) — the
        # two modalities disagree on purpose (127 vs 89 moduli)
        "cross_modal_dedup": """
            SELECT CAST(p_partkey AS BIGINT) AS image_id FROM (
              SELECT p_partkey,
                     MIN(p_partkey) OVER (PARTITION BY p_partkey % 127) AS mp,
                     MIN(p_partkey) OVER (PARTITION BY p_partkey % 89) AS mc
              FROM part)
            WHERE p_partkey = mp AND p_partkey = mc
        """,
        # F = 3 + k%5 frames; sampled every 2nd -> idx 0,2,...; frame f
        # is 4x4x3 of constant (k+f)%256 -> pixel sum 48*((k+f)%256)
        "video_frames": """
            SELECT CAST(s_suppkey AS BIGINT) AS video_id,
                   CAST(2 * f.range AS BIGINT) AS frame_idx,
                   CAST(4 AS BIGINT) AS frame_w,
                   CAST(4 AS BIGINT) AS frame_h,
                   CAST(48 * ((s_suppkey + 2 * f.range) % 256) AS BIGINT)
                     AS frame_sum
            FROM supplier, range(4) f
            WHERE 2 * f.range < 3 + s_suppkey % 5
        """,
        # streaming first-seen-wins dedup over two planted drops. The
        # admitted set is the TRUE first-seen closed form, robust to
        # organic duplicate texts in the corpus (sf0.1 has 8): batch 1
        # admits the min doc_id per normalized text; batch 2's +1e6
        # exact copies always hit seen state; its +3e6 suffixed docs
        # admit one min-id winner per new text group.
        "streaming_dedup": f"""
            WITH w1 AS (
              SELECT MIN(doc_id) AS doc_id, md5({_NORM_TEXT}) AS h
              FROM documents GROUP BY 2),
            w2 AS (
              SELECT MIN(doc_id + 3000000) AS doc_id,
                     md5(regexp_replace(trim(lower(text || ' v2')),
                                        '\\s+', ' ', 'g')) AS h
              FROM documents WHERE doc_id % 11 = 0 GROUP BY 2)
            SELECT doc_id FROM w1
            UNION ALL
            SELECT w2.doc_id FROM w2
            WHERE w2.h NOT IN (SELECT h FROM w1)
        """,
        # exact replica of pipeline/text.py with_winnow_fingerprint
        # (k=8, window=4): md5-gram hash -> sliding-window min -> xor of
        # the distinct minima.
        "winnow_fingerprint": r"""
            WITH prep AS (
              SELECT doc_id,
                     regexp_replace(lower(text), '[^\x20-\x7e]', '', 'g') AS t
              FROM documents),
            g AS (
              SELECT doc_id, t, length(t) - 7 AS n_grams,
                     list_transform(range(1, GREATEST(length(t) - 7, 1) + 1),
                       j -> CAST(('0x' || substr(md5(substr(t, j::INT, 8)), 1, 14))
                                 AS BIGINT)) AS grams
              FROM prep),
            m AS (
              SELECT doc_id, t, n_grams,
                     list_transform(range(1, GREATEST(n_grams - 3, 1) + 1),
                       i -> list_min(grams[i : i + 3])) AS mins
              FROM g)
            SELECT doc_id,
                   CASE WHEN length(t) >= 8
                        THEN list_reduce(
                               list_prepend(CAST(0 AS BIGINT), list_distinct(mins)),
                               (a, b) -> xor(a, b))
                        ELSE CAST(('0x' || substr(md5(t), 1, 14)) AS BIGINT)
                   END AS winnow_fp
            FROM m
        """,
    }


# PII patterns as DuckDB string literals (same strings cleanse.py
# compiles into Spark; both engines treat them identically — the
# patterns are the Java-regex/RE2 common subset)
def _sql_regex(p: str) -> str:
    # DuckDB string literals are standard SQL: backslashes pass through
    # untouched; only quotes need doubling
    return p.replace("'", "''")


from tdei_backend_service_spark.pipeline import cleanse as _CL  # noqa: E402

_EMAIL_RE_SQL = _sql_regex(_CL.EMAIL_RE)
_PHONE_RE_SQL = _sql_regex(_CL.PHONE_RE)


# shared decontamination CTE chain: per-doc DISTINCT word trigrams over
# the pinned whitespace split; eval set = the fixed 13-doc benchmark
_DECONTAM_GRAMS = rf"""
    WITH w AS (
      SELECT doc_id, source,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents),
    g AS (
      SELECT doc_id,
             unnest(list_distinct([ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
                                   for i in range(1, len(ws) - 1)])) AS gram
      FROM w WHERE len(ws) >= 3),
    ev AS (SELECT DISTINCT gram FROM g WHERE {_EV_PRED_SQL})
"""


def _line_dedup_sql() -> str:
    """Exact replica of fixtures_tpch.lined_documents (8-word chunking
    + planted boilerplate) feeding pipeline/cleanse.dedup_lines (line
    doc-frequency > 30 -> killed; survivors reassembled in order)."""
    lw = FX.LINE_WORDS
    return rf"""
    WITH base AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'),
                         x -> x <> '') AS ws
      FROM documents),
    ld AS (
      SELECT doc_id,
             list_concat(list_concat(
               list_transform(range(0, (len(ws) + {lw - 1}) // {lw}),
                 j -> array_to_string(ws[j * {lw} + 1 : j * {lw} + {lw}], ' ')),
               CASE WHEN doc_id % 3 = 0 THEN ['{FX.BOILER_A}']
                    ELSE CAST([] AS VARCHAR[]) END),
               CASE WHEN doc_id % 5 = 0 THEN ['{FX.BOILER_B}']
                    ELSE CAST([] AS VARCHAR[]) END) AS ls
      FROM base),
    l AS (
      SELECT doc_id,
             unnest([{{'pos': i, 'line': ls[i]}}
                     for i in range(1, len(ls) + 1)]) AS pl
      FROM ld),
    ll AS (SELECT doc_id, pl.pos AS pos, pl.line AS line,
                  md5(pl.line) AS h
           FROM l),
    f AS (SELECT h FROM ll GROUP BY h HAVING COUNT(DISTINCT doc_id) > 30),
    m AS (SELECT doc_id, pos, line, h IN (SELECT h FROM f) AS bad FROM ll)
    SELECT doc_id,
           COALESCE(array_to_string(list(line ORDER BY pos)
                      FILTER (WHERE NOT bad), chr(10)), '') AS text,
           CAST(COUNT(*) FILTER (WHERE NOT bad) AS BIGINT) AS n_lines_kept,
           CAST(COUNT(*) FILTER (WHERE bad) AS BIGINT) AS n_lines_removed
    FROM m GROUP BY doc_id
    """


_TOPK_SQL = """
    WITH q AS (SELECT vec_id AS q_id, embedding AS qe
               FROM embeddings WHERE vec_id < 3),
    s AS (SELECT q.q_id, e.vec_id,
            list_sum(list_transform(list_zip(e.embedding, q.qe),
              x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
            / (sqrt(list_sum(list_transform(e.embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             * sqrt(list_sum(list_transform(q.qe,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS cos
          FROM embeddings e, q)
    SELECT q_id, vec_id, rank FROM (
      SELECT q_id, vec_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos DESC, vec_id) AS rank
      FROM s) WHERE rank <= 5
"""


def _quality_sql(extra: str = "") -> str:
    """Exact SQL replica of with_quality; ``extra`` threads additional
    passthrough columns (e.g. ', source') through both SELECTs."""
    sw = ", ".join(f"'{w}'" for w in TX.STOPWORDS["en"])
    return rf"""
        SELECT doc_id{extra}, n_chars_m, stopword_hits,
               ROUND(LEAST(n_chars_m / 200.0, 1.0) * 0.3
                   + GREATEST(0.0, 1.0 - punct_ratio * 4) * 0.25
                   + GREATEST(0.0, 1.0 - digit_ratio * 4) * 0.25
                   + LEAST(CAST(stopword_hits AS DOUBLE) / 3.0, 1.0) * 0.2,
                 6) AS quality_score
        FROM (
          SELECT doc_id{extra}, length(text) AS n_chars_m,
            (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
              / CAST(GREATEST(length(text), 1) AS DOUBLE) AS punct_ratio,
            (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
              / CAST(GREATEST(length(text), 1) AS DOUBLE) AS digit_ratio,
            len(list_intersect({_WORDS}, [{sw}])) AS stopword_hits
          FROM documents)
    """
