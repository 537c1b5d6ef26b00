"""O3 dataset_tag_road — nearest-edge attribute transfer (kNN tagging).

Reference: ``content.dataset_tag_road(target_dataset_id,
source_dataset_id)`` — an in-place UPDATE tagging every target feature
with road information from the source dataset's edges, then a full
re-extract (/root/reference/src/service/services/dataset-road-tag-service.ts:28-40;
params /root/reference/src/services.json:17-31). The PL/pgSQL body lives
in the DB; semantics reconstructed: per target feature, find the nearest
source edge within a cutoff and graft its road attributes.

Spark plan — batched ring expansion, no per-row Python loops
(SURVEY.md §7 hard part #3):

  round k: remaining targets explode their disk(k) cell cover ->
  equi-join against the (cached) edge cell cover -> vectorized
  point-to-edge distance -> per-target argmin via
  ``min(struct(dist, edge_id))`` (deterministic tie-break: lowest
  edge_id, FIXTURES.md T4) -> accept targets whose nearest candidate is
  provably global: dist <= the target's guaranteed radius (exact
  per-point distance to the searched square's boundary — beyond it
  nothing closer can exist) -> anti-join the rest into round k*2.

Each round is pure DataFrame ops; the loop runs on the driver a bounded
number of times (doubling k until the cutoff is covered). Targets with
no edge within ``cutoff_m`` stay untagged (FIXTURES.md T4). The result
is a NEW DataFrame — the reference's in-place UPDATE becomes a new
snapshot write (SURVEY.md §3.3).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..core import cells, geom
from ..core.ingest import cover_geometry


def _disk_cells_udf(depth: int, k: int):
    offsets = cells.disk_offsets(k)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _disk(lon: pd.Series, lat: pd.Series) -> pd.Series:
        c = cells.encode(lon.to_numpy(np.float64), lat.to_numpy(np.float64), depth)
        nb = cells.neighbors(c, offsets)
        return pd.Series([[int(v) for v in row[row >= 0]] for row in nb])

    # nondeterministic marker = evaluate once (join-key filters would
    # otherwise duplicate the ArrowEvalPython node; VERDICT r1 #2)
    return _disk.asNondeterministic()


def _guaranteed_radius_udf(depth: int, k: int, lat0: float = 0.0):
    """Exact distance (m) from each point to the boundary of its searched
    disk(k) square — any edge outside the square is farther than this.
    Under the opt-in cos(lat) local metric the lon axis is worth fewer
    meters, so gx scales by cos(lat0): still the exact boundary distance
    in that metric."""
    size = cells.cell_size_deg(depth)
    coslat = max(math.cos(math.radians(lat0)), 1e-6)

    @F.pandas_udf(T.DoubleType())
    def _gr(lon: pd.Series, lat: pd.Series) -> pd.Series:
        lo = lon.to_numpy(np.float64)
        la = lat.to_numpy(np.float64)
        x, y = cells.lonlat_to_xy(lo, la, depth)
        west = (lo + 180.0) - (x - k) * size
        east = (x + k + 1) * size - (lo + 180.0)
        south = (la + 90.0) - (y - k) * (size / 2)
        north = (y + k + 1) * (size / 2) - (la + 90.0)
        gx = np.minimum(west, east) * cells.M_PER_DEG_LON_EQ * coslat
        gy = np.minimum(south, north) * cells.M_PER_DEG_LAT
        return pd.Series(np.minimum(gx, gy))

    return _gr.asNondeterministic()


def _dist_udf(lookup=None, lat0: float = 0.0):
    """Point-to-edge distance. With ``lookup`` (a broadcast {edge_id: wkb}
    dict) the third column is the edge id: candidate rows never carry WKB
    bytes, and the dict is parsed once per worker (core/join.py
    parsed_lookup), not per candidate row."""
    from ..core.join import parsed_lookup
    cache: dict = {}

    @F.pandas_udf(T.DoubleType())
    def _dist(lon: pd.Series, lat: pd.Series, geo: pd.Series) -> pd.Series:
        if lookup is not None:
            index, g = parsed_lookup(cache, lookup.value)
            idx = np.fromiter((index[k] for k in geo), dtype=np.int64,
                              count=len(geo))
        else:
            g = geom.parse_wkb_batch(geo)
            idx = np.arange(len(g), dtype=np.int64)
        return pd.Series(geom.point_polyline_dist(
            lon.to_numpy(np.float64), lat.to_numpy(np.float64), idx, g,
            lat0))
    # evaluate once: the dist column feeds both a filter and the argmin
    # struct — without this marker Catalyst inlines the UDF into each
    # (two ArrowEvalPython nodes = distance computed twice per candidate)
    return _dist.asNondeterministic()


def _tag_map_only(targets: DataFrame, edges: DataFrame, attr_cols: list[str],
                  cutoff_m: float, depth: int, pk: str,
                  lat0: float = 0.0) -> DataFrame | None:
    """Zero-shuffle kNN tagging for a broadcastable edge side.

    The DataFrame path costs two 16M-row exchanges at scale (the
    per-target argmin groupBy and the tag-back join) — measured as the
    worst-scaling stage in BENCH/BASELINE.md (eff 0.27, memory-bus
    bound). When the edge side fits a broadcast (the common case: road
    networks are tiny next to image corpora), the whole operator is a
    map: a driver-built {cell -> edge indices} index + parsed geometries
    broadcast once, and each Arrow batch of target rows computes its own
    candidates, exact distances, and argmin locally, emitting the tag
    columns inline. Results are bit-identical to the join path (same
    encode, same distance kernel, same (dist, edge_id) tie-break).
    """
    from ..core import join as _J
    rows = edges.select("edge_id", "geometry", *attr_cols).collect()
    wkbs = [bytes(r[1]) for r in rows]
    g = geom.parse_wkb_batch(wkbs)
    box = geom.geom_bbox(g)
    edge_ids = np.array([r[0] for r in rows], dtype=np.int64)
    attr_vals = {c: np.array([r[c] for r in rows], dtype=object)
                 for c in attr_cols}
    pad_deg = max(cells.meters_to_deg_lat(cutoff_m),
                  cells.meters_to_deg_lon(cutoff_m, lat0))
    # vectorized build; None when the padded cover exceeds the entry cap
    # — the caller then runs the distributed candidate-join path
    cell_index = _J.build_cover_index(g, box, depth, pad_deg,
                                      _J.COVER_INDEX_MAX_ENTRIES)
    if cell_index is None:
        return None

    bc = targets.sparkSession.sparkContext.broadcast({
        "index": cell_index,
        "coords": g.coords, "offsets": g.offsets, "kinds": g.kinds,
        "box": box, "edge_ids": edge_ids, "attr_vals": attr_vals,
    })
    # same over-padded envelope prefilter as core/join.envelope_prefilter
    coslat = max(math.cos(math.radians(lat0)), 1e-6)
    pad_lon = cutoff_m / (cells.M_PER_DEG_LON_EQ * coslat) * (1 + 1e-6) + 1e-9
    pad_lat = cutoff_m / cells.M_PER_DEG_LAT * (1 + 1e-6) + 1e-9

    schema = T.StructType(list(targets.schema.fields) + [
        T.StructField("nearest_dist_m", T.DoubleType()),
        T.StructField("nearest_edge_id", T.LongType()),
        *[T.StructField(c, T.StringType()) for c in attr_cols]])
    lon_name, lat_name = "lon", "lat"

    def _tag_batches(batches):
        v = bc.value
        gg = geom.RaggedGeoms(v["coords"], v["offsets"], v["kinds"])
        ix, bx, eids = v["index"], v["box"], v["edge_ids"]
        avs = v["attr_vals"]
        for pdf in batches:
            n = len(pdf)
            dist_out = np.full(n, np.nan)
            eid_out = np.full(n, -1, dtype=np.int64)
            attr_out = {c: np.full(n, None, dtype=object) for c in attr_cols}
            if n:
                px = pdf[lon_name].to_numpy(np.float64)
                py = pdf[lat_name].to_numpy(np.float64)
                cell = cells.encode(px, py, depth)
                pair_pt, cand = ix.probe(cell)
                if pair_pt.size:
                    keep = ((px[pair_pt] >= bx[cand, 0] - pad_lon)
                            & (px[pair_pt] <= bx[cand, 2] + pad_lon)
                            & (py[pair_pt] >= bx[cand, 1] - pad_lat)
                            & (py[pair_pt] <= bx[cand, 3] + pad_lat))
                    pair_pt, cand = pair_pt[keep], cand[keep]
                    if pair_pt.size:
                        d = geom.point_polyline_dist(px[pair_pt], py[pair_pt],
                                                     cand, gg, lat0)
                        ok = d <= cutoff_m
                        pair_pt, cand, d = pair_pt[ok], cand[ok], d[ok]
                    if pair_pt.size:
                        # argmin per point, (dist, edge_id) tie-break —
                        # identical to min(struct(dist, edge_id, ...))
                        order = np.lexsort((eids[cand], d, pair_pt))
                        pp, cc, dd = pair_pt[order], cand[order], d[order]
                        first = np.concatenate([[True], pp[1:] != pp[:-1]])
                        sel, win = pp[first], cc[first]
                        dist_out[sel] = dd[first]
                        eid_out[sel] = eids[win]
                        for c in attr_cols:
                            attr_out[c][sel] = avs[c][win]
            res = pdf.copy()
            tagged = eid_out >= 0
            res["nearest_dist_m"] = [float(x) if t else None
                                     for x, t in zip(dist_out, tagged)]
            res["nearest_edge_id"] = [int(x) if t else None
                                      for x, t in zip(eid_out, tagged)]
            for c in attr_cols:
                res[c] = attr_out[c]
            yield res

    return targets.mapInPandas(_tag_batches, schema)


def knn_join(target_df: DataFrame, target_dataset_id: str,
             source_df: DataFrame, source_dataset_id: str,
             k: int = 3, attrs: list[str] | None = None,
             cutoff_m: float = 50.0, depth: int | None = None,
             pk: str = "image_id",
             metric_lat: float | None = None) -> DataFrame:
    """k-nearest-edges join: one row per (target, rank) for the ``k``
    nearest source edges within ``cutoff_m`` — the k>1 generalization
    of dataset_tag_road's nearest-edge transfer (reference semantics:
    dataset-road-tag-service.ts tags ONE nearest edge; ranked-k is the
    training-pipeline extension for redundant attribute transfer and
    candidate generation).

    Output: (pk, knn_rank 1..k, edge_id, dist_m, _attr_* columns).
    Targets with no edge within the cutoff emit no rows. Determinism:
    rank orders by (exact distance, edge_id) — a total order.

    Plan: pad the EDGE covers by ``cutoff_m`` (the small side takes the
    explode; candidate completeness within the cutoff is guaranteed by
    the padded cover), points encode to ONE cell each, a single
    equi-join + JVM envelope prefilter + exact vectorized distance,
    then one row_number window on pk. Exactly the one-candidate-join
    shape of dataset_tag_road's common case — the big table is never
    exploded, and there is no per-k iteration: top-k falls out of the
    same candidate set that argmin uses, because the padded cover is
    complete for EVERY edge within the cutoff, not just the nearest.

    ``metric_lat`` opts into the cos(lat) local metric (same contract
    as ``two_phase_join``): distances refine with lon meters scaled by
    cos(metric_lat); cover pads / envelope pads / cell depth widen by
    1/cos so candidate completeness is preserved. Default keeps the
    pinned equator convention."""
    from pyspark.sql.window import Window
    attrs = attrs if attrs is not None else []
    lat0 = float(metric_lat) if metric_lat is not None else 0.0
    coslat = max(math.cos(math.radians(lat0)), 1e-6)
    if depth is None:
        depth = int(np.clip(cells.depth_for_radius_m(max(cutoff_m, 1.0),
                                                     lat0),
                            cells.RES_GRID[7], cells.RES_GRID[10]))

    targets = target_df.filter(F.col("dataset_id") == target_dataset_id)
    edges = source_df.filter(F.col("dataset_id") == source_dataset_id)
    attr_cols = []
    for a in attrs:
        name = f"_attr_{a}"
        col = F.col(a) if a in edges.columns else F.col("props").getItem(a)
        edges = edges.withColumn(name, col.cast("string"))
        attr_cols.append(name)

    from ..core.join import _maybe_broadcast_geoms
    from ..core.join import GeomSide as _GS
    lookup = _maybe_broadcast_geoms(_GS(df=edges, pk="edge_id", kind="line",
                                        geom_col="geometry"))
    geo_col = "edge_id" if lookup is not None else "geometry"
    env_cols = ["gmin_lon", "gmin_lat", "gmax_lon", "gmax_lat"]
    # cover pads convert meters->degrees at the equator internally; the
    # local metric needs 1/cos more lon degrees (safe lat over-pad)
    padded_edges = (cover_geometry(edges, depth, cutoff_m / coslat,
                                   out_col="_cov", with_envelope=True)
                    .withColumn("cell", F.explode("_cov"))
                    .select("cell", "edge_id", *env_cols,
                            *([] if lookup is not None else ["geometry"]),
                            *attr_cols))
    pad_lon = cutoff_m / (cells.M_PER_DEG_LON_EQ * coslat) * (1 + 1e-6) + 1e-9
    pad_lat = cutoff_m / cells.M_PER_DEG_LAT * (1 + 1e-6) + 1e-9

    @F.pandas_udf(T.LongType())
    def _enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(cells.encode(lon.to_numpy(np.float64),
                                      lat.to_numpy(np.float64), depth))

    dist = _dist_udf(lookup, lat0)
    cand = (targets.select(pk, "lon", "lat")
            .withColumn("cell", _enc.asNondeterministic()(
                F.col("lon"), F.col("lat")))
            .join(padded_edges, "cell").drop("cell")
            .filter((F.col("lon") >= F.col("gmin_lon") - pad_lon)
                    & (F.col("lon") <= F.col("gmax_lon") + pad_lon)
                    & (F.col("lat") >= F.col("gmin_lat") - pad_lat)
                    & (F.col("lat") <= F.col("gmax_lat") + pad_lat))
            .drop(*env_cols)
            .withColumn("dist_m", dist(F.col("lon"), F.col("lat"),
                                       F.col(geo_col)))
            .filter(F.col("dist_m") <= cutoff_m))
    w = Window.partitionBy(pk).orderBy(F.asc("dist_m"), F.asc("edge_id"))
    return (cand.withColumn("knn_rank",
                            F.row_number().over(w).cast("long"))
            .filter(F.col("knn_rank") <= k)
            .select(pk, "knn_rank", "edge_id", "dist_m", *attr_cols))


def dataset_tag_road(target_df: DataFrame, target_dataset_id: str,
                     source_df: DataFrame, source_dataset_id: str,
                     attrs: list[str] | None = None,
                     cutoff_m: float = 50.0,
                     depth: int | None = None,
                     pk: str = "image_id",
                     metric_lat: float | None = None) -> DataFrame:
    """Tag every target point feature with its nearest source edge.

    Returns the full target dataset with ``props`` extended by
    ``tag:<attr>`` keys plus ``nearest_edge_id`` / ``nearest_dist_m``
    columns (null when nothing lies within ``cutoff_m``).

    ``metric_lat`` opts into the cos(lat) local metric on all three
    plans (map-only probe, one-candidate-join, ring expansion); pads,
    depth and guaranteed radii widen/shrink consistently so the
    nearest-edge answer is exact in that metric. Default keeps the
    pinned equator convention every oracle row uses.
    """
    attrs = attrs if attrs is not None else ["highway"]
    lat0 = float(metric_lat) if metric_lat is not None else 0.0
    coslat = max(math.cos(math.radians(lat0)), 1e-6)
    if depth is None:
        # cell edge ~= cutoff: disk(1) usually resolves round one
        depth = int(np.clip(cells.depth_for_radius_m(max(cutoff_m, 1.0),
                                                     lat0),
                            cells.RES_GRID[7], cells.RES_GRID[10]))
    # tighter cell axis in LOCAL meters (lat at the equator; the lon
    # axis shrinks by cos and takes over past ~60 deg)
    cell_m = min(cells.cell_lat_m(depth),
                 cells.cell_size_deg(depth) * cells.M_PER_DEG_LON_EQ
                 * coslat)

    targets = target_df.filter(F.col("dataset_id") == target_dataset_id)
    edges = source_df.filter(F.col("dataset_id") == source_dataset_id)

    # per-attr value columns resolved on the source before the join
    attr_cols = []
    for a in attrs:
        name = f"_attr_{a}"
        col = F.col(a) if a in edges.columns else F.col("props").getItem(a)
        edges = edges.withColumn(name, col.cast("string"))
        attr_cols.append(name)

    from ..core.join import _maybe_broadcast_geoms
    from ..core.join import GeomSide as _GS
    lookup = _maybe_broadcast_geoms(_GS(df=edges, pk="edge_id", kind="line",
                                        geom_col="geometry"))
    geo_col = "edge_id" if lookup is not None else "geometry"
    edge_cells = (cover_geometry(edges, depth, 0.0, out_col="_cov")
                  .withColumn("cell", F.explode("_cov"))
                  .select("cell", "edge_id",
                          *([] if lookup is not None else ["geometry"]),
                          *attr_cols))

    def _search(pts: DataFrame, k: int, dist_cap) -> DataFrame:
        """disk(k) candidate join -> exact distance -> per-target argmin
        (deterministic tie-break: lowest edge_id rides in the min struct)."""
        disk = _disk_cells_udf(depth, k)
        dist = _dist_udf(lookup, lat0)
        cand = (pts.withColumn("cell", F.explode(disk(F.col("lon"), F.col("lat"))))
                .join(edge_cells, "cell").drop("cell")
                .withColumn("dist", dist(F.col("lon"), F.col("lat"), F.col(geo_col)))
                .filter(F.col("dist") <= dist_cap))
        return (cand.groupBy(pk)
                .agg(F.min(F.struct(F.col("dist"), F.col("edge_id"),
                                    *[F.col(c) for c in attr_cols])).alias("b"))
                .select(pk, F.col("b.dist").alias("nearest_dist_m"),
                        F.col("b.edge_id").alias("nearest_edge_id"),
                        *[F.col(f"b.{c}").alias(c) for c in attr_cols]))

    k_cover = max(int(math.ceil(cutoff_m / cell_m)), 1)
    points = targets.select(pk, "lon", "lat")

    out = None
    if k_cover <= 2 and lookup is not None:
        # broadcastable edges + small cutoff: the ZERO-SHUFFLE plan —
        # per-batch candidate probe against a broadcast cell index, tags
        # emitted inline with the target rows (no argmin exchange, no
        # tag-back join; see _tag_map_only). May decline (None) when the
        # padded cover index exceeds the broadcast entry cap.
        out = _tag_map_only(targets, edges, attr_cols, cutoff_m, depth, pk,
                            lat0)
    if out is None and k_cover <= 2:
        # common case: the cutoff fits a small neighborhood -> ONE
        # candidate join. The pad goes on the SMALL side: edge covers are
        # padded by cutoff_m, points encode to a single cell — the big
        # table is never exploded (9x fewer shuffle rows than padding the
        # point side with disk(1)).
        env_cols = ["gmin_lon", "gmin_lat", "gmax_lon", "gmax_lat"]
        padded_edges = (cover_geometry(edges, depth, cutoff_m / coslat,
                                       out_col="_cov", with_envelope=True)
                        .withColumn("cell", F.explode("_cov"))
                        .select("cell", "edge_id", *env_cols,
                                *([] if lookup is not None else ["geometry"]),
                                *attr_cols))

        # JVM-side envelope prefilter: a point farther than cutoff from the
        # edge bbox can never be within cutoff of the edge (over-padded so
        # FP rounding never rejects a true match)
        pad_lon = (cutoff_m / (cells.M_PER_DEG_LON_EQ * coslat)
                   * (1 + 1e-6) + 1e-9)
        pad_lat = cutoff_m / cells.M_PER_DEG_LAT * (1 + 1e-6) + 1e-9
        # Arrow UDF, not encode_expr: cell is a join key (see
        # cells._part1by1_expr on the inferred-filter tree blowup)
        @F.pandas_udf(T.LongType())
        def _enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
            return pd.Series(cells.encode(lon.to_numpy(np.float64),
                                          lat.to_numpy(np.float64), depth))

        dist = _dist_udf(lookup, lat0)
        cand = (points.withColumn("cell", _enc.asNondeterministic()(
                    F.col("lon"), F.col("lat")))
                .join(padded_edges, "cell").drop("cell")
                .filter((F.col("lon") >= F.col("gmin_lon") - pad_lon)
                        & (F.col("lon") <= F.col("gmax_lon") + pad_lon)
                        & (F.col("lat") >= F.col("gmin_lat") - pad_lat)
                        & (F.col("lat") <= F.col("gmax_lat") + pad_lat))
                .drop(*env_cols)
                .withColumn("dist", dist(F.col("lon"), F.col("lat"), F.col(geo_col)))
                .filter(F.col("dist") <= cutoff_m))
        tags = (cand.groupBy(pk)
                .agg(F.min(F.struct(F.col("dist"), F.col("edge_id"),
                                    *[F.col(c) for c in attr_cols])).alias("b"))
                .select(pk, F.col("b.dist").alias("nearest_dist_m"),
                        F.col("b.edge_id").alias("nearest_edge_id"),
                        *[F.col(f"b.{c}").alias(c) for c in attr_cols]))
    elif out is None:
        # large cutoff: expand rings, settling targets whose best found
        # distance is within the per-point guaranteed radius (exact
        # distance to the searched square's boundary)
        edge_cells = edge_cells.persist()
        remaining = points
        best_parts: list[DataFrame] = []
        k = 1
        while True:
            best = _search(remaining, k, F.lit(cutoff_m))
            if k >= k_cover:
                best_parts.append(best)
                break
            gr = _guaranteed_radius_udf(depth, k, lat0)
            best = (best.join(remaining, pk)
                    .withColumn("_gr", gr(F.col("lon"), F.col("lat"))))
            settled = (best.filter(F.col("nearest_dist_m") <= F.col("_gr"))
                       .drop("_gr", "lon", "lat").persist())
            best_parts.append(settled)
            remaining = remaining.join(settled.select(pk), pk, "left_anti").persist()
            if remaining.isEmpty():
                break
            k = min(k * 2, k_cover)
        tags = best_parts[0]
        for p in best_parts[1:]:
            tags = tags.unionByName(p)

    if out is None:
        out = targets.join(tags, pk, "left")
    graft = F.create_map().cast("map<string,string>")
    for a, c in zip(attrs, attr_cols):
        graft = F.map_concat(
            graft,
            F.when(F.col(c).isNotNull(), F.create_map(F.lit(f"tag:{a}"), F.col(c)))
             .otherwise(F.create_map().cast("map<string,string>")))
    out = out.withColumn(
        "props",
        F.map_concat(F.coalesce(F.col("props"), F.create_map().cast("map<string,string>")),
                     graft))
    return out.drop(*attr_cols)
