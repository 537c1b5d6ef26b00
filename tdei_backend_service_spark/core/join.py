"""Two-phase spatial join: cell equi-join candidates -> vectorized refine.

This is the engine's replacement for the reference's
``content.tdei_dataset_spatial_join`` (invoked at
/root/reference/src/service/services/spatial-query-service.ts:28-37; the
generated LEFT JOIN template at
/root/reference/src/service/interface/interfaces.ts:303-328, where the
join predicate runs on GiST-indexed ``_3857`` geometry columns).

Phase 1 — candidates (pure Catalyst, shuffles only here):
  every target geometry's cell cover (padded by the predicate's distance
  bound) is exploded to (cell, pk, geom) rows; sources are encoded to the
  same depth (a single cell for points, an unpadded cover for
  lines/polygons); an inner equi-join on ``cell`` yields candidate pairs.
  Catalyst/AQE picks broadcast vs shuffle hash; an explicit broadcast
  hint is applied when the caller knows the source is small. Padding on
  exactly one side guarantees zero false negatives (superset cover).

Phase 2 — refine (Arrow-batched pandas UDF, no shuffle):
  the compiled SpatialPredicate is evaluated on each pair batch with the
  numpy kernels (min geometry distance in meters, line-orientation
  angle). Distances use the equirectangular-at-equator metric — the same
  convention as the reference's EPSG:3857 predicates (SURVEY.md §1.1).

An unbounded predicate (e.g. the reference's pure-angle condition,
test/unit/spatial-query.test.ts:111) has no proximity bound, so phase 1
degenerates to a dataset-filtered cross join — exactly what PostGIS
executes for that query.

Scale notes: the exploded candidate table is narrow (cell, pk, geometry
refs); heavy payload columns (image bytes) are never carried through the
shuffle — callers project the carry columns they need. Dense-cell skew
is handled by AQE skew-join plus the optional salt in ``salt_cells``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from . import cells, geom
from .compiler import SpatialPredicate, eval_spatial

DEFAULT_MAX_DEPTH = cells.RES_GRID[10]   # 19: ~76 m cells
DEFAULT_MIN_DEPTH = cells.RES_GRID[7]    # 15: ~1.2 km cells


@dataclass
class GeomSide:
    """One side of a spatial join: a DataFrame plus how to read its
    geometry. Point sides use (lon_col, lat_col); vector sides a WKB
    ``geom_col``. ``carry`` columns ride through to the refined pairs."""
    df: DataFrame
    pk: str
    kind: str  # 'point' | 'line' | 'polygon'
    geom_col: str | None = None
    lon_col: str = "lon"
    lat_col: str = "lat"
    carry: list[str] = field(default_factory=list)

    def is_point(self) -> bool:
        return self.kind == "point"


def pick_depth(bound_m: float, min_depth: int = DEFAULT_MIN_DEPTH,
               max_depth: int = DEFAULT_MAX_DEPTH) -> int:
    """Join-cell resolution: deep enough for selectivity, shallow enough
    that a pad of ``bound_m`` only grows covers by ~1 cell. Clamped to the
    r7..r10 ladder so ingest-time cover columns can be reused."""
    if not math.isfinite(bound_m):
        return min_depth
    return int(np.clip(cells.depth_for_radius_m(max(bound_m, 1.0)),
                       min_depth, max_depth))


def _point_cells(side: GeomSide, depth: int, pad_m: float, tag: str) -> DataFrame:
    """(cell, pk, lon, lat, carry...) — exploded disk cover if padded."""
    pad_deg = max(cells.meters_to_deg_lat(pad_m), cells.meters_to_deg_lon(pad_m)) if pad_m else 0.0

    if pad_deg == 0.0:
        @F.pandas_udf(T.LongType())
        def _enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
            return pd.Series(cells.encode(lon.to_numpy(np.float64),
                                          lat.to_numpy(np.float64), depth))
        out = side.df.withColumn("cell", _enc(F.col(side.lon_col), F.col(side.lat_col)))
    else:
        @F.pandas_udf(T.ArrayType(T.LongType()))
        def _cov(lon: pd.Series, lat: pd.Series) -> pd.Series:
            lo = lon.to_numpy(np.float64)
            la = lat.to_numpy(np.float64)
            res = []
            for i in range(lo.size):
                res.append([int(v) for v in cells.cover_bbox(
                    lo[i] - pad_deg, la[i] - pad_deg,
                    lo[i] + pad_deg, la[i] + pad_deg, depth)])
            return pd.Series(res)
        out = (side.df.withColumn("_cov", _cov(F.col(side.lon_col), F.col(side.lat_col)))
               .withColumn("cell", F.explode("_cov")).drop("_cov"))
    cols = [side.pk, side.lon_col, side.lat_col] + side.carry
    return out.select("cell", *[F.col(c).alias(f"{tag}_{c}") for c in cols])


def _geom_cells(side: GeomSide, depth: int, pad_m: float, tag: str) -> DataFrame:
    """(cell, pk, geometry, carry...) via per-geometry cover explode."""
    from .ingest import cover_geometry
    covered = cover_geometry(side.df, depth, pad_m, geometry_col=side.geom_col,
                             out_col="_cov")
    out = covered.withColumn("cell", F.explode("_cov")).drop("_cov")
    cols = [side.pk, side.geom_col] + side.carry
    return out.select("cell", *[F.col(c).alias(f"{tag}_{c}") for c in cols])


def _side_cells(side: GeomSide, depth: int, pad_m: float, tag: str) -> DataFrame:
    if side.is_point():
        return _point_cells(side, depth, pad_m, tag)
    return _geom_cells(side, depth, pad_m, tag)


def _ragged_from_cols(pdf: pd.DataFrame, cols: list[str], is_point: bool) -> geom.RaggedGeoms:
    if is_point:
        lon = pdf[cols[0]].to_numpy(np.float64)
        lat = pdf[cols[1]].to_numpy(np.float64)
        coords = np.stack([lon, lat], axis=1)
        offsets = np.arange(lon.size + 1, dtype=np.int64)
        kinds = np.full(lon.size, geom.WKB_POINT, dtype=np.int64)
        return geom.RaggedGeoms(coords, offsets, kinds)
    return geom.parse_wkb_batch(pdf[cols[0]])


def refine_pairs(pairs: DataFrame, pred: SpatialPredicate,
                 target: GeomSide, source: GeomSide) -> DataFrame:
    """Filter candidate pairs by exactly evaluating the predicate.

    The UDF closes over plain strings/bools only (never GeomSide, which
    holds a DataFrame and would drag the SparkContext into cloudpickle).
    """
    t_point, s_point = target.is_point(), source.is_point()
    t_cols = ([f"t_{target.lon_col}", f"t_{target.lat_col}"] if t_point
              else [f"t_{target.geom_col}"])
    s_cols = ([f"s_{source.lon_col}", f"s_{source.lat_col}"] if s_point
              else [f"s_{source.geom_col}"])
    geo_cols = t_cols + s_cols

    @F.pandas_udf(T.BooleanType())
    def _refine(st: pd.DataFrame) -> pd.Series:
        n = len(st)
        if n == 0:
            return pd.Series([], dtype=bool)
        tg = _ragged_from_cols(st, t_cols, t_point)
        sg = _ragged_from_cols(st, s_cols, s_point)
        idx = np.arange(n, dtype=np.int64)
        ctx: dict = {}
        if "dist" in pred.needs:
            ctx["dist"] = geom.pair_min_dist(idx, tg, idx, sg)
        if "angle" in pred.needs:
            ctx["angle"] = geom.angle_between_deg(
                geom.polyline_orientation(tg), geom.polyline_orientation(sg))
        res = eval_spatial(pred.ast, ctx)
        return pd.Series(np.asarray(res, dtype=bool))

    return pairs.filter(_refine(F.struct(*geo_cols)))


def two_phase_join(target: GeomSide, source: GeomSide, pred: SpatialPredicate,
                   depth: int | None = None,
                   broadcast_source: bool | None = None,
                   target_filter: Column | None = None,
                   source_filter: Column | None = None) -> DataFrame:
    """Matched (t_<pk>, s_<pk>, s_<carry>...) pairs satisfying ``pred``.

    Filters are applied to each side *before* the join — equivalent to the
    reference's ON-clause placement for a left join (interfaces.ts:318-323),
    because the final left join back to the full target happens in the
    operator layer (operators/spatial_join.py).
    """
    t = GeomSide(**{**target.__dict__, "df": target.df.filter(target_filter)}) \
        if target_filter is not None else target
    s = GeomSide(**{**source.__dict__, "df": source.df.filter(source_filter)}) \
        if source_filter is not None else source

    if not math.isfinite(pred.bound_m):
        # unbounded predicate (pure angle): dataset cross join, source
        # broadcast when allowed — identical semantics to the reference.
        tcols = [F.col(c).alias(f"t_{c}") for c in
                 ([t.pk] + ([t.geom_col] if not t.is_point() else [t.lon_col, t.lat_col]))]
        scols = [F.col(c).alias(f"s_{c}") for c in
                 ([s.pk] + ([s.geom_col] if not s.is_point() else [s.lon_col, s.lat_col]) + s.carry)]
        sdf = s.df.select(*scols)
        if broadcast_source is not False:
            sdf = F.broadcast(sdf)
        pairs = t.df.select(*tcols).crossJoin(sdf)
        return refine_pairs(pairs, pred, t, s)

    d = depth if depth is not None else pick_depth(pred.bound_m)
    # pad exactly one side (the target) by the bound — sufficient cover
    tc = _side_cells(t, d, pred.bound_m, "t")
    sc = _side_cells(s, d, 0.0, "s")
    if broadcast_source:
        sc = F.broadcast(sc)
    pairs = tc.join(sc, "cell").drop("cell")

    # multi-cell covers on both sides create duplicate (t,s) pairs; a
    # point source is a single cell, so pairs are already unique then.
    if not s.is_point():
        keys = [f"t_{t.pk}", f"s_{s.pk}"]
        others = [c for c in pairs.columns if c not in keys]
        pairs = pairs.groupBy(*keys).agg(*[F.first(c).alias(c) for c in others])

    return refine_pairs(pairs, pred, t, s)


def salt_cells(df: DataFrame, cell_col: str = "cell", buckets: int = 8) -> DataFrame:
    """Salted repartition for dense-cell skew: spread each hot cell's rows
    over ``buckets`` shuffle partitions. Used by operators that aggregate
    per cell when AQE's skew split is not applicable (e.g. before a
    non-join repartition)."""
    return (df.withColumn("_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(buckets)))
              .repartition(F.col(cell_col), F.col("_salt"))
              .drop("_salt"))
