"""O1 bbox_intersect — extract every feature of a dataset intersecting a
lon/lat bounding box.

Reference: ``content.bbox_intersect(tdei_dataset_id, minx, miny, maxx,
maxy)`` invoked at
/root/reference/src/service/services/bbox-intersect-service.ts:41-46 with
bbox parse/validation at :32-38 (string -> 4 floats, else InputException)
and one output file per layer drained via server-side cursors
(/root/reference/src/service/base/osw-backend-abstract.ts:191-232).

Spark plan:
* points (images): a pure range filter on lon/lat — pushed down to the
  parquet scan (shows as PushedFilters), plus dataset_id partition
  pruning. No UDF, no shuffle, whole-stage codegen end to end.
* lines/polygons: coarse range filter on the ingest-time envelope
  columns (also pushed down), then an exact vectorized refine
  (segment-clip test for lines; boundary-intersect OR corner-PIP OR
  vertex-in-bbox for polygons).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..core import geom


class InputException(ValueError):
    """User-input error — mirrors the reference's InputException
    (/root/reference/src/exceptions/http/http-exceptions.ts usage in
    bbox-intersect-service.ts:35)."""


def parse_bbox(bbox) -> tuple[float, float, float, float]:
    """Accept 'minx,miny,maxx,maxy' string or 4-seq; validate arity/order.

    Mirrors bbox-intersect-service.ts:32-38 (string split -> floats,
    must be exactly 4).
    """
    if isinstance(bbox, str):
        parts = [p for p in bbox.replace(",", " ").split() if p]
    else:
        parts = list(bbox)
    if len(parts) != 4:
        raise InputException("bbox must have exactly 4 values: minx,miny,maxx,maxy")
    try:
        vals = [float(p) for p in parts]
    except (TypeError, ValueError) as e:
        raise InputException(f"bbox values must be numeric: {e}") from None
    minx, miny, maxx, maxy = vals
    if minx > maxx or miny > maxy:
        raise InputException("bbox min must not exceed max")
    return minx, miny, maxx, maxy


def bbox_filter_points(df: DataFrame, bbox, dataset_id: str | None = None,
                       lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Closed-interval bbox filter for point features. Pure Catalyst —
    every predicate reaches the parquet scan."""
    minx, miny, maxx, maxy = parse_bbox(bbox)
    out = df
    if dataset_id is not None:
        out = out.filter(F.col("dataset_id") == dataset_id)
    return out.filter((F.col(lon_col) >= minx) & (F.col(lon_col) <= maxx)
                      & (F.col(lat_col) >= miny) & (F.col(lat_col) <= maxy))


def bbox_filter_geoms(df: DataFrame, bbox, dataset_id: str | None = None,
                      geometry_col: str = "geometry") -> DataFrame:
    """Exact bbox intersection for line/polygon features.

    Coarse phase: envelope-overlap range filter on the ingest-time
    gmin/gmax columns (parquet-stat prunable). Exact phase: vectorized
    refine — a polygon intersects the bbox iff its boundary crosses it,
    any of its vertices is inside, or a bbox corner is inside the polygon.
    """
    minx, miny, maxx, maxy = parse_bbox(bbox)
    out = df
    if dataset_id is not None:
        out = out.filter(F.col("dataset_id") == dataset_id)
    if "gmin_lon" in out.columns:
        out = out.filter((F.col("gmin_lon") <= maxx) & (F.col("gmax_lon") >= minx)
                         & (F.col("gmin_lat") <= maxy) & (F.col("gmax_lat") >= miny))

    @F.pandas_udf(T.BooleanType())
    def _exact(blob: pd.Series) -> pd.Series:
        g = geom.parse_wkb_batch(blob)
        idx = np.arange(len(g), dtype=np.int64)
        hit = geom.segments_intersect_bbox(idx, g, minx, miny, maxx, maxy)
        # polygon containing the whole bbox: test one bbox corner
        poly = np.flatnonzero((g.kinds == geom.WKB_POLYGON) & ~hit)
        if poly.size:
            cx = np.full(poly.size, minx)
            cy = np.full(poly.size, miny)
            hit[poly] |= geom.point_in_polygon(cx, cy, poly.astype(np.int64), g)
        return pd.Series(hit)

    return out.filter(_exact(F.col(geometry_col)))


def bbox_intersect(layers: dict[str, DataFrame], dataset_id: str, bbox) -> dict[str, DataFrame]:
    """Full O1: one result DataFrame per layer, like the reference's one
    cursor/file per layer. Point layers route to the pushdown-only path.
    """
    out = {}
    for name, df in layers.items():
        if "lon" in df.columns and "lat" in df.columns:
            out[name] = bbox_filter_points(df, bbox, dataset_id)
        else:
            out[name] = bbox_filter_geoms(df, bbox, dataset_id)
    return out
