"""Write-time enrichment: cell/tile encoding for points, bbox + cell
covers for vector geometries.

The reference pre-materializes an EPSG:3857 copy of every geometry so
queries never transform at read time
(/root/reference/src/service/interface/interfaces.ts:192-198). The
engine's analogue: encode H3-ladder cell IDs, slippy tile IDs, and
geometry envelopes once at ingest. All encodes are Arrow-batched pandas
UDFs wrapping the numpy kernels in core/cells.py — one UDF call computes
every derived column (single Arrow round-trip per batch).

At 100 TB these columns are what make queries cheap: ``cell_p5`` is the
partition key (partition pruning replaces the reference's index scan),
per-geometry envelopes are min/max parquet stats (range-filter pushdown),
and the r7-r10 ladder gives the join resolution choices.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from . import cells, geom

CELL_LADDER = {"cell_r7": 7, "cell_r8": 8, "cell_r9": 9, "cell_r10": 10}
DEFAULT_TILE_Z = 15


def encode_cells(df: DataFrame, tile_z: int = DEFAULT_TILE_Z,
                 lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    """Add cell_r7..r10, cell_p5 (partition prefix), tile_z/x/y, tile_key.

    Pure Catalyst (cells.encode_expr / tile_expr): the write path stays
    in whole-stage codegen with no Python workers — at 100 TB the
    ingest enrichment runs over every row of every table, so this is
    the single hottest place to avoid Arrow round-trips. Bit-compatible
    with the numpy kernels (property-tested in tests/test_cells.py)."""
    lon, lat = F.col(lon_col), F.col(lat_col)
    out = df
    for name, res in CELL_LADDER.items():
        out = out.withColumn(name, cells.encode_expr(lon, lat,
                                                     cells.RES_GRID[res]))
    tx, ty, tkey = cells.tile_expr(lon, lat, tile_z)
    return (out.withColumn("cell_p5", cells.encode_expr(lon, lat,
                                                        cells.RES_GRID[5]))
               .withColumn("tile_z", F.lit(tile_z).cast("int"))
               .withColumn("tile_x", tx.cast("int"))
               .withColumn("tile_y", ty.cast("int"))
               .withColumn("tile_key", tkey))


def encode_geom_meta(df: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """Add per-geometry envelope columns (gmin_lon..gmax_lat).

    Envelopes land in parquet min/max stats, so a bbox query's range
    filter prunes row groups without parsing any WKB.
    """

    fields = [T.StructField(c, T.DoubleType())
              for c in ("gmin_lon", "gmin_lat", "gmax_lon", "gmax_lat")]

    @F.pandas_udf(T.StructType(fields))
    def _env(blob: pd.Series) -> pd.DataFrame:
        g = geom.parse_wkb_batch(blob)
        box = geom.geom_bbox(g)
        return pd.DataFrame({
            "gmin_lon": box[:, 0], "gmin_lat": box[:, 1],
            "gmax_lon": box[:, 2], "gmax_lat": box[:, 3],
        })

    df = df.withColumn("_env", _env.asNondeterministic()(F.col(geometry_col)))
    for c in ("gmin_lon", "gmin_lat", "gmax_lon", "gmax_lat"):
        df = df.withColumn(c, F.col(f"_env.{c}"))
    return df.drop("_env")


def cover_geometry(df: DataFrame, depth: int, pad_m: float = 0.0,
                   geometry_col: str = "geometry",
                   out_col: str = "cover_cells",
                   with_envelope: bool = False) -> DataFrame:
    """Add ``out_col``: array<long> of grid cells (superset cover) each
    geometry touches at ``depth``, padded by ``pad_m`` meters.

    Lines: per-segment bbox walk (cells.cover_segments). Polygons: bbox
    cover (interior included — required for point-in-polygon joins).
    Superset covers trade false-positive candidates (cheap, removed by
    refine) for guaranteed zero false negatives.
    """
    pad_deg = max(cells.meters_to_deg_lat(pad_m), cells.meters_to_deg_lon(pad_m)) if pad_m else 0.0

    def _covers(blob: pd.Series):
        g = geom.parse_wkb_batch(blob)
        out: list[list[int]] = []
        box = geom.geom_bbox(g)
        npts = g.n_points()
        for i in range(len(g)):
            if npts[i] == 0:
                out.append([])
                continue
            if g.kinds[i] == geom.WKB_POLYGON or npts[i] == 1:
                cs = cells.cover_bbox(box[i, 0] - pad_deg, box[i, 1] - pad_deg,
                                      box[i, 2] + pad_deg, box[i, 3] + pad_deg, depth)
            else:
                c = g.coords[g.offsets[i]:g.offsets[i + 1]]
                _, cs = cells.cover_segments(c[:-1, 0], c[:-1, 1], c[1:, 0], c[1:, 1],
                                             depth, pad_deg)
                cs = np.unique(cs)
            out.append([int(v) for v in cs])
        return out, box

    if not with_envelope:
        @F.pandas_udf(T.ArrayType(T.LongType()))
        def _cover(blob: pd.Series) -> pd.Series:
            out, _ = _covers(blob)
            return pd.Series(out)

        return df.withColumn(out_col,
                             _cover.asNondeterministic()(F.col(geometry_col)))

    env_fields = T.StructType([
        T.StructField("cov", T.ArrayType(T.LongType())),
        T.StructField("gmin_lon", T.DoubleType()),
        T.StructField("gmin_lat", T.DoubleType()),
        T.StructField("gmax_lon", T.DoubleType()),
        T.StructField("gmax_lat", T.DoubleType()),
    ])

    @F.pandas_udf(env_fields)
    def _cover_env(blob: pd.Series) -> pd.DataFrame:
        out, box = _covers(blob)
        return pd.DataFrame({"cov": out, "gmin_lon": box[:, 0],
                             "gmin_lat": box[:, 1], "gmax_lon": box[:, 2],
                             "gmax_lat": box[:, 3]})

    # single evaluation per row (see encode_cells note on asNondeterministic)
    d2 = df.withColumn("_ce", _cover_env.asNondeterministic()(F.col(geometry_col)))
    for c in ("gmin_lon", "gmin_lat", "gmax_lon", "gmax_lat"):
        d2 = d2.withColumn(c, F.col(f"_ce.{c}"))
    return d2.withColumn(out_col, F.col("_ce.cov")).drop("_ce")
