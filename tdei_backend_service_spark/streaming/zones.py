"""Streaming geofence occupancy: live per-zone presence counts.

A geotagged event stream assigns each record its containing zones
(REAL ray-cast point-in-polygon — the O2 kernel, core/geom.
point_in_polygon — against a broadcast polygon table; a point inside
k overlapping zones counts in all k) and aggregates into
per-(event-time-window, zone) counts under a watermark — the live
front end of the zone analytics tier (``operators/trajectory.
zone_visits`` / ``od_matrix`` are its batch siblings), APPEND mode
sealing a (window, zone) cell exactly once when the watermark passes
the window end.

Scale shape: geofence tables are small by nature (a city's curb zones,
not a corpus), so membership is one broadcast + a vectorized Arrow UDF
— the stream never shuffles until the windowed aggregate, whose state
is bounded by active windows x zones, independent of stream length.
Late rows inside the delay still land before sealing; rows beyond it
are dropped by the engine, never revised.
"""

from __future__ import annotations

import numpy as np
import pandas as pd  # module-level: pandas_udf type hints resolve here
from pyspark.sql import DataFrame, functions as F, types as T

from ..core import geom


def zone_membership_udf(spark, zones_df: DataFrame,
                        zone_dataset_id: str | None = None):
    """Vectorized membership column builder: (lon, lat) -> array of
    zone_ids whose polygon contains the point (ray-cast; boundary
    semantics per core/geom.point_in_polygon). The zone table collects
    once to the driver and broadcasts; the WKB parse is memoized per
    executor, so steady-state batches pay only the PIP kernel."""
    zones = zones_df
    if zone_dataset_id is not None:
        zones = zones.filter(F.col("dataset_id") == zone_dataset_id)
    rows = zones.select("zone_id", "geometry").collect()
    ids = np.array([r["zone_id"] for r in rows], dtype=np.int64)
    blobs = [bytes(r["geometry"]) for r in rows]
    b = spark.sparkContext.broadcast((ids, blobs))
    parsed: dict = {}

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _zids(lon: pd.Series, lat: pd.Series) -> pd.Series:
        ids_, blobs_ = b.value
        geoms = parsed.get("g")
        if geoms is None:
            geoms = parsed["g"] = geom.parse_wkb_batch(blobs_)
        px = lon.to_numpy(np.float64)
        py = lat.to_numpy(np.float64)
        hits: list[list[int]] = [[] for _ in range(px.size)]
        for j in range(ids_.size):
            idx = np.full(px.size, j, dtype=np.int64)
            inside = geom.point_in_polygon(px, py, idx, geoms)
            zid = int(ids_[j])
            for i in np.nonzero(inside)[0]:
                hits[int(i)].append(zid)
        return pd.Series(hits)

    return _zids.asNondeterministic()


def windowed_zone_counts(stream: DataFrame, zids_udf,
                         window_size: str = "1 hour",
                         watermark_delay: str = "30 minutes",
                         ts_col: str = "ts", lon_col: str = "lon",
                         lat_col: str = "lat") -> DataFrame:
    """(window_start, window_end, zone_id, n) per sealed window; points
    in no zone drop (explode of an empty array), points in several
    count in each."""
    return (stream.withWatermark(ts_col, watermark_delay)
            .withColumn("_zs", zids_udf(F.col(lon_col), F.col(lat_col)))
            .select(F.col(ts_col), F.explode("_zs").alias("zone_id"))
            .groupBy(F.window(F.col(ts_col), window_size), "zone_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    "zone_id", "n"))


def run_zone_counts(spark, landing_dir: str, out_dir: str,
                    checkpoint_dir: str, schema, zones_df: DataFrame,
                    zone_dataset_id: str | None = None,
                    window_size: str = "1 hour",
                    watermark_delay: str = "30 minutes",
                    timeout_s: int = 120) -> None:
    """Drive the streaming zone aggregation over available files to a
    parquet sink (append mode: only watermark-sealed windows land)."""
    zids = zone_membership_udf(spark, zones_df, zone_dataset_id)
    stream = spark.readStream.schema(schema).parquet(landing_dir)
    q = (windowed_zone_counts(stream, zids, window_size, watermark_delay)
         .writeStream.outputMode("append").format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True).start())
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError(
            f"streaming zone aggregation still active after {timeout_s}s "
            f"— sink at {out_dir} is partial; raise timeout_s for this "
            f"input size")
