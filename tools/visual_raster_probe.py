#!/usr/bin/env python
"""Visual-raster scale probe: run the A+B render tier — mean-brightness
layer (decode EVERY blob) and the per-tile representative gallery
(decode ~one winner per tile) — over N planted geotagged images at 10x+
the contract scale, FULL-FRAME exact against an independent DuckDB
replica (per-tile stats are closed-form popcount(V) polynomials and the
lattice is the verified z15 grid).

The spread is a 1-degree box (~91 z15 tiles per axis), so at 10^6
images a tile holds ~120 records: the gallery's winner pass decodes
only ~0.8% of the corpus while the brightness layer decodes all of it —
the probe reports both throughputs to make that asymmetry visible.

Usage: python tools/visual_raster_probe.py [n_images] [cpus]
       (default 1000000 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LON0, LAT0 = -122.35, 40.60  # 1e6 micro-deg spread => a 1-degree box
POLY61 = " + ".join(f"((V // {1 << i}) % 2)" for i in range(61))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import duckdb
    from pyspark.sql import functions as F, types as T

    from tdei_backend_service_spark.codecs.image import encode_image
    from tdei_backend_service_spark.fixtures_tpch import phash_class_value
    from tdei_backend_service_spark.operators.geo_visual import (
        brightness_raster, tile_gallery)
    from tdei_backend_service_spark.operators.raster import decode_tile_stats
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("visual-raster-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    report: dict = {"n_images": n, "cpus": cpus}

    @F.pandas_udf(T.BinaryType())
    def _img(key: pd.Series) -> pd.Series:
        import numpy as np
        cache: dict = {}
        out = []
        for k in key:
            k = int(k)
            ck = (k % 127, k % 3, k % 2)
            blob = cache.get(ck)
            if blob is None:
                v = phash_class_value(k % 127)
                s = 1 + k % 3
                cell = np.array([[(v >> (63 - (8 * i + j))) & 1
                                  for j in range(8)] for i in range(8)],
                                dtype=np.uint8)
                img = np.repeat(np.repeat(np.where(cell == 1, 200, 40),
                                          s, 0), s, 1).astype(np.uint8)
                blob = encode_image(np.stack([img] * 3, axis=-1),
                                    "png" if k % 2 == 0 else "qimg")
                cache[ck] = blob
            out.append(blob)
        return pd.Series(out)

    lon = F.lit(LON0) + (F.col("id") * F.lit(2654435761)) % 1_000_000 \
        / F.lit(1e6)
    lat = F.lit(LAT0) + (F.col("id") * F.lit(40503) + F.lit(12345)) \
        % 1_000_000 / F.lit(1e6)
    imgs = (spark.range(n)
            .repartition(cpus * 2)
            .select(F.col("id").alias("image_id"),
                    _img.asNondeterministic()(F.col("id")).alias("bytes"),
                    F.when(F.col("id") % 2 == 0, F.lit("png"))
                    .otherwise(F.lit("qimg")).alias("fmt"),
                    lon.alias("lon"), lat.alias("lat")))

    con = duckdb.connect()
    base = f"""
        WITH v AS (
          SELECT range AS k,
                 CAST((CAST(range % 127 + 1 AS HUGEINT)
                       * 11400714819323198485)
                      % 2305843009213693952 AS BIGINT) AS V,
                 1 + range % 3 AS s,
                 CASE WHEN range % 2 = 0 THEN 200 ELSE 202 END AS hi,
                 CASE WHEN range % 2 = 0 THEN 40 ELSE 42 END AS lo,
                 {LON0} + ((range * 2654435761) % 1000000) / 1000000.0
                   AS lon,
                 {LAT0} + ((range * 40503 + 12345) % 1000000) / 1000000.0
                   AS lat
          FROM range({n})),
        t AS (
          SELECT *, ({POLY61}) AS pop,
                 CAST(FLOOR((lon + 180.0) / 360.0 * 32768) AS BIGINT)
                   AS gx,
                 CAST(FLOOR((1.0 - ln(tan(radians(lat))
                     + 1.0 / cos(radians(lat))) / pi()) / 2.0 * 32768)
                   AS BIGINT) AS gy
          FROM v)
    """

    def frame(df):
        pdf = df.toPandas()
        return (pdf[sorted(pdf.columns)]
                .sort_values(sorted(pdf.columns))
                .reset_index(drop=True))

    # --- 1. brightness layer: decode ALL blobs -> integer-mean lattice
    t0 = time.time()
    st = decode_tile_stats(brightness_raster(imgs, 11, 16))
    got = frame(st)
    wall = time.time() - t0
    report["brightness"] = {"tiles": len(got), "wall_s": round(wall, 1),
                            "images_per_sec": round(n / wall)}
    print(f"brightness: {len(got)} tiles in {wall:.1f}s")
    want = con.execute(base + """
        , e AS (SELECT gx, gy,
                       CAST(3 * s * s AS BIGINT)
                         * (hi * pop + lo * (64 - pop)) AS ps,
                       CAST(192 AS BIGINT) * s * s AS np
                FROM t),
        pix AS (SELECT gx, gy, LEAST(SUM(ps) // SUM(np), 255) AS vv
                FROM e GROUP BY 1, 2)
        SELECT CAST(11 AS INT) AS z,
               CAST(gx // 16 AS INT) AS tile_x,
               CAST(gy // 16 AS INT) AS tile_y,
               CAST(COUNT(*) AS BIGINT) AS nonzero_px,
               CAST(SUM(vv) AS BIGINT) AS sum_px,
               CAST(MAX(vv) AS BIGINT) AS max_px
        FROM pix GROUP BY 1, 2, 3""").df()
    want = (want[sorted(want.columns)].sort_values(sorted(want.columns))
            .reset_index(drop=True))
    assert got.equals(want), "brightness stats diverge"
    print("  brightness FULL-FRAME EXACT")

    # --- 2. gallery: winner agg decodes ~one blob per tile ------------
    t0 = time.time()
    g = tile_gallery(imgs, 15, 16)
    got = frame(decode_tile_stats(g, carry=("image_id",)))
    wall = time.time() - t0
    report["gallery"] = {"tiles": len(got), "wall_s": round(wall, 1),
                         "images_per_sec": round(n / wall)}
    print(f"gallery: {len(got)} tiles in {wall:.1f}s")
    want = con.execute(base + """
        , r AS (SELECT gx, gy, MIN(k) AS k FROM t GROUP BY 1, 2)
        SELECT CAST(15 AS INT) AS z,
               CAST(r.gx AS INT) AS tile_x,
               CAST(r.gy AS INT) AS tile_y,
               CAST(256 AS BIGINT) AS nonzero_px,
               CAST(4 * (t.hi * t.pop + t.lo * (64 - t.pop)) AS BIGINT)
                 AS sum_px,
               CAST(t.hi AS BIGINT) AS max_px,
               CAST(t.k AS BIGINT) AS image_id
        FROM r JOIN t ON t.k = r.k""").df()
    want = (want[sorted(want.columns)].sort_values(sorted(want.columns))
            .reset_index(drop=True))
    assert got.equals(want), "gallery stats diverge"
    print("  gallery FULL-FRAME EXACT")

    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
