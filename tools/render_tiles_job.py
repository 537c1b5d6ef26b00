#!/usr/bin/env python
"""spark-submit entry point for the resumable tile-render pipeline —
the north rule's production path for the raster layer: points ->
pixel-count lattice -> PNG tiles -> manifest-tracked (z, x-stripe)
layout with per-partition lineage + row/byte metrics.

Usage:
    zip -r /tmp/pkg.zip tdei_backend_service_spark
    spark-submit --master <cluster> --py-files /tmp/pkg.zip \
        tools/render_tiles_job.py --points <parquet> --run-dir <dir> \
        [--z 11] [--px 16] [--lon-col lon] [--lat-col lat]

Re-running the same invocation after a crash recomputes only
uncommitted stripes; a completed layout is a no-op (prints
``{"skipped": true}``). The session takes its master from
spark-submit, so the same script runs on local[N] or a real cluster
unchanged.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", required=True)
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--z", type=int, default=11)
    ap.add_argument("--px", type=int, default=16)
    ap.add_argument("--lon-col", default="lon")
    ap.add_argument("--lat-col", default="lat")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("tdei-render-tiles")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from tdei_backend_service_spark.io.tile_store import write_tile_layout
    from tdei_backend_service_spark.operators.raster import rasterize

    pts = spark.read.parquet(args.points)
    tiles = rasterize(pts, args.z, args.px, args.lon_col, args.lat_col)
    rec = write_tile_layout(tiles, args.run_dir)
    print(json.dumps(rec))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
