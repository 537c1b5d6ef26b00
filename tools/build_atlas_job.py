#!/usr/bin/env python
"""spark-submit entry point for the resumable ATLAS build — the north
rule's production path for the full browse stack over one geotagged
image+caption table: four layers land through the checkpoint manifest
as independent stages, so a killed run resumes exactly where it died
and a completed layer is skipped without touching Spark jobs.

Layers (one manifest stage each, shared run dir):
  density     — point-count PNG tiles (operators/raster.rasterize)
  brightness  — mean decoded-brightness PNG tiles
                (operators/geo_visual.brightness_raster; decodes ALL
                blobs, map-only)
  gallery     — min-id representative thumbnails
                (operators/geo_visual.tile_gallery; decodes ~one blob
                per occupied tile)
  terms       — dominant caption term per tile
                (operators/tiling.tile_top_terms; all JVM)

Usage:
    zip -r /tmp/pkg.zip tdei_backend_service_spark
    spark-submit --master <cluster> --py-files /tmp/pkg.zip \
        tools/build_atlas_job.py --images <parquet> --run-dir <dir> \
        [--z 15] [--px 16]

The images parquet must carry (image_id, bytes, fmt, caption, lon,
lat) — the north-rule input shape. Re-running the same invocation
recomputes only uncommitted stripes; a fully-built atlas prints
``{"skipped": true}`` for every layer. The session takes its master
from spark-submit, so the same script runs on local[N] or a real
cluster unchanged.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--z", type=int, default=15)
    ap.add_argument("--px", type=int, default=16)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    pre_existing = SparkSession.getActiveSession()
    spark = (SparkSession.builder.appName("tdei-build-atlas")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from tdei_backend_service_spark.io.tile_store import write_tile_layout
    from tdei_backend_service_spark.operators.geo_visual import (
        brightness_raster, tile_gallery)
    from tdei_backend_service_spark.operators.raster import rasterize
    from tdei_backend_service_spark.operators.tiling import tile_top_terms

    from pyspark.sql import functions as F

    from tdei_backend_service_spark.operators.geo_visual import (
        brightness_pixel_sums, pixels_from_sums)
    from tdei_backend_service_spark.operators.raster import (
        encode_tiles, pixel_counts)
    from tdei_backend_service_spark.operators.tiling import (
        tile_term_counts, top_terms_from_counts)

    imgs = spark.read.parquet(args.images)
    # raster layers render at z - log2(px) so their pixel lattice is
    # the zoom-z grid the gallery/terms layers key on
    import math
    zr = args.z - int(math.log2(args.px))
    # alongside each rendered layer, persist its MERGEABLE narrow
    # relation (pixel counts / brightness sums / term counts) — the
    # state refresh_atlas_job merges a drop into without re-reading
    # corpus blobs
    layers = {
        "density_pix": lambda: pixel_counts(imgs, zr, args.px),
        "density": lambda: rasterize(imgs, zr, args.px),
        "brightness_sums": lambda: brightness_pixel_sums(
            imgs, zr, args.px),
        "brightness": lambda: brightness_raster(imgs, zr, args.px),
        "gallery": lambda: tile_gallery(imgs, args.z, args.px),
        "term_counts": lambda: tile_term_counts(imgs, args.z)
        .withColumn("z", F.lit(args.z).cast("int")),
        "terms": lambda: tile_top_terms(imgs, args.z),
    }
    out = {}
    for name, build in layers.items():
        out[name] = write_tile_layout(build(), args.run_dir, stage=name)
    print(json.dumps(out))
    if pre_existing is None:  # owned session (spark-submit); else leave
        spark.stop()          # the caller's session running (pytest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
