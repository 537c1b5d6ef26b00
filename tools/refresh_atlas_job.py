#!/usr/bin/env python
"""spark-submit entry point for the incremental ATLAS refresh — a new
image+caption drop lands and every layer of a previously-built atlas
(tools/build_atlas_job.py) updates with work proportional to the DROP:

  density     — drop points merge into the stored pixel counts; only
                drop-touched tiles re-encode (incremental_raster_tiles)
  brightness  — drop blobs decode alone; (sum, count) totals merge by
                the monoid; touched tiles re-encode
  gallery     — min-id winners nest: only drop-won tiles re-thumbnail,
                from DROP blobs (corpus blobs are never re-read)
  terms       — drop captions tokenize alone; counts merge; the top-1
                window recomputes only over touched tiles

The refreshed atlas lands in a NEW run dir as an immutable version
(each layer + its mergeable relation through the manifest, so the
refresh itself is resumable and the new version can be refreshed
again). Merge == recompute for every layer (oracle-pinned by the
incremental_* contract rows).

Usage:
    zip -r /tmp/pkg.zip tdei_backend_service_spark
    spark-submit --master <cluster> --py-files /tmp/pkg.zip \
        tools/refresh_atlas_job.py --prev-run-dir <dir> \
        --drop <parquet> --run-dir <newdir> [--z 15] [--px 16]
"""

from __future__ import annotations

import argparse
import json
import math
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev-run-dir", required=True)
    ap.add_argument("--drop", required=True)
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--z", type=int, default=15)
    ap.add_argument("--px", type=int, default=16)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession, functions as F
    pre_existing = SparkSession.getActiveSession()
    spark = (SparkSession.builder.appName("tdei-refresh-atlas")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from tdei_backend_service_spark.core.manifest import read_stage
    from tdei_backend_service_spark.io.tile_store import write_tile_layout
    from tdei_backend_service_spark.operators.geo_visual import (
        brightness_pixel_sums, incremental_brightness_tiles,
        incremental_gallery, merge_brightness_sums)
    from tdei_backend_service_spark.operators.raster import (
        incremental_raster_tiles, merge_pixel_counts, pixel_counts)
    from tdei_backend_service_spark.operators.tiling import (
        incremental_tile_terms, merge_term_counts, tile_term_counts,
        tile_top_terms)

    drop = spark.read.parquet(args.drop)
    zr = args.z - int(math.log2(args.px))

    def load(stage, z_val):
        # partition keys round-trip as strings; restore the int z the
        # operators key on and drop the stripe column
        return (read_stage(spark, args.prev_run_dir, stage)
                .drop("xs").withColumn("z", F.lit(z_val).cast("int")))

    cpix = load("density_pix", zr)
    ctiles = load("density", zr)
    csums = load("brightness_sums", zr)
    cbtiles = load("brightness", zr)
    cgal = load("gallery", args.z)
    ccnt = load("term_counts", args.z).drop("z")
    ctop = load("terms", args.z)

    dpix = pixel_counts(drop, zr, args.px)
    dsums = brightness_pixel_sums(drop, zr, args.px)
    dcnt = tile_term_counts(drop, args.z)

    updated = {
        "density_pix": lambda: merge_pixel_counts(cpix, dpix, args.px),
        "density": lambda: incremental_raster_tiles(
            cpix, ctiles, drop, zr, args.px),
        "brightness_sums": lambda: merge_brightness_sums(
            csums, dsums, args.px),
        "brightness": lambda: incremental_brightness_tiles(
            csums, cbtiles, drop, zr, args.px),
        "gallery": lambda: incremental_gallery(
            drop, cgal, args.z, args.px),
        "term_counts": lambda: merge_term_counts(ccnt, dcnt)
        .withColumn("z", F.lit(args.z).cast("int")),
        "terms": lambda: incremental_tile_terms(
            drop, ccnt, ctop, args.z),
    }
    out = {}
    for name, build in updated.items():
        out[name] = write_tile_layout(build(), args.run_dir, stage=name)
    print(json.dumps(out))
    if pre_existing is None:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
