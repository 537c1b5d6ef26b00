#!/usr/bin/env python
"""Raster-analytics scale probe: focal smoothing, layer algebra, zonal
stats, and areal burn-in at 100x+ contract scale, with EXACT invariants
(no tolerances):

1. focal_sum(radius=1): every input pixel lands in exactly 9 windows,
   so sum(focal) == 9 * sum(raw) — checked exactly;
2. combine_pixel_counts('add') over a parity split of the corpus is
   set-identical to the single-pass lattice of the whole corpus
   (both-direction anti-join counts are 0);
3. zonal_stats over a zone grid that tiles the occupied extent:
   sum of per-zone sums == total clipped mass, sum of per-zone pixel
   counts == nonzero-pixel count — both exact;
4. rasterize_zones: burned mass == closed-form sum of area * weight.

Usage: python tools/raster_analytics_probe.py [n_points] [cpus] [z]
       (default 20000000 32 13)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    z = int(sys.argv[3]) if len(sys.argv) > 3 else 13
    px = 16

    from pyspark.sql import functions as F

    from tdei_backend_service_spark.operators import raster
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("raster-analytics", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    base = (spark.range(n)
            .select("id",
                    (F.lit(-122.8) + F.pmod(F.col("id") * 2654435761,
                                            F.lit(1_500_000)) / 1e6)
                    .alias("lon"),
                    (F.lit(47.0) + F.pmod(F.col("id") * 40503 + 12345,
                                          F.lit(1_100_000)) / 1e6)
                    .alias("lat")))

    pix = raster.pixel_counts(base, z, px).persist()
    raw_mass, nnz = pix.agg(F.sum("n"), F.count(F.lit(1))).collect()[0]
    clipped_mass = pix.agg(
        F.sum(F.least(F.col("n"), F.lit(255)))).collect()[0][0]

    # 1. focal sum: 9x mass conservation
    t0 = time.time()
    focal = raster.focal_sum(pix, px, radius=1)
    focal_mass, focal_rows = focal.agg(F.sum("n"),
                                       F.count(F.lit(1))).collect()[0]
    focal_s = time.time() - t0
    ok_focal = int(focal_mass) == 9 * int(raw_mass)

    # 2. parity-split add == whole-corpus lattice (exact set equality)
    t0 = time.time()
    a = raster.pixel_counts(base.filter(F.col("id") % 2 == 0), z, px)
    b = raster.pixel_counts(base.filter(F.col("id") % 2 == 1), z, px)
    merged = raster.combine_pixel_counts(a, b, px, "add")
    key = ["z", "gx", "gy", "n"]
    extra = merged.select(key).exceptAll(pix.select(key)).count()
    missing = pix.select(key).exceptAll(merged.select(key)).count()
    combine_s = time.time() - t0
    ok_combine = extra == 0 and missing == 0

    # 3. zonal stats over a zone grid tiling the occupied extent
    bounds = pix.agg(F.min("gx"), F.max("gx"),
                     F.min("gy"), F.max("gy")).collect()[0]
    gx0, gx1, gy0, gy1 = (int(v) for v in bounds)
    zw, zh = 37, 23  # deliberately tile-misaligned zone shape
    import pandas as pd
    zrows = []
    zid = 0
    for zy in range(gy0, gy1 + 1, zh):
        for zx in range(gx0, gx1 + 1, zw):
            zrows.append({"zone_id": zid, "gx0": zx, "gy0": zy,
                          "gx1": zx + zw - 1, "gy1": zy + zh - 1})
            zid += 1
    zones = spark.createDataFrame(
        pd.DataFrame(zrows),
        schema="zone_id long, gx0 long, gy0 long, gx1 long, gy1 long")
    t0 = time.time()
    zs = raster.zonal_stats(
        pix.withColumn("v", F.least(F.col("n"), F.lit(255))), zones, px)
    ztot = zs.agg(F.sum("sum_v"), F.sum("n_px")).collect()[0]
    zonal_s = time.time() - t0
    ok_zonal = (int(ztot[0]) == int(clipped_mass)
                and int(ztot[1]) == int(nnz))

    # 4. burn-in mass == closed-form area * weight
    t0 = time.time()
    burn = raster.rasterize_zones(zones, z, px,
                                  weight=F.col("zone_id") % 7 + 1)
    bmass = burn.agg(F.sum("n")).collect()[0][0]
    burn_s = time.time() - t0
    expect_bmass = sum(zw * zh * (r["zone_id"] % 7 + 1) for r in zrows)
    ok_burn = int(bmass) == expect_bmass

    out = {
        "n_points": n, "z": z, "px": px, "cpus": cpus,
        "nnz_pixels": int(nnz), "zones": len(zrows),
        "focal_s": round(focal_s, 1),
        "focal_rows": int(focal_rows),
        "focal_pts_per_s": round(n / focal_s),
        "combine_s": round(combine_s, 1),
        "zonal_s": round(zonal_s, 1),
        "burn_s": round(burn_s, 1),
        "focal_exact": ok_focal, "combine_exact": ok_combine,
        "zonal_exact": ok_zonal, "burn_exact": ok_burn,
    }
    print(json.dumps(out))
    return 0 if (ok_focal and ok_combine and ok_zonal and ok_burn) else 1


if __name__ == "__main__":
    raise SystemExit(main())
