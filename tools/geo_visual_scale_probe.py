#!/usr/bin/env python
"""Geo-visual dedup scale probe: decode N planted images and run the
co-located+visual min-winner rule — 100x+ the contract-query scale —
verifying the EXACT closed-form survivor set.

Plant: id k sits at site k DIV 10 (a 1000-wide lon/lat grid, sites
>= ~75 m apart, radius 5 m) with pixel class k % 7 (planted ahash
values, min cross-class hamming 17 > budget 8). Within a decade of
consecutive ids, k loses iff k-7 shares its decade, i.e. k % 10 >= 7 —
so survivors are EXACTLY the ids with k % 10 < 7 (0.7*N), and
candidate generation stays linear: 10 records per cell, never a dense
hot cell. (Dense-cell behavior is the hash tier's star-cap territory;
this operator's cell join inherits union_dataset's density regime.)

Usage: python tools/geo_visual_scale_probe.py [n_images] [cpus]
       (default 1000000 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F, types as T

    from tdei_backend_service_spark.codecs.image import encode_image
    from tdei_backend_service_spark.fixtures_tpch import phash_class_value
    from tdei_backend_service_spark.operators.geo_visual import \
        geo_visual_dedup
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("geo-visual-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    @F.pandas_udf(T.BinaryType())
    def _img(key: pd.Series) -> pd.Series:
        import numpy as np
        cache: dict = {}
        out = []
        for k in key:
            k = int(k)
            ck = (k % 7, k % 3, k % 2)
            blob = cache.get(ck)
            if blob is None:
                v = phash_class_value(k % 7)
                s = 1 + k % 3
                cell = np.array([[(v >> (63 - (8 * i + j))) & 1
                                  for j in range(8)] for i in range(8)],
                                dtype=np.uint8)
                img = np.repeat(np.repeat(np.where(cell == 1, 200, 40),
                                          s, 0), s, 1).astype(np.uint8)
                blob = encode_image(img, "png" if k % 2 == 0 else "qimg")
                cache[ck] = blob
            out.append(blob)
        return pd.Series(out)

    site = F.col("image_id") / 10
    imgs = (spark.range(n)
            .select(F.col("id").alias("image_id"))
            .withColumn("bytes", _img.asNondeterministic()(F.col("image_id")))
            .withColumn("fmt", F.when(F.col("image_id") % 2 == 0,
                                      F.lit("png")).otherwise(F.lit("qimg")))
            .withColumn("lon", F.lit(-122.8)
                        + (site.cast("long") % 1000) / F.lit(1000.0))
            .withColumn("lat", F.lit(47.0)
                        + (site.cast("long") / 1000).cast("long")
                        / F.lit(1000.0)))

    t0 = time.time()
    surv = geo_visual_dedup(imgs, radius_m=5.0, max_hamming=8)
    row = surv.agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.when(F.col("image_id") % 10 >= 7, 1)
                         .otherwise(0)).alias("bad")).collect()[0]
    wall = time.time() - t0

    expect = sum(1 for r in range(10) if r < 7) * (n // 10) \
        + sum(1 for r in range(n % 10) if r < 7)
    ok = int(row["n"]) == expect and int(row["bad"]) == 0
    print(json.dumps({
        "n_images": n, "cpus": cpus, "wall_s": round(wall, 1),
        "img_per_s": round(n / wall),
        "survivors": int(row["n"]), "expected": expect,
        "false_keeps_mod": int(row["bad"]), "exact": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
