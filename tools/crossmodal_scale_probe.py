#!/usr/bin/env python
"""Cross-modal dedup scale probe: the full (image OR caption) path —
blob synth -> REAL png/qimg decode -> recomputed ahash64 banded-hamming
losers UNION exact caption-fingerprint losers -> one anti-join — over N
planted records, 10x+ the contract-query scale, with the two modalities
disagreeing on purpose (pixel classes k%127 vs caption classes k%89).

Closed form for contiguous keys 0..n-1: a key survives iff it is the
minimum of BOTH classes, i.e. k < min(127, 89) -> survivors = 0..88.

Usage: python tools/crossmodal_scale_probe.py [n_images] [cpus]
       (default 200000 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F, types as T

    from tdei_backend_service_spark.codecs.image import encode_image
    from tdei_backend_service_spark.fixtures_tpch import phash_class_value
    from tdei_backend_service_spark.pipeline.dedup import cross_modal_dedup
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("crossmodal-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

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
                img = np.repeat(np.repeat(np.where(cell == 1, 200, 40), s, 0),
                                s, 1).astype(np.uint8)
                img = np.stack([img] * 3, axis=-1)
                blob = encode_image(img, "png" if k % 2 == 0 else "qimg")
                cache[ck] = blob
            out.append(blob)
        return pd.Series(out)

    imgs = (spark.range(n)
            .select(F.col("id").alias("image_id"),
                    _img.asNondeterministic()(F.col("id")).alias("bytes"),
                    F.when(F.col("id") % 2 == 0, F.lit("png"))
                    .otherwise(F.lit("qimg")).alias("fmt"),
                    F.concat(F.lit("cap-"), (F.col("id") % 89).cast("string"))
                    .alias("caption")))

    t0 = time.time()
    survivors = cross_modal_dedup(imgs, "image_id", "caption", max_hamming=3)
    got = sorted(r.image_id for r in survivors.select("image_id").collect())
    wall = time.time() - t0

    want = sorted(range(min(89, n)))
    report = {
        "n_images": n, "survivors": len(got),
        "parity_ok": got == want,
        "wall_s": round(wall, 1),
        "images_per_sec": round(n / wall, 0),
        "cpus": cpus,
    }
    print(json.dumps(report))
    spark.stop()
    return 0 if report["parity_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
