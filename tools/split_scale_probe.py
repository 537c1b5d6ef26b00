#!/usr/bin/env python
"""Scale probe for the split tier (pipeline/curation.geo_split +
split_leak_audit), planted for CLOSED-FORM expected outputs:

* geo_split — N synthetic geotagged records on a ~1 m lattice inside
  the fixture window, split 90/5/5 at depth 16 (xxhash64 and the
  scramble oracle path both timed). Asserted EXACTLY: the label
  partitions the input (counts sum to N), and the scramble label of
  every record equals the closed-form recomputation on a 100k sample
  pulled through the same lattice arithmetic. Throughput is the
  headline — the op is a pure narrow map, so rows/s should track the
  scan, not the operator.
* split_leak_audit — N-record corpus labeled by geo_split plus K
  planted duplicate pairs (same phash/caption, 0.22 m apart) whose
  second record is FORCED to the other split; expected leak count ==
  the planted pairs whose sides genuinely differ (exact, computed from
  the forced labels). The corpus itself is payload-unique so organic
  pairs cannot exist.

Usage: split_scale_probe.py [N] [K] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
SPLITS = {"train": 0.9, "val": 0.05, "test": 0.05}


def main() -> None:
    from pyspark.sql import functions as F

    from tdei_backend_service_spark.pipeline.curation import (
        geo_split, split_leak_audit)
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("splitprobe", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # ~1 m lattice over a 1 deg x 0.5 deg window (10^5 x 5*10^4 slots)
    base = (spark.range(N)
            .withColumn("lon", F.lit(-122.85) + (F.col("id") * 40503 + 11)
                        % 100000 / F.lit(100000.0))
            .withColumn("lat", F.lit(47.10) + (F.col("id") * 69621 + 5)
                        % 50000 / F.lit(100000.0)))

    out = {"n": N, "k": K, "cpus": CPUS, "secs": {}}

    for method in ("xxhash64", "scramble"):
        t0 = time.time()
        labeled = geo_split(base, SPLITS, depth=16, method=method)
        counts = {r["split"]: r["n"] for r in
                  labeled.groupBy("split").agg(F.count("*").alias("n"))
                  .collect()}
        dt = time.time() - t0
        assert sum(counts.values()) == N, counts
        assert set(counts) == set(SPLITS), counts
        out["secs"][f"geo_split_{method}"] = round(dt, 2)
        out[f"counts_{method}"] = counts
        out[f"rows_per_sec_{method}"] = round(N / dt)

    # exactness spot-check: recompute the scramble label in closed form
    # on a 100k id-prefix sample (same arithmetic, plain Python ints on
    # the exact doubles Spark produced)
    import numpy as np
    sample = (geo_split(base.filter(F.col("id") < 100_000), SPLITS,
                        depth=16, method="scramble")
              .select("id", "lon", "lat", "split").collect())
    size = 360.0 / (1 << 16)
    bad = 0
    for r in sample:
        unit = (int(np.floor((r["lon"] + 180.0) / size)) << 32) \
            + int(np.floor((r["lat"] + 90.0) / (size / 2.0)))
        bkt = ((unit % 999983 + 7) * 2654435761) % 1000000
        want = "train" if bkt < 900000 else ("val" if bkt < 950000
                                             else "test")
        bad += want != r["split"]
    assert bad == 0, f"{bad} scramble labels diverge from closed form"
    out["scramble_exact_sample"] = len(sample)

    # --- leak audit: payload-unique corpus + K planted cross-split dups
    corpus = (base.withColumn("image_id", F.col("id").cast("string"))
              .withColumn("phash", F.col("id"))
              .withColumn("caption", F.concat(F.lit("c"), F.col("id"))))
    labeled = geo_split(corpus, SPLITS, depth=16).persist()
    # duplicates of ids 0..K-1: same payload, +2e-6 lat (~0.22 m),
    # forced to the opposite split of their original
    dup_src = labeled.filter(F.col("id") < K)
    dups = (dup_src
            .withColumn("image_id", F.concat(F.lit("d"), F.col("id")))
            .withColumn("lat", F.col("lat") + F.lit(2e-6))
            .withColumn("split", F.when(F.col("split") == "train",
                                        F.lit("test"))
                        .otherwise(F.lit("train"))))
    audited = labeled.unionByName(dups)
    t0 = time.time()
    n_leaks = split_leak_audit(audited, proximity=0.5).count()
    dt = time.time() - t0
    out["secs"]["leak_audit"] = round(dt, 2)
    # every planted pair differs by construction -> exactly K leaks
    assert n_leaks == K, (n_leaks, K)
    out["leaks_found"] = n_leaks
    labeled.unpersist()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
