#!/usr/bin/env python
"""Cluster-dedup scale probe: hash_cluster_dedup (connected components
over the banded-hamming pair graph) over N planted 3-chains — the
chain_hashes construction scaled past the contract fixture — asserting
the EXACT survivor set and reporting end-to-end throughput.

Construction: class code = parity-extended 15-bit xxhash64 mix of the
chain id, replicated into all four 16-bit bands; members j=0,1,2 at
base ^ {0, 0b111, 0b111111}. Codes DO collide across 3*10^5 classes
(15-bit space); colliding classes share their base hash exactly, so
their chains merge into one component — the expected survivor set
(min image_id per code) accounts for that, and the probe asserts SET
equality, not just counts.

The probe answers the 100 TB question for the cluster tier: the pair
graph is built once (band explode + JVM bit_count verify, only narrow
verified pairs cross an exchange), and the pointer-jumped propagation
converges in O(log diameter) rounds — diameter is tiny for real drift
chains, so rounds stay small no matter how many chains exist.

Usage: python tools/cluster_scale_probe.py [n_chains] [cpus]
       (default 300000 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n_chains = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    from tdei_backend_service_spark.pipeline.dedup import hash_cluster_dedup
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("cluster-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    k = F.col("id")
    c15 = F.pmod(F.xxhash64(k, F.lit(17)), F.lit(1 << 15))
    code = F.shiftleft(c15, 1).bitwiseOR(F.bit_count(c15) % 2)
    base = (code.bitwiseOR(F.shiftleft(code, 16))
            .bitwiseOR(F.shiftleft(code, 32))
            .bitwiseOR(F.shiftleft(code, 48)))
    seed = spark.range(0, n_chains, 1, cpus)
    members = None
    for mask, off in ((0, 0), (0b111, 2), (0b111111, 1)):
        m = seed.select((k * 3 + off).alias("image_id"),
                        base.bitwiseXOR(F.lit(mask)).alias("phash"),
                        c15.alias("_code"))
        members = m if members is None else members.unionByName(m)
    members = members.persist()
    members.count()  # synth off the clock; the probe times the operator

    expected = (members.groupBy("_code")
                .agg(F.min("image_id").alias("image_id")))

    # arm 1 — default BUCKET_CAP: at this collision density a handful
    # of (band, bucket) groups exceed the cap, and the star pattern
    # routes connectivity through the anchor, so hamming-6 members of a
    # capped code can only reconnect lane-wise -> a few EXTRA survivors
    # (false keeps). The cap must never DROP a true survivor (the
    # component minimum is always its own label): missing must be 0.
    t0 = time.time()
    out = hash_cluster_dedup(members.select("image_id", "phash"),
                             "phash", "image_id").select("image_id")
    n_out = out.count()
    wall = time.time() - t0
    missing = expected.join(out, "image_id", "left_anti").count()
    false_keeps = out.join(expected, "image_id", "left_anti").count()

    # arm 2 — cap raised past the densest bucket: the pair graph is
    # complete, so the survivor SET must be exact.
    t0 = time.time()
    out2 = hash_cluster_dedup(members.select("image_id", "phash"),
                              "phash", "image_id",
                              bucket_cap=4096).select("image_id")
    n_out2 = out2.count()
    wall2 = time.time() - t0
    missing2 = expected.join(out2, "image_id", "left_anti").count()
    extra2 = out2.join(expected, "image_id", "left_anti").count()

    ok = missing == 0 and missing2 == 0 and extra2 == 0
    print(json.dumps({
        "n_chains": n_chains, "n_rows": 3 * n_chains,
        "default_cap": {"survivors": n_out, "missing": missing,
                        "false_keeps": false_keeps,
                        "wall_sec": round(wall, 2),
                        "rows_per_sec": round(3 * n_chains / wall)},
        "raised_cap": {"survivors": n_out2, "missing": missing2,
                       "extra": extra2, "exact": extra2 == 0,
                       "wall_sec": round(wall2, 2),
                       "rows_per_sec": round(3 * n_chains / wall2)},
        "ok": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
