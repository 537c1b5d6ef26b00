#!/usr/bin/env python
"""Code-independent host scaling calibration.

The pre-registered scaling matrices (BENCH/BASELINE.md) measure the
ENGINE's local[2] -> local[8] efficiency. This tool measures what the
HOST itself gives for three canonical kernels that bracket the engine's
stage mix, with no engine code involved:

  * jvm_compute   — sha2 hashing over spark.range: pure whole-stage
                    codegen compute, no Python, no shuffle, no I/O.
                    Upper bound for CPU-bound stages (payload_codec).
  * arrow_numpy   — an Arrow-batched pandas UDF running a vectorized
                    numpy kernel per batch: the execution profile of the
                    engine's probe/refine stages (knn_tag, spatial_join).
  * shuffle_agg   — two-level hash aggregation over 64-bit keys: one
                    full exchange, the profile of groupBy-heavy stages.

Each kernel runs in its own Spark session per (cpus) trial so sessions
never share a JVM. Interleave trials l2,l8,l2,l8,... and pool — single
pairs on this host spread +/-20% with identical code (BENCH/BASELINE.md
round-4 notes). Usage:

    python tools/host_ceiling_calibration.py <cpus> [scale]

Prints one JSON line {cpus, scale, secs: {kernel: s}}. The driving
shell script (or operator) runs it at 2 and 8 and computes pooled
per-kernel efficiency = (t2 / t8) / 4.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd  # module-level: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SCALE = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0


def main() -> None:
    from pyspark.sql import functions as F, types as T

    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("ceiling", cpus=CPUS, shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")

    # spin up Python workers once so arrow_numpy measures throughput
    @F.pandas_udf(T.LongType())
    def _warm(x: pd.Series) -> pd.Series:
        return x
    spark.range(0, CPUS * 4, 1, CPUS * 4).select(_warm(F.col("id"))).count()

    secs: dict[str, float] = {}

    # --- jvm_compute: sha2 chain, embarrassingly parallel, codegen ----
    n = int(6_000_000 * SCALE)
    t0 = time.time()
    (spark.range(0, n, 1, CPUS * 3)
     .select(F.sha2(F.concat(F.col("id").cast("string"),
                             F.sha2(F.col("id").cast("string"), 256)), 256)
             .alias("h"))
     .select(F.sum(F.length("h")).alias("s"))
     .collect())
    secs["jvm_compute"] = round(time.time() - t0, 2)

    # --- arrow_numpy: vectorized numpy per Arrow batch ----------------
    @F.pandas_udf(T.DoubleType())
    def _kernel(x: pd.Series) -> pd.Series:
        v = x.to_numpy(np.float64)
        # bandwidth + flops mix comparable to the probe/refine kernels:
        # transcendental per element plus a sort-based pass
        a = np.sin(v) * np.cos(v * 0.5) + np.sqrt(np.abs(v) + 1.0)
        order = np.argsort(a, kind="stable")
        return pd.Series(a[order][np.argsort(order, kind="stable")])

    n = int(12_000_000 * SCALE)
    t0 = time.time()
    (spark.range(0, n, 1, CPUS * 3)
     .select(F.sum(_kernel(F.col("id").cast("double"))).alias("s"))
     .collect())
    secs["arrow_numpy"] = round(time.time() - t0, 2)

    # --- shuffle_agg: full exchange + two-level hash agg --------------
    n = int(30_000_000 * SCALE)
    t0 = time.time()
    (spark.range(0, n, 1, CPUS * 3)
     .select((F.xxhash64("id") % 1_000_000).alias("k"),
             F.col("id").alias("v"))
     .groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("c"))
     .select(F.sum("s").alias("ss"), F.sum("c").alias("cc"))
     .collect())
    secs["shuffle_agg"] = round(time.time() - t0, 2)

    print(json.dumps({"cpus": CPUS, "scale": SCALE, "secs": secs}))
    spark.stop()


if __name__ == "__main__":
    main()
