#!/usr/bin/env python
"""Scale probe for geospatial incremental ingest
(incremental_union_dataset): committed corpus of N geotagged records
on a 5 m grid (distinct phash per record — a union survivor set), new
drop of B records planted for a closed-form survivor count:

  j = id - N:
  * j % 4 in (0, 1): 0.2 m from corpus record (j % N), SAME
    phash/caption                         -> loses to the corpus
  * j % 4 == 2:      0.2 m from corpus (j % N), fresh phash N+j
                                          -> survives (payload differs)
  * j % 4 == 3:      0.4 m from corpus (j-1 % N), phash N+j-1 — the
    j-1 row's twin 0.2 m away             -> loses WITHIN the batch

Expected survivors = count of j % 4 == 2. Grid spacing 5 m keeps
distinct corpus records out of proximity range, and distinct phash
makes cross-record merges impossible regardless of position.

Also times the full union_dataset(corpus, drop) re-union for
contrast. Usage: union_scale_probe.py [N] [B] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
CPUS = int(sys.argv[3]) if len(sys.argv) > 3 else 32
K = 1000          # grid columns
SPACING_M = 5.0


def main() -> None:
    from pyspark.sql import functions as F

    from tdei_backend_service_spark.core import geom
    from tdei_backend_service_spark.operators.union_dataset import (
        incremental_union_dataset, union_dataset)
    from tdei_backend_service_spark.session import get_spark

    from pyspark.sql import types as T

    spark = get_spark("unionprobe", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # spin up the Python UDF workers once so the timed sections measure
    # the operators, not interpreter startup (same as tools/scaling_job)
    @F.pandas_udf(T.LongType())
    def _warm(x: pd.Series) -> pd.Series:
        return x
    spark.range(0, CPUS * 4, 1, CPUS * 4).select(_warm(F.col("id"))).count()

    deg_lat = 1.0 / geom.M_PER_DEG_LAT
    deg_lon = SPACING_M / geom.M_PER_DEG_LON_EQ

    def grid(src_id):
        return ((src_id % K) * F.lit(deg_lon),
                (src_id - src_id % K) / K * F.lit(SPACING_M * deg_lat))

    lon0, lat0 = grid(F.col("id"))
    corpus = (spark.range(0, N, 1, CPUS * 2)
              .select(lon0.alias("lon"), lat0.alias("lat"),
                      F.col("id").alias("phash"),
                      F.lit("c").alias("caption")))

    j = F.col("id") - N
    src = F.when(j % 4 == 3, (j - 1) % N).otherwise(j % N)
    offset_m = F.when(j % 4 == 3, F.lit(0.4)).otherwise(F.lit(0.2))
    phash = F.when(j % 4 < 2, src) \
             .when(j % 4 == 2, F.col("id")) \
             .otherwise(F.col("id") - 1)
    blon, blat = grid(src)
    batch = (spark.range(N, N + B, 1, CPUS * 2)
             .select(F.col("id").alias("image_id"),
                     blon.alias("lon"),
                     (blat + offset_m * F.lit(deg_lat)).alias("lat"),
                     phash.alias("phash"), F.lit("c").alias("caption"))
             .persist())
    batch.count()
    expected = sum(1 for x in range(B) if x % 4 == 2)

    t0 = time.time()
    got = incremental_union_dataset(batch, corpus).count()
    inc_s = round(time.time() - t0, 2)
    assert got == expected, (got, expected)

    a = corpus.withColumn("image_id", F.monotonically_increasing_id()) \
              .withColumn("dataset_id", F.lit("ds-A"))
    b = batch.withColumn("dataset_id", F.lit("ds-B"))
    t0 = time.time()
    union_dataset(a, "ds-A", b, "ds-B").count()
    full_s = round(time.time() - t0, 2)

    print(json.dumps({
        "n_corpus": N, "n_batch": B, "cpus": CPUS,
        "survivors": got, "expected": expected,
        "incremental_s": inc_s, "full_reunion_s": full_s,
        "batch_rows_per_sec": round(B / inc_s, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
