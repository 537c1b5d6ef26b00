#!/usr/bin/env python
"""Scale probe for the incremental ingest dedup family: a committed
corpus of N unique hashes vs a new drop of B records, planted so the
batch survivor count is closed-form, verified EXACTLY at
max_hamming=0 (64-bit hash collisions within the planted sets are
~1e-8 probable at N=10^6 — below one expected failure in 10^7 runs).

Drop composition (ids N..N+B-1, j = id - N):
  * j % 4 in (0, 1): exact copy of corpus hash h(j % N)  -> loses
  * j % 4 == 2:      fresh hash h(N + j)                 -> survives
  * j % 4 == 3:      copy of the drop's OWN j-1 row when j-1 % 4 == 2
                     (same fresh hash, larger id)        -> loses
                     within the batch
Expected survivors = ceil(B/4) (the j%4==2 rows).

Also times the same drop at max_hamming=3 (banded path, counts not
asserted — random-hash near-collisions are possible if vanishingly
rare) and, for contrast, a FULL re-dedup of corpus+drop together —
the cost incremental ingestion avoids.

Usage: incremental_scale_probe.py [N] [B] [cpus]
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


def main() -> None:
    from pyspark.sql import functions as F

    from tdei_backend_service_spark.pipeline.dedup import (
        hash_neardup, incremental_hash_neardup)
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("incprobe", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    h = lambda c: F.xxhash64(c.cast("string"))  # noqa: E731

    corpus = (spark.range(0, N, 1, CPUS * 2)
              .select(h(F.col("id")).alias("hash")))
    j = F.col("id") - N
    src = F.when(j % 4 < 2, j % N) \
           .when(j % 4 == 2, N + j) \
           .otherwise(N + j - 1)
    batch = (spark.range(N, N + B, 1, CPUS * 2)
             .select(F.col("id").alias("doc_id"), h(src).alias("hash")))
    batch = batch.persist()
    batch.count()

    expected = (B + 3) // 4
    t0 = time.time()
    got = incremental_hash_neardup(batch, corpus, "hash", "doc_id",
                                   max_hamming=0).count()
    exact_s = round(time.time() - t0, 2)
    assert got == expected, (got, expected)

    t0 = time.time()
    incremental_hash_neardup(batch, corpus, "hash", "doc_id",
                             max_hamming=3).count()
    banded_s = round(time.time() - t0, 2)

    # what incremental ingestion avoids: re-deduping history + drop
    full = corpus.withColumn("doc_id", F.monotonically_increasing_id()) \
                 .select("doc_id", "hash") \
                 .unionByName(batch.select(
                     (F.col("doc_id") + 10_000_000_000).alias("doc_id"),
                     "hash"))
    t0 = time.time()
    hash_neardup(full, "hash", "doc_id", max_hamming=3).count()
    full_s = round(time.time() - t0, 2)

    print(json.dumps({
        "n_corpus": N, "n_batch": B, "cpus": CPUS,
        "survivors": got, "expected": expected,
        "incremental_exact_s": exact_s,
        "incremental_banded_s": banded_s,
        "full_rededup_s": full_s,
        "batch_rows_per_sec": round(B / banded_s, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
