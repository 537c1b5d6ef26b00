#!/usr/bin/env python
"""Scale probe for the embedding dedup tier: 1M-vector corpus, 100k
drop, closed-form survivor count verified EXACTLY.

Vectors are seeded per-id (xxhash64-seeded numpy in an Arrow UDF), so
both sides can plant byte-identical copies without shipping data:
  * j % 4 in (0, 1): copy of corpus vector v(j % N)   -> loses
  * j % 4 == 2:      fresh vector v(N + j)            -> survives
  * j % 4 == 3:      copy of the j-1 fresh vector     -> loses in-batch
Expected batch survivors = count of j % 4 == 2 rows. Exact copies
share every hyperplane band bucket byte-for-byte, so LSH recall is
certain; fresh 64-dim seeded vectors pairwise concentrate near cos 0
(P(cos >= 0.98) is astronomically small), so no false merges.

Also times embedding_dedup over corpus+drop together — the full
re-dedup the incremental path avoids.

Usage: embedding_scale_probe.py [N] [B] [dim] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd  # module-level: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
B = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
DIM = int(sys.argv[3]) if len(sys.argv) > 3 else 64
CPUS = int(sys.argv[4]) if len(sys.argv) > 4 else 32


def main() -> None:
    from pyspark.sql import functions as F, types as T

    from tdei_backend_service_spark.pipeline.dedup import (
        embedding_dedup, incremental_embedding_dedup)
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("embprobe", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    dim = DIM

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def _vec(seed_ids: pd.Series) -> pd.Series:
        out = []
        for s in seed_ids:
            rng = np.random.default_rng(int(s))
            out.append([float(x) for x in
                        rng.standard_normal(dim).astype(np.float32)])
        return pd.Series(out)

    corpus = (spark.range(0, N, 1, CPUS * 2)
              .select(_vec(F.col("id")).alias("embedding")))
    j = F.col("id") - N
    seed = F.when(j % 4 < 2, j % N) \
            .when(j % 4 == 2, N + j) \
            .otherwise(N + j - 1)
    batch = (spark.range(N, N + B, 1, CPUS * 2)
             .select(F.col("id").alias("vec_id"),
                     _vec(seed).alias("embedding"))
             .persist())
    batch.count()
    expected = sum(1 for x in range(B) if x % 4 == 2)

    t0 = time.time()
    got = incremental_embedding_dedup(batch, corpus,
                                      threshold=0.98).count()
    inc_s = round(time.time() - t0, 2)
    assert got == expected, (got, expected)

    full = (corpus.withColumn("vec_id", F.monotonically_increasing_id())
            .select("vec_id", "embedding")
            .unionByName(batch.select(
                (F.col("vec_id") + 10_000_000_000).alias("vec_id"),
                "embedding")))
    t0 = time.time()
    embedding_dedup(full, threshold=0.98).count()
    full_s = round(time.time() - t0, 2)

    print(json.dumps({
        "n_corpus": N, "n_batch": B, "dim": dim, "cpus": CPUS,
        "survivors": got, "expected": expected,
        "incremental_s": inc_s, "full_rededup_s": full_s,
        "batch_vecs_per_sec": round(B / inc_s, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
