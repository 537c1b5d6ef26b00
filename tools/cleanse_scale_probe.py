#!/usr/bin/env python
"""Scale probe for the cleansing tier (pipeline/cleanse.py), planted
for CLOSED-FORM expected outputs so exactness is asserted, not sampled:

* line dedup — N docs x 6 lines: 5 globally-unique lines per doc plus,
  on even ids, one of 10 boilerplate lines (id % 10). Each boilerplate
  line lands in ~N/20 docs >> max_doc_freq, every unique line in 1, so
  expected removals = count(even ids) exactly and every cleaned doc
  keeps exactly its 5 unique lines.
* decontamination — eval set of 1000 docs each holding the trigram
  'shared token <k>'; train docs on the id % 17 == 0 residue embed
  'shared token <id % 1000>' between otherwise id-unique words. The
  contaminated set is exactly that residue, each with n_hits == 1.

Usage: cleanse_scale_probe.py [N] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
N_EVAL = 1000
MAX_DOC_FREQ = 1000


def main() -> None:
    from pyspark.sql import functions as F

    from tdei_backend_service_spark.pipeline.cleanse import (
        contamination_hits, decontaminate, dedup_lines)
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("cleanseprobe", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # --- line dedup -------------------------------------------------------
    uid = F.col("id")
    uniq = [F.format_string(f"u%d line body {j}", uid) for j in range(5)]
    boiler = F.format_string("boilerplate banner %d repeated text",
                             uid % 10)
    lines = F.concat(
        F.array(*uniq),
        F.when(uid % 2 == 0, F.array(boiler))
         .otherwise(F.array().cast("array<string>")))
    docs = (spark.range(0, N, 1, CPUS * 2)
            .select(uid.alias("doc_id"),
                    F.array_join(lines, "\n").alias("text"))
            .persist())
    docs.count()

    t0 = time.time()
    out = dedup_lines(docs, max_doc_freq=MAX_DOC_FREQ)
    agg = out.agg(F.count(F.lit(1)).alias("docs"),
                  F.sum("n_lines_kept").alias("kept"),
                  F.sum("n_lines_removed").alias("removed")).collect()[0]
    line_s = round(time.time() - t0, 2)
    n_even = (N + 1) // 2  # ids 0..N-1, evens
    assert agg["docs"] == N, agg
    assert agg["kept"] == 5 * N, agg
    assert agg["removed"] == n_even, (agg, n_even)

    # --- decontamination --------------------------------------------------
    ev = (spark.range(0, N_EVAL, 1, 8)
          .select(F.col("id").alias("doc_id"),
                  F.format_string(
                      "evalhead%d shared token %d evaltail%d",
                      F.col("id"), F.col("id"), F.col("id")).alias("text")))
    contaminated = F.col("id") % 17 == 0
    train_text = F.when(
        contaminated,
        F.format_string("w%da w%db shared token %d w%dc",
                        uid, uid, uid % N_EVAL, uid)) \
        .otherwise(F.format_string("w%da w%db w%dc w%dd w%de",
                                   uid, uid, uid, uid, uid))
    train = (spark.range(0, N, 1, CPUS * 2)
             .select(uid.alias("doc_id"), train_text.alias("text"))
             .persist())
    train.count()
    n_contam = (N + 16) // 17  # ids 0, 17, 34, ...

    t0 = time.time()
    hits = contamination_hits(train, ev, n=3)
    h = hits.agg(F.count(F.lit(1)).alias("docs"),
                 F.sum("n_hits").alias("hits")).collect()[0]
    survivors = decontaminate(train, ev, n=3, min_hits=1).count()
    decon_s = round(time.time() - t0, 2)
    assert h["docs"] == n_contam, (h, n_contam)
    assert h["hits"] == n_contam, h
    assert survivors == N - n_contam, (survivors, N, n_contam)

    print(json.dumps({
        "n_docs": N, "cpus": CPUS,
        "line_dedup": {"s": line_s, "docs_per_sec": round(N / line_s, 1),
                       "lines_removed": int(agg["removed"])},
        "decontam": {"s": decon_s, "docs_per_sec": round(N / decon_s, 1),
                     "contaminated": int(n_contam)},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
