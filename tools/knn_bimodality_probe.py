#!/usr/bin/env python
"""Diagnose the knn_tag stage's bimodal local[8] wall times seen in the
round-4/5 scaling matrices (26-27 s family vs 40-42 s outliers with
byte-identical code and input).

Runs the EXACT scaling-job knn stage (dataset_tag_road over the same
synth table, noop sink) ``reps`` times inside ONE session and prints
each rep's wall plus the steal/user shares measured over that rep's
window (tools/steal_monitor.py must be logging to the given jsonl).

Interpretation:
  * bimodal across reps WITHIN one session, slow reps coinciding with
    high steal windows  -> host co-tenancy (stolen cycles), code clean;
  * bimodal across reps with FLAT steal                 -> in-process
    cause (GC, worker churn) — investigate;
  * uniform reps here but bimodal across separate launches -> per-launch
    cause (JIT warmup, page cache).

Usage: knn_bimodality_probe.py <cpus> [n_images] [reps] [steal_jsonl]
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
N_IMAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 16_000_000
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 6
STEAL_LOG = sys.argv[4] if len(sys.argv) > 4 else "BENCH/steal_r5.jsonl"


def _steal_window(t0: float, t1: float) -> dict:
    try:
        rows = [json.loads(l) for l in open(STEAL_LOG)]
    except OSError:
        return {}
    win = [r for r in rows if t0 <= r["t"] <= t1]
    if not win:
        return {}
    return {"steal_mean": round(sum(r["steal"] for r in win) / len(win), 2),
            "steal_max": max(r["steal"] for r in win),
            "user_mean": round(sum(r["user"] for r in win) / len(win), 2)}


def main() -> None:
    import shutil
    import tempfile

    from tdei_backend_service_spark.core import ingest
    from tdei_backend_service_spark.datagen import (synth_edges_df,
                                                    synth_images_df)
    from tdei_backend_service_spark.operators.tag_road import dataset_tag_road
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("knnprobe", cpus=CPUS, shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="knnprobe_tbl_")
    raw = synth_images_df(spark, N_IMAGES, with_bytes=False,
                          parallelism=CPUS * 3)
    ingest.encode_cells(raw).write.mode("overwrite").parquet(tmp)
    images = spark.read.parquet(tmp)
    edges = synth_edges_df(spark, 10_000)

    walls = []
    for rep in range(REPS):
        t0 = time.time()
        dataset_tag_road(images, "ds-a", edges, "ds-a", cutoff_m=50.0) \
            .write.format("noop").mode("overwrite").save()
        t1 = time.time()
        rec = {"rep": rep, "wall_s": round(t1 - t0, 2),
               **_steal_window(t0, t1)}
        walls.append(rec)
        print(json.dumps(rec), flush=True)

    ws = sorted(r["wall_s"] for r in walls)
    print(json.dumps({"cpus": CPUS, "n_images": N_IMAGES,
                      "min": ws[0], "median": ws[len(ws) // 2],
                      "max": ws[-1]}))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
