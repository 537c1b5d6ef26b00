#!/usr/bin/env python
"""spark-submit entry point for resumable drop admission.

Usage:
    zip -r /tmp/pkg.zip tdei_backend_service_spark
    spark-submit --master <cluster> --py-files /tmp/pkg.zip \
        tools/admit_drop_job.py --batch <parquet> --corpus <parquet> \
        --run-dir <dir> --drop-id <id> [--proximity 0.5]

``--corpus`` needs only the narrow (lon, lat, phash, caption) columns
(a projection of the committed dataset — pruned at the parquet scan).
Re-running the same invocation after a crash recomputes only
uncommitted shards; a completed drop is a no-op (prints
``{"skipped": true}``). The session takes its master from
spark-submit, so the same script runs on local[N] or a real cluster
unchanged.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", required=True)
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--drop-id", required=True)
    ap.add_argument("--proximity", type=float, default=None)
    ap.add_argument("--pk", default="image_id")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("tdei-admit-drop")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from tdei_backend_service_spark.pipeline.ingest_drop import admit_drop

    batch = spark.read.parquet(args.batch)
    corpus = spark.read.parquet(args.corpus)
    rec = admit_drop(batch, corpus, args.run_dir, args.drop_id,
                     proximity=args.proximity, pk=args.pk)
    print(json.dumps(rec))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
