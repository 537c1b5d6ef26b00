#!/usr/bin/env python
"""spark-submit entry point — the production job runner.

Usage:
    zip -r /tmp/pkg.zip tdei_backend_service_spark
    spark-submit --master <cluster> --py-files /tmp/pkg.zip \
        tools/submit_job.py --job job.json --data-dir <parquet tables> \
        --out <output dir>

``job.json`` is the reference's queue-message format (README.md:66-79):
{"messageId": ..., "data": {"service": ..., "parameters": {...}}}.
DataFrame-producing services export per-layer GeoJSON, zip the outputs,
and write the response message (README.md:81-95 format) — the full
§3.1 lifecycle, minus the queue transport.

The SparkSession takes the master from spark-submit (no override), so
the same script runs on local[N] or a real cluster unchanged.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_session():
    from pyspark.sql import SparkSession
    return (SparkSession.builder.appName("tdei-spark-job")
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
            .getOrCreate())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--job", required=True, help="job-spec JSON file")
    ap.add_argument("--data-dir", required=True,
                    help="directory with images/edges/zones parquet")
    ap.add_argument("--out", required=True, help="output directory")
    args = ap.parse_args(argv)

    with open(args.job) as f:
        message = json.load(f)

    spark = build_session()
    from pyspark.sql import DataFrame

    from tdei_backend_service_spark.backend_service import Catalog, dispatch
    from tdei_backend_service_spark.io.geojson import extract_dataset
    from tdei_backend_service_spark.io.package import response_message

    def _try_read(name):
        try:
            return spark.read.parquet(f"{args.data_dir}/{name}")
        except Exception:
            return None

    catalog = Catalog(images=_try_read("images"),
                      edges=_try_read("edges"),
                      zones=_try_read("zones"),
                      dataset_info=_try_read("dataset_info"),
                      extension_files=_try_read("extension_files"),
                      extensions=_try_read("extensions"))
    message_id = message.get("messageId", "job")
    service = message.get("data", message).get("service", "unknown")
    try:
        result = dispatch(catalog, message)
        params = message.get("data", message).get("parameters", {})
        ds = (params.get("tdei_dataset_id")
              or params.get("target_dataset_id")
              or params.get("tdei_dataset_id_one"))
        if isinstance(result, dict):          # per-layer DataFrames
            # table names -> the reference's singular layer names
            # (file naming osw.<layer>s.geojson, osw-backend-abstract.ts:120)
            layer_names = {"images": "node", "edges": "edge", "zones": "zone"}
            extract_dataset({layer_names.get(k, k): v for k, v in result.items()},
                            ds, args.out,
                            layer_metadata=catalog.layer_metadata(ds),
                            extensions=catalog.extension_layers(ds))
        elif isinstance(result, DataFrame):   # single result table
            # table-producing jobs (tag_road, union) land as a manifest-
            # tracked partitioned parquet stage first: per-partition
            # lineage + rows/bytes metrics, idempotent resume (re-running
            # the same job over the same out dir skips committed
            # partitions — the north_rule checkpoint requirement)
            from tdei_backend_service_spark.core.manifest import (Manifest,
                                                                  read_stage)
            if "dataset_id" in result.columns:
                man = Manifest(f"{args.out}/_run")
                stage = man.run_stage(service, result, keys=["dataset_id"])
                print(json.dumps({"stage": service, **{k: v for k, v in
                                  stage.items() if k != "out_dir"}}),
                      file=sys.stderr)
                # export FROM the committed stage files — the expensive
                # pipeline runs once end-to-end, and the export matches
                # the manifest's lineage byte-for-byte (ADVICE r1)
                cols = result.columns
                result = read_stage(spark, f"{args.out}/_run", service) \
                    .select(*cols)
            # single-table results are already dataset-scoped (tag_road)
            # or intentionally multi-dataset (union) — export unfiltered
            from tdei_backend_service_spark.io.geojson import export_geojson
            export_geojson(result.drop(*[c for c in ("nearest_dist_m",)
                                         if c in result.columns]),
                           args.out, "result")
        # else: export services already wrote files themselves
        resp = response_message(message_id, service, args.out, success=True)
    except Exception as e:  # typed, user-facing failure message
        from tdei_backend_service_spark.exceptions import classify_spark_error
        resp = response_message(message_id, service, args.out,
                                success=False, error=str(classify_spark_error(e)))
    print(json.dumps(resp))
    spark.stop()
    return 0 if resp["data"]["success"] else 1


if __name__ == "__main__":
    sys.exit(main())
