#!/usr/bin/env python
"""One scaling-run trial: the headline spatial pipeline at a given
parallelism. Usage: scaling_job.py <cpus> [n_images] [n_edges]

Pipeline (all stages materialized):
  synth n_images geotagged records (30% in one dense cell -> skew)
  -> cell/tile encode -> tile stats
  -> two-phase spatial join vs an n_edges street grid (count per edge)
  -> kNN nearest-edge tagging (cutoff 50 m)
Prints one JSON line {cpus, n_images, wall_s, rows_per_sec, stages:{...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type hints resolve here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_IMAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
N_EDGES = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000


def main() -> None:
    from pyspark.sql import functions as F

    from tdei_backend_service_spark.core import ingest
    from tdei_backend_service_spark.datagen import (synth_edges_df,
                                                    synth_images_df)
    from tdei_backend_service_spark.operators.spatial_join import spatial_join
    from tdei_backend_service_spark.operators.tag_road import dataset_tag_road
    from tdei_backend_service_spark.operators.tiling import tile_stats
    from tdei_backend_service_spark.session import get_spark

    import shutil
    import tempfile

    spark = get_spark("scaling", cpus=CPUS, shuffle_partitions=CPUS * 2)
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: spin up the Python UDF workers once so stage timings measure
    # throughput, not interpreter startup (excluded from the metric)
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def _warm(x: pd.Series) -> pd.Series:
        return x
    spark.range(0, CPUS * 4, 1, CPUS * 4).select(_warm(F.col("id"))).count()

    stages: dict[str, float] = {}

    # ingest once: synth + cell/tile encode -> parquet table (the
    # "write-time enrichment" story); query stages then scan the table
    tmp = tempfile.mkdtemp(prefix="scaling_tbl_")
    t0 = time.time()
    raw = synth_images_df(spark, N_IMAGES, with_bytes=False,
                          parallelism=CPUS * 3)
    ingest.encode_cells(raw).write.mode("overwrite").parquet(tmp)
    stages["ingest_encode_write"] = round(time.time() - t0, 2)
    images = spark.read.parquet(tmp)

    edges = synth_edges_df(spark, N_EDGES)

    t0 = time.time()
    tile_stats(images).write.format("noop").mode("overwrite").save()
    stages["tile_stats"] = round(time.time() - t0, 2)

    t0 = time.time()
    spatial_join(edges, "edge", "ds-a", images, "point", "ds-a",
                 "ST_DWithin(geometry_target, geometry_source, 50)",
                 ["count(*) as n"]) \
        .write.format("noop").mode("overwrite").save()
    stages["spatial_join"] = round(time.time() - t0, 2)

    t0 = time.time()
    dataset_tag_road(images, "ds-a", edges, "ds-a", cutoff_m=50.0) \
        .write.format("noop").mode("overwrite").save()
    stages["knn_tag"] = round(time.time() - t0, 2)

    # image-payload stage: encode real bytes + decode/verify invariants —
    # the compute profile of the actual 10^12-image workload
    n_payload = max(N_IMAGES // 20, 10_000)
    t0 = time.time()
    from tdei_backend_service_spark.pipeline.multimodal import \
        verify_payload_invariants
    with_bytes = synth_images_df(spark, n_payload, with_bytes=True,
                                 img_px=16, parallelism=CPUS * 3)
    verify_payload_invariants(with_bytes) \
        .write.format("noop").mode("overwrite").save()
    stages["payload_codec"] = round(time.time() - t0, 2)

    wall = sum(stages.values())
    print(json.dumps({
        "cpus": CPUS, "n_images": N_IMAGES, "n_edges": N_EDGES,
        "wall_s": round(wall, 2), "stages": stages,
        "rows_per_sec": round(N_IMAGES * 4 / wall, 1),  # 4 passes over the table
    }))
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
