#!/usr/bin/env python
"""Scale probe for the line-line relate path (ST_Crosses through
spatial_join), planted for a CLOSED-FORM expected count:

N horizontal 0.01-deg segments on a 1e-6-deg lattice vs a 100-edge
vertical lattice (0.01-deg spacing). Segment i starts at
u_i = (i*40503 + 11) % 1e6 lon-units, v_i = (i*69621 + 5) % 5e5
lat-units; after excluding the touch-risk residues (u % 1e4 == 0,
v == 0 — same rationale as the edge_cross_count contract row) each
surviving segment crosses EXACTLY one vertical edge iff u < 99*1e4.
The expected total is pure integer counting replayed in numpy; the
probe asserts the spatial_join sum matches it EXACTLY.

Usage: crossing_scale_probe.py [N] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32
LON0, LAT0 = -122.85, 47.10


def main() -> None:
    import pandas as pd
    from pyspark.sql import functions as F, types as T

    from tdei_backend_service_spark.core import geom
    from tdei_backend_service_spark.core.schema import EDGES_SCHEMA
    from tdei_backend_service_spark.operators.spatial_join import spatial_join
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("crossprobe", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    # expected count, exact integer replay
    i = np.arange(N, dtype=np.int64)
    u = (i * 40503 + 11) % 1_000_000
    v = (i * 69621 + 5) % 500_000
    keep = (u % 10_000 != 0) & (v != 0)
    expected = int(((u < 990_000) & keep).sum())
    n_kept = int(keep.sum())

    # target: horizontal segments, distributed build (mapInPandas WKB)
    base = (spark.range(N)
            .withColumn("u", (F.col("id") * 40503 + 11) % 1_000_000)
            .withColumn("v", (F.col("id") * 69621 + 5) % 500_000)
            .filter((F.col("u") % 10_000 != 0) & (F.col("v") != 0)))

    out_schema = T.StructType([
        T.StructField("edge_id", T.LongType()),
        T.StructField("orig_node_id", T.LongType()),
        T.StructField("dest_node_id", T.LongType()),
        T.StructField("geometry", T.BinaryType()),
        T.StructField("props", T.MapType(T.StringType(), T.StringType())),
        T.StructField("dataset_id", T.StringType()),
    ])

    def _wkb(batches):
        for pdf in batches:
            lo = LON0 + pdf["u"].to_numpy(np.float64) / 1e6
            la = LAT0 + pdf["v"].to_numpy(np.float64) / 1e6
            yield pd.DataFrame({
                "edge_id": pdf["id"],
                "orig_node_id": pdf["id"] * 2,
                "dest_node_id": pdf["id"] * 2 + 1,
                "geometry": [geom.wkb_linestring([(a, b), (a + 0.01, b)])
                             for a, b in zip(lo, la)],
                "props": [{} for _ in range(len(pdf))],
                "dataset_id": "probe-h",
            })

    targets = base.mapInPandas(_wkb, out_schema)

    vrows = [{"edge_id": k, "orig_node_id": 2 * k, "dest_node_id": 2 * k + 1,
              "geometry": geom.wkb_linestring([(LON0 + k * 0.01, LAT0),
                                               (LON0 + k * 0.01, LAT0 + 0.5)]),
              "props": {}, "dataset_id": "probe-v"}
             for k in range(100)]
    source = spark.createDataFrame(pd.DataFrame(vrows), schema=EDGES_SCHEMA)

    t0 = time.time()
    out = spatial_join(targets, "edge", "probe-h", source, "line", "probe-v",
                       "ST_Crosses(geometry_target, geometry_source)",
                       ["count(*) as n"])
    total = (out.select(F.col("props").getItem("ext:n").cast("long")
                        .alias("n"))
             .agg(F.sum("n")).collect()[0][0])
    wall = time.time() - t0

    assert total == expected, (total, expected)
    print(json.dumps({"n_segments": n_kept, "n_vertical": 100,
                      "crossings": int(total), "expected": expected,
                      "exact": True, "wall_s": round(wall, 2),
                      "segs_per_sec": round(n_kept / wall),
                      "cpus": CPUS}))
    spark.stop()


if __name__ == "__main__":
    main()
