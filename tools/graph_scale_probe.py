#!/usr/bin/env python
"""Scale probe for the graph traversal tier (operators/graph.py):
multi-source BFS over a W x H 4-neighbor grid graph — millions of
nodes, tens of frontier rounds — verified FULL-FRAME against the
closed form. Seeds sit on an S-spaced lattice, so the true hop count
of node (x, y) is cx + cy where

    ex = x % S;  cx = min(ex, S - ex) if the right-hand seed exists
                 (x - ex + S <= W - 1) else ex        (same for y)

— Manhattan distance to the nearest seed, separable because the seed
set is a product lattice. The probe asserts the BFS result matches
that expression on EVERY node (count + zero mismatches), then runs a
hop-bounded Bellman-Ford with unit weights over the same grid, which
must equal hops exactly (dist == hops for w == 1) — cross-checking the
two traversal kernels against each other at scale.

Usage: python tools/graph_scale_probe.py [W] [H] [S] [cpus]
       (default 2048 2048 16 16)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    s = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 16

    from pyspark.sql import functions as F

    from tdei_backend_service_spark.operators.graph import (
        hop_distance, network_distance)
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("graph-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    nodes = spark.range(w * h).select(
        (F.col("id") % w).alias("x"), (F.col("id") / w).cast("long").alias("y"),
        F.col("id").alias("node"))
    right = (nodes.filter(F.col("x") < w - 1)
             .select(F.col("node").alias("orig_node_id"),
                     (F.col("node") + 1).alias("dest_node_id")))
    down = (nodes.filter(F.col("y") < h - 1)
            .select(F.col("node").alias("orig_node_id"),
                    (F.col("node") + w).alias("dest_node_id")))
    edges = right.unionByName(down).withColumn("w", F.lit(1).cast("long"))
    seeds = (nodes.filter((F.col("x") % s == 0) & (F.col("y") % s == 0))
             .select("node"))
    n_nodes, n_edges = w * h, edges.count()
    n_seeds = seeds.count()
    max_hops = 2 * s  # true max is (s-1)+(s-1) on border blocks

    t0 = time.time()
    bfs = hop_distance(edges, seeds, max_hops).localCheckpoint()
    n_out = bfs.count()
    t_bfs = time.time() - t0

    def axis(col, extent):
        e = F.col(col) % s
        has_right = (F.col(col) - e + s) <= (extent - 1)
        return F.when(has_right, F.least(e, s - e)).otherwise(e)

    expect = nodes.select("node", (axis("x", w) + axis("y", h))
                          .cast("int").alias("want"))
    joined = bfs.join(expect, "node", "full")
    bad = joined.filter(F.col("hops").isNull() | F.col("want").isNull()
                        | (F.col("hops") != F.col("want"))).count()

    t1 = time.time()
    bf = network_distance(edges, seeds, max_hops).localCheckpoint()
    t_bf = time.time() - t1
    bf_bad = (bf.join(bfs, "node", "full")
              .filter(F.col("dist").isNull() | F.col("hops").isNull()
                      | (F.col("dist") != F.col("hops"))).count())

    out = {
        "probe": "graph_scale", "w": w, "h": h, "seed_spacing": s,
        "n_nodes": n_nodes, "n_edges": int(n_edges),
        "n_seeds": int(n_seeds), "bfs_rows": int(n_out),
        "bfs_mismatches": int(bad), "bfs_wall_s": round(t_bfs, 1),
        "bfs_nodes_per_sec": int(n_out / t_bfs),
        "bellman_ford_wall_s": round(t_bf, 1),
        "bellman_ford_mismatches": int(bf_bad),
        "exact": bad == 0 and bf_bad == 0 and n_out == n_nodes,
    }
    print(json.dumps(out))
    spark.stop()
    return 0 if out["exact"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
