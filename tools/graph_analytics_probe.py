#!/usr/bin/env python
"""Scale probe for the graph ANALYTICS ops (operators/graph.py:
triangle_count, pagerank) — millions of nodes, verified FULL-FRAME.

* triangle_count runs the chain+wedge construction over 1..N (chain
  (k, k+1) for k % 100 != 0, wedge (k, k+2) for k % 3 == 0 OR
  k % 7 == 0 — two overlapping wedge families emitted as
  separate unions, so per-node participation spans 1..3 and k % 21
  bases emit genuine duplicate edges the collapse must absorb). A triangle sits at base k iff tri(k) := (k % 3 == 0 or
  k % 7 == 0) and k % 100 not in (0, 99) and k <= N-1,
  so node m's participation has the closed form
  tri(m) + tri(m-1) + tri(m-2) — evaluated as a pure Catalyst
  expression over spark.range and anti-joined against the operator
  output (zero mismatches required, plus the 3T corner-sum identity).

* pagerank runs 5 integer power iterations over the chain_graph law
  (chain (k, k+1) for k % 100 != 0, shortcut (k, k+5) for
  k % 25 == 2) and is compared node-for-node against a vectorized
  int64 numpy replica of the same DIV arithmetic (numpy floor-div ==
  Spark div on the always-positive ranks).

Usage: python tools/graph_analytics_probe.py [N] [cpus]
       (default 4000000 16)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import numpy as np
    from pyspark.sql import functions as F

    from tdei_backend_service_spark.operators.graph import (
        PR_SCALE, pagerank, triangle_count)
    from tdei_backend_service_spark.session import get_spark

    spark = get_spark("graph-analytics-scale", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    ks = spark.range(1, n + 1).select(F.col("id").alias("k"))

    # --- triangle_count ------------------------------------------------
    chain = (ks.filter(F.col("k") % 100 != 0)
             .select(F.col("k").alias("orig_node_id"),
                     (F.col("k") + 1).alias("dest_node_id")))
    wedge3 = (ks.filter(F.col("k") % 3 == 0)
              .select(F.col("k").alias("orig_node_id"),
                      (F.col("k") + 2).alias("dest_node_id")))
    wedge7 = (ks.filter(F.col("k") % 7 == 0)
              .select(F.col("k").alias("orig_node_id"),
                      (F.col("k") + 2).alias("dest_node_id")))
    # two SEPARATE unions: k % 21 bases emit the same wedge edge twice,
    # so the probe genuinely exercises duplicate collapse at scale
    tri_edges = chain.unionByName(wedge3).unionByName(wedge7)
    n_tri_edges = tri_edges.count()

    t0 = time.time()
    got = triangle_count(tri_edges).localCheckpoint()
    tri_rows = got.count()
    t_tri = time.time() - t0

    def tri(col):
        return F.when(((col % 3 == 0) | (col % 7 == 0)) & (col % 100 != 0)
                      & (col % 100 != 99) & (col >= 1) & (col <= n - 1),
                      F.lit(1)).otherwise(F.lit(0))

    m = F.col("id")
    expect = (spark.range(1, n + 3).select(
        m.alias("node"),
        (tri(m) + tri(m - 1) + tri(m - 2)).cast("long").alias("want"))
        .filter(F.col("want") > 0))
    mism = (got.join(expect, "node", "full")
            .filter(F.col("triangles").isNull() | F.col("want").isNull()
                    | (F.col("triangles") != F.col("want"))).count())
    total_tri = got.agg(F.sum("triangles")).first()[0] or 0
    want_tri = sum(1 for k in range(1, n)
                   if (k % 3 == 0 or k % 7 == 0)
                   and k % 100 not in (0, 99))

    # --- pagerank ------------------------------------------------------
    short = (ks.filter(F.col("k") % 25 == 2)
             .select(F.col("k").alias("orig_node_id"),
                     (F.col("k") + 5).alias("dest_node_id")))
    pr_edges = chain.unionByName(short)
    t1 = time.time()
    pr = pagerank(pr_edges, n_iter=5)
    pdf = pr.toPandas().sort_values("node").reset_index(drop=True)
    t_pr = time.time() - t1

    # numpy int64 replica over node ids 1..n+5 (dests can exceed n)
    top = n + 5
    k = np.arange(1, top + 1, dtype=np.int64)
    has_chain = (k % 100 != 0) & (k <= n)
    has_short = (k % 25 == 2) & (k <= n)
    od = has_chain.astype(np.int64) + has_short.astype(np.int64)
    in_graph = has_chain | has_short  # srcs
    # node set = srcs plus dests
    is_node = in_graph.copy()
    is_node[np.flatnonzero(has_chain) + 1] = True  # dest k+1 at index k
    is_node[np.flatnonzero(has_short) + 5] = True  # dest k+5 at index k+4
    base = (3 * PR_SCALE) // 20
    r = np.where(is_node, PR_SCALE, 0).astype(np.int64)
    for _ in range(5):
        contrib = np.zeros(top, dtype=np.int64)
        srcs = np.flatnonzero(od > 0)
        contrib[srcs] = r[srcs] // od[srcs]
        s = np.zeros(top, dtype=np.int64)
        ci = np.flatnonzero(has_chain)
        np.add.at(s, ci + 1, contrib[ci])
        si = np.flatnonzero(has_short)
        np.add.at(s, si + 5, contrib[si])
        r = np.where(is_node, base + (17 * s) // 20, 0).astype(np.int64)
    want_nodes = np.flatnonzero(is_node) + 1
    want_pr = r[is_node]
    pr_mism = int((len(pdf) != len(want_nodes))
                  or (pdf["node"].to_numpy() != want_nodes).sum()
                  + (pdf["pr"].to_numpy() != want_pr).sum())

    # --- kcore ---------------------------------------------------------
    # 2-core of the chain+shortcut law: closed form = nodes with
    # (m-1) % 100 in [1, 81] (corridor runs base+2 .. base+82; every
    # corridor is complete when n % 100 == 0). Peel rounds are bounded
    # by the 18-node tail cascade, not corpus size.
    from tdei_backend_service_spark.operators.graph import kcore
    t2 = time.time()
    core = kcore(pr_edges, k=2).localCheckpoint()
    core_rows = core.count()
    t_core = time.time() - t2
    expect_core = (spark.range(1, n + 2)
                   .filter(((F.col("id") - 1) % 100 >= 1)
                           & ((F.col("id") - 1) % 100 <= 81))
                   .select(F.col("id").alias("want")))
    core_mism = (core.join(expect_core, core["node"] == expect_core["want"],
                           "full")
                 .filter(F.col("node").isNull() | F.col("want").isNull())
                 .count())

    out = {
        "probe": "graph_analytics_scale", "n": n,
        "tri_edges": int(n_tri_edges), "tri_nodes": int(tri_rows),
        "tri_total": int(total_tri), "tri_total_want": 3 * want_tri,
        "tri_mismatches": int(mism), "tri_wall_s": round(t_tri, 1),
        "tri_edges_per_sec": int(n_tri_edges / t_tri),
        "pr_rows": len(pdf), "pr_mismatches": pr_mism,
        "pr_wall_s": round(t_pr, 1),
        "pr_node_iters_per_sec": int(5 * len(pdf) / t_pr),
        "kcore_rows": int(core_rows), "kcore_mismatches": int(core_mism),
        "kcore_wall_s": round(t_core, 1),
        "exact": mism == 0 and pr_mism == 0 and core_mism == 0
                 and int(total_tri) == 3 * want_tri,
    }
    print(json.dumps(out))
    spark.stop()
    return 0 if out["exact"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
