"""Iterative graph traversal over road-network edge relations.

The reference service publishes walkway/road datasets whose edge
records carry ``orig_node_id``/``dest_node_id`` (src/models, the OSW
edge schema) but delegates every network question to out-of-repo
consumers; a transportation-data engine at 100 TB needs the traversal
primitives in-engine:

* ``hop_distance`` — multi-source breadth-first hop counts: the
  "reachable within K hops" service-area query (which stops can reach
  a clinic within K pedestrian links, coverage of a new curb ramp).
* ``network_distance`` — hop-bounded shortest path length over an
  integer edge-weight column (meters): synchronous Bellman-Ford
  rounds, ``dist(u)`` after round r = min over walks of <= r edges.

Scale shape (the part that matters at 10^12 edges): both are
O(rounds) Spark jobs with ``localCheckpoint`` lineage cuts per round —
the same discipline as union_dataset._cc_labels, without which the
logical plan grows geometrically and the driver dies analyzing round
~8. BFS keeps per-round state FRONTIER-LOCAL: for undirected graphs a
layer-h node's neighbors sit in layers h-2..h, so the dedup anti-join
needs only the last TWO layers — the full visited set is never
re-materialized, making round cost O(frontier + neighbors), not O(V).
Directed graphs fall back to the accumulated-visited anti-join (a back
edge may point arbitrarily far up the layer stack). Bellman-Ford
carries the full (node, dist) relation per round by construction —
that IS the algorithm's state — but each round is ONE equi-join +
ONE partial-aggregated min exchange, nothing quadratic.

Both converge early: a round that discovers nothing (BFS) or improves
nothing (Bellman-Ford) terminates the loop, so ``max_hops`` /
``max_rounds`` is a bound, not a cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..exceptions import InputException

__all__ = ["hop_distance", "network_distance"]


def _symmetrize(edges: DataFrame, src: str, dst: str,
                directed: bool, extra: list[str] | None = None) -> DataFrame:
    cols = extra or []
    fwd = edges.select(F.col(src).cast("long").alias("_s"),
                       F.col(dst).cast("long").alias("_d"), *cols)
    if directed:
        return fwd
    return fwd.unionByName(
        edges.select(F.col(dst).cast("long").alias("_s"),
                     F.col(src).cast("long").alias("_d"), *cols))


def hop_distance(edges: DataFrame, seeds: DataFrame, max_hops: int,
                 src: str = "orig_node_id", dst: str = "dest_node_id",
                 node: str = "node",
                 directed: bool = False) -> DataFrame:
    """Multi-source BFS: (node, hops) for every node reachable from
    ``seeds`` in at most ``max_hops`` edge traversals, hops = the
    MINIMUM traversal count (seeds themselves at hops 0; a node
    reachable from several seeds reports the nearest).

    ``seeds`` is any frame carrying ``node``; duplicates are fine.
    Multigraph edges are deduplicated once up front (one distinct
    exchange bounded by O(E)) so no round pays for parallel edges.
    """
    if not isinstance(max_hops, int) or max_hops < 0:
        raise InputException("max_hops must be a non-negative integer")
    sym = (_symmetrize(edges, src, dst, directed)
           .distinct().localCheckpoint())
    layer0 = (seeds.select(F.col(node).cast("long").alias("_n"))
              .distinct().localCheckpoint())
    layers = [layer0.select(F.col("_n"), F.lit(0).alias("hops"))]
    frontier, prev = layer0, None
    visited = layer0 if directed else None
    for h in range(1, max_hops + 1):
        nbrs = (frontier.join(sym, frontier["_n"] == sym["_s"])
                .select(F.col("_d").alias("_n")).distinct())
        if directed:
            nxt = nbrs.join(visited, "_n", "left_anti")
        else:
            # undirected: dist(neighbor of layer h-1) >= h-2, so the
            # last two layers are the only possible repeats
            nxt = nbrs.join(frontier, "_n", "left_anti")
            if prev is not None:
                nxt = nxt.join(prev, "_n", "left_anti")
        nxt = nxt.localCheckpoint()
        if nxt.isEmpty():
            break
        layers.append(nxt.select(F.col("_n"), F.lit(h).alias("hops")))
        if directed:
            visited = visited.unionByName(nxt).localCheckpoint()
        prev, frontier = frontier, nxt
    out = layers[0]
    for more in layers[1:]:
        out = out.unionByName(more)
    return out.select(F.col("_n").alias(node), F.col("hops").cast("int"))


def network_distance(edges: DataFrame, seeds: DataFrame, max_rounds: int,
                     src: str = "orig_node_id", dst: str = "dest_node_id",
                     weight: str = "w", node: str = "node",
                     directed: bool = False) -> DataFrame:
    """Hop-bounded shortest network distance: (node, dist) where dist
    is the exact integer sum of ``weight`` along the best walk of at
    most ``max_rounds`` edges from any seed (seeds at 0). Synchronous
    Bellman-Ford: round r relaxes every edge out of the current
    relation, so after round r the relation holds min over walks of
    <= r edges — for non-negative weights and ``max_rounds`` >= the
    hop count of the true shortest path this IS the shortest distance,
    and the loop exits as soon as a round improves nothing.

    Weights cast to long and sum exactly (no float accumulation), so
    the result hash-matches any engine replaying the same rule.
    """
    if not isinstance(max_rounds, int) or max_rounds < 0:
        raise InputException("max_rounds must be a non-negative integer")
    sym = (_symmetrize(edges, src, dst, directed,
                       extra=[F.col(weight).cast("long").alias("_w")])
           .localCheckpoint())
    dist = (seeds.select(F.col(node).cast("long").alias("_n"))
            .distinct()
            .select("_n", F.lit(0).cast("long").alias("_dist"))
            .localCheckpoint())
    for _ in range(max_rounds):
        relaxed = (dist.join(sym, dist["_n"] == sym["_s"])
                   .select(F.col("_d").alias("_n"),
                           (F.col("_dist") + F.col("_w")).alias("_dist")))
        new = (dist.unionByName(relaxed)
               .groupBy("_n").agg(F.min("_dist").alias("_dist"))
               .localCheckpoint())
        improved = (new.join(dist.withColumnRenamed("_dist", "_old"),
                             "_n", "left")
                    .filter(F.col("_old").isNull()
                            | (F.col("_dist") < F.col("_old"))).count())
        dist = new
        if improved == 0:
            break
    return dist.select(F.col("_n").alias(node), F.col("_dist").alias("dist"))
