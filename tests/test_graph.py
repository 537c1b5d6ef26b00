"""Graph traversal tier (operators/graph.py): differential tests vs
pure-python BFS/Bellman-Ford references on randomized graphs, plus the
directed/undirected dedup-strategy split and input validation."""

import random
from collections import deque

import pytest
from pyspark.sql import functions as F

from tdei_backend_service_spark.exceptions import InputException
from tdei_backend_service_spark.operators.graph import (
    hop_distance, network_distance)


def _edges_df(spark, edges, weights=None):
    rows = [{"orig_node_id": a, "dest_node_id": b,
             "w": (weights or {}).get((a, b), 1)} for a, b in edges]
    return spark.createDataFrame(rows)


def _seeds_df(spark, seeds):
    return spark.createDataFrame([{"node": s} for s in seeds])


def _py_bfs(edges, seeds, max_hops, directed):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        if dist[u] == max_hops:
            continue
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def _py_bf(edges, weights, seeds, rounds, directed):
    sym = list(edges) + ([] if directed else [(b, a) for a, b in edges])
    w = {}
    for a, b in edges:
        w[(a, b)] = weights.get((a, b), 1)
        if not directed:
            w[(b, a)] = weights.get((a, b), 1)
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for a, b in sym:
            if a in dist and dist[a] + w[(a, b)] < nxt.get(b, float("inf")):
                nxt[b] = dist[a] + w[(a, b)]
        if nxt == dist:
            break
        dist = nxt
    return dist


def _rand_graph(rng, n_nodes, n_edges):
    return list({(rng.randrange(n_nodes), rng.randrange(n_nodes))
                 for _ in range(n_edges)})


@pytest.mark.parametrize("directed", [False, True])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_hop_distance_differential(spark, directed, seed):
    rng = random.Random(seed)
    edges = _rand_graph(rng, 60, 90)
    seeds = sorted(rng.sample(range(60), 3))
    for max_hops in (0, 2, 7):
        got = {r["node"]: r["hops"]
               for r in hop_distance(_edges_df(spark, edges),
                                     _seeds_df(spark, seeds), max_hops,
                                     directed=directed).collect()}
        assert got == _py_bfs(edges, seeds, max_hops, directed)


def test_hop_distance_directed_back_edge(spark):
    """A directed back edge pointing far up the layer stack must NOT
    re-admit an old node (the full-visited path), while the same graph
    undirected takes the two-layer shortcut and still agrees."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0)]
    for directed in (False, True):
        got = {r["node"]: r["hops"]
               for r in hop_distance(_edges_df(spark, edges),
                                     _seeds_df(spark, [0]), 10,
                                     directed=directed).collect()}
        assert got == _py_bfs(edges, [0], 10, directed)


def test_hop_distance_early_exit_and_multigraph(spark):
    """Frontier drains before max_hops; duplicate/parallel edges and
    duplicate seeds collapse."""
    edges = [(0, 1), (0, 1), (1, 0), (1, 2)]
    got = {r["node"]: r["hops"]
           for r in hop_distance(_edges_df(spark, edges),
                                 _seeds_df(spark, [0, 0]), 50).collect()}
    assert got == {0: 0, 1: 1, 2: 2}


@pytest.mark.parametrize("directed", [False, True])
@pytest.mark.parametrize("seed", [4, 5])
def test_network_distance_differential(spark, directed, seed):
    rng = random.Random(seed)
    edges = _rand_graph(rng, 40, 70)
    weights = {e: rng.randrange(1, 500) for e in edges}
    seeds = sorted(rng.sample(range(40), 2))
    for rounds in (0, 3, 12):
        got = {r["node"]: r["dist"]
               for r in network_distance(
                   _edges_df(spark, edges, weights),
                   _seeds_df(spark, seeds), rounds,
                   directed=directed).collect()}
        assert got == _py_bf(edges, weights, seeds, rounds, directed)


def test_network_distance_shortcut_wins(spark):
    """Chain 0-1-2-3-4-5 at 100 m/step plus a 150 m shortcut 0->5."""
    edges = [(k, k + 1) for k in range(5)] + [(0, 5)]
    weights = {e: 100 for e in edges[:-1]}
    weights[(0, 5)] = 150
    got = {r["node"]: r["dist"]
           for r in network_distance(_edges_df(spark, edges, weights),
                                     _seeds_df(spark, [0]), 20).collect()}
    assert got == {0: 0, 1: 100, 2: 200, 3: 300, 4: 250, 5: 150}


def test_graph_input_validation(spark):
    e, s = _edges_df(spark, [(0, 1)]), _seeds_df(spark, [0])
    with pytest.raises(InputException):
        hop_distance(e, s, -1)
    with pytest.raises(InputException):
        network_distance(e, s, "5")


# --- triangle_count / pagerank ---------------------------------------

from tdei_backend_service_spark.operators.graph import (  # noqa: E402
    PR_SCALE, pagerank, triangle_count)


def _py_triangles(edges):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w > v:
                    for x in (u, v, w):
                        counts[x] = counts.get(x, 0) + 1
    return counts


def _py_pagerank(edges, n_iter, num=17, den=20):
    de = {(a, b) for a, b in edges}
    nodes = sorted({a for a, _ in de} | {b for _, b in de})
    od = {}
    for a, _ in de:
        od[a] = od.get(a, 0) + 1
    base = ((den - num) * PR_SCALE) // den
    r = {n: PR_SCALE for n in nodes}
    for _ in range(n_iter):
        s = {n: 0 for n in nodes}
        for a, b in de:
            s[b] += r[a] // od[a]
        r = {n: base + (num * s[n]) // den for n in nodes}
    return r


def test_triangle_count_differential(spark):
    rng = random.Random(71)
    for trial in range(3):
        n = 40
        edges = [(rng.randrange(n), rng.randrange(n))
                 for _ in range(120)]
        got = {r["node"]: r["triangles"]
               for r in triangle_count(_edges_df(spark, edges)).collect()}
        assert got == _py_triangles(edges)


def test_triangle_count_canonicalization(spark):
    # duplicates, both directions, and a self-loop collapse to one
    # triangle (1,2,3); node 4 hangs off an open wedge
    edges = [(1, 2), (2, 1), (2, 3), (1, 3), (1, 3), (3, 3), (3, 4),
             (2, 4)]
    got = {r["node"]: r["triangles"]
           for r in triangle_count(_edges_df(spark, edges)).collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_triangle_count_none(spark):
    got = triangle_count(_edges_df(spark, [(1, 2), (2, 3), (3, 4)]))
    assert got.collect() == []


def test_pagerank_differential(spark):
    rng = random.Random(72)
    edges = [(rng.randrange(25), rng.randrange(25)) for _ in range(60)]
    got = {r["node"]: r["pr"]
           for r in pagerank(_edges_df(spark, edges), n_iter=4).collect()}
    assert got == _py_pagerank(edges, 4)


def test_pagerank_zero_iters_and_sink(spark):
    # n_iter=0 returns the uniform start; a pure sink (no out-edges)
    # keeps collecting mass while the dangling loss shrinks the total
    edges = [(1, 3), (2, 3)]
    r0 = {r["node"]: r["pr"]
          for r in pagerank(_edges_df(spark, edges), n_iter=0).collect()}
    assert r0 == {1: PR_SCALE, 2: PR_SCALE, 3: PR_SCALE}
    r2 = {r["node"]: r["pr"]
          for r in pagerank(_edges_df(spark, edges), n_iter=2).collect()}
    assert r2 == _py_pagerank(edges, 2)
    assert r2[3] > r2[1] == r2[2]


def test_pagerank_validation(spark):
    df = _edges_df(spark, [(1, 2)])
    with pytest.raises(InputException):
        pagerank(df, n_iter=-1)
    with pytest.raises(InputException):
        pagerank(df, n_iter=1, damping_num=21, damping_den=20)


def test_pagerank_null_endpoint_drops(spark):
    # a dangling NULL endpoint must not mint a NULL node or inflate
    # its partner's out-degree (same hygiene as triangle_count's canon)
    clean = [(1, 3), (2, 3)]
    rows = [{"orig_node_id": a, "dest_node_id": b} for a, b in clean]
    rows.append({"orig_node_id": 1, "dest_node_id": None})
    df = spark.createDataFrame(
        rows, "orig_node_id long, dest_node_id long")
    got = {r["node"]: r["pr"]
           for r in pagerank(df, n_iter=2).collect()}
    assert got == _py_pagerank(clean, 2)


from tdei_backend_service_spark.operators.graph import (  # noqa: E402
    kcore, neighbor_jaccard)


def _py_kcore(edges, k):
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in [n for n, nb in adj.items() if len(nb) < k]:
            for m in adj.pop(n):
                adj[m].discard(n)
            changed = True
    return set(adj)


def test_kcore_differential_and_path_between_cycles(spark):
    rng = random.Random(73)
    for trial in range(3):
        edges = [(rng.randrange(30), rng.randrange(30))
                 for _ in range(55)]
        for kk in (2, 3):
            got = {r["node"]
                   for r in kcore(_edges_df(spark, edges), k=kk).collect()}
            assert got == _py_kcore(edges, kk)
    # two triangles joined by a path: the path SURVIVES the 2-core
    # (interior degree 2, anchored both ends); the pendant leaf peels
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6), (6, 7),
             (5, 7), (7, 8)]
    got = {r["node"] for r in kcore(_edges_df(spark, edges), 2).collect()}
    assert got == {1, 2, 3, 4, 5, 6, 7}
    with pytest.raises(InputException):
        kcore(_edges_df(spark, edges), 0)


def test_neighbor_jaccard_differential(spark):
    from collections import Counter
    rng = random.Random(74)
    edges = list({(min(a, b), max(a, b))
                  for a, b in ((rng.randrange(20), rng.randrange(20))
                               for _ in range(45)) if a != b})
    got = [(r["u"], r["v"], r["common"], r["jaccard_scaled"])
           for r in neighbor_jaccard(_edges_df(spark, edges),
                                     k=100).collect()]
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = []
    nodes = sorted(adj)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v in adj[u]:
                continue
            c = len(adj[u] & adj[v])
            if c >= 1:
                want.append((u, v, c,
                             (c * 1_000_000)
                             // (len(adj[u]) + len(adj[v]) - c)))
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == want[:100]
    # hub cap: middles above max_degree generate no pairs
    star = [(0, i) for i in range(1, 8)] + [(1, 2)]
    capped = neighbor_jaccard(_edges_df(spark, star), k=100,
                              max_degree=3).collect()
    full = neighbor_jaccard(_edges_df(spark, star), k=100).collect()
    assert len(capped) < len(full)
    with pytest.raises(InputException):
        neighbor_jaccard(_edges_df(spark, star), min_common=0)


def test_symmetrize_null_endpoint_hygiene(spark):
    """ADVICE r5: a NULL dest must not mint a NULL node in BFS output
    (left_anti equi-joins never match NULL keys, so a NULL node could
    be re-emitted at several hop levels, breaking one-row-per-node)."""
    rows = [{"orig_node_id": 1, "dest_node_id": 2, "w": 1},
            {"orig_node_id": 2, "dest_node_id": 3, "w": 1},
            {"orig_node_id": 2, "dest_node_id": None, "w": 1},
            {"orig_node_id": None, "dest_node_id": 3, "w": 1}]
    df = spark.createDataFrame(
        rows, "orig_node_id long, dest_node_id long, w long")
    out = hop_distance(df, _seeds_df(spark, [1]), max_hops=4).collect()
    got = {r["node"]: r["hops"] for r in out}
    assert len(out) == len(got), "duplicate node rows"
    assert None not in got
    assert got == {1: 0, 2: 1, 3: 2}
    nd = network_distance(df, _seeds_df(spark, [1]), max_rounds=4).collect()
    ndm = {r["node"]: r["dist"] for r in nd}
    assert None not in ndm and ndm == {1: 0, 2: 1, 3: 2}


def test_pagerank_int64_envelope_guard(spark):
    """ADVICE r5: a funnel graph (600k leaves -> one hub, out-degree 1
    each) drives the hub's damped in-sum past 2^63 at PR_SCALE=1e12;
    the guard must refuse up front instead of silently wrapping."""
    edges = spark.range(600_000).select(
        (F.col("id") + 1).alias("orig_node_id"),
        F.lit(0).alias("dest_node_id"))
    with pytest.raises(InputException, match="int64 envelope"):
        pagerank(edges, n_iter=1)


def test_connected_components_planted_and_dirty(spark):
    """Planted multi-chain components (three chains + a cycle + an
    isolated edge) with dirty rows mixed in: duplicates, reversed
    duplicates, self-loops, and NULL endpoints. Every node labels with
    its component's minimum id; NULL rows and self-loop-only noise
    change nothing."""
    from tdei_backend_service_spark.operators.graph import (
        connected_components)
    chains = [(1, 2), (2, 3), (3, 4),          # component min 1
              (10, 11), (11, 12),              # component min 10
              (20, 21), (21, 22), (22, 20),    # cycle, min 20
              (30, 31)]                        # min 30
    dirty = [(2, 1), (3, 4), (12, 12),         # reversed dup, dup, self-loop
              (None, 7), (7, None)]            # NULL endpoints drop
    rows = [{"orig_node_id": a, "dest_node_id": b} for a, b in chains + dirty]
    df = spark.createDataFrame(
        rows, "orig_node_id long, dest_node_id long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    want = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
            20: 20, 21: 20, 22: 20, 30: 30, 31: 30}
    assert got == want
    assert None not in got


def test_connected_components_random_differential(spark):
    """Random sparse graph vs a pure-python union-find reference."""
    from tdei_backend_service_spark.operators.graph import (
        connected_components)
    rng = random.Random(11)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(220)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {v for e in edges for v in e}
    # canonical min-id per component over touched nodes only
    members: dict = {}
    for v in touched:
        members.setdefault(find(v), []).append(v)
    want = {v: min(ms) for r, ms in members.items() for v in ms}
    df = spark.createDataFrame(
        [{"orig_node_id": a, "dest_node_id": b} for a, b in edges],
        "orig_node_id long, dest_node_id long")
    got = {r["node"]: r["component"]
           for r in connected_components(df).collect()}
    assert got == want
