"""The r7 scale-adaptive graph fast paths: the single-task numpy
implementations must match the distributed iterative rounds exactly on
random multigraphs (duplicates, self-loops, disconnected nodes, both
directions), and the row probe must route small graphs local."""

import random

import pytest

import tdei_backend_service_spark.operators.graph as G


def _canon(df):
    return sorted(map(tuple, df.toPandas().itertuples(index=False)))


def _rand_graph(spark, rng, weighted=True):
    n = rng.randint(3, 120)
    m = rng.randint(1, 300)
    rows = [(rng.randint(0, n), rng.randint(0, n), rng.randint(1, 50))
            for _ in range(m)]
    e = spark.createDataFrame(rows, "orig_node_id long, dest_node_id long, w long")
    seeds = spark.createDataFrame(
        [(rng.randint(0, n),) for _ in range(rng.randint(1, 4))], "node long")
    return e, seeds


@pytest.mark.parametrize("directed", [False, True])
def test_hop_and_network_distance_local_matches(spark, monkeypatch, directed):
    rng = random.Random(21)
    for _ in range(2):
        e, seeds = _rand_graph(spark, rng)
        hops = rng.randint(0, 10)
        for func in (G.hop_distance, G.network_distance):
            monkeypatch.setattr(G, "_GRAPH_LOCAL_MAX_EDGES", 10**9)
            a = _canon(func(e, seeds, hops, directed=directed))
            monkeypatch.setattr(G, "_GRAPH_LOCAL_MAX_EDGES", -1)
            b = _canon(func(e, seeds, hops, directed=directed))
            assert a == b, func.__name__


def test_kcore_local_matches(spark, monkeypatch):
    rng = random.Random(22)
    e, _ = _rand_graph(spark, rng)
    for k in (1, 2, 3):
        monkeypatch.setattr(G, "_GRAPH_LOCAL_MAX_EDGES", 10**9)
        a = _canon(G.kcore(e, k=k))
        monkeypatch.setattr(G, "_GRAPH_LOCAL_MAX_EDGES", -1)
        b = _canon(G.kcore(e, k=k))
        assert a == b


def test_pagerank_local_matches(spark, monkeypatch):
    rng = random.Random(23)
    for n_iter in (0, 3, 5):
        e, _ = _rand_graph(spark, rng)
        monkeypatch.setattr(G, "_GRAPH_LOCAL_MAX_EDGES", 10**9)
        a = _canon(G.pagerank(e, n_iter=n_iter))
        monkeypatch.setattr(G, "_GRAPH_LOCAL_MAX_EDGES", -1)
        b = _canon(G.pagerank(e, n_iter=n_iter))
        assert a == b
