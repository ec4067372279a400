"""AdjustedRandIndex + NeighborhoodUtility (round 4 parity fills) vs pure
Python oracles on karate.

Reference: networkit/cpp/linkprediction/AdjustedRandIndex.cpp:14-41 (whose
b/c terms are computed with std::set_union — b = c = |N(u)∪N(v)| — and we
reproduce that faithfully) and NeighborhoodUtility.cpp:12-31.
"""

import math
from collections import defaultdict

from networkit_spark.graph import GraphDF
from networkit_spark.operators.linkprediction import (
    adjusted_rand_link_index,
    neighborhood_utility,
    neighbors_of,
    two_hop_pairs,
)

from tests.fixtures import KARATE_EDGES, KARATE_N


def _adj(edges):
    adj = defaultdict(set)
    for u, v in edges:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    return adj


def _ari_oracle(adj, n, u, v):
    a = float(len(adj[u] & adj[v]))
    uni = float(len(adj[u] | adj[v]))
    b = c = uni  # the reference's set_union quirk
    d = n - uni
    denom = a * b + a * c + 2 * a * d + b * b + b * d + c * c + c * d
    return 0.0 if denom == 0 else 2 * (a * d - b * c) / denom


def test_adjusted_rand_index_vs_python(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    adj = _adj(KARATE_EDGES)
    got = {
        (r["u"], r["v"]): r["score"]
        for r in adjusted_rand_link_index(g).collect()
    }
    assert len(got) > 0
    for (u, v), s in got.items():
        assert math.isclose(
            s, _ari_oracle(adj, KARATE_N, u, v), abs_tol=1e-12
        ), (u, v)


def test_adjusted_rand_explicit_pairs(spark):
    # explicit pairs path: include a pair with zero common neighbors
    edges = [(0, 1), (2, 3)]
    g = GraphDF.from_edge_list(spark, edges, num_nodes=4)
    pairs = spark.createDataFrame([(0, 2), (0, 1)], "u long, v long")
    adj = _adj(edges)
    got = {
        (r["u"], r["v"]): r["score"]
        for r in adjusted_rand_link_index(g, pairs).collect()
    }
    assert set(got) == {(0, 2), (0, 1)}
    for (u, v), s in got.items():
        assert math.isclose(s, _ari_oracle(adj, 4, u, v), abs_tol=1e-12)


def test_neighborhood_utility_vs_python(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    adj = _adj(KARATE_EDGES)
    pairs = two_hop_pairs(g).select("u", "v").limit(50)
    rows = neighborhood_utility(g, pairs).collect()
    assert len(rows) > 0
    for r in rows:
        u, v = r["u"], r["v"]
        assert r["neighbors_union"] == sorted(adj[u] | adj[v])
        assert r["common_neighbors"] == sorted(adj[u] & adj[v])


def test_neighbors_of_lists(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    adj = _adj(KARATE_EDGES)
    rows = {r["id"]: r["neighbors"] for r in neighbors_of(g).collect()}
    for nid, nbrs in rows.items():
        assert nbrs == sorted(adj[nid])
