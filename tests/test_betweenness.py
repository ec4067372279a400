"""Betweenness vs pure-Python Brandes oracle (reference Betweenness.cpp:22;
golden six-node graph CentralityGTest.cpp:67-95)."""

import math
from collections import defaultdict, deque

from networkit_spark.graph import GraphDF
from networkit_spark.operators.betweenness import (
    betweenness,
    betweenness_fixed,
    estimate_betweenness,
)

from fixtures import KARATE_EDGES, KARATE_N, TINY_BC_EDGES, TINY_BC_N


def brandes_oracle(n, edges, directed=False):
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        if not directed:
            adj[v].append(u)
    bc = [0.0] * n
    for s in range(n):
        # forward BFS with path counts
        dist = {s: 0}
        sigma = defaultdict(float)
        sigma[s] = 1.0
        order = [s]
        q = deque([s])
        preds = defaultdict(list)
        while q:
            u = q.popleft()
            for v in adj[u]:
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
                    order.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = defaultdict(float)
        for t in reversed(order):
            for p in preds[t]:
                delta[p] += sigma[p] / sigma[t] * (1.0 + delta[t])
            if t != s:
                bc[t] += delta[t]
    return bc


def test_betweenness_golden_six_node(spark):
    g = GraphDF.from_edge_list(spark, TINY_BC_EDGES, num_nodes=TINY_BC_N)
    got = {r["id"]: r["score"] for r in betweenness(g).collect()}
    want = [0.0, 0.0, 15.0, 3.0, 3.0, 1.0]  # CentralityGTest.cpp:90-94
    for i in range(TINY_BC_N):
        assert math.isclose(got[i], want[i], abs_tol=1e-9), i


def test_betweenness_karate_vs_oracle(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    got = {r["id"]: r["score"] for r in betweenness(g).collect()}
    want = brandes_oracle(KARATE_N, KARATE_EDGES)
    for i in range(KARATE_N):
        assert math.isclose(got[i], want[i], rel_tol=1e-9, abs_tol=1e-9), i


def test_betweenness_normalized(spark):
    g = GraphDF.from_edge_list(spark, TINY_BC_EDGES, num_nodes=TINY_BC_N)
    got = {r["id"]: r["score"] for r in betweenness(g, normalized=True).collect()}
    pairs = (TINY_BC_N - 1) * (TINY_BC_N - 2) / 2
    assert math.isclose(got[2], 15.0 / pairs, abs_tol=1e-9)


def test_betweenness_directed(spark):
    edges = [(0, 1), (1, 2), (2, 3), (0, 2), (3, 0)]
    g = GraphDF.from_edge_list(spark, edges, directed=True, num_nodes=4)
    got = {r["id"]: r["score"] for r in betweenness(g).collect()}
    want = brandes_oracle(4, edges, directed=True)
    for i in range(4):
        assert math.isclose(got[i], want[i], abs_tol=1e-9), i


def test_betweenness_fixed_depth_exact_when_deep_enough(spark):
    g = GraphDF.from_edge_list(spark, TINY_BC_EDGES, num_nodes=TINY_BC_N)
    got = {r["id"]: r["score"] for r in betweenness_fixed(g, max_depth=8).collect()}
    want = [0.0, 0.0, 15.0, 3.0, 3.0, 1.0]
    for i in range(TINY_BC_N):
        assert math.isclose(got[i], want[i], abs_tol=1e-9), i


def test_estimate_betweenness_deterministic_and_shaped(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    a = {r["id"]: r["score"] for r in estimate_betweenness(g, 8, seed=5).collect()}
    b = {r["id"]: r["score"] for r in estimate_betweenness(g, 8, seed=5).collect()}
    assert a == b
    assert len(a) == KARATE_N
    assert all(s >= 0.0 for s in a.values())
    # the hub (node 33/0 region) must outrank leaves under any sane estimate
    exact = brandes_oracle(KARATE_N, KARATE_EDGES)
    top_exact = max(range(KARATE_N), key=lambda i: exact[i])
    assert a[top_exact] > sorted(a.values())[KARATE_N // 2]
