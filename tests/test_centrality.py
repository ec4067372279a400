import math
from collections import defaultdict

import numpy as np

from networkit_spark.graph import GraphDF
from networkit_spark.operators.centrality import (
    degree_centrality,
    eigenvector_centrality,
    katz_centrality,
    ranking,
    sfigality,
)

from tests.fixtures import KARATE_EDGES, KARATE_N, TINY_BC_EDGES, TINY_BC_N


def _adj_matrix(n, edges):
    a = np.zeros((n, n))
    for u, v in edges:
        a[u, v] = 1.0
        a[v, u] = 1.0
    return a


def test_degree_centrality(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    got = {r["id"]: r["score"] for r in degree_centrality(g).collect()}
    deg = defaultdict(int)
    for u, v in KARATE_EDGES:
        deg[u] += 1
        deg[v] += 1
    assert got == {v: float(deg[v]) for v in range(KARATE_N)}
    norm = {r["id"]: r["score"] for r in degree_centrality(g, normalized=True).collect()}
    assert math.isclose(norm[33], deg[33] / (KARATE_N - 1))


def test_eigenvector_centrality_vs_numpy(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    got = {r["id"]: r["score"] for r in eigenvector_centrality(g, tol=1e-10).collect()}
    a = _adj_matrix(KARATE_N, KARATE_EDGES)
    # numpy power iteration with identical semantics
    v = np.full(KARATE_N, 1.0 / math.sqrt(KARATE_N))
    for _ in range(1000):
        nv = a @ v
        nv = nv / np.linalg.norm(nv)
        if np.linalg.norm(nv - v) <= 1e-10:
            v = nv
            break
        v = nv
    for i in range(KARATE_N):
        assert math.isclose(got[i], v[i], abs_tol=1e-6), i


def test_katz_centrality_vs_oracle(spark):
    alpha, beta = 0.05, 0.1
    g = GraphDF.from_edge_list(spark, TINY_BC_EDGES, num_nodes=TINY_BC_N)
    got = {
        r["id"]: r["score"]
        for r in katz_centrality(g, alpha=alpha, beta=beta, tol=1e-12).collect()
    }
    adj = defaultdict(list)
    for u, v in TINY_BC_EDGES:
        adj[u].append(v)
        adj[v].append(u)
    # reference semantics (KatzCentrality.cpp:22,41-58): init 1.0,
    # w·α·(old+1) per in-edge (+β), converge on |‖v'‖−‖v‖| ≤ tol
    score = {v: 1.0 for v in range(TINY_BC_N)}
    old_nrm = 0.0
    for _ in range(2000):
        new = {
            v: sum(1.0 * alpha * (score[u] + 1.0) for u in adj[v]) + beta
            for v in range(TINY_BC_N)
        }
        nrm = math.sqrt(sum(s * s for s in new.values()))
        score = new
        if abs(nrm - old_nrm) <= 1e-12:
            break
        old_nrm = nrm
    nrm = math.sqrt(sum(s * s for s in score.values()))
    for v in range(TINY_BC_N):
        assert math.isclose(got[v], score[v] / nrm, abs_tol=1e-9), v


def test_ranking_deterministic(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    r = ranking(degree_centrality(g)).collect()
    assert r[0]["id"] == 33  # deg 17
    assert r[1]["id"] == 0   # deg 16
    scores = [row["score"] for row in r]
    assert scores == sorted(scores, reverse=True)


def test_sfigality(spark):
    # star: center has no higher-degree neighbor (0.0), leaves all do (1.0)
    star = [(0, i) for i in range(1, 6)]
    g = GraphDF.from_edge_list(spark, star, num_nodes=6)
    got = {r["id"]: r["score"] for r in sfigality(g).collect()}
    assert got[0] == 0.0
    assert all(got[i] == 1.0 for i in range(1, 6))
