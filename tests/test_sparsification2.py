"""Round-2 sparsification fill-ins + LaplacianCentrality + wedge-sampling
approx CC vs pure-Python oracles on karate."""

import math
from collections import defaultdict

from networkit_spark.graph import GraphDF
from networkit_spark.operators.centrality import laplacian_centrality
from networkit_spark.operators.sparsification import (
    chance_corrected_triangle_score,
    forest_fire_score,
    local_similarity_score,
    multiscale_score,
    scan_structural_similarity_score,
    simmelian_overlap_score,
)
from networkit_spark.operators.triangles import (
    global_clustering_approx,
    global_clustering_coefficient,
)

from fixtures import KARATE_EDGES, KARATE_N


def _adj():
    adj = defaultdict(set)
    for u, v in KARATE_EDGES:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def _edge_tris(adj):
    return {
        (min(u, v), max(u, v)): len(adj[u] & adj[v]) for u, v in KARATE_EDGES
    }


def test_scan_structural_similarity(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    adj = _adj()
    tris = _edge_tris(adj)
    got = {(r["src"], r["dst"]): r["score"]
           for r in scan_structural_similarity_score(g).collect()}
    for (u, v), t in tris.items():
        want = (t + 1) / math.sqrt((len(adj[u]) + 1) * (len(adj[v]) + 1))
        assert math.isclose(got[(u, v)], want, abs_tol=1e-9), (u, v)


def test_chance_corrected_triangle(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    adj = _adj()
    tris = _edge_tris(adj)
    got = {(r["src"], r["dst"]): r["score"]
           for r in chance_corrected_triangle_score(g).collect()}
    n = KARATE_N
    for (u, v), t in tris.items():
        du, dv = len(adj[u]), len(adj[v])
        if t > 0:
            want = t * (n - 2) / ((du - 1) * (dv - 1))
        elif du == 1 or dv == 1:
            want = 1.0
        else:
            want = 0.0
        assert math.isclose(got[(u, v)], want, abs_tol=1e-9), (u, v)


def test_local_similarity(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    adj = _adj()
    tris = _edge_tris(adj)
    exp = defaultdict(float)
    for i in adj:
        di = len(adj[i])
        sims = []
        for j in sorted(adj[i]):
            t = tris[(min(i, j), max(i, j))]
            sims.append((-(t / (di + len(adj[j]) - t)), j))
        sims.sort()
        for rank, (_, j) in enumerate(sims, start=1):
            e = 1.0 if di <= 1 else 1.0 - math.log(rank) / math.log(di)
            key = (min(i, j), max(i, j))
            exp[key] = max(exp[key], e)
    got = {(r["src"], r["dst"]): r["score"]
           for r in local_similarity_score(g).collect()}
    for k in exp:
        assert math.isclose(got[k], exp[k], abs_tol=1e-9), k


def test_multiscale(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    adj = _adj()
    exp = defaultdict(float)
    for u in adj:
        k = len(adj[u])
        s = float(k)  # unit weights
        for v in adj[u]:
            p = 1.0 / s
            prob = 1.0 - (1.0 - p) ** (k - 1)
            key = (min(u, v), max(u, v))
            exp[key] = max(exp[key], prob)
    got = {(r["src"], r["dst"]): r["score"] for r in multiscale_score(g).collect()}
    for k2 in exp:
        assert math.isclose(got[k2], exp[k2], abs_tol=1e-9), k2


def test_simmelian_overlap(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    adj = _adj()
    tris = _edge_tris(adj)
    max_rank = 3

    def ranks(u):
        vals = sorted(
            ((tris[(min(u, v), max(u, v))], v) for v in adj[u]), reverse=True
        )
        out = {}
        for pos, (t, v) in enumerate(vals):
            out[v] = sum(1 for t2, _ in vals if t2 > t)  # competition rank
        return out

    got = {(r["src"], r["dst"]): r["score"]
           for r in simmelian_overlap_score(g, max_rank=max_rank).collect()}
    for u, v in KARATE_EDGES:
        ru, rv = ranks(u), ranks(v)
        want = sum(
            1
            for w in adj[u] & adj[v]
            if ru[w] <= max_rank and rv[w] <= max_rank
        )
        assert got[(min(u, v), max(u, v))] == float(want), (u, v)


def test_forest_fire_deterministic(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    a = {(r["src"], r["dst"]): r["score"]
         for r in forest_fire_score(g, pf=0.6, n_fires=8, seed=3).collect()}
    b = {(r["src"], r["dst"]): r["score"]
         for r in forest_fire_score(g, pf=0.6, n_fires=8, seed=3).collect()}
    assert a == b
    assert len(a) == len(KARATE_EDGES)
    assert any(s > 0 for s in a.values())


def test_laplacian_centrality(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    adj = _adj()
    deg = {u: float(len(adj[u])) for u in range(KARATE_N)}
    want = {
        u: deg[u] ** 2 + sum(1.0 * (1.0 + 2 * deg[v]) for v in adj[u])
        for u in range(KARATE_N)
    }
    got = {r["id"]: r["score"] for r in laplacian_centrality(g).collect()}
    for u in range(KARATE_N):
        assert math.isclose(got[u], want[u], abs_tol=1e-9), u
    total = sum(deg[u] ** 2 for u in range(KARATE_N)) + sum(
        1.0 for u in adj for _ in adj[u]
    )
    gotn = {r["id"]: r["score"]
            for r in laplacian_centrality(g, normalized=True).collect()}
    for u in range(KARATE_N):
        assert math.isclose(gotn[u], want[u] / total, abs_tol=1e-9), u


def test_wedge_sampling_close_to_exact(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    exact = global_clustering_coefficient(g)
    approx = global_clustering_approx(g, k=2000, seed=7)
    assert abs(approx - exact) < 0.08
    assert global_clustering_approx(g, k=2000, seed=7) == approx  # seeded
