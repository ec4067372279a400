"""Completeness batch: GeometricMeanScore, AlgebraicDistanceIndex,
GraphDistance/ReverseBFS, exact NeighborhoodFunction + hop plot,
Random/Union maximum spanning forests."""

import math

import pytest

from networkit_spark.graph import GraphDF
from tests.fixtures import KARATE_EDGES, KARATE_N


def _adj(edges, n):
    adj = {u: set() for u in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    return adj


@pytest.fixture(scope="module")
def karate(spark):
    return GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)


def test_geometric_mean_score(spark, karate):
    from networkit_spark.operators.sparsification import geometric_mean_score
    from networkit_spark.operators.triangles import triangle_edge_score

    attr = triangle_edge_score(karate)
    rows = attr.collect()
    a = {(r["src"], r["dst"]): r["score"] for r in rows}
    nsum = {}
    for (u, v), s in a.items():
        nsum[u] = nsum.get(u, 0) + s
        nsum[v] = nsum.get(v, 0) + s
    got = {
        (r["src"], r["dst"]): r["score"]
        for r in geometric_mean_score(karate, attr).collect()
    }
    assert set(got) == set(a)
    for (u, v), s in a.items():
        want = s / math.sqrt(nsum[u] * nsum[v]) if s > 0 else 0.0
        assert got[(u, v)] == pytest.approx(want, abs=1e-12), (u, v)


def test_algebraic_distance_index(spark, karate):
    from networkit_spark.operators.linkprediction import (
        algebraic_distance_index,
        two_hop_pairs,
    )

    n1 = algebraic_distance_index(karate, systems=1, iterations=5, norm=1)
    n2 = algebraic_distance_index(karate, systems=1, iterations=5, norm=2)
    d1 = {(r["u"], r["v"]): r["score"] for r in n1.collect()}
    d2 = {(r["u"], r["v"]): r["score"] for r in n2.collect()}
    # with one test system the 1-norm and 2-norm coincide
    assert set(d1) == set(d2)
    for k in d1:
        assert d1[k] == pytest.approx(d2[k], abs=1e-9)
    assert len(d1) == two_hop_pairs(karate).count()
    assert all(v >= 0 for v in d1.values())


def test_graph_distance_and_reverse_bfs(spark, karate):
    from networkit_spark.operators.bfs import graph_distance, reverse_bfs_from

    # unweighted karate: known distances
    assert graph_distance(karate, 0, 33) == 2.0
    assert graph_distance(karate, 16, 33) == 4.0
    # weighted triangle with a shortcut
    gw = GraphDF.from_edge_list(
        spark, [(0, 1, 10.0), (0, 2, 1.0), (2, 1, 1.0)], weighted=True
    )
    assert graph_distance(gw, 0, 1) == pytest.approx(2.0)
    # reverse BFS on a directed path 0→1→2
    gd = GraphDF.from_edge_list(spark, [(0, 1), (1, 2)], directed=True)
    rd = {r["id"]: r["dist"] for r in reverse_bfs_from(gd, 2).collect()}
    assert rd[2] == 0 and rd[1] == 1 and rd[0] == 2


def test_neighborhood_function_exact(spark, karate):
    from networkit_spark.operators.bfs import neighborhood_function_exact

    adj = _adj(KARATE_EDGES, KARATE_N)
    # python oracle: ordered pairs within <= h
    def bfs(s):
        dist = {s: 0}
        fr = [s]
        d = 0
        while fr:
            d += 1
            nx = []
            for u in fr:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nx.append(v)
            fr = nx
        return dist

    counts = {}
    for s in range(KARATE_N):
        for v, d in bfs(s).items():
            if d > 0:
                counts[d] = counts.get(d, 0) + 1
    want = {}
    run = 0
    for h in sorted(counts):
        run += counts[h]
        want[h] = run
    got = {r["h"]: r["count"] for r in neighborhood_function_exact(karate).collect()}
    assert got == want


def test_hop_plot_approx(spark, karate):
    from networkit_spark.operators.anf import hop_plot_approx

    frac = hop_plot_approx(karate, replicas=16, seed=7)
    assert frac, "non-empty"
    assert frac[-1] == pytest.approx(1.0)
    assert all(
        frac[i] <= frac[i + 1] + 1e-12 for i in range(len(frac) - 1)
    )


def _kruskal_max_py(edges_w, n):
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    total = 0.0
    cnt = 0
    for (u, v), w in sorted(edges_w.items(), key=lambda kv: -kv[1]):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            total += w
            cnt += 1
    return total, cnt


def test_random_maximum_spanning_forest(spark):
    from networkit_spark.operators.misc import random_maximum_spanning_forest

    edges = [
        (u, v, 1.0 + ((u * 3 + v * 5) % 7)) for u, v in KARATE_EDGES
    ]
    g = GraphDF.from_edge_list(spark, edges, weighted=True, num_nodes=KARATE_N)
    rows = random_maximum_spanning_forest(g, seed=11).collect()
    got_total = sum(r["weight"] for r in rows)
    want_total, want_cnt = _kruskal_max_py(
        {(u, v): w for u, v, w in edges}, KARATE_N
    )
    assert len(rows) == want_cnt
    assert got_total == pytest.approx(want_total)


def test_union_maximum_spanning_forest(spark):
    from networkit_spark.operators.misc import union_maximum_spanning_forest

    edges = [(u, v, 1.0 + ((u + v) % 3)) for u, v in KARATE_EDGES]
    g = GraphDF.from_edge_list(spark, edges, weighted=True, num_nodes=KARATE_N)
    got = {
        (r["src"], r["dst"]): r["in_umsf"]
        for r in union_maximum_spanning_forest(g).collect()
    }
    # oracle: edge (u,v,w) in some max-SF iff u,v not connected via
    # strictly heavier edges
    ew = {(min(u, v), max(u, v)): w for u, v, w in edges}

    def connected_above(u, v, w):
        heavier = [(a, b) for (a, b), x in ew.items() if x > w]
        adj = {}
        for a, b in heavier:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        seen, stack = {u}, [u]
        while stack:
            x = stack.pop()
            if x == v:
                return True
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        return v in seen

    assert set(got) == set(ew)
    for (u, v), w in ew.items():
        assert got[(u, v)] == (not connected_above(u, v, w)), (u, v, w)


def test_approximate_pagerank_push(spark, karate):
    import numpy as np

    from networkit_spark.operators.scd import approximate_pagerank_push

    alpha, eps, seed = 0.15, 1e-4, 0
    rows = approximate_pagerank_push(karate, seed, alpha=alpha, epsilon=eps).collect()
    p = np.zeros(KARATE_N)
    r = np.zeros(KARATE_N)
    for row in rows:
        p[row["id"]] = row["p"]
        r[row["id"]] = row["r"]
    adj = _adj(KARATE_EDGES, KARATE_N)
    vol = np.array([len(adj[u]) for u in range(KARATE_N)], dtype=float)
    # termination guarantee: r(u) < eps * vol(u) everywhere
    assert (r < eps * vol + 1e-15).all()
    # exact push invariant: Pi e_seed = p + Pi r, Pi = alpha (I-(1-a)M)^-1,
    # M[v,u] = (1/2) 1[v=u] + A[u,v] / (2 vol(u))   (the lazy push kernel)
    M = np.zeros((KARATE_N, KARATE_N))
    for u in range(KARATE_N):
        M[u, u] += 0.5
        for v in adj[u]:
            M[v, u] += 1.0 / (2.0 * vol[u])
    Pi = alpha * np.linalg.inv(np.eye(KARATE_N) - (1 - alpha) * M)
    e0 = np.zeros(KARATE_N)
    e0[seed] = 1.0
    lhs = Pi @ e0
    rhs = p + Pi @ r
    assert np.allclose(lhs, rhs, atol=1e-10)
    # p under-approximates the true lazy PPR by at most the residual mass
    assert (p <= lhs + 1e-12).all()


def test_apsp_karate(spark, karate):
    from networkit_spark.operators.bfs import apsp

    adj = _adj(KARATE_EDGES, KARATE_N)
    got = {
        (r["source"], r["id"]): r["dist"] for r in apsp(karate).collect()
    }
    # spot-check a source's full row + global pair count
    def bfs(s):
        dist = {s: 0}
        fr = [s]
        d = 0
        while fr:
            d += 1
            nx = []
            for u in fr:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = d
                        nx.append(v)
            fr = nx
        return dist

    assert len(got) == KARATE_N * KARATE_N  # connected: all ordered pairs
    for s in (0, 16, 33):
        for v, d in bfs(s).items():
            assert got[(s, v)] == d, (s, v)
