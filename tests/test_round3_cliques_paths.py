"""MaximalCliques, AllSimplePaths, Volume — vs pure-Python oracles."""

import pytest

from networkit_spark.graph import GraphDF
from tests.fixtures import KARATE_EDGES, KARATE_N, TINY_CC_EDGES, TINY_CC_N


def _adj(edges, n):
    adj = {u: set() for u in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    return adj


@pytest.fixture(scope="module")
def karate(spark):
    return GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)


# ------------------------------------------------------------------ cliques
def _bk_py(adj, r, p, x, out):
    if not p and not x:
        out.append(frozenset(r))
        return
    pivot = max(p | x, key=lambda u: len(adj[u] & p))
    for v in list(p - adj[pivot]):
        _bk_py(adj, r | {v}, p & adj[v], x & adj[v], out)
        p.remove(v)
        x.add(v)


def test_maximal_cliques_karate(spark, karate):
    from networkit_spark.operators.cliques import maximal_cliques

    adj = _adj(KARATE_EDGES, KARATE_N)
    want: list = []
    _bk_py(adj, set(), set(range(KARATE_N)), set(), want)
    got = {
        frozenset(r["clique"]) for r in maximal_cliques(karate).collect()
    }
    assert got == set(want)
    # every clique emitted exactly once
    assert maximal_cliques(karate).count() == len(set(want))


def test_maximal_cliques_isolated(spark):
    from networkit_spark.operators.cliques import maximal_cliques

    g = GraphDF.from_edge_list(spark, TINY_CC_EDGES, num_nodes=TINY_CC_N)
    got = {frozenset(r["clique"]) for r in maximal_cliques(g).collect()}
    adj = _adj(TINY_CC_EDGES, TINY_CC_N)
    want: list = []
    _bk_py(adj, set(), set(range(TINY_CC_N)), set(), want)
    # node 15 is isolated → singleton maximal clique
    assert frozenset([15]) in got
    assert got == set(want)


# ------------------------------------------------------------- simple paths
def _simple_paths_py(adj, s, t, cutoff):
    out = []

    def dfs(path):
        cur = path[-1]
        if cur == t:
            out.append(tuple(path))
            return
        if len(path) - 1 >= cutoff:
            return
        for w in adj[cur]:
            if w not in path:
                dfs(path + [w])

    dfs([s])
    return set(out)


def test_all_simple_paths_karate(spark, karate):
    from networkit_spark.operators.bfs import all_simple_paths

    got = {
        tuple(r["path"])
        for r in all_simple_paths(karate, 4, 16, cutoff=4).collect()
    }
    want = _simple_paths_py(_adj(KARATE_EDGES, KARATE_N), 4, 16, 4)
    assert got == want
    assert len(got) > 0


def test_all_simple_paths_validates(spark, karate):
    from networkit_spark.operators.bfs import all_simple_paths

    with pytest.raises(ValueError):
        all_simple_paths(karate, 3, 3, cutoff=2)
    with pytest.raises(ValueError):
        all_simple_paths(karate, 0, 5, cutoff=0)


# ------------------------------------------------------------------- volume
def _ball_py(adj, s, r):
    dist = {s: 0}
    frontier = [s]
    d = 0
    while frontier and d < r:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return sum(1 for x in dist.values() if x <= r)


def test_volume_karate(spark, karate):
    from networkit_spark.operators.bfs import volume

    adj = _adj(KARATE_EDGES, KARATE_N)
    r, samples, seed = 2, 10, 5
    picks = [
        ((i * 1103515245 + 12345 + seed) % 2147483648) % KARATE_N
        for i in range(samples)
    ]
    want = sum(_ball_py(adj, p, r) for p in picks) / samples
    got = volume(karate, r=r, samples=samples, seed=seed)
    assert got == pytest.approx(want, abs=1e-9)
