"""EdmondsKarp max-flow + CutClustering vs pure-Python oracles and the
max-flow/min-cut certificate."""

from collections import deque

import pytest

from networkit_spark.graph import GraphDF
from tests.fixtures import KARATE_EDGES, KARATE_N, TINY_BC_EDGES, TINY_BC_N


def _maxflow_py(edges, s, t):
    """Undirected max flow, BFS augmentation. edges: {(u,v): cap} canonical."""
    resid = {}
    for (u, v), c in edges.items():
        resid[(u, v)] = resid.get((u, v), 0.0) + c
        resid[(v, u)] = resid.get((v, u), 0.0) + c
    adj = {}
    for (u, v) in resid:
        adj.setdefault(u, set()).add(v)
    value = 0.0
    while True:
        pred = {s: s}
        q = deque([s])
        while q and t not in pred:
            u = q.popleft()
            for v in sorted(adj.get(u, ())):
                if v not in pred and resid[(u, v)] > 1e-12:
                    pred[v] = u
                    q.append(v)
        if t not in pred:
            break
        path = []
        v = t
        while v != s:
            path.append((pred[v], v))
            v = pred[v]
        gain = min(resid[e] for e in path)
        for (u, v) in path:
            resid[(u, v)] -= gain
            resid[(v, u)] += gain
        value += gain
    reach = {s}
    q = deque([s])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in reach and resid[(u, v)] > 1e-9:
                reach.add(v)
                q.append(v)
    return value, reach


def _canon(edges):
    out = {}
    for u, v in edges:
        key = (min(u, v), max(u, v))
        out[key] = out.get(key, 0.0) + 1.0
    return out


@pytest.fixture(scope="module")
def karate(spark):
    return GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)


def test_edmonds_karp_karate(spark, karate):
    from networkit_spark.operators.flow import edmonds_karp

    s, t = 0, 33
    caps = _canon(KARATE_EDGES)
    want_value, want_reach = _maxflow_py(caps, s, t)
    got_value, flows, source_set = edmonds_karp(karate, s, t)
    assert got_value == pytest.approx(want_value, abs=1e-9)

    # max-flow/min-cut certificate: the returned source set is a min cut
    reach = {r["id"] for r in source_set.collect()}
    assert s in reach and t not in reach
    cut_cap = sum(
        c for (u, v), c in caps.items() if (u in reach) != (v in reach)
    )
    assert cut_cap == pytest.approx(got_value, abs=1e-9)

    # feasibility + conservation of the per-edge |net| flows
    fl = {(r["src"], r["dst"]): r["flow"] for r in flows.collect()}
    for (u, v), f in fl.items():
        assert f <= caps[(u, v)] + 1e-9
    assert len(fl) == len(caps)


def test_edmonds_karp_disconnected(spark):
    from networkit_spark.operators.flow import edmonds_karp

    g = GraphDF.from_edge_list(spark, [(0, 1), (2, 3)], num_nodes=4)
    value, _, source_set = edmonds_karp(g, 0, 3)
    assert value == 0.0
    assert {r["id"] for r in source_set.collect()} == {0, 1}


def _cut_clustering_py(edges, n, alpha):
    caps = _canon(edges)
    t = n
    aug = dict(caps)
    for u in range(n):
        aug[(u, t)] = alpha
    deg = {u: 0 for u in range(n)}
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    order = sorted(range(n), key=lambda u: (-deg[u], u))
    label = {}
    for u in order:
        if u in label:
            continue
        _, reach = _maxflow_py(aug, u, t)
        for v in reach:
            label[v] = u
    return {u: label.get(u, u) for u in range(n)}


def test_cut_clustering_tiny(spark):
    from networkit_spark.operators.flow import cut_clustering

    g = GraphDF.from_edge_list(spark, TINY_BC_EDGES, num_nodes=TINY_BC_N)
    alpha = 0.4
    got = {
        r["id"]: r["label"] for r in cut_clustering(g, alpha).collect()
    }
    want = _cut_clustering_py(TINY_BC_EDGES, TINY_BC_N, alpha)
    assert got == want
