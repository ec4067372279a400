"""Group centralities, Permanence, KPath — vs pure-Python oracles on the
reference-transplanted fixtures (FIXTURES.md §3)."""

import math

import pytest

from networkit_spark.graph import GraphDF
from tests.fixtures import KARATE_EDGES, KARATE_N

LCG_M = 2147483648


def _adj(edges, n):
    adj = {u: set() for u in range(n)}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    return adj


@pytest.fixture(scope="module")
def karate(spark):
    return GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)


# ------------------------------------------------------------- permanence
def _permanence_py(edges, n, label):
    adj = _adj(edges, n)
    out = {}
    for u in range(n):
        nbrs = adj[u]
        d = len(nbrs)
        if d == 0:
            out[u] = 0.0
            continue
        strength = {}
        for y in nbrs:
            strength[label[y]] = strength.get(label[y], 0) + 1
        internal = strength.get(label[u], 0)
        emax = max(
            [s for c, s in strength.items() if c != label[u]], default=0
        )
        emax = max(emax, 1)
        inb = [y for y in nbrs if label[y] == label[u]]
        if len(inb) < 2:
            cin = 0.0
        else:
            tri = sum(
                1
                for i, y in enumerate(inb)
                for z in inb[i + 1 :]
                if z in adj[y]
            )
            cin = tri / (0.5 * len(inb) * (len(inb) - 1))
        out[u] = internal / emax / d - (1.0 - cin)
    return out


def test_permanence_karate(spark, karate):
    from pyspark.sql import functions as F

    from networkit_spark.operators.centrality import permanence_centrality

    part = karate.V.select("id", (F.col("id") % 3).alias("label"))
    got = {
        r["id"]: r["score"]
        for r in permanence_centrality(karate, part).collect()
    }
    want = _permanence_py(KARATE_EDGES, KARATE_N, {u: u % 3 for u in range(KARATE_N)})
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-9), u


# ------------------------------------------------------------ group degree
def _group_degree_py(edges, n, k, count_group_nodes):
    adj = _adj(edges, n)
    group, covered = [], set()
    for _ in range(k):
        best, best_gain = None, None
        for u in range(n):
            if u in group:
                continue
            gain = len(adj[u] - covered)
            if count_group_nodes:
                gain += u not in covered
            else:
                gain -= u in covered and u not in group
            if best_gain is None or gain > best_gain:
                best, best_gain = u, gain
        group.append(best)
        covered |= adj[best] | {best}
    if count_group_nodes:
        return group, len(covered)
    return group, len(covered - set(group))


@pytest.mark.parametrize("cgn", [True, False])
def test_group_degree_karate(spark, karate, cgn):
    from networkit_spark.operators.group import group_degree

    got_g, got_s = group_degree(karate, k=4, count_group_nodes=cgn)
    want_g, want_s = _group_degree_py(KARATE_EDGES, KARATE_N, 4, cgn)
    assert got_g == want_g
    assert got_s == want_s


# --------------------------------------------------------- group closeness
def _bfs_py(adj, s, n):
    dist = {s: 0}
    frontier = [s]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return [dist.get(v, n) for v in range(n)]


def _group_closeness_py(edges, n, k):
    adj = _adj(edges, n)
    dmat = {u: _bfs_py(adj, u, n) for u in range(n)}
    group = []
    cur = [n] * n
    for _ in range(k):
        best, best_f = None, None
        for u in range(n):
            if u in group:
                continue
            f = sum(min(cur[v], dmat[u][v]) for v in range(n))
            if best_f is None or f < best_f:
                best, best_f = u, f
        group.append(best)
        cur = [min(cur[v], dmat[best][v]) for v in range(n)]
    far = sum(cur[v] for v in range(n) if v not in group)
    return group, (n - len(group)) / far if far else 0.0


def test_group_closeness_karate(spark, karate):
    from networkit_spark.operators.group import group_closeness

    got_g, got_s = group_closeness(karate, k=3)
    want_g, want_s = _group_closeness_py(KARATE_EDGES, KARATE_N, 3)
    assert got_g == want_g
    assert got_s == pytest.approx(want_s, abs=1e-9)


# ----------------------------------------------------------------- gedwalk
def _walks_py(adj, nodes, levels):
    """Σ_u (#walks of length ℓ starting at u) for ℓ=0..levels, restricted
    to `nodes`."""
    x = {u: 1.0 for u in nodes}
    out = [sum(x.values())]
    for _ in range(levels):
        x = {
            u: sum(x.get(v, 0.0) for v in adj[u] if v in nodes) for u in nodes
        }
        out.append(sum(x.values()))
    return out


def test_gedwalk_score_karate(spark, karate):
    from networkit_spark.operators.group import gedwalk_score

    adj = _adj(KARATE_EDGES, KARATE_N)
    group = [0, 33]
    alpha, levels = 0.3, 4
    allw = _walks_py(adj, set(range(KARATE_N)), levels)
    avw = _walks_py(adj, set(range(KARATE_N)) - set(group), levels)
    want = sum(alpha**l * (allw[l] - avw[l]) for l in range(1, levels + 1))
    got = gedwalk_score(karate, group, alpha=alpha, levels=levels)
    assert got == pytest.approx(want, rel=1e-9)


def _gedwalk_greedy_py(edges, n, k, alpha, levels):
    adj = _adj(edges, n)
    group = []
    for _ in range(k):
        nodes = set(range(n)) - set(group)
        # forward/backward walk counts on the avoiding subgraph (undirected)
        xs = [{u: 1.0 for u in nodes}]
        for _ in range(levels - 1):
            x = xs[-1]
            xs.append(
                {u: sum(x.get(v, 0.0) for v in adj[u] if v in nodes) for u in nodes}
            )
        best, best_g = None, None
        for u in sorted(nodes):
            g = 0.0
            for lvl in range(1, levels + 1):
                coef = alpha**lvl
                for i in range(lvl):
                    j = lvl - 1 - i
                    g += coef * xs[i][u] * xs[j][u]
            if best_g is None or g > best_g + 1e-12:
                best, best_g = u, g
        group.append(best)
    return group


def test_gedwalk_greedy_karate(spark, karate):
    from networkit_spark.operators.group import gedwalk

    alpha, levels = 0.25, 3
    got_g, got_s = gedwalk(karate, k=3, alpha=alpha, levels=levels)
    want_g = _gedwalk_greedy_py(KARATE_EDGES, KARATE_N, 3, alpha, levels)
    assert got_g == want_g
    assert got_s > 0.0


# ------------------------------------------------------------------- kpath
def _kpath_py(edges, n, k, t, seed):
    adj = _adj(edges, n)
    counter = [0] * n

    def lcg(a, b, c):
        return (a * 1103515245 + b * 12345 + c * 2654435761 + seed) % LCG_M

    for w in range(t):
        s = lcg(w, 1, 0) % n
        length = lcg(w, 2, 0) % k + 1
        visited = {s}
        cur = s
        for j in range(1, length + 1):
            cands = [v for v in adj[cur] if v not in visited]
            if not cands:
                break
            # argmin of u01 key, ties by smaller dst
            best = min(cands, key=lambda v: ((lcg(w, j, v) + 0.5) / LCG_M, v))
            visited.add(best)
            counter[best] += 1
            cur = best
    return {v: k * n * counter[v] / t for v in range(n)}


def test_kpath_karate(spark, karate):
    from networkit_spark.operators.centrality import kpath_centrality

    k, t, seed = 5, 200, 11
    got = {
        r["id"]: r["score"]
        for r in kpath_centrality(
            karate, k=k, num_walks=t, seed=seed
        ).collect()
    }
    want = _kpath_py(KARATE_EDGES, KARATE_N, k, t, seed)
    assert set(got) == set(want)
    for u in want:
        assert got[u] == pytest.approx(want[u], abs=1e-9), u


def test_kpath_defaults_shape(spark, karate):
    from networkit_spark.operators.centrality import kpath_centrality

    out = kpath_centrality(karate, k=3, num_walks=50).collect()
    assert len(out) == KARATE_N
    assert all(r["score"] >= 0.0 for r in out)


# ------------------------------------------------- approx group betweenness
def test_approx_group_betweenness_star(spark):
    from networkit_spark.operators.betweenness import approx_group_betweenness

    star = [(0, i) for i in range(1, 12)]
    g = GraphDF.from_edge_list(spark, star, num_nodes=12)
    group = approx_group_betweenness(g, group_size=2, seed=3, n_samples=40)
    # every leaf-to-leaf shortest path passes through the hub
    assert group[0] == 0
    assert len(group) == 2 and len(set(group)) == 2


def test_approx_group_betweenness_karate(spark, karate):
    from networkit_spark.operators.betweenness import approx_group_betweenness

    g1 = approx_group_betweenness(karate, group_size=3, seed=9, n_samples=60)
    g2 = approx_group_betweenness(karate, group_size=3, seed=9, n_samples=60)
    assert g1 == g2  # deterministic under a fixed seed
    assert len(g1) == 3 and len(set(g1)) == 3


def test_approx_group_betweenness_validates(spark, karate):
    from networkit_spark.operators.betweenness import approx_group_betweenness

    with pytest.raises(ValueError):
        approx_group_betweenness(karate, group_size=0)
    with pytest.raises(ValueError):
        approx_group_betweenness(karate, group_size=2, epsilon=-1.0)


# ------------------------------------------------------------------ kadabra
def test_kadabra_betweenness_karate(spark, karate):
    from networkit_spark.operators.betweenness import (
        betweenness,
        kadabra_betweenness,
    )

    err = 0.08
    got = {
        r["id"]: r["score"]
        for r in kadabra_betweenness(
            karate, err=err, delta=0.1, seed=4, batch_size=256, max_batches=8
        ).collect()
    }
    # exact fraction of ordered pairs whose shortest path crosses v
    exact = {
        r["id"]: r["score"] / (KARATE_N * (KARATE_N - 1))
        for r in betweenness(karate).collect()
    }
    assert set(got) == set(exact)
    for v in exact:
        assert abs(got[v] - exact[v]) <= err + 0.02, (v, got[v], exact[v])
    # the estimator is deterministic under a fixed seed
    again = {
        r["id"]: r["score"]
        for r in kadabra_betweenness(
            karate, err=err, delta=0.1, seed=4, batch_size=256, max_batches=8
        ).collect()
    }
    assert got == again
