"""PathGrowingMatcher — validity, ½-approximation, and parity with the
same deterministic contract in pure python."""

import heapq
import itertools

import pytest

from networkit_spark.graph import GraphDF
from tests.fixtures import KARATE_EDGES, KARATE_N, TINY_BC_EDGES


def _pgm_py(edges_w):
    adj, w = {}, {}
    for (s, d), wt in edges_w.items():
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
        w[(min(s, d), max(s, d))] = wt
    alive = set(adj)
    deg = {u: len(adj[u]) for u in adj}
    pq = [(deg[u], u) for u in adj]
    heapq.heapify(pq)
    m = [set(), set()]
    mw = [0.0, 0.0]
    while alive:
        while pq and (pq[0][1] not in alive or deg[pq[0][1]] != pq[0][0]):
            heapq.heappop(pq)
        if not pq:
            break
        v = heapq.heappop(pq)[1]
        take = 0
        while v is not None and deg.get(v, 0) > 0:
            best, best_w = None, -1.0
            for u in adj[v]:
                if u in alive:
                    wt = w[(min(u, v), max(u, v))]
                    if wt > best_w or (wt == best_w and u < best):
                        best, best_w = u, wt
            e = (min(v, best), max(v, best))
            m[take].add(e)
            mw[take] += best_w
            take = 1 - take
            alive.discard(v)
            for u in adj[v]:
                if u in alive:
                    deg[u] -= 1
                    heapq.heappush(pq, (deg[u], u))
            v = best if best in alive else None
        if v is not None:
            alive.discard(v)
    return m[0] if mw[0] >= mw[1] else m[1]


def _best_matching_weight(edges_w):
    """Brute-force maximum-weight matching (tiny graphs only)."""
    edges = list(edges_w.items())
    best = 0.0
    for k in range(1, len(edges) + 1):
        for comb in itertools.combinations(edges, k):
            nodes = set()
            ok = True
            for (u, v), _ in comb:
                if u in nodes or v in nodes:
                    ok = False
                    break
                nodes.update((u, v))
            if ok:
                best = max(best, sum(w for _, w in comb))
    return best


def test_pgm_karate_parity(spark):
    from networkit_spark.operators.misc import path_growing_matching

    # weighted variant: deterministic pseudo-weights
    edges = [(u, v, 1.0 + ((u * 7 + v * 13) % 5)) for u, v in KARATE_EDGES]
    g = GraphDF.from_edge_list(spark, edges, weighted=True, num_nodes=KARATE_N)
    got = {
        (r["src"], r["dst"]) for r in path_growing_matching(g).collect()
    }
    want = _pgm_py({(u, v): w for u, v, w in edges})
    assert got == want
    # validity
    nodes = [x for e in got for x in e]
    assert len(nodes) == len(set(nodes))


def test_pgm_half_approx_tiny(spark):
    from networkit_spark.operators.misc import path_growing_matching

    edges = [(u, v, 1.0 + ((u + 2 * v) % 3)) for u, v in TINY_BC_EDGES]
    g = GraphDF.from_edge_list(spark, edges, weighted=True, num_nodes=6)
    rows = path_growing_matching(g).collect()
    got_w = sum(r["weight"] for r in rows)
    opt = _best_matching_weight({(u, v): w for u, v, w in edges})
    assert got_w >= 0.5 * opt - 1e-9


def test_pgm_rejects_self_loops(spark):
    from networkit_spark.operators.misc import path_growing_matching

    g = GraphDF.from_edge_list(spark, [(0, 0), (0, 1)], num_nodes=2)
    with pytest.raises(ValueError):
        path_growing_matching(g)
