"""BiconnectedComponents (Tarjan–Vishkin over DataFrames) vs an iterative
Hopcroft–Tarjan pure-Python oracle."""

import pytest

from networkit_spark.graph import GraphDF
from tests.fixtures import (
    KARATE_EDGES,
    KARATE_N,
    TINY_BC_EDGES,
    TINY_BC_N,
    TINY_CC_EDGES,
    TINY_CC_N,
)


def _bcc_py(edges, n):
    """Iterative Hopcroft–Tarjan; returns set of frozensets of canonical
    edges."""
    adj = {u: [] for u in range(n)}
    for i, (u, v) in enumerate(edges):
        adj[u].append((v, i))
        adj[v].append((u, i))
    visited = [False] * n
    disc = [0] * n
    low = [0] * n
    comps = []
    timer = [1]
    for root in range(n):
        if visited[root]:
            continue
        stack = [(root, -1, iter(adj[root]))]
        estack = []
        visited[root] = True
        disc[root] = low[root] = timer[0]
        timer[0] += 1
        while stack:
            u, pe, it = stack[-1]
            adv = False
            for v, ei in it:
                if ei == pe:
                    continue
                if not visited[v]:
                    estack.append(ei)
                    visited[v] = True
                    disc[v] = low[v] = timer[0]
                    timer[0] += 1
                    stack.append((v, ei, iter(adj[v])))
                    adv = True
                    break
                elif disc[v] < disc[u]:
                    estack.append(ei)
                    low[u] = min(low[u], disc[v])
            if adv:
                continue
            stack.pop()
            if stack:
                p = stack[-1][0]
                low[p] = min(low[p], low[u])
                if low[u] >= disc[p]:
                    comp = []
                    while True:
                        ei = estack.pop()
                        comp.append(ei)
                        if ei == pe:
                            break
                    comps.append(
                        frozenset(
                            (min(edges[i]), max(edges[i])) for i in comp
                        )
                    )
    return set(comps)


def _check(spark, edges, n):
    from networkit_spark.operators.biconnected import biconnected_components

    g = GraphDF.from_edge_list(spark, edges, num_nodes=n)
    rows = biconnected_components(g).collect()
    bycomp = {}
    for r in rows:
        bycomp.setdefault(r["component"], set()).add((r["src"], r["dst"]))
    got = {frozenset(s) for s in bycomp.values()}
    want = _bcc_py(edges, n)
    assert got == want


def test_bcc_tiny_bc(spark):
    _check(spark, TINY_BC_EDGES, TINY_BC_N)


def test_bcc_tiny_cc(spark):
    _check(spark, TINY_CC_EDGES, TINY_CC_N)


def test_bcc_karate(spark):
    _check(spark, KARATE_EDGES, KARATE_N)


def test_articulation_points_karate(spark):
    from networkit_spark.operators.biconnected import articulation_points

    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    got = {r["id"] for r in articulation_points(g).collect()}
    # oracle: nodes whose edges span ≥2 biconnected components
    comps = _bcc_py(KARATE_EDGES, KARATE_N)
    cnt = {}
    for comp in comps:
        for u, v in comp:
            for x in (u, v):
                cnt.setdefault(x, set()).add(comp)
    want = {x for x, s in cnt.items() if len(s) >= 2}
    assert got == want
