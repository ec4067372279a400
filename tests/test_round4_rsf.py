"""RandomSpanningForest (components/RandomSpanningForest.cpp) — round-4
parity fill: Aldous–Broder per-component walk."""

from collections import defaultdict

from networkit_spark.graph import GraphDF
from networkit_spark.operators.misc import random_spanning_forest

from tests.fixtures import KARATE_EDGES, KARATE_N


def _is_spanning_tree(tree_edges, nodes, graph_edges):
    canon = {(min(u, v), max(u, v)) for u, v in graph_edges}
    if len(tree_edges) != len(nodes) - 1:
        return False
    if not set(tree_edges) <= canon:
        return False
    adj = defaultdict(set)
    for u, v in tree_edges:
        adj[u].add(v)
        adj[v].add(u)
    seen = set()
    stack = [next(iter(nodes))]
    while stack:
        x = stack.pop()
        if x in seen:
            continue
        seen.add(x)
        stack.extend(adj[x] - seen)
    return seen == set(nodes)


def test_rsf_karate_is_spanning_tree(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    tree = [
        (r["src"], r["dst"]) for r in random_spanning_forest(g).collect()
    ]
    assert _is_spanning_tree(tree, range(KARATE_N), KARATE_EDGES)


def test_rsf_deterministic_and_seed_sensitive(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    a = sorted(
        (r["src"], r["dst"]) for r in random_spanning_forest(g, seed=1).collect()
    )
    b = sorted(
        (r["src"], r["dst"]) for r in random_spanning_forest(g, seed=1).collect()
    )
    c = sorted(
        (r["src"], r["dst"]) for r in random_spanning_forest(g, seed=2).collect()
    )
    assert a == b
    assert a != c  # different seed walks a different tree (34-node karate)


def test_rsf_forest_on_disconnected(spark):
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    g = GraphDF.from_edge_list(spark, edges, num_nodes=6)
    tree = [
        (r["src"], r["dst"]) for r in random_spanning_forest(g).collect()
    ]
    left = [e for e in tree if e[0] < 3]
    right = [e for e in tree if e[0] >= 3]
    assert _is_spanning_tree(left, {0, 1, 2}, edges)
    assert _is_spanning_tree(right, {3, 4, 5}, edges)
