"""ParallelAgglomerativeClusterer (PGA) — round-4 parity fill.

Reference: networkit/cpp/community/ParallelAgglomerativeClusterer.cpp:19-85
(score → match → contract loop, final contraction discarded, coarsest nodes
projected back as clusters).
"""

from collections import defaultdict

from networkit_spark.graph import GraphDF
from networkit_spark.operators.community import (
    modularity_edge_scores,
    modularity,
    parallel_agglomerative_clusterer,
)

from tests.fixtures import KARATE_EDGES, KARATE_N


def _labels(df):
    return {r["id"]: r["label"] for r in df.collect()}


def test_pga_proper_partition_and_agglomerates(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    lab = _labels(parallel_agglomerative_clusterer(g))
    assert set(lab) == set(range(KARATE_N))  # every node exactly once
    k = len(set(lab.values()))
    assert 2 <= k < KARATE_N  # actually merged something


def test_pga_clusters_are_connected(spark):
    # agglomeration only ever contracts edges, so every cluster's induced
    # subgraph must be connected
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    lab = _labels(parallel_agglomerative_clusterer(g))
    adj = defaultdict(set)
    for u, v in KARATE_EDGES:
        if lab[u] == lab[v]:
            adj[u].add(v)
            adj[v].add(u)
    clusters = defaultdict(set)
    for v, c in lab.items():
        clusters[c].add(v)
    for members in clusters.values():
        seen = set()
        stack = [next(iter(members))]
        while stack:
            x = stack.pop()
            if x in seen:
                continue
            seen.add(x)
            stack.extend(adj[x] & members)
        assert seen == members


def test_pga_deterministic(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    a = _labels(parallel_agglomerative_clusterer(g))
    b = _labels(parallel_agglomerative_clusterer(g))
    assert a == b


def test_pga_improves_modularity_over_singletons(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    labels = parallel_agglomerative_clusterer(g)
    singles = g.V.selectExpr("id", "id AS label")
    assert modularity(g, labels) > modularity(g, singles)


def test_modularity_edge_scores_formula(spark):
    # triangle + pendant: check Δmod by hand. W=4, vol=8.
    edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (2, 3, 1.0)]
    g = GraphDF.from_edge_list(spark, edges, weighted=True, num_nodes=4)
    got = {
        (r["src"], r["dst"]): r["score"]
        for r in modularity_edge_scores(g).collect()
    }
    wdeg = {0: 2.0, 1: 2.0, 2: 3.0, 3: 1.0}
    for (u, v), s in got.items():
        want = 1.0 / 4.0 - (wdeg[u] / 8.0) * (wdeg[v] / 8.0)
        assert abs(s - want) < 1e-12


def test_pga_min_communities_floor(spark):
    # a single edge: contracting it would leave 1 < min_communities clusters,
    # so the contraction is discarded and the result is singletons
    g = GraphDF.from_edge_list(spark, [(0, 1)], num_nodes=2)
    lab = _labels(parallel_agglomerative_clusterer(g))
    assert len(set(lab.values())) == 2
