from networkit_spark.graph import GraphDF
from networkit_spark.operators.anf import (
    effective_diameter_sketch,
    neighborhood_function_approx,
)
from networkit_spark.operators.bfs import effective_diameter_approx

from tests.fixtures import KARATE_EDGES, KARATE_N


def test_neighborhood_function_monotone_and_bounded(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    nf = neighborhood_function_approx(g, replicas=16)
    assert len(nf) >= 2
    assert all(b >= a - 1e-6 for a, b in zip(nf, nf[1:]))  # monotone
    true_pairs = KARATE_N * (KARATE_N - 1)  # connected graph, ordered pairs
    assert 0.2 * true_pairs < nf[-1] < 5 * true_pairs  # sketch ballpark


def test_effective_diameter_sketch_vs_exact(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    exact = effective_diameter_approx(g, ratio=0.9)  # BFS-exact variant
    sk = effective_diameter_sketch(g, ratio=0.9, replicas=16)
    assert 1.0 <= sk <= 8.0
    assert abs(sk - exact) <= 2.5  # sketch within a couple hops of exact
