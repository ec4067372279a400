import math

import pytest

from networkit_spark.graph import GraphDF
from networkit_spark.operators.triangles import (
    average_local_clustering_coefficient,
    global_clustering_coefficient,
    local_clustering_coefficient,
    triangle_count_total,
    triangle_counts,
    triangle_edge_score,
)
from networkit_spark.oracle.numpy_ref import lcc_oracle, triangle_counts_oracle

from tests.fixtures import (
    KARATE_EDGES,
    KARATE_N,
    KARATE_TRIANGLES_TOTAL,
    TINY_BC_EDGES,
    TINY_BC_N,
)


def test_four_cycle_has_zero_triangles(spark):
    # tiny_bc: contains 4-cycle 2-3-5-4-2 — must NOT count as triangles
    g = GraphDF.from_edge_list(spark, TINY_BC_EDGES, num_nodes=TINY_BC_N)
    assert triangle_count_total(g) == 0
    lcc = {r["id"]: r["lcc"] for r in local_clustering_coefficient(g).collect()}
    assert all(v == 0.0 for v in lcc.values())


def test_karate_triangle_counts_exact(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    assert triangle_count_total(g) == KARATE_TRIANGLES_TOTAL
    got = {r["id"]: r["triangles"] for r in triangle_counts(g).collect()}
    want = triangle_counts_oracle(KARATE_N, KARATE_EDGES)
    assert got == want


def test_karate_lcc_matches_oracle(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    got = {r["id"]: r["lcc"] for r in local_clustering_coefficient(g).collect()}
    want = lcc_oracle(KARATE_N, KARATE_EDGES)
    for v in want:
        assert math.isclose(got[v], want[v], abs_tol=1e-12)


def test_self_loops_rejected(spark):
    g = GraphDF.from_edge_list(spark, TINY_BC_EDGES + [(2, 2)], num_nodes=TINY_BC_N)
    with pytest.raises(ValueError):
        local_clustering_coefficient(g)


def test_global_and_avg_coefficients(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    want = lcc_oracle(KARATE_N, KARATE_EDGES)
    avg = sum(want.values()) / len(want)
    assert math.isclose(average_local_clustering_coefficient(g), avg, abs_tol=1e-12)
    tri = triangle_counts_oracle(KARATE_N, KARATE_EDGES)
    deg = {}
    for u, v in KARATE_EDGES:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    wedges = sum(d * (d - 1) / 2 for d in deg.values())
    want_global = 3 * KARATE_TRIANGLES_TOTAL / wedges
    assert math.isclose(global_clustering_coefficient(g), want_global, abs_tol=1e-12)


def test_triangle_edge_score(spark):
    # triangle 0-1-2 plus pendant edge 2-3
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = GraphDF.from_edge_list(spark, edges, num_nodes=4)
    got = {(r["src"], r["dst"]): r["score"] for r in triangle_edge_score(g).collect()}
    assert got == {(0, 1): 1, (1, 2): 1, (0, 2): 1, (2, 3): 0}
