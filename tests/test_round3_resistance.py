"""CommuteTimeDistance + SpanningEdgeCentrality vs numpy pinv oracles."""

import math

import numpy as np
import pytest

from networkit_spark.graph import GraphDF
from tests.fixtures import KARATE_EDGES, KARATE_N, TINY_BC_EDGES, TINY_BC_N


def _lap_pinv(edges, n):
    L = np.zeros((n, n))
    for u, v in edges:
        L[u, u] += 1
        L[v, v] += 1
        L[u, v] -= 1
        L[v, u] -= 1
    return np.linalg.pinv(L)


@pytest.fixture(scope="module")
def karate(spark):
    return GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)


def test_commute_time_distance_karate(spark, karate):
    from networkit_spark.operators.resistance import commute_time_distance

    Lp = _lap_pinv(KARATE_EDGES, KARATE_N)
    vol = 2.0 * len(KARATE_EDGES)
    for u, v in [(0, 33), (5, 20)]:
        r = Lp[u, u] + Lp[v, v] - 2 * Lp[u, v]
        want = math.sqrt(r * vol)
        got = commute_time_distance(karate, u, v)
        assert got == pytest.approx(want, rel=1e-6), (u, v)


def test_spanning_edge_exact_tiny(spark):
    from networkit_spark.operators.resistance import spanning_edge_centrality

    g = GraphDF.from_edge_list(spark, TINY_BC_EDGES, num_nodes=TINY_BC_N)
    Lp = _lap_pinv(TINY_BC_EDGES, TINY_BC_N)
    got = {
        (r["src"], r["dst"]): r["score"]
        for r in spanning_edge_centrality(g).collect()
    }
    assert len(got) == len(TINY_BC_EDGES)
    for u, v in TINY_BC_EDGES:
        want = Lp[u, u] + Lp[v, v] - 2 * Lp[u, v]
        assert got[(u, v)] == pytest.approx(want, rel=1e-6), (u, v)


def test_effective_resistance_jl_karate(spark, karate):
    from networkit_spark.operators.resistance import (
        effective_resistance_approx,
    )

    Lp = _lap_pinv(KARATE_EDGES, KARATE_N)
    got = {
        (r["src"], r["dst"]): r["score"]
        for r in effective_resistance_approx(karate, eps=0.4, seed=3).collect()
    }
    assert len(got) == len(KARATE_EDGES)
    # JL guarantee is (1±eps) w.h.p.; allow a generous factor on the tiny
    # fixture, and require the AVERAGE relative error to be small
    rel_errs = []
    for u, v in KARATE_EDGES:
        want = Lp[u, u] + Lp[v, v] - 2 * Lp[u, v]
        rel_errs.append(abs(got[(u, v)] - want) / want)
        assert got[(u, v)] == pytest.approx(want, rel=0.9), (u, v)
    assert float(np.mean(rel_errs)) < 0.35
