"""compat facade round-4 additions: sparsification Sparsifiers,
linkprediction index classes, community.ParallelAgglomerativeClusterer."""

import math

import networkit_spark.compat as nk
from networkit_spark.graph import GraphDF
from networkit_spark.operators.linkprediction import (
    adjusted_rand_link_index,
)

from tests.fixtures import KARATE_EDGES, KARATE_N


def _karate(spark):
    g = nk.Graph(KARATE_N, spark=spark)
    for u, v in KARATE_EDGES:
        g.addEdge(u, v)
    return g


def test_compat_sparsifiers(spark):
    g = _karate(spark)
    m = len(KARATE_EDGES)
    for cls, args in [
        (nk.sparsification.SimmelianSparsifierNonParametric, (0.3,)),
        (nk.sparsification.RandomSparsifier, (0.5,)),
        (nk.sparsification.MultiscaleSparsifier, (0.5,)),
    ]:
        sub = cls(g, *args).run().getGraph()
        assert isinstance(sub, GraphDF)
        assert 0 < sub.number_of_edges() <= m


def test_compat_sparsifier_requires_run(spark):
    g = _karate(spark)
    s = nk.sparsification.RandomSparsifier(g, 0.5)
    try:
        s.getGraph()
        assert False, "expected RuntimeError"
    except RuntimeError:
        pass


def test_compat_adjusted_rand_probe(spark):
    g = _karate(spark)
    idx = nk.linkprediction.AdjustedRandIndex(g)
    gdf = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    want = {
        (r["u"], r["v"]): r["score"]
        for r in adjusted_rand_link_index(gdf).collect()
    }
    (u, v) = next(iter(want))
    assert math.isclose(idx.run(u, v), want[(u, v)], abs_tol=1e-12)
    # frame() returns the full two-hop score table
    assert idx.frame().count() == len(want)


def test_compat_common_neighbors_probe(spark):
    g = _karate(spark)
    idx = nk.linkprediction.CommonNeighborsIndex(g)
    # karate: 0 and 33 are not adjacent; their common neighbors: 8,13,19,31
    assert idx.run(0, 33) == 4.0


def test_compat_pga(spark):
    g = _karate(spark)
    part = nk.community.ParallelAgglomerativeClusterer(g).run().getPartition()
    sizes = part.subsetSizes()
    assert sum(sizes) == KARATE_N
    assert 2 <= len(sizes) < KARATE_N
