"""compat.py facade: reference-API calls (networkit/centrality.pyx etc.)
must produce the same numbers as the underlying operators."""

import math

import pytest

import networkit_spark.compat as nk
from networkit_spark.graph import GraphDF

from tests.fixtures import KARATE_EDGES, KARATE_N


@pytest.fixture(scope="module")
def G(spark):
    g = nk.Graph(KARATE_N, spark=spark)
    for u, v in KARATE_EDGES:
        g.addEdge(u, v)
    return g


def test_graph_builder(G, spark):
    assert G.numberOfNodes() == KARATE_N
    assert G.numberOfEdges() == len(KARATE_EDGES)
    assert not G.isDirected()
    gdf = G.to_graphdf()
    assert isinstance(gdf, GraphDF)
    assert gdf.number_of_nodes() == KARATE_N


def test_pagerank_parity(G, spark):
    from networkit_spark.operators.pagerank import pagerank

    pr = nk.centrality.PageRank(G, damp=0.85).run()
    scores = pr.scores()
    assert len(scores) == KARATE_N
    direct = {r["id"]: r["score"]
              for r in pagerank(G.to_graphdf(), damping=0.85).collect()}
    for i, s in enumerate(scores):
        # separate runs: float agg order differs across partitionings
        assert math.isclose(s, direct[i], rel_tol=1e-6)
    # ranking is sorted desc
    rk = pr.ranking()
    assert rk[0][1] == max(scores)
    assert rk[0][0] == 33  # karate's top hub


def test_degree_and_core(G):
    dc = nk.centrality.DegreeCentrality(G).run()
    assert dc.score(33) == 17.0
    cd = nk.centrality.CoreDecomposition(G).run()
    assert cd.maxCoreNumber() == 4
    assert cd.getPartition().numberOfSubsets() == 4  # karate cores 1..4


def test_components(G):
    cc = nk.components.ConnectedComponents(G).run()
    assert cc.numberOfComponents() == 1
    assert cc.componentOfNode(0) == cc.componentOfNode(33)
    sizes = cc.getComponentSizes()
    assert sum(sizes.values()) == KARATE_N


def test_community(G):
    part = nk.community.detectCommunities(G, algo=nk.community.PLM(G))
    assert isinstance(part, nk.Partition)
    vec = part.getVector()
    assert len(vec) == KARATE_N
    q = nk.community.Modularity().getQuality(part, G)
    assert 0.2 < q <= 1.0


def test_bfs_distance(G):
    bfs = nk.distance.BFS(G, 0).run()
    d = bfs.getDistances()
    assert d[0] == 0.0
    assert d[33] == 2.0  # karate: 0→31→33 (0 and 33 not adjacent)
    bb = nk.distance.BidirectionalBFS(G, 0, 33).run()
    assert bb.getDistance() == 2.0


def test_graphtools(G, spark):
    assert nk.graphtools.maxDegree(G) == 17
    n, m = nk.graphtools.size(G)
    assert (n, m) == (KARATE_N, len(KARATE_EDGES))
    assert nk.graphtools.volume(G) == 2.0 * len(KARATE_EDGES)
    sub = nk.graphtools.subgraphFromNodes(G, [0, 1, 2, 3])
    assert sub.number_of_nodes() == 4


def test_read_write_roundtrip(G, spark, tmp_path):
    p = str(tmp_path / "g.edgelist")
    nk.writeGraph(G, p, nk.Format.EdgeListSpaceZero)
    back = nk.readGraph(p, nk.Format.EdgeListSpaceZero, spark=spark)
    assert back.number_of_edges() == len(KARATE_EDGES)


def test_run_required(G):
    pr = nk.centrality.PageRank(G)
    assert not pr.hasFinished()
    with pytest.raises(RuntimeError):
        pr.scores()


def test_overview(G):
    prof = nk.overview(G)
    assert prof["nodes"] == KARATE_N
