import math

from networkit_spark.graph import GraphDF
from networkit_spark.operators.community import modularity
from networkit_spark.operators.dynamics import DynConnectedComponents, DynPageRank
from networkit_spark.operators.plm import plm
from networkit_spark.operators.scd import page_rank_nibble, personalized_pagerank
from networkit_spark.oracle.numpy_ref import pagerank_oracle
from networkit_spark.streaming.events import events_from_list

from tests.fixtures import KARATE_EDGES, KARATE_N


def test_plm_improves_modularity(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    labels = plm(g)
    assert labels.count() == KARATE_N
    q = modularity(g, labels)
    assert q > 0.3  # Louvain on karate typically ~0.40-0.42
    k = labels.select("label").distinct().count()
    assert 2 <= k <= 10


def test_plm_two_cliques(spark):
    # two 5-cliques joined by one edge → exactly 2 communities
    edges = (
        [(u, v) for u in range(5) for v in range(u + 1, 5)]
        + [(u, v) for u in range(5, 10) for v in range(u + 1, 10)]
        + [(4, 5)]
    )
    g = GraphDF.from_edge_list(spark, edges, num_nodes=10)
    labels = {r["id"]: r["label"] for r in plm(g).collect()}
    assert len({labels[i] for i in range(5)}) == 1
    assert len({labels[i] for i in range(5, 10)}) == 1
    assert labels[0] != labels[9]


def test_personalized_pagerank_concentrates_on_seed(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    ppr = {r["id"]: r["score"] for r in personalized_pagerank(g, [0], tol=1e-9).collect()}
    assert math.isclose(sum(ppr.values()), 1.0, abs_tol=1e-9)
    assert ppr[0] == max(ppr.values())  # seed holds the most mass
    # mass decays with distance: direct neighbor of 0 ≫ far node
    assert ppr[1] > ppr[26]


def test_page_rank_nibble_finds_local_community(spark):
    # two 6-cliques with one bridge: nibble from node 0 → its clique
    edges = (
        [(u, v) for u in range(6) for v in range(u + 1, 6)]
        + [(u, v) for u in range(6, 12) for v in range(u + 1, 12)]
        + [(5, 6)]
    )
    g = GraphDF.from_edge_list(spark, edges, num_nodes=12)
    com = {r["id"] for r in page_rank_nibble(g, seed=0).collect()}
    assert com == set(range(6))


def test_dyn_pagerank_update(spark):
    g = GraphDF.from_edge_list(spark, [(0, 1), (1, 2)], num_nodes=3)
    dyn = DynPageRank(g, tol=1e-10)
    ev = events_from_list(
        spark,
        [
            (0, "NODE_ADDITION", 3, None, None),
            (1, "EDGE_ADDITION", 2, 3, 1.0),
        ],
    )
    res = {r["id"]: r["score"] for r in dyn.update(ev).collect()}
    want = pagerank_oracle(
        4, [(0, 1), (1, 2), (2, 3)], directed=False, tol=1e-10
    )
    for v in want:
        assert math.isclose(res[v], want[v], abs_tol=1e-7), v


def test_dyn_cc_update(spark):
    g = GraphDF.from_edge_list(spark, [(0, 1), (2, 3)], num_nodes=4)
    dyn = DynConnectedComponents(g)
    assert dyn.result.select("component").distinct().count() == 2
    ev = events_from_list(spark, [(0, "EDGE_ADDITION", 1, 2, 1.0)])
    res = dyn.update(ev)
    assert res.select("component").distinct().count() == 1


def test_incremental_wcc_additions(spark):
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.dynamics import incremental_wcc_additions

    # two components 0-1-2 and 3-4; adding (2,3) merges them
    g = GraphDF.from_edge_list(spark, [(0, 1), (1, 2), (3, 4)], num_nodes=5)
    labels = connected_components(g)
    new_e = spark.createDataFrame([(2, 3)], "src long, dst long")
    got = {r["id"]: r["component"]
           for r in incremental_wcc_additions(labels, new_e).collect()}
    g2 = GraphDF.from_edge_list(
        spark, [(0, 1), (1, 2), (3, 4), (2, 3)], num_nodes=5
    )
    want = {r["id"]: r["component"] for r in connected_components(g2).collect()}
    assert got == want
    # intra-component addition: no change
    same = {r["id"]: r["component"] for r in incremental_wcc_additions(
        labels, spark.createDataFrame([(0, 2)], "src long, dst long")
    ).collect()}
    assert same == {r["id"]: r["component"] for r in labels.collect()}


def test_incremental_wcc_removals(spark):
    from networkit_spark.operators.components import connected_components
    from networkit_spark.operators.dynamics import incremental_wcc_removals

    # path 0-1-2-3 plus component 4-5; removing (1,2) SPLITS the path and
    # the new dense ids must interleave across the untouched component
    # ({2,3}'s min id 2 ranks BEFORE {4,5}'s min id 4)
    g = GraphDF.from_edge_list(
        spark, [(0, 1), (1, 2), (2, 3), (4, 5)], num_nodes=6
    )
    labels = connected_components(g)
    g_new = GraphDF.from_edge_list(
        spark, [(0, 1), (2, 3), (4, 5)], num_nodes=6
    )
    rem = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r["id"]: r["component"]
           for r in incremental_wcc_removals(labels, g_new, rem).collect()}
    want = {r["id"]: r["component"]
            for r in connected_components(g_new).collect()}
    assert got == want
    # non-splitting removal (triangle keeps its component): no change
    g_tri = GraphDF.from_edge_list(
        spark, [(0, 1), (1, 2), (0, 2), (4, 5)], num_nodes=6
    )
    tri_labels = connected_components(g_tri)
    g_tri_new = GraphDF.from_edge_list(
        spark, [(1, 2), (0, 2), (4, 5)], num_nodes=6
    )
    same = {r["id"]: r["component"] for r in incremental_wcc_removals(
        tri_labels, g_tri_new,
        spark.createDataFrame([(0, 1)], "src long, dst long"),
    ).collect()}
    assert same == {r["id"]: r["component"] for r in tri_labels.collect()}


def test_dyn_cc_removal_event(spark):
    from networkit_spark.operators.components import connected_components

    g = GraphDF.from_edge_list(
        spark, [(0, 1), (1, 2), (2, 3), (4, 5)], num_nodes=6
    )
    dyn = DynConnectedComponents(g)
    ev = events_from_list(spark, [(0, "EDGE_REMOVAL", 1, 2, None)])
    res = {r["id"]: r["component"] for r in dyn.update(ev).collect()}
    want = {r["id"]: r["component"]
            for r in connected_components(dyn.graph).collect()}
    assert res == want
    assert len(set(res.values())) == 3


def test_gce_expands_seed_community(spark):
    """GCE objective-M vs a direct greedy oracle on a two-clique barbell."""
    from networkit_spark.operators.scd import gce

    # two 4-cliques joined by a single bridge edge
    cl1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    cl2 = [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
    edges = cl1 + cl2 + [(3, 4)]
    g = GraphDF.from_edge_list(spark, edges, num_nodes=8)
    out = gce(g, seeds=[0, 7])
    comm = {}
    for r in out.collect():
        comm.setdefault(r["seed"], set()).add(r["id"])
    assert comm[0] == {0, 1, 2, 3}   # stops before crossing the bridge
    assert comm[7] == {4, 5, 6, 7}
