"""Round-4 parity fills: Sparsifier compositions (Sparsifiers.cpp),
GraphClusteringTools utilities, EdgeListCoverReader."""

from collections import defaultdict

from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF
from networkit_spark.operators.community import (
    communication_graph,
    equal_clusterings,
    is_one_clustering,
    is_proper_clustering,
    is_singleton_clustering,
    weighted_degree_with_cluster,
)
from networkit_spark.operators.sparsification import (
    local_similarity_sparsifier,
    multiscale_sparsifier,
    random_sparsifier,
    simmelian_multiscale_sparsifier,
    simmelian_sparsifier_non_parametric,
    simmelian_sparsifier_parametric,
)
from networkit_spark.sources.readers import read_edgelist_cover

from tests.fixtures import KARATE_EDGES, KARATE_N


def _karate(spark):
    return GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)


# ----------------------------------------------------------------- sparsifiers


def test_sparsifiers_are_subgraphs(spark):
    g = _karate(spark)
    m = g.number_of_edges()
    orig = {(r["src"], r["dst"]) for r in g.E.select("src", "dst").collect()}
    for sub in [
        simmelian_sparsifier_non_parametric(g, 0.3),
        simmelian_sparsifier_parametric(g, max_rank=5, min_overlap=1),
        multiscale_sparsifier(g, 0.5),
        local_similarity_sparsifier(g, 0.5),
        simmelian_multiscale_sparsifier(g, 0.5),
        random_sparsifier(g, 0.5),
    ]:
        kept = {
            (r["src"], r["dst"]) for r in sub.E.select("src", "dst").collect()
        }
        assert kept <= {(min(u, v), max(u, v)) for u, v in orig}
        assert 0 < len(kept) <= m
        assert sub.number_of_nodes() == KARATE_N  # nodes preserved


def test_random_sparsifier_threshold_monotone(spark):
    g = _karate(spark)
    low = random_sparsifier(g, 0.2).number_of_edges()
    high = random_sparsifier(g, 0.8).number_of_edges()
    assert high <= low  # keeping score >= t shrinks as t grows


# ------------------------------------------------------- GraphClusteringTools


def test_communication_graph(spark):
    # two triangles joined by one bridge; cluster = triangle
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = GraphDF.from_edge_list(spark, edges, num_nodes=6)
    part = spark.createDataFrame(
        [(i, 10 if i < 3 else 20) for i in range(6)], "id long, label long"
    )
    cg = communication_graph(g, part)
    assert cg.number_of_nodes() == 2
    rows = cg.E.collect()
    assert len(rows) == 1
    assert (rows[0]["src"], rows[0]["dst"], rows[0]["weight"]) == (0, 1, 1.0)


def test_weighted_degree_with_cluster(spark):
    edges = [(0, 1, 2.0), (0, 2, 3.0), (1, 2, 1.0)]
    g = GraphDF.from_edge_list(spark, edges, weighted=True, num_nodes=3)
    part = spark.createDataFrame(
        [(0, 7), (1, 7), (2, 9)], "id long, label long"
    )
    got = {
        (r["id"], r["cid"]): r["wdeg"]
        for r in weighted_degree_with_cluster(g, part).collect()
    }
    assert got == {
        (0, 7): 2.0,
        (0, 9): 3.0,
        (1, 7): 2.0,
        (1, 9): 1.0,
        (2, 7): 4.0,
    }


def test_clustering_predicates(spark):
    g = _karate(spark)
    singles = g.V.selectExpr("id", "id AS label")
    ones = g.V.selectExpr("id", "0 AS label")
    assert is_proper_clustering(g, singles)
    assert is_singleton_clustering(g, singles)
    assert not is_one_clustering(g, singles)
    assert is_one_clustering(g, ones)
    assert not is_singleton_clustering(g, ones)
    # missing a node -> not proper
    assert not is_proper_clustering(g, singles.filter("id != 0"))
    # duplicate assignment -> not proper
    dup = singles.unionByName(
        spark.createDataFrame([(0, 99)], "id long, label long")
    )
    assert not is_proper_clustering(g, dup)


def test_equal_clusterings_edge_restricted(spark):
    edges = [(0, 1), (1, 2)]
    g = GraphDF.from_edge_list(spark, edges, num_nodes=3)
    a = spark.createDataFrame([(0, 1), (1, 1), (2, 2)], "id long, label long")
    # same edge-wise split, different label values -> equal
    b = spark.createDataFrame([(0, 5), (1, 5), (2, 6)], "id long, label long")
    assert equal_clusterings(g, a, b)
    # merge across the (1,2) edge -> unequal
    c = spark.createDataFrame([(0, 5), (1, 5), (2, 5)], "id long, label long")
    assert not equal_clusterings(g, a, c)


# --------------------------------------------------------- EdgeListCoverReader


def test_read_edgelist_cover(spark, tmp_path):
    p = tmp_path / "cover.txt"
    p.write_text("# comment\n1 0 2\n2 1\n3 0 1 2\n")
    rows = {
        (r["id"], r["subset"])
        for r in read_edgelist_cover(spark, str(p)).collect()
    }
    assert rows == {
        (0, 0), (0, 2),
        (1, 1),
        (2, 0), (2, 1), (2, 2),
    }


def test_chiba_nishizeki_alias(spark):
    from networkit_spark.operators.triangles import (
        chiba_nishizeki_triangle_edge_score,
        triangle_edge_score,
    )

    g = _karate(spark)
    a = {
        (r["src"], r["dst"]): r["score"]
        for r in chiba_nishizeki_triangle_edge_score(g).collect()
    }
    b = {
        (r["src"], r["dst"]): r["score"]
        for r in triangle_edge_score(g).collect()
    }
    assert a == b and len(a) == len(KARATE_EDGES)
