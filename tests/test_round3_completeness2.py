"""Round-3 completeness batch 2: EdgeCut, CoverHubDominance, sampled Rand
measures, ClusteringProjector, MatchingCoarsening, BidirectionalDijkstra,
NeighborhoodFunctionHeuristic, EdgeListPartitionReader."""

import math
import os

from networkit_spark.graph import GraphDF
from networkit_spark.operators.community import (
    cover_hub_dominance,
    edge_cut,
    graph_structural_rand,
    matching_coarsening,
    project_partition_back,
    sampled_graph_structural_rand,
    sampled_node_structural_rand,
)
from networkit_spark.operators.bfs import (
    bidirectional_dijkstra,
    neighborhood_function_exact,
    neighborhood_function_heuristic,
    sssp_distances,
)

from tests.fixtures import KARATE_EDGES, KARATE_N


def _partition(spark, labels):
    return spark.createDataFrame(
        [(i, l) for i, l in enumerate(labels)], "id long, label long"
    )


def test_edge_cut(spark):
    # square 0-1-2-3-0 with weights; split {0,1} vs {2,3} cuts 1-2 and 3-0
    v = spark.createDataFrame([(i,) for i in range(4)], "id long")
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 4.0), (0, 3, 8.0)],
        "src long, dst long, weight double",
    )
    g = GraphDF(v, e, weighted=True)
    p = _partition(spark, [0, 0, 1, 1])
    assert edge_cut(g, p) == 10.0
    assert edge_cut(g, _partition(spark, [0, 0, 0, 0])) == 0.0


def test_cover_hub_dominance(spark):
    # triangle 0-1-2 plus pendant 3 on 0; overlapping cover:
    # subset 0 = {0,1,2} (hub deg 2, size 3 -> 1.0)
    # subset 1 = {0,3}   (internal deg 1, size 2 -> 1.0)
    # subset 2 = {1,3}   (no internal edge, size 2 -> 0.0)
    g = GraphDF.from_edge_list(
        spark, [(0, 1), (1, 2), (0, 2), (0, 3)], num_nodes=4
    )
    cover = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (0, 1), (3, 1), (1, 2), (3, 2)],
        "id long, subset long",
    )
    got = {r["subset"]: r["dominance"]
           for r in cover_hub_dominance(g, cover).collect()}
    assert got[0] == 1.0 and got[1] == 1.0 and got[2] == 0.0


def test_sampled_rand_measures_agree_with_exact_on_full_sample(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    a = _partition(spark, [i % 3 for i in range(KARATE_N)])
    b = _partition(spark, [i % 2 for i in range(KARATE_N)])
    # graph-structural: sampling >= m edges == the exact measure
    exact = graph_structural_rand(g, a, b)
    samp = sampled_graph_structural_rand(g, a, b, n_samples=10_000)
    assert math.isclose(samp, exact, abs_tol=1e-12)
    # node-structural: identical partitions -> dissimilarity 0 at any sample
    assert sampled_node_structural_rand(g, a, a, n_samples=20) == 0.0
    # and bounded in [0, 1] on different ones
    d = sampled_node_structural_rand(g, a, b, n_samples=20, seed=7)
    assert 0.0 <= d <= 1.0
    # deterministic under the same seed
    assert d == sampled_node_structural_rand(g, a, b, n_samples=20, seed=7)


def test_project_partition_back(spark):
    f2c = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, super_id long"
    )
    coarse = spark.createDataFrame([(0, 7), (1, 9)], "id long, label long")
    got = {r["id"]: r["label"]
           for r in project_partition_back(f2c, coarse).collect()}
    assert got == {0: 7, 1: 7, 2: 9, 3: 9}


def test_matching_coarsening(spark):
    # path 0-1-2-3 (weights 1,2,3), matching {(0,1),(2,3)}
    v = spark.createDataFrame([(i,) for i in range(4)], "id long")
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0)],
        "src long, dst long, weight double",
    )
    g = GraphDF(v, e, weighted=True)
    m = spark.createDataFrame([(0, 1), (2, 3)], "src long, dst long")
    cg, mapping = matching_coarsening(g, m)
    mp = {r["id"]: r["super_id"] for r in mapping.collect()}
    assert mp[0] == mp[1] and mp[2] == mp[3] and mp[0] != mp[2]
    ce = {(r["src"], r["dst"]): r["weight"] for r in cg.E.collect()}
    a, b = mp[0], mp[2]
    # intra-pair edges fold to self loops; 1-2 becomes the inter edge
    assert ce[(a, a)] == 1.0 and ce[(b, b)] == 3.0
    assert ce[(min(a, b), max(a, b))] == 2.0
    cg2, _ = matching_coarsening(g, m, no_self_loops=True)
    assert cg2.E.count() == 1


def test_bidirectional_dijkstra(spark):
    v = spark.createDataFrame([(i,) for i in range(5)], "id long")
    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (0, 4, 3.5)],
        "src long, dst long, weight double",
    )
    g = GraphDF(v, e, weighted=True)
    assert bidirectional_dijkstra(g, 0, 4) == 3.5
    assert bidirectional_dijkstra(g, 0, 3) == 3.0
    assert bidirectional_dijkstra(g, 2, 2) == 0.0
    # parity with the full SSSP on karate with seeded weights
    kw = [(u, v, 1.0 + ((u * 7 + v) % 5)) for u, v in KARATE_EDGES]
    vk = spark.createDataFrame([(i,) for i in range(KARATE_N)], "id long")
    gk = GraphDF(
        vk,
        spark.createDataFrame(kw, "src long, dst long, weight double"),
        weighted=True,
    )
    want = {r["id"]: r["dist"] for r in sssp_distances(gk, 0).collect()}
    for t in (5, 16, 26, 33):
        assert math.isclose(bidirectional_dijkstra(gk, 0, t), want[t],
                            abs_tol=1e-9)
    # unreachable
    g2 = GraphDF.from_edge_list(spark, [(0, 1)], num_nodes=4)
    assert bidirectional_dijkstra(g2, 0, 3) is None


def test_neighborhood_function_heuristic(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    # full sample == exact NF at every h
    exact = {r["h"]: r["count"]
             for r in neighborhood_function_exact(g).collect()}
    got = {r["h"]: r["count"]
           for r in neighborhood_function_heuristic(
               g, n_samples=KARATE_N).collect()}
    assert got == exact
    # sampled: monotone, pinned endpoints
    got8 = [(r["h"], r["count"])
            for r in neighborhood_function_heuristic(
                g, n_samples=8, seed=3).orderBy("h").collect()]
    assert got8[0][1] == 2 * len(KARATE_EDGES)
    assert got8[-1][1] == KARATE_N * (KARATE_N - 1)
    # monotone over the scaled interior; the reference pins the final
    # value to exact n(n-1) AFTER scaling, so the last step may dip
    # (NeighborhoodFunctionHeuristic.cpp:75-80 has the same artifact)
    interior = got8[:-1]
    assert all(b[1] >= a[1] for a, b in zip(interior, interior[1:]))


def test_read_edgelist_partition(spark, tmp_path):
    p = os.path.join(str(tmp_path), "part.txt")
    with open(p, "w") as f:
        f.write("# comment\n1 10\n2 10\n3 20\n")
    from networkit_spark.sources.readers import read_edgelist_partition

    got = {r["id"]: r["label"]
           for r in read_edgelist_partition(spark, p, first_node=1).collect()}
    assert got == {0: 10, 1: 10, 2: 20}


def test_near_dup_survivors(spark):
    from networkit_spark.functions.dedup import near_dup_survivors

    # pairs chain 1~2, 2~3 (transitive) and isolated pair 5~9; 7 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 9)], "id_a long, id_b long"
    )
    ids = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 5, 7, 9)], "doc_id long"
    )
    got = {r["id"]: (r["survivor"], r["is_survivor"])
           for r in near_dup_survivors(pairs, ids).collect()}
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        5: (5, True), 9: (5, False), 7: (7, True),
    }


def test_trigram_logprob_score(spark):
    import math as _math

    from networkit_spark.functions.text import trigram_logprob_score

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd"), (3, "x")], "doc_id long, text string"
    )
    got = {r["id"]: r["score"]
           for r in trigram_logprob_score(df).collect()}
    # corpus trigrams: "aaa"×2 (from aaaa), "abc", "bcd" — tot 4, vocab 3
    tot, vocab = 4, 3
    p_aa = (2 + 1) / (tot + vocab)
    exp1 = round(_math.log(p_aa), 6)
    p_1 = (1 + 1) / (tot + vocab)
    exp2 = round(_math.log(p_1), 6)
    assert _math.isclose(got[1], exp1, abs_tol=1e-6)
    assert _math.isclose(got[2], exp2, abs_tol=1e-6)
    assert got[3] == 0.0  # too short for a trigram
    # repetitive text scores higher than diverse text under the corpus LM
    assert got[1] > got[2]
