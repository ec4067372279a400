import math
from collections import defaultdict

from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF
from networkit_spark.operators.community import (
    coarsen_by_partition,
    coverage,
    hub_dominance,
    jaccard_partition_measure,
    modularity,
    partition_intersection,
    rand_measure,
)
from networkit_spark.operators.linkprediction import (
    adamic_adar_index,
    common_neighbors_index,
    jaccard_index,
    missing_links,
    top_predictions,
)
from networkit_spark.operators.misc import degree_assortativity
from networkit_spark.operators.plp import plp
from networkit_spark.oracle.numpy_ref import modularity_oracle

from tests.fixtures import KARATE_EDGES, KARATE_N


def _nbrs(edges):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def test_modularity_matches_oracle(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    labels = plp(g, update_threshold=0, max_iterations=6)
    lab_map = {r["id"]: r["label"] for r in labels.collect()}
    want = modularity_oracle([(u, v, 1.0) for u, v in KARATE_EDGES], lab_map)
    got = modularity(g, labels)
    assert math.isclose(got, want, abs_tol=1e-12)


def test_modularity_self_loop_volume(spark):
    # Modularity.cpp:50 — self-loop weight counts twice in volume
    edges = [(0, 1, 1.0), (1, 1, 2.0)]
    g = GraphDF.from_edge_list(spark, edges, weighted=True, num_nodes=2)
    labels = spark.createDataFrame([(0, 0), (1, 0)], "id long, label long")
    want = modularity_oracle(edges, {0: 0, 1: 0})
    assert math.isclose(modularity(g, labels), want, abs_tol=1e-12)


def test_coverage_and_coarsen(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    labels = plp(g, update_threshold=0, max_iterations=4)
    cov = coverage(g, labels)
    assert 0.0 <= cov <= 1.0
    coarse, mapping = coarsen_by_partition(g, labels)
    # contraction preserves total edge weight (intra edges → self-loops)
    assert math.isclose(
        coarse.total_edge_weight(), g.total_edge_weight(), abs_tol=1e-9
    )
    assert coarse.number_of_nodes() == labels.select("label").distinct().count()


def test_partition_measures(spark):
    a = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "id long, label long"
    )
    b = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "id long, label long"
    )
    c = spark.createDataFrame(
        [(i, i % 5) for i in range(10)], "id long, label long"
    )
    assert rand_measure(a, b) == 0.0          # identical → zero disagreement
    assert jaccard_partition_measure(a, b) == 0.0
    assert rand_measure(a, c) > 0.0
    inter = partition_intersection(a, c)
    # refinement of both: at most |labels_a| * |labels_c| parts
    assert inter.select("label").distinct().count() <= 10
    assert inter.count() == 10


def test_hub_dominance_complete(spark):
    # complete graph, one community: dominance = 1
    edges = [(u, v) for u in range(5) for v in range(u + 1, 5)]
    g = GraphDF.from_edge_list(spark, edges, num_nodes=5)
    labels = spark.createDataFrame([(i, 0) for i in range(5)], "id long, label long")
    got = hub_dominance(g, labels).collect()
    assert len(got) == 1 and math.isclose(got[0]["dominance"], 1.0)


def test_common_neighbors_and_jaccard(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    adj = _nbrs(KARATE_EDGES)
    got_cn = {
        (r["u"], r["v"]): r["score"] for r in common_neighbors_index(g).collect()
    }
    # oracle over all pairs with >=1 common neighbor
    want = {}
    for u in range(KARATE_N):
        for v in range(u + 1, KARATE_N):
            c = len(adj[u] & adj[v])
            if c:
                want[(u, v)] = float(c)
    assert got_cn == want
    got_j = {(r["u"], r["v"]): r["score"] for r in jaccard_index(g).collect()}
    for (u, v), c in want.items():
        assert math.isclose(
            got_j[(u, v)], c / len(adj[u] | adj[v]), abs_tol=1e-12
        )


def test_adamic_adar(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    adj = _nbrs(KARATE_EDGES)
    got = {(r["u"], r["v"]): r["score"] for r in adamic_adar_index(g).collect()}
    for (u, v), s in list(got.items())[:50]:
        want = sum(1.0 / math.log(len(adj[w])) for w in adj[u] & adj[v])
        assert math.isclose(s, want, abs_tol=1e-9), (u, v)


def test_missing_links_excludes_existing(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    scores = common_neighbors_index(g)
    miss = missing_links(g, scores)
    existing = {(min(u, v), max(u, v)) for u, v in KARATE_EDGES}
    for r in miss.collect():
        assert (r["u"], r["v"]) not in existing
    top = top_predictions(miss, 5).collect()
    assert len(top) == 5
    vals = [r["score"] for r in top]
    assert vals == sorted(vals, reverse=True)


def test_degree_assortativity(spark):
    import numpy as np

    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    adj = _nbrs(KARATE_EDGES)
    deg = {v: len(adj[v]) for v in adj}
    xs, ys = [], []
    for u, v in KARATE_EDGES:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    want = float(np.corrcoef(xs, ys)[0, 1])
    got = degree_assortativity(g)
    assert math.isclose(got, want, abs_tol=1e-9)


def test_nmi_ari_gsr_vs_python_oracle(spark):
    """NMI / AdjustedRand / GraphStructuralRand vs direct formula evaluation
    (NMIDistance.cpp:17, AdjustedRandMeasure.cpp:5,
    GraphStructuralRandMeasure.cpp:12)."""
    import math as _m
    from collections import Counter

    from networkit_spark.operators.community import (
        adjusted_rand_distance,
        graph_structural_rand,
        nmi_distance,
    )

    n = KARATE_N
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=n)
    pa_py = {i: i % 4 for i in range(n)}
    pb_py = {i: (i * 7) % 3 for i in range(n)}
    pa = spark.createDataFrame(list(pa_py.items()), "id long, label long")
    pb = spark.createDataFrame(list(pb_py.items()), "id long, label long")

    cont = Counter((pa_py[i], pb_py[i]) for i in range(n))
    ca = Counter(pa_py.values())
    cb = Counter(pb_py.values())
    mi = sum(
        (c / n) * _m.log2(c * n / (ca[a] * cb[b])) for (a, b), c in cont.items()
    )
    ha = -sum((c / n) * _m.log2(c / n) for c in ca.values())
    hb = -sum((c / n) * _m.log2(c / n) for c in cb.values())
    want_nmi = 1.0 - 2.0 * mi / (ha + hb)
    assert _m.isclose(nmi_distance(pa, pb), want_nmi, abs_tol=1e-9)

    ri = sum(c * (c - 1) // 2 for c in cont.values())
    sa = sum(c * (c - 1) // 2 for c in ca.values())
    sb = sum(c * (c - 1) // 2 for c in cb.values())
    denom = n * (n - 1) / 2
    maxi, expi = 0.5 * (sa + sb), sa * sb / denom
    want_ari = 1.0 - (ri - expi) / (maxi - expi)
    assert _m.isclose(adjusted_rand_distance(pa, pb), want_ari, abs_tol=1e-9)

    agree = sum(
        1
        for (u, v) in KARATE_EDGES
        if (pa_py[u] == pa_py[v]) == (pb_py[u] == pb_py[v])
    )
    want_gsr = 1.0 - agree / len(KARATE_EDGES)
    assert _m.isclose(graph_structural_rand(g, pa, pb), want_gsr, abs_tol=1e-9)


def test_nmi_identical_partitions_zero(spark):
    from networkit_spark.operators.community import (
        adjusted_rand_distance,
        nmi_distance,
    )

    pa = spark.createDataFrame([(i, i % 5) for i in range(50)], "id long, label long")
    assert abs(nmi_distance(pa, pa)) < 1e-12
    assert abs(adjusted_rand_distance(pa, pa)) < 1e-12


def test_new_linkpred_indices_vs_python(spark):
    """KatzIndex (bounded walks), NeighborsMeasure, TotalNeighbors,
    U/V-degree, SameCommunity vs direct computation on karate."""
    import numpy as np

    from networkit_spark.operators.linkprediction import (
        katz_link_index,
        neighbors_measure_index,
        same_community_index,
        total_neighbors_index,
        two_hop_pairs,
        u_degree_index,
        v_degree_index,
    )

    n = KARATE_N
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=n)
    A = np.zeros((n, n))
    for u, v in KARATE_EDGES:
        A[u][v] = A[v][u] = 1.0
    deg = A.sum(axis=1)

    # Katz: sum beta^l A^l over l=1..3
    beta = 0.01
    S = beta * A + beta**2 * (A @ A) + beta**3 * (A @ A @ A)
    got = {
        (r["u"], r["v"]): r["score"]
        for r in katz_link_index(g, max_path_length=3, damping=beta).collect()
    }
    for (u, v), s in got.items():
        assert math.isclose(s, S[u][v], rel_tol=1e-9), (u, v)

    # NeighborsMeasure = walks2 + walks3 (self-loop-free)
    W2, W3 = A @ A, A @ A @ A
    for r in neighbors_measure_index(g).collect():
        u, v = r["u"], r["v"]
        assert math.isclose(r["score"], W2[u][v] + W3[u][v], abs_tol=1e-9), (u, v)

    # degree-family
    for r in total_neighbors_index(g).collect():
        u, v = r["u"], r["v"]
        want = deg[u] + deg[v] - W2[u][v]  # common = walks2 for simple graphs
        assert math.isclose(r["score"], want, abs_tol=1e-9), (u, v)
    pairs = two_hop_pairs(g).select("u", "v")
    for r in u_degree_index(g, pairs).collect():
        assert r["score"] == deg[r["u"]]
    for r in v_degree_index(g, pairs).collect():
        assert r["score"] == deg[r["v"]]

    # same-community against an arbitrary partition
    part = spark.createDataFrame([(i, i % 2) for i in range(n)], "id long, label long")
    for r in same_community_index(g, part, pairs).collect():
        assert r["score"] == (1.0 if r["u"] % 2 == r["v"] % 2 else 0.0)


def test_precision_recall_points(spark):
    from networkit_spark.operators.linkprediction import precision_recall_points

    scores = spark.createDataFrame(
        [(0, 1, 0.9), (0, 2, 0.8), (1, 2, 0.7), (1, 3, 0.6)],
        "u long, v long, score double",
    )
    truth = spark.createDataFrame([(0, 1), (1, 2)], "u long, v long")
    pts = {(round(r["recall"], 6), round(r["precision"], 6))
           for r in precision_recall_points(scores, truth).collect()}
    # thresholds: tp/fp cum = (1,0) (1,1) (2,1) (2,2)
    assert pts == {(0.5, 0.5), (1.0, 0.5)}
