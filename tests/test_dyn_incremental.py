"""True-incremental Dyn* paths vs recompute oracles (distance/DynBFS.cpp,
DynDijkstra.cpp, components/DynConnectedComponents.cpp, batch triangle
delta-counting)."""

import math

from networkit_spark.graph import GraphDF
from networkit_spark.operators.dynamics import (
    DynBFS,
    DynDijkstra,
    DynTriangleCount,
    incremental_sssp_additions,
    incremental_triangle_additions,
    incremental_triangle_removals,
)
from networkit_spark.operators.triangles import triangle_counts
from networkit_spark.operators.bfs import bfs_distances, sssp_multi_distances
from networkit_spark.streaming.events import events_from_list

from tests.fixtures import KARATE_EDGES, KARATE_N


def _counts(df):
    return {r["id"]: r["triangles"] for r in df.collect()}


def _dists(df):
    return {(r["source"], r["id"]): r["dist"] for r in df.collect()}


def test_incremental_triangle_additions_matches_recompute(spark):
    # old graph: karate minus a batch that includes single-new-edge,
    # two-new-edges-sharing-a-triangle, and an all-new triangle on 40-42
    batch = [(0, 1), (0, 2), (32, 33), (40, 41), (41, 42), (40, 42)]
    old_edges = [e for e in KARATE_EDGES if e not in batch]
    g_old = GraphDF.from_edge_list(spark, old_edges, num_nodes=43)
    g_new = GraphDF.from_edge_list(
        spark, old_edges + batch, num_nodes=43
    )
    before = triangle_counts(g_old)
    b = spark.createDataFrame(batch, "src long, dst long")
    got = _counts(incremental_triangle_additions(before, g_new, b))
    want = _counts(triangle_counts(g_new))
    assert got == want


def test_incremental_triangle_removals_matches_recompute(spark):
    batch = [(0, 1), (0, 2), (2, 3), (32, 33)]
    g_old = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    kept = [e for e in KARATE_EDGES if e not in batch]
    g_new = GraphDF.from_edge_list(spark, kept, num_nodes=KARATE_N)
    before = triangle_counts(g_old)
    b = spark.createDataFrame(batch, "src long, dst long")
    got = _counts(incremental_triangle_removals(before, g_old, b))
    want = _counts(triangle_counts(g_new))
    assert got == want


def test_dyn_triangle_count_routes_incrementally(spark):
    g = GraphDF.from_edge_list(
        spark, [(0, 1), (1, 2), (2, 3)], num_nodes=5
    )
    dyn = DynTriangleCount(g)
    # additions-only batch: closes triangle 0-1-2 and re-adds existing 1-2
    ev = events_from_list(
        spark,
        [
            (0, "EDGE_ADDITION", 0, 2, 1.0),
            (1, "EDGE_ADDITION", 1, 2, 1.0),
            (2, "EDGE_ADDITION", 3, 4, 1.0),
        ],
    )
    got = _counts(dyn.update(ev))
    want = _counts(triangle_counts(dyn.graph))
    assert got == want
    assert got[0] == 1 and got[4] == 0
    # removals-only batch, including a non-existent edge (no-op)
    ev2 = events_from_list(
        spark,
        [
            (0, "EDGE_REMOVAL", 0, 2, None),
            (1, "EDGE_REMOVAL", 0, 4, None),
        ],
    )
    got2 = _counts(dyn.update(ev2))
    want2 = _counts(triangle_counts(dyn.graph))
    assert got2 == want2
    assert got2[0] == 0


def test_incremental_bfs_additions_matches_recompute(spark):
    # path 0-1-2-3-4-5 plus island 6-7; add shortcut (0,4) and bridge (5,6)
    old_edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (6, 7)]
    g_old = GraphDF.from_edge_list(spark, old_edges, num_nodes=8)
    new_e = [(0, 4), (5, 6)]
    g_new = GraphDF.from_edge_list(spark, old_edges + new_e, num_nodes=8)
    sources = [0, 2]
    before = bfs_distances(g_old, sources)
    b = spark.createDataFrame(new_e, "src long, dst long")
    got = _dists(incremental_sssp_additions(before, g_new, b))
    want = _dists(bfs_distances(g_new, sources))
    assert got == want
    # the island was unreached before; now reached through the bridge
    # (0 →(new) 4 → 5 →(new) 6 → 7)
    assert got[(0, 7)] == 4


def test_incremental_sssp_weighted_matches_recompute(spark):
    old_edges = [
        (0, 1, 1.0), (1, 2, 2.0), (2, 3, 1.0), (0, 3, 10.0),
    ]
    new_e = [(0, 2, 0.5)]
    v = spark.createDataFrame([(i,) for i in range(4)], "id long")
    g_old = GraphDF(
        v, spark.createDataFrame(old_edges, "src long, dst long, weight double"),
        weighted=True,
    )
    g_new = GraphDF(
        v,
        spark.createDataFrame(
            old_edges + new_e, "src long, dst long, weight double"
        ),
        weighted=True,
    )
    before = sssp_multi_distances(g_old, [0])
    b = spark.createDataFrame(new_e, "src long, dst long, weight double")
    got = _dists(incremental_sssp_additions(before, g_new, b, weighted=True))
    want = _dists(sssp_multi_distances(g_new, [0]))
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], abs_tol=1e-9), k
    assert math.isclose(got[(0, 3)], 1.5, abs_tol=1e-9)


def test_dyn_bfs_and_dijkstra_update(spark):
    g = GraphDF.from_edge_list(spark, [(0, 1), (1, 2), (3, 4)], num_nodes=5)
    dyn = DynBFS(g, sources=[0])
    assert (0, 4) not in _dists(dyn.result)
    ev = events_from_list(spark, [(0, "EDGE_ADDITION", 2, 3, 1.0)])
    got = _dists(dyn.update(ev))
    assert got == _dists(bfs_distances(dyn.graph, [0]))
    assert got[(0, 4)] == 4

    vdf = spark.createDataFrame([(i,) for i in range(3)], "id long")
    gw = GraphDF(
        vdf,
        spark.createDataFrame(
            [(0, 1, 4.0), (1, 2, 4.0)], "src long, dst long, weight double"
        ),
        weighted=True,
    )
    dyn2 = DynDijkstra(gw, sources=[0])
    ev2 = events_from_list(spark, [(0, "EDGE_ADDITION", 0, 2, 1.5)])
    got2 = _dists(dyn2.update(ev2))
    assert math.isclose(got2[(0, 2)], 1.5, abs_tol=1e-9)
    assert math.isclose(got2[(0, 1)], 4.0, abs_tol=1e-9)


def test_dyn_apsp_update_matches_recompute(spark):
    from networkit_spark.operators.dynamics import DynAPSP

    g = GraphDF.from_edge_list(spark, [(0, 1), (1, 2), (3, 4)], num_nodes=5)
    dyn = DynAPSP(g)
    # add node 5 and edges bridging everything
    ev = events_from_list(
        spark,
        [
            (0, "NODE_ADDITION", 5, None, None),
            (1, "EDGE_ADDITION", 2, 3, 1.0),
            (2, "EDGE_ADDITION", 4, 5, 1.0),
        ],
    )
    got = _dists(dyn.update(ev))
    want = _dists(bfs_distances(dyn.graph, dyn.graph.V.select("id")))
    assert got == want
    assert got[(0, 5)] == 5 and got[(5, 0)] == 5


def test_dyn_top_harmonic_closeness(spark):
    from networkit_spark.operators.dynamics import DynTopHarmonicCloseness

    def want(graph, k):
        d = bfs_distances(graph, graph.V.select("id")).collect()
        harm = {}
        for r in d:
            if r["dist"] > 0:
                harm[r["id"]] = harm.get(r["id"], 0.0) + 1.0 / r["dist"]
        for r in graph.V.collect():
            harm.setdefault(r["id"], 0.0)
        ranked = sorted(harm.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))
        return [(i, round(h, 6)) for i, h in ranked[:k]]

    # path 0-1-2-3-4: center 2 leads
    g = GraphDF.from_edge_list(
        spark, [(0, 1), (1, 2), (2, 3), (3, 4)], num_nodes=5
    )
    dyn = DynTopHarmonicCloseness(g, k=3)
    got = [(r["id"], round(r["harmonic"], 6)) for r in dyn.result.collect()]
    assert got == want(g, 3)
    # close the ring: all nodes tie, id tie-break decides
    ev = events_from_list(spark, [(0, "EDGE_ADDITION", 0, 4, 1.0)])
    got2 = [(r["id"], round(r["harmonic"], 6))
            for r in dyn.update(ev).collect()]
    assert got2 == want(dyn.graph, 3)
    assert [i for i, _ in got2] == [0, 1, 2]


def test_pagerank_warm_start_converges_immediately(spark):
    from networkit_spark.operators.pagerank import pagerank

    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    cold_stats: dict = {}
    fix = pagerank(g, tol=1e-10, stats=cold_stats)
    warm_stats: dict = {}
    again = pagerank(g, tol=1e-10, init_scores=fix, stats=warm_stats)
    # starting AT the fixpoint, the delta is under tol within a couple of
    # supersteps; cold start needs dozens at this tol
    assert len(warm_stats["iter_secs"]) <= 3
    assert len(cold_stats["iter_secs"]) > 3 * len(warm_stats["iter_secs"])
    a = {r["id"]: r["score"] for r in fix.collect()}
    c = {r["id"]: r["score"] for r in again.collect()}
    for k in a:
        assert math.isclose(a[k], c[k], abs_tol=1e-8)


def _bfs_py(n, edges, src):
    from collections import deque

    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    dist = {src: 0}
    q = deque([src])
    while q:
        x = q.popleft()
        for y in adj[x]:
            if y not in dist:
                dist[y] = dist[x] + 1
                q.append(y)
    return dist


def test_affected_nodes_addition_matches_distance_delta(spark):
    # oracle: w affected ⟺ its BFS distance from u or v actually changes
    # when (u, v) is inserted (distance/AffectedNodes.cpp semantics)
    from networkit_spark.operators.dynamics import affected_nodes
    from tests.fixtures import KARATE_EDGES, KARATE_N

    u, v = 16, 26  # far-apart karate nodes
    assert (u, v) not in KARATE_EDGES and (v, u) not in KARATE_EDGES
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    got = {r["id"] for r in affected_nodes(g, u, v, added=True).collect()}

    after = KARATE_EDGES + [(u, v)]
    want = set()
    for s in (u, v):
        d0 = _bfs_py(KARATE_N, KARATE_EDGES, s)
        d1 = _bfs_py(KARATE_N, after, s)
        want |= {
            w for w in range(KARATE_N)
            if d0.get(w, 1 << 60) != d1.get(w, 1 << 60)
        }
    assert got == want


def test_affected_nodes_removal_matches_distance_delta(spark):
    from networkit_spark.operators.dynamics import affected_nodes
    from tests.fixtures import KARATE_EDGES, KARATE_N

    u, v = KARATE_EDGES[0]
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    got = {r["id"] for r in affected_nodes(g, u, v, added=False).collect()}

    after = [e for e in KARATE_EDGES if e not in ((u, v), (v, u))]
    want = set()
    for s in (u, v):
        d0 = _bfs_py(KARATE_N, KARATE_EDGES, s)
        d1 = _bfs_py(KARATE_N, after, s)
        want |= {
            w for w in range(KARATE_N)
            if d0.get(w, 1 << 60) != d1.get(w, 1 << 60)
        }
    assert got == want


def test_dynamic_nmi_distance_common_nodes_only(spark):
    from networkit_spark.operators.community import (
        dynamic_nmi_distance,
        nmi_distance,
    )

    old = spark.createDataFrame(
        [(i, i % 3) for i in range(12)], "id long, label long"
    )
    new_same = spark.createDataFrame(
        [(i, (i % 3) + 7) for i in range(12)], "id long, label long"
    )
    # identical partition under renaming -> distance 0
    assert abs(dynamic_nmi_distance(old, new_same)) < 1e-12
    # extra nodes in the new clustering are excluded (isInBoth): the
    # restricted comparison still sees the identical partition
    new_grown = new_same.unionByName(
        spark.createDataFrame([(100, 0), (101, 1)], "id long, label long")
    )
    assert abs(dynamic_nmi_distance(old, new_grown)) < 1e-12
    # and it agrees with static NMI on an equal node set
    new_diff = spark.createDataFrame(
        [(i, i % 2) for i in range(12)], "id long, label long"
    )
    assert abs(
        dynamic_nmi_distance(old, new_diff) - nmi_distance(old, new_diff)
    ) < 1e-12


def test_dyn_betweenness_one_node_tracks_inserts(spark):
    from networkit_spark.operators.betweenness import betweenness
    from networkit_spark.operators.dynamics import DynBetweennessOneNode
    from tests.fixtures import KARATE_EDGES, KARATE_N

    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    x = 0
    dyn = DynBetweennessOneNode(g, x)
    want0 = {
        r["id"]: r["score"] for r in betweenness(g).collect()
    }[x]
    assert abs(dyn.score() - want0) < 1e-9

    # insert an edge between two far nodes and verify the tracked score
    dyn.update(events_from_list(spark, [(0, "EDGE_ADDITION", 16, 26, 1.0)]))
    g2 = GraphDF.from_edge_list(
        spark, KARATE_EDGES + [(16, 26)], num_nodes=KARATE_N
    )
    want1 = {r["id"]: r["score"] for r in betweenness(g2).collect()}[x]
    assert abs(dyn.score() - want1) < 1e-9


def test_dyn_betweenness_one_node_resweeps_only_affected_ball(spark):
    """Two disconnected 4-cliques; an insert inside clique A must not
    re-sweep any clique-B source (supersteps ∝ affected ball, not |V|)."""
    from itertools import combinations

    from networkit_spark.operators.betweenness import betweenness
    from networkit_spark.operators.dynamics import DynBetweennessOneNode

    a = list(combinations(range(4), 2))
    b = list(combinations(range(10, 14), 2))
    # drop one clique-A edge so there's something novel to insert
    edges = [e for e in a if e != (0, 1)] + b
    g = GraphDF.from_edge_list(spark, edges, num_nodes=14)
    x = 2
    dyn = DynBetweennessOneNode(g, x)
    assert dyn.last_resweep_sources == 14  # cold solve sweeps everything

    dyn.update(events_from_list(spark, [(0, "EDGE_ADDITION", 0, 1, 1.0)]))
    # only sources with |d(s,0) - d(s,1)| >= 1 are re-swept: exactly {0, 1}
    # (other clique-A nodes sit at distance 1 from both; clique B reaches
    # neither endpoint)
    assert dyn.last_resweep_sources == 2
    g2 = GraphDF.from_edge_list(spark, a + b, num_nodes=14)
    want = {r["id"]: r["score"] for r in betweenness(g2).collect()}[x]
    assert abs(dyn.score() - want) < 1e-9

    # duplicate insertion is a no-op with zero re-sweeps
    dyn.update(events_from_list(spark, [(0, "EDGE_ADDITION", 0, 1, 1.0)]))
    assert dyn.last_resweep_sources == 0
    assert abs(dyn.score() - want) < 1e-9


def test_dyn_betweenness_one_node_directed_insert(spark):
    from networkit_spark.operators.betweenness import betweenness
    from networkit_spark.operators.dynamics import DynBetweennessOneNode

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 5), (5, 3)]
    g = GraphDF.from_edge_list(spark, edges, num_nodes=6, directed=True)
    x = 2
    dyn = DynBetweennessOneNode(g, x)
    dyn.update(events_from_list(spark, [(0, "EDGE_ADDITION", 4, 0, 1.0)]))
    g2 = GraphDF.from_edge_list(
        spark, edges + [(4, 0)], num_nodes=6, directed=True
    )
    want = {r["id"]: r["score"] for r in betweenness(g2).collect()}[x]
    assert abs(dyn.score() - want) < 1e-9
    assert dyn.last_resweep_sources < 6  # source 0 sees no shorter route


def test_dyn_approx_betweenness_insert_remove_parity(spark):
    """Bit-identical to a cold approx_betweenness run on the folded graph
    across an insert then a remove (per-sample seeded determinism)."""
    from networkit_spark.operators.betweenness import approx_betweenness
    from networkit_spark.operators.dynamics import DynApproxBetweenness
    from tests.fixtures import KARATE_EDGES, KARATE_N

    r, seed = 150, 7
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    dyn = DynApproxBetweenness(g, n_samples=r, seed=seed)
    want0 = {
        row["id"]: row["score"]
        for row in approx_betweenness(g, n_samples=r, seed=seed).collect()
    }
    got0 = {row["id"]: row["score"] for row in dyn.result.collect()}
    assert got0 == want0

    dyn.update(events_from_list(spark, [(0, "EDGE_ADDITION", 16, 26, 1.0)]))
    g2 = GraphDF.from_edge_list(
        spark, KARATE_EDGES + [(16, 26)], num_nodes=KARATE_N
    )
    want1 = {
        row["id"]: row["score"]
        for row in approx_betweenness(g2, n_samples=r, seed=seed).collect()
    }
    got1 = {row["id"]: row["score"] for row in dyn.result.collect()}
    assert got1 == want1
    assert 0 < dyn.last_resampled <= r

    dyn.update(events_from_list(spark, [(0, "EDGE_REMOVAL", 16, 26, 1.0)]))
    got2 = {row["id"]: row["score"] for row in dyn.result.collect()}
    assert got2 == want0  # back to the original graph exactly


def test_dyn_approx_betweenness_prunes_untouched_component(spark):
    """Insert inside one of two disconnected cliques: samples whose pair
    lives entirely in the other component are never re-drawn."""
    from itertools import combinations

    from networkit_spark.operators.betweenness import approx_betweenness
    from networkit_spark.operators.dynamics import DynApproxBetweenness

    a = list(combinations(range(5), 2))
    b = list(combinations(range(10, 15), 2))
    edges = [e for e in a if e != (0, 1)] + b
    g = GraphDF.from_edge_list(spark, edges, num_nodes=15)
    r, seed = 120, 11
    dyn = DynApproxBetweenness(g, n_samples=r, seed=seed)
    dyn.update(events_from_list(spark, [(0, "EDGE_ADDITION", 0, 1, 1.0)]))
    # cross-component and B-internal pairs can't route through (0, 1)
    assert dyn.last_resampled < r
    g2 = GraphDF.from_edge_list(spark, a + b, num_nodes=15)
    want = {
        row["id"]: row["score"]
        for row in approx_betweenness(g2, n_samples=r, seed=seed).collect()
    }
    got = {row["id"]: row["score"] for row in dyn.result.collect()}
    assert got == want

    # weight updates never touch the hop-count sampler
    dyn.update(
        events_from_list(spark, [(0, "EDGE_WEIGHT_UPDATE", 0, 1, 2.0)])
    )
    assert dyn.last_resampled == 0
    assert {row["id"]: row["score"] for row in dyn.result.collect()} == want
