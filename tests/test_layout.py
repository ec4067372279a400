"""Viz family: PivotMDS vs a numpy oracle, PostscriptWriter, Gephi client,
SciPyEVZ/SciPyPageRank spectral wrappers (VERDICT r3 'remaining no' rows)."""

import json
import math

import numpy as np
import pytest

from networkit_spark.graph import GraphDF
from networkit_spark.operators.layout import (
    pivot_mds,
    power_method_deflate,
    select_pivots,
    write_postscript,
)
from tests.fixtures import KARATE_EDGES, KARATE_N

LCG_A, LCG_C, LCG_M = 1103515245, 12345, 2147483648


def _lcg_priority(i, seed):
    return (((i + seed) % LCG_M) * LCG_A + LCG_C) % LCG_M


def _karate(spark):
    return GraphDF.from_edge_list(
        spark, KARATE_EDGES, directed=False, weighted=False, num_nodes=KARATE_N
    )


def _bfs_dists(n, adj, src):
    d = {src: 0.0}
    frontier = [src]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in d:
                    d[v] = d[u] + 1.0
                    nxt.append(v)
        frontier = nxt
    return d


def _numpy_pivot_mds(n, edges, k, dim, seed):
    """Driver-free reimplementation of PivotMDS.cpp:19-104 with the same
    LCG pivot choice and the same power_method_deflate."""
    adj = {i: [] for i in range(n)}
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    pivots = sorted(range(n), key=lambda i: (_lcg_priority(i, seed), i))[:k]
    d = np.zeros((n, k))
    mask = np.zeros((n, k), dtype=bool)
    for j, p in enumerate(pivots):
        for i, dist in _bfs_dists(n, adj, p).items():
            d[i, j] = dist
            mask[i, j] = True
    rm = d.sum(axis=1) / k
    cm = d.sum(axis=0) / n
    total = d.sum()
    grand = (total / k) / (2.0 * n) + (total / n) / (2.0 * k)
    c = np.where(mask, d - rm[:, None] - cm[None, :] + grand, 0.0)
    gram = c.T @ c
    vecs = power_method_deflate(gram, dim, seed=seed)
    return np.stack([c @ v for v in vecs], axis=1)


def test_pivot_mds_matches_numpy_oracle(spark):
    g = _karate(spark)
    out = pivot_mds(g, dim=2, num_pivots=8, seed=42).orderBy("id").collect()
    want = _numpy_pivot_mds(KARATE_N, KARATE_EDGES, k=8, dim=2, seed=42)
    got = np.array([[r["c0"], r["c1"]] for r in out])
    assert got.shape == (KARATE_N, 2)
    assert np.allclose(got, want, atol=1e-6)
    # a layout that collapses everything to a point is wrong
    assert np.std(got[:, 0]) > 0.1 and np.std(got[:, 1]) > 0.1


def test_pivot_mds_all_pivots_is_classic_mds(spark):
    """k = n pivots → full distance matrix; still matches the oracle."""
    g = _karate(spark)
    out = pivot_mds(g, dim=2, num_pivots=KARATE_N, seed=7).orderBy("id").collect()
    want = _numpy_pivot_mds(KARATE_N, KARATE_EDGES, k=KARATE_N, dim=2, seed=7)
    got = np.array([[r["c0"], r["c1"]] for r in out])
    assert np.allclose(got, want, atol=1e-6)


def test_select_pivots_deterministic(spark):
    g = _karate(spark)
    p1 = select_pivots(g, 8, seed=42)
    p2 = select_pivots(g, 8, seed=42)
    want = sorted(range(KARATE_N), key=lambda i: (_lcg_priority(i, 42), i))[:8]
    assert p1 == p2 == want


def test_pivot_mds_disconnected_zero_rows(spark):
    """Nodes unreachable from every pivot project to the origin, matching
    the reference's implicit-zero CSR rows (PivotMDS.cpp:23-41)."""
    edges = [(0, 1), (1, 2), (3, 4)]  # two components
    g = GraphDF.from_edge_list(spark, edges, directed=False, num_nodes=5)
    # pick 2 pivots — LCG order decides which component they land in
    out = pivot_mds(g, dim=2, num_pivots=2, seed=1).orderBy("id").collect()
    want = _numpy_pivot_mds(5, edges, k=2, dim=2, seed=1)
    got = np.array([[r["c0"], r["c1"]] for r in out])
    assert np.allclose(got, want, atol=1e-9)


def test_write_postscript(spark, tmp_path):
    g = _karate(spark)
    coords = pivot_mds(g, dim=2, num_pivots=8, seed=42)
    path = str(tmp_path / "karate.eps")
    write_postscript(g, coords, path)
    text = open(path).read()
    assert text.startswith("%!PS-Adobe-1.0\n")
    assert "%%BoundingBox: 0.000 0.000 1020.0 1020.0" in text
    assert text.count(" l s\n") == len(KARATE_EDGES)  # one stroke per edge
    assert text.count(" a s\n") == KARATE_N  # one disc per node
    assert text.rstrip().endswith("grestore")


def test_write_postscript_clustered(spark, tmp_path):
    g = _karate(spark)
    coords = pivot_mds(g, dim=2, num_pivots=8, seed=42)
    labels = g.V.selectExpr("id", "CAST(id % 3 AS BIGINT) AS label")
    path = str(tmp_path / "karate_clus.eps")
    write_postscript(g, coords, path, clustering=labels)
    text = open(path).read()
    # intra-cluster edges colored from the 24-color palette, cut edges gray
    intra = sum(1 for u, v in KARATE_EDGES if u % 3 == v % 3)
    assert text.count("0.80 0.80 0.80 c 1.0 w ") == len(KARATE_EDGES) - intra


# ---------------------------------------------------------------- gephi
def test_gephi_export_graph(spark):
    from networkit_spark.sources.gephi import GephiStreamingClient

    sent = []
    client = GephiStreamingClient(transport=sent.append)
    g = _karate(spark)
    client.exportGraph(g)
    events = [json.loads(line) for line in "".join(sent).splitlines() if line]
    kinds = [next(iter(e)) for e in events]
    assert kinds[0] == "dn"  # clean first
    assert kinds.count("an") == KARATE_N
    assert kinds.count("ae") == len(KARATE_EDGES)
    # Gephi >= 0.9 forbids coincident node coordinates
    xy = {
        (attrs["x"], attrs["y"])
        for e in events
        if "an" in e
        for attrs in e["an"].values()
    }
    assert len(xy) == KARATE_N
    # undirected edge ids are 'min-max'
    ae = [e["ae"] for e in events if "ae" in e]
    for ev in ae:
        (eid, attrs), = ev.items()
        assert eid == f"{min(attrs['source'], attrs['target'])}-" \
                      f"{max(attrs['source'], attrs['target'])}"
        assert attrs["directed"] is False


def test_gephi_node_values_and_coordinates(spark):
    from networkit_spark.sources.gephi import GephiStreamingClient

    sent = []
    client = GephiStreamingClient(transport=sent.append)
    g = _karate(spark)
    client.exportGraph(g)
    sent.clear()
    deg = g.V.selectExpr("id", "CAST(id AS DOUBLE) AS value")
    client.exportNodeValues(deg, "myattr")
    events = [json.loads(line) for line in "".join(sent).splitlines() if line]
    cn = [e["cn"] for e in events if "cn" in e]
    assert len(cn) == KARATE_N
    assert all("myattr" in next(iter(e.values())) for e in cn)

    sent.clear()
    coords = pivot_mds(g, dim=2, num_pivots=4, seed=42)
    client.exportCoordinates(coords, scale=2.0)
    events = [json.loads(line) for line in "".join(sent).splitlines() if line]
    cn = [e["cn"] for e in events if "cn" in e]
    assert len(cn) == KARATE_N
    attrs = next(iter(cn[0].values()))
    assert set(attrs) == {"x", "y"}


def test_gephi_requires_export_first(spark):
    from networkit_spark.sources.gephi import GephiStreamingClient

    client = GephiStreamingClient(transport=lambda s: None)
    with pytest.raises(RuntimeError):
        client.exportAdditionalEdge(0, 1)


def test_gephi_csv_export(spark, tmp_path):
    from networkit_spark.sources.gephi import export_node_values_csv

    g = _karate(spark)
    vals = g.V.selectExpr("id", "id * 2 AS value")
    path = str(tmp_path / "vals.csv")
    export_node_values_csv(vals, path, "doubled")
    lines = open(path).read().splitlines()
    assert lines[0] == "id,doubled"
    assert len(lines) == KARATE_N + 1
    assert lines[1] == "0,0" and lines[2] == "1,2"


# ------------------------------------------------------- SciPy spectral
def test_scipy_evz_matches_numpy_eig(spark):
    import networkit_spark.compat as nk

    g = _karate(spark)
    algo = nk.centrality.SciPyEVZ(g).run()
    got = np.array(algo.scores())
    A = np.zeros((KARATE_N, KARATE_N))
    for u, v in KARATE_EDGES:
        A[u, v] = A[v, u] = 1.0
    w, V = np.linalg.eigh(A)
    principal = V[:, np.argmax(w)]
    principal = np.abs(principal) / np.linalg.norm(principal)
    assert np.allclose(got, principal, atol=1e-6)


def test_scipy_evz_rejects_directed(spark):
    import networkit_spark.compat as nk

    g = GraphDF.from_edge_list(spark, [(0, 1)], directed=True, num_nodes=2)
    with pytest.raises(NotImplementedError):
        nk.centrality.SciPyEVZ(g)


def test_scipy_pagerank_matches_numpy_fixpoint(spark):
    import networkit_spark.compat as nk

    g = _karate(spark)
    algo = nk.centrality.SciPyPageRank(g, damp=0.95).run()
    got = np.array(algo.scores())
    # numpy fixpoint of the damp=0.95 PageRank matrix (undirected karate)
    A = np.zeros((KARATE_N, KARATE_N))
    for u, v in KARATE_EDGES:
        A[u, v] = A[v, u] = 1.0
    P = A / A.sum(axis=1, keepdims=True)
    x = np.full(KARATE_N, 1.0 / KARATE_N)
    for _ in range(300):
        x = 0.05 / KARATE_N + 0.95 * (P.T @ x)
    x = x / x.sum()
    assert np.allclose(got, x, atol=1e-8)


# --------------------------------------------------------- maxent-stress
def _numpy_maxent(n, edges, dim, seed, max_solves, max_rounds, q=0.0,
                  alpha=1.0, alpha_reduction=0.3, final_alpha=0.008):
    """Driver-free twin of MaxentStress::run (viz/MaxentStress.cpp:61-186)
    at k=1 with EXACT repulsion and pinv Laplacian solves (CG from x0=0 on
    mean-centered rhs converges to the same pseudo-inverse solution)."""
    known = {}
    for u, v in edges:
        known[(u, v)] = min(known.get((u, v), 1.0), 1.0)
        known[(v, u)] = min(known.get((v, u), 1.0), 1.0)
    L = np.zeros((n, n))
    for (u, v), d in known.items():
        w = 1.0 / (d * d)
        L[u, v] -= w
        L[u, u] += w
    Lp = np.linalg.pinv(L)

    raw = np.zeros((n, dim))
    for d in range(dim):
        for i in range(n):
            raw[i, d] = 2.0 / LCG_M * _lcg_priority(i, seed + 7919 * d) - 1.0
    nrm = np.sqrt((raw * raw).sum(axis=1))
    nrm = np.where(nrm < 1e-12, 1.0, nrm)
    X = raw / nrm[:, None]

    def exact_rep(X):
        b = np.zeros((n, dim))
        q2 = (q + 2.0) / 2.0
        for i in range(n):
            for j in range(n):
                if i == j or (i, j) in known:
                    continue
                sq = max(((X[i] - X[j]) ** 2).sum(), 1e-3)
                b[i] += 1.0 / sq**q2 * (X[i] - X[j])
        col = np.sqrt((b * b).sum(axis=0))
        return b / np.maximum(col, 1e-300)[None, :]

    cur_alpha = alpha
    rep, rep_bound = None, None
    for _round in range(max_rounds):
        for s in range(max_solves):
            bound = math.floor(5.0 * math.log(s)) if s else -1
            if rep is None or bound != rep_bound:
                rep, rep_bound = exact_rep(X), bound
            rhs = np.zeros((n, dim))
            for (u, v), dd in known.items():
                dist = max(np.linalg.norm(X[u] - X[v]), 1e-5)
                w = (1.0 / (dd * dd)) * dd / dist
                rhs[u] += w * (X[u] - X[v])
            if s < max_solves / 5.0:
                col = np.sqrt((rhs * rhs).sum(axis=0))
                rhs = rhs / np.maximum(col, 1e-300)[None, :]
            b = rhs + cur_alpha * rep
            b = b - b.mean(axis=0, keepdims=True)
            X = Lp @ b
        cur_alpha *= alpha_reduction
        if cur_alpha < final_alpha:
            break
    return X


def test_maxent_stress_matches_numpy_twin(spark):
    from networkit_spark.operators.layout import maxent_stress

    g = _karate(spark)
    out = (
        maxent_stress(
            g, dim=2, k=1, seed=42, max_solves_per_alpha=2, max_alpha_rounds=1,
            repulsion="exact", cg_tol=1e-10, cg_max_iterations=200,
        )
        .orderBy("id")
        .collect()
    )
    got = np.array([[r["c0"], r["c1"]] for r in out])
    want = _numpy_maxent(
        KARATE_N, KARATE_EDGES, dim=2, seed=42, max_solves=2, max_rounds=1
    )
    assert got.shape == (KARATE_N, 2)
    assert np.allclose(got, want, atol=1e-4)


def test_maxent_stress_reduces_stress(spark):
    from networkit_spark.operators.layout import (
        known_distances,
        maxent_stress,
        stress_measure,
    )
    from networkit_spark.functions.sampling import lcg_priority
    from pyspark.sql import functions as F

    g = _karate(spark)
    known = known_distances(g, k=1)
    # the operator's own LCG unit-sphere init is the random baseline
    raw = [
        (2.0 / LCG_M) * lcg_priority(F.col("id"), 42 + 7919 * d) - 1.0
        for d in range(2)
    ]
    nrm = F.sqrt(sum((r * r for r in raw), F.lit(0.0)))
    init = g.V.select(
        "id",
        *[
            (r / F.when(nrm < 1e-12, F.lit(1.0)).otherwise(nrm)).alias(f"c{d}")
            for d, r in enumerate(raw)
        ],
    )
    s0 = stress_measure(known, init, dim=2)
    final = maxent_stress(
        g, dim=2, seed=42, max_solves_per_alpha=3, max_alpha_rounds=2,
        repulsion="grid",
    )
    s1 = stress_measure(known, final, dim=2)
    assert s1 < 0.5 * s0


def test_maxent_stress_disconnected_raises(spark):
    from networkit_spark.operators.layout import maxent_stress

    g = GraphDF.from_edge_list(spark, [(0, 1), (2, 3)], num_nodes=4)
    with pytest.raises(ValueError, match="not connected"):
        maxent_stress(g)


def test_known_distances_k2(spark):
    from networkit_spark.operators.layout import known_distances

    # path 0-1-2-3: hop-2 shell pairs get BFS depth 2.0
    g = GraphDF.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], num_nodes=4)
    rows = {
        (r["u"], r["v"]): r["d"] for r in known_distances(g, k=2).collect()
    }
    assert rows[(0, 1)] == 1.0 and rows[(1, 0)] == 1.0
    assert rows[(0, 2)] == 2.0 and rows[(2, 0)] == 2.0
    assert rows[(1, 3)] == 2.0
    assert (0, 3) not in rows  # hop 3 excluded at k=2


def test_scaling_factor_recovers_scale(spark):
    from networkit_spark.operators.layout import (
        compute_scaling_factor,
        scale_layout,
    )

    # path graph laid out at exactly half its graph distances → s = 2
    g = GraphDF.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], num_nodes=4)
    coords = spark.createDataFrame(
        [(i, 0.5 * i, 0.0) for i in range(4)], "id long, c0 double, c1 double"
    )
    s = compute_scaling_factor(g, coords, dim=2)
    assert abs(s - 2.0) < 1e-9
    scaled = {r["id"]: r["c0"] for r in scale_layout(coords, s).collect()}
    assert abs(scaled[3] - 3.0) < 1e-9


def test_compat_maxent_stress_facade(spark):
    import networkit_spark.compat as nk

    g = _karate(spark)
    ms = nk.viz.MaxentStress(
        g, dim=2, k=1, tolerance=1e-6, maxSolvesPerAlpha=2, maxAlphaRounds=1
    ).run()
    coords = ms.getCoordinates()
    assert len(coords) == KARATE_N and len(coords[0]) == 2
    ms.scaleLayout()
    assert len(ms.getCoordinates()) == KARATE_N


def test_compat_pivot_mds_facade(spark, tmp_path):
    import networkit_spark.compat as nk

    g = _karate(spark)
    mds = nk.viz.PivotMDS(g, dim=2, numberOfPivots=8).run()
    coords = mds.getCoordinates()
    assert len(coords) == KARATE_N and len(coords[0]) == 2
    writer = nk.viz.PostscriptWriter()
    path = str(tmp_path / "facade.eps")
    writer.write(g, mds, path)
    assert open(path).read().startswith("%!PS-Adobe")
