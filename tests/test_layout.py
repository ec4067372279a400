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
