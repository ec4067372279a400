"""Round-4 gap fills: IncompleteDijkstra (distance/IncompleteDijkstra.cpp)
and the pure-numpy MAT v5 reader/writer (graphio.pyx readMat/writeMat)."""

import heapq

from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF

from tests.fixtures import KARATE_EDGES, KARATE_N


def _py_dijkstra(n, edges, sources, explored=frozenset()):
    """Heap Dijkstra oracle mirroring IncompleteDijkstra.cpp: explored
    nodes neither seed (:28-31) nor relax (:50-52)."""
    adj = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    dist = {}
    heap = []
    for s in sources:
        if s not in explored:
            dist[s] = 0.0
            heapq.heappush(heap, (0.0, s))
    while heap:
        d, u = heapq.heappop(heap)
        if d > dist.get(u, float("inf")):
            continue
        for v, w in adj.get(u, []):
            if v in explored:
                continue
            nd = d + w
            if nd < dist.get(v, float("inf")):
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist


def test_incomplete_dijkstra_matches_sssp_on_karate(spark):
    from networkit_spark.operators.bfs import incomplete_dijkstra, sssp_distances

    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    got = {
        r["id"]: r["dist"]
        for r in incomplete_dijkstra(g, [0]).collect()
    }
    want = {
        r["id"]: r["dist"]
        for r in sssp_distances(g, 0).collect()
        if r["dist"] is not None
    }
    assert got == want


def test_incomplete_dijkstra_weighted_explored_oracle(spark):
    from networkit_spark.operators.bfs import incomplete_dijkstra

    edges = [
        (0, 1, 2.0), (1, 2, 1.5), (0, 3, 4.0), (3, 4, 1.0),
        (2, 4, 3.0), (4, 5, 0.5), (1, 5, 9.0), (6, 7, 1.0),
    ]
    g = GraphDF.from_edge_list(spark, edges, num_nodes=8, weighted=True)
    sources, explored = [0, 6], {3, 6}
    got = {
        r["id"]: r["dist"]
        for r in incomplete_dijkstra(g, sources, explored=sorted(explored)).collect()
    }
    want = _py_dijkstra(8, edges, sources, frozenset(explored))
    assert got == want
    # explored node 3 and explored source 6 (plus its only neighbor 7,
    # unreachable without it) never appear
    assert 3 not in got and 6 not in got and 7 not in got


def test_incomplete_dijkstra_compat_iterator(spark):
    import networkit_spark.compat as nk

    G = nk.Graph(5, weighted=True)
    for u, v, w in [(0, 1, 1.0), (1, 2, 2.0), (0, 3, 5.0), (2, 3, 0.5)]:
        G.addEdge(u, v, w)
    it = nk.distance.IncompleteDijkstra(G, [0]).run()
    seen = []
    while it.hasNext():
        seen.append(it.next())
    # emission order is ascending distance, like the reference's heap pops
    assert [n for n, _ in seen] == [0, 1, 2, 3]
    assert [d for _, d in seen] == [0.0, 1.0, 3.0, 3.5]
    # node 4 is isolated: never emitted
    assert all(n != 4 for n, _ in seen)


def _golden_dense_mat(key=b"A"):
    """Hand-packed Level-5 file (per the public MAT-File Format spec),
    independent of write_mat: one dense 3x3 double adjacency of the
    triangle 0-1-2, column-major."""
    import struct

    import numpy as np

    def elem(mi, data):
        pad = (-len(data)) % 8
        return struct.pack("<II", mi, len(data)) + data + b"\x00" * pad

    m = np.array(
        [[0, 1, 1], [1, 0, 1], [1, 1, 0]], dtype="<f8"
    )
    body = (
        elem(6, struct.pack("<II", 6, 0))          # flags: mxDOUBLE_CLASS
        + elem(5, np.array([3, 3], dtype="<i4").tobytes())
        + elem(1, key)
        + elem(9, m.tobytes(order="F"))            # miDOUBLE pr
    )
    header = b"MATLAB 5.0 MAT-file, golden fixture".ljust(116)
    header += b"\x00" * 8 + struct.pack("<HH", 0x0100, 0x4D49)
    return header + elem(14, body)


def test_read_mat_golden_dense(spark, tmp_path):
    from networkit_spark.sources.matio import read_mat

    p = tmp_path / "tri.mat"
    p.write_bytes(_golden_dense_mat())
    g = read_mat(spark, str(p), key="A")
    assert g.number_of_nodes() == 3
    got = {
        (r["src"], r["dst"]) for r in g.E.select("src", "dst").collect()
    }
    assert got == {(0, 1), (0, 2), (1, 2)}


def test_read_mat_compressed_sparse(spark, tmp_path):
    """miCOMPRESSED sparse variable (the scipy do_compression=True layout):
    zlib-wrapped miMATRIX with CSC ir/jc/pr."""
    import struct
    import zlib

    import numpy as np

    from networkit_spark.sources.matio import read_mat

    def elem(mi, data):
        pad = (-len(data)) % 8
        return struct.pack("<II", mi, len(data)) + data + b"\x00" * pad

    # 4x4 symmetric sparse: edges (0,1) and (2,3); CSC over both orientations
    ir = np.array([1, 0, 3, 2], dtype="<i4")
    jc = np.array([0, 1, 2, 3, 4], dtype="<i4")
    pr = np.array([1.0, 1.0, 1.0, 1.0], dtype="<f8")
    body = (
        elem(6, struct.pack("<II", 5, 4))          # flags: mxSPARSE, nzmax=4
        + elem(5, np.array([4, 4], dtype="<i4").tobytes())
        + elem(1, b"G")
        + elem(5, ir.tobytes())
        + elem(5, jc.tobytes())
        + elem(9, pr.tobytes())
    )
    raw = elem(14, body)
    comp = zlib.compress(raw)
    header = b"MATLAB 5.0 MAT-file, golden sparse".ljust(116)
    header += b"\x00" * 8 + struct.pack("<HH", 0x0100, 0x4D49)
    blob = header + struct.pack("<II", 15, len(comp)) + comp
    p = tmp_path / "sp.mat"
    p.write_bytes(blob)
    g = read_mat(spark, str(p))
    assert g.number_of_nodes() == 4
    got = {
        (r["src"], r["dst"]) for r in g.E.select("src", "dst").collect()
    }
    assert got == {(0, 1), (2, 3)}


def test_mat_round_trip_and_compat_dispatch(spark, tmp_path):
    import networkit_spark.compat as nk
    from networkit_spark.sources.matio import read_mat, write_mat

    g = GraphDF.from_edge_list(
        spark, [(0, 1), (1, 2), (2, 0), (3, 3), (2, 4)], num_nodes=6
    )
    p = tmp_path / "rt.mat"
    write_mat(g, str(p), key="G")
    back = read_mat(spark, str(p), key="G")
    assert back.number_of_nodes() == 6  # isolated node 5 survives via dims
    want = {(0, 1), (1, 2), (0, 2), (3, 3), (2, 4)}
    got = {
        (r["src"], r["dst"]) for r in back.E.select("src", "dst").collect()
    }
    assert got == want
    # missing key errors like the reference's readMat
    try:
        read_mat(spark, str(p), key="H")
        assert False, "expected KeyError"
    except KeyError:
        pass
    # Format dispatch round-trip
    p2 = tmp_path / "rt2.mat"
    nk.writeGraph(g, str(p2), nk.Format.MAT)
    g2 = nk.readGraph(str(p2), nk.Format.MAT)
    got2 = {
        (r["src"], r["dst"]) for r in g2.E.select("src", "dst").collect()
    }
    assert got2 == want
