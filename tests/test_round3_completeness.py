"""Round-3 completeness batch: the last reference generators
(RegularRingLattice, StochasticBlockmodel, PowerlawDegreeSequence,
PubWeb, EdgeSwitchingMarkovChain) and the remaining text I/O formats
(GML read/write, DOT write, MatrixMarket read)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from networkit_spark.sources.generators import (
    edge_switching_markov_chain,
    havel_hakimi,
    powerlaw_degree_sequence,
    pubweb,
    regular_ring_lattice,
    stochastic_blockmodel,
)
from networkit_spark.sources.readers import (
    read_gml,
    read_matrix_market,
    write_dot,
    write_gml,
)


def _read_text_dir(path):
    parts = sorted(glob.glob(os.path.join(path, "part-*")))
    out = []
    for p in parts:
        with open(p) as f:
            out.append(f.read())
    return "".join(out)


# ---------------------------------------------------------------- generators


def test_regular_ring_lattice_degrees(spark):
    g = regular_ring_lattice(spark, 12, 3)
    assert g.number_of_edges() == 36
    degs = g.E_sym.groupBy("src").count().select("count").distinct().collect()
    assert [r["count"] for r in degs] == [6]


def test_regular_ring_lattice_clamps_k(spark):
    # reference clamps nNeighbors to n/2 - 1
    g = regular_ring_lattice(spark, 10, 99)
    degs = g.E_sym.groupBy("src").count().select("count").distinct().collect()
    assert [r["count"] for r in degs] == [8]  # k -> 4


def test_stochastic_blockmodel_exact_affinity(spark):
    mem = [0] * 5 + [1] * 5
    g = stochastic_blockmodel(spark, 10, mem, [[1.0, 0.0], [0.0, 1.0]], seed=7)
    # p=1 within blocks -> two 5-cliques; p=0 across -> nothing else
    assert g.number_of_edges() == 20
    cross = g.E.filter(
        ((F.col("src") < 5) & (F.col("dst") >= 5))
        | ((F.col("src") >= 5) & (F.col("dst") < 5))
    ).count()
    assert cross == 0


def test_stochastic_blockmodel_mixing(spark):
    mem = [0] * 30 + [1] * 30
    g = stochastic_blockmodel(spark, 60, mem, [[0.8, 0.05], [0.05, 0.8]], seed=3)
    intra = g.E.filter(
        ((F.col("src") < 30) & (F.col("dst") < 30))
        | ((F.col("src") >= 30) & (F.col("dst") >= 30))
    ).count()
    inter = g.number_of_edges() - intra
    assert intra > 5 * inter
    # deterministic under the same seed
    g2 = stochastic_blockmodel(spark, 60, mem, [[0.8, 0.05], [0.05, 0.8]], seed=3)
    assert g2.number_of_edges() == g.number_of_edges()


def test_stochastic_blockmodel_validates(spark):
    with pytest.raises(ValueError):
        stochastic_blockmodel(spark, 4, [0, 1], [[0.5, 0.5], [0.5, 0.5]])
    with pytest.raises(ValueError):
        stochastic_blockmodel(spark, 2, [0, 1], [[0.5], [0.5]])


def test_powerlaw_degree_sequence_bounds(spark):
    df = powerlaw_degree_sequence(spark, 2000, 3, 40, gamma=2.2, seed=5)
    stats = df.agg(
        F.min("degree").alias("lo"),
        F.max("degree").alias("hi"),
        F.avg("degree").alias("mean"),
    ).head()
    assert stats["lo"] >= 3 and stats["hi"] <= 40
    assert stats["hi"] == 40  # heavy tail reaches the cap at n=2000
    assert 3 < stats["mean"] < 15  # mass concentrated near min_deg
    # deterministic
    assert df.exceptAll(powerlaw_degree_sequence(spark, 2000, 3, 40, 2.2, 5)).count() == 0


def test_pubweb_structure(spark):
    rad = 0.15
    g = pubweb(spark, 120, num_dense_areas=4, neighborhood_radius=rad,
               max_neighbors=6, seed=9)
    assert g.V.count() == 120
    assert g.number_of_edges() > 0
    # mutual-kNN cut: no node exceeds max_neighbors
    maxdeg = (
        g.E_sym.groupBy("src").count().agg(F.max("count").alias("m")).head()["m"]
    )
    assert maxdeg <= 6
    # weight = 0.01 / d^2 with d <= radius  =>  weight >= 0.01 / rad^2
    wmin = g.E.agg(F.min("weight").alias("w")).head()["w"]
    assert wmin >= 0.01 / (rad * rad) - 1e-9


def test_edge_switching_preserves_degrees(spark):
    seq = [5, 4, 4, 3, 3, 3, 2, 2, 2, 2, 1, 1]
    g0 = havel_hakimi(spark, seq)
    g = edge_switching_markov_chain(spark, seq, rounds=8, seed=11)
    degs = {
        r["src"]: r["count"] for r in g.E_sym.groupBy("src").count().collect()
    }
    got = sorted(degs.values(), reverse=True) + [0] * (len(seq) - len(degs))
    assert got == sorted(seq, reverse=True)
    # simple graph: no self loops, no duplicate edges
    e = [(r["src"], r["dst"]) for r in g.E.collect()]
    assert all(s != d for s, d in e)
    assert len(e) == len(set(e)) == g0.number_of_edges()
    # the chain actually moved off the Havel-Hakimi start
    e0 = {(r["src"], r["dst"]) for r in g0.E.collect()}
    assert set(e) != e0


# ------------------------------------------------------------------ text I/O


def test_gml_roundtrip_and_golden(tmp_path, spark):
    from networkit_spark.graph import GraphDF

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)], "src long, dst long, weight double"
    )
    g = GraphDF.from_edges(e, directed=False)
    p = str(tmp_path / "g.gml")
    write_gml(g, p)
    content = _read_text_dir(p)
    assert content.startswith("graph [\n  node [\n    id 0\n  ]\n")
    assert "  edge [\n    source 0\n    target 1\n  ]\n" in content
    assert content.rstrip().endswith("]")
    g2 = read_gml(spark, p)
    assert not g2.directed
    got = {(r["src"], r["dst"]) for r in g2.E.collect()}
    assert got == {(0, 1), (1, 2), (0, 2)}


def test_gml_directed_and_key_remap(tmp_path, spark):
    # reference remaps file keys to insertion order (GMLGraphReader nodeMap)
    gml = (
        "graph [\n  directed 1\n"
        "  node [\n    id 10\n  ]\n"
        "  node [\n    id 20\n  ]\n"
        "  node [\n    id 30\n  ]\n"
        "  edge [\n    source 10\n    target 30\n  ]\n"
        "  edge [\n    source 30\n    target 20\n  ]\n"
        "]\n"
    )
    f = tmp_path / "k.gml"
    f.write_text(gml)
    g = read_gml(spark, str(f))
    assert g.directed
    got = {(r["src"], r["dst"]) for r in g.E.collect()}
    assert got == {(0, 2), (2, 1)}


def test_write_dot_golden(tmp_path, spark):
    from networkit_spark.graph import GraphDF

    e = spark.createDataFrame(
        [(1, 0, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    g = GraphDF.from_edges(e, directed=False)
    p = str(tmp_path / "g.dot")
    write_dot(g, p)
    assert _read_text_dir(p) == "graph {\n0 -- 1;\n1 -- 2;\n}\n"
    gd = GraphDF.from_edges(e, directed=True)
    pd_ = str(tmp_path / "gd.dot")
    write_dot(gd, pd_)
    assert _read_text_dir(pd_) == "digraph {\n1 -> 0;\n1 -> 2;\n}\n"


def test_read_matrix_market_symmetric_pattern(tmp_path, spark):
    mtx = (
        "%%MatrixMarket matrix coordinate pattern symmetric\n"
        "% a comment\n"
        "4 4 3\n"
        "2 1\n"
        "3 1\n"
        "4 3\n"
    )
    f = tmp_path / "s.mtx"
    f.write_text(mtx)
    g = read_matrix_market(spark, str(f))
    assert not g.directed
    got = {(r["src"], r["dst"]) for r in g.E.collect()}
    assert got == {(0, 1), (0, 2), (2, 3)}


def test_read_matrix_market_general_real(tmp_path, spark):
    mtx = (
        "%%MatrixMarket matrix coordinate real general\n"
        "3 3 2\n"
        "1 2 0.5\n"
        "3 1 2.0\n"
    )
    f = tmp_path / "g.mtx"
    f.write_text(mtx)
    g = read_matrix_market(spark, str(f))
    assert g.directed
    got = {(r["src"], r["dst"], r["weight"]) for r in g.E.collect()}
    assert got == {(0, 1, 0.5), (2, 0, 2.0)}


def test_read_matrix_market_rejects_bad_header(tmp_path, spark):
    f = tmp_path / "bad.mtx"
    f.write_text("%%NotMatrixMarket foo\n1 1 0\n")
    with pytest.raises(ValueError):
        read_matrix_market(spark, str(f))


# -------------------------------------------------- RK approx betweenness


def test_approx_betweenness_rk_karate(spark):
    """RK path-sampling estimator vs exact Brandes on karate: the top
    exact-BC hub must rank in the approx top-3 at r=400 samples, scores
    live in [0, 1], and the whole thing is seed-deterministic."""
    from networkit_spark.graph import GraphDF
    from networkit_spark.operators.betweenness import (
        approx_betweenness,
        betweenness,
    )
    from tests.fixtures import KARATE_EDGES, KARATE_N

    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    approx = {
        r["id"]: r["score"]
        for r in approx_betweenness(g, n_samples=400, seed=7).collect()
    }
    assert len(approx) == KARATE_N
    assert all(0.0 <= s <= 1.0 for s in approx.values())
    assert sum(approx.values()) > 0
    exact = {r["id"]: r["score"] for r in betweenness(g).collect()}
    top_exact = max(exact, key=exact.get)
    top3_approx = sorted(approx, key=approx.get, reverse=True)[:3]
    assert top_exact in top3_approx
    # leaves with zero exact BC stay (near) zero
    zero_nodes = [i for i, s in exact.items() if s == 0.0]
    assert all(approx[i] <= 0.05 for i in zero_nodes)
    # deterministic
    again = {
        r["id"]: r["score"]
        for r in approx_betweenness(g, n_samples=400, seed=7).collect()
    }
    assert again == approx


def test_approx_betweenness_trivial_diameter_zero(spark):
    """Reference short-circuit: VD <= 2 (complete graph) => all zeros."""
    from networkit_spark.graph import GraphDF
    from networkit_spark.operators.betweenness import approx_betweenness

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    g = GraphDF.from_edge_list(spark, k4, num_nodes=4)
    got = {r["id"]: r["score"] for r in approx_betweenness(g, seed=3).collect()}
    assert got == {0: 0.0, 1: 0.0, 2: 0.0, 3: 0.0}


def test_approx_betweenness_path_graph_epsilon_formula(spark):
    """On a path graph the middle node lies on the most pairs; the
    epsilon/delta sample-size formula drives r (no n_samples given)."""
    from networkit_spark.graph import GraphDF
    from networkit_spark.operators.betweenness import approx_betweenness

    n = 9
    g = GraphDF.from_edge_list(
        spark, [(i, i + 1) for i in range(n - 1)], num_nodes=n
    )
    got = {
        r["id"]: r["score"]
        for r in approx_betweenness(g, epsilon=0.2, delta=0.1, seed=5).collect()
    }
    mid = max(got, key=got.get)
    assert mid in (3, 4, 5)
    assert got[0] == 0.0 and got[n - 1] == 0.0  # endpoints never internal


# ------------------------------------------------------------------ IVF ANN


def test_knn_ivf_full_probe_equals_bruteforce(spark):
    """Probing every cell makes IVF exhaustive: output must equal
    knn_bruteforce exactly (same rounding + tie-breaks)."""
    from networkit_spark.functions.similarity import knn_bruteforce, knn_ivf

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = knn_bruteforce(emb, queries, k=5).collect()
    ivf = knn_ivf(emb, queries, k=5, n_cells=8, nprobe=8).collect()
    assert sorted(map(tuple, ivf)) == sorted(map(tuple, exact))


def test_knn_ivf_recall_and_determinism(spark):
    from networkit_spark.functions.similarity import knn_bruteforce, knn_ivf

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 16)
    exact = {
        (r["qid"], r["cid"]) for r in knn_bruteforce(emb, queries, k=5).collect()
    }
    got = knn_ivf(emb, queries, k=5, n_cells=16, nprobe=6, seed=42).collect()
    approx = {(r["qid"], r["cid"]) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # probing 6/16 cells keeps the majority of true top-5
    again = knn_ivf(emb, queries, k=5, n_cells=16, nprobe=6, seed=42).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, got))


def test_read_gml_reference_fixtures(spark):
    """The reference's own IOGTest GML fixtures + expectations
    (io/test/IOGTest.cpp:592-618): 5 nodes, self-loops kept, directedness
    honored."""
    und = read_gml(spark, "/root/reference/input/jazz2_undirected.gml")
    assert und.V.count() == 5 and not und.directed
    e_u = {(r["src"], r["dst"]) for r in und.E.collect()}
    assert (0, 2) in e_u and (0, 1) in e_u
    assert (0, 0) in e_u and (1, 1) in e_u  # self loops preserved
    d = read_gml(spark, "/root/reference/input/jazz2_directed.gml")
    assert d.V.count() == 5 and d.directed
    e_d = {(r["src"], r["dst"]) for r in d.E.collect()}
    assert (0, 2) in e_d and (2, 0) not in e_d
    assert (0, 1) in e_d and (1, 0) not in e_d
    assert (0, 0) in e_d and (1, 1) in e_d


# ----------------------------------------------------------- binary formats


def test_read_graphtool_power_golden(spark):
    """IOGTest.cpp:621-628: power.gt has 4941 nodes / 6594 edges,
    undirected."""
    from networkit_spark.sources.readers import read_graphtool

    g = read_graphtool(spark, "/root/reference/input/power.gt")
    assert not g.directed
    assert g.V.count() == 4941
    assert g.number_of_edges() == 6594


def test_graphtool_roundtrip(tmp_path, spark):
    from networkit_spark.graph import GraphDF
    from networkit_spark.sources.readers import read_graphtool, write_graphtool

    e = spark.createDataFrame(
        [(0, 1, 1.0), (2, 1, 1.0), (2, 3, 1.0), (3, 4, 1.0), (0, 0, 1.0)],
        "src long, dst long, weight double",
    )
    for directed in (False, True):
        g = GraphDF.from_edges(e, directed=directed)
        p = str(tmp_path / f"g{int(directed)}.gt")
        write_graphtool(g, p)
        h = read_graphtool(spark, p)
        assert h.directed == directed
        want = {(r["src"], r["dst"]) for r in g.E.collect()}
        got = {(r["src"], r["dst"]) for r in h.E.collect()}
        assert got == want


def test_thrill_roundtrip_star(tmp_path, spark):
    """The reference's own writer/reader test shape (IOGTest.cpp:723-748):
    a 257-node star centered at 129 — degree > 128 exercises the varint."""
    from networkit_spark.graph import GraphDF
    from networkit_spark.sources.readers import read_thrill, write_thrill

    n, center = 257, 129
    e = spark.createDataFrame(
        [(u, center, 1.0) for u in range(n) if u != center],
        "src long, dst long, weight double",
    )
    g = GraphDF.from_edges(e, directed=False)
    p = str(tmp_path / "star.thrill")
    write_thrill(g, p)
    h = read_thrill(spark, p)
    assert h.V.count() == n
    assert h.number_of_edges() == n - 1
    want = {(r["src"], r["dst"]) for r in g.E.collect()}
    got = {(r["src"], r["dst"]) for r in h.E.collect()}
    assert got == want


def test_read_thrill_celegans_matches_metis_twin(spark):
    """input/celegans_metabolic.thrill is the binary twin of
    input/celegans_metabolic.graph — both must parse to the same graph."""
    from networkit_spark.sources.readers import read_metis, read_thrill

    gm = read_metis(spark, "/root/reference/input/celegans_metabolic.graph")
    gt_ = read_thrill(spark, "/root/reference/input/celegans_metabolic.thrill")
    assert gt_.V.count() == gm.V.count()
    em = {(r["src"], r["dst"]) for r in gm.E.collect()}
    et = {(r["src"], r["dst"]) for r in gt_.E.collect()}
    assert em == et


def test_binary_partition_roundtrip(tmp_path, spark):
    from networkit_spark.sources.readers import (
        read_binary_edgelist_partition,
        read_binary_partition,
        write_binary_edgelist_partition,
        write_binary_partition,
    )

    part = spark.createDataFrame(
        [(0, 2), (1, 0), (2, 2), (3, 5_000_000_000)], "id long, label long"
    )
    p1 = str(tmp_path / "p.bin")
    write_binary_partition(part, p1, width=8)
    got = {(r["id"], r["label"]) for r in read_binary_partition(spark, p1, 8).collect()}
    assert got == {(0, 2), (1, 0), (2, 2), (3, 5_000_000_000)}
    # width-4 rejects labels over 2^32-1 like the reference
    with pytest.raises(ValueError):
        write_binary_partition(part, str(tmp_path / "p4.bin"), width=4)
    p2 = str(tmp_path / "pe.bin")
    write_binary_edgelist_partition(part, p2, first_node=1, width=8)
    got2 = {
        (r["id"], r["label"])
        for r in read_binary_edgelist_partition(spark, p2, first_node=1).collect()
    }
    assert got2 == got


def test_write_dot_partition(tmp_path, spark):
    from networkit_spark.graph import GraphDF
    from networkit_spark.sources.readers import write_dot_partition

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    # node 3 is isolated -> skipped like the reference
    v = spark.createDataFrame([(0,), (1,), (2,), (3,)], "id long")
    g = GraphDF.from_edges(e, directed=False, vertices=v)
    part = spark.createDataFrame(
        [(0, 7), (1, 7), (2, 9), (3, 9)], "id long, label long"
    )
    p = str(tmp_path / "p.dot")
    write_dot_partition(g, part, p)
    content = _read_text_dir(p)
    assert content.startswith("graph {\n")
    assert '0 [style=filled, color="0.0,0.99,0.99", label=7];' in content
    assert '2 [style=filled, color="0.5,0.99,0.99", label=9];' in content
    assert "3 [" not in content  # isolated node skipped
    assert "0 -- 1;" in content and content.rstrip().endswith("}")


# ------------------------------------------------------------- GraphML/GEXF


def test_graphml_roundtrip(tmp_path, spark):
    from networkit_spark.graph import GraphDF
    from networkit_spark.sources.xmlio import read_graphml, write_graphml

    e = spark.createDataFrame(
        [(0, 1, 2.5), (1, 2, 0.5), (0, 2, 1.0)], "src long, dst long, weight double"
    )
    for directed, weighted in [(False, True), (True, False)]:
        g = GraphDF.from_edges(e, directed=directed, weighted=weighted)
        p = str(tmp_path / f"g{int(directed)}{int(weighted)}.graphml")
        write_graphml(g, p)
        h = read_graphml(spark, p)
        assert h.directed == directed and h.weighted == weighted
        want = {
            (r["src"], r["dst"], r["weight"] if weighted else 1.0)
            for r in g.E.collect()
        }
        got = {(r["src"], r["dst"], r["weight"]) for r in h.E.collect()}
        assert got == want


def test_read_gexf_static_reference_fixture(spark):
    """input/staticTest.gexf (the reference's celegans sample,
    test_graphio.py): static mode -> empty event stream."""
    from networkit_spark.sources.xmlio import read_gexf

    g, events = read_gexf(spark, "/root/reference/input/staticTest.gexf")
    assert events.count() == 0
    assert g.V.count() > 0 and g.number_of_edges() > 0


def test_read_gexf_dynamic_reference_fixtures(spark):
    """The reference's three dynamic fixtures parse into event streams with
    the GEXFIO invariants: additions precede removals of the same element,
    TIME_STEP rows delimit distinct timestamps, stream is time-sorted."""
    from networkit_spark.sources.xmlio import read_gexf

    for fx in ("dynamicTest.gexf", "dynamicTest2.gexf", "dynamicTest3.gexf"):
        g, events = read_gexf(spark, f"/root/reference/input/{fx}")
        rows = events.orderBy("seq").collect()
        assert rows, fx
        times = [r["t"] for r in rows]
        assert times == sorted(times), fx
        n_steps = sum(1 for r in rows if r["type"] == "TIME_STEP")
        n_distinct_t = len({r["t"] for r in rows if r["type"] != "TIME_STEP"})
        assert n_steps == max(n_distinct_t - 1, 0), fx
        # per-edge ordering: a pair's first event is an addition UNLESS the
        # edge is in the initial graph (end-only spells, GEXFIO case 4)
        initial = {(r["src"], r["dst"]) for r in g.E.collect()}
        initial |= {(b, a) for a, b in initial}
        first = {}
        for r in rows:
            if r["type"].startswith("EDGE_") and (r["u"], r["v"]) not in first:
                first[(r["u"], r["v"])] = r["type"]
        assert first, fx
        for (u, v), t in first.items():
            assert t == "EDGE_ADDITION" or (u, v) in initial, (fx, u, v, t)


def test_gexf_roundtrip_static_and_dynamic(tmp_path, spark):
    from networkit_spark.graph import GraphDF
    from networkit_spark.sources.xmlio import read_gexf, write_gexf

    e = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    g = GraphDF.from_edges(e, directed=True)
    p = str(tmp_path / "s.gexf")
    write_gexf(g, p)
    h, ev = read_gexf(spark, p)
    assert ev.count() == 0 and h.directed
    assert {(r["src"], r["dst"]) for r in h.E.collect()} == {(0, 1), (1, 2)}
    # dynamic: write a stream, read it back, fold-equivalent invariants
    events = spark.createDataFrame(
        [
            (0, "NODE_ADDITION", 3, 0, 1.0, 1.0),
            (1, "EDGE_ADDITION", 2, 3, 1.0, 1.0),
            (2, "TIME_STEP", 0, 0, 0.0, 1.0),
            (3, "EDGE_REMOVAL", 2, 3, 1.0, 2.0),
        ],
        "seq long, type string, u long, v long, w double, t double",
    )
    pd_ = str(tmp_path / "d.gexf")
    write_gexf(g, pd_, events=events)
    h2, ev2 = read_gexf(spark, pd_)
    got = [(r["type"], r["u"], r["v"], r["t"]) for r in ev2.orderBy("seq").collect()]
    assert ("NODE_ADDITION", 3, 0, 1.0) in got
    assert ("EDGE_REMOVAL", 2, 3, 2.0) in got
    assert any(t[0] == "TIME_STEP" for t in got)
