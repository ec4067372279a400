import os
import shutil
import tempfile
import time

import pytest

from networkit_spark.graph import GraphDF
from networkit_spark.sources.readers import (
    read_edge_list,
    read_metis,
    read_parquet,
    read_partition,
    read_snap,
    write_edge_list,
    write_parquet,
    write_partition,
)
from networkit_spark.streaming.events import (
    apply_events,
    events_from_list,
    graph_from_events,
    parse_dgs_lines,
    stream_events_to_state,
)

from tests.fixtures import KARATE_EDGES, KARATE_N


@pytest.fixture()
def tmp(request):
    d = tempfile.mkdtemp(prefix="nk_io_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_graph_from_events(spark):
    ev = events_from_list(
        spark,
        [
            (0, "NODE_ADDITION", 0, None, None),
            (1, "NODE_ADDITION", 1, None, None),
            (2, "NODE_ADDITION", 2, None, None),
            (3, "EDGE_ADDITION", 0, 1, 1.0),
            (4, "EDGE_ADDITION", 1, 2, 2.0),
            (5, "TIME_STEP", None, None, None),
            (6, "EDGE_WEIGHT_INCREMENT", 0, 1, 0.5),
            (7, "EDGE_REMOVAL", 1, 2, None),
        ],
    )
    g = graph_from_events(spark, ev)
    assert g.number_of_nodes() == 3
    edges = {(r["src"], r["dst"]): r["weight"] for r in g.E.collect()}
    assert edges == {(0, 1): 1.5}


def test_apply_events_node_removal_hides_edges(spark):
    g = GraphDF.from_edge_list(spark, [(0, 1), (1, 2)], num_nodes=3)
    ev = events_from_list(spark, [(0, "NODE_REMOVAL", 1, None, None)])
    g2 = apply_events(g, ev)
    assert g2.number_of_nodes() == 2
    assert g2.number_of_edges() == 0


def test_weight_update_then_increment(spark):
    g = GraphDF.from_edge_list(spark, [(0, 1, 1.0)], weighted=True, num_nodes=2)
    ev = events_from_list(
        spark,
        [
            (0, "EDGE_WEIGHT_UPDATE", 0, 1, 10.0),
            (1, "EDGE_WEIGHT_INCREMENT", 0, 1, 1.0),
            (2, "EDGE_WEIGHT_INCREMENT", 0, 1, 1.0),
        ],
    )
    g2 = apply_events(g, ev)
    assert {(r["src"], r["dst"]): r["weight"] for r in g2.E.collect()} == {
        (0, 1): 12.0
    }


def test_increment_without_base_applies_to_prior_state(spark):
    """An increment whose EDGE_ADDITION landed in an earlier micro-batch must
    add onto the existing edge weight (GraphUpdater increaseWeight), not be
    dropped."""
    g = GraphDF.from_edge_list(spark, [(0, 1, 2.0), (1, 2, 5.0)], weighted=True,
                               num_nodes=3)
    ev = events_from_list(
        spark, [(0, "EDGE_WEIGHT_INCREMENT", 0, 1, 1.5)]
    )
    g2 = apply_events(g, ev)
    assert {(r["src"], r["dst"]): r["weight"] for r in g2.E.collect()} == {
        (0, 1): 3.5,
        (1, 2): 5.0,
    }


def test_dgs_parse(spark):
    lines = spark.createDataFrame(
        [
            (0, "an 0"),
            (1, "an 1"),
            (2, "ae e1 0 1 2.5"),
            (3, "st"),
            (4, "dn 1"),
        ],
        "seq long, value string",
    )
    ev = parse_dgs_lines(spark, lines).collect()
    types = [r["type"] for r in sorted(ev, key=lambda r: r["seq"])]
    assert types == [
        "NODE_ADDITION", "NODE_ADDITION", "EDGE_ADDITION", "TIME_STEP",
        "NODE_REMOVAL",
    ]
    ae = [r for r in ev if r["type"] == "EDGE_ADDITION"][0]
    assert (ae["u"], ae["v"], ae["w"]) == (0, 1, 2.5)


def test_structured_streaming_ingestion(spark, tmp):
    src_dir = os.path.join(tmp, "in")
    state_dir = os.path.join(tmp, "state")
    ckpt = os.path.join(tmp, "ckpt")
    os.makedirs(src_dir)
    events_from_list(
        spark,
        [
            (0, "NODE_ADDITION", 0, None, None),
            (1, "NODE_ADDITION", 1, None, None),
            (2, "EDGE_ADDITION", 0, 1, 1.0),
        ],
    ).write.mode("overwrite").parquet(os.path.join(src_dir, "batch0"))
    stream = spark.readStream.schema(
        "seq long, type string, u long, v long, w double"
    ).parquet(os.path.join(src_dir, "*"))
    q = stream_events_to_state(spark, stream, state_dir, checkpoint_dir=ckpt)
    q.awaitTermination(60)
    g = read_parquet(spark, state_dir.replace("state", "state"))  # noqa
    v = spark.read.parquet(os.path.join(state_dir, "vertices"))
    e = spark.read.parquet(os.path.join(state_dir, "edges"))
    assert v.count() == 2
    assert [(r["src"], r["dst"], r["weight"]) for r in e.collect()] == [(0, 1, 1.0)]


def test_edge_list_roundtrip(spark, tmp):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    p = os.path.join(tmp, "karate_el")
    write_edge_list(g, p)
    g2 = read_edge_list(spark, p, directed=False)
    assert g2.number_of_edges() == len(KARATE_EDGES)
    e1 = sorted((r["src"], r["dst"]) for r in g.E.collect())
    e2 = sorted((r["src"], r["dst"]) for r in g2.E.collect())
    assert e1 == e2


def test_snap_reader_dedups_and_remaps(spark, tmp):
    p = os.path.join(tmp, "snap.txt")
    with open(p, "w") as f:
        f.write("# comment\n10 20\n10 20\n20 30\n\n")
    g = read_snap(spark, p, directed=True, remap=True)
    assert g.number_of_edges() == 2
    ids = sorted(r["id"] for r in g.V.collect())
    assert ids == [0, 1, 2]  # remapped to consecutive


def test_metis_reader(spark, tmp):
    # triangle 1-2-3 in 1-based METIS
    p = os.path.join(tmp, "tri.graph")
    with open(p, "w") as f:
        f.write("3 3\n2 3\n1 3\n1 2\n")
    g = read_metis(spark, p)
    assert g.number_of_nodes() == 3
    assert g.number_of_edges() == 3


def test_parquet_roundtrip(spark, tmp):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    p = os.path.join(tmp, "pq")
    write_parquet(g, p)
    g2 = read_parquet(spark, p)
    assert g2.number_of_edges() == len(KARATE_EDGES)
    assert g2.number_of_nodes() == KARATE_N


def test_partition_roundtrip(spark, tmp):
    part = spark.createDataFrame(
        [(i, i % 3) for i in range(10)], "id long, label long"
    )
    p = os.path.join(tmp, "part")
    write_partition(part, p)
    p2 = read_partition(spark, p)
    assert {(r["id"], r["label"]) for r in p2.collect()} == {
        (i, i % 3) for i in range(10)
    }


def test_metis_writer_roundtrip(spark, tmp):
    from networkit_spark.sources.readers import write_metis

    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    p = os.path.join(tmp, "karate_metis")
    write_metis(g, p, weighted=False)
    g2 = read_metis(spark, p)
    assert g2.number_of_nodes() == KARATE_N
    e1 = sorted((r["src"], r["dst"]) for r in g.E.collect())
    e2 = sorted((r["src"], r["dst"]) for r in g2.E.collect())
    assert e1 == e2
    # header matches the reference dialect: "n m 0"
    import glob

    txt = open(glob.glob(os.path.join(p, "part-*"))[0]).read().splitlines()
    assert txt[0] == f"{KARATE_N} {len(KARATE_EDGES)} 0"
    assert len(txt) == KARATE_N + 1  # one adjacency line per node


def test_metis_writer_weighted_dialect(spark, tmp):
    from networkit_spark.sources.readers import write_metis

    g = GraphDF.from_edge_list(
        spark, [(0, 1, 2.0), (1, 2, 3.0)], weighted=True, num_nodes=3
    )
    p = os.path.join(tmp, "w_metis")
    write_metis(g, p, weighted=True)
    import glob

    txt = open(glob.glob(os.path.join(p, "part-*"))[0]).read().splitlines()
    assert txt[0] == "3 2 1"
    assert txt[1] == "2 2.0"          # node 1's neighbor 2 (1-based) w=2
    assert txt[2] == "1 2.0\t3 3.0"   # node 2: nbrs 1 (w=2) and 3 (w=3)


def test_snap_writer_golden(spark, tmp):
    from networkit_spark.sources.readers import write_snap

    g = GraphDF.from_edge_list(spark, [(0, 1), (1, 2), (0, 2)], num_nodes=3)
    p = os.path.join(tmp, "snap_out")
    write_snap(g, p)
    import glob

    txt = open(glob.glob(os.path.join(p, "part-*"))[0]).read().splitlines()
    assert txt[0] == "p 3 3 u u 0"
    assert txt[1:] == ["0 1", "0 2", "1 2"]
