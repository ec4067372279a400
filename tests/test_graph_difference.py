"""GraphDifference (dynamics/GraphDifference.cpp) + DGS writer round-trip."""

import pytest

from networkit_spark.graph import GraphDF
from networkit_spark.streaming.difference import (
    graph_difference_counts,
    graph_difference_events,
)
from networkit_spark.streaming.events import (
    apply_events,
    dgs_lines_from_events,
    events_from_list,
    parse_dgs_lines,
)


def _g(spark, nodes, edges, directed=False):
    v = spark.createDataFrame([(n,) for n in nodes], "id long")
    e = spark.createDataFrame(
        [(a, b, w) for a, b, w in edges], "src long, dst long, weight double"
    )
    return GraphDF(v, e, directed=directed, weighted=True)


@pytest.fixture()
def pair(spark):
    # G1: nodes 0..4, edges 0-1(1.0), 1-2(2.0), 3-4(1.0)
    g1 = _g(spark, range(5), [(0, 1, 1.0), (1, 2, 2.0), (3, 4, 1.0)])
    # G2: node 4 removed, node 2 kept, node 7 added (beyond max id of G1
    # => ADDITION), node 3 kept; edge 3-4 gone (node removal),
    # 1-2 reweighted to 5.0, new edge 0-2
    g2 = _g(spark, [0, 1, 2, 3, 7], [(0, 1, 1.0), (1, 2, 5.0), (0, 2, 1.0)])
    return g1, g2


def test_difference_counts(spark, pair):
    g1, g2 = pair
    row = graph_difference_counts(g1, g2).collect()[0]
    assert row["edge_removals"] == 1      # 3-4
    assert row["node_removals"] == 1      # 4
    assert row["node_additions"] == 1     # 7 (> max(V1))
    assert row["node_restorations"] == 0
    assert row["edge_additions"] == 1     # 0-2
    assert row["weight_updates"] == 1     # 1-2 -> 5.0
    assert row["total_edits"] == 5


def test_difference_restoration_vs_addition(spark):
    g1 = _g(spark, [0, 1, 5], [(0, 1, 1.0)])
    # 3 <= max(V1)=5 => RESTORATION; 9 > 5 => ADDITION
    g2 = _g(spark, [0, 1, 5, 3, 9], [(0, 1, 1.0)])
    ev = graph_difference_events(g1, g2).collect()
    by = {r["u"]: r["type"] for r in ev}
    assert by[3] == "NODE_RESTORATION"
    assert by[9] == "NODE_ADDITION"


def test_difference_replay_transforms_g1_into_g2(spark, pair):
    g1, g2 = pair
    ev = graph_difference_events(g1, g2)
    # the contract that matters: replaying the edit script on G1 yields G2
    g3 = apply_events(g1, ev)
    assert sorted(r["id"] for r in g3.V.collect()) == sorted(
        r["id"] for r in g2.V.collect()
    )
    e3 = sorted((r["src"], r["dst"], r["weight"]) for r in g3.E.collect())
    e2 = sorted((r["src"], r["dst"], r["weight"]) for r in g2.E.collect())
    assert e3 == e2


def test_difference_event_order_is_replayable(spark, pair):
    g1, g2 = pair
    ev = graph_difference_events(g1, g2).orderBy("seq").collect()
    blocks = []
    for r in ev:
        b = {"EDGE_REMOVAL": 0,
             "NODE_REMOVAL": 1, "NODE_RESTORATION": 1, "NODE_ADDITION": 1,
             "EDGE_ADDITION": 2, "EDGE_WEIGHT_UPDATE": 2}[r["type"]]
        blocks.append(b)
    assert blocks == sorted(blocks)  # removals, then nodes, then additions
    assert [r["seq"] for r in ev] == list(range(len(ev)))


def test_difference_identity_is_empty(spark, pair):
    g1, _ = pair
    assert graph_difference_events(g1, g1).count() == 0


def test_difference_directedness_mismatch(spark, pair):
    g1, _ = pair
    g_dir = _g(spark, [0], [], directed=True)
    with pytest.raises(ValueError):
        graph_difference_events(g1, g_dir)


def test_dgs_round_trip(spark):
    ev = events_from_list(
        spark,
        [
            (0, "NODE_ADDITION", 0, None, None),
            (1, "NODE_ADDITION", 1, None, None),
            (2, "EDGE_ADDITION", 0, 1, 2.5),
            (3, "TIME_STEP", None, None, None),
            (4, "EDGE_WEIGHT_UPDATE", 0, 1, 0.5),
            (5, "EDGE_WEIGHT_INCREMENT", 0, 1, 1.25),
            (6, "EDGE_REMOVAL", 0, 1, None),
            (7, "NODE_REMOVAL", 1, None, None),
            (8, "NODE_RESTORATION", 1, None, None),
        ],
    )
    lines = dgs_lines_from_events(ev)
    back = parse_dgs_lines(spark, lines).orderBy("seq").collect()
    orig = ev.orderBy("seq").collect()
    assert len(back) == len(orig)  # header lines parse to no event
    for a, b in zip(orig, back):
        assert a["type"] == b["type"]
        assert a["u"] == b["u"]
        assert a["v"] == b["v"]
        if a["w"] is not None:
            assert abs(a["w"] - b["w"]) < 1e-9
    hdr = [r["value"] for r in lines.orderBy("seq").collect()[:2]]
    assert hdr == ["DGS004", "noname 0 0"]


def test_parse_reference_writer_dialect(spark):
    # exact strings DGSWriter.cpp emits, including the space-less rn quirk
    lines = spark.createDataFrame(
        [
            (0, "DGS004"),
            (1, "noname 0 0"),
            (2, "ae 3-4 3 4 weight=2.500000"),
            (3, "ce 1-2 weight=0.500000"),
            (4, "ie 1-2 weight=0.250000"),
            (5, "de 3-4"),
            (6, "rn5"),
            (7, "st"),
        ],
        "seq long, value string",
    )
    ev = {r["seq"]: r for r in parse_dgs_lines(spark, lines).collect()}
    assert 0 not in ev and 1 not in ev
    assert (ev[2]["type"], ev[2]["u"], ev[2]["v"], ev[2]["w"]) == (
        "EDGE_ADDITION", 3, 4, 2.5)
    assert (ev[3]["type"], ev[3]["u"], ev[3]["v"], ev[3]["w"]) == (
        "EDGE_WEIGHT_UPDATE", 1, 2, 0.5)
    assert (ev[4]["type"], ev[4]["w"]) == ("EDGE_WEIGHT_INCREMENT", 0.25)
    assert (ev[5]["type"], ev[5]["u"], ev[5]["v"]) == ("EDGE_REMOVAL", 3, 4)
    assert (ev[6]["type"], ev[6]["u"]) == ("NODE_RESTORATION", 5)
    assert ev[7]["type"] == "TIME_STEP"
