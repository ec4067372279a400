import pytest

from networkit_spark.graph import GraphDF
from networkit_spark.operators.components import (
    connected_components,
    extract_largest_connected_component,
    number_of_components,
    weakly_connected_components,
)
from networkit_spark.oracle.numpy_ref import connected_components_oracle

from tests.fixtures import (
    KARATE_EDGES,
    KARATE_N,
    LCC_EXTRACT_EDGES,
    LCC_EXTRACT_LARGEST_EDGES,
    LCC_EXTRACT_LARGEST_NODES,
    LCC_EXTRACT_N,
    TINY_CC_EDGES,
    TINY_CC_EXPECTED,
    TINY_CC_N,
    powerlaw_directed_edges,
)


def _labels(df, col="component"):
    return {r["id"]: r[col] for r in df.collect()}


def test_tiny_cc_exact_golden(spark):
    g = GraphDF.from_edge_list(spark, TINY_CC_EDGES, num_nodes=TINY_CC_N)
    comp = _labels(connected_components(g))
    assert comp == TINY_CC_EXPECTED  # exact ids incl. dense-rank renumbering
    assert comp[0] == comp[19] and comp[3] == comp[7]


def test_tiny_cc_matches_oracle(spark):
    g = GraphDF.from_edge_list(spark, TINY_CC_EDGES, num_nodes=TINY_CC_N)
    comp = _labels(connected_components(g))
    want = connected_components_oracle(TINY_CC_N, TINY_CC_EDGES)
    assert comp == want


def test_karate_single_component(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    comp = connected_components(g)
    assert number_of_components(comp) == 1


def test_directed_raises_use_wcc(spark):
    g = GraphDF.from_edge_list(spark, [(0, 1)], directed=True, num_nodes=2)
    with pytest.raises(ValueError):
        connected_components(g)


def test_weakly_cc_powerlaw(spark):
    edges = powerlaw_directed_edges(n=150, m=700)
    ids = sorted({u for u, v in edges} | {v for u, v in edges})
    e = spark.createDataFrame(
        [(u, v, 1.0) for u, v in edges], "src long, dst long, weight double"
    )
    g = GraphDF.from_edges(e, directed=True)
    comp = _labels(weakly_connected_components(g))
    want = connected_components_oracle(len(ids), edges, node_ids=ids)
    assert comp == want


def test_extract_largest_connected_component(spark):
    # test_algorithms.py:429-443 analog
    g = GraphDF.from_edge_list(spark, LCC_EXTRACT_EDGES, num_nodes=LCC_EXTRACT_N)
    sub = extract_largest_connected_component(g, compact=True)
    assert sub.number_of_nodes() == LCC_EXTRACT_LARGEST_NODES
    assert sub.number_of_edges() == LCC_EXTRACT_LARGEST_EDGES
    # compacted ids are order-preserving → 0..5
    ids = sorted(r["id"] for r in sub.V.collect())
    assert ids == list(range(LCC_EXTRACT_LARGEST_NODES))
