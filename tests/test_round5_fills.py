"""Round-5 fixes (VERDICT r4 'Next round' #1-#3):

- Borůvka's per-component min-edge pick is a struct-min groupBy agg, not
  a row_number window over partitionBy(c_src) — giant components never
  sort in one task; tie-breaks byte-identical to the old window order.
- degree_preserving_shuffle ranks within degree classes via the two-stage
  global ranking (plans/ranking.py), never Window.partitionBy("degree").
- compute_scaling_factor passes a DataFrame source set (no V collect).
"""

import random

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF
from networkit_spark.operators.misc import (
    _component_min_edge_pick,
    minimum_spanning_forest,
)
from networkit_spark.operators.randomization import degree_preserving_shuffle


def _kruskal_oracle(n, edges):
    """Pure-python MSF with Borůvka's (weight, lo, hi) tie-break order —
    equal minimum forests for distinct effective keys."""
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, lo, hi in sorted((w, min(u, v), max(u, v)) for u, v, w in edges):
        ru, rv = find(lo), find(hi)
        if ru != rv:
            parent[ru] = rv
            out.append((lo, hi, w))
    return sorted(out)


def test_boruvka_pick_windowless_plan(spark):
    ec = spark.createDataFrame(
        [(0, 1, 1.0, 10, 20), (2, 3, 2.0, 10, 30), (4, 5, 3.0, 30, 10)],
        "src long, dst long, weight double, c_src long, c_dst long",
    )
    for desc in (False, True):
        for seed in (None, 7):
            picks = _component_min_edge_pick(ec, desc, seed)
            plan = picks._jdf.queryExecution().toString()
            assert "windowspecdefinition" not in plan
            assert "Window" not in picks._jdf.queryExecution().executedPlan().toString()
    # winner semantics: min weight, id tie-break
    got = {
        (r["c_src"], r["src"], r["dst"], r["weight"], r["c_dst"])
        for r in _component_min_edge_pick(ec, False, None).collect()
    }
    assert got == {(10, 0, 1, 1.0, 20), (30, 4, 5, 3.0, 10)}
    # descending picks the max
    got_d = {
        (r["c_src"], r["src"], r["dst"])
        for r in _component_min_edge_pick(ec, True, None).collect()
    }
    assert got_d == {(10, 2, 3), (30, 4, 5)}


def test_boruvka_pick_tiebreak_matches_window_order(spark):
    # equal weights: winner must be (least lo, then least hi) — the old
    # window's orderBy(asc weight, asc least, asc greatest)
    ec = spark.createDataFrame(
        [(9, 2, 1.0, 1, 2), (3, 8, 1.0, 1, 3), (3, 4, 1.0, 1, 4)],
        "src long, dst long, weight double, c_src long, c_dst long",
    )
    [r] = _component_min_edge_pick(ec, False, None).collect()
    assert (r["src"], r["dst"], r["c_dst"]) == (2, 9, 2)


def test_msf_giant_single_component(spark):
    # one giant component: a 160-node connected graph (random spanning
    # chain + chords), distinct weights -> unique MSF; late Borůvka rounds
    # see ONE component holding every remaining cross-edge
    rng = random.Random(5)
    n = 160
    edges = []
    seen = set()
    for i in range(1, n):
        j = rng.randrange(i)
        edges.append((i, j, float(len(edges) * 7 % 997) + 0.5))
        seen.add((min(i, j), max(i, j)))
    for _ in range(300):
        u, v = rng.randrange(n), rng.randrange(n)
        if u != v and (min(u, v), max(u, v)) not in seen:
            seen.add((min(u, v), max(u, v)))
            edges.append((u, v, float(len(edges) * 13 % 1009) + 0.25))
    g = GraphDF.from_edge_list(
        spark, edges, directed=False, weighted=True, num_nodes=n
    )
    got = sorted(
        (r["src"], r["dst"], r["weight"])
        for r in minimum_spanning_forest(g).collect()
    )
    want = _kruskal_oracle(n, edges)
    assert len(got) == n - 1
    assert got == want


def test_degree_preserving_shuffle_windowless_all_degree_one(spark):
    # all-degree-1 fixture: a perfect matching — ONE degree class holding
    # every node, the r4 skew scenario. Plan must carry no
    # window partitioned by degree (only the _pid-partitioned two-stage
    # rank windows), and the degree sequence must be exactly preserved.
    n = 200
    g = GraphDF.from_edge_list(
        spark,
        [(2 * i, 2 * i + 1) for i in range(n // 2)],
        directed=False,
        num_nodes=n,
    )
    g2 = degree_preserving_shuffle(g, seed=11)
    plan = g2.E._jdf.queryExecution().toString()
    assert "windowspecdefinition(degree" not in plan
    deg = {
        r["id"]: r["degree"] for r in g.degrees().collect()
    }
    deg2 = {r["id"]: r["degree"] for r in g2.degrees().collect()}
    assert deg == deg2
    assert g2.E.count() == n // 2
    # and it actually shuffles: some edge differs from the identity
    orig = {(r["src"], r["dst"]) for r in g.E.collect()}
    new = {(r["src"], r["dst"]) for r in g2.E.collect()}
    assert new != orig


def test_degree_preserving_shuffle_mixed_degrees(spark):
    # star + path: several degree classes; per-node degree exact
    edges = [(0, i) for i in range(1, 8)] + [(8, 9), (9, 10), (10, 11)]
    g = GraphDF.from_edge_list(spark, edges, directed=False, num_nodes=12)
    g2 = degree_preserving_shuffle(g, seed=3)
    d1 = {r["id"]: r["degree"] for r in g.degrees().collect()}
    d2 = {r["id"]: r["degree"] for r in g2.degrees().collect()}
    assert d1 == d2


def test_layout_no_vertex_collect():
    # VERDICT r4 weak #3: no `.collect()` of the vertex table in layout
    import inspect

    from networkit_spark.operators import layout

    src = inspect.getsource(layout.compute_scaling_factor)
    assert ".collect()]" not in src.split("agg(")[0]
    assert 'graph.V.select("id")' in src
