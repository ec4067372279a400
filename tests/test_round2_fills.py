"""Round-2 completeness fill-ins: graph transforms, Cover IO + F1,
partition measures, KONECT modes, LPDegreeOrdered, randomization,
link samplers."""

import math

import pytest
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF

from fixtures import KARATE_EDGES, KARATE_N


def test_remove_all_edges_and_isolated_set(spark):
    g = GraphDF.from_edge_list(spark, [(0, 1), (1, 2), (2, 3)], num_nodes=4)
    assert g.remove_all_edges().number_of_edges() == 0
    assert g.remove_all_edges().number_of_nodes() == 4
    s = spark.createDataFrame([(0,), (1,)], "id long")
    g2 = g.remove_edges_from_isolated_set(s)
    kept = sorted((r["src"], r["dst"]) for r in g2.E.collect())
    assert kept == [(1, 2), (2, 3)]  # (0,1) had both endpoints in S


def test_remove_multi_edges_modes(spark):
    e = spark.createDataFrame(
        [(0, 1, 2.0), (0, 1, 3.0), (1, 2, 1.0)], "src long, dst long, weight double"
    )
    g = GraphDF(spark.range(3).select(F.col("id").cast("long")), e,
                directed=True, weighted=True)
    assert {(r["src"], r["dst"]): r["weight"] for r in
            g.remove_multi_edges("min").E.collect()} == {(0, 1): 2.0, (1, 2): 1.0}
    assert {(r["src"], r["dst"]): r["weight"] for r in
            g.remove_multi_edges("sum").E.collect()} == {(0, 1): 5.0, (1, 2): 1.0}
    assert {(r["src"], r["dst"]): r["weight"] for r in
            g.remove_multi_edges("discard").E.collect()} == {(1, 2): 1.0}


def test_cover_roundtrip_and_f1(tmp_path, spark):
    from networkit_spark.operators.community import cover_f1_similarity
    from networkit_spark.sources.readers import read_cover, write_cover

    cover = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (2, 1), (3, 1)], "id long, subset long"
    )
    p = str(tmp_path / "cover_out")
    write_cover(cover, p)
    back = read_cover(spark, p)
    assert sorted((r["id"], r["subset"]) for r in back.collect()) == sorted(
        (r["id"], r["subset"]) for r in cover.collect()
    )
    ref = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, subset long"
    )
    f1 = {r["subset"]: r["f1"] for r in cover_f1_similarity(cover, ref).collect()}
    # cluster 0 = {0,1,2}: best vs ref0={0,1}: ol=2 → 2*2/(3+2)=0.8
    assert math.isclose(f1[0], 0.8, abs_tol=1e-9)
    # cluster 1 = {2,3}: vs ref1={2,3}: ol=2 → 2*2/(2+2)=1.0
    assert math.isclose(f1[1], 1.0, abs_tol=1e-9)


def test_isolated_interpartition_measures(spark):
    from networkit_spark.operators.community import (
        isolated_interpartition_conductance,
        isolated_interpartition_expansion,
    )

    # two triangles joined by one edge; partition = the two triangles
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    g = GraphDF.from_edge_list(spark, edges, num_nodes=6)
    part = spark.createDataFrame(
        [(i, 0 if i < 3 else 1) for i in range(6)], "id long, label long"
    )
    cond = {r["label"]: r["conductance"]
            for r in isolated_interpartition_conductance(g, part).collect()}
    # each side: cut=1, vol=7 (2*3 intra + 1 inter), total=14 → 1/min(7,7)
    assert math.isclose(cond[0], 1 / 7, abs_tol=1e-9)
    exp = {r["label"]: r["expansion"]
           for r in isolated_interpartition_expansion(g, part).collect()}
    assert math.isclose(exp[0], 1 / 3, abs_tol=1e-9)


def test_fragmentation_and_stable_nodes(spark):
    from networkit_spark.operators.community import (
        partition_fragmentation,
        stable_partition_nodes,
    )

    # path 0-1  2-3 (disconnected), one cluster {0,1,2} fragments into
    # {0,1} and {2}
    g = GraphDF.from_edge_list(spark, [(0, 1), (2, 3)], num_nodes=4)
    part = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1)], "id long, label long"
    )
    frag = {r["label"]: r["fragmentation"]
            for r in partition_fragmentation(g, part).collect()}
    assert math.isclose(frag[0], 1 - 2 / 3, abs_tol=1e-9)
    assert math.isclose(frag[1], 0.0, abs_tol=1e-9)
    stable = {r["id"]: r["stable"]
              for r in stable_partition_nodes(g, part).collect()}
    # 0,1: all weight to own label → stable; 2: all weight to label 1 →
    # own weight 0 → unstable; 3: weight to label 0 only → unstable
    assert stable == {0: True, 1: True, 2: False, 3: False}


def test_read_konect_modes(tmp_path, spark):
    from networkit_spark.sources.readers import read_konect

    p = tmp_path / "g.konect"
    p.write_text("% asym weighted\n1 2 5.0\n1 2 3.0\n2 3 1.0\n")
    g = read_konect(spark, str(p), multiple_edges="sum")
    assert g.directed
    assert {(r["src"], r["dst"]): r["weight"] for r in g.E.collect()} == {
        (0, 1): 8.0,
        (1, 2): 1.0,
    }
    g2 = read_konect(spark, str(p), multiple_edges="discard")
    assert {(r["src"], r["dst"]) for r in g2.E.collect()} == {(1, 2)}


def test_lp_degree_ordered(spark):
    from networkit_spark.operators.plp import lp_degree_ordered

    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    a = {r["id"]: r["label"] for r in lp_degree_ordered(g, sweeps=3).collect()}
    b = {r["id"]: r["label"] for r in lp_degree_ordered(g, sweeps=3).collect()}
    assert a == b  # deterministic
    assert len(set(a.values())) < KARATE_N  # labels actually propagate


def test_degree_preserving_shuffle(spark):
    from networkit_spark.operators.randomization import degree_preserving_shuffle

    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    g2 = degree_preserving_shuffle(g, seed=7)
    d1 = sorted(r["degree"] for r in g.degrees().collect())
    d2 = sorted(r["degree"] for r in g2.degrees().collect())
    assert d1 == d2
    assert g2.number_of_edges() == g.number_of_edges()


def test_global_curveball_preserves_degrees(spark):
    from networkit_spark.operators.randomization import global_curveball

    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    g2 = global_curveball(g, rounds=4, seed=3)
    deg1 = {r["id"]: r["degree"] for r in g.degrees().collect()}
    deg2 = {r["id"]: r["degree"] for r in g2.degrees().collect()}
    assert deg1 == deg2  # EXACT degree preservation
    # simple graph: no dups, no self-loops
    assert g2.E.filter("src = dst").count() == 0
    assert g2.E.groupBy("src", "dst").count().filter("count > 1").count() == 0
    # and it actually shuffled something
    e1 = {(r["src"], r["dst"]) for r in g.E.collect()}
    e2 = {(r["src"], r["dst"]) for r in g2.E.collect()}
    assert e1 != e2
    # deterministic
    g3 = global_curveball(g, rounds=4, seed=3)
    e3 = {(r["src"], r["dst"]) for r in g3.E.collect()}
    assert e2 == e3


def test_random_link_sampler_and_thresholder(spark):
    from networkit_spark.operators.linkprediction import (
        link_thresholder,
        random_link_sampler,
    )

    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    g60 = random_link_sampler(g, 0.6, seed=4)
    g80 = random_link_sampler(g, 0.8, seed=4)
    e60 = {(r["src"], r["dst"]) for r in g60.E.collect()}
    e80 = {(r["src"], r["dst"]) for r in g80.E.collect()}
    assert len(e60) == round(len(KARATE_EDGES) * 0.6)
    assert e60 <= e80  # nested
    scores = spark.createDataFrame(
        [(0, 1, 0.9), (1, 2, 0.4), (2, 3, 0.1)], "u long, v long, score double"
    )
    got = {(r["u"], r["v"]) for r in link_thresholder(scores, 0.3, 0.8).collect()}
    assert got == {(1, 2)}
