from networkit_spark.graph import GraphDF
from networkit_spark.operators.profiling import profile

from tests.fixtures import KARATE_EDGES, KARATE_N, KARATE_TRIANGLES_TOTAL


def test_profile_karate(spark):
    g = GraphDF.from_edge_list(spark, KARATE_EDGES, num_nodes=KARATE_N)
    p = profile(g, include_triangles=True, include_diameter=True)
    assert p["nodes"] == KARATE_N
    assert p["edges"] == len(KARATE_EDGES)
    assert p["self_loops"] == 0
    assert p["max_degree"] == 17
    assert p["components"] == 1
    assert p["largest_component"] == KARATE_N
    assert p["triangles"] == KARATE_TRIANGLES_TOTAL
    assert p["diameter_lower_bound"] >= 3
    assert 0 < p["density"] < 1
