"""Graph profiling report (reference: networkit/profiling/ — the Python
summary-report module): one pass of summary statistics as a single wide
row, each stat an aggregate job. Heavy stats (triangles, diameter,
components) are opt-in flags.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def profile(
    graph: GraphDF,
    include_components: bool = True,
    include_triangles: bool = False,
    include_diameter: bool = False,
) -> dict:
    deg = graph.degrees().persist()
    stats = deg.agg(
        F.count("*").alias("n"),
        F.max("degree").alias("max_deg"),
        F.avg("degree").alias("avg_deg"),
        F.expr("percentile_approx(degree, 0.5)").alias("med_deg"),
        F.sum(F.when(F.col("degree") == 0, 1).otherwise(0)).alias("isolated"),
    ).collect()[0]
    m = graph.number_of_edges()
    loops = graph.number_of_self_loops()
    out = {
        "nodes": stats["n"],
        "edges": m,
        "self_loops": loops,
        "directed": graph.directed,
        "weighted": graph.weighted,
        "density": graph.density(),
        "max_degree": stats["max_deg"],
        "avg_degree": float(stats["avg_deg"] or 0),
        "median_degree": stats["med_deg"],
        "isolated_nodes": stats["isolated"],
        "total_edge_weight": graph.total_edge_weight(),
    }
    deg.unpersist()
    if include_components:
        from networkit_spark.operators.components import (
            connected_components,
            number_of_components,
            weakly_connected_components,
        )

        comp = (
            weakly_connected_components(graph)
            if graph.directed
            else connected_components(graph)
        )
        comp = comp.persist()
        out["components"] = number_of_components(comp)
        out["largest_component"] = (
            comp.groupBy("component").count().agg(F.max("count")).collect()[0][0]
        )
        comp.unpersist()
    if include_triangles and not graph.directed:
        from networkit_spark.operators.triangles import (
            average_local_clustering_coefficient,
            triangle_count_total,
        )

        out["triangles"] = triangle_count_total(graph)
        out["avg_local_clustering"] = average_local_clustering_coefficient(graph)
    if include_diameter:
        from networkit_spark.operators.bfs import diameter_lower_bound

        out["diameter_lower_bound"] = diameter_lower_bound(graph)
    return out
