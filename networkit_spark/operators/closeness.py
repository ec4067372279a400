"""Closeness-family centralities over the batched multi-source BFS
(SURVEY §2.4; reference: networkit/cpp/centrality/Closeness.cpp,
HarmonicCloseness.cpp, TopCloseness.cpp).

Closeness(u)  = (r−1) / Σ_{v reachable} d(u,v), scaled by (r−1)/(n−1) in
the reference's standard variant for disconnected graphs; harmonic(u) =
Σ 1/d(u,v). Exact computation is one batched BFS keyed by (source, node)
— all sources expand in the same supersteps; the approx variant samples
sources (ApproxCloseness analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF
from networkit_spark.operators.bfs import bfs_distances


def closeness_centrality(
    graph: GraphDF,
    sources: list[int] | None = None,
    normalized: bool = True,
) -> DataFrame:
    """(id, score) for the given sources (default: all nodes — exact).
    GENERALIZED variant (Closeness.hpp:78-93 updateScoreData, the
    disconnected-graph-safe one): score(u) = (r−1)/Σd/(n−1) with r−1 =
    #reached (excl. source); normalized multiplies by (r−1). Isolated
    nodes score 0. Hop-count distances (unweighted BFS)."""
    if sources is None:
        sources = [r["id"] for r in graph.V.collect()]
    n = graph.number_of_nodes()
    d = bfs_distances(graph, sources).filter("dist > 0")
    agg = d.groupBy("source").agg(
        F.sum("dist").alias("total"), F.count("*").alias("reached")
    )
    inv_n1 = F.lit(1.0 / float(max(n - 1, 1)))
    score = agg.select(
        F.col("source").alias("id"),
        (
            (F.col("reached") / F.col("total"))
            * inv_n1
            * (F.col("reached") if normalized else F.lit(1.0))
        ).alias("score"),
    )
    base = graph.V if len(sources) == n else graph.V.join(
        graph.V.sparkSession.createDataFrame([(int(s),) for s in sources], "id long"),
        "id",
        "left_semi",
    )
    return base.join(score, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def harmonic_closeness(
    graph: GraphDF, sources: list[int] | None = None, normalized: bool = True
) -> DataFrame:
    """HarmonicCloseness.cpp: score(u) = Σ_v 1/d(u,v), /(n−1) if normalized."""
    if sources is None:
        sources = [r["id"] for r in graph.V.collect()]
    n = graph.number_of_nodes()
    d = bfs_distances(graph, sources).filter("dist > 0")
    agg = d.groupBy("source").agg(F.sum(1.0 / F.col("dist")).alias("h"))
    denom = float(max(n - 1, 1)) if normalized else 1.0
    score = agg.select(
        F.col("source").alias("id"), (F.col("h") / F.lit(denom)).alias("score")
    )
    base = graph.V if len(sources) == n else graph.V.join(
        graph.V.sparkSession.createDataFrame([(int(s),) for s in sources], "id long"),
        "id",
        "left_semi",
    )
    return base.join(score, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def top_closeness(graph: GraphDF, k: int) -> DataFrame:
    """TopCloseness.cpp analog (exact evaluation + top-k; the reference's
    pruning heuristics are an optimization, not a semantic)."""
    return (
        closeness_centrality(graph)
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )


def approx_closeness(
    graph: GraphDF, n_samples: int = 64, seed: int = 42, normalized: bool = True
) -> DataFrame:
    """ApproxCloseness (centrality/ApproxCloseness.cpp): closeness estimated
    from distances to a seeded source sample — here the transposed estimate:
    score(u) ≈ (n−1) / (n/s · Σ_{s∈S} d(s,u))."""
    samples = [r["id"] for r in graph.random_nodes(n_samples, seed).collect()]
    n = graph.number_of_nodes()
    s = len(samples)
    if s == 0:
        return graph.V.withColumn("score", F.lit(0.0))
    d = bfs_distances(graph, samples).filter("dist > 0")
    est = d.groupBy("id").agg(F.sum("dist").alias("partial"))
    scale = n / float(s)
    denom = F.col("partial") * scale
    score = est.select(
        "id",
        (
            F.lit(float(n - 1)) / denom / (F.lit(float(n - 1)) if normalized else F.lit(1.0))
        ).alias("score"),
    )
    return graph.V.join(score, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )
