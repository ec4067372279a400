"""Link-prediction indices (SURVEY §2.7; reference:
networkit/cpp/linkprediction/*, 22 files).

Every index is a per-pair aggregate over the two-hop self-join
E.a ⋈ E.b on a.dst = b.src — the inverted-index pattern that keeps the
candidate space linear in wedge count (never the n² pair space). Pairs
scored are either (a) given explicitly, or (b) all two-hop neighbor pairs
(the MissingLinksFinder candidate set: non-adjacent pairs at distance 2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def _neighbors(graph: GraphDF) -> DataFrame:
    return graph.E_sym.filter("src != dst").select("src", "dst").distinct()


def two_hop_pairs(graph: GraphDF) -> DataFrame:
    """(u, v, common): all pairs u < v with ≥1 common neighbor, with the
    common-neighbor count — the shared base of CommonNeighborsIndex
    (linkprediction/CommonNeighborsIndex.cpp) and friends."""
    nb = _neighbors(graph)
    a = nb.select(F.col("dst").alias("u"), F.col("src").alias("w"))
    b = nb.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    return (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("common"))
    )


def common_neighbors_index(graph: GraphDF) -> DataFrame:
    """(u, v, score): |N(u) ∩ N(v)|."""
    return two_hop_pairs(graph).select(
        "u", "v", F.col("common").cast("double").alias("score")
    )


def jaccard_index(graph: GraphDF) -> DataFrame:
    """JaccardIndex (linkprediction/JaccardIndex.cpp):
    |N(u)∩N(v)| / |N(u)∪N(v)|."""
    pairs = two_hop_pairs(graph)
    deg = _neighbors(graph).groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("d")
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    return (
        pairs.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            (
                F.col("common")
                / (F.col("du") + F.col("dv") - F.col("common"))
            ).alias("score"),
        )
    )


def adamic_adar_index(graph: GraphDF) -> DataFrame:
    """AdamicAdarIndex (linkprediction/AdamicAdarIndex.cpp):
    Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w))."""
    nb = _neighbors(graph)
    deg = nb.groupBy(F.col("src").alias("w")).agg(F.count("*").alias("dw"))
    a = nb.select(F.col("dst").alias("u"), F.col("src").alias("w"))
    b = nb.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    return (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .join(deg, "w")
        .groupBy("u", "v")
        .agg(F.sum(1.0 / F.log(F.col("dw"))).alias("score"))
    )


def resource_allocation_index(graph: GraphDF) -> DataFrame:
    """ResourceAllocationIndex: Σ_{w ∈ N(u)∩N(v)} 1/deg(w)."""
    nb = _neighbors(graph)
    deg = nb.groupBy(F.col("src").alias("w")).agg(F.count("*").alias("dw"))
    a = nb.select(F.col("dst").alias("u"), F.col("src").alias("w"))
    b = nb.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    return (
        a.join(b, "w")
        .filter(F.col("u") < F.col("v"))
        .join(deg, "w")
        .groupBy("u", "v")
        .agg(F.sum(1.0 / F.col("dw")).alias("score"))
    )


def preferential_attachment_index(
    graph: GraphDF, pairs: DataFrame | None = None
) -> DataFrame:
    """PreferentialAttachmentIndex: deg(u)·deg(v) over candidate pairs
    (default: two-hop pairs)."""
    if pairs is None:
        pairs = two_hop_pairs(graph).select("u", "v")
    deg = _neighbors(graph).groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("d")
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    return (
        pairs.join(du, "u")
        .join(dv, "v")
        .select("u", "v", (F.col("du") * F.col("dv")).cast("double").alias("score"))
    )


def missing_links(graph: GraphDF, scores: DataFrame) -> DataFrame:
    """MissingLinksFinder (linkprediction/MissingLinksFinder.cpp): restrict
    scored pairs to NON-adjacent ones (distance exactly 2)."""
    canon = graph.E.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    return scores.join(canon, ["u", "v"], "left_anti")


def top_predictions(scores: DataFrame, k: int) -> DataFrame:
    """PredictionsSorter (linkprediction/PredictionsSorter.cpp): descending
    score, deterministic (u, v) tie-break."""
    return scores.orderBy(F.desc("score"), F.asc("u"), F.asc("v")).limit(k)


def roc_points(scores: DataFrame, truth_pairs: DataFrame) -> DataFrame:
    """ROCMetric (linkprediction/ROCMetric.cpp analog): (fpr, tpr) at each
    score threshold via window-ranked cumulative counts — a threshold sweep
    as one window pass, no per-threshold scans."""
    from pyspark.sql import Window

    labeled = scores.join(
        truth_pairs.select("u", "v").withColumn("pos", F.lit(1)),
        ["u", "v"],
        "left",
    ).select("score", F.coalesce("pos", F.lit(0)).alias("pos"))
    totals = labeled.agg(
        F.sum("pos").alias("p"), F.sum(1 - F.col("pos")).alias("n")
    ).collect()[0]
    p, n = totals["p"] or 0, totals["n"] or 0
    w = Window.orderBy(F.desc("score")).rowsBetween(Window.unboundedPreceding, 0)
    return labeled.select(
        "score",
        (F.sum("pos").over(w) / F.lit(max(p, 1))).alias("tpr"),
        (F.sum(1 - F.col("pos")).over(w) / F.lit(max(n, 1))).alias("fpr"),
    )
