"""Edge scores + sparsification pipeline (SURVEY §2.7; reference:
networkit/cpp/edgescores/*, networkit/cpp/sparsification/*).

An edge score is a column on the canonical edge table; a sparsifier is a
score + GlobalThresholdFilter (literally a predicate). Pipelines are
chained DataFrame transforms — Catalyst fuses the filters into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def global_threshold_filter(
    graph: GraphDF, scores: DataFrame, threshold: float, above: bool = True
) -> GraphDF:
    """GlobalThresholdFilter (sparsification/GlobalThresholdFilter.cpp):
    keep edges with score >= t (or <= t). `scores` = (src, dst, score) in
    canonical orientation."""
    cond = F.col("score") >= threshold if above else F.col("score") <= threshold
    canon = graph.E.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "weight",
    ) if not graph.directed else graph.E
    kept = canon.join(scores.filter(cond).select("src", "dst"), ["src", "dst"], "left_semi")
    return GraphDF(graph.V, kept, directed=graph.directed, weighted=graph.weighted)


def random_edge_score(graph: GraphDF, seed: int = 42) -> DataFrame:
    """RandomEdgeScore (sparsification/RandomEdgeScore.cpp): uniform [0,1]
    per edge — seeded hash, reproducible at any parallelism."""
    canon = graph.E.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    return canon.select(
        "src",
        "dst",
        (
            F.pmod(F.abs(F.xxhash64("src", "dst", F.lit(seed))), F.lit(1 << 40))
            / F.lit(float(1 << 40))
        ).alias("score"),
    )


def local_degree_score(graph: GraphDF) -> DataFrame:
    """LocalDegreeScore (sparsification/LocalDegreeScore.cpp): per edge
    (u,v), from u's perspective the rank of v among u's neighbors by degree
    (descending) normalized to (0,1]: score = 1 − log(rank)/log(deg(u));
    edge keeps the max over both perspectives."""
    nb = graph.E_sym.filter("src != dst").select("src", "dst")
    deg = nb.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    nbd = nb.join(deg.select(F.col("id").alias("dst"), F.col("d").alias("d_dst")), "dst")
    w = Window.partitionBy("src").orderBy(F.desc("d_dst"), F.asc("dst"))
    ranked = nbd.withColumn("rank", F.row_number().over(w)).join(
        deg.select(F.col("id").alias("src"), F.col("d").alias("d_src")), "src"
    )
    per_dir = ranked.select(
        "src",
        "dst",
        F.when(F.col("d_src") <= 1, F.lit(1.0))
        .otherwise(1.0 - F.log(F.col("rank").cast("double")) / F.log(F.col("d_src").cast("double")))
        .alias("s"),
    )
    canon = per_dir.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "s",
    )
    return canon.groupBy("src", "dst").agg(F.max("s").alias("score"))


def edge_score_as_weight(graph: GraphDF, scores: DataFrame) -> GraphDF:
    """EdgeScoreAsWeight (edgescores/EdgeScoreAsWeight.cpp): replace weights
    by scores."""
    canon = graph.E.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )
    e = canon.join(scores, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("score", F.lit(0.0)).alias("weight")
    )
    return GraphDF(graph.V, e, directed=graph.directed, weighted=True)


def edge_score_normalizer(
    scores: DataFrame, lower: float = 0.0, upper: float = 1.0, invert: bool = False
) -> DataFrame:
    """EdgeScoreNormalizer (edgescores/EdgeScoreNormalizer.cpp): min-max
    rescale to [lower, upper] — one global agg + arithmetic column."""
    mm = scores.agg(
        F.min("score").alias("lo"), F.max("score").alias("hi")
    ).collect()[0]
    lo, hi = float(mm["lo"] or 0.0), float(mm["hi"] or 0.0)
    span = (hi - lo) or 1.0
    base = (F.col("score") - F.lit(lo)) / F.lit(span)
    if invert:
        base = F.lit(1.0) - base
    return scores.select(
        "src", "dst", (F.lit(lower) + base * F.lit(upper - lower)).alias("score")
    )


def edge_score_blender(
    a: DataFrame, b: DataFrame, factor: float = 0.5
) -> DataFrame:
    """EdgeScoreBlender: factor·a + (1−factor)·b per edge."""
    return (
        a.select("src", "dst", F.col("score").alias("sa"))
        .join(b.select("src", "dst", F.col("score").alias("sb")), ["src", "dst"])
        .select(
            "src",
            "dst",
            (F.lit(factor) * F.col("sa") + F.lit(1 - factor) * F.col("sb")).alias(
                "score"
            ),
        )
    )


def prefix_jaccard_score(graph: GraphDF, k: int = 10) -> DataFrame:
    """PrefixJaccardScore (edgescores/PrefixJaccardScore.cpp analog):
    Jaccard over each endpoint's top-k-degree neighbor prefix."""
    nb = graph.E_sym.filter("src != dst").select("src", "dst")
    deg = nb.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    nbd = nb.join(
        deg.select(F.col("id").alias("dst"), F.col("d").alias("d_dst")), "dst"
    )
    w = Window.partitionBy("src").orderBy(F.desc("d_dst"), F.asc("dst"))
    prefix = nbd.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    ).select("src", "dst")
    # intersection of prefixes via two-hop join
    a = prefix.select(F.col("src").alias("u"), F.col("dst").alias("w2"))
    b = prefix.select(F.col("src").alias("v"), F.col("dst").alias("w2"))
    inter = (
        a.join(b, "w2")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("inter"))
    )
    sizes = prefix.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("sz"))
    canon = graph.E.select(
        F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v")
    ).distinct()
    return (
        canon.join(inter, ["u", "v"], "left")
        .join(sizes.select(F.col("id").alias("u"), F.col("sz").alias("su")), "u")
        .join(sizes.select(F.col("id").alias("v"), F.col("sz").alias("sv")), "v")
        .select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            (
                F.coalesce("inter", F.lit(0))
                / (F.col("su") + F.col("sv") - F.coalesce("inter", F.lit(0)))
            ).alias("score"),
        )
    )
