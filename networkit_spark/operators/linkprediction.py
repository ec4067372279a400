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


def neighborhood_distance_index(graph: GraphDF) -> DataFrame:
    """NeighborhoodDistanceIndex (linkprediction/
    NeighborhoodDistanceIndex.hpp:30-35): |N(u)∩N(v)| / √(deg(u)·deg(v)) —
    cosine similarity of the neighborhood indicator vectors. Same two-hop
    self-join base as the other indices."""
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
            (F.col("common") / F.sqrt(F.col("du") * F.col("dv"))).alias("score"),
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


def u_degree_index(graph: GraphDF, pairs: DataFrame | None = None) -> DataFrame:
    """UDegreeIndex.hpp:27 — score(u,v) = deg(u)."""
    if pairs is None:
        pairs = two_hop_pairs(graph).select("u", "v")
    deg = _neighbors(graph).groupBy(F.col("src").alias("u")).agg(
        F.count("*").alias("d")
    )
    return pairs.join(deg, "u", "left").select(
        "u", "v", F.coalesce("d", F.lit(0)).cast("double").alias("score")
    )


def v_degree_index(graph: GraphDF, pairs: DataFrame | None = None) -> DataFrame:
    """VDegreeIndex.hpp:27 — score(u,v) = deg(v)."""
    if pairs is None:
        pairs = two_hop_pairs(graph).select("u", "v")
    deg = _neighbors(graph).groupBy(F.col("src").alias("v")).agg(
        F.count("*").alias("d")
    )
    return pairs.join(deg, "v", "left").select(
        "u", "v", F.coalesce("d", F.lit(0)).cast("double").alias("score")
    )


def total_neighbors_index(graph: GraphDF) -> DataFrame:
    """TotalNeighborsIndex.hpp:29 — |N(u) ∪ N(v)| = deg(u)+deg(v)−common,
    over the two-hop candidate pairs."""
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
            (F.col("du") + F.col("dv") - F.col("common")).cast("double").alias("score"),
        )
    )


def neighbors_measure_index(graph: GraphDF) -> DataFrame:
    """NeighborsMeasureIndex.hpp:29-38 — #(a,b) ∈ N(u)×N(v) with a == b or
    (a,b) ∈ E. On self-loop-free graphs that is walks₂(u,v) + walks₃(u,v):
    the 2-walk count (common neighbors) plus the 3-walk count (edges between
    the neighborhoods) — two inverted-index joins, never n²."""
    nb = _neighbors(graph)
    pairs = two_hop_pairs(graph)  # (u, v, common) = walks₂ for u < v
    a = nb.select(F.col("dst").alias("u"), F.col("src").alias("a"))
    b = nb.select(F.col("src").alias("b"), F.col("dst").alias("v"))
    w3 = (
        a.join(nb.select(F.col("src").alias("a"), F.col("dst").alias("b")), "a")
        .join(b, "b")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("w3"))
    )
    return (
        pairs.join(w3, ["u", "v"], "left")
        .select(
            "u",
            "v",
            (F.col("common") + F.coalesce("w3", F.lit(0))).cast("double").alias("score"),
        )
    )


def adjusted_rand_link_index(
    graph: GraphDF, pairs: DataFrame | None = None
) -> DataFrame:
    """AdjustedRandIndex (linkprediction/AdjustedRandIndex.cpp:14-41) —
    per-pair score 2·(a·d − b·c) / (a·b + a·c + 2·a·d + b² + b·d + c² + c·d)
    with a = |N(u)∩N(v)| and d = n − |N(u)∪N(v)|. The reference computes the
    b/c "difference" terms with std::set_union (AdjustedRandIndex.cpp:28-31),
    so b = c = |N(u)∪N(v)| — reproduced faithfully here for score parity.
    Denominator 0 → score 0."""
    if pairs is None:
        pairs = two_hop_pairs(graph)
    else:
        # canonicalize (least, greatest) BEFORE joining two_hop_pairs —
        # its rows are canonical u<v, so a caller's (u>v) pair would
        # otherwise miss and silently coalesce to common=0 (a plausible-
        # but-wrong score). The score is symmetric in (u, v); output rows
        # carry the canonical orientation.
        pairs = pairs.select(
            F.least("u", "v").alias("u"), F.greatest("u", "v").alias("v")
        )
        pairs = pairs.join(two_hop_pairs(graph), ["u", "v"], "left").select(
            "u", "v", F.coalesce("common", F.lit(0)).alias("common")
        )
    n = graph.number_of_nodes()
    deg = _neighbors(graph).groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("d")
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    a = F.col("common").cast("double")
    uni = (F.col("du") + F.col("dv") - F.col("common")).cast("double")
    b = uni
    c = uni
    d = F.lit(float(n)) - uni
    denom = a * b + a * c + 2 * a * d + b * b + b * d + c * c + c * d
    return (
        pairs.join(du, "u", "left")
        .join(dv, "v", "left")
        .na.fill({"du": 0, "dv": 0})
        .select(
            "u",
            "v",
            F.when(denom == 0, 0.0)
            .otherwise(2 * (a * d - b * c) / denom)
            .alias("score"),
        )
    )


def neighbors_of(graph: GraphDF, nodes: DataFrame | None = None) -> DataFrame:
    """NeighborhoodUtility (linkprediction/NeighborhoodUtility.cpp) —
    per-node sorted neighbor lists (id, neighbors:array<long>); the shared
    base for getCommonNeighbors / getNeighborsUnion below."""
    nb = _neighbors(graph)
    if nodes is not None:
        nb = nb.join(nodes.select(F.col("id").alias("src")), "src")
    return nb.groupBy(F.col("src").alias("id")).agg(
        F.sort_array(F.collect_set("dst")).alias("neighbors")
    )


def neighborhood_utility(graph: GraphDF, pairs: DataFrame) -> DataFrame:
    """NeighborhoodUtility.cpp:12-31 (getNeighborsUnion / getCommonNeighbors)
    as one distributed pass: for each (u, v) pair, sorted arrays of the
    union and intersection of the two neighborhoods — array expressions over
    the per-node neighbor lists, no per-row Python."""
    lists = neighbors_of(graph)
    lu = lists.select(F.col("id").alias("u"), F.col("neighbors").alias("nu"))
    lv = lists.select(F.col("id").alias("v"), F.col("neighbors").alias("nv"))
    empty = F.array().cast("array<bigint>")
    return (
        pairs.select("u", "v")
        .join(lu, "u", "left")
        .join(lv, "v", "left")
        .select(
            "u",
            "v",
            F.sort_array(
                F.array_union(
                    F.coalesce("nu", empty), F.coalesce("nv", empty)
                )
            ).alias("neighbors_union"),
            F.sort_array(
                F.array_intersect(
                    F.coalesce("nu", empty), F.coalesce("nv", empty)
                )
            ).alias("common_neighbors"),
        )
    )


def same_community_index(
    graph: GraphDF, partition: DataFrame, pairs: DataFrame | None = None
) -> DataFrame:
    """SameCommunityIndex.cpp:28 — 1.0 if the pair shares a community else
    0.0 (partition = (id, label), e.g. PLP output)."""
    if pairs is None:
        pairs = two_hop_pairs(graph).select("u", "v")
    pu = partition.select(F.col("id").alias("u"), F.col("label").alias("lu"))
    pv = partition.select(F.col("id").alias("v"), F.col("label").alias("lv"))
    return (
        pairs.join(pu, "u", "left")
        .join(pv, "v", "left")
        .select(
            "u",
            "v",
            F.when(
                F.col("lu").isNotNull() & (F.col("lu") == F.col("lv")), 1.0
            ).otherwise(0.0).alias("score"),
        )
    )


def katz_link_index(
    graph: GraphDF,
    max_path_length: int = 3,
    damping: float = 0.005,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """KatzIndex.cpp:34-58 — score(u,v) = Σ_{l=1..L} β^l · walks_l(u, v)
    (the reference counts l-hop WALK multiplicities by repeated neighbor
    expansion — `hits` accumulates duplicates — exactly the adjacency-power
    recurrence computed here as a DataFrame DP:
        W₁ = A;  W_l = W_{l-1} ⋈ A  (grouped sum)
    Bounded L; symmetric on undirected graphs. Restricted at the end to the
    candidate pairs (default: non-equal two-hop pairs, u < v)."""
    adj = _neighbors(graph).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    adj = adj.repartition("a").sortWithinPartitions("a").persist()
    adj.count()
    walks = adj.select("a", "b", F.lit(1.0).alias("w"))  # W1
    score = walks.select("a", "b", (F.col("w") * F.lit(damping)).alias("s"))
    for l in range(2, max_path_length + 1):
        step = adj.select(F.col("a").alias("b"), F.col("b").alias("c"))
        walks = (
            walks.join(step, "b")
            .groupBy("a", F.col("c").alias("nb"))
            .agg(F.sum("w").alias("w"))
            .withColumnRenamed("nb", "b")
            .localCheckpoint(eager=True)
        )
        score = score.unionByName(
            walks.select("a", "b", (F.col("w") * F.lit(float(damping**l))).alias("s"))
        )
    total = (
        score.filter(F.col("a") < F.col("b"))
        .groupBy(F.col("a").alias("u"), F.col("b").alias("v"))
        .agg(F.sum("s").alias("score"))
    )
    if pairs is None:
        pairs = two_hop_pairs(graph).select("u", "v")
    out = pairs.join(total, ["u", "v"], "left").select(
        "u", "v", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    adj.unpersist()
    return out


def precision_recall_points(scores: DataFrame, truth_pairs: DataFrame) -> DataFrame:
    """PrecisionRecallMetric.cpp:12-34 — (recall, precision) per score
    threshold, keeping the LAST precision for duplicate recall values.

    Cumulative counts over the descending-score order come from the
    two-stage prefix_sums_multi (plans/ranking.py) — the scored-pair set is
    O(Σd²), far too large for a single-partition window."""
    from networkit_spark.plans.ranking import prefix_sums_multi

    labeled = (
        scores.join(
            truth_pairs.select("u", "v").withColumn("pos", F.lit(1)),
            ["u", "v"],
            "left",
        )
        .select("score", F.coalesce("pos", F.lit(0)).alias("pos"))
        .withColumn("_neg", -F.col("score"))
        .withColumn("_one", F.lit(1))
    )
    p = labeled.agg(F.sum("pos")).collect()[0][0] or 0
    cum = prefix_sums_multi(labeled, ["_neg"], ["pos", "_one"])
    pts = cum.select(
        F.col("cum__one").alias("i"),
        F.col("cum_pos").alias("tp"),
        (F.col("cum__one") - F.col("cum_pos")).alias("fp"),
    ).select(
        "i",
        (F.col("tp") / F.lit(max(p, 1))).alias("recall"),
        F.when(
            (F.col("tp") + F.col("fp")) > 0, F.col("tp") / (F.col("tp") + F.col("fp"))
        ).otherwise(1.0).alias("precision"),
    )
    last = pts.groupBy("recall").agg(
        F.max_by("precision", F.col("i")).alias("precision")
    )
    return last.orderBy("recall")


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
    score threshold — one threshold sweep as cumulative counts over the
    descending-score order, computed with the two-stage prefix_sums_multi
    (plans/ranking.py) instead of a single-partition window (the scored-
    pair set is O(Σd²))."""
    from networkit_spark.plans.ranking import prefix_sums_multi

    labeled = (
        scores.join(
            truth_pairs.select("u", "v").withColumn("pos", F.lit(1)),
            ["u", "v"],
            "left",
        )
        .select("score", F.coalesce("pos", F.lit(0)).alias("pos"))
        .withColumn("_neg", -F.col("score"))
        .withColumn("_np", 1 - F.col("pos"))
    )
    totals = labeled.agg(
        F.sum("pos").alias("p"), F.sum("_np").alias("n")
    ).collect()[0]
    p, n = totals["p"] or 0, totals["n"] or 0
    cum = prefix_sums_multi(labeled, ["_neg"], ["pos", "_np"])
    return cum.select(
        "score",
        (F.col("cum_pos") / F.lit(max(p, 1))).alias("tpr"),
        (F.col("cum__np") / F.lit(max(n, 1))).alias("fpr"),
    )


def random_link_sampler(graph: GraphDF, percent_kept: float, seed: int = 42) -> GraphDF:
    """RandomLinkSampler (linkprediction/RandomLinkSampler.cpp): training
    subgraph keeping `percent_kept` of the edges — seeded-hash order, so
    the sample is reproducible and nested (80% sample ⊇ 60% sample)."""
    m = graph.E.count()
    keep = int(round(m * percent_kept / 100.0)) if percent_kept > 1 else int(
        round(m * percent_kept)
    )
    kept = (
        graph.E.orderBy(F.xxhash64("src", "dst", F.lit(seed)), "src", "dst")
        .limit(keep)
    )
    return type(graph)(graph.V, kept, directed=graph.directed, weighted=graph.weighted)


def link_thresholder(
    scores: DataFrame, lower: float, upper: float | None = None
) -> DataFrame:
    """LinkThresholder (linkprediction/LinkThresholder.cpp): predicted links
    with lower ≤ score (≤ upper)."""
    out = scores.filter(F.col("score") >= lower)
    if upper is not None:
        out = out.filter(F.col("score") <= upper)
    return out.select("u", "v")


def algebraic_distance_index(
    graph: GraphDF,
    systems: int = 8,
    iterations: int = 30,
    omega: float = 0.5,
    norm: int = 2,
    seed: int = 42,
) -> DataFrame:
    """AlgebraicDistanceIndex (linkprediction/AlgebraicDistanceIndex.cpp:
    14-60): p-norm distance between the smoothed test-vector loads of the
    two endpoints, over the standard two-hop candidate pairs. Loads come
    from misc.algebraic_loads (one |E| join per smoothing iteration,
    shared with the edge attributizer); the reference's random init is its
    RNG — ours is the seeded hash (deterministic contract)."""
    from networkit_spark.operators.misc import algebraic_loads

    x = algebraic_loads(graph, systems, iterations, omega, seed)
    xs = x.select(
        F.col("id").alias("u"),
        *[F.col(f"x{d}").alias(f"a{d}") for d in range(systems)],
    )
    xd = x.select(
        F.col("id").alias("v"),
        *[F.col(f"x{d}").alias(f"b{d}") for d in range(systems)],
    )
    pairs = two_hop_pairs(graph).select("u", "v")
    powed = sum(
        F.pow(F.abs(F.col(f"a{d}") - F.col(f"b{d}")), float(norm))
        for d in range(systems)
    )
    return (
        pairs.join(xs, "u")
        .join(xd, "v")
        .select(
            "u", "v", F.pow(powed, 1.0 / float(norm)).alias("score")
        )
    )
