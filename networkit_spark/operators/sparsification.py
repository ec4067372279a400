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
    edge keeps the max over both perspectives. Ranks come from the
    scale-safe per-key two-stage machinery (plans/ranking.py), not a
    per-src window — a hub's deg(hub) neighbors never sort in one task."""
    from networkit_spark.plans.ranking import per_key_row_numbers

    nb = graph.E_sym.filter("src != dst").select("src", "dst")
    deg = nb.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    nbd = nb.join(deg.select(F.col("id").alias("dst"), F.col("d").alias("d_dst")), "dst")
    ranked = per_key_row_numbers(
        nbd, ["src"], [-F.col("d_dst"), F.col("dst")], out_col="rank"
    ).join(
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


def local_filter_score(
    graph: GraphDF, scores: DataFrame, logarithmic: bool = True
) -> DataFrame:
    """LocalFilterScore (sparsification/LocalFilterScore.hpp:42-100): per
    node, rank incident edges by the input attribute DESCENDING with
    competition ranking (equal attributes share the min rank — the
    reference's rank += numSame loop); each edge's minimum sparsification
    exponent from that endpoint is
        e = 1 − log(rank)/log(d)        (logarithmic)
        e = 1 − (rank−1)/(d−1)          (linear)
    (e = 1 when d ≤ 1); final score = max over both endpoints. Competition
    ranks come from the scale-safe per-key machinery (plans/ranking.py) —
    no per-node window, so a hub's incident edges never sort in one
    task."""
    from networkit_spark.plans.ranking import per_key_competition_ranks

    inc = scores.select(
        F.col("src").alias("i"), "src", "dst", F.col("score").alias("attr")
    ).unionByName(
        scores.select(F.col("dst").alias("i"), "src", "dst", F.col("score").alias("attr"))
    )
    nb = graph.E_sym.filter("src != dst").select("src", "dst").distinct()
    deg = nb.groupBy(F.col("src").alias("i")).agg(F.count("*").alias("d"))
    ranked = per_key_competition_ranks(
        inc, ["i"], ["attr"], descending=True, out_col="rank"
    ).join(deg, "i")
    if logarithmic:
        e = F.when(F.col("d") <= 1, F.lit(1.0)).otherwise(
            1.0 - F.log(F.col("rank").cast("double")) / F.log(F.col("d").cast("double"))
        )
    else:
        e = F.when(F.col("d") <= 1, F.lit(1.0)).otherwise(
            1.0 - (F.col("rank") - 1).cast("double") / (F.col("d") - 1).cast("double")
        )
    return (
        ranked.select("src", "dst", e.alias("e"))
        .groupBy("src", "dst")
        .agg(F.max("e").alias("score"))
    )


def random_node_edge_score(
    graph: GraphDF, rne_ratio: float = 0.8, seed: int = 42
) -> DataFrame:
    """RandomNodeEdgeScore (sparsification/RandomNodeEdgeScore.cpp:17-66):
    score = normalized removal position under a random process mixing
    uniform-edge picks (prob 1−rneRatio) with node-then-incident-edge picks
    (prob rneRatio) — the latter removes low-degree nodes' edges earlier.

    The reference draws from its global RNG (nondeterministic run to run);
    here the process is the seeded continuous-time analog: each edge gets an
    exponential removal clock with STATIC rate
        r(e) ∝ (1−ratio)/m + ratio·(1/deg(u) + 1/deg(v))/(2n)
    and t(e) = −ln(U_e)/r(e) with U_e a seeded-hash uniform; the score is
    the removal rank normalized to [0,1) via the two-stage global rank
    (plans/ranking.py — no single-partition window). The null-model
    property tests pin (uniform marginals, low-degree-early bias), not the
    reference's RNG stream."""
    from networkit_spark.plans.ranking import global_row_numbers

    canon = graph.E.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    nb = graph.E_sym.filter("src != dst").select("src", "dst").distinct()
    deg = nb.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    m = canon.count()
    n = graph.number_of_nodes()
    e = (
        canon.join(deg.select(F.col("id").alias("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dv")), "dst")
    )
    u01 = (
        F.pmod(F.abs(F.xxhash64("src", "dst", F.lit(seed))), F.lit(1 << 40))
        + F.lit(1.0)
    ) / F.lit(float(1 << 40))
    rate = (
        F.lit((1.0 - rne_ratio) / max(m, 1))
        + F.lit(rne_ratio / (2.0 * max(n, 1)))
        * (1.0 / F.col("du") + 1.0 / F.col("dv"))
    )
    timed = e.select("src", "dst", (-F.log(u01) / rate).alias("t"))
    ranked = global_row_numbers(timed, ["t", "src", "dst"], out_col="pos")
    return ranked.select(
        "src", "dst", (F.col("pos") / F.lit(float(max(m, 1)))).alias("score")
    )


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
    Jaccard over each endpoint's top-k-degree neighbor prefix. The top-k
    selection uses the scale-safe per-key rank (plans/ranking.py), not a
    per-src window."""
    from networkit_spark.plans.ranking import per_key_row_numbers

    nb = graph.E_sym.filter("src != dst").select("src", "dst")
    deg = nb.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    nbd = nb.join(
        deg.select(F.col("id").alias("dst"), F.col("d").alias("d_dst")), "dst"
    )
    prefix = per_key_row_numbers(
        nbd, ["src"], [-F.col("d_dst"), F.col("dst")], out_col="rk"
    ).filter(F.col("rk") <= k).select("src", "dst")
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


# ---------------------------------------------------------------- §2.7 fill-ins
def _canon_edges(graph: GraphDF) -> DataFrame:
    return graph.E.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()


def _edge_triangles(graph: GraphDF) -> DataFrame:
    """(src, dst, tri) per canonical edge — the `triangles` vector every
    Simmelian-family score consumes (TriangleEdgeScore analog)."""
    from networkit_spark.operators.triangles import triangle_edge_score

    return triangle_edge_score(graph).select(
        "src", "dst", F.col("score").alias("tri")
    )


def scan_structural_similarity_score(graph: GraphDF) -> DataFrame:
    """SCANStructuralSimilarityScore.cpp:10-13:
    score(u,v) = (tri(u,v)+1) / sqrt((deg(u)+1)·(deg(v)+1))."""
    tri = _edge_triangles(graph)
    deg = graph.E_sym.filter("src != dst").groupBy(
        F.col("src").alias("id")
    ).agg(F.count("*").alias("d"))
    return (
        tri.join(deg.select(F.col("id").alias("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dv")), "dst")
        .select(
            "src",
            "dst",
            (
                (F.col("tri") + 1)
                / F.sqrt((F.col("du") + 1.0) * (F.col("dv") + 1.0))
            ).alias("score"),
        )
    )


def chance_corrected_triangle_score(graph: GraphDF) -> DataFrame:
    """ChanceCorrectedTriangleScore.cpp:22-28:
    tri·(n−2)/((deg(u)−1)(deg(v)−1)); 1.0 for tri=0 with a degree-1
    endpoint; else 0."""
    n = graph.number_of_nodes()
    tri = _edge_triangles(graph)
    deg = graph.E_sym.filter("src != dst").groupBy(
        F.col("src").alias("id")
    ).agg(F.count("*").alias("d"))
    return (
        tri.join(deg.select(F.col("id").alias("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dv")), "dst")
        .select(
            "src",
            "dst",
            F.when(
                F.col("tri") > 0,
                F.col("tri") * F.lit(float(n - 2))
                / ((F.col("du") - 1) * (F.col("dv") - 1)),
            )
            .when((F.col("du") == 1) | (F.col("dv") == 1), F.lit(1.0))
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    )


def local_similarity_score(graph: GraphDF) -> DataFrame:
    """LocalSimilarityScore.cpp:18-66: per endpoint i, rank incident edges
    by similarity tri/(deg(i)+deg(j)−tri) descending; sparsification
    exponent e = 1 − log(rank)/log(deg(i)) (1.0 for deg 1); edge keeps the
    max over both endpoints. Deterministic (sim desc, neighbor asc)
    tie-break where the reference's std::sort order on ties is unspecified."""
    tri = _edge_triangles(graph)
    # per-direction view: (i, j, tri)
    both = tri.unionByName(
        tri.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "tri"
        )
    )
    deg = graph.E_sym.filter("src != dst").groupBy(
        F.col("src").alias("id")
    ).agg(F.count("*").alias("d"))
    nbd = (
        both.join(deg.select(F.col("id").alias("src"), F.col("d").alias("di")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("dj")), "dst")
        .withColumn(
            "sim", F.col("tri") / (F.col("di") + F.col("dj") - F.col("tri"))
        )
    )
    from networkit_spark.plans.ranking import per_key_row_numbers

    ranked = per_key_row_numbers(
        nbd, ["src"], [-F.col("sim"), F.col("dst")], out_col="rank"
    ).select(
        "src",
        "dst",
        F.when(F.col("di") <= 1, F.lit(1.0))
        .otherwise(
            1.0 - F.log(F.col("rank").cast("double")) / F.log(F.col("di").cast("double"))
        )
        .alias("e"),
    )
    canon = ranked.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "e",
    )
    return canon.groupBy("src", "dst").agg(F.max("e").alias("score"))


def multiscale_score(graph: GraphDF, attribute: DataFrame | None = None) -> DataFrame:
    """MultiscaleScore.cpp:36-90: per endpoint u, normalize the incident
    attribute values (default: edge weights) to p = a/Σ_u a; probability
    1 − (1−p)^(deg(u)−1); edge keeps the max over both endpoints."""
    if attribute is None:
        attribute = graph.E.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col("weight").alias("score"),
        )
    both = attribute.unionByName(
        attribute.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "score"
        )
    )
    # groupBy + join, not Window.partitionBy(src) aggregates: the window
    # materializes each node's full incident list in one task; the agg is
    # map-side combinable and the join back is skew-splittable
    sums = both.groupBy("src").agg(
        F.sum("score").alias("ssum"), F.count("*").alias("k")
    )
    per_dir = (
        both.join(sums, "src")
        .select(
            "src",
            "dst",
            # ssum = 0 (every incident attribute 0, e.g. a pendant edge's
            # triangle count) → normalized weight is 0/0; define p = 0 so
            # the edge can only be kept via its OTHER endpoint. Explicit
            # guard — ANSI mode turns the bare division into a runtime
            # error on exactly those rows.
            F.when(F.col("ssum") == 0, F.lit(0.0))
            .otherwise(
                1.0
                - F.pow(
                    1.0 - F.col("score") / F.col("ssum"),
                    F.col("k").cast("double") - 1.0,
                )
            )
            .alias("p"),
        )
    )
    canon = per_dir.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "p",
    )
    return canon.groupBy("src", "dst").agg(F.max("p").alias("score"))


def simmelian_overlap_score(graph: GraphDF, max_rank: int = 10) -> DataFrame:
    """SimmelianOverlapScore (SimmelianScore.cpp:16-73): rank each node's
    neighbors by per-edge triangle count (competition ranking, 0 = best,
    ties share); score(u,v) = #common neighbors w with rank_u(w) ≤ maxRank
    AND rank_v(w) ≤ maxRank."""
    tri = _edge_triangles(graph)
    both = tri.unionByName(
        tri.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "tri")
    )
    from networkit_spark.plans.ranking import per_key_competition_ranks

    ranked = (
        per_key_competition_ranks(
            both, ["src"], ["tri"], descending=True, out_col="rank"
        )
        .withColumn("rank", F.col("rank") - F.lit(1))
        .filter(F.col("rank") <= max_rank)
        .select(F.col("src").alias("ego"), F.col("dst").alias("w2"))
    )
    a = ranked.select(F.col("ego").alias("u"), "w2")
    b = ranked.select(F.col("ego").alias("v"), "w2")
    overlap = (
        a.join(b, "w2")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").alias("ov"))
    )
    canon = _canon_edges(graph)
    return canon.join(
        overlap.select(
            F.col("u").alias("src"), F.col("v").alias("dst"), "ov"
        ),
        ["src", "dst"],
        "left",
    ).select(
        "src", "dst", F.coalesce("ov", F.lit(0)).cast("double").alias("score")
    )


def forest_fire_score(
    graph: GraphDF,
    pf: float = 0.5,
    n_fires: int = 16,
    max_depth: int = 16,
    seed: int = 42,
) -> DataFrame:
    """ForestFireScore (sparsification/ForestFireScore.cpp:21-75) —
    deterministic-seeded distributed variant: `n_fires` independent fires
    start at seeded-hash roots; each frontier node burns each unvisited
    neighbor edge independently with probability pf (per-(fire,edge) hash —
    the Leskovec forest-fire sampling form of the same process; the
    reference's RNG-driven geometric spread is nondeterministic across runs
    even in C++). score(e) = #fires that burnt e."""
    e = graph.E_sym.filter("src != dst").select("src", "dst")
    e = e.repartition("src").sortWithinPartitions("src").persist()
    e.count()
    roots = graph.random_nodes(n_fires, seed).select("id")
    fires = roots.select(
        F.col("id"), F.row_number().over(Window.orderBy("id")).alias("fire")
    )
    frontier = fires.select("fire", "id").localCheckpoint(eager=True)
    visited = frontier
    burnt = None
    thresh = int(pf * (1 << 40))
    for _ in range(max_depth):
        if frontier.count() == 0:
            break
        cand = e.join(
            F.broadcast(frontier.withColumnRenamed("id", "src")), "src"
        ).select("fire", "src", "dst")
        cand = cand.join(
            visited.withColumnRenamed("id", "dst"), ["fire", "dst"], "left_anti"
        )
        burned = cand.filter(
            F.pmod(
                F.abs(F.xxhash64("fire", "src", "dst", F.lit(seed))),
                F.lit(1 << 40),
            )
            < F.lit(thresh)
        ).localCheckpoint(eager=True)
        edges_burned = burned.select(
            "fire",
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        ).distinct()
        burnt = (
            edges_burned
            if burnt is None
            else burnt.unionByName(edges_burned).distinct()
        )
        burnt = burnt.localCheckpoint(eager=True)
        nxt = burned.select("fire", F.col("dst").alias("id")).distinct()
        nxt = nxt.join(visited, ["fire", "id"], "left_anti").localCheckpoint(
            eager=True
        )
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
    e.unpersist()
    canon = _canon_edges(graph)
    if burnt is None:
        return canon.withColumn("score", F.lit(0.0))
    counts = burnt.groupBy("src", "dst").agg(
        F.count("*").cast("double").alias("score")
    )
    return canon.join(counts, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def geometric_mean_score(graph: GraphDF, attribute: DataFrame) -> DataFrame:
    """GeometricMeanScore (edgescores/GeometricMeanScore.cpp:18-41):
    score(e=(u,v)) = attr(e) / sqrt(nodeSum(u)·nodeSum(v)), where
    nodeSum(x) = Σ attr over x's incident edges; non-positive attributes
    score 0 (the reference only writes when attr > 0). `attribute` is
    (src, dst, score) on canonical edges."""
    attr = attribute.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        F.col("score").alias("attr"),
    )
    inc = attr.select(F.col("src").alias("id"), "attr").unionByName(
        attr.select(F.col("dst").alias("id"), "attr")
    )
    nsum = inc.groupBy("id").agg(F.sum("attr").alias("nsum"))
    return (
        attr.join(nsum.select(F.col("id").alias("src"), F.col("nsum").alias("s_u")), "src")
        .join(nsum.select(F.col("id").alias("dst"), F.col("nsum").alias("s_v")), "dst")
        .select(
            "src",
            "dst",
            F.when(
                F.col("attr") > 0,
                F.col("attr") / F.sqrt(F.col("s_u") * F.col("s_v")),
            )
            .otherwise(F.lit(0.0))
            .alias("score"),
        )
    )


# --------------------------------------------------------------- Sparsifiers
# sparsification/Sparsifiers.cpp:19-140 — the convenience compositions
# score → GlobalThresholdFilter, each returning a sparsified GraphDF. Every
# body reuses the distributed score operators above; nothing here adds a
# new shuffle beyond its underlying score.


def simmelian_sparsifier_non_parametric(
    graph: GraphDF, threshold: float, k: int = 10
) -> GraphDF:
    """SimmelianSparsifierNonParametric (Sparsifiers.cpp:33-47): prefix
    -Jaccard backbone score, keep edges with score ≥ threshold."""
    return global_threshold_filter(
        graph, prefix_jaccard_score(graph, k=k), threshold, above=True
    )


def simmelian_sparsifier_parametric(
    graph: GraphDF, max_rank: int = 10, min_overlap: int = 5
) -> GraphDF:
    """SimmelianSparsifierParametric (Sparsifiers.cpp:50-66): Simmelian
    overlap score at max_rank, keep edges with overlap ≥ min_overlap."""
    return global_threshold_filter(
        graph,
        simmelian_overlap_score(graph, max_rank=max_rank),
        float(min_overlap),
        above=True,
    )


def multiscale_sparsifier(graph: GraphDF, alpha: float) -> GraphDF:
    """MultiscaleSparsifier (Sparsifiers.cpp:68-85): multiscale backbone
    over the edge weights, keep edges with score ≥ alpha."""
    return global_threshold_filter(
        graph, multiscale_score(graph), alpha, above=True
    )


def local_similarity_sparsifier(graph: GraphDF, e: float) -> GraphDF:
    """LocalSimilaritySparsifier (Sparsifiers.cpp:87-103): local-similarity
    minExponent score, keep edges with score ≥ e."""
    return global_threshold_filter(
        graph, local_similarity_score(graph), e, above=True
    )


def simmelian_multiscale_sparsifier(graph: GraphDF, alpha: float) -> GraphDF:
    """SimmelianMultiscaleSparsifier (Sparsifiers.cpp:105-122): multiscale
    backbone over TRIANGLE counts instead of weights."""
    from networkit_spark.operators.triangles import triangle_edge_score

    tri = triangle_edge_score(graph).select(
        "src", "dst", F.col("score").cast("double").alias("score")
    )
    return global_threshold_filter(
        graph, multiscale_score(graph, attribute=tri), alpha, above=True
    )


def random_sparsifier(graph: GraphDF, ratio: float, seed: int = 42) -> GraphDF:
    """RandomSparsifier (Sparsifiers.cpp:124-138): uniform random edge
    score, keep edges with score ≥ ratio (expected (1−ratio) of edges)."""
    return global_threshold_filter(
        graph, random_edge_score(graph, seed=seed), ratio, above=True
    )
