"""Centrality kernels beyond PageRank (SURVEY §2.4).

All three share the superstep skeleton of pagerank.py: static cached edge
table, |V|-sized state vector shuffled per superstep, lineage truncated
every iteration.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def degree_centrality(
    graph: GraphDF, normalized: bool = False, ignore_self_loops: bool = True
) -> DataFrame:
    """DegreeCentrality (networkit/cpp/centrality/DegreeCentrality.cpp:15-35):
    out-degree per node; normalized divides by max possible degree (n-1)."""
    e = graph.E if graph.directed else graph.E_sym
    if ignore_self_loops:
        e = e.filter("src != dst")
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count("*").cast("double").alias("score")
    )
    out = graph.V.join(deg, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    if normalized:
        n = graph.number_of_nodes()
        out = out.select("id", (F.col("score") / F.lit(max(n - 1, 1))).alias("score"))
    return out


def eigenvector_centrality(
    graph: GraphDF, tol: float = 1e-9, max_iterations: int = 100
) -> DataFrame:
    """EigenvectorCentrality (networkit/cpp/centrality/EigenvectorCentrality.cpp:20-80):
    power iteration over the (weighted) adjacency; per step
      v'[u] = Σ_{(v,u)∈E} w(v,u)·v[v]   (in-edges; undirected: neighbors)
    then L2-normalize; stop when ||v' − v||∞-ish (reference uses sum of
    absolute diffs; we use L2 like its Python default) ≤ tol. Final scores
    L2-normalized, all non-negative."""
    e = graph.E if graph.directed else graph.E_sym
    edges = e.select("src", "dst", "weight")
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    edges.count()
    v = graph.V.select("id").persist()
    n = v.count()
    if n == 0:
        return graph.V.withColumn("score", F.lit(0.0))

    score = v.select("id", F.lit(1.0 / math.sqrt(n)).alias("score"))
    score = score.localCheckpoint(eager=True)
    for _ in range(max_iterations):
        contrib = edges.join(score, edges.src == score.id).select(
            "dst", (F.col("weight") * F.col("score")).alias("m")
        )
        mass = contrib.groupBy("dst").agg(F.sum("m").alias("m"))
        raw = v.join(mass, v.id == mass.dst, "left").select(
            "id", F.coalesce("m", F.lit(0.0)).alias("raw")
        ).persist()
        # ONE aggregation pass carries norm AND delta (VERDICT r1 #4):
        # ‖raw/‖raw‖ − old‖² = 1 − 2·⟨raw,old⟩/‖raw‖ + ‖old‖²
        agg = (
            raw.join(score.select("id", F.col("score").alias("o")), "id")
            .agg(
                F.sum(F.col("raw") * F.col("raw")).alias("r2"),
                F.sum(F.col("raw") * F.col("o")).alias("dot"),
                F.sum(F.col("o") * F.col("o")).alias("o2"),
            )
            .collect()[0]
        )
        nrm = math.sqrt(float(agg["r2"] or 0.0))
        if not nrm:
            raw.unpersist()
            break
        delta = math.sqrt(
            max(0.0, 1.0 - 2.0 * float(agg["dot"] or 0.0) / nrm + float(agg["o2"] or 0.0))
        )
        new_score = raw.select("id", (F.col("raw") / F.lit(nrm)).alias("score"))
        new_score = new_score.localCheckpoint(eager=True)
        raw.unpersist()
        score = new_score
        if delta <= tol:
            break
    edges.unpersist()
    v.unpersist()
    return score


def eigenvector_centrality_fixed(graph: GraphDF, iterations: int) -> DataFrame:
    """Fixed-superstep variant (SQL-oracle parity)."""
    return eigenvector_centrality(graph, tol=-1.0, max_iterations=iterations)


def katz_centrality(
    graph: GraphDF,
    alpha: float = 5e-4,
    beta: float = 0.1,
    tol: float = 1e-8,
    max_iterations: int = 100,
) -> DataFrame:
    """KatzCentrality (networkit/cpp/centrality/KatzCentrality.cpp:20-66):
    init 1.0 (:22 `values(z, 1.0)`), per step over IN-edges (directed;
    neighbors if undirected):
      v'[u] = Σ_{(v,u)∈E} w(v,u)·α·(old[v] + 1) + β       (:41-43)
    convergence on |‖v'‖₂ − ‖v‖₂| ≤ tol (:48-58), final divide by ‖v‖₂."""
    e = graph.E if graph.directed else graph.E_sym
    edges = e.select("src", "dst", "weight")
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    edges.count()
    v = graph.V.select("id").persist()
    n = v.count()
    if n == 0:
        return graph.V.withColumn("score", F.lit(0.0))

    score = v.select("id", F.lit(1.0).alias("score"))
    score = score.localCheckpoint(eager=True)
    old_nrm = 0.0
    nrm = 0.0
    for _ in range(max_iterations):
        contrib = edges.join(score, edges.src == score.id).select(
            "dst",
            (
                F.col("weight") * F.lit(alpha) * (F.col("score") + F.lit(1.0))
            ).alias("m"),
        )
        mass = contrib.groupBy("dst").agg(F.sum("m").alias("m"))
        new_raw = v.join(mass, v.id == mass.dst, "left").select(
            "id", (F.coalesce("m", F.lit(0.0)) + F.lit(beta)).alias("score")
        )
        new_raw = new_raw.localCheckpoint(eager=True)
        # reference convergence: |‖v'‖ − ‖v‖| ≤ tol — one scalar agg, no
        # second join-the-old-vector pass
        nrm = float(
            new_raw.agg(F.sqrt(F.sum(F.col("score") ** 2))).collect()[0][0] or 0.0
        )
        score = new_raw
        if abs(nrm - old_nrm) <= tol:
            break
        old_nrm = nrm
    edges.unpersist()
    v.unpersist()
    if not nrm:
        return score
    return score.select("id", (F.col("score") / F.lit(nrm)).alias("score"))


def katz_centrality_fixed(
    graph: GraphDF, alpha: float, beta: float, iterations: int
) -> DataFrame:
    return katz_centrality(
        graph, alpha=alpha, beta=beta, tol=-1.0, max_iterations=iterations
    )


def laplacian_centrality(graph: GraphDF, normalized: bool = False) -> DataFrame:
    """LaplacianCentrality (centrality/LaplacianCentrality.cpp:15-44):
    score(u) = wdeg(u)² + Σ_{v∈N(u)} w·(w + 2·wdeg(v)) — the Laplacian
    energy drop when u is removed; normalized divides by the total energy
    Σ_u wdeg(u)² + Σ_incidences w². Pure degree/weight aggregation: one
    weighted-degree table + one neighbor join."""
    wdeg = graph.weighted_degrees().select(
        "id", F.col("wdeg").alias("wd")
    )
    inc = graph.E if graph.directed else graph.E_sym  # per-incidence view
    nbr_term = (
        inc.join(wdeg.select(F.col("id").alias("dst"), F.col("wd").alias("wd_v")), "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(
            F.sum(
                F.col("weight") * (F.col("weight") + 2.0 * F.col("wd_v"))
            ).alias("nterm"),
            F.sum(F.col("weight") * F.col("weight")).alias("w2"),
        )
    )
    scored = wdeg.join(nbr_term, "id", "left").select(
        "id",
        (F.col("wd") * F.col("wd") + F.coalesce("nterm", F.lit(0.0))).alias("score"),
        F.coalesce("w2", F.lit(0.0)).alias("w2"),
        (F.col("wd") * F.col("wd")).alias("d2"),
    )
    if not normalized:
        return scored.select("id", "score")
    scored = scored.persist()
    total = scored.agg(F.sum(F.col("d2") + F.col("w2"))).collect()[0][0] or 1.0
    out = scored.select("id", (F.col("score") / F.lit(float(total))).alias("score"))
    return out


def ranking(scores: DataFrame, score_col: str = "score") -> DataFrame:
    """Centrality::ranking() (networkit/centrality.pyx:63-73): descending by
    score; deterministic id tie-break (reference uses unstable sort — we fix
    order for reproducibility)."""
    return scores.orderBy(F.desc(score_col), F.asc("id"))


def sfigality(graph: GraphDF) -> DataFrame:
    """Sfigality (networkit/cpp/centrality/Sfigality.cpp): fraction of
    neighbors with strictly higher degree."""
    deg = graph.degrees()
    e = graph.E_sym.filter("src != dst").select("src", "dst")
    d_src = deg.select(F.col("id").alias("src"), F.col("degree").alias("d_src"))
    d_dst = deg.select(F.col("id").alias("dst"), F.col("degree").alias("d_dst"))
    frac = (
        e.join(d_src, "src")
        .join(d_dst, "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(
            (
                F.sum(F.when(F.col("d_dst") > F.col("d_src"), 1).otherwise(0))
                / F.count("*")
            ).alias("score")
        )
    )
    return graph.V.join(frac, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def local_partition_coverage(graph: GraphDF, partition: DataFrame) -> DataFrame:
    """LocalPartitionCoverage (centrality/LocalPartitionCoverage.cpp):
    fraction of each node's neighbors in the same partition subset."""
    e = graph.E_sym.filter("src != dst").select("src", "dst")
    p_src = partition.select(F.col("id").alias("src"), F.col("label").alias("l_src"))
    p_dst = partition.select(F.col("id").alias("dst"), F.col("label").alias("l_dst"))
    frac = (
        e.join(p_src, "src")
        .join(p_dst, "dst")
        .groupBy(F.col("src").alias("id"))
        .agg(
            (
                F.sum(F.when(F.col("l_src") == F.col("l_dst"), 1).otherwise(0))
                / F.count("*")
            ).alias("score")
        )
    )
    return graph.V.join(frac, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def permanence_centrality(graph: GraphDF, partition: DataFrame) -> DataFrame:
    """PermanenceCentrality (centrality/PermanenceCentrality.cpp:142-160,
    Chakraborty et al. KDD'14): for node u with community C = P[u],

        perm(u) = I(u) / max(E_max(u), 1) / d(u) − (1 − c_in(u))

    where I(u) = #neighbors in C, E_max(u) = the largest per-foreign-community
    neighbor count, d(u) = degree, and c_in(u) = fraction of I(u)-neighbor
    pairs that are themselves adjacent (0 when I(u) < 2,
    PermanenceCentrality.cpp:137-140).

    Spark shape: one neighbor-label join (|E| rows), a per-(node, community)
    groupBy for the strength table, and the internal-wedge self-join closed
    by a semi join against the canonical edge set — the same oriented
    machinery as triangles.py, but restricted to same-community wedges so
    the intermediate is Σ I(u)² ≤ Σ d(u)² and community-local (no global
    wedge blowup on well-mixed partitions). Nodes with degree 0 score 0
    (the reference never visits them — getPermanence divides by degree;
    we define 0 to keep the output total)."""
    lab = partition.select("id", "label")
    nb = graph.E_sym.filter("src != dst").select("src", "dst")
    l_u = lab.select(F.col("id").alias("src"), F.col("label").alias("c_u"))
    l_v = lab.select(F.col("id").alias("dst"), F.col("label").alias("c_v"))
    nbl = nb.join(l_u, "src").join(l_v, "dst").persist()

    # strength table: neighbors per (u, foreign/own community)
    strength = nbl.groupBy("src", "c_u", "c_v").agg(F.count("*").alias("s"))
    per_u = strength.groupBy(F.col("src").alias("id")).agg(
        F.sum(F.when(F.col("c_v") == F.col("c_u"), F.col("s")).otherwise(0))
        .alias("internal"),
        F.max(F.when(F.col("c_v") != F.col("c_u"), F.col("s")).otherwise(0))
        .alias("emax"),
        F.sum("s").alias("deg"),
    )

    # internal clustering: wedges over same-community neighbors, closed by
    # an existing edge (canonical form) — each internal pair tested once
    inb = nbl.filter(F.col("c_v") == F.col("c_u")).select("src", "dst")
    a = inb.select(F.col("src").alias("u"), F.col("dst").alias("y"))
    b = inb.select(F.col("src").alias("u"), F.col("dst").alias("z"))
    pairs = a.join(b, "u").filter(F.col("y") < F.col("z"))
    canon = nb.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("y"), F.col("dst").alias("z")
    )
    tri = (
        pairs.join(canon, ["y", "z"], "left_semi")
        .groupBy(F.col("u").alias("id"))
        .agg(F.count("*").alias("tri"))
    )

    out = (
        per_u.join(tri, "id", "left")
        .select(
            "id",
            (
                F.col("internal")
                / F.greatest(F.col("emax"), F.lit(1))
                / F.col("deg")
                - (
                    F.lit(1.0)
                    - F.when(
                        F.col("internal") >= 2,
                        F.coalesce(F.col("tri"), F.lit(0))
                        / (F.col("internal") * (F.col("internal") - 1) / 2.0),
                    ).otherwise(F.lit(0.0))
                )
            ).alias("score"),
        )
    )
    # nbl stays persisted until evaluation (lazy result reads it twice);
    # LRU eviction reclaims it after the action
    return graph.V.join(out, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def kpath_centrality(
    graph: GraphDF,
    alpha: float = 0.2,
    k: int = 0,
    num_walks: int | None = None,
    seed: int = 42,
) -> DataFrame:
    """KPathCentrality (centrality/KPathCentrality.cpp:33-100,
    Alahakoon et al.): t self-avoiding random walks of random length
    ≤ k; score(v) = k·n·visits(v)/t. Reference defaults: k = ln(n+m),
    t = 2k²·n^(1−2α)·ln n (KPathCentrality.cpp:45).

    Distributed shape: ALL t walkers advance in the same superstep — a
    walker table (walk, cur, visited array, len) joined against the
    adjacency each step; the per-walker neighbor choice is the argmin of
    a seeded LCG key (weighted graphs: exponential race −ln(u)·w ⇒
    P ∝ 1/w, matching the reference's inverse-weight sampling,
    KPathCentrality.cpp:72-84). k supersteps total, lineage truncated per
    step. The LCG keys make runs reproducible AND re-derivable in plain
    SQL/python (CLAUDE.md rule 9); the reference uses its global RNG —
    per-run nondeterministic, so parity is distributional, not exact."""
    from networkit_spark.plans.ranking import global_row_numbers

    spark = graph.V.sparkSession
    n = graph.number_of_nodes()
    m = graph.number_of_edges()
    if k <= 0:
        k = max(1, int(math.log(n + m)))
    if num_walks is None:
        num_walks = max(1, int(2.0 * k * k * n ** (1 - 2 * alpha) * math.log(n)))
    t = num_walks

    e = graph.E if graph.directed else graph.E_sym
    nb = e.filter("src != dst").select(
        "src", "dst", (F.col("weight") if "weight" in e.columns else F.lit(1.0)).alias("w")
    ).distinct()
    nb = nb.repartition("src").sortWithinPartitions("src").persist()
    nb.count()

    ranked = global_row_numbers(graph.V.select("id"), ["id"], out_col="idx")
    lcg = lambda *cols: F.pmod(
        sum(c * F.lit(m_) for c, m_ in zip(cols, (1103515245, 12345, 2654435761)))
        + F.lit(seed),
        F.lit(2147483648),
    )
    starts = spark.range(t).select(
        F.col("id").alias("walk"),
        F.pmod(lcg(F.col("id"), F.lit(1), F.lit(0)), F.lit(n)).alias("idx"),
        (F.pmod(lcg(F.col("id"), F.lit(2), F.lit(0)), F.lit(k)) + 1).alias("len"),
    )
    walkers = (
        starts.join(ranked, "idx")
        .select(
            "walk",
            F.col("id").alias("cur"),
            F.array(F.col("id")).alias("visited"),
            "len",
        )
        .localCheckpoint(eager=True)
    )
    visits = spark.createDataFrame([], "id long")
    for j in range(1, k + 1):
        alive = walkers.filter(F.col("len") >= j)
        if alive.count() == 0:
            break
        cands = alive.join(
            nb.withColumnRenamed("src", "cur"), "cur"
        ).filter(~F.array_contains(F.col("visited"), F.col("dst")))
        u01 = (lcg(F.col("walk"), F.lit(j), F.col("dst")) + 0.5) / F.lit(2147483648.0)
        key = F.when(F.lit(graph.weighted), -F.log(u01) * F.col("w")).otherwise(u01)
        chosen = (
            cands.withColumn("key", key)
            .withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("walk").orderBy(F.asc("key"), F.asc("dst"))
                ),
            )
            .filter("rn = 1")
        )
        stepped = chosen.select(
            "walk",
            F.col("dst").alias("cur"),
            F.array_union("visited", F.array("dst")).alias("visited"),
            "len",
        ).localCheckpoint(eager=True)
        visits = visits.unionByName(
            stepped.select(F.col("cur").alias("id"))
        ).localCheckpoint(eager=True)
        # walkers that found no unexplored neighbor stop (drop out)
        walkers = stepped.unionByName(
            walkers.filter(F.col("len") < j)
        ).localCheckpoint(eager=True)
    counts = visits.groupBy("id").agg(F.count("*").alias("c"))
    out = graph.V.join(counts, "id", "left").select(
        "id",
        (F.lit(float(k) * n) * F.coalesce("c", F.lit(0)) / F.lit(float(t))).alias(
            "score"
        ),
    )
    nb.unpersist()
    return out
