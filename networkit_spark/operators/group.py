"""Group centralities (SURVEY §2.4): GroupDegree, GroupCloseness, GedWalk.

All three are greedy submodular maximizers. The reference implementations
(networkit/cpp/centrality/GroupDegree.cpp, GroupCloseness.cpp, GedWalk.cpp)
use lazy priority queues / pruned BFS bounds — sequential-machine tricks.
The Spark re-expression keeps the greedy outer loop on the driver (k tiny
iterations, k ≪ n) and evaluates the marginal gain of EVERY candidate in
one distributed pass per iteration:

  * group_degree      — gain(u) = |N(u) ∖ reach(S)| (± the self/group terms
                        below); one |E|-sized join + groupBy per iteration.
  * group_closeness   — gains from a batched multi-source BFS distance
                        table: Σ_v min(d_S(v), d(u,v)) per candidate in one
                        join + groupBy (exact tier; `sources` caps the
                        candidate/target sets as the sampled scale path).
  * gedwalk           — the paper's forward/backward walk-count estimator
                        (Angriman et al., ALENEX 2020): per iteration two
                        bounded-L walk DPs over G[V∖S] score all candidates
                        at once; the returned group score is the exact
                        truncated GED via the avoid-subgraph DP.

Determinism contract: every argmax breaks ties by smallest node id (the
reference inherits whatever order its PQ pops — nondeterministic under
OpenMP; our contract is the documented one).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def _neighbors(graph: GraphDF) -> DataFrame:
    e = graph.E if graph.directed else graph.E_sym
    return e.filter("src != dst").select("src", "dst").distinct()


def group_degree(
    graph: GraphDF, k: int, count_group_nodes: bool = True
) -> tuple[list[int], int]:
    """GroupDegree (centrality/GroupDegree.cpp:44-68): greedy max-coverage
    of the one-hop neighborhood. Objective:

        count_group_nodes=True :  score(S) = |S ∪ N(S)|
        count_group_nodes=False:  score(S) = |N(S) ∖ S|

    (the reference's init gain degOut(u)+1 / the −1 group-neighbor
    correction in updateQueue are exactly these objectives' marginal
    gains). Returns (group, score). Raises on self-loops like the
    reference (GroupDegree.cpp:21-25)."""
    if k <= 0 or k > graph.number_of_nodes():
        raise ValueError("k must be between 1 and n")
    if graph.number_of_self_loops() > 0:
        raise ValueError(
            "group degree does not support graphs with self loops "
            "(GroupDegree.cpp:21-25)"
        )
    spark = graph.V.sparkSession
    nb = _neighbors(graph).persist()
    nb.count()
    group: list[int] = []
    covered = spark.createDataFrame([], "id long")  # reach(S) = S ∪ N(S)
    for _ in range(k):
        cand = graph.V
        if group:
            cand = cand.filter(~F.col("id").isin(group))
        cov = F.broadcast(covered)
        # neighbor gain: out-neighbors not yet reached
        ng = (
            nb.join(cov.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count("*").alias("ng"))
        )
        gains = cand.join(ng, "id", "left").select(
            "id", F.coalesce("ng", F.lit(0)).alias("ng")
        )
        if count_group_nodes:
            # +1 when the candidate itself is not yet reached
            gains = gains.join(
                cov.withColumn("inc", F.lit(1)), "id", "left"
            ).select(
                "id",
                (F.col("ng") + F.when(F.col("inc").isNull(), 1).otherwise(0))
                .alias("gain"),
            )
        else:
            # −1 when the candidate is currently counted inside N(S)∖S
            in_ns = covered
            if group:
                in_ns = in_ns.filter(~F.col("id").isin(group))
            gains = gains.join(
                F.broadcast(in_ns).withColumn("dec", F.lit(1)), "id", "left"
            ).select(
                "id",
                (F.col("ng") - F.when(F.col("dec").isNotNull(), 1).otherwise(0))
                .alias("gain"),
            )
        best = gains.orderBy(F.desc("gain"), F.asc("id")).limit(1).collect()[0]
        u = int(best["id"])
        group.append(u)
        add = nb.filter(F.col("src") == u).select(F.col("dst").alias("id"))
        add = add.unionByName(spark.createDataFrame([(u,)], "id long"))
        covered = (
            covered.unionByName(add).distinct().localCheckpoint(eager=True)
        )
    if count_group_nodes:
        score = covered.count()
    else:
        score = covered.filter(~F.col("id").isin(group)).count()
    nb.unpersist()
    return group, int(score)


def group_closeness(
    graph: GraphDF,
    k: int,
    sources: DataFrame | None = None,
    max_depth: int = 10_000,
) -> tuple[list[int], float]:
    """GroupCloseness (centrality/GroupCloseness.cpp:204-236): greedy
    farness minimization. farness(S) = Σ_v d(v, S) over nodes reachable
    from S, with unreachable nodes charged distance n (the generalized
    convention closeness.py already uses); group closeness = (n−|S|) /
    farness. Gains for all candidates come from ONE batched multi-source
    BFS distance table (bfs_distances — candidates expand in shared
    supersteps), then each greedy round is a single join + groupBy:
    farness(S ∪ {u}) = Σ_v min(d_S(v), d(u, v)).

    `sources` (DataFrame of `id`) restricts the candidate set — the
    sampled scale path; default all nodes (exact tier, O(n²/p) distance
    state like exact closeness, declared fixture-tier)."""
    from networkit_spark.operators.bfs import bfs_distances

    if k <= 0 or k > graph.number_of_nodes():
        raise ValueError("k must be between 1 and n")
    n = graph.number_of_nodes()
    cand_df = sources if sources is not None else graph.V
    # transpose: d(v, u) for group-to-all means walking OUT of candidates;
    # on undirected graphs E_sym makes this symmetric, directed uses E as-is
    dist = bfs_distances(graph, cand_df.select("id"), max_depth=max_depth)
    # densify: unreached (source, v) pairs cost n
    d = (
        dist.select(F.col("source").alias("u"), F.col("id").alias("v"), "dist")
        .join(
            cand_df.select(F.col("id").alias("u")).crossJoin(
                graph.V.select(F.col("id").alias("v"))
            ),
            ["u", "v"],
            "right",
        )
        .select("u", "v", F.coalesce("dist", F.lit(n)).cast("long").alias("d"))
        .repartition("v")
        .persist()
    )
    d.count()
    group: list[int] = []
    cur = graph.V.select(
        F.col("id").alias("v"), F.lit(n).cast("long").alias("dcur")
    ).localCheckpoint(eager=True)
    for _ in range(k):
        rem = d
        if group:
            rem = rem.filter(~F.col("u").isin(group))
        far = (
            rem.join(cur, "v")
            .groupBy("u")
            .agg(F.sum(F.least("d", "dcur")).alias("farness"))
        )
        best = far.orderBy(F.asc("farness"), F.asc("u")).limit(1).collect()[0]
        u = int(best["u"])
        group.append(u)
        cur = (
            cur.join(
                d.filter(F.col("u") == u).select("v", F.col("d").alias("dn")),
                "v",
            )
            .select("v", F.least("dcur", "dn").alias("dcur"))
            .localCheckpoint(eager=True)
        )
    farness = cur.filter(~F.col("v").isin(group)).agg(F.sum("dcur")).collect()[0][0]
    d.unpersist()
    score = float(n - len(group)) / float(farness) if farness else 0.0
    return group, score


def _walk_counts(
    nb: DataFrame, start: DataFrame, levels: int, reverse: bool = False
) -> list[DataFrame]:
    """x_0 = start (id, c); x_{i+1}(v) = Σ_{(v,w)∈E} x_i(w) (or transposed).
    Returns [x_0 … x_levels], each localCheckpoint'ed (lineage rule #1)."""
    # explicit aliases force FRESH attribute ids on x_0 — localCheckpoint
    # keeps exprIds, and x_0 later joins against other derivations of the
    # same `start` DF (CLAUDE.md rule 7)
    out = [
        start.select(
            F.col("id").alias("id"), F.col("c").alias("c")
        ).localCheckpoint(eager=True)
    ]
    a, b = ("dst", "src") if not reverse else ("src", "dst")
    for _ in range(levels):
        nxt = (
            nb.join(
                out[-1].withColumnRenamed("id", a), a
            )
            .groupBy(F.col(b).alias("id"))
            .agg(F.sum("c").alias("c"))
        )
        out.append(nxt.localCheckpoint(eager=True))
    return out


def gedwalk_score(
    graph: GraphDF, group: list[int], alpha: float = 0.5, levels: int = 5
) -> float:
    """Exact truncated GED-walk score of a GIVEN group
    (GedWalk.cpp:87-145 / Angriman et al. ALENEX'20 Eq. 1):

        GED(S) = Σ_{ℓ=1..L} α^ℓ · φ_ℓ(S),
        φ_ℓ(S) = #(ℓ-edge walks in G touching S)
               = #(ℓ-walks in G) − #(ℓ-walks in G[V∖S])

    both terms via the 1ᵀAˡ1 DP (one join+groupBy per level)."""
    spark = graph.V.sparkSession
    nb = _neighbors(graph)
    ones = graph.V.select("id", F.lit(1.0).alias("c"))
    full = _walk_counts(nb, ones, levels)
    sset = spark.createDataFrame([(int(s),) for s in group], "id long")
    v_avoid = graph.V.join(F.broadcast(sset), "id", "left_anti")
    nb_avoid = (
        nb.join(F.broadcast(sset).withColumnRenamed("id", "src"), "src", "left_anti")
        .join(F.broadcast(sset).withColumnRenamed("id", "dst"), "dst", "left_anti")
    )
    avoid = _walk_counts(nb_avoid, v_avoid.select("id", F.lit(1.0).alias("c")), levels)
    score = 0.0
    for lvl in range(1, levels + 1):
        tot = full[lvl].agg(F.sum("c")).collect()[0][0] or 0.0
        av = avoid[lvl].agg(F.sum("c")).collect()[0][0] or 0.0
        score += (alpha**lvl) * (tot - av)
    return float(score)


def gedwalk(
    graph: GraphDF, k: int, alpha: float = 0.5, levels: int = 5
) -> tuple[list[int], float]:
    """GedWalk group maximization (GedWalk.cpp greedy): per round, score
    every candidate u ∉ S by the paper's walk-through-u estimator on the
    S-avoiding graph —

        gain*(u) = Σ_{ℓ=1..L} α^ℓ · Σ_{i+j=ℓ−1} f_i(u)·b_j(u)

    (f = walks arriving at u, b = walks leaving u, both in G[V∖S]; counts
    walks by visit multiplicity — the paper's greedy surrogate), pick the
    max (min-id tie-break), recompute. Returns (group, exact truncated
    GED(S) via gedwalk_score). 2L DP passes per round, each one
    join+groupBy."""
    if k <= 0 or k > graph.number_of_nodes():
        raise ValueError("k must be between 1 and n")
    spark = graph.V.sparkSession
    nb_all = _neighbors(graph).persist()
    nb_all.count()
    group: list[int] = []
    for _ in range(k):
        if group:
            sset = spark.createDataFrame([(int(s),) for s in group], "id long")
            v_av = graph.V.join(F.broadcast(sset), "id", "left_anti")
            nb = nb_all.join(
                F.broadcast(sset).withColumnRenamed("id", "src"), "src", "left_anti"
            ).join(
                F.broadcast(sset).withColumnRenamed("id", "dst"), "dst", "left_anti"
            )
        else:
            v_av, nb = graph.V, nb_all
        ones = v_av.select("id", F.lit(1.0).alias("c"))
        fwd = _walk_counts(nb, ones, levels - 1, reverse=False)  # walks leaving
        if graph.directed:
            bwd = _walk_counts(nb, ones, levels - 1, reverse=True)  # arriving
        else:
            bwd = fwd
        # gain*(u) = Σ_ℓ α^ℓ Σ_{i+j=ℓ−1} b_i(u)·f_j(u)
        gain = ones.select("id", F.lit(0.0).alias("g"))
        for lvl in range(1, levels + 1):
            coef = alpha**lvl
            for i in range(lvl):
                j = lvl - 1 - i
                if bwd[i] is fwd[j]:
                    # same table on both sides (undirected i==j): square in
                    # place — a self-join would hit "conflicting references"
                    # (CLAUDE.md rule 7)
                    term = bwd[i].select(
                        "id", (F.lit(coef) * F.col("c") * F.col("c")).alias("t")
                    )
                else:
                    term = (
                        bwd[i]
                        .select("id", F.col("c").alias("bi"))
                        .join(fwd[j].select("id", F.col("c").alias("fj")), "id")
                        .select(
                            "id", (F.lit(coef) * F.col("bi") * F.col("fj")).alias("t")
                        )
                    )
                gain = (
                    gain.join(term, "id", "left")
                    .select("id", (F.col("g") + F.coalesce("t", F.lit(0.0))).alias("g"))
                )
            gain = gain.localCheckpoint(eager=True)
        best = gain.orderBy(F.desc("g"), F.asc("id")).limit(1).collect()[0]
        group.append(int(best["id"]))
    score = gedwalk_score(graph, group, alpha=alpha, levels=levels)
    nb_all.unpersist()
    return group, score
