"""Selective community detection — seeded local communities (SURVEY §2.8;
reference: networkit/cpp/scd/ApproximatePageRank.cpp, PageRankNibble.cpp).

ApproximatePageRank's sequential push doesn't distribute per-operation, but
its SEMANTICS — personalized PageRank mass concentrated near the seed,
swept by conductance — map cleanly: a personalized-teleport power iteration
(same superstep skeleton as global PageRank, teleport mass pinned to the
seed set) followed by a conductance sweep over the score-ranked prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def personalized_pagerank(
    graph: GraphDF,
    seeds: list[int],
    damping: float = 0.85,
    tol: float = 1e-8,
    max_iterations: int = 100,
) -> DataFrame:
    """(id, score): teleport vector uniform over `seeds` instead of V —
    everything else identical to operators/pagerank.py semantics."""
    spark = graph.V.sparkSession
    v = graph.V.select("id").persist()
    n = v.count()
    if n == 0 or not seeds:
        return graph.V.withColumn("score", F.lit(0.0))
    e = graph.E if graph.directed else graph.E_sym
    wdeg = e.groupBy("src").agg(F.sum("weight").alias("wdeg"))
    edges = (
        e.join(wdeg, "src")
        .select("src", "dst", (F.col("weight") / F.col("wdeg")).alias("frac"))
        .repartition("src")
        .sortWithinPartitions("src")
        .persist()
    )
    edges.count()
    seed_df = spark.createDataFrame([(int(s),) for s in seeds], "id long")
    seed_mass = 1.0 / len(seeds)
    teleport = (
        v.join(F.broadcast(seed_df), "id", "left_semi")
        .select("id", F.lit((1.0 - damping) * seed_mass).alias("tp"))
    )
    rank = v.join(F.broadcast(seed_df), "id", "left_semi").select(
        "id", F.lit(seed_mass).alias("score")
    )
    rank = v.join(rank, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    ).localCheckpoint(eager=True)

    import math

    for _ in range(max_iterations):
        contrib = edges.join(rank, edges.src == rank.id).select(
            "dst", (F.col("frac") * F.col("score")).alias("m")
        )
        mass = contrib.groupBy("dst").agg(F.sum("m").alias("m"))
        new_rank = (
            v.join(mass, v.id == mass.dst, "left")
            .join(teleport.withColumnRenamed("id", "tid"), v.id == F.col("tid"), "left")
            .select(
                "id",
                (
                    F.coalesce("tp", F.lit(0.0))
                    + F.lit(damping) * F.coalesce("m", F.lit(0.0))
                ).alias("score"),
            )
        ).localCheckpoint(eager=True)
        delta = (
            new_rank.join(rank.select("id", F.col("score").alias("o")), "id")
            .agg(F.sqrt(F.sum((F.col("score") - F.col("o")) ** 2)))
            .collect()[0][0]
        )
        rank = new_rank
        if delta is not None and delta <= tol:
            break
    edges.unpersist()
    v.unpersist()
    total = rank.agg(F.sum("score")).collect()[0][0]
    return rank.select("id", (F.col("score") / F.lit(total)).alias("score"))


def conductance_sweep(
    graph: GraphDF, scores: DataFrame, max_size: int = 1000
) -> DataFrame:
    """PageRankNibble's sweep: order nodes by score/deg descending, take the
    prefix with minimum conductance. Returns the community (id) rows.

    The sweep is a window-cumulative computation: for the prefix of size k,
      vol(S)   = Σ deg(u)               (cumulative sum)
      cut(S)   = vol(S) − 2·internal(S) (internal via edge join on rank)
    conductance = cut / min(vol, 2m − vol). Evaluated for all prefixes in
    ONE pass — no per-k scans.
    """
    deg = graph.degrees()
    # top-`max_size` via orderBy().limit() — Spark's distributed
    # TakeOrdered — BEFORE any window: global-power-iteration PPR gives all
    # reachable nodes positive score, so ranking the full positive set in a
    # single-partition window would hold ~|V| rows in one task. The window
    # below runs on ≤ max_size rows (a bounded constant).
    top = (
        scores.join(deg, "id")
        .filter(F.col("score") > 0)
        .select(
            "id",
            "degree",
            (F.col("score") / F.greatest("degree", F.lit(1))).alias("key"),
        )
        .orderBy(F.desc("key"), F.asc("id"))
        .limit(max_size)
    )
    ranked = top.withColumn(
        "pos",
        F.row_number().over(Window.orderBy(F.desc("key"), F.asc("id"))),
    ).persist()
    e = graph.E_sym.filter("src != dst").select("src", "dst")
    pos_src = ranked.select(F.col("id").alias("src"), F.col("pos").alias("p_src"))
    pos_dst = ranked.select(F.col("id").alias("dst"), F.col("pos").alias("p_dst"))
    # edge (u,v) becomes internal once pos >= max(p_src, p_dst): count per
    # threshold via groupBy on that max
    internal_at = (
        e.join(pos_src, "src")
        .join(pos_dst, "dst")
        .select(F.greatest("p_src", "p_dst").alias("k"))
        .groupBy("k")
        .agg((F.count("*") / 2).alias("new_internal"))  # E_sym counts twice
    )
    m2 = graph.E_sym.filter("src != dst").count()  # = 2m
    w = Window.orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    sweep = (
        ranked.join(internal_at, ranked.pos == internal_at.k, "left")
        .select(
            "id",
            "pos",
            "degree",
            F.coalesce("new_internal", F.lit(0.0)).alias("ni"),
        )
        .withColumn("vol", F.sum("degree").over(w))
        .withColumn("internal", F.sum("ni").over(w))
        .withColumn("cut", F.col("vol") - 2 * F.col("internal"))
        .withColumn(
            "conductance",
            F.col("cut")
            / F.greatest(
                F.least(F.col("vol"), F.lit(m2) - F.col("vol")), F.lit(1.0)
            ),
        )
    ).persist()
    # standard sweep constraint: only prefixes with vol(S) <= vol(G)/2 —
    # otherwise the trivial full set (cut 0) always wins
    best = (
        sweep.filter(F.col("vol") <= m2 / 2.0)
        .orderBy(F.asc("conductance"), F.asc("pos"))
        .limit(1)
        .collect()
    )
    if not best:
        return graph.V.limit(0).select("id")
    k = best[0]["pos"]
    out = sweep.filter(F.col("pos") <= k).select("id")
    return out


def page_rank_nibble(
    graph: GraphDF, seed: int, damping: float = 0.85
) -> DataFrame:
    """PageRankNibble (scd/PageRankNibble.cpp): personalized PageRank from
    the seed + conductance sweep."""
    ppr = personalized_pagerank(graph, [seed], damping=damping)
    return conductance_sweep(graph, ppr)


def gce(
    graph: GraphDF,
    seeds: list[int],
    max_rounds: int = 100,
) -> DataFrame:
    """GCE — greedy community expansion, objective M (scd/GCE.cpp:185-193):
    repeatedly add the shell node maximizing
        ΔM = (intW + degInt(v)) / (extW − degInt(v) + degExt(v)) − M
    while ΔM > 0, where intW/extW are the community's internal/external
    edge weights. BATCHED over all seeds: one round = one shell join + one
    per-seed argmax window, every seed grows simultaneously (the reference
    loops seeds one by one). Deterministic tie-break (gain desc, id asc).
    Self-loop-free graphs (the reference throws on self-loops too).

    Returns (seed: long, id: long) community membership rows.
    """
    spark = graph.V.sparkSession
    e = graph.E_sym.filter("src != dst").select("src", "dst", "weight")
    e = e.repartition("src").sortWithinPartitions("src").persist()
    e.count()
    wdeg = e.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("wd"))

    members = spark.createDataFrame(
        [(int(s), int(s)) for s in seeds], "seed long, id long"
    ).localCheckpoint(eager=True)
    # per-seed scalar state: intW, extW (extW of {s} = wdeg(s))
    state = (
        members.join(wdeg, "id", "left")
        .select(
            "seed",
            F.lit(0.0).alias("intw"),
            F.coalesce("wd", F.lit(0.0)).alias("extw"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        m_src = members.select("seed", F.col("id").alias("src"))
        # candidate shell: (seed, cand) with degInt = weight into community
        deg_int = (
            e.join(m_src, "src")
            .select("seed", F.col("dst").alias("cand"), "weight")
            .join(
                members.select("seed", F.col("id").alias("cand")),
                ["seed", "cand"],
                "left_anti",
            )
            .groupBy("seed", "cand")
            .agg(F.sum("weight").alias("deg_int"))
        )
        scored = (
            deg_int.join(wdeg.select(F.col("id").alias("cand"), "wd"), "cand")
            .join(state, "seed")
            .select(
                "seed",
                "cand",
                "deg_int",
                (F.col("wd") - F.col("deg_int")).alias("deg_ext"),
                (
                    (F.col("intw") + F.col("deg_int"))
                    / (F.col("extw") - F.col("deg_int") + F.col("wd") - F.col("deg_int"))
                    - F.when(F.col("extw") > 0, F.col("intw") / F.col("extw"))
                      .otherwise(F.lit(0.0))
                ).alias("gain"),
            )
        )
        w = Window.partitionBy("seed").orderBy(F.desc("gain"), F.asc("cand"))
        best = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("gain") > 0))
            .localCheckpoint(eager=True)
        )
        if best.limit(1).count() == 0:
            break
        members = members.unionByName(
            best.select("seed", F.col("cand").alias("id"))
        ).localCheckpoint(eager=True)
        accepted = best.select("seed", "deg_int", "deg_ext")
        state = (
            state.join(accepted, "seed", "left")
            .select(
                "seed",
                (F.col("intw") + F.coalesce("deg_int", F.lit(0.0))).alias("intw"),
                (
                    F.col("extw")
                    - F.coalesce("deg_int", F.lit(0.0))
                    + F.coalesce("deg_ext", F.lit(0.0))
                ).alias("extw"),
            )
            .localCheckpoint(eager=True)
        )
    e.unpersist()
    return members


def approximate_pagerank_push(
    graph: GraphDF,
    seed: int,
    alpha: float = 0.15,
    epsilon: float = 1e-5,
    max_rounds: int = 1000,
) -> DataFrame:
    """ApproximatePageRank (scd/ApproximatePageRank.cpp:17-57, Andersen–
    Chung–Lang lazy push): returns (id, p, r) for every touched node with
    the reference's termination guarantee r(u) < ε·vol(u) everywhere.

    The reference pushes one queued node at a time; push operations
    COMMUTE up to the termination guarantee AND preserve the exact
    algebraic invariant  π(e_seed) = p + π(r)  (π = lazy-walk PPR) under
    ANY order — so the distributed shape pushes EVERY active node in the
    same superstep:
        p(u)   += α·r(u)                           (active u)
        r(v)   += Σ_{active u} (1−α)·r(u)·w/(2·vol(u))
        r(u)    = (1−α)·r(u)/2 + incoming          (active u)
    One |E|-join per superstep over the active set only; state is the
    touched ball, never |V| (localCheckpoint per round). The per-node p
    differs from the reference's by push order within the ε class —
    the invariant (tested against a numpy solve) and the residual bound
    are the contract."""
    spark = graph.V.sparkSession
    e = graph.E_sym  # undirected push; vol = weighted degree, loops twice
    wdeg = (
        graph.weighted_degrees(count_self_loops_twice=True)
        .select("id", F.col("wdeg").alias("vol"))
        .persist()
    )
    wdeg.count()
    edges = (
        e.join(wdeg.select(F.col("id").alias("src"), "vol"), "src")
        .select(
            "src", "dst",
            (F.col("weight") / (2.0 * F.col("vol"))).alias("frac"),
        )
        .repartition("src")
        .sortWithinPartitions("src")
        .persist()
    )
    edges.count()
    state = spark.createDataFrame(
        [(int(seed), 0.0, 1.0)], "id long, p double, r double"
    ).localCheckpoint(eager=True)
    for _ in range(max_rounds):
        st = state.join(wdeg, "id", "left").withColumn(
            "vol", F.coalesce("vol", F.lit(0.0))
        )
        active = st.filter(
            (F.col("vol") > 0) & (F.col("r") >= F.lit(epsilon) * F.col("vol"))
        )
        if active.limit(1).count() == 0:
            break
        mass = (
            edges.join(
                F.broadcast(
                    active.select(F.col("id").alias("src"), F.col("r").alias("ra"))
                ),
                "src",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.lit(1.0 - alpha) * F.col("ra") * F.col("frac")).alias("inc"))
        )
        pushed = st.select(
            "id",
            "p",
            "r",
            (
                (F.col("vol") > 0)
                & (F.col("r") >= F.lit(epsilon) * F.col("vol"))
            ).alias("act"),
        )
        merged = (
            pushed.join(mass, "id", "outer")
            .select(
                "id",
                (
                    F.coalesce("p", F.lit(0.0))
                    + F.when(F.coalesce("act", F.lit(False)), F.lit(alpha) * F.col("r"))
                    .otherwise(0.0)
                ).alias("p"),
                (
                    F.when(
                        F.coalesce("act", F.lit(False)),
                        F.lit((1.0 - alpha) / 2.0) * F.col("r"),
                    ).otherwise(F.coalesce("r", F.lit(0.0)))
                    + F.coalesce("inc", F.lit(0.0))
                ).alias("r"),
            )
        )
        # stats-safe: merged references state twice (pushed + mass), so the
        # multiplied sizeInBytes estimate would double per push round
        # through a bare checkpoint (CLAUDE.md rule 16)
        from networkit_spark.plans.checkpoint import stats_safe_checkpoint

        state = stats_safe_checkpoint(merged)
    edges.unpersist()
    wdeg.unpersist()
    return state
