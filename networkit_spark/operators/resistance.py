"""Effective-resistance kernels: CommuteTimeDistance + SpanningEdgeCentrality
(SURVEY §2.4/§2.6; reference networkit/cpp/distance/CommuteTimeDistance.cpp,
centrality/SpanningEdgeCentrality.cpp).

The reference solves Laplacian systems with its LAMG multigrid (declared
out of scope per SURVEY — it is a sequential-memory numerical stack). The
Spark-native stand-in is a BATCHED conjugate gradient over DataFrames:

  * state is ONE table (sys, id, x, r, p) — k systems solved in the SAME
    supersteps; per iteration one |E|-join mat-vec (L·p = d·p − Σ w·p(nbr)),
    one groupBy("sys") scalar pass (α, β, residuals — k driver rows), one
    lineage-truncating checkpoint. Wall-clock is O(iters) supersteps no
    matter how many right-hand sides ride along — exactly how the JL
    sketch wants to be fed.
  * CG on the singular L is well-defined for b ⊥ 1 with x₀ = 0 (all
    iterates stay in range(L)); right-hand sides are mean-centered on
    entry.

Semantics matched:
  * CommuteTimeDistance.distance(u,v) = sqrt(R(u,v) · vol(G)),
    vol = Σ degrees (CommuteTimeDistance.cpp:153-167); exact mode solves
    L x = e_u − e_v.
  * SpanningEdgeCentrality score(e=(u,v)) = R(u,v); `exact` batches one
    system per edge, `approximate` is the Spielman–Srivastava JL sketch
    (SpanningEdgeCentrality.cpp:70-111): k = ⌈log₂ n⌉/ε² seeded ±1/√k
    edge projections, R(u,v) ≈ ‖Z(u) − Z(v)‖² — k solves, one batched CG.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def _nb_and_deg(graph: GraphDF) -> tuple[DataFrame, DataFrame]:
    """Symmetric weighted adjacency (self-loops dropped — they cancel in L)
    and weighted degrees."""
    nb = (
        graph.E_sym.filter("src != dst")
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("w"))
    )
    deg = nb.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("d"))
    return nb, deg


def laplacian_cg(
    graph: GraphDF,
    b: DataFrame,
    tol: float = 1e-9,
    max_iterations: int = 300,
) -> DataFrame:
    """Solve L x = b for every system in `b` (sys, id, b) at once; returns
    (sys, id, x). Each b is mean-centered (L is singular; solutions are the
    mean-zero representatives). Missing (sys, id) pairs are treated as 0."""
    spark = graph.V.sparkSession
    nb, deg = _nb_and_deg(graph)
    nb = nb.repartition("src").sortWithinPartitions("src").persist()
    nb.count()
    n = graph.number_of_nodes()

    # dense state per (sys, id): x=0, r = p = centered b
    sys_df = b.select("sys").distinct()
    full = sys_df.crossJoin(graph.V.select("id"))
    b0 = (
        full.join(b, ["sys", "id"], "left")
        .select("sys", "id", F.coalesce("b", F.lit(0.0)).alias("b"))
    )
    mean = b0.groupBy("sys").agg((F.sum("b") / n).alias("mu"))
    state = (
        b0.join(F.broadcast(mean), "sys")
        .select(
            "sys",
            "id",
            F.lit(0.0).alias("x"),
            (F.col("b") - F.col("mu")).alias("r"),
            (F.col("b") - F.col("mu")).alias("p"),
        )
        .join(deg, "id", "left")
        .withColumn("d", F.coalesce("d", F.lit(0.0)))
        .localCheckpoint(eager=True)
    )
    rs = {
        row["sys"]: row["rs"]
        for row in state.groupBy("sys").agg(F.sum(F.col("r") * F.col("r")).alias("rs")).collect()
    }
    b_norm = dict(rs)  # ‖b‖² after centering

    for _ in range(max_iterations):
        if not any(
            rs[s] > tol * tol * max(b_norm[s], 1e-300) for s in rs
        ):
            break
        # mat-vec: (L p)(id) = d·p − Σ_{(id,v)∈E} w·p(v)
        msg = (
            nb.join(
                state.select(
                    "sys", F.col("id").alias("dst"), F.col("p").alias("p_nbr")
                ),
                "dst",
            )
            .groupBy("sys", F.col("src").alias("id"))
            .agg(F.sum(F.col("w") * F.col("p_nbr")).alias("nbr"))
        )
        st = (
            state.join(msg, ["sys", "id"], "left")
            .withColumn(
                "lp",
                F.col("d") * F.col("p") - F.coalesce("nbr", F.lit(0.0)),
            )
        )
        pap = {
            row["sys"]: row["pap"]
            for row in st.groupBy("sys")
            .agg(F.sum(F.col("p") * F.col("lp")).alias("pap"))
            .collect()
        }
        alpha = {
            s: (rs[s] / pap[s]) if pap.get(s) else 0.0 for s in rs
        }
        amap = F.create_map(
            *[x for s, a in alpha.items() for x in (F.lit(s), F.lit(float(a)))]
        )
        st = st.withColumn("alpha", amap[F.col("sys")]).select(
            "sys",
            "id",
            "d",
            (F.col("x") + F.col("alpha") * F.col("p")).alias("x"),
            (F.col("r") - F.col("alpha") * F.col("lp")).alias("r"),
            "p",
        )
        st = st.localCheckpoint(eager=True)
        rs_new = {
            row["sys"]: row["rs"]
            for row in st.groupBy("sys")
            .agg(F.sum(F.col("r") * F.col("r")).alias("rs"))
            .collect()
        }
        beta = {s: (rs_new[s] / rs[s]) if rs[s] else 0.0 for s in rs}
        bmap = F.create_map(
            *[x for s, v in beta.items() for x in (F.lit(s), F.lit(float(v)))]
        )
        state = (
            st.withColumn("beta", bmap[F.col("sys")])
            .select(
                "sys",
                "id",
                F.col("x"),
                F.col("r"),
                (F.col("r") + F.col("beta") * F.col("p")).alias("p"),
                "d",
            )
            .localCheckpoint(eager=True)
        )
        rs = rs_new
    nb.unpersist()
    return state.select("sys", "id", "x")


def commute_time_distance(
    graph: GraphDF, u: int, v: int, tol: float = 1e-9
) -> float:
    """Exact ECTD(u,v) = sqrt(R(u,v) · vol) — one Laplacian solve
    (CommuteTimeDistance.cpp:56-75,153-167)."""
    spark = graph.V.sparkSession
    b = spark.createDataFrame(
        [(0, int(u), 1.0), (0, int(v), -1.0)], "sys long, id long, b double"
    )
    x = laplacian_cg(graph, b, tol=tol)
    vals = {
        r["id"]: r["x"]
        for r in x.filter(F.col("id").isin([int(u), int(v)])).collect()
    }
    resistance = vals[int(u)] - vals[int(v)]
    vol = float(
        graph.weighted_degrees().agg(F.sum("wdeg")).collect()[0][0] or 0.0
    )
    return math.sqrt(max(resistance, 0.0) * vol)


def spanning_edge_centrality(
    graph: GraphDF, tol: float = 1e-9
) -> DataFrame:
    """Exact SEC: R(u,v) per canonical edge — one CG system PER EDGE, all
    batched in one solve (the k-systems-one-superstep-loop design; exact
    tier, use spanning_edge_centrality_approx at scale)."""
    canon = (
        graph.E_sym.filter("src != dst")
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    from networkit_spark.plans.ranking import global_row_numbers

    keyed = global_row_numbers(canon, ["src", "dst"], out_col="sys").persist()
    b = keyed.select("sys", F.col("src").alias("id"), F.lit(1.0).alias("b")).unionByName(
        keyed.select("sys", F.col("dst").alias("id"), F.lit(-1.0).alias("b"))
    )
    x = laplacian_cg(graph, b, tol=tol)
    xs = x.select("sys", F.col("id").alias("src"), F.col("x").alias("xu"))
    xd = x.select("sys", F.col("id").alias("dst"), F.col("x").alias("xv"))
    out = (
        keyed.join(xs, ["sys", "src"])
        .join(xd, ["sys", "dst"])
        .select("src", "dst", (F.col("xu") - F.col("xv")).alias("score"))
    )
    return out


def effective_resistance_approx(
    graph: GraphDF, eps: float = 0.3, seed: int = 42, tol: float = 1e-8
) -> DataFrame:
    """(src, dst, score): R(u,v) per canonical edge via the
    Spielman–Srivastava JL sketch (SpanningEdgeCentrality.cpp:70-111):
    k = ⌈log₂ n⌉/ε² systems L z_i = Bᵀ W^{1/2} q_i with seeded ±1/√k
    q_i over edges; R ≈ Σ_i (z_i(u) − z_i(v))². One batched CG.

    This is also the declared approximation tier for ApproxSpanningEdge
    (centrality/ApproxSpanningEdge.cpp): the reference estimates the same
    per-edge effective resistance by sampling random spanning trees via
    loop-erased walks — an inherently sequential chain per sample; the JL
    sketch reaches the same ε-approximation of R(u,v) with batched linear
    solves, which is the formulation that distributes."""
    n = graph.number_of_nodes()
    k = max(1, int(math.ceil(math.log2(max(n, 2))) / (eps * eps)))
    canon = (
        graph.E_sym.filter("src != dst")
        .groupBy(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .agg(F.sum("weight").alias("w"))
        .withColumn("w", F.col("w") / 2)  # E_sym doubles each edge
    )
    scale = 1.0 / math.sqrt(k)
    sysr = canon.crossJoin(
        graph.V.sparkSession.range(k).select(F.col("id").alias("sys"))
    )
    # seeded ±1 per (edge, sys) — xxhash64 bit, NOT the LCG (the LCG's
    # low bit is parity(src+dst+sys+seed) since every multiplier is odd —
    # perfectly correlated signs destroy the JL estimate; this operator is
    # pytest-tier so the cross-engine LCG discipline doesn't apply)
    sgn = F.pmod(F.xxhash64("src", "dst", "sys", F.lit(seed)), F.lit(2))
    proj = sysr.withColumn(
        "q", (sgn * 2 - 1).cast("double") * F.lit(scale) * F.sqrt("w")
    )
    b = proj.select("sys", F.col("src").alias("id"), F.col("q").alias("b")).unionByName(
        proj.select("sys", F.col("dst").alias("id"), (-F.col("q")).alias("b"))
    ).groupBy("sys", "id").agg(F.sum("b").alias("b"))
    z = laplacian_cg(graph, b, tol=tol)
    zs = z.select("sys", F.col("id").alias("src"), F.col("x").alias("zu"))
    zd = z.select("sys", F.col("id").alias("dst"), F.col("x").alias("zv"))
    return (
        canon.select("src", "dst")
        .join(zs, "src")
        .join(zd, ["sys", "dst"])
        .groupBy("src", "dst")
        .agg(
            F.sum((F.col("zu") - F.col("zv")) * (F.col("zu") - F.col("zv"))).alias(
                "score"
            )
        )
    )
