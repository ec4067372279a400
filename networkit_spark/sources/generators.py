"""Deterministic graph generators (reference: networkit/cpp/generators/*,
Python surface networkit/generators.pyx:52-1318).

Every generator is a per-row seeded-hash program over spark.range — no RNG
state, no driver-side loops — so the same (n, m, seed) produces identical
edges at any parallelism and any cluster size. This is the embarrassingly
parallel source used for scale benchmarks (10^7..10^12 edges stream
straight out of codegen'd ranges).

Hash: xxhash64(col..., seed) — Spark built-in, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def _u(col):
    """xxhash64 → non-negative uniform long."""
    return F.abs(col)


def erdos_renyi(
    spark: SparkSession, n: int, p: float, seed: int = 42, directed: bool = False
) -> GraphDF:
    """G(n, p) via per-pair Bernoulli on the pair index (ErdosRenyiGenerator
    analog). O(n²) candidate space — intended for n ≤ ~10⁴ test graphs;
    use rmat() for scale."""
    pairs = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("src"),
        F.pmod(F.col("id"), F.lit(n)).cast("long").alias("dst"),
    )
    if directed:
        pairs = pairs.filter(F.col("src") != F.col("dst"))
    else:
        pairs = pairs.filter(F.col("src") < F.col("dst"))
    thresh = int(p * (1 << 62))
    e = pairs.filter(
        F.pmod(_u(F.xxhash64("src", "dst", F.lit(seed))), F.lit(1 << 62))
        < F.lit(thresh)
    ).withColumn("weight", F.lit(1.0))
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=directed, vertices=v)


def rmat(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    seed: int = 42,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    directed: bool = True,
    dedup: bool = True,
) -> GraphDF:
    """R-MAT generator (RmatGenerator analog): n = 2^scale nodes,
    m = n·edge_factor edges, power-law degree skew with hubs at low ids.

    Each edge's quadrant path is derived from seeded hashes of
    (edge_index, level) — fully parallel, reproducible, no RNG state.
    """
    n = 1 << scale
    m = n * edge_factor
    t_ab = int((a + b) * 10_000)
    t_a_in_ab = int(a / (a + b) * 10_000)
    t_c_in_cd = int(c / (1.0 - a - b) * 10_000)

    df = spark.range(m).select(F.col("id").alias("e"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        h = F.pmod(_u(F.xxhash64("e", F.lit(lvl), F.lit(seed))), F.lit(10_000))
        h2 = F.pmod(
            _u(F.xxhash64("e", F.lit(lvl), F.lit(seed + 1))), F.lit(10_000)
        )
        top = h < F.lit(t_ab)  # rows (src bit 0) w.p. a+b
        left = F.when(top, h2 < F.lit(t_a_in_ab)).otherwise(
            h2 < F.lit(t_c_in_cd)
        )
        src = src + F.when(top, F.lit(0)).otherwise(F.lit(1 << lvl)).cast("long")
        dst = dst + F.when(left, F.lit(0)).otherwise(F.lit(1 << lvl)).cast("long")
    e = df.select(src.alias("src"), dst.alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    if dedup:
        e = e.groupBy("src", "dst").agg(F.count("*").cast("double").alias("weight"))
    else:
        e = e.withColumn("weight", F.lit(1.0))
    return GraphDF.from_edges(
        e, directed=directed, weighted=dedup, canonicalize=False
    )


def watts_strogatz(
    spark: SparkSession, n: int, k: int, p: float, seed: int = 42
) -> GraphDF:
    """Ring lattice (each node to k/2 neighbors each side) with seeded
    rewiring (WattsStrogatzGenerator analog). Rewired endpoint = hash-chosen
    node; deterministic per (edge, seed)."""
    half = k // 2
    base = spark.range(n).select(F.col("id").alias("src"))
    offs = spark.range(1, half + 1).select(F.col("id").alias("off"))
    ring = base.crossJoin(offs).select(
        "src", F.pmod(F.col("src") + F.col("off"), F.lit(n)).alias("dst"), "off"
    )
    thresh = int(p * (1 << 62))
    rewire = F.pmod(
        _u(F.xxhash64("src", "off", F.lit(seed))), F.lit(1 << 62)
    ) < F.lit(thresh)
    new_dst = F.pmod(_u(F.xxhash64("src", "off", F.lit(seed + 7))), F.lit(n))
    e = ring.select(
        "src",
        F.when(rewire, new_dst).otherwise(F.col("dst")).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    # a rewired endpoint can collide with an existing ring edge — dedup on
    # the canonical pair or degree/triangle ops double-count the multi-edge
    e = e.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    ).dropDuplicates(["src", "dst"])
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(
        e.withColumn("weight", F.lit(1.0)), directed=False, vertices=v
    )


def clustered_random(
    spark: SparkSession,
    n: int,
    k: int,
    p_intra: float,
    p_inter: float,
    seed: int = 42,
) -> tuple[GraphDF, DataFrame]:
    """ClusteredRandomGraphGenerator analog: k planted clusters, dense
    inside / sparse across. Returns (graph, ground_truth(id, label)) — the
    PLP/modularity test fixture. O(n²) candidate space: test sizes only."""
    labels = spark.range(n).select(
        F.col("id").cast("long"),
        F.pmod(_u(F.xxhash64("id", F.lit(seed))), F.lit(k)).alias("label"),
    )
    pairs = (
        spark.range(n * n)
        .select(
            (F.col("id") / n).cast("long").alias("src"),
            F.pmod(F.col("id"), F.lit(n)).cast("long").alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
    )
    la = labels.select(F.col("id").alias("src"), F.col("label").alias("l_src"))
    lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("l_dst"))
    joined = pairs.join(la, "src").join(lb, "dst")
    t_intra = int(p_intra * (1 << 62))
    t_inter = int(p_inter * (1 << 62))
    h = F.pmod(_u(F.xxhash64("src", "dst", F.lit(seed + 3))), F.lit(1 << 62))
    e = joined.filter(
        F.when(F.col("l_src") == F.col("l_dst"), h < F.lit(t_intra)).otherwise(
            h < F.lit(t_inter)
        )
    ).select("src", "dst", F.lit(1.0).alias("weight"))
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=False, vertices=v), labels


def dorogovtsev_mendes_like(
    spark: SparkSession, n: int, seed: int = 42
) -> GraphDF:
    """Preferential-attachment-flavored graph without sequential growth:
    each node v>=3 attaches to 2 hash-chosen earlier nodes with skew toward
    low ids (id chosen as min of two uniforms — density ∝ rank). A
    parallel-generation stand-in for DorogovtsevMendes/BarabasiAlbert whose
    sequential definitions don't distribute; same degree-skew envelope."""
    df = spark.range(3, n).select(F.col("id").alias("src"))
    picks = []
    for j in range(2):
        u1 = F.pmod(_u(F.xxhash64("src", F.lit(j * 2), F.lit(seed))), F.col("src"))
        u2 = F.pmod(
            _u(F.xxhash64("src", F.lit(j * 2 + 1), F.lit(seed))), F.col("src")
        )
        picks.append(F.least(u1, u2))
    e = (
        df.select("src", picks[0].alias("dst"))
        .union(df.select("src", picks[1].alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .withColumn("weight", F.lit(1.0))
    )
    seed_edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]
    e0 = df.sparkSession.createDataFrame(
        seed_edges, "src long, dst long, weight double"
    )
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e.unionByName(e0), directed=False, vertices=v)


def chung_lu(
    spark: SparkSession, weights: list[float], seed: int = 42
) -> GraphDF:
    """ChungLuGenerator (generators/ChungLuGenerator.hpp:32) — expected-
    degree random graph: pair (u,v) kept with p = min(1, w_u·w_v/S),
    S = Σw. Seeded per-pair Bernoulli over the O(n²) candidate space —
    fixture-scale like erdos_renyi (the reference is likewise an in-memory
    generator); rmat() is the at-scale skewed source."""
    n = len(weights)
    s = float(sum(weights)) or 1.0
    wdf = F.broadcast(
        spark.createDataFrame(
            [(i, float(w)) for i, w in enumerate(weights)], "id long, w double"
        )
    )
    pairs = (
        spark.range(n * n)
        .select(
            (F.col("id") / n).cast("long").alias("src"),
            F.pmod(F.col("id"), F.lit(n)).cast("long").alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
    )
    pw = pairs.join(
        wdf.select(F.col("id").alias("src"), F.col("w").alias("wu")), "src"
    ).join(wdf.select(F.col("id").alias("dst"), F.col("w").alias("wv")), "dst")
    u01 = (
        F.pmod(_u(F.xxhash64("src", "dst", F.lit(seed))), F.lit(1 << 40))
        / F.lit(float(1 << 40))
    )
    e = pw.filter(
        u01 < F.least(F.lit(1.0), F.col("wu") * F.col("wv") / F.lit(s))
    ).select("src", "dst", F.lit(1.0).alias("weight"))
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=False, vertices=v)


def havel_hakimi(spark: SparkSession, degree_sequence: list[int]) -> GraphDF:
    """HavelHakimiGenerator (generators/HavelHakimiGenerator.hpp:26; its
    base StaticDegreeSequenceGenerator.cpp contributes only the
    realizability check, folded in here) —
    realize a graphical degree sequence greedily: repeatedly connect the
    highest-remaining-degree node to the next-highest ones. The greedy loop
    is inherently sequential over n (the reference's is too); this is the
    FIXTURE generator used to mirror reference test inputs
    (ConnectedComponentsGTest.cpp:15-25), run driver-side at fixture n and
    parallelized as a DataFrame result. Raises if the sequence is not
    graphical (the reference emits a warning and realizes a best effort;
    we are strict)."""
    remaining = sorted(
        ((int(d), i) for i, d in enumerate(degree_sequence)), reverse=True
    )
    edges = []
    while remaining:
        remaining.sort(reverse=True)
        d, u = remaining[0]
        if d == 0:
            break
        if d > len(remaining) - 1:
            raise ValueError("degree sequence is not graphical")
        rest = remaining[1:]
        for j in range(d):
            dv, v = rest[j]
            if dv == 0:
                raise ValueError("degree sequence is not graphical")
            edges.append((min(u, v), max(u, v)))
            rest[j] = (dv - 1, v)
        remaining = rest
    n = len(degree_sequence)
    v = spark.range(n).select(F.col("id").cast("long"))
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges] or [],
        "src long, dst long, weight double",
    )
    return GraphDF.from_edges(e, directed=False, vertices=v)


def barabasi_albert(
    spark: SparkSession, k: int, n_max: int, seed: int = 42, max_jump: int = 64
) -> GraphDF:
    """BarabasiAlbertGenerator (generators/BarabasiAlbertGenerator.hpp:20) —
    preferential attachment, PARALLELIZED with the endpoint-slot trick:
    node t's i-th target is a uniformly random ENDPOINT SLOT among the
    2·E(t) endpoints of earlier edges (slot mass ∝ degree — exactly the
    BA kernel). A slot either resolves immediately (a concrete node id) or
    references an earlier (t', i') choice; reference chains resolve by
    POINTER JUMPING over a DataFrame — O(log chain) supersteps, no
    sequential loop over n. Seeded-hash choices ⇒ deterministic at any
    parallelism (the reference's RNG stream is inherently sequential).
    Start: a k-cycle over nodes 0..k−1. Multi-edges collapse (dedup), as in
    the reference's simple-graph output."""
    if n_max <= k:
        raise ValueError("n_max must exceed k")
    spark_ = spark
    # choices for t in [k, n_max), i in [0, k)
    base = spark_.range(k, n_max).select(F.col("id").alias("t"))
    choices = base.crossJoin(
        F.broadcast(spark_.range(k).select(F.col("id").alias("i")))
    )
    # E(t) = k + (t-k)*k edges exist before node t attaches
    slot_cnt = (F.lit(2) * (F.lit(k) + (F.col("t") - k) * k)).cast("long")
    s = F.pmod(_u(F.xxhash64("t", "i", F.lit(seed))), slot_cnt)
    eidx = (s / 2).cast("long")
    side = F.pmod(s, F.lit(2))
    # edge eidx: cycle edge if < k, else created by (t_e, i_e)
    t_e = (F.lit(k) + ((eidx - k) / k).cast("long"))
    i_e = F.pmod(eidx - k, F.lit(k))
    st = choices.select(
        "t",
        "i",
        F.when(eidx < k, F.when(side == 0, eidx).otherwise(
            F.pmod(eidx + 1, F.lit(k))))          # cycle endpoints known
        .when(side == 0, t_e)                      # new-node endpoint known
        .otherwise(F.lit(None).cast("long"))
        .alias("value"),
        F.when((eidx >= k) & (side == 1), t_e).alias("ref_t"),
        F.when((eidx >= k) & (side == 1), i_e).alias("ref_i"),
    ).localCheckpoint(eager=True)
    for _ in range(max_jump):
        unresolved = st.filter(F.col("value").isNull()).count()
        if unresolved == 0:
            break
        tgt = st.select(
            F.col("t").alias("r_t"),
            F.col("i").alias("r_i"),
            F.col("value").alias("r_value"),
            F.col("ref_t").alias("r_ref_t"),
            F.col("ref_i").alias("r_ref_i"),
        )
        st = (
            st.join(
                tgt,
                (st.ref_t == tgt.r_t) & (st.ref_i == tgt.r_i),
                "left",
            )
            .select(
                "t",
                "i",
                F.coalesce("value", "r_value").alias("value"),
                F.when(F.col("value").isNull() & F.col("r_value").isNull(),
                       F.col("r_ref_t")).alias("ref_t"),
                F.when(F.col("value").isNull() & F.col("r_value").isNull(),
                       F.col("r_ref_i")).alias("ref_i"),
            )
            .localCheckpoint(eager=True)
        )
    cycle = spark_.range(k).select(
        F.col("id").alias("src"),
        F.pmod(F.col("id") + 1, F.lit(k)).cast("long").alias("dst"),
    )
    new_edges = st.select(F.col("t").alias("src"), F.col("value").alias("dst"))
    e = (
        cycle.unionByName(new_edges)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .dropDuplicates(["src", "dst"])
        .withColumn("weight", F.lit(1.0))
    )
    v = spark_.range(n_max).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=False, vertices=v)


# ------------------------------------------------- dynamic generators (§2.1)
def dynamic_erdos_events(
    spark: SparkSession,
    n: int,
    batches: int,
    events_per_batch: int,
    seed: int = 42,
):
    """DynamicGraphGenerator family analog (reference
    generators/Dynamic*.cpp emit GraphEvent streams): seeded random edge
    ADDITION/REMOVAL events over n nodes, `batches` micro-batches of
    `events_per_batch` each. Returns an events DataFrame
    (seq, type, u, v, w) for streaming/events.apply_events — the dynamic
    fixture source for Dyn* algorithms."""
    total = batches * events_per_batch
    df = spark.range(total).select(F.col("id").alias("seq"))
    u = F.pmod(_u(F.xxhash64("seq", F.lit(seed), F.lit(1))), F.lit(n))
    v_raw = F.pmod(_u(F.xxhash64("seq", F.lit(seed), F.lit(2))), F.lit(n - 1))
    v = v_raw + (v_raw >= u).cast("long")  # v != u
    is_add = F.pmod(_u(F.xxhash64("seq", F.lit(seed), F.lit(3))), F.lit(4)) < 3
    return df.select(
        "seq",
        F.when(is_add, F.lit("EDGE_ADDITION"))
        .otherwise(F.lit("EDGE_REMOVAL"))
        .alias("type"),
        u.cast("long").alias("u"),
        v.cast("long").alias("v"),
        F.lit(1.0).alias("w"),
    )


def dynamic_barabasi_events(
    spark: SparkSession, k: int, n_max: int, seed: int = 42
):
    """DynamicBarabasiAlbertGenerator analog: the barabasi_albert growth
    process replayed as a GraphEvent stream — NODE_ADDITION for each new
    node followed by its k preferential EDGE_ADDITIONs, in growth order.
    Folding the stream (streaming/events.graph_from_events) reproduces
    barabasi_albert(spark, k, n_max, seed) EXACTLY (tested) — the
    stream and the static generator are the same seeded process."""
    g = barabasi_albert(spark, k, n_max, seed=seed)
    # initial nodes + cycle edges get the first seq numbers; node t's
    # events start at base = (k+1) + k + (t-k)*(1+k)
    init_nodes = spark.range(k).select(
        F.col("id").alias("seq"),
        F.lit("NODE_ADDITION").alias("type"),
        F.col("id").cast("long").alias("u"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    cycle = spark.range(k).select(
        (F.col("id") + k).alias("seq"),
        F.lit("EDGE_ADDITION").alias("type"),
        F.col("id").cast("long").alias("u"),
        F.pmod(F.col("id") + 1, F.lit(k)).cast("long").alias("v"),
        F.lit(1.0).alias("w"),
    )
    # growth edges: order by (max endpoint = the grown node t, other)
    grown = g.E.select(
        F.greatest("src", "dst").alias("t"), F.least("src", "dst").alias("o")
    ).filter(F.col("t") >= k)
    from pyspark.sql import Window

    wt = Window.partitionBy("t").orderBy("o")
    node_ev = spark.range(k, n_max).select(
        (F.lit(2 * k) + (F.col("id") - k) * (k + 1)).alias("seq"),
        F.lit("NODE_ADDITION").alias("type"),
        F.col("id").cast("long").alias("u"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    edge_ev = grown.withColumn("i", F.row_number().over(wt)).select(
        (F.lit(2 * k) + (F.col("t") - k) * (k + 1) + F.col("i")).alias("seq"),
        F.lit("EDGE_ADDITION").alias("type"),
        F.col("t").cast("long").alias("u"),
        F.col("o").cast("long").alias("v"),
        F.lit(1.0).alias("w"),
    )
    return init_nodes.unionByName(cycle).unionByName(node_ev).unionByName(edge_ev)


def hyperbolic_random(
    spark: SparkSession, n: int, avg_degree: float = 6.0, alpha: float = 1.0,
    seed: int = 42,
) -> GraphDF:
    """HyperbolicGenerator analog (generators/HyperbolicGenerator.hpp):
    nodes at seeded-hash polar coordinates in a hyperbolic disk of radius
    R (radial density ∝ e^{αr}), edge iff hyperbolic distance ≤ R —
    native-scale-free degree distribution. R is set from avg_degree by the
    standard 2·ln(8n/(π·k̄)) heuristic. O(n²) candidate filter — fixture
    scale, like the reference's in-memory generator (its band optimization
    is a constant-factor device, not a semantic)."""
    import math as _m

    R = 2.0 * _m.log(8.0 * n / (_m.pi * avg_degree))
    pts = spark.range(n).select(
        F.col("id").cast("long"),
        (
            F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(1))), F.lit(1 << 40))
            / F.lit(float(1 << 40)) * F.lit(2.0 * _m.pi)
        ).alias("theta"),
        (
            F.acosh(
                1.0
                + (F.cosh(F.lit(alpha * R)) - 1.0)
                * (
                    F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(2))), F.lit(1 << 40))
                    / F.lit(float(1 << 40))
                )
            )
            / F.lit(alpha)
        ).alias("r"),
    )
    a = pts.select(
        F.col("id").alias("src"), F.col("theta").alias("t1"), F.col("r").alias("r1")
    )
    b = pts.select(
        F.col("id").alias("dst"), F.col("theta").alias("t2"), F.col("r").alias("r2")
    )
    pairs = a.crossJoin(b).filter(F.col("src") < F.col("dst"))
    dtheta = F.lit(_m.pi) - F.abs(F.lit(_m.pi) - F.abs(F.col("t1") - F.col("t2")))
    cosh_d = (
        F.cosh("r1") * F.cosh("r2")
        - F.sinh("r1") * F.sinh("r2") * F.cos(dtheta)
    )
    e = pairs.filter(cosh_d <= F.cosh(F.lit(R))).select(
        "src", "dst", F.lit(1.0).alias("weight")
    )
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=False, vertices=v)


def random_geometric(
    spark: SparkSession, n: int, radius: float, seed: int = 42
) -> GraphDF:
    """PubWebGenerator analog: seeded-hash points on the unit torus,
    edge iff torus distance ≤ radius. O(n²) candidate filter at fixture
    scale (a cell-grid join is the scale path)."""
    pts = spark.range(n).select(
        F.col("id").cast("long"),
        (
            F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(1))), F.lit(1 << 40))
            / F.lit(float(1 << 40))
        ).alias("x"),
        (
            F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(2))), F.lit(1 << 40))
            / F.lit(float(1 << 40))
        ).alias("y"),
    )
    a = pts.select(F.col("id").alias("src"), F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = pts.select(F.col("id").alias("dst"), F.col("x").alias("x2"), F.col("y").alias("y2"))
    dx = F.abs(F.col("x1") - F.col("x2"))
    dy = F.abs(F.col("y1") - F.col("y2"))
    tdx = F.least(dx, 1.0 - dx)
    tdy = F.least(dy, 1.0 - dy)
    pairs = a.crossJoin(b).filter(F.col("src") < F.col("dst"))
    e = pairs.filter(tdx * tdx + tdy * tdy <= F.lit(radius * radius)).select(
        "src", "dst", F.lit(1.0).alias("weight")
    )
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=False, vertices=v)


def _hh_edges_local(ids, degs):
    """Greedy Havel-Hakimi over (ids, degs) with best-effort degradation
    (non-graphical residue is dropped, like the reference's warning path —
    LFRGenerator.cpp realizes intra-community sequences the same way).
    Pure python over ONE community's nodes: called per applyInPandas group,
    so the working set is a single community, never the graph."""
    remaining = sorted(zip((int(d) for d in degs), (int(i) for i in ids)), reverse=True)
    edges = []
    while remaining:
        remaining.sort(reverse=True)
        d, u = remaining[0]
        if d <= 0:
            break
        rest = remaining[1:]
        take = min(d, len(rest))
        for j in range(take):
            dv, v = rest[j]
            if dv <= 0:
                break
            edges.append((min(u, v), max(u, v)))
            rest[j] = (dv - 1, v)
        remaining = rest
    return edges


def lfr(
    spark: SparkSession,
    n: int,
    avg_degree: int = 10,
    max_degree: int = 50,
    gamma: float = 2.5,
    beta: float = 1.5,
    mu: float = 0.2,
    min_community: int = 20,
    max_community: int = 100,
    seed: int = 42,
) -> tuple[GraphDF, DataFrame]:
    """LFRGenerator (generators/LFRGenerator.cpp; Lancichinetti-Fortunato-
    Radicchi benchmark): power-law degrees (exponent `gamma`), power-law
    community sizes (exponent `beta`), per-node mixing `mu` (fraction of
    degree leaving the community). Returns (graph, planted_partition(id,
    label)) — the standard community-detection benchmark input.

    Distributed construction (the reference is an in-memory realize-and-
    rewire loop; this is the Spark-shaped equivalent):
      1. degrees: inverse-CDF power-law per node (hash uniform, column
         expression over spark.range — embarrassingly parallel),
      2. community sizes: driver-side power-law list (k ≈ n/⟨s⟩ communities
         — METADATA, not data), broadcast as [lo, hi) position ranges,
      3. assignment: nodes ranked by degree DESC via the two-stage global
         rank, range-joined into communities sorted by size DESC — big
         nodes land in big communities (the reference's feasibility
         constraint d_int < |C|, enforced by capping),
      4. intra-community edges: per-community Havel-Hakimi on the internal
         degrees (1−mu)·d via applyInPandas — one community per group, the
         community is the unit of locality (fits one executor by the
         max_community bound),
      5. inter-community edges: configuration-model pairing of external
         stubs — hash-shuffled two-stage global rank, stub 2i ↔ 2i+1;
         self-pairs / duplicate pairs / same-community pairs dropped
         (the reference rewires them; the drop bias is O(mu²/k) and the
         mixing invariant is asserted in tests).
    No single-partition window anywhere; every per-node step is a column
    expression or a partitioned window."""
    import pandas as pd

    from networkit_spark.plans.ranking import global_row_numbers

    # ---- 1. power-law degree sequence (inverse CDF, truncated)
    dmin = max(2, int(round(avg_degree / 2)))
    u01 = (
        F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(11))), F.lit(1 << 40))
        + F.lit(1.0)
    ) / F.lit(float((1 << 40) + 1))
    raw_deg = F.least(
        F.lit(max_degree),
        F.round(F.lit(dmin) * F.pow(F.lit(1.0) - u01, F.lit(-1.0 / (gamma - 1.0)))).cast(
            "long"
        ),
    )
    nodes = spark.range(n).select(F.col("id").cast("long"), raw_deg.alias("deg"))

    # ---- 2. community sizes (driver-side metadata: k ≈ n/⟨s⟩ rows)
    import hashlib

    sizes = []
    total = 0
    i = 0
    while total < n:
        h = int.from_bytes(
            hashlib.sha256(f"lfr-size-{seed}-{i}".encode()).digest()[:6], "big"
        )
        u = (h + 1) / float((1 << 48) + 1)
        s = int(round(min_community * (1.0 - u) ** (-1.0 / (beta - 1.0))))
        s = min(max(s, min_community), max_community)
        sizes.append(s)
        total += s
        i += 1
    sizes[-1] -= total - n  # trim the last community to hit n exactly
    if sizes[-1] < 2 and len(sizes) > 1:
        sizes[-2] += sizes[-1]
        sizes.pop()
    sizes.sort(reverse=True)
    ranges = []
    lo = 0
    for label, s in enumerate(sizes):
        ranges.append((label, lo, lo + s, s))
        lo += s
    rdf = F.broadcast(
        spark.createDataFrame(ranges, "label long, lo long, hi long, csize long")
    )

    # ---- 3. degree-rank assignment into size-sorted communities
    ranked = global_row_numbers(nodes, ["deg", "id"], out_col="neg_pos")
    # global_row_numbers ranks ASC; invert for degree-DESC position
    ranked = ranked.withColumn("pos", F.lit(n - 1) - F.col("neg_pos")).drop("neg_pos")
    assigned = ranked.join(
        rdf, (F.col("pos") >= F.col("lo")) & (F.col("pos") < F.col("hi"))
    ).select("id", "deg", "label", "csize")
    d_int = F.least(
        F.round(F.col("deg") * F.lit(1.0 - mu)).cast("long"), F.col("csize") - 1
    )
    assigned = assigned.select(
        "id",
        "deg",
        "label",
        d_int.alias("d_int"),
        (F.col("deg") - d_int).alias("d_ext"),
    ).persist()

    # ---- 4. intra-community Havel-Hakimi (one group = one community)
    def _realize(pdf: pd.DataFrame) -> pd.DataFrame:
        degs = list(pdf["d_int"])
        if sum(degs) % 2 == 1:  # make the sum even (reference drops a stub)
            j = max(range(len(degs)), key=lambda x: degs[x])
            degs[j] -= 1
        edges = _hh_edges_local(list(pdf["id"]), degs)
        return pd.DataFrame(edges, columns=["src", "dst"], dtype="int64")

    intra = assigned.groupBy("label").applyInPandas(
        _realize, "src long, dst long"
    )

    # ---- 5. external stubs → configuration-model pairing
    stubs = assigned.filter(F.col("d_ext") > 0).select(
        "id",
        "label",
        F.explode(F.sequence(F.lit(1), F.col("d_ext"))).alias("stub"),
    )
    stubs = stubs.withColumn(
        "shuf", F.xxhash64("id", "stub", F.lit(seed), F.lit(23))
    )
    pos = global_row_numbers(stubs, ["shuf", "id", "stub"], out_col="p")
    paired = (
        pos.select((F.col("p") / 2).cast("long").alias("pair"), "id", "label")
        .groupBy("pair")
        .agg(
            F.min("id").alias("a"),
            F.max("id").alias("b"),
            F.count("*").alias("cnt"),
            F.count_distinct("label").alias("nlabels"),
        )
        .filter((F.col("cnt") == 2) & (F.col("a") != F.col("b")) & (F.col("nlabels") == 2))
        .select(
            F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
        )
    )
    e = (
        intra.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .unionByName(paired)
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    v = spark.range(n).select(F.col("id").cast("long"))
    partition = assigned.select("id", "label")
    return GraphDF.from_edges(e, directed=False, vertices=v), partition


# ----------------------------------------- dynamic generators, round 3 fills
_EVENT_SCHEMA = "seq long, type string, u long, v long, w double"


def dynamic_path_events(spark: SparkSession, n_steps: int) -> DataFrame:
    """DynamicPathGenerator (generators/DynamicPathGenerator.cpp:12-29):
    node 0, then per step a NODE_ADDITION + EDGE_ADDITION(i-1, i). Fully
    columnar over spark.range — no driver loop."""
    node0 = spark.createDataFrame(
        [(0, "NODE_ADDITION", 0, None, None)], _EVENT_SCHEMA
    )
    steps = spark.range(1, n_steps + 1)
    nodes = steps.select(
        (F.col("id") * 2 - 1).alias("seq"),
        F.lit("NODE_ADDITION").alias("type"),
        F.col("id").cast("long").alias("u"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    edges = steps.select(
        (F.col("id") * 2).alias("seq"),
        F.lit("EDGE_ADDITION").alias("type"),
        (F.col("id") - 1).cast("long").alias("u"),
        F.col("id").cast("long").alias("v"),
        F.lit(1.0).alias("w"),
    )
    return node0.unionByName(nodes).unionByName(edges)


def dynamic_dorogovtsev_mendes_events(
    spark: SparkSession, n_steps: int, seed: int = 42
) -> DataFrame:
    """DynamicDorogovtsevMendesGenerator
    (generators/DynamicDorogovtsevMendesGenerator.cpp:14-55): initial
    triangle, then each new node attaches to BOTH endpoints of a uniformly
    chosen existing edge. Inherently sequential (each draw conditions on
    every prior draw), so the EVENT LIST — O(steps) metadata, never graph-
    sized — is built driver-side with a seeded RNG; the fold back into a
    graph (streaming/events.graph_from_events) is the distributed part."""
    import random

    rng = random.Random(seed)
    rows = []
    seq = 0

    def emit(t, u=None, v=None, w=None):
        nonlocal seq
        rows.append((seq, t, u, v, w))
        seq += 1

    for i in range(3):
        emit("NODE_ADDITION", i)
    edges = [(0, 1), (1, 2), (2, 0)]
    for (a, b) in edges:
        emit("EDGE_ADDITION", a, b, 1.0)
    for i in range(n_steps):
        u = 3 + i
        emit("NODE_ADDITION", u)
        s, t = edges[rng.randint(0, len(edges) - 1)]
        edges.append((s, u))
        edges.append((t, u))
        emit("EDGE_ADDITION", u, s, 1.0)
        emit("EDGE_ADDITION", u, t, 1.0)
    return spark.createDataFrame(rows, _EVENT_SCHEMA)


def dynamic_forest_fire_events(
    spark: SparkSession,
    n_steps: int,
    p: float = 0.3,
    r: float = 1.0,
    directed: bool = False,
    seed: int = 42,
) -> DataFrame:
    """DynamicForestFireGenerator
    (generators/DynamicForestFireGenerator.cpp:25-130): each step adds a
    node, picks a random ambassador, burns outward (geometric edge budget
    with prob p forward / p·r backward per visited node), and connects the
    new node to every burned node. Sequential burning process → driver-side
    event-list construction like the reference (O(steps·degree) metadata);
    the fold is distributed."""
    import random
    from collections import deque

    rng = random.Random(seed)
    rows = []
    seq = 0

    def emit(t, u=None, v=None, w=None):
        nonlocal seq
        rows.append((seq, t, u, v, w))
        seq += 1

    out_nbrs: list[set] = []
    in_nbrs: list[set] = []

    def add_node():
        out_nbrs.append(set())
        in_nbrs.append(set())
        emit("NODE_ADDITION", len(out_nbrs) - 1)
        return len(out_nbrs) - 1

    def add_edge(a, b):
        out_nbrs[a].add(b)
        in_nbrs[b].add(a)
        if not directed:
            out_nbrs[b].add(a)
            in_nbrs[a].add(b)
        emit("EDGE_ADDITION", a, b, 1.0)

    def select(cands, prob):
        chosen = set()
        pool = list(cands)
        while pool and rng.random() <= prob:
            k = rng.randint(0, len(pool) - 1)
            chosen.add(pool[k])
            pool[k] = pool[-1]
            pool.pop()
        return chosen

    for _ in range(n_steps):
        u = add_node()
        if u == 0:
            continue
        visited = {u}
        amb = rng.randint(0, u - 1)
        q = deque([amb])
        burned = [amb]
        visited.add(amb)
        while q:
            x = q.popleft()
            nxt = select([y for y in out_nbrs[x] if y not in visited], p)
            if directed:
                nxt |= select([y for y in in_nbrs[x] if y not in visited], p * r)
            for y in nxt:
                visited.add(y)
                burned.append(y)
                q.append(y)
        for b in burned:
            add_edge(u, b)
    return spark.createDataFrame(rows, _EVENT_SCHEMA)


def _diff_events(prev_e: DataFrame, cur_e: DataFrame, step: int) -> DataFrame:
    """Edge-set delta between consecutive snapshots as GraphEvents, all
    DataFrame ops (anti-joins). Every (u,v) key appears at most once per
    step, so seq = step preserves apply_events' last-writer-wins order."""
    added = cur_e.join(prev_e, ["src", "dst"], "left_anti").select(
        F.lit(step).cast("long").alias("seq"),
        F.lit("EDGE_ADDITION").alias("type"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.lit(1.0).alias("w"),
    )
    removed = prev_e.join(cur_e, ["src", "dst"], "left_anti").select(
        F.lit(step).cast("long").alias("seq"),
        F.lit("EDGE_REMOVAL").alias("type"),
        F.col("src").alias("u"),
        F.col("dst").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    return added.unionByName(removed)


def dynamic_hyperbolic_events(
    spark: SparkSession,
    n: int,
    n_steps: int,
    drift: float = 0.05,
    avg_degree: float = 6.0,
    alpha: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """DynamicHyperbolicGenerator (generators/DynamicHyperbolicGenerator.cpp):
    nodes move in the hyperbolic disk; the event stream is the edge-set
    delta between consecutive positions. Re-expressed distributively: the
    per-step angular drift is a seeded column expression (theta_t = theta_0
    + t·δ_i), each snapshot's edge set is the same distance-filtered join
    as hyperbolic_random, and the delta is two anti-joins — no driver-side
    graph state, steps are metadata only."""
    import math as _m

    R = 2.0 * _m.log(8.0 * n / (_m.pi * avg_degree))

    def pts(step: int):
        delta = (
            F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(99))), F.lit(1 << 20))
            / F.lit(float(1 << 20)) - 0.5
        ) * F.lit(2.0 * drift)
        return spark.range(n).select(
            F.col("id").cast("long"),
            F.pmod(
                F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(1))), F.lit(1 << 40))
                / F.lit(float(1 << 40)) * F.lit(2.0 * _m.pi)
                + F.lit(float(step)) * delta,
                F.lit(2.0 * _m.pi),
            ).alias("theta"),
            (
                F.acosh(
                    1.0
                    + (F.cosh(F.lit(alpha * R)) - 1.0)
                    * (
                        F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(2))), F.lit(1 << 40))
                        / F.lit(float(1 << 40))
                    )
                )
                / F.lit(alpha)
            ).alias("r"),
        )

    def edges(step: int):
        p = pts(step)
        a = p.select(F.col("id").alias("src"), F.col("theta").alias("t1"), F.col("r").alias("r1"))
        b = p.select(F.col("id").alias("dst"), F.col("theta").alias("t2"), F.col("r").alias("r2"))
        pairs = a.crossJoin(b).filter(F.col("src") < F.col("dst"))
        dtheta = F.lit(_m.pi) - F.abs(F.lit(_m.pi) - F.abs(F.col("t1") - F.col("t2")))
        cosh_d = (
            F.cosh("r1") * F.cosh("r2") - F.sinh("r1") * F.sinh("r2") * F.cos(dtheta)
        )
        return pairs.filter(cosh_d <= F.cosh(F.lit(R))).select("src", "dst")

    nodes = spark.range(n).select(
        F.lit(0).cast("long").alias("seq"),
        F.lit("NODE_ADDITION").alias("type"),
        F.col("id").cast("long").alias("u"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    empty = spark.createDataFrame([], "src long, dst long")
    out = nodes
    prev = empty
    for t in range(n_steps + 1):
        cur = edges(t).localCheckpoint(eager=True)
        out = out.unionByName(_diff_events(prev, cur, t + 1))
        prev = cur
    return out


def dynamic_pubweb_events(
    spark: SparkSession,
    n: int,
    n_steps: int,
    radius: float,
    drift: float = 0.02,
    seed: int = 42,
) -> DataFrame:
    """DynamicPubWebGenerator (generators/DynamicPubWebGenerator.cpp):
    points drift on the unit torus; events are the radius-graph deltas.
    Same distributed diff design as dynamic_hyperbolic_events."""

    def pts(step: int):
        def coord(salt):
            base = (
                F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(salt))), F.lit(1 << 40))
                / F.lit(float(1 << 40))
            )
            d = (
                F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(salt + 50))), F.lit(1 << 20))
                / F.lit(float(1 << 20)) - 0.5
            ) * F.lit(2.0 * drift)
            return F.pmod(base + F.lit(float(step)) * d + 10.0, F.lit(1.0))

        return spark.range(n).select(
            F.col("id").cast("long"), coord(1).alias("x"), coord(2).alias("y")
        )

    def edges(step: int):
        p = pts(step)
        a = p.select(F.col("id").alias("src"), F.col("x").alias("x1"), F.col("y").alias("y1"))
        b = p.select(F.col("id").alias("dst"), F.col("x").alias("x2"), F.col("y").alias("y2"))
        dx = F.abs(F.col("x1") - F.col("x2"))
        dy = F.abs(F.col("y1") - F.col("y2"))
        tdx = F.least(dx, 1.0 - dx)
        tdy = F.least(dy, 1.0 - dy)
        pairs = a.crossJoin(b).filter(F.col("src") < F.col("dst"))
        return pairs.filter(tdx * tdx + tdy * tdy <= F.lit(radius * radius)).select(
            "src", "dst"
        )

    nodes = spark.range(n).select(
        F.lit(0).cast("long").alias("seq"),
        F.lit("NODE_ADDITION").alias("type"),
        F.col("id").cast("long").alias("u"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    empty = spark.createDataFrame([], "src long, dst long")
    out = nodes
    prev = empty
    for t in range(n_steps + 1):
        cur = edges(t).localCheckpoint(eager=True)
        out = out.unionByName(_diff_events(prev, cur, t + 1))
        prev = cur
    return out


def mocnik(
    spark: SparkSession,
    dim: int,
    n: int,
    k: float = 2.5,
    seed: int = 42,
    weighted: bool = False,
) -> GraphDF:
    """MocnikGenerator (generators/MocnikGenerator.cpp:217-290): n uniform
    points in [0,1]^dim; DIRECTED edge u→v iff dist(u,v) ≤ k · dmin(u),
    where dmin(u) is u's nearest-neighbor distance. The reference's cell
    array is an acceleration structure, not a semantic — re-expressed as
    an all-pairs candidate join (fixture scale, like the other geometric
    generators; a grid-cell bucketed join is the scale path) + per-source
    min aggregation. weight = dist/dmin per the weighted variant.

    MocnikGeneratorBasic (MocnikGeneratorBasic.cpp) is the reference's own
    un-accelerated all-pairs formulation of the SAME model — i.e. exactly
    this join, so one implementation covers both classes."""
    coords = [
        (
            F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(10 + j))), F.lit(1 << 40))
            / F.lit(float(1 << 40))
        ).alias(f"c{j}")
        for j in range(dim)
    ]
    pts = spark.range(n).select(F.col("id").cast("long"), *coords)
    a = pts.select(
        F.col("id").alias("src"), *[F.col(f"c{j}").alias(f"a{j}") for j in range(dim)]
    )
    b = pts.select(
        F.col("id").alias("dst"), *[F.col(f"c{j}").alias(f"b{j}") for j in range(dim)]
    )
    d2 = None
    for j in range(dim):
        t = (F.col(f"a{j}") - F.col(f"b{j}")) ** 2
        d2 = t if d2 is None else d2 + t
    pairs = (
        a.crossJoin(b)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", F.sqrt(d2).alias("d"))
    )
    dmin = pairs.groupBy("src").agg(F.min("d").alias("dmin"))
    e = (
        pairs.join(dmin, "src")
        .filter(F.col("d") <= F.lit(float(k)) * F.col("dmin"))
        .select(
            "src",
            "dst",
            (
                (F.col("d") / F.col("dmin")) if weighted else F.lit(1.0)
            ).alias("weight"),
        )
    )
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=True, weighted=weighted, vertices=v)


def regular_ring_lattice(spark: SparkSession, n: int, n_neighbors: int) -> GraphDF:
    """RegularRingLatticeGenerator (generators/RegularRingLatticeGenerator.cpp:
    12-29): node i connects to (i+j) % n for j in 1..k, k clamped to
    n/2 - 1 like the reference. Pure column program over spark.range —
    no shuffle at all until the caller asks for one."""
    k = n_neighbors
    if k >= n // 2 - 1:
        k = n // 2 - 1
    e = (
        spark.range(n)
        .select(
            F.col("id").cast("long").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(int(k)))).alias("j"),
        )
        .select(
            "src",
            F.pmod(F.col("src") + F.col("j"), F.lit(n)).cast("long").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=False, vertices=v)


def stochastic_blockmodel(
    spark: SparkSession,
    n: int,
    membership: list[int] | DataFrame,
    affinity: list[list[float]],
    seed: int = 42,
) -> GraphDF:
    """StochasticBlockmodel (generators/StochasticBlockmodel.cpp:33-48):
    every node pair u<v is an independent Bernoulli with
    p = affinity[block(u)][block(v)]. Same per-pair seeded-hash design as
    erdos_renyi; the affinity matrix is nBlocks² metadata broadcast into
    the join. O(n²) candidate space — fixture tier like the reference's
    own forNodePairs loop (for scale, sample per block pair instead)."""
    if isinstance(membership, DataFrame):
        mem = membership.select(
            F.col("id").cast("long"), F.col("block").cast("long")
        )
    else:
        if len(membership) != n:
            raise ValueError("membership list must be of size n")
        mem = spark.createDataFrame(
            [(i, int(b)) for i, b in enumerate(membership)], "id long, block long"
        )
    k = len(affinity)
    for row in affinity:
        if len(row) != k:
            raise ValueError("affinity matrix must be square")
    aff = spark.createDataFrame(
        [(a, b, float(affinity[a][b])) for a in range(k) for b in range(k)],
        "ba long, bb long, p double",
    )
    pairs = (
        spark.range(n * n)
        .select(
            (F.col("id") / n).cast("long").alias("src"),
            F.pmod(F.col("id"), F.lit(n)).cast("long").alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
    )
    pairs = (
        pairs.join(mem.select(F.col("id").alias("src"), F.col("block").alias("ba")), "src")
        .join(mem.select(F.col("id").alias("dst"), F.col("block").alias("bb")), "dst")
        .join(F.broadcast(aff), ["ba", "bb"])
    )
    u01 = (
        F.pmod(_u(F.xxhash64("src", "dst", F.lit(seed))), F.lit(1 << 40))
        / F.lit(float(1 << 40))
    )
    e = pairs.filter(u01 < F.col("p")).select(
        "src", "dst", F.lit(1.0).alias("weight")
    )
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=False, vertices=v)


def powerlaw_degree_sequence(
    spark: SparkSession,
    n: int,
    min_deg: int,
    max_deg: int,
    gamma: float = 2.5,
    seed: int = 42,
) -> DataFrame:
    """PowerlawDegreeSequence (generators/PowerlawDegreeSequence.cpp):
    degree ~ truncated Pareto with exponent `gamma` on [min_deg, max_deg]
    via inverse-CDF over a per-node seeded-hash uniform — the same column
    program lfr() uses internally, exposed as the reference's standalone
    helper. Returns (id, degree); feed .degree into havel_hakimi /
    edge_switching_markov_chain / chung_lu."""
    u01 = (
        F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(11))), F.lit(1 << 40))
        + F.lit(1.0)
    ) / F.lit(float((1 << 40) + 1))
    deg = F.least(
        F.lit(int(max_deg)),
        F.round(
            F.lit(int(min_deg)) * F.pow(F.lit(1.0) - u01, F.lit(-1.0 / (gamma - 1.0)))
        ).cast("long"),
    )
    return spark.range(n).select(F.col("id").cast("long"), deg.alias("degree"))


def pubweb(
    spark: SparkSession,
    n: int,
    num_dense_areas: int,
    neighborhood_radius: float,
    max_neighbors: int,
    seed: int = 42,
) -> GraphDF:
    """PubWebGenerator (generators/PubWebGenerator.cpp:44-160): dense
    circular areas on the unit torus hold ~n·a/(a+2) of the nodes
    (per-area count ∝ rad^1.5), the rest scatter uniformly; an edge
    appears iff BOTH endpoints rank the pair within their `max_neighbors`
    nearest candidates inside `neighborhood_radius` (the reference's
    eligibleEdges two-pass = mutual-kNN-within-radius), with
    weight = BASE_WEIGHT / d² (BASE_WEIGHT = 0.01, PubWebGenerator.hpp:68).

    Distributed shape: area metadata is driver-side (num_dense_areas
    rows), positions are column expressions, the candidate filter is the
    fixture-tier O(n²) torus join (cell-grid bucketing is the scale
    path), and the mutual-kNN cut is a rank window PARTITIONED by node —
    never a single-partition window."""
    import hashlib
    import math as _math

    def _h01(tag: str) -> float:
        h = int.from_bytes(
            hashlib.sha256(f"pubweb-{seed}-{tag}".encode()).digest()[:6], "big"
        )
        return (h + 0.5) / float(1 << 48)

    # ---- area metadata (driver-side: num_dense_areas rows)
    areas = []
    for a in range(num_dense_areas):
        rad = 0.2 * _h01(f"rad-{a}")  # MAX_DENSE_AREA_RADIUS = 0.2
        areas.append((a, _h01(f"x-{a}"), _h01(f"y-{a}"), rad))
    mass = sum(r**1.5 for _, _, _, r in areas) or 1.0
    dense_total = int(round(n * (num_dense_areas / (num_dense_areas + 2.0))))
    ranges, lo = [], 0
    for a, cx, cy, rad in areas:
        cnt = int(round(dense_total * (rad**1.5) / mass))
        cnt = min(cnt, n - lo)
        ranges.append((a, lo, lo + cnt, cx, cy, rad))
        lo += cnt
    area_df = F.broadcast(
        spark.createDataFrame(
            ranges, "area long, lo long, hi long, cx double, cy double, rad double"
        )
    )

    ids = spark.range(n).select(F.col("id").cast("long"))
    placed = ids.join(
        area_df, (F.col("id") >= F.col("lo")) & (F.col("id") < F.col("hi")), "left"
    )
    u1 = (
        F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(21))), F.lit(1 << 40))
        / F.lit(float(1 << 40))
    )
    u2 = (
        F.pmod(_u(F.xxhash64("id", F.lit(seed), F.lit(22))), F.lit(1 << 40))
        / F.lit(float(1 << 40))
    )
    angle = u1 * F.lit(2.0 * _math.pi)
    dist = u2 * F.col("rad")
    # into the unit square with the reference's single ±1 wrap
    def _wrap(z):
        return F.when(z > 1.0, z - 1.0).when(z < 0.0, z + 1.0).otherwise(z)

    pts = placed.select(
        "id",
        _wrap(
            F.coalesce(F.col("cx") + F.cos(angle) * dist, u1)
        ).alias("x"),
        _wrap(
            F.coalesce(F.col("cy") + F.sin(angle) * dist, u2)
        ).alias("y"),
    )

    a_side = pts.select(
        F.col("id").alias("src"), F.col("x").alias("x1"), F.col("y").alias("y1")
    )
    b_side = pts.select(
        F.col("id").alias("dst"), F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    dx = F.abs(F.col("x1") - F.col("x2"))
    dy = F.abs(F.col("y1") - F.col("y2"))
    tdx = F.least(dx, 1.0 - dx)
    tdy = F.least(dy, 1.0 - dy)
    d2 = tdx * tdx + tdy * tdy
    cand = (
        a_side.crossJoin(b_side)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", d2.alias("d2"))
        .filter(F.col("d2") <= F.lit(neighborhood_radius * neighborhood_radius))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("src").orderBy("d2", "dst")
    ranked = cand.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= F.lit(int(max_neighbors))
    )
    fwd = ranked.select("src", "dst", "d2")
    rev = ranked.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), F.col("d2").alias("d2r")
    )
    e = (
        fwd.join(rev.select("src", "dst"), ["src", "dst"])
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst", (F.lit(0.01) / F.col("d2")).alias("weight"))
    )
    return GraphDF.from_edges(e, directed=False, weighted=True, vertices=ids)


def edge_switching_markov_chain(
    spark: SparkSession,
    degree_sequence: list[int],
    rounds: int = 20,
    seed: int = 42,
) -> GraphDF:
    """EdgeSwitchingMarkovChainGenerator (generators/
    EdgeSwitchingMarkovChainGenerator.cpp:8-49): realize the degree
    sequence with Havel-Hakimi, then randomize by degree-preserving edge
    switches (u1,v1),(u2,v2) → (u1,v2),(u2,v1).

    The reference performs 10·m sequential switches; the distributed
    analog runs `rounds` parallel super-rounds: every round hash-shuffles
    the edges via the two-stage global rank, pairs edge 2i with 2i+1
    (pairwise-DISJOINT pairs, so accepted switches commute), proposes the
    hash-chosen orientation, and atomically reverts any pair whose new
    edges would self-loop, collide with a surviving edge, or collide with
    another pair's proposal — the same atomic-revert discipline as
    randomization._trade_round. Degree sequence is preserved exactly;
    lineage is truncated per round."""
    from networkit_spark.plans.ranking import global_row_numbers

    g0 = havel_hakimi(spark, degree_sequence)
    e = g0.E.select("src", "dst").localCheckpoint(eager=True)
    for r in range(rounds):
        h = e.withColumn(
            "h", F.xxhash64("src", "dst", F.lit(seed), F.lit(r))
        )
        rn = global_row_numbers(h, ["h", "src", "dst"], out_col="rn")
        rn = rn.withColumn("pid", (F.col("rn") / 2).cast("long")).withColumn(
            "side", F.pmod(F.col("rn"), F.lit(2))
        )
        left = rn.filter("side = 0").select(
            "pid",
            F.col("src").alias("u1"),
            F.col("dst").alias("v1"),
            F.col("h").alias("h1"),
        )
        right = rn.filter("side = 1").select(
            "pid", F.col("src").alias("u2"), F.col("dst").alias("v2")
        )
        pr = left.join(right, "pid")  # unpaired leftover edge drops out of pr
        # orientation bit: (u1,v2),(u2,v1) or (u1,u2),(v1,v2)
        flip = F.pmod(_u(F.col("h1")), F.lit(2)) == 0
        na1 = F.when(flip, F.col("v2")).otherwise(F.col("u2"))
        nb1 = F.when(flip, F.col("u2")).otherwise(F.col("v2"))
        prop = pr.select(
            "pid",
            "u1",
            "v1",
            "u2",
            "v2",
            F.least("u1", na1).alias("s1"),
            F.greatest("u1", na1).alias("t1"),
            F.least("v1", nb1).alias("s2"),
            F.greatest("v1", nb1).alias("t2"),
        )
        # reject self-loops and within-pair duplicate
        ok = prop.filter(
            (F.col("s1") != F.col("t1"))
            & (F.col("s2") != F.col("t2"))
            & ~((F.col("s1") == F.col("s2")) & (F.col("t1") == F.col("t2")))
        )
        # reject proposals colliding with ANY current edge (reference's
        # hasEdge check — conservative: includes edges being switched away)
        new_edges = ok.select("pid", F.col("s1").alias("src"), F.col("t1").alias("dst")).unionByName(
            ok.select("pid", F.col("s2").alias("src"), F.col("t2").alias("dst"))
        )
        clash_existing = new_edges.join(e, ["src", "dst"], "left_semi").select("pid")
        # reject cross-pair collisions on the same proposed edge
        clash_cross = (
            new_edges.groupBy("src", "dst")
            .agg(F.count("*").alias("c"), F.collect_list("pid").alias("pids"))
            .filter("c > 1")
            .select(F.explode("pids").alias("pid"))
        )
        bad = clash_existing.unionByName(clash_cross).distinct()
        acc = ok.join(bad, "pid", "left_anti")
        removed = acc.select(F.col("u1").alias("src"), F.col("v1").alias("dst")).unionByName(
            acc.select(F.col("u2").alias("src"), F.col("v2").alias("dst"))
        )
        added = acc.select(F.col("s1").alias("src"), F.col("t1").alias("dst")).unionByName(
            acc.select(F.col("s2").alias("src"), F.col("t2").alias("dst"))
        )
        e = (
            e.join(removed, ["src", "dst"], "left_anti")
            .unionByName(added)
            .localCheckpoint(eager=True)
        )
    v = spark.range(len(degree_sequence)).select(F.col("id").cast("long"))
    return GraphDF.from_edges(
        e.withColumn("weight", F.lit(1.0)), directed=False, vertices=v
    )
