"""Betweenness centrality — distributed Brandes (SURVEY §2.4).

Reference: Betweenness.cpp:22-120 — per source s, an SSSP records dist and
σ (number of shortest paths), then dependencies are accumulated sweeping
nodes in decreasing distance:
    δ[p] += σ(p)/σ(t) · (1 + δ[t])      for p ∈ pred(t)   (:72-80)
    bc[t] += δ[t]  for t ≠ s            (:86-88)
Normalization divides by (n−1)(n−2) ordered pairs, halved for undirected
(:108-117). EstimateBetweenness.cpp:26-110 samples sources, adds a linear
distance-scaling factor dist(p)/dist(t) (:78) and extrapolates by
2n/nSamples (:105).

Spark shape — the whole thing is TWO level-synchronous sweeps over a
sorted-cache edge table, batched across ALL sources at once (state keyed
(source, node), like operators/bfs.py):
  forward:  frontier expansion carrying σ as a summed aggregate per level
  backward: per depth d (deepest first), join level-d nodes to their
            level-(d+1) successors' (σ, δ) and sum σ_u/σ_v·(1+δ_v)
Each level is localCheckpointed once and reused by the backward sweep —
no recomputation, no driver-side data beyond the level count. Exact
all-sources is O(n·n) state by nature; the scale path is
estimate_betweenness (sampled sources, same kernel).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def _forward_levels(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int,
    broadcast_frontier_threshold: int = 5_000_000,
) -> list[DataFrame]:
    """Batched multi-source BFS with path counting. Returns one DataFrame
    (source, id, sigma) per level; level d holds nodes at hop distance d
    with σ = #shortest s→node paths. Levels are checkpointed (reused by the
    backward sweep)."""
    lvl0 = sources.select(
        F.col("id").alias("source"), "id", F.lit(1.0).alias("sigma")
    ).localCheckpoint(eager=True)
    levels = [lvl0]
    visited = lvl0.select("source", "id").localCheckpoint(eager=True)
    frontier = lvl0
    fcount = None  # carried from the previous level's materializing count
    for _ in range(max_depth):
        f = frontier.select("source", "id", "sigma")
        if fcount is None:
            fcount = f.count()
        if fcount == 0:
            break
        if fcount <= broadcast_frontier_threshold:
            f = F.broadcast(f)
        nxt = (
            edges.join(f, edges.src == f.id)
            .groupBy("source", F.col("dst").alias("nid"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("nid", "id")
        )
        # lazy plan break: ONE count job per level both truncates lineage
        # and carries the next iteration's frontier size (the single-job
        # superstep pattern — see BENCH/BASELINE.md; eager checkpoints here
        # cost a second full job per level)
        nxt = nxt.join(visited, ["source", "id"], "left_anti").localCheckpoint(
            eager=False
        )
        fcount = nxt.count()
        if fcount == 0:
            break
        # materializes inside the NEXT level's anti-join/count job
        visited = visited.unionByName(nxt.select("source", "id")).localCheckpoint(
            eager=False
        )
        levels.append(nxt)
        frontier = nxt
    return levels


def _dependency_sweep(
    edges: DataFrame, levels: list[DataFrame]
) -> DataFrame:
    """Backward accumulation. Returns (source, id, delta) over all visited
    (source, node) pairs. δ at the deepest level is 0; at depth d,
    δ[u] = Σ_{(u,v)∈E, dist(v)=d+1} σ_u/σ_v · (1 + δ_v)."""
    # Every checkpoint below is LAZY: the plan break is immediate, and the
    # whole backward sweep materializes in the ONE job the caller's final
    # aggregation launches — each level's RDD computes once there and is
    # shared by its two consumers (the union and the next level's join).
    deepest = levels[-1].select(
        "source", "id", "sigma", F.lit(0.0).alias("delta")
    ).localCheckpoint(eager=False)
    out = deepest
    below = deepest  # (source, id, sigma, delta) at depth d+1
    for lvl in reversed(levels[:-1]):
        succ = below.select(
            F.col("source").alias("s_source"),
            F.col("id").alias("s_id"),
            F.col("sigma").alias("s_sigma"),
            F.col("delta").alias("s_delta"),
        )
        dep = (
            lvl.join(edges, lvl.id == edges.src)
            .join(
                succ,
                (F.col("source") == F.col("s_source"))
                & (F.col("dst") == F.col("s_id")),
            )
            .groupBy("source", "id")
            .agg(
                F.sum(
                    F.col("sigma") / F.col("s_sigma") * (F.lit(1.0) + F.col("s_delta"))
                ).alias("dep")
            )
        )
        cur = (
            lvl.join(dep, ["source", "id"], "left")
            .select(
                "source", "id", "sigma", F.coalesce("dep", F.lit(0.0)).alias("delta")
            )
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(cur)
        below = cur
    return out.select("source", "id", "delta")


def betweenness(
    graph: GraphDF,
    sources: DataFrame | None = None,
    normalized: bool = False,
    max_depth: int = 10_000,
) -> DataFrame:
    """(id: long, score: double) — exact Brandes when sources is None
    (all nodes), else partial sums over the given sources DataFrame(id).

    Matches Betweenness.cpp raw scores exactly: ordered (s,t) pairs, so an
    undirected pair contributes from both endpoints-as-sources (the golden
    six-node graph of CentralityGTest.cpp:67-95 scores bc[2]=15). Hop-count
    shortest paths (unweighted BFS, like the reference's BFS mode)."""
    e = graph.E if graph.directed else graph.E_sym
    edges = e.select("src", "dst").distinct()
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    edges.count()
    srcs = (sources if sources is not None else graph.V).select("id")

    levels = _forward_levels(edges, srcs, max_depth)
    delta = _dependency_sweep(edges, levels)
    bc = (
        delta.filter(F.col("source") != F.col("id"))
        .groupBy("id")
        .agg(F.sum("delta").alias("score"))
    )
    out = graph.V.join(bc, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    if normalized:
        n = graph.number_of_nodes()
        pairs = (n - 1) * (n - 2)
        if not graph.directed:
            pairs = pairs / 2
        out = out.select("id", (F.col("score") / F.lit(float(max(pairs, 1)))).alias("score"))
    # the ONE job that runs the whole lazy backward sweep — must precede
    # the edge-cache release
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    return out


def betweenness_fixed(
    graph: GraphDF, max_depth: int, normalized: bool = False
) -> DataFrame:
    """Fixed-depth variant (SQL-oracle parity): exact as long as max_depth ≥
    the graph's diameter — extra levels are empty and contribute nothing."""
    return betweenness(graph, normalized=normalized, max_depth=max_depth)


def estimate_betweenness(
    graph: GraphDF,
    n_samples: int,
    seed: int = 42,
    normalized: bool = False,
    max_depth: int = 10_000,
    sampler: str = "hash",
) -> DataFrame:
    """EstimateBetweenness.cpp:26-110 — sampled-source approximation, the
    100-TB-scale path: state is O(nSamples·n), not O(n²).

    Per the reference: the dependency recursion carries the linear
    distance-scaling factor dist(p)/dist(t) (:78) and scores extrapolate by
    2n/nSamples (:105). Sampling here is seeded (deterministic), without
    replacement (the reference samples with replacement from its RNG; the
    estimator is the same). sampler="hash" uses xxhash64 keys;
    sampler="lcg" uses the cross-engine LCG so a DuckDB oracle can
    reproduce the exact sample set."""
    e = graph.E if graph.directed else graph.E_sym
    edges = e.select("src", "dst").distinct()
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    edges.count()
    pick = graph.random_nodes_lcg if sampler == "lcg" else graph.random_nodes
    srcs = pick(n_samples, seed).select("id")

    levels = _forward_levels(edges, srcs, max_depth)
    # backward sweep with the dist(p)/dist(t) factor: at depth d the factor
    # is d/(d+1)
    deepest_d = len(levels) - 1
    # lazy plan breaks — the whole backward sweep rides the final score
    # aggregation's single job (see _dependency_sweep)
    out = levels[-1].select(
        "source", "id", "sigma", F.lit(0.0).alias("delta")
    ).localCheckpoint(eager=False)
    below = out
    acc = out.select("source", "id", "delta")
    for d in range(deepest_d - 1, -1, -1):
        lvl = levels[d]
        factor = float(d) / float(d + 1)
        succ = below.select(
            F.col("source").alias("s_source"),
            F.col("id").alias("s_id"),
            F.col("sigma").alias("s_sigma"),
            F.col("delta").alias("s_delta"),
        )
        dep = (
            lvl.join(edges, lvl.id == edges.src)
            .join(
                succ,
                (F.col("source") == F.col("s_source"))
                & (F.col("dst") == F.col("s_id")),
            )
            .groupBy("source", "id")
            .agg(
                F.sum(
                    F.lit(factor)
                    * F.col("sigma")
                    / F.col("s_sigma")
                    * (F.lit(1.0) + F.col("s_delta"))
                ).alias("dep")
            )
        )
        cur = (
            lvl.join(dep, ["source", "id"], "left")
            .select(
                "source", "id", "sigma", F.coalesce("dep", F.lit(0.0)).alias("delta")
            )
            .localCheckpoint(eager=False)
        )
        acc = acc.unionByName(cur.select("source", "id", "delta"))
        below = cur

    n = graph.number_of_nodes()
    scale = 2.0 * n / float(max(n_samples, 1))
    bc = (
        acc.filter(F.col("source") != F.col("id"))
        .groupBy("id")
        .agg((F.sum("delta") * F.lit(scale)).alias("score"))
    )
    out = graph.V.join(bc, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )
    if normalized:
        pairs = (n - 1) * (n - 2)
        if not graph.directed:
            pairs = pairs / 2
        out = out.select("id", (F.col("score") / F.lit(float(max(pairs, 1)))).alias("score"))
    # the ONE job that runs the whole lazy backward sweep — must precede
    # the edge-cache release
    out = out.localCheckpoint(eager=True)
    edges.unpersist()
    return out


def approx_betweenness(
    graph: GraphDF,
    epsilon: float = 0.1,
    delta: float = 0.1,
    universal_constant: float = 1.0,
    seed: int = 42,
    n_samples: int | None = None,
    max_depth: int = 10_000,
    return_internals: bool = False,
) -> DataFrame:
    """ApproxBetweenness (centrality/ApproxBetweenness.cpp:30-110) — the
    Riondato-Kornaropoulos path-sampling estimator: r = ⌈(c/ε²)(⌊log₂(VD−2)⌋
    + 1 − ln δ)⌉ sampled (u,v) pairs; for each, ONE uniformly random
    shortest u→v path is drawn by walking back from v choosing each
    predecessor z with probability σ(z)/σ(t) (:79-88), and every internal
    node of the path gains 1/r. E[score(w)] = fraction of node pairs whose
    shortest path passes through w (absolute ε-approximation w.p. 1−δ).

    Spark shape: one batched multi-source BFS keyed by SAMPLE index (a
    sample's search stops at the level its target appears — the
    reference's target-pruned BFS), then a backward walk where all r path
    heads advance one level per superstep; the σ-weighted choice is a
    cumulative-sum cut inside a window PARTITIONED by sample (never
    single-partition). State: O(r · reached), supersteps: O(diameter).
    Deterministic: pair sampling and every path choice are seeded hashes."""
    import math

    from networkit_spark.operators.bfs import diameter_lower_bound

    spark = graph.V.sparkSession
    n = graph.number_of_nodes()
    zeros = graph.V.select("id", F.lit(0.0).alias("score"))
    empty_inc = spark.createDataFrame([], "sample long, node long")
    if n < 3:
        return empty_inc if return_internals else zeros
    if n_samples is None:
        vd = diameter_lower_bound(graph, num_samples=8, seed=seed)
        if vd <= 2:
            # reference: trivial diameter => all-zero scores
            return empty_inc if return_internals else zeros
        r = int(
            math.ceil(
                (universal_constant / (epsilon * epsilon))
                * (math.floor(math.log2(vd - 2)) + 1 - math.log(delta))
            )
        )
    else:
        r = int(n_samples)
    r = max(r, 1)

    pairs = sample_pairs(graph, r, seed)
    inc, _found = sample_path_increments(graph, pairs, seed, max_depth)
    if return_internals:
        return inc
    score = inc.groupBy(F.col("node").alias("id")).agg(
        (F.count("*") / F.lit(float(r))).alias("score")
    )
    return graph.V.join(score, "id", "left").select(
        "id", F.coalesce("score", F.lit(0.0)).alias("score")
    )


def sample_pairs(graph: GraphDF, r: int, seed: int) -> DataFrame:
    """r seeded (sample, u, v) node pairs, u ≠ v, drawn WITH replacement
    (ApproxBetweenness.cpp:60-66's uniform pair draws): node-by-rank lookup
    against a hash-shuffled V. Pure function of (V, r, seed) — edge events
    never change it, which is what lets DynApproxBetweenness keep its pair
    set across updates and still match a fresh approx_betweenness run."""
    from networkit_spark.plans.ranking import global_row_numbers

    spark = graph.V.sparkSession
    n = graph.number_of_nodes()
    ranked = global_row_numbers(
        graph.V.select("id").withColumn("h", F.xxhash64("id", F.lit(seed))),
        ["h", "id"],
        out_col="rk",
    ).select("rk", "id")
    samples = spark.range(r).select(F.col("id").alias("sample"))
    ui = F.pmod(F.abs(F.xxhash64("sample", F.lit(seed), F.lit(1))), F.lit(n))
    vi_raw = F.pmod(F.abs(F.xxhash64("sample", F.lit(seed), F.lit(2))), F.lit(n - 1))
    pairs = samples.select(
        "sample",
        ui.alias("ui"),
        # shift the target index past the source index: guarantees v != u
        F.when(vi_raw >= ui, vi_raw + 1).otherwise(vi_raw).alias("vi"),
    )
    return (
        pairs.join(ranked.select(F.col("rk").alias("ui"), F.col("id").alias("u")), "ui")
        .join(ranked.select(F.col("rk").alias("vi"), F.col("id").alias("v")), "vi")
        .select("sample", "u", "v")
        .localCheckpoint(eager=True)
    )


def per_source_dependencies(
    graph: GraphDF,
    node: int,
    sources: DataFrame | None = None,
    max_depth: int = 10_000,
) -> DataFrame:
    """(source, dep) — the Brandes dependency δ_s(node) of ONE tracked node
    for each source s ≠ node (Betweenness.cpp:72-88 read off at a single
    node). Sources whose BFS never reaches `node` are absent (δ = 0).
    DynBetweennessOneNode's repair path re-sweeps ONLY affected sources
    through this, so the per-update cost is |affected| · O(diameter)
    supersteps, never the full |V| sweep."""
    e = graph.E if graph.directed else graph.E_sym
    edges = e.select("src", "dst").distinct()
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    edges.count()
    srcs = (sources if sources is not None else graph.V).select("id")
    levels = _forward_levels(edges, srcs, max_depth)
    delta = _dependency_sweep(edges, levels)
    out = (
        delta.filter((F.col("id") == node) & (F.col("source") != node))
        .select("source", F.col("delta").alias("dep"))
        .localCheckpoint(eager=True)
    )
    edges.unpersist()
    return out


def sample_path_increments(
    graph: GraphDF,
    pairs: DataFrame,
    seed: int,
    max_depth: int = 10_000,
) -> tuple[DataFrame, DataFrame]:
    """The Riondato–Kornaropoulos path sampler shared by approx_betweenness
    and DynApproxBetweenness: for each (sample, u, v) row of `pairs`, draw
    ONE uniformly random shortest u→v path (σ-weighted backward walk,
    ApproxBetweenness.cpp:79-88) with every random choice a seeded hash of
    (sample, depth) — so a sample's path depends ONLY on its own shortest-
    path DAG, never on which other samples run alongside it. That per-
    sample determinism is what lets the Dyn tier re-sample just the
    affected pairs and still match a full run bit-for-bit.

    Returns (inc, found): inc = (sample, node) one row per internal node of
    each sampled path; found = (sample, tdepth) the u→v hop distance for
    every connected pair (unreached pairs absent)."""
    from pyspark.sql import Window

    spark = graph.V.sparkSession
    empty_inc = spark.createDataFrame([], "sample long, node long")
    empty_found = spark.createDataFrame([], "sample long, tdepth int")
    if pairs.isEmpty():
        return empty_inc, empty_found

    e = graph.E if graph.directed else graph.E_sym
    edges = e.select("src", "dst").distinct()
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    edges.count()

    # ---- forward: per-sample BFS with σ counting, pruned at the target
    lvl0 = pairs.select("sample", F.col("u").alias("id"), F.lit(1.0).alias("sigma"))
    lvl0 = lvl0.localCheckpoint(eager=True)
    levels = [lvl0]
    visited = lvl0.select("sample", "id").localCheckpoint(eager=True)
    targets = pairs.select("sample", F.col("v").alias("tid"))
    # (sample, depth at which the target was reached)
    found = (
        lvl0.join(
            targets, (lvl0["sample"] == targets["sample"]) & (lvl0.id == targets.tid)
        ).select(lvl0["sample"], F.lit(0).alias("tdepth"))
    )
    found = found.limit(0).localCheckpoint(eager=True)  # u != v at depth 0
    frontier = lvl0
    for d in range(1, max_depth + 1):
        fr = frontier.join(found, "sample", "left_anti")
        if fr.count() == 0:
            break
        f = F.broadcast(fr.select("sample", "id", "sigma"))
        nxt = (
            edges.join(f, edges.src == f.id)
            .groupBy("sample", F.col("dst").alias("nid"))
            .agg(F.sum("sigma").alias("sigma"))
            .withColumnRenamed("nid", "id")
        )
        nxt = nxt.join(visited, ["sample", "id"], "left_anti").localCheckpoint(
            eager=True
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt.select("sample", "id")).localCheckpoint(
            eager=True
        )
        hit = (
            nxt.join(
                targets, (nxt["sample"] == targets["sample"]) & (nxt.id == targets.tid)
            ).select(nxt["sample"], F.lit(d).alias("tdepth"))
        )
        found = found.unionByName(hit).localCheckpoint(eager=True)
        levels.append(nxt)
        frontier = nxt

    # ---- backward: every found sample walks one random shortest path
    # v → u; heads advance one level per superstep
    heads = (
        found.join(pairs, "sample")
        .select("sample", F.col("v").alias("node"), F.col("tdepth").alias("depth"))
        .localCheckpoint(eager=True)
    )
    increments = []
    max_d = len(levels) - 1
    for d in range(max_d, 0, -1):
        act = heads.filter(F.col("depth") == d)
        if act.isEmpty():
            continue
        act_b = F.broadcast(act.select("sample", "node"))
        # predecessors: level d-1 nodes with an edge into the head
        cand = (
            levels[d - 1]
            .join(
                act_b.withColumnRenamed("node", "hnode"),
                "sample",
            )
            .join(
                edges,
                (F.col("id") == edges.src) & (F.col("hnode") == edges.dst),
            )
            .select("sample", "id", "sigma")
        )
        w = Window.partitionBy("sample").orderBy("id")
        tot = Window.partitionBy("sample")
        u01 = (
            F.pmod(
                F.abs(F.xxhash64("sample", F.lit(seed), F.lit(100 + d))),
                F.lit(1 << 40),
            )
            / F.lit(float(1 << 40))
        )
        picked = (
            cand.withColumn("cum", F.sum("sigma").over(w))
            .withColumn("tots", F.sum("sigma").over(tot))
            .withColumn("thr", u01 * F.col("tots"))
            .filter(F.col("cum") > F.col("thr"))
            .withColumn("pick_rk", F.row_number().over(w))
            .filter(F.col("pick_rk") == 1)
            .select("sample", F.col("id").alias("node"), F.lit(d - 1).alias("depth"))
            .localCheckpoint(eager=True)
        )
        if d - 1 > 0:  # internal node (not the source u): score it
            increments.append(picked.select("sample", "node"))
        heads = heads.filter(F.col("depth") != d).unionByName(picked).localCheckpoint(
            eager=True
        )

    edges.unpersist()
    if not increments:
        return empty_inc, found
    inc = increments[0]
    for more in increments[1:]:
        inc = inc.unionByName(more)
    return inc.localCheckpoint(eager=True), found


def approx_group_betweenness(
    graph: GraphDF,
    group_size: int,
    epsilon: float = 0.5,
    seed: int = 42,
    n_samples: int | None = None,
) -> list[int]:
    """ApproxGroupBetweenness (centrality/ApproxGroupBetweenness.cpp:37-137,
    Mahmoody–Tsourakakis–Upfal): sample groupSize·ln(n)/ε² (s,t) pairs
    (:42), draw ONE random shortest path each, form a hyperedge from its
    internal nodes, then greedily pick the k nodes covering the most
    still-uncovered hyperedges.

    Path sampling reuses approx_betweenness's batched machinery (all
    samples BFS + walk back in shared supersteps) — our walk is σ-weighted,
    i.e. properly uniform over shortest paths, where the reference's
    uniform-predecessor walk is only approximately so (:72-76, documented
    divergence). The greedy cover is one groupBy per pick with the
    still-uncovered hyperedges anti-joined out; min-id tie-break."""
    n = graph.number_of_nodes()
    if graph.directed:
        raise ValueError("the graph must be undirected (ApproxGroupBetweenness.cpp:24-26)")
    if group_size <= 0 or group_size >= max(n, 1):
        raise ValueError("the group size must be between 1 and n-1 (:27-30)")
    if epsilon <= 0:
        raise ValueError("epsilon must be greater than 0 (:31-33)")
    import math as _math

    if n_samples is None:
        n_samples = max(
            1, int(group_size * _math.log(max(n, 2)) / (epsilon * epsilon))
        )
    inc = approx_betweenness(
        graph, seed=seed, n_samples=n_samples, return_internals=True
    ).persist()
    inc.count()
    spark = graph.V.sparkSession
    group: list[int] = []
    covered = spark.createDataFrame([], "sample long")
    for _ in range(group_size):
        rem = inc.join(F.broadcast(covered), "sample", "left_anti")
        if group:
            rem = rem.filter(~F.col("node").isin(group))
        gains = rem.groupBy("node").agg(
            F.countDistinct("sample").alias("gain")
        )
        top = gains.orderBy(F.desc("gain"), F.asc("node")).limit(1).collect()
        if not top:
            # hyperedges exhausted: fill with smallest unused ids
            # (reference keeps extracting zero-degree PQ entries)
            rest = (
                graph.V.filter(~F.col("id").isin(group) if group else F.lit(True))
                .orderBy("id")
                .limit(group_size - len(group))
                .collect()
            )
            group.extend(int(r["id"]) for r in rest)
            break
        u = int(top[0]["node"])
        group.append(u)
        covered = covered.unionByName(
            inc.filter(F.col("node") == u).select("sample").distinct()
        ).localCheckpoint(eager=True)
    inc.unpersist()
    return group


def kadabra_betweenness(
    graph: GraphDF,
    err: float = 0.05,
    delta: float = 0.1,
    seed: int = 42,
    batch_size: int | None = None,
    max_batches: int = 64,
) -> DataFrame:
    """KadabraBetweenness (centrality/KadabraBetweenness.cpp, Borassi–
    Natale ADaptive sampling): draw shortest-path samples in batches and
    STOP when the empirical Bernstein confidence radius of every node's
    betweenness estimate drops below `err` (w.p. ≥ 1−delta) — adaptive,
    where ApproxBetweenness fixes the sample count a priori from the
    worst-case VD bound.

    Spark shape: each batch reuses approx_betweenness's batched sampler
    (all paths of a batch BFS + walk back in shared supersteps, fresh seed
    per batch, with-replacement pair draws like the reference); per-node
    appearance counts accumulate in a running (id, c) table (checkpointed
    per batch), and the stopping rule is ONE aggregate over it:

        rad(v) = sqrt(2·b̃(1−b̃)·L/r) + 7·L/(3·(r−1)),  L = ln(4n/(delta))

    (the two-sided empirical-Bernstein radius the reference's computeF/G
    bounds specialize, KadabraBetweenness.cpp:96-116 — each sample touches
    a node at most once since sampled paths are simple, so per-sample
    scores are Bernoulli). Returns (id, score) with score = b̃(v), the
    fraction of node pairs whose shortest path crosses v."""
    import math as _math

    spark = graph.V.sparkSession
    n = graph.number_of_nodes()
    if n < 3:
        return graph.V.select("id", F.lit(0.0).alias("score"))
    if batch_size is None:
        batch_size = max(64, int(_math.log(max(n, 2)) / (err * err) / 8))
    big_l = _math.log(4.0 * n / delta)
    counts = spark.createDataFrame([], "node long, c long")
    r = 0
    for b in range(max_batches):
        inc = approx_betweenness(
            graph,
            seed=seed + 7919 * b,
            n_samples=batch_size,
            return_internals=True,
        )
        binc = inc.groupBy("node").agg(F.count("*").alias("c"))
        counts = (
            counts.unionByName(binc)
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
            .localCheckpoint(eager=True)
        )
        r += batch_size
        if r < 2:
            continue
        # stopping rule: ONE aggregate — max radius over nodes with c>0;
        # zero-count nodes have b̃=0, their radius is the additive term only
        tail = 7.0 * big_l / (3.0 * (r - 1))
        row = counts.select(
            (
                F.sqrt(
                    F.lit(2.0 * big_l / r)
                    * (F.col("c") / r)
                    * (1.0 - F.col("c") / r)
                )
                + F.lit(tail)
            ).alias("rad")
        ).agg(F.max("rad")).collect()[0]
        max_rad = max(float(row[0] or 0.0), tail)
        if max_rad <= err:
            break
    return graph.V.join(
        counts.select(F.col("node").alias("id"), "c"), "id", "left"
    ).select(
        "id",
        (F.coalesce("c", F.lit(0)) / F.lit(float(r))).alias("score"),
    )
