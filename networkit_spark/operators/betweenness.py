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
    for _ in range(max_depth):
        f = frontier.select("source", "id", "sigma")
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
        nxt = nxt.join(visited, ["source", "id"], "left_anti").localCheckpoint(
            eager=True
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt.select("source", "id")).localCheckpoint(
            eager=True
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
    deepest = levels[-1].select(
        "source", "id", "sigma", F.lit(0.0).alias("delta")
    ).localCheckpoint(eager=True)
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
            .localCheckpoint(eager=True)
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
    out = levels[-1].select(
        "source", "id", "sigma", F.lit(0.0).alias("delta")
    ).localCheckpoint(eager=True)
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
            .localCheckpoint(eager=True)
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
    edges.unpersist()
    return out
