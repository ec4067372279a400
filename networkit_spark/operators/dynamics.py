"""Dynamic algorithms — true incremental maintenance under event batches
(SURVEY §2.4/§2.5).

The reference's Dyn* algorithms (DynBFS/DynDijkstra/DynSSSP
distance/Dyn*.cpp, DynConnectedComponents components/Dyn*.cpp,
DynKatzCentrality centrality/DynKatzCentrality.cpp) maintain results under
GraphEvent updates with work proportional to the AFFECTED set, not the
graph. The Spark mapping, per kernel:

  * distances (DynBFS.cpp:47-60 / DynDijkstra): edge additions only
    shrink distances, so the update seeds a frontier from the inserted
    edges' improved endpoints and relaxes supersteps until no row
    improves — state is the affected ball, never |V|
    (incremental_sssp_additions).
  * connected components (DynConnectedComponents.cpp addEdge): merge on
    the CONTRACTED component graph (incremental_wcc_additions).
  * triangle counts: batch delta-counting — each new edge's wedges are
    counted in the updated graph with inclusion–exclusion weights 1/k
    (k = new edges in the triangle), the Makkar–Bader–Green batch rule,
    so concurrent insertions are never double-counted
    (incremental_triangle_additions / _removals).
  * fixpoint centralities (PageRank / Katz): the previous score vector
    warm-starts the next solve — after a small delta the iteration
    starts next to the new fixpoint and converges in O(1) supersteps,
    the distributed analog of the reference's bound-refresh loop.

The Dyn* classes route each event micro-batch to the incremental path
when the batch shape allows it (pure edge additions / removals) and fall
back to the warm-started full solve otherwise — same contract as the
reference, which also rebuilds on unsupported event types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF
from networkit_spark.streaming.events import apply_events


def _batch_edge_types(events: DataFrame) -> set[str]:
    """Distinct non-TIME_STEP event types in the batch — ≤7 metadata rows."""
    return {
        r["type"]
        for r in events.select("type").distinct().collect()
        if r["type"] != "TIME_STEP"
    }


def _canonical_batch_edges(
    events: DataFrame, etype: str, directed: bool
) -> DataFrame:
    """(src, dst[, weight]) rows of one edge-event class, canonicalized."""
    ev = events.filter(F.col("type") == etype)
    src = F.col("u") if directed else F.least("u", "v")
    dst = F.col("v") if directed else F.greatest("u", "v")
    return ev.select(
        src.alias("src"), dst.alias("dst"),
        F.coalesce("w", F.lit(1.0)).alias("weight"),
    ).distinct()


class DynAlgorithm:
    """Base: holds the current graph + result. update(events) folds the
    batch, then routes to the kernel's incremental path when the batch
    shape supports it (_update_incremental returns True) and otherwise
    re-solves — warm-started where the kernel supports it (the same
    fallback contract as the reference's Dyn* updateBatch, which throws
    or rebuilds on unsupported event types)."""

    def __init__(self, graph: GraphDF):
        self.graph = graph
        self.result: DataFrame | None = None
        self._solve()

    def _solve(self) -> None:
        raise NotImplementedError

    def _update_incremental(
        self, old_graph: GraphDF, events: DataFrame, types: set[str]
    ) -> bool:
        """Attempt an O(affected) update; return False to fall back to
        _solve(). Called AFTER the fold (self.graph is the new state)."""
        return False

    def update(self, events: DataFrame) -> DataFrame:
        old_graph = self.graph
        self.graph = apply_events(self.graph, events)
        # pin the folded state: event-fold lineage must not accumulate —
        # stats-safe, because each fold joins the previous batch's
        # checkpointed tables, so a bare checkpoint would compound the
        # multiplied sizeInBytes estimate across update batches
        # (CLAUDE.md rule 16)
        from networkit_spark.plans.checkpoint import stats_safe_checkpoint

        self.graph = GraphDF(
            stats_safe_checkpoint(self.graph.V),
            stats_safe_checkpoint(self.graph.E),
            directed=self.graph.directed,
            weighted=self.graph.weighted,
        )
        types = _batch_edge_types(events)
        if not self._update_incremental(old_graph, events, types):
            self._solve()
        return self.result


class DynPageRank(DynAlgorithm):
    """Every update is warm-started from the previous score vector
    (pagerank(init_scores=...)) — the fixpoint is init-invariant, so a
    small delta converges in O(1) supersteps instead of the cold-start
    O(log(1/tol)/log(1/damping))."""

    def __init__(self, graph: GraphDF, damping: float = 0.85, tol: float = 1e-8):
        self.damping = damping
        self.tol = tol
        super().__init__(graph)

    def _solve(self, init: DataFrame | None = None) -> None:
        from networkit_spark.operators.pagerank import pagerank

        self.result = pagerank(
            self.graph, damping=self.damping, tol=self.tol, init_scores=init
        ).localCheckpoint(eager=True)

    def _update_incremental(self, old_graph, events, types) -> bool:
        self._solve(init=self.result)
        return True


class DynConnectedComponents(DynAlgorithm):
    """Addition-only batches merge on the CONTRACTED component graph
    (incremental_wcc_additions — O(#touched components) state, the
    DynConnectedComponents.cpp addEdge path); removal-only batches
    re-derive connectivity inside the touched components only
    (incremental_wcc_removals, the removeEdge split check); mixed or
    node-event batches recompute."""

    def _solve(self) -> None:
        from networkit_spark.operators.components import (
            connected_components,
            weakly_connected_components,
        )

        fn = (
            weakly_connected_components
            if self.graph.directed
            else connected_components
        )
        self.result = fn(self.graph).localCheckpoint(eager=True)

    def _update_incremental(self, old_graph, events, types) -> bool:
        weight_only = {"EDGE_WEIGHT_UPDATE", "EDGE_WEIGHT_INCREMENT"}
        if types <= weight_only:
            return True  # weight-only batch: components unchanged
        if types <= ({"EDGE_ADDITION"} | weight_only):
            new_edges = _canonical_batch_edges(
                events, "EDGE_ADDITION", self.graph.directed
            )
            self.result = incremental_wcc_additions(
                self.result, new_edges
            ).localCheckpoint(eager=True)
            return True
        if types <= ({"EDGE_REMOVAL"} | weight_only):
            removed = _canonical_batch_edges(
                events, "EDGE_REMOVAL", self.graph.directed
            )
            self.result = incremental_wcc_removals(
                self.result, self.graph, removed
            ).localCheckpoint(eager=True)
            return True
        return False


class DynTriangleCount(DynAlgorithm):
    """Pure-insert batches delta-count through the new adjacency, pure
    -delete batches through the old (1/k inclusion–exclusion, see
    _triangle_batch_delta); mixed/node batches recompute."""

    def _solve(self) -> None:
        from networkit_spark.operators.triangles import triangle_counts

        self.result = triangle_counts(self.graph).localCheckpoint(eager=True)

    def _update_incremental(self, old_graph, events, types) -> bool:
        weight_only = {"EDGE_WEIGHT_UPDATE", "EDGE_WEIGHT_INCREMENT"}
        if types <= weight_only:
            return True  # weights don't change the triangle structure
        if self.graph.directed:
            # an addition (u,v) with (v,u) already present is NOT a new
            # undirected edge; the canonical-key novelty check below can't
            # see that, so directed graphs take the recompute path
            return False
        old_e = old_graph.E.select("src", "dst")
        if types <= ({"EDGE_ADDITION", "NODE_ADDITION"} | weight_only):
            # only edges that did NOT already exist create triangles
            batch = _canonical_batch_edges(
                events, "EDGE_ADDITION", self.graph.directed
            ).join(old_e, ["src", "dst"], "left_anti")
            self.result = incremental_triangle_additions(
                self.result, self.graph, batch
            ).localCheckpoint(eager=True)
            return True
        if types <= ({"EDGE_REMOVAL"} | weight_only):
            # only edges that DID exist destroy triangles
            batch = _canonical_batch_edges(
                events, "EDGE_REMOVAL", self.graph.directed
            ).join(old_e, ["src", "dst"], "left_semi")
            self.result = incremental_triangle_removals(
                self.result, old_graph, batch
            ).localCheckpoint(eager=True)
            return True
        return False


class DynKatzCentrality(DynAlgorithm):
    def __init__(
        self, graph: GraphDF, alpha: float = 5e-4, beta: float = 0.1,
        tol: float = 1e-8,
    ):
        self.alpha, self.beta, self.tol = alpha, beta, tol
        super().__init__(graph)

    def _solve(self) -> None:
        from networkit_spark.operators.centrality import katz_centrality

        self.result = katz_centrality(
            self.graph, alpha=self.alpha, beta=self.beta, tol=self.tol
        ).localCheckpoint(eager=True)


class DynBFS(DynAlgorithm):
    """DynBFS (distance/DynBFS.cpp): single- or multi-source hop distances
    maintained under edge additions via affected-frontier relaxation
    (incremental_sssp_additions); other event types re-run the batched
    BFS. result: (source, id, dist), unreached omitted."""

    _weighted = False

    def __init__(self, graph: GraphDF, sources: list[int]):
        self.sources = list(sources)
        super().__init__(graph)

    def _solve(self) -> None:
        from networkit_spark.operators.bfs import (
            bfs_distances,
            sssp_multi_distances,
        )

        if self._weighted:
            self.result = sssp_multi_distances(
                self.graph, self.sources
            ).localCheckpoint(eager=True)
        else:
            self.result = bfs_distances(
                self.graph, self.sources
            ).localCheckpoint(eager=True)

    def _update_incremental(self, old_graph, events, types) -> bool:
        allowed = {"EDGE_ADDITION"} if self._weighted else {"EDGE_ADDITION"}
        if not types <= allowed:
            return False
        new_edges = _canonical_batch_edges(
            events, "EDGE_ADDITION", self.graph.directed
        )
        self.result = incremental_sssp_additions(
            self.result, self.graph, new_edges, weighted=self._weighted
        ).localCheckpoint(eager=True)
        return True


class DynDijkstra(DynBFS):
    """DynDijkstra (distance/DynDijkstra.cpp): weighted distances, same
    affected-set addition updates (weights must be positive)."""

    _weighted = True


class DynAPSP(DynBFS):
    """DynAPSP (distance/DynAPSP.cpp:30-41 runs one SSSP per node; its
    update relaxes only affected pairs): here APSP IS the multi-source
    batched BFS/SSSP with sources = V (operators/bfs.py apsp), so the
    incremental addition update is the same affected-frontier relaxation
    keyed (source, node) — all sources repair in SHARED supersteps.
    O(n²/p) state by definition of the output; the per-update work is
    O(affected pairs), as in the reference."""

    def __init__(self, graph: GraphDF, weighted: bool | None = None):
        self._weighted = graph.weighted if weighted is None else weighted
        super(DynBFS, self).__init__(graph)

    def _solve(self) -> None:
        from networkit_spark.operators.bfs import (
            bfs_distances,
            sssp_multi_distances,
        )

        sources = self.graph.V.select("id")
        fn = sssp_multi_distances if self._weighted else bfs_distances
        self.result = fn(self.graph, sources).localCheckpoint(eager=True)

    def _update_incremental(self, old_graph, events, types) -> bool:
        if not types <= {"EDGE_ADDITION", "NODE_ADDITION"}:
            return False
        # a NEW node is a fresh source: seed its own zero row so the
        # relaxation grows its distance ball too
        new_nodes = self.graph.V.join(old_graph.V, "id", "left_anti")
        zero = F.lit(0.0) if self._weighted else F.lit(0).cast("long")
        self.result = self.result.unionByName(
            new_nodes.select(
                F.col("id").alias("source"), "id", zero.alias("dist")
            )
        )
        new_edges = _canonical_batch_edges(
            events, "EDGE_ADDITION", self.graph.directed
        )
        self.result = incremental_sssp_additions(
            self.result, self.graph, new_edges, weighted=self._weighted
        ).localCheckpoint(eager=True)
        return True


def incremental_wcc_additions(
    labels: DataFrame, new_edges: DataFrame, max_iterations: int = 50
) -> DataFrame:
    """DynConnectedComponents incremental ADDITION path
    (components/DynConnectedComponents.cpp addEdge: merge the two
    endpoints' components). TRUE incremental maintenance, not recompute:
    contract each new edge to its endpoints' current component labels and
    run hash-min + pointer jumping on that CONTRACTED graph — state is
    O(#touched components), not O(|V|), so a small delta batch costs a few
    tiny supersteps regardless of graph size (the only viable shape at
    10^12 edges under streaming updates).

    labels: (id, component) current result; new_edges: (src, dst).
    Returns the updated (id, component). Component ids keep the
    dense-rank-of-min-id contract by renumbering only if merges happened.
    """
    from networkit_spark.operators.components import (
        _hash_min_fixpoint,
        renumber_dense_by_min_id,
    )

    lab_src = labels.select(F.col("id").alias("src"), F.col("component").alias("ca"))
    lab_dst = labels.select(F.col("id").alias("dst"), F.col("component").alias("cb"))
    comp_edges = (
        new_edges.select("src", "dst")
        .join(lab_src, "src")
        .join(lab_dst, "dst")
        .select(F.col("ca").alias("src"), F.col("cb").alias("dst"))
        .filter("src != dst")
        .distinct()
    )
    if comp_edges.limit(1).count() == 0:
        return labels
    touched = (
        comp_edges.select(F.col("src").alias("id"))
        .union(comp_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    sym = comp_edges.unionByName(
        comp_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).withColumn("weight", F.lit(1.0))
    merged = _hash_min_fixpoint(sym, touched, max_iterations)
    remap = merged.select(
        F.col("id").alias("component"), F.col("label").alias("new_c")
    )
    updated = labels.join(F.broadcast(remap), "component", "left").select(
        "id",
        F.coalesce("new_c", "component").alias("label"),
    )
    return renumber_dense_by_min_id(updated)


def incremental_wcc_removals(
    labels: DataFrame,
    graph_new: GraphDF,
    removed_edges: DataFrame,
    max_iterations: int = 200,
) -> DataFrame:
    """DynConnectedComponents incremental REMOVAL path
    (components/DynConnectedComponents.cpp:118-152 removeEdge: a deleted
    edge can only SPLIT the component that contained it, so the reference
    re-checks reachability INSIDE that component). Distributed analog:
    re-derive connectivity only within the components touched by the
    batch — the hash-min fixpoint runs on O(Σ|affected components|)
    state, never |V|; untouched components pass through as single
    semi-/anti-join scans with no supersteps.

    labels: (id, component) BEFORE the batch; graph_new: the graph AFTER
    the removals; removed_edges: (src, dst). Returns the updated
    (id, component) under the dense-rank-of-min-id contract. Untouched
    components are re-keyed by their min node id (one aggregation pass)
    so new split components interleave into the dense ranking exactly
    where a cold recompute would place them.
    """
    from networkit_spark.operators.components import (
        _hash_min_fixpoint,
        renumber_dense_by_min_id,
    )

    ends = (
        removed_edges.select(F.col("src").alias("id"))
        .union(removed_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    # a delta batch touches few components: the affected set broadcasts
    affected = labels.join(ends, "id", "left_semi").select("component").distinct()
    sub_v = (
        labels.join(F.broadcast(affected), "component", "left_semi")
        .select("id")
        .persist()
    )
    if sub_v.limit(1).count() == 0:
        return labels
    # components are edge-closed: filtering src to the affected vertex set
    # keeps every intra-component edge (dst is in the same component)
    sub_e = (
        graph_new.E_sym.select("src", "dst")
        .filter("src != dst")
        .join(sub_v.withColumnRenamed("id", "src"), "src", "left_semi")
        .distinct()
        .withColumn("weight", F.lit(1.0))
    )
    relabeled = _hash_min_fixpoint(sub_e, sub_v, max_iterations)
    # untouched labels are dense component ids, relabeled ones are min
    # node ids — re-key the untouched side to min node ids so both sides
    # rank in one id space
    untouched = labels.join(F.broadcast(affected), "component", "left_anti")
    untouched_min = untouched.groupBy("component").agg(
        F.min("id").alias("label")
    )
    updated = (
        untouched.join(untouched_min, "component")
        .select("id", "label")
        .unionByName(relabeled.select("id", "label"))
    )
    out = renumber_dense_by_min_id(updated)
    sub_v.unpersist()
    return out


def incremental_sssp_additions(
    dist: DataFrame,
    graph_new: GraphDF,
    new_edges: DataFrame,
    weighted: bool = False,
    max_iterations: int = 10_000,
) -> DataFrame:
    """DynBFS / DynDijkstra incremental ADDITION update
    (distance/DynBFS.cpp:47-96, DynDijkstra.cpp — edge insertions only
    DECREASE distances, so the affected set is seeded from the inserted
    edges and grown by relaxation; untouched nodes never enter a
    superstep).

    dist: (source, id, dist) — the multi-source distance table BEFORE the
    batch (unreached pairs omitted, as bfs_distances emits). graph_new:
    the graph AFTER applying the batch. new_edges: (src, dst[, weight])
    rows of the inserted edges. Returns the updated (source, id, dist).

    State per superstep = the improved frontier only — the O(affected)
    contract of the reference, which is the only viable shape under
    streaming updates at 10^12 edges."""
    b = new_edges
    if "weight" not in b.columns:
        b = b.withColumn("weight", F.lit(1.0))
    b = b.select("src", "dst", "weight")
    if not graph_new.directed:
        b = b.unionByName(
            b.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
            )
        )

    adj = graph_new.E if graph_new.directed else graph_new.E_sym
    adj = adj.select("src", "dst", "weight")
    if not weighted:
        adj = adj.withColumn("weight", F.lit(1.0))
    adj = adj.repartition("src").sortWithinPartitions("src").persist()
    adj.count()

    # `total` stays UNTOUCHED until the end: the loop accumulates only the
    # affected rows (`acc`), so per-superstep checkpoints are O(affected),
    # never a rewrite of the full (possibly n²-row APSP) distance table —
    # the merge back is a single anti-join + union after convergence
    total = dist.select("source", "id", "dist").localCheckpoint(eager=True)

    def _improvements(cand: DataFrame, acc: DataFrame | None) -> DataFrame:
        """(source, id, dist) rows of `cand` strictly better than both the
        baseline `total` and the improvements accumulated so far."""
        best = cand.groupBy("source", "id").agg(F.min("nd").alias("nd"))
        j = best.join(
            total.select("source", "id", F.col("dist").alias("d_old")),
            ["source", "id"], "left",
        )
        if acc is not None:
            j = j.join(
                acc.select("source", "id", F.col("dist").alias("d_acc")),
                ["source", "id"], "left",
            )
        else:
            j = j.withColumn("d_acc", F.lit(None).cast("double"))
        cur = F.least("d_old", "d_acc")  # least() skips NULLs
        return j.filter(cur.isNull() | (F.col("nd") < cur)).select(
            "source", "id", F.col("nd").alias("dist")
        )

    # seed: sources that reach a new edge's tail improve its head
    seed_cand = (
        total.alias("d")
        .join(b.alias("b"), F.col("d.id") == F.col("b.src"))
        .select(
            "source",
            F.col("b.dst").alias("id"),
            (F.col("d.dist") + (F.col("b.weight").cast("double") if weighted
                                else F.lit(1))).alias("nd"),
        )
    )
    acc = _improvements(seed_cand, None).localCheckpoint(eager=True)
    frontier = acc

    it = 0
    while frontier.limit(1).count() > 0 and it < max_iterations:
        it += 1
        cand = (
            frontier.alias("f")
            .join(adj.alias("e"), F.col("f.id") == F.col("e.src"))
            .select(
                "source",
                F.col("e.dst").alias("id"),
                (F.col("f.dist") + (F.col("e.weight").cast("double")
                                    if weighted else F.lit(1))).alias("nd"),
            )
        )
        frontier = _improvements(cand, acc).localCheckpoint(eager=True)
        if frontier.limit(1).count() == 0:
            break
        acc = (
            acc.join(frontier.select("source", "id"), ["source", "id"],
                     "left_anti")
            .unionByName(frontier)
            .localCheckpoint(eager=True)
        )
    adj.unpersist()
    return (
        total.join(acc.select("source", "id"), ["source", "id"], "left_anti")
        .unionByName(acc)
    )


def _triangle_batch_delta(adj_edges: DataFrame, batch: DataFrame) -> DataFrame:
    """(id, delta) — per-node triangle-count delta for an edge batch, by
    the Makkar–Bader–Green inclusion–exclusion rule: each batch edge
    (u, v) is closed through the full adjacency; a triangle whose k edges
    are all in the batch is generated k times, so every generated row
    contributes 1/k (k = 1 + new(u,w) + new(v,w)) to each corner — exact
    integer totals, no double counting inside the batch.

    adj_edges: symmetrized simple adjacency (src, dst) of the graph that
    CONTAINS the batch edges (the post-insert graph for additions, the
    pre-delete graph for removals). batch: canonical (src, dst)."""
    b = batch.select("src", "dst").filter("src != dst").distinct()
    b_sym = (
        b.unionByName(b.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst")))
        .withColumn("is_new", F.lit(1))
    )
    wedges = (
        b.alias("b")
        .join(adj_edges.alias("e1"), F.col("b.src") == F.col("e1.src"))
        .filter(F.col("e1.dst") != F.col("b.dst"))
        .select(
            F.col("b.src").alias("u"),
            F.col("b.dst").alias("v"),
            F.col("e1.dst").alias("w"),
        )
    )
    closed = wedges.join(
        adj_edges.alias("e2"),
        (F.col("v") == F.col("e2.src")) & (F.col("w") == F.col("e2.dst")),
        "left_semi",
    )
    flagged = (
        closed.join(
            b_sym.select(F.col("src").alias("u"), F.col("dst").alias("w"),
                         F.col("is_new").alias("new_uw")),
            ["u", "w"], "left")
        .join(
            b_sym.select(F.col("src").alias("v"), F.col("dst").alias("w"),
                         F.col("is_new").alias("new_vw")),
            ["v", "w"], "left")
        .withColumn(
            "k",
            F.lit(1) + F.coalesce("new_uw", F.lit(0))
            + F.coalesce("new_vw", F.lit(0)),
        )
        .withColumn("c", F.lit(1.0) / F.col("k"))
    )
    corners = (
        flagged.select(F.col("u").alias("id"), "c")
        .unionAll(flagged.select(F.col("v").alias("id"), "c"))
        .unionAll(flagged.select(F.col("w").alias("id"), "c"))
    )
    return corners.groupBy("id").agg(F.sum("c").alias("delta"))


def _apply_triangle_delta(counts: DataFrame, delta: DataFrame,
                          sign: int) -> DataFrame:
    return (
        counts.join(delta, "id", "left")
        .select(
            "id",
            (F.col("triangles")
             + F.lit(sign) * F.round(F.coalesce("delta", F.lit(0.0)))
             ).cast("long").alias("triangles"),
        )
    )


def incremental_triangle_additions(
    counts: DataFrame, graph_new: GraphDF, new_edges: DataFrame
) -> DataFrame:
    """Per-node triangle counts updated under edge INSERTIONS: counts is
    (id, triangles) BEFORE the batch (nodes only — new nodes appear with
    their delta), graph_new is the graph AFTER. Work is O(|batch|·deg),
    never the full wedge set."""
    adj = (
        graph_new.E_sym.select("src", "dst").filter("src != dst").distinct()
    )
    delta = _triangle_batch_delta(adj, new_edges)
    base = graph_new.V.join(counts, "id", "left").select(
        "id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles")
    )
    return _apply_triangle_delta(base, delta, +1)


def incremental_triangle_removals(
    counts: DataFrame, graph_old: GraphDF, removed_edges: DataFrame
) -> DataFrame:
    """Per-node triangle counts updated under edge DELETIONS: graph_old is
    the graph BEFORE the batch (it still contains the removed edges —
    destroyed triangles are counted there with the same 1/k rule)."""
    adj = (
        graph_old.E_sym.select("src", "dst").filter("src != dst").distinct()
    )
    delta = _triangle_batch_delta(adj, removed_edges)
    return _apply_triangle_delta(counts, delta, -1)


class DynTopHarmonicCloseness(DynAPSP):
    """DynTopHarmonicCloseness (centrality/DynTopHarmonicCloseness.cpp —
    maintains the exact top-k harmonic closeness under GraphEvents; the
    reference keeps per-node bounds + a heap, rebuilding affected BFS
    trees). Spark mapping: the maintained state IS the incrementally
    repaired all-pairs distance table (DynAPSP); after each batch the
    harmonic sums are ONE aggregation over the changed table and top-k is
    the distributed TakeOrdered — so the per-update cost is the affected
    pairs plus one |reached-pairs| agg, never n fresh BFS runs.

    result: (id, harmonic) of the CURRENT top-k, score-desc with id
    tie-break (ties at the cut included deterministically)."""

    def __init__(self, graph: GraphDF, k: int = 10,
                 weighted: bool | None = None):
        self.k = int(k)
        self.dist: DataFrame | None = None
        super().__init__(graph, weighted=weighted)

    def _top_from_dist(self) -> DataFrame:
        harm = (
            self.dist.filter(F.col("dist") > 0)
            .groupBy(F.col("id"))
            .agg(F.sum(1.0 / F.col("dist")).alias("harmonic"))
        )
        # nodes reaching nobody still rank (harmonic 0)
        harm = self.graph.V.join(harm, "id", "left").select(
            "id", F.coalesce("harmonic", F.lit(0.0)).alias("harmonic")
        )
        # rank on the ROUNDED score with an id tie-break (CLAUDE.md rule:
        # FP noise must not decide who makes the cut)
        return (
            harm.orderBy(F.desc(F.round("harmonic", 9)), F.asc("id"))
            .limit(self.k)
            .localCheckpoint(eager=True)
        )

    def _solve(self) -> None:
        super()._solve()
        self.dist = self.result
        self.result = self._top_from_dist()

    def _update_incremental(self, old_graph, events, types) -> bool:
        self.result = self.dist  # hand DynAPSP its distance state back
        if not super()._update_incremental(old_graph, events, types):
            self._solve()
            return True
        self.dist = self.result
        self.result = self._top_from_dist()
        return True


def affected_nodes(graph: GraphDF, u: int, v: int, added: bool = True) -> DataFrame:
    """AffectedNodes (distance/AffectedNodes.cpp:14-120): the node set whose
    BFS distance from an endpoint of the modified edge (u, v) changes.

    The reference runs two sequential BFS traversals per endpoint and
    compares improvements; the Spark shape is ONE batched two-source BFS
    (bfs.py multi-source frontier) on the pre-event graph:

      * edge ADDITION (u,v): node w's distance from u improves iff the new
        edge opens a shortcut through v — 1 + d(v,w) < d(u,w) — and
        symmetrically for v, so affected = {w : |d(u,w) − d(v,w)| > 1},
        with an unreached side counting as infinity (the edge connects w's
        component to the other endpoint).
      * edge REMOVAL: two batched BFS runs (before/after); affected =
        {w : dist changed or reachability lost}.

    Returns (id: long). Used as the pruning set by the Dyn* recompute tier.
    """
    from networkit_spark.operators.bfs import bfs_distances

    if added:
        d = bfs_distances(graph, [u, v])
        du = d.filter(F.col("source") == u).select("id", F.col("dist").alias("du"))
        dv = d.filter(F.col("source") == v).select("id", F.col("dist").alias("dv"))
        both = graph.V.select("id").join(du, "id", "left").join(dv, "id", "left")
        inf = F.lit(1 << 60)
        a = F.coalesce("du", inf)
        b = F.coalesce("dv", inf)
        return both.filter(
            F.greatest(a, b) - F.least(a, b) > 1
        ).select("id").orderBy("id")
    # removal: compare distances with and without the edge
    cond = ~(
        ((F.col("src") == u) & (F.col("dst") == v))
        | ((F.col("src") == v) & (F.col("dst") == u))
    )
    g_after = GraphDF(
        graph.V, graph.E.filter(cond), directed=graph.directed,
        weighted=graph.weighted,
    )
    before = bfs_distances(graph, [u, v])
    after = bfs_distances(g_after, [u, v])
    b4 = before.select("source", "id", F.col("dist").alias("d0"))
    af = after.select("source", "id", F.col("dist").alias("d1"))
    full = b4.join(af, ["source", "id"], "full")
    return (
        full.filter(
            F.col("d0").isNull() | F.col("d1").isNull()
            | (F.col("d0") != F.col("d1"))
        )
        .select("id").distinct().orderBy("id")
    )


_INF = 1 << 40  # finite stand-in for "unreachable" that survives + arithmetic


def _single_new_edge(
    events: DataFrame, etype: str, old_graph: GraphDF
) -> tuple[int, int] | None:
    """If the batch is exactly ONE novel edge event of `etype` (an addition
    of an edge that didn't exist / a removal of one that did), return its
    canonical (u0, v0); else None. Batches are metadata-sized (the same
    tier as _batch_edge_types), so the collect is ≤ a handful of rows."""
    batch = _canonical_batch_edges(events, etype, old_graph.directed)
    old_e = old_graph.E
    if not old_graph.directed:
        old_e = old_e.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
    how = "left_anti" if etype == "EDGE_ADDITION" else "left_semi"
    rows = batch.join(old_e.distinct(), ["src", "dst"], how).collect()
    if len(rows) != 1:
        return None
    return int(rows[0]["src"]), int(rows[0]["dst"])


def _endpoint_distances(old_graph: GraphDF, u0: int, v0: int) -> DataFrame:
    """(id, d_u0, d_v0): every node's OLD-graph distance TO u0 and TO v0
    (reverse distances — on directed graphs one two-source BFS on the
    transpose), with _INF for unreachable. This is the one batched
    two-source BFS the affected-set pruning rests on (AffectedNodes.cpp's
    traversal pair, run as a single multi-source frontier)."""
    from networkit_spark.operators.bfs import bfs_distances

    bg = old_graph.transpose() if old_graph.directed else old_graph
    d = bfs_distances(bg, [u0, v0])
    du = d.filter(F.col("source") == u0).select("id", F.col("dist").alias("d_u0"))
    dv = d.filter(F.col("source") == v0).select("id", F.col("dist").alias("d_v0"))
    inf = F.lit(_INF)
    return (
        old_graph.V.select("id")
        .join(du, "id", "left")
        .join(dv, "id", "left")
        .select(
            "id",
            F.coalesce("d_u0", inf).alias("d_u0"),
            F.coalesce("d_v0", inf).alias("d_v0"),
        )
    )


class DynBetweennessOneNode(DynAlgorithm):
    """DynBetweennessOneNode (centrality/DynBetweennessOneNode.cpp):
    maintain the betweenness score of ONE tracked node x under event
    batches.

    The reference repairs affected (s, t) pair distances in place after a
    single edge insertion. The distributed analog keeps bc(x) = Σ_s δ_s(x)
    DECOMPOSED BY SOURCE (state: one (source, dep) row per source that
    reaches x) and, for a single-edge insertion (u0, v0), re-sweeps Brandes
    only from the AFFECTED sources — those for which the new edge lies on a
    new-or-equal-length shortest path, i.e. d(s,u0) + 1 ≤ d(s,v0) or (if
    undirected) the symmetric condition; every other source's SSSP DAG is
    untouched, so its δ_s(x) is provably unchanged. The affected set is ONE
    batched two-source BFS from {u0, v0} (reverse on directed graphs), the
    same pruning primitive as affected_nodes() above. Per-update work is
    therefore |affected sources| forward/backward sweeps, never |V|
    (`last_resweep_sources` records the count). Removals and multi-edge
    batches take the honest recompute fallback, like the reference's
    unsupported event types. result: one-row (id, score) DataFrame for x."""

    def __init__(self, graph: GraphDF, x: int, normalized: bool = False):
        self.x = int(x)
        self.normalized = normalized
        self.deps: DataFrame | None = None  # (source, dep) per reaching source
        self.last_resweep_sources: int | None = None
        super().__init__(graph)

    def _norm_pairs(self) -> float:
        if not self.normalized:
            return 1.0
        n = self.graph.number_of_nodes()
        pairs = (n - 1) * (n - 2)
        if not self.graph.directed:
            pairs = pairs / 2
        return float(max(pairs, 1))

    def _result_from_deps(self) -> None:
        total = self.deps.agg(
            F.coalesce(F.sum("dep"), F.lit(0.0)).alias("score")
        )
        self.result = total.select(
            F.lit(self.x).cast("long").alias("id"),
            (F.col("score") / F.lit(self._norm_pairs())).alias("score"),
        ).localCheckpoint(eager=True)

    def _solve(self) -> None:
        from networkit_spark.operators.betweenness import per_source_dependencies

        self.deps = per_source_dependencies(self.graph, self.x)
        self.last_resweep_sources = self.graph.number_of_nodes()
        self._result_from_deps()

    def _update_incremental(self, old_graph, events, types) -> bool:
        weight_only = {"EDGE_WEIGHT_UPDATE", "EDGE_WEIGHT_INCREMENT"}
        if types <= weight_only:
            return True  # hop-count Brandes ignores weights
        if not types <= ({"EDGE_ADDITION"} | weight_only):
            return False
        from networkit_spark.operators.betweenness import per_source_dependencies

        edge = _single_new_edge(events, "EDGE_ADDITION", old_graph)
        if edge is None:
            # zero novel additions (duplicates only) are a no-op; multi-edge
            # batches recompute (their affected sets interact)
            batch = _canonical_batch_edges(
                events, "EDGE_ADDITION", old_graph.directed
            )
            old_e = old_graph.E
            if not old_graph.directed:
                old_e = old_e.select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                )
            if batch.join(old_e.distinct(), ["src", "dst"], "left_anti").isEmpty():
                self.last_resweep_sources = 0
                return True
            return False
        u0, v0 = edge
        dists = _endpoint_distances(old_graph, u0, v0)
        if old_graph.directed:
            cond = (F.col("d_u0") < _INF) & (F.col("d_u0") + 1 <= F.col("d_v0"))
        else:
            cond = (
                F.least("d_u0", "d_v0") < _INF
            ) & (
                F.greatest("d_u0", "d_v0") - F.least("d_u0", "d_v0") >= 1
            )
        aff = dists.filter(cond).select("id").localCheckpoint(eager=True)
        n_aff = aff.count()
        self.last_resweep_sources = n_aff
        if n_aff == 0:
            return True
        new_deps = per_source_dependencies(self.graph, self.x, sources=aff)
        kept = self.deps.join(
            aff.select(F.col("id").alias("source")), "source", "left_anti"
        )
        self.deps = kept.unionByName(new_deps).localCheckpoint(eager=True)
        self._result_from_deps()
        return True

    def score(self) -> float:
        rows = self.result.collect()
        return float(rows[0]["score"]) if rows else 0.0


class DynApproxBetweenness(DynAlgorithm):
    """DynApproxBetweenness (centrality/DynApproxBetweenness.cpp): maintain
    the Riondato–Kornaropoulos sampled-path betweenness estimate under
    event batches. The reference stores the r sampled paths and, per
    update, re-draws only the samples whose shortest-path DAG the edge
    touches (DynApproxBetweenness.cpp sampleNewPaths over affected pairs).

    Spark state: the seeded pair table (sample, u, v) — a pure function of
    (V, r, seed), untouched by edge events — plus per-sample path
    increments (sample, node) and per-sample pair distance (sample,
    tdepth). A single-edge update computes each sample's OLD routed-
    through-the-edge length from ONE two-source endpoint BFS
    (d(u,u0) + 1 + d(v0,v), both orientations when undirected) and marks
    the sample affected iff that length ≤ its current distance (addition —
    the new edge creates a shorter or tie path, changing the DAG or σ) or
    == it (removal — the edge lay on some shortest path). Only affected
    samples re-run the sampler (betweenness.sample_path_increments), whose
    per-sample choices are seeded hashes of (sample, depth) — so the merged
    estimate is BIT-IDENTICAL to a cold approx_betweenness run on the
    folded graph. Multi-edge and node batches fall back to the full
    re-sample, the reference's own unsupported-shape contract.
    `last_resampled` records the per-update affected-sample count.

    result: (id, score) over V — score = sampled-path hit fraction."""

    def __init__(
        self, graph: GraphDF, n_samples: int, seed: int = 42,
        max_depth: int = 10_000,
    ):
        self.r = max(int(n_samples), 1)
        self.seed = int(seed)
        self.max_depth = int(max_depth)
        self.pairs: DataFrame | None = None
        self.inc: DataFrame | None = None   # (sample, node)
        self.found: DataFrame | None = None  # (sample, tdepth)
        self.last_resampled: int | None = None
        super().__init__(graph)

    def _score_from_inc(self) -> None:
        score = self.inc.groupBy(F.col("node").alias("id")).agg(
            (F.count("*") / F.lit(float(self.r))).alias("score")
        )
        self.result = (
            self.graph.V.join(score, "id", "left")
            .select("id", F.coalesce("score", F.lit(0.0)).alias("score"))
            .localCheckpoint(eager=True)
        )

    def _solve(self) -> None:
        from networkit_spark.operators.betweenness import (
            sample_pairs,
            sample_path_increments,
        )

        spark = self.graph.V.sparkSession
        if self.graph.number_of_nodes() < 2:
            self.pairs = spark.createDataFrame([], "sample long, u long, v long")
            self.inc = spark.createDataFrame([], "sample long, node long")
            self.found = spark.createDataFrame([], "sample long, tdepth int")
            self.last_resampled = 0
            self._score_from_inc()
            return
        self.pairs = sample_pairs(self.graph, self.r, self.seed)
        self.inc, self.found = sample_path_increments(
            self.graph, self.pairs, self.seed, self.max_depth
        )
        self.found = self.found.localCheckpoint(eager=True)
        self.last_resampled = self.r
        self._score_from_inc()

    def _affected_samples(
        self, old_graph: GraphDF, u0: int, v0: int, removal: bool
    ) -> DataFrame:
        """(sample, u, v) rows whose sampled path must be re-drawn."""
        dists = _endpoint_distances(old_graph, u0, v0)
        # reverse distances TO the endpoints serve the sample SOURCES; on
        # undirected graphs the same table serves the TARGETS (d symmetric).
        # Directed targets need FORWARD distances FROM the endpoints.
        if old_graph.directed:
            from networkit_spark.operators.bfs import bfs_distances

            fwd = bfs_distances(old_graph, [u0, v0])
            fu = fwd.filter(F.col("source") == u0).select(
                "id", F.col("dist").alias("f_u0")
            )
            fv = fwd.filter(F.col("source") == v0).select(
                "id", F.col("dist").alias("f_v0")
            )
            tgt = (
                old_graph.V.select("id")
                .join(fu, "id", "left")
                .join(fv, "id", "left")
                .select(
                    "id",
                    F.coalesce("f_u0", F.lit(_INF)).alias("f_u0"),
                    F.coalesce("f_v0", F.lit(_INF)).alias("f_v0"),
                )
            )
        else:
            tgt = dists.select(
                "id",
                F.col("d_u0").alias("f_u0"),
                F.col("d_v0").alias("f_v0"),
            )
        src_d = dists.select(
            F.col("id").alias("u"),
            F.col("d_u0").alias("su0"),
            F.col("d_v0").alias("sv0"),
        )
        tgt_d = tgt.select(
            F.col("id").alias("v"),
            F.col("f_u0").alias("tu0"),
            F.col("f_v0").alias("tv0"),
        )
        cur = self.found.select("sample", F.col("tdepth").alias("dcur"))
        p = (
            self.pairs.join(src_d, "u")
            .join(tgt_d, "v")
            .join(cur, "sample", "left")
            .withColumn("dcur", F.coalesce("dcur", F.lit(_INF)))
        )
        # length of the best old path routed THROUGH the edge
        via = F.col("su0") + 1 + F.col("tv0")
        if not old_graph.directed:
            via = F.least(via, F.col("sv0") + 1 + F.col("tu0"))
        finite = via < F.lit(_INF)
        if removal:
            cond = finite & (via == F.col("dcur"))
        else:
            cond = finite & (via <= F.col("dcur"))
        return p.filter(cond).select("sample", "u", "v").localCheckpoint(
            eager=True
        )

    def _update_incremental(self, old_graph, events, types) -> bool:
        from networkit_spark.operators.betweenness import sample_path_increments

        weight_only = {"EDGE_WEIGHT_UPDATE", "EDGE_WEIGHT_INCREMENT"}
        if types <= weight_only:
            self.last_resampled = 0
            return True  # hop-count sampler ignores weights
        if not types <= ({"EDGE_ADDITION", "EDGE_REMOVAL"} | weight_only):
            return False  # node events change the pair table itself
        has_add = "EDGE_ADDITION" in types
        has_rem = "EDGE_REMOVAL" in types
        if has_add and has_rem:
            return False
        etype = "EDGE_ADDITION" if has_add else "EDGE_REMOVAL"
        edge = _single_new_edge(events, etype, old_graph)
        if edge is None:
            batch = _canonical_batch_edges(events, etype, old_graph.directed)
            old_e = old_graph.E
            if not old_graph.directed:
                old_e = old_e.select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                )
            how = "left_anti" if has_add else "left_semi"
            if batch.join(old_e.distinct(), ["src", "dst"], how).isEmpty():
                self.last_resampled = 0
                return True  # duplicate adds / phantom removes: no-op
            return False  # >1 novel edge: affected sets interact
        u0, v0 = edge
        aff = self._affected_samples(old_graph, u0, v0, removal=has_rem)
        n_aff = aff.count()
        self.last_resampled = n_aff
        if n_aff == 0:
            return True
        new_inc, new_found = sample_path_increments(
            self.graph, aff, self.seed, self.max_depth
        )
        aff_ids = aff.select("sample")
        self.inc = (
            self.inc.join(aff_ids, "sample", "left_anti")
            .unionByName(new_inc)
            .localCheckpoint(eager=True)
        )
        self.found = (
            self.found.join(aff_ids, "sample", "left_anti")
            .unionByName(new_found)
            .localCheckpoint(eager=True)
        )
        self._score_from_inc()
        return True
