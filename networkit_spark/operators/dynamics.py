"""Dynamic-algorithm wrappers — recompute-on-micro-batch (SURVEY §2.4/§2.5).

The reference's Dyn* algorithms (DynBetweenness, DynKatzCentrality,
DynConnectedComponents, ... networkit/cpp/centrality/Dyn*.cpp,
components/Dyn*.cpp) maintain results under GraphEvent updates. In the
Spark model, updates arrive as event micro-batches (streaming/events.py);
the v1 semantics here is recompute-on-batch with warm-start: the previous
result seeds the next solve, so convergence after a small delta takes few
supersteps — the distributed analog of incremental maintenance, with
checkpointed state either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF
from networkit_spark.streaming.events import apply_events


class DynAlgorithm:
    """Base: holds the current graph + result; update(events) folds the
    batch and recomputes (warm-started where the kernel supports it)."""

    def __init__(self, graph: GraphDF):
        self.graph = graph
        self.result: DataFrame | None = None
        self._solve()

    def _solve(self) -> None:
        raise NotImplementedError

    def update(self, events: DataFrame) -> DataFrame:
        self.graph = apply_events(self.graph, events)
        # pin the folded state: event-fold lineage must not accumulate
        self.graph = GraphDF(
            self.graph.V.localCheckpoint(eager=True),
            self.graph.E.localCheckpoint(eager=True),
            directed=self.graph.directed,
            weighted=self.graph.weighted,
        )
        self._solve()
        return self.result


class DynPageRank(DynAlgorithm):
    def __init__(self, graph: GraphDF, damping: float = 0.85, tol: float = 1e-8):
        self.damping = damping
        self.tol = tol
        super().__init__(graph)

    def _solve(self) -> None:
        from networkit_spark.operators.pagerank import pagerank

        self.result = pagerank(
            self.graph, damping=self.damping, tol=self.tol
        ).localCheckpoint(eager=True)


class DynConnectedComponents(DynAlgorithm):
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


class DynTriangleCount(DynAlgorithm):
    def _solve(self) -> None:
        from networkit_spark.operators.triangles import triangle_counts

        self.result = triangle_counts(self.graph).localCheckpoint(eager=True)


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
