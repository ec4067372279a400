"""NetworKit-compatible Python facade over the DataFrame engine.

A user of the reference (manpen/networkit, `import networkit as nk`)
writes `nk.centrality.PageRank(G).run().scores()`. This module lets that
code run against the Spark engine with an `import networkit_spark.compat
as nk` swap: the same class names, constructor parameters, and accessor
methods (run / scores / ranking / getPartition / getDistances ...),
mirroring networkit/centrality.pyx, components.pyx, community.pyx,
distance.pyx naming.

Scale contract: `run()` builds and materializes the DISTRIBUTED result
(a DataFrame) — that is the 100-TB artifact, reachable via `.frame()`.
The list-returning accessors (`scores()`, `getVector()`, ...) exist for
reference-API parity and necessarily `collect()` to the driver — they
are the fixture/interactive tier, exactly like the reference's
std::vector returns; pipelines at scale keep the DataFrame.

The `Graph` builder (addNodes/addEdge) is likewise the fixture tier —
cluster-scale graphs enter through sources/ readers or generators and
stay distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF
from networkit_spark.session import get_spark


# --------------------------------------------------------------------- Graph
class Graph:
    """Reference-style mutable graph builder (graph.pyx Graph(n, weighted,
    directed)): collects nodes/edges driver-side, materializes to GraphDF
    lazily. Fixture tier by design — see module docstring."""

    def __init__(
        self,
        n: int = 0,
        weighted: bool = False,
        directed: bool = False,
        spark: SparkSession | None = None,
    ):
        self._n = n
        self._edges: list[tuple[int, int, float]] = []
        self._weighted = weighted
        self._directed = directed
        self._spark = spark
        self._gdf: GraphDF | None = None

    # --- mutation (invalidates the materialized GraphDF)
    def addNode(self) -> int:
        self._gdf = None
        self._n += 1
        return self._n - 1

    def addNodes(self, k: int) -> int:
        self._gdf = None
        self._n += k
        return self._n - 1

    def addEdge(self, u: int, v: int, w: float = 1.0) -> "Graph":
        self._gdf = None
        self._edges.append((u, v, float(w)))
        self._n = max(self._n, u + 1, v + 1)
        return self

    # --- reference accessors
    def numberOfNodes(self) -> int:
        return self._n

    def numberOfEdges(self) -> int:
        return len(self._edges)

    def isDirected(self) -> bool:
        return self._directed

    def isWeighted(self) -> bool:
        return self._weighted

    def iterNodes(self):
        return iter(range(self._n))

    def iterEdges(self):
        return iter((u, v) for u, v, _ in self._edges)

    def iterEdgesWeights(self):
        return iter(self._edges)

    # --- engine handoff
    def to_graphdf(self) -> GraphDF:
        if self._gdf is None:
            spark = self._spark or get_spark()
            self._gdf = GraphDF.from_edge_list(
                spark,
                self._edges,
                directed=self._directed,
                weighted=self._weighted,
                num_nodes=self._n,
            )
        return self._gdf


def _gdf(G) -> GraphDF:
    """Accept either a compat.Graph or a GraphDF everywhere."""
    if isinstance(G, GraphDF):
        return G
    if isinstance(G, Graph):
        return G.to_graphdf()
    raise TypeError(f"expected Graph or GraphDF, got {type(G).__name__}")


# ----------------------------------------------------------------- Partition
class Partition:
    """community/Partition.hpp semantics over a (id, label) DataFrame."""

    def __init__(self, labels: DataFrame, id_col: str = "id", label_col: str = "label"):
        self._df = labels.select(
            F.col(id_col).cast("long").alias("id"),
            F.col(label_col).cast("long").alias("label"),
        )

    def frame(self) -> DataFrame:
        return self._df

    def numberOfSubsets(self) -> int:
        return self._df.select("label").distinct().count()

    def subsetOf(self, v: int) -> int:
        row = self._df.filter(F.col("id") == v).collect()
        if not row:
            raise ValueError(f"node {v} not in partition")
        return row[0]["label"]

    def getVector(self) -> list[int]:
        rows = self._df.collect()
        out = [0] * (max((r["id"] for r in rows), default=-1) + 1)
        for r in rows:
            out[r["id"]] = r["label"]
        return out

    def subsetSizes(self) -> list[int]:
        rows = (
            self._df.groupBy("label").agg(F.count("*").alias("n"))
            .orderBy("label").collect()
        )
        return [r["n"] for r in rows]

    def subsetSizeMap(self) -> dict[int, int]:
        return {
            r["label"]: r["n"]
            for r in self._df.groupBy("label").agg(F.count("*").alias("n")).collect()
        }


# ----------------------------------------------------------------- Algorithm
class _Algorithm:
    """base.pyx Algorithm: run() → hasFinished(); accessors throw before."""

    _value_col = "score"

    def __init__(self, G):
        self._G = _gdf(G)
        self._frame: DataFrame | None = None

    def _compute(self) -> DataFrame:  # pragma: no cover - abstract
        raise NotImplementedError

    def run(self):
        out = self._compute()
        self._frame = out.persist()
        self._frame.count()  # materialize — run() is eager like the reference
        return self

    def hasFinished(self) -> bool:
        return self._frame is not None

    def _require_run(self) -> DataFrame:
        if self._frame is None:
            raise RuntimeError("call run() first")
        return self._frame

    def frame(self) -> DataFrame:
        """The distributed result — the scale-tier accessor."""
        return self._require_run()


class _CentralityAlgorithm(_Algorithm):
    """centrality.pyx Centrality: scores()/score(v)/ranking()."""

    def scores(self) -> list[float]:
        rows = self._require_run().collect()
        out = [0.0] * (max((r["id"] for r in rows), default=-1) + 1)
        for r in rows:
            out[r["id"]] = float(r[self._value_col])
        return out

    def score(self, v: int) -> float:
        rows = self._require_run().filter(F.col("id") == v).collect()
        return float(rows[0][self._value_col]) if rows else 0.0

    def ranking(self) -> list[tuple[int, float]]:
        rows = (
            self._require_run()
            .orderBy(F.col(self._value_col).desc(), F.col("id"))
            .collect()
        )
        return [(r["id"], float(r[self._value_col])) for r in rows]

    def maximum(self) -> float:
        row = self._require_run().agg(F.max(self._value_col)).collect()[0]
        return float(row[0])


# ---------------------------------------------------------------- centrality
class centrality:
    """networkit/centrality.pyx class-for-class."""

    class DegreeCentrality(_CentralityAlgorithm):
        def __init__(self, G, normalized: bool = False):
            super().__init__(G)
            self._normalized = normalized

        def _compute(self):
            from networkit_spark.operators.centrality import degree_centrality

            return degree_centrality(self._G, normalized=self._normalized)

    class PageRank(_CentralityAlgorithm):
        def __init__(self, G, damp: float = 0.85, tol: float = 1e-8,
                     maxIterations: int | None = None):
            super().__init__(G)
            self._damp, self._tol = damp, tol
            self._max_iter = maxIterations if maxIterations is not None else 100

        def _compute(self):
            from networkit_spark.operators.pagerank import pagerank

            return pagerank(
                self._G, damping=self._damp, tol=self._tol,
                max_iterations=self._max_iter,
            )

    class EigenvectorCentrality(_CentralityAlgorithm):
        def __init__(self, G, tol: float = 1e-9):
            super().__init__(G)
            self._tol = tol

        def _compute(self):
            from networkit_spark.operators.centrality import eigenvector_centrality

            return eigenvector_centrality(self._G, tol=self._tol)

    class KatzCentrality(_CentralityAlgorithm):
        def __init__(self, G, alpha: float = 5e-4, beta: float = 0.1,
                     tol: float = 1e-8):
            super().__init__(G)
            self._alpha, self._beta, self._tol = alpha, beta, tol

        def _compute(self):
            from networkit_spark.operators.centrality import katz_centrality

            return katz_centrality(
                self._G, alpha=self._alpha, beta=self._beta, tol=self._tol
            )

    class Betweenness(_CentralityAlgorithm):
        def __init__(self, G, normalized: bool = False):
            super().__init__(G)
            self._normalized = normalized

        def _compute(self):
            from networkit_spark.operators.betweenness import betweenness

            return betweenness(self._G, normalized=self._normalized)

    class EstimateBetweenness(_CentralityAlgorithm):
        def __init__(self, G, nSamples: int, seed: int = 42):
            super().__init__(G)
            self._n_samples, self._seed = nSamples, seed

        def _compute(self):
            from networkit_spark.operators.betweenness import estimate_betweenness

            return estimate_betweenness(
                self._G, n_samples=self._n_samples, seed=self._seed
            )

    class Closeness(_CentralityAlgorithm):
        def __init__(self, G, normalized: bool = True):
            super().__init__(G)
            self._normalized = normalized

        def _compute(self):
            from networkit_spark.operators.closeness import closeness_centrality

            return closeness_centrality(self._G, normalized=self._normalized)

    class HarmonicCloseness(_CentralityAlgorithm):
        def __init__(self, G, normalized: bool = True):
            super().__init__(G)
            self._normalized = normalized

        def _compute(self):
            from networkit_spark.operators.closeness import harmonic_closeness

            return harmonic_closeness(self._G, normalized=self._normalized)

    class TopCloseness(_Algorithm):
        def __init__(self, G, k: int = 1):
            super().__init__(G)
            self._k = k

        def _compute(self):
            from networkit_spark.operators.closeness import top_closeness

            return top_closeness(self._G, k=self._k)

        def topkNodesList(self) -> list[int]:
            return [r["id"] for r in self._require_run().collect()]

        def topkScoresList(self) -> list[float]:
            return [float(r["score"]) for r in self._require_run().collect()]

    class TopHarmonicCloseness(TopCloseness):
        def _compute(self):
            from networkit_spark.operators.closeness import top_harmonic_closeness

            return top_harmonic_closeness(self._G, k=self._k)

    class CoreDecomposition(_CentralityAlgorithm):
        _value_col = "core"

        def _compute(self):
            from networkit_spark.operators.kcore import core_decomposition_hindex

            return core_decomposition_hindex(self._G)

        def maxCoreNumber(self) -> int:
            return int(self.maximum())

        def getPartition(self) -> Partition:
            return Partition(self._require_run(), label_col="core")

    class LaplacianCentrality(_CentralityAlgorithm):
        def __init__(self, G, normalized: bool = False):
            super().__init__(G)
            self._normalized = normalized

        def _compute(self):
            from networkit_spark.operators.centrality import laplacian_centrality

            return laplacian_centrality(self._G, normalized=self._normalized)

    class Sfigality(_CentralityAlgorithm):
        def _compute(self):
            from networkit_spark.operators.centrality import sfigality

            return sfigality(self._G)

    class SciPyEVZ(_CentralityAlgorithm):
        """centrality.pyx:2008-2035 SciPyEVZ — principal adjacency
        eigenvector (undirected only, like the reference). scipy is absent
        in this container and unnecessary: the principal eigenvector is
        exactly what the distributed power iteration computes, already
        unit-L2-normalized each step (scipy.sparse.linalg.eigs also returns
        a unit eigenvector, so normalized=False/True coincide up to sign —
        the reference's normFactor = 1/‖v‖ = 1 on a unit vector)."""

        def __init__(self, G, normalized: bool = False, tol: float = 1e-9):
            gdf = _gdf(G)
            if gdf.directed:
                raise NotImplementedError(
                    "Not implemented for directed graphs; use "
                    "centrality.EigenvectorCentrality instead"
                )
            super().__init__(G)
            self._tol = tol

        def _compute(self):
            from networkit_spark.operators.centrality import eigenvector_centrality

            return eigenvector_centrality(self._G, tol=self._tol)

    class SciPyPageRank(_CentralityAlgorithm):
        """centrality.pyx:2037-2055 SciPyPageRank — principal eigenvector
        of the PageRank matrix at damp=0.95. That eigenvector IS the
        PageRank fixpoint, so this delegates to the distributed power
        iteration; `normalized` (reference: 1/Σv) is a no-op on the
        already-sum-1 vector, kept for signature parity."""

        def __init__(self, G, damp: float = 0.95, normalized: bool = False,
                     tol: float = 1e-12):
            super().__init__(G)
            self._damp, self._tol = damp, tol

        def _compute(self):
            from networkit_spark.operators.pagerank import pagerank

            return pagerank(self._G, damping=self._damp, tol=self._tol)


# ---------------------------------------------------------------- components
class components:
    """networkit/components.pyx."""

    class _ComponentsBase(_Algorithm):
        _value_col = "component"

        def numberOfComponents(self) -> int:
            return (
                self._require_run().select("component").distinct().count()
            )

        def componentOfNode(self, v: int) -> int:
            rows = self._require_run().filter(F.col("id") == v).collect()
            if not rows:
                raise ValueError(f"node {v} not found")
            return rows[0]["component"]

        def getPartition(self) -> Partition:
            return Partition(self._require_run(), label_col="component")

        def getComponentSizes(self) -> dict[int, int]:
            return {
                r["component"]: r["n"]
                for r in self._require_run()
                .groupBy("component").agg(F.count("*").alias("n")).collect()
            }

    class ConnectedComponents(_ComponentsBase):
        def _compute(self):
            from networkit_spark.operators.components import connected_components

            return connected_components(self._G)

        @staticmethod
        def extractLargestConnectedComponent(G, compactGraph: bool = False):
            from networkit_spark.operators.components import (
                extract_largest_connected_component,
            )

            return extract_largest_connected_component(
                _gdf(G), compact=compactGraph
            )

    class WeaklyConnectedComponents(_ComponentsBase):
        def _compute(self):
            from networkit_spark.operators.components import (
                weakly_connected_components,
            )

            return weakly_connected_components(self._G)

    class StronglyConnectedComponents(_ComponentsBase):
        def _compute(self):
            from networkit_spark.operators.components import (
                strongly_connected_components,
            )

            return strongly_connected_components(self._G)


# ----------------------------------------------------------------- community
class community:
    """networkit/community.pyx: PLP/PLM classes + module functions."""

    class _CommunityDetector(_Algorithm):
        _value_col = "label"

        def getPartition(self) -> Partition:
            return Partition(self._require_run())

    class PLP(_CommunityDetector):
        def __init__(self, G, maxIterations: int = 32):
            super().__init__(G)
            self._max_iter = maxIterations

        def _compute(self):
            from networkit_spark.operators.plp import plp

            return plp(self._G, max_iterations=self._max_iter)

    class PLM(_CommunityDetector):
        def __init__(self, G, refine: bool = False, gamma: float = 1.0):
            super().__init__(G)
            self._gamma = gamma  # refine accepted for signature parity

        def _compute(self):
            from networkit_spark.operators.plm import plm

            return plm(self._G, gamma=self._gamma)

    class ParallelAgglomerativeClusterer(_CommunityDetector):
        """community/ParallelAgglomerativeClusterer.cpp — PGA: score/match/
        contract agglomeration projected back to the finest graph."""

        def _compute(self):
            from networkit_spark.operators.community import (
                parallel_agglomerative_clusterer,
            )

            return parallel_agglomerative_clusterer(self._G)

    class Modularity:
        def getQuality(self, zeta: Partition, G) -> float:
            from networkit_spark.operators.community import modularity

            return modularity(_gdf(G), zeta.frame())

    class Coverage:
        def getQuality(self, zeta: Partition, G) -> float:
            from networkit_spark.operators.community import coverage

            return coverage(_gdf(G), zeta.frame())

    @staticmethod
    def detectCommunities(G, algo=None) -> Partition:
        """community.pyx detectCommunities: default algorithm is PLM."""
        if algo is None:
            algo = community.PLM(G)
        return algo.run().getPartition()


# ------------------------------------------------------------------ distance
class distance:
    """networkit/distance.pyx."""

    class BFS(_Algorithm):
        _value_col = "dist"

        def __init__(self, G, source: int):
            super().__init__(G)
            self._source = source

        def _compute(self):
            from networkit_spark.operators.bfs import bfs_from

            return bfs_from(self._G, self._source)

        def getDistances(self) -> list[float]:
            # NULL dist = unreachable = infinity (reference convention)
            rows = self._require_run().collect()
            n = self._G.number_of_nodes()
            inf = float("inf")
            out = [inf] * max(n, max((r["id"] for r in rows), default=-1) + 1)
            for r in rows:
                out[r["id"]] = inf if r["dist"] is None else float(r["dist"])
            return out

        def distance(self, t: int) -> float:
            rows = self._require_run().filter(F.col("id") == t).collect()
            if not rows or rows[0]["dist"] is None:
                return float("inf")
            return float(rows[0]["dist"])

    class Dijkstra(BFS):
        def _compute(self):
            from networkit_spark.operators.bfs import sssp_distances

            return sssp_distances(self._G, self._source)

    class BidirectionalBFS(_Algorithm):
        def __init__(self, G, source: int, target: int):
            super().__init__(G)
            self._s, self._t = source, target
            self._dist: float | None = None

        def run(self):
            from networkit_spark.operators.bfs import bidirectional_bfs

            self._dist = bidirectional_bfs(self._G, self._s, self._t)
            self._frame = self._G.V.limit(0)  # scalar result
            return self

        def getDistance(self) -> float:
            if self._frame is None:
                raise RuntimeError("call run() first")
            # unreachable target → inf, like the reference's STSP contract
            return float("inf") if self._dist is None else float(self._dist)

    class IncompleteDijkstra:
        """distance/IncompleteDijkstra.hpp: lazy nearest-node iterator from
        a source set, with `explored` nodes treated as nonexistent. run()
        settles the distributed table (operators/bfs.incomplete_dijkstra);
        hasNext()/next() then replay it in the reference's emission order
        (ascending distance) — the iterator surface is fixture-tier by
        definition, like the reference's pair-at-a-time API."""

        def __init__(self, G, sources: list[int], explored=None):
            self._G = _gdf(G)
            self._sources = list(sources)
            self._explored = explored
            self._rows: list | None = None
            self._pos = 0
            self._frame = None

        def run(self):
            from networkit_spark.operators.bfs import incomplete_dijkstra

            self._frame = incomplete_dijkstra(
                self._G, self._sources, explored=self._explored
            )
            self._rows = self._frame.collect()
            self._pos = 0
            return self

        def frame(self) -> DataFrame:
            if self._frame is None:
                raise RuntimeError("call run() first")
            return self._frame

        def hasNext(self) -> bool:
            if self._rows is None:
                self.run()
            return self._pos < len(self._rows)

        def next(self) -> tuple[int, float]:
            if not self.hasNext():
                raise ValueError("No next element")
            r = self._rows[self._pos]
            self._pos += 1
            return (int(r["id"]), float(r["dist"]))

    class Diameter(_Algorithm):
        def __init__(self, G, nSamples: int = 8):
            super().__init__(G)
            self._n_samples = nSamples
            self._diam: int | None = None

        def run(self):
            from networkit_spark.operators.bfs import diameter_lower_bound

            self._diam = diameter_lower_bound(
                self._G, num_samples=self._n_samples
            )
            self._frame = self._G.V.limit(0)
            return self

        def getDiameter(self) -> tuple[int, int]:
            if self._diam is None:
                raise RuntimeError("call run() first")
            return (self._diam, 0)

    class EffectiveDiameter(_Algorithm):
        def __init__(self, G, ratio: float = 0.9):
            super().__init__(G)
            self._ratio = ratio
            self._val: float | None = None

        def run(self):
            from networkit_spark.operators.bfs import effective_diameter_exact

            self._val = effective_diameter_exact(self._G, ratio=self._ratio)
            self._frame = self._G.V.limit(0)
            return self

        def getEffectiveDiameter(self) -> float:
            if self._val is None:
                raise RuntimeError("call run() first")
            return float(self._val)


# ------------------------------------------------------------------ graphtools
class graphtools:
    """networkit/graphtools.pyx — thin forwards onto GraphDF methods."""

    @staticmethod
    def toUndirected(G) -> GraphDF:
        return _gdf(G).to_undirected()

    @staticmethod
    def toUnweighted(G) -> GraphDF:
        return _gdf(G).to_unweighted()

    @staticmethod
    def toWeighted(G) -> GraphDF:
        return _gdf(G).to_weighted()

    @staticmethod
    def transpose(G) -> GraphDF:
        return _gdf(G).transpose()

    @staticmethod
    def subgraphFromNodes(G, nodes, includeOutNeighbors: bool = False,
                          includeInNeighbors: bool = False) -> GraphDF:
        g = _gdf(G)
        node_df = nodes
        if not isinstance(nodes, DataFrame):
            node_df = g.V.sparkSession.createDataFrame(
                [(int(v),) for v in nodes], "id long"
            )
        return g.subgraph_from_nodes(
            node_df,
            include_out_neighbors=includeOutNeighbors,
            include_in_neighbors=includeInNeighbors,
        )

    @staticmethod
    def density(G) -> float:
        return _gdf(G).density()

    @staticmethod
    def maxDegree(G) -> int:
        return _gdf(G).max_degree()

    @staticmethod
    def size(G) -> tuple[int, int]:
        g = _gdf(G)
        return (g.number_of_nodes(), g.number_of_edges())

    @staticmethod
    def volume(G) -> float:
        """GraphTools::volume — sum of weighted degrees (self-loops twice)."""
        g = _gdf(G)
        row = (
            g.weighted_degrees(count_self_loops_twice=True)
            .agg(F.sum(F.col(g.weighted_degrees().columns[-1])))
            .collect()[0]
        )
        return float(row[0] or 0.0)

    @staticmethod
    def getCompactedGraph(G, nodeIdMap=None) -> GraphDF:
        g, _ = _gdf(G).compact_node_ids()
        return g

    @staticmethod
    def randomNode(G, seed: int = 42) -> int:
        return _gdf(G).random_nodes(1, seed=seed).collect()[0]["id"]

    @staticmethod
    def removeSelfLoops(G) -> GraphDF:
        return _gdf(G).remove_self_loops()


# ------------------------------------------------------------- sparsification
class sparsification:
    """networkit/sparsification.pyx — the Sparsifier classes
    (sparsification/Sparsifiers.cpp): run() computes the backbone,
    getGraph() returns the sparsified graph (a GraphDF, the facade's
    distributed graph type, like graphtools)."""

    class _Sparsifier:
        def __init__(self, G, *args):
            self._G = G
            self._args = args
            self._out = None

        def run(self):
            self._out = self._fn()(_gdf(self._G), *self._args)
            return self

        def getGraph(self) -> GraphDF:
            if self._out is None:
                raise RuntimeError("call run() first")
            return self._out

    class SimmelianSparsifierNonParametric(_Sparsifier):
        def _fn(self):
            from networkit_spark.operators.sparsification import (
                simmelian_sparsifier_non_parametric,
            )

            return simmelian_sparsifier_non_parametric

    class SimmelianSparsifierParametric(_Sparsifier):
        def _fn(self):
            from networkit_spark.operators.sparsification import (
                simmelian_sparsifier_parametric,
            )

            return simmelian_sparsifier_parametric

    class MultiscaleSparsifier(_Sparsifier):
        def _fn(self):
            from networkit_spark.operators.sparsification import (
                multiscale_sparsifier,
            )

            return multiscale_sparsifier

    class LocalSimilaritySparsifier(_Sparsifier):
        def _fn(self):
            from networkit_spark.operators.sparsification import (
                local_similarity_sparsifier,
            )

            return local_similarity_sparsifier

    class SimmelianMultiscaleSparsifier(_Sparsifier):
        def _fn(self):
            from networkit_spark.operators.sparsification import (
                simmelian_multiscale_sparsifier,
            )

            return simmelian_multiscale_sparsifier

    class RandomSparsifier(_Sparsifier):
        def _fn(self):
            from networkit_spark.operators.sparsification import (
                random_sparsifier,
            )

            return random_sparsifier


# ------------------------------------------------------------- linkprediction
class linkprediction:
    """networkit/linkprediction.pyx — per-pair index classes: run(u, v)
    scores one pair (the reference's runImpl probe), runAll()/frame()
    returns the full distributed score table over the two-hop candidate
    pairs."""

    class _Index:
        def __init__(self, G):
            self._G = G
            self._frame = None

        def _compute(self):
            raise NotImplementedError

        def runAll(self):
            self._frame = self._compute()
            return self

        def frame(self):
            if self._frame is None:
                self.runAll()
            return self._frame

        def run(self, u: int, v: int) -> float:
            from networkit_spark.graph import GraphDF  # noqa: F401

            spark = _gdf(self._G).V.sparkSession
            pairs = spark.createDataFrame(
                [(int(min(u, v)), int(max(u, v)))], "u long, v long"
            )
            rows = self._compute(pairs).collect()
            return float(rows[0]["score"]) if rows else 0.0

    class AdjustedRandIndex(_Index):
        def _compute(self, pairs=None):
            from networkit_spark.operators.linkprediction import (
                adjusted_rand_link_index,
            )

            return adjusted_rand_link_index(_gdf(self._G), pairs)

    class CommonNeighborsIndex(_Index):
        def _compute(self, pairs=None):
            from networkit_spark.operators.linkprediction import (
                common_neighbors_index,
            )

            df = common_neighbors_index(_gdf(self._G))
            return df if pairs is None else pairs.join(df, ["u", "v"], "left").select(
                "u", "v", F.coalesce("score", F.lit(0.0)).alias("score")
            )

    class JaccardIndex(_Index):
        def _compute(self, pairs=None):
            from networkit_spark.operators.linkprediction import jaccard_index

            df = jaccard_index(_gdf(self._G))
            return df if pairs is None else pairs.join(df, ["u", "v"], "left").select(
                "u", "v", F.coalesce("score", F.lit(0.0)).alias("score")
            )

    class AdamicAdarIndex(_Index):
        def _compute(self, pairs=None):
            from networkit_spark.operators.linkprediction import (
                adamic_adar_index,
            )

            df = adamic_adar_index(_gdf(self._G))
            return df if pairs is None else pairs.join(df, ["u", "v"], "left").select(
                "u", "v", F.coalesce("score", F.lit(0.0)).alias("score")
            )


# ---------------------------------------------------------------------- I/O
class Format:
    """graphio.pyx Format enum subset (v1 reader scope)."""

    EdgeListSpaceZero = "edgelist-s0"
    EdgeListSpaceOne = "edgelist-s1"
    EdgeListTabZero = "edgelist-t0"
    EdgeListTabOne = "edgelist-t1"
    METIS = "metis"
    SNAP = "snap"
    KONECT = "konect"
    GML = "gml"
    GraphML = "graphml"
    GEXF = "gexf"
    MatrixMarket = "matrixmarket"
    GraphToolBinary = "graphtool"
    ThrillBinary = "thrill"
    NetworkitBinary = "networkit"
    MAT = "mat"


def readGraph(path: str, fileformat: str = Format.EdgeListSpaceOne,
              spark: SparkSession | None = None, **kwargs) -> GraphDF:
    """graphio.pyx readGraph dispatch onto sources/readers.py."""
    from networkit_spark.sources import readers
    from networkit_spark.sources.xmlio import read_gexf, read_graphml

    spark = spark or get_spark()
    ff = fileformat
    if ff.startswith("edgelist-"):
        sep = " " if ff[len("edgelist-")] == "s" else "\t"
        first = int(ff[-1])
        return readers.read_edge_list(
            spark, path, separator=sep, first_node=first, **kwargs
        )
    dispatch = {
        Format.METIS: readers.read_metis,
        Format.SNAP: readers.read_snap,
        Format.KONECT: readers.read_konect,
        Format.GML: readers.read_gml,
        Format.GraphML: read_graphml,
        Format.MatrixMarket: readers.read_matrix_market,
        Format.GraphToolBinary: readers.read_graphtool,
        Format.ThrillBinary: readers.read_thrill,
        Format.NetworkitBinary: readers.read_parquet,
    }
    if ff == Format.GEXF:
        g, _events = read_gexf(spark, path)
        return g
    if ff == Format.MAT:
        from networkit_spark.sources.matio import read_mat

        return read_mat(spark, path, **kwargs)
    if ff not in dispatch:
        raise ValueError(f"unsupported format: {ff}")
    return dispatch[ff](spark, path, **kwargs)


def writeGraph(G, path: str, fileformat: str = Format.EdgeListSpaceOne,
               **kwargs) -> None:
    """graphio.pyx writeGraph dispatch onto sources/readers.py writers."""
    from networkit_spark.sources import readers
    from networkit_spark.sources.xmlio import write_gexf, write_graphml

    g = _gdf(G)
    ff = fileformat
    if ff.startswith("edgelist-"):
        sep = " " if ff[len("edgelist-")] == "s" else "\t"
        readers.write_edge_list(g, path, separator=sep, **kwargs)
        return
    dispatch = {
        Format.METIS: readers.write_metis,
        Format.SNAP: readers.write_snap,
        Format.GML: readers.write_gml,
        Format.GraphML: write_graphml,
        Format.GEXF: write_gexf,
        Format.GraphToolBinary: readers.write_graphtool,
        Format.ThrillBinary: readers.write_thrill,
        Format.NetworkitBinary: readers.write_parquet,
    }
    if ff == Format.MAT:
        from networkit_spark.sources.matio import write_mat

        write_mat(g, path, **kwargs)
        return
    if ff not in dispatch:
        raise ValueError(f"unsupported format: {ff}")
    dispatch[ff](g, path, **kwargs)


def overview(G) -> dict:
    """networkit.overview(G) — headline profile as a dict."""
    from networkit_spark.operators.profiling import profile

    return profile(_gdf(G))


# ----------------------------------------------------------------------- viz
class viz:
    """networkit viz family (viz/PivotMDS.cpp, viz/PostscriptWriter.cpp)."""

    class PivotMDS(_Algorithm):
        """GraphLayoutAlgorithm facade over operators/layout.pivot_mds."""

        def __init__(self, G, dim: int = 2, numberOfPivots: int = 250,
                     seed: int = 42):
            super().__init__(G)
            self._dim, self._k, self._seed = dim, numberOfPivots, seed

        def _compute(self):
            from networkit_spark.operators.layout import pivot_mds

            return pivot_mds(
                self._G, dim=self._dim, num_pivots=self._k, seed=self._seed
            )

        def getCoordinates(self) -> list[list[float]]:
            """vertexCoordinates as a dense list (fixture accessor —
            .frame() is the scale-tier result)."""
            rows = self._require_run().orderBy("id").collect()
            return [
                [float(r[f"c{d}"]) for d in range(self._dim)] for r in rows
            ]

    class MaxentStress(_Algorithm):
        """viz/MaxentStress.cpp:26-186 facade over operators/layout.
        maxent_stress; `linearSolverType` accepted for signature parity
        (every tier maps to the distributed batched CG)."""

        def __init__(self, G, dim: int = 2, k: int = 1,
                     tolerance: float = 1e-6, linearSolverType=None,
                     fastComputation: bool = False,
                     maxSolvesPerAlpha: int = 5, maxAlphaRounds: int = 5,
                     seed: int = 42):
            super().__init__(G)
            self._dim, self._k, self._tol = dim, k, tolerance
            self._fast = fastComputation
            self._solves, self._rounds = maxSolvesPerAlpha, maxAlphaRounds
            self._seed = seed

        def _compute(self):
            from networkit_spark.operators.layout import maxent_stress

            return maxent_stress(
                self._G, dim=self._dim, k=self._k, cg_tol=self._tol,
                fast_computation=self._fast,
                max_solves_per_alpha=self._solves,
                max_alpha_rounds=self._rounds, seed=self._seed,
            )

        def getCoordinates(self) -> list[list[float]]:
            rows = self._require_run().orderBy("id").collect()
            return [
                [float(r[f"c{d}"]) for d in range(self._dim)] for r in rows
            ]

        def computeScalingFactor(self) -> float:
            from networkit_spark.operators.layout import compute_scaling_factor

            return compute_scaling_factor(
                self._G, self._require_run(), dim=self._dim, k=self._k
            )

        def scaleLayout(self):
            from networkit_spark.operators.layout import scale_layout

            s = self.computeScalingFactor()
            old = self._require_run()
            self._frame = scale_layout(old, s, dim=self._dim).persist()
            self._frame.count()
            old.unpersist()
            return self

    class PostscriptWriter:
        """PostscriptWriter.cpp:38 — write(g, coordinates, path)."""

        def __init__(self, isTorus: bool = False):
            self._torus = isTorus

        def write(self, g, coordinates, path: str, clustering=None) -> None:
            from networkit_spark.operators.layout import write_postscript

            coords = (
                coordinates.frame()
                if hasattr(coordinates, "frame")
                else coordinates
            )
            clus = (
                clustering.frame()
                if clustering is not None and hasattr(clustering, "frame")
                else clustering
            )
            write_postscript(
                _gdf(g), coords, path, clustering=clus, is_torus=self._torus
            )


# --------------------------------------------------------------------- gephi
class gephi:
    """networkit/gephi — streaming client + CSV export (gephi/*.py)."""

    from networkit_spark.sources.gephi import (  # noqa: F401
        GephiFileHandler,
        GephiStreamingClient,
    )

    class streaming:
        from networkit_spark.sources.gephi import (  # noqa: F401
            GephiStreamingClient,
        )

    class csv:
        @staticmethod
        def exportNodeValues(values, fpath: str, column_name: str) -> None:
            from networkit_spark.sources.gephi import export_node_values_csv

            export_node_values_csv(values, fpath, column_name)
