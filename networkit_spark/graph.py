"""GraphDF — the engine's one core container (reference: Graph,
include/networkit/graph/Graph.hpp:89).

A graph is a pair of DataFrames:
  V(id: long)                        — explicit vertex set (tombstone-free:
                                       the reference keeps an `exists` bitmap,
                                       Graph.hpp:127; we keep V explicit and
                                       never assume id < count(V))
  E(src: long, dst: long, weight: double)
plus immutable flags (directed, weighted) mirroring the reference's
construction-time flags (networkit/graph.pyx:29).

Undirected graphs store each edge once in canonical (src<=dst) form
(Edge(sorted=true), Graph.hpp:38-41); neighbor iteration uses the
symmetrized view `E_sym` — the DataFrame analog of the reference's
adjacency lists containing both endpoints (Graph.hpp:132-134).

All transforms are declarative DataFrame programs: Catalyst handles
predicate pushdown / column pruning / broadcast selection; nothing here
collects to the driver.
"""

from __future__ import annotations

from functools import cached_property

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_EDGE_WEIGHT = 1.0  # Globals.hpp:32


class GraphDF:
    """Distributed graph over (V, E) DataFrames."""

    def __init__(
        self,
        vertices: DataFrame,
        edges: DataFrame,
        directed: bool = False,
        weighted: bool = False,
    ):
        self.V = vertices.select(F.col("id").cast("long").alias("id"))
        cols = [
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        ]
        if weighted:
            cols.append(F.col("weight").cast("double").alias("weight"))
        else:
            cols.append(F.lit(DEFAULT_EDGE_WEIGHT).alias("weight"))
        self.E = edges.select(*cols)
        self.directed = directed
        self.weighted = weighted

    # ------------------------------------------------------------------ build
    @classmethod
    def from_edges(
        cls,
        edges: DataFrame,
        directed: bool = False,
        weighted: bool = False,
        vertices: DataFrame | None = None,
        canonicalize: bool = True,
    ) -> "GraphDF":
        """Build from an edge DataFrame; vertex set inferred from endpoints
        unless given (isolated nodes need an explicit V)."""
        e = edges
        if "weight" not in e.columns:
            e = e.withColumn("weight", F.lit(DEFAULT_EDGE_WEIGHT))
        if not directed and canonicalize:
            # canonical undirected storage: src <= dst (Edge(sorted=true))
            e = e.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
        if vertices is None:
            vertices = (
                e.select(F.col("src").alias("id"))
                .union(e.select(F.col("dst").alias("id")))
                .distinct()
            )
        return cls(vertices, e, directed=directed, weighted=weighted)

    @classmethod
    def from_edge_list(
        cls,
        spark: SparkSession,
        edge_list: list[tuple],
        directed: bool = False,
        weighted: bool = False,
        num_nodes: int | None = None,
    ) -> "GraphDF":
        """Tiny-fixture constructor (tests): list of (u, v[, w]) tuples."""
        rows = [
            (int(t[0]), int(t[1]), float(t[2]) if len(t) > 2 else DEFAULT_EDGE_WEIGHT)
            for t in edge_list
        ]
        e = spark.createDataFrame(rows, "src long, dst long, weight double")
        v = None
        if num_nodes is not None:
            v = spark.range(num_nodes).select(F.col("id").cast("long"))
        return cls.from_edges(e, directed=directed, weighted=weighted, vertices=v)

    # ------------------------------------------------------------ scalar props
    def number_of_nodes(self) -> int:
        return self.V.count()

    def number_of_edges(self) -> int:
        return self.E.count()

    def number_of_self_loops(self) -> int:
        return self.E.filter(F.col("src") == F.col("dst")).count()

    def upper_node_id_bound(self) -> int:
        """max(id)+1 — analog of z (Graph.hpp:101-123)."""
        row = self.V.agg(F.max("id").alias("m")).collect()[0]
        return (row["m"] or -1) + 1

    def total_edge_weight(self) -> float:
        """Graph.cpp:951 — self-loop weight counted once here."""
        row = self.E.agg(F.sum("weight").alias("s")).collect()[0]
        return float(row["s"] or 0.0)

    def density(self) -> float:
        """graphtools.pyx:295-324: m / (n*(n-1)) directed, 2m/(n*(n-1)) undirected;
        self-loops excluded."""
        n = self.number_of_nodes()
        if n < 2:
            return 0.0
        m = self.E.filter(F.col("src") != F.col("dst")).count()
        return m / (n * (n - 1)) if self.directed else 2.0 * m / (n * (n - 1))

    # ------------------------------------------------------------ views
    @cached_property
    def E_sym(self) -> DataFrame:
        """Symmetrized neighbor view: every (u,v) and (v,u) once.

        For undirected graphs this mirrors adjacency-list iteration
        (`forNeighborsOf`); self-loops appear once. For directed graphs
        this is the underlying-undirected view used by weakly-CC.
        """
        e = self.E
        rev = e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        both = e.unionByName(rev)
        # self-loops would duplicate under reversal; keep one copy
        return both.distinct() if self.directed else (
            e.filter("src = dst").unionByName(
                e.filter("src != dst").unionByName(
                    rev.filter("src != dst")
                )
            )
        )

    # degrees ---------------------------------------------------------------
    def degrees(self) -> DataFrame:
        """(id, degree) — undirected: #incident edges (self-loop counts once,
        Graph.cpp:470-491); directed: out-degree."""
        base = self.E if self.directed else self.E_sym
        deg = base.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))
        return (
            self.V.join(deg, "id", "left")
            .select("id", F.coalesce("degree", F.lit(0)).alias("degree"))
        )

    def in_degrees(self) -> DataFrame:
        base = self.E if self.directed else self.E_sym
        deg = base.groupBy(F.col("dst").alias("id")).agg(F.count("*").alias("in_degree"))
        return (
            self.V.join(deg, "id", "left")
            .select("id", F.coalesce("in_degree", F.lit(0)).alias("in_degree"))
        )

    def weighted_degrees(self, count_self_loops_twice: bool = False) -> DataFrame:
        """(id, wdeg): sum of incident edge weights (Graph.cpp:470-491;
        `countSelfLoopsTwice` option used by modularity volume,
        Modularity.cpp:50)."""
        base = self.E if self.directed else self.E_sym
        w = F.when(
            (F.col("src") == F.col("dst")) & F.lit(count_self_loops_twice),
            F.col("weight") * 2,
        ).otherwise(F.col("weight"))
        deg = base.groupBy(F.col("src").alias("id")).agg(F.sum(w).alias("wdeg"))
        return (
            self.V.join(deg, "id", "left")
            .select("id", F.coalesce("wdeg", F.lit(0.0)).alias("wdeg"))
        )

    def max_degree(self) -> int:
        row = self.degrees().agg(F.max("degree").alias("m")).collect()[0]
        return int(row["m"] or 0)

    def isolated_nodes(self) -> DataFrame:
        """V with no incident edges — anti-join of V vs endpoint set."""
        touched = (
            self.E.select(F.col("src").alias("id"))
            .union(self.E.select(F.col("dst").alias("id")))
            .distinct()
        )
        return self.V.join(touched, "id", "left_anti")

    # ------------------------------------------------- transforms (§2.2 algebra)
    def remove_self_loops(self) -> "GraphDF":
        """Graph.cpp:796 → filter(src != dst)."""
        return GraphDF(
            self.V, self.E.filter(F.col("src") != F.col("dst")),
            directed=self.directed, weighted=self.weighted,
        )

    def remove_multi_edges(self, mode: str = "min") -> "GraphDF":
        """Graph.cpp:809; modes mirror KONECTGraphReader's
        MultipleEdgesHandling (KONECTGraphReader.hpp:22): 'min' = keep
        minimum weight (deterministic 'keep first'), 'sum' = SUM_WEIGHTS_UP,
        'discard' = DISCARD_EDGES (drop every duplicated pair entirely)."""
        if mode == "discard":
            counted = self.E.groupBy("src", "dst").agg(
                F.count("*").alias("c"), F.min("weight").alias("weight")
            )
            e = counted.filter("c = 1").select("src", "dst", "weight")
        else:
            agg = F.sum("weight") if mode == "sum" else F.min("weight")
            e = self.E.groupBy("src", "dst").agg(agg.alias("weight"))
        return GraphDF(self.V, e, directed=self.directed, weighted=self.weighted)

    def remove_all_edges(self) -> "GraphDF":
        """Graph::removeAllEdges (Graph.cpp:788 analog): empty edge set,
        vertex set kept."""
        return GraphDF(
            self.V, self.E.limit(0), directed=self.directed, weighted=self.weighted
        )

    def remove_edges_from_isolated_set(self, nodes: DataFrame) -> "GraphDF":
        """GraphTools::removeEdgesFromIsolatedSet (graphtools.pyx:112):
        drop every edge with BOTH endpoints in `nodes` (makes the set
        internally isolated) — two anti-join-able semi joins."""
        s = nodes.select("id").distinct()
        both_in = self.E.join(
            s.withColumnRenamed("id", "src"), "src", "left_semi"
        ).join(s.withColumnRenamed("id", "dst"), "dst", "left_semi")
        kept = self.E.join(
            both_in.select("src", "dst"), ["src", "dst"], "left_anti"
        )
        return GraphDF(self.V, kept, directed=self.directed, weighted=self.weighted)

    def to_undirected(self) -> "GraphDF":
        """GraphTools::toUndirected (GraphTools.cpp:278): forget direction;
        reciprocal pairs (u,v)+(v,u) collapse with summed weight."""
        if not self.directed:
            return self
        e = (
            self.E.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
                "weight",
            )
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
        )
        return GraphDF(self.V, e, directed=False, weighted=self.weighted)

    def to_unweighted(self) -> "GraphDF":
        e = self.E.select("src", "dst").withColumn("weight", F.lit(DEFAULT_EDGE_WEIGHT))
        return GraphDF(self.V, e, directed=self.directed, weighted=False)

    def to_weighted(self) -> "GraphDF":
        return GraphDF(self.V, self.E, directed=self.directed, weighted=True)

    def transpose(self) -> "GraphDF":
        """GraphTools::transpose (graphtools.pyx:383) — directed only."""
        if not self.directed:
            return self
        e = self.E.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
        )
        return GraphDF(self.V, e, directed=True, weighted=self.weighted)

    def subgraph_from_nodes(
        self,
        nodes: DataFrame,
        include_out_neighbors: bool = False,
        include_in_neighbors: bool = False,
    ) -> "GraphDF":
        """GraphTools::subgraphFromNodes (GraphTools.cpp:224).

        Base: edges with BOTH endpoints in S (two semi-joins). Neighbor
        expansion adds edges with one endpoint in S in the given direction.
        `nodes` must have column `id`; broadcast when small (Catalyst
        auto-broadcasts under the threshold).
        """
        s = nodes.select("id").distinct()
        e = self.E
        in_src = e.join(s.withColumnRenamed("id", "src"), "src", "left_semi")
        both = in_src.join(s.withColumnRenamed("id", "dst"), "dst", "left_semi") \
                     .select("src", "dst", "weight")
        keep_v = s
        parts = [both]
        if include_out_neighbors:
            parts.append(in_src.select("src", "dst", "weight"))
        if include_in_neighbors:
            parts.append(
                e.join(s.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select("src", "dst", "weight")
            )
        if not self.directed and (include_out_neighbors or include_in_neighbors):
            # undirected neighborhood: either endpoint in S
            parts.append(
                self.E_sym.join(s.withColumnRenamed("id", "src"), "src", "left_semi")
                .select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                    "weight",
                )
            )
        e_out = parts[0]
        for p in parts[1:]:
            e_out = e_out.unionByName(p)
        e_out = e_out.dropDuplicates(["src", "dst"])
        if include_out_neighbors or include_in_neighbors:
            keep_v = (
                s.union(e_out.select(F.col("src").alias("id")))
                .union(e_out.select(F.col("dst").alias("id")))
                .distinct()
            )
        return GraphDF(keep_v, e_out, directed=self.directed, weighted=self.weighted)

    def index_edges(self) -> DataFrame:
        """indexEdges (Graph.cpp:231): deterministic edge ids in canonical
        (src,dst) order — two-stage scale-safe rank (plans/ranking.py), NOT
        monotonically_increasing_id (unstable across partitioning) and NOT
        a single-partition global window."""
        from networkit_spark.plans.ranking import global_row_numbers

        return global_row_numbers(self.E, ["src", "dst"], out_col="edge_id")

    def sort_edges(self) -> DataFrame:
        """sortEdges (Graph.cpp:1216 analog): edge table ordered by
        (src, dst) within range partitions — the sorted-cache layout every
        iterative kernel builds internally."""
        return (
            self.E.repartitionByRange(F.col("src"))
            .sortWithinPartitions("src", "dst")
        )

    def compact_node_ids(self) -> tuple["GraphDF", DataFrame]:
        """getContinuousNodeIds/getCompactedGraph (GraphTools.cpp:384-400):
        order-preserving remap old→[0,n). Returns (graph', mapping(old_id,new_id)).
        Two-stage scale-safe rank — no single-partition window."""
        from networkit_spark.plans.ranking import global_row_numbers

        mapping = global_row_numbers(self.V, ["id"], out_col="new_id").select(
            F.col("id").alias("old_id"), F.col("new_id").cast("long").alias("new_id")
        )
        src_map = mapping.select(F.col("old_id").alias("src"), F.col("new_id").alias("new_src"))
        dst_map = mapping.select(F.col("old_id").alias("dst"), F.col("new_id").alias("new_dst"))
        e = (
            self.E.join(src_map, "src")
            .join(dst_map, "dst")
            .select(
                F.col("new_src").alias("src"),
                F.col("new_dst").alias("dst"),
                "weight",
            )
        )
        v = mapping.select(F.col("new_id").alias("id"))
        return (
            GraphDF(v, e, directed=self.directed, weighted=self.weighted),
            mapping,
        )

    def append(self, other: "GraphDF") -> "GraphDF":
        """graphtools.pyx:192-199 disjoint union: offset other's ids by our
        upperNodeIdBound, then union."""
        off = self.upper_node_id_bound()
        v2 = other.V.select((F.col("id") + off).alias("id"))
        e2 = other.E.select(
            (F.col("src") + off).alias("src"),
            (F.col("dst") + off).alias("dst"),
            "weight",
        )
        return GraphDF(
            self.V.union(v2),
            self.E.unionByName(e2),
            directed=self.directed,
            weighted=self.weighted or other.weighted,
        )

    def merge(self, other: "GraphDF") -> "GraphDF":
        """graphtools.pyx:201-206 edge union on the shared id space."""
        v = self.V.union(other.V).distinct()
        e = self.E.unionByName(other.E).dropDuplicates(["src", "dst"])
        return GraphDF(v, e, directed=self.directed, weighted=self.weighted)

    # ------------------------------------------------------------- sampling
    def random_nodes(self, k: int, seed: int = 42) -> DataFrame:
        """Deterministic seeded sampling (GraphTools::randomNode analog):
        orderBy(xxhash64(id, seed)).limit(k) — no RNG state, reproducible
        across partitionings."""
        return (
            self.V.orderBy(F.xxhash64("id", F.lit(seed)), "id")
            .limit(k)
        )

    def random_nodes_lcg(self, k: int, seed: int = 42) -> DataFrame:
        """random_nodes twin on the cross-engine LCG key
        ((id + seed)·1103515245 + 12345) mod 2³¹ — same seeded-sample
        semantics, but expressible verbatim in ANSI SQL, so operators built
        on it (estimate_betweenness, approx_closeness) get full DuckDB
        oracles instead of rows-only checks."""
        key = (
            (F.col("id") + F.lit(seed)) * F.lit(1103515245) + F.lit(12345)
        ) % F.lit(2147483648)
        return self.V.orderBy(key, "id").limit(k)

    def random_edges(self, k: int, seed: int = 42) -> DataFrame:
        return (
            self.E.orderBy(F.xxhash64("src", "dst", F.lit(seed)), "src", "dst")
            .limit(k)
        )

    # ------------------------------------------------------------- validation
    def check_consistency(self) -> dict:
        """Graph.hpp:1606 analog — assertion queries."""
        dup_edges = (
            self.E.groupBy("src", "dst").count().filter("count > 1").count()
        )
        bad_weights = self.E.filter(
            F.col("weight").isNull() | F.isnan("weight")
        ).count()
        dangling_refs = (
            self.E.select(F.col("src").alias("id"))
            .union(self.E.select(F.col("dst").alias("id")))
            .distinct()
            .join(self.V, "id", "left_anti")
            .count()
        )
        return {
            "duplicate_edges": dup_edges,
            "invalid_weights": bad_weights,
            "endpoints_missing_from_V": dangling_refs,
        }
