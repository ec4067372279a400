"""GraphDifference — the edit script between two graphs (SURVEY §2.1).

Reference: dynamics/GraphDifference.cpp:18-120 — given G1 and G2, emit the
GraphEvent stream that transforms G1 into G2, ordered so replay is valid:
first edge removals, then node removals/restorations/additions, then edge
additions and weight updates. Counts for each edit class are exposed
(GraphDifference.hpp getNumberOf*).

DataFrame mapping: every edit class is an anti-join / changed-value join
between the two (V, E) pairs — no iteration, pure Catalyst territory.
Deviations from the C++ scan (documented):
  * the reference emits anonymous NODE_ADDITIONs padded up to the target
    upperNodeIdBound (ids are implicit in its compact-id model); our ids
    are arbitrary longs, so NODE_ADDITION carries the actual id, and a
    new node is a RESTORATION iff its id ≤ max(V1.id) (the analog of
    `u < G1.upperNodeIdBound()`), else an ADDITION — the padding
    add/remove pairs are meaningless here and not emitted;
  * within each block the reference's order is the adjacency-array scan;
    ours is the canonical (u, v) sort — a deterministic, declared order.

`seq` is minted with the two-stage scale-safe global row number
(plans/ranking.py) — no single-partition window; the edit stream of two
100-TB graphs is itself edge-scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF
from networkit_spark.plans.ranking import global_row_numbers


def _edge_keys(g: GraphDF) -> DataFrame:
    """Canonical (u, v, w) edge rows for comparison: undirected graphs are
    already stored src<=dst (graph.py); directed kept as-is. Multi-edges
    are out of scope for diffing (as in the reference, which walks simple
    adjacencies)."""
    return g.E.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), F.col("weight").alias("w")
    )


def graph_difference_events(g1: GraphDF, g2: GraphDF) -> DataFrame:
    """GraphEvent rows (seq, type, u, v, w) transforming g1 into g2, in
    replayable order: EDGE_REMOVAL block, node-event block, then
    EDGE_ADDITION / EDGE_WEIGHT_UPDATE block (GraphDifference.cpp:112-118
    puts removals first so node removals never see dangling edges)."""
    if g1.directed != g2.directed:
        raise ValueError("both or none of the graphs must be directed")
    e1, e2 = _edge_keys(g1), _edge_keys(g2)
    v1, v2 = g1.V, g2.V

    # block 0: edges in G1 absent from G2
    removals = (
        e1.join(e2.select("u", "v"), ["u", "v"], "left_anti")
        .select(
            F.lit(0).alias("block"),
            F.lit("EDGE_REMOVAL").alias("type"),
            "u",
            "v",
            F.lit(None).cast("double").alias("w"),
        )
    )

    # block 1: node removals, then restorations/additions
    node_rm = v1.join(v2, "id", "left_anti").select(
        F.lit(1).alias("block"),
        F.lit("NODE_REMOVAL").alias("type"),
        F.col("id").alias("u"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )
    bound = v1.agg(F.max("id")).collect()[0][0]  # scalar aggregate
    bound = -1 if bound is None else bound
    node_new = v2.join(v1, "id", "left_anti").select(
        F.lit(1).alias("block"),
        F.when(F.col("id") <= F.lit(bound), "NODE_RESTORATION")
        .otherwise("NODE_ADDITION")
        .alias("type"),
        F.col("id").alias("u"),
        F.lit(None).cast("long").alias("v"),
        F.lit(None).cast("double").alias("w"),
    )

    # block 2: edges in G2 absent from G1, plus common edges whose weight
    # changed (emitted as EDGE_WEIGHT_UPDATE carrying the G2 weight)
    additions = (
        e2.join(e1.select("u", "v"), ["u", "v"], "left_anti")
        .select(
            F.lit(2).alias("block"),
            F.lit("EDGE_ADDITION").alias("type"),
            "u",
            "v",
            "w",
        )
    )
    updates = (
        e2.alias("b")
        .join(
            e1.select("u", "v", F.col("w").alias("w1")).alias("a"), ["u", "v"]
        )
        .filter(F.col("b.w") != F.col("w1"))
        .select(
            F.lit(2).alias("block"),
            F.lit("EDGE_WEIGHT_UPDATE").alias("type"),
            "u",
            "v",
            F.col("b.w").alias("w"),
        )
    )

    edits = removals.unionByName(node_rm).unionByName(node_new).unionByName(
        additions
    ).unionByName(updates)
    return (
        global_row_numbers(edits, ["block", "type", "u", "v"], out_col="seq")
        .select("seq", "type", "u", "v", "w")
    )


def graph_difference_counts(g1: GraphDF, g2: GraphDF) -> DataFrame:
    """One row of edit-class counts (GraphDifference.hpp getNumberOf*):
    (edge_removals, node_removals, node_restorations, node_additions,
    edge_additions, weight_updates, total_edits) — all BIGINT."""
    ev = graph_difference_events(g1, g2)
    cnt = lambda t: F.sum(F.when(F.col("type") == t, 1).otherwise(0)).cast("long")
    return ev.agg(
        cnt("EDGE_REMOVAL").alias("edge_removals"),
        cnt("NODE_REMOVAL").alias("node_removals"),
        cnt("NODE_RESTORATION").alias("node_restorations"),
        cnt("NODE_ADDITION").alias("node_additions"),
        cnt("EDGE_ADDITION").alias("edge_additions"),
        cnt("EDGE_WEIGHT_UPDATE").alias("weight_updates"),
        F.count("*").cast("long").alias("total_edits"),
    )
