"""EdmondsKarp max-flow (SURVEY §2.8; reference networkit/cpp/flow/
EdmondsKarp.cpp).

The reference computes undirected s-t max flow by BFS augmentation
(EdmondsKarp.cpp:19-86): each undirected edge carries capacity w in both
directions, augmenting paths are found by BFS over positive-residual
arcs, and the source set (min-cut side) is the residual-reachable set.

Distributed shape: augmentation is INHERENTLY sequential (each path must
see the previous path's residuals — this is the Ford-Fulkerson family's
nature; push-relabel is the parallel-friendly alternative and is noted as
future work). What IS distributed here is every step inside one
augmentation:
  * the BFS over positive-residual arcs is the frontier superstep loop
    (min-pred-id tie-break — deterministic, where the reference takes
    neighbor-iteration order),
  * path backtracking walks pred pointers as ≤diameter tiny joins (no
    |V| collect),
  * the bottleneck min and the flow update touch only the ≤diameter path
    arcs via a broadcast semi-join.
Flow VALUE and the min-cut source set are unique and oracle-checkable;
the per-edge flow decomposition is one valid maximum flow (the tests
certify it: capacity-feasible, conservation at internal nodes, and
value == cut capacity — the max-flow/min-cut certificate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def edmonds_karp(
    graph: GraphDF, source: int, sink: int, max_augmentations: int = 100_000
) -> tuple[float, DataFrame, DataFrame]:
    """Returns (flow_value, edge_flows, source_set).

    edge_flows: (src, dst, flow) per canonical undirected edge — |net flow|
    across it (the reference's final max(flow, residFlow) per edge id,
    EdmondsKarp.cpp:84-86). source_set: (id) — the residual-reachable side
    of the min cut (getSourceSet, :95-115)."""
    if source == sink:
        raise ValueError("source equals sink")
    spark = graph.V.sparkSession

    # arcs both ways, capacities summed over multi-edges
    canon = (
        graph.E.filter("src != dst")
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            "weight",
        )
        .groupBy("src", "dst")
        .agg(F.sum("weight").alias("cap"))
    )
    arcs = (
        canon.select("src", "dst", "cap")
        .unionByName(
            canon.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "cap"
            )
        )
        .repartition("src")
        .sortWithinPartitions("src")
        .persist()
    )
    arcs.count()

    # per-arc flow state; residual(u→v) = cap − f(u→v) + f(v→u)
    flow = arcs.select("src", "dst", F.lit(0.0).alias("f")).localCheckpoint(
        eager=True
    )
    flow_value = 0.0

    for _ in range(max_augmentations):
        # residual arcs: join the two directions of the SAME canonical edge
        fwd = flow.select("src", "dst", F.col("f").alias("f_fwd"))
        bwd = flow.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            F.col("f").alias("f_bwd"),
        )
        resid = (
            arcs.join(fwd, ["src", "dst"])
            .join(bwd, ["src", "dst"])
            .select(
                "src",
                "dst",
                (F.col("cap") - F.col("f_fwd") + F.col("f_bwd")).alias("r"),
            )
            .filter(F.col("r") > 1e-12)
            .localCheckpoint(eager=True)
        )
        # BFS with pred pointers over positive-residual arcs
        pred = spark.createDataFrame(
            [(int(source), int(source))], "id long, pred long"
        ).localCheckpoint(eager=True)
        frontier = pred.select("id")
        reached = False
        while True:
            fcount = frontier.count()
            if fcount == 0:
                break
            nxt = (
                resid.join(
                    F.broadcast(frontier.withColumnRenamed("id", "src")), "src"
                )
                .join(
                    F.broadcast(pred.select(F.col("id").alias("vis"))),
                    F.col("dst") == F.col("vis"),
                    "left_anti",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("src").alias("pred"))  # deterministic tie-break
                .localCheckpoint(eager=True)
            )
            if nxt.count() == 0:
                break
            pred = pred.unionByName(nxt).localCheckpoint(eager=True)
            if nxt.filter(F.col("id") == sink).count() > 0:
                reached = True
                break
            frontier = nxt.select("id")
        if not reached:
            break
        # backtrack sink→source through pred (≤ diameter tiny joins)
        path_edges: list[tuple[int, int]] = []
        cur = int(sink)
        pred_local = pred  # bounded by BFS depth × frontier, collect rows lazily
        while cur != source:
            row = pred_local.filter(F.col("id") == cur).select("pred").collect()
            p = int(row[0]["pred"])
            path_edges.append((p, cur))
            cur = p
        path_df = F.broadcast(
            spark.createDataFrame(path_edges, "src long, dst long")
        )
        gain = (
            resid.join(path_df, ["src", "dst"])
            .agg(F.min("r"))
            .collect()[0][0]
        )
        gain = float(gain)
        flow_value += gain
        # stats-safe per augmentation: the flow table is rebuilt by a join
        # every round, so the multiplied sizeInBytes estimate compounds
        # across augmentations through a bare checkpoint (CLAUDE.md rule 16)
        from networkit_spark.plans.checkpoint import stats_safe_checkpoint

        flow = stats_safe_checkpoint(
            flow.join(path_df.withColumn("on_path", F.lit(1)), ["src", "dst"], "left")
            .select(
                "src",
                "dst",
                (
                    F.col("f")
                    + F.when(F.col("on_path").isNotNull(), F.lit(gain)).otherwise(0.0)
                ).alias("f"),
            )
        )

    # final residual for the min-cut side
    fwd = flow.select("src", "dst", F.col("f").alias("f_fwd"))
    bwd = flow.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.col("f").alias("f_bwd"),
    )
    resid = (
        arcs.join(fwd, ["src", "dst"])
        .join(bwd, ["src", "dst"])
        .select(
            "src", "dst",
            (F.col("cap") - F.col("f_fwd") + F.col("f_bwd")).alias("r"),
        )
        .filter(F.col("r") > 1e-9)
        .localCheckpoint(eager=True)
    )
    reach = spark.createDataFrame([(int(source),)], "id long").localCheckpoint(
        eager=True
    )
    frontier = reach
    while True:
        nxt = (
            resid.join(F.broadcast(frontier.withColumnRenamed("id", "src")), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(reach, "id", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        reach = reach.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt

    # |net| per canonical edge (reference's max(flow, residFlow), :84-86)
    net = (
        flow.filter(F.col("src") < F.col("dst"))
        .withColumnRenamed("f", "f_uv")
        .join(
            flow.filter(F.col("src") > F.col("dst")).select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                F.col("f").alias("f_vu"),
            ),
            ["src", "dst"],
        )
        .select("src", "dst", F.abs(F.col("f_uv") - F.col("f_vu")).alias("flow"))
    )
    arcs.unpersist()
    return flow_value, net, reach


def cut_clustering(graph: GraphDF, alpha: float) -> DataFrame:
    """CutClustering (community/CutClustering.cpp:20-81, Flake et al.):
    augment with an artificial sink t joined to every node with weight
    alpha, then for each node u (decreasing degree, min-id tie-break —
    the reference's bucket sort, :38-62) not yet clustered: min-cut u vs
    t; u's source side becomes cluster u (absorbing earlier assignments,
    :64-78 — source sides are nested).

    Returns (id, label). The outer loop is the reference's own sequential
    structure (each cut may absorb earlier clusters); every inner max-flow
    is the distributed edmonds_karp. Fixture-tier by nature — up to n
    max-flow calls; the node order is collected once (|V| driver rows,
    declared)."""
    n = graph.number_of_nodes()
    t = int(
        graph.V.agg(F.max("id")).collect()[0][0] or 0
    ) + 1
    aug_edges = (
        graph.E.select("src", "dst", "weight")
        .unionByName(
            graph.V.select(
                F.col("id").alias("src"),
                F.lit(t).alias("dst"),
                F.lit(float(alpha)).alias("weight"),
            )
        )
    )
    aug = GraphDF.from_edges(
        aug_edges, directed=False, weighted=True, vertices=None
    )
    order = [
        int(r["id"])
        for r in graph.degrees()
        .orderBy(F.desc("degree"), F.asc("id"))
        .collect()
    ]
    label: dict[int, int] = {}
    for u in order:
        if u in label:
            continue
        _, _, source_set = edmonds_karp(aug, u, t)
        for r in source_set.collect():
            label[int(r["id"])] = u
    spark = graph.V.sparkSession
    out = spark.createDataFrame(
        [(k, v) for k, v in label.items()], "id long, label long"
    )
    return graph.V.join(out, "id", "left").select(
        "id", F.coalesce("label", F.col("id")).alias("label")
    )
