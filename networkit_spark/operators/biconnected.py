"""BiconnectedComponents (SURVEY §2.5; reference networkit/cpp/components/
BiconnectedComponents.cpp — iterative Hopcroft-Tarjan DFS).

A DFS is the one thing a BSP engine cannot do; the parallel classic is
Tarjan–Vishkin (SIAM J. Comput. 1985): biconnected components are the
connected components of an AUXILIARY graph whose vertices are the tree
edges of ANY rooted spanning tree. This module is that algorithm over
DataFrames:

  1. multi-root BFS spanning forest with parent pointers (min-pred
     tie-break), one frontier superstep per level;
  2. subtree sizes bottom-up, preorder numbers top-down (sibling offsets
     via per-parent windows — partitioned by parent, never global), both
     O(tree depth) supersteps;
  3. low/high = min/max preorder reachable from each subtree via one
     non-tree edge — bottom-up min/max through children;
  4. the two Tarjan–Vishkin rules emit aux edges between tree edges
     (each tree edge keyed by its child endpoint):
       R1  non-tree {v,w}, no ancestry           → (p(v),v) ~ (p(w),w)
       R2  tree (w,v), w=p(v) non-root, and
           low(v) < pre(w) or high(v) ≥ pre(w)+size(w)
                                                  → (v child) ~ (w child)
  5. hash-min WCC over the aux graph labels tree edges; non-tree edges
     inherit the label of their deeper endpoint's tree edge.

Every superstep loop is O(tree depth) — the BFS tree makes depth the
graph's hop-diameter, not n (a DFS tree would be pathological). The
Euler-tour pointer-doubling variant would make steps O(log n); documented
as the upgrade path if diameter-bound loops ever gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def _bfs_forest(graph: GraphDF, nb: DataFrame) -> DataFrame:
    """(id, parent, depth) — parent = id for roots (per-WCC min id)."""
    from networkit_spark.operators.components import connected_components

    comp = connected_components(graph)
    roots = comp.groupBy("component").agg(F.min("id").alias("id")).select("id")
    tree = roots.select(
        "id", F.col("id").alias("parent"), F.lit(0).cast("long").alias("depth")
    ).localCheckpoint(eager=True)
    frontier = tree.select("id")
    depth = 0
    while True:
        depth += 1
        nxt = (
            nb.join(F.broadcast(frontier.withColumnRenamed("id", "src")), "src")
            .join(
                F.broadcast(tree.select(F.col("id").alias("vis"))),
                F.col("dst") == F.col("vis"),
                "left_anti",
            )
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("src").alias("parent"))
            .withColumn("depth", F.lit(depth).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        tree = tree.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("id")
    return tree


def biconnected_components(graph: GraphDF) -> DataFrame:
    """(src, dst, component) — canonical undirected edges labeled by
    biconnected component (components renumbered to the min packed edge
    key, deterministic). Bridges are singleton components; self-loops are
    excluded like the reference (it iterates simple edges)."""
    from networkit_spark.operators.components import connected_components

    spark = graph.V.sparkSession
    nb = (
        graph.E_sym.filter("src != dst").select("src", "dst").distinct()
        .repartition("src")
        .sortWithinPartitions("src")
        .persist()
    )
    nb.count()

    tree = _bfs_forest(graph, nb).persist()
    tree.count()
    max_depth = int(tree.agg(F.max("depth")).collect()[0][0] or 0)

    par = tree.filter(F.col("depth") > 0).select(
        "id", "parent", "depth"
    )  # tree edges keyed by child id

    # ---- subtree sizes, bottom-up by depth level
    size = tree.select("id", F.lit(1).cast("long").alias("size"))
    size = size.localCheckpoint(eager=True)
    for d in range(max_depth, 0, -1):
        lvl = par.filter(F.col("depth") == d).select("id", "parent")
        contrib = (
            size.join(lvl, "id")
            .groupBy(F.col("parent").alias("id"))
            .agg(F.sum("size").alias("add"))
        )
        size = (
            size.join(contrib, "id", "left")
            .select(
                "id",
                (F.col("size") + F.coalesce("add", F.lit(0))).alias("size"),
            )
            .localCheckpoint(eager=True)
        )

    # ---- preorder, top-down: pre(v) = pre(p)+1+Σ sizes of earlier siblings
    sib = par.join(
        size.select(F.col("id").alias("id"), "size"), "id"
    )
    w_sib = Window.partitionBy("parent").orderBy("id")
    sib_off = sib.withColumn(
        "off",
        F.coalesce(
            F.sum("size").over(
                w_sib.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("id", "parent", "depth", "off")
    pre = tree.filter(F.col("depth") == 0).select(
        "id", F.lit(0).cast("long").alias("pre")
    )
    # roots of different components need disjoint preorder ranges: offset
    # by cumulative component sizes (≤ #components rows — ranked scale-safe)
    from networkit_spark.plans.ranking import prefix_sums

    root_sizes = pre.join(size, "id").select("id", "size")
    root_off = prefix_sums(root_sizes, "id", "size").select(
        "id", F.col("lo").alias("pre")
    )
    pre = root_off.localCheckpoint(eager=True)
    for d in range(1, max_depth + 1):
        lvl = sib_off.filter(F.col("depth") == d)
        nxt = (
            lvl.join(
                pre.select(F.col("id").alias("parent"), F.col("pre").alias("pp")),
                "parent",
            )
            .select(
                "id", (F.col("pp") + 1 + F.col("off")).alias("pre")
            )
        )
        pre = pre.unionByName(nxt).localCheckpoint(eager=True)

    # ---- non-tree edges (canonical, both endpoints' tree data attached)
    tree_pairs = par.select(
        F.least("id", "parent").alias("src"), F.greatest("id", "parent").alias("dst")
    )
    canon = nb.filter(F.col("src") < F.col("dst"))
    nontree = canon.join(tree_pairs, ["src", "dst"], "left_anti")

    # low/high base: own pre, plus pre of non-tree neighbors
    pre_b = pre.select(F.col("id").alias("nid"), F.col("pre").alias("npre"))
    nt_sym = nontree.unionByName(
        nontree.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    nbr_pre = (
        nt_sym.join(pre_b, nt_sym.dst == pre_b.nid)
        .groupBy(F.col("src").alias("id"))
        .agg(F.min("npre").alias("lo_nt"), F.max("npre").alias("hi_nt"))
    )
    lohi = (
        pre.join(nbr_pre, "id", "left")
        .select(
            "id",
            F.least("pre", F.coalesce("lo_nt", F.col("pre"))).alias("low"),
            F.greatest("pre", F.coalesce("hi_nt", F.col("pre"))).alias("high"),
        )
        .localCheckpoint(eager=True)
    )
    for d in range(max_depth, 0, -1):
        lvl = par.filter(F.col("depth") == d).select("id", "parent")
        up = (
            lohi.join(lvl, "id")
            .groupBy(F.col("parent").alias("id"))
            .agg(F.min("low").alias("clo"), F.max("high").alias("chi"))
        )
        lohi = (
            lohi.join(up, "id", "left")
            .select(
                "id",
                F.least("low", F.coalesce("clo", F.col("low"))).alias("low"),
                F.greatest("high", F.coalesce("chi", F.col("high"))).alias("high"),
            )
            .localCheckpoint(eager=True)
        )

    # ---- Tarjan–Vishkin aux edges over tree-edge ids (= child ids)
    meta = (
        par.select("id", "parent")
        .join(pre, "id")
        .join(size, "id")
        .join(lohi, "id")
        .select("id", "parent", "pre", "size", "low", "high")
        .persist()
    )
    m_v = meta.select(
        F.col("id").alias("v"),
        F.col("parent").alias("pv"),
        F.col("pre").alias("pre_v"),
        F.col("size").alias("size_v"),
    )
    m_w = meta.select(
        F.col("id").alias("w"),
        F.col("parent").alias("pw"),
        F.col("pre").alias("pre_w"),
        F.col("size").alias("size_w"),
    )
    # R1: non-tree {v,w}, neither an ancestor of the other
    r1 = (
        nontree.select(F.col("src").alias("v"), F.col("dst").alias("w"))
        .join(m_v, "v")
        .join(m_w, "w")
        .filter(
            ~(
                (F.col("pre_v") <= F.col("pre_w"))
                & (F.col("pre_w") < F.col("pre_v") + F.col("size_v"))
            )
            & ~(
                (F.col("pre_w") <= F.col("pre_v"))
                & (F.col("pre_v") < F.col("pre_w") + F.col("size_w"))
            )
        )
        .select(F.col("v").alias("src"), F.col("w").alias("dst"))
    )
    # R2: tree edge (w=p(v), v), w non-root: connect v's edge to w's edge
    # iff subtree(v) escapes w's subtree via a non-tree edge
    w_meta = meta.select(
        F.col("id").alias("parent"),
        F.col("pre").alias("pre_p"),
        F.col("size").alias("size_p"),
    )
    r2 = (
        meta.join(w_meta, "parent")  # inner join drops root parents
        .filter(
            (F.col("low") < F.col("pre_p"))
            | (F.col("high") >= F.col("pre_p") + F.col("size_p"))
        )
        .select(F.col("id").alias("src"), F.col("parent").alias("dst"))
    )
    aux_edges = r1.unionByName(r2)
    aux_graph = GraphDF.from_edges(
        aux_edges, directed=False, vertices=par.select("id")
    )
    labels = connected_components(aux_graph).select(
        F.col("id").alias("child"), F.col("component").alias("component")
    )

    # ---- label original edges
    tree_lab = (
        par.join(labels, par.id == labels.child)
        .select(
            F.least("id", "parent").alias("src"),
            F.greatest("id", "parent").alias("dst"),
            "component",
        )
    )
    # non-tree edge inherits its deeper endpoint's tree edge
    d_v = tree.select(F.col("id").alias("v2"), F.col("depth").alias("dep_v"))
    d_w = tree.select(F.col("id").alias("w2"), F.col("depth").alias("dep_w"))
    nt_lab = (
        nontree.select(F.col("src").alias("v2"), F.col("dst").alias("w2"))
        .join(d_v, "v2")
        .join(d_w, "w2")
        .withColumn(
            "child",
            F.when(F.col("dep_v") >= F.col("dep_w"), F.col("v2")).otherwise(
                F.col("w2")
            ),
        )
        .join(labels, "child")
        .select(
            F.least("v2", "w2").alias("src"),
            F.greatest("v2", "w2").alias("dst"),
            "component",
        )
    )
    out = tree_lab.unionByName(nt_lab)
    # deterministic component ids: min packed (src,dst) key per component
    packed = out.withColumn(
        "ekey", F.col("src") * F.lit(1 << 32) + F.col("dst")
    )
    cmin = packed.groupBy("component").agg(F.min("ekey").alias("cid"))
    final = packed.join(cmin, "component").select(
        "src", "dst", F.col("cid").alias("component")
    )
    nb.unpersist()
    tree.unpersist()
    meta.unpersist()
    return final


def articulation_points(graph: GraphDF) -> DataFrame:
    """(id) — nodes incident to edges of ≥2 biconnected components, plus
    roots-with-≥2-components semantics fall out of the same count."""
    bcc = biconnected_components(graph)
    ends = bcc.select(F.col("src").alias("id"), "component").unionByName(
        bcc.select(F.col("dst").alias("id"), "component")
    )
    return (
        ends.groupBy("id")
        .agg(F.countDistinct("component").alias("nc"))
        .filter(F.col("nc") >= 2)
        .select("id")
    )
