"""Triangle counting + local clustering coefficient, node-iterator semantics.

Reference:
  * LocalClusteringCoefficient (networkit/cpp/centrality/LocalClusteringCoefficient.cpp):
    undirected, no self-loops (throws otherwise, :7-8); turbo mode orients
    each edge from lower to higher (degree, id) so each triangle is found
    exactly once (:19-37), then c(u) = 2·T(u) / (d(u)·(d(u)−1)).
  * TriangleEdgeScore (networkit/cpp/edgescores/TriangleEdgeScore.cpp:24-104):
    same orientation trick, per-edge triangle counts.
  * ClusteringCoefficient::exactGlobal (networkit/cpp/global/ClusteringCoefficient.cpp:169-219).

Spark shape — the canonical oriented two-hop self-join:
    orient: E_or = {(u,v) : (deg(u),u) < (deg(v),v)}   (one degree join + filter)
    wedges: E_or a ⋈ E_or b on a.dst = b.src           (u→v→w)
    close : wedges ⋈ E_or c on (u,w)                   (u→w exists?)
Each triangle {u<v<w in orientation order} is produced exactly once. The
orientation bounds every node's out-degree by O(sqrt(m)) on any graph —
THE load-balancing trick that makes the self-join survive power-law skew
at 10^12 edges (a mega-hub contributes only low-(deg,id) endpoints' edges).
Per-node counts union the three corner roles; AQE skew-join splitting
handles residual imbalance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def oriented_edges(graph: GraphDF) -> DataFrame:
    """(src, dst) with each undirected edge once, oriented low→high by
    (degree, id) — LocalClusteringCoefficient.cpp:19-37."""
    deg = graph.degrees()
    e = graph.E_sym.filter("src != dst").select("src", "dst")
    d_src = deg.select(F.col("id").alias("src"), F.col("degree").alias("d_src"))
    d_dst = deg.select(F.col("id").alias("dst"), F.col("degree").alias("d_dst"))
    return (
        e.join(d_src, "src")
        .join(d_dst, "dst")
        .filter(
            (F.col("d_src") < F.col("d_dst"))
            | ((F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
    )


def triangle_list(
    graph: GraphDF,
    broadcast_threshold_rows: int = 20_000_000,
    wedge_partition_multiplier: int = 4,
) -> DataFrame:
    """(u, v, w): each triangle once, ordered by orientation (not node id).

    The wedge set (Σ d_or(v)² rows, often 100× |E|) is the big intermediate;
    the naive plan SHUFFLES it for the closing-edge semi join — the r1 bench
    spill. Fix: the closing side is just the oriented edge table (|E| rows);
    when it fits (≤ broadcast_threshold_rows ≈ a few hundred MB) broadcast
    it, so wedges stream map-side through a broadcast-hash semi join and are
    NEVER exchanged. Above the threshold (true 100-TB inputs) fall back to a
    shuffle join over `wedge_partition_multiplier`× the session's shuffle
    partitions, bounding per-task wedge state instead of spilling."""
    spark = graph.V.sparkSession
    e_or = oriented_edges(graph).persist()
    stats = e_or.agg(
        F.count("*").alias("m"),
        F.greatest(F.max("src"), F.max("dst")).alias("mx"),
    ).collect()[0]  # ONE materializing job: row count + id bound together
    m, max_id = stats["m"], stats["mx"] or 0
    a = e_or.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    b = e_or.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    wedges = a.join(b, "v")
    if m <= broadcast_threshold_rows and max_id < (1 << 31):
        # pack (u,w) into ONE long key: the broadcast probe uses Spark's
        # specialized LongHashedRelation (~2.5× faster probes than the
        # two-column UnsafeRow path — measured 6.5s vs 16.2s on the R-MAT
        # scale-17 scaling fixture)
        c = e_or.select(
            (F.col("src") * F.lit(1 << 32) + F.col("dst")).alias("uw")
        )
        keyed = wedges.withColumn(
            "uw", F.col("u") * F.lit(1 << 32) + F.col("w")
        )
        tris = keyed.join(F.broadcast(c), "uw", "left_semi").drop("uw")
    elif m <= broadcast_threshold_rows:
        c = e_or.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        tris = wedges.join(F.broadcast(c), ["u", "w"], "left_semi")
    else:
        base = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        parts = base * wedge_partition_multiplier
        c = e_or.select(F.col("src").alias("u"), F.col("dst").alias("w"))
        tris = wedges.repartition(parts, "u", "w").join(
            c.repartition(parts, "u", "w"), ["u", "w"], "left_semi"
        )
    return tris.select("u", "v", "w")


def triangle_counts(graph: GraphDF) -> DataFrame:
    """(id: long, triangles: long) — triangles incident to each node; nodes
    in no triangle get 0."""
    tris = triangle_list(graph)
    corners = (
        tris.select(F.col("u").alias("id"))
        .unionAll(tris.select(F.col("v").alias("id")))
        .unionAll(tris.select(F.col("w").alias("id")))
    )
    counts = corners.groupBy("id").agg(F.count("*").alias("triangles"))
    return (
        graph.V.join(counts, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"))
    )


def triangle_count_total(graph: GraphDF) -> int:
    """Global triangle count (each triangle once)."""
    return triangle_list(graph).count()


def local_clustering_coefficient(
    graph: GraphDF, turbo: bool = True
) -> DataFrame:
    """(id, lcc): c(u) = 2·T(u)/(d(u)(d(u)−1)); degree<2 ⇒ 0
    (LocalClusteringCoefficient.cpp:47-83 — triangles counted twice there,
    once here with the same net formula)."""
    if graph.number_of_self_loops() > 0:
        raise ValueError(
            "graph must not contain self-loops "
            "(LocalClusteringCoefficient.cpp:7-8)"
        )
    tc = triangle_counts(graph)
    deg = graph.degrees()
    return (
        tc.join(deg, "id")
        .select(
            "id",
            F.when(
                F.col("degree") >= 2,
                2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def average_local_clustering_coefficient(graph: GraphDF) -> float:
    """ClusteringCoefficient::avgLocal (ClusteringCoefficient.cpp)."""
    row = local_clustering_coefficient(graph).agg(F.avg("lcc")).collect()[0]
    return float(row[0] or 0.0)


def global_clustering_coefficient(graph: GraphDF) -> float:
    """exactGlobal (ClusteringCoefficient.cpp:169-219):
    3·triangles / #wedges, wedges = Σ d(u)(d(u)−1)/2."""
    tris = triangle_count_total(graph)
    wedges = (
        graph.degrees()
        .agg(F.sum(F.col("degree") * (F.col("degree") - 1) / 2).alias("w"))
        .collect()[0]["w"]
    )
    return 3.0 * tris / wedges if wedges else 0.0


def triangle_edge_score(graph: GraphDF) -> DataFrame:
    """TriangleEdgeScore.cpp:62-104 — (src, dst, score): triangles containing
    each canonical undirected edge."""
    tris = triangle_list(graph).persist()
    # each triangle covers 3 edges; emit in canonical (min,max) form
    pairs = (
        tris.select(F.col("u").alias("a"), F.col("v").alias("b"))
        .unionAll(tris.select(F.col("v").alias("a"), F.col("w").alias("b")))
        .unionAll(tris.select(F.col("u").alias("a"), F.col("w").alias("b")))
    )
    canon = pairs.select(
        F.least("a", "b").alias("src"), F.greatest("a", "b").alias("dst")
    )
    counts = canon.groupBy("src", "dst").agg(F.count("*").alias("score"))
    e = graph.E.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    return (
        e.join(counts, ["src", "dst"], "left")
        .select("src", "dst", F.coalesce("score", F.lit(0)).cast("long").alias("score"))
    )


# ChibaNishizekiTriangleEdgeScore (edgescores/
# ChibaNishizekiTriangleEdgeScore.cpp) computes the same per-edge triangle
# counts as TriangleEdgeScore via Chiba–Nishizeki enumeration; in the
# declarative plan both are the same oriented-wedge join, so the class is
# an alias here.
chiba_nishizeki_triangle_edge_score = triangle_edge_score


def quadrangle_edge_score(graph: GraphDF) -> DataFrame:
    """ChibaNishizekiQuadrangleEdgeScore
    (edgescores/ChibaNishizekiQuadrangleEdgeScore.cpp:14-95) — (src, dst,
    score): number of quadrangles (4-cycles) containing each canonical
    undirected edge.

    The reference's apex sweep counts, per endpoint pair (a,b), the wedge
    multiset a–m–b (nodeMarker) and adds c−1 to each wedge's two edges —
    exactly one increment per quadrangle per contained edge. Re-expressed
    relationally: group the wedge table a–m–b (a<b, m∉{a,b}) by endpoints,
    count c per (a,b), then every wedge row contributes (c−1) to edges
    (a,m) and (m,b). Same O(Σd²) wedge self-join machinery as
    triangle_edge_score — no pair-space blowup beyond the wedge count."""
    nb = graph.E_sym.filter("src != dst").select("src", "dst").distinct()
    a = nb.select(F.col("src").alias("m"), F.col("dst").alias("a"))
    b = nb.select(F.col("src").alias("m"), F.col("dst").alias("b"))
    wedges = a.join(b, "m").filter(F.col("a") < F.col("b"))
    grp = Window.partitionBy("a", "b")
    contrib = wedges.withColumn("c", F.count("*").over(grp)).filter(F.col("c") > 1)
    pairs = contrib.select(
        F.least("a", "m").alias("src"),
        F.greatest("a", "m").alias("dst"),
        (F.col("c") - 1).alias("q"),
    ).unionAll(
        contrib.select(
            F.least("m", "b").alias("src"),
            F.greatest("m", "b").alias("dst"),
            (F.col("c") - 1).alias("q"),
        )
    )
    # each quadrangle has two diagonal groups and every contained edge is
    # incident to both (endpoint in one, midpoint in the other) → every
    # edge-quadrangle incidence is counted exactly twice; halve. (The
    # reference avoids the 2× by deleting the apex's adjacency after its
    # sweep — a sequential trick; halving is the order-free equivalent.)
    counts = pairs.groupBy("src", "dst").agg((F.sum("q") / 2).alias("score"))
    e = graph.E.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ).distinct()
    return e.join(counts, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("score", F.lit(0)).cast("long").alias("score")
    )


def global_clustering_approx(
    graph: GraphDF, k: int = 1000, seed: int = 42
) -> float:
    """GlobalClusteringCoefficient::approximate
    (global/GlobalClusteringCoefficient.cpp:39-67) — wedge sampling: pick k
    wedge centers ∝ per-node wedge count d(d−1)/2, two distinct hash-chosen
    neighbors each, return the closed fraction.

    Fully distributed + deterministic: the inverse-CDF table is a two-stage
    prefix sum (plans/ranking.py, no single-partition window), the k sample
    rows are broadcast into a range join, neighbor picks are seeded-hash
    indices into per-node neighbor rankings (the reference uses its RNG —
    nondeterministic across runs; the estimator is identical)."""
    from pyspark.sql import Window

    from networkit_spark.plans.ranking import prefix_sums

    spark = graph.V.sparkSession
    nb = graph.E_sym.filter("src != dst").select("src", "dst").distinct()
    deg = nb.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    wcnt = deg.select(
        "id", "d", (F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("wc")
    ).filter(F.col("wc") > 0)
    table = prefix_sums(wcnt, "id", "wc").persist()
    total = table.agg(F.max("hi")).collect()[0][0]
    if not total:
        return 0.0
    # seeded LCG per sample slot (cross-engine-reproducible discipline)
    samples = spark.range(k).select(
        F.col("id").alias("slot"),
        F.pmod(
            (F.col("id") * F.lit(1103515245) + F.lit(12345 + seed)) % F.lit(2**31),
            F.lit(int(total)),
        ).alias("r"),
    )
    centers = F.broadcast(samples).join(
        table, (F.col("r") >= F.col("lo")) & (F.col("r") < F.col("hi"))
    ).select("slot", F.col("id").alias("c"), "d")
    # index neighbors 0..d-1 per node
    widx = Window.partitionBy("src").orderBy("dst")
    nbi = nb.withColumn("idx", F.row_number().over(widx) - F.lit(1))
    h1 = F.pmod(F.abs(F.xxhash64("slot", F.lit(seed), F.lit(1))), F.col("d"))
    h2 = F.pmod(F.abs(F.xxhash64("slot", F.lit(seed), F.lit(2))), F.col("d") - 1)
    picked = centers.select(
        "slot",
        "c",
        h1.alias("i1"),
        (h2 + (h2 >= h1).cast("long")).alias("i2"),
    )
    n1 = nbi.select(F.col("src").alias("c"), F.col("idx").alias("i1"), F.col("dst").alias("u"))
    n2 = nbi.select(F.col("src").alias("c"), F.col("idx").alias("i2"), F.col("dst").alias("w2"))
    wedges = picked.join(n1, ["c", "i1"]).join(n2, ["c", "i2"])
    canon = nb.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    closed = wedges.join(
        canon,
        (F.least("u", "w2") == F.col("a")) & (F.greatest("u", "w2") == F.col("b")),
        "left_semi",
    ).count()
    table.unpersist()
    return closed / float(k)
