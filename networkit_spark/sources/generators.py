"""Deterministic graph generators (reference: networkit/cpp/generators/*,
Python surface networkit/generators.pyx:52-1318).

Every generator is a per-row seeded-hash program over spark.range — no RNG
state, no driver-side loops — so the same (n, m, seed) produces identical
edges at any parallelism and any cluster size. This is the embarrassingly
parallel source used for scale benchmarks (10^7..10^12 edges stream
straight out of codegen'd ranges).

Hash: xxhash64(col..., seed) — Spark built-in, JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF


def _u(col):
    """xxhash64 → non-negative uniform long."""
    return F.abs(col)


def erdos_renyi(
    spark: SparkSession, n: int, p: float, seed: int = 42, directed: bool = False
) -> GraphDF:
    """G(n, p) via per-pair Bernoulli on the pair index (ErdosRenyiGenerator
    analog). O(n²) candidate space — intended for n ≤ ~10⁴ test graphs;
    use rmat() for scale."""
    pairs = spark.range(n * n).select(
        (F.col("id") / n).cast("long").alias("src"),
        F.pmod(F.col("id"), F.lit(n)).cast("long").alias("dst"),
    )
    if directed:
        pairs = pairs.filter(F.col("src") != F.col("dst"))
    else:
        pairs = pairs.filter(F.col("src") < F.col("dst"))
    thresh = int(p * (1 << 62))
    e = pairs.filter(
        F.pmod(_u(F.xxhash64("src", "dst", F.lit(seed))), F.lit(1 << 62))
        < F.lit(thresh)
    ).withColumn("weight", F.lit(1.0))
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=directed, vertices=v)


def rmat(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    seed: int = 42,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    directed: bool = True,
    dedup: bool = True,
) -> GraphDF:
    """R-MAT generator (RmatGenerator analog): n = 2^scale nodes,
    m = n·edge_factor edges, power-law degree skew with hubs at low ids.

    Each edge's quadrant path is derived from seeded hashes of
    (edge_index, level) — fully parallel, reproducible, no RNG state.
    """
    n = 1 << scale
    m = n * edge_factor
    t_ab = int((a + b) * 10_000)
    t_a_in_ab = int(a / (a + b) * 10_000)
    t_c_in_cd = int(c / (1.0 - a - b) * 10_000)

    df = spark.range(m).select(F.col("id").alias("e"))
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for lvl in range(scale):
        h = F.pmod(_u(F.xxhash64("e", F.lit(lvl), F.lit(seed))), F.lit(10_000))
        h2 = F.pmod(
            _u(F.xxhash64("e", F.lit(lvl), F.lit(seed + 1))), F.lit(10_000)
        )
        top = h < F.lit(t_ab)  # rows (src bit 0) w.p. a+b
        left = F.when(top, h2 < F.lit(t_a_in_ab)).otherwise(
            h2 < F.lit(t_c_in_cd)
        )
        src = src + F.when(top, F.lit(0)).otherwise(F.lit(1 << lvl)).cast("long")
        dst = dst + F.when(left, F.lit(0)).otherwise(F.lit(1 << lvl)).cast("long")
    e = df.select(src.alias("src"), dst.alias("dst")).filter(
        F.col("src") != F.col("dst")
    )
    if dedup:
        e = e.groupBy("src", "dst").agg(F.count("*").cast("double").alias("weight"))
    else:
        e = e.withColumn("weight", F.lit(1.0))
    return GraphDF.from_edges(
        e, directed=directed, weighted=dedup, canonicalize=False
    )


def watts_strogatz(
    spark: SparkSession, n: int, k: int, p: float, seed: int = 42
) -> GraphDF:
    """Ring lattice (each node to k/2 neighbors each side) with seeded
    rewiring (WattsStrogatzGenerator analog). Rewired endpoint = hash-chosen
    node; deterministic per (edge, seed)."""
    half = k // 2
    base = spark.range(n).select(F.col("id").alias("src"))
    offs = spark.range(1, half + 1).select(F.col("id").alias("off"))
    ring = base.crossJoin(offs).select(
        "src", F.pmod(F.col("src") + F.col("off"), F.lit(n)).alias("dst"), "off"
    )
    thresh = int(p * (1 << 62))
    rewire = F.pmod(
        _u(F.xxhash64("src", "off", F.lit(seed))), F.lit(1 << 62)
    ) < F.lit(thresh)
    new_dst = F.pmod(_u(F.xxhash64("src", "off", F.lit(seed + 7))), F.lit(n))
    e = ring.select(
        "src",
        F.when(rewire, new_dst).otherwise(F.col("dst")).cast("long").alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    # a rewired endpoint can collide with an existing ring edge — dedup on
    # the canonical pair or degree/triangle ops double-count the multi-edge
    e = e.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
    ).dropDuplicates(["src", "dst"])
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(
        e.withColumn("weight", F.lit(1.0)), directed=False, vertices=v
    )


def clustered_random(
    spark: SparkSession,
    n: int,
    k: int,
    p_intra: float,
    p_inter: float,
    seed: int = 42,
) -> tuple[GraphDF, DataFrame]:
    """ClusteredRandomGraphGenerator analog: k planted clusters, dense
    inside / sparse across. Returns (graph, ground_truth(id, label)) — the
    PLP/modularity test fixture. O(n²) candidate space: test sizes only."""
    labels = spark.range(n).select(
        F.col("id").cast("long"),
        F.pmod(_u(F.xxhash64("id", F.lit(seed))), F.lit(k)).alias("label"),
    )
    pairs = (
        spark.range(n * n)
        .select(
            (F.col("id") / n).cast("long").alias("src"),
            F.pmod(F.col("id"), F.lit(n)).cast("long").alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
    )
    la = labels.select(F.col("id").alias("src"), F.col("label").alias("l_src"))
    lb = labels.select(F.col("id").alias("dst"), F.col("label").alias("l_dst"))
    joined = pairs.join(la, "src").join(lb, "dst")
    t_intra = int(p_intra * (1 << 62))
    t_inter = int(p_inter * (1 << 62))
    h = F.pmod(_u(F.xxhash64("src", "dst", F.lit(seed + 3))), F.lit(1 << 62))
    e = joined.filter(
        F.when(F.col("l_src") == F.col("l_dst"), h < F.lit(t_intra)).otherwise(
            h < F.lit(t_inter)
        )
    ).select("src", "dst", F.lit(1.0).alias("weight"))
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e, directed=False, vertices=v), labels


def dorogovtsev_mendes_like(
    spark: SparkSession, n: int, seed: int = 42
) -> GraphDF:
    """Preferential-attachment-flavored graph without sequential growth:
    each node v>=3 attaches to 2 hash-chosen earlier nodes with skew toward
    low ids (id chosen as min of two uniforms — density ∝ rank). A
    parallel-generation stand-in for DorogovtsevMendes/BarabasiAlbert whose
    sequential definitions don't distribute; same degree-skew envelope."""
    df = spark.range(3, n).select(F.col("id").alias("src"))
    picks = []
    for j in range(2):
        u1 = F.pmod(_u(F.xxhash64("src", F.lit(j * 2), F.lit(seed))), F.col("src"))
        u2 = F.pmod(
            _u(F.xxhash64("src", F.lit(j * 2 + 1), F.lit(seed))), F.col("src")
        )
        picks.append(F.least(u1, u2))
    e = (
        df.select("src", picks[0].alias("dst"))
        .union(df.select("src", picks[1].alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .withColumn("weight", F.lit(1.0))
    )
    seed_edges = [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)]
    e0 = df.sparkSession.createDataFrame(
        seed_edges, "src long, dst long, weight double"
    )
    v = spark.range(n).select(F.col("id").cast("long"))
    return GraphDF.from_edges(e.unionByName(e0), directed=False, vertices=v)
