"""Embedding-space clustering + semantic dedup for training-data pipelines.

kmeans — Lloyd's algorithm over an `array<float>` embedding column with a
FIXED iteration count and an LCG-seeded init, so the whole trajectory is
deterministic and ANSI-SQL reproducible (the driver's DuckDB oracle unrolls
the iterations as CTEs, same pattern as PageRank/PLP). Assignment uses
cosine similarity (spherical k-means without the normalize step — cosine is
scale-invariant, so the unnormalized per-dim mean is a valid centroid).

semantic_dedup — SemDeDup-style (Abbas et al. 2023) semantic deduplication:
cluster the corpus, compare embeddings ONLY within a cluster, connect pairs
above a cosine threshold into a similarity graph, keep the minimum id per
connected component (reuses the hash-min WCC survivor machinery from
functions/dedup.py). The cluster step bounds the pair space to
Σ_c |cell_c|² instead of n² — the property that makes semantic dedup
feasible at 100 TB.

Scale notes:
- assignment is a broadcast join (k·dim centroid floats are metadata-tier);
  the winner is a struct-max AGG, not a window — no per-id sort, skew-safe;
- the centroid update shuffles (cell, pos) partial sums with map-side
  combine: |V|·dim rows pre-combine, k·dim rows after;
- centroid frames are localCheckpoint'd per iteration (tiny), so lineage
  never compounds (CLAUDE.md rule 1);
- within-cell pair generation is an equi-join on the cell id, so a cell is
  a partition; degenerate cells are bounded by k chosen ∝ corpus size.

Training-pipeline ops beyond the reference (round brief); no reference twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.similarity import cosine_expr

_A, _C, _M = 1103515245, 12345, 2147483648


def _init_centroids(
    vecs: DataFrame, k: int, seed: int
) -> DataFrame:
    """First k corpus vectors in LCG order (cross-engine reproducible —
    same formula as knn_ivf's coarse quantizer). (ctid, cv)."""
    lcg = (F.col("id").cast("long") + F.lit(seed)) * F.lit(_A) + F.lit(_C)
    return (
        vecs.orderBy(F.pmod(lcg.cast("long"), F.lit(_M)), F.col("id"))
        .limit(k)
        .select(F.col("id").alias("ctid"), F.col("v").alias("cv"))
    )


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(id, cell, cos): nearest centroid by ROUNDED cosine with min-ctid
    tie-break, as one struct-max agg (no window — no per-id sort task)."""
    scored = vecs.join(F.broadcast(cents)).select(
        "id", "ctid", F.round(cosine_expr("v", "cv"), 6).alias("ccos")
    )
    best = scored.groupBy("id").agg(
        F.max(F.struct(F.col("ccos"), (-F.col("ctid")).alias("nct"))).alias("b")
    )
    return best.select(
        "id",
        (-F.col("b.nct")).cast("long").alias("cell"),
        F.col("b.ccos").alias("cos"),
    )


def kmeans(
    corpus: DataFrame,
    k: int = 8,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """(id, cell, cos): Lloyd k-means cell assignment after `iterations`
    fixed assign→update rounds (plus the final assign). `cell` is the
    ORIGINAL id of the seed vector that founded the centroid (stable across
    engines — no rank remap needed); `cos` is the rounded cosine to the
    final centroid. Per-dim means are rounded to 6 each update so FP
    summation-order noise never compounds across iterations (CLAUDE.md
    rule 5). Cells that lose all members simply drop out (both engines)."""
    vecs = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    cents = _init_centroids(vecs, k, seed)
    for _ in range(iterations):
        asg = _assign(vecs, cents)
        member_dims = vecs.join(asg.select("id", "cell"), "id").select(
            "cell", F.posexplode("v").alias("pos", "val")
        )
        cents = (
            member_dims.groupBy("cell", "pos")
            .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("cv1"))
            .groupBy("cell")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "cv1"))).alias("s")
            )
            .select(
                F.col("cell").alias("ctid"),
                F.transform("s", lambda x: x["cv1"]).alias("cv"),
            )
        )
        # k·dim rows — truncate lineage so the unrolled iteration pyramid
        # never re-evaluates (rule 1); cheap at centroid size
        cents = cents.localCheckpoint(eager=True)
    return _assign(vecs, cents)


def semantic_dedup(
    corpus: DataFrame,
    assignment: DataFrame,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, survivor, is_survivor): SemDeDup-style survivor selection.
    `assignment` is (id, cell) — typically kmeans() output — restricting
    candidate pairs to within-cell; pairs with rounded cosine ≥ threshold
    form the similarity graph whose per-component minimum id survives
    (near_dup_survivors: hash-min WCC, the same conservative transitive
    policy as text near-dup)."""
    from networkit_spark.functions.dedup import near_dup_survivors

    vecs = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    withcell = vecs.join(assignment.select("id", "cell"), "id")
    # rule 7: fresh column names on both sides of the self-join
    a = withcell.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), "cell"
    )
    b = withcell.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), "cell"
    )
    pairs = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b", F.round(cosine_expr("va", "vb"), 6).alias("cos")
        )
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b")
    )
    return near_dup_survivors(pairs, corpus.select(id_col))
