"""PLM — parallel Louvain method (reference: networkit/cpp/community/
PLM.cpp:24, wrapper networkit/community.pyx:350-392).

Reference shape: repeat { move phase (greedy modularity-gain label moves)
until stable; contract by partition (ParallelPartitionCoarsening); recurse }
then prolong labels back down. The reference's move phase is asynchronous
parallel; as with PLP (north rule), this engine runs SYNCHRONOUS sweeps
with a deterministic tie-break (max gain, then min target label), so
results are reproducible at any parallelism.

Modularity gain of moving u into community C (PLM.cpp modularity delta):
    Δ(u→C) = (w(u,C) − w(u,C_u\\{u}})) / m
             + γ·((vol(C_u)−vol(u))·vol(u) − vol(C)·vol(u)) / (2m²)
Evaluated per candidate community via one groupBy over the neighbor join;
the best target per node wins. Each level's graph is a contraction, so
level sizes shrink geometrically — the same economics as the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF
from networkit_spark.operators.community import coarsen_by_partition

_LCG_M = 1 << 31


def _half_selector(sweep: int, hash_fn: str):
    """Boolean column: does this node move in this sweep? Half the nodes
    per sweep, deterministically."""
    if hash_fn == "lcg":
        s1 = (F.col("id") * F.lit(1103515245) + F.lit(12345 + sweep)) % F.lit(
            _LCG_M
        )
        s2 = (s1 * F.lit(1103515245) + F.lit(12345)) % F.lit(_LCG_M)
        # bit 15 of the twice-mixed state (low LCG bits are structured)
        return (s2 % F.lit(65536)) < F.lit(32768)
    return F.pmod(F.abs(F.xxhash64("id", F.lit(sweep))), F.lit(2)) == 0


def _move_phase(
    graph: GraphDF,
    gamma: float,
    max_sweeps: int,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Synchronous greedy modularity sweeps on one level; returns
    (id, label).

    hash_fn selects the deterministic half-of-nodes-per-sweep conflict
    breaker: "xxhash64" (library default) or "lcg" — two LCG rounds
    (CLAUDE.md rule 9) with the selector on bit 15, pure integer
    arithmetic that DuckDB reproduces exactly so the driver's
    plm_move_supplier_co query gets a full value oracle."""
    e = graph.E_sym.select("src", "dst", "weight")
    e = e.repartition("src").sortWithinPartitions("src").persist()
    e.count()
    total_w = graph.total_edge_weight()  # m (self-loops counted once)
    if total_w == 0:
        return graph.V.select("id", F.col("id").alias("label"))

    # node volumes: weighted degree with self-loops twice (Modularity.cpp:50)
    vol = graph.weighted_degrees(count_self_loops_twice=True).select(
        "id", F.col("wdeg").alias("vol_u")
    ).persist()

    labels = graph.V.select("id", F.col("id").alias("label"))
    labels = labels.localCheckpoint(eager=True)

    for sweep in range(max_sweeps):
        com_vol = (
            labels.join(vol, "id")
            .groupBy("label")
            .agg(F.sum("vol_u").alias("vol_c"))
        )
        lab_w = labels.withColumnRenamed("id", "src").withColumnRenamed(
            "label", "nbr_label"
        )
        # w(u, C): weight from u to each neighboring community (self-loops
        # excluded from candidate weights)
        u2c = (
            e.filter("src != dst")
            .join(lab_w, "src")
            .groupBy(F.col("dst").alias("id"), F.col("nbr_label").alias("cand"))
            .agg(F.sum("weight").alias("w_uc"))
        )
        own = labels.select("id", F.col("label").alias("own"))
        cand = (
            u2c.join(own, "id")
            .join(vol, "id")
            .join(
                com_vol.select(
                    F.col("label").alias("cand"), F.col("vol_c").alias("vol_cand")
                ),
                "cand",
            )
            .join(
                com_vol.select(
                    F.col("label").alias("own"), F.col("vol_c").alias("vol_own")
                ),
                "own",
            )
        )
        # w(u, C_u \ {u}) — weight to own community (0 if no row)
        w_own = cand.filter(F.col("cand") == F.col("own")).select(
            "id", F.col("w_uc").alias("w_uown")
        )
        scored = cand.join(w_own, "id", "left").select(
            "id",
            "cand",
            "own",
            (
                (F.col("w_uc") - F.coalesce("w_uown", F.lit(0.0))) / total_w
                + F.lit(gamma)
                * (
                    (F.col("vol_own") - F.col("vol_u")) * F.col("vol_u")
                    - F.when(
                        F.col("cand") == F.col("own"),
                        (F.col("vol_own") - F.col("vol_u")),
                    ).otherwise(F.col("vol_cand"))
                    * F.col("vol_u")
                )
                / F.lit(2.0 * total_w * total_w)
            ).alias("gain"),
        )
        # best move per node — max gain, min cand tie-break — as ONE
        # map-side-combinable aggregation (min over (-gain, cand) structs)
        # instead of a window: same exchange, no sort stage
        winner = (
            scored.groupBy("id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("gain")).alias("ng"), F.col("cand").alias("cand")
                    )
                ).alias("top")
            )
            .select("id", F.col("top.cand").alias("cand"),
                    (-F.col("top.ng")).alias("gain"))
            .filter(F.col("gain") > 1e-12)  # strict improvement only
            # synchronous-move conflict breaker: adjacent nodes moving into
            # each other's communities simultaneously oscillate (the classic
            # sync-Louvain pathology); a deterministic hash-selected half of
            # the nodes moves per sweep, which provably breaks 2-cycles while
            # staying reproducible at any parallelism. The selector is
            # applied at move time (not as a filter) so convergence can be
            # tested on the PRE-selector winner set: "no node has a
            # positive-gain move" is a true fixpoint (all later sweeps
            # no-op at any selector phase), whereas "nothing changed this
            # sweep" can merely mean the selected half had no winners —
            # breaking there would diverge from a fixed-sweep unroll.
            .select(
                "id",
                F.col("cand").alias("new_label"),
                _half_selector(sweep, hash_fn).alias("sel"),
            )
        )
        joined = labels.join(winner, "id", "left").select(
            "id",
            F.when(F.col("sel"), F.col("new_label"))
            .otherwise(F.col("label"))
            .alias("new"),
            F.col("new_label").isNotNull().alias("had_winner"),
        ).persist()
        n_winners = int(
            joined.agg(F.sum(F.col("had_winner").cast("long"))).collect()[0][0]
            or 0
        )
        labels = joined.select("id", F.col("new").alias("label")).localCheckpoint(
            eager=True
        )
        joined.unpersist()
        if n_winners == 0:
            break
    e.unpersist()
    vol.unpersist()
    return labels


def plm_move_phase(
    graph: GraphDF,
    gamma: float = 1.0,
    max_sweeps: int = 16,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """One Louvain local-moving phase, no contraction (PLM.cpp:24 move
    phase on a single level). With hash_fn='lcg' and a fixed sweep count
    the result is DuckDB-unrollable — the driver's plm_move_supplier_co
    oracle. Edge weights must be integer-valued for the cross-engine
    value match (exact double sums → bit-identical gains)."""
    return _move_phase(graph, gamma, max_sweeps, hash_fn)


def plm(
    graph: GraphDF,
    gamma: float = 1.0,
    max_levels: int = 10,
    max_sweeps_per_level: int = 16,
    hash_fn: str = "xxhash64",
    fixed: bool = False,
) -> DataFrame:
    """(id, label): hierarchical Louvain. Labels compacted per level;
    prolongation composes the per-level mappings top-down.

    `fixed=True` runs EXACTLY max_levels contraction levels (no
    converged-early exit) — with hash_fn='lcg' every level's move phase,
    dense-rank compaction and contraction is pure integer/exact-double
    arithmetic DuckDB reproduces, so the driver's plm_supplier_co query
    unrolls to a FULL value oracle (the move-phase early break inside a
    level is safe either way: "no node has a positive-gain move" is a
    true fixpoint, so the oracle's full per-level unroll no-ops past
    it)."""
    level_graph = graph
    mappings: list[DataFrame] = []
    for _ in range(max_levels):
        labels = _move_phase(level_graph, gamma, max_sweeps_per_level, hash_fn)
        if not fixed:
            n_coms = labels.select("label").distinct().count()
            n_nodes = level_graph.number_of_nodes()
        coarse, mapping = coarsen_by_partition(level_graph, labels)
        # stats_safe_checkpoint, not bare localCheckpoint: each level's
        # tables are joins over the previous level's, and Catalyst's
        # multiplied sizeInBytes survives localCheckpoint — reset it to the
        # real cached size per level or the estimate grows
        # super-exponentially across levels (plans/checkpoint.py)
        from networkit_spark.plans.checkpoint import stats_safe_checkpoint

        mappings.append(stats_safe_checkpoint(mapping))
        if not fixed and n_coms == n_nodes:
            break
        level_graph = GraphDF(
            stats_safe_checkpoint(coarse.V),
            stats_safe_checkpoint(coarse.E),
            directed=coarse.directed,
            weighted=True,
        )
    # prolong: compose mappings bottom level first
    out = mappings[0]
    for m in mappings[1:]:
        m2 = m.select(
            F.col("id").alias("prev_super"), F.col("super_id").alias("next_super")
        )
        out = (
            out.join(m2, out.super_id == m2.prev_super)
            .select("id", F.col("next_super").alias("super_id"))
        )
    return out.select("id", F.col("super_id").cast("long").alias("label"))
