"""ANF — approximate neighborhood function via Flajolet–Martin bitmasks.

Reference: EffectiveDiameterApproximation / NeighborhoodFunctionApproximation
(networkit/cpp/distance/EffectiveDiameter*.cpp, paper cited at
include/networkit/distance/EffectiveDiameterApproximation.hpp:25-27):
per node, r FM bitmasks; each iteration ORs in the neighbors' masks, so
after h iterations a node's mask sketches its h-hop reachable set; the
lowest-zero-bit position estimates the cardinality.

Spark-native: masks are LONG columns (one per replica), the superstep is
    sketch'[u] = sketch[u] | bit_or over neighbors(sketch[v])
— `bit_or` is a built-in aggregate, so the whole sketch propagation is a
join + groupBy per hop with NO UDFs. This is the scalable path for
effective-diameter on 10^12-edge graphs where per-pair BFS is impossible.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF

_PHI = 0.77351  # FM bias correction constant


def _init_masks(v: DataFrame, replicas: int, seed: int) -> DataFrame:
    """Per node and replica: one bit set at a geometric position —
    P(bit=b) = 2^-(b+1), derived from trailing zeros of a seeded hash."""
    cols = []
    for r in range(replicas):
        h = F.abs(F.xxhash64("id", F.lit(seed), F.lit(r)))
        # position = count of trailing zero bits (geometric); cap at 40
        bitpos = F.least(
            F.length(
                F.regexp_extract(F.conv(h.cast("string"), 10, 2), "(0*)$", 1)
            ),
            F.lit(40),
        )
        # shiftleft() needs a literal shift amount; 2^bitpos via pow is
        # exact for bitpos <= 40
        cols.append(
            F.pow(F.lit(2.0), bitpos.cast("double")).cast("long").alias(f"m{r}")
        )
    return v.select("id", *cols)


def neighborhood_function_approx(
    graph: GraphDF,
    max_hops: int = 32,
    replicas: int = 8,
    seed: int = 42,
) -> list[float]:
    """Returns [N(1), N(2), ...]: estimated #pairs (u,v), u≠v, within h
    hops, stopping when the estimate stabilizes."""
    e = graph.E_sym.filter("src != dst").select("src", "dst")
    e = e.repartition("src").sortWithinPartitions("src").persist()
    e.count()
    sketch = _init_masks(graph.V.select("id"), replicas, seed)
    sketch = sketch.localCheckpoint(eager=True)
    mcols = [f"m{r}" for r in range(replicas)]
    est_prev = 0.0
    out: list[float] = []
    for _ in range(max_hops):
        nbr = (
            e.join(sketch, e.src == sketch.id)
            .groupBy("dst")
            .agg(*[F.bit_or(c).alias(f"n_{c}") for c in mcols])
        )
        merged = (
            sketch.join(nbr, sketch.id == nbr.dst, "left")
            .select(
                "id",
                *[
                    (
                        F.col(c).bitwiseOR(F.coalesce(f"n_{c}", F.lit(0)))
                    ).alias(c)
                    for c in mcols
                ],
            )
        ).localCheckpoint(eager=True)
        # estimate per node: 2^(lowest zero bit) / phi, averaged over replicas
        ests = []
        for c in mcols:
            # lowest zero bit of mask = length of trailing ones run
            ones_run = F.length(
                F.regexp_extract(F.conv(F.col(c).cast("string"), 10, 2), "(1*)$", 1)
            )
            ests.append(F.pow(F.lit(2.0), ones_run.cast("double")))
        avg = sum(ests) / replicas / _PHI - 1.0  # minus self
        total = merged.agg(F.sum(avg)).collect()[0][0] or 0.0
        sketch = merged
        out.append(float(total))
        if abs(total - est_prev) <= 1e-9 * max(total, 1.0):
            break
        est_prev = total
    e.unpersist()
    return out


def effective_diameter_sketch(
    graph: GraphDF, ratio: float = 0.9, replicas: int = 8, seed: int = 42
) -> float:
    """Smallest h (with fractional interpolation, as the reference does)
    such that N(h) >= ratio * N(max)."""
    nf = neighborhood_function_approx(graph, replicas=replicas, seed=seed)
    if not nf:
        return 0.0
    total = nf[-1]
    target = ratio * total
    prev = 0.0
    for h, val in enumerate(nf, start=1):
        if val >= target:
            gain = val - prev
            if gain <= 0:
                return float(h)
            return (h - 1) + (target - prev) / gain
        prev = val
    return float(len(nf))


def hop_plot_approx(
    graph: GraphDF,
    max_hops: int = 32,
    replicas: int = 8,
    seed: int = 42,
) -> list[float]:
    """HopPlotApproximation (distance/HopPlotApproximation.cpp): the
    approximate fraction of connected ordered pairs within distance ≤ h,
    one entry per hop, from the same Flajolet–Martin sketch as
    neighborhood_function_approx: frac(h) = NF(h)/NF(∞) — the scale path,
    no n² state."""
    nf = neighborhood_function_approx(
        graph, max_hops=max_hops, replicas=replicas, seed=seed
    )
    if not nf or nf[-1] <= 0:
        return []
    total = nf[-1]
    return [x / total for x in nf]
