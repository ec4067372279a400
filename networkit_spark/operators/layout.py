"""Graph layout (viz family) — PivotMDS + PostscriptWriter.

Reference analogs:
- PivotMDS (networkit/cpp/viz/PivotMDS.cpp:19-121): pick `num_pivots`
  pivot nodes, run SSSP from each, double-center the n×k pivot-distance
  matrix C, power-iterate CᵀC (k×k) for the top `dim` eigenvectors with
  deflation, and project coordinates as C·v_d.
- PostscriptWriter (networkit/cpp/viz/PostscriptWriter.cpp:38-170):
  EPS drawing of edges + node discs, cluster-colored, 1020×1020 canvas.

Spark-first decomposition of PivotMDS — the three data-sized steps are
distributed, the k-sized step is driver numpy:
  1. pivot distances: one batched multi-source SSSP (operators/bfs.py
     sssp_multi_distances) — the n×k triplet table never funnels through
     the driver;
  2. double centering: two aggregations (row means by node, col means by
     pivot — k rows, broadcast back) + one scalar, then a column
     expression per triplet, exactly PivotMDS.cpp:44-67 (RAW distances,
     not squared — the reference centers dist, a known NetworKit quirk;
     unreached (node,pivot) pairs are absent from the triplet set and
     stay implicit zeros, matching the reference's sparse CSR);
  3. Gram matrix CᵀC: per-Arrow-batch numpy outer-product accumulation in
     mapInPandas (each batch yields one k×k partial; the driver sums
     ~num_partitions tiny matrices) — never a k² shuffle;
  4. eigensolve: power method with deflation on the k×k Gram, driver-side
     numpy, LCG-seeded init (PivotMDS.cpp:122-141 semantics: random init
     in [-1,1), normalize per step, 1e-6 / 1500-iteration stop);
  5. projection pos_d = C·v_d: one distributed pass, the k-vector enters
     as a broadcast literal array.

At 100 TB the only superlinear object is the n×k triplet table; k is a
constant (250 default), so every stage is a linear scan or a bounded
aggregation — no all-pairs anything.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.functions.sampling import lcg_priority
from networkit_spark.graph import GraphDF
from networkit_spark.operators.bfs import sssp_multi_distances

LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2147483648  # 2^31


def _lcg_uniform(seed: int, n: int) -> np.ndarray:
    """n LCG draws in [-1, 1) — the repo's cross-engine deterministic RNG
    (CLAUDE.md rule 9), standing in for Aux::Random::real()."""
    out = np.empty(n)
    x = seed % LCG_M
    for i in range(n):
        x = (x * LCG_A + LCG_C) % LCG_M
        out[i] = 2.0 * (x / LCG_M) - 1.0
    return out


def power_method_deflate(
    gram: np.ndarray,
    dim: int,
    seed: int = 42,
    tol: float = 1e-6,
    max_iterations: int = 1500,
) -> list[np.ndarray]:
    """Top-`dim` eigenvectors of a small symmetric PSD matrix by power
    iteration with deflation (PivotMDS.cpp:122-141 + the factor
    eigenvalue/‖v‖²·vvᵀ subtraction at :92-103). Returns UNnormalized-
    eigenvalue-scaled vectors? No — returns the unit eigenvectors; the
    caller projects with them directly as the reference does."""
    mat = gram.astype(float).copy()
    k = mat.shape[0]
    vecs = []
    for d in range(dim):
        v = _lcg_uniform(seed + d, k)
        for _ in range(max_iterations):
            old = v
            v = mat @ old
            nrm = float(np.linalg.norm(v))
            if nrm == 0.0:
                v = old
                break
            v = v / nrm
            if float(np.linalg.norm(v - old)) <= tol:
                break
        eigenvalue = float(v @ (mat @ v)) / float(v @ v)
        vecs.append(v)
        # deflate: mat -= (λ/‖v‖²)·vvᵀ  (‖v‖ = 1 here)
        mat = mat - eigenvalue * np.outer(v, v)
    return vecs


def select_pivots(graph: GraphDF, num_pivots: int, seed: int = 42) -> list[int]:
    """num_pivots distinct nodes by smallest LCG priority (id tie-break) —
    the deterministic stand-in for PivotMDS::computePivots' repeated
    randomNode draws (PivotMDS.cpp:106-121). A global top-k, not a sort:
    Spark's TakeOrderedAndProject never materializes a single partition."""
    rows = (
        graph.V.select("id", lcg_priority(F.col("id"), seed).alias("p"))
        .orderBy("p", "id")
        .limit(num_pivots)
        .collect()
    )
    return [int(r["id"]) for r in rows]


def pivot_mds(
    graph: GraphDF,
    dim: int = 2,
    num_pivots: int = 250,
    seed: int = 42,
    max_sssp_iterations: int = 10_000,
) -> DataFrame:
    """(id:long, c0:double, …, c{dim-1}:double) — PivotMDS coordinates.

    Mirrors PivotMDS::run (viz/PivotMDS.cpp:19-104) with the decomposition
    described in the module docstring. Nodes unreachable from every pivot
    get all-zero coordinates (zero C rows project to 0), as in the
    reference's sparse arithmetic.
    """
    k = num_pivots
    pivots = select_pivots(graph, k, seed)
    k = len(pivots)  # graph may have fewer nodes than requested pivots
    if k == 0:
        out = graph.V
        for d in range(dim):
            out = out.withColumn(f"c{d}", F.lit(0.0))
        return out
    n = graph.V.count()

    # 1. pivot-distance triplets (pivot source, node id, dist) — only
    #    reached pairs exist, matching the reference triplet set.
    pividx = {p: j for j, p in enumerate(pivots)}
    dist = sssp_multi_distances(graph, pivots, max_iterations=max_sssp_iterations)
    idx_map = F.create_map(
        *[F.lit(x) for pj in pividx.items() for x in pj]
    )
    trip = dist.select(
        idx_map[F.col("source")].alias("j"),
        "id",
        F.col("dist").alias("d"),
    ).persist()

    # 2. double centering (PivotMDS.cpp:44-67, raw distances).
    row_mean = trip.groupBy("id").agg((F.sum("d") / F.lit(float(k))).alias("rm"))
    col_rows = trip.groupBy("j").agg((F.sum("d") / F.lit(float(n))).alias("cm")).collect()
    col_mean = {int(r["j"]): float(r["cm"]) for r in col_rows}
    sums = trip.agg(F.sum("d").alias("s")).collect()[0]
    total = float(sums["s"] or 0.0)
    # grand = Σ_i rowMean_i/(2n) + Σ_j colMean_j/(2k); both sums equal
    # total/k and total/n respectively — keep the reference's form.
    grand = (total / k) / (2.0 * n) + (total / n) / (2.0 * k)
    cm_arr = F.array(*[F.lit(col_mean.get(j, 0.0)) for j in range(k)])
    centered = (
        trip.join(row_mean, "id")
        .select(
            "id",
            "j",
            (
                F.col("d")
                - F.col("rm")
                - F.element_at(cm_arr, F.col("j") + 1)
                + F.lit(grand)
            ).alias("c"),
        )
    )

    # wide per-node sparse rows: (id, idxs:array<int>, vals:array<double>)
    wide = centered.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("j", "c"))).alias("jc")
    ).select(
        "id",
        F.transform("jc", lambda s: s["j"]).alias("idxs"),
        F.transform("jc", lambda s: s["c"]).alias("vals"),
    ).persist()
    wide.count()
    trip.unpersist()

    # 3. Gram = CᵀC via per-batch numpy accumulation (k×k per batch).
    def gram_partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((k, k))
        any_rows = False
        for pdf in batches:
            if not len(pdf):
                continue
            any_rows = True
            dense = np.zeros((len(pdf), k))
            for r, (idxs, vals) in enumerate(zip(pdf["idxs"], pdf["vals"])):
                dense[r, np.asarray(idxs, dtype=int)] = np.asarray(vals)
            acc += dense.T @ dense
        if any_rows:
            yield pd.DataFrame({"g": [acc.ravel().tolist()]})

    partials = wide.select("idxs", "vals").mapInPandas(
        gram_partial, schema="g array<double>"
    ).collect()
    gram = np.zeros((k, k))
    for r in partials:
        gram += np.asarray(r["g"]).reshape(k, k)

    # 4. driver-side eigensolve of the k×k Gram.
    vecs = power_method_deflate(gram, dim, seed=seed)

    # 5. distributed projection pos_d = C·v_d for every dim at once.
    proj_cols = []
    for d, v in enumerate(vecs):
        v_arr = F.array(*[F.lit(float(x)) for x in v])
        proj_cols.append(
            F.aggregate(
                F.zip_with(
                    "vals",
                    F.transform("idxs", lambda j: F.element_at(v_arr, j + 1)),
                    lambda c, vj: c * vj,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias(f"c{d}")
        )
    coords = wide.select("id", *proj_cols)
    out = graph.V.join(coords, "id", "left").select(
        "id",
        *[F.coalesce(f"c{d}", F.lit(0.0)).alias(f"c{d}") for d in range(dim)],
    )
    out = out.localCheckpoint(eager=True)
    wide.unpersist()
    return out


# ------------------------------------------------------------- postscript
_PS_COLORS = [
    (1.0, 0.0, 0.0), (1.0, 0.5, 0.0), (1.0, 1.0, 0.0), (0.5, 1.0, 0.0),
    (0.0, 1.0, 0.0), (0.0, 1.0, 0.5), (0.0, 1.0, 1.0), (0.0, 0.5, 1.0),
    (0.0, 0.0, 1.0), (0.5, 0.0, 1.0), (1.0, 0.0, 1.0), (1.0, 0.0, 0.5),
    (0.6, 0.0, 0.0), (0.6, 0.3, 0.0), (0.6, 0.6, 0.0), (0.3, 0.6, 0.0),
    (0.0, 0.6, 0.0), (0.0, 0.6, 0.3), (0.0, 0.6, 0.6), (0.0, 0.3, 0.6),
    (0.0, 0.0, 0.6), (0.3, 0.0, 0.6), (0.6, 0.0, 0.6), (0.6, 0.0, 0.3),
]

_PS_MACROS = (
    "/p {newpath} bind def\n"
    "/m {moveto} bind def\n"
    "/r {rmoveto} bind def\n"
    "/k {rlineto} bind def\n"
    "/l {lineto} bind def\n"
    "/n {rlineto} bind def\n"
    "/c {setrgbcolor} bind def\n"
    "/s {stroke} bind def\n"
    "/w {setlinewidth} bind def\n"
    "/h {show} bind def\n"
    "/a {arc closepath fill} bind def\n"
    "/b {closepath eofill} bind def\n"
)


def write_postscript(
    graph: GraphDF,
    coordinates: DataFrame,
    path: str,
    clustering: DataFrame | None = None,
    is_torus: bool = False,
) -> None:
    """EPS drawing of the laid-out graph — PostscriptWriter.cpp:38-170.

    `coordinates` is the (id, c0, c1) frame pivot_mds returns; `clustering`
    an optional (id, label) partition — intra-cluster edges get the
    reference's 24-color cyclic palette, cut edges gray (ps.cpp:85-93).
    Fixture-format writer tier: collects (the reference also renders
    single-node; the distributed artifact is the coordinates frame itself).
    """
    size = 1020.0
    border = 10.0
    coords = {
        int(r["id"]): (float(r["c0"]), float(r["c1"]))
        for r in coordinates.select("id", "c0", "c1").collect()
    }
    clus = (
        {int(r[0]): int(r[1]) for r in clustering.collect()}
        if clustering is not None
        else None
    )
    if coords:
        xs = [p[0] for p in coords.values()]
        ys = [p[1] for p in coords.values()]
        mnx, mxx, mny, mxy = min(xs), max(xs), min(ys), max(ys)
    else:
        mnx = mxx = mny = mxy = 0.0
    sx = (size - 2 * border) / (mxx - mnx) if mxx > mnx else 1.0
    sy = (size - 2 * border) / (mxy - mny) if mxy > mny else 1.0

    def adj(p):
        return ((p[0] - mnx) * sx + border, (p[1] - mny) * sy + border)

    e = graph.E.select("src", "dst").collect()
    lines = []
    if is_torus:
        lines.append("%!PS-Adobe-3.0 EPSF-3.0\n")
    else:
        lines.append("%!PS-Adobe-1.0\n")
    lines.append("%%Title: NetworKit visualization\n")
    lines.append(f"%%BoundingBox: 0.000 0.000 {size:.1f} {size:.1f}\n")
    lines.append("%%EndComments\n")
    if not is_torus:
        lines.append("%%EndProlog\ngsave\n")
    lines.append(_PS_MACROS)
    for r in e:
        u, v = int(r["src"]), int(r["dst"])
        if u not in coords or v not in coords:
            continue
        if clus is not None and clus.get(u) == clus.get(v) and u in clus:
            cr, cg, cb = _PS_COLORS[clus[u] % len(_PS_COLORS)]
            lines.append(f"{cr:g} {cg:g} {cb:g} c ")
        else:
            lines.append("0.80 0.80 0.80 c 1.0 w ")
        x0, y0 = adj(coords[u])
        x1, y1 = adj(coords[v])
        if is_torus:
            dx, dy = x1 - x0, y1 - y0
            dx = dx - 1000.0 if dx > 500.0 else (dx + 1000.0 if dx < -500.0 else dx)
            dy = dy - 1000.0 if dy > 500.0 else (dy + 1000.0 if dy < -500.0 else dy)
            x1, y1 = x0 + dx, y0 + dy
        lines.append(f"p {x0:.3f} {y0:.3f} m {x1:.3f} {y1:.3f} l s\n")
    for u, p in sorted(coords.items()):
        if clus is not None and u in clus:
            cr, cg, cb = _PS_COLORS[clus[u] % len(_PS_COLORS)]
        else:
            cr, cg, cb = (0.0, 0.0, 0.0)
        x, y = adj(p)
        lines.append(f"{cr:g} {cg:g} {cb:g} c p {x:.3f} {y:.3f} 2.0 0.00 360.00 a s\n")
    if not is_torus:
        lines.append("grestore\n")
    with open(path, "w") as f:
        f.write("".join(lines))
