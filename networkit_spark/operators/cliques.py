"""MaximalCliques (SURVEY §2.8) — Eppstein-Löffler-Strash re-expressed as
a per-vertex local enumeration.

Reference: networkit/cpp/clique/MaximalCliques.cpp — degeneracy-ordered
Bron-Kerbosch with pivoting: for each vertex v in a core-decomposition
order, enumerate the maximal cliques whose minimum-order member is v by
running BKPivot(R={v}, P=later neighbors, X=earlier neighbors) on the
subgraph induced on N(v).

Spark shape (the MapReduce-ELS decomposition, cf. Svendsen et al.,
"Mining maximal cliques from a large graph using MapReduce"):
  1. core numbers from the existing h-index CoreDecomposition — the
     enumeration order key is (core, id); ANY total order is correct
     (each clique is still emitted exactly once, from its minimum-order
     member), the core-based order just bounds |P| by the degeneracy.
  2. one triangle-style wedge join builds, per vertex v, the adjacency
     among N(v) (the triangles through v) — the only state a subproblem
     needs; neighbor lists carry the later/earlier flag.
  3. groupBy(v).applyInPandas runs the pivoting Bron-Kerbosch per
     subproblem — pure local compute on Arrow batches, no Python in any
     join path. Per-task state is O(d(v)²) worst case; P (the growth
     frontier) is bounded by the degeneracy, X only gates maximality.

Each maximal clique is emitted exactly once, by its minimum-(core,id)
member, as a sorted id array.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from networkit_spark.graph import GraphDF

_OUT_SCHEMA = "clique array<long>"


def _bk_pivot(adj: dict, r: list, p: set, x: set, out: list) -> None:
    """Classic BKPivot (MaximalCliques.cpp:150-210): pivot = the P∪X vertex
    with most neighbors in P; recurse on P ∖ N(pivot)."""
    if not p and not x:
        out.append(sorted(r))
        return
    pivot, best = None, -1
    for u in p | x:
        cnt = len(adj.get(u, frozenset()) & p)
        if cnt > best:
            pivot, best = u, cnt
    for v in list(p - adj.get(pivot, frozenset())):
        nv = adj.get(v, frozenset())
        _bk_pivot(adj, r + [v], p & nv, x & nv, out)
        p.remove(v)
        x.add(v)


def maximal_cliques(graph: GraphDF) -> DataFrame:
    """(clique: array<long>) — every maximal clique once, members sorted.
    Isolated vertices form their own (singleton) maximal clique, matching
    the reference (it enumerates {v} when N(v) = ∅)."""
    from networkit_spark.operators.kcore import core_decomposition

    nb = graph.E_sym.filter("src != dst").select("src", "dst").distinct()
    core = core_decomposition(graph).select(
        "id", F.col("core").cast("long").alias("core")
    )

    # total order key: (core, id) packed into one long (core ≤ n, id < 2^32
    # on fixture tiers; the pack is only an ORDER, collisions impossible
    # since id is the low part)
    key = core.select(
        "id", (F.col("core") * F.lit(1 << 32) + F.col("id")).alias("okey")
    )
    k_src = key.select(F.col("id").alias("src"), F.col("okey").alias("k_src"))
    k_dst = key.select(F.col("id").alias("dst"), F.col("okey").alias("k_dst"))
    nbk = nb.join(k_src, "src").join(k_dst, "dst")

    # neighbor records: (v, kind=0, a=neighbor, b=is_later)
    neigh = nbk.select(
        F.col("src").alias("v"),
        F.lit(0).alias("kind"),
        F.col("dst").alias("a"),
        (F.col("k_dst") > F.col("k_src")).cast("long").alias("b"),
    )
    # adjacency among N(v): triangles through v — oriented wedge + closure
    w1 = nb.select(F.col("src").alias("v"), F.col("dst").alias("a"))
    w2 = nb.select(F.col("src").alias("v"), F.col("dst").alias("b"))
    wedges = w1.join(w2, "v").filter(F.col("a") < F.col("b"))
    canon = nb.filter(F.col("src") < F.col("dst")).select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    tri = wedges.join(canon, ["a", "b"], "left_semi").select(
        "v", F.lit(1).alias("kind"), "a", "b"
    )
    # isolated vertices: singleton subproblems (kind=2 marker row)
    isolated = graph.V.join(
        nb.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).select(
        F.col("id").alias("v"),
        F.lit(2).alias("kind"),
        F.lit(0).cast("long").alias("a"),
        F.lit(0).cast("long").alias("b"),
    )

    sub = neigh.unionByName(tri).unionByName(isolated)

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        v = int(pdf["v"].iloc[0])
        if (pdf["kind"] == 2).any():
            return pd.DataFrame({"clique": [[v]]})
        nrec = pdf[pdf["kind"] == 0]
        later = set(nrec.loc[nrec["b"] == 1, "a"].astype(int))
        earlier = set(nrec.loc[nrec["b"] == 0, "a"].astype(int))
        adj: dict = {u: set() for u in later | earlier}
        for a, b in pdf.loc[pdf["kind"] == 1, ["a", "b"]].itertuples(
            index=False
        ):
            a, b = int(a), int(b)
            adj[a].add(b)
            adj[b].add(a)
        adj = {u: frozenset(s) for u, s in adj.items()}
        out: list = []
        _bk_pivot(adj, [v], set(later), set(earlier), out)
        return pd.DataFrame({"clique": out}) if out else pd.DataFrame(
            {"clique": pd.Series([], dtype=object)}
        )

    return sub.groupBy("v").applyInPandas(run, _OUT_SCHEMA)


def maximal_clique_count(graph: GraphDF) -> int:
    return maximal_cliques(graph).count()
