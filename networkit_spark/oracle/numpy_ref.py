"""Pure numpy/python reference oracles implementing the CITED reference
semantics exactly (SURVEY.md §2.3). Used only by tests — never by the
engine. Each function takes plain edge lists so tests stay Spark-free.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np


def pagerank_oracle(
    n: int,
    edges: list[tuple],
    directed: bool,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iterations: int | None = None,
    norm: str = "l2",
    node_ids: list[int] | None = None,
) -> dict[int, float]:
    """networkit/cpp/centrality/PageRank.cpp:19-81 exactly:
    in-edge sums, dangling mass dropped, L2 convergence, final renormalize."""
    ids = node_ids if node_ids is not None else list(range(n))
    idx = {v: i for i, v in enumerate(ids)}
    nn = len(ids)
    out_w = np.zeros(nn)
    adj_in = defaultdict(list)  # target -> [(source, weight)]
    for t in edges:
        u, v = t[0], t[1]
        w = float(t[2]) if len(t) > 2 else 1.0
        out_w[idx[u]] += w
        adj_in[idx[v]].append((idx[u], w))
        if not directed:
            if u != v:
                out_w[idx[v]] += w
                adj_in[idx[u]].append((idx[v], w))
    score = np.full(nn, 1.0 / nn)
    teleport = (1.0 - damping) / nn
    it = 0
    max_it = max_iterations if max_iterations is not None else 10**9
    while it < max_it:
        pr = np.full(nn, teleport)
        for tgt, ins in adj_in.items():
            s = 0.0
            for src, w in ins:
                s += score[src] * w / out_w[src]
            pr[tgt] += damping * s
        diff = pr - score
        delta = (
            math.sqrt(float(np.sum(diff * diff)))
            if norm == "l2"
            else float(np.sum(np.abs(diff)))
        )
        score = pr
        it += 1
        if delta <= tol:
            break
    score = score / score.sum()
    return {v: float(score[idx[v]]) for v in ids}


def connected_components_oracle(
    n: int, edges: list[tuple], node_ids: list[int] | None = None
) -> dict[int, int]:
    """ConnectedComponents.cpp:27-60: BFS in increasing node-id order ⇒
    component id = dense rank of per-component min node id."""
    ids = sorted(node_ids) if node_ids is not None else list(range(n))
    adj = defaultdict(set)
    for t in edges:
        u, v = t[0], t[1]
        adj[u].add(v)
        adj[v].add(u)
    comp: dict[int, int] = {}
    next_id = 0
    for v in ids:
        if v in comp:
            continue
        # BFS
        stack = [v]
        comp[v] = next_id
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in comp:
                    comp[y] = next_id
                    stack.append(y)
        next_id += 1
    return comp


def plp_oracle(
    n: int,
    edges: list[tuple],
    iterations: int | None = None,
    update_threshold: int = 0,
    node_ids: list[int] | None = None,
) -> dict[int, int]:
    """Synchronous PLP (our fixed semantics of PLP.cpp:22-114): every sweep
    each non-isolated node takes the label with max summed incident weight,
    ties to smallest label; isolated nodes keep their singleton."""
    ids = node_ids if node_ids is not None else list(range(n))
    adj = defaultdict(list)
    for t in edges:
        u, v = t[0], t[1]
        w = float(t[2]) if len(t) > 2 else 1.0
        adj[u].append((v, w))
        if u != v:
            adj[v].append((u, w))
    labels = {v: v for v in ids}
    it = 0
    max_it = iterations if iterations is not None else 10**9
    while it < max_it:
        weights_per_node = {}
        for v in ids:
            if not adj[v]:
                continue
            lw = defaultdict(float)
            for nbr, w in adj[v]:
                lw[labels[nbr]] += w
            best = max(lw.items(), key=lambda kv: (kv[1], -kv[0]))[0]
            weights_per_node[v] = best
        n_updated = sum(
            1 for v, lab in weights_per_node.items() if labels[v] != lab
        )
        labels.update(weights_per_node)
        it += 1
        if iterations is None and n_updated <= update_threshold:
            break
    return labels


def triangle_counts_oracle(
    n: int, edges: list[tuple], node_ids: list[int] | None = None
) -> dict[int, int]:
    """Exact per-node triangle counts (each triangle counts once per corner)."""
    ids = node_ids if node_ids is not None else list(range(n))
    adj = defaultdict(set)
    for t in edges:
        u, v = t[0], t[1]
        if u == v:
            continue
        adj[u].add(v)
        adj[v].add(u)
    tri = {v: 0 for v in ids}
    seen = set()
    for u in ids:
        for v in adj[u]:
            if v <= u:
                continue
            for w in adj[u] & adj[v]:
                if w <= v:
                    continue
                key = (u, v, w)
                if key not in seen:
                    seen.add(key)
                    tri[u] += 1
                    tri[v] += 1
                    tri[w] += 1
    return tri


def lcc_oracle(n: int, edges: list[tuple], node_ids=None) -> dict[int, float]:
    ids = node_ids if node_ids is not None else list(range(n))
    tri = triangle_counts_oracle(n, edges, node_ids=ids)
    deg = defaultdict(int)
    for t in edges:
        u, v = t[0], t[1]
        if u == v:
            continue
        deg[u] += 1
        deg[v] += 1
    return {
        v: (2.0 * tri[v] / (deg[v] * (deg[v] - 1)) if deg[v] >= 2 else 0.0)
        for v in ids
    }


def modularity_oracle(
    edges: list[tuple], labels: dict[int, int]
) -> float:
    """Modularity.cpp:25-87: Q = intra/total − Σ vol(C)² / (2m)²; self-loop
    weight counts twice in volume (Modularity.cpp:50), once in total."""
    total = 0.0
    intra = 0.0
    vol = defaultdict(float)
    for t in edges:
        u, v = t[0], t[1]
        w = float(t[2]) if len(t) > 2 else 1.0
        total += w
        if labels[u] == labels[v]:
            intra += w
        if u == v:
            vol[labels[u]] += 2 * w
        else:
            vol[labels[u]] += w
            vol[labels[v]] += w
    if total == 0:
        return 0.0
    q = intra / total
    denom = (2.0 * total) ** 2
    q -= sum(x * x for x in vol.values()) / denom
    return q
