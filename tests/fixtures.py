"""Tiny golden graphs transplanted from the reference gtests (FIXTURES.md §3).

Edges are plain python lists so both the Spark kernels and the numpy
oracles consume the same source of truth.
"""

# 3.1 tiny_cc — 20 nodes, 14 undirected edges, exactly 5 components
# (ConnectedComponentsGTest.cpp:31-65)
TINY_CC_N = 20
TINY_CC_EDGES = [
    (0, 1), (1, 2), (2, 4), (4, 8), (8, 16), (16, 19),
    (3, 5), (5, 6), (6, 7), (7, 9),
    (10, 11), (10, 18), (10, 12), (18, 17),
    (13, 14),
]
TINY_CC_EXPECTED = {
    **{v: 0 for v in [0, 1, 2, 4, 8, 16, 19]},
    **{v: 1 for v in [3, 5, 6, 7, 9]},
    **{v: 2 for v in [10, 11, 12, 17, 18]},
    **{v: 3 for v in [13, 14]},
    15: 4,
}

# 3.2 tiny_bc — 6-node bowtie-ish graph with a 4-cycle, ZERO triangles
# (CentralityGTest.cpp:67-76)
TINY_BC_N = 6
TINY_BC_EDGES = [(0, 2), (1, 2), (2, 3), (2, 4), (3, 5), (4, 5)]

# 3.4 karate34 — Zachary karate club, 34 nodes / 78 edges (public edge list,
# analog of input/karate.graph). 45 triangles total.
KARATE_N = 34
KARATE_EDGES = [
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31),
    (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30),
    (2, 3), (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32),
    (3, 7), (3, 12), (3, 13),
    (4, 6), (4, 10),
    (5, 6), (5, 10), (5, 16),
    (6, 16),
    (8, 30), (8, 32), (8, 33),
    (9, 33),
    (13, 33),
    (14, 32), (14, 33),
    (15, 32), (15, 33),
    (18, 32), (18, 33),
    (19, 33),
    (20, 32), (20, 33),
    (22, 32), (22, 33),
    (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31),
    (25, 31),
    (26, 29), (26, 33),
    (27, 33),
    (28, 31), (28, 33),
    (29, 32), (29, 33),
    (30, 32), (30, 33),
    (31, 32), (31, 33),
    (32, 33),
]
KARATE_TRIANGLES_TOTAL = 45

# 3.5 lcc_extract — largest-component extraction golden
# (test_algorithms.py:429-443 analog)
LCC_EXTRACT_N = 10
LCC_EXTRACT_EDGES = [(0, 1), (1, 2), (2, 3), (4, 5), (5, 6), (6, 7), (7, 8), (8, 9)]
LCC_EXTRACT_LARGEST_NODES = 6
LCC_EXTRACT_LARGEST_EDGES = 5


def powerlaw_directed_edges(n: int = 300, m: int = 2400, seed: int = 7):
    """3.6 powerlaw_directed — deterministic R-MAT-style directed skew graph
    (wiki-Vote analog) with a mega-hub. Pure-python LCG, no RNG state."""
    A, C, M = 1103515245, 12345, 2147483648

    def lcg(x):
        return ((x % M) * A + C) % M

    edges = set()
    levels = max(1, (n - 1).bit_length())
    for e in range(m * 3):  # oversample; dedup; stop at m
        u = v = 0
        h = lcg(e * 2654435761 + seed)
        for b in range(levels):
            h = lcg(h + b)
            q = h % 100
            # R-MAT quadrant probabilities a=0.6 b=0.15 c=0.15 d=0.1 → hubs
            if q < 60:
                pass
            elif q < 75:
                v |= 1 << b
            elif q < 90:
                u |= 1 << b
            else:
                u |= 1 << b
                v |= 1 << b
        u, v = u % n, v % n
        if u != v:
            edges.add((u, v))
        if len(edges) >= m:
            break
    return sorted(edges)
