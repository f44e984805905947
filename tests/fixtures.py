"""Deterministic graph fixtures (FIXTURES.md F2-F4, F6, F8).

All edge lists are (src, dst, weight) with dense ids unless noted.
Undirected graphs are stored symmetrized (both directions), matching the
reference SNAP reader (Main.java:633-635).
"""

from __future__ import annotations

import numpy as np

# F3 — the README example graph re-expressed in DMID input format
# (README.md:249-257 / :312): N=5, m=12.
GOLDEN_EDGES = [
    (0, 1, 1.0),
    (0, 3, 3.0),
    (1, 0, 1.0),
    (1, 2, 2.0),
    (1, 3, 1.0),
    (2, 1, 2.0),
    (2, 4, 4.0),
    (3, 0, 3.0),
    (3, 1, 1.0),
    (3, 4, 4.0),
    (4, 3, 4.0),
    (4, 2, 4.0),
]
GOLDEN_N = 5


def symmetrize(edges):
    seen = {}
    for s, d, w in edges:
        seen[(s, d)] = max(w, seen.get((s, d), 0.0))
        seen[(d, s)] = max(w, seen.get((d, s), 0.0))
    return [(s, d, w) for (s, d), w in sorted(seen.items())]


def clique(ids, weight=1.0):
    return [(a, b, weight) for a in ids for b in ids if a != b]


def two_cliques_bridge(size=6):
    """F4: two k-cliques joined by one (undirected) bridge edge."""
    a = list(range(size))
    b = list(range(size, 2 * size))
    edges = clique(a) + clique(b) + [(size - 1, size, 1.0), (size, size - 1, 1.0)]
    return sorted(set(edges)), 2 * size


def ring_of_cliques(k=4, size=5):
    """F4: k cliques of `size`, consecutive cliques joined by one edge."""
    edges = []
    for c in range(k):
        ids = list(range(c * size, (c + 1) * size))
        edges += clique(ids)
        nxt = ((c + 1) % k) * size
        edges += [(ids[-1], nxt, 1.0), (nxt, ids[-1], 1.0)]
    return sorted(set(edges)), k * size


def star(n_leaves=9):
    """F4: hub 0 + leaves, undirected."""
    edges = []
    for i in range(1, n_leaves + 1):
        edges += [(0, i, 1.0), (i, 0, 1.0)]
    return edges, n_leaves + 1


def directed_path(n=6):
    """F4: 0→1→…→n-1 (exercises restart schedule; sink unassignable)."""
    return [(i, i + 1, 1.0) for i in range(n - 1)], n


def sparse_ids_graph():
    """F6: non-dense vertex ids."""
    raw = [(3, 17, 1.0), (17, 42, 2.0), (1000000007, 3, 1.0), (42, 3, 1.0)]
    return raw


def random_graph(n=200, avg_deg=6, seed=42, weighted=True):
    """Seeded directed Erdos-Renyi-ish graph (dense ids, no self-loops)."""
    rng = np.random.default_rng(seed)
    m = n * avg_deg
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    w = rng.integers(1, 5, size=len(src)).astype(float) if weighted else np.ones(len(src))
    seen = {}
    for s, d, ww in zip(src, dst, w):
        seen[(int(s), int(d))] = float(ww)
    return [(s, d, ww) for (s, d), ww in sorted(seen.items())], n


def powerlaw_graph(n=10_000, m_per=8, seed=7):
    """Seeded preferential-attachment-ish multigraph → simple digraph.
    Used for bench (F8) and skew tests (hub vertices)."""
    rng = np.random.default_rng(seed)
    targets = np.arange(m_per)
    edges = {}
    repeated = list(range(m_per))
    for v in range(m_per, n):
        picks = rng.choice(repeated, size=m_per, replace=True)
        for t in set(int(x) for x in picks):
            if v != t:
                edges[(v, t)] = edges.get((v, t), 0) + 1.0
        repeated.extend(int(x) for x in picks)
        repeated.extend([v] * m_per)
    return [(s, d, w) for (s, d), w in sorted(edges.items())], n
