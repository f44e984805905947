"""Tests for structural analytics: k-core, clustering coefficients,
degree assortativity, link prediction (algorithms/structure.py), each
against an independent NumPy re-derivation on the shared fixtures."""

from __future__ import annotations

import math

import numpy as np
import pytest

from fixtures import (
    random_graph,
    ring_of_cliques,
    star,
    two_cliques_bridge,
)
from dmid_spark import graph as G
from dmid_spark.algorithms import (
    clustering_coefficients,
    coreness,
    degree_assortativity,
    kcore,
    link_prediction,
)


# ---------------------------------------------------------------------------
# NumPy oracles
# ---------------------------------------------------------------------------
def und_adj(rows, n):
    """Undirected simple adjacency sets."""
    nbrs = [set() for _ in range(n)]
    for s, d, _ in rows:
        if s != d:
            nbrs[s].add(d)
            nbrs[d].add(s)
    return nbrs


def kcore_oracle(rows, n, k):
    nbrs = und_adj(rows, n)
    alive = {i for i in range(n) if nbrs[i]}
    changed = True
    while changed:
        drop = {v for v in alive if sum(1 for u in nbrs[v] if u in alive) < k}
        changed = bool(drop)
        alive -= drop
    return {v: sum(1 for u in nbrs[v] if u in alive) for v in alive}


def lcc_oracle(rows, n):
    nbrs = und_adj(rows, n)
    out = {}
    for v in range(n):
        d = len(nbrs[v])
        tri = 0
        for u in nbrs[v]:
            tri += len(nbrs[v] & nbrs[u])
        tri //= 2
        out[v] = (d, tri, 2.0 * tri / (d * (d - 1)) if d >= 2 else 0.0)
    return out


def assortativity_oracle(rows, n):
    nbrs = und_adj(rows, n)
    deg = [len(s) for s in nbrs]
    du, dv = [], []
    for v in range(n):
        for u in nbrs[v]:
            du.append(deg[v])
            dv.append(deg[u])
    du, dv = np.array(du, float), np.array(dv, float)
    if du.std() == 0 or dv.std() == 0:
        return None
    return float(np.corrcoef(du, dv)[0, 1])


def linkpred_oracle(rows, n, cap=None):
    nbrs = und_adj(rows, n)
    deg = [len(s) for s in nbrs]
    scores = {}
    for w in range(n):
        if cap is not None and deg[w] > cap:
            continue
        ns = sorted(nbrs[w])
        for i in range(len(ns)):
            for j in range(i + 1, len(ns)):
                a, b = ns[i], ns[j]
                cn, aa = scores.get((a, b), (0, 0.0))
                scores[(a, b)] = (cn + 1, aa + 1.0 / math.log(deg[w]))
    out = {}
    for (a, b), (cn, aa) in scores.items():
        if b in nbrs[a]:
            continue  # existing edge
        out[(a, b)] = (cn, cn / (deg[a] + deg[b] - cn), aa)
    return out


GRAPHS = {
    "two_cliques": two_cliques_bridge(),
    "ring": ring_of_cliques(),
    "star": star(),
    "random": random_graph(n=120, seed=23),
}


# ---------------------------------------------------------------------------
# k-core
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("name,k", [("two_cliques", 5), ("ring", 3), ("random", 4)])
def test_kcore_matches_oracle(spark, name, k):
    rows, n = GRAPHS[name]
    core, stats = kcore(G.edges_from_rows(spark, rows), k=k)
    got = {r["id"]: r["core_deg"] for r in core.collect()}
    assert stats.converged
    assert got == kcore_oracle(rows, n, k)


def test_kcore_empty_when_k_exceeds_max_degree(spark):
    rows, n = star()
    core, stats = kcore(G.edges_from_rows(spark, rows), k=2)
    assert core.count() == 0
    assert stats.converged


def test_kcore_extra_rounds_are_noop(spark):
    """Peeling past the fixpoint returns the same core — the invariant the
    bounded-round SQL oracle relies on."""
    rows, n = GRAPHS["random"]
    edges = G.edges_from_rows(spark, rows)
    c1, s1 = kcore(edges, k=4)
    c2, _ = kcore(edges, k=4, max_rounds=s1.rounds + 5)
    assert {tuple(r) for r in c1.collect()} == {tuple(r) for r in c2.collect()}


def test_structural_ops_handle_empty_graph(spark):
    """Every structural operator must return an empty (or degenerate)
    result on an empty edge table, never raise."""
    from dmid_spark.algorithms import hits, strongly_connected_components

    empty = spark.createDataFrame([], "src long, dst long, weight double")
    assert kcore(empty, k=2)[0].count() == 0
    assert coreness(empty)[0].count() == 0
    assert clustering_coefficients(empty).count() == 0
    row = degree_assortativity(empty).first()
    assert row["assortativity"] is None and row["n_edges"] == 0
    assert link_prediction(empty)[0].count() == 0
    assert hits(empty, max_iter=2)[0].count() == 0
    assert strongly_connected_components(empty)[0].count() == 0


# ---------------------------------------------------------------------------
# coreness (full decomposition via iterated neighborhood H-index)
# ---------------------------------------------------------------------------
def coreness_oracle(rows, n):
    """Core numbers by the standard min-degree peel."""
    nbrs = und_adj(rows, n)
    alive = {v for v in range(n) if nbrs[v]}
    deg = {v: len(nbrs[v]) for v in alive}
    core = {}
    k = 0
    while alive:
        k = max(k, min(deg[v] for v in alive))
        stack = [v for v in alive if deg[v] <= k]
        while stack:
            v = stack.pop()
            if v not in alive:
                continue
            alive.remove(v)
            core[v] = k
            for u in nbrs[v]:
                if u in alive:
                    deg[u] -= 1
                    if deg[u] <= k:
                        stack.append(u)
    return core


@pytest.mark.parametrize("name", ["two_cliques", "ring", "star", "random"])
def test_coreness_matches_peel_oracle(spark, name):
    rows, n = GRAPHS[name]
    core, stats = coreness(G.edges_from_rows(spark, rows))
    got = {r["id"]: r["coreness"] for r in core.collect()}
    assert stats.converged
    assert got == coreness_oracle(rows, n)


def test_coreness_consistent_with_kcore(spark):
    rows, n = GRAPHS["random"]
    edges = G.edges_from_rows(spark, rows)
    core, _ = coreness(edges)
    k = 4
    kc, _ = kcore(edges, k=k)
    in_core = {r["id"] for r in kc.collect()}
    by_number = {r["id"] for r in core.collect() if r["coreness"] >= k}
    assert in_core == by_number


def test_coreness_extra_rounds_are_noop(spark):
    rows, n = GRAPHS["random"]
    edges = G.edges_from_rows(spark, rows)
    c1, s1 = coreness(edges)
    c2, _ = coreness(edges, max_rounds=s1.rounds + 4)
    assert {tuple(r) for r in c1.collect()} == {tuple(r) for r in c2.collect()}


# ---------------------------------------------------------------------------
# clustering coefficients
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("name", ["two_cliques", "star", "random"])
def test_clustering_coefficients(spark, name):
    rows, n = GRAPHS[name]
    out = clustering_coefficients(G.edges_from_rows(spark, rows))
    exp = lcc_oracle(rows, n)
    got = {r["id"]: (r["degree"], r["triangles"], r["lcc"]) for r in out.collect()}
    assert set(got) == {v for v in exp if exp[v][0] > 0}
    for v, (d, t, c) in got.items():
        ed, et, ec = exp[v]
        assert (d, t) == (ed, et), v
        assert abs(c - ec) < 1e-12, v


def test_clustering_clique_is_one(spark):
    rows, n = two_cliques_bridge()
    out = clustering_coefficients(G.edges_from_rows(spark, rows))
    # every vertex not on the bridge sits in a full clique → lcc = 1
    vals = {r["id"]: r["lcc"] for r in out.collect()}
    bridge_free = [v for v, c in vals.items() if c == 1.0]
    assert len(bridge_free) >= n - 2


# ---------------------------------------------------------------------------
# assortativity
# ---------------------------------------------------------------------------
def test_assortativity_star_is_minus_one(spark):
    rows, _ = star()
    row = degree_assortativity(G.edges_from_rows(spark, rows)).first()
    assert abs(row["assortativity"] - (-1.0)) < 1e-12


@pytest.mark.parametrize("name", ["two_cliques", "ring", "random"])
def test_assortativity_matches_oracle(spark, name):
    rows, n = GRAPHS[name]
    row = degree_assortativity(G.edges_from_rows(spark, rows)).first()
    exp = assortativity_oracle(rows, n)
    if exp is None:
        assert row["assortativity"] is None
    else:
        assert abs(row["assortativity"] - exp) < 1e-9


# ---------------------------------------------------------------------------
# link prediction
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("name", ["two_cliques", "star", "random"])
def test_link_prediction_matches_oracle(spark, name):
    rows, n = GRAPHS[name]
    out, stats = link_prediction(G.edges_from_rows(spark, rows))
    exp = linkpred_oracle(rows, n)
    got = {
        (r["a"], r["b"]): (r["common_neighbors"], r["jaccard"], r["adamic_adar"])
        for r in out.collect()
    }
    assert stats.dropped_centers == 0
    assert set(got) == set(exp)
    for pair, (cn, jac, aa) in got.items():
        ecn, ejac, eaa = exp[pair]
        assert cn == ecn, pair
        assert abs(jac - ejac) < 1e-12, pair
        assert abs(aa - eaa) < 1e-9, pair


def test_link_prediction_wedge_cap(spark):
    """Capping wedge centers drops hub-generated candidates but keeps
    degrees (the Jaccard denominator) exact."""
    rows, n = random_graph(n=120, seed=23)
    cap = 8
    out, stats = link_prediction(G.edges_from_rows(spark, rows), max_wedge_degree=cap)
    exp = linkpred_oracle(rows, n, cap=cap)
    got = {
        (r["a"], r["b"]): (r["common_neighbors"], r["jaccard"], r["adamic_adar"])
        for r in out.collect()
    }
    assert stats.dropped_centers > 0
    assert set(got) == set(exp)
    for pair, (cn, jac, aa) in got.items():
        ecn, ejac, eaa = exp[pair]
        assert cn == ecn and abs(jac - ejac) < 1e-12 and abs(aa - eaa) < 1e-9


def _truss_oracle(pairs, k):
    """Driver-side peel: {(u,v): support} of the k-truss."""
    es = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        adj = {}
        for u, v in es:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in es}
        keep = {e for e in es if sup[e] >= k - 2}
        if keep == es:
            return sup
        es = keep


@pytest.mark.parametrize("degree_ordered", [True, False])
def test_ktruss_matches_peel_oracle(spark, degree_ordered):
    from dmid_spark.algorithms import ktruss

    # K4 + a diamond hanging off it + a pendant path
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
             (3, 4), (3, 5), (4, 5), (4, 6), (5, 6), (6, 7), (7, 8)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    for k in (3, 4, 5):
        out, stats = ktruss(e, k=k, degree_ordered=degree_ordered)
        got = {(r.u, r.v): r.support for r in out.collect()}
        assert got == _truss_oracle(pairs, k), k
        assert stats.converged


def test_ktruss_cascade_peel_multiple_rounds(spark):
    from dmid_spark.algorithms import ktruss

    # diamond: k=4 drops the four rim edges round 1, then the chord round 2
    pairs = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    out, stats = ktruss(e, k=4)
    assert out.count() == 0
    assert stats.rounds >= 2 and stats.converged


def test_ktruss_extra_rounds_are_noop(spark):
    from dmid_spark.algorithms import ktruss

    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    a, _ = ktruss(e, k=4, max_rounds=2)
    b, _ = ktruss(e, k=4, max_rounds=6)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ktruss_validation(spark):
    from dmid_spark.algorithms import ktruss

    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        ktruss(e, k=2)
