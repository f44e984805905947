"""Tests for HITS and personalized PageRank (algorithms/spectral.py)
against independent NumPy re-derivations on the shared fixtures."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fixtures import directed_path, random_graph, star, two_cliques_bridge
from dmid_spark import graph as G
from dmid_spark.algorithms import hits, personalized_pagerank


def vec(df, n, key="id", val="value", default=0.0):
    out = np.full(n, default)
    for r in df.collect():
        out[r[key]] = r[val]
    return out


# ---------------------------------------------------------------------------
# NumPy oracles
# ---------------------------------------------------------------------------
def hits_oracle(rows, n, iters=200, tol=1e-6, weighted=False):
    A = np.zeros((n, n))
    for s, d, w in rows:
        A[s, d] = w if weighted else 1.0
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(iters):
        na = A.T @ h
        nrm = np.linalg.norm(na)
        if nrm > 0:
            na = na / nrm
        nh = A @ na
        nrm = np.linalg.norm(nh)
        if nrm > 0:
            nh = nh / nrm
        delta = np.abs(na - a).sum() + np.abs(nh - h).sum()
        a, h = na, nh
        if delta < tol:
            break
    return h, a


def ppr_oracle(rows, n, seeds, d=0.85, iters=500, tol=1e-9, weighted=False):
    W = np.zeros((n, n))
    for s, t, w in rows:
        W[s, t] = w if weighted else 1.0
    outw = W.sum(axis=1)
    P = np.divide(W, outw[:, None], out=np.zeros_like(W), where=outw[:, None] > 0)
    s_vec = np.zeros(n)
    s_vec[list(seeds)] = 1.0 / len(seeds)
    x = s_vec.copy()
    for _ in range(iters):
        dm = x[outw == 0].sum()
        y = d * (P.T @ x) + (1 - d + d * dm) * s_vec
        if np.abs(y - x).sum() < tol:
            x = y
            break
        x = y
    return x


GRAPHS = {
    "two_cliques": two_cliques_bridge(),
    "star": star(),
    "path": directed_path(),
    "random": random_graph(n=100, seed=17),
}


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("name", ["two_cliques", "star", "random"])
def test_hits_matches_oracle(spark, name):
    rows, n = GRAPHS[name]
    edges = G.edges_from_rows(spark, rows)
    out, stats = hits(edges, tol=1e-8)
    eh, ea = hits_oracle(rows, n, tol=1e-8)
    assert stats.converged
    assert np.allclose(vec(out, n, val="hub"), eh, atol=1e-6)
    assert np.allclose(vec(out, n, val="authority"), ea, atol=1e-6)


def test_hits_directed_path_sink_has_zero_hub(spark):
    rows, n = directed_path()
    out, _ = hits(G.edges_from_rows(spark, rows), tol=1e-8, max_iter=500)
    got = {r["id"]: (r["hub"], r["authority"]) for r in out.collect()}
    assert got[n - 1][0] == 0.0  # sink points at nothing
    assert got[0][1] == 0.0  # source has no in-edges


def test_hits_weighted_differs_from_unweighted(spark):
    rows, n = random_graph(n=60, seed=5, weighted=True)
    edges = G.edges_from_rows(spark, rows)
    uw, _ = hits(edges, tol=1e-8)
    ww, _ = hits(edges, tol=1e-8, weighted=True)
    eh, ea = hits_oracle(rows, n, tol=1e-8, weighted=True)
    assert np.allclose(vec(ww, n, val="hub"), eh, atol=1e-6)
    assert not np.allclose(vec(uw, n, val="hub"), vec(ww, n, val="hub"), atol=1e-6)


# ---------------------------------------------------------------------------
# personalized PageRank
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("name,seeds", [
    ("two_cliques", [0]),
    ("star", [1, 2]),
    ("random", [0, 7, 23]),
])
def test_ppr_matches_oracle(spark, name, seeds):
    rows, n = GRAPHS[name]
    edges = G.edges_from_rows(spark, rows)
    seed_df = spark.createDataFrame([(int(s),) for s in seeds], "id long")
    ranks, stats = personalized_pagerank(edges, seed_df, tol=1e-9)
    exp = ppr_oracle(rows, n, seeds)
    got = vec(ranks, n)
    assert stats.converged
    assert stats.n_seeds == len(seeds)
    assert np.allclose(got, exp, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-6


def test_ppr_mass_concentrates_near_seed(spark):
    # teleporting only to clique A keeps most mass there; the bridge leaks
    # a little into clique B
    rows, n = two_cliques_bridge()
    edges = G.edges_from_rows(spark, rows)
    seed_df = spark.createDataFrame([(0,)], "id long")
    ranks, _ = personalized_pagerank(edges, seed_df, tol=1e-9)
    got = vec(ranks, n)
    assert got[: n // 2].sum() > 0.8
    assert got[n // 2 :].sum() > 0.0


def test_ppr_unreachable_vertices_get_zero(spark):
    # two disconnected components; seeding in one leaves the other at 0
    rows = [(0, 1, 1.0), (1, 0, 1.0), (2, 3, 1.0), (3, 2, 1.0)]
    edges = G.edges_from_rows(spark, rows)
    seed_df = spark.createDataFrame([(0,)], "id long")
    ranks, _ = personalized_pagerank(edges, seed_df, tol=1e-10)
    got = {r["id"]: r["value"] for r in ranks.collect()}
    assert got[2] == 0.0 and got[3] == 0.0
    assert abs(got[0] + got[1] - 1.0) < 1e-8


def test_ppr_checkpoint_resume_bit_identical(spark, tmp_ckpt_dir):
    from dmid_spark.checkpoint import CheckpointManager

    rows, n = GRAPHS["random"]
    edges = G.edges_from_rows(spark, rows)
    seed_df = spark.createDataFrame([(0,), (7,)], "id long")
    full, _ = personalized_pagerank(edges, seed_df, tol=1e-9)
    ckpt = CheckpointManager(spark, tmp_ckpt_dir, "pprresume")
    # partial run checkpoints every iteration, then a fresh call resumes
    personalized_pagerank(
        edges, seed_df, tol=1e-9, max_iter=4, ckpt=ckpt, ckpt_every=1
    )
    resumed, stats = personalized_pagerank(
        edges, seed_df, tol=1e-9, ckpt=ckpt, ckpt_every=1, resume=True
    )
    assert stats.converged
    got = {r["id"]: r["value"] for r in resumed.collect()}
    exp = {r["id"]: r["value"] for r in full.collect()}
    # The scalar reductions (dangling mass) are layout-proof
    # (kernel.deterministic_sum), but the per-vertex SpMV sums are plain
    # hash-aggregate floats whose partial-merge order Spark does not pin —
    # so join-mode resume agrees to the last ulp, not bit-for-bit (observed:
    # one vertex off by 1 ulp under a loaded shared session). The HARD
    # bit-identity guarantee lives in the deterministic csr/jvm kernels
    # (test_kernel.test_iterate_resume_bit_identical).
    assert set(got) == set(exp)
    ulp = 4.0  # ≤ a few ulps of slack, NOT an allclose tolerance
    for v in exp:
        if exp[v] == 0.0:
            assert got[v] == 0.0, v
        else:
            assert abs(got[v] - exp[v]) <= ulp * abs(exp[v]) * 2.3e-16, v


def test_ppr_empty_seeds_raises(spark):
    rows, n = GRAPHS["random"]
    edges = G.edges_from_rows(spark, rows)
    empty = spark.createDataFrame([], "id long")
    with pytest.raises(ValueError, match="empty seed"):
        personalized_pagerank(edges, empty)


# ---------------------------------------------------------------------------
# Katz centrality
# ---------------------------------------------------------------------------
def katz_oracle(rows, n, alpha, beta=1.0, iters=500, tol=1e-9, weighted=False):
    A = np.zeros((n, n))
    for s, d, w in rows:
        A[s, d] = w if weighted else 1.0
    x = np.full(n, beta)
    for _ in range(iters):
        y = beta + alpha * (A.T @ x)
        if np.abs(y - x).sum() < tol:
            return y
        x = y
    return x


@pytest.mark.parametrize("name,alpha", [
    ("two_cliques", 0.05),
    ("star", 0.2),
    ("random", 0.02),
])
def test_katz_matches_oracle(spark, name, alpha):
    from dmid_spark.algorithms import katz_centrality

    rows, n = GRAPHS[name]
    edges = G.edges_from_rows(spark, rows)
    scores, stats = katz_centrality(edges, alpha=alpha, tol=1e-9)
    exp = katz_oracle(rows, n, alpha)
    assert stats.converged
    assert np.allclose(vec(scores, n), exp, atol=1e-6)


def test_katz_closed_form(spark):
    # fixed point is beta * (I - alpha A^T)^-1 1 when alpha < 1/lambda_max
    from dmid_spark.algorithms import katz_centrality

    rows, n = random_graph(n=50, seed=3)
    A = np.zeros((n, n))
    for s, d, _ in rows:
        A[s, d] = 1.0
    alpha = 0.9 / max(1e-9, np.abs(np.linalg.eigvals(A)).max())
    scores, stats = katz_centrality(
        G.edges_from_rows(spark, rows), alpha=float(alpha), tol=1e-10, max_iter=2000
    )
    exp = np.linalg.solve(np.eye(n) - alpha * A.T, np.ones(n))
    assert stats.converged
    assert np.allclose(vec(scores, n), exp, atol=1e-5)


def test_katz_weighted_and_sources_get_beta(spark):
    from dmid_spark.algorithms import katz_centrality

    rows, n = random_graph(n=60, seed=5, weighted=True)
    edges = G.edges_from_rows(spark, rows)
    scores, _ = katz_centrality(edges, alpha=0.01, weighted=True, tol=1e-9)
    exp = katz_oracle(rows, n, 0.01, weighted=True)
    assert np.allclose(vec(scores, n), exp, atol=1e-6)
    # a vertex with no in-edges sits exactly at the beta baseline
    indeg = {d for _, d, _ in rows}
    src_only = [v for v in range(n) if v not in indeg]
    got = vec(scores, n)
    for v in src_only:
        assert got[v] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# sweep cut
# ---------------------------------------------------------------------------
def sweep_cut_oracle(rows, scores, degree_normalize=True):
    """Brute-force ACL sweep: (rank, id, score, volume, cut, phi) per prefix.
    Each (s, d, w) row is one undirected edge; self-loops add 2w to degree
    and never to the cut."""
    deg = {}
    for s, d, w in rows:
        deg[s] = deg.get(s, 0.0) + w
        deg[d] = deg.get(d, 0.0) + w
    cand = [(v, sc) for v, sc in scores.items() if sc > 0 and deg.get(v, 0) > 0]
    cand.sort(key=lambda t: (-(t[1] / deg[t[0]]) if degree_normalize else -t[1], t[0]))
    total = 2.0 * sum(w for _, _, w in rows)
    out, S, vol = [], set(), 0.0
    for k, (v, sc) in enumerate(cand, 1):
        S.add(v)
        vol += deg[v]
        internal = sum(w for s, d, w in rows if s in S and d in S)
        cut = vol - 2.0 * internal
        den = min(vol, total - vol)
        out.append((k, v, sc, vol, cut, cut / den if den > 0 else None))
    return out


@pytest.mark.parametrize("name,normalize", [
    ("two_cliques", True), ("two_cliques", False), ("random", True), ("star", True),
])
def test_sweep_cut_matches_bruteforce(spark, name, normalize):
    from dmid_spark.algorithms import sweep_cut

    rows, n = {
        "two_cliques": two_cliques_bridge(),
        "random": random_graph(n=50, seed=44),
        "star": star(8),
    }[name]
    # deterministic synthetic diffusion score peaked at vertex 0's clique
    scores = {v: round(1.0 / (1 + v), 9) for v in range(n)}
    scores[n - 1] = 0.0  # excluded: score <= 0
    edges = G.edges_from_rows(spark, rows)
    sdf = spark.createDataFrame(
        [(int(v), float(s)) for v, s in scores.items()], "id long, score double"
    )
    got = [
        (r["rank"], r["id"], r["score"], r["volume"], r["cut_w"], r["conductance"])
        for r in sweep_cut(edges, sdf, degree_normalize=normalize)
        .orderBy("rank")
        .collect()
    ]
    exp = sweep_cut_oracle(rows, scores, degree_normalize=normalize)
    assert len(got) == len(exp)
    for g, e in zip(got, exp):
        assert g[:2] == e[:2]
        assert g[2] == pytest.approx(e[2], abs=1e-12)
        assert g[3] == pytest.approx(e[3], abs=1e-9)
        assert g[4] == pytest.approx(e[4], abs=1e-9)
        if e[5] is None:
            assert g[5] is None
        else:
            assert g[5] == pytest.approx(e[5], abs=1e-12)


def test_sweep_cut_finds_clique_on_bridge_graph(spark):
    """On two cliques joined by one bridge, a PPR seeded inside clique A must
    sweep to exactly clique A as the min-conductance prefix."""
    from dmid_spark.algorithms import best_sweep_cut, personalized_pagerank, sweep_cut

    rows, n = two_cliques_bridge(size=6)
    edges = G.edges_from_rows(spark, rows)
    seeds = spark.createDataFrame([(0,)], "id long")
    ranks, _ = personalized_pagerank(edges, seeds, d=0.85, tol=1e-10, max_iter=200)
    sdf = ranks.select("id", F.round("value", 9).alias("score"))
    sweep = sweep_cut(edges, sdf)
    best = best_sweep_cut(sweep).collect()[0]
    swept_ids = {
        r["id"] for r in sweep.filter(F.col("rank") <= best["rank"]).collect()
    }
    assert swept_ids == set(range(6))  # clique A exactly
    # max_prefix truncates the sweep but not the ordering
    short = sweep_cut(edges, sdf, max_prefix=3).orderBy("rank").collect()
    assert [r["rank"] for r in short] == [1, 2, 3]
    full3 = [r["id"] for r in sweep.orderBy("rank").limit(3).collect()]
    assert [r["id"] for r in short] == full3


def test_sweep_cut_self_loop(spark):
    from dmid_spark.algorithms import sweep_cut

    rows = [(0, 1, 1.0), (0, 0, 2.0), (1, 2, 1.0)]
    scores = {0: 0.6, 1: 0.3, 2: 0.1}
    edges = G.edges_from_rows(spark, rows)
    sdf = spark.createDataFrame(
        [(v, s) for v, s in scores.items()], "id long, score double"
    )
    got = [
        (r["rank"], r["id"], r["volume"], r["cut_w"], r["conductance"])
        for r in sweep_cut(edges, sdf).orderBy("rank").collect()
    ]
    exp = sweep_cut_oracle(rows, scores)
    for g, e in zip(got, exp):
        assert g[0] == e[0] and g[1] == e[1]
        assert g[2] == pytest.approx(e[3], abs=1e-12)
        assert g[3] == pytest.approx(e[4], abs=1e-12)


# ---------------------------------------------------------------------------
# eigenvector centrality
# ---------------------------------------------------------------------------
def eigenvector_oracle(rows, n, iters=500, tol=1e-9, weighted=False, round_dp=None):
    """Transliterated power iteration with L-inf (max) normalization and the
    same optional per-step quantization as the Spark operator."""
    A = np.zeros((n, n))
    for s, d, w in rows:
        A[s, d] = w if weighted else 1.0
    x = np.ones(n)
    for _ in range(iters):
        y = A.T @ x
        mx = y.max()
        if mx > 0:
            y = y / mx
        if round_dp is not None:
            y = np.round(y, round_dp) + 0.0
        if np.abs(y - x).sum() < tol:
            return y
        x = y
    return x


def _symmetrize(rows):
    seen = {}
    for s, d, w in rows:
        seen[(s, d)] = w
        seen.setdefault((d, s), w)
    return [(s, d, w) for (s, d), w in seen.items()]


@pytest.mark.parametrize("name", ["two_cliques", "star", "random"])
def test_eigenvector_matches_oracle(spark, name):
    from dmid_spark.algorithms import eigenvector_centrality

    rows, n = GRAPHS[name]
    rows = _symmetrize(rows)
    if name == "star":
        # the undirected star is bipartite (center vs leaves) — power
        # iteration oscillates with period 2; a center self-loop breaks
        # bipartiteness, the standard aperiodicity fix
        rows = rows + [(0, 0, 1.0)]
    edges = G.edges_from_rows(spark, rows)
    scores, stats = eigenvector_centrality(edges, tol=1e-9, max_iter=500)
    exp = eigenvector_oracle(rows, n)
    assert stats.converged
    assert np.allclose(vec(scores, n), exp, atol=1e-6)
    got = vec(scores, n)
    assert got.max() == pytest.approx(1.0)


def test_eigenvector_is_dominant_eigenvector(spark):
    # on a connected non-bipartite undirected graph the fixed point is the
    # Perron eigenvector of A (max-normalized)
    from dmid_spark.algorithms import eigenvector_centrality

    rows, n = random_graph(n=60, seed=9, weighted=True)
    # ensure connectivity + aperiodicity: a triangle spanning chain
    extra = [(i, i + 1, 1.0) for i in range(n - 1)] + [(0, 2, 1.0)]
    # force a genuinely symmetric weight matrix (unordered-pair max) so the
    # eigh comparison below is well-posed
    pairs = {}
    for s, d, w in rows + extra:
        if s == d:
            continue
        k = (min(s, d), max(s, d))
        pairs[k] = max(pairs.get(k, 0.0), w)
    rows = [(a, b, w) for (a, b), w in pairs.items()] + [
        (b, a, w) for (a, b), w in pairs.items()
    ]
    edges = G.edges_from_rows(spark, rows)
    scores, stats = eigenvector_centrality(
        edges, weighted=True, tol=1e-12, max_iter=3000
    )
    A = np.zeros((n, n))
    for s, d, w in rows:
        A[s, d] = w
    vals, vecs = np.linalg.eigh(A)
    v = np.abs(vecs[:, np.argmax(vals)])
    v = v / v.max()
    assert stats.converged
    assert np.allclose(vec(scores, n), v, atol=1e-5)


def test_eigenvector_directed_sources_decay_to_zero(spark):
    from dmid_spark.algorithms import eigenvector_centrality

    # 0 -> 1 -> 2 <-> 3 : the 2<->3 cycle dominates; pure sources decay to 0
    rows = [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (3, 2, 1.0)]
    scores, stats = eigenvector_centrality(
        G.edges_from_rows(spark, rows), tol=1e-10, max_iter=500
    )
    got = vec(scores, 4)
    assert stats.converged
    assert got[0] == pytest.approx(0.0, abs=1e-8)
    assert got[1] == pytest.approx(0.0, abs=1e-8)
    assert got[2] == pytest.approx(1.0, abs=1e-8)
    assert got[3] == pytest.approx(1.0, abs=1e-8)


def test_eigenvector_round_dp_matches_quantized_oracle(spark):
    from dmid_spark.algorithms import eigenvector_centrality

    rows, n = GRAPHS["random"]
    rows = _symmetrize(rows)
    edges = G.edges_from_rows(spark, rows)
    scores, _ = eigenvector_centrality(
        edges, tol=-1.0, max_iter=5, round_dp=9
    )
    exp = eigenvector_oracle(rows, n, iters=5, tol=-1.0, round_dp=9)
    got = vec(scores, n)
    assert np.array_equal(got, exp)  # bit-identical under per-step 9dp quantization
    # -0.0 is folded
    assert not any(np.signbit(g) and g == 0.0 for g in got)


# ---------------------------------------------------------------------------
# SALSA
# ---------------------------------------------------------------------------
def salsa_oracle(rows, n, iters=500, tol=1e-8, weighted=False):
    W = np.zeros((n, n))
    for s, d, w in rows:
        W[s, d] = w if weighted else 1.0
    out_ = W.sum(axis=1)
    in_ = W.sum(axis=0)
    Wr = np.divide(W, out_[:, None], out=np.zeros_like(W), where=out_[:, None] > 0)
    Wc = np.divide(W, in_[None, :], out=np.zeros_like(W), where=in_[None, :] > 0)
    a = np.ones(n) / n
    h = np.ones(n) / n
    for _ in range(iters):
        na = Wr.T @ (Wc @ a)
        s = np.abs(na).sum()
        if s > 0:
            na = na / s
        nh = Wc @ (Wr.T @ h)
        s = np.abs(nh).sum()
        if s > 0:
            nh = nh / s
        delta = np.abs(na - a).sum() + np.abs(nh - h).sum()
        a, h = na, nh
        if delta < tol:
            break
    return h, a


@pytest.mark.parametrize("name", ["two_cliques", "star", "path", "random"])
def test_salsa_matches_oracle(spark, name):
    from dmid_spark.algorithms import salsa

    rows, n = GRAPHS[name]
    edges = G.edges_from_rows(spark, rows)
    out, stats = salsa(edges, tol=1e-8, max_iter=300)
    eh, ea = salsa_oracle(rows, n, iters=300, tol=1e-8)
    assert np.allclose(vec(out, n, val="hub"), eh, atol=1e-6)
    assert np.allclose(vec(out, n, val="authority"), ea, atol=1e-6)


def test_salsa_structural_zeros(spark):
    from dmid_spark.algorithms import salsa

    rows, n = directed_path()
    out, _ = salsa(G.edges_from_rows(spark, rows), tol=1e-8, max_iter=300)
    got = {r["id"]: (r["hub"], r["authority"]) for r in out.collect()}
    assert got[n - 1][0] == 0.0  # sink has no out-edges -> hub 0
    assert got[0][1] == 0.0  # source has no in-edges -> authority 0


def test_salsa_indegree_proportional_on_cocitation_connected_graph(spark):
    """Lempel-Moran: on a graph whose co-citation (authority-chain) support
    is one connected component, SALSA authority is proportional to
    in-degree -- the property that makes SALSA spam-resistant vs HITS."""
    from dmid_spark.algorithms import salsa

    # one hub citing everyone makes the co-citation graph connected
    rows = [(0, v, 1.0) for v in range(1, 6)] + [
        (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0), (4, 5, 1.0), (5, 1, 1.0)
    ]
    n = 6
    out, _ = salsa(G.edges_from_rows(spark, rows), tol=1e-10, max_iter=500)
    a = vec(out, n, val="authority")
    indeg = np.zeros(n)
    for _, d, _w in rows:
        indeg[d] += 1.0
    expect = indeg / indeg.sum()
    assert np.allclose(a, expect, atol=1e-6)


def test_salsa_weighted_differs_from_unweighted(spark):
    from dmid_spark.algorithms import salsa

    rows = [(0, 2, 10.0), (1, 2, 1.0), (0, 3, 1.0), (1, 3, 1.0), (2, 0, 1.0), (3, 1, 1.0)]
    e = G.edges_from_rows(spark, rows)
    uw, _ = salsa(e, tol=1e-9, max_iter=300, weighted=False)
    wt, _ = salsa(e, tol=1e-9, max_iter=300, weighted=True)
    au = vec(uw, 4, val="authority")
    aw = vec(wt, 4, val="authority")
    assert not np.allclose(au, aw, atol=1e-9)
    eh, ea = salsa_oracle(rows, 4, iters=300, tol=1e-9, weighted=True)
    assert np.allclose(aw, ea, atol=1e-6)


def test_salsa_empty_graph_returns_empty(spark):
    from dmid_spark.algorithms import salsa

    empty = spark.createDataFrame([], "src long, dst long, weight double")
    out, stats = salsa(empty, tol=1e-6, max_iter=5)
    assert out.count() == 0 and stats.iterations == 0
