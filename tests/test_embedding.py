"""Spectral embedding / clustering (algorithms/embedding.py) against an
exact NumPy transliteration of the quantized algorithm, plus structure
and parallelism-invariance properties."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from fixtures import ring_of_cliques, two_cliques_bridge, random_graph
from dmid_spark import graph as G
from dmid_spark.algorithms import spectral_clustering, spectral_embedding
from dmid_spark.algorithms.embedding import INIT_MOD, QUANT_SCALE

SC = QUANT_SCALE


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _qs(terms: np.ndarray) -> float:
    """Quantized order-free sum: floor(x*S + 0.5) int64 terms, exact sum,
    de-scale by the power-of-two quantum."""
    return int(np.floor(terms * SC + 0.5).astype(np.int64).sum()) / SC


def _spectral_oracle(rows, n, k, iterations, seed):
    """Bit-exact transliteration of spectral_embedding (md5 hash mode)."""
    # undirected weight-summed S = D^-1/2 W D^-1/2 (no self loop)
    W2 = {}
    for s, d, w in rows:
        if s == d:
            continue
        key = (min(s, d), max(s, d))
        W2[key] = W2.get(key, 0.0) + w
    deg = np.zeros(n)
    for (u, v), w in W2.items():
        deg[u] += w
        deg[v] += w
    S = np.zeros((n, n))
    for (u, v), w in W2.items():
        nw = w / np.sqrt(deg[u] * deg[v])
        S[u, v] = nw
        S[v, u] = nw
    S = S + np.eye(n)  # the engine iterates on the shifted operator S + I
    m = INIT_MOD
    scale = 1.0 / float(np.sqrt(n))
    X = np.zeros((n, k))
    for i in range(n):
        for d in range(k):
            h = _h60(f"spec:{i}:{d}:{seed}")
            X[i, d] = ((h % (2 * m + 1)) - m) / float(m) * scale

    def gram(X):
        g = np.zeros((k, k))
        for a in range(k):
            for b in range(k):
                g[a, b] = _qs(X[:, a] * X[:, b])
        return g

    def apply_right(X, mat):
        out = np.zeros_like(X)
        for i in range(n):
            for j in range(k):
                out[i, j] = _qs(X[i, :] * mat[:, j])
        return out

    def orth(X):
        g = gram(X)
        ridge = 1e-12 * (np.trace(g) / k if np.trace(g) > 0 else 1.0)
        ell = np.linalg.cholesky(g + ridge * np.eye(k))
        return apply_right(X, np.linalg.inv(ell).T)

    def spmv(X):
        out = np.zeros_like(X)
        for v in range(n):
            for d in range(k):
                out[v, d] = _qs(S[:, v] * X[:, d])
        return out

    X = orth(X)
    for _ in range(iterations):
        X = orth(spmv(X))
    # Rayleigh-Ritz extraction (transliterated)
    Y = spmv(X)
    H = np.zeros((k, k))
    for a in range(k):
        for b in range(k):
            H[a, b] = _qs(X[:, a] * Y[:, b])
    H = (H + H.T) / 2.0
    ritz, vecs = np.linalg.eigh(H)
    order = list(range(k - 1, -1, -1))
    Xout = apply_right(X, vecs[:, order])
    return Xout, [float(ritz[d]) - 1.0 for d in order]


def _collect_embedding(df, n, k):
    out = np.zeros((n, k))
    for r in df.collect():
        out[r["id"], r["dim"]] = r["value"]
    return out


def test_spectral_embedding_matches_transliteration(spark):
    rows, n = two_cliques_bridge()
    edges = G.edges_from_rows(spark, rows)
    k, iters, seed = 3, 6, 7
    emb, stats = spectral_embedding(
        edges, k=k, iterations=iters, seed=seed, hash_mode="md5"
    )
    got = _collect_embedding(emb, n, k)
    want, lam = _spectral_oracle(rows, n, k, iters, seed)
    assert np.array_equal(got, want)  # bit-identical, not just close
    assert stats.eigenvalues == pytest.approx(lam, abs=0)


def test_spectral_embedding_partition_invariant(spark):
    rows, n = random_graph(n=60, seed=9)
    e = G.edges_from_rows(spark, rows)
    a, _ = spectral_embedding(e.repartition(1), k=4, iterations=4, seed=3)
    b, _ = spectral_embedding(e.repartition(7), k=4, iterations=4, seed=3)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # exact equality at any parallelism


def test_spectral_embedding_finds_true_eigenvectors(spark):
    """After enough iterations the Rayleigh estimates match numpy.eigh of
    S and the block spans the top-k eigenspace. The fixture has a strong
    eigengap below λ_k (4 planted communities → 4 dominant modes), so
    convergence at this iteration count is guaranteed — a random graph's
    trailing in-block eigenvalue can sit arbitrarily close to λ_{k+1}."""
    rows, n = ring_of_cliques(k=4, size=5)
    e = G.edges_from_rows(spark, rows)
    k = 4
    emb, stats = spectral_embedding(e, k=k, iterations=40, seed=1)
    X = _collect_embedding(emb, n, k)
    # rebuild S exactly as the oracle does
    W2 = {}
    for s, d, w in rows:
        if s != d:
            key = (min(s, d), max(s, d))
            W2[key] = W2.get(key, 0.0) + w
    deg = np.zeros(n)
    for (u, v), w in W2.items():
        deg[u] += w
        deg[v] += w
    S = np.zeros((n, n))
    for (u, v), w in W2.items():
        nw = w / np.sqrt(deg[u] * deg[v])
        S[u, v] = S[v, u] = nw
    evals = np.linalg.eigvalsh(S)[::-1]
    assert np.allclose(sorted(stats.eigenvalues, reverse=True), evals[:k], atol=1e-3)
    # orthonormal block: X^T X = I
    assert np.allclose(X.T @ X, np.eye(k), atol=1e-6)


def test_spectral_clustering_recovers_planted_communities(spark):
    rows, n = ring_of_cliques(k=4, size=5)
    e = G.edges_from_rows(spark, rows)
    assigned, _ = spectral_clustering(e, n_clusters=4, iterations=25, seed=2)
    got = {r["id"]: r["cluster"] for r in assigned.collect()}
    # every clique lands in one cluster, and cliques get distinct clusters
    labels = []
    for c in range(4):
        members = {got[i] for i in range(c * 5, (c + 1) * 5)}
        assert len(members) == 1, f"clique {c} split: {members}"
        labels.append(members.pop())
    assert len(set(labels)) == 4


def test_spectral_embedding_validates_args(spark):
    rows, _ = two_cliques_bridge()
    e = G.edges_from_rows(spark, rows)
    with pytest.raises(ValueError):
        spectral_embedding(e, k=0)
    with pytest.raises(ValueError):
        spectral_embedding(e, iterations=0)


def test_spectral_embedding_checkpoint_resume_bit_identical(spark, tmp_ckpt_dir):
    from dmid_spark.checkpoint import CheckpointManager

    rows, n = random_graph(n=50, seed=21)
    e = G.edges_from_rows(spark, rows)
    # uninterrupted run
    full, fs = spectral_embedding(e, k=3, iterations=6, seed=5)
    want = sorted(map(tuple, full.collect()))
    # interrupted run: checkpoint every 2 iterations, stop after 4
    ck1 = CheckpointManager(spark, tmp_ckpt_dir, run_id="spec")
    part, _ = spectral_embedding(
        e, k=3, iterations=4, seed=5, ckpt=ck1, ckpt_every=2
    )
    part.count()
    # "new process": a fresh manager over the same dir, resume to 6
    ck2 = CheckpointManager(spark, tmp_ckpt_dir, run_id="spec")
    res, rs = spectral_embedding(
        e, k=3, iterations=6, seed=5, ckpt=ck2, ckpt_every=2, resume=True
    )
    got = sorted(map(tuple, res.collect()))
    assert got == want  # bit-identical, through the parquet round-trip
    assert rs.eigenvalues == fs.eigenvalues
    # lineage shows the resumed run only computed iterations 5 and 6
    its = [r["iteration"] for r in ck2.lineage("spectral_x") if r["committed"]]
    assert sorted(set(its)) == [2, 4, 6]


def test_spectral_resume_rejects_mismatched_params(spark, tmp_ckpt_dir):
    from dmid_spark.checkpoint import CheckpointManager

    rows, _ = two_cliques_bridge()
    e = G.edges_from_rows(spark, rows)
    ck = CheckpointManager(spark, tmp_ckpt_dir, run_id="specmm")
    spectral_embedding(e, k=3, iterations=2, seed=5, ckpt=ck, ckpt_every=1)
    ck2 = CheckpointManager(spark, tmp_ckpt_dir, run_id="specmm")
    with pytest.raises(ValueError, match="cannot resume"):
        spectral_embedding(e, k=4, iterations=4, seed=5, ckpt=ck2, resume=True)
    with pytest.raises(ValueError, match="cannot resume"):
        spectral_embedding(e, k=3, iterations=4, seed=6, ckpt=ck2, resume=True)
