"""Spectral embedding and spectral clustering over the link graph.

Top-k eigenvectors of the symmetric-normalized adjacency
``S = D^-1/2 W D^-1/2`` (equivalently the bottom eigenvectors of the
normalized Laplacian ``L = I − S``) by orthogonal block power iteration
(Golub & Van Loan §8.2.4), composed with the engine's exact k-means
(sim/kmeans.py) into Ng–Jordan–Weiss spectral clustering (NIPS 2001) —
the classic global community-geometry view next to the modularity
(Louvain/DMID) and flow (sweep-cut) views the engine already has.

Distributed shape: the embedding state lives long-form ``(id, dim,
value)`` (V×k rows); each iteration is one arcs⋈state SpMV sharing a
single shuffle across all k dims (the smooth_features plan family), one
V×k² self-join for the k×k Gram matrix, and a k×k Cholesky ON THE DRIVER
(tall-skinny orthonormalization via the normal equations — nothing O(V)
ever centralizes). Every floating sum is integer-quantized before
aggregation (``floor(x·2^36 + 0.5)`` into int64 — the sim/kmeans device),
so results are BIT-IDENTICAL at any parallelism, and the quantization
scale is a power of two so the de-scaling division is IEEE-exact.

Bit-determinism additionally requires integral edge weights (counts):
the undirected weight collapse and degree sums are then exact in any
order. Data-derived eigenvectors are not SQL-expressible (driver
Cholesky), so the driver query for this family is rows-only — the same
documented stance as emb_pca_project; correctness is pinned by a NumPy
transliteration oracle instead.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K
from ..text.dedup import _hash64
from .propagation import _sym_norm_arcs, features_wide

# power-of-two scales: the final /SCALE is an exact IEEE operation
QUANT_SCALE = float(2**36)
INIT_MOD = 2**20


@dataclass
class SpectralStats:
    k: int = 0
    iterations: int = 0
    eigenvalues: list[float] = field(default_factory=list)
    wall_sec: float = 0.0


def _qsum(expr) -> F.Column:
    """Order-free float sum: quantize each term to int64, sum exactly,
    de-scale by the power-of-two quantum."""
    return (
        F.sum(F.floor(expr * F.lit(QUANT_SCALE) + F.lit(0.5)).cast("long"))
        / F.lit(QUANT_SCALE)
    )


def _init_state(
    verts: DataFrame, k: int, seed: int, hash_mode: str, scale: float
) -> DataFrame:
    """Deterministic pseudo-random start block: value(id, d) ∈
    [-scale, scale] from a content-addressed hash coin — independent of
    partitioning. ``scale ≈ 1/√V`` keeps every downstream quantized int64
    sum inside the int64 / 2^53 envelope at any V (entries of an
    orthonormal block are O(1/√V), so the start block matches that
    magnitude from the first Gram onwards)."""
    m = INIT_MOD
    dims = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("dim")
    h = _hash64(
        F.concat_ws(":", F.lit("spec"), F.col("id"), F.col("dim"), F.lit(seed)),
        hash_mode,
    )
    return verts.select("id", dims).select(
        "id",
        "dim",
        (
            (F.pmod(h, F.lit(2 * m + 1)) - F.lit(m))
            / F.lit(float(m))
            * F.lit(float(scale))
        ).alias("value"),
    )


def _gram(x: DataFrame, k: int) -> np.ndarray:
    """k×k Gram matrix XᵀX via one self-join on id + k² quantized sums,
    collected to the driver (k² scalars)."""
    a = x.select("id", F.col("dim").alias("d1"), F.col("value").alias("v1"))
    b = x.select("id", F.col("dim").alias("d2"), F.col("value").alias("v2"))
    rows = (
        a.join(b, "id")
        .groupBy("d1", "d2")
        .agg(_qsum(F.col("v1") * F.col("v2")).alias("g"))
        .collect()
    )
    g = np.zeros((k, k))
    for r in rows:
        g[r["d1"], r["d2"]] = r["g"]
    return g


def _apply_right(x: DataFrame, mat: np.ndarray) -> DataFrame:
    """X ← X·mat for a small k×k driver matrix, as a broadcast literal
    join + quantized (id, j) sums over ≤k terms."""
    spark = x.sparkSession
    k = mat.shape[0]
    lit = spark.createDataFrame(
        [(i, j, float(mat[i, j])) for i in range(k) for j in range(k)
         if mat[i, j] != 0.0],
        "dim int, j int, c double",
    )
    return (
        x.join(F.broadcast(lit), "dim")
        .groupBy("id", F.col("j").alias("_j"))
        .agg(_qsum(F.col("value") * F.col("c")).alias("value"))
        .select("id", F.col("_j").alias("dim"), "value")
    )


def _orthonormalize(x: DataFrame, k: int) -> DataFrame:
    """Tall-skinny orthonormalization via the normal equations: G = XᵀX
    (exact-quantized), driver Cholesky G = L·Lᵀ, X ← X·(L⁻¹)ᵀ. A tiny
    deterministic ridge guards rank deficiency."""
    g = _gram(x, k)
    ridge = 1e-12 * (np.trace(g) / k if np.trace(g) > 0 else 1.0)
    ell = np.linalg.cholesky(g + ridge * np.eye(k))
    rinv = np.linalg.inv(ell).T  # upper triangular
    return _apply_right(x, rinv)


def _spmv_block(arcs: DataFrame, x: DataFrame) -> DataFrame:
    """One S·X hop: arcs⋈state join, quantized (v, dim) sums — all k dims
    share one shuffle."""
    return (
        arcs.join(x.withColumnRenamed("id", "u"), "u")
        .groupBy(F.col("v").alias("id"), "dim")
        .agg(_qsum(F.col("nw") * F.col("value")).alias("value"))
    )


def spectral_embedding(
    edges: DataFrame,
    k: int = 8,
    iterations: int = 12,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    ckpt=None,
    ckpt_every: int = 5,
    resume: bool = False,
) -> tuple[DataFrame, SpectralStats]:
    """Top-k (algebraic) eigenvector block of ``S = D^-1/2 W D^-1/2`` by
    orthogonal iteration on the shifted operator ``S + I`` (see the inline
    note): ``X ← orth((S+I)·X)`` from a content-addressed random start.
    Returns ``(long_df(id, dim, value), stats)`` with dims relabeled in
    descending order of the Rayleigh eigenvalue estimates
    ``λ_d = x_dᵀ S x_d`` (reported in ``stats.eigenvalues``); vertices
    outside the SpMV image (isolated) keep no rows — absent = 0.

    Convergence is geometric in the eigengap ``|λ_{k+1}/λ_k|``; for
    cluster structure ~10–20 iterations suffice. All reductions are
    integer-quantized (bit-identical at any parallelism, NumPy-oracle
    transliteratable); the only driver-side work is k×k linear algebra.

    ``ckpt`` (a checkpoint.CheckpointManager) saves the orthonormalized
    block every ``ckpt_every`` iterations under name ``spectral_x`` with
    per-partition lineage; ``resume=True`` continues from the latest
    committed iteration. Because every reduction is order-free
    integer-quantized, a resumed run is BIT-IDENTICAL to an uninterrupted
    one — no layout-proof summation tricks needed (unlike pagerank's
    float dangling mass).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    t0 = time.time()
    verts = K.materialize(G.vertices(edges))
    # iterate on the SHIFTED operator S + I: eigenvalues (λ+1) ∈ [0, 2] are
    # non-negative, so magnitude order == algebraic order and the block
    # converges to the top ALGEBRAIC eigenvectors of S (plain power
    # iteration would chase large-|λ| negative modes — near-bipartite
    # structure — which are the wrong coordinates for NJW clustering).
    # The shift is one unit self-arc per vertex folded into the arc table.
    arcs = K.materialize(
        _sym_norm_arcs(edges, self_loop=False).unionByName(
            verts.select(
                F.col("id").alias("u"), F.col("id").alias("v"),
                F.lit(1.0).alias("nw"),
            )
        )
    )
    n = verts.count()
    init_scale = 1.0 / float(np.sqrt(max(n, 1)))
    start_iter = 0
    x = None
    if ckpt is not None and resume:
        latest = ckpt.latest("spectral_x")
        if latest is not None:
            start_iter, state_df, saved = latest
            # a checkpoint from different (k, seed) is a different
            # computation — resuming it would crash on the k×k Gram or
            # silently return wrong eigenvectors
            if saved.get("k") != k or saved.get("seed") != seed:
                raise ValueError(
                    f"spectral_x checkpoint was written with "
                    f"k={saved.get('k')}, seed={saved.get('seed')} — "
                    f"cannot resume with k={k}, seed={seed}"
                )
            x = K.materialize(state_df)
    if x is None:
        x = K.materialize(_init_state(verts, k, seed, hash_mode, init_scale))
        x = K.materialize(_orthonormalize(x, k))
    for i in range(start_iter + 1, iterations + 1):
        x = K.materialize(_orthonormalize(_spmv_block(arcs, x), k))
        if ckpt is not None and (i % ckpt_every == 0 or i == iterations):
            x = ckpt.save(x, "spectral_x", i, metrics={"k": k, "seed": seed})
    # Rayleigh–Ritz extraction: individual columns rotate slowly INSIDE the
    # (fast-converging) block subspace, so per-column Rayleigh quotients lag
    # badly. Project the operator onto the block — H = Xᵀ(S+I)X, k×k on the
    # driver — diagonalize it, and rotate X by H's eigenvector matrix: the
    # Ritz pairs converge at the subspace rate, not the column rate.
    y = _spmv_block(arcs, x)
    h_rows = (
        x.select("id", F.col("dim").alias("d1"), F.col("value").alias("v1"))
        .join(
            y.select("id", F.col("dim").alias("d2"), F.col("value").alias("v2")),
            "id",
        )
        .groupBy("d1", "d2")
        .agg(_qsum(F.col("v1") * F.col("v2")).alias("h"))
        .collect()
    )
    h = np.zeros((k, k))
    for r in h_rows:
        h[r["d1"], r["d2"]] = r["h"]
    h = (h + h.T) / 2.0  # symmetrize quantization asymmetry
    ritz, vecs = np.linalg.eigh(h)  # ascending
    order = list(range(k - 1, -1, -1))
    v_desc = vecs[:, order]
    out = _apply_right(x, v_desc)
    stats = SpectralStats(
        k=k,
        iterations=iterations,
        # un-shift: λ(S) = λ(S+I) − 1 (exact IEEE subtraction)
        eigenvalues=[float(ritz[d]) - 1.0 for d in order],
        wall_sec=time.time() - t0,
    )
    return out, stats


def spectral_clustering(
    edges: DataFrame,
    n_clusters: int,
    k: int | None = None,
    iterations: int = 12,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    row_normalize: bool = True,
    lloyd_iters: int = 4,
) -> tuple[DataFrame, SpectralStats]:
    """Ng–Jordan–Weiss spectral clustering: spectral embedding into
    ``k = n_clusters`` (default) eigenvector coordinates, per-row L2
    normalization onto the unit sphere, then the engine's exact-integer
    k-means. Returns ``(assignments(id, cluster), embedding stats)``.

    Composition of two already-bit-deterministic operators, so the whole
    pipeline is parallelism-invariant end to end. Each stage is the
    engine's scale shape: SpMV iterations (E×k shuffle), k×k driver
    algebra, one mapInPandas k-means pass per Lloyd round.
    """
    kk = k or n_clusters
    emb, stats = spectral_embedding(
        edges, k=kk, iterations=iterations, seed=seed, hash_mode=hash_mode
    )
    wide = features_wide(emb, n_dims=kk)
    if row_normalize:
        nrm = F.sqrt(
            F.aggregate("features", F.lit(0.0), lambda acc, v: acc + v * v)
        )
        wide = wide.select(
            "id",
            F.when(
                nrm > 0.0,
                F.transform("features", lambda v: v / nrm),
            ).otherwise(F.col("features")).alias("features"),
        )
    from ..sim.kmeans import kmeans

    assigned, _, _ = kmeans(
        wide,
        k=n_clusters,
        lloyd_iters=lloyd_iters,
        id_col="id",
        vec_col="features",
        seed=seed,
        hash_mode=hash_mode,
    )
    return assigned.select("id", "cluster"), stats
