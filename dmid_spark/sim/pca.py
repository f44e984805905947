"""Distributed PCA over an embedding column — the dimensionality-reduction
stage between raw embeddings and the similarity stack (sim/ann.py IVF,
cosine_near_duplicates): SemDeDup-style semantic dedup and ANN both get
cheaper and better-conditioned after projecting D→k with k ≪ D.

Spark-first shape: the corpus is touched by exactly ONE ``mapInPandas``
pass that emits per-partition moment partials (count, Σx, ΣxᵀX — at most
``partitions`` rows of D + D² doubles, Arrow transfer); the D×D covariance
eigendecomposition runs on the driver (D is the embedding width, 64–4096 —
never data-sized), and projection is a second vectorized pass against the
broadcast component matrix. Nothing O(N) ever centralizes — the same
driver-resident-small/distributed-big split as ivf_build's Lloyd rounds.

Determinism: partials fold on the driver in partition order, so moments
are bit-stable for a fixed partition layout (across layouts they differ at
float-add-order level, ~1e-15 — quantize downstream). Component sign is
pinned by convention (largest-|entry| coordinate made positive), the same
rule NumPy-side oracles apply.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PcaModel:
    mean: np.ndarray            # (D,)
    components: np.ndarray      # (k, D) rows = principal axes, unit norm
    explained_variance: np.ndarray  # (k,) eigenvalues, descending
    total_variance: float       # trace of the covariance
    n: int


def covariance_stats(
    emb: DataFrame, vec_col: str = "embedding", reduce_mode: str = "driver"
) -> tuple[np.ndarray, np.ndarray, int]:
    """(mean (D,), population covariance (D, D), n) in one distributed
    moment pass. NULL/empty vectors are skipped; ragged widths raise.

    ``reduce_mode``: the per-partition partials are ``partitions`` rows of
    D + D² doubles. ``'driver'`` (default) collects and folds them on the
    driver in partition order — bit-stable for a fixed layout, and fine
    whenever partitions × D² is driver-sized (D ≤ 1024 at any realistic
    partition count). ``'executor'`` streams the partial rows through ONE
    executor fold pass first (coalesce(1) preserves partition order, so the
    fold order — and the result — is identical), and the driver collects
    exactly one row: use it for wide embeddings over very many partitions
    (D = 4096 × 10⁴ partitions ≈ 1.3 TB of partials is an executor-stream,
    not a driver resident set)."""

    def partials(it):
        n, s, xtx, d = 0, None, None, None
        for pdf in it:
            vals = [v for v in pdf["__vec"] if v is not None and len(v)]
            if not vals:
                continue
            x = np.array(vals, dtype=np.float64)
            if d is None:
                d = x.shape[1]
                s = np.zeros(d)
                xtx = np.zeros((d, d))
            elif x.shape[1] != d:
                raise ValueError(f"ragged embedding widths: {x.shape[1]} vs {d}")
            n += x.shape[0]
            s += x.sum(axis=0)
            xtx += x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s], "xtx": [xtx.reshape(-1)]}
            )

    if reduce_mode not in ("driver", "executor"):
        raise ValueError(f"reduce_mode must be 'driver' or 'executor', got {reduce_mode!r}")
    partial_df = emb.select(
        F.col(vec_col).cast("array<double>").alias("__vec")
    ).mapInPandas(partials, "n long, s array<double>, xtx array<double>")
    if reduce_mode == "executor":

        def fold(it):
            n, s, xtx = 0, None, None
            for pdf in it:
                for _, row in pdf.iterrows():
                    n += int(row["n"])
                    rs, rx = np.asarray(row["s"]), np.asarray(row["xtx"])
                    if s is None:
                        s, xtx = rs.copy(), rx.copy()
                    else:
                        s += rs
                        xtx += rx
            if n:
                yield pd.DataFrame({"n": [n], "s": [s], "xtx": [xtx]})

        partial_df = partial_df.coalesce(1).mapInPandas(
            fold, "n long, s array<double>, xtx array<double>"
        )
    part = partial_df.collect()
    if not part:
        raise ValueError("no non-empty vectors")
    d = len(part[0]["s"])
    n, s, xtx = 0, np.zeros(d), np.zeros((d, d))
    for r in part:  # collect() preserves partition order → deterministic fold
        n += r["n"]
        s += np.asarray(r["s"])
        xtx += np.asarray(r["xtx"]).reshape(d, d)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    return mean, cov, n


def pca_fit(
    emb: DataFrame, k: int, vec_col: str = "embedding", reduce_mode: str = "driver"
) -> PcaModel:
    """Fit top-``k`` principal components. Eigendecomposition of the D×D
    covariance on the driver (``np.linalg.eigh``, exact for symmetric
    matrices); eigenvalues descending; each component's largest-|entry|
    coordinate is made positive (sign convention). ``reduce_mode`` as in
    :func:`covariance_stats`."""
    mean, cov, n = covariance_stats(emb, vec_col=vec_col, reduce_mode=reduce_mode)
    d = cov.shape[0]
    if not 1 <= k <= d:
        raise ValueError(f"k must be in [1, {d}], got {k}")
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    for i in range(comps.shape[0]):
        j = np.argmax(np.abs(comps[i]))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return PcaModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(evals[order], 0.0),
        total_variance=float(np.trace(cov)),
        n=n,
    )


def pca_project(
    emb: DataFrame,
    model: PcaModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """Project every vector onto the model's components: ``(id, out_col:
    array<double> length k)``. One vectorized pass against the broadcast
    (k, D) matrix; NULL/empty vectors are dropped."""
    spark = emb.sparkSession
    bc = spark.sparkContext.broadcast((model.mean, model.components))

    def project(it):
        mean, comps = bc.value
        for pdf in it:
            mask = pdf["__vec"].map(lambda v: v is not None and len(v) > 0)
            pdf = pdf[mask]
            if not len(pdf):
                continue
            x = np.array(pdf["__vec"].tolist(), dtype=np.float64)
            p = (x - mean) @ comps.T
            yield pd.DataFrame({"__id": pdf["__id"], out_col: list(p)})

    out = (
        emb.select(
            F.col(id_col).alias("__id"),
            F.col(vec_col).cast("array<double>").alias("__vec"),
        )
        .mapInPandas(project, f"__id long, {out_col} array<double>")
        .withColumnRenamed("__id", id_col)
    )
    return out


def semantic_dedup(
    emb: DataFrame,
    k_pca: int = 8,
    threshold: float = 0.95,
    n_centroids: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int = 5000,
    capped_out: list | None = None,
) -> tuple[DataFrame, DataFrame]:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): PCA-reduce the
    embeddings D→``k_pca``, block by IVF cell in the reduced space, compare
    cosine only within cells, and resolve near-dup pairs (≥ ``threshold``)
    into clusters with a min-id canonical representative.

    Returns ``(pairs, clusters)``: ``pairs(doc_a, doc_b, cosine)`` in the
    REDUCED space, and ``clusters(doc_id, canonical_id, cluster_size)`` —
    keep rows where ``doc_id == canonical_id``, drop the rest (docs in no
    pair are trivially canonical and absent, the near_duplicate_clusters
    convention).

    Every stage is a capped, already-verified component: the PCA moment
    pass (this module), ivf_build's Lloyd blocking with the ``max_cell``
    fat-cell cap + ``capped_out`` reporting, and the small/large CC cluster
    resolution — composition adds no new uncapped join. Reduced vectors
    are float32 (ivf_build's Arrow schema); at dedup thresholds the
    ~1e-7 relative quantization is far below the decision margin.
    """
    from ..text.dedup import near_duplicate_clusters
    from .ann import cosine_near_duplicates

    model = pca_fit(emb, k=k_pca, vec_col=vec_col)
    proj = pca_project(emb, model, id_col=id_col, vec_col=vec_col)
    reduced = proj.select(
        F.col(id_col).alias("vec_id"),
        F.col("proj").cast("array<float>").alias("embedding"),
    )
    pairs = cosine_near_duplicates(
        reduced,
        threshold=threshold,
        n_centroids=n_centroids,
        max_cell=max_cell,
        capped_out=capped_out,
    )
    clusters = near_duplicate_clusters(pairs)
    return pairs, clusters
