"""Product quantization (PQ) over an embedding column — subspace k-means
codebooks, m-byte codes, and asymmetric-distance (ADC) top-k scoring.

Not in the reference repo — LLM-pipeline extension completing the ANN
family (Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011): ``sim.ann`` gives the IVF coarse stage and ``sim.quant`` the
per-dimension scalar codes; PQ is the fine stage an IVF-PQ index pairs
with them — D float dims become m small codebook ids (64 dims → 4 bytes
at m=4/k=16 here; 768 dims → 8–16 bytes in production), and query-time
distance is a table lookup per subspace instead of a D-dim dot product.

Spark-first shape, same scale contract as :mod:`.kmeans`:

- training: per Lloyd iteration ONE ``mapInPandas`` corpus scan trains
  ALL m subspace codebooks simultaneously — each partition emits
  ≤ m·k tiny (sub, cell, int-sum-vector, count) rows reduced on the
  driver; the m×k×(D/m) codebook tensor is broadcast. Nothing O(N)
  centralizes, zero shuffles.
- encode: one more Arrow pass → ``codes array<int>`` (the argmin cell
  per subspace).
- ADC: the query's m×k lookup table is a driver-side constant folded
  into pure JVM column expressions (``element_at`` per subspace, fixed
  left-to-right sum) — scoring N stored codes is a scan, no join.

Determinism — the cross-engine replay device of :mod:`.kmeans`: Lloyd
updates accumulate **integer-quantized** coordinates, so per-cell sums
are exact int64s independent of partition layout and reduce order, and
the DuckDB oracle twin replays the full per-subspace training chain
(init → updates → encode → ADC). Subspace seed centroids slice the SAME
k hash-selected corpus vectors used by plain k-means, so one ordered
scan seeds every subspace.

Reference parity note: the reference engine (Rofti/DMID) has no vector
ops at all; this module exists for the training-data-pipeline brief. The
graph-side counterpart is ``sim/ann.py`` (cited there).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import QUANT_SCALE, _dist2, _init_centroids, kmeans


@dataclass
class PQStats:
    m: int = 0
    k: int = 0
    dsub: int = 0
    lloyd_iters: int = 0
    sizes_per_iter: list[list[list[int]]] = field(default_factory=list)
    wall_sec: float = 0.0


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    k: int = 16,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    hash_mode: str = "xxhash64",
    quant_scale: int = QUANT_SCALE,
) -> tuple[np.ndarray, PQStats]:
    """Train m per-subspace codebooks of k centroids each. Returns
    ``(codebooks, stats)`` with codebooks shaped (m, k, D/m) float64.
    D must divide evenly into m subspaces. Each Lloyd iteration is ONE
    corpus scan covering every subspace; updates are exact
    integer-quantized sums (empty cells keep their previous centroid,
    argmin ties break toward the lowest cell id)."""
    t0 = time.time()
    # seed all subspaces from the same k hash-selected vectors, sliced
    full = _init_centroids(corpus, k, id_col, vec_col, seed, hash_mode, quant_scale)
    dim = full.shape[1]
    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    dsub = dim // m
    cents = np.stack([full[:, s * dsub:(s + 1) * dsub] for s in range(m)])  # (m,k,dsub)
    spark = corpus.sparkSession
    stats = PQStats(m=m, k=k, dsub=dsub, lloyd_iters=lloyd_iters)
    prepared = corpus.select(F.col(vec_col).cast("array<double>").alias("__vec"))

    for _ in range(lloyd_iters):
        bc = spark.sparkContext.broadcast(cents)

        def partials(it, _bc=bc, _m=m, _k=k, _dsub=dsub, _scale=quant_scale):
            sums, counts = None, None
            for pdf in it:
                if not len(pdf):
                    continue
                vecs = np.array(pdf["__vec"].tolist(), dtype=np.float64)
                quant = np.floor(vecs * _scale + 0.5).astype(np.int64)
                if sums is None:
                    sums = np.zeros((_m, _k, _dsub), dtype=np.int64)
                    counts = np.zeros((_m, _k), dtype=np.int64)
                for s in range(_m):
                    sub = vecs[:, s * _dsub:(s + 1) * _dsub]
                    cell = _dist2(sub, _bc.value[s]).argmin(axis=1)
                    np.add.at(sums[s], cell, quant[:, s * _dsub:(s + 1) * _dsub])
                    np.add.at(counts[s], cell, 1)
            if sums is not None:
                subs, cells = np.meshgrid(np.arange(_m), np.arange(_k), indexing="ij")
                yield pd.DataFrame(
                    {
                        "sub": subs.ravel().astype(np.int32),
                        "cell": cells.ravel().astype(np.int32),
                        "s": list(sums.reshape(_m * _k, _dsub)),
                        "n": counts.ravel(),
                    }
                )

        part = prepared.mapInPandas(
            partials, "sub int, cell int, s array<long>, n long"
        ).toPandas()
        sums = np.zeros((m, k, dsub), dtype=np.int64)
        counts = np.zeros((m, k), dtype=np.int64)
        for _, row in part.iterrows():
            sums[row["sub"], row["cell"]] += np.asarray(row["s"], dtype=np.int64)
            counts[row["sub"], row["cell"]] += row["n"]
        nonempty = counts > 0
        cents = cents.copy()
        cents[nonempty] = sums[nonempty].astype(np.float64) / (
            counts[nonempty, None].astype(np.float64) * float(quant_scale)
        )
        stats.sizes_per_iter.append(counts.tolist())
        bc.destroy()

    stats.wall_sec = time.time() - t0
    return cents, stats


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Arrow pass: every vector → its m argmin cells. Returns the
    input columns minus ``vec_col`` plus ``codes array<int>``. Ties break
    toward the lowest cell id (same rule as training)."""
    m, _, dsub = codebooks.shape
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)
    prepared = corpus.withColumn("__vec", F.col(vec_col).cast("array<double>"))
    keep = [c for c in corpus.columns if c != vec_col]

    def encode(it, _bc=bc, _m=m, _dsub=dsub, _keep=keep):
        for pdf in it:
            vecs = np.array(pdf["__vec"].tolist(), dtype=np.float64)
            codes = np.empty((len(pdf), _m), dtype=np.int32)
            for s in range(_m):
                sub = vecs[:, s * _dsub:(s + 1) * _dsub]
                codes[:, s] = _dist2(sub, _bc.value[s]).argmin(axis=1)
            out = pdf[_keep].copy()
            out["codes"] = list(codes)
            yield out

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in corpus.schema.fields
        if f.name != vec_col
    )
    return prepared.select(*keep, "__vec").mapInPandas(
        encode, f"{fields}, codes array<int>"
    )


def adc_lut(codebooks: np.ndarray, query: np.ndarray) -> np.ndarray:
    """The (m, k) asymmetric-distance lookup table for one query vector:
    ``lut[s][c] = |q_s|^2 - 2 q_s.c + |c|^2`` with every dot product
    folded sequentially left-to-right — the exact functional form and
    fold order the SQL twin evaluates, so the table doubles match the
    engine twin bit-for-bit (modulo the final 6dp quantization)."""
    m, k, dsub = codebooks.shape
    lut = np.empty((m, k), dtype=np.float64)
    for s in range(m):
        qs = query[s * dsub:(s + 1) * dsub]
        qq = 0.0
        for x in qs:
            qq += x * x
        for c in range(k):
            cv = codebooks[s, c]
            qc = 0.0
            cc = 0.0
            for j in range(dsub):
                qc += qs[j] * cv[j]
                cc += cv[j] * cv[j]
            lut[s, c] = qq - 2.0 * qc + cc
    return lut


def pq_adc_topk(
    codes_df: DataFrame,
    codebooks: np.ndarray,
    query: np.ndarray,
    top_k: int = 10,
    id_col: str = "vec_id",
    codes_col: str = "codes",
    round_dp: int = 6,
) -> DataFrame:
    """ADC scoring: approx squared distance = fixed left-to-right sum of
    per-subspace LUT lookups, evaluated as pure JVM column expressions
    over the broadcast-folded constant table (no join, no UDF — scoring
    is a scan). Returns the global top_k as ``(id, approx_d2, rank)``;
    the rank orders by the ``round_dp``-quantized distance with id
    tiebreak, so ordering is stable across engines and ulp noise.

    The global top-k is one ``orderBy(...).limit(k)`` — Spark runs it as
    per-partition top-k + a k-row merge on the driver (TakeOrderedAndProject),
    never a full sort-shuffle."""
    lut = adc_lut(codebooks, query)
    m = lut.shape[0]
    # element_at is 1-based; codes are 0-based cells
    terms = [
        F.element_at(
            F.array(*[F.lit(float(v)) for v in lut[s]]),
            F.element_at(F.col(codes_col), s + 1) + 1,
        )
        for s in range(m)
    ]
    d2 = terms[0]
    for t in terms[1:]:
        d2 = d2 + t
    scored = codes_df.select(
        F.col(id_col).alias("id"),
        (F.round(d2, round_dp) + F.lit(0.0)).alias("approx_d2"),
    )
    w_ordered = scored.orderBy("approx_d2", "id").limit(top_k)
    from pyspark.sql import Window

    return w_ordered.withColumn(
        "rank", F.row_number().over(Window.orderBy("approx_d2", "id"))
    )


def ivfpq_build(
    corpus: DataFrame,
    n_coarse: int = 8,
    m: int = 4,
    k: int = 16,
    coarse_iters: int = 2,
    pq_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    hash_mode: str = "xxhash64",
    quant_scale: int = QUANT_SCALE,
) -> tuple[DataFrame, np.ndarray, np.ndarray, PQStats]:
    """IVF-PQ index build (Jégou et al. §IV): a coarse quantizer over the
    full vectors (Euclidean k-means — the :mod:`.kmeans` exact
    integer-quantized chain, NOT ivf_build's float spherical path, so the
    whole index trains bit-replayably), then product quantization of the
    RESIDUAL ``v − coarse[cell]`` — the device that makes m tiny codes
    describe a vector to useful precision, because residuals concentrate
    near 0 regardless of which cell a vector lives in.

    Returns ``(index, coarse_centroids, codebooks, stats)`` where index =
    ``(id, cluster, codes array<int>)`` — the (n_coarse + m·k·D/m)-float
    model plus C+m small ints per vector is the entire ANN state.

    Scale shape: coarse train = (coarse_iters+1) scans (kmeans), residual
    pass = one Arrow scan (centroid matrix broadcast), PQ train =
    pq_iters scans over residuals, encode = one more — every stage is a
    corpus scan with driver-resident small state, zero shuffles.
    Residual arithmetic is exact IEEE subtraction of engine-identical
    doubles, so the SQL twin replays coarse → residual → codebooks →
    codes end to end."""
    assigned, coarse, _ = kmeans(
        corpus, k=n_coarse, lloyd_iters=coarse_iters, id_col=id_col,
        vec_col=vec_col, seed=seed, hash_mode=hash_mode, quant_scale=quant_scale,
    )
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(coarse)
    prepared = assigned.select(
        F.col(id_col), F.col("cluster"),
        F.col(vec_col).cast("array<double>").alias("__vec"),
    )

    def resid(it, _bc=bc, _id=id_col):
        for pdf in it:
            vecs = np.array(pdf["__vec"].tolist(), dtype=np.float64)
            res = vecs - _bc.value[pdf["cluster"].to_numpy()]
            out = pdf[[_id, "cluster"]].copy()
            out["residual"] = list(res)
            yield out

    residuals = prepared.mapInPandas(
        resid, f"{id_col} long, cluster int, residual array<double>"
    )
    from .. import kernel as K

    residuals = K.materialize(residuals)
    codebooks, stats = pq_train(
        residuals, m=m, k=k, lloyd_iters=pq_iters, id_col=id_col,
        vec_col="residual", seed=seed, hash_mode=hash_mode,
        quant_scale=quant_scale,
    )
    codes = pq_encode(residuals, codebooks, id_col=id_col, vec_col="residual")
    return codes, coarse, codebooks, stats


def ivfpq_topk(
    index: DataFrame,
    coarse: np.ndarray,
    codebooks: np.ndarray,
    query: np.ndarray,
    n_probe: int = 3,
    top_k: int = 10,
    id_col: str = "vec_id",
    round_dp: int = 6,
    rerank: DataFrame | None = None,
    rerank_mult: int = 4,
    vec_col: str = "embedding",
) -> DataFrame:
    """Probed ADC search: pick the ``n_probe`` coarse cells nearest the
    query (driver-side — C is tiny), build one residual lookup table per
    probed cell (the query's residual differs per cell), and score ONLY
    rows in probed cells with pure JVM expressions — a filtered scan +
    TakeOrderedAndProject, no join, no Python. Distances and ranks
    quantize at ``round_dp`` with id tiebreak (stable across engines).

    ``rerank`` (the original vector table) enables the FAISS
    IndexRefineFlat refinement: the ADC shortlist of
    ``top_k·rerank_mult`` ids — a driver-resident handful — broadcast-
    semi-joins back into the vector table and the final top_k orders by
    EXACT distance (one ``aggregate`` HOF over the zipped difference, a
    fixed sequential fold). ADC's code-quantization error then only has
    to land the true neighbors in the shortlist, not rank them — the
    device that buys back recall when subquantizer distortion is
    comparable to the neighbor-distance gaps (isotropic/high-dim data).

    The per-cell LUT literal is ``n_probe·m·k`` doubles folded into the
    plan — at production shape (n_probe 32, m 16, k 256) ~1 MB of plan
    constants; past that, ship the LUT as a broadcast map join instead."""
    n_coarse = coarse.shape[0]
    m, kk, dsub = codebooks.shape
    # coarse distances via the same sequential expansion the twin uses
    cd = []
    for c in range(n_coarse):
        qq = qc = cc = 0.0
        for j in range(len(query)):
            qq += query[j] * query[j]
            qc += query[j] * coarse[c, j]
            cc += coarse[c, j] * coarse[c, j]
        cd.append((qq - 2.0 * qc + cc, c))
    probed = [c for _, c in sorted(cd)[:n_probe]]
    # per-cell residual LUTs, dense over all cells (unprobed rows filtered)
    luts = np.zeros((n_coarse, m, kk), dtype=np.float64)
    for c in probed:
        luts[c] = adc_lut(codebooks, query - coarse[c])
    nested = [
        F.array(*[
            F.array(*[F.lit(float(luts[c, s, j])) for j in range(kk)])
            for c in range(n_coarse)
        ])
        for s in range(m)
    ]
    terms = [
        F.element_at(
            F.element_at(nested[s], F.col("cluster") + 1),
            F.element_at(F.col("codes"), s + 1) + 1,
        )
        for s in range(m)
    ]
    d2 = terms[0]
    for t in terms[1:]:
        d2 = d2 + t
    scored = (
        index.filter(F.col("cluster").isin([int(c) for c in probed]))
        .select(
            F.col(id_col).alias("id"),
            (F.round(d2, round_dp) + F.lit(0.0)).alias("approx_d2"),
        )
    )
    from pyspark.sql import Window

    if rerank is None:
        out = scored.orderBy("approx_d2", "id").limit(top_k)
        return out.withColumn(
            "rank", F.row_number().over(Window.orderBy("approx_d2", "id"))
        )
    short = scored.orderBy("approx_d2", "id").limit(top_k * rerank_mult)
    qlit = F.array(*[F.lit(float(v)) for v in query])
    # exact |q - v|^2 as one sequential fold over the zipped difference —
    # the same left-to-right order the SQL twin's unrolled sum uses
    exact_d2 = F.aggregate(
        F.zip_with(
            qlit, F.col(vec_col).cast("array<double>"), lambda a, b: a - b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    refined = (
        rerank.join(
            F.broadcast(short.select("id")),
            rerank[id_col] == F.col("id"),
        )
        .select(
            "id", (F.round(exact_d2, round_dp) + F.lit(0.0)).alias("exact_d2")
        )
        .orderBy("exact_d2", "id")
        .limit(top_k)
    )
    return refined.withColumn(
        "rank", F.row_number().over(Window.orderBy("exact_d2", "id"))
    )
