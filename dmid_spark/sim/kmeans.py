"""General k-means clustering over an embedding column (Lloyd's algorithm).

Not in the reference repo — LLM-pipeline extension: k-means over document
embeddings is the workhorse of training-data curation at scale — SemDeDup
partitions the corpus into clusters before near-dup search, cluster-balanced
sampling flattens topic skew, and per-cluster quality audits localize bad
sources. ``ivf_build`` (ann.py) trains *spherical* k-means as an internal
index step; this module exposes plain Euclidean k-means as a first-class
operator with assignments, centroids, and per-cluster stats.

Determinism — the part that matters at 1000 executors: each Lloyd update
accumulates **integer-quantized** coordinates (``floor(x·SCALE + 0.5)`` as
int64), so per-cluster sums are EXACT and independent of partition layout,
executor count, and reduce order. The refined centroid is
``int_sum / (count·SCALE)`` — one IEEE-double division of exact integers —
hence bit-identical at any parallelism AND replicable in an engine twin
(the DuckDB oracle runs the full Lloyd chain, unlike ``ivf_build`` whose
float partial sums force its oracle to pin ``lloyd_iters=0``). Overflow
headroom: |x| ≤ ~8e3 quantized at 1e6 → |q| ≤ 8e9; int64 holds ~1.1e9 such
rows per cluster — beyond that, lower ``quant_scale``.

Scale notes: per round, one ``mapInPandas`` pass over the corpus emits
≤ partitions × k tiny (cell, int-sum-vector, count) rows reduced on the
driver — the same driver-resident-small-vector shape as the CSR PageRank
modes; nothing O(N) centralizes, and the k×D centroid matrix is broadcast.
The final assignment is one more Arrow pass. Cost: (lloyd_iters+1) corpus
scans, zero shuffles.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000


@dataclass
class KMeansStats:
    k: int = 0
    lloyd_iters: int = 0
    sizes_per_iter: list[list[int]] = field(default_factory=list)
    wall_sec: float = 0.0


def _init_centroids(
    corpus: DataFrame, k: int, id_col: str, vec_col: str, seed: int, hash_mode: str,
    scale: int,
) -> np.ndarray:
    """Deterministic seed centroids: the k corpus vectors with the smallest
    (hash(id+seed) mod 1000003, id) key — same device as ivf_build — taken
    at quantized resolution so both engines start from identical doubles."""
    if hash_mode == "md5":
        hkey = F.conv(
            F.substring(F.md5((F.col(id_col) + seed).cast("string")), 1, 15), 16, 10
        ).cast("long")
    else:
        hkey = F.xxhash64(F.col(id_col) + seed)
    sample = (
        corpus.select(id_col, vec_col)
        .orderBy(F.pmod(hkey, F.lit(1_000_003)), F.col(id_col))
        .limit(k)
        .collect()
    )
    if len(sample) < k:
        raise ValueError(f"kmeans: corpus has {len(sample)} rows < k={k}")
    raw = np.array([list(r[vec_col]) for r in sample], dtype=np.float64)
    return np.floor(raw * scale + 0.5) / scale


def _dist2(vecs: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Squared L2 via the |v|² − 2v·c + |c|² expansion — the same functional
    form the SQL twin evaluates with list_dot_product."""
    return (
        (vecs * vecs).sum(axis=1, keepdims=True)
        - 2.0 * (vecs @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )


def kmeans(
    corpus: DataFrame,
    k: int = 8,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    hash_mode: str = "xxhash64",
    quant_scale: int = QUANT_SCALE,
) -> tuple[DataFrame, np.ndarray, KMeansStats]:
    """Lloyd's k-means. Returns (assignments, centroids, stats) where
    assignments = (id_col, original columns…, cluster int, dist2 double)
    and centroids is the k×D float64 matrix after ``lloyd_iters`` exact
    integer-quantized updates (empty clusters keep their previous
    centroid). Ties in the argmin break toward the lowest cluster id."""
    t0 = time.time()
    cents = _init_centroids(corpus, k, id_col, vec_col, seed, hash_mode, quant_scale)
    spark = corpus.sparkSession
    stats = KMeansStats(k=k, lloyd_iters=lloyd_iters)

    prepared = corpus.withColumn("__vec", F.col(vec_col).cast("array<double>"))

    for _ in range(lloyd_iters):
        bc = spark.sparkContext.broadcast(cents)

        def partials(it, _bc=bc, _k=k, _scale=quant_scale):
            sums, counts = None, None
            for pdf in it:
                if not len(pdf):
                    continue
                vecs = np.array(pdf["__vec"].tolist(), dtype=np.float64)
                cell = _dist2(vecs, _bc.value).argmin(axis=1)
                quant = np.floor(vecs * _scale + 0.5).astype(np.int64)
                if sums is None:
                    sums = np.zeros((_k, quant.shape[1]), dtype=np.int64)
                    counts = np.zeros(_k, dtype=np.int64)
                np.add.at(sums, cell, quant)
                np.add.at(counts, cell, 1)
            if sums is not None:
                yield pd.DataFrame(
                    {"cell": np.arange(_k, dtype=np.int32), "s": list(sums), "n": counts}
                )

        part = prepared.select("__vec").mapInPandas(
            partials, "cell int, s array<long>, n long"
        ).toPandas()
        sums = np.zeros_like(cents, dtype=np.int64)
        counts = np.zeros(k, dtype=np.int64)
        for _, row in part.iterrows():
            sums[row["cell"]] += np.asarray(row["s"], dtype=np.int64)
            counts[row["cell"]] += row["n"]
        nonempty = counts > 0
        cents = cents.copy()
        cents[nonempty] = sums[nonempty].astype(np.float64) / (
            counts[nonempty, None].astype(np.float64) * float(quant_scale)
        )
        stats.sizes_per_iter.append(counts.tolist())
        bc.destroy()

    bc_final = spark.sparkContext.broadcast(cents)

    def assign(it, _bc=bc_final):
        for pdf in it:
            vecs = np.array(pdf["__vec"].tolist(), dtype=np.float64)
            d2 = _dist2(vecs, _bc.value)
            pdf = pdf.drop(columns=["__vec"])
            pdf["cluster"] = d2.argmin(axis=1).astype(np.int32)
            pdf["dist2"] = d2.min(axis=1)
            yield pdf

    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in corpus.schema.fields
    )
    assigned = prepared.mapInPandas(assign, f"{out_fields}, cluster int, dist2 double")
    stats.wall_sec = time.time() - t0
    return assigned, cents, stats


def cluster_balanced_sample(
    corpus: DataFrame,
    k: int = 8,
    per_cluster: int = 10,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Semantic-diversity sampling: k-means the corpus, then keep a seeded
    uniform ``per_cluster``-sample from every cluster (content-addressed
    hash rank, id tiebreak — same coin as text.sampling.group_sample), so
    the sample covers embedding space instead of mirroring topic skew.
    One window partitioned by cluster over k groups — never global."""
    from ..text.dedup import _hash64
    from pyspark.sql import Window

    assigned, _, _ = kmeans(
        corpus, k=k, lloyd_iters=lloyd_iters, id_col=id_col, vec_col=vec_col,
        seed=seed, hash_mode=hash_mode,
    )
    draw = F.pmod(
        _hash64(F.concat_ws(":", F.col(id_col), F.lit(str(seed))), hash_mode),
        F.lit(1_000_003),
    )
    w = Window.partitionBy("cluster").orderBy(draw, F.col(id_col))
    return (
        assigned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= per_cluster)
    )
