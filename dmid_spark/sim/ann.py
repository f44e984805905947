"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — queries broadcast against the
  corpus, dot products as JVM-side ``zip_with``/``aggregate`` expressions,
  per-query top-k via groupBy-max-struct (no giant windows). The baseline
  and oracle.
- ``ivf_build`` / ``ivf_topk``: the scale path — IVF (inverted-file) index:
  deterministic centroid selection, one Arrow ``applyInPandas`` assignment
  pass (vectorized NumPy matmul per partition), query-time probing of the
  ``n_probe`` nearest centroid lists only. At 100 TB the corpus scan drops
  from O(N) per query to O(N · n_probe / n_centroids).
- ``cosine_near_duplicates``: embedding near-dup pairs above a cosine
  threshold, blocked by IVF cell to avoid the quadratic cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm(col) -> F.Column:
    return F.sqrt(F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x))


def _dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k. Returns (query_id, neighbor_id, cosine, rank);
    the query vector itself is excluded. Ties break toward smaller
    neighbor_id (deterministic)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cn", _norm(F.col("cv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", _norm(F.col("qv")))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / F.greatest(F.col("qn") * F.col("cn"), F.lit(1e-12))
            ).alias("cosine"),
        )
    )
    # top-k per query without a global window: aggregate a bounded sorted list
    topk = (
        scored.groupBy("query_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("cosine")).alias("negc"), "neighbor_id"))
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.posexplode("top").alias("pos", "t"))
        .select(
            "query_id",
            F.col("t.neighbor_id").alias("neighbor_id"),
            (-F.col("t.negc")).alias("cosine"),
            (F.col("pos") + 1).alias("rank"),
        )
    )
    return topk


def ivf_build(
    corpus: DataFrame,
    n_centroids: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    hash_mode: str = "xxhash64",
    lloyd_iters: int = 2,
) -> tuple[DataFrame, np.ndarray]:
    """Build an IVF index: centroids = deterministic sample of corpus
    vectors (hash-ordered, reproducible), refined by ``lloyd_iters`` rounds
    of spherical k-means (the FAISS-style training step: assign → per-cell
    mean of unit vectors → renormalize — **on by default**: untrained
    hash-sampled centroids measurably under-recall at every operating
    point), then one vectorized assignment pass. Returns
    (assignments(vec_id, cell, embedding), centroids array).
    ``n_centroids=None`` picks ~√N (one count action) — the standard
    billion-scale sizing: cells of ~√N vectors bound the probe cost at
    O(√N · n_probe) per query. ``hash_mode='md5'`` orders the centroid
    sample by the md5-prefix hash (engine-portable — the DuckDB oracle
    twin's mode; the bitwise-reproducible oracle also pins
    ``lloyd_iters=0``, see below).

    Each Lloyd round is one ``mapInPandas`` pass emitting per-partition
    per-cell partial sums (≤ partitions × n_centroids tiny rows, Arrow
    transfer) reduced on the driver — the same driver-resident-vector shape
    as the CSR PageRank modes; nothing O(N) centralizes. Note: partition-
    order float summation makes refined centroids deterministic only for a
    fixed partition layout, so the bitwise-reproducible driver oracle keeps
    ``lloyd_iters=0``; empty cells keep their previous centroid."""
    if n_centroids is None:
        import math

        n_centroids = max(4, round(math.sqrt(corpus.count())))
    if hash_mode == "md5":
        hkey = F.conv(
            F.substring(F.md5((F.col(id_col) + seed).cast("string")), 1, 15), 16, 10
        ).cast("long")
    else:
        hkey = F.xxhash64(F.col(id_col) + seed)
    sample = (
        corpus.select(id_col, vec_col)
        .orderBy(F.pmod(hkey, F.lit(1_000_003)), F.col(id_col))
        .limit(n_centroids)
        .collect()
    )
    cents = np.array([list(r[vec_col]) for r in sample], dtype=np.float64)
    cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    spark = corpus.sparkSession

    prepared = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        F.col(vec_col).cast("array<double>").alias("__vec"),
    )

    k = len(cents)
    for _ in range(lloyd_iters):
        bc_it = spark.sparkContext.broadcast(cents)

        def partials(it, _bc=bc_it, _k=k):
            sums, counts = None, None
            for pdf in it:
                if not len(pdf):
                    continue
                vecs = np.array(pdf["__vec"].tolist(), dtype=np.float64)
                unit = vecs / np.maximum(
                    np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12
                )
                cell = (unit @ _bc.value.T).argmax(axis=1)
                if sums is None:
                    sums = np.zeros((_k, unit.shape[1]))
                    counts = np.zeros(_k, dtype=np.int64)
                np.add.at(sums, cell, unit)
                np.add.at(counts, cell, 1)
            if sums is not None:
                yield pd.DataFrame(
                    {"cell": np.arange(_k, dtype=np.int32), "s": list(sums), "n": counts}
                )

        part = prepared.select("__vec").mapInPandas(
            partials, "cell int, s array<double>, n long"
        ).toPandas()
        sums = np.zeros_like(cents)
        counts = np.zeros(k, dtype=np.int64)
        for _, row in part.iterrows():
            sums[row["cell"]] += np.asarray(row["s"])
            counts[row["cell"]] += row["n"]
        nonempty = counts > 0
        cents = cents.copy()
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]
        cents /= np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        bc_it.destroy()

    bc = spark.sparkContext.broadcast(cents)

    def assign(it):
        for pdf in it:
            vecs = np.array(pdf["__vec"].tolist(), dtype=np.float64)
            norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            sims = (vecs / norms) @ bc.value.T
            pdf = pdf.drop(columns=["__vec"])
            pdf["cell"] = sims.argmax(axis=1).astype(np.int32)
            yield pdf

    out_schema = "vec_id long, embedding array<float>, cell int"
    return prepared.mapInPandas(assign, out_schema), cents


def ivf_topk(
    assignments: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: each query scans only its n_probe nearest cells.

    The default operating point (16 trained centroids, n_probe=12) holds
    measured recall@10 ≥ 0.8 even on near-uniform embeddings — the IVF
    worst case, where recall cannot beat the probed-cell fraction by much
    (the testdata embeddings measure 0.92). On clustered real-world
    embeddings the same defaults are ~1.0 and n_probe can drop to 2-4;
    size ``n_centroids≈√N`` at billion scale and re-pick n_probe from
    :func:`ivf_recall_at_k` — an approximate operator without a measured
    recall number is unfinished."""
    spark = assignments.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def probe(it):
        for pdf in it:
            vecs = np.array(pdf["__vec"].tolist(), dtype=np.float64)
            norms = np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
            sims = (vecs / norms) @ bc.value.T
            cells = np.argsort(-sims, axis=1)[:, :n_probe]
            rows = []
            for qid, cs in zip(pdf["query_id"], cells):
                for c in cs:
                    rows.append((qid, int(c)))
            yield pd.DataFrame(rows, columns=["query_id", "cell"])

    q_prep = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("__vec")
    )
    q_cells = q_prep.mapInPandas(probe, "query_id long, cell int")
    q_full = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    cand = (
        assignments.join(F.broadcast(q_cells), "cell")
        .select("query_id", F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").cast("array<double>").alias("cv"))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(F.broadcast(q_full), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / F.greatest(F.col("qn") * _norm(F.col("cv")), F.lit(1e-12))
            ).alias("cosine"),
        )
        .distinct()
    )
    return (
        cand.groupBy("query_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.struct((-F.col("cosine")).alias("negc"), "neighbor_id"))
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.posexplode("top").alias("pos", "t"))
        .select(
            "query_id",
            F.col("t.neighbor_id").alias("neighbor_id"),
            (-F.col("t.negc")).alias("cosine"),
            (F.col("pos") + 1).alias("rank"),
        )
    )


def ivf_recall_at_k(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probes: tuple[int, ...] = (1, 2, 4, 8),
    n_centroids: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    lloyd_iters: int = 2,
) -> dict[int, float]:
    """Measured recall@k of the IVF index vs the brute-force oracle:
    ``recall = |topk_ivf ∩ topk_brute| / |topk_brute|`` averaged over the
    query set, per n_probe. An approximate operator without a measured
    recall number is unfinished — this is the number."""
    truth = brute_force_topk(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col
    ).select("query_id", "neighbor_id").persist()
    denom = truth.count()
    assigned, cents = ivf_build(
        corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col, seed=seed,
        lloyd_iters=lloyd_iters,
    )
    assigned = assigned.persist()
    out: dict[int, float] = {}
    for npb in n_probes:
        approx = ivf_topk(
            assigned, cents, queries, k=k, n_probe=npb, id_col=id_col, vec_col=vec_col
        ).select("query_id", "neighbor_id")
        hit = truth.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
        out[npb] = hit / denom if denom else 1.0
    truth.unpersist()
    assigned.unpersist()
    return out


def brute_force_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-dup pairs (cosine ≥ threshold): the all-pairs
    oracle for ``cosine_near_duplicates``. Quadratic — use only on bounded
    subsets (tests/oracles); the IVF-blocked variant is the scale path."""
    a = corpus.select(
        F.col(id_col).alias("doc_a"), F.col(vec_col).cast("array<double>").alias("va")
    )
    b = corpus.select(
        F.col(id_col).alias("doc_b"), F.col(vec_col).cast("array<double>").alias("vb")
    )
    pairs = a.join(b, F.col("doc_a") < F.col("doc_b"))
    cos = _dot(F.col("va"), F.col("vb")) / F.greatest(
        _norm(F.col("va")) * _norm(F.col("vb")), F.lit(1e-12)
    )
    return pairs.select("doc_a", "doc_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


def cosine_near_duplicates(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_centroids: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell: int = 5000,
    capped_out: list | None = None,
) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ threshold), blocked by IVF cell —
    only same-cell pairs are compared (recall trades against the quadratic
    cross join; raise n_probe-style recall by lowering n_centroids).

    Cells holding more than ``max_cell`` vectors are dropped from pairing —
    the same quadratic-bucket reasoning as the LSH/SimHash ``max_bucket``
    caps: with a low n_centroids default one fat cell is an all-pairs join
    in disguise. Drops are reported, never silent: pass a list as
    ``capped_out`` to receive ``(cell, cell_size)`` per dropped cell (an
    action — only runs when asked). Size ``n_centroids ≈ N / target_cell``
    (or ``None`` for √N cells) so real corpora stay under the cap."""
    assigned, _ = ivf_build(corpus, n_centroids=n_centroids, id_col=id_col, vec_col=vec_col)
    sizes = assigned.groupBy("cell").agg(F.count("*").alias("csz"))
    if capped_out is not None:
        capped_out.extend(
            (r["cell"], r["csz"])
            for r in sizes.filter(F.col("csz") > max_cell).collect()
        )
    assigned = assigned.join(
        sizes.filter(F.col("csz") <= max_cell).select("cell"), "cell"
    )
    a = assigned.select(
        "cell", F.col("vec_id").alias("doc_a"), F.col("embedding").cast("array<double>").alias("va")
    )
    b = assigned.select(
        "cell", F.col("vec_id").alias("doc_b"), F.col("embedding").cast("array<double>").alias("vb")
    )
    pairs = a.join(b, "cell").filter(F.col("doc_a") < F.col("doc_b"))
    cos = _dot(F.col("va"), F.col("vb")) / F.greatest(
        _norm(F.col("va")) * _norm(F.col("vb")), F.lit(1e-12)
    )
    return pairs.select("doc_a", "doc_b", cos.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )
