"""PageRank (SURVEY.md §2.6 X1) on the shared SpMV kernel.

Standard semantics (Giraph-examples / published): uniform teleport, damping
d = 0.85, dangling mass redistributed uniformly, iterated until the L1 delta
falls below ``tol`` (BASELINE.json convergence rule). Two execution modes:

- ``mode='join'``: state stays a DataFrame; each superstep is one
  edges⋈state join + hash aggregate. Unbounded scale (state never
  centralizes); the per-iteration dangling-mass scalar is a cheap aggregate
  over the (checkpointed) state.
- ``mode='csr'``: per-partition CSR blocks in Arrow UDFs against a broadcast
  NumPy rank vector (north_star layout). One shuffle-free distributed pass
  per superstep + O(N) driver work; right whenever 8 bytes/vertex fits the
  driver (~10^8-10^9 vertices).
- ``mode='csr_rdd'``: same layout, but the CSR NumPy blocks are built once
  (one Arrow pass) and persisted as an RDD — removes the per-superstep
  Arrow re-conversion + re-sort of ``mode='csr'`` (~4x faster measured at
  3M edges; the scaling-bench default).
- ``mode='jvm'``: edges cached JVM-side; each superstep is one broadcast-
  hash-join + hash-aggregate with the rank vector shipped driver↔JVM as
  single Arrow batches. Zero Python in the hot loop.

All modes produce identical results (tested) on gap-free dense id spaces
and share checkpoint/lineage. Dense ids [0, n) required except in join
mode, which accepts any long ids. Caveat: csr_rdd derives n = max(id)+1;
if the id space has gaps, the absent ids become teleport-only phantom
vertices there while the verts-derived modes never emit them — run
graph.densify_ids first when ids may be sparse.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K
from ..checkpoint import CheckpointManager


@dataclass
class PageRankStats:
    iterations: int = 0
    converged: bool = False
    deltas: list[float] = field(default_factory=list)
    wall_sec: float = 0.0
    n_vertices: int = 0
    n_edges: int = 0
    iter_secs: list[float] = field(default_factory=list)  # per-superstep wall

    @property
    def supersteps_per_sec(self) -> float:
        return self.iterations / self.wall_sec if self.wall_sec else 0.0

    @property
    def edges_per_sec(self) -> float:
        return self.n_edges * self.iterations / self.wall_sec if self.wall_sec else 0.0


def _normalized_edges(edges: DataFrame, d: float, weighted: bool) -> DataFrame:
    """Per-edge transition probability × damping: d · w(u,v)/Σ_out w(u,·)."""
    w = F.col("weight") if weighted else F.lit(1.0)
    outw = edges.groupBy(F.col("src").alias("oid")).agg(
        (F.sum(F.col("weight")) if weighted else F.count("*").cast("double")).alias("outw")
    )
    return edges.join(outw, edges.src == F.col("oid")).select(
        "src", "dst", (F.lit(d) * w / F.col("outw")).alias("weight")
    )


def pagerank(
    edges: DataFrame,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    weighted: bool = False,
    mode: str = "join",
    ckpt: CheckpointManager | None = None,
    ckpt_every: int = 10,
    resume: bool = False,
) -> tuple[DataFrame, PageRankStats]:
    """Returns (ranks(id, value), stats). Σ value = 1 at convergence."""
    t0 = time.time()
    spark = edges.sparkSession
    if mode == "csr_rdd":
        # dense ids are a precondition of this mode (bounds-checked in the
        # block build), so n = max id + 1 — no 77M-row distinct needed;
        # ids in [0, n) without edges are isolated vertices (teleport-only
        # rank), which the dense state vector models exactly
        hi = edges.agg(F.max(F.greatest("src", "dst")).alias("h")).first()["h"]
        n = int(hi) + 1 if hi is not None else 0
        verts = None
    else:
        verts = K.materialize(G.vertices(edges))
        n = verts.count()
    m = edges.count()
    stats = PageRankStats(n_vertices=n, n_edges=m)

    if mode in ("csr", "csr_rdd", "jvm"):
        if mode == "csr_rdd":
            # raw-edge blocks; the d·x/outw normalization folds into the
            # broadcast vector — no normalization join, no edge shuffle,
            # and unit-weight blocks ship 4 bytes/edge per superstep
            blocks = K.build_csr_rdd(edges, n, unit_weights=not weighted, shuffle=True)
            outv = K.out_weight_vector(edges, n, weighted)
            safe_outv = np.where(outv > 0, outv, 1.0)
            spmv, release = (
                lambda v: K.spmv_rdd_collect(
                    blocks, np.where(outv > 0, d * v / safe_outv, 0.0)
                ),
                blocks.unpersist,
            )
            has_out = outv > 0
        else:
            norm = K.materialize(_normalized_edges(edges, d, weighted))
            if mode == "csr":
                buckets = K.build_csr_buckets(norm, n)
                spmv, release = (
                    lambda v: K.spmv_csr_collect(buckets, v),
                    lambda: buckets.bucketed.unpersist(),
                )
            else:
                jv = K.build_jvm_edges(norm, n)
                spmv, release = (lambda v: K.spmv_jvm_collect(jv, v), jv.unpersist)
            has_out = np.zeros(n, dtype=bool)
            # Arrow batch transfer (like out_weight_vector), not O(V) py4j rows
            srcs = norm.select("src").distinct().toPandas()["src"].to_numpy()
            has_out[srcs] = True
        x = np.full(n, 1.0 / n)
        start_it = 0
        if resume and ckpt is not None:
            got = ckpt.latest("pagerank")
            if got is not None:
                start_it, xdf, meta = got
                stats.deltas = list(meta.get("deltas", []))
                x = np.zeros(n)
                pdf = xdf.toPandas()
                x[pdf["id"].to_numpy()] = pdf["value"].to_numpy()
        for i in range(start_it + 1, max_iter + 1):
            t_it = time.time()
            dm = x[~has_out].sum()
            y = spmv(x) + (1 - d) / n + d * dm / n
            delta = float(np.abs(y - x).sum())
            stats.deltas.append(delta)
            stats.iter_secs.append(time.time() - t_it)
            stats.iterations = i
            x = y
            if ckpt is not None and (i % ckpt_every == 0 or delta < tol):
                xdf = K.dense_vector_df(spark, x)
                ckpt.save(xdf, "pagerank", i, {"l1_delta": delta, "deltas": stats.deltas})
            if delta < tol:
                stats.converged = True
                break
        release()
        ranks = K.dense_vector_df(spark, x)
        stats.wall_sec = time.time() - t0
        return ranks, stats

    # join mode
    norm = K.materialize(_normalized_edges(edges, d, weighted))
    dangling = K.materialize(
        verts.join(norm.select(F.col("src").alias("id")).distinct(), "id", "left_anti")
    )

    def step(x: DataFrame, i: int) -> DataFrame:
        # order-independent reduction (layout-proof) — same rationale as
        # personalized_pagerank: bit-identical resume needs a dm that does
        # not follow x's physical row order
        dm = K.deterministic_sum(
            x.join(F.broadcast(dangling), "id", "left_semi"), "id", "value"
        )
        y = K.spmv_join_step(norm, x)
        return K.complete_vector(y, verts).select(
            "id", (F.col("value") + F.lit((1 - d) / n + d * dm / n)).alias("value")
        )

    x0 = verts.select("id", F.lit(1.0 / n).alias("value"))
    ranks, it_stats = K.iterate(
        x0, step, tol=tol, max_iter=max_iter, ckpt=ckpt, ckpt_every=ckpt_every,
        name="pagerank", resume=resume,
    )
    stats.iterations = it_stats.iterations
    stats.converged = it_stats.converged
    stats.deltas = it_stats.deltas
    stats.iter_secs = it_stats.iter_secs
    stats.wall_sec = time.time() - t0
    return ranks, stats
