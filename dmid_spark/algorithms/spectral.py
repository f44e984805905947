"""Spectral / propagation centralities on the shared SpMV kernel: HITS
(hubs & authorities) and personalized PageRank.

Both are the remaining classic link-analysis scores a link-graph engine
user expects next to PageRank (SURVEY.md §2.6 X1): HITS is the canonical
hub/authority decomposition for directed link graphs (Kleinberg, JACM '99),
personalized PageRank the seed-restricted teleport variant behind
similar-repo / related-page queries.

Both reuse the engine's join-mode SpMV shape (kernel.spmv_join_step):
every superstep is one broadcast-state join + hash aggregate over the
edge table, state never centralizes, lineage is cut per iteration. The
per-iteration normalization scalars (HITS L2 norms, PPR dangling mass) are
single aggregate rows — the same cheap driver scalars pagerank's join mode
uses for its dangling mass.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K


@dataclass
class HitsStats:
    iterations: int = 0
    converged: bool = False
    deltas: list[float] = field(default_factory=list)
    wall_sec: float = 0.0


def hits(
    edges: DataFrame,
    tol: float = 1e-6,
    max_iter: int = 100,
    weighted: bool = False,
    broadcast_state: bool = True,
) -> tuple[DataFrame, HitsStats]:
    """Kleinberg's HITS: returns ``(scores(id, hub, authority), stats)``.

    Per iteration (synchronous, the standard formulation):

    - ``authority(v) = Σ_{u→v} w(u,v) · hub(u)``, then L2-normalized;
    - ``hub(u) = Σ_{u→v} w(u,v) · authority(v)``, then L2-normalized.

    Stops when the summed L1 delta of both vectors falls below ``tol``.
    Vertices with no in-edges get authority 0; no out-edges → hub 0.
    ``weighted=False`` (default) uses unit edge weights, matching the
    classic definition on unweighted link graphs.

    Scale: two spmv_join_step passes per iteration (one on the edge table,
    one on its reverse), each a broadcast-state join + map-side-combined
    aggregate; the L2 norms are one aggregate row each. The reversed edge
    table is materialized once. ``broadcast_state=False`` is the ≳10⁹-vertex
    escape hatch shared with pagerank/lpa/components.
    """
    t0 = time.time()
    stats = HitsStats()
    w = F.col("weight") if weighted else F.lit(1.0)
    fwd = K.materialize(edges.select("src", "dst", w.alias("weight")))
    rev = K.materialize(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    verts = K.materialize(G.vertices(edges))
    hub = K.materialize(verts.select("id", F.lit(1.0).alias("value")))
    auth = K.materialize(verts.select("id", F.lit(1.0).alias("value")))

    def l2_normalize(x: DataFrame) -> DataFrame:
        nrm = float(
            x.agg(F.sqrt(F.sum(F.col("value") * F.col("value"))).alias("n")).first()["n"]
            or 0.0
        )
        if nrm == 0.0:
            return x
        return x.select("id", (F.col("value") / F.lit(nrm)).alias("value"))

    for i in range(1, max_iter + 1):
        new_auth = K.materialize(
            l2_normalize(
                K.complete_vector(
                    K.spmv_join_step(fwd, hub, broadcast_state=broadcast_state), verts
                )
            )
        )
        new_hub = K.materialize(
            l2_normalize(
                K.complete_vector(
                    K.spmv_join_step(rev, new_auth, broadcast_state=broadcast_state),
                    verts,
                )
            )
        )
        delta_row = (
            new_auth.select("id", "value")
            .join(auth.select("id", F.col("value").alias("old")), "id")
            .select(F.abs(F.col("value") - F.col("old")).alias("d"))
            .unionByName(
                new_hub.select("id", "value")
                .join(hub.select("id", F.col("value").alias("old")), "id")
                .select(F.abs(F.col("value") - F.col("old")).alias("d"))
            )
            .agg(F.sum("d").alias("s"))
            .first()
        )
        delta = float(delta_row["s"] or 0.0)
        stats.deltas.append(delta)
        stats.iterations = i
        auth, hub = new_auth, new_hub
        if delta < tol:
            stats.converged = True
            break
    out = (
        hub.select("id", F.col("value").alias("hub"))
        .join(auth.select("id", F.col("value").alias("authority")), "id")
    )
    stats.wall_sec = time.time() - t0
    return out, stats


@dataclass
class PprStats:
    iterations: int = 0
    converged: bool = False
    deltas: list[float] = field(default_factory=list)
    wall_sec: float = 0.0
    n_seeds: int = 0


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    d: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 200,
    weighted: bool = False,
    broadcast_state: bool = True,
    ckpt=None,
    ckpt_every: int = 10,
    resume: bool = False,
) -> tuple[DataFrame, PprStats]:
    """PageRank with teleport restricted to ``seeds(id)``: at every step a
    walker follows an out-edge with probability ``d`` and teleports to a
    uniformly-random *seed* with probability ``1−d``; dangling mass also
    returns to the seeds. Start vector = uniform over seeds. Σ value = 1.

    Returns ``(ranks(id, value), stats)``. Vertices unreachable from the
    seed set get exactly 0 — relational sparsity keeps them as absent rows
    during iteration; the output completes them explicitly.

    Scale: identical per-superstep shape to pagerank join mode (one
    broadcast-state join + aggregate over the normalized edge table); the
    seed indicator is an O(|seeds|) broadcast join per superstep.
    """
    from .pagerank import _normalized_edges

    t0 = time.time()
    stats = PprStats()
    verts = K.materialize(G.vertices(edges))
    seeds = K.materialize(seeds.select("id").distinct().join(verts, "id", "left_semi"))
    k = seeds.count()
    stats.n_seeds = k
    if k == 0:
        raise ValueError("personalized_pagerank: empty seed set")
    norm = K.materialize(_normalized_edges(edges, d, weighted))
    dangling = K.materialize(
        verts.join(norm.select(F.col("src").alias("id")).distinct(), "id", "left_anti")
    )

    def step(x: DataFrame, i: int) -> DataFrame:
        # order-independent reduction: a plain F.sum follows x's physical
        # layout, which a checkpoint/resume parquet round-trip changes —
        # the 1-ulp wobble would break the promised bit-identical resume
        dm = K.deterministic_sum(
            x.join(F.broadcast(dangling), "id", "left_semi"), "id", "value"
        )
        y = K.spmv_join_step(norm, x, broadcast_state=broadcast_state)
        teleport = (1 - d) / k + d * dm / k
        return (
            K.complete_vector(y, verts)
            .join(F.broadcast(seeds.select("id", F.lit(True).alias("_s"))), "id", "left")
            .select(
                "id",
                F.when(F.col("_s"), F.col("value") + F.lit(teleport))
                .otherwise(F.col("value"))
                .alias("value"),
            )
        )

    x0 = verts.join(F.broadcast(seeds), "id", "left_semi").select(
        "id", F.lit(1.0 / k).alias("value")
    )
    x0 = K.complete_vector(x0, verts)
    ranks, it_stats = K.iterate(
        x0, step, tol=tol, max_iter=max_iter, name="ppr",
        ckpt=ckpt, ckpt_every=ckpt_every, resume=resume,
    )
    stats.iterations = it_stats.iterations
    stats.converged = it_stats.converged
    stats.deltas = it_stats.deltas
    stats.wall_sec = time.time() - t0
    return ranks, stats


@dataclass
class KatzStats:
    iterations: int = 0
    converged: bool = False
    deltas: list[float] = field(default_factory=list)
    wall_sec: float = 0.0


def katz_centrality(
    edges: DataFrame,
    alpha: float = 0.05,
    beta: float = 1.0,
    tol: float = 1e-6,
    max_iter: int = 100,
    weighted: bool = False,
    broadcast_state: bool = True,
    round_dp: int | None = None,
    ckpt=None,
    ckpt_every: int = 10,
    resume: bool = False,
) -> tuple[DataFrame, KatzStats]:
    """Katz centrality (Katz, Psychometrika '53): the attenuated count of
    all walks *ending* at each vertex,

        ``x(v) = β + α · Σ_{u→v} w(u,v) · x(u)``,

    iterated from ``x₀ = β·1`` until the L1 delta < ``tol`` — the fixed
    point ``x = β (I − α Aᵀ)⁻¹ 1``, which converges whenever
    ``α < 1/λ_max(A)``. Unlike PageRank there is no out-degree
    normalization: a prolific source passes its full score along every
    out-edge, which is exactly the "influence through all paths" semantics
    link-graph users reach for when damping-by-degree is wrong (citation
    graphs, repo-import graphs).

    Returns ``(scores(id, value), stats)``. Every vertex of the edge table
    appears; sinks/sources get the pure β baseline. ``round_dp`` quantizes
    the output (+0.0 folds IEEE −0.0) for cross-engine hash stability.

    Scale: per iteration one spmv_join_step over the raw edge table (no
    normalization pass at all) + complete_vector — a broadcast-state join
    and a map-side-combined aggregate; identical superstep shape and
    checkpoint/resume semantics to pagerank join mode.
    """
    t0 = time.time()
    stats = KatzStats()
    w = F.col("weight") if weighted else F.lit(1.0)
    ew = K.materialize(edges.select("src", "dst", w.alias("weight")))
    verts = K.materialize(G.vertices(edges))

    def step(x: DataFrame, i: int) -> DataFrame:
        y = K.spmv_join_step(ew, x, broadcast_state=broadcast_state)
        return K.complete_vector(y, verts).select(
            "id", (F.lit(beta) + F.lit(alpha) * F.col("value")).alias("value")
        )

    x0 = verts.select("id", F.lit(beta).alias("value"))
    scores, it_stats = K.iterate(
        x0, step, tol=tol, max_iter=max_iter, name="katz",
        ckpt=ckpt, ckpt_every=ckpt_every, resume=resume,
    )
    if round_dp is not None:
        scores = scores.select(
            "id", (F.round("value", round_dp) + F.lit(0.0)).alias("value")
        )
    stats.iterations = it_stats.iterations
    stats.converged = it_stats.converged
    stats.deltas = it_stats.deltas
    stats.wall_sec = time.time() - t0
    return scores, stats
