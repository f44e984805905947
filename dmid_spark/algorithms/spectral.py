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
        stats.iterations = i
        if tol >= 0:
            # fixed-iteration runs (tol < 0) skip the delta action — it only
            # drives convergence (same device as salsa below)
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
            auth, hub = new_auth, new_hub
            if delta < tol:
                stats.converged = True
                break
        else:
            auth, hub = new_auth, new_hub
    out = (
        hub.select("id", F.col("value").alias("hub"))
        .join(auth.select("id", F.col("value").alias("authority")), "id")
    )
    stats.wall_sec = time.time() - t0
    return out, stats


def salsa(
    edges: DataFrame,
    tol: float = 1e-6,
    max_iter: int = 100,
    weighted: bool = False,
    broadcast_state: bool = True,
) -> tuple[DataFrame, HitsStats]:
    """SALSA (Lempel & Moran, WWW 2000): the stochastic cousin of HITS —
    hub/authority scores from the two bipartite random-walk chains over
    row- and column-normalized adjacency instead of HITS's unnormalized
    mutual reinforcement. This is the link-analysis score behind
    large-scale who-to-follow recommendation; its key property is that a
    high-out-degree spammer cannot concentrate authority the way it can
    under HITS (each hub's vote mass is split by its out-degree).

    Power iteration on the authority chain ``a ← W_rᵀ (W_c a)`` and hub
    chain ``h ← W_c (W_rᵀ h)``, where ``W_r(u,v) = w(u,v)/outdeg(u)`` and
    ``W_c(u,v) = w(u,v)/indeg(v)``; both vectors L1-normalized per
    iteration (walk distributions). Stops on summed L1 delta < ``tol``.
    Vertices with no in-edges get authority 0, no out-edges → hub 0.

    Scale: identical plan family to :func:`hits` — the two normalized arc
    tables are materialized once (two map-side-combined degree aggregates
    + hash joins), then every iteration is two spmv_join_step passes and
    two single-row L1 scalars. ``broadcast_state=False`` is the shared
    ≳10⁹-vertex escape hatch.
    """
    t0 = time.time()
    stats = HitsStats()
    w = F.col("weight").cast("double") if weighted else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("weight"))
    outdeg = e.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("od"))
    indeg = e.groupBy(F.col("dst").alias("id")).agg(F.sum("weight").alias("ind"))
    # W_r as arcs src→dst (weight/outdeg); W_cᵀ as arcs dst→src (weight/indeg)
    w_r = K.materialize(
        e.join(outdeg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.col("weight") / F.col("od")).alias("weight"))
    )
    w_ct = K.materialize(
        e.join(indeg.withColumnRenamed("id", "dst"), "dst")
        .select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            (F.col("weight") / F.col("ind")).alias("weight"),
        )
    )
    verts = K.materialize(G.vertices(edges))
    n = verts.count()
    if n == 0:
        # empty graph: return empty gracefully (the hits/pagerank family
        # convention) instead of a driver-side ZeroDivisionError
        stats.wall_sec = time.time() - t0
        return (
            edges.sparkSession.createDataFrame(
                [], "id long, hub double, authority double"
            ),
            stats,
        )
    auth = K.materialize(verts.select("id", F.lit(1.0 / n).alias("value")))
    hub = K.materialize(verts.select("id", F.lit(1.0 / n).alias("value")))

    def l1_normalize(x: DataFrame) -> DataFrame:
        s = float(x.agg(F.sum(F.abs(F.col("value"))).alias("s")).first()["s"] or 0.0)
        if s == 0.0:
            return x
        return x.select("id", (F.col("value") / F.lit(s)).alias("value"))

    for i in range(1, max_iter + 1):
        # a' = W_rᵀ (W_c a): backward along in-links (W_c), forward along
        # out-links (W_rᵀ). spmv_join_step(arcs, x) sums weight·x[src] into
        # dst, so w_r arcs (u→v, W_r(u,v)) give W_rᵀx and w_ct arcs
        # (v→u, W_c(u,v)) give W_c·x.
        new_auth = K.materialize(
            l1_normalize(
                K.complete_vector(
                    K.spmv_join_step(
                        w_r,
                        K.complete_vector(
                            K.spmv_join_step(w_ct, auth, broadcast_state=broadcast_state),
                            verts,
                        ),
                        broadcast_state=broadcast_state,
                    ),
                    verts,
                )
            )
        )
        # h' = W_c (W_rᵀ h)
        new_hub = K.materialize(
            l1_normalize(
                K.complete_vector(
                    K.spmv_join_step(
                        w_ct,
                        K.complete_vector(
                            K.spmv_join_step(w_r, hub, broadcast_state=broadcast_state),
                            verts,
                        ),
                        broadcast_state=broadcast_state,
                    ),
                    verts,
                )
            )
        )
        stats.iterations = i
        if tol >= 0:
            # fixed-iteration runs (tol < 0) skip the delta action entirely —
            # it exists only to drive convergence, and each skipped action
            # saves a full two-vector join job per superstep
            delta_row = (
                new_auth.join(auth.select("id", F.col("value").alias("old")), "id")
                .select(F.abs(F.col("value") - F.col("old")).alias("d"))
                .unionByName(
                    new_hub.join(hub.select("id", F.col("value").alias("old")), "id")
                    .select(F.abs(F.col("value") - F.col("old")).alias("d"))
                )
                .agg(F.sum("d").alias("s"))
                .first()
            )
            delta = float(delta_row["s"] or 0.0)
            stats.deltas.append(delta)
            auth, hub = new_auth, new_hub
            if delta < tol:
                stats.converged = True
                break
        else:
            auth, hub = new_auth, new_hub
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


@dataclass
class EigenvectorStats:
    iterations: int = 0
    converged: bool = False
    deltas: list[float] = field(default_factory=list)
    wall_sec: float = 0.0


def eigenvector_centrality(
    edges: DataFrame,
    tol: float = 1e-6,
    max_iter: int = 100,
    weighted: bool = False,
    broadcast_state: bool = True,
    round_dp: int | None = None,
    ckpt=None,
    ckpt_every: int = 10,
    resume: bool = False,
) -> tuple[DataFrame, EigenvectorStats]:
    """Eigenvector centrality (Bonacich '72): the dominant left eigenvector
    of the (optionally weighted) adjacency matrix by power iteration,

        ``y = Aᵀ x ;  x ← y / max(y)``,

    from ``x₀ = 1`` until the L1 delta < ``tol``. The score of a vertex is
    proportional to the scores of the vertices that point at it — the
    un-damped, un-normalized cousin of PageRank (no teleport, no out-degree
    division), the right notion when a link from an important hub should
    transfer its full importance (endorsement graphs, repo-import graphs).

    Normalization uses the **L∞ norm** (per-iteration max), not L2: a max
    is order-independent and exact in IEEE doubles, so the scalar is
    bit-identical across engines and partitionings — the same motivation
    as ``kernel.deterministic_sum`` but with no extra machinery needed.
    The usual caveats apply: on a directed graph, vertices outside the
    dominant strongly-connected component's in-closure converge to 0, and
    convergence requires the dominant eigenvalue to be simple (holds for
    connected non-bipartite undirected graphs and aperiodic SCCs).

    ``round_dp`` quantizes the state **each iteration** (with ``+ 0.0`` to
    fold IEEE −0.0): after the max-division the values are no longer dyadic,
    so per-vertex in-edge sums differ across engines in the last ulp; a
    per-step quantization re-syncs both sides — the same device as the
    ``ls`` quantization in the DMID oracle chain. At 9 dp the perturbation
    is ~1e-10 per step, far below ``tol``.

    Returns ``(scores(id, value), stats)`` over every vertex of the edge
    table (scores in [0, 1], max = 1 by construction).

    Scale: per iteration one ``spmv_join_step`` (broadcast-state join +
    map-side-combined hash aggregate over the edge table) + a 1-row max
    aggregate broadcast back — no global sort, no driver collect of state;
    identical superstep/checkpoint shape to katz_centrality.
    """
    t0 = time.time()
    stats = EigenvectorStats()
    w = F.col("weight") if weighted else F.lit(1.0)
    ew = K.materialize(edges.select("src", "dst", w.alias("weight")))
    verts = K.materialize(G.vertices(edges))

    def step(x: DataFrame, i: int) -> DataFrame:
        y = K.complete_vector(K.spmv_join_step(ew, x, broadcast_state=broadcast_state), verts)
        mx = y.agg(F.max("value").alias("mx"))
        out = y.crossJoin(F.broadcast(mx)).select(
            "id",
            F.when(F.col("mx") > 0, F.col("value") / F.col("mx"))
            .otherwise(F.col("value"))
            .alias("value"),
        )
        if round_dp is not None:
            out = out.select(
                "id", (F.round("value", round_dp) + F.lit(0.0)).alias("value")
            )
        return out

    x0 = verts.select("id", F.lit(1.0).alias("value"))
    scores, it_stats = K.iterate(
        x0, step, tol=tol, max_iter=max_iter, name="eigenvector",
        ckpt=ckpt, ckpt_every=ckpt_every, resume=resume,
    )
    stats.iterations = it_stats.iterations
    stats.converged = it_stats.converged
    stats.deltas = it_stats.deltas
    stats.wall_sec = time.time() - t0
    return scores, stats


def _ranked_prefix_double(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    rank_col: str = "rank",
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """1-based global rank + INCLUSIVE prefix sum of a double column over
    rows ordered by ``order_cols`` (which must be a unique key) — one
    range-partition pass, same machinery as ``kernel.distributed_rank`` /
    ``distributed_cumsum`` (never a global single-partition window).

    Unlike ``distributed_cumsum`` this keeps doubles. The fold order is
    fixed by the range partitioning + within-partition sort, so results are
    deterministic for a given input; when the values are integral-valued
    doubles (< 2^53, e.g. co-occurrence counts) the sums are exact and
    engine-portable regardless of order.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    ranged = K.materialize(K._ranged_with_mid(df, order_cols, num_partitions))
    tagged = ranged.withColumn("_pid", F.shiftright("_mid", 33).cast("int"))
    totals = tagged.groupBy("_pid").agg(
        F.count("*").alias("_cnt"), F.sum(value_col).alias("_t")
    ).collect()
    adj, acc_cnt, acc = [], 0, 0.0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        # rank = rows-before-partition + local index + 1, local = _mid - (pid<<33)
        adj.append((int(r["_pid"]), acc_cnt - (int(r["_pid"]) << 33), acc))
        acc_cnt += int(r["_cnt"])
        acc += float(r["_t"] or 0.0)
    adj_df = spark.createDataFrame(adj, "_pid int, _roff long, _voff double")
    w = (
        Window.partitionBy("_pid")
        .orderBy("_mid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.join(F.broadcast(adj_df), "_pid")
        .withColumn(rank_col, (F.col("_mid") + F.col("_roff") + 1).cast("long"))
        .withColumn(cum_col, F.sum(value_col).over(w) + F.col("_voff"))
        .drop("_pid", "_mid", "_roff", "_voff")
    )


def sweep_cut(
    edges: DataFrame,
    scores: DataFrame,
    score_col: str = "score",
    id_col: str = "id",
    degree_normalize: bool = True,
    max_prefix: int | None = None,
) -> DataFrame:
    """Andersen–Chung–Lang sweep over a diffusion score (typically
    :func:`personalized_pagerank`): order vertices by ``score/degree``
    (or raw score), and for every prefix S_k of that order report the
    conductance φ(S_k) = cut(S_k) / min(vol(S_k), vol(G)−vol(S_k)).
    The prefix minimizing φ is the local cluster around the seed(s) —
    the sweep stage of local spectral clustering (Andersen, Chung, Lang,
    FOCS'06 §3; the quantity DMID-style covers are judged by, see
    metrics/conductance.py for the φ conventions).

    Edge conventions match metrics.community_conductance: each (src, dst,
    weight) row is ONE undirected edge; a self-loop adds 2w to its
    endpoint's degree and never to any cut. Vertices with score <= 0 or
    zero degree are outside the sweep (a zero-degree vertex cannot change
    any cut or volume).

    Returns ``(rank, id, score, volume, cut_w, conductance)`` — one row per
    swept vertex, rank ascending; conductance NULL while min(vol, rest)=0.

    Scale: no global single-partition window anywhere. Two range-partition
    prefix passes over the O(|support|) candidate rows (ranks+volume, then
    internal-edge mass by rank) plus two hash joins of the edge table
    against the rank map — the same bound as one conductance evaluation.
    ``max_prefix`` caps the sweep to the top-K scored vertices (the usual
    practice when the diffusion support is the whole graph).
    """
    deg = (
        edges.select(F.col("src").alias("id"), "weight")
        .unionByName(edges.select(F.col("dst").alias("id"), "weight"))
        .groupBy("id")
        .agg(F.sum(F.col("weight").cast("double")).alias("_deg"))
    )
    cand = (
        scores.select(F.col(id_col).alias("id"), F.col(score_col).alias("_score"))
        .filter(F.col("_score") > 0)
        .join(deg, "id")
        .filter(F.col("_deg") > 0)
    )
    key = (F.col("_score") / F.col("_deg")) if degree_normalize else F.col("_score")
    cand = cand.withColumn("_ord", -key)
    if max_prefix is not None:
        cand = cand.orderBy("_ord", "id").limit(int(max_prefix))
    ranked = _ranked_prefix_double(
        cand, ["_ord", "id"], "_deg", rank_col="rank", cum_col="_vol"
    )
    rank_map = ranked.select("id", "rank")
    inc = (
        edges.join(rank_map.withColumnRenamed("id", "src").withColumnRenamed("rank", "_rs"), "src")
        .join(rank_map.withColumnRenamed("id", "dst").withColumnRenamed("rank", "_rd"), "dst")
        .groupBy(F.greatest("_rs", "_rd").alias("rank"))
        .agg(F.sum(F.col("weight").cast("double") * 2).alias("_inc2"))
    )
    # vol(G) is a driver scalar (like pagerank's dangling mass): one 2-phase
    # aggregate whose tiny final exchange stays out of the returned lineage
    tv_row = edges.agg((F.sum(F.col("weight").cast("double")) * 2).alias("_tv")).first()
    total_vol = float(tv_row["_tv"] or 0.0)
    joined = ranked.join(inc, "rank", "left").withColumn(
        "_inc2", F.coalesce(F.col("_inc2"), F.lit(0.0))
    )
    swept = _ranked_prefix_double(
        joined, ["rank"], "_inc2", rank_col="_rk2", cum_col="_int2"
    ).drop("_rk2")
    vol = F.col("_vol")
    cut = vol - F.col("_int2")
    denom = F.least(vol, F.lit(total_vol) - vol)
    return swept.select(
        "rank",
        "id",
        F.col("_score").alias("score"),
        vol.alias("volume"),
        cut.alias("cut_w"),
        F.when(denom > 0, cut / denom).alias("conductance"),
    )


def best_sweep_cut(sweep: DataFrame) -> DataFrame:
    """The argmin-conductance prefix of a :func:`sweep_cut` result (1 row;
    smallest rank wins ties; empty when no prefix has defined φ)."""
    return (
        sweep.filter(F.col("conductance").isNotNull())
        .orderBy(F.col("conductance").asc(), F.col("rank").asc())
        .limit(1)
    )
