"""DMID — Disassortativity degree Mixing and Information Diffusion —
overlapping community detection as pure DataFrame computations.

Reference: the Giraph BSP implementation in /root/reference/DMID
(DMIDComputation.java + DMIDMasterCompute.java + Basic/Leadership variants).
The 18-superstep dispatch-on-superstep-number becomes ordinary sequential
driver code; every message exchange is a join + aggregation; Giraph's O(N)
dense master aggregators (DMIDMasterCompute.java:30-33 — the reference's
scalability ceiling) become DataFrames (join mode) or a broadcast NumPy
vector fed to per-partition CSR Arrow UDFs (csr mode).

Phase semantics (with reference citations):

1. **Random-walk leader identification** — weighted in-degree
   (DMIDComputation.java:177-206), per-dst L1-normalized disassortativity
   column |w_in(v)−w_in(u)| (:214-264), iterative SpMV DA' = DA·T
   (:270-292) run to L1 delta < tol (BASELINE.json rule superseding the
   fixed RW_ITERATIONBOUND=10; ``rw_fixed_iters`` reproduces the fixed
   bound, which is 11 steps — supersteps 3..13), leadership LS = w_in·DA
   (:298-311).

2. **Local-leader selection** — pairwise influence filter (:321-371):
   candidate v's influence on follower u along edge u→v is w(u,v)·LS_v,
   surviving unless the reverse edge exists and w(u,v)·LS_v ≤ w(v,u)·LS_u;
   per-follower argmax with exact float-tie keeping (:379-417), each of the
   k argmax leaders gaining follower-degree 1/k; global leaders are those
   with FD strictly above the mean over nonzero FDs
   (DMIDMasterCompute.java:166-205; RAWLPA uses ≥,
   RandomWalkLabelPropagationAlgorithm.java:277 — ``strict_global_leaders``).

3. **Cascading membership** — the 3-superstep request/echo/adopt game with
   master restart logic (DMIDMasterCompute.java:64-130,
   BasicDMIDComputation.java:20-86, LeadershipDMIDComputation.java:26-88).
   Faithful details: PROFITABILITY starts 0.5 but the master's restart
   check fires immediately at cascade start (flags were just initialized),
   so the first effective threshold is 1−Δ·2 = 0.4 and the restart counter
   begins at 2; every restart wipes non-leader memberships
   (initilaizeMemDeg, DMIDComputation.java:524-559); round-r joiners get
   membership degree 1/r² (integer division of the iteration counter);
   leadership variant thresholds per-vertex at LS_v − restarts·Δ. Engine
   guard: if a restart is due while the threshold is already negative, the
   cascade stops (the reference would superstep forever on unassignable
   vertices, e.g. sinks).
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

COVER_SCHEMA = "node long, community long, degree double"


@dataclass
class DmidParams:
    variant: str = "basic"  # 'basic' | 'leadership'
    tol: float = 1e-6
    rw_max_iter: int = 1000
    rw_fixed_iters: int | None = None  # Giraph parity: 11 (supersteps 3..13)
    strict_global_leaders: bool = True  # Giraph '>'; RAWLPA '>='
    profitability_delta: float = 0.3  # RAWLPA uses 0.1
    norm_axis: str = "dst"  # Giraph per-in-edges; RAWLPA 'src' (out-edges)
    weighted_degrees: bool = True  # RAWLPA uses unweighted in-degree
    max_rounds: int = 10_000
    mode: str = "join"  # random-walk SpMV mode: 'join'|'csr'|'csr_rdd'|'jvm'
    cascade_algo: str = "giraph"  # 'giraph' (3-phase master game) | 'rawlpa'
    # broadcast the O(V) side tables (ls, non-leaders, out-degrees) in
    # phases 2-3. The hint bypasses autoBroadcastJoinThreshold, so disable
    # at the >~1e9-vertex regime where the vertex state no longer fits an
    # executor — mirrors the escape hatches in lpa/components/spmv.
    broadcast_state: bool = True


@dataclass
class DmidResult:
    cover: DataFrame  # (node, community, degree)
    leaders: list[int]
    da: DataFrame  # (id, value)
    ls: DataFrame  # (id, value)
    fd: DataFrame  # (id, value)
    unassigned: int
    stats: dict = field(default_factory=dict)


# ---------------------------------------------------------------------------
# phase 1
# ---------------------------------------------------------------------------
def disassortativity_edges(
    edges: DataFrame, w_in: DataFrame, norm_axis: str = "dst"
) -> DataFrame:
    """Edge-relational form of the reference's per-vertex sparse
    disassortativity columns: ``dis_norm(u,v) = |w_in(v)−w_in(u)| /
    Σ_{u'→v} |w_in(v)−w_in(u')|`` (zero sum ⇒ zeros)."""
    ws = w_in.select(F.col("id").alias("_s"), F.col("w_in").alias("w_src"))
    wd = w_in.select(F.col("id").alias("_d"), F.col("w_in").alias("w_dst"))
    dis = (
        edges.join(ws, edges.src == F.col("_s"))
        .join(wd, edges.dst == F.col("_d"))
        .select("src", "dst", F.abs(F.col("w_dst") - F.col("w_src")).alias("dis"))
    )
    key = "dst" if norm_axis == "dst" else "src"
    sums = dis.groupBy(F.col(key).alias("_k")).agg(F.sum("dis").alias("dis_sum"))
    return (
        dis.join(sums, dis[key] == F.col("_k"))
        .select(
            "src",
            "dst",
            F.when(F.col("dis_sum") != 0, F.col("dis") / F.col("dis_sum"))
            .otherwise(F.lit(0.0))
            .alias("weight"),
        )
    )


def random_walk(
    dis_edges: DataFrame,
    verts: DataFrame,
    n: int,
    params: DmidParams,
    ckpt: CheckpointManager | None = None,
) -> tuple[DataFrame, K.IterationStats]:
    """DA ← DA·T from uniform start to L1 convergence (or fixed bound)."""
    tol = -1.0 if params.rw_fixed_iters else params.tol
    max_iter = params.rw_fixed_iters or params.rw_max_iter
    if params.mode in ("csr", "csr_rdd", "jvm"):
        if params.mode == "csr":
            buckets = K.build_csr_buckets(dis_edges, n)
            spmv, release = (
                lambda v: K.spmv_csr_collect(buckets, v),
                lambda: buckets.bucketed.unpersist(),
            )
        elif params.mode == "jvm":
            jv = K.build_jvm_edges(dis_edges, n)
            spmv, release = (lambda v: K.spmv_jvm_collect(jv, v), jv.unpersist)
        else:
            blocks = K.build_csr_rdd(dis_edges, n, shuffle=True)
            spmv, release = (
                lambda v: K.spmv_rdd_collect(blocks, v),
                blocks.unpersist,
            )
        x = np.full(n, 1.0 / n)
        stats = K.IterationStats()
        t0 = time.time()
        for i in range(1, max_iter + 1):
            t_it = time.time()
            y = spmv(x)
            delta = float(np.abs(y - x).sum())
            stats.deltas.append(delta)
            stats.iter_secs.append(time.time() - t_it)
            stats.iterations = i
            x = y
            if tol >= 0 and delta < tol:
                stats.converged = True
                break
        stats.wall_sec = time.time() - t0
        release()
        spark = dis_edges.sparkSession
        da = K.dense_vector_df(dis_edges.sparkSession, x)
        return K.materialize(da), stats

    def step(xdf: DataFrame, i: int) -> DataFrame:
        return K.complete_vector(K.spmv_join_step(dis_edges, xdf), verts)

    x0 = verts.select("id", F.lit(1.0 / n).alias("value"))
    return K.iterate(
        x0, step, tol=tol, max_iter=max_iter, ckpt=ckpt, name="dmid_rw"
    )


def _hint(df: DataFrame, broadcast_state: bool) -> DataFrame:
    """Broadcast hint for O(V) state tables, with the scale escape hatch."""
    return F.broadcast(df) if broadcast_state else df


# ---------------------------------------------------------------------------
# phase 2
# ---------------------------------------------------------------------------
def influence_rows(
    edges: DataFrame, ls: DataFrame, broadcast_state: bool = True
) -> DataFrame:
    """Surviving influence messages: (follower, candidate, influence)."""
    ls_v = ls.select(F.col("id").alias("_v"), F.col("value").alias("ls_v"))
    ls_u = ls.select(F.col("id").alias("_u"), F.col("value").alias("ls_u"))
    rev = edges.select(
        F.col("src").alias("rsrc"), F.col("dst").alias("rdst"), F.col("weight").alias("w_rev")
    )
    return (
        # the O(V) leadership vector is broadcast against the edge table —
        # both sides are often checkpointed (stat-less), so without the
        # hint Catalyst sort-merges the big side twice
        edges.join(_hint(ls_v, broadcast_state), edges.dst == F.col("_v"))
        .join(_hint(ls_u, broadcast_state), edges.src == F.col("_u"))
        .join(
            rev,
            (edges.src == rev.rdst) & (edges.dst == rev.rsrc),
            "left",
        )
        .select(
            F.col("src").alias("follower"),
            F.col("dst").alias("candidate"),
            (F.col("weight") * F.col("ls_v")).alias("influence"),
            F.col("w_rev"),
            F.col("ls_u"),
        )
        .filter(
            F.col("w_rev").isNull()
            | (F.col("influence") > F.col("w_rev") * F.col("ls_u"))
        )
        .select("follower", "candidate", "influence")
    )


def follower_degrees(inf: DataFrame) -> DataFrame:
    """Per-follower argmax (ties kept, exact float equality — reference
    semantics DMIDComputation.java:390-405) → FD(id, value) = Σ 1/k."""
    mx = inf.groupBy(F.col("follower").alias("_f")).agg(
        F.max("influence").alias("mx")
    )
    winners = inf.join(
        mx, (inf.follower == F.col("_f")) & (inf.influence == F.col("mx"))
    ).select("follower", "candidate")
    ks = winners.groupBy(F.col("follower").alias("_f2")).agg(
        F.count("*").alias("k")
    )
    return (
        winners.join(ks, winners.follower == F.col("_f2"))
        .groupBy(F.col("candidate").alias("id"))
        .agg(F.sum(F.lit(1.0) / F.col("k")).alias("value"))
    )


def global_leaders(fd: DataFrame, strict: bool = True) -> DataFrame:
    """avg = ΣFD / #nonzero; leaders = FD > avg (strict) or ≥ avg."""
    row = fd.filter(F.col("value") != 0).agg(
        F.sum("value").alias("s"), F.count("*").alias("c")
    ).first()
    if not row or not row["c"]:
        return fd.sparkSession.createDataFrame([], "id long")
    avg = row["s"] / row["c"]
    cond = F.col("value") > avg if strict else (F.col("value") >= avg) & (F.col("value") != 0)
    return fd.filter(cond).select("id")


# ---------------------------------------------------------------------------
# phase 3
# ---------------------------------------------------------------------------
def cascade_adoption_round(
    edges: DataFrame,
    members: DataFrame,
    non_leader_verts: DataFrame,
    out_deg: DataFrame,
    r: int,
    threshold: float | None = None,
    ls_req: DataFrame | None = None,
    restart_count: int = 0,
    delta: float = 0.3,
    broadcast_state: bool = True,
) -> DataFrame:
    """One request/echo/adopt round (BasicDMIDComputation.java:32-66 /
    LeadershipDMIDComputation.java:56-66): per non-leader requester v and
    candidate community L not yet joined, count v's out-neighbors that are
    members of L; v joins L iff count/out_degree(v) exceeds the threshold
    (global ``threshold`` for the basic variant; per-vertex ``LS_v −
    restarts·Δ`` when ``ls_req`` is given). Joiners get degree 1/r².
    Returns the newly-joined rows ``(node, community, degree)``."""
    mem = members.select(
        F.col("node").alias("m_node"), F.col("community").alias("community")
    )
    counts = (
        edges.join(mem, edges.dst == F.col("m_node"))
        .groupBy(F.col("src").alias("node"), "community")
        .agg(F.count("*").alias("cnt"))
    )
    counts = counts.join(
        _hint(non_leader_verts, broadcast_state), "node", "left_semi"
    ).join(
        members.select("node", "community"), ["node", "community"], "left_anti"
    )
    counts = counts.join(_hint(out_deg, broadcast_state), "node")
    if ls_req is not None:
        counts = counts.join(_hint(ls_req, broadcast_state), "node")
        cond = (F.col("cnt") / F.col("out_deg")) > (
            F.col("ls_v") - F.lit(restart_count * delta)
        )
    else:
        cond = (F.col("cnt") / F.col("out_deg")) > F.lit(threshold)
    return counts.filter(cond).select(
        "node", "community", F.lit(1.0 / r**2).alias("degree")
    )


def cascade(
    edges: DataFrame,
    leaders: DataFrame,
    verts: DataFrame,
    params: DmidParams,
    ls: DataFrame | None = None,
    ckpt: CheckpointManager | None = None,
) -> tuple[DataFrame, dict]:
    """The cascading-behavior driver loop. Returns (cover, stats)."""
    spark = edges.sparkSession
    leaders = K.materialize(leaders)
    n_leaders = leaders.count()
    stats: dict = {"rounds": 0, "restarts": 0, "thresholds": []}
    if n_leaders == 0:
        empty = spark.createDataFrame([], COVER_SCHEMA)
        stats["unassigned"] = verts.count()
        return empty, stats

    out_deg = K.materialize(
        G.out_degrees(edges).withColumnRenamed("id", "node")
    )
    non_leader_verts = K.materialize(
        verts.join(leaders, "id", "left_anti").select(F.col("id").alias("node"))
    )
    if params.variant == "leadership":
        ls_req = ls.select(F.col("id").alias("node"), F.col("value").alias("ls_v"))

    def init_members() -> DataFrame:
        return K.materialize(
            leaders.select(
                F.col("id").alias("node"),
                F.col("id").alias("community"),
                F.lit(1.0).alias("degree"),
            )
        )

    def member_counts(delta_members: DataFrame) -> DataFrame:
        """(node, community, cnt): per requester, how many of its
        out-neighbors are in ``delta_members`` of each community."""
        mem = delta_members.select(
            F.col("node").alias("m_node"), F.col("community").alias("community")
        )
        return (
            edges.join(_hint(mem, params.broadcast_state), edges.dst == F.col("m_node"))
            .groupBy(F.col("src").alias("node"), "community")
            .agg(F.count("*").alias("cnt"))
        )

    def round_joins(counts_tbl: DataFrame, members: DataFrame, r: int,
                    threshold: float, restart_count: int) -> DataFrame:
        """Filter the maintained counts table down to this round's joiners
        (same predicate as cascade_adoption_round, which recomputes counts
        from scratch and is kept as the single-round reference API)."""
        c = counts_tbl.join(
            _hint(non_leader_verts, params.broadcast_state), "node", "left_semi"
        ).join(
            members.select("node", "community"), ["node", "community"], "left_anti"
        ).join(_hint(out_deg, params.broadcast_state), "node")
        if params.variant == "leadership":
            c = c.join(_hint(ls_req, params.broadcast_state), "node")
            cond = (F.col("cnt") / F.col("out_deg")) > (
                F.col("ls_v") - F.lit(restart_count * delta)
            )
        else:
            cond = (F.col("cnt") / F.col("out_deg")) > F.lit(threshold)
        return c.filter(cond).select(
            "node", "community", F.lit(1.0 / r**2).alias("degree")
        )

    delta = params.profitability_delta
    threshold = 0.5
    restart_count = 1
    new_member = False
    not_all_assigned = True
    r = 0
    members = init_members()
    # incremental membership counts: members only grow within a threshold
    # epoch, so each round costs O(E x new-members) instead of recomputing
    # the O(E x total-memberships) join — at a few hundred overlapping
    # communities the full recompute is ~10x the per-round wall, and at
    # 100x scale it is the cascade's dominant shuffle
    counts_tbl = K.materialize(member_counts(members))

    while stats["rounds"] < params.max_rounds:
        # --- phase-1 master: restart / termination (DMIDMasterCompute:93-117)
        if not_all_assigned and not new_member:
            if threshold < 0:
                break  # engine guard (see module docstring)
            threshold = 1 - delta * (restart_count + 1)
            restart_count += 1
            r = 0
            members = init_members()
            counts_tbl = K.materialize(member_counts(members))
            stats["restarts"] += 1
            stats["thresholds"].append(threshold)
        if not not_all_assigned:
            break
        stats["rounds"] += 1
        r += 1
        joins = K.materialize(
            round_joins(counts_tbl, members, r, threshold, restart_count)
        )
        # members stays a LAZY union of checkpointed per-round join tables:
        # every child is already materialized, so scans just re-union ~r
        # small cached relations — one fewer localCheckpoint job per round
        members = members.unionByName(joins)
        # ONE aggregate action per round: new-join rows and still-unassigned
        # non-leaders counted in a single job over the two cached tables
        # (was joins.count() + an anti-join count = two driver actions)
        metric_rows = (
            joins.select(F.lit("j").alias("k"))
            .unionByName(
                non_leader_verts.join(members, "node", "left_anti")
                .select(F.lit("u").alias("k"))
            )
            .groupBy("k")
            .count()
            .collect()
        )
        metrics = {r["k"]: r["count"] for r in metric_rows}
        n_joins = int(metrics.get("j", 0))
        unassigned = int(metrics.get("u", 0))
        new_member = n_joins > 0
        not_all_assigned = unassigned > 0
        if new_member:
            counts_tbl = K.materialize(
                counts_tbl.unionByName(member_counts(joins))
                .groupBy("node", "community")
                .agg(F.sum("cnt").alias("cnt"))
            )
        if ckpt is not None:
            members = ckpt.save(
                members,
                "dmid_cover",
                stats["rounds"],
                {
                    "round": stats["rounds"],
                    "threshold": threshold,
                    "restart_count": restart_count,
                    "new_members": n_joins,
                    "unassigned": unassigned,
                },
            )
    # the per-round metric already counted still-unassigned non-leaders
    # against the CURRENT members table on every exit path (threshold guard
    # breaks before the wipe; all-assigned exits with 0) — no extra job
    stats["unassigned"] = unassigned if stats["rounds"] > 0 else int(
        non_leader_verts.join(members, "node", "left_anti").count()
    )
    return members, stats


def rawlpa_cascade(
    edges: DataFrame,
    leaders: DataFrame,
    verts: DataFrame,
    delta: float = 0.1,
    max_outer: int = 100,
    max_inner: int = 10_000,
    broadcast_state: bool = True,
) -> tuple[DataFrame, dict]:
    """The sequential RAWLPA label-propagation phase (SURVEY.md §2.3 R6/R7),
    transliterated from RandomWalkLabelPropagationAlgorithm.java:294-416 and
    run for all leaders jointly as one DataFrame computation keyed by
    community:

    - outer do-while k = 1, 2, …: wipe all memberships, run every per-leader
      cascade at threshold ``1 − k·delta``; repeat while the threshold used
      is > 0 and not every vertex is assigned (:302-313) — so one final
      round at threshold ≤ 0 does execute, exactly like the reference;
    - inner rounds: candidates are predecessors of current members or of the
      leader, never the leader of that same community (:396-416); a
      candidate joins when the fraction of its out-neighbors that are the
      leader or members who joined in a STRICTLY EARLIER round exceeds the
      threshold (:362-371) — synchronous by construction;
    - membership degree = 1/join_round² , leaders 1.0 (:465-486);
    - ``allAssigned`` checks the membership maps only, so a leader that
      never joins another community keeps the outer loop running (:430-452)
      — faithful, including that quirk.

    Returns (cover(node, community, degree), stats).
    """
    spark = edges.sparkSession
    leaders = K.materialize(leaders)
    if leaders.count() == 0:
        return spark.createDataFrame([], COVER_SCHEMA), {"outer_rounds": 0}

    out_deg = K.materialize(
        G.out_degrees(edges).withColumnRenamed("id", "node")
    )
    n = verts.count()
    leader_rows = leaders.select(
        F.col("id").alias("node"), F.col("id").alias("community"), F.lit(0).alias("join_iter")
    )
    stats: dict = {"outer_rounds": 0, "thresholds": [], "inner_rounds": []}
    members = None

    def preds_of(rows: DataFrame) -> DataFrame:
        """Distinct predecessors (node, community) of the given behavior
        rows, excluding each community's own leader."""
        return (
            edges.join(
                _hint(rows.select(F.col("node").alias("_b"), "community"),
                      broadcast_state),
                edges.dst == F.col("_b"),
            )
            .select(F.col("src").alias("node"), "community")
            .distinct()
            .filter(F.col("node") != F.col("community"))
        )

    def counts_of(rows: DataFrame) -> DataFrame:
        """(node, community, cnt): out-neighbors of node among ``rows``."""
        return (
            edges.join(
                _hint(rows.select(F.col("node").alias("_t"), "community"),
                      broadcast_state),
                edges.dst == F.col("_t"),
            )
            .groupBy(F.col("src").alias("node"), "community")
            .agg(F.count("*").alias("cnt"))
        )

    for k in range(1, max_outer + 1):
        threshold = 1 - k * delta
        stats["outer_rounds"] = k
        stats["thresholds"].append(threshold)
        members = K.materialize(
            spark.createDataFrame([], "node long, community long, join_iter int")
        )
        # incremental state (members only grow within an epoch, and the
        # strictly-earlier-joiners rule makes every current member countable
        # by the time the next round runs — so counts/candidates accumulate):
        # cand = predecessors of behavior not yet members; cnt_tbl = per
        # (node, community) countable-neighbor totals. Each round costs
        # O(E x new-members), not O(E x total-memberships).
        cand = K.materialize(preds_of(leader_rows))
        cnt_tbl = K.materialize(counts_of(leader_rows))
        r = 0
        while r < max_inner:
            r += 1
            # left join: a candidate with zero countable neighbors still has
            # profitability 0, which passes a negative threshold (the
            # reference's final do-while round can use one); out_deg == 0
            # divides to null → never joins (Java NaN comparison)
            joins = K.materialize(
                cand.join(cnt_tbl, ["node", "community"], "left")
                .join(_hint(out_deg, broadcast_state), "node")
                .filter(
                    F.coalesce(F.col("cnt"), F.lit(0)) / F.col("out_deg")
                    > F.lit(threshold)
                )
                .select("node", "community", F.lit(r).alias("join_iter"))
            )
            if joins.count() == 0:
                break
            members = K.materialize(members.unionByName(joins))
            joined = joins.select("node", "community")
            remaining = cand.join(joined, ["node", "community"], "left_anti")
            fresh = (
                preds_of(joins)
                .join(members.select("node", "community"),
                      ["node", "community"], "left_anti")
                .join(remaining, ["node", "community"], "left_anti")
            )
            cand = K.materialize(remaining.unionByName(fresh))
            cnt_tbl = K.materialize(
                cnt_tbl.unionByName(counts_of(joins))
                .groupBy("node", "community")
                .agg(F.sum("cnt").alias("cnt"))
            )
        stats["inner_rounds"].append(r)
        assigned = members.select("node").distinct().count()
        if not (threshold > 0 and assigned < n):
            break
    cover = leader_rows.select(
        "node", "community", F.lit(1.0).alias("degree")
    ).unionByName(
        members.select(
            "node",
            "community",
            (F.lit(1.0) / (F.col("join_iter").cast("double") ** 2)).alias("degree"),
        )
    )
    stats["unassigned"] = int(
        verts.join(members.select(F.col("node").alias("id")), "id", "left_anti").count()
    )
    return K.materialize(cover), stats


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------
def rawlpa(
    edges: DataFrame,
    tol: float = 1e-6,
    fixed_iters: int | None = None,
    mode: str = "join",
) -> "DmidResult":
    """Sequential-RAWLPA parity pipeline (Metrics mode 6, Main.java:470-534;
    detectOverlappingCommunities, RandomWalkLabelPropagationAlgorithm.java:61-84):
    unweighted in-degrees (the :107 TODO), per-src column normalization of
    the transposed matrix (:115-122), ``≥``-global-leaders (:277), Δ = 0.1
    with the RAWLPA wipe-and-retry cascade (:302-313). ``fixed_iters=100``
    reproduces the reference's fixed random-walk bound (:35); the default
    converges to ``tol`` per the BASELINE.json rule."""
    params = DmidParams(
        tol=tol,
        rw_fixed_iters=fixed_iters,
        strict_global_leaders=False,
        profitability_delta=0.1,
        norm_axis="src",
        weighted_degrees=False,
        mode=mode,
        cascade_algo="rawlpa",
    )
    return dmid(edges, params)


def dmid(
    edges: DataFrame,
    params: DmidParams | None = None,
    ckpt: CheckpointManager | None = None,
) -> DmidResult:
    params = params or DmidParams()
    t0 = time.time()
    edges = K.materialize(edges)
    verts = K.materialize(G.vertices(edges))
    n = verts.count()
    w_in = K.materialize(
        G.weighted_in_degrees(edges)
        if params.weighted_degrees
        else edges.groupBy(F.col("dst").alias("id"))
        .agg(F.count("*").cast("double").alias("w_in"))
        .join(verts, "id", "right")
        .select("id", F.coalesce("w_in", F.lit(0.0)).alias("w_in"))
    )
    dis = disassortativity_edges(edges, w_in, params.norm_axis)
    if params.mode == "join":
        # join mode re-reads dis every superstep — pin it; the block/cache
        # builds of the other modes consume the plan exactly once
        dis = K.materialize(dis)
    t_prep = time.time() - t0
    da, rw_stats = random_walk(dis, verts, n, params, ckpt=ckpt)
    t_rw = time.time() - t0 - t_prep
    ls = K.materialize(
        w_in.join(da, "id").select("id", (F.col("w_in") * F.col("value")).alias("value"))
    )
    inf = influence_rows(edges, ls, broadcast_state=params.broadcast_state)
    fd = K.materialize(follower_degrees(inf))
    leaders_df = global_leaders(fd, strict=params.strict_global_leaders)
    leaders = sorted(r["id"] for r in leaders_df.collect())
    t_leaders = time.time() - t0 - t_prep - t_rw
    if params.cascade_algo == "rawlpa":
        cover, cascade_stats = rawlpa_cascade(
            edges, leaders_df, verts, delta=params.profitability_delta,
            broadcast_state=params.broadcast_state,
        )
    else:
        cover, cascade_stats = cascade(
            edges, leaders_df, verts, params, ls=ls, ckpt=ckpt
        )
    t_cascade = time.time() - t0 - t_prep - t_rw - t_leaders
    return DmidResult(
        cover=cover,
        leaders=leaders,
        da=da,
        ls=ls,
        fd=fd,
        unassigned=cascade_stats.get("unassigned", 0),
        stats={
            "n_vertices": n,
            "rw_iterations": rw_stats.iterations,
            "rw_converged": rw_stats.converged,
            "rw_deltas": rw_stats.deltas[-3:],
            "cascade": cascade_stats,
            "wall_sec": time.time() - t0,
            "phase_sec": {
                "prep": round(t_prep, 3),
                "random_walk": round(t_rw, 3),
                "leaders": round(t_leaders, 3),
                "cascade": round(t_cascade, 3),
            },
        },
    )
