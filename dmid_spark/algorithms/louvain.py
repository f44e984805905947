"""Parallel (synchronous) Louvain refinement and partition modularity.

One Louvain "move phase" round, evaluated synchronously for every vertex
against the CURRENT partition (the parallel-Louvain heuristic — e.g.
Grappolo / distributed-Louvain; classic Louvain moves sequentially):
vertex v moves to the neighbor community maximizing the modularity gain

    dQ(v: c -> c') = (k_vc' - k_vc\\v)/m - k_v * (S_tot(c') - (S_tot(c) - k_v)) / (2 m^2)

and stays when every gain is <= 0. Gains are rounded to 9 dp before the
argmax (smaller community id breaks ties) so the pick is reproducible
across engines — the same quantize-before-compare device as the DMID
leadership twin.

Scale shape: one edges-to-labels join (k_vc), two O(V) aggregates (degrees,
community totals), one per-vertex argmax over the vertex's NEIGHBOR
communities only (bounded by degree, no V x C blowup). All map-side
combining; labels broadcast with the usual escape hatch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernel as K


@dataclass
class LouvainStats:
    rounds: int = 0
    moved: list[int] = field(default_factory=list)
    cycled: bool = False  # stopped on a repeated partition (sync 2-cycle)
    modularity: float = 0.0
    wall_sec: float = 0.0
    levels_wall: list[float] = field(default_factory=list)  # per-level (louvain)


def _und(edges: DataFrame) -> DataFrame:
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst", "weight")
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )


def _degrees(edges: DataFrame, und: DataFrame) -> DataFrame:
    """Weighted degrees k_v including self-loops (2w each — a coarse node's
    self-loop is its community's internal mass and must stay in k_v and
    2m, else coarse-level refinement overestimates every merge)."""
    base = und.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("_k"))
    selfw = (
        edges.filter(F.col("src") == F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg((2.0 * F.sum("weight")).alias("_ks"))
    )
    ids = base.select("id").unionByName(selfw.select("id")).distinct()
    return (
        ids.join(base, "id", "left")
        .join(selfw, "id", "left")
        .select(
            "id",
            (F.coalesce("_k", F.lit(0.0)) + F.coalesce("_ks", F.lit(0.0))).alias("k"),
        )
    )


def partition_modularity(edges: DataFrame, labels: DataFrame) -> float:
    """Newman modularity Q of a hard partition over the undirected graph:
    Q = sum_c [ S_in(c)/(2m) - (S_tot(c)/(2m))^2 ]."""
    und = _und(edges)
    lab = F.broadcast(labels.select("id", "label"))
    deg = _degrees(edges, und)
    two_m = deg.agg(F.sum("k")).collect()[0][0]
    if not two_m:
        return 0.0
    self_in = (
        edges.filter(F.col("src") == F.col("dst"))
        .join(lab.select(F.col("id").alias("src"), F.col("label").alias("_l")), "src")
        .groupBy(F.col("_l").alias("label"))
        .agg((2.0 * F.sum("weight")).alias("s_self"))
    )
    tot = (
        deg.join(lab, "id")
        .groupBy("label")
        .agg(F.sum("k").alias("tot"))
    )
    s_in = (
        und.join(lab.select(F.col("id").alias("src"), F.col("label").alias("_ls")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("label").alias("_ld")), "dst")
        .filter(F.col("_ls") == F.col("_ld"))
        .groupBy(F.col("_ls").alias("label"))
        .agg(F.sum("weight").alias("s_in"))
    )
    row = (
        tot.join(s_in, "label", "left")
        .join(self_in, "label", "left")
        .agg(
            F.sum(
                (F.coalesce("s_in", F.lit(0.0)) + F.coalesce("s_self", F.lit(0.0)))
                / two_m
            ).alias("a"),
            F.sum(F.pow(F.col("tot") / two_m, 2)).alias("b"),
        )
        .collect()[0]
    )
    return float((row["a"] or 0.0) - (row["b"] or 0.0))


def louvain_refine(
    edges: DataFrame,
    labels: DataFrame,
    rounds: int = 1,
    broadcast_labels: bool = True,
) -> tuple[DataFrame, LouvainStats]:
    """Run ``rounds`` synchronous move phases from the given partition;
    returns ``(labels(id, label), stats)`` with per-round move counts and
    the final modularity. Stops early when a round moves nothing."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    t0 = time.time()
    stats = LouvainStats()
    und = K.materialize(_und(edges))
    deg = K.materialize(_degrees(edges, und))
    two_m = deg.agg(F.sum("k")).collect()[0][0] or 0.0
    lab = K.materialize(labels.select("id", "label"))
    if not two_m:
        stats.wall_sec = time.time() - t0
        return lab, stats
    m = two_m / 2.0
    seen_sigs: set[int] = set()
    for _ in range(rounds):
        lb = F.broadcast(lab) if broadcast_labels else lab
        # k_vc: vertex -> neighbor-community weight (own community included)
        kvc = (
            und.join(lb.select(F.col("id").alias("dst"), F.col("label").alias("nc")), "dst")
            .groupBy(F.col("src").alias("id"), "nc")
            .agg(F.sum("weight").alias("k_vc"))
        )
        tot = deg.join(lb, "id").groupBy("label").agg(F.sum("k").alias("tot"))
        totb = F.broadcast(tot) if broadcast_labels else tot
        own = (
            lab.join(deg, "id")
            .join(totb, "label")
            .select("id", F.col("label").alias("c_own"), "k", F.col("tot").alias("tot_own"))
        )
        kvc_own = kvc.join(
            own.select("id", F.col("c_own").alias("nc"), F.lit(True).alias("_is_own")),
            ["id", "nc"], "left",
        )
        own_w = (
            kvc_own.filter(F.col("_is_own").isNotNull())
            .select("id", F.col("k_vc").alias("k_own"))
        )
        cand = (
            kvc.join(F.broadcast(own) if broadcast_labels else own, "id")
            .join(own_w, "id", "left")
            .join(totb.select(F.col("label").alias("nc"), F.col("tot").alias("tot_new")), "nc")
            .select(
                "id", "c_own", "nc",
                # stay (nc == c_own) is the explicit 0-gain option; for a
                # move, dQ = (k_vc' - k_vown)/m - k*(tot' - (tot_own - k))/(2m^2)
                F.when(F.col("nc") == F.col("c_own"), F.lit(0.0))
                .otherwise(
                    F.round(
                        (F.col("k_vc") - F.coalesce("k_own", F.lit(0.0))) / m
                        - F.col("k")
                        * (F.col("tot_new") - (F.col("tot_own") - F.col("k")))
                        / (2.0 * m * m),
                        9,
                    )
                ).alias("gain"),
            )
        )
        best = cand.groupBy("id").agg(
            F.max_by(F.struct("gain", "nc"), F.struct("gain", -F.col("nc"))).alias("b"),
            F.first("c_own").alias("c_own"),
        ).select(
            "id",
            F.when((F.col("b.gain") > 0) & (F.col("b.nc") != F.col("c_own")), F.col("b.nc"))
            .otherwise(F.col("c_own")).alias("label"),
            (F.col("b.gain") > 0).cast("int").alias("_g"),
        )
        moved_lab = best.select("id", "label")
        # vertices with no candidate rows (isolated ids in the label table)
        # keep their current community
        kept = lab.join(moved_lab.select("id"), "id", "left_anti")
        new_lab = K.materialize(moved_lab.unionByName(kept))
        chk = (
            new_lab.join(lab.withColumnRenamed("label", "_old"), "id")
            .agg(
                F.sum((F.col("label") != F.col("_old")).cast("long")).alias("moved"),
                # 40-bit folded terms: the sum of up to ~2^23 of them cannot
                # overflow int64 under ANSI mode
                F.sum(F.pmod(F.xxhash64("id", "label"), F.lit(1 << 40))).alias("sig"),
            )
            .collect()[0]
        )
        moved, sig = int(chk["moved"] or 0), int(chk["sig"] or 0)
        stats.rounds += 1
        stats.moved.append(moved)
        if lab is not labels:
            # drop the superseded checkpoint: dead localCheckpoint RDDs +
            # their broadcasts pile up across rounds and inflate every later
            # job in the session (the bench.py gc.collect() gotcha, but
            # in-loop, so it must be handled here)
            lab.unpersist()
        lab = new_lab
        if moved == 0:
            break
        if sig in seen_sigs:
            # synchronous move phases can enter a label 2-cycle (the classic
            # parallel-Louvain flap: two vertices keep swapping communities);
            # a repeated partition signature proves the cycle — stop instead
            # of burning the remaining rounds oscillating
            stats.cycled = True
            break
        seen_sigs.add(sig)
    stats.modularity = partition_modularity(edges, lab)
    und.unpersist()
    deg.unpersist()
    stats.wall_sec = time.time() - t0
    return lab, stats


def louvain(
    edges: DataFrame,
    max_levels: int = 3,
    max_rounds_per_level: int = 8,
    broadcast_labels: bool = True,
    rebase_limit: int = 2_000_000,
    rebase_dir: str | None = None,
) -> tuple[DataFrame, LouvainStats]:
    """Full multi-level Louvain: synchronous move phases to a local
    fixpoint, contract communities to a coarse weighted graph
    (graph.contract_graph — X21), recurse, and compose the level mappings
    back to original vertex ids. Returns ``(labels(id, label), stats)``
    with the final modularity measured on the ORIGINAL graph.

    Scale: each level's graph is strictly smaller (vertices = communities
    of the previous level); the move phases and the contraction are the
    already-plan-tested X25/X21 relations, so the whole pipeline inherits
    their shuffle shape. Coarse graphs up to ``rebase_limit`` rows re-base
    through the driver (collect + createDataFrame); bigger ones round-trip
    through parquet (``rebase_dir`` or a fresh temp dir) — both cut the
    cross-level lineage, avoiding the stacked-localCheckpoint generation
    pathology that slowed every later job 3-5× per extra level."""
    import tempfile

    from .. import graph as G
    from ..checkpoint import CheckpointManager

    t0 = time.time()
    stats = LouvainStats()
    cur_edges = edges
    ckpt: CheckpointManager | None = None
    auto_rebase_dir: str | None = None
    # identity mapping at level 0
    mapping = K.materialize(
        G.vertices(_und(edges).select("src", "dst")).select(
            "id", F.col("id").alias("label")
        )
    )
    for level in range(max_levels):
        t_level = time.time()
        verts = G.vertices(_und(cur_edges).select("src", "dst"))
        singletons = verts.select("id", F.col("id").alias("label"))
        lab, st = louvain_refine(
            cur_edges, singletons, rounds=max_rounds_per_level,
            broadcast_labels=broadcast_labels,
        )
        stats.rounds += st.rounds
        stats.moved.extend(st.moved)
        if not any(st.moved):
            stats.levels_wall.append(time.time() - t_level)
            break  # no structure left to extract at this level
        # compose: original id -> current coarse label -> new community
        lb = F.broadcast(lab) if broadcast_labels else lab
        old_mapping = mapping
        mapping = K.materialize(
            mapping.join(
                lb.select(F.col("id").alias("label"), F.col("label").alias("_nl")),
                "label",
            ).select("id", F.col("_nl").alias("label"))
        )
        old_mapping.unpersist()
        # self-loops KEPT: they carry each community's internal mass into the
        # coarse level (dropping them makes every cross-bridge merge look free)
        coarse = G.contract_graph(cur_edges, lab, drop_self=False)
        # re-base the coarse graph as a fresh DataFrame: stacking localCheckpoint
        # generations (checkpoint of a plan over a checkpoint of ...) degrades
        # execution of every later job in the session — observed ~5x per extra
        # generation on this Spark build. Persist before the size probe so the
        # contraction executes once whichever path is taken, and so the
        # >limit path never hauls rebase_limit rows to the driver just to
        # discard them: the probe is a limit-pruned count, the small path
        # collects from cache, the large path writes parquet from cache.
        coarse_sel = coarse.select("src", "dst", "weight").persist()
        n_coarse = coarse_sel.limit(rebase_limit + 1).count()
        if cur_edges is not edges:
            cur_edges.unpersist()
        lab.unpersist()
        if n_coarse > rebase_limit:
            if ckpt is None:
                base = rebase_dir or tempfile.mkdtemp(prefix="louvain_rebase_")
                # auto-created dirs are ours to remove on return; a caller
                # passing rebase_dir owns its lifecycle (resumable runs)
                auto_rebase_dir = None if rebase_dir else base
                ckpt = CheckpointManager(edges.sparkSession, base, run_id="louvain")
            cur_edges = ckpt.save(coarse_sel, "coarse", level)
            coarse_sel.unpersist()
        else:
            rows = coarse_sel.take(rebase_limit)
            coarse_sel.unpersist()
            if not rows:
                stats.levels_wall.append(time.time() - t_level)
                break
            cur_edges = edges.sparkSession.createDataFrame(
                rows, "src long, dst long, weight double"
            )
        stats.levels_wall.append(time.time() - t_level)
    stats.modularity = partition_modularity(edges, mapping)
    if auto_rebase_dir is not None:
        # mapping is localCheckpointed (executor-resident), so the coarse
        # parquet round-trips are dead weight once modularity is measured
        import shutil

        shutil.rmtree(auto_rebase_dir, ignore_errors=True)
    stats.wall_sec = time.time() - t0
    return mapping, stats
