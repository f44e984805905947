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
    modularity: float = 0.0
    wall_sec: float = 0.0


def _und(edges: DataFrame) -> DataFrame:
    e = edges.filter(F.col("src") != F.col("dst")).select("src", "dst", "weight")
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )


def partition_modularity(edges: DataFrame, labels: DataFrame) -> float:
    """Newman modularity Q of a hard partition over the undirected graph:
    Q = sum_c [ S_in(c)/(2m) - (S_tot(c)/(2m))^2 ]."""
    und = _und(edges)
    lab = F.broadcast(labels.select("id", "label"))
    deg = und.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("k"))
    two_m = deg.agg(F.sum("k")).collect()[0][0]
    if not two_m:
        return 0.0
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
        .agg(
            F.sum(F.coalesce("s_in", F.lit(0.0)) / two_m).alias("a"),
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
    deg = K.materialize(und.groupBy(F.col("src").alias("id")).agg(F.sum("weight").alias("k")))
    two_m = deg.agg(F.sum("k")).collect()[0][0] or 0.0
    lab = K.materialize(labels.select("id", "label"))
    if not two_m:
        stats.wall_sec = time.time() - t0
        return lab, stats
    m = two_m / 2.0
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
        moved = (
            new_lab.join(lab.withColumnRenamed("label", "_old"), "id")
            .filter(F.col("label") != F.col("_old"))
            .count()
        )
        stats.rounds += 1
        stats.moved.append(int(moved))
        lab = new_lab
        if moved == 0:
            break
    stats.modularity = partition_modularity(edges, lab)
    stats.wall_sec = time.time() - t0
    return lab, stats
