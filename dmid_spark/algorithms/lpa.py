"""Synchronous label propagation (SURVEY.md §2.6 X3).

Deterministic published semantics: every vertex starts with its own id as
label; each round a vertex adopts the most frequent label among its
in-neighbors, breaking ties toward the smallest label; vertices without
in-neighbors keep their label. Runs a fixed number of rounds or until a
fixpoint. (Run on a symmetrized edge table for the usual undirected LPA.)

Each round is edges⋈labels → groupBy(dst,label).count → per-dst argmax —
all map-side-combinable hash aggregates; the argmax is a groupBy max over a
(count, -label) struct rather than a window, so skewed high-degree vertices
pre-aggregate instead of sorting one giant window partition.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K


@dataclass
class LpaStats:
    rounds: int = 0
    converged: bool = False
    wall_sec: float = 0.0


def label_propagation(
    edges: DataFrame,
    max_iter: int = 20,
    until_fixpoint: bool = True,
    broadcast_state: bool = True,
    seeds: DataFrame | None = None,
    frozen_seeds: bool = False,
) -> tuple[DataFrame, LpaStats]:
    """Returns (labels(id, label), stats).

    ``broadcast_state`` hints the O(V) label table as the broadcast side of
    the per-round join — localCheckpointed state has no size stats, so
    Catalyst would otherwise re-sort the edge table every round (the same
    trap as kernel.spmv_join_step). Disable at ≳10^9 vertices, where the
    shuffle join is the only option.

    ``seeds(id, label)`` overrides initial labels (semi-supervised LPA: a
    few vertices carry known classes, the rest start with their own id);
    ``frozen_seeds=True`` additionally pins seed labels every round so
    propagation flows OUT of the seed set but never overwrites it — the
    Zhu–Ghahramani clamped variant."""
    t0 = time.time()
    stats = LpaStats()
    verts = K.materialize(G.vertices(edges))
    if seeds is not None:
        seed_tbl = K.materialize(
            seeds.select("id", F.col("label").alias("seed_label"))
        )
        labels = K.materialize(
            verts.join(seed_tbl, "id", "left").select(
                "id", F.coalesce("seed_label", F.col("id")).alias("label")
            )
        )
    else:
        seed_tbl = None
        labels = K.materialize(verts.select("id", F.col("id").alias("label")))
    e = edges.select("src", "dst")
    for r in range(1, max_iter + 1):
        lbl_side = F.broadcast(labels) if broadcast_state else labels
        counts = (
            e.join(lbl_side, e.src == labels.id)
            .groupBy(e.dst.alias("v"), "label")
            .agg(F.count("*").alias("cnt"))
        )
        best = (
            counts.groupBy("v")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("b"))
            .select("v", (-F.col("b.nl")).alias("new_label"))
        )
        merged = labels.join(best, labels.id == best.v, "left").select(
            "id", F.coalesce("new_label", "label").alias("label")
        )
        if frozen_seeds and seed_tbl is not None:
            merged = merged.join(seed_tbl, "id", "left").select(
                "id", F.coalesce("seed_label", F.col("label")).alias("label")
            )
        new_labels = K.materialize(merged)
        stats.rounds = r
        if until_fixpoint:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.label") != F.col("o.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                stats.converged = True
                break
        else:
            labels = new_labels
    stats.wall_sec = time.time() - t0
    return labels, stats
