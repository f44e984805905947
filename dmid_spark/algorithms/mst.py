"""Minimum spanning forest via Borůvka rounds (SURVEY.md §2.6 ext X31).

Each round every component picks its minimum-weight outgoing edge
(deterministic tie-break on (weight, canonical src, dst) so reruns and
engines agree), the chosen edges merge components through the existing
small-star/large-star CC on the COMPONENT graph (≤ one edge per
component, so the merge graph is tiny relative to the input), and labels
compose. Components at least halve per round → O(log V) rounds, each one
a map through the label table + a per-component argmin — the classic
MapReduce MST shape; nothing ever centralizes.

With all-distinct weights the result is THE unique MST/forest (equals
Kruskal edge-for-edge — pytest); with ties it is a minimum spanning
forest of the same total weight (forest property + weight equality
pytest-asserted).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K
from .components import connected_components


@dataclass
class MstStats:
    rounds: int = 0
    converged: bool = False
    wall_sec: float = 0.0
    chosen_per_round: list[int] = field(default_factory=list)
    total_weight: float = 0.0


def minimum_spanning_forest(
    edges: DataFrame, max_rounds: int = 40, broadcast_mins: bool = True
) -> tuple[DataFrame, MstStats]:
    """Returns ``(mst(u, v, weight), stats)`` — the minimum spanning
    forest of the undirected view of ``edges`` (parallel edges collapse to
    their min weight; self-loops dropped). ``u < v`` canonical."""
    t0 = time.time()
    stats = MstStats()
    und = K.materialize(
        G.drop_self_loops(edges)
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col("weight").cast("double").alias("weight"),
        )
        .groupBy("u", "v")
        .agg(F.min("weight").alias("weight"))
    )
    verts = G.vertices(und.select(F.col("u").alias("src"), F.col("v").alias("dst")))
    labels = K.materialize(verts.select("id", F.col("id").alias("comp")))
    chosen_all = None
    for r in range(1, max_rounds + 1):
        lu = labels.select(F.col("id").alias("u"), F.col("comp").alias("cu"))
        lv = labels.select(F.col("id").alias("v"), F.col("comp").alias("cv"))
        cross = (
            und.join(lu, "u")
            .join(lv, "v")
            .filter(F.col("cu") != F.col("cv"))
        )
        # each component nominates its min outgoing edge (both directions)
        cand = cross.select(
            F.col("cu").alias("comp"), "u", "v", "weight"
        ).unionByName(cross.select(F.col("cv").alias("comp"), "u", "v", "weight"))
        w = Window.partitionBy("comp").orderBy("weight", "u", "v")
        chosen = K.materialize(
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("u", "v", "weight")
            .distinct()
        )
        n_chosen = chosen.count()
        stats.rounds = r
        stats.chosen_per_round.append(n_chosen)
        if n_chosen == 0:
            stats.converged = True
            break
        # rounds produce DISJOINT edge sets (a chosen edge merges its two
        # endpoints' components, so both ends share a component forever
        # after and the edge can never be outgoing again) — plain union,
        # no re-distinct over the accumulated forest
        chosen_all = (
            chosen if chosen_all is None
            else K.materialize(chosen_all.unionByName(chosen))
        )
        # merge: CC over the chosen edges' component graph (≤ 1 edge/comp)
        comp_edges = (
            chosen.join(lu, "u").join(lv, "v")
            .select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
        )
        merged, _ = connected_components(comp_edges, broadcast_mins=broadcast_mins)
        labels = K.materialize(
            labels.join(
                merged.withColumnRenamed("id", "comp").withColumnRenamed(
                    "component", "new_comp"
                ),
                "comp",
                "left",
            ).select("id", F.coalesce("new_comp", F.col("comp")).alias("comp"))
        )
    mst = (
        chosen_all if chosen_all is not None
        else und.filter(F.lit(False))
    ).select("u", "v", "weight")
    stats.total_weight = float(
        mst.agg(F.coalesce(F.sum("weight"), F.lit(0.0))).first()[0]
    )
    stats.wall_sec = time.time() - t0
    return mst, stats
