"""Distributed weighted matching and multilevel graph coarsening.

Locally-heaviest matching (Hoepman 2004 / Preis 1999, the distributed
1/2-approximation of maximum weight matching): every vertex points at its
heaviest incident edge (ties toward the smaller neighbor id); an edge
both endpoints point at is matched, its endpoints retire, and the
residual graph repeats. The chain argument guarantees progress — follow
best-edge pointers: weights never decrease and, at equal weight, neighbor
ids strictly decrease, so every nonempty residual round matches at least
one edge — and the result is a maximal matching (no live edge survives
with both endpoints unmatched).

This is the heavy-edge collapse step of every multilevel graph pipeline
(METIS-style coarsen → solve → project): :func:`coarsen_graph` contracts
matched pairs (min-id representative) through the existing weighted
contraction, roughly halving the vertex count per level while conserving
total edge mass (merged-pair mass becomes self-loop mass, exactly as
Louvain's contraction keeps it).

Scale shape per round: one groupBy-argmax over the live half-edges (one
shuffle, map-side combined via max(struct)), one self-join of the
O(V)-bounded best-pointer table, one anti-join to retire matched
endpoints. Determinism: with integral weights the per-vertex argmax is an
exact total order, so the matching is bit-identical at any parallelism
and replayable by an unrolled SQL twin.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K


@dataclass
class MatchingStats:
    rounds: int = 0
    matched_edges: int = 0
    per_round: list[int] = field(default_factory=list)
    wall_sec: float = 0.0


def maximal_matching(
    edges: DataFrame, max_rounds: int = 100
) -> tuple[DataFrame, MatchingStats]:
    """Locally-heaviest maximal matching over the undirected weight-summed
    view of ``edges`` (self-loops dropped): returns ``(matching(u, v,
    weight), stats)`` with ``u < v``, every vertex in at most one row, and
    no unmatched live edge left (maximality). Raises if ``max_rounds`` is
    exhausted with live edges remaining (cannot happen below V rounds; the
    cap is a runaway guard)."""
    t0 = time.time()
    stats = MatchingStats()
    live = K.materialize(
        G.drop_self_loops(edges)
        .select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.col("weight").cast("double").alias("w"),
        )
        .groupBy("u", "v")
        .agg(F.sum("w").alias("w"))
    )
    matched_parts: list[DataFrame] = []
    for r in range(1, max_rounds + 1):
        if live.limit(1).count() == 0:
            break
        stats.rounds = r
        both = live.select("u", "v", "w").unionByName(
            live.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
        )
        # heaviest incident edge, ties toward the SMALLER neighbor id:
        # max(struct(w, -v)) realizes (w desc, v asc) exactly
        best = both.groupBy("u").agg(
            F.max(F.struct(F.col("w"), (-F.col("v")).alias("nv"))).alias("b")
        ).select(
            "u", (-F.col("b.nv")).alias("v"), F.col("b.w").alias("w")
        )
        other = best.select(
            F.col("u").alias("v"), F.col("v").alias("u"), F.col("w").alias("w2")
        )
        mutual = K.materialize(
            best.join(other, ["u", "v"])
            .filter(F.col("u") < F.col("v"))
            .select("u", "v", "w")
        )
        n = mutual.count()
        stats.per_round.append(n)
        if n == 0:
            # impossible while live edges remain (chain argument) — treat
            # as a logic guard rather than silent wrong output
            raise RuntimeError(
                "maximal_matching: zero mutual pairs with live edges present"
            )
        matched_parts.append(mutual)
        mv = mutual.select(F.col("u").alias("id")).unionByName(
            mutual.select(F.col("v").alias("id"))
        )
        live = K.materialize(
            live.join(mv.withColumnRenamed("id", "u"), "u", "left_anti")
            .join(mv.withColumnRenamed("id", "v"), "v", "left_anti")
            .select("u", "v", "w")
        )
    else:
        if live.limit(1).count() > 0:
            raise RuntimeError(
                f"maximal_matching did not converge in {max_rounds} rounds"
            )
    if matched_parts:
        out = matched_parts[0]
        for p in matched_parts[1:]:
            out = out.unionByName(p)
    else:
        spark = edges.sparkSession
        out = spark.createDataFrame([], "u long, v long, w double")
    out = out.select("u", "v", F.col("w").alias("weight"))
    stats.matched_edges = out.count()
    stats.wall_sec = time.time() - t0
    return out, stats


def coarsen_graph(
    edges: DataFrame, levels: int = 1, max_rounds: int = 100
) -> tuple[DataFrame, DataFrame, list[MatchingStats]]:
    """METIS-style heavy-edge coarsening: ``levels`` rounds of maximal
    matching + contraction. Returns ``(coarse_edges, labels(id, label),
    per-level stats)`` where ``label`` maps every ORIGINAL vertex to its
    final coarse representative (matched pairs collapse to the min id;
    unmatched vertices keep themselves) and ``coarse_edges`` keeps merged
    mass as self-loops (the Louvain contraction convention, so total edge
    weight is conserved at every level)."""
    cur = edges
    mapping: DataFrame | None = None
    all_stats: list[MatchingStats] = []
    for _ in range(levels):
        matching, st = maximal_matching(cur, max_rounds=max_rounds)
        all_stats.append(st)
        verts = G.vertices(cur)
        pair_labels = matching.select(
            F.col("u").alias("id"), F.col("u").alias("label")
        ).unionByName(matching.select(F.col("v").alias("id"), F.col("u").alias("label")))
        labels = K.materialize(
            verts.join(pair_labels, "id", "left").select(
                "id", F.coalesce("label", F.col("id")).alias("label")
            )
        )
        cur = K.materialize(G.contract_graph(cur, labels))
        if mapping is None:
            mapping = labels
        else:
            mapping = K.materialize(
                mapping.join(
                    labels.select(
                        F.col("id").alias("label"), F.col("label").alias("_nl")
                    ),
                    "label",
                ).select("id", F.col("_nl").alias("label"))
            )
    if mapping is None:
        mapping = G.vertices(edges).select("id", F.col("id").alias("label"))
    return cur, mapping, all_stats
