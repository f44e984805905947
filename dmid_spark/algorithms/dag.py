"""DAG layering: longest-path topological levels (SURVEY.md §2.6 ext X28).

``level(v) = length of the longest path from any source to v`` — the
standard scheduling/layering primitive (critical-path depth, build-stage
assignment, dependency-graph visualization layers). Pregel-style max-plus
propagation re-expressed relationally: a frontier of vertices whose level
rose last round sends ``level+1`` along out-edges; receivers take the max.
Rounds = DAG depth, and per-round work is proportional to the FRONTIER's
out-edges, not the whole graph — the delta-iteration shape that survives
100 TB (a converged region is never rescanned).

Cycle safety: a cycle would raise levels forever, so the loop aborts with
``ValueError`` after ``max_rounds`` (default: conservative cap) instead of
silently looping; callers orienting an undirected edge table (e.g.
``src < dst``) get acyclicity by construction.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K


@dataclass
class TopoStats:
    rounds: int = 0
    converged: bool = False
    wall_sec: float = 0.0
    frontier_sizes: list[int] = field(default_factory=list)


def topological_levels(
    edges: DataFrame,
    max_rounds: int = 1000,
    ckpt=None,
    ckpt_every: int = 5,
    resume: bool = False,
) -> tuple[DataFrame, TopoStats]:
    """Longest-path level per vertex on the directed graph ``edges(src,
    dst)``. Returns ``(levels(id, level), stats)``; every vertex of the
    graph appears, sources at level 0.

    Raises ``ValueError`` if levels are still rising after ``max_rounds``
    — on a DAG the loop ends in depth rounds, so exceeding a cap ≥ the
    plausible depth means the input has a cycle (levels would grow
    unboundedly; Kahn's algorithm would report the same cycle by
    non-exhaustion).

    With a :class:`..checkpoint.CheckpointManager` the level table lands
    on disk (lineage + frontier-size metrics) every ``ckpt_every`` rounds;
    ``resume=True`` restarts from the latest checkpoint. Max-plus is
    monotone and idempotent, so the resumed run re-seeds the frontier with
    EVERY vertex of the checkpointed state — one full-width round, then
    the frontier collapses back to the true wavefront, and the final
    levels are bit-identical to an uninterrupted run (pytest-asserted).
    """
    e = K.materialize(
        G.drop_self_loops(edges.select("src", "dst")).distinct()
    )
    verts = G.vertices(e)
    stats = TopoStats()
    start_round = 0
    lvl = None
    if resume and ckpt is not None:
        got = ckpt.latest("topo_levels")
        if got is not None:
            start_round, lvl, m = got
            stats.frontier_sizes = list(m.get("frontier_sizes", []))
    if lvl is None:
        lvl = K.materialize(verts.select("id", F.lit(0).cast("long").alias("level")))
    frontier = lvl
    t0 = time.time()
    for r in range(start_round + 1, max_rounds + 1):
        msgs = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg((F.max("level") + 1).alias("cand"))
        )
        merged = K.materialize(
            lvl.join(msgs, "id", "left").select(
                "id",
                F.greatest("level", F.coalesce("cand", F.lit(0).cast("long"))).alias(
                    "new_level"
                ),
                "level",
            )
        )
        frontier = merged.filter(F.col("new_level") > F.col("level")).select(
            "id", F.col("new_level").alias("level")
        )
        n_front = frontier.count()
        stats.rounds = r
        stats.frontier_sizes.append(n_front)
        lvl = merged.select("id", F.col("new_level").alias("level"))
        if ckpt is not None and (r % ckpt_every == 0 or n_front == 0):
            lvl = ckpt.save(
                lvl, "topo_levels", r,
                metrics={"frontier": n_front, "frontier_sizes": stats.frontier_sizes},
            )
        if n_front == 0:
            stats.converged = True
            break
    if not stats.converged:
        raise ValueError(
            f"levels still rising after {max_rounds} rounds — the input "
            "graph has a cycle (or raise max_rounds for a deeper DAG)"
        )
    stats.wall_sec = time.time() - t0
    return K.materialize(lvl), stats
