"""Path-based link-graph analytics: multi-source BFS distances,
sampled harmonic/closeness centrality, and deterministic random-walk
generation.

These extend the standard-algorithm suite (X1-X12) with the traversal
operations a web-graph user runs after the per-vertex/per-edge analytics:
distance tables from a source sample (the building block of the
HyperBall-style centrality estimators on web graphs), the harmonic and
closeness centralities derived from them, and node2vec-style walk-corpus
generation for embedding pipelines.

All three are pure DataFrame computations over ``edges(src, dst, ...)``:

- ``bfs_distances`` is frontier expansion: each level is one join of the
  (shrinking-then-shrinking) frontier against the edge table keyed by
  vertex, plus one anti-join against the settled distance set keyed by
  (source, vertex). Level count is bounded by the graph's directed
  eccentricity from the sample, never |V|. State is O(|S|·V) rows,
  distributed — nothing centralizes on the driver.
- ``harmonic_centrality`` is ``bfs_distances`` + one aggregate pass.
  With a vertex sample ``S`` it is the standard sampled estimator
  (Eppstein-Wang / HyperBall's exact twin): scores are sums over the
  sampled sources only, which is exactly what a 100 TB run does too —
  exact all-sources centrality is O(V·E) and not a thing at web scale.
- ``random_walks`` draws the step-t neighbor of walker w by
  ``hash(seed, w, t) mod outdeg(cur)`` over rank-ordered adjacency —
  fully deterministic (the same device as SLPA's seeded draws), so the
  walk corpus is reproducible across cluster sizes and hash-verifiable
  (``hash_mode='md5'`` gives a bitwise DuckDB twin). Each step is one
  broadcastable O(V) outdeg join + one equi-join on (vertex, rank):
  exactly one adjacency row matches per walker per step, so per-step cost
  is O(#walkers) shuffled rows, not O(E).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K
from ..text.dedup import _hash64


@dataclass
class BfsStats:
    levels: int = 0
    converged: bool = False
    frontier_sizes: list[int] = field(default_factory=list)
    wall_sec: float = 0.0


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int | None = None,
    broadcast_frontier: bool = True,
) -> tuple[DataFrame, BfsStats]:
    """Directed multi-source BFS → ``(source, id, dist)`` with the shortest
    hop count from every source to every vertex it reaches (dist 0 for the
    source itself). ``sources`` is a one-column ``id`` relation.

    Levels run until every frontier is exhausted (or ``max_depth``); running
    with a depth cap ≥ the sample's eccentricity equals the fixpoint, which
    is what makes the bounded-depth recursive-CTE oracle equivalent to
    convergence.

    Scale: per level, one join frontier⋈edges keyed on the current vertex
    and one anti-join against the settled set keyed on (source, id); both
    distribute on their keys. ``broadcast_frontier`` hints the frontier into
    the edge join — right whenever |S|·|frontier| is driver-broadcastable
    (the common sampled-centrality case); disable for massive source sets.
    """
    t0 = time.time()
    stats = BfsStats()
    frontier = K.materialize(
        sources.select(F.col("id").alias("source"), "id", F.lit(0).alias("dist"))
    )
    dist = frontier
    level = 0
    while max_depth is None or level < max_depth:
        f = F.broadcast(frontier) if broadcast_frontier else frontier
        nxt = (
            f.join(edges, f.id == edges.src)
            .select("source", F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
            .distinct()
            .join(dist, ["source", "id"], "left_anti")
        )
        frontier = K.materialize(nxt)
        n = frontier.count()
        level += 1
        stats.levels = level
        stats.frontier_sizes.append(n)
        if n == 0:
            stats.converged = True
            break
        dist = K.materialize(dist.unionByName(frontier))
    stats.wall_sec = time.time() - t0
    return dist, stats


def harmonic_centrality(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int | None = None,
    broadcast_frontier: bool = True,
) -> tuple[DataFrame, BfsStats]:
    """Sampled harmonic + closeness centrality over directed distances from
    ``sources``: for each vertex v,

    - ``n_reached``  = |{s ∈ S, s ≠ v : s →* v}|
    - ``harmonic``   = Σ_s 1/d(s, v)   (the Eppstein-Wang estimator shape)
    - ``closeness``  = n_reached / Σ_s d(s, v)  (0.0 when unreached)

    Vertices reached by no sampled source score 0. One aggregate pass over
    the ``bfs_distances`` table plus a left join back to the vertex set.
    """
    dist, stats = bfs_distances(edges, sources, max_depth, broadcast_frontier)
    scores = (
        dist.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_reached"),
            F.sum(F.lit(1.0) / F.col("dist")).alias("harmonic"),
            (F.count("*") / F.sum("dist")).alias("closeness"),
        )
    )
    out = (
        G.vertices(edges)
        .join(scores, "id", "left")
        .select(
            "id",
            F.coalesce("n_reached", F.lit(0).cast("long")).alias("n_reached"),
            F.coalesce("harmonic", F.lit(0.0)).alias("harmonic"),
            F.coalesce("closeness", F.lit(0.0)).alias("closeness"),
        )
    )
    return out, stats


def ranked_adjacency(edges: DataFrame) -> DataFrame:
    """Deterministic rank-ordered adjacency ``(src, rank, dst, outdeg)``:
    each vertex's out-neighbors ranked 0..outdeg-1 in ascending dst order
    (duplicate (src, dst) edges collapse first, so ranks are unique). The
    window partitions by src — per-vertex, never a single-partition sort."""
    simple = edges.select("src", "dst").distinct()
    w = Window.partitionBy("src")
    return simple.select(
        "src",
        (F.row_number().over(w.orderBy("dst")) - 1).alias("rank"),
        "dst",
        F.count("*").over(w).alias("outdeg"),
    )


@dataclass
class WalkStats:
    walkers: int = 0
    steps: int = 0
    wall_sec: float = 0.0


def random_walks(
    edges: DataFrame,
    walk_length: int,
    seed: int = 42,
    starts: DataFrame | None = None,
    hash_mode: str = "xxhash64",
    broadcast_state: bool = True,
) -> tuple[DataFrame, WalkStats]:
    """Deterministic random-walk corpus → ``(walk_id, step, node)``.

    One walker starts at every vertex with ≥1 out-edge (or at ``starts``,
    a one-column ``id`` relation) and takes ``walk_length`` steps; the
    step-t transition from node v picks the neighbor whose adjacency rank is
    ``hash64(walk_id:t:seed) mod outdeg(v)``. Walkers that reach a sink
    (no out-edges) stop early; emitted rows always include step 0 (the
    start). Deterministic for a fixed seed at any parallelism level —
    the seeded-draw device SLPA uses (slpa.py), so the corpus is
    reproducible and, under ``hash_mode='md5'``, bitwise-verifiable in any
    engine.

    Scale: the ranked adjacency is computed once (per-src window). Each
    step joins the O(#walkers) state to the O(V) outdeg table
    (broadcastable; ``broadcast_state=False`` is the ≳10⁹-vertex escape
    hatch, same as lpa.py/components.py) and then equi-joins on
    (node, rank) against the adjacency — exactly one match per walker,
    so a step shuffles O(#walkers) rows. No Python in the loop.
    """
    t0 = time.time()
    nbr = K.materialize(ranked_adjacency(edges))
    outdeg = K.materialize(nbr.groupBy(F.col("src").alias("node")).agg(
        F.first("outdeg").alias("outdeg")
    ))
    if starts is None:
        starts = outdeg.select(F.col("node").alias("id"))
    cur = K.materialize(
        starts.select(F.col("id").alias("walk_id"), F.col("id").alias("node"))
    )
    stats = WalkStats(walkers=cur.count())
    rows = [cur.select("walk_id", F.lit(0).alias("step"), "node")]
    alive = cur
    for t in range(1, walk_length + 1):
        od = F.broadcast(outdeg) if broadcast_state else outdeg
        draw = alive.join(od, "node").select(
            "walk_id",
            "node",
            F.pmod(
                _hash64(
                    F.concat_ws(":", F.col("walk_id"), F.lit(t), F.lit(seed)),
                    hash_mode,
                ),
                F.col("outdeg"),
            ).alias("pick"),
        )
        alive = K.materialize(
            draw.join(
                nbr,
                (draw.node == nbr.src) & (draw.pick == nbr.rank),
            ).select("walk_id", F.col("dst").alias("node"))
        )
        rows.append(alive.select("walk_id", F.lit(t).alias("step"), "node"))
        stats.steps = t
        if alive.isEmpty():
            break
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    stats.wall_sec = time.time() - t0
    return out, stats
