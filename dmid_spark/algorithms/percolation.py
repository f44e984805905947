"""Clique percolation method, k=3 (SURVEY.md §2.6 ext X29).

CPM (Palla et al., "Uncovering the overlapping community structure of
complex networks in nature and society", Nature 2005) defines overlapping
communities as connected components of the clique adjacency graph: for
k=3, triangles are the cliques and two triangles are adjacent when they
share an edge. A vertex belongs to every community whose triangles contain
it — an overlapping cover, the same output shape as DMID/SLPA
(reference: Rofti/DMID's cover JSON, DMIDComputation.java's overlapping
memberships), computed from pure structure instead of a threshold game.

Scale design:
- Triangle enumeration reuses the degree-ordered orientation + wedge join
  plan from triangles.py (O(m^1.5), orientation bounds fan-out under skew).
- The clique graph is never built as all-pairs-per-shared-edge: all
  triangles sharing an edge are MUTUALLY adjacent, so chaining them in a
  deterministic order (t1–t2, t2–t3, …) yields a graph with exactly the
  same connected components with t−1 edges per shared edge instead of
  C(t,2) — the all-pairs blowup (a hot edge in 10^4 triangles → 5·10^7
  pairs) is avoided exactly, not approximately.
- Components of the chained clique graph come from the small-star/
  large-star CC already in components.py; triangle ids are dense longs
  from kernel.distributed_rank (no hash-collision risk).

:func:`clique_graph_edges` exposes the literal adjacency relation (capped
per shared edge, deterministic order) for inspection and engine twins.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .. import kernel as K
from .components import connected_components
from .triangles import _oriented


@dataclass
class PercolationStats:
    triangles: int = 0
    clique_edges: int = 0
    communities: int = 0
    wall_sec: float = 0.0


def triangle_list(
    edges: DataFrame, degree_ordered: bool = True, broadcast_rank_map: bool = True
) -> DataFrame:
    """Enumerate triangles as ``(v1, v2, v3)`` original vertex ids with
    ``v1 < v2 < v3`` — one row per triangle. Same oriented wedge-join plan
    as :func:`..triangles.triangle_counts`, but keeping the closing rows
    and mapping ranks back to ids (three joins against the O(V) rank map,
    broadcast-hinted with the engine-wide opt-out)."""
    oriented, rank_map = _oriented(edges, degree_ordered, broadcast_rank_map)
    oriented = K.materialize(oriented)
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedges = e1.join(
        e2, (F.col("e1.a") == F.col("e2.a")) & (F.col("e1.b") < F.col("e2.b"))
    ).select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    closing = oriented.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tris = wedges.join(closing, ["y", "z"], "left_semi")
    rm = F.broadcast(rank_map) if broadcast_rank_map else rank_map
    back = (
        tris.join(rm.select(F.col("rank").alias("x"), F.col("id").alias("ix")), "x")
        .join(rm.select(F.col("rank").alias("y"), F.col("id").alias("iy")), "y")
        .join(rm.select(F.col("rank").alias("z"), F.col("id").alias("iz")), "z")
    )
    arr = F.array_sort(F.array("ix", "iy", "iz"))
    return back.select(
        arr[0].alias("v1"), arr[1].alias("v2"), arr[2].alias("v3")
    )


def _tri_edges(tris: DataFrame) -> DataFrame:
    """Explode each triangle into its 3 undirected edges: (eu, ev) plus
    every input column (v1, v2, v3, and tid when present) passed through."""
    cols = list(tris.columns)
    return tris.select(
        F.explode(
            F.array(
                F.struct(F.col("v1").alias("eu"), F.col("v2").alias("ev")),
                F.struct(F.col("v1").alias("eu"), F.col("v3").alias("ev")),
                F.struct(F.col("v2").alias("eu"), F.col("v3").alias("ev")),
            )
        ).alias("e"),
        *cols,
    ).select(F.col("e.eu").alias("eu"), F.col("e.ev").alias("ev"), *cols)


def clique_graph_edges(
    edges: DataFrame,
    max_per_edge: int = 5,
    degree_ordered: bool = True,
    broadcast_rank_map: bool = True,
) -> DataFrame:
    """The k=3 clique adjacency relation: one row per pair of triangles
    sharing an edge, triangles keyed by their sorted triple. Per shared
    edge only the first ``max_per_edge`` triangles (triple-sorted order)
    pair all-vs-all — the bounded inspection view; percolation components
    use the exact unbounded chain form instead (see module docstring).
    Returns ``(a1, a2, a3, b1, b2, b3)`` with triple A < triple B
    lexicographically."""
    if max_per_edge < 2:
        raise ValueError(f"max_per_edge must be >= 2, got {max_per_edge}")
    te = _tri_edges(triangle_list(edges, degree_ordered, broadcast_rank_map))
    w = Window.partitionBy("eu", "ev").orderBy("v1", "v2", "v3")
    ranked = te.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= max_per_edge
    )
    a, b = ranked.alias("a"), ranked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.eu") == F.col("b.eu"))
            & (F.col("a.ev") == F.col("b.ev"))
            & (F.col("a._r") < F.col("b._r")),
        )
        .select(
            F.col("a.v1").alias("a1"), F.col("a.v2").alias("a2"),
            F.col("a.v3").alias("a3"), F.col("b.v1").alias("b1"),
            F.col("b.v2").alias("b2"), F.col("b.v3").alias("b3"),
        )
        # no distinct: two distinct triangles share at most ONE edge, so a
        # pair arises in exactly one (eu, ev) group — a distinct here is a
        # pure extra shuffle over the largest intermediate
    )


def kclique_communities(
    edges: DataFrame,
    k: int = 3,
    degree_ordered: bool = True,
    broadcast_rank_map: bool = True,
    broadcast_mins: bool = True,
) -> tuple[DataFrame, PercolationStats]:
    """Overlapping CPM communities. Returns ``(cover(id, community),
    stats)`` where ``community`` is the minimum dense triangle id of the
    clique component — one row per (vertex, community) membership, and a
    vertex may appear in several communities. Only k=3 (triangle
    percolation) is implemented; higher k needs k-clique enumeration.

    Exact at scale: the chain representation of each shared edge's
    triangle group preserves connected components (mutual adjacency →
    any spanning path suffices), so no cap and no all-pairs join exist
    anywhere in the plan."""
    if k != 3:
        raise NotImplementedError("only k=3 (triangle percolation) is implemented")
    t0 = time.time()
    stats = PercolationStats()
    tris = K.materialize(triangle_list(edges, degree_ordered, broadcast_rank_map))
    stats.triangles = tris.count()
    # dense long id per triangle — deterministic, collision-free
    tid = K.materialize(
        K.distributed_rank(tris, ["v1", "v2", "v3"], out_col="tid")
    )
    te = _tri_edges(tid.select("tid", "v1", "v2", "v3"))
    # chain triangles within each shared-edge group in tid order:
    # lead(tid) over the edge partition gives the t-1 spanning edges
    w = Window.partitionBy("eu", "ev").orderBy("tid")
    chain = (
        te.select("eu", "ev", "tid")
        .withColumn("nxt", F.lead("tid").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(F.col("tid").alias("src"), F.col("nxt").alias("dst"))
        # no distinct: a (t1, t2) chain link can only arise in one group
        # (two triangles share at most one edge); CC tolerates multi-edges
        # anyway — the distinct would be a pure extra shuffle
    )
    stats.clique_edges = chain.count()
    labels, _ = connected_components(chain, broadcast_mins=broadcast_mins)
    # isolated triangles (no shared edge) are their own community
    cover = (
        tid.join(labels.withColumnRenamed("id", "tid"), "tid", "left")
        .select(
            F.coalesce("component", "tid").alias("community"), "v1", "v2", "v3"
        )
        .select(F.explode(F.array("v1", "v2", "v3")).alias("id"), "community")
        .distinct()
    )
    cover = K.materialize(cover)
    stats.communities = cover.select("community").distinct().count()
    stats.wall_sec = time.time() - t0
    return cover, stats
