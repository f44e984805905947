"""Structural link-graph analytics: k-core decomposition, local clustering
coefficients, degree assortativity, and neighborhood link prediction.

These extend the engine's standard-algorithm suite (SURVEY.md §2.6 X1-X4)
with the remaining operations a link-graph user reaches for after
PageRank/components/LPA/triangles: pruning a graph to its dense core before
expensive analytics (k-core), per-vertex transitivity (clustering
coefficient), the one-number mixing summary the reference's Spearman metric
(Metrics/src/ocd/metrics/Main.java:253-324) approximates rank-wise
(assortativity), and common-neighbor candidate scoring (link prediction —
the same wedge-generation shape as triangle counting).

All four are pure DataFrame computations over the ``edges(src, dst, weight)``
table, designed for the shrinking-relation / bounded-fanout patterns the
rest of the engine uses:

- ``kcore`` peels iteratively; each round is one degree aggregation plus one
  semi-join over a *shrinking* edge set (the same cost shape as the
  small-star/large-star rounds in components.py). No state centralizes.
- ``clustering_coefficients`` reuses the degree-ordered triangle plan
  (triangles.py — orientation bounds wedge fanout at O(√m) even under
  power-law skew).
- ``degree_assortativity`` is a single aggregate pass (corr over edge-end
  degrees) after one broadcast join of the O(V) degree table.
- ``link_prediction`` generates wedges at their center vertex; the
  ``max_wedge_degree`` cap bounds the per-center blowup deg² the same way
  LSH's ``max_bucket`` and Jaccard's ``max_doc_freq`` caps do (hub centers
  contribute near-zero Adamic-Adar signal anyway); dropped centers are
  reported, never silently discarded.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K
from .triangles import _oriented, triangle_counts


@dataclass
class KCoreStats:
    rounds: int = 0
    converged: bool = False
    edge_counts: list[int] = field(default_factory=list)
    wall_sec: float = 0.0


def _undirected_simple(edges: DataFrame) -> DataFrame:
    """Canonical undirected simple edge set ``(u, v)`` with u < v."""
    return (
        G.drop_self_loops(edges)
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )


def kcore(
    edges: DataFrame,
    k: int,
    max_rounds: int | None = None,
    broadcast_alive: bool = True,
) -> tuple[DataFrame, KCoreStats]:
    """k-core of the undirected simple graph: the maximal subgraph where
    every vertex has degree ≥ k, by iterative peeling.

    Each round drops every vertex whose degree *within the current
    subgraph* is < k, then restricts the edge set to surviving endpoints;
    repeats until no vertex is dropped (or ``max_rounds``). Running extra
    rounds past the fixpoint is a no-op (the k-core peels to itself), which
    is what makes the bounded-round SQL oracle equivalent to convergence.

    Returns ``(core(id, core_deg), stats)`` — the surviving vertices with
    their within-core degree. Empty result if the k-core is empty.

    Scale: each round is groupBy-degree + two semi-joins over a shrinking
    edge relation — the same per-round shape as connected components; round
    count is bounded by the peeling depth (≤ graph degeneracy ordering
    length, O(log n)-ish on real link graphs, never the diameter).
    ``broadcast_alive`` hints the O(V) survivor table into the semi-joins;
    disable at ≳10⁹ vertices (same escape hatch as components.py
    ``broadcast_mins``).
    """
    t0 = time.time()
    stats = KCoreStats()
    cur = K.materialize(_undirected_simple(edges))
    prev_n = None
    r = 0
    while max_rounds is None or r < max_rounds:
        deg = (
            cur.select(F.col("u").alias("id"))
            .unionByName(cur.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )
        alive = deg.filter(F.col("deg") >= k).select("id")
        if broadcast_alive:
            alive = F.broadcast(alive)
        nxt = K.materialize(
            cur.join(alive, cur.u == F.col("id"), "left_semi")
            .join(alive, cur.v == F.col("id"), "left_semi")
        )
        n = nxt.count()
        r += 1
        stats.rounds = r
        stats.edge_counts.append(n)
        if prev_n is not None and n == prev_n:
            stats.converged = True
            cur = nxt
            break
        prev_n = n
        cur = nxt
        if n == 0:
            stats.converged = True
            break
    core = (
        cur.select(F.col("u").alias("id"))
        .unionByName(cur.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("core_deg"))
    )
    stats.wall_sec = time.time() - t0
    return core, stats


@dataclass
class CorenessStats:
    rounds: int = 0
    converged: bool = False
    wall_sec: float = 0.0


def coreness(
    edges: DataFrame,
    max_rounds: int | None = None,
    broadcast_state: bool = True,
) -> tuple[DataFrame, CorenessStats]:
    """Core number of every vertex of the undirected simple graph, by
    iterated neighborhood H-index (Lü-Chen-Ren-Zhang-Zhang-Zhou, Nat.
    Commun. 2016): start from ``h₀(v) = deg(v)`` and repeat
    ``h_{t+1}(v) = H({h_t(u) : u ∈ N(v)})`` — the largest h such that at
    least h neighbors have value ≥ h — until fixpoint, which is exactly the
    k-core decomposition. Complements :func:`kcore` (one fixed k) with the
    full decomposition in one run.

    Returns ``(core(id, coreness), stats)``; isolated vertices absent (the
    edge table has no rows for them).

    Scale: each round is one edge⋈state join (state broadcast-hinted, same
    escape hatch as the rest of the engine), one per-vertex window rank
    over neighbor values (partitioned by vertex — never a global sort) and
    one aggregate. The sequence is pointwise non-increasing, so rounds are
    bounded by the peeling depth; a fixed ``max_rounds`` unroll past the
    fixpoint is a no-op (the same bounded-round-oracle invariant as kcore).
    """
    t0 = time.time()
    stats = CorenessStats()
    und = K.materialize(_undirected_simple(edges))
    both = K.materialize(
        und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    )
    h = K.materialize(
        both.groupBy(F.col("u").alias("id")).agg(F.count("*").cast("long").alias("h"))
    )
    w = Window.partitionBy("node").orderBy(F.desc("hn"))
    r = 0
    while max_rounds is None or r < max_rounds:
        state = F.broadcast(h) if broadcast_state else h
        nbr_vals = both.join(state, both.v == F.col("id")).select(
            F.col("u").alias("node"), F.col("h").alias("hn")
        )
        new_h = (
            nbr_vals.withColumn("rn", F.row_number().over(w))
            .filter(F.col("hn") >= F.col("rn"))
            .groupBy(F.col("node").alias("id"))
            .agg(F.max("rn").cast("long").alias("h"))
        )
        # vertices whose every neighbor dropped below 1 keep h = 0 (cannot
        # happen on a simple graph with edges: h >= 1 always) — complete
        # with 0 for safety
        new_h = K.materialize(
            h.select("id").join(new_h, "id", "left")
            .select("id", F.coalesce("h", F.lit(0)).cast("long").alias("h"))
        )
        r += 1
        stats.rounds = r
        changed = (
            new_h.join(h.withColumnRenamed("h", "old"), "id")
            .filter(F.col("h") != F.col("old"))
            .count()
        )
        h = new_h
        if changed == 0:
            stats.converged = True
            break
    stats.wall_sec = time.time() - t0
    return h.select("id", F.col("h").alias("coreness")), stats


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Local clustering coefficient per vertex on the undirected simple
    graph: ``lcc(v) = 2·T(v) / (d(v)·(d(v)−1))``, 0 when d(v) < 2.

    Reuses the degree-ordered triangle plan (triangles.py), so the wedge
    join inherits its O(m^1.5) bound and skew handling. Returns
    ``(id, degree, triangles, lcc)`` for every vertex.
    """
    und = _undirected_simple(edges)
    deg = (
        und.select(F.col("u").alias("id"))
        .unionByName(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    tri, _ = triangle_counts(edges)
    return (
        tri.join(deg, "id", "left")
        .select(
            "id",
            F.coalesce("degree", F.lit(0)).alias("degree"),
            F.col("triangles"),
            F.when(
                F.coalesce("degree", F.lit(0)) >= 2,
                2.0 * F.col("triangles") / (F.col("degree") * (F.col("degree") - 1)),
            )
            .otherwise(F.lit(0.0))
            .alias("lcc"),
        )
    )


def degree_assortativity(edges: DataFrame, broadcast_degrees: bool = True) -> DataFrame:
    """Degree assortativity of the undirected simple graph: the Pearson
    correlation of (deg(u), deg(v)) over the *doubled* edge-end list (each
    undirected edge contributes both orientations — the standard estimator
    for Newman's assortativity coefficient, r ∈ [−1, 1]).

    One join of the O(V) degree table against the edge list (broadcast by
    default; ``broadcast_degrees=False`` is the ≳10⁹-vertex escape hatch —
    same knob as components.py ``broadcast_mins``), one aggregate — a
    scan-shaped job at any scale. Returns a single row
    ``(assortativity, n_edges)``; assortativity is NULL on degree-regular
    graphs (zero variance).
    """
    und = _undirected_simple(edges)
    deg = (
        und.select(F.col("u").alias("id"))
        .unionByName(und.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count("*").cast("double").alias("deg"))
    )
    both = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    d = F.broadcast(deg) if broadcast_degrees else deg
    ends = (
        both.join(d, both.u == d.id)
        .select("v", F.col("deg").alias("du"))
        .join(d, F.col("v") == d.id)
        .select("du", F.col("deg").alias("dv"))
    )
    return ends.agg(
        F.corr("du", "dv").alias("assortativity"),
        (F.count("*") / 2).cast("long").alias("n_edges"),
    )


@dataclass
class LinkPredStats:
    dropped_centers: int = 0
    wall_sec: float = 0.0


def link_prediction(
    edges: DataFrame,
    max_wedge_degree: int | None = None,
    broadcast_degrees: bool = True,
) -> tuple[DataFrame, LinkPredStats]:
    """Common-neighbor link-prediction scores for non-adjacent vertex pairs.

    For every unordered pair (a, b), a < b, that shares ≥ 1 neighbor and is
    NOT already an edge, returns
    ``(a, b, common_neighbors, jaccard, adamic_adar)`` where

    - ``jaccard = cn / (deg(a) + deg(b) − cn)``,
    - ``adamic_adar = Σ_{w ∈ N(a)∩N(b)} 1 / ln(deg(w))`` (centers with
      deg(w) = 1 cannot be shared; deg(w) = 2 ⇒ weight 1/ln 2).

    Pairs are generated at their shared neighbor w (one wedge per center,
    cost Σ_w deg(w)²). ``max_wedge_degree`` drops hub centers above the cap
    from *candidate generation only* — degrees and the Jaccard denominator
    stay exact — and the drop count is reported in stats, mirroring the
    engine's other bounded-fanout caps (LSH ``max_bucket``, Jaccard
    ``max_doc_freq``). A dropped hub contributes ≤ 1/ln(cap) per pair to
    adamic_adar, so the cap trades a quantified score underestimate for a
    bounded shuffle. ``broadcast_degrees=False`` is the ≳10⁹-vertex escape
    hatch for the three O(V) degree-table joins (same knob as
    components.py ``broadcast_mins``).
    """
    t0 = time.time()
    stats = LinkPredStats()
    und = K.materialize(_undirected_simple(edges))
    # adjacency with per-vertex degree, both directions: (w, nbr, deg_w)
    both = und.unionByName(und.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = both.groupBy(F.col("u").alias("id")).agg(
        F.count("*").cast("long").alias("deg")
    )
    deg_j = F.broadcast(deg) if broadcast_degrees else deg
    adj = both.join(deg_j, both.u == F.col("id")).select(
        F.col("u").alias("w"), F.col("v").alias("nbr"), F.col("deg").alias("deg_w")
    )
    if max_wedge_degree is not None:
        stats.dropped_centers = adj.filter(
            F.col("deg_w") > max_wedge_degree
        ).select("w").distinct().count()
        adj = adj.filter(F.col("deg_w") <= max_wedge_degree)
    adj = K.materialize(adj)
    l, r = adj.alias("l"), adj.alias("r")
    wedges = l.join(
        r, (F.col("l.w") == F.col("r.w")) & (F.col("l.nbr") < F.col("r.nbr"))
    ).select(
        F.col("l.nbr").alias("a"),
        F.col("r.nbr").alias("b"),
        F.col("l.deg_w").alias("deg_w"),
    )
    scores = wedges.groupBy("a", "b").agg(
        F.count("*").cast("long").alias("common_neighbors"),
        F.sum(1.0 / F.log(F.col("deg_w").cast("double"))).alias("adamic_adar"),
    )
    # drop existing edges; attach exact endpoint degrees for Jaccard
    scores = scores.join(
        und, (scores.a == und.u) & (scores.b == und.v), "left_anti"
    )
    d = F.broadcast(deg) if broadcast_degrees else deg
    out = (
        scores.join(d, scores.a == d.id)
        .select("a", "b", "common_neighbors", "adamic_adar", F.col("deg").alias("da"))
        .join(d, F.col("b") == d.id)
        .select(
            "a",
            "b",
            "common_neighbors",
            (
                F.col("common_neighbors")
                / (F.col("da") + F.col("deg") - F.col("common_neighbors"))
            ).alias("jaccard"),
            "adamic_adar",
        )
    )
    stats.wall_sec = time.time() - t0
    return out, stats


@dataclass
class KTrussStats:
    rounds: int = 0
    converged: bool = False
    edge_counts: list[int] = field(default_factory=list)
    wall_sec: float = 0.0


def _edge_supports(cur: DataFrame) -> DataFrame:
    """Per-edge triangle support within the oriented edge set (rank pairs
    a < b): ``(a, b, sup)`` for edges in ≥ 1 triangle. Same O(m^1.5)
    wedge-join plan as triangle_counts, but an INNER closing join (each
    triangle must credit all three of its edges, not just be counted)."""
    e1, e2 = cur.alias("e1"), cur.alias("e2")
    wedges = e1.join(
        e2, (F.col("e1.a") == F.col("e2.a")) & (F.col("e1.b") < F.col("e2.b"))
    ).select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z"))
    tris = wedges.join(cur.select(F.col("a").alias("y"), F.col("b").alias("z")), ["y", "z"])
    sides = tris.select(
        F.explode(
            F.array(
                F.struct(F.col("x").alias("a"), F.col("y").alias("b")),
                F.struct(F.col("x").alias("a"), F.col("z").alias("b")),
                F.struct(F.col("y").alias("a"), F.col("z").alias("b")),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    return sides.groupBy("a", "b").agg(F.count("*").alias("sup"))


def ktruss(
    edges: DataFrame,
    k: int,
    max_rounds: int | None = None,
    degree_ordered: bool = True,
    broadcast_rank_map: bool = True,
) -> tuple[DataFrame, KTrussStats]:
    """k-truss of the undirected simple graph: the maximal subgraph where
    every edge participates in ≥ k-2 triangles *within the subgraph*, by
    iterative support peeling (Cohen 2008). Returns
    ``(truss(u, v, support), stats)`` in original vertex ids (u < v) with
    each surviving edge's within-truss support.

    Like kcore, extra rounds past the fixpoint are no-ops (the truss peels
    to itself), which makes the bounded-round SQL oracle equal to
    convergence. Scale: each round reuses the degree-ordered orientation
    (triangles.py) — no vertex fans out more than O(√m) oriented out-edges
    even under power-law skew — and the support aggregate combines
    map-side; the edge relation only shrinks. ``broadcast_rank_map=False``
    is the ≳10⁹-vertex escape hatch for the O(V) rank-dictionary joins."""
    if k < 3:
        raise ValueError(f"k must be >= 3, got {k}")
    t0 = time.time()
    stats = KTrussStats()
    oriented, rank_map = _oriented(edges, degree_ordered, broadcast_rank_map)
    cur = K.materialize(oriented)
    prev_n = cur.count()
    stats.edge_counts.append(prev_n)
    sup = None
    while max_rounds is None or stats.rounds < max_rounds:
        sup = _edge_supports(cur)
        nxt = K.materialize(
            cur.join(sup, ["a", "b"], "left")
            .filter(F.coalesce("sup", F.lit(0)) >= k - 2)
            .select("a", "b")
        )
        n = nxt.count()
        stats.rounds += 1
        stats.edge_counts.append(n)
        if n == prev_n or n == 0:
            # at the fixpoint `sup` was computed over exactly the surviving
            # set, so it doubles as the final support table — no extra pass
            stats.converged = True
            cur = nxt
            break
        prev_n = n
        cur = nxt
        sup = None
    if sup is None:  # stopped by max_rounds (or zero rounds): one fresh pass
        sup = _edge_supports(cur)
    out_r = cur.join(sup, ["a", "b"], "left").select(
        "a", "b", F.coalesce("sup", F.lit(0)).alias("support")
    )
    rm = F.broadcast(rank_map) if broadcast_rank_map else rank_map
    out = (
        out_r.join(rm, out_r.a == rm.rank)
        .select(F.col("id").alias("ia"), "b", "support")
        .join(rm, F.col("b") == rm.rank)
        .select(
            F.least("ia", "id").alias("u"),
            F.greatest("ia", "id").alias("v"),
            F.col("support").cast("long").alias("support"),
        )
    )
    stats.wall_sec = time.time() - t0
    return out, stats
