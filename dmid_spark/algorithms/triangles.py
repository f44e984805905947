"""Triangle counting (SURVEY.md §2.6 X4).

Degree-ordered orientation + wedge join + closing-edge semi-join: the
O(m^1.5) plan. Vertices are re-ranked by (degree, id); every undirected edge
is oriented low-rank → high-rank, so each wedge is generated exactly once at
its lowest-rank vertex and no vertex fans out more than O(√m) oriented
out-edges even under power-law skew — the orientation IS the skew handling.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K


@dataclass
class TriangleStats:
    total: int = 0
    wall_sec: float = 0.0


def _oriented(
    edges: DataFrame, degree_ordered: bool, broadcast_rank_map: bool = True
) -> tuple[DataFrame, DataFrame]:
    """Undirected simple edges oriented by rank; returns (oriented(a, b),
    rank_map(id, rank)) with rank dense. a, b are ranks with a < b.

    ``broadcast_rank_map`` hints the O(V) rank dictionary into the two
    rewrite joins; disable at ≳10⁹ vertices (the engine-wide escape hatch —
    same knob as components.py ``broadcast_mins``) so the planner falls back
    to a shuffle join that never centralizes O(V) state on executors."""
    und = (
        G.drop_self_loops(edges)
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    verts = G.vertices(edges)
    if degree_ordered:
        deg = (
            und.select(F.col("u").alias("id"))
            .unionByName(und.select(F.col("v").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )
        ranked = verts.join(deg, "id", "left").select(
            "id", F.coalesce("deg", F.lit(0)).alias("deg")
        )
        rank_map = K.distributed_rank(ranked, ["deg", "id"], out_col="rank").select(
            "id", "rank"
        )
    else:
        rank_map = verts.select("id", F.col("id").alias("rank"))
    rm = F.broadcast(rank_map) if broadcast_rank_map else rank_map
    oriented = (
        und.join(rm, und.u == rm.id)
        .select(F.col("rank").alias("ru"), "v")
        .join(rm, F.col("v") == rm.id)
        .select("ru", F.col("rank").alias("rv"))
        .select(F.least("ru", "rv").alias("a"), F.greatest("ru", "rv").alias("b"))
    )
    return oriented, rank_map


def triangle_counts(
    edges: DataFrame, degree_ordered: bool = True, broadcast_rank_map: bool = True
) -> tuple[DataFrame, TriangleStats]:
    """Per-vertex triangle counts on the undirected simple graph.
    Returns (counts(id, triangles), stats) — every vertex present.
    ``broadcast_rank_map=False`` is the ≳10⁹-vertex escape hatch for the
    O(V) rank-dictionary joins (see :func:`_oriented`)."""
    t0 = time.time()
    oriented, rank_map = _oriented(edges, degree_ordered, broadcast_rank_map)
    oriented = K.materialize(oriented)
    e1 = oriented.alias("e1")
    e2 = oriented.alias("e2")
    wedges = e1.join(e2, (F.col("e1.a") == F.col("e2.a")) & (F.col("e1.b") < F.col("e2.b"))).select(
        F.col("e1.a").alias("x"), F.col("e1.b").alias("y"), F.col("e2.b").alias("z")
    )
    closing = oriented.select(F.col("a").alias("y"), F.col("b").alias("z"))
    tris = wedges.join(closing, ["y", "z"], "left_semi")
    # single pass over the (potentially huge) triangle set: explode the three
    # corners and aggregate — no materialization of tris, no re-scans; the
    # total falls out of the same aggregate (Σ per-corner counts = 3·Δ)
    per_rank = K.materialize(
        tris.select(F.explode(F.array("x", "y", "z")).alias("rank"))
        .groupBy("rank")
        .agg(F.count("*").alias("triangles"))
    )
    total3 = per_rank.agg(F.sum("triangles")).first()[0] or 0
    counts = (
        rank_map.join(per_rank, "rank", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )
    stats = TriangleStats(total=int(total3) // 3, wall_sec=time.time() - t0)
    return counts, stats


def total_triangles(edges: DataFrame, degree_ordered: bool = True) -> int:
    _, stats = triangle_counts(edges, degree_ordered)
    return stats.total


@dataclass
class SquareStats:
    total: int = 0
    wedge_pairs: int = 0
    capped_centers: int = 0
    wall_sec: float = 0.0


def square_counts(
    edges: DataFrame, max_center_degree: int | None = None
) -> tuple[DataFrame, SquareStats]:
    """Per-vertex 4-cycle (square) counts on the undirected simple graph.

    Counting identity: a square a-b-c-d has two diagonals {a,c} and {b,d};
    group the length-2 paths (wedges) by their ordered endpoint pair
    ``(lo, hi)`` — a pair with ``cnt`` distinct centers closes
    ``C(cnt, 2)`` squares, each square being counted once per diagonal.
    Per vertex: through its diagonal pair each center closes ``cnt - 1``
    squares, and every square containing v is seen exactly once that way,
    so ``squares(v) = Σ_(pairs centered at v) (cnt - 1)``; the global total
    is ``Σ_v squares(v) / 4``.  All integer arithmetic — the SQL twin is a
    direct groupBy, no recursion.

    Scale: wedge generation is O(Σ deg²), dominated by hot centers —
    ``max_center_degree`` excludes ultra-hot centers from wedge generation
    (their wedges AND the squares through them are dropped; the count of
    excluded centers is reported in stats, house convention: capped ops
    always say what they dropped). The endpoint-pair aggregation itself is
    a plain map-side-combinable groupBy, skew-safe.
    """
    t0 = time.time()
    und = (
        G.drop_self_loops(edges)
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    verts = G.vertices(edges)
    bidir = und.select(F.col("u").alias("c"), F.col("v").alias("n")).unionByName(
        und.select(F.col("v").alias("c"), F.col("u").alias("n"))
    )
    capped = 0
    if max_center_degree is not None:
        deg = bidir.groupBy("c").agg(F.count("*").alias("deg"))
        hot = deg.filter(F.col("deg") > max_center_degree).select("c")
        capped = hot.count()
        bidir = bidir.join(hot, "c", "left_anti")
    bidir = K.materialize(bidir)
    b1 = bidir.alias("b1")
    b2 = bidir.alias("b2")
    wedges = b1.join(
        b2, (F.col("b1.c") == F.col("b2.c")) & (F.col("b1.n") < F.col("b2.n"))
    ).select(F.col("b1.n").alias("lo"), F.col("b2.n").alias("hi"), F.col("b1.c").alias("ctr"))
    paircnt = K.materialize(
        wedges.groupBy("lo", "hi")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
    )
    # Σ cnt·(cnt-1) = 2·Σ C(cnt,2) = 4·squares — integer all the way
    agg = paircnt.agg(
        F.sum(F.col("cnt") * (F.col("cnt") - 1)).alias("s2"),
        F.count("*").alias("p"),
    ).first()
    per_vertex = (
        wedges.join(paircnt, ["lo", "hi"])
        .groupBy("ctr")
        .agg(F.sum(F.col("cnt") - 1).alias("squares"))
    )
    counts = verts.join(per_vertex, verts.id == per_vertex.ctr, "left").select(
        "id", F.coalesce("squares", F.lit(0)).cast("long").alias("squares")
    )
    stats = SquareStats(
        total=int(agg["s2"] or 0) // 4,
        wedge_pairs=int(agg["p"] or 0),
        capped_centers=capped,
        wall_sec=time.time() - t0,
    )
    return counts, stats


@dataclass
class SampledTriangleStats:
    total_edges: int = 0
    sampled_edges: int = 0
    sampled_triangles: int = 0
    estimate: float = 0.0
    wall_sec: float = 0.0


def sampled_triangle_count(
    edges: DataFrame,
    keep_percent: int = 20,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    degree_ordered: bool = True,
) -> tuple[DataFrame, SampledTriangleStats]:
    """DOULION (Tsourakakis et al. 2009) approximate triangle counting:
    keep each undirected edge with probability p = keep_percent/100 via a
    deterministic per-edge hash draw, count triangles exactly on the
    sampled graph, scale by 1/p³ — an unbiased estimate at ~p² of the
    wedge-join cost, the knob for graphs where even the degree-ordered
    O(m^1.5) pass is too hot.

    The draw is seeded and content-addressed (hash of the canonical edge),
    so the sample — and therefore the integer ``sampled_triangles`` — is
    identical at any parallelism; ``hash_mode='md5'`` makes it
    engine-portable (DuckDB twin). Returns
    ``(one-row DataFrame(sampled_edges, sampled_triangles), stats)``;
    the float estimate lives in stats."""
    if not 1 <= keep_percent <= 100:
        raise ValueError(f"keep_percent must be in [1, 100], got {keep_percent}")
    from ..text.dedup import _hash64

    t0 = time.time()
    und = (
        G.drop_self_loops(edges)
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    draw_key = F.concat_ws("_", F.col("u"), F.col("v"), F.lit(str(seed)))
    samp = und.filter(F.pmod(_hash64(draw_key, hash_mode), F.lit(100)) < keep_percent)
    m_total = und.count()
    m_samp = samp.count()
    n_tri = total_triangles(
        samp.select(F.col("u").alias("src"), F.col("v").alias("dst")),
        degree_ordered=degree_ordered,
    )
    p = keep_percent / 100.0
    stats = SampledTriangleStats(
        total_edges=m_total,
        sampled_edges=m_samp,
        sampled_triangles=n_tri,
        estimate=n_tri / p**3,
        wall_sec=time.time() - t0,
    )
    out = edges.sparkSession.createDataFrame(
        [(m_samp, n_tri)], "sampled_edges long, sampled_triangles long"
    )
    return out, stats


@dataclass
class SampledSquareStats:
    total_edges: int = 0
    sampled_edges: int = 0
    sampled_squares: int = 0
    estimate: float = 0.0
    wall_sec: float = 0.0


def sampled_square_count(
    edges: DataFrame,
    keep_percent: int = 20,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> tuple[DataFrame, SampledSquareStats]:
    """DOULION-style approximate 4-cycle counting: keep each undirected
    edge with probability p via the same deterministic content-addressed
    draw as :func:`sampled_triangle_count`, count squares exactly on the
    sampled graph, scale by 1/p⁴ (a square has four edges). This is THE
    scale path for dense graphs where exact counting's O(Σ deg²) wedge
    generation is too hot — sampling at p cuts it by ~p², and unlike the
    ``max_center_degree`` cap it stays unbiased instead of dropping hot
    vertices outright. Deterministic at any parallelism; ``hash_mode='md5'``
    is the engine-portable twin mode."""
    if not 1 <= keep_percent <= 100:
        raise ValueError(f"keep_percent must be in [1, 100], got {keep_percent}")
    from ..text.dedup import _hash64

    t0 = time.time()
    und = (
        G.drop_self_loops(edges)
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    draw_key = F.concat_ws("_", F.col("u"), F.col("v"), F.lit(str(seed)))
    samp = und.filter(F.pmod(_hash64(draw_key, hash_mode), F.lit(100)) < keep_percent)
    m_total = und.count()
    m_samp = samp.count()
    _, sq = square_counts(samp.select(F.col("u").alias("src"), F.col("v").alias("dst")))
    p = keep_percent / 100.0
    stats = SampledSquareStats(
        total_edges=m_total,
        sampled_edges=m_samp,
        sampled_squares=sq.total,
        estimate=sq.total / p**4,
        wall_sec=time.time() - t0,
    )
    out = edges.sparkSession.createDataFrame(
        [(m_samp, sq.total)], "sampled_edges long, sampled_squares long"
    )
    return out, stats
