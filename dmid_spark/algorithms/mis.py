"""Maximal independent set (Luby 1986) and greedy coloring by iterated MIS.

Not in the reference repo — part of the §2.6 extension suite: on a
100 TB link graph an MIS is the standard tool for conflict-free
scheduling of vertex updates (chromatic scheduling), landmark/seed
selection, and distance-preserving sparsifier seeds, and iterated MIS
gives a distributed greedy coloring.

Luby's algorithm, synchronous rounds: every undecided vertex draws a
fresh priority each round; a vertex enters the MIS iff its priority is
strictly below every undecided neighbour's, then it and its neighbours
leave the undecided set. Expected O(log n) rounds. The draw is a seeded
content-addressed hash (same device as DOULION / SLPA), so the result is
identical at any parallelism, and ``hash_mode='md5'`` makes it
bitwise-reproducible in the DuckDB oracle twin.

Scale notes: each round is one groupBy-min over the live bidirectional
edge relation plus semi/anti-joins that shrink it — the same per-round
shape as k-core peeling.  No global windows, no driver-side state beyond
the per-round count action. ``broadcast_decided`` hints the O(V)
winner/undecided tables into the restriction joins; disable at ≳10⁹
vertices (engine-wide escape hatch, same knob as components.py
``broadcast_mins``).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K
from ..text.dedup import _hash64
from .structure import _undirected_simple


@dataclass
class MISStats:
    rounds: int = 0
    mis_size: int = 0
    decided_per_round: list[int] = field(default_factory=list)
    wall_sec: float = 0.0


def _priority(id_col: F.Column, round_no: int, seed: int, hash_mode: str) -> F.Column:
    """Per-round priority key: 50 hash bits shifted up, low id bits as the
    tie-break — ties between distinct vertices need a simultaneous 50-bit
    hash collision AND equal low-10 id bits (~2⁻⁶⁰ per neighbour pair; a
    tied pair merely skips one round, it never breaks the MIS invariants).
    Integer-only and content-addressed, so the key — and therefore the
    whole run — is identical at any parallelism and in the SQL twin."""
    draw = _hash64(
        F.concat_ws("_", id_col, F.lit(str(seed)), F.lit(str(round_no))), hash_mode
    )
    return F.pmod(draw, F.lit(1 << 50)) * F.lit(1024) + F.pmod(id_col, F.lit(1024))


def luby_mis(
    edges: DataFrame,
    seed: int = 42,
    max_rounds: int | None = None,
    hash_mode: str = "xxhash64",
    broadcast_decided: bool = True,
    vertices: DataFrame | None = None,
) -> tuple[DataFrame, MISStats]:
    """Maximal independent set of the undirected simple graph.

    Returns ``(result(id, in_mis, round_decided), stats)`` — one row per
    vertex; ``in_mis`` marks the independent set, ``round_decided`` the
    synchronous round at which the vertex was settled (joined, or was
    knocked out as a fresh MIS vertex's neighbour).

    ``vertices`` overrides the vertex set (default: endpoints of
    ``edges``) — the hook :func:`greedy_coloring` uses to keep residual
    isolated vertices in play.
    """
    t0 = time.time()
    stats = MISStats()
    verts = vertices.select("id") if vertices is not None else G.vertices(edges)
    undecided = K.materialize(verts.select("id"))
    cur = K.materialize(
        _undirected_simple(edges)
        .join(undecided.withColumnRenamed("id", "u"), "u", "left_semi")
        .join(undecided.withColumnRenamed("id", "v"), "v", "left_semi")
    )
    decided_parts: list[DataFrame] = []
    r = 0
    while True:
        n_undecided = undecided.count()
        if n_undecided == 0:
            break
        if max_rounds is not None and r >= max_rounds:
            break
        r += 1
        prio = undecided.select(
            "id", _priority(F.col("id"), r, seed, hash_mode).alias("p")
        )
        bidir = cur.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
            cur.select(F.col("v").alias("a"), F.col("u").alias("b"))
        )
        nbr_min = (
            bidir.join(prio.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("p").alias("min_nbr"))
            .withColumnRenamed("a", "id")
        )
        winners = K.materialize(
            prio.join(nbr_min, "id", "left")
            .filter(F.col("min_nbr").isNull() | (F.col("p") < F.col("min_nbr")))
            .select("id")
        )
        wj = F.broadcast(winners) if broadcast_decided else winners
        removed = K.materialize(
            bidir.join(wj.withColumnRenamed("id", "a"), "a", "left_semi")
            .select(F.col("b").alias("id"))
            .distinct()
        )
        decided_parts.append(
            winners.select(
                "id", F.lit(True).alias("in_mis"), F.lit(r).alias("round_decided")
            )
        )
        decided_parts.append(
            removed.select(
                "id", F.lit(False).alias("in_mis"), F.lit(r).alias("round_decided")
            )
        )
        gone = winners.unionByName(removed)
        gj = F.broadcast(gone) if broadcast_decided else gone
        undecided = K.materialize(undecided.join(gj, "id", "left_anti"))
        uj = F.broadcast(undecided) if broadcast_decided else undecided
        cur = K.materialize(
            cur.join(uj.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(uj.withColumnRenamed("id", "v"), "v", "left_semi")
        )
        n_now = undecided.count()
        stats.rounds = r
        stats.decided_per_round.append(n_undecided - n_now)
    if not decided_parts:
        result = verts.select(
            "id", F.lit(True).alias("in_mis"), F.lit(0).alias("round_decided")
        ).limit(0)
    else:
        result = reduce(DataFrame.unionByName, decided_parts)
    result = K.materialize(result)
    stats.mis_size = result.filter(F.col("in_mis")).count()
    stats.wall_sec = time.time() - t0
    return result, stats


@dataclass
class ColoringStats:
    colors: int = 0
    mis_rounds_total: int = 0
    wall_sec: float = 0.0


def greedy_coloring(
    edges: DataFrame,
    seed: int = 42,
    max_colors: int | None = None,
    hash_mode: str = "xxhash64",
    broadcast_decided: bool = True,
) -> tuple[DataFrame, ColoringStats]:
    """Proper vertex coloring by iterated MIS: color c is a Luby MIS of the
    residual graph on still-uncolored vertices (Jones–Plassmann flavour).
    Every color class is independent by construction; color count is
    bounded by the residual peel depth (≈ degeneracy + 1 in expectation,
    never the chromatic-number NP beast).

    Returns ``(coloring(id, color), stats)`` with colors 1..C.
    """
    t0 = time.time()
    stats = ColoringStats()
    und = K.materialize(_undirected_simple(edges))
    uncolored = K.materialize(G.vertices(edges))
    out_parts: list[DataFrame] = []
    c = 0
    while True:
        if uncolored.count() == 0:
            break
        if max_colors is not None and c >= max_colors:
            raise RuntimeError(
                f"greedy_coloring did not finish within max_colors={max_colors}"
            )
        c += 1
        res_edges = und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        mis, ms = luby_mis(
            res_edges,
            seed=seed * 10_000 + c,
            hash_mode=hash_mode,
            broadcast_decided=broadcast_decided,
            vertices=uncolored,
        )
        stats.mis_rounds_total += ms.rounds
        winners = K.materialize(mis.filter(F.col("in_mis")).select("id"))
        out_parts.append(winners.select("id", F.lit(c).alias("color")))
        wj = F.broadcast(winners) if broadcast_decided else winners
        uncolored = K.materialize(uncolored.join(wj, "id", "left_anti"))
        uj = F.broadcast(uncolored) if broadcast_decided else uncolored
        und = K.materialize(
            und.join(uj.withColumnRenamed("id", "u"), "u", "left_semi")
            .join(uj.withColumnRenamed("id", "v"), "v", "left_semi")
        )
    coloring = K.materialize(reduce(DataFrame.unionByName, out_parts))
    stats.colors = c
    stats.wall_sec = time.time() - t0
    return coloring, stats
