"""HyperBall: neighborhood function + effective diameter via HLL registers.

Boldi-Rosa-Vigna 2011 ("HyperANF / HyperBall"): every vertex keeps a
HyperLogLog sketch of its ball B(v,t) = {w : dist(v,w) <= t}; one round of
register-wise max-merge along the edges grows every ball by one hop, so t
rounds give the whole neighborhood function N(t) = sum_v |B(v,t)| — the
quantity behind effective-diameter and "degrees of separation" numbers on
web-scale link graphs where exact all-pairs BFS is impossible.

Spark-first formulation: the state is the *relational* register table
``(id, register, rho)`` (<= 2^p rows per vertex — never a per-vertex array
to mutate), one round is ``edges ⋈ state`` + ``groupBy(id, register).max``
— partial aggregation happens map-side, and the (id, register) key space is
2^p times finer than the vertex space, so hub skew is diluted by
construction. No Python in the loop.

Scale: per-round shuffle is O(min(deg, 2^p) * |E|) rows of 3 ints, and the
state never exceeds 2^p * V rows. Register construction and estimation
reuse sketch/hll.py; ``hash_mode='md5'`` makes the register table
bitwise-verifiable against a DuckDB twin (driver query x19_hyperball).
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G
from .. import kernel as K
from ..sketch.hll import hll_registers


def _alpha(p: int) -> float:
    m = 1 << p
    if p >= 7:
        return 0.7213 / (1 + 1.079 / m)
    return {4: 0.673, 5: 0.697, 6: 0.709}[p]


def _merge_round(e: DataFrame, state: DataFrame) -> DataFrame:
    """One max-merge round (split out so plan tests can inspect it before
    materialization): ball(src) absorbs ball(dst) — state rows keyed by dst
    re-emitted at src, register-wise max."""
    contrib = (
        e.join(state.withColumnRenamed("id", "_sid"), F.col("_sid") == F.col("dst"))
        .select(F.col("src").alias("id"), "register", "rho")
    )
    return (
        state.unionByName(contrib)
        .groupBy("id", "register")
        .agg(F.max("rho").alias("rho"))
    )


@dataclass
class HyperballStats:
    rounds: int = 0
    converged: bool = False
    # nf[t] = estimated sum_v |B(v,t)|, starting at t=0 (= |V|)
    nf: list[float] = field(default_factory=list)
    seconds: float = 0.0


def hyperball_estimates(registers: DataFrame, p: int) -> DataFrame:
    """Per-vertex cardinality estimates ``(id, est)`` from a register table
    — the standard HLL estimator with the linear-counting small-range
    switch, as pure column expressions (the per-vertex sum runs over
    <= 2^p rows)."""
    m = 1 << p
    agg = registers.groupBy("id").agg(
        F.count("*").alias("_cnt"), F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("_s")
    )
    zeros = F.lit(m) - F.col("_cnt")
    raw = F.lit(_alpha(p) * m * m) / (F.col("_s") + zeros)
    lc = F.lit(m) * F.log(F.lit(m) / zeros)
    return agg.select(
        "id",
        F.when((raw <= 2.5 * m) & (zeros > 0), lc).otherwise(raw).alias("est"),
    )


def hyperball(
    edges: DataFrame,
    radius: int,
    p: int = 6,
    hash_mode: str = "xxhash64",
    direction: str = "out",
    src_col: str = "src",
    dst_col: str = "dst",
    ckpt=None,
    resume: bool = False,
) -> tuple[DataFrame, HyperballStats]:
    """Run up to ``radius`` max-merge rounds; returns the final register
    table ``(id, register, rho)`` and stats with the neighborhood function.

    ``direction='out'`` grows balls along out-edges (B(v) = successors'
    balls ∪ {v}), ``'in'`` along in-edges, ``'both'`` symmetrizes. Stops
    early when the registers reach the transitive-closure fixpoint (the
    (row-count, rho-sum) pair is change-free — an exact integer test, no
    float tolerance).

    ``ckpt`` (a CheckpointManager) persists the register table each round;
    ``resume=True`` continues from the latest committed round. The state is
    all-integer, so a resumed run is bit-identical to an uninterrupted one
    by construction (no float reduction order to pin)."""
    if direction not in ("out", "in", "both"):
        raise ValueError(f"direction must be out/in/both, got {direction}")
    if radius < 0:
        raise ValueError(f"radius must be >= 0, got {radius}")
    t0 = time.time()
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if direction == "both":
        e = e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    elif direction == "in":
        e = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    # ball(src) absorbs ball(dst): state rows keyed by dst re-emitted at src
    verts = G.vertices(e)
    state = K.materialize(hll_registers(verts, key_col="id", group_cols=["id"], p=p,
                                        hash_mode=hash_mode))
    stats = HyperballStats()

    def _round_agg(s: DataFrame) -> tuple[int, int, float]:
        r = (
            hyperball_estimates(s, p)
            .join(s.groupBy("id").agg(F.count("*").alias("c"), F.sum("rho").alias("sr")), "id")
            .agg(F.sum("c").alias("rows"), F.sum("sr").alias("rhosum"), F.sum("est").alias("nf"))
            .collect()[0]
        )
        # empty graph: the ungrouped agg yields one all-null row
        return int(r["rows"] or 0), int(r["rhosum"] or 0), float(r["nf"] or 0.0)

    start_round = 0
    if resume and ckpt is not None:
        latest = ckpt.latest("hyperball")
        if latest is not None:
            it, saved, metrics = latest
            state = saved
            start_round = it
            stats.nf = list(metrics["nf"])
            stats.rounds = it
    rows, rhosum, nf0 = _round_agg(state)
    if not stats.nf:
        stats.nf.append(nf0)
    for t in range(start_round, radius):
        new_state = K.materialize(_merge_round(e, state))
        n_rows, n_rhosum, nf_t = _round_agg(new_state)
        if (n_rows, n_rhosum) == (rows, rhosum):
            stats.converged = True  # fixpoint: balls stopped growing
            new_state.unpersist()
            break
        state.unpersist()
        state, rows, rhosum = new_state, n_rows, n_rhosum
        stats.nf.append(nf_t)
        stats.rounds += 1
        if ckpt is not None:
            state = ckpt.save(
                state, "hyperball", t + 1,
                metrics={"nf": stats.nf, "rows": rows, "rhosum": rhosum},
            )
    stats.seconds = time.time() - t0
    return state, stats


def effective_diameter(nf: list[float], fraction: float = 0.9) -> float:
    """Interpolated effective diameter from a neighborhood function: the
    smallest (fractional) t where N(t) >= fraction * N(t_max)."""
    if not nf:
        raise ValueError("empty neighborhood function")
    if not 0 < fraction <= 1:
        raise ValueError(f"fraction must be in (0, 1], got {fraction}")
    target = fraction * nf[-1]
    for t, v in enumerate(nf):
        if v >= target:
            if t == 0 or math.isclose(nf[t], nf[t - 1]):
                return float(t)
            return t - 1 + (target - nf[t - 1]) / (nf[t] - nf[t - 1])
    return float(len(nf) - 1)


def hyperball_harmonic(
    edges: DataFrame,
    radius: int,
    p: int = 8,
    hash_mode: str = "xxhash64",
    src_col: str = "src",
    dst_col: str = "dst",
) -> tuple[DataFrame, HyperballStats]:
    """Harmonic centrality estimates for ALL vertices in ``radius`` rounds
    (Boldi-Vigna, "In-Core Computation of Geometric Centralities with
    HyperBall"): H(v) = Σ_t (|B_in(v,t)| − |B_in(v,t−1)|)/t, with ball
    sizes read off the HLL sketches — the web-scale alternative to the
    exact-but-sampled ``paths.harmonic_centrality`` (X14): every vertex
    gets a score, cost is O(radius) max-merge rounds instead of one BFS
    per sampled source. In-balls (who reaches v) match X14's Σ_s 1/d(s,v)
    convention. Returns ``(scores(id, harmonic), stats)``."""
    if radius < 1:
        raise ValueError(f"radius must be >= 1, got {radius}")
    e = edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    verts = G.vertices(e)
    t0 = time.time()
    stats = HyperballStats()
    state = K.materialize(
        hll_registers(verts, key_col="id", group_cols=["id"], p=p, hash_mode=hash_mode)
    )
    prev = hyperball_estimates(state, p).withColumnRenamed("est", "_prev")
    h = verts.select("id", F.lit(0.0).alias("harmonic"))
    rows = rhosum = None
    for t in range(1, radius + 1):
        state = K.materialize(_merge_round(e, state))
        chk = state.agg(F.count("*").alias("c"), F.sum("rho").alias("s")).collect()[0]
        if (int(chk["c"] or 0), int(chk["s"] or 0)) == (rows, rhosum):
            stats.converged = True
            break
        rows, rhosum = int(chk["c"] or 0), int(chk["s"] or 0)
        cur = hyperball_estimates(state, p)
        h = K.materialize(
            h.join(prev, "id").join(cur, "id").select(
                "id",
                (F.col("harmonic")
                 + F.greatest(F.col("est") - F.col("_prev"), F.lit(0.0)) / t
                 ).alias("harmonic"),
            )
        )
        prev = cur.withColumnRenamed("est", "_prev")
        stats.rounds += 1
    stats.seconds = time.time() - t0
    return h, stats
