"""Deterministic synthetic graph generation at cluster scale.

R-MAT (Chakrabarti, Zhan & Faloutsos, SDM 2004) — the recursive-matrix
generator behind Graph500 — produces power-law, community-structured
graphs from four quadrant probabilities (a, b, c, d). An engine that
claims 100 TB readiness needs a way to MAKE 100 TB of realistic graph
without moving data: generation here is embarrassingly parallel
(``spark.range(n_edges)`` + pure column expressions — one narrow stage,
zero shuffles until the optional dedup), and every bit choice is a
content-addressed hash draw, so the output is BIT-IDENTICAL at any
parallelism and any executor count, and resumable generation (ranges of
edge indices) is trivial.

Quadrant probabilities are integer MILLIONTHS compared against an
integer hash residue — no float thresholds anywhere, which makes the
generator replayable bit-for-bit by any engine (the DuckDB twin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..text.dedup import _hash64

PPM = 1_000_000


def rmat_edges(
    spark: SparkSession,
    scale: int = 10,
    n_edges: int = 10_000,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    drop_self_loops: bool = False,
    collapse_duplicates: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """``n_edges`` R-MAT edge draws over ``2^scale`` vertices:
    ``(src, dst, weight=1.0)`` (or multiplicity-summed weights with
    ``collapse_duplicates``). d = 1 − a − b − c. Defaults are the
    Graph500 parameters (a=0.57, b=c=0.19, d=0.05).

    Per edge index i and recursion level l, one hash draw
    ``h = H(seed:i:l) mod 10^6`` picks the quadrant by integer millionth
    thresholds: quadrant 0 (a) keeps both high bits 0, 1 (b) sets the dst
    bit, 2 (c) the src bit, 3 (d) both — bits accumulate MSB-first over
    ``scale`` levels. Self-loops and duplicate draws are part of R-MAT's
    definition; the flags post-process them relationally.

    Scale: one ``spark.range`` scan with ``scale`` hash expressions per
    row — no shuffle, no state; ``collapse_duplicates`` adds the single
    groupBy. 10^12 edges = the same plan with a bigger range.
    """
    if scale < 1 or scale > 62:
        raise ValueError(f"scale must be in [1, 62], got {scale}")
    if n_edges < 0:
        raise ValueError(f"n_edges must be >= 0, got {n_edges}")
    a_ppm = int(round(a * PPM))
    b_ppm = int(round(b * PPM))
    c_ppm = int(round(c * PPM))
    if min(a_ppm, b_ppm, c_ppm) < 0 or a_ppm + b_ppm + c_ppm > PPM:
        raise ValueError("quadrant probabilities must be >= 0 and sum to <= 1")
    df = spark.range(0, n_edges, 1, num_partitions or spark.sparkContext.defaultParallelism)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    for level in range(scale):
        h = F.pmod(
            _hash64(
                F.concat_ws(":", F.lit("rmat"), F.lit(seed), F.col("id"), F.lit(level)),
                hash_mode,
            ),
            F.lit(PPM),
        )
        quad = (
            F.when(h < a_ppm, F.lit(0))
            .when(h < a_ppm + b_ppm, F.lit(1))
            .when(h < a_ppm + b_ppm + c_ppm, F.lit(2))
            .otherwise(F.lit(3))
        )
        # MSB-first: level 0 decides the top bit
        bit = F.lit(1 << (scale - 1 - level)).cast("long")
        src = src + F.when(quad >= 2, bit).otherwise(F.lit(0).cast("long"))
        dst = dst + F.when(quad % 2 == 1, bit).otherwise(F.lit(0).cast("long"))
    out = df.select(src.alias("src"), dst.alias("dst"))
    if drop_self_loops:
        out = out.filter(F.col("src") != F.col("dst"))
    if collapse_duplicates:
        return out.groupBy("src", "dst").agg(
            F.count("*").cast("double").alias("weight")
        )
    return out.select("src", "dst", F.lit(1.0).alias("weight"))
