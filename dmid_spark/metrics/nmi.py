"""Overlapping NMI (LFK-style) — relational formulation.

Reference: Metrics/src/ocd/metrics/ExtendedNormalizedMutualInformationMetric
.java:18-158. ``NMI = 1 − ½·H(X|Y)norm − ½·H(Y|X)norm`` where each
community i of one cover takes the minimum conditional entropy against any
community j of the other, from a 2×2 membership contingency, subject to the
eligibility constraint h00+h11 ≥ h01+h10; ineligible/empty minima fall back
to 1 (the reference's POSITIVE_INFINITY → 1 path).

Relationally — WITHOUT the reference's O(C1·C2) grid: shared-member counts
are one node-join + groupBy (only nonzero intersections materialize, and
only those pairs get the exact 2×2 arithmetic). For the zero-intersection
counterparts the conditional entropy depends only on the SIZES (n1, n2),
so their contribution to each community's minimum folds in from a
community-size histogram: a candidate row per (c1, distinct size n2) exists
whenever at least one community of size n2 does NOT intersect c1 (histogram
count > intersecting count). Total work is O(|shared| + C1·distinct_sizes)
— millions of communities never build a C×C grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sizes(cover: DataFrame) -> DataFrame:
    return cover.groupBy("community").agg(F.countDistinct("node").alias("size"))


def _plogp(p):
    return F.when(p > 0, -p * F.log2(p)).otherwise(F.lit(0.0))


def _cond_ent(n1: Column, n2: Column, shared: Column, nn: float) -> Column:
    """The eligible conditional entropy H(X_i|Y_j) from the 2×2 membership
    contingency of a community pair; NULL = ineligible (reference +inf)."""
    joined = n1 + n2 - shared
    p_y0 = (nn - n2) / nn
    p_y1 = n2 / nn
    # explicit guards: a community covering all n nodes gives p_y0 = 0, and
    # ANSI mode (Spark 4 default) raises on division by zero; null here
    # flows through _plogp's otherwise(0.0), the reference's +inf→skip path
    p_x0_y0 = F.when(n2 < nn, (nn - joined) / nn / p_y0)
    p_x1_y0 = F.when(n2 < nn, (n1 - shared) / nn / p_y0)
    p_x0_y1 = F.when(n2 > 0, (n2 - shared) / nn / p_y1)
    p_x1_y1 = F.when(n2 > 0, shared / nn / p_y1)
    h00, h10, h01, h11 = (_plogp(p) for p in (p_x0_y0, p_x1_y0, p_x0_y1, p_x1_y1))
    return F.when(
        h00 + h11 >= h10 + h01,
        (h00 + h10) * p_y0 + (h01 + h11) * p_y1,
    )


def _conditional_entropy(
    cover1: DataFrame, cover2: DataFrame, n: int
) -> float:
    """H(X|Y)norm: X = cover1 communities, Y = cover2 communities."""
    nn = float(n)
    s1 = _sizes(cover1).select(F.col("community").alias("c1"), F.col("size").alias("n1"))
    s2 = _sizes(cover2).select(F.col("community").alias("c2"), F.col("size").alias("n2"))
    shared = (
        cover1.select("node", F.col("community").alias("c1"))
        .join(cover2.select("node", F.col("community").alias("c2")), "node")
        .groupBy("c1", "c2")
        .agg(F.countDistinct("node").alias("shared"))
    )
    # exact branch: only the intersecting pairs (the `shared` table IS that set)
    exact = (
        shared.join(s1, "c1")
        .join(s2, "c2")
        .select(
            "c1",
            _cond_ent(
                F.col("n1"), F.col("n2"), F.col("shared").cast("double"), nn
            ).alias("cond_ent"),
        )
    )
    # zero-intersection branch, factorized: candidate (c1, n2) whenever the
    # number of size-n2 communities exceeds the number that intersect c1 —
    # i.e. at least one non-intersecting counterpart of that size exists
    hist = s2.groupBy("n2").agg(F.count("*").alias("h_cnt"))
    inter_sizes = (
        shared.join(s2, "c2").groupBy("c1", "n2").agg(F.count("*").alias("i_cnt"))
    )
    zero = (
        s1.crossJoin(F.broadcast(hist))
        .join(inter_sizes, ["c1", "n2"], "left")
        .filter(F.col("h_cnt") > F.coalesce(F.col("i_cnt"), F.lit(0)))
        .select(
            "c1",
            _cond_ent(F.col("n1"), F.col("n2"), F.lit(0.0), nn).alias("cond_ent"),
        )
    )
    per_c1 = (
        s1.join(
            exact.unionByName(zero).groupBy("c1").agg(F.min("cond_ent").alias("min_ent")),
            "c1",
            "left",
        )
    )
    p0 = (F.lit(nn) - F.col("n1")) / nn
    p1 = F.col("n1") / nn
    comm_ent = _plogp(p0) + _plogp(p1)
    per_c1 = per_c1.select(
        F.when(F.col("min_ent").isNull(), F.lit(1.0))
        .when(comm_ent > 0, F.col("min_ent") / comm_ent)
        .otherwise(F.lit(1.0))
        .alias("norm_ent")
    )
    row = per_c1.agg(F.avg("norm_ent").alias("h")).first()
    return float(row["h"]) if row["h"] is not None else 1.0


def overlapping_nmi(cover1: DataFrame, cover2: DataFrame, n: int) -> float:
    """NMI between two covers ``(node, community, degree)`` over a graph of
    ``n`` vertices. Only membership presence matters (degree ≠ 0), matching
    the reference's nonzero-entry counting."""
    c1 = cover1.filter(F.col("degree") != 0) if "degree" in cover1.columns else cover1
    c2 = cover2.filter(F.col("degree") != 0) if "degree" in cover2.columns else cover2
    return (
        1.0
        - 0.5 * _conditional_entropy(c1, c2, n)
        - 0.5 * _conditional_entropy(c2, c1, n)
    )
