"""Overlapping NMI (LFK-style) — relational formulation.

Reference: Metrics/src/ocd/metrics/ExtendedNormalizedMutualInformationMetric
.java:18-158. ``NMI = 1 − ½·H(X|Y)norm − ½·H(Y|X)norm`` where each
community i of one cover takes the minimum conditional entropy against any
community j of the other, from a 2×2 membership contingency, subject to the
eligibility constraint h00+h11 ≥ h01+h10; ineligible/empty minima fall back
to 1 (the reference's POSITIVE_INFINITY → 1 path).

Relationally: shared-member counts are one node-join + groupBy (only
nonzero intersections materialize); the (i, j) grid comes from a cross join
of the two community-size tables — |C1|·|C2| rows of pure column arithmetic,
fine for any realistic community count (the node dimension, the big one,
never enters a cross product).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sizes(cover: DataFrame) -> DataFrame:
    return cover.groupBy("community").agg(F.countDistinct("node").alias("size"))


def _plogp(p):
    return F.when(p > 0, -p * F.log2(p)).otherwise(F.lit(0.0))


def _conditional_entropy(
    cover1: DataFrame, cover2: DataFrame, n: int
) -> float:
    """H(X|Y)norm: X = cover1 communities, Y = cover2 communities."""
    s1 = _sizes(cover1).select(F.col("community").alias("c1"), F.col("size").alias("n1"))
    s2 = _sizes(cover2).select(F.col("community").alias("c2"), F.col("size").alias("n2"))
    shared = (
        cover1.select("node", F.col("community").alias("c1"))
        .join(cover2.select("node", F.col("community").alias("c2")), "node")
        .groupBy("c1", "c2")
        .agg(F.countDistinct("node").alias("shared"))
    )
    grid = (
        s1.crossJoin(s2)
        .join(shared, ["c1", "c2"], "left")
        .fillna(0, subset=["shared"])
    )
    nn = float(n)
    joined = F.col("n1") + F.col("n2") - F.col("shared")
    p_y0 = (nn - F.col("n2")) / nn
    p_y1 = F.col("n2") / nn
    # explicit guards: a community covering all n nodes gives p_y0 = 0, and
    # ANSI mode (Spark 4 default) raises on division by zero; null here
    # flows through _plogp's otherwise(0.0), the reference's +inf→skip path
    p_x0_y0 = F.when(F.col("n2") < nn, (nn - joined) / nn / p_y0)
    p_x1_y0 = F.when(F.col("n2") < nn, (F.col("n1") - F.col("shared")) / nn / p_y0)
    p_x0_y1 = F.when(F.col("n2") > 0, (F.col("n2") - F.col("shared")) / nn / p_y1)
    p_x1_y1 = F.when(F.col("n2") > 0, F.col("shared") / nn / p_y1)
    h00, h10, h01, h11 = (_plogp(p) for p in (p_x0_y0, p_x1_y0, p_x0_y1, p_x1_y1))
    grid = grid.select(
        "c1",
        "n1",
        F.when(
            h00 + h11 >= h10 + h01,
            (h00 + h10) * p_y0 + (h01 + h11) * p_y1,
        ).alias("cond_ent"),  # null = ineligible (reference +inf)
    )
    per_c1 = grid.groupBy("c1", "n1").agg(F.min("cond_ent").alias("min_ent"))
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
