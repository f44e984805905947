"""Best-match F1 between two covers (Yang & Leskovec, WSDM'13 §4.1).

The third standard community-quality yardstick next to the reference's
modularity/NMI pair (Metrics/ExtendedModularityMetric.java,
ExtendedNormalizedMutualInformationMetric.java): each community of cover A
is matched to its best-F1 counterpart in B, and the symmetric average of
the two per-side means scores the covers' agreement in [0, 1].

For communities a (size |a|) and b (size |b|) with intersection i:
precision = i/|b|, recall = i/|a|, so F1(a, b) = 2i / (|a| + |b|) — one
exact integer ratio, no float accumulation. Communities with no
intersecting counterpart score 0 (their best match is undefined/NULL).

Scale: the only pair-level relation is the node-hash join of the two
membership tables — cardinality Σ_node |memberships_A(node)|·|memberships_B
(node)| (the covers' co-membership intersections), the same bound as the
NMI intersect path; never a community×community grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _members(cover: DataFrame) -> DataFrame:
    return (
        cover.filter(F.col("degree") != 0)
        .select("node", "community")
        .distinct()
    )


def best_match_f1(cover_a: DataFrame, cover_b: DataFrame) -> DataFrame:
    """Per-community-of-A best F1 against B: ``(community, size, best_f1,
    best_match)``. Covers are the engine's ``(node, community, degree)``
    nonzero-rows shape. Communities of A intersecting nothing in B get
    ``best_f1 = 0.0`` and ``best_match`` NULL. Ties break to the smallest
    counterpart community id (deterministic across engines)."""
    ma, mb = _members(cover_a), _members(cover_b)
    sa = ma.groupBy("community").agg(F.count("*").alias("_sa"))
    sb = mb.groupBy("community").agg(F.count("*").alias("_sb"))
    inter = (
        ma.join(mb.withColumnRenamed("community", "_cb"), "node")
        .groupBy("community", "_cb")
        .agg(F.count("*").alias("_i"))
    )
    pair_f1 = (
        inter.join(sa, "community")
        .join(sb.withColumnRenamed("community", "_cb"), "_cb")
        .select(
            "community",
            "_cb",
            (F.col("_i") * 2 / (F.col("_sa") + F.col("_sb"))).alias("_f1"),
        )
    )
    best = pair_f1.groupBy("community").agg(
        F.max(F.struct(F.col("_f1"), (-F.col("_cb")).alias("_neg"))).alias("_best")
    )
    return (
        sa.join(best, "community", "left")
        .select(
            "community",
            F.col("_sa").alias("size"),
            F.coalesce(F.col("_best._f1"), F.lit(0.0)).alias("best_f1"),
            (-F.col("_best._neg")).alias("best_match"),
        )
    )


def avg_f1(cover_a: DataFrame, cover_b: DataFrame) -> float:
    """Symmetric average F1: (mean_a best_f1(a→B) + mean_b best_f1(b→A))/2.
    Two scalar aggregates over the O(communities) best-match tables."""
    f_ab = best_match_f1(cover_a, cover_b).agg(F.avg("best_f1")).first()[0]
    f_ba = best_match_f1(cover_b, cover_a).agg(F.avg("best_f1")).first()[0]
    if f_ab is None or f_ba is None:
        return 0.0
    return (float(f_ab) + float(f_ba)) / 2.0
