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
NMI intersect path; never a community×community grid. Both directions and
the scalar average all derive from ONE pair table (materialized at the
fan-out, the engine's prepare_training_data convention) — the intersection
join never runs twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernel as K


def _members(cover: DataFrame) -> DataFrame:
    return (
        cover.filter(F.col("degree") != 0)
        .select("node", "community")
        .distinct()
    )


def _pair_f1(
    cover_a: DataFrame, cover_b: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(sizes_a(community, size), sizes_b(community, size), pairs(_ca, _cb,
    _f1)) — the intersecting community pairs with their exact F1."""
    ma, mb = _members(cover_a), _members(cover_b)
    sa = ma.groupBy("community").agg(F.count("*").alias("size"))
    sb = mb.groupBy("community").agg(F.count("*").alias("size"))
    inter = (
        ma.withColumnRenamed("community", "_ca")
        .join(mb.withColumnRenamed("community", "_cb"), "node")
        .groupBy("_ca", "_cb")
        .agg(F.count("*").alias("_i"))
    )
    pairs = (
        inter.join(sa.select(F.col("community").alias("_ca"), F.col("size").alias("_sa")), "_ca")
        .join(sb.select(F.col("community").alias("_cb"), F.col("size").alias("_sb")), "_cb")
        .select(
            "_ca",
            "_cb",
            (F.col("_i") * 2 / (F.col("_sa") + F.col("_sb"))).alias("_f1"),
        )
    )
    return sa, sb, pairs


def _best_side(
    pairs: DataFrame, sizes: DataFrame, own: str, other: str
) -> DataFrame:
    """Per-community-of-`own` best F1 over the pair table; communities with
    no pair get 0.0/NULL. Ties break to the smallest counterpart id."""
    best = pairs.groupBy(F.col(own).alias("community")).agg(
        F.max(F.struct(F.col("_f1"), (-F.col(other)).alias("_neg"))).alias("_best")
    )
    return sizes.join(best, "community", "left").select(
        "community",
        "size",
        F.coalesce(F.col("_best._f1"), F.lit(0.0)).alias("best_f1"),
        (-F.col("_best._neg")).alias("best_match"),
    )


def best_match_f1(cover_a: DataFrame, cover_b: DataFrame) -> DataFrame:
    """Per-community-of-A best F1 against B: ``(community, size, best_f1,
    best_match)``. Covers are the engine's ``(node, community, degree)``
    nonzero-rows shape. Communities of A intersecting nothing in B get
    ``best_f1 = 0.0`` and ``best_match`` NULL. Ties break to the smallest
    counterpart community id (deterministic across engines)."""
    sa, _, pairs = _pair_f1(cover_a, cover_b)
    return _best_side(pairs, sa, "_ca", "_cb")


def cover_f1(
    cover_a: DataFrame, cover_b: DataFrame, materialize: bool = True
) -> DataFrame:
    """Both directions in one pass: ``(direction 'ab'|'ba', community,
    size, best_f1, best_match)``. The intersection join runs ONCE — the
    pair table is materialized at the fan-out (opt out with
    ``materialize=False`` for plan inspection)."""
    sa, sb, pairs = _pair_f1(cover_a, cover_b)
    if materialize:
        pairs = K.materialize(pairs)
    ab = _best_side(pairs, sa, "_ca", "_cb").withColumn("direction", F.lit("ab"))
    ba = _best_side(pairs, sb, "_cb", "_ca").withColumn("direction", F.lit("ba"))
    return ab.unionByName(ba).select(
        "direction", "community", "size", "best_f1", "best_match"
    )


def avg_f1(cover_a: DataFrame, cover_b: DataFrame) -> float:
    """Symmetric average F1: (mean_a best_f1(a→B) + mean_b best_f1(b→A))/2.
    Two scalar aggregates over the single-pass both-direction table."""
    rows = (
        cover_f1(cover_a, cover_b)
        .groupBy("direction")
        .agg(F.avg("best_f1").alias("m"))
        .collect()
    )
    means = {r["direction"]: r["m"] for r in rows}
    if "ab" not in means or "ba" not in means:
        return 0.0
    return (float(means["ab"]) + float(means["ba"])) / 2.0
