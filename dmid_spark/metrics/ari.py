"""Adjusted Rand Index between two disjoint partitions.

The pair-counting agreement metric (Hubert & Arabie, J. Classification
'85) for *disjoint* labelings — the standard companion to the overlapping
metrics already in this package (NMI for covers: nmi.py, omega index:
omega.py — omega reduces to ARI exactly when both covers are partitions).
The reference evaluates DMID covers against ground truth with overlapping
NMI (SURVEY.md §2 M3); ARI is what its users reach for when both sides
are hard partitions (LPA, Louvain, connected components).

    ARI = (Σ_ij C(n_ij,2) − E) / (½[Σ_i C(a_i,2) + Σ_j C(b_j,2)] − E)
    with E = Σ_i C(a_i,2) · Σ_j C(b_j,2) / C(n,2)

over the contingency table n_ij = |cluster_i(A) ∩ cluster_j(B)|.

Scale: one inner join on id (broadcast-able when one labeling is small,
shuffle-hash otherwise), one (label_a, label_b) hash aggregate — the
contingency table, O(C_A·C_B) rows at most but in practice ~O(C) — and
two O(C) marginal aggregates derived from it (the input tables are never
re-scanned). All pair counts are exact BIGINT arithmetic (x·(x−1) DIV 2);
only the final ratio is floating point, quantized at 9 dp for
cross-engine hash stability. No global sort, no driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pairs(c):
    # C(c, 2) in exact integer arithmetic: c·(c−1) is always even, so the
    # shift is an exact halving — no float detour (C(1e9, 2) ≈ 5e17 would
    # already sit outside double's 2^53 integer range)
    return F.shiftright((c * (c - F.lit(1))).cast("long"), 1)


def adjusted_rand_index(
    a: DataFrame,
    b: DataFrame,
    label_a: str = "label",
    label_b: str = "label",
    round_dp: int | None = 9,
) -> DataFrame:
    """ARI between two disjoint labelings ``a(id, label)`` / ``b(id, label)``.

    Items are matched by inner join on ``id`` — ids present in only one
    labeling are excluded from the pair universe (document n in the output
    is the matched count). Returns ONE row:

        (n_items, pairs_joint, pairs_a, pairs_b, ari)

    where pairs_* are the exact pair counts entering the formula and
    ``ari`` ∈ [−1, 1] (1 = identical partitions, ≈0 = chance agreement).
    The degenerate case (both partitions all-singletons or one-cluster on
    both sides → max index equals expected index, denominator 0) returns
    ari = 1.0 per the usual convention.
    """
    av = a.select("id", F.col(label_a).alias("la"))
    bv = b.select("id", F.col(label_b).alias("lb"))
    cont = av.join(bv, "id").groupBy("la", "lb").agg(F.count("*").alias("c"))
    cont = cont.persist()

    joint = cont.agg(
        F.coalesce(F.sum(_pairs(F.col("c"))), F.lit(0)).cast("long").alias("pairs_joint"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_items"),
    )
    ma = (
        cont.groupBy("la").agg(F.sum("c").alias("c"))
        .agg(F.coalesce(F.sum(_pairs(F.col("c"))), F.lit(0)).cast("long").alias("pairs_a"))
    )
    mb = (
        cont.groupBy("lb").agg(F.sum("c").alias("c"))
        .agg(F.coalesce(F.sum(_pairs(F.col("c"))), F.lit(0)).cast("long").alias("pairs_b"))
    )

    row = joint.crossJoin(ma).crossJoin(mb)
    tot = _pairs(F.col("n_items").cast("long"))
    # the expected index is a ratio — go through doubles up front so the
    # pairs_a·pairs_b product cannot overflow int64 at web scale
    expected = F.when(
        tot > 0,
        F.col("pairs_a").cast("double") * F.col("pairs_b").cast("double")
        / tot.cast("double"),
    ).otherwise(F.lit(0.0))
    max_idx = (F.col("pairs_a") + F.col("pairs_b")) / F.lit(2.0)
    denom = max_idx - expected
    ari = F.when(denom != 0, (F.col("pairs_joint") - expected) / denom).otherwise(
        F.lit(1.0)
    )
    if round_dp is not None:
        ari = F.round(ari, round_dp) + F.lit(0.0)
    return row.select(
        "n_items", "pairs_joint", "pairs_a", "pairs_b", ari.alias("ari")
    )
