"""Omega index — pair-counting agreement between two overlapping covers
(Collins & Dent 1988; the standard chance-corrected cover-agreement score
next to NMI/F1 in the OCD literature the reference's metric suite targets;
its Metrics/ package stops at modularity + NMI, see
ExtendedNormalizedMutualInformationMetric.java:18-158).

For covers A and B over the same node universe of N nodes (P = N·(N−1)/2
unordered pairs), let j_A(u,v) be the number of communities of A
containing BOTH u and v (0 for most pairs), and a_j = |{pairs: j_A = j}|
(b_j likewise for B). Then

    omega_u = (1/P)  · Σ_j |{pairs: j_A = j AND j_B = j}|   (observed)
    omega_e = (1/P²) · Σ_j a_j · b_j                        (expected)
    omega   = (omega_u − omega_e) / (1 − omega_e)

Determinism: every quantity up to the final step is an INTEGER — pair
counts, histogram products (decimal(38,0), exact to N ≈ 10⁹ nodes where
P² ≈ 2.5·10³⁵), and the closed forms

    omega = (agree·P − S) / (P² − S)      with S = Σ_j a_j·b_j

so Spark and any SQL oracle agree bit-for-bit after ONE double division —
no float accumulation order anywhere.

Scale: the only super-linear relation is each cover's co-membership pair
table, cardinality Σ_c C(|c|, 2) — the irreducible cost of an EXACT
pair-counting index (same bound as the NMI intersect path and the F1 pair
table; a giant community dominates it, which is a property of the metric,
not the plan). Zero-shared pairs are never enumerated: they are folded in
analytically via a_0 = P − Σ_{j≥1} a_j and the (P − |support(A)∪support(B)|)
agreement term, so the full-outer join touches only pairs co-membered in
at least one cover. Everything downstream of the pair tables is O(distinct
multiplicities) — a handful of rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _members(cover: DataFrame) -> DataFrame:
    return (
        cover.filter(F.col("degree") != 0)
        .select("node", "community")
        .distinct()
    )


def _pair_counts(members: DataFrame) -> DataFrame:
    """Co-membership multiplicities: (u, v, j) with u < v, j ≥ 1."""
    left = members.select(
        F.col("node").alias("u"), F.col("community").alias("community")
    )
    right = members.select(
        F.col("node").alias("v"), F.col("community").alias("community")
    )
    return (
        left.join(right, "community")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count("*").cast("long").alias("j"))
    )


def omega_index(
    cover_a: DataFrame, cover_b: DataFrame, nodes: DataFrame | None = None
) -> DataFrame:
    """One-row ``(n_nodes, n_pairs, agree_pairs, omega_u, omega_e, omega)``.

    ``cover_a`` / ``cover_b``: the engine's ``(node, community, degree)``
    nonzero-rows cover shape (absence = non-membership). ``nodes``: the
    pair universe (one ``node`` column, e.g. the graph's vertex table);
    defaults to the union of the two covers' member nodes. ``omega`` is
    NULL when P < 1 or the correction denominator P² − S is 0 (both
    covers are the same single multiplicity class — agreement is total
    and chance-correction is undefined).
    """
    ma, mb = _members(cover_a), _members(cover_b)
    if nodes is None:
        nodes = ma.select("node").unionByName(mb.select("node")).distinct()
    n_row = nodes.select("node").distinct().agg(
        F.count("*").cast("long").alias("n_nodes")
    )

    pa = _pair_counts(ma)
    pb = _pair_counts(mb)

    joined = (
        pa.select("u", "v", F.col("j").alias("ja"))
        .join(pb.select("u", "v", F.col("j").alias("jb")), ["u", "v"], "full_outer")
        .select(
            F.coalesce("ja", F.lit(0)).alias("ja"),
            F.coalesce("jb", F.lit(0)).alias("jb"),
        )
    )
    support = joined.agg(
        F.count("*").cast("long").alias("nz_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("ja") == F.col("jb"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("agree_nz"),
    )

    ha = pa.groupBy("j").agg(F.count("*").cast(_DEC).alias("aj"))
    hb = pb.groupBy("j").agg(F.count("*").cast(_DEC).alias("bj"))
    s_nz = (
        ha.join(hb, "j")
        .agg(
            F.coalesce(F.sum(F.col("aj") * F.col("bj")), F.lit(0).cast(_DEC))
            .cast(_DEC)
            .alias("s_nz")
        )
    )
    a_pos = pa.agg(F.count("*").cast("long").alias("a_pos"))
    b_pos = pb.agg(F.count("*").cast("long").alias("b_pos"))

    row = (
        n_row.crossJoin(support)
        .crossJoin(s_nz)
        .crossJoin(a_pos)
        .crossJoin(b_pos)
    )
    n = F.col("n_nodes").cast(_DEC)
    p = (n * (n - 1) / 2).cast(_DEC)
    a0 = p - F.col("a_pos").cast(_DEC)
    b0 = p - F.col("b_pos").cast(_DEC)
    s = (F.col("s_nz") + a0 * b0).cast(_DEC)
    agree = (
        F.col("agree_nz").cast(_DEC) + (p - F.col("nz_pairs").cast(_DEC))
    ).cast(_DEC)
    p2 = (p * p).cast(_DEC)
    return row.select(
        F.col("n_nodes"),
        p.cast("long").alias("n_pairs"),
        F.when(p > 0, agree.cast("long")).alias("agree_pairs"),
        F.when(p > 0, agree.cast("double") / p.cast("double")).alias("omega_u"),
        F.when(p > 0, s.cast("double") / p2.cast("double")).alias("omega_e"),
        F.when(
            (p > 0) & (p2 - s != 0),
            (agree * p - s).cast("double") / (p2 - s).cast("double"),
        ).alias("omega"),
    )
