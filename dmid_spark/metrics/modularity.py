"""Extended (overlapping) modularity metrics — algebraically factorized.

The reference computes both variants with an O(N²·C) nested pair loop
(Metrics/src/ocd/metrics/ExtendedModularityMetric.java:25-35,
ExtendedModularityMetricNPNB08.java:21-31) — its own progress logging shows
this is the practical bottleneck. Both formulas factorize into per-community
aggregates + one edge join, making them O(|E|·C̄ + |cover|) with no pair
enumeration (SURVEY.md §2.5 M1/M2); the tests validate the factorized values
against a brute-force transliteration of the reference loops.

Cover representation: ``cover(node, community, degree)`` with nonzero rows
only (degree = belonging factor b(node, c), Cover.java:144 — raw matrix
entries, no implicit normalization). Degrees are unweighted edge counts
(Main.java:773-775).

Shen-style variant (ExtendedModularityMetric.java), over pairs B ≤ A:

    Q = (1/m) Σ_c [ E_c − ‖b_c‖₁² · S_out(c) · S_in(c) / (N²·m) ]

with E_c = Σ_{(u,v)∈E} b(u,c)·b(v,c), S_out(c) = Σ_A b(A,c)·outdeg(A),
S_in(c) = Σ_A b(A,c)·indeg(A), ‖b_c‖₁ = Σ_A b(A,c). (The diagonal A=B term
of the pair loop exactly cancels the ordered-pair double-count correction —
derivation in the test oracle.)

NPNB08 variant (all ordered pairs):

    Q = (1/2m) · [ E − Σ_c S_in(c)² / (2m) ]
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import graph as G


def _edge_term(edges: DataFrame, cover: DataFrame) -> DataFrame:
    """Σ_{(u,v)∈E} b(u,c)·b(v,c) per community: the only join the metric
    needs — edges ⋈ cover(src) ⋈ cover(dst) on the community key."""
    cu = cover.select(F.col("node").alias("_u"), "community", F.col("degree").alias("b_u"))
    cv = cover.select(F.col("node").alias("_v"), F.col("community").alias("_c2"), F.col("degree").alias("b_v"))
    return (
        edges.join(cu, edges.src == F.col("_u"))
        .join(cv, (edges.dst == F.col("_v")) & (F.col("community") == F.col("_c2")))
        .groupBy("community")
        .agg(F.sum(F.col("b_u") * F.col("b_v")).alias("e_c"))
    )


def _degree_sums(edges: DataFrame, cover: DataFrame) -> DataFrame:
    """Per-community S_out, S_in, ‖b‖₁ — three aggregates, no pairs."""
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("od"))
    in_deg = edges.groupBy(F.col("dst").alias("node")).agg(F.count("*").alias("idg"))
    c = (
        cover.join(out_deg, "node", "left")
        .join(in_deg, "node", "left")
        .fillna(0, subset=["od", "idg"])
    )
    return c.groupBy("community").agg(
        F.sum(F.col("degree") * F.col("od")).alias("s_out"),
        F.sum(F.col("degree") * F.col("idg")).alias("s_in"),
        F.sum("degree").alias("norm1"),
    )


def extended_modularity(edges: DataFrame, cover: DataFrame) -> float:
    """Shen-style extended modularity (ExtendedModularityMetric.java:18-108),
    factorized. Requires a simple directed graph without self-loops (the
    reference graph reader never creates them)."""
    n = G.num_vertices(edges)
    m = edges.count()
    if m == 0:
        return 0.0
    terms = _edge_term(edges, cover).join(_degree_sums(edges, cover), "community", "full")
    row = terms.select(
        F.sum(
            F.coalesce("e_c", F.lit(0.0))
            - F.coalesce(F.col("norm1") ** 2 * F.col("s_out") * F.col("s_in"), F.lit(0.0))
            / F.lit(float(n * n * m))
        ).alias("q")
    ).first()
    return float(row["q"] or 0.0) / m


def extended_modularity_npnb08(edges: DataFrame, cover: DataFrame) -> float:
    """NPNB08 extended modularity (ExtendedModularityMetricNPNB08.java:14-69),
    factorized: Q = (E − Σ_c S_in(c)²/(2m)) / (2m)."""
    m = edges.count()
    if m == 0:
        return 0.0
    e = _edge_term(edges, cover).agg(F.sum("e_c")).first()[0] or 0.0
    s = (
        _degree_sums(edges, cover)
        .agg(F.sum(F.col("s_in") ** 2).alias("s"))
        .first()["s"]
        or 0.0
    )
    return (float(e) - float(s) / (2 * m)) / (2 * m)
