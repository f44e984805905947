"""Community conductance / edge-cut metrics over an edge table + cover.

A standard community-quality measure the reference's metric suite lacks
(its Metrics/ package stops at modularity/NMI — ExtendedModularityMetric
.java, ExtendedNormalizedMutualInformationMetric.java); conductance is the
quantity DMID's leader-follower covers are usually *judged* by in the OCD
literature, and the sweep-cut local-clustering op builds on the same
definitions, so it lives here as a first-class metric.

Graph convention (matching the engine's edge tables): each ``(src, dst,
weight)`` row is ONE undirected weighted edge; parallel rows are parallel
edges; a self-loop row contributes 2·w to its endpoint's degree and never
to any cut. ``(src, dst)`` must be unique per edge (the engine's builders
group to that shape).

For a vertex set C (one community of a possibly-overlapping cover):

    internal(C) = Σ w over edges with BOTH endpoints in C
    cut(C)      = Σ w over edges with EXACTLY ONE endpoint in C
    vol(C)      = 2·internal(C) + cut(C)
    φ(C)        = cut(C) / min(vol(C), vol(G) − vol(C))   (NULL when min=0)

Scale: two hash joins of the edge table against the O(|cover|) membership
relation (shuffle on node), one per-(community, edge) count, two
aggregates — no pair enumeration, no crossJoin; cardinality is
Σ_c (edges touching c), the same bound as the factorized modularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def community_conductance(edges: DataFrame, cover: DataFrame) -> DataFrame:
    """Per-community ``(community, n_nodes, internal_w, cut_w, volume,
    conductance)`` for every community with ≥1 nonzero-degree member.

    ``edges``: (src, dst, weight) — see module docstring for conventions.
    ``cover``: (node, community, degree) nonzero-rows cover (the engine's
    standard shape; absence = non-membership).

    Weights sum exactly when integral (the engine's co-occurrence tables
    are counts), making φ a ratio of exact doubles — deterministic across
    engines with no quantization needed.
    """
    m = (
        cover.filter(F.col("degree") != 0)
        .select("node", "community")
        .distinct()
    )
    e = edges.select(
        "src", "dst", F.col("weight").cast("double").alias("weight")
    )
    sm = e.join(m.withColumnRenamed("node", "src"), "src").select(
        "community", "src", "dst", "weight"
    )
    dm = e.join(m.withColumnRenamed("node", "dst"), "dst").select(
        "community", "src", "dst", "weight"
    )
    # k = how many endpoints of this edge lie in this community (1 or 2);
    # a self-loop appears once in sm and once in dm → k=2 → internal.
    per_edge = (
        sm.unionByName(dm)
        .groupBy("community", "src", "dst")
        .agg(F.count("*").alias("k"), F.first("weight").alias("w"))
    )
    agg = per_edge.groupBy("community").agg(
        F.coalesce(F.sum(F.when(F.col("k") == 2, F.col("w"))), F.lit(0.0)).alias(
            "internal_w"
        ),
        F.coalesce(F.sum(F.when(F.col("k") == 1, F.col("w"))), F.lit(0.0)).alias(
            "cut_w"
        ),
    )
    sizes = m.groupBy("community").agg(F.countDistinct("node").alias("n_nodes"))
    total_row = e.agg(F.sum("weight").alias("s")).select(
        (F.col("s") * 2).alias("total_vol")
    )
    vol = F.col("internal_w") * 2 + F.col("cut_w")
    denom = F.least(vol, F.col("total_vol") - vol)
    return (
        sizes.join(agg, "community")
        .join(F.broadcast(total_row))
        .select(
            "community",
            "n_nodes",
            "internal_w",
            "cut_w",
            vol.alias("volume"),
            F.when(denom > 0, F.col("cut_w") / denom).alias("conductance"),
        )
    )
