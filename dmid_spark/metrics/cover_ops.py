"""Cover (membership-matrix) relational operators — SURVEY.md §2.5 M5-M7.

Cover = ``(node, community, degree)`` with nonzero rows only; absence = 0
(matching DMIDVertexOutputFormat.java:53-59). Community labels are opaque
longs (the leader ids on the DMID side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import kernel as K


def community_sizes(cover: DataFrame) -> DataFrame:
    """Nonzero member count per community
    (Cover.java:222-228 / ExtendedNMI determineCommunitySizes)."""
    return (
        cover.filter(F.col("degree") != 0)
        .groupBy("community")
        .agg(F.countDistinct("node").alias("size"))
    )


def normalize_cover_rows(cover: DataFrame, verts: DataFrame) -> DataFrame:
    """L1-normalize each node's membership row; nodes with no memberships get
    a fresh singleton community (Cover.normalizeMembershipMatrix,
    Cover.java:156-199). Singleton community ids are allocated above the
    existing maximum, one per uncovered node (deterministic: ordered by node
    id)."""
    nz = cover.filter(F.col("degree") != 0)
    sums = nz.groupBy("node").agg(F.sum("degree").alias("row_sum"))
    normalized = nz.join(sums, "node").select(
        "node", "community", (F.col("degree") / F.col("row_sum")).alias("degree")
    )
    max_c = nz.agg(F.max("community")).first()[0]
    base = (max_c if max_c is not None else -1) + 1
    uncovered = verts.join(nz.select(F.col("node").alias("id")).distinct(), "id", "left_anti")
    singletons = K.distributed_rank(uncovered, ["id"], out_col="_r").select(
        F.col("id").alias("node"),
        (F.col("_r") + F.lit(base)).cast("long").alias("community"),
        F.lit(1.0).alias("degree"),
    )
    return normalized.unionByName(singletons)


def filter_cover_threshold(cover: DataFrame, threshold: float) -> DataFrame:
    """Zero out entries below min(row max, threshold); drop emptied
    communities (Cover.filterMembershipsbyThreshold, Cover.java:208-263).
    The row maximum always survives."""
    w = Window.partitionBy("node")
    kept = (
        cover.withColumn("row_max", F.max("degree").over(w))
        .filter(F.col("degree") >= F.least(F.col("row_max"), F.lit(threshold)))
        .drop("row_max")
    )
    return kept.filter(F.col("degree") != 0)
