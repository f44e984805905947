"""Spearman degree correlation over edges (SURVEY.md §2.5 M4).

Reference (Main.java:885-909): per edge, rank outdeg(src)+rand against
indeg(dst)+rand (uniform jitter breaks ties, SEQUENTIAL ranking), then
Pearson over ranks. The jitter makes the reference non-deterministic; here
ties are broken deterministically (by src, dst order — the relational
equivalent of SEQUENTIAL ranking over a seeded shuffle) unless a
``jitter_seed`` is supplied, in which case seeded uniform jitter reproduces
the reference's distributional behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernel as K


def spearman_degree_correlation(
    edges: DataFrame, jitter_seed: int | None = None
) -> float:
    out_deg = edges.groupBy(F.col("src").alias("_s")).agg(F.count("*").alias("od"))
    in_deg = edges.groupBy(F.col("dst").alias("_d")).agg(F.count("*").alias("idg"))
    e = (
        edges.join(out_deg, edges.src == F.col("_s"))
        .join(in_deg, edges.dst == F.col("_d"))
        .select("src", "dst", F.col("od").cast("double").alias("x"), F.col("idg").cast("double").alias("y"))
    )
    if jitter_seed is not None:
        e = e.select(
            "src", "dst",
            (F.col("x") + F.rand(jitter_seed)).alias("x"),
            (F.col("y") + F.rand(jitter_seed + 1)).alias("y"),
        )
    # two distributed O(E) global ranks (no single-partition window sort);
    # (src, dst) is unique so both orders are total → deterministic ranks.
    ranked = K.distributed_rank(e, ["x", "src", "dst"], out_col="rx0")
    ranked = K.distributed_rank(ranked, ["y", "src", "dst"], out_col="ry0")
    ranked = ranked.select(
        (F.col("rx0") + 1).cast("double").alias("rx"),
        (F.col("ry0") + 1).cast("double").alias("ry"),
    )
    row = ranked.agg(F.corr("rx", "ry").alias("rho")).first()
    return float(row["rho"]) if row["rho"] is not None else 0.0
