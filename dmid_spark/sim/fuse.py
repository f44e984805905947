"""Rank fusion for hybrid retrieval (Cormack, Clarke & Büttcher,
SIGIR 2009 — Reciprocal Rank Fusion).

The engine has both lexical retrieval (text/search.py BM25) and vector
retrieval (sim/ann.py cosine / IVF / PQ); production search fuses them.
RRF is the standard fusion: ``score(d) = Σ_lists 1 / (k + rank_d)`` —
parameter-light, scale-free (only ranks matter, so BM25's unbounded
scores and cosine's [−1,1] never need calibration), and robust to a
document missing from some lists (absent list contributes 0).

Relational shape: union the rank lists (already tiny — top-k each),
one map-side-combined groupBy. Ranks must be deterministic on ties
upstream (the engine's retrieval ops quantize scores and tie-break on
id, the tfidf device); RRF itself is then exact integer arithmetic until
the final reciprocal sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    id_col: str = "id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked lists: ``(id, n_lists, rrf_score)`` with
    ``rrf_score = Σ over lists containing id of 1/(k + rank)`` (ranks
    1-based). ``k=60`` is the paper's default. Output order is up to the
    consumer (sort by rrf_score desc, id asc for a deterministic final
    ranking).

    Scale: inputs are top-k lists (bounded); one union + one groupBy.
    The per-list reciprocal is a single exact division; the cross-list
    sum is over ≤ len(rankings) terms.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    parts = [
        r.select(
            F.col(id_col).alias("id"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias(
                "_c"
            ),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("id").agg(
        F.count("*").cast("long").alias("n_lists"),
        F.sum("_c").alias("rrf_score"),
    )


def rank_by(
    df: DataFrame,
    score_col: str,
    id_col: str = "id",
    top_k: int | None = None,
    descending: bool = True,
    round_dp: int = 9,
) -> DataFrame:
    """Deterministic 1-based ranking of a scored relation: quantize the
    score to ``round_dp`` (engine-portable tie classes), order by
    (score, id asc), emit ``(id, rank)``. ``top_k`` truncates.

    The window is global by construction — rankings ARE global order —
    so this is for top-k-sized relations (retrieval shortlists); rank a
    full corpus with kernel.distributed_rank instead.
    """
    q = F.round(F.col(score_col), round_dp) + F.lit(0.0)
    order = [q.desc() if descending else q.asc(), F.col(id_col).asc()]
    w = Window.orderBy(*order)
    out = df.select(
        F.col(id_col).alias("id"), F.row_number().over(w).alias("rank")
    )
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out
