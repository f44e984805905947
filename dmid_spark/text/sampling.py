"""Deterministic stratified sampling for dataset mixing.

Training-data pipelines over-/under-sample sources and languages to hit a
target mixture ("keep 30% of web English, all of the code subset"). At
100 TB the sample must be content-addressed and seeded — never `rand()` —
so reruns, retries, and different partitionings keep the SAME rows, and an
engine twin can reproduce the sample bit-for-bit (``hash_mode='md5'``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hash64

# rate resolution: keep iff hash(id:seed) mod RES < round(rate * RES)
SAMPLE_RES = 1_000_000


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    default_rate: float = 0.0,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Keep each row iff ``hash64(id:seed) mod 1e6 < round(rate[group]*1e6)``
    — a seeded coin per row, group-dependent rate, resolution 1e-6. Groups
    absent from ``rates`` use ``default_rate``. Pure column expressions
    (scan stage, no shuffle); deterministic at any parallelism."""
    for g, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thr = F.lit(round(default_rate * SAMPLE_RES))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group_col) == g, F.lit(round(r * SAMPLE_RES))).otherwise(thr)
    draw = F.pmod(
        _hash64(F.concat_ws(":", F.col(id_col), F.lit(str(seed))), hash_mode),
        F.lit(SAMPLE_RES),
    )
    return df.filter(draw < thr)


def group_sample(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Seeded uniform k-sample per group ("100 eval docs per source"):
    rank rows within each group by a content-addressed hash (id tiebreak)
    and keep the k smallest. Deterministic across reruns/partitionings and
    engine-portable in md5 mode. One window partitioned by group — the
    skew bound is the group size, same as any per-group top-k."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    h = _hash64(F.concat_ws(":", F.col(id_col), F.lit(str(seed))), hash_mode)
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
