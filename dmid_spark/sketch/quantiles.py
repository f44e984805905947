"""Per-group quantiles: exact and sketch paths.

The exact path uses Spark's ``percentile`` (per-group sort inside the
aggregate — fine when any single group fits an executor); the sketch path
is ``approx_percentile`` (Greenwald-Khanna summary, the mergeable
bounded-memory choice for 100 TB groups). Both are one partial-aggregating
groupBy — the knob is accuracy vs group-size bound, not plan shape.

Exact linear-interpolated percentiles at h=(n-1)p match DuckDB's
``quantile_cont`` definition, so the exact path is oracle-verifiable
(rounded — the interpolation arithmetic is float).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    probs: list[float],
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """``(*group_cols, q_<p> ...)`` — one column per requested quantile.
    ``exact=False`` switches to the GK sketch with the given accuracy."""
    if not probs:
        raise ValueError("probs must be non-empty")
    for p in probs:
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probs must be in [0, 1], got {p}")
    cols = []
    for p in probs:
        name = f"q_{str(p).replace('.', '_')}"
        if exact:
            c = F.percentile(F.col(value_col), F.lit(p))
        else:
            c = F.percentile_approx(F.col(value_col), F.lit(p), F.lit(accuracy))
        cols.append(c.alias(name))
    return df.groupBy(*group_cols).agg(*cols)
