"""Z-order (Morton curve) data layout for multi-column range locality.

Not in the reference repo — part of the storage suite (with bucketed.py):
at 100 TB the dominant cost of a selective query is how many files its
predicate touches.  Sorting by one column clusters that column only;
interleaving the *rank bits* of k columns clusters all of them at once,
so a range predicate on any subset of the z-ordered columns prunes most
files via parquet min/max row-group stats — the same layout trick
Delta/Iceberg `OPTIMIZE ZORDER BY` applies.

The key is integer-only and rank-based (value-distribution free):

1. each column is ranked globally by ``kernel.distributed_rank`` — the
   range-partitioned zipWithIndex, never a single-partition window;
2. the 0-based rank is scaled to a ``2^bits`` bucket with exact integer
   division ``(rank << bits) div n``;
3. bucket bits are interleaved round-robin (column i owns bit positions
   ``b·k + i``).

Everything is int64 arithmetic → the key is deterministic at any
parallelism and bitwise-reproducible in the DuckDB oracle twin.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernel as K


def _interleave(bucket_cols: list[F.Column], bits: int) -> F.Column:
    """Morton-interleave ``bits`` low bits of each bucket column."""
    k = len(bucket_cols)
    terms = [
        F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * k + i)
        for b in range(bits)
        for i, c in enumerate(bucket_cols)
    ]
    return reduce(lambda x, y: x + y, terms)


def zorder_key(
    df: DataFrame,
    cols: list[str],
    id_col: str,
    bits: int = 16,
    out_col: str = "zkey",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a Morton key over the rank-space of ``cols``.

    ``id_col`` must be a unique key — it is the rank tie-break (ranking by
    ``(col, id_col)``), which is what makes the key total-ordered and
    engine-portable even when a layout column has duplicates.  ``bits``
    bits per column; k·bits ≤ 62 (int64).  Cost: one
    ``distributed_rank`` pass (range partition + sort + O(partitions)
    offset collect) per layout column, then one broadcast-free join chain
    on the unique id.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if len(cols) * bits > 62:
        raise ValueError(f"{len(cols)} cols × {bits} bits exceeds int64")
    n = df.count()
    if n == 0:
        return df.withColumn(out_col, F.lit(0).cast("long"))
    out = df
    bucket_names = []
    for i, c in enumerate(cols):
        ranked = K.distributed_rank(
            df.select(id_col, c), [c, id_col], out_col="_r", num_partitions=num_partitions
        ).select(
            F.col(id_col).alias("_zid"),
            F.expr(f"(_r * {1 << bits}) div {n}").alias(f"_b{i}"),
        )
        out = out.join(ranked, out[id_col] == ranked["_zid"]).drop("_zid")
        bucket_names.append(f"_b{i}")
    out = out.withColumn(
        out_col, _interleave([F.col(b) for b in bucket_names], bits).cast("long")
    )
    return out.drop(*bucket_names)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    id_col: str,
    bits: int = 16,
    num_files: int | None = None,
) -> None:
    """Write ``df`` as parquet laid out along the Morton curve of ``cols``:
    range-partition by the z-key (≈ equal-row files regardless of key
    skew), sort within partitions so parquet row-group min/max stats are
    tight, drop the key.  A later range scan on any z-ordered column then
    prunes most files/row-groups at the source."""
    keyed = zorder_key(df, cols, id_col, bits=bits)
    n = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        keyed.repartitionByRange(n, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
