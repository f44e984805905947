"""Count-min sketch as a DataFrame aggregate.

A (depth × width) grid of counters summarizing a keyed count distribution:
``counter[d][w] = Σ count(key) for keys with hash_d(key) % width == w``.
Point estimate = min over the d rows — always ≥ the true count, with
overestimate ≤ e/width · N at probability 1 − e^-depth (Cormode &
Muthukrishnan 2005). MERGEABLE: two sketches of the same shape add
counter-wise, which is what a 100 TB pipeline ships between stages
instead of exact per-key counts.

Sketch construction is pure integer column expressions (per-depth seeded
hash → column index), so the driver query is bitwise-verifiable against
the DuckDB twin under ``hash_mode='md5'``; estimation error bounds are
tested in pytest against exact counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..text.dedup import _hash64


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Count-min sketch of row counts per key → ``(d, w, count)``, one row
    per non-empty counter (≤ depth·width rows total).

    Scale: the input is scanned once; ``posexplode`` fans each row out to
    its ``depth`` counters (a constant factor) and one partial-aggregating
    groupBy keyed (d, w) reduces to the fixed-size grid — counts combine
    map-side, so the shuffle is O(partitions · depth · width), independent
    of input size."""
    if depth < 1 or width < 1:
        raise ValueError(f"cms_build needs depth, width >= 1; got {depth}x{width}")
    cells = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(
                _hash64(
                    F.concat_ws(":", F.lit(d), F.lit(seed), F.col(key_col).cast("string")),
                    hash_mode,
                ),
                F.lit(width),
            ).cast("int").alias("w"),
        )
        for d in range(depth)
    ])
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.w").alias("w"))
        .agg(F.count("*").cast("long").alias("count"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two same-shape sketches: counter-wise sum."""
    return a.unionByName(b).groupBy("d", "w").agg(F.sum("count").alias("count"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Point estimates for a key relation → ``(key, estimate)``:
    min over the key's ``depth`` counters (0 for a counter never touched).
    The sketch (≤ depth·width rows) is broadcast; the key side streams."""
    cells = F.array(*[
        F.struct(
            F.lit(d).alias("d"),
            F.pmod(
                _hash64(
                    F.concat_ws(":", F.lit(d), F.lit(seed), F.col(key_col).cast("string")),
                    hash_mode,
                ),
                F.lit(width),
            ).cast("int").alias("w"),
        )
        for d in range(depth)
    ])
    probes = keys.select(
        F.col(key_col).alias("key"), F.posexplode(cells).alias("pos", "c")
    ).select("key", F.col("c.d").alias("d"), F.col("c.w").alias("w"))
    return (
        probes.join(F.broadcast(sketch), ["d", "w"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("count", F.lit(0).cast("long"))).alias("estimate"))
    )
