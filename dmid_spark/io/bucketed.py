"""Bucketed table storage: co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of a repeated equi-join (edge table ⋈ vertex
state every superstep, fact ⋈ fact on a shared key) is re-shuffling the
big relation. Spark's table bucketing fixes the layout ONCE at write time:
``bucketBy(n, key)`` hash-clusters rows into n files per partition, and
every later join/groupBy keyed on the bucket columns reads that layout as
a satisfied HashClusteredDistribution — the exchange disappears from the
plan (asserted in tests/test_plans.py). This is the storage-side
complement of kernel.partition_edges' in-session repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket-sorted)
    parquet table in the session catalog. Both sides of a co-located join
    must use the SAME num_buckets and bucket columns."""
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the bucket layout rides along in the
    catalog metadata, so downstream keyed operations skip the exchange."""
    return spark.table(table)
