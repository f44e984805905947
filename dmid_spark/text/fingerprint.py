"""Document fingerprinting — winnowing over rolling n-gram hashes.

The standard training-data-pipeline fingerprint (Schleimer/Wilkerson/Aiken
winnowing): hash every word n-gram in document order, slide a window of
``w`` consecutive gram hashes, keep the minimum of each window, dedupe.
Shared fingerprints between documents indicate copied passages; the
fingerprint set is also a compact doc signature for containment queries.

Two hash modes:

- ``'xxhash64'`` (default): fastest, JVM-side 64-bit hash.
- ``'md5'``: the gram hash is the md5 hex string — bitwise-reproducible in
  any engine (the DuckDB oracle twin in __spark_entry__ uses this mode);
  ordering is lexicographic over hex, which is a valid total order for
  winnowing.

Everything is column expressions + one window function; no UDFs. At scale
the posexplode intermediate is (doc_id, pos, hash) — narrow; the window
partitions by doc_id so fingerprinting parallelizes per document with no
cross-document shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def document_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
    window: int = 4,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Winnowed fingerprints per document: ``(doc_id, fp)`` distinct.

    ``fp`` is long for hash_mode='xxhash64', md5-hex string for 'md5'.
    Documents with fewer than ``ngram`` tokens yield no fingerprints.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("toks"),
    )
    grams = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.slice("toks", 1, F.greatest(F.size("toks") - (ngram - 1), F.lit(0))),
                lambda _, i: F.concat_ws(" ", F.slice("toks", i + 1, ngram)),
            )
        ).alias("pos", "gram"),
    ).filter(F.col("gram") != "")
    if hash_mode == "md5":
        hashed = grams.select("doc_id", "pos", F.md5("gram").alias("h"))
    else:
        hashed = grams.select("doc_id", "pos", F.xxhash64("gram").alias("h"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    # windows are anchored at each pos; trailing short windows replicate the
    # final full window's suffix minima, removed by the distinct
    return (
        hashed.select("doc_id", F.min("h").over(w).alias("fp"))
        .distinct()
    )


def fingerprint_overlap_pairs(
    fps: DataFrame, min_shared: int = 2, max_doc_freq: int = 500
) -> DataFrame:
    """Candidate copied-passage pairs: documents sharing ≥ ``min_shared``
    fingerprints. Fingerprints present in more than ``max_doc_freq``
    documents (boilerplate) are excluded from pairing — capped, not silent:
    count them via ``fps.groupBy('fp').count().filter(...)`` if needed.
    Output: (doc_a, doc_b, shared_fps), doc_a < doc_b."""
    freq = fps.groupBy("fp").agg(F.count("*").alias("df"))
    rare = fps.join(freq.filter(F.col("df") <= max_doc_freq).select("fp"), "fp")
    a = rare.select("fp", F.col("doc_id").alias("doc_a"))
    b = rare.select("fp", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
