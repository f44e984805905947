"""Exact set-similarity self-join with prefix filtering (AllPairs /
PPJoin family: Bayardo et al. WWW'07, Xiao et al. WWW'08) over word
n-gram shingle sets.

The exact counterpart to MinHash-LSH (text/dedup.py): LSH finds
*probable* near-duplicate pairs with tunable recall; this finds EVERY
pair with Jaccard ≥ t and nothing else, with no all-pairs join — the
prefix-filter theorem guarantees any two sets with J ≥ t share at least
one shingle inside their (|x| − ⌈t·|x|⌉ + 1)-element prefixes under a
shared global shingle order. Ordering shingles rarest-first keeps prefix
buckets small (a stop-shingle lands in a prefix only for documents made
almost entirely of stop shingles).

Relational shape: shingle scan → document-frequency groupBy → per-doc
prefix under the (df, sh) total order (doc-partitioned window, bounded
by document length — no global rank is ever materialized: the theorem
only needs a SHARED total order, and (df, sh) is one) → prefix-bucket
equi-join on the shingle for candidates (length-filtered) →
candidate-driven intersection count → one exact integer Jaccard test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .. import kernel as K
from .dedup import _shingles


def _prefix_table(
    docs: DataFrame, t: float, n: int, id_col: str, text_col: str, hash_mode: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Shared prefix-filter scaffolding: returns ``(g, sizes, prefix)``
    where ``g`` is the MATERIALIZED distinct shingle table, ``sizes`` the
    per-doc set sizes, and ``prefix`` each doc's ``|x| − ⌈t|x|⌉ + 1``
    rarest shingles under the (df, sh) total order with columns
    ``(doc_id, sh, sz, df)``. The shared total order is (df, sh) itself —
    no global rank column exists, so there is no range exchange anywhere;
    the per-doc window is doc-partitioned and bounded by doc length."""
    g = K.materialize(_shingles(docs, text_col, id_col, n, hash_mode))
    sizes = g.groupBy("doc_id").agg(F.count("*").alias("sz"))
    freq = g.groupBy("sh").agg(F.count("*").alias("df"))
    ranked = g.join(freq, "sh").join(sizes, "doc_id")
    wdoc = Window.partitionBy("doc_id").orderBy("df", "sh")
    prefix = ranked.withColumn("_p", F.row_number().over(wdoc)).filter(
        F.col("_p") <= F.col("sz") - F.ceil(F.lit(t) * F.col("sz")) + 1
    ).select("doc_id", "sh", "sz", "df")
    return g, sizes, prefix


def similarity_join(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
    max_prefix_bucket: int | None = None,
) -> DataFrame:
    """All pairs of documents with shingle-set Jaccard ≥ ``threshold``,
    exactly: ``(doc_a, doc_b, sz_a, sz_b, inter, jaccard)`` with
    ``doc_a < doc_b``, set sizes, exact intersection count and the single
    IEEE division ``inter / (sz_a + sz_b − inter)``.

    ``threshold`` should be a binary-exact double (0.5, 0.75, 0.625 …)
    when engine-portable boundary behavior matters: the ≥-test is an
    exact integer comparison ``inter ≥ t·(union)`` evaluated identically
    on any engine only when t has an exact representation.

    ``max_prefix_bucket`` (None = exact) drops prefix buckets larger than
    the cap from candidate generation — the boilerplate escape hatch
    shared with LSH's ``max_bucket``; capping trades the exactness
    guarantee for bounded fan-out and is reported by the companion
    :func:`prefix_bucket_report`.

    Scale: candidate volume is Σ over shared *prefix* shingles of the
    bucket pair count (rarest-first order keeps buckets near-singleton on
    natural corpora); verification volume is Σ_candidates |a| — both
    linear in real corpora, never |docs|². The per-doc prefix window is
    partitioned by doc_id and bounded by document length.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)
    g, _sizes, prefix = _prefix_table(docs, t, n, id_col, text_col, hash_mode)
    prefix = K.materialize(prefix.select("doc_id", "sh", "sz"))
    if max_prefix_bucket is not None:
        bsz = prefix.groupBy("sh").agg(F.count("*").alias("_bsz"))
        prefix = prefix.join(
            bsz.filter(F.col("_bsz") <= max_prefix_bucket).select("sh"), "sh"
        )
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"), "sh", F.col("sz").alias("sz_a")
    )
    pb = prefix.select(
        F.col("doc_id").alias("doc_b"), "sh", F.col("sz").alias("sz_b")
    )
    cand = (
        pa.join(pb, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        # length filter: J(a,b) ≤ min/max of the sizes
        .filter(
            F.least("sz_a", "sz_b")
            >= F.lit(t) * F.greatest("sz_a", "sz_b")
        )
        .select("doc_a", "doc_b", "sz_a", "sz_b")
        .distinct()
    )
    ga = g.select(F.col("doc_id").alias("doc_a"), "sh")
    gb = g.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cand.join(ga, "doc_a")
        .join(gb, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
    )
    return inter.filter(
        F.col("inter")
        >= F.lit(t) * (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    ).select(
        "doc_a",
        "doc_b",
        "sz_a",
        "sz_b",
        "inter",
        (
            F.col("inter")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
        ).alias("jaccard"),
    )


def containment_join(
    docs: DataFrame,
    threshold: float = 0.75,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
    max_gram_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-subset detection: every ordered pair with
    containment ``|A∩B| / |A| ≥ threshold`` (A ≠ B), exactly —
    ``(doc_a, doc_b, sz_a, sz_b, inter, containment)`` where ``doc_a`` is
    the (nearly) contained document. This is what Jaccard dedup
    structurally misses: a quoted page inside a much larger page has high
    containment but low Jaccard (the union is dominated by B).

    Prefix theorem, containment form: if B misses ALL of A's
    ``|A| − ⌈t·|A|⌉ + 1`` rarest shingles, then ``|A∩B| ≤ ⌈t|A|⌉ − 1 <
    t·|A|`` — so candidates are A-prefix shingles joined against the FULL
    shingle table, plus the size filter ``|B| ≥ t·|A|`` (the intersection
    cannot exceed |B|). Only A needs a prefix; B has no upper length
    bound by design.

    The B side of the candidate join is the whole gram table, so a
    boilerplate shingle with document frequency f pairs f ways —
    ``max_gram_df`` (None = exact) excludes shingles above the cap from
    candidate generation, trading the exactness guarantee for bounded
    fan-out (rarest-first prefixes make this rarely needed; audit with
    :func:`prefix_bucket_report`'s df histogram companion).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    t = float(threshold)
    g, sizes, prefix = _prefix_table(docs, t, n, id_col, text_col, hash_mode)
    if max_gram_df is not None:
        prefix = prefix.filter(F.col("df") <= max_gram_df)
    pa = prefix.select(
        F.col("doc_id").alias("doc_a"), "sh", F.col("sz").alias("sz_a")
    )
    gb = g.join(sizes, "doc_id").select(
        F.col("doc_id").alias("doc_b"), "sh", F.col("sz").alias("sz_b")
    )
    cand = (
        pa.join(gb, "sh")
        .filter(F.col("doc_a") != F.col("doc_b"))
        .filter(F.col("sz_b") >= F.lit(t) * F.col("sz_a"))
        .select("doc_a", "doc_b", "sz_a", "sz_b")
        .distinct()
    )
    ga = g.select(F.col("doc_id").alias("doc_a"), "sh")
    gb2 = g.select(F.col("doc_id").alias("doc_b"), "sh")
    inter = (
        cand.join(ga, "doc_a")
        .join(gb2, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
    )
    return inter.filter(
        F.col("inter") >= F.lit(t) * F.col("sz_a")
    ).select(
        "doc_a",
        "doc_b",
        "sz_a",
        "sz_b",
        "inter",
        (F.col("inter") / F.col("sz_a")).alias("containment"),
    )


def prefix_bucket_report(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Prefix-bucket size histogram ``(bucket_size, n_buckets)`` for the
    :func:`similarity_join` operating point — the audit view for choosing
    ``max_prefix_bucket`` (what would be dropped at each cap)."""
    t = float(threshold)
    _g, _sizes, prefix = _prefix_table(docs, t, n, id_col, text_col, hash_mode)
    return (
        prefix.groupBy("sh")
        .agg(F.count("*").alias("bucket_size"))
        .groupBy("bucket_size")
        .agg(F.count("*").alias("n_buckets"))
    )
