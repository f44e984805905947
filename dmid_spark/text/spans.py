"""Exact-substring duplicate-span detection (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022 — the ExactSubstr
device, here on token n-grams; RefinedWeb/FineWeb apply the same shape).

Document-level dedup (text/dedup.py) drops whole near-identical documents;
this module finds the *partial* overlaps those miss — boilerplate headers,
license blocks, quoted passages — as maximal token spans whose every
length-``n`` gram also occurs in other documents, and can cut them out
while keeping the unique remainder of the page.

Relational shape (never pairwise): one tokenize+gram scan of the corpus →
a gram-frequency groupBy → a semi-join back → a per-document interval
merge (window partitioned by doc, never global). All JVM column
expressions; gram identity optionally xxhash64-folded for the 100 TB path
so the shuffle carries 8-byte keys instead of n-token strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gram_rows(
    docs: DataFrame, n: int, id_col: str, text_col: str, hash_grams: bool
) -> DataFrame:
    """(doc_id, pos, gram) for every 0-based token position ``pos`` whose
    n-token gram starts there. Tokenization: whitespace split of the
    lowered, trimmed text (the minhash shingle convention). Documents with
    fewer than ``n`` tokens yield no rows."""
    t = F.col(text_col)
    toks = F.split(F.lower(F.trim(t)), r"\s+")
    base = (
        docs.filter(t.isNotNull() & (F.trim(t) != ""))
        .select(F.col(id_col).alias("doc_id"), toks.alias("ts"))
        .filter(F.size("ts") >= n)
    )
    out = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("ts") - n),
                lambda i: F.concat_ws(" ", F.slice("ts", i + 1, n)),
            )
        ).alias("pos", "gram"),
    )
    if hash_grams:
        out = out.select("doc_id", "pos", F.xxhash64("gram").alias("gram"))
    return out


def duplicate_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """Maximal duplicated token spans per document.

    A 0-based token position ``p`` of a document is *marked* when the
    n-token gram starting at ``p`` occurs in at least ``min_docs`` distinct
    documents (itself included). Marked positions cover token ranges
    ``[p, p+n-1]``; overlapping or adjacent covered ranges merge into
    maximal spans. Returns
    ``(doc_id, span_start, span_end, n_grams)`` with inclusive token-index
    bounds and the count of marked gram starts inside the span.

    ``hash_grams=True`` folds each gram to its xxhash64 before the
    frequency groupBy — the 100 TB operating point (8-byte shuffle keys; a
    collision can only over-mark, never miss a true duplicate).

    Scale: tokenize+gram scan → map-side-combined gram groupBy (linear,
    no pair enumeration anywhere) → semi-join of marked positions → a
    per-document window for the interval merge. The window is partitioned
    by doc_id and bounded by document length — never global.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    grams = _gram_rows(docs, n, id_col, text_col, hash_grams)
    dup = (
        grams.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("gram")
    )
    hits = grams.join(dup, "gram").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_max = F.max("pos").over(w.rowsBetween(Window.unboundedPreceding, -1))
    # ranges [p, p+n-1] overlap-or-touch while pos <= prev_max + n: a new
    # span starts only past that (adjacent covered ranges DO merge)
    brk = F.when(prev_max.isNull() | (F.col("pos") > prev_max + n), 1).otherwise(0)
    flagged = hits.withColumn("brk", brk).withColumn(
        "span_id", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return flagged.groupBy("doc_id", "span_id").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + (n - 1)).alias("span_end"),
        F.count("*").alias("n_grams"),
    ).select("doc_id", "span_start", "span_end", "n_grams")


def remove_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cut ``duplicate_ngram_spans`` output out of the corpus: returns
    ``(doc_id, clean_text, n_tokens_removed)`` where ``clean_text`` is the
    document re-joined (single spaces, lowered — the same normalization the
    span indices were computed against) from the tokens whose 0-based index
    falls in no span. Documents without spans pass through whole; a
    document fully covered by spans yields an empty string.

    Scale: spans explode to (doc_id, token index) rows — volume = total
    masked tokens, bounded by corpus token count — then one anti-join
    against the token table and a per-document ordered re-assembly
    (sort_array over the C-bounded per-doc collect_list, no global sort).
    """
    t = F.col(text_col)
    toks = (
        docs.filter(t.isNotNull() & (F.trim(t) != ""))
        .select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.lower(F.trim(t)), r"\s+")).alias("pos", "tok"),
        )
    )
    # totals over ALL docs (null/empty → 0 tokens) so empty documents pass
    # through with clean_text '' instead of dropping out of the result
    n_total = F.when(t.isNull() | (F.trim(t) == ""), F.lit(0)).otherwise(
        F.size(F.split(F.lower(F.trim(t)), r"\s+"))
    )
    masked = spans.select(
        "doc_id", F.explode(F.sequence("span_start", "span_end")).alias("pos")
    ).distinct()
    kept = toks.join(masked, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    totals = docs.select(
        F.col(id_col).alias("doc_id"), n_total.cast("long").alias("n_total")
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            (F.col("n_total") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_tokens_removed"
            ),
        )
    )
