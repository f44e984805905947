"""Chunk-level (paragraph-proxy) dedup and benchmark decontamination.

Two training-data-pipeline operators the document suite was missing:

- **Chunk dedup** (CCNet / RefinedWeb paragraph-level dedup): split every
  document into fixed-width word windows, hash each window, and keep only
  the first occurrence of each distinct window across the corpus. On real
  web text the split is on paragraph boundaries; the driver's synthetic
  documents are flat word soup, so a fixed word window is the proxy —
  swapping the splitter swaps one column expression, the dedup relation is
  identical.
- **Decontamination** (GPT-3 appendix-C style): flag corpus documents that
  share any word ``n``-gram (n=13 is the published choice) with a benchmark
  /eval corpus, so evaluation data can be removed from training data.

Scale shape: chunking and gram extraction are pure column expressions
(no shuffle — they run inside the scan stage); the dedup decision is ONE
``groupBy`` on the chunk hash, and decontamination is a semi-join of corpus
grams against the (typically small → broadcast) benchmark gram set. No
Python in any path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hash64

# first-occurrence encoding: pk = doc_id * CHUNK_STRIDE + chunk_idx. The
# min over pk is doc-major lexicographic order, portable to any SQL engine
# (struct-min orderings are not). Bounds are asserted columnarly below.
CHUNK_STRIDE = 1 << 21  # docs may have up to 2M chunks (~40M words)
_STRIDE_BITS = 21


def _token_arrays(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, toks) — lowercase, whitespace-normalized token arrays;
    blank documents dropped. Mirrors the winnowing tokenizer so the DuckDB
    twin is ``string_split(regexp_replace(lower(trim(text)),'\\s+',' ','g'),' ')``."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return docs.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("doc_id"), F.split(norm, " ").alias("toks")
    )


def chunk_table(
    docs: DataFrame,
    chunk_words: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """(doc_id, chunk_idx, chunk_hash) — one row per fixed-width word
    window (last window may be shorter). Pure column expressions: the
    token array is sliced with ``transform`` + ``slice`` JVM-side, so the
    whole derivation runs in the scan stage with zero shuffles.

    ``hash_mode='md5'`` gives the engine-portable 60-bit hash (dedup.py::
    _hash64) for the DuckDB twin; default xxhash64 is the fast path."""
    if chunk_words < 1:
        raise ValueError(f"chunk_words must be >= 1, got {chunk_words}")
    t = _token_arrays(docs, text_col, id_col)
    n_chunks = F.ceil(F.size("toks") / F.lit(chunk_words)).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice("toks", i * chunk_words + 1, chunk_words), " "),
    )
    out = t.select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
    return out.select(
        "doc_id",
        # columnar guard: the first-occurrence pk encoding below needs
        # chunk_idx < CHUNK_STRIDE — fail loudly, never alias two chunks
        F.when(
            F.col("chunk_idx") < CHUNK_STRIDE, F.col("chunk_idx")
        ).otherwise(
            F.assert_true(F.lit(False), F.lit("chunk_idx exceeds CHUNK_STRIDE")).cast("int")
        ).alias("chunk_idx"),
        _hash64(F.col("chunk"), hash_mode).alias("chunk_hash"),
    )


def chunk_duplicates(
    docs: DataFrame,
    chunk_words: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Every occurrence of a chunk that appears ≥ 2 times corpus-wide, with
    its canonical (first, in doc-major order) occurrence:
    ``(doc_id, chunk_idx, canonical_doc, canonical_idx, n_occurrences)``.

    One groupBy on the chunk hash (map-side partial agg) + one hash join
    back — the same shape as exact_duplicates, safe at corpus scale."""
    ch = chunk_table(docs, chunk_words, text_col, id_col, hash_mode)
    pk = F.col("doc_id") * CHUNK_STRIDE + F.col("chunk_idx")
    agg = ch.groupBy("chunk_hash").agg(
        F.min(pk).alias("first_pk"), F.count("*").alias("n_occurrences")
    )
    return (
        ch.join(agg.filter(F.col("n_occurrences") >= 2), "chunk_hash")
        .select(
            "doc_id",
            "chunk_idx",
            F.shiftright("first_pk", _STRIDE_BITS).alias("canonical_doc"),
            (F.col("first_pk") % CHUNK_STRIDE).cast("int").alias("canonical_idx"),
            "n_occurrences",
        )
    )


def chunk_dedup_summary(
    docs: DataFrame,
    chunk_words: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-document dedup decision table: ``(doc_id, n_chunks,
    n_dup_chunks, dup_fraction)`` where a chunk is *dup* when it is a
    non-canonical occurrence (the copy a paragraph-dedup pass would drop).
    A doc with dup_fraction 1.0 is entirely boilerplate/duplicated."""
    ch = chunk_table(docs, chunk_words, text_col, id_col, hash_mode)
    pk = F.col("doc_id") * CHUNK_STRIDE + F.col("chunk_idx")
    firsts = ch.groupBy("chunk_hash").agg(F.min(pk).alias("first_pk"))
    is_dup = (pk != F.col("first_pk")).cast("int")
    return (
        ch.join(firsts, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(is_dup).alias("n_dup_chunks"),
            (F.sum(is_dup) / F.count("*")).alias("dup_fraction"),
        )
    )


def _gram_hashes(
    docs: DataFrame, n: int, text_col: str, id_col: str, hash_mode: str
) -> DataFrame:
    """Distinct word n-gram hashes per doc over the normalized tokenizer:
    (doc_id, gh). Docs shorter than n words contribute nothing."""
    t = _token_arrays(docs, text_col, id_col)
    grams = t.select(
        "doc_id",
        F.explode(
            F.transform(
                F.slice("toks", 1, F.greatest(F.size("toks") - (n - 1), F.lit(0))),
                lambda _, i: F.concat_ws(" ", F.slice("toks", i + 1, n)),
            )
        ).alias("gram"),
    )
    return grams.select("doc_id", _hash64(F.col("gram"), hash_mode).alias("gh")).distinct()


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_mode: str = "xxhash64",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Corpus documents sharing ≥ 1 word ``n``-gram with the benchmark
    corpus: ``(doc_id, n_hit_grams)``, contaminated docs only. n=13 is the
    published GPT-3 decontamination window.

    The benchmark gram set is tiny next to the corpus (eval suites are
    KB-MB, corpora are TB), so it broadcasts by default; pass
    ``broadcast_benchmark=False`` for a giant benchmark, where the join
    falls back to a shuffle the optimizer plans. Corpus-side gram
    extraction stays in the scan stage — the only wide op is the join +
    per-doc count."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    dg = _gram_hashes(docs, n, text_col, id_col, hash_mode)
    bg = _gram_hashes(benchmark, n, text_col, id_col, hash_mode).select("gh").distinct()
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    return (
        dg.join(bg, "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_grams"))
    )
