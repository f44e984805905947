"""N-gram language-model scoring and importance weighting for data selection.

Two standard corpus-quality tools from large-scale pretraining pipelines:

- :func:`lm_train` / :func:`lm_perplexity` — a CCNet-style bigram LM
  (Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets
  from Web Crawl Data", 2019): train token/bigram count tables on a
  reference slice of the corpus, score every document by smoothed bigram
  perplexity, and filter/bucket on the score. CCNet uses KenLM 5-grams;
  the relational re-expression here is an interpolation-free add-alpha
  bigram model whose train AND score passes are plain groupBy/join — no
  model binary, no UDF, trivially distributed.
- :func:`dsir_weights` — hashed n-gram importance weights (Xie et al.,
  "Data Selection for Language Models via Importance Resampling",
  NeurIPS 2023): estimate unigram bucket distributions for a target
  domain and the source corpus, then weight each source document by
  sum_tokens log(p_target(bucket)/p_source(bucket)). Selecting the top
  documents by weight importance-resamples the source toward the target.

Scale notes (100 TB): training is one explode + two groupBys (map-side
combined); the vocabulary/bigram tables live distributed and join back on
token keys — the unigram table is small enough to broadcast by default
(``broadcast_vocab=False`` is the huge-vocab escape hatch, same knob
pattern as components.py ``broadcast_mins``). Scoring is candidate-driven:
only the document's own (doc, w1, w2) multiset joins the count tables.
All hashing/tokenization is deterministic and engine-portable in
``hash_mode='md5'`` so a DuckDB twin reproduces every number bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _hash64


def _tok_arrays(
    docs: DataFrame, text_col: str, id_col: str, lowercase: bool = True
) -> DataFrame:
    """(doc_id, toks array<string>) — whitespace tokens, empty/NULL → []."""
    t = F.trim(F.col(text_col))
    if lowercase:
        t = F.lower(t)
    toks = F.when(t.isNull() | (t == ""), F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    return docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))


def _doc_bigrams(toks_df: DataFrame) -> DataFrame:
    """Explode (doc_id, w1, w2) adjacent pairs; docs with <2 tokens emit
    nothing. JVM-side zip of two slices — no UDF."""
    n = F.size("toks")
    pairs = F.when(
        n >= 2,
        F.arrays_zip(
            F.slice("toks", 1, n - 1).alias("w1"),
            F.slice("toks", 2, n - 1).alias("w2"),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        toks_df.select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def lm_train(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Train the bigram LM: returns ``(unigrams(tok, cnt), bigrams(w1, w2,
    cnt))`` count tables. One tokenize scan, two map-side-combined groupBys;
    both tables stay distributed (the 100 TB vocabulary never touches the
    driver)."""
    toks = _tok_arrays(docs, text_col, id_col)
    uni = (
        toks.select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("cnt"))
    )
    bi = _doc_bigrams(toks).groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    return uni, bi


def lm_perplexity(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.1,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Smoothed bigram perplexity per document.

    Token 1 scores against the unigram model ``(c(w)+α)/(N+αV)``; tokens
    2..n against the conditional ``(c(w1,w2)+α)/(c(w1)+αV)`` — add-alpha
    smoothing, so out-of-vocabulary tokens are finite, never -inf. Returns
    ``(doc_id, n_tokens, ppl)`` with ``ppl = exp(-mean log p)`` rounded to
    6 dp (Spark and an engine twin aggregate in different orders; the
    round makes the score hash-stable). Empty docs get ppl NULL.

    The per-doc bigram multiset — not the corpus — drives the two count
    joins, and duplicates collapse first (groupBy multiplicity), so cost
    is O(distinct doc bigrams). ``broadcast_vocab=False`` is the
    billion-type-vocabulary escape hatch: both probability joins fall back
    to token-key shuffle joins (AQE handles head-token skew).
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    toks = _tok_arrays(docs, text_col, id_col)
    scalars = unigrams.agg(
        F.sum("cnt").cast("double").alias("n_total"),
        F.count("*").cast("double").alias("vocab"),
    )
    uni = F.broadcast(unigrams) if broadcast_vocab else unigrams

    # first token of each doc → unigram log prob
    first = toks.filter(F.size("toks") >= 1).select(
        "doc_id", F.element_at("toks", 1).alias("tok")
    )
    first_lp = (
        first.join(uni, "tok", "left")
        .crossJoin(scalars)
        .select(
            "doc_id",
            (
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(alpha))
                    / (F.col("n_total") + F.lit(alpha) * F.col("vocab"))
                )
            ).alias("lp"),
            F.lit(1).cast("long").alias("m"),
        )
    )

    # tokens 2..n → conditional bigram log prob, duplicate pairs collapsed
    dbg = (
        _doc_bigrams(toks)
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").cast("long").alias("m"))
    )
    uni_w1 = uni.select(F.col("tok").alias("w1"), F.col("cnt").alias("c1"))
    bi_lp = (
        dbg.join(bigrams, ["w1", "w2"], "left")
        .join(uni_w1, "w1", "left")
        .crossJoin(scalars)
        .select(
            "doc_id",
            (
                F.col("m").cast("double")
                * F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(alpha))
                    / (
                        F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                        + F.lit(alpha) * F.col("vocab")
                    )
                )
            ).alias("lp"),
            "m",
        )
    )

    per_doc = (
        first_lp.unionByName(bi_lp)
        .groupBy("doc_id")
        .agg(F.sum("lp").alias("sum_lp"), F.sum("m").alias("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.exp(-F.col("sum_lp") / F.col("n_tokens")), 6).alias("ppl"),
        )
    )
    ids = docs.select(F.col(id_col).alias("doc_id"))
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        "ppl",
    )


def dsir_weights(
    source: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Hashed-unigram importance weights of ``source`` docs toward
    ``target`` (DSIR). Tokens hash into ``n_buckets`` features; bucket
    distributions get add-1 smoothing; each source doc's weight is
    ``Σ_tokens log(p_target(b)/p_source(b))`` — higher = more
    target-like. Returns ``(doc_id, n_tokens, logweight)`` (logweight 6 dp,
    NULL for empty docs). Top-k by logweight importance-resamples the
    corpus toward the target domain.

    The two bucket tables are tiny (n_buckets rows) and broadcast into the
    scoring join; everything upstream is explode + groupBy. md5 hash mode
    makes the bucketing engine-portable for an SQL twin."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")

    def buckets(docs: DataFrame) -> DataFrame:
        return (
            _tok_arrays(docs, text_col, id_col)
            .select(F.explode("toks").alias("tok"))
            .select(F.pmod(_hash64(F.col("tok"), hash_mode), F.lit(n_buckets)).alias("b"))
            .groupBy("b")
            .agg(F.count("*").alias("cnt"))
        )

    src_b = buckets(source).select("b", F.col("cnt").alias("c_src"))
    tgt_b = buckets(target).select("b", F.col("cnt").alias("c_tgt"))
    # add-1 smoothed log-ratio per bucket; totals folded in as scalars
    sums = (
        src_b.agg(F.sum("c_src").alias("n_src"))
        .crossJoin(tgt_b.agg(F.sum("c_tgt").alias("n_tgt")))
    )
    ratios = (
        src_b.join(tgt_b, "b", "outer")
        .select(
            "b",
            F.coalesce("c_src", F.lit(0)).alias("c_src"),
            F.coalesce("c_tgt", F.lit(0)).alias("c_tgt"),
        )
        .crossJoin(sums)
        .select(
            "b",
            (
                F.log(
                    (F.col("c_tgt").cast("double") + 1.0)
                    / (F.col("n_tgt").cast("double") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("c_src").cast("double") + 1.0)
                    / (F.col("n_src").cast("double") + F.lit(float(n_buckets)))
                )
            ).alias("log_ratio"),
        )
    )
    doc_b = (
        _tok_arrays(source, text_col, id_col)
        .select("doc_id", F.explode("toks").alias("tok"))
        .select(
            "doc_id", F.pmod(_hash64(F.col("tok"), hash_mode), F.lit(n_buckets)).alias("b")
        )
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("m"))
    )
    scored = (
        doc_b.join(F.broadcast(ratios), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_tokens"),
            F.round(F.sum(F.col("m") * F.col("log_ratio")), 6).alias("logweight"),
        )
    )
    ids = source.select(F.col(id_col).alias("doc_id"))
    return ids.join(scored, "doc_id", "left").select(
        "doc_id", F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"), "logweight"
    )
