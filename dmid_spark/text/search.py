"""BM25 full-text retrieval over the documents table — the search-engine
primitive a training-data pipeline uses for eval-set mining, targeted
corpus slicing, and relevance-ranked inspection (Robertson & Zaragoza,
"The Probabilistic Relevance Framework: BM25 and Beyond", FnTIR 2009).

Relational shape (everything candidate-driven, nothing all-pairs):

- tokenize-explode the corpus once (scan stage) → per-(doc, term) tf and
  per-doc length dl;
- document frequencies df(term) — O(vocab) rows, broadcast by default
  with the usual opt-out for ≳10⁹-term vocabularies;
- query terms semi-join the postings, so only documents containing at
  least one query term are ever scored (the inverted-index access path,
  expressed relationally — Catalyst turns the term join into the lookup);
- per-query top-k via the bounded sorted-list aggregate (the same device
  as tfidf_top_terms / brute_force_topk: no global window, no per-query
  row_number shuffle — state per group is O(k)).

Scores quantize to 9 dp before ranking (quantize-before-compare, as
louvain_refine / tfidf_top_terms): Spark's Math.log and another engine's
libm differ in the last ulp, and an exact-float tiebreak would let
near-equal scores flip top-k membership between engine and oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"[^a-z0-9]+"


def _tokens(df: DataFrame, text_col: str, out_id, id_col: str) -> DataFrame:
    """Lowercase alphanumeric tokenization, empty tokens dropped — the
    same splitter both engines can express (Java regex / RE2-safe)."""
    return (
        df.select(
            F.col(id_col).alias(out_id),
            F.explode(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT_RE)).alias("term"),
        )
        .filter(F.col("term") != "")
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    broadcast_df: bool = True,
    round_dp: int = 9,
) -> DataFrame:
    """Top-k documents per query under BM25 → ``(query_id, doc_id, score,
    rank)``.

    ``score(q,d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    with the Lucene idf ``ln(1 + (N−df+0.5)/(df+0.5))`` (always ≥ 0).
    Repeated query terms count once (distinct-term queries, the common
    engine default). Ties break by ascending doc_id; ranks are 1-based and
    dense within each query. N counts all corpus docs; avgdl = total
    tokens / N (token-less docs pull the average down, as Lucene does).

    Scale: one corpus tokenize (scan stage) feeding three hash aggregates
    (tf, dl, df); queries semi-join the tf postings on term so work is
    bounded by postings of query terms, not the corpus; the final top-k is
    a bounded O(k)-state aggregate per query. ``broadcast_df=False`` is
    the huge-vocabulary escape hatch (df then shuffles into the join).
    """
    n_docs = docs.count()
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")
    toks = _tokens(docs, text_col, "doc_id", id_col)
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("double").alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("double").alias("dl"))
    avgdl = float(
        dl.agg((F.sum("dl") / F.lit(float(n_docs))).alias("a")).first()["a"] or 0.0
    )
    if avgdl == 0.0:
        raise ValueError("bm25_topk: corpus has no tokens")
    df_t = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    if broadcast_df:
        df_t = F.broadcast(df_t)
    qterms = (
        _tokens(queries, query_text_col, "query_id", query_id_col)
        .select("query_id", "term")
        .distinct()
    )
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl)
    )
    scored = (
        qterms.join(tf, "term")
        .join(df_t, "term")
        .join(dl, "doc_id")
        .groupBy("query_id", "doc_id")
        .agg(F.sum(idf * F.col("tf") * F.lit(k1 + 1.0) / denom).alias("score"))
    )
    return (
        scored.groupBy("query_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.round(F.col("score"), round_dp)).alias("neg"),
                            "doc_id",
                        )
                    )
                ),
                1,
                k,
            ).alias("top")
        )
        .select("query_id", F.posexplode("top").alias("pos", "t"))
        .select(
            "query_id",
            F.col("t.doc_id").alias("doc_id"),
            (-F.col("t.neg")).alias("score"),
            (F.col("pos") + 1).cast("long").alias("rank"),
        )
    )
