"""Text analysis operators: language id, quality scoring, token counting,
document fingerprinting. Pure JVM-side column expressions (regexp + string
builtins); no UDFs — these run in the scan stage at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# minimal per-language stopword markers for the n-gram heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
}
_EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "this",
]


def _word_hits(text_col, words) -> F.Column:
    """Count of whitespace-delimited occurrences of any marker word."""
    padded = F.concat(F.lit(" "), F.lower(text_col), F.lit(" "))
    total = F.lit(0)
    for w in words:
        pat = f" {w} "
        total = total + (
            (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit("")))) / len(pat)
        )
    return total.cast("long")


def language_id(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-marker language heuristic → (doc_id, lang_pred, lang_hits).
    Ties and zero hits fall back to 'und' (undetermined); deterministic
    (greatest hit count, then language-code order).

    The argmax is ONE ``array_max`` over (hits, −index, lang) structs —
    struct comparison picks the max hit count, ties resolve to the earliest
    language in sorted code order via −index. The previous
    greatest + chained-``when`` formulation re-expanded every score
    expression inside every comparison after CollapseProject (~7 copies of
    each 5-marker chain), which blew whole-stage codegen past janino's
    64 KB method cap and silently dropped the scan stage of any consumer
    (clean_corpus) to interpreted execution."""
    langs = sorted(_LANG_MARKERS)
    arr = F.array(
        *[
            F.struct(
                _word_hits(F.col(text_col), _LANG_MARKERS[lang]).alias("h"),
                F.lit(-i).alias("ni"),
                F.lit(lang).alias("l"),
            )
            for i, lang in enumerate(langs)
        ]
    )
    best = F.array_max(arr)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.when(best["h"] > 0, best["l"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["h"].alias("lang_hits"),
    )


def quality_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc quality features + a composite score:

    - n_chars, n_tokens (whitespace), n_words (BPE-ish regex: runs of
      letters/digits), mean_token_len
    - punct_ratio, digit_ratio, upper_ratio
    - stopword_ratio (English list)
    - score: penalties for extreme length, low stopword density, high
      punctuation — the usual C4/Gopher-style cheap filters.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    toks = F.split(F.trim(t), r"\s+")
    # NULL folds into the zero branch (size(split(NULL)) would yield NULL)
    n_tokens = F.when(t.isNull() | (F.trim(t) == ""), 0).otherwise(F.size(toks))
    n_words = F.size(F.expr(f"regexp_extract_all({text_col}, '[\\\\p{{L}}\\\\p{{N}}]+', 0)"))
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}]", ""))
    digits = F.length(F.regexp_replace(t, r"[^0-9]", ""))
    uppers = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    stop_hits = _word_hits(t, _EN_STOPWORDS)
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_words.alias("n_words"),
        (n_chars / F.greatest(n_tokens, F.lit(1))).alias("mean_token_len"),
        (punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (digits / F.greatest(n_chars, F.lit(1))).alias("digit_ratio"),
        (uppers / F.greatest(n_chars, F.lit(1))).alias("upper_ratio"),
        (stop_hits / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
    )
    score = (
        F.lit(1.0)
        * F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 1.0).otherwise(0.3)
        * F.when(F.col("mean_token_len").between(2.0, 12.0), 1.0).otherwise(0.5)
        * F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.5)
        * F.when(F.col("stopword_ratio") >= 0.05, 1.0).otherwise(0.7)
    )
    return out.withColumn("quality_score", score)


def doc_fingerprint(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    shingle_chars: int = 16,
) -> DataFrame:
    """Bottom-k sketch of rolling character shingles: (doc_id,
    fingerprint: array<long>). The winnowing-style content fingerprint —
    robust to local edits, fixed size, JVM-side only."""
    t = F.lower(F.col(text_col))
    n_sh = F.greatest(F.length(t) - (shingle_chars - 1), F.lit(1))
    hashes = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.xxhash64(t.substr(i, F.lit(shingle_chars))),
    )
    bottom_k = F.slice(F.array_sort(F.array_distinct(hashes)), 1, k)
    return docs.select(F.col(id_col).alias("doc_id"), bottom_k.alias("fingerprint"))


def repetition_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition filters → one row per document:

    - ``n_words`` (whitespace tokens, lowercased)
    - ``dup_word_frac``     = 1 − distinct words / words
    - ``top_bigram_ratio``  = occurrences of the most frequent word bigram
      / total bigrams (0.0 for <2-word docs)
    - ``top_trigram_ratio`` = same for trigrams
    - ``dup_trigram_frac``  = 1 − distinct trigrams / trigrams
    - ``repetitive``        = the composite flag a cleaning pipeline keys on
      (Gopher-inspired thresholds, documented inline)

    Rationale: the reference corpus rows are single-line token streams, so
    the repetition signals operate at word/n-gram granularity — the exact
    intent of Gopher's "fraction of characters in duplicate lines / most
    common n-gram" rules (Rae et al. 2021 §A1.1) transposed to line-less
    documents.

    Scale: one explode of the tokenized text (the same scan-stage shape as
    the shingle builders in dedup.py) followed by two partial-aggregating
    groupBys keyed (doc_id, n[, gram]) — fully distributed, no windows, no
    Python. Empty documents score zeros.
    """
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")

    def grams(n: int):
        return F.transform(
            F.slice(words, 1, F.greatest(F.size(words) - (n - 1), F.lit(0))),
            lambda _, i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )

    long = None
    for n in (1, 2, 3):
        part = docs.filter(F.trim(F.col(text_col)) != "").select(
            F.col(id_col).alias("doc_id"),
            F.lit(n).alias("n"),
            F.explode(grams(n)).alias("gram"),
        )
        long = part if long is None else long.unionByName(part)
    per_gram = long.groupBy("doc_id", "n", "gram").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy("doc_id", "n").agg(
        F.sum("c").alias("total"),
        F.count("*").alias("distinct"),
        F.max("c").alias("top"),
    )
    stats = per_doc.groupBy("doc_id").pivot("n", [1, 2, 3]).agg(
        F.first("total").alias("total"),
        F.first("distinct").alias("distinct"),
        F.first("top").alias("top"),
    )
    z = F.lit(0).cast("long")
    out = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("1_total", z).alias("n_words"),
            F.round(
                F.when(
                    F.coalesce("1_total", z) > 0,
                    1.0 - F.col("1_distinct") / F.col("1_total"),
                ).otherwise(0.0),
                9,
            ).alias("dup_word_frac"),
            F.round(
                F.when(
                    F.coalesce("2_total", z) > 0, F.col("2_top") / F.col("2_total")
                ).otherwise(0.0),
                9,
            ).alias("top_bigram_ratio"),
            F.round(
                F.when(
                    F.coalesce("3_total", z) > 0, F.col("3_top") / F.col("3_total")
                ).otherwise(0.0),
                9,
            ).alias("top_trigram_ratio"),
            F.round(
                F.when(
                    F.coalesce("3_total", z) > 0,
                    1.0 - F.col("3_distinct") / F.col("3_total"),
                ).otherwise(0.0),
                9,
            ).alias("dup_trigram_frac"),
        )
        # Gopher §A1.1-inspired: docs dominated by one bigram, heavily
        # repeated trigrams, or a tiny vocabulary are flagged
        .withColumn(
            "repetitive",
            (F.col("top_bigram_ratio") > 0.20)
            | (F.col("dup_trigram_frac") > 0.60)
            | (F.col("dup_word_frac") > 0.90),
        )
    )
    return out


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k terms per document by TF-IDF → ``(doc_id, term, tf, tfidf,
    rank)``. tf = in-doc occurrences; idf = ln((N+1)/(df+1)) + 1 (the
    smoothed scikit-style variant); ties break by ascending term
    (deterministic). Documents with no tokens yield no rows.

    Scale: tokenize-explode (scan stage) → one groupBy (doc_id, term) for
    tf → one groupBy (term) for df (broadcast back: O(vocab) rows) → per-doc
    top-k via the bounded sorted-list aggregate (the same device as
    brute_force_topk — no global or per-doc window).

    The rank sorts the tfidf QUANTIZED to 9 dp (the same
    quantize-before-compare device as louvain_refine's gains): Spark's
    Math.log and another engine's libm ln can differ in the last ulp, and
    an exact-float tiebreak would let near-equal scores flip top-k
    membership between engine and oracle."""
    n_docs = docs.count()
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    toks = (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col).alias("doc_id"), F.explode(words).alias("term"))
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    scored = tf.join(F.broadcast(df_t), "term").select(
        "doc_id",
        "term",
        "tf",
        (
            F.col("tf")
            * (F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)) + 1.0)
        ).alias("tfidf"),
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.round(F.col("tfidf"), 9)).alias("neg"), "term", "tf"
                        )
                    )
                ),
                1,
                k,
            ).alias("top")
        )
        .select("doc_id", F.posexplode("top").alias("pos", "t"))
        .select(
            "doc_id",
            F.col("t.term").alias("term"),
            F.col("t.tf").alias("tf"),
            (-F.col("t.neg")).alias("tfidf"),
            (F.col("pos") + 1).cast("long").alias("rank"),
        )
    )


# PII patterns — restricted to the regex subset with identical semantics in
# Java regex (Spark) and RE2 (DuckDB 'g'-flag twin): character classes,
# bounded/greedy quantifiers, no backrefs or lookarounds. Greedy classes +
# leftmost matching give the same spans under backtracking-first (Java) and
# leftmost-longest (RE2) here.
PII_EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?\d[\d \-]{7,}\d"


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    email_token: str = "<EMAIL>",
    phone_token: str = "<PHONE>",
) -> DataFrame:
    """``(doc_id, n_emails, n_phones, text_redacted)`` — emails replaced
    first, then phone-like digit runs counted/replaced on the email-redacted
    text (so an address's digits are never double-counted). Pure regexp
    column expressions: runs in the scan stage, no shuffle, 100 TB-safe.
    """
    after_email = F.regexp_replace(F.col(text_col), PII_EMAIL_RE, email_token)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.regexp_count(F.col(text_col), F.lit(PII_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_PHONE_RE)).alias("n_phones"),
        F.regexp_replace(after_email, PII_PHONE_RE, phone_token).alias("text_redacted"),
    )
