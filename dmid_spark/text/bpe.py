"""Byte-pair-encoding vocabulary training as relational iteration.

Real pretraining pipelines train a subword vocabulary over the corpus
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units" — the classic BPE trainer). The algorithm is two nested
relational shapes, which is why it fits this engine without any UDF:

1. The corpus compresses to a **word-frequency table** (one scan +
   groupBy) — at 100 TB this is ~10⁸ rows, not 10¹²; every merge round
   runs on it, never on the corpus again.
2. Each merge round is: count adjacent symbol pairs weighted by word
   frequency (explode + map-side-combined groupBy), pick the most frequent
   pair (count desc, then lexicographic — a 1-row collect), and rewrite
   the symbol strings (a plain string replace, no regex).

Words are spelled as space-separated symbols with a ``</w>`` end-of-word
marker (``"low" → "l o w </w>"``). The pair rewrite pads the spelling with
sentinel spaces and applies the plain non-overlapping left-to-right
``replace`` TWICE: the first pass consumes the shared boundary space
between back-to-back occurrences (``" a b a b "`` merges only the first),
the second pass merges the survivors, which are then always isolated —
two passes are a fixpoint. Both engines' ``replace`` use the same
left-to-right non-overlap rule, so the DuckDB twin is bitwise identical.

Semantics note: for ``left != right`` (every merge natural text produces)
the two-pass rewrite merges exactly the occurrences Sennrich's greedy
list scan merges. For same-symbol merges over odd runs (``"a a a a a"``
with merge ``(a, a)``) the pair grouping can right-align where the greedy
scan left-aligns (``"aa a aa"`` vs ``"aa aa a"``) — a tie-class cosmetic
difference pinned by a test, identical in both engines.

Determinism: ties on pair count break lexicographically on (left, right)
— binary string order in both Spark (UTF8 binary) and DuckDB (default
collation), so the merge sequence is engine-portable and rerun-stable.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import kernel as K

END_WORD = "</w>"


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq) with the initial BPE spelling attached:
    ``sym`` = characters space-joined + the end-of-word marker. One scan +
    one groupBy; the corpus is never touched again during training."""
    t = F.col(text_col)
    words = (
        docs.filter(t.isNotNull() & (F.trim(t) != ""))
        .select(F.explode(F.split(F.trim(t), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    spelled = F.concat(
        F.trim(F.regexp_replace(F.col("word"), "(.)", "$1 ")), F.lit(" " + END_WORD)
    )
    return words.withColumn("sym", spelled)


def _merge_expr(sym, left: str, right: str):
    """Rewrite one merge over a spelling string: pad with sentinel spaces,
    plain-replace ``' left right '`` → ``' leftright '`` twice (two passes
    are a fixpoint, see module docstring), strip the padding."""
    pat = F.lit(f" {left} {right} ")
    rep = F.lit(f" {left}{right} ")
    padded = F.concat(F.lit(" "), sym, F.lit(" "))
    once = F.replace(padded, pat, rep)
    return F.trim(F.replace(once, pat, rep))


@dataclass
class BpeResult:
    merges: DataFrame  # (rank, left, right, merged, pair_count)
    words: DataFrame  # (word, freq, sym) with all merges applied
    rounds: int


def bpe_train(
    docs: DataFrame,
    num_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> BpeResult:
    """Learn ``num_merges`` BPE merges over the corpus.

    Per round: adjacent-pair counts via ``arrays_zip(slice, slice)`` +
    explode (map-side-combined aggregation over the word table), argmax by
    (count desc, left, right) — one single-row collect — then the string
    rewrite. The word table is re-materialized each round (single-table
    iterative loop, the pagerank-shaped chain that stays flat). Stops
    early when the best pair's count drops below ``min_pair_count``
    (merging a once-seen pair compresses nothing).
    """
    if num_merges < 1:
        raise ValueError(f"num_merges must be >= 1, got {num_merges}")
    spark = docs.sparkSession
    words = K.materialize(word_frequencies(docs, text_col))
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, num_merges + 1):
        arr = F.split(F.col("sym"), " ")
        n = F.size(arr)
        pairs = (
            words.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(arr, 1, n - 1).alias("l"),
                        F.slice(arr, 2, n - 1).alias("r"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not top or top[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, left, right, left + right, cnt))
        words = K.materialize(
            words.withColumn("sym", _merge_expr(F.col("sym"), left, right))
        )
    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count long"
    )
    return BpeResult(merges=merges_df, words=words, rounds=len(merges))


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "tokens",
) -> DataFrame:
    """Apply learned merges in rank order to a word column → subword token
    arrays. The merge list is collected driver state (it IS the vocab —
    O(num_merges), broadcast into the expression); each merge is the same
    two-pass plain replace as training, so segmenting the training words
    reproduces training's final spellings exactly.

    Column-expression chain: fine for few-hundred-merge vocabularies; for
    production-size vocabularies (30k+) use :func:`bpe_segment_pandas` —
    the chained codegen would blow the JVM's 64 KB method limit long
    before that, and the two paths are parity-tested bitwise equal.
    """
    spelled = F.concat(
        F.trim(F.regexp_replace(F.col(word_col), "(.)", "$1 ")), F.lit(" " + END_WORD)
    )
    sym = spelled
    for left, right in merges:
        sym = _merge_expr(sym, left, right)
    return df.withColumn(out_col, F.split(sym, " "))


def bpe_segment_pandas(
    df: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
    out_col: str = "tokens",
) -> DataFrame:
    """Arrow-batched encode path for production-size vocabularies.

    ``bpe_segment`` chains one column expression per merge, which hits the
    JVM's 64 KB codegen limit somewhere in the hundreds of merges; this
    variant applies the identical two-pass-replace semantics per word in a
    Pandas UDF (Python ``str.replace`` has the same left-to-right
    non-overlap rule), so the two paths are bitwise interchangeable — a
    parity test pins that. The merge list is O(vocab) closure state
    broadcast once per executor. Per-word cost is O(merges); a
    priority-queue tokenizer is faster per word but this stays exact to
    training's semantics.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    merge_list = [(str(left), str(right)) for left, right in merges]

    def one(w):
        sym = " ".join(w) + " " + END_WORD
        for left, right in merge_list:
            pat, rep = f" {left} {right} ", f" {left}{right} "
            sym = f" {sym} ".replace(pat, rep).replace(pat, rep).strip()
        return sym.split(" ")

    # annotations are postponed (PEP 563) module-wide, which pandas_udf's
    # hint inspection can't resolve — annotate via __annotations__ directly
    def seg(words):
        return words.map(one)

    seg.__annotations__ = {"words": pd.Series, "return": pd.Series}
    seg_udf = pandas_udf(seg, "array<string>")
    return df.withColumn(out_col, seg_udf(F.col(word_col)))
