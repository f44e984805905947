"""Composed corpus-cleaning pipeline: the end-to-end decision table a
training-data run actually consumes.

``clean_corpus`` chains the individual operators in the standard order —
quality filter → language filter → exact dedup → minhash-LSH near-dedup
(pairs resolved to clusters via connected components) — and emits ONE
auditable row per input document:

    (doc_id, lang_pred, quality_score, decision)

``decision`` is 'keep' or the FIRST filter that dropped the doc
('quality' | 'language' | 'exact_dup' | 'near_dup'). Downstream keeps
``decision = 'keep'``; the rest of the table is the audit trail.

Scale shape: quality/language are scan-stage column expressions; exact
dedup is one hash groupBy; near-dedup runs only on the surviving canonical
set (each stage shrinks the next stage's input — the reason for the
ordering) and is bucket-capped LSH + small-star/large-star components, so
no stage is quadratic in documents.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    near_duplicate_clusters,
)
from .quality import language_id, quality_scores


@dataclass(frozen=True)
class CleanCorpusParams:
    min_quality: float = 0.5
    keep_langs: tuple[str, ...] | None = None  # None = keep all languages
    shingle_n: int = 3
    num_hashes: int = 32
    bands: int = 8
    max_bucket: int = 200
    seed: int = 42
    hash_mode: str = "xxhash64"  # 'md5' for the engine-portable twin


def clean_corpus(
    docs: DataFrame,
    params: CleanCorpusParams = CleanCorpusParams(),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One decision row per input doc; see module docstring for semantics.

    The internal fan-out points are materialized once: ``annotated`` feeds
    both the survivor chain and the final decision join, and
    ``exact_dropped`` feeds both the canonical anti-join (under the whole
    minhash chain) and the final join — without lineage cuts the scan-stage
    regex scoring and the sha256 groupBy each execute twice inside the one
    decisions job."""
    from .. import kernel as K

    p = params
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    scored = quality_scores(base).select("doc_id", "quality_score")
    langs = language_id(base).select("doc_id", "lang_pred")
    annotated = K.materialize(base.join(scored, "doc_id").join(langs, "doc_id"))

    lang_ok = (
        F.col("lang_pred").isin(*p.keep_langs) if p.keep_langs else F.lit(True)
    )
    survivors = annotated.filter(
        (F.col("quality_score") >= p.min_quality) & lang_ok
    )

    # exact dedup among survivors: non-canonical members of identical-text
    # clusters drop; canonical (min doc_id) rows continue
    exact = exact_duplicates(survivors).filter(F.col("doc_id") != F.col("canonical_id"))
    exact_dropped = K.materialize(exact.select("doc_id"))
    canon = survivors.join(exact_dropped, "doc_id", "left_anti")

    # near-dedup on the canonical survivor set: LSH pairs → components →
    # keep the min-id representative of each near-dup cluster
    sigs = minhash_signatures(
        canon, shingle_n=p.shingle_n, num_hashes=p.num_hashes,
        seed=p.seed, hash_mode=p.hash_mode,
    )
    pairs = minhash_lsh_candidates(
        sigs, bands=p.bands, max_bucket=p.max_bucket,
        num_hashes=p.num_hashes, hash_mode=p.hash_mode,
    )
    near = near_duplicate_clusters(pairs).filter(
        F.col("doc_id") != F.col("canonical_id")
    )
    near_dropped = near.select("doc_id")

    decision = (
        F.when(F.col("quality_score") < p.min_quality, F.lit("quality"))
        .when(~lang_ok, F.lit("language"))
        .when(F.col("_exact").isNotNull(), F.lit("exact_dup"))
        .when(F.col("_near").isNotNull(), F.lit("near_dup"))
        .otherwise(F.lit("keep"))
    )
    return (
        annotated
        .join(exact_dropped.withColumn("_exact", F.lit(1)), "doc_id", "left")
        .join(near_dropped.withColumn("_near", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            "lang_pred",
            F.round("quality_score", 6).alias("quality_score"),
            decision.alias("decision"),
        )
    )


def prepare_training_data(
    docs: DataFrame,
    benchmark: DataFrame,
    params: CleanCorpusParams = CleanCorpusParams(),
    decontaminate_n: int = 13,
    budget: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame]:
    """The full end-to-end training-data preparation a pretraining run
    consumes: ``clean_corpus`` (quality → language → exact dedup → near
    dedup) → n-gram benchmark decontamination → GPT-style sequence packing.

    Returns ``(packed, decisions)``:

    - ``packed``: ``pack_sequences`` output over the final survivor set —
      each surviving doc's (n_tokens, start_token, pack_id, pack_offset)
      in the packed token stream.
    - ``decisions``: one auditable row per INPUT doc; ``clean_corpus``'s
      decision column extended with ``'contaminated'`` for docs that
      survived cleaning but share a ``decontaminate_n``-gram with the
      benchmark corpus.

    Scale shape is the union of its stages' shapes: scan-stage scoring,
    one hash groupBy, bucket-capped LSH + components on the shrinking
    survivor set, a broadcast benchmark-gram semi-join, and one
    distributed prefix sum. Every stage's output feeds the next stage's
    smaller input; nothing is quadratic in documents.
    """
    from .. import kernel as K
    from .chunks import decontaminate
    from .packing import pack_sequences

    # materialize each fan-out point ONCE: `decisions` feeds both the kept
    # join and final_decisions, `kept` feeds both decontaminate and the
    # final survivor set, `contaminated` feeds both final_decisions and the
    # final anti-join — without the lineage cuts the quality/lang scoring
    # and the minhash signature build re-run 3-4x (once per consumer)
    decisions = K.materialize(clean_corpus(docs, params, text_col=text_col, id_col=id_col))
    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    kept = K.materialize(
        base.join(
            decisions.filter(F.col("decision") == "keep").select("doc_id"), "doc_id"
        )
    )
    contaminated = K.materialize(
        decontaminate(
            kept, benchmark, n=decontaminate_n, text_col="text", id_col="doc_id",
            hash_mode=params.hash_mode,
        ).select("doc_id")
    )
    final_decisions = (
        decisions.join(contaminated.withColumn("_c", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            "lang_pred",
            "quality_score",
            F.when(
                (F.col("decision") == "keep") & F.col("_c").isNotNull(),
                F.lit("contaminated"),
            )
            .otherwise(F.col("decision"))
            .alias("decision"),
        )
    )
    final = kept.join(contaminated, "doc_id", "left_anti")
    packed = pack_sequences(final, budget=budget, text_col="text", id_col="doc_id")
    return packed, final_decisions
