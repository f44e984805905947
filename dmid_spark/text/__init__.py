from .dedup import (  # noqa: F401
    dedup_against,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    near_duplicate_clusters,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
)
from .chunks import (  # noqa: F401
    chunk_dedup_summary,
    chunk_duplicates,
    chunk_table,
    decontaminate,
)
from .pipeline import (  # noqa: F401
    CleanCorpusParams,
    clean_corpus,
    prepare_training_data,
)
from .fingerprint import (  # noqa: F401
    document_fingerprints,
    fingerprint_overlap_pairs,
)
from .sampling import (  # noqa: F401
    group_sample,
    mix_epochs,
    stratified_sample,
    temperature_mixture,
    token_budget_sample,
    weighted_sample,
)
from .lm import dsir_weights, lm_perplexity, lm_train  # noqa: F401
from .probe import (  # noqa: F401
    ProbeModel,
    probe_features,
    probe_scores,
    train_probe,
)
from .quality import (  # noqa: F401
    doc_fingerprint,
    language_id,
    quality_scores,
    redact_pii,
    repetition_scores,
    tfidf_top_terms,
)
from .bpe import bpe_segment, bpe_segment_pandas, bpe_train, word_frequencies  # noqa: F401
from .packing import pack_sequences, shard_assignments  # noqa: F401
from .search import bm25_topk  # noqa: F401
from .spans import duplicate_ngram_spans, remove_spans  # noqa: F401
from .simjoin import containment_join, prefix_bucket_report, similarity_join  # noqa: F401
