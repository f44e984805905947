from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dmid_spark.text import (
    doc_fingerprint,
    exact_duplicates,
    language_id,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    quality_scores,
    simhash,
    simhash_near_duplicates,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
    (3, "completely different content about spark dataframes and catalyst optimizer"),
    (4, "el rapido zorro marron salta sobre el perro perezoso de la ciudad"),
    (5, "der schnelle braune fuchs springt uber den faulen hund und der baum ist gross"),
    (6, ""),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def py_shingles(text, n=3):
    toks = [t for t in text.lower().split() if t]
    if len(toks) < n:
        return set(" ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0)))
    return set(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1))


def test_exact_duplicates(spark):
    out = exact_duplicates(docs_df(spark))
    got = sorted(map(tuple, out.collect()))
    assert got == [(0, 0, 2), (1, 0, 2)]


def test_minhash_lsh_finds_near_dup(spark):
    sigs = minhash_signatures(docs_df(spark), num_hashes=32)
    pairs = minhash_lsh_candidates(sigs, bands=8)
    got = {(r.doc_a, r.doc_b): r.est_jaccard for r in pairs.collect()}
    assert (0, 1) in got and got[(0, 1)] == 1.0  # identical docs: all minhashes equal
    assert (0, 2) in got and got[(0, 2)] > 0.5  # near dup lands in a shared band
    assert all(a < b for a, b in got)


def test_minhash_est_tracks_true_jaccard(spark):
    sigs = minhash_signatures(docs_df(spark), num_hashes=32)
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard for r in minhash_lsh_candidates(sigs, bands=16).collect()}
    for (a, b), est in pairs.items():
        sa, sb = py_shingles(DOCS[a][1]), py_shingles(DOCS[b][1])
        true_j = len(sa & sb) / len(sa | sb) if sa | sb else 0.0
        assert abs(est - true_j) < 0.35  # 32 hashes → coarse but correlated


def test_ngram_jaccard_exact_values(spark):
    out = ngram_jaccard_pairs(docs_df(spark), threshold=0.2)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in out.collect()}
    exp = {}
    for a, b in combinations(range(len(DOCS)), 2):
        sa, sb = py_shingles(DOCS[a][1]), py_shingles(DOCS[b][1])
        if sa & sb:
            j = len(sa & sb) / len(sa | sb)
            if j >= 0.2:
                exp[(a, b)] = j
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k])


def test_simhash_near_duplicates(spark):
    sims = simhash(docs_df(spark).filter("text <> ''"))
    vals = {r.doc_id: r.simhash for r in sims.collect()}
    assert vals[0] == vals[1]  # identical text → identical simhash
    pairs = simhash_near_duplicates(sims, max_hamming=16)
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    assert got[(0, 1)] == 0
    assert (0, 2) in got  # near dup within hamming 16
    assert (0, 3) not in got  # unrelated text far away


def test_simhash_hot_bucket_cap(spark):
    # 1,000 docs sharing an all-zero low chunk: uncapped pairing would emit
    # O(10^6) bucket-join rows from that single hot (chunk, key) bucket.
    # With max_bucket the pair count stays O(max_bucket^2) and the dropped
    # bucket is reported, not silent.
    n = 1000
    # signatures identical in chunk 0 (low 16 bits all zero), unique above —
    # hamming between any two docs is large, so only the bucket JOIN size
    # matters, which the filter on hamming doesn't bound.
    sims = spark.createDataFrame(
        [(i, (i + 1) << 16) for i in range(n)], "doc_id long, simhash long"
    )
    capped: list = []
    pairs = simhash_near_duplicates(
        sims, max_hamming=64, chunk_bits=16, bits=64, max_bucket=100, capped_out=capped
    )
    cnt = pairs.count()
    # chunk 0 bucket (key=0, 1000 docs) must be dropped and reported
    assert (0, 0, n) in capped
    # remaining chunks: signatures (i+1)<<16 collide only where the upper
    # 48 bits share chunk values — tiny buckets; far below the hot-bucket n²/2
    assert cnt < 100 * 100
    # sanity: a genuinely identical pair still pairs through a kept bucket
    sims2 = spark.createDataFrame(
        [(1, 12345), (2, 12345)] + [(i, (i + 7) << 16) for i in range(10, 40)],
        "doc_id long, simhash long",
    )
    got = {(r.doc_a, r.doc_b) for r in simhash_near_duplicates(sims2, max_hamming=0).collect()}
    assert (1, 2) in got


def test_language_id(spark):
    out = language_id(docs_df(spark))
    got = {r.doc_id: r.lang_pred for r in out.collect()}
    assert got[0] == "en" and got[1] == "en"
    assert got[4] == "es"
    assert got[5] == "de"
    assert got[6] == "und"


def test_quality_scores(spark):
    out = quality_scores(docs_df(spark))
    rows = {r.doc_id: r for r in out.collect()}
    r0 = rows[0]
    assert r0.n_tokens == 14
    assert r0.stopword_ratio == pytest.approx(3 / 14)  # 'the' x3
    assert rows[6].n_tokens == 0 and rows[6].quality_score < 1.0
    assert 0 < r0.quality_score <= 1.0


def test_doc_fingerprint_stability(spark):
    fp = doc_fingerprint(docs_df(spark).filter("text <> ''"), k=8)
    got = {r.doc_id: tuple(r.fingerprint) for r in fp.collect()}
    assert got[0] == got[1]  # identical docs → identical fingerprint
    shared02 = len(set(got[0]) & set(got[2]))
    shared03 = len(set(got[0]) & set(got[3]))
    assert shared02 > shared03  # near dup shares more sketch entries


def test_ngram_jaccard_boilerplate_shingle_not_quadratic(spark):
    # 20k docs all share one boilerplate trigram but nothing else; the old
    # unfiltered sh ⋈ sh intersection built ~2·10^8 pair rows here. The
    # candidate-driven intersection does O(|cand|·doc-size) work: with no
    # rare-shingle overlap there are zero candidates, so this must return
    # empty and finish fast.
    import time

    from dmid_spark.text.dedup import ngram_jaccard_pairs

    docs = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("all rights reserved "), F.col("id"), F.lit(" unique tail ")
        ).alias("text"),
    )
    t0 = time.time()
    out = ngram_jaccard_pairs(docs, shingle_n=3, threshold=0.1, max_doc_freq=500)
    assert out.count() == 0
    assert time.time() - t0 < 60


def test_ngram_jaccard_counts_stop_shingles_in_intersection(spark):
    # stop-shingles are excluded from candidate GENERATION but must still
    # count in the exact intersection/union arithmetic
    from dmid_spark.text.dedup import ngram_jaccard_pairs

    filler = [(100 + i, f"common boilerplate line u{i}") for i in range(10)]
    docs = spark.createDataFrame(
        [
            (1, "common boilerplate line alpha beta gamma"),
            (2, "common boilerplate line alpha beta delta"),
        ]
        + filler,
        "doc_id long, text string",
    )
    # trigram "common boilerplate line" appears in 12 docs > max_doc_freq=10
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, shingle_n=3, threshold=0.1, max_doc_freq=10
        ).collect()
    }
    # doc1: {c b l, b l alpha, l alpha beta, alpha beta gamma}
    # doc2: same first three + alpha beta delta → inter=3 (incl. the stop
    # shingle "common boilerplate line"), union=5 → 0.6
    assert (1, 2) in out
    assert abs(out[(1, 2)] - 3 / 5) < 1e-9


def test_simhash_jvm_matches_reference_bit_vote(spark):
    # the 64 JVM sum((th>>i)&1) aggregate columns must reproduce the
    # original per-doc NumPy bit-vote exactly, including the signed-long
    # wraparound of bit 63
    import numpy as np

    from dmid_spark.text.dedup import simhash

    docs = spark.createDataFrame(
        [(i, f"token{i} shared common words {i % 3}") for i in range(30)],
        "doc_id long, text string",
    )
    toks = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
        )
        .filter("tok <> ''")
        .select("doc_id", F.xxhash64("tok").alias("th"))
        .toPandas()
    )
    exp = {}
    for doc, grp in toks.groupby("doc_id"):
        h = grp["th"].to_numpy().astype(np.uint64)
        sig = 0
        for i in range(64):
            ones = int(((h >> np.uint64(i)) & np.uint64(1)).sum())
            if 2 * ones > len(h):
                sig |= 1 << i
        exp[doc] = sig - (1 << 64) if sig >= (1 << 63) else sig
    got = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert got == exp


def test_near_duplicate_clusters_matches_union_find(spark):
    from dmid_spark.text import near_duplicate_clusters

    pairs = [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (8, 10)]
    pdf = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    # driver_limit=0 forces the distributed small-star/large-star path (the
    # default would take the driver union-find shortcut on 6 pairs)
    got = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in near_duplicate_clusters(pdf, driver_limit=0).collect()
    }
    # the driver small path must produce identical rows
    small = {
        r["doc_id"]: (r["canonical_id"], r["cluster_size"])
        for r in near_duplicate_clusters(pdf).collect()
    }
    assert small == got
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    exp = {}
    for root, members in comps.items():
        canon, size = min(members), len(members)
        for m in members:
            exp[m] = (canon, size)
    assert got == exp
    # keep-list semantics: keeping doc_id == canonical_id keeps exactly one
    # doc per cluster
    keep = [d for d, (c, _) in got.items() if d == c]
    assert sorted(keep) == [1, 5, 8]


def test_clean_corpus_decision_table(spark):
    from dmid_spark.text import CleanCorpusParams, clean_corpus

    good_en = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "runs to the forest with a friend of the pack in the morning"
    )
    near_en = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "runs to the forest with a friend of the pack in the evening"
    )
    good_de = (
        "der schnelle braune fuchs springt und das tier ist mude und der "
        "wald ist die heimat und das leben ist gut und der tag ist lang"
    )
    docs = spark.createDataFrame(
        [
            (1, good_en),           # keep (canonical of exact + near cluster)
            (2, good_en),           # exact_dup of 1
            (3, near_en),           # near_dup of 1 (one word differs)
            (4, good_de),           # keep (german allowed)
            (5, "short text"),      # quality: < 10 tokens
            (6, "x y z " * 20),     # quality: no stopwords → und + low score
        ],
        "doc_id long, text string",
    )
    params = CleanCorpusParams(
        min_quality=0.5, keep_langs=("de", "en", "es", "fr"),
        num_hashes=32, bands=8,
    )
    out = {r["doc_id"]: r for r in clean_corpus(docs, params).collect()}
    assert len(out) == 6  # one decision row per input doc
    assert out[1]["decision"] == "keep"
    assert out[2]["decision"] == "exact_dup"
    assert out[3]["decision"] == "near_dup"
    assert out[4]["decision"] == "keep" and out[4]["lang_pred"] == "de"
    assert out[5]["decision"] == "quality"
    assert out[6]["decision"] in ("quality", "language")  # quality wins first
    # the kept set is what a training run consumes
    kept = sorted(d for d, r in out.items() if r["decision"] == "keep")
    assert kept == [1, 4]


def test_clean_corpus_language_reason_fires_after_quality(spark):
    from dmid_spark.text import CleanCorpusParams, clean_corpus

    # high-quality english doc, but english not in the allowlist →
    # 'language' (not 'quality') is the recorded reason
    good_en = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "runs to the forest with a friend of the pack in the morning"
    )
    docs = spark.createDataFrame([(1, good_en)], "doc_id long, text string")
    out = clean_corpus(
        docs, CleanCorpusParams(min_quality=0.5, keep_langs=("de",))
    ).collect()
    assert out[0]["decision"] == "language"


def repetition_oracle(text):
    ws = text.lower().strip().split()
    def grams(n):
        return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]
    from collections import Counter
    out = {"n_words": len(ws)}
    out["dup_word_frac"] = 1 - len(set(ws)) / len(ws) if ws else 0.0
    for n, name in ((2, "top_bigram_ratio"), (3, "top_trigram_ratio")):
        g = grams(n)
        out[name] = max(Counter(g).values()) / len(g) if g else 0.0
    g3 = grams(3)
    out["dup_trigram_frac"] = 1 - len(set(g3)) / len(g3) if g3 else 0.0
    return out


def test_repetition_scores(spark):
    from dmid_spark.text import repetition_scores

    docs = docs_df(spark).union(
        spark.createDataFrame(
            [
                (10, "spam spam spam spam spam spam spam"),
                (11, "buy now buy now buy now buy now limited offer"),
                (12, "one two"),
            ],
            "doc_id long, text string",
        )
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_scores(docs).collect()}
    assert set(got) == {d for d, _ in DOCS} | {10, 11, 12}
    for doc_id, text in list(DOCS) + [
        (10, "spam spam spam spam spam spam spam"),
        (11, "buy now buy now buy now buy now limited offer"),
        (12, "one two"),
    ]:
        exp = repetition_oracle(text)
        r = got[doc_id]
        assert r["n_words"] == exp["n_words"], doc_id
        for k in ("dup_word_frac", "top_bigram_ratio", "top_trigram_ratio", "dup_trigram_frac"):
            assert r[k] == pytest.approx(exp[k], abs=1e-9), (doc_id, k)
    # the spam docs trip the flag; clean English prose does not
    assert got[10]["repetitive"] and got[11]["repetitive"]
    assert not got[0]["repetitive"] and not got[3]["repetitive"]


def test_tfidf_top_terms(spark):
    import math
    from collections import Counter
    from dmid_spark.text import tfidf_top_terms

    docs = docs_df(spark)
    out = tfidf_top_terms(docs, k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["tf"], r["tfidf"]))
    # oracle
    texts = {d: t.lower().strip().split() for d, t in DOCS if t.strip()}
    n = len(DOCS)
    df_t = Counter()
    for ws in texts.values():
        df_t.update(set(ws))
    for d, ws in texts.items():
        tf = Counter(ws)
        scored = sorted(
            ((-(tf[t] * (math.log((n + 1) / (df_t[t] + 1)) + 1)), t, tf[t]) for t in tf)
        )[:3]
        exp = [(i + 1, t, c, pytest.approx(-neg, abs=1e-9)) for i, (neg, t, c) in enumerate(scored)]
        assert sorted(got[d]) == exp, d
    assert 6 not in got  # empty doc yields no rows


def test_pack_sequences_matches_oracle(spark):
    from dmid_spark.text import pack_sequences

    rows = [
        (0, "a b c"),            # 3 tokens, start 0
        (1, ""),                 # 0 tokens, start 3
        (2, "d e f g h"),        # 5 tokens, start 3 -> spans the budget-4 cut
        (3, "i j"),              # start 8 -> pack 2 offset 0
        (4, "   "),              # whitespace-only = 0 tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_token"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences(docs, budget=4).collect()
    }
    assert got == {
        0: (3, 0, 0, 0),
        1: (0, 3, 0, 3),
        2: (5, 3, 0, 3),
        3: (2, 8, 2, 0),
        4: (0, 10, 2, 2),
    }
    import pytest as _pt

    with _pt.raises(ValueError):
        pack_sequences(docs, budget=0)


def test_dedup_against_never_pairs_old_corpus(spark):
    """Incremental dedup matches a new batch against a stored signature
    index; the old corpus must NEVER self-pair (the whole point of the
    daily-ingest shape), and matches hit every colliding index doc."""
    from dmid_spark.text import dedup_against, minhash_signatures

    dup_text = (
        "the quick brown fox jumps over the lazy dog again and again "
        "in the soft morning light near the old stone bridge"
    )
    other = (
        "completely different content about tall ships and busy harbors "
        "and the open sea at dawn with wheeling gulls overhead"
    )
    old = spark.createDataFrame(
        [(1, dup_text), (2, dup_text), (3, other)], "doc_id long, text string"
    )
    idx = minhash_signatures(old, shingle_n=3, num_hashes=32)
    # old docs 1 and 2 are identical — every band bucket collides between
    # them — yet an unrelated new batch must yield ZERO pairs: (1, 2) is an
    # old x old pair and the incremental path never generates those
    new_unrelated = spark.createDataFrame(
        [(100, "unrelated words about mountains and snow and rocky trails far away from here today")],
        "doc_id long, text string",
    )
    assert dedup_against(new_unrelated, idx).collect() == []
    # a new doc equal to old 1 pairs with BOTH identical index docs
    new_dup = spark.createDataFrame([(101, dup_text)], "doc_id long, text string")
    rows = {
        (r["new_id"], r["old_id"]): r["est_jaccard"]
        for r in dedup_against(new_dup, idx).collect()
    }
    assert set(rows) == {(101, 1), (101, 2)}
    assert all(v == 1.0 for v in rows.values())


def test_dedup_against_caps_hot_index_buckets(spark):
    """Index-side buckets above max_bucket drop from matching and are
    reported through capped_out, mirroring the other blockers."""
    from dmid_spark.text import dedup_against, minhash_signatures

    boiler = "same boilerplate header text repeated across the whole stored corpus every single day"
    old = spark.createDataFrame(
        [(i, boiler) for i in range(5)], "doc_id long, text string"
    )
    idx = minhash_signatures(old, shingle_n=3, num_hashes=32)
    new = spark.createDataFrame([(100, boiler)], "doc_id long, text string")
    capped: list = []
    got = dedup_against(new, idx, max_bucket=2, capped_out=capped)
    assert got.collect() == []  # every bucket is hot -> nothing matches
    assert capped and all(bsz == 5 for _, _, bsz in capped)


def test_pack_sequences_null_text_is_zero_tokens(spark):
    """NULL text folds into the empty branch (size(split(NULL)) is NULL —
    or -1 under legacy sizeOfNull — either would corrupt every later doc's
    start_token through the prefix sum)."""
    from dmid_spark.text import pack_sequences

    docs = spark.createDataFrame(
        [(0, "a b"), (1, None), (2, "c d e")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_token"])
        for r in pack_sequences(docs, budget=4).collect()
    }
    assert got == {0: (2, 0), 1: (0, 2), 2: (3, 2)}


def test_pack_sequences_precomputed_token_counts(spark):
    """tokens_col drives the packing (real-tokenizer counts computed
    upstream); text is never read, NULL counts pack as 0, and the result is
    bitwise-identical to the integer oracle."""
    from dmid_spark.text import pack_sequences

    docs = spark.createDataFrame(
        [(0, None, 7), (1, "ignored", None), (2, None, 3), (3, None, 6)],
        "doc_id long, text string, bpe_count int",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["start_token"], r["pack_id"], r["pack_offset"])
        for r in pack_sequences(docs, budget=4, tokens_col="bpe_count").collect()
    }
    # exclusive prefix sums of (7, 0, 3, 6): starts 0, 7, 7, 10
    assert got == {
        0: (7, 0, 0, 0),
        1: (0, 7, 1, 3),
        2: (3, 7, 1, 3),
        3: (6, 10, 2, 2),
    }


def test_prepare_training_data_end_to_end(spark):
    from dmid_spark.text import CleanCorpusParams, prepare_training_data

    good_en = (
        "the quick brown fox jumps over the lazy dog and then the fox "
        "runs to the forest with a friend of the pack in the morning"
    )
    other_en = (
        "a tall ship sails to the harbor and the crew is glad of the wind "
        "that is steady in the morning and the sea is calm for the day"
    )
    docs = spark.createDataFrame(
        [
            (1, good_en),        # keep, but contaminated (== benchmark doc 10)
            (2, good_en),        # exact_dup of 1
            (3, other_en),       # keep -> packed
            (5, "short text"),   # quality drop
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(10, good_en)], "doc_id long, text string")
    params = CleanCorpusParams(min_quality=0.5, keep_langs=("de", "en", "es", "fr"))
    packed, decisions = prepare_training_data(
        docs, bench, params=params, decontaminate_n=13, budget=8
    )
    dec = {r["doc_id"]: r["decision"] for r in decisions.collect()}
    assert dec == {1: "contaminated", 2: "exact_dup", 3: "keep", 5: "quality"}
    rows = {r["doc_id"]: r for r in packed.collect()}
    assert list(rows) == [3]  # only the clean, uncontaminated doc packs
    r = rows[3]
    n = len(other_en.split())
    assert (r["n_tokens"], r["start_token"], r["pack_id"], r["pack_offset"]) == (
        n, 0, 0, 0
    )
    # the fan-out points (decisions / kept / contaminated) are materialized
    # once inside prepare_training_data: neither returned frame's plan may
    # re-run the cleaning scan stages (quality regexes, minhash aggregates)
    # — a lineage cut shows up as a checkpoint scan instead
    for frame in (packed, decisions):
        plan = frame._jdf.queryExecution().toString()
        assert "regexp_extract_all" not in plan
        assert "xxhash64" not in plan.lower()


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------
def py_bm25(docs, queries, k=10, k1=1.2, b=0.75):
    import math
    import re

    def toks(s):
        return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]

    n = len(docs)
    tf = {d: {} for d, _ in docs}
    dl = {}
    for d, text in docs:
        ts = toks(text)
        dl[d] = len(ts)
        for t in ts:
            tf[d][t] = tf[d].get(t, 0) + 1
    avgdl = sum(dl.values()) / n
    df = {}
    for d, _ in docs:
        for t in tf[d]:
            df[t] = df.get(t, 0) + 1
    out = {}
    for q, qtext in queries:
        scores = {}
        for t in set(toks(qtext)):
            if t not in df:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            for d in tf:
                if t in tf[d]:
                    f = tf[d][t]
                    s = idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl[d] / avgdl))
                    scores[d] = scores.get(d, 0.0) + s
        ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:k]
        out[q] = ranked
    return out


BM25_DOCS = [
    (0, "spark join agg window sort merge join join"),
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "spark catalyst optimizer pushes filters into the scan"),
    (3, "window functions sort and rank rows per partition"),
    (4, "join strategies: broadcast, shuffle-hash, sort-merge"),
    (5, "dogs and foxes are mammals"),
    (6, ""),
]
BM25_QUERIES = [(0, "spark join"), (1, "lazy dog"), (2, "zebra"), (3, "Sort-MERGE join!")]


def test_bm25_matches_python_oracle(spark):
    from dmid_spark.text import bm25_topk

    docs = spark.createDataFrame(BM25_DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(BM25_QUERIES, "query_id long, query_text string")
    got = bm25_topk(docs, qs, k=3)
    exp = py_bm25(BM25_DOCS, BM25_QUERIES, k=3)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.score))
    for q, ranked in exp.items():
        gq = sorted(by_q.get(q, []))
        assert [d for _, d, _ in gq] == [d for d, _ in ranked], (q, gq, ranked)
        for (_, _, s_got), (_, s_exp) in zip(gq, ranked):
            assert s_got == pytest.approx(s_exp, rel=1e-9)
    # no-hit query yields no rows; ranks are 1..k dense
    assert 2 not in by_q
    assert [r for r, _, _ in sorted(by_q[0])] == list(range(1, len(by_q[0]) + 1))


def test_bm25_term_join_is_candidate_driven(spark):
    # a doc sharing no term with any query must never be scored
    from dmid_spark.text import bm25_topk

    docs = spark.createDataFrame(BM25_DOCS, "doc_id long, text string")
    qs = spark.createDataFrame([(0, "mammals")], "query_id long, query_text string")
    got = bm25_topk(docs, qs, k=10).collect()
    assert {r.doc_id for r in got} == {5}


def test_bm25_empty_corpus_raises(spark):
    from dmid_spark.text import bm25_topk

    docs = spark.createDataFrame([], "doc_id long, text string")
    qs = spark.createDataFrame([(0, "x")], "query_id long, query_text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, qs)


def test_temperature_mixture_matches_numpy(spark):
    import math

    from dmid_spark.text import temperature_mixture

    docs = [
        (1, "en", "a b c d"),
        (2, "en", "x y"),
        (3, "de", "ein zwei drei"),
        (4, "fr", "un"),
        (5, "fr", None),      # NULL text → 0 tokens
        (6, "zh", "  "),      # blank → 0 tokens; zh total 0 → excluded
    ]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    out = {
        r["group"]: (r["n_docs"], r["n_tokens"], r["p"], r["q"], r["repeat_factor"])
        for r in temperature_mixture(df, alpha=0.5, group_col="lang").collect()
    }
    toks = {"en": 6, "de": 3, "fr": 1}
    ndoc = {"en": 2, "de": 1, "fr": 2}
    tot = sum(toks.values())
    p = {g: t / tot for g, t in toks.items()}
    qraw = {g: math.pow(v, 0.5) for g, v in p.items()}
    qs = sum(qraw.values())
    q = {g: v / qs for g, v in qraw.items()}
    r = {g: q[g] / p[g] for g in p}
    rmin = min(r.values())
    assert set(out) == {"en", "de", "fr"}  # zh excluded (0 tokens)
    for g in out:
        assert out[g][0] == ndoc[g] and out[g][1] == toks[g]
        assert out[g][2] == pytest.approx(round(p[g], 9), abs=1e-12)
        assert out[g][3] == pytest.approx(round(q[g], 9), abs=1e-9)
        assert out[g][4] == pytest.approx(round(r[g] / rmin, 9), abs=1e-9)
    # alpha=1 keeps the natural mixture: every repeat_factor is exactly 1
    nat = temperature_mixture(df, alpha=1.0, group_col="lang").collect()
    assert all(row["repeat_factor"] == pytest.approx(1.0, abs=1e-9) for row in nat)
    # flattening monotonicity: smaller alpha boosts the rarest group more
    hot = {
        r["group"]: r["repeat_factor"]
        for r in temperature_mixture(df, alpha=0.2, group_col="lang").collect()
    }
    assert hot["fr"] > out["fr"][4] >= 1.0
    with pytest.raises(ValueError):
        temperature_mixture(df, alpha=0.0)
