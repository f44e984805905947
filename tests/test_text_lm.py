"""Tests for the bigram LM perplexity scorer, DSIR importance weights,
and weighted sampling — each against a transliterated NumPy/py oracle."""

from __future__ import annotations

import hashlib
import math

import pytest

from dmid_spark.text import dsir_weights, lm_perplexity, lm_train, weighted_sample
from dmid_spark.text.sampling import SAMPLE_RES

DOCS = [
    (0, "the cat sat on the mat"),
    (1, "the dog sat on the log"),
    (2, "a cat and a dog"),
    (3, ""),            # empty → n_tokens 0, ppl NULL
    (4, None),          # NULL → same
    (5, "zebra"),       # single token → unigram-only score
    (6, "the the the the"),  # degenerate repetition
]


def _py_lm(docs, alpha):
    toks = {i: (t.lower().split() if t else []) for i, t in docs}
    uni, bi = {}, {}
    for ts in toks.values():
        for w in ts:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    n_total, vocab = sum(uni.values()), len(uni)
    out = {}
    for i, ts in toks.items():
        if not ts:
            out[i] = (0, None)
            continue
        lp = math.log((uni.get(ts[0], 0) + alpha) / (n_total + alpha * vocab))
        for a, b in zip(ts, ts[1:]):
            lp += math.log((bi.get((a, b), 0) + alpha) / (uni.get(a, 0) + alpha * vocab))
        out[i] = (len(ts), round(math.exp(-lp / len(ts)), 6))
    return out


def test_lm_perplexity_matches_py_oracle(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    uni, bi = lm_train(docs)
    got = {
        r.doc_id: (r.n_tokens, r.ppl)
        for r in lm_perplexity(docs, uni, bi, alpha=0.1).collect()
    }
    assert got == _py_lm(DOCS, 0.1)


def test_lm_perplexity_ranks_in_domain_text_lower(spark):
    # docs made of corpus-frequent bigrams score lower ppl than OOV text
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    extra = spark.createDataFrame(
        [(10, "the cat sat on the log"), (11, "qq ww ee rr tt yy")],
        "doc_id long, text string",
    )
    uni, bi = lm_train(docs)
    got = {r.doc_id: r.ppl for r in lm_perplexity(extra, uni, bi).collect()}
    assert got[10] < got[11]


def test_lm_perplexity_broadcast_flag_equivalent(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    uni, bi = lm_train(docs)
    a = sorted(lm_perplexity(docs, uni, bi, broadcast_vocab=True).collect())
    b = sorted(lm_perplexity(docs, uni, bi, broadcast_vocab=False).collect())
    assert a == b


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_dsir_weights_match_py_oracle(spark):
    n_buckets = 64
    source = spark.createDataFrame(DOCS, "doc_id long, text string")
    target_rows = [(100, "the cat sat"), (101, "a cat and a cat")]
    target = spark.createDataFrame(target_rows, "doc_id long, text string")

    def bucket_counts(rows):
        c = {}
        for _, t in rows:
            for w in (t.lower().split() if t else []):
                b = _md5_60(w) % n_buckets
                c[b] = c.get(b, 0) + 1
        return c

    cs, ct = bucket_counts(DOCS), bucket_counts(target_rows)
    ns, nt = sum(cs.values()), sum(ct.values())
    ratio = {
        b: math.log((ct.get(b, 0) + 1.0) / (nt + n_buckets))
        - math.log((cs.get(b, 0) + 1.0) / (ns + n_buckets))
        for b in set(cs) | set(ct)
    }
    expect = {}
    for i, t in DOCS:
        ws = t.lower().split() if t else []
        if not ws:
            expect[i] = (0, None)
        else:
            expect[i] = (
                len(ws),
                round(sum(ratio[_md5_60(w) % n_buckets] for w in ws), 6),
            )

    got = {
        r.doc_id: (r.n_tokens, r.logweight)
        for r in dsir_weights(
            source, target, n_buckets=n_buckets, hash_mode="md5"
        ).collect()
    }
    assert got == expect
    # target-like docs (cat-heavy) must outrank unrelated ones
    assert got[2][1] > got[1][1]


def test_weighted_sample_matches_py_oracle_and_respects_weights(spark):
    rows = [(i, float(1 + (i % 5) * 10)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = [
        (r.doc_id, r.sample_key)
        for r in weighted_sample(df, 30, "w", seed=7, hash_mode="md5").collect()
    ]

    def key(i, w):
        draw = _md5_60(f"{i}:wsample:7") % SAMPLE_RES
        return round(math.log((draw + 1) / SAMPLE_RES) / w, 6)

    expect = sorted(
        ((i, key(i, w)) for i, w in rows), key=lambda t: (-t[1], t[0])
    )[:30]
    assert sorted(got) == sorted(expect)
    # heavier rows must be strongly over-represented in the sample
    heavy = sum(1 for i, _ in got if i % 5 == 4)
    light = sum(1 for i, _ in got if i % 5 == 0)
    assert heavy > light


def test_weighted_sample_excludes_nonpositive_and_null(spark):
    df = spark.createDataFrame(
        [(0, 1.0), (1, 0.0), (2, -3.0), (3, None), (4, 2.0)],
        "doc_id long, w double",
    )
    kept = {r.doc_id for r in weighted_sample(df, 10, "w").collect()}
    assert kept == {0, 4}


def test_weighted_sample_validates_k(spark):
    df = spark.createDataFrame([(0, 1.0)], "doc_id long, w double")
    with pytest.raises(ValueError):
        weighted_sample(df, 0, "w")
