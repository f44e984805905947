"""Chunk-level dedup + decontamination (text/chunks.py).

Oracles are hand-computed on tiny corpora; the sf0.01 driver twin covers
the full relation (see __spark_entry__ text_chunk_dedup/text_decontaminate).
"""

import pyspark.sql.functions as F
import pytest

from dmid_spark.text import (
    chunk_dedup_summary,
    chunk_duplicates,
    chunk_table,
    decontaminate,
)
from dmid_spark.text.chunks import CHUNK_STRIDE


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_table_windows_and_remainder(spark):
    d = _docs(spark, [(1, "a b c d e"), (2, "  x   Y  "), (3, "   ")])
    got = chunk_table(d, chunk_words=2).collect()
    # doc 1: [a b][c d][e]; doc 2 normalized to "x y": [x y]; doc 3 blank
    assert sorted((r.doc_id, r.chunk_idx) for r in got) == [
        (1, 0), (1, 1), (1, 2), (2, 0),
    ]
    by = {(r.doc_id, r.chunk_idx): r.chunk_hash for r in got}
    ref = {r.chunk: r.h for r in _docs(spark, []).sparkSession.createDataFrame(
        [("a b",), ("c d",), ("e",), ("x y",)], "chunk string"
    ).select("chunk", F.xxhash64("chunk").alias("h")).collect()}
    assert by[(1, 0)] == ref["a b"]
    assert by[(1, 2)] == ref["e"]
    assert by[(2, 0)] == ref["x y"]


def test_chunk_duplicates_first_occurrence_canonical(spark):
    # chunk "a b" appears at (1,0), (1,2), (5,0); "c d" only once
    d = _docs(spark, [(1, "a b c d a b"), (5, "a b")])
    got = {
        (r.doc_id, r.chunk_idx): (r.canonical_doc, r.canonical_idx, r.n_occurrences)
        for r in chunk_duplicates(d, chunk_words=2).collect()
    }
    assert got == {
        (1, 0): (1, 0, 3),
        (1, 2): (1, 0, 3),
        (5, 0): (1, 0, 3),
    }


def test_chunk_dedup_summary_fractions(spark):
    d = _docs(spark, [(1, "a b c d a b"), (5, "a b"), (9, "z z")])
    got = {r.doc_id: (r.n_chunks, r.n_dup_chunks, r.dup_fraction)
           for r in chunk_dedup_summary(d, chunk_words=2).collect()}
    assert got[1] == (3, 1, pytest.approx(1 / 3))  # (1,2) dups (1,0)
    assert got[5] == (1, 1, 1.0)
    assert got[9] == (1, 0, 0.0)


def test_chunk_hash_mode_md5_same_relation(spark):
    d = _docs(spark, [(1, "a b c d a b"), (5, "a b")])
    fast = chunk_duplicates(d, chunk_words=2).drop("chunk_hash").collect()
    slow = chunk_duplicates(d, chunk_words=2, hash_mode="md5").collect()
    assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))


def test_chunk_words_validation(spark):
    with pytest.raises(ValueError):
        chunk_table(_docs(spark, [(1, "a")]), chunk_words=0)
    assert CHUNK_STRIDE == 1 << 21


def test_decontaminate_ngram_overlap(spark):
    # benchmark holds words 1..4 of doc 10; doc 20 shifted by one still
    # shares the 3-gram "b c d"; doc 30 is disjoint
    docs = _docs(spark, [(10, "a b c d e"), (20, "b c d x y"), (30, "p q r s")])
    bench = _docs(spark, [(900, "a b c d")])
    got = {r.doc_id: r.n_hit_grams for r in decontaminate(docs, bench, n=3).collect()}
    # bench grams: {a b c, b c d}; doc10 hits both, doc20 hits "b c d"
    assert got == {10: 2, 20: 1}


def test_decontaminate_short_docs_no_grams(spark):
    docs = _docs(spark, [(1, "a b"), (2, "a b c")])
    bench = _docs(spark, [(9, "a b c")])
    got = {r.doc_id: r.n_hit_grams for r in decontaminate(docs, bench, n=3).collect()}
    assert got == {2: 1}
    with pytest.raises(ValueError):
        decontaminate(docs, bench, n=0)


def test_decontaminate_no_broadcast_same_result(spark):
    docs = _docs(spark, [(10, "a b c d e"), (30, "p q r s")])
    bench = _docs(spark, [(900, "a b c d")])
    a = sorted(map(tuple, decontaminate(docs, bench, n=3).collect()))
    b = sorted(map(tuple, decontaminate(
        docs, bench, n=3, broadcast_benchmark=False).collect()))
    assert a == b == [(10, 2)]


def test_redact_pii_counts_and_tokens(spark):
    from dmid_spark.text import redact_pii

    d = _docs(spark, [
        (1, "mail a.b-c%d@ex-ample.co.uk and B@x.io now"),
        (2, "call +1 555 010-9999 or 02212345678 done"),
        (3, "plain text only"),
        (4, "mixed u5@y.de then 555-123-4567 end"),
    ])
    got = {r.doc_id: (r.n_emails, r.n_phones, r.text_redacted)
           for r in redact_pii(d).collect()}
    assert got[1] == (2, 0, "mail <EMAIL> and <EMAIL> now")
    assert got[2] == (0, 2, "call <PHONE> or <PHONE> done")
    assert got[3] == (0, 0, "plain text only")
    # the email's digits must not be re-counted as a phone
    assert got[4] == (1, 1, "mixed <EMAIL> then <PHONE> end")


def test_stratified_sample_deterministic_rates(spark):
    from dmid_spark.text import stratified_sample

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(3000)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 0.5, "de": 0.1, "fr": 0.0}
    got = stratified_sample(d, rates, seed=9)
    kept = got.groupBy("lang").count().collect()
    by = {r.lang: r["count"] for r in kept}
    assert "fr" not in by
    assert abs(by["en"] / 1000 - 0.5) < 0.05
    assert abs(by["de"] / 1000 - 0.1) < 0.03
    # content-addressed: same rows at different parallelism / rerun
    again = set(r.doc_id for r in stratified_sample(
        d.repartition(7), rates, seed=9).collect())
    assert again == set(r.doc_id for r in got.collect())
    # unknown group falls back to default_rate
    full = stratified_sample(d, {"nope": 1.0}, seed=9, default_rate=1.0)
    assert full.count() == 3000
    import pytest as _pt

    with _pt.raises(ValueError):
        stratified_sample(d, {"en": 1.5})


def test_group_sample_seeded_k_per_group(spark):
    from dmid_spark.text import group_sample

    rows = [(i, ["en", "de"][i % 2]) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    got = group_sample(d, k=7, seed=5)
    by = {}
    for r in got.collect():
        by.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by["en"]) == 7 and len(by["de"]) == 7
    # reproducible across partitionings; different seed → different sample
    again = group_sample(d.repartition(13), k=7, seed=5)
    assert {(r.doc_id, r.lang) for r in again.collect()} == {
        (i, l) for l, ids in by.items() for i in ids for _ in [0]
    } == {(r.doc_id, r.lang) for r in got.collect()}
    other = {r.doc_id for r in group_sample(d, k=7, seed=6).collect()}
    assert other != {i for ids in by.values() for i in ids}
    import pytest as _pt

    with _pt.raises(ValueError):
        group_sample(d, k=0)


def test_mix_epochs_matches_transliterated_oracle(spark):
    import hashlib

    from dmid_spark.text import mix_epochs

    rows = [(i, ["en", "de", "fr", "zh"][i % 4]) for i in range(400)]
    d = spark.createDataFrame(rows, "doc_id long, lang string")
    weights = {"en": 2.5, "de": 0.4, "zh": 0.0}  # fr falls to default 1.0
    got = {(r.doc_id, r.epoch) for r in mix_epochs(d, weights, seed=7, hash_mode="md5").collect()}

    def n_copies(doc_id: int, lang: str) -> int:
        w = weights.get(lang, 1.0)
        wq = round(w * 1_000_000)
        coin = int(hashlib.md5(f"{doc_id}:mix:7".encode()).hexdigest()[:15], 16) % 1_000_000
        return wq // 1_000_000 + (1 if coin < wq % 1_000_000 else 0)

    want = {(i, e) for i, lang in rows for e in range(1, n_copies(i, lang) + 1)}
    assert got == want
    assert not any(lang == "zh" for (i, _e) in got for lang in [rows[i][1]])
    # deterministic at any parallelism (fast JVM hash mode)
    a = sorted(mix_epochs(d, weights, seed=7).collect(), key=lambda r: (r.doc_id, r.epoch))
    b = sorted(
        mix_epochs(d.repartition(13), weights, seed=7).collect(),
        key=lambda r: (r.doc_id, r.epoch),
    )
    assert a == b
    with pytest.raises(ValueError):
        mix_epochs(d, {"en": 1001.0})


def test_token_budget_sample_greedy_fill_matches_oracle(spark):
    import hashlib

    from dmid_spark.text import token_budget_sample

    rows = [
        (i, ["en", "de", "xx"][i % 3], " ".join(["w"] * (5 + i % 17)))
        for i in range(300)
    ]
    d = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    budgets = {"en": 300, "de": 120}  # xx → default_budget 0 → dropped
    got = {
        r.doc_id: (r.lang, r.n_tokens, r.tokens_before)
        for r in token_budget_sample(d, budgets, seed=3, hash_mode="md5").collect()
    }

    def prio(doc_id: int) -> int:
        return int(hashlib.md5(f"{doc_id}:budget:3".encode()).hexdigest()[:15], 16) % 1_000_000

    want = {}
    for lang, budget in budgets.items():
        docs = sorted(
            ((prio(i), i, 5 + i % 17) for i, l, _t in rows if l == lang),
            key=lambda t: (t[0], t[1]),
        )
        acc = 0
        for _p, i, n in docs:
            if acc < budget:  # greedy fill: a doc that starts in-budget is kept
                want[i] = (lang, n, acc)
            acc += n if acc < budget else 0
    assert got == want
    # the last kept doc may CROSS the budget line — greedy-fill convention
    for lang, budget in budgets.items():
        last = max((v for v in got.values() if v[0] == lang), key=lambda v: v[2])
        assert last[2] < budget <= last[2] + last[1]


def test_token_budget_sample_quality_order_and_tokens_col(spark):
    from dmid_spark.text import token_budget_sample

    rows = [(i, "en", float(i % 10), 10) for i in range(50)]
    d = spark.createDataFrame(rows, "doc_id long, lang string, q double, nt long")
    got = token_budget_sample(
        d, {"en": 100}, by="q", tokens_col="nt", seed=1
    ).collect()
    # budget 100 / 10 tokens each = exactly the 10 best-quality docs:
    # the five q=9 docs, then the five q=8 docs
    assert len(got) == 10
    assert sorted(r.q for r in got) == [8.0] * 5 + [9.0] * 5
    # NULL-token docs count 0 via tokens_col coalesce
    d2 = spark.createDataFrame(
        [(1, "en", 5.0, None), (2, "en", 4.0, 7)], "doc_id long, lang string, q double, nt long"
    )
    r2 = token_budget_sample(d2, {"en": 5}, by="q", tokens_col="nt").collect()
    assert {r.doc_id: r.n_tokens for r in r2} == {1: 0, 2: 7}


def test_shard_assignments_seeded_permutation(spark):
    import hashlib

    from dmid_spark.text import shard_assignments

    d = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    got = shard_assignments(d, n_shards=8, seed=5, hash_mode="md5").collect()
    # every doc exactly once; positions dense 0..k-1 within each shard
    assert len(got) == 500 and len({r.doc_id for r in got}) == 500
    by = {}
    for r in got:
        by.setdefault(r.shard, []).append(r.pos)
    assert set(by) <= set(range(8))
    for _s, ps in by.items():
        assert sorted(ps) == list(range(len(ps)))

    def h(x: str) -> int:
        return int(hashlib.md5(x.encode()).hexdigest()[:15], 16)

    shards = {}
    for i in range(500):
        shards.setdefault(h(f"{i}:shard:5") % 8, []).append(
            (h(f"{i}:order:5") % 1_000_000_000, i)
        )
    want = {}
    for s, lst in shards.items():
        for pos, (_o, i) in enumerate(sorted(lst)):
            want[i] = (s, pos)
    assert {r.doc_id: (r.shard, r.pos) for r in got} == want
    # independent of input partitioning
    again = shard_assignments(d.repartition(11), n_shards=8, seed=5, hash_mode="md5")
    assert {r.doc_id: (r.shard, r.pos) for r in again.collect()} == want
    with pytest.raises(ValueError):
        shard_assignments(d, 0)


# ---------------------------------------------------------------------------
# duplicate n-gram spans (Lee et al. ExactSubstr on token n-grams)
# ---------------------------------------------------------------------------
def _spans_oracle(texts, n, min_docs):
    """Python transliteration of duplicate_ngram_spans."""
    toks = {
        d: t.strip().lower().split()
        for d, t in texts.items()
        if t is not None and t.strip() != ""
    }
    from collections import defaultdict

    gram_docs = defaultdict(set)
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            gram_docs[" ".join(ts[i : i + n])].add(d)
    dup = {g for g, ds in gram_docs.items() if len(ds) >= min_docs}
    out = []
    for d, ts in toks.items():
        marked = [i for i in range(len(ts) - n + 1) if " ".join(ts[i : i + n]) in dup]
        spans = []
        for p in marked:
            # covered ranges [p, p+n-1] overlap-or-touch while
            # p <= prev_max_pos + n (adjacent ranges merge)
            if spans and p <= spans[-1][1] + 1:
                spans[-1] = (spans[-1][0], max(spans[-1][1], p + n - 1), spans[-1][2] + 1)
            else:
                spans.append((p, p + n - 1, 1))
        for s, e, c in spans:
            out.append((d, s, e, c))
    return sorted(out)


def test_duplicate_spans_matches_oracle(spark):
    from dmid_spark.text import duplicate_ngram_spans

    shared = "the quick brown fox jumps over the lazy dog"
    texts = {
        1: f"alpha beta {shared} gamma delta",
        2: f"one two three {shared} four five six",
        3: "totally unique words nothing shared here at all",
        4: f"{shared} {shared}",  # internal repeat + cross-doc duplicate
        5: "",  # empty doc drops out
    }
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    for n in (3, 5):
        got = sorted(
            tuple(r)
            for r in duplicate_ngram_spans(docs, n=n, min_docs=2).collect()
        )
        assert got == _spans_oracle(texts, n, 2), f"n={n}"


def test_duplicate_spans_hash_grams_same_result(spark):
    from dmid_spark.text import duplicate_ngram_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "x y c d e f g h z w"),
            (3, "c d e f g h a a a a"),
        ],
        "doc_id long, text string",
    )
    plain = sorted(tuple(r) for r in duplicate_ngram_spans(docs, n=4).collect())
    hashed = sorted(
        tuple(r) for r in duplicate_ngram_spans(docs, n=4, hash_grams=True).collect()
    )
    assert plain == hashed and len(plain) > 0


def test_duplicate_spans_validates_args(spark):
    import pytest as _pytest

    from dmid_spark.text import duplicate_ngram_spans

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        duplicate_ngram_spans(docs, n=0)
    with _pytest.raises(ValueError):
        duplicate_ngram_spans(docs, min_docs=1)


def test_remove_spans_cuts_exactly_the_masked_tokens(spark):
    from dmid_spark.text import duplicate_ngram_spans, remove_spans

    shared = "l m n o p q"
    docs = spark.createDataFrame(
        [
            (1, f"aa bb {shared} cc dd"),
            (2, f"ee {shared} ff"),
            (3, "gg hh ii"),
            (4, shared),  # fully covered -> empty clean_text
        ],
        "doc_id long, text string",
    )
    spans = duplicate_ngram_spans(docs, n=3, min_docs=2)
    out = {r["doc_id"]: (r["clean_text"], r["n_tokens_removed"]) for r in
           remove_spans(docs, spans).collect()}
    assert out[1] == ("aa bb cc dd", 6)
    assert out[2] == ("ee ff", 6)
    assert out[3] == ("gg hh ii", 0)
    assert out[4] == ("", 6)


# ---------------------------------------------------------------------------
# exact set-similarity join with prefix filtering (AllPairs/PPJoin)
# ---------------------------------------------------------------------------
def _simjoin_oracle(texts, t, n):
    """Brute-force all-pairs exact Jaccard over word n-gram sets."""
    import hashlib

    def sh(text):
        toks = text.lower().split()
        grams = {
            " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
        } - {""}
        return grams

    sets = {d: sh(t_) for d, t_ in texts.items() if t_}
    out = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= t:
                out.append((a, b, len(sets[a]), len(sets[b]), inter))
    return sorted(out)


def test_similarity_join_matches_bruteforce(spark):
    import random

    from dmid_spark.text import similarity_join

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(60)]
    texts = {}
    for d in range(40):
        texts[d] = " ".join(rng.choice(vocab) for _ in range(rng.randint(15, 40)))
    # planted near-duplicates: copy with small edits
    texts[100] = texts[0]
    texts[101] = texts[1] + " extra tail words here"
    texts[102] = "xx " + texts[2]
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    for t in (0.5, 0.75):
        got = sorted(
            (r["doc_a"], r["doc_b"], r["sz_a"], r["sz_b"], r["inter"])
            for r in similarity_join(docs, threshold=t, n=3).collect()
        )
        assert got == _simjoin_oracle(texts, t, 3), f"t={t}"


def test_similarity_join_exactness_includes_identical_pair(spark):
    from dmid_spark.text import similarity_join

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "q r s t u v")],
        "doc_id long, text string",
    )
    rows = similarity_join(docs, threshold=1.0, n=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"], r["jaccard"]) == (1, 2, 1.0)


def test_similarity_join_cap_drops_hot_prefix_buckets(spark):
    from dmid_spark.text import similarity_join

    # every doc shares the same 2-gram vocabulary -> hot prefix buckets;
    # cap=1 kills candidate generation entirely
    docs = spark.createDataFrame(
        [(d, "x y x y x y") for d in range(5)], "doc_id long, text string"
    )
    full = similarity_join(docs, threshold=0.5, n=2).count()
    capped = similarity_join(
        docs, threshold=0.5, n=2, max_prefix_bucket=1
    ).count()
    assert full == 10 and capped == 0


def test_similarity_join_validates_threshold(spark):
    import pytest as _pytest

    from dmid_spark.text import similarity_join

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        similarity_join(docs, threshold=0.0)
    with _pytest.raises(ValueError):
        similarity_join(docs, threshold=1.5)


# ---------------------------------------------------------------------------
# containment join (asymmetric near-subset detection)
# ---------------------------------------------------------------------------
def _containment_oracle(texts, t, n):
    import re

    def sh(text):
        # transliterate _shingles exactly: regex split WITHOUT trim keeps
        # boundary empty tokens (they participate in grams; only the
        # all-empty gram is dropped)
        toks = re.split(r"\s+", text.lower())
        return {
            " ".join(toks[i : i + n]) for i in range(max(len(toks) - n + 1, 0))
        } - {""}

    sets = {d: sh(t_) for d, t_ in texts.items() if t_}
    out = []
    for a in sets:
        for b in sets:
            if a == b or not sets[a]:
                continue
            inter = len(sets[a] & sets[b])
            if inter >= t * len(sets[a]):
                out.append((a, b, len(sets[a]), len(sets[b]), inter))
    return sorted(out)


def test_containment_join_matches_bruteforce(spark):
    import random

    from dmid_spark.text import containment_join

    rng = random.Random(23)
    vocab = [f"w{i}" for i in range(50)]
    texts = {}
    for d in range(30):
        texts[d] = " ".join(rng.choice(vocab) for _ in range(rng.randint(12, 35)))
    # planted containments: short doc quoted inside a much longer one
    texts[200] = texts[0] + " " + texts[1] + " " + texts[2]
    texts[201] = texts[3][: len(texts[3]) // 2]
    docs = spark.createDataFrame(
        [(d, t) for d, t in texts.items()], "doc_id long, text string"
    )
    for t in (0.75, 1.0):
        got = sorted(
            (r["doc_a"], r["doc_b"], r["sz_a"], r["sz_b"], r["inter"])
            for r in containment_join(docs, threshold=t, n=3).collect()
        )
        assert got == _containment_oracle(texts, t, 3), f"t={t}"


def test_containment_join_is_asymmetric(spark):
    from dmid_spark.text import containment_join

    # doc 1 fully inside doc 2; doc 2 NOT inside doc 1
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e f g h i j k l m n")],
        "doc_id long, text string",
    )
    rows = containment_join(docs, threshold=1.0, n=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"], r["containment"]) == (1, 2, 1.0)


def test_containment_join_gram_df_cap(spark):
    from dmid_spark.text import containment_join

    # all docs share all grams -> df cap below corpus size kills candidates
    docs = spark.createDataFrame(
        [(d, "p q p q p q") for d in range(4)], "doc_id long, text string"
    )
    full = containment_join(docs, threshold=0.5, n=2).count()
    capped = containment_join(docs, threshold=0.5, n=2, max_gram_df=1).count()
    assert full == 12 and capped == 0  # 4*3 ordered pairs


def test_duplicate_spans_adjacent_ranges_merge(spark):
    """Covered ranges that touch exactly end-to-end form ONE maximal span
    (the documented contract): doc 1's marked grams at positions 0 and 3
    (n=3) cover [0,2] and [3,5] -> single span (0,5) with 2 grams."""
    from dmid_spark.text import duplicate_ngram_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "a b c x x x"),  # shares gram 'a b c'
            (3, "y y y d e f"),  # shares gram 'd e f'
        ],
        "doc_id long, text string",
    )
    got = sorted(
        tuple(r) for r in duplicate_ngram_spans(docs, n=3, min_docs=2).collect()
    )
    assert (1, 0, 5, 2) in got
    assert not any(r[0] == 1 and r != (1, 0, 5, 2) for r in got)


def test_remove_spans_keeps_empty_documents(spark):
    from dmid_spark.text import duplicate_ngram_spans, remove_spans

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, None)], "doc_id long, text string"
    )
    spans = duplicate_ngram_spans(docs, n=2, min_docs=2)
    out = {r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
           for r in remove_spans(docs, spans).collect()}
    assert out[1] == ("a b c", 0)
    assert out[2] == ("", 0) and out[3] == ("", 0)
