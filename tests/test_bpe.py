"""BPE vocabulary training (text/bpe.py) vs a transliterated reference.

The reference trainer below is the classic word-frequency BPE loop
(Sennrich et al. 2016) with the same tie-break (count desc, then
lexicographic on the pair) and the same two-pass-replace rewrite the
engine uses — Python ``str.replace`` has the identical left-to-right
non-overlap rule, so the transliteration is exact, not approximate.
"""

from __future__ import annotations

import pytest

from dmid_spark.text.bpe import END_WORD, bpe_segment, bpe_train, word_frequencies


def _spell(word: str) -> str:
    return " ".join(word) + " " + END_WORD


def _apply(sym: str, left: str, right: str) -> str:
    pat, rep = f" {left} {right} ", f" {left}{right} "
    return f" {sym} ".replace(pat, rep).replace(pat, rep).strip()


def _ref_train(freqs: dict[str, int], num_merges: int, min_pair_count: int = 2):
    words = {_spell(w): f for w, f in freqs.items()}
    merges = []
    for rank in range(1, num_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in words.items():
            toks = sym.split(" ")
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((rank, l, r, l + r, cnt))
        words = {_apply(s, l, r): f for s, f in words.items()}
    return merges, words


_CORPUS = (
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3 + ["newer"] * 2
)


def test_bpe_train_matches_reference_trainer(spark):
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(_CORPUS)], "doc_id long, text string"
    )
    res = bpe_train(docs, num_merges=6)
    got = [tuple(r) for r in res.merges.orderBy("rank").collect()]
    freqs: dict[str, int] = {}
    for w in _CORPUS:
        freqs[w] = freqs.get(w, 0) + 1
    want, want_words = _ref_train(freqs, 6)
    assert got == want
    # hand-counted top pair on this corpus: 'w e' in newest(6)+newer(2)+
    # lower(2) = 10, beating 'e s' / 's t' / 't </w>' at 9
    assert got[0] == (1, "w", "e", "we", 10)
    assert (got[1][1], got[1][2], got[1][4]) == ("s", "t", 9)
    # final word spellings match the reference exactly
    got_words = {r.sym: r.freq for r in res.words.collect()}
    assert got_words == want_words


def test_bpe_train_multiword_docs_and_early_stop(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab ab cd"), (2, "ab  cd\tef"), (3, None), (4, "   ")],
        "doc_id long, text string",
    )
    # pairs: (a,b)x4, (c,d)x2, (e,f)x1 (+ </w> pairs); stop before count-1 merges
    res = bpe_train(docs, num_merges=50)
    merges = {(r.left, r.right): r.pair_count for r in res.merges.collect()}
    assert merges[("a", "b")] == 4
    assert res.rounds < 50  # early-stopped at min_pair_count
    assert all(c >= 2 for c in merges.values())
    wf = {r.word: r.freq for r in word_frequencies(docs).collect()}
    assert wf == {"ab": 4, "cd": 2, "ef": 1}
    with pytest.raises(ValueError):
        bpe_train(docs, num_merges=0)


def test_bpe_segment_reproduces_training_spellings(spark):
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(_CORPUS)], "doc_id long, text string"
    )
    res = bpe_train(docs, num_merges=5)
    merge_list = [(r.left, r.right) for r in res.merges.orderBy("rank").collect()]
    seg = bpe_segment(
        res.words.select("word"), merge_list, word_col="word"
    ).collect()
    want = {r.word: r.sym.split(" ") for r in res.words.collect()}
    assert {r.word: list(r.tokens) for r in seg} == want
    # unseen word segments with the learned vocab, falling back to chars
    new = spark.createDataFrame([("lowest",)], "word string")
    toks = bpe_segment(new, merge_list).collect()[0].tokens
    assert "".join(toks) == "lowest" + END_WORD
    assert len(toks) < len("lowest") + 1  # at least one merge applied


def test_bpe_same_symbol_run_variant_is_pinned(spark):
    # documented deviation from the greedy list scan: odd same-symbol runs
    # can right-align the second pair — identical in both engines and in
    # the transliterated reference, so pinned rather than hidden
    docs = spark.createDataFrame([(1, "aaaaa aaaaa aa")], "doc_id long, text string")
    res = bpe_train(docs, num_merges=1)
    m = res.merges.collect()[0]
    assert (m.left, m.right) == ("a", "a")
    syms = {r.word: r.sym for r in res.words.collect()}
    assert syms["aaaaa"] == _apply(_spell("aaaaa"), "a", "a")
    assert syms["aa"] == "aa " + END_WORD


def test_bpe_segment_pandas_parity_and_large_vocab(spark):
    from dmid_spark.text.bpe import bpe_segment_pandas

    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(_CORPUS)], "doc_id long, text string"
    )
    res = bpe_train(docs, num_merges=5)
    merge_list = [(r.left, r.right) for r in res.merges.orderBy("rank").collect()]
    words = res.words.select("word")
    expr_path = {r.word: list(r.tokens) for r in bpe_segment(words, merge_list).collect()}
    udf_path = {
        r.word: list(r.tokens) for r in bpe_segment_pandas(words, merge_list).collect()
    }
    assert expr_path == udf_path  # bitwise-interchangeable paths
    # a vocab far past the codegen-safe range still segments correctly
    big = [(f"s{i}", f"s{i}x") for i in range(300)]  # no-op merges + real ones
    toks = bpe_segment_pandas(
        spark.createDataFrame([("lowest",)], "word string"), big + merge_list
    ).collect()[0].tokens
    assert "".join(toks) == "lowest" + END_WORD
