"""Differential test: Spark BPE trainer vs a pure-Python reference
implementation (same tokenization, same tie-break), plus edge cases."""

from __future__ import annotations

from collections import Counter

import pytest

from tantalus_spark.datapipe.textstats import py_tokens
from tantalus_spark.datapipe.tokenizer import (
    END_OF_WORD,
    bpe_train,
    merge_word,
)


def py_bpe_train(texts, n_merges):
    """Reference BPE trainer: word-freq table, then iterative argmax
    merge with (freq desc, left asc, right asc) tie-break — the exact
    contract of tokenizer.bpe_train."""
    freqs = Counter()
    for t in texts:
        if t is None:
            continue
        for w in py_tokens(t.lower()):
            if w:
                freqs[w] += 1
    vocab = {w: list(w) + [END_OF_WORD] for w in freqs}
    rules = []
    for rank in range(1, n_merges + 1):
        pair_counts = Counter()
        for w, syms in vocab.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] += f
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), freq = best
        if freq < 2:
            break
        rules.append((rank, left, right, left + right, freq))
        vocab = {w: merge_word(s, left, right) for w, s in vocab.items()}
    return rules


@pytest.fixture(scope="module")
def corpus():
    return [
        "the cat sat on the mat",
        "the cats sat on the mats",
        "a catalog of cats and more cats",
        "low lower lowest newer newest",
        "low lower lowest newer newest",
        None,
        "   ",
    ]


def test_bpe_matches_python_reference(spark, corpus):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    got = [(r["rank"], r["left"], r["right"], r["merged"], r["pair_freq"])
           for r in bpe_train(df, n_merges=10).orderBy("rank").collect()]
    want = py_bpe_train(corpus, n_merges=10)
    assert got == want
    assert len(got) == 10  # corpus is rich enough for all 10 merges


def test_bpe_learns_multichar_units(spark, corpus):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    rules = bpe_train(df, n_merges=12).collect()
    # after enough merges, some learned unit spans 3+ chars (subword!)
    assert any(len(r["merged"].replace(END_OF_WORD, "")) >= 3
               for r in rules)


def test_bpe_stops_when_no_repeating_pairs(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "doc_id long, text string")
    # every pair occurs once (< 2) -> no rules learned
    assert bpe_train(df, n_merges=5).count() == 0


def py_bpe_encode(text, rules):
    out = []
    for w in py_tokens(text.lower()):
        if not w:
            continue
        u = list(w) + [END_OF_WORD]
        for _, left, right, _, _ in rules:
            u = merge_word(u, left, right)
        out.extend(u)
    return out


def test_bpe_apply_matches_python_reference(spark, corpus):
    from tantalus_spark.datapipe.tokenizer import bpe_apply

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string")
    rules_df = bpe_train(df, n_merges=10)
    rules = py_bpe_train(corpus, n_merges=10)
    got = {r["doc_id"]: list(r["units"])
           for r in bpe_apply(df, rules_df).collect()}
    for i, t in enumerate(corpus):
        if t is None:
            assert got[i] == []
        else:
            assert got[i] == py_bpe_encode(t, rules), (i, t)


def test_bpe_apply_is_lossless(spark, corpus):
    # stripping the EOW markers and concatenating units reconstructs the
    # lowercased tokens exactly — encoding loses nothing
    from tantalus_spark.datapipe.tokenizer import bpe_apply

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus) if t], "doc_id long, text string")
    rules_df = bpe_train(df, n_merges=10)
    for r in bpe_apply(df, rules_df).collect():
        text = corpus[r["doc_id"]]
        rebuilt = "".join(r["units"]).replace(END_OF_WORD, " ").rstrip()
        assert rebuilt == " ".join(w for w in py_tokens(text.lower()) if w)


def test_merge_word_overlapping_pairs_left_to_right():
    # "aaa": one (a,a) merge left-to-right -> ["aa", "a"], not ["a", "aa"]
    assert merge_word(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert merge_word(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]


def test_bpe_compression_known_values(spark):
    """chars/unit is exact BIGINT division; empty/null-text docs count
    toward n_docs but add zero units; zero-unit slices are omitted."""
    from tantalus_spark.datapipe.tokenizer import bpe_compression

    rows = [
        (1, "ab ab", "s1"),        # with merge (a,b): 2 words x 2 units
        (2, "ab", "s1"),
        (3, None, "s1"),           # counted, zero chars/units
        (4, "", "s2"),             # zero-unit slice -> omitted
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r.asDict()
           for r in bpe_compression(df, [("a", "b")]).collect()}
    assert set(out) == {"s1"}
    s1 = out["s1"]
    # "ab ab" -> 2 words, each (ab,</w>) = 2 units -> 4; "ab" -> 2
    assert s1["n_docs"] == 3 and s1["n_units"] == 6
    assert s1["n_chars"] == 5 + 2          # len("ab ab") + len("ab")
    assert s1["chars_per_unit"] == round(7 / 6, 4)
