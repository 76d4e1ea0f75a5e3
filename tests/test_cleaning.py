"""r4 corpus-cleaning additions: cross-document line dedup (CCNet-style
boilerplate removal), graded contamination scoring, the logistic quality
classifier, and PII scrubbing."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tantalus_spark.datapipe.dedup import contamination_scores, dedup_lines
from tantalus_spark.datapipe.textstats import (
    PII_PATTERNS,
    quality_classifier,
    scrub_pii,
)


@pytest.fixture(scope="module")
def line_docs(spark):
    rows = [
        (1, "Cookie notice\nreal content one\nSubscribe now!"),
        (2, "Cookie Notice\nunique middle line\nSubscribe now!"),
        (3, "totally original document\nwith its own lines"),
        (4, "Cookie notice"),                       # all boilerplate
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_lines_drops_cross_doc_boilerplate(line_docs):
    out = {r.doc_id: r for r in dedup_lines(line_docs, min_docs=2).collect()}
    assert set(out) == {1, 2, 3, 4}
    # 'Cookie notice' matches case-insensitively across docs 1/2/4;
    # 'Subscribe now!' across 1/2 — both dropped
    assert out[1].clean_text == "real content one"
    assert out[1].n_lines_kept == 1 and out[1].n_lines_dropped == 2
    assert out[2].clean_text == "unique middle line"
    # untouched doc keeps original line order and count
    assert out[3].clean_text == "totally original document\nwith its own lines"
    assert out[3].n_lines_dropped == 0
    # fully-boilerplate doc survives with empty text (caller's policy)
    assert out[4].clean_text == "" and out[4].n_lines_kept == 0


def test_dedup_lines_preserves_order(spark):
    text = "z last\nshared\na first\nshared\nm middle"
    df = spark.createDataFrame(
        [(1, text), (2, "shared")], ["doc_id", "text"])
    out = {r.doc_id: r for r in dedup_lines(df, min_docs=2).collect()}
    assert out[1].clean_text == "z last\na first\nm middle"
    assert out[1].n_lines_dropped == 2


def test_contamination_scores_fraction(spark):
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], ["text"])
    docs = spark.createDataFrame([
        # 4 distinct 5-gram shingles, 2 in the benchmark
        (10, "quick brown fox jumps over the lazy wombat here"),
        (11, "nothing in common with anything benchmarked at all"),
        (12, "too short"),                      # < n tokens: no shingles
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           contamination_scores(docs, bench, n=5).collect()}
    assert 12 not in out                        # absent, vacuously clean
    assert out[11].n_hits == 0 and out[11].overlap == 0.0
    assert out[10].n_shingles == 5
    assert out[10].n_hits == 3                  # windows 1-3 hit
    assert out[10].overlap == pytest.approx(0.6)


def test_quality_classifier_orders_and_threshold(spark):
    good = ("This is a well formed paragraph of ordinary english prose "
            "with words and sentences that continue for a while longer.")
    bad = "x\nx\nx\nx\nx\nx\nx\nx"              # repetitive, tiny
    df = spark.createDataFrame([(1, good), (2, bad)], ["doc_id", "text"])
    out = {r.doc_id: r for r in quality_classifier(df).collect()}
    assert out[1].quality_score > out[2].quality_score
    assert 0.0 <= out[2].quality_score <= out[1].quality_score <= 1.0
    assert out[1].keep
    # keep must agree with the score against the threshold
    for r in out.values():
        assert r.keep == (r.quality_score >= 0.5) or \
            abs(r.quality_score - 0.5) < 1e-3
    # weight override steers the decision
    strict = {r.doc_id: r for r in quality_classifier(
        df, weights={"dup_line_ratio": -50.0}).collect()}
    assert not strict[2].keep


def test_scrub_pii_counts_and_redacts(spark):
    df = spark.createDataFrame([
        (1, "mail bob.smith+x@example.co.uk and 10.20.30.40 now"),
        (2, "ssn 123-45-6789 tel 555-123-4567"),
        (3, "clean text without identifiers"),
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in scrub_pii(df).collect()}
    assert out[1].n_email == 1 and out[1].n_ipv4 == 1 and out[1].n_pii == 2
    assert out[1].text == "mail [EMAIL] and [IP] now"
    # SSN pattern wins over the phone pattern for 3-2-4 digit groups,
    # and counts are computed pre-redaction so both report correctly
    assert out[2].n_ssn == 1 and out[2].n_phone == 1
    assert out[2].text == "ssn [SSN] tel [PHONE]"
    assert out[3].n_pii == 0 and out[3].text == "clean text without identifiers"
    assert set(PII_PATTERNS) == {"email", "ipv4", "ssn", "phone"}


def test_strip_markup(spark):
    from tantalus_spark.datapipe.textstats import strip_markup

    html = ("<html><head><STYLE>p { color: red }</STYLE>"
            "<script type='x'>var a = '<b>not text</b>';</script></head>"
            "<body><!-- hidden --><p class='x'>Hello &amp; welcome"
            "</p>\n<div>to the &lt;real&gt; corpus</div></body></html>")
    df = spark.createDataFrame(
        [(1, html), (2, "plain text stays untouched")], ["doc_id", "text"])
    out = {r.doc_id: r for r in strip_markup(df).collect()}
    assert out[1].text == "Hello & welcome\nto the <real> corpus"
    assert out[1].n_tags_removed > 5
    assert out[2].text == "plain text stays untouched"
    assert out[2].n_tags_removed == 0


def test_corpus_report_single_row(spark):
    from tantalus_spark.datapipe.pipeline import corpus_report

    df = spark.createDataFrame([
        (1, "the cat and the dog of a house"),      # en, 8 tokens
        (2, "the cat and the dog of a house"),      # exact dup of 1
        (3, "el perro y la casa de los gatos"),     # es, 8 tokens
        (4, "zzz qqq"),                             # unknown
    ], ["doc_id", "text"])
    r = corpus_report(df).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_docs == 4 and row.n_distinct == 3
    assert row.dup_ratio == pytest.approx(0.25)
    assert row.n_en == 2 and row.n_es == 1 and row.n_unknown == 1
    assert row.total_tokens == 8 + 8 + 8 + 2
    assert row.p90_tokens >= row.p50_tokens


from hypothesis import given, settings, strategies as st

_line = st.sampled_from(["alpha", "Alpha ", "beta", "", "gamma delta", "x"])
_doc = st.lists(_line, min_size=1, max_size=5).map("\n".join)


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(_doc, min_size=1, max_size=5),
       min_docs=st.integers(min_value=2, max_value=3))
def test_dedup_lines_differential(spark, texts, min_docs):
    """Property: dedup_lines == a 10-line pure-Python reference for any
    small corpus — same survivors, same order, same counts."""
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r.doc_id: (r.clean_text, r.n_lines_kept, r.n_lines_dropped)
           for r in dedup_lines(df, min_docs=min_docs).collect()}

    freq: dict[str, set[int]] = {}
    for i, t in enumerate(texts):
        for ln in t.split("\n"):
            freq.setdefault(ln.strip().lower(), set()).add(i)
    boiler = {k for k, docs in freq.items() if len(docs) >= min_docs}
    for i, t in enumerate(texts):
        lines = t.split("\n")
        kept = [ln for ln in lines if ln.strip().lower() not in boiler]
        want = ("\n".join(kept), len(kept), len(lines) - len(kept))
        assert got[i] == want, (i, got[i], want)


def test_source_report_known_values(spark):
    from tantalus_spark.datapipe.pipeline import source_report

    docs = spark.createDataFrame([
        (1, "a b c", "web"),
        (2, "a b c", "web"),          # exact dup within source
        (3, "d e", "web"),
        (4, "x y z w", "books"),
    ], "doc_id long, text string, source string")
    got = {r["source"]: r.asDict() for r in source_report(docs).collect()}
    web = got["web"]
    assert (web["n_docs"], web["total_tokens"]) == (3, 8)
    assert web["n_distinct"] == 2
    assert web["dup_ratio"] == round(1 - 2 / 3, 4)
    assert web["mean_tokens"] == round(8 / 3, 4)
    books = got["books"]
    assert (books["n_docs"], books["total_tokens"], books["dup_ratio"]) == (1, 4, 0.0)


def test_build_corpus_stage_composition(spark):
    """build_corpus must drop: the bench slice itself, gate failures
    (short/gibberish/duplicate), 5-gram-contaminated docs, and the
    LM-cost tail tercile — and report the rest per source."""
    from tantalus_spark.datapipe.pipeline import build_corpus

    en = ("the cat and the dog sat on the mat near the door and "
          "the bird flew over the house in the morning light")
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        # bench slice (doc_id < 100)
        (1, bench_text, "bench"),
        # clean survivors (distinct en docs, no bench overlap)
        (101, en, "web"),
        (102, en + " but the cat ran away before the dawn came up", "web"),
        (103, "the dog and the cat walked along the road to the old "
              "barn where the farmer kept the hay for the cold winter",
         "books"),
        (104, "the house near the river had a red roof and a small "
              "garden where the children played in the warm summer sun",
         "books"),
        (105, "the teacher read the book to the class while the rain "
              "fell on the roof of the school all through the day",
         "web"),
        (106, "the ship sailed across the sea to the far land where "
              "the people built a town by the shore of the bay",
         "books"),
        # exact duplicate of 101 -> dropped (keep-min-id)
        (201, en, "web"),
        # contaminated: contains a bench 5-gram -> dropped
        (202, "the story begins alpha beta gamma delta epsilon and then "
              "the tale goes on with many other common words here",
         "web"),
        # too short -> gate drop
        (203, "tiny doc", "web"),
        # non-alpha -> gate drop
        (204, "1234 5678 9999 0000 1111 2222 3333 4444 5555 6666 7777",
         "web"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r
           for r in build_corpus(df, F.col("doc_id") < 100,
                                 shingle_n=5).collect()}
    # survivors before the tercile cut: 101-106 (6 docs); the tail third
    # (2 docs) is dropped -> 4 kept, none from bench, none of 201-204
    kept_total = sum(r["n_docs"] for r in out.values())
    assert kept_total == 4
    all_id_sum = sum(r["id_sum"] for r in out.values())
    assert 201 not in out and all_id_sum < 101 + 102 + 103 + 104 + 105 + 106
    for r in out.values():
        assert r["min_cost_millibits"] <= r["max_cost_millibits"]
    assert set(out) <= {"web", "books"}
