"""Text-analysis operator tests beyond the oracle gate."""

from __future__ import annotations

import pytest

from tantalus_spark.datapipe.textstats import winnowing_fingerprints


@pytest.fixture(scope="module")
def docs(spark):
    shared = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, f"PREFIX words here {shared} SUFFIX tail"),
        (2, f"totally different opening {shared} and another ending"),
        (3, "unrelated content about spark catalyst optimizer internals "
            "and shuffle partitioning strategies for large clusters"),
        (4, "too short"),                    # < k tokens -> no fingerprints
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_run_shares_fingerprints(docs):
    fps = winnowing_fingerprints(docs, k=5, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # docs 1 and 2 share a 10-token run >= k + window - 1 = 8 tokens
    assert by_doc[1] & by_doc[2]
    # doc 3 shares nothing with them
    assert not (by_doc[3] & by_doc[1]) and not (by_doc[3] & by_doc[2])
    # short and null docs produce no fingerprints
    assert 4 not in by_doc and 5 not in by_doc


def test_fingerprints_deterministic(docs):
    a = {(r["doc_id"], r["fp"]) for r in
         winnowing_fingerprints(docs, k=5, window=4).collect()}
    b = {(r["doc_id"], r["fp"]) for r in
         winnowing_fingerprints(docs, k=5, window=4).collect()}
    assert a == b and len(a) > 0
