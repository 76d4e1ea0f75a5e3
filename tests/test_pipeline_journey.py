"""The full user journey, one test: raw JSONL crawl shards (with corrupt
lines and HTML tag soup) → quarantine → markup strip → quality/language/
dedup gates → cross-doc boilerplate line removal → corpus report →
partitioned parquet snapshot. Every stage is the public operator a user
composes; the assertions pin what survives and why."""

from __future__ import annotations

import gzip
import json

import pytest

from pyspark.sql import functions as F

from tantalus_spark.datapipe.dedup import dedup_lines
from tantalus_spark.datapipe.pipeline import clean_corpus, corpus_report
from tantalus_spark.datapipe.textstats import strip_markup
from tantalus_spark.sources.jsonl import (
    DOCUMENT_SCHEMA, read_jsonl, split_corrupt,
)

BOILER = "Subscribe to our newsletter"
GOOD = ("this is a perfectly ordinary english document with the usual "
        "words and enough measured prose to pass every quality gate")


def _shards(tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    docs = []
    for i in range(8):
        docs.append({"doc_id": i, "source": "web", "lang": "en",
                     "text": f"<p>{GOOD} marker{i}</p>\n{BOILER}"})
    docs.append({"doc_id": 100, "source": "web", "lang": "en",
                 "text": docs[0]["text"]})               # exact dup of 0
    docs.append({"doc_id": 101, "source": "web", "lang": "en",
                 "text": "<div>xxxxxx</div>"})           # fails gates
    lines = [json.dumps(x) for x in docs]
    lines.insert(3, '{"doc_id": 999, "text": "trunc')    # corrupt line
    (d / "shard-0.jsonl").write_text("\n".join(lines[:6]) + "\n")
    with gzip.open(d / "shard-1.jsonl.gz", "wt") as f:
        f.write("\n".join(lines[6:]) + "\n")
    return str(d)


def test_end_to_end_crawl_to_snapshot(spark, tmp_path):
    raw = read_jsonl(spark, _shards(tmp_path), DOCUMENT_SCHEMA)
    clean_rows, quarantined = split_corrupt(raw)
    assert quarantined.count() == 1

    stripped = strip_markup(clean_rows)
    # markup gone before any token statistic sees the text
    assert stripped.filter(F.col("text").contains("<")).count() == 0

    survivors = clean_corpus(
        stripped, min_tokens=5, max_tokens=1000,
        min_alpha_ratio=0.5, langs=("en",))
    ids = {r.doc_id for r in survivors.collect()}
    # 8 originals survive; the exact dup kept min-id 0 (100 dropped);
    # the gibberish doc failed the gates
    assert ids == set(range(8))

    deduped = dedup_lines(
        stripped.join(survivors.select("doc_id"), "doc_id"), min_docs=2)
    rows = {r.doc_id: r for r in deduped.collect()}
    assert all(BOILER not in r.clean_text for r in rows.values())
    assert all(f"marker{i}" in rows[i].clean_text for i in range(8))

    report = corpus_report(
        deduped.select("doc_id", F.col("clean_text").alias("text"))).first()
    assert report.n_docs == 8 and report.dup_ratio == 0.0
    assert report.n_en == 8

    out = str(tmp_path / "snapshot")
    final = deduped.join(
        survivors.select("doc_id", "lang_pred"), "doc_id")
    final.write.partitionBy("lang_pred").parquet(out)
    back = spark.read.parquet(out)
    assert back.count() == 8
    assert {r.lang_pred for r in back.select("lang_pred").collect()} == {"en"}
