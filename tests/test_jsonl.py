"""JSONL corpus IO: schema-pinned reads, corrupt-line quarantine,
sharded round-trip."""

from __future__ import annotations

import gzip
import json

import pytest

from pyspark.sql import types as T

from tantalus_spark.sources.jsonl import (
    CORRUPT_COL,
    DOCUMENT_SCHEMA,
    read_jsonl,
    split_corrupt,
    write_jsonl,
)


@pytest.fixture()
def corpus_dir(tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "source": "web",
                    "lang": "en"}),
        json.dumps({"doc_id": 2, "text": "hola", "source": "web",
                    "lang": "es"}),
        '{"doc_id": 3, "text": "truncated',          # malformed
        "not json at all",                            # malformed
        json.dumps({"doc_id": 4, "text": "ok", "source": None,
                    "lang": None}),
    ]
    p = tmp_path / "corpus"
    p.mkdir()
    (p / "part-0.jsonl").write_text("\n".join(lines[:3]) + "\n")
    with gzip.open(p / "part-1.jsonl.gz", "wt") as f:   # mixed codecs
        f.write("\n".join(lines[3:]) + "\n")
    return str(p)


def test_read_quarantines_corrupt_lines(spark, corpus_dir):
    df = read_jsonl(spark, corpus_dir, DOCUMENT_SCHEMA)
    clean, bad = split_corrupt(df)
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1].text == "hello world" and rows[4].source is None
    assert CORRUPT_COL not in clean.columns
    raw = {r.raw_line for r in bad.collect()}
    assert raw == {'{"doc_id": 3, "text": "truncated', "not json at all"}


def test_schema_is_never_inferred(spark, corpus_dir):
    # a schema missing 'lang' simply doesn't produce the column — no
    # inference pass resurrects it
    narrow = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    df = read_jsonl(spark, corpus_dir, narrow)
    assert set(df.columns) == {"doc_id", "text", CORRUPT_COL}
    with pytest.raises(ValueError):
        read_jsonl(spark, corpus_dir, T.StructType(
            [T.StructField(CORRUPT_COL, T.StringType())]))


def test_roundtrip_sharded_gzip(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, f"doc {i}", "web", "en") for i in range(100)],
        DOCUMENT_SCHEMA)
    out = str(tmp_path / "out")
    write_jsonl(df, out, target_rows_per_file=30)
    back = read_jsonl(spark, out, DOCUMENT_SCHEMA)
    clean, bad = split_corrupt(back)
    assert bad.count() == 0
    assert sorted(r.doc_id for r in clean.collect()) == list(range(100))
    import glob
    shards = glob.glob(f"{out}/part-*.json.gz")
    assert shards, "expected gzip shards"
