"""Streaming ingest end to end: raw corpus stream → clean_corpus_stream
gates → per-micro-batch MERGE into a hive-partitioned parquet snapshot.
Covers bootstrap, incremental merge across restarts (same checkpoint),
batch-parity of the final snapshot, and replay idempotence."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from tantalus_spark.datapipe.pipeline import clean_corpus
from tantalus_spark.streaming.ingest import stream_clean_corpus_to_snapshot

GOOD = ("this is a perfectly ordinary english document with the usual "
        "words and a measured amount of prose to pass the gates")
SPAM = "x" * 40                                  # fails alpha/token gates


def _rows(ids, text=GOOD):
    base = dt.datetime(2024, 1, 1, 12, 0)
    return [(i, f"{text} marker{i}", base + dt.timedelta(minutes=i))
            for i in ids]


SCHEMA = "doc_id long, text string, ts timestamp"


def _run(spark, src_dir, snap, ckpt):
    stream = (spark.readStream.format("parquet").schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).load(src_dir))
    q = stream_clean_corpus_to_snapshot(
        stream, snap, ckpt, min_tokens=5, max_tokens=1000,
        min_alpha_ratio=0.5, langs=("en",))
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_snapshot_bootstrap_parity_and_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    snap = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    first = _rows(range(10)) + [(50, SPAM, dt.datetime(2024, 1, 1))]
    df1 = spark.createDataFrame(first, SCHEMA)
    df1.repartition(2).write.mode("append").parquet(src)
    _run(spark, src, snap, ckpt)

    got = spark.read.parquet(snap)
    want = {r.doc_id for r in clean_corpus(
        df1, min_tokens=5, max_tokens=1000, min_alpha_ratio=0.5,
        langs=("en",)).collect()}
    assert {r.doc_id for r in got.collect()} == want == set(range(10))
    assert "lang_pred" in got.columns             # partition column kept
    assert 50 not in want                         # gate actually fired

    # restart with the SAME checkpoint: only new files process, and the
    # merge upserts into the existing snapshot without touching doc 0-9
    more = spark.createDataFrame(_rows(range(10, 16)), SCHEMA)
    more.coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, snap, ckpt)
    after = {r.doc_id for r in spark.read.parquet(snap).collect()}
    assert after == set(range(16))


def test_merge_batch_replay_is_idempotent(spark, tmp_path):
    """A replayed micro-batch (crash between sink write and checkpoint
    advance) must rewrite the same rows, not duplicate them."""
    from tantalus_spark.sources.sink import merge_into_snapshot

    snap = str(tmp_path / "snap")
    batch = clean_corpus(
        spark.createDataFrame(_rows(range(6)), SCHEMA),
        min_tokens=5, max_tokens=1000, min_alpha_ratio=0.5, langs=("en",))
    batch.write.mode("overwrite").partitionBy("lang_pred").parquet(snap)
    for _ in range(2):                            # replay twice more
        merge_into_snapshot(spark, snap, upserts=batch,
                            key_cols=["doc_id"], partition_col="lang_pred")
    rows = spark.read.parquet(snap).collect()
    assert sorted(r.doc_id for r in rows) == list(range(6))
