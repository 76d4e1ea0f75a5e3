"""Versioned serving-index maintenance from a document stream.

The deployment shape SCALING.md's "serving indexes" section describes,
made concrete: the BM25 postings index + its (n_docs, avgdl) stats
sidecar live as IMMUTABLE VERSIONS under one directory, a pointer file
names the current one, refreshes fold each arriving micro-batch in with
:func:`~tantalus_spark.datapipe.textstats.merge_term_index` (O(batch),
never a rebuild) and atomically swap the pointer. Serving sessions
(:func:`~tantalus_spark.datapipe.textstats.bm25_rank_indexed`,
``hybrid_serve_indexed``, ``bm25_serve_stream``) read a version and keep
it for the whole query/run — a swap mid-run is invisible to them, which
is the point of version-swap over in-place mutation.

Local filesystem semantics here (tests run on one box); on an object
store the pointer update maps to the same conditional-put/rename
primitive every table format uses for its commit file. Reference
capability upgraded: the reference app re-queries Postgres per search
(search_util/search_helper.py:27-49) — here the search index is a
maintained, versioned artifact.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_POINTER = "CURRENT"


def _current_version(index_dir: str) -> str | None:
    ptr = os.path.join(index_dir, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return f.read().strip()


def load_term_index(spark: SparkSession, index_dir: str):
    """Read the CURRENT index version: (postings DataFrame,
    (n_docs, avgdl)). Returns (None, (0, 0.0)) when no version has been
    committed yet (empty deployment)."""
    version = _current_version(index_dir)
    if version is None:
        return None, (0, 0.0)
    vdir = os.path.join(index_dir, version)
    with open(os.path.join(vdir, "stats.json")) as f:
        stats = json.load(f)
    postings = spark.read.parquet(os.path.join(vdir, "postings"))
    return postings, (int(stats["n_docs"]), float(stats["avgdl"]))


def _commit_version(index_dir: str, version: str, postings: DataFrame,
                    stats: tuple[int, float]) -> None:
    """Write an immutable version directory, then atomically swap the
    pointer (tmp + rename — the object-store commit-file primitive)."""
    vdir = os.path.join(index_dir, version)
    postings.write.mode("overwrite").parquet(
        os.path.join(vdir, "postings"))
    with open(os.path.join(vdir, "stats.json"), "w") as f:
        json.dump({"n_docs": int(stats[0]), "avgdl": float(stats[1])}, f)
    tmp = os.path.join(index_dir, _POINTER + ".tmp")
    with open(tmp, "w") as f:
        f.write(version)
    os.replace(tmp, os.path.join(index_dir, _POINTER))


def index_refresh_batches(
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    dedup_against_current: bool = False,
    op_col: str | None = None,
):
    """The foreachBatch index maintainer: returns the (batch_df,
    batch_id) callback that folds every arriving document micro-batch
    into the versioned BM25 index under ``index_dir`` — O(batch) work
    per refresh via
    :func:`~tantalus_spark.datapipe.textstats.merge_term_index` (the
    old corpus is never rescanned; its postings parquet is unioned
    lazily and written back), then an atomic pointer swap publishes the
    new version. After any number of batches the CURRENT index is
    bit-identical to a full rebuild over every document seen
    (rebuild-equal test in tests/test_textstats.py).

    ``merge_term_index``'s disjoint-ids contract applies: a doc id
    appearing in two batches would double its postings. Leave
    ``dedup_against_current=False`` when upstream already dedups (the
    q86 novel-docs pass — the production layout); set it True to drop
    already-indexed ids here with a distinct-ids semi-join against the
    current postings (one O(index) column scan per batch — the
    convenience mode, not the 100 TB default; at that scale keep a doc-id
    sidecar or the canonical map instead).

    Exactly-once under replay: foreachBatch is at-least-once — after a
    crash the same ``batch_id`` can fire again, and a naive re-merge
    would DOUBLE that batch's postings. Versions are named by batch id
    (monotone), so the callback skips any batch id at or below the
    committed pointer — the replayed commit becomes a no-op, exactly
    the batch-id-based idempotence Structured Streaming's foreachBatch
    contract prescribes (replay test in tests/test_textstats.py).

    CDC mode (``op_col``): batches carry an operation column with
    ``'add'`` / ``'delete'`` rows and ONE stream maintains the index
    through both sides — deletes prune first (via
    :func:`~tantalus_spark.datapipe.textstats.prune_term_index`, so a
    re-indexed document arrives as delete+add in one batch and lands
    with its NEW postings only), then adds merge. Delete ids are
    intersected with the indexed ids first (same broadcast-pruned
    postings semi-join as the dedup path, output bounded by the batch)
    so a tombstone for a never-indexed id cannot corrupt the stats.

    Wire it: ``doc_stream.writeStream.foreachBatch(
    index_refresh_batches("/path/ix")).start()``.
    """
    from pyspark.sql import functions as F

    from tantalus_spark.datapipe.textstats import (build_term_index,
                                                   merge_term_index,
                                                   prune_term_index)

    os.makedirs(index_dir, exist_ok=True)

    def _on_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = _current_version(index_dir)
        if cur is not None and int(cur[1:]) >= int(batch_id):
            return  # replayed batch: already committed, idempotent skip
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession
        current, stats = load_term_index(spark, index_dir)

        if op_col is not None:
            adds = batch_df.filter(F.col(op_col) == "add").drop(op_col)
            dels = (batch_df.filter(F.col(op_col) == "delete")
                    .select(id_col).distinct())
        else:
            adds, dels = batch_df, None

        changed = False
        postings, new_stats = current, stats
        if dels is not None and postings is not None and dels.take(1):
            # only prune ids that ARE indexed (contract guard): one
            # postings scan broadcast-pruned to the tombstone set
            present = (postings.select(id_col)
                       .join(F.broadcast(dels), id_col, "left_semi")
                       .distinct())
            if present.take(1):
                postings, new_stats = prune_term_index(
                    postings, new_stats, present, id_col=id_col)
                changed = True
        if adds.take(1):
            if postings is not None and dedup_against_current:
                # one postings scan, broadcast-pruned to the batch's
                # ids; `already` is bounded by the batch size
                already = (postings.select(id_col)
                           .join(F.broadcast(adds.select(id_col)
                                             .distinct()),
                                 id_col, "left_semi")
                           .distinct())
                adds = adds.join(F.broadcast(already), id_col,
                                 "left_anti")
            if adds.take(1):
                if postings is None:
                    postings, new_stats = build_term_index(
                        adds, text_col=text_col, id_col=id_col,
                        with_stats=True)
                else:
                    postings, new_stats = merge_term_index(
                        postings, new_stats, adds, text_col=text_col,
                        id_col=id_col)
                changed = True
        if changed:
            _commit_version(index_dir, f"v{int(batch_id):08d}",
                            postings, new_stats)

    return _on_batch
