#!/usr/bin/env python
"""Bound the unsorted-delta-segment serve tail (r12 verdict item 5).

Only compaction folds are term-sorted (`sort_folds=True`); delta
segments are written unsorted, so a freshness serve over a
long-unfolded store decodes ALL row groups of every delta. This
script measures how serve cost actually grows with
segments-since-last-fold: build a q152-shape store whose base is ONE
term-sorted folded segment (half the corpus), then append K unsorted
delta commits (the other half, split K ways) with compaction disabled
(max_segments raised), measuring at checkpoints (a) serve wall
(load_term_index + bm25_rank_indexed, min of N), (b) per-leaf
row-group decode counts for the probe terms (what the pushed
IN-filter keeps), and (c) the manifest's delta-vs-base byte split —
the linear model a deployment would use to pick max_segments.

parquet.block.size is pinned small so files carry MANY row groups
(the corpus-scale layout; single-file small-SF fixtures hide row-group
effects — the r3 q53 lesson).

Usage: python scripts/measure_delta_tail.py /root/repo/.benchdata/sf1 [reps] [K]
Prints one JSON line.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

TERMS = ["customer", "merge", "sort"]


def serve_time(spark, ix, reps):
    from tantalus_spark.datapipe.textstats import bm25_rank_indexed
    from tantalus_spark.streaming.maintenance import load_term_index

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        postings, (n, avgdl) = load_term_index(spark, ix)
        bm25_rank_indexed(postings, TERMS, k=15, n_docs=n,
                          avgdl=avgdl).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def rowgroup_stats(files):
    """(overlapping, total) row groups for the probe terms — what the
    pushed term IN-filter's min/max pruning keeps for the reader."""
    import pyarrow.parquet as pq

    total = hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        ci = md.schema.to_arrow_schema().names.index("term")
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(ci)
            total += 1
            st = col.statistics
            if st is None or not st.has_min_max:
                hit += 1  # no stats -> reader must decode it
                continue
            if any(st.min <= t <= st.max for t in TERMS):
                hit += 1
    return hit, total


def seg_files(ix, folded):
    """Postings files of the CURRENT manifest's segments only — the
    store dir also retains superseded pre-fold segments while older
    manifests reference them (keep_versions), and those must not
    count: a serve never reads them."""
    from tantalus_spark.streaming.maintenance import (_current_version,
                                                      _read_manifest)

    m = _read_manifest(ix, _current_version(ix))
    out = []
    for s in m["segments"]:
        if s["name"].endswith("c") != folded:
            continue
        out += sorted(glob.glob(os.path.join(ix, s["name"], "postings",
                                             "*.parquet")))
    return out


def manifest_bytes(ix):
    from tantalus_spark.streaming.maintenance import (_current_version,
                                                      _read_manifest)

    m = _read_manifest(ix, _current_version(ix))
    base = sum(int(s["bytes"]) for s in m["segments"]
               if s["name"].endswith("c"))
    delta = sum(int(s["bytes"]) for s in m["segments"]
                if not s["name"].endswith("c"))
    return base, delta


def main():
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 12

    from pyspark.sql import functions as F

    from tantalus_spark import get_spark
    from tantalus_spark.inventory import db_for
    from tantalus_spark.streaming.maintenance import index_refresh_batches

    spark = get_spark("deltatail")
    spark.sparkContext._jsc.hadoopConfiguration().setInt(
        "parquet.block.size", 1 << 20)
    docs = db_for(spark, sf_dir).table("documents").select("doc_id",
                                                           "text")
    ix = tempfile.mkdtemp(prefix="tantalus_deltatail_")
    try:
        # base: half the corpus, FULL-folded (max_segments=1) into one
        # term-sorted segment — the post-promotion steady state
        cb = index_refresh_batches(ix, max_segments=1, sort_folds=True)
        cb(docs.filter(F.col("doc_id") % 4 == 0), 0)
        cb(docs.filter(F.col("doc_id") % 4 == 2), 1)  # full fold
        # tail: K unsorted delta commits, compaction disabled
        cb_tail = index_refresh_batches(ix, max_segments=k + 2,
                                        sort_folds=True)
        points = []

        def measure(n_deltas):
            base_b, delta_b = manifest_bytes(ix)
            points.append({
                "n_deltas": n_deltas,
                "serve_s": serve_time(spark, ix, reps),
                "rg_base": rowgroup_stats(seg_files(ix, True)),
                "rg_delta": rowgroup_stats(seg_files(ix, False)),
                "base_bytes": base_b, "delta_bytes": delta_b})

        measure(0)
        marks = {1, 2, 4, 8, k}
        for j in range(k):
            cb_tail(docs.filter(
                (F.col("doc_id") % 2 == 1)
                & ((F.col("doc_id") / F.lit(2)).cast("long")
                   % k == j)), 2 + j)
            if j + 1 in marks:
                measure(j + 1)
        print(json.dumps({"sf_dir": sf_dir, "terms": TERMS, "k": k,
                          "points": points}))
    finally:
        shutil.rmtree(ix, ignore_errors=True)


if __name__ == "__main__":
    main()
