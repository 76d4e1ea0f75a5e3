#!/usr/bin/env python
"""Measure the sorted-fold trade (r11 regression note / r12 verdict
item): does term-sorting the compaction fold pay back on the serve
side at 10x/30x?

Builds the q152 CDC lifecycle twice per SF — sort_folds=True vs
False — then measures (a) fold-inclusive build wall, (b) serve wall
(load_term_index + bm25_rank_indexed, min of N), and (c) parquet
row-group pruning on the folded segment: how many row groups' term
min/max ranges overlap the probe terms (what Spark's pushed IN-filter
decodes) out of the total. parquet.block.size is pinned small so the
folded files carry MANY row groups — the layout a 100 TB store has
naturally, which single-file small-SF fixtures hide.

Usage: python scripts/measure_sorted_folds.py /root/repo/.benchdata/sf1 [serve_reps]
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


def build(spark, sf_dir, sort_folds):
    from pyspark.sql import functions as F

    from tantalus_spark.inventory import db_for
    from tantalus_spark.streaming.maintenance import index_refresh_batches

    docs = db_for(spark, sf_dir).table("documents").select("doc_id",
                                                           "text")
    ix = tempfile.mkdtemp(prefix="tantalus_sortfold_")
    cb = index_refresh_batches(ix, op_col="op", max_segments=2,
                               sort_folds=sort_folds)
    add = lambda df: df.withColumn("op", F.lit("add"))  # noqa: E731
    t0 = time.perf_counter()
    cb(add(docs.filter(F.col("doc_id") % 3 == 0)), 0)
    dels = (docs.filter(F.col("doc_id") % 21 == 0)
                .select("doc_id",
                        F.lit(None).cast("string").alias("text"))
                .withColumn("op", F.lit("delete")))
    cb(add(docs.filter(F.col("doc_id") % 3 == 1))
       .unionByName(dels)
       .unionByName(add(docs.filter(F.col("doc_id") % 42 == 0))), 1)
    cb(add(docs.filter(F.col("doc_id") % 3 == 2)), 2)
    return ix, round(time.perf_counter() - t0, 2)


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


def rowgroup_stats(ix):
    """(overlapping, total) row groups for the probe terms across the
    folded segment's postings files — what the pushed IN-filter keeps."""
    import pyarrow.parquet as pq

    comp = sorted(glob.glob(os.path.join(ix, "seg-*c", "postings",
                                         "*.parquet")))
    total = hit = 0
    for f in comp:
        md = pq.ParquetFile(f).metadata
        ci = None
        for i in range(md.schema.to_arrow_schema().names.index("term"),
                       md.schema.to_arrow_schema().names.index("term") + 1):
            ci = i
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(ci)
            total += 1
            st = col.statistics
            if st is None or not st.has_min_max:
                hit += 1  # no stats -> reader must decode it
                continue
            lo, hi = st.min, st.max
            if any(lo <= t <= hi for t in TERMS):
                hit += 1
    return hit, total


def main():
    sf_dir = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from tantalus_spark import get_spark

    spark = get_spark("sortfold")
    # many row groups per folded file, like a corpus-scale store
    spark.sparkContext._jsc.hadoopConfiguration().setInt(
        "parquet.block.size", 1 << 20)
    out = {"sf_dir": sf_dir, "terms": TERMS}
    for label, flag in (("sorted", True), ("unsorted", False)):
        ix, build_s = build(spark, sf_dir, flag)
        hit, total = rowgroup_stats(ix)
        out[label] = {"build_s": build_s,
                      "serve_s": serve_time(spark, ix, reps),
                      "rg_hit": hit, "rg_total": total}
        shutil.rmtree(ix, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
