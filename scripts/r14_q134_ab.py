#!/usr/bin/env python
"""r14 A/B for q134 stage 3 (VERDICT item 3): does pre-partitioning +
sorting the persisted posting list by shingle remove the SMJ sorts and
pay off, and is there any skew to salt? Noop-sink timing (guide §1.4),
min-of-N, one session, interleaved base/variant."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tantalus_spark import get_spark
from tantalus_spark.datapipe.dedup import shingles
from tantalus_spark.inventory import db_for

N_REPS = 4


def pair_frame(sh):
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"),
                 F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"),
             F.first(F.col("a.n_sh")).alias("n1"),
             F.first(F.col("b.n_sh")).alias("n2")))


def build_postings(docs, max_shingle_freq=100):
    sh = shingles(docs, n=3, hashed=True)
    hot = (sh.groupBy("shingle").count()
           .filter(F.col("count") > max_shingle_freq).select("shingle"))
    sh = sh.join(hot, "shingle", "left_anti")
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return sh.join(F.broadcast(counts), "doc_id")


def time_variant(label, make_sh):
    best = float("inf")
    for _ in range(N_REPS):
        sh = make_sh().persist()
        t0 = time.perf_counter()
        pair_frame(sh).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        sh.unpersist()
        best = min(best, dt)
    print(f"{label}: min {best:.3f}s over {N_REPS}")
    return best


def main():
    spark = get_spark("q134-ab")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = db_for(spark, sf_dir).table("documents")
    # q134 stage 3 runs over stage-2 survivors; the full corpus is a
    # fine proxy for the join-shape A/B (same distribution, ~same size)
    docs.count()

    # skew stats first: rows per shingle and per join partition
    sh0 = build_postings(docs).persist()
    n = sh0.count()
    per_key = sh0.groupBy("shingle").count()
    stats = per_key.agg(
        F.count(F.lit(1)).alias("keys"), F.max("count").alias("mx"),
        F.expr("percentile(count, 0.5)").alias("med"),
        F.expr("percentile(count, 0.99)").alias("p99")).first()
    npart = int(spark.conf.get("spark.sql.shuffle.partitions"))
    per_part = (per_key
                .groupBy(F.pmod(F.hash("shingle"), F.lit(npart))
                         .alias("p"))
                .agg(F.sum(F.col("count") * F.col("count"))
                     .alias("pairs_ub"))
                .agg(F.max("pairs_ub"), F.expr("percentile(pairs_ub, 0.5)"))
                .first())
    print(f"postings rows={n} keys={stats['keys']} max/key={stats['mx']} "
          f"med/key={stats['med']} p99/key={stats['p99']}")
    print(f"per-partition pair-work upper bound: max={per_part[0]} "
          f"median={per_part[1]} (max/med="
          f"{per_part[0]/max(per_part[1],1):.2f})")
    sh0.unpersist()

    t_base = time_variant("base (persist as-built)",
                          lambda: build_postings(docs))
    t_bucket = time_variant(
        "bucketed (repartition+sortWithinPartitions shingle)",
        lambda: (build_postings(docs)
                 .repartition(npart, F.col("shingle"))
                 .sortWithinPartitions("shingle", "doc_id")))
    print(f"delta: {100 * (t_bucket - t_base) / t_base:+.1f}%")

    # plan shape check: does the bucketed cache drop the join's sorts?
    shb = (build_postings(docs)
           .repartition(npart, F.col("shingle"))
           .sortWithinPartitions("shingle", "doc_id").persist())
    shb.count()
    plan = pair_frame(shb)._jdf.queryExecution().executedPlan().toString()
    import re
    print("bucketed-plan Exchange:", len(re.findall(r"\bExchange\b", plan)),
          "Sort:", len(re.findall(r"\bSort\b", plan)))
    shb.unpersist()


if __name__ == "__main__":
    main()
