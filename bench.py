#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count of the result) — results stay
on executors; only the count crosses to the driver.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from tantalus_spark import get_spark
from tantalus_spark.inventory import QUERIES, db_for
from tantalus_spark.datapipe import dedup, textstats
from pyspark.sql import functions as F

# Headline set: one per operator family, weighted toward shuffle-heavy ops.
# NOTE the set GREW round-over-round (r3: 22 queries; r4: 26 — added
# 97_lm_score, 98_dsir_weights, 101_perplexity_buckets, 108_build_corpus;
# r5: 32 — added 46_simhash and 111_fuzzy_pairs, both rebuilt that round,
# plus 113_quota_select and 116_encoding_noise, then the late additions
# 120_zipf_fit and 121_bm25_rank), so compare BENCH_r*.json PER-QUERY,
# not by total.
HEADLINE = [
    "01_pricing_summary",
    "06_token_or_search",
    "07_region_revenue",
    "10_exists_same_child",
    "13_count_distinct",
    "15_cross_agg_eq",
    "17_window_lag",
    "18_topk_per_group",
    "30_window_frames",
    "31_asof_join",
    "68_range_join",
    "40_dedup_exact",
    "41_doc_profile",
    "44_ngram_jaccard",
    "45_minhash_lsh",
    "47_ann_cosine",
    "49_tumbling_window",
    "50_sessionization",
    "51_embedding_near_dup",
    "53_winnowing",
    "56_funnel",
    "58_clean_corpus",
    "97_lm_score",
    "98_dsir_weights",
    "101_perplexity_buckets",
    "108_build_corpus",
    "46_simhash",
    "111_fuzzy_pairs",
    "113_quota_select",
    "116_encoding_noise",
    "120_zipf_fit",
    "121_bm25_rank",
    # r6 additions: index-backed serving (includes its one-time index
    # build — the honest one-job cost) and the posting-join cosine
    "123_bm25_indexed",
    "124_tfidf_cosine",
    # r7 additions: two-leg hybrid retrieval, the JS mixing diagnostic
    # (one corpus pass + persisted sketch), the staged dedup funnel,
    # and the drift monitor
    "131_hybrid_rrf",
    "132_source_divergence",
    "134_dedup_funnel",
    "135_js_drift",
    "139_bpe_compression",
    # r8 additions: the fully index-served hybrid (build + both-leg
    # serve in one job — the honest lifecycle cost) and the
    # cluster-tier leakage-free split
    "141_hybrid_serve",
    "142_group_split_clustered",
    # r9 additions: the batched serving tier — three queries through
    # both index legs in ONE job — and its ANN twin (both include
    # their one-time index builds)
    "147_hybrid_serve_batch",
    "151_ann_serve_batch",
    # r10 addition: the LSM segmented-store lifecycle — three CDC
    # commits (incl. the compaction fold) + the masked-view BM25 serve,
    # the honest end-to-end cost of the maintained-index story
    "152_segmented_store_serve",
    # r10 second-half addition: snapshot PROMOTION — the q152
    # lifecycle plus the audit-gated export of the masked view into
    # one immutable term-sorted artifact and the zero-mask-join serve
    # off it (LSM-for-writes / snapshot-for-reads)
    "159_snapshot_promote_serve",
    # r11 addition: promotion completed for the IVFPQ family — the
    # CDC-maintained code-table store, the audit-gated ivf_list-
    # partitioned export, and the batched partition-pruned serve off
    # the promoted artifact, all in one honest lifecycle job
    "161_snapshot_ann_serve",
    # r12 addition: the LIVE band-store novelty serve off the
    # incrementally maintained postings leaf — three CDC commits
    # (incl. the fold, each also deriving its O(batch) postings) plus
    # the shuffle-free-index-side serve; the freshness-read twin of
    # the snapshot path
    "164_band_store_live_serve",
    # r13 addition: the deploy loop end to end — two cut releases
    # (each: audit-gated exports of both stores + release.json +
    # pointer swap), a follower that reloads exactly once on the
    # mid-stream swap, and two served+sunk query batches; the honest
    # cost of shipping a new serving release under traffic
    "165_release_follow_serve",
]


# Production-hash-family variants: the gated inventory entries for q45/q53
# deliberately use the md5-derived portable hash so the DuckDB oracle can
# replay them bit-for-bit, but a user runs the xxhash64 default — that hex
# string round-trip (md5+substring+conv) is pure oracle plumbing, not
# production cost. The headline times what a user runs; CORRECTNESS still
# gates the md5 entries.
def _bench_45_minhash_lsh(spark, sf_dir):
    docs = db_for(spark, sf_dir).table("documents")
    return dedup.minhash_lsh_pairs(docs, n_perm=16, bands=4, threshold=0.2,
                                   hash_family="xxhash64")


def _bench_53_winnowing(spark, sf_dir):
    docs = db_for(spark, sf_dir).table("documents")
    fps = textstats.winnowing_fingerprints(docs, k=5, window=4,
                                           hash_family="xxhash64")
    return fps.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_fp"),
        F.min("fp").alias("min_fp"),
        F.max("fp").alias("max_fp"),
        F.sum("fp").alias("sum_fp"),
    )


def _bench_46_simhash(spark, sf_dir):
    docs = db_for(spark, sf_dir).table("documents")
    return dedup.simhash_near_pairs(docs, max_hamming=3,
                                    hash_family="xxhash64")


def _bench_98_dsir_weights(spark, sf_dir):
    from tantalus_spark.datapipe.scoring import dsir_weights

    docs = db_for(spark, sf_dir).table("documents")
    return dsir_weights(
        docs, F.col("source").isin("src1", "src2", "src3"),
        n_buckets=1024, hash_family="xxhash64")


def _bench_132_source_divergence(spark, sf_dir):
    from tantalus_spark.datapipe.textstats import source_js_divergence

    docs = db_for(spark, sf_dir).table("documents")
    return source_js_divergence(docs, n_buckets=64,
                                hash_family="xxhash64")


PRODUCTION_VARIANTS = {
    "45_minhash_lsh": _bench_45_minhash_lsh,
    "46_simhash": _bench_46_simhash,
    "53_winnowing": _bench_53_winnowing,
    "98_dsir_weights": _bench_98_dsir_weights,
    "132_source_divergence": _bench_132_source_divergence,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    # capture load BEFORE this process's own warmup+runs contribute to
    # it: the end-of-run loadavg is dominated by the bench itself on 32
    # cpus and can't certify the box was idle when the run STARTED (the
    # r9 artifact's open question). Both values land in the JSON.
    try:
        pre_load1, pre_load5, _ = os.getloadavg()
    except OSError:
        pre_load1 = pre_load5 = -1.0
    spark = get_spark("bench")

    # CPU calibration probes (r13): fixed deterministic workloads whose
    # wall time depends only on the box's EFFECTIVE speed, recorded so
    # round-over-round artifacts can be compared when co-tenancy is
    # invisible to loadavg — the r13 lesson: identical code ran ~30%
    # slower than the previous day with near-zero loadavg at start and
    # degraded=false; only a same-code control run caught it. JVM side:
    # a codegen'd 2e8-row aggregate (parallel throughput, what the
    # queries see); Python side: a fixed-iteration single-thread loop
    # (catches frequency scaling / steal). Compare calib ratios before
    # reading per-query deltas across artifacts.
    # one throwaway first: the probe's own codegen/JIT is a one-off
    # ~8 s that would otherwise swamp the steady-state number being
    # calibrated (measured: 9.5 s cold vs 1.5 s warmed on this box)
    spark.range(200_000_000).selectExpr("sum(id * 2 + 1)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * 2 + 1)").collect()
    calib_jvm = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    acc = 0
    for i in range(10_000_000):
        acc += i
    calib_py = round(time.perf_counter() - t0, 3)

    # warm the JVM, parquet footers, and OS page cache once so timings
    # measure query execution, not first-touch IO / JIT
    spark.range(1).count()
    from tantalus_spark.inventory import db_for
    db = db_for(spark, sf_dir)
    for t in ("lineitem", "orders", "customer", "part", "supplier",
              "events", "documents", "embeddings"):
        db.table(t).count()

    # best-of-3 per query: first run may pay one-off plan/codegen costs
    # and local[32] timings have GC jitter; the min is the steady-state
    # number a scheduler would see
    # sub-0.5 s queries get best-of-5: their r2→r3 deltas (q06 +0.10 s,
    # q01 +0.04 s) were the same magnitude as local[32] GC/scheduler
    # jitter at n=3, so buy noise margin where a run is cheap
    # best-of-5 for EVERY query since r4: transient co-tenant load on the
    # box moved whole-run totals by +-20% at n=3, which swamped real
    # round-over-round deltas; min-of-5 keeps the steady-state number
    timings: dict[str, float] = {}
    spreads: list[float] = []
    for name in HEADLINE:
        fn = PRODUCTION_VARIANTS.get(name, QUERIES[name])
        best, worst = float("inf"), 0.0
        for _ in range(5):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.count()
            dt = time.perf_counter() - t0
            best, worst = min(best, dt), max(worst, dt)
            # persist-lifecycle contract: a query may RETURN a cached
            # frame the caller owns releasing. Without this release,
            # iterations 2-5 of such a query re-persist the identical
            # plan (the CacheManager "already cached" warning) and read
            # the cache — min-of-5 then times a cache hit, not the
            # query (the r4 leak class, resurfacing through the bench
            # harness itself). No-op for unpersisted results.
            df.unpersist()
        timings[name] = round(best, 3)
        if best > 0.2:  # sub-noise queries would dominate the ratio
            spreads.append(worst / best)

    total = round(sum(timings.values()), 3)
    # honesty flag (the r10/r11 verdicts both caught loaded-box
    # artifacts by hand): pre-existing load when the run STARTED, or
    # heavy mid-run drift (median worst/best across the non-trivial
    # queries — co-tenant interference inflates the slow reps of MANY
    # queries at once; steady-state GC jitter doesn't move the median)
    spreads.sort()
    drift = spreads[len(spreads) // 2] if spreads else 1.0
    # core-normalized load threshold (r12 advice): an absolute
    # pre_load1 > 1.0 flags honest runs on many-core boxes (load 1.0
    # on 32 cores is negligible) and misses real contention on 1-2
    # core boxes. 0.25·cores ≈ "a quarter of the box was already
    # busy" — co-tenant work at that level measurably inflates a
    # 32-thread local[*] run. Core count is recorded alongside so the
    # flag stays interpretable in round-over-round artifacts.
    n_cores = os.cpu_count() or 1
    # end-of-run calibration RE-probe (r14, VERDICT item: the r13 run
    # started at load 2.76, hit 11.29 mid-run, and still reported
    # degraded=false because the pre-load gate only sees the START).
    # The same fixed JVM workload as calib_jvm_s, re-run after the
    # timed loop: a co-tenant burst that polluted the run shows up as
    # calib_end/calib_start > 1.5 (the r13 burst measured 2-5x on this
    # probe). End-of-run LOADAVG is deliberately not gated on — it is
    # dominated by the bench's own 32-thread jobs.
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * 2 + 1)").collect()
    calib_jvm_end = round(time.perf_counter() - t0, 3)
    calib_ratio = (calib_jvm_end / calib_jvm) if calib_jvm > 0 else 1.0
    degraded = bool(pre_load1 > 0.25 * n_cores or drift > 2.0
                    or calib_ratio > 1.5)
    # record box load so round-over-round artifacts are auditable: the
    # r8 artifact showed +40-50% on untouched queries that a re-run on
    # an idle box didn't reproduce — co-tenant load, not a regression.
    # pre_load_* (sampled before warmup) certifies idleness at start;
    # the end-of-run value mostly measures the bench itself.
    try:
        load1, load5, _ = os.getloadavg()
    except OSError:
        load1 = load5 = -1.0
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "pre_load_1m": round(pre_load1, 2),
        "pre_load_5m": round(pre_load5, 2),
        "load_1m": round(load1, 2),
        "load_5m": round(load5, 2),
        "n_cores": n_cores,
        "calib_jvm_s": calib_jvm,
        "calib_py_s": calib_py,
        "calib_jvm_end_s": calib_jvm_end,
        "calib_end_ratio": round(calib_ratio, 2),
        "degraded": degraded,
        # the thresholds the flag fired (or not) against, recorded so
        # the artifact is self-describing round over round
        "degraded_gates": {"pre_load_over_cores": 0.25,
                           "mid_run_drift": 2.0,
                           "calib_end_ratio": 1.5},
        "mid_run_drift": round(drift, 2),
    }))


if __name__ == "__main__":
    main()
