"""Persist-lifecycle policy gate (r4 verdict "What's wrong #3").

Policy: a function may return a CACHED frame (the caller owns releasing
it via ``.unpersist()``), but every cache a caller cannot see must be
released before the function returns (``_materialize_and_release`` or
``try/finally``). The r4 leak: ``temperature_mix`` pinned its stats
frame forever; this gate runs the leak-prone inventory queries end to
end and asserts that, once the caller releases the returned frame, the
session holds no new pinned blocks.
"""

from __future__ import annotations

import pytest

from tantalus_spark.inventory import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# every query family that persists internally: LM scoring, DSIR,
# perplexity, quota, temperature mix, posting-list dedup, LSH, fused
# corpus build
LEAK_PRONE = [
    "44_ngram_jaccard",
    "45_minhash_lsh",
    "97_lm_score",
    "98_dsir_weights",
    "101_perplexity_buckets",
    "103_temperature_mix",
    "104_bigram_lm",
    "106_dsir_select",
    "108_build_corpus",
    "113_quota_select",
    "121_bm25_rank",
    "122_minhash_calibration",
    # r7: every new operator that persists internally (legs/sketches/
    # flag caches/assignments) must release them before return
    "131_hybrid_rrf",
    "132_source_divergence",
    "133_jl_distortion",
    "134_dedup_funnel",
    "135_js_drift",
    "136_ivf_recall",
    # r8: the index-served hybrid (gate entry persists the built feats
    # and must release it) and the serve-side lifecycle entries
    "141_hybrid_serve",
    "143_pruned_index_serve",
    "144_merged_dense_serve",
    "145_score_calibration",
]


def _n_cached(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.mark.parametrize("qname", LEAK_PRONE)
def test_no_pinned_blocks_after_query_release(spark, qname):
    before = _n_cached(spark)
    df = QUERIES[qname](spark, SF_DIR)
    df.collect()
    df.unpersist()          # caller releases the (possibly cached) result
    after = _n_cached(spark)
    assert after <= before, (
        f"{qname} leaked {after - before} pinned RDD(s): every internal "
        f"persist must be released before return (persist-lifecycle "
        f"policy)")


def test_repeated_calls_do_not_accumulate(spark):
    """The failure mode that matters in a long-lived session: every call
    pinning one more block. Three rounds of the r4 leaker must be flat."""
    counts = []
    for _ in range(3):
        df = QUERIES["103_temperature_mix"](spark, SF_DIR)
        df.collect()
        df.unpersist()
        counts.append(_n_cached(spark))
    assert counts[0] == counts[1] == counts[2], counts


@pytest.mark.slow
def test_no_pinned_blocks_between_headline_bench_queries(spark):
    """The r5 bench tail still printed ``CacheManager: Asked to cache
    already cached data`` — the tell that a persisted plan survived
    between bench iterations and later timings were cache-assisted
    (the r4 leak class, resurfacing through the harness). bench.py now
    releases each returned frame per iteration; this gate runs the
    bench loop shape over the full headline set and asserts the
    session holds ZERO new pinned blocks between consecutive queries,
    not just after the final release."""
    import bench

    before = _n_cached(spark)
    for name in bench.HEADLINE:
        fn = bench.PRODUCTION_VARIANTS.get(name, QUERIES[name])
        df = fn(spark, SF_DIR)
        df.count()
        df.unpersist()
        now = _n_cached(spark)
        assert now <= before, (
            f"{name} left {now - before} pinned block(s) after caller "
            f"release — the next bench query would be cache-assisted")
