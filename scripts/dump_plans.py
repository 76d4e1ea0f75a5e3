#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans for representative queries
so the optimization evidence (pushdown, pruning, broadcasts, codegen spans,
no-shuffle as-of) is reviewable without running Spark."""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tantalus_spark import get_spark
from tantalus_spark.inventory import QUERIES

SHOW = [
    ("04_range_in_filter", "predicate pushdown + column pruning at the scan"),
    ("07_region_revenue", "broadcast dimension joins on the FK chain"),
    ("15_cross_agg_eq", "fused annotation aggregates (single scan + agg)"),
    ("10_exists_same_child", "child-side match-set: no root join before the semi"),
    ("16_pagination", "ordered offset/limit as TakeOrderedAndProject"),
    ("31_asof_join", "as-of join: union + window, zero Join operators"),
    ("51_embedding_near_dup", "block-matmul near-dup: map + group, no pair join"),
    ("53_winnowing", "winnowing: array-side gram hashing, codegen window-min"
     " (one exchange the downstream per-doc agg reuses)"),
    ("58_clean_corpus", "fused quality gates: one scan, window dedup, no join"),
    ("68_range_join", "equi+range interval join: sort-merge bounded by the equi key"),
    ("76_line_dedup", "cross-doc line dedup: digest-keyed frequency exchanges,"
     " raw text never shuffles for the count"),
    ("78_quality_classifier", "logistic quality gate: one codegen'd projection,"
     " zero exchanges"),
    ("84_pack_sequences", "sequence packing: per-shard window prefix sum —"
     " one hash exchange on the shard bucket, parallel sorts, no global"
     " ordering"),
    ("86_novel_docs", "incremental index dedup: (band,hash) postings"
     " semi-join, two-column shuffle, raw text never leaves the map side"),
    ("87_rare_tokens", "rare-token scoring: frequency agg with map-side"
     " partials; the join-back key is skew-free by construction"),
    ("90_packed_text", "packing writer: shard window + (shard,seq) assembly"
     " — the two token-bearing exchanges that are the floor for packing"),
    ("97_lm_score", "unigram LM scoring: term-keyed count agg with map-side"
     " partials, join-back on term, integer-only doc reduction"),
    ("98_dsir_weights", "DSIR weighting: fixed-size bucket stats table"
     " broadcast into the per-doc integer sum — raw text never shuffles"),
    ("99_corpus_shuffle", "seeded shuffle: one hash exchange on shard,"
     " parallel per-shard rank windows, no global sort"),
    ("106_dsir_select", "DSIR apply: literal threshold filter + bounded"
     " tie window — no corpus-wide row_number"),
    ("107_centroid_affinity", "centroid affinity: d-element literal sum-"
     "vector folded into a zero-shuffle map-side scoring projection"),
    ("108_build_corpus", "end-to-end corpus build: gates + decontaminate"
     " anti-join + LM scoring fused into one DAG"),
    ("111_fuzzy_pairs", "blocked fuzzy join: conjuncts cheap-first in the"
     " join condition (id<, length bound, THEN banded-DP levenshtein);"
     " merge-hinted so the corpus side never broadcasts (r5)"),
    ("113_quota_select", "per-source quota: histogram thresholds broadcast"
     " back, tie windows only — no source-wide sort"),
    ("46_simhash", "r5: JVM-side signatures — explode + md5 hash + 64"
     " integer bit-sums, whole-stage codegen, no Python anywhere;"
     " merge-hinted chunk self-join"),
    ("69_embedding_lsh", "r5: literal-folded hyperplane coefficients —"
     " the bucket projection is a codegen'd element_at chain, no"
     " interpreted HOF, no per-row md5"),
    ("117_gopher_rules", "Gopher rule set: zero exchanges; the two token"
     " arrays (original-case + lowered) are MATERIALIZED once in a first"
     " projection — exactly two filter(split(...)) subtrees in the plan"
     " (r6 fix; the stop-word loop is one array_intersect)"),
    ("118_c4_filters", "C4 cleaning: line-filter HOF once per row, all"
     " doc gates codegen, zero exchanges"),
    ("119_sq8_quantize", "SQ8 audit: trained per-dim stats literal-folded"
     " into ONE codegen'd projection — zero exchanges in the encode pass,"
     " integer-exact error diagnostics"),
    ("120_zipf_fit", "Zipf fit: (source,term) agg with map-side partials,"
     " rank window over the vocab-sized frame, 6-moment group reduce —"
     " no corpus-wide sort"),
    ("121_bm25_rank", "BM25: token stream filtered to query terms before"
     " the only doc-keyed shuffle; |query|-row df broadcast; top-k is"
     " TakeOrderedAndProject"),
    ("122_minhash_calibration", "MinHash calibration: the q45 band shuffle"
     " + broadcast-candidate probes into signatures and postings;"
     " all-integer error-bucket rollup"),
    ("123_bm25_indexed", "index-backed BM25: one-pass inverted-index"
     " build emitting (N, avgdl) as build-time artifacts; the serving"
     " query touches ONLY its terms' postings — term IN-filter pushes"
     " into the index scan and NO full-index stats aggregate (r6 fix)"),
    ("124_tfidf_cosine", "sparse TF-IDF cosine pairs: df-pruned posting"
     " self-join (pairs per term bounded by the df cap), nano-integer"
     " dot/norm sums, broadcast df table"),
    ("125_weighted_sample", "A-ES weighted sampling: one projection"
     " computes ln(u)/w keys, top-k is TakeOrderedAndProject — no"
     " global sort, nothing corpus-sized shuffles"),
    ("126_budget_select", "token-budget selection: score-token histogram"
     " + literal threshold filter + bounded tie window — no corpus-wide"
     " sort/row_number"),
    ("127_hard_negatives", "cross-label block gemm: linear block-count"
     " replication, per-group BLAS top-k inside applyInPandas, one rank"
     " window merges the per-block partials — nothing pairwise"
     " shuffles"),
    ("129_normalized_dedup", "NFC-canonical dedup: one Arrow map pass"
     " (stdlib unicodedata), codegen digest, digest-keyed group —"
     " payloads never shuffle"),
    ("131_hybrid_rrf", "hybrid RRF: both legs end in bounded top-depth;"
     " the dense leg joins an O(|query|) broadcast vector against the"
     " sparse hashed features; fusion touches <= 2*depth rows"),
    ("132_source_divergence", "JS divergence: ONE corpus explode into a"
     " persisted (source,bucket) sketch; all six grid references read"
     " the cache (r7 fix); pair math on the fixed grid only"),
    ("133_jl_distortion", "JL audit: broadcast k*d sign matrix, micro-"
     "integer components, O(probes^2) frames after a TakeOrdered probe"
     " select"),
    ("134_dedup_funnel", "staged dedup funnel: 16-byte digest shuffles"
     " for exact/NFC stages, capped posting join over the twice-thinned"
     " corpus, O(rows) boolean flag caches released on return"),
    ("135_js_drift", "drift monitor: one corpus explode into the"
     " persisted sketch; baseline is an n_buckets-row broadcast; JS on"
     " the fixed grid"),
    ("136_ivf_recall", "IVF recall audit: broadcast query set; exact"
     " leg = bounded brute-force verifier; IVF leg filters probed"
     " lists before ranking"),
    ("138_pq_recall", "PQ recall audit: batch ADC — broadcast"
     " |queries|*m*k dot table joined onto posexploded codes, one"
     " (query,id) sum, per-query rank windows; no vector column read"
     " in the ADC leg"),
    ("141_hybrid_serve", "fully index-served hybrid (r8): postings scan"
     " term-IN-pruned, feats scan bucket-IN-pruned, prebuilt norms join"
     " keys on the pruned dots side — NO corpus-wide aggregate anywhere"
     " in the serving plan (the q123 lesson applied to the dense leg)"),
    ("142_group_split_clustered", "cluster-tier leakage-free split (r8):"
     " Arrow NFC pass, 16-byte digest shuffles, the cluster map lifted"
     " to the NFC-family level with one map-sized aggregate; the split"
     " itself stays a map-side md5-bucket expression"),
    ("143_pruned_index_serve", "delete-side index lifecycle (r8): the"
     " tombstone set broadcasts — postings drop is a map-side broadcast"
     " anti-join (the corpus-scale index never shuffles), stats"
     " downdate is one bounded aggregate over the removed docs'"
     " postings; serving stays the q123 pruned-lookup shape"),
    ("144_merged_dense_serve", "insert-side dense lifecycle (r8): the"
     " merged feats/norms are two unions (per-doc independence), the"
     " dense serve is the bucket-pruned broadcast-join leg with"
     " prebuilt norms — no re-aggregation of the merged table"),
    ("145_score_calibration", "quality-score reliability diagram (r8):"
     " ONE projection computes logit + literal-cut bin + C4 label (no"
     " join, no second text scan), then an n_bins-row integer groupBy"
     " — scan-bound at any corpus size"),
    ("146_ivf_balance", "IVF list-balance audit (r8): one codegen"
     " assign pass over literal centroids, an nlist-row integer"
     " groupBy, (N, sum n^2) folded in from a 1-row broadcast"),
    ("147_hybrid_serve_batch", "batched hybrid serving (r9): ONE job"
     " for the whole query set — postings scan pruned to the UNION of"
     " the queries' terms, ENRICHED feats scan to the union of"
     " buckets, broadcast (query_id, term)/(query_id, bucket, qfeat)"
     " maps fan work per query, every per-query reduction is a rank"
     " window; exactly three artifact scans however many queries"),
    ("148_ivf_index_health", "IVF health report (r9): per-list balance"
     " + sampled recall@nprobe off ONE shared persisted assign pass;"
     " exact leg is the bounded-query verifier"),
    ("149_maintained_ann_serve", "ANN lifecycle serve (r9): prune ="
     " broadcast anti-join on the code table, merge = delta-only"
     " assign+encode + union with frozen artifacts, serve scans only"
     " the probed lists' codes via the ADC literal table"),
    ("150_maintained_novel_serve", "LSH band-index lifecycle serve"
     " (r9): prune = broadcast anti-join, merge = band-the-delta +"
     " union, novelty probe = two-column (band, hash) semi-join — raw"
     " text never leaves the map side"),
    ("151_ann_serve_batch", "batched IVFPQ serving (r9): code scan"
     " pruned once to the union of all queries' probed lists,"
     " per-query broadcast probe + ADC tables, one (query, id) sum +"
     " per-query rank windows; no float vector read anywhere"),
    ("152_segmented_store_serve", "LSM segmented-store serve (r10):"
     " the served view is the lazy union of the store's segments with"
     " the query's term IN-filter pushed into every segment scan;"
     " stats come off the manifest (no corpus aggregate); this dump"
     " follows the compaction fold, so the union is one segment"),
    ("153_hybrid_eval_tabular", "tabular-query hybrid eval (r10): the"
     " DataFrame-input leg keeps the q147 contract — exactly three"
     " artifact scans pruned to the batch vocabulary; queries, term"
     " normalization, and query hashing never leave the cluster"),
    ("154_ann_eval_tabular", "tabular-query IVFPQ eval (r10): probe"
     " ranking as a sort_array expression over the centroid literals,"
     " inline ADC fold after the broadcast query join, code scan"
     " pruned to the probed union"),
    ("155_maintained_hybrid_serve", "hybrid serve off BOTH maintained"
     " stores (r10): postings union term-IN-pruned per segment,"
     " bucket-partition-pruned ENRICHED feats segments, manifest"
     " stats, zero norm joins, zero raw-text scans at serve time"),
    ("156_index_time_travel", "time-travel serve (r10): the as-of pin"
     " resolves to a retained manifest, so the plan is exactly a"
     " CURRENT serve over that manifest's (pre-fold) segments —"
     " term IN-filters pushed into every pinned segment scan, stats"
     " from the pinned manifest, no history scan, no version join"),
    ("157_consistent_asof_serve", "cross-store consistent serve"
     " (r10): both stores pinned to common_batch_id — the plan is the"
     " q155 maintained hybrid serve over the common-prefix manifests;"
     " consistency costs K pointer-file reads, nothing in the plan"),
    ("159_snapshot_promote_serve", "snapshot promotion (r10): the"
     " serve reads the ONE promoted term-sorted artifact — a single"
     " pushdown-pruned postings scan per BM25 leg, stats from"
     " snapshot.json, and NO tombstone anti-join anywhere (the export"
     " applied the mask physically); compare q152's per-segment"
     " unions + broadcast mask"),
    ("161_snapshot_ann_serve", "IVFPQ snapshot serve (r11): ONE"
     " ivf_list-partition-pruned code scan off the promoted folded"
     " artifact (vs one per segment on the live store), per-query"
     " broadcast probe/ADC tables, no tombstone anti-join"),
    ("163_release_serve", "cross-family RELEASE serve (r11): q157's"
     " diverged maintainers pinned at common_batch_id by one"
     " export_release call — both legs read folded audited snapshots"
     " (pushdown-pruned postings + bucket-partition-pruned feats),"
     " zero segment unions, zero mask joins"),
    ("164_band_store_live_serve", "LIVE band-store novelty serve"
     " (r12): the index side is a plain scan of the incrementally"
     " maintained (id, band, h) postings leaf — ONE Generate total"
     " (the probe batch's posexplode), no index-side explode and no"
     " DISTINCT aggregate feeding the semi join; compare the"
     " bands-layout live serve's per-query corpus explode+dedup"),
]


def main() -> None:
    sf = "/root/testdata/sf0.001"
    spark = get_spark("plans")
    out = io.StringIO()
    out.write(
        "# PLANS — physical-plan evidence (auto-generated by "
        "`scripts/dump_plans.py`)\n\nPlans at sf0.001; shapes are "
        "data-size-independent except where AQE swaps join strategies at "
        "runtime.\n")
    for name, why in SHOW:
        df = QUERIES[name](spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # Deeply-composed materialized queries (q134) expand nested
        # InMemoryRelation subtrees into thousands of repeated lines —
        # the reviewable evidence is the top of the tree; cap it.
        lines = plan.splitlines()
        if len(lines) > 400:
            plan = "\n".join(lines[:400]) + (
                f"\n... [truncated {len(lines) - 400} lines of nested"
                " cached-subplan expansion]")
        out.write(f"\n## {name} — {why}\n\n```\n{plan}\n```\n")

    # r13: export-side evidence — export_band_snapshot is a WRITE job,
    # not a QUERIES entry, so dump the exact frame it writes: the
    # snapshot's DISTINCT (band, h) postings folded from the store's
    # MAINTAINED per-segment leaf (masked union, like compaction) —
    # zero Generate anywhere (the explode was paid O(batch) at each
    # commit); the only shuffle is the cross-segment DISTINCT.
    import tempfile

    from pyspark.sql import functions as F

    from tantalus_spark.inventory import db_for
    from tantalus_spark.streaming.maintenance import (
        _current_version, _read_manifest, _snapshot_postings_view,
        band_refresh_batches)

    root = tempfile.mkdtemp(prefix="tantalus_plans_band_")
    try:
        docs = db_for(spark, sf).table("documents").select("doc_id",
                                                           "text")
        cb = band_refresh_batches(root, op_col="op", max_segments=4)
        add = lambda df: df.withColumn("op", F.lit("add"))  # noqa: E731
        cb(add(docs.filter(F.col("doc_id") % 4 == 0)), 0)
        cb(add(docs.filter(F.col("doc_id") % 4 == 1)), 1)
        view = _snapshot_postings_view(
            spark, root, _read_manifest(root, _current_version(root)))
        plan = view._jdf.queryExecution().executedPlan().toString()
        out.write(
            "\n## export_band_snapshot postings fold (r13) — the frame"
            " the export writes: stored per-segment postings leaf,"
            " masked-unioned and DISTINCTed — zero Generate (no bands"
            " re-explode at export time)\n\n```\n" + plan + "\n```\n")
    finally:
        import shutil
        shutil.rmtree(root, ignore_errors=True)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write(out.getvalue())
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
