"""Streaming LM quality scoring — the production CCNet shape.

The language model is trained OFFLINE (one batch job over a reference
corpus, ``datapipe/scoring.py lm_cost_table``); the stream then scores
every arriving document against that frozen table.  This is how quality
filtering actually deploys at 100 TB/day: the model never changes
mid-stream (that would make scores time-dependent and irreproducible),
it is versioned and swapped between runs.

Shape: explode tokens → stream-static LEFT join to the cost table
(static side is a fixed vocabulary table; unseen tokens charge the OOV
cost) → watermarked per-(doc, event-window) aggregation.  State is the
per-document partial sums inside the watermark horizon only — evicted as
the watermark advances, O(docs per horizon), never O(corpus).

Batch/stream parity is exact: both paths share ``lm_cost_table`` and the
integer-millibit reduction, so a stream replay of a static corpus yields
bit-identical scores to ``score_with_cost_table`` (proven in
tests/test_scoring.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tantalus_spark.datapipe.textstats import tokens


def lm_score_stream(
    docs_stream: DataFrame,
    cost: DataFrame,
    oov_cost_mb: int,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score a document stream against a frozen unigram cost table.

    Returns a streaming DataFrame (append mode) of
    (doc_id, n_tokens, total_millibits, mean_cost_millibits) — the same
    schema as the batch scorer.  Each document's row carries its event
    time; the per-doc aggregation groups on (doc, 1-minute event window)
    so Spark can evict state once the watermark passes the window — a
    document is one event, so the window never splits a document.
    """
    toks = docs_stream.select(
        F.col(id_col),
        F.col(ts_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("term"),
    )
    joined = toks.join(cost, "term", "left").withColumn(
        "cost_mb", F.coalesce("cost_mb", F.lit(int(oov_cost_mb))))
    return (
        joined
        .withWatermark(ts_col, watermark)
        .groupBy(F.col(id_col), F.window(ts_col, "1 minute"))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cost_mb").alias("total_millibits"),
        )
        .withColumn(
            "mean_cost_millibits",
            F.floor(F.col("total_millibits") / F.col("n_tokens"))
            .cast("long"),
        )
        .select(id_col, "n_tokens", "total_millibits",
                "mean_cost_millibits")
    )


def affinity_score_stream(
    vec_stream: DataFrame,
    centroid: list[int],
    scale: int = 1_000_000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Score an embedding stream against a FROZEN quantized centroid
    (trained offline with ``datapipe/similarity.py
    train_quantized_centroid`` — the same offline-train/online-score
    split as the LM scorer above).

    Completely STATELESS: the centroid is a plan literal, scoring is one
    map-side projection — no watermark, no state store, no shuffle;
    append mode at any input rate.  Integer-exact, so a stream replay of
    a static table is bit-identical to the batch scorer
    (``similarity.centroid_affinity``) given the same centroid.
    """
    from tantalus_spark.datapipe.similarity import (
        _quantize_expr,
        affinity_expr,
    )

    base = vec_stream.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col), _quantize_expr(vec_col, scale).alias("_qv"))
    return base.select(
        F.col(id_col),
        affinity_expr("_qv", centroid).alias("affinity_q"),
    )


def bm25_serve_stream(
    query_stream: DataFrame,
    index: DataFrame,
    n_docs: int,
    avgdl: float,
    k1: float = 1.2,
    b: float = 0.75,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    terms_col: str = "terms",
    qid_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming BM25 serving: score an incoming query stream against a
    FROZEN :func:`~tantalus_spark.datapipe.textstats.build_term_index`
    postings index — the retrieval twin of ``lm_score_stream``'s
    frozen-model shape.  The index and its corpus stats (``n_docs``,
    ``avgdl``, emitted at build time with ``with_stats=True``) never
    change mid-stream; they are versioned and swapped between runs, so
    scores are time-independent and reproducible.

    Shape: explode each query's (deduplicated, lowered) terms →
    stream-static join to the postings index on ``term`` (the static
    side prunes to the stream batch's terms — bucket the written index
    by ``term`` and each micro-batch touches only its own postings) →
    stream-static join to the per-term document frequencies (a static
    aggregate of the index, computed once per plan) → the exact
    nano-integer scorer expression shared with the batch paths →
    watermarked per-(query, window, doc) sum.  State is the partial
    per-(query, doc) sums inside the watermark horizon, O(queries ×
    matched docs per horizon), never O(index).

    Returns (query_id, doc_id, score_nano, n_terms_hit, bm25) in append
    mode — the pre-top-k scored frame; rank/limit is the consumer's
    (per-group top-k inside a streaming aggregation would need
    arbitrary stateful sorting, and every serving deployment wants the
    raw scored candidates anyway).  Bit-identical to
    ``bm25_rank_indexed``'s scores on the same index + stats
    (stream-batch parity test in tests/test_textstats.py).
    """
    from tantalus_spark.datapipe.textstats import _bm25_score_nano_expr

    dfreq = index.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # watermark at the SOURCE, before the postings join: the join is
    # inner, so a query whose terms match nothing would never reach a
    # post-join watermark operator and could not advance event time —
    # the stream would hold every open window forever. Watermarking the
    # raw stream tracks every arriving query and propagates through
    # the joins.
    qterms = query_stream.withWatermark(ts_col, watermark).select(
        F.col(qid_col),
        F.col(ts_col),
        F.explode(F.array_distinct(
            F.transform(F.col(terms_col), F.lower))).alias("term"),
    )
    scored = (
        qterms.join(index, "term")
              .join(dfreq, "term")
              .select(F.col(qid_col), F.col(ts_col), F.col(id_col),
                      _bm25_score_nano_expr(n_docs, avgdl, k1, b)
                      .alias("s_nano"))
    )
    return (
        scored
        .groupBy(F.col(qid_col), F.window(ts_col, "1 minute"),
                 F.col(id_col))
        .agg(F.sum("s_nano").alias("score_nano"),
             F.count(F.lit(1)).cast("int").alias("n_terms_hit"))
        .select(qid_col, id_col, "score_nano", "n_terms_hit",
                F.round(F.col("score_nano").cast("double") / F.lit(1e9),
                        4).alias("bm25"))
    )


def dense_serve_stream(
    query_stream: DataFrame,
    feats: DataFrame,
    norms: DataFrame | None = None,
    dim: int = 64,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    terms_col: str = "terms",
    qid_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming dense-leg serving for hybrid retrieval: score an
    incoming query stream against a FROZEN
    :func:`~tantalus_spark.datapipe.textstats.hashed_features` corpus
    table — the model-free-vector twin of :func:`bm25_serve_stream`;
    run both against the same stream and fuse ranks consumer-side for
    the streaming version of the q131 hybrid.

    Exactness without a driver-side query vector: the net signed
    bucket map ``b -> qfeat_b`` is folded ROW-LOCALLY from the (tiny)
    terms array with a higher-order aggregate, then exploded — only
    buckets with ``qfeat_b != 0`` join the feature table, exactly the
    batch leg's bucket pruning (``_dense_leg_scored``), so the emitted
    doc set and every (dot, cos_nano) are bit-identical to the batch
    leg on the same corpus, INCLUDING docs whose net dot is 0 (a
    nonzero-bucket match whose products cancel — the batch leg emits
    them with cos_nano 0 and they can legitimately occupy within-depth
    dense-rank slots, so the stream must emit them too; parity test in
    tests/test_textstats.py compares the actual shared batch leg).
    One stateful aggregation only (append mode forbids chaining).

    Shape: watermark at the source → per-row qnorm + bucket-map fold →
    explode nonzero query buckets → stream-static join to the
    (bucket-keyed) feature table pre-joined with per-doc norms → one
    watermarked (query, window, doc) integer sum → stateless cosine
    projection. State is O(queries × matched docs per horizon), never
    O(corpus). Returns (query_id, doc_id, dot, cos_nano, cosine) in
    append mode."""
    def bucket_of(t):
        return F.pmod(
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
            F.lit(int(dim))).cast("int")

    def sgn_of(t):
        return (F.lit(1) - F.lit(2) * F.pmod(
            F.conv(F.substring(F.md5(F.concat(F.lit("s_"), t)), 1, 15),
                   16, 10).cast("long"),
            F.lit(2))).cast("int")

    if norms is None:
        norms = feats.groupBy(id_col).agg(
            F.sum(F.col("feat") * F.col("feat")).alias("norm"))
    enriched = feats.join(norms, id_col)  # static-static, plans once

    terms_d = F.array_distinct(F.transform(F.col(terms_col), F.lower))
    empty = F.map_from_arrays(F.array().cast("array<int>"),
                              F.array().cast("array<int>"))
    qmap = F.aggregate(
        terms_d, empty,
        lambda acc, t: F.map_concat(
            F.map_filter(acc, lambda k, v: k != bucket_of(t)),
            F.create_map(
                bucket_of(t),
                F.coalesce(F.try_element_at(acc, bucket_of(t)),
                           F.lit(0)) + sgn_of(t))))
    qnorm = F.aggregate(
        F.map_values(qmap), F.lit(0).cast("long"),
        lambda a, v: a + (v * v).cast("long"))

    qbuckets = (query_stream.withWatermark(ts_col, watermark)
                .select(F.col(qid_col), F.col(ts_col),
                        qnorm.alias("_qnorm"),
                        F.explode(qmap).alias("bucket", "_qfeat"))
                .filter(F.col("_qfeat") != 0))
    scored = (
        qbuckets.join(enriched, "bucket")
                .groupBy(F.col(qid_col), F.window(ts_col, "1 minute"),
                         F.col(id_col))
                .agg(F.sum(F.col("_qfeat") * F.col("feat")).cast("long")
                     .alias("dot"),
                     F.first("norm").alias("_norm"),
                     F.first("_qnorm").alias("_qn"))
    )
    cos = (F.col("dot").cast("double")
           / F.sqrt(F.col("_norm").cast("double")
                    * F.col("_qn").cast("double")))
    return (scored.filter((F.col("_norm") > 0) & (F.col("_qn") > 0))
                  .select(qid_col, id_col, "dot",
                          F.floor(cos * F.lit(1e9) + F.lit(0.5))
                          .cast("long").alias("cos_nano"),
                          F.round(cos, 4).alias("cosine")))


def hybrid_serve_batches(
    index: DataFrame,
    n_docs: int,
    avgdl: float,
    feats: DataFrame,
    norms: DataFrame,
    sink,
    k: int = 20,
    depth: int = 50,
    rrf_k: int = 60,
    dim: int = 64,
    k1: float = 1.2,
    b: float = 0.75,
    terms_col: str = "terms",
    qid_col: str = "query_id",
    id_col: str = "doc_id",
):
    """The foreachBatch hybrid server: returns the (batch_df, batch_id)
    callback that runs EVERY query arriving in a micro-batch through
    :func:`~tantalus_spark.datapipe.textstats.hybrid_serve_indexed` —
    both legs off the frozen build-time artifacts (postings index +
    stats, feats + norms; zero raw-text scans) — and hands
    (batch_id, query_id, doc_id, rank_bm25, rank_dense, rrf) rows to
    ``sink``.

    foreachBatch is the honest shape for RRF fusion: each leg's dense
    rank needs the leg's COMPLETE top-``depth`` before fusion — a
    second stateful ranking over a streaming aggregate, which append
    mode forbids (the leg twins ``bm25_serve_stream`` /
    ``dense_serve_stream`` stop at scored candidates for exactly that
    reason, documented there). The whole micro-batch's query set is
    served by ONE
    :func:`~tantalus_spark.datapipe.textstats.hybrid_serve_topk_batch`
    job — query_id rides through both legs' joins and every per-query
    reduction is a rank window, so the driver launches one job per
    BATCH, not one per query (the r8 shape looped
    ``hybrid_serve_indexed`` sequentially; job-launch latency ×
    |queries| was the throughput ceiling of the one component whose
    purpose is throughput). Each served query stays bit-identical to
    :func:`hybrid_serve_indexed` on the same artifacts (differential
    test in tests/test_textstats.py). Per-batch driver work is
    O(queries · k) collected rows; the one Spark job scans only the
    union-of-queries term-/bucket-pruned slivers of the frozen
    artifacts."""
    from tantalus_spark.datapipe.textstats import hybrid_serve_topk_batch

    def _on_batch(batch_df: DataFrame, batch_id: int) -> None:
        qrows = batch_df.select(qid_col, terms_col).collect()
        if not qrows:
            sink([])
            return
        # re-key on the ROW index, not the stream's query_id: each row
        # is an independent request (two rows may legitimately share a
        # query_id, and the id may be any type — a string request id,
        # a UUID), while hybrid_serve_topk_batch keys its output on
        # integer-unique ids by contract. The surrogate maps back to
        # the original id in the sink rows, preserving the per-row
        # serving semantics the r8 loop had.
        queries = [(i, list(q[terms_col])) for i, q in enumerate(qrows)]
        orig = {i: q[qid_col] for i, q in enumerate(qrows)}
        served = hybrid_serve_topk_batch(
            index, queries, feats, k=k, depth=depth, rrf_k=rrf_k,
            dim=dim, k1=k1, b=b, id_col=id_col, n_docs=n_docs,
            avgdl=avgdl, norms=norms)
        rows = [r.asDict() for r in served.collect()]
        # restore the r8 loop's deterministic sink ordering — per-query
        # blocks in request order, rank-ordered (rrf desc, id asc)
        # within each block. The batched job's collect is otherwise
        # shuffle-ordered, and a sink appending to an ordered log would
        # silently change behavior vs the r8 per-query loop.
        rows.sort(key=lambda d: (d["query_id"], -d["rrf"], d[id_col]))
        out = []
        for d in rows:
            d["query_id"] = orig[d.pop("query_id")]
            out.append({"batch_id": int(batch_id), **d})
        sink(out)

    return _on_batch


def drift_monitor_batches(
    baseline: DataFrame,
    sink,
    n_buckets: int = 64,
    text_col: str = "text",
    group_col: str = "source",
    hash_family: str = "md5",
    baseline_n_buckets: int | None = None,
):
    """The foreachBatch drift monitor: returns the (batch_df, batch_id)
    callback that scores every arriving micro-batch's per-group token
    distribution against the FROZEN baseline
    (:func:`~tantalus_spark.datapipe.textstats.token_bucket_counts`)
    and hands (batch_id, group, js_bits, n_tokens) rows to ``sink``.

    foreachBatch is the honest shape for this operator: JS needs the
    batch's WHOLE bucket distribution before the cross-bucket reduce —
    two chained stateful aggregations, which append-mode streaming
    forbids — and drift monitors are batch-granular by definition
    (a per-row drift score is meaningless). Inside the callback the
    math is exactly the batch operator
    :func:`~tantalus_spark.datapipe.textstats.js_against_baseline`,
    so stream and batch agree bit-for-bit (parity test).

    Wire it: ``stream.writeStream.foreachBatch(
    drift_monitor_batches(baseline, sink)).start()``; ``sink`` receives
    a LIST of plain dicts per micro-batch (already collected — the
    frame is |groups| rows) and can forward to a metrics store or an
    alerting table."""
    from tantalus_spark.datapipe.textstats import js_against_baseline

    def _on_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        scored = js_against_baseline(
            batch_df, baseline, n_buckets=n_buckets, text_col=text_col,
            group_col=group_col, hash_family=hash_family,
            baseline_n_buckets=baseline_n_buckets)
        rows = [{"batch_id": int(batch_id), **r.asDict()}
                for r in scored.collect()]
        scored.unpersist()
        sink(rows)

    return _on_batch
