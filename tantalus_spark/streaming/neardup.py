"""Incremental MinHash-LSH near-duplicate detection on a document stream
(SURVEY.md §2.9 extension — no reference analog; the batch counterpart is
``datapipe.dedup.minhash_lsh_pairs``).

A continuously-fed corpus can't re-run batch LSH per drop: the index must
be INCREMENTAL — each arriving document probes the band buckets built from
every earlier document and emits only its new candidate pairs. The shape:

1. per-doc banded MinHash via :func:`datapipe.dedup.minhash_bands` — a
   row-local expression, bit-identical to the batch band hashes, so batch
   and stream agree on bucket membership by construction;
2. explode to (band bucket, doc) rows; shuffle ONLY on the bucket key;
3. ``applyInPandasWithState`` keyed by bucket: state is the sorted doc-id
   list seen in that bucket; each micro-batch emits (old x new) + (new x
   new) pairs and appends the new ids.

State is O(docs-per-bucket) per bucket — the same posting list the batch
join materializes, kept resident instead of rebuilt. ``max_bucket`` caps
runaway buckets (a hot bucket IS a near-dup cluster: by the time it hits
the cap, cap·(cap-1)/2 pairs have already been emitted — further members
still pair against the retained cap, which is enough for connected-
components clustering to absorb them; they are just not retained as new
probe targets). A pair sharing several buckets is emitted once per
sharing bucket — at-least-once, deduplicated downstream exactly like the
batch path's dropDuplicates.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tantalus_spark.datapipe.dedup import minhash_bands


def lsh_candidate_stream(
    docs: DataFrame,
    n_perm: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_family: str = "xxhash64",
    max_bucket: int = 1024,
) -> DataFrame:
    """(d1, d2) candidate near-dup pairs, d1 < d2, emitted incrementally
    as documents arrive. Works on a streaming OR batch ``docs`` frame —
    the batch case replays the same code path for parity tests."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    banded = minhash_bands(
        docs, n_perm=n_perm, bands=bands, shingle_n=shingle_n,
        text_col=text_col, id_col=id_col, hash_family=hash_family)
    bucketed = banded.select(
        F.col(id_col).alias("_doc"),
        F.explode("bands").alias("_bucket"),
    )

    def probe(key, pdfs, state: GroupState):
        seen: list = list(state.get[0]) if state.exists else []
        known = set(seen)
        incoming: list = []
        for pdf in pdfs:
            for d in pdf["_doc"]:
                d = int(d)
                if d not in known:
                    incoming.append(d)
                    known.add(d)
        incoming.sort()
        d1s, d2s = [], []
        for i, new in enumerate(incoming):
            for old in seen:                      # old x new
                lo, hi = (old, new) if old < new else (new, old)
                d1s.append(lo)
                d2s.append(hi)
            for other in incoming[i + 1:]:        # new x new (other > new)
                d1s.append(new)
                d2s.append(other)
        seen.extend(incoming)
        state.update((seen[:max_bucket],))
        yield pd.DataFrame({"d1": d1s, "d2": d2s})

    return (
        bucketed.groupBy("_bucket")
        .applyInPandasWithState(
            probe,
            outputStructType="d1 long, d2 long",
            stateStructType="ids array<long>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def decontaminate_stream(
    docs: DataFrame,
    benchmark_shingles: list[str],
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming benchmark decontamination: annotate each arriving doc
    with its count of token n-grams shared with a STATIC evaluation
    corpus — ``filter(n_bench_hits == 0)`` is the clean stream.

    The benchmark shingle set is bounded by eval-suite size (megabytes),
    exactly the broadcast assumption of the batch
    :func:`datapipe.dedup.decontaminate`; here it ships to executors as
    an Arrow-UDF closure (one broadcast per stage, resident thereafter).
    Stateless map — no shuffle, no watermark, unbounded-stream-safe.
    Tokenization is ``textstats.py_tokens`` — the verified Python twin of
    the batch ``tokens()`` expression (ASCII whitespace, boundary empty
    tokens preserved) — so batch and stream flag identical docs on ANY
    input, not just whitespace-clean fixtures.

    ``benchmark_shingles`` comes from the batch side::

        bench_sh = dedup.shingles(bench_df, n=13)  # strings, not hashed
        shingle_list = [r["shingle"] for r in
                        bench_sh.select("shingle").distinct().collect()]
    """
    from tantalus_spark.datapipe.textstats import py_tokens

    bench = frozenset(benchmark_shingles)

    @F.pandas_udf("int")
    def n_bench_hits(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            if t is None:
                out.append(0)
                continue
            toks = py_tokens(t)
            hits = 0
            seen = set()
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i:i + n])
                if g in bench and g not in seen:
                    seen.add(g)
                    hits += 1
            out.append(hits)
        return pd.Series(out, dtype="int32")

    return docs.withColumn("n_bench_hits", n_bench_hits(F.col(text_col)))
