"""BPE tokenizer-vocabulary induction over the corpus.

:func:`bpe_train` learns byte-pair-encoding merge rules (Sennrich et al.,
ACL 2016) the way production tokenizer trainers do: the corpus collapses
to a (word, freq) table FIRST — one corpus-scale shuffle — and every
merge iteration then runs on that vocabulary-sized table only.  At 100 TB
the word-frequency aggregation is the only pass that touches the data;
the iterative phase is O(vocab) per merge regardless of corpus size
(GPT-2's trainer holds the same table in one process; here it stays a
distributed DataFrame so a billion-type vocabulary still fits).

Iterative driver loop with ``localCheckpoint`` per round (the repo's
fixpoint-loop protocol, see ``dedup.dup_clusters``): each iteration is
one explode + integer-sum groupBy for pair counts, a single-row action
for the argmax pair (count desc, pair asc — fully deterministic), and an
Arrow-vectorized merge pass over the symbol arrays.  The merge rewrite is
a pandas UDF by design: it is a sequential left-to-right scan per word
(inherently order-dependent, not expressible as a Spark column op) over
the vocabulary-sized table, not the corpus.

Not SQL-expressible (iterative argmax + rewrite), so the inventory gate
is rows-only — the q74 PQ-KMeans precedent; exactness is instead proven
in tests against a pure-Python reference implementation.

Reference parity note: the reference (molonc/tantalus) has no tokenizer
subsystem — this extends the engine for the LLM-data-pipeline mandate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tantalus_spark.datapipe.textstats import py_tokens, tokens
from tantalus_spark.operators.spread import spread_small_scan

END_OF_WORD = "</w>"


def merge_word(syms: list, left: str, right: str) -> list:
    """One left-to-right merge pass: every adjacent (left, right) becomes
    one symbol.  Shared by the Spark UDF and the tests' pure-Python
    reference trainer."""
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) table — the single corpus-scale pass.  Symbols start
    as single characters with an explicit end-of-word marker appended
    (the marker is its own symbol, so learned merges distinguish
    word-final units — standard BPE)."""
    df = spread_small_scan(df)
    toks = df.select(
        F.explode(tokens(F.lower(F.col(text_col)))).alias("word"))
    freqs = (
        toks.filter(F.length("word") > 0)
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    )
    # split('') yields a trailing empty string; slice it off, append EOW.
    chars = F.slice(F.split(F.col("word"), ""),
                    1, F.length("word"))
    return freqs.select(
        "word", "freq",
        F.concat(chars, F.array(F.lit(END_OF_WORD))).alias("syms"),
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules; returns one row per rule:
    (rank, left, right, merged, pair_freq), rank 1 = first-learned.

    Ties break on (freq desc, left asc, right asc) so the rule sequence
    is deterministic for any partitioning — required for the pure-Python
    differential test and for reproducible tokenizers generally.
    """
    vocab = word_freqs(df, text_col=text_col).localCheckpoint()
    spark = df.sparkSession

    def merge_udf(left: str, right: str):
        # Bind the pair via closure cells (pickled BY VALUE by cloudpickle)
        # — a module-level global would be re-imported as its empty default
        # inside executor Python workers on a real cluster.
        @pandas_udf("array<string>")
        def apply_merge(syms: pd.Series) -> pd.Series:
            return syms.map(lambda s: merge_word(list(s), left, right))
        return apply_merge

    rules = []
    for rank in range(1, n_merges + 1):
        pair_counts = (
            vocab.select(
                "freq",
                F.explode(
                    F.arrays_zip(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1)
                        .alias("left"),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1)
                        .alias("right"),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.left").alias("left"),
                     F.col("p.right").alias("right"))
            .agg(F.sum("freq").alias("pair_freq"))
        )
        top = (
            pair_counts
            .orderBy(F.col("pair_freq").desc(), F.col("left").asc(),
                     F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0].pair_freq < 2:
            break
        best = top[0]
        rules.append((rank, best.left, best.right,
                      best.left + best.right, int(best.pair_freq)))
        vocab = vocab.select(
            "word", "freq",
            merge_udf(best.left, best.right)(F.col("syms")).alias("syms"),
        ).localCheckpoint()

    return spark.createDataFrame(
        rules, "rank int, left string, right string, merged string, "
               "pair_freq long")


def bpe_apply(
    df: DataFrame,
    merges,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ENCODE with a learned rule list: tokenize, split each word to
    chars + EOW, apply every merge in rank order; returns
    (id, units array<string>, n_units) — the real token count a packing
    or budgeting stage consumes (vs whitespace counts).

    ``merges`` is the DataFrame from :func:`bpe_train` (collected here —
    bounded by n_merges, a few thousand rows for a real tokenizer) or an
    ordered ``[(left, right), ...]`` list.  The rule list broadcasts
    inside the UDF closure; encoding is a pure map stage — zero shuffles
    at any corpus size.  Per-batch word→units memoization mirrors
    production tokenizers (Zipf makes the cache hit rate ~word-frequency
    mass).
    """
    if isinstance(merges, DataFrame):
        merges = [(r["left"], r["right"])
                  for r in merges.orderBy("rank").collect()]
    rules = list(merges)

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict = {}

        def enc_word(w: str) -> list:
            u = cache.get(w)
            if u is None:
                u = list(w) + [END_OF_WORD]
                for left, right in rules:
                    u = merge_word(u, left, right)
                cache[w] = u
            return u

        def enc_text(t) -> list:
            if t is None:
                return []
            out = []
            for w in py_tokens(t.lower()):
                if w:
                    out.extend(enc_word(w))
            return out

        return texts.map(enc_text)

    out = df.select(
        F.col(id_col),
        encode(F.col(text_col)).alias("units"),
    )
    return out.withColumn("n_units", F.size("units"))


def bpe_compression(
    df: DataFrame,
    merges,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenizer compression-rate audit per corpus slice: characters
    per BPE unit under a FROZEN merge list — the metric that chooses
    (or re-trains) a tokenizer per domain before a training run (a
    slice whose chars/unit is far below the corpus mean is being
    shredded into char-level pieces: vocabulary mismatch, more compute
    per byte). Composes :func:`bpe_apply` (pure map stage, rules in
    the Arrow closure) with one tiny (group) integer aggregate;
    chars/unit divides two exact BIGINTs, so the frame replays in SQL.
    Returns (group, n_docs, n_chars, n_units, chars_per_unit), slices
    with zero units omitted (nothing to measure)."""
    enc = bpe_apply(df, merges, text_col=text_col, id_col=id_col) \
        .select(F.col(id_col), "n_units")
    meta = df.select(F.col(id_col), F.col(group_col).alias("grp"),
                     F.length(F.col(text_col)).cast("long")
                     .alias("n_chars"))
    return (meta.join(enc, id_col)
                .groupBy("grp")
                .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                     F.sum("n_chars").alias("n_chars"),
                     F.sum("n_units").cast("long").alias("n_units"))
                .filter(F.col("n_units") > 0)
                .select(F.col("grp").alias(group_col),
                        "n_docs", "n_chars", "n_units",
                        F.round(F.col("n_chars").cast("double")
                                / F.col("n_units").cast("double"), 4)
                        .alias("chars_per_unit")))
