"""End-to-end corpus cleaning: the composition a training-data pipeline
actually runs — quality gates → language filter → exact dedup — expressed
as ONE Catalyst plan over the documents table.

Every gate is a column-level derivation on the SAME projection — one scan,
zero joins; the only shuffle is the content-digest window for dedup,
regardless of how many gates run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tantalus_spark.datapipe.textstats import lang_pred_expr, tokens


def clean_corpus(
    docs: DataFrame,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_alpha_ratio: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Surviving documents after quality + language + exact-dup gates:
    (doc_id, n_tokens, lang_pred), keeping the lowest doc_id per identical
    content."""
    text = F.col(text_col)
    features = docs.select(
        F.col(id_col),
        F.size(tokens(text)).alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))
            / F.length(text), 4,
        ).alias("alpha_ratio"),
        lang_pred_expr(text).alias("lang_pred"),
        F.md5(text).alias("__md5"),
    )
    gated = features.filter(
        F.col("n_tokens").between(min_tokens, max_tokens)
        & (F.col("alpha_ratio") >= min_alpha_ratio)
        & F.col("lang_pred").isin(list(langs))
    )
    # keep the lowest doc_id per identical content via a window min — one
    # shuffle on the digest and a SINGLE evaluation of the heavy text
    # expressions, versus groupBy + semi-join which re-scans and re-derives
    # the gated projection on both sides of the join
    w = Window.partitionBy("__md5")
    return (
        gated.withColumn("__keep_id", F.min(id_col).over(w))
        .filter(F.col(id_col) == F.col("__keep_id"))
        .select(id_col, "n_tokens", "lang_pred")
    )
