"""End-to-end corpus cleaning: the composition a training-data pipeline
actually runs — quality gates → language filter → exact dedup — expressed
as ONE Catalyst plan over the documents table.

Each stage is a column-level derivation on the same scan (quality features,
language scores) or a digest group-by (dedup); nothing materializes between
stages, so the whole pipeline is a single pass + one shuffle on the content
digest regardless of how many gates run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tantalus_spark.datapipe.textstats import lang_scores, quality_score


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
    q = quality_score(docs, text_col=text_col, id_col=id_col)
    lang = lang_scores(docs, text_col=text_col, id_col=id_col).select(
        F.col(id_col), "lang_pred")
    digests = docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("__md5"))

    gated = (
        q.join(lang, id_col)
        .join(digests, id_col)
        .filter(
            F.col("n_tokens").between(min_tokens, max_tokens)
            & (F.col("alpha_ratio") >= min_alpha_ratio)
            & F.col("lang_pred").isin(list(langs))
        )
    )
    keep = gated.groupBy("__md5").agg(F.min(id_col).alias(id_col))
    return (
        gated.join(keep, [id_col, "__md5"], "left_semi")
        .select(id_col, "n_tokens", "lang_pred")
    )
