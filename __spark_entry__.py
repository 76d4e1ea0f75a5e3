"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-hop join + aggregate;
``queries()`` exposes the full operator inventory (SURVEY.md §2 parity
classes + the LLM-data-pipeline operators: dedup, similarity, text
analysis, event analytics, corpus cleaning); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query — all but MinHash-LSH,
SimHash, and hyperplane-LSH, whose xxhash64-based candidate generation has
no SQL counterpart (rows-only checks by design; their math is oracle-proven
via 60_minhash_signatures / 44_ngram_jaccard / 51_embedding_near_dup plus
recall unit tests). QUERIES is explicitly ordered so the driver's 50-entry
correctness window covers every operator family.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tantalus_spark.inventory import ORACLES, QUERIES, q07_region_revenue


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: revenue per region through
    the lineitem→orders→customer→nation→region join chain."""
    return q07_region_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
