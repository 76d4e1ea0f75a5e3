"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-hop join + aggregate;
``queries()`` exposes the full operator inventory (SURVEY.md §2 parity
classes + the LLM-data-pipeline operators: dedup, similarity, text
analysis, event analytics, corpus cleaning); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for EVERY query in the driver's 50-entry window —
since r3 the LSH trio (45/46/69) runs a portable md5-derived hash family
whose banding and bucketing replay bit-for-bit in DuckDB, so all 50 are
full value oracles. The only rows-only tail entry is 74_pq_ann, whose
iterative KMeans codebook training is genuinely not SQL-expressible
(exactness and recall are unit-proven instead). QUERIES is explicitly
ordered so the 50-entry window covers every operator family.
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
