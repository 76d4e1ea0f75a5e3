"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-hop join + aggregate;
``queries()`` exposes the full operator inventory (SURVEY.md §2 parity
classes + the LLM-data-pipeline operators: dedup, similarity, text
analysis, event analytics, corpus cleaning); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for EVERY query in the driver's 50-entry window —
the gated LSH trio (45/46/69), winnowing (53), and PQ ANN (74) use
portable md5-/integer-exact constructions that replay bit-for-bit in
DuckDB, so all 50 are full value oracles (production defaults stay
xxhash64/float — bench.py times those). r4 rotated the 16 entries that
had never had an official driver row into the window (see _QUERY_ORDER).
The only rows-only entry is the tail's 75_ann_trained, whose iterative
MLlib-KMeans IVF+PQ training is genuinely not SQL-expressible (recall
and ADC exactness are unit-proven instead).
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
