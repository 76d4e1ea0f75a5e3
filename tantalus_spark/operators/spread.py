"""Adaptive scan spreading for CPU-dense per-row operators.

Spark cannot split a parquet scan finer than row-group boundaries, and
common single-node writers (pandas, DuckDB) default to huge row groups —
a multi-MB documents table lands in ONE row group and every downstream
map stage runs on one core while the rest of the cluster idles. This is
a fixture-scale / small-files problem, not a 100 TB problem: big tables
arrive as thousands of files and row groups, where the gate below is
never taken and the operator stays exchange-free.

``spread_small_scan`` inserts a round-robin repartition ONLY when both:

- the scan's effective parallelism (splits, capped by the total parquet
  row-group count when footers are readable locally) is below half the
  cluster's cores, AND
- the input is big enough (>*min_bytes* on disk) that the per-row CPU
  saved outweighs the one extra shuffle of the raw rows (measured on the
  sf0.1 fixture: below ~2 MB compressed the shuffle round-trip costs
  more than it recovers; at 10x that, spreading is a ~3x wall win for
  winnowing / corpus-cleaning / doc-profile stages).

Streaming DataFrames pass through untouched (no .rdd, no repartition).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _local_path(uri: str) -> str | None:
    if uri.startswith("file:"):
        from urllib.parse import urlparse, unquote

        return unquote(urlparse(uri).path)
    if "://" not in uri:
        return uri
    return None


def spread_small_scan(df: DataFrame, min_bytes: int = 2 * 1024 * 1024) -> DataFrame:
    """Repartition *df* to the session's core count iff the scan is
    parallelism-starved (fewer effective splits than half the cores) and
    large enough for the shuffle to pay for itself. Identity on streaming
    inputs and on anything already parallel — in particular a no-op on
    any real multi-file at-scale layout."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    cores = spark.sparkContext.defaultParallelism
    try:
        parts = df.rdd.getNumPartitions()
        files = df.inputFiles()
    except Exception:
        return df
    effective = parts
    total_bytes = None
    if files:
        locals_ = [_local_path(f) for f in files]
        if all(p is not None for p in locals_):
            try:
                total_bytes = sum(os.path.getsize(p) for p in locals_)
                import pyarrow.parquet as pq

                groups = sum(
                    pq.ParquetFile(p).metadata.num_row_groups
                    for p in locals_
                    if p.endswith(".parquet")
                )
                if groups:
                    effective = min(parts, groups)
            except Exception:
                pass
    if effective >= max(2, cores // 2):
        return df
    if total_bytes is not None and total_bytes < min_bytes:
        return df
    return df.repartition(cores)
