"""Adaptive scan spreading for CPU-dense per-row operators.

Spark cannot split a parquet scan finer than row-group boundaries, and
common single-node writers (pandas, DuckDB) default to huge row groups —
a multi-MB documents table lands in ONE row group and every downstream
map stage runs on one core while the rest of the cluster idles. This is
a fixture-scale / small-files problem, not a 100 TB problem: big tables
arrive as thousands of files and row groups, where the gate below is
never taken and the operator stays exchange-free.

``spread_small_scan`` inserts a round-robin repartition ONLY when both:

- the scan's effective parallelism (estimated splits, capped by the
  total parquet row-group count from local footers) is below half the
  cluster's cores, AND
- the input is big enough (>*min_bytes* on disk) that the per-row CPU
  saved outweighs the one extra shuffle of the raw rows (measured on the
  sf0.1 fixture: below ~2 MB compressed the shuffle round-trip costs
  more than it recovers; at 10x that, spreading is a ~3x wall win for
  winnowing / corpus-cleaning / doc-profile stages).

The gate runs at plan-BUILD time on the driver, so it must be cheap:
splits are estimated from file sizes with Spark's own packing formula
(maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
totalBytes/parallelism))) instead of materializing `df.rdd`, footers are
read with pyarrow only for local files, and the verdict is memoized per
(file-set, min_bytes) — repeated query builds over the same table cost
one dict lookup. Streaming DataFrames and non-local/unstattable inputs
pass through untouched (at real scale the gate is a no-op anyway).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

_decision_cache: dict[tuple, bool] = {}


def _local_path(uri: str) -> str | None:
    if uri.startswith("file:"):
        from urllib.parse import urlparse, unquote

        return unquote(urlparse(uri).path)
    if "://" not in uri:
        return uri
    return None


def _should_spread(spark, files: tuple[str, ...], min_bytes: int) -> bool:
    cores = spark.sparkContext.defaultParallelism
    locals_ = [_local_path(f) for f in files]
    if any(p is None for p in locals_):
        return False
    try:
        sizes = [os.path.getsize(p) for p in locals_]
        import pyarrow.parquet as pq

        groups = sum(
            pq.ParquetFile(p).metadata.num_row_groups
            for p in locals_
            if p.endswith(".parquet")
        )
    except Exception:
        return False
    total = sum(sizes)
    if total < min_bytes:
        return False
    conf = spark.conf
    def _bytes(key, default):
        try:
            v = str(conf.get(key))
            for suf, mul in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
                if v.lower().endswith(suf + "b") or v.lower().endswith(suf):
                    return int(float(v.lower().rstrip("b").rstrip(suf)) * mul)
            return int(v)
        except Exception:
            return default
    max_pb = _bytes("spark.sql.files.maxPartitionBytes", 128 << 20)
    open_cost = _bytes("spark.sql.files.openCostInBytes", 4 << 20)
    # Spark's split sizing: each file also "costs" openCost when packing
    padded = total + len(sizes) * open_cost
    split = min(max_pb, max(open_cost, padded // max(cores, 1)))
    est_splits = sum(max(1, s // max(split, 1)) for s in sizes)
    effective = min(est_splits, groups) if groups else est_splits
    return effective < max(2, cores // 2)


def spread_small_scan(df: DataFrame, min_bytes: int = 2 * 1024 * 1024) -> DataFrame:
    """Repartition *df* to the session's core count iff the scan is
    parallelism-starved (fewer effective splits than half the cores) and
    large enough for the shuffle to pay for itself. Identity on streaming
    inputs and on anything already parallel — in particular a no-op on
    any real multi-file at-scale layout."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    try:
        files = tuple(sorted(df.inputFiles()))
    except Exception:
        return df
    if not files:
        return df
    key = (files, min_bytes, spark.sparkContext.defaultParallelism)
    verdict = _decision_cache.get(key)
    if verdict is None:
        verdict = _should_spread(spark, files, min_bytes)
        _decision_cache[key] = verdict
    if not verdict:
        return df
    return df.repartition(spark.sparkContext.defaultParallelism)
