"""Deterministic dataset splitting and stratified sampling for training
pipelines.

- :func:`hash_split` — reproducible train/val/test assignment from a hash
  of the id: no RNG state, no shuffle, stable under re-runs, appends, and
  repartitioning (the property that matters when the corpus is rebuilt).
  The md5-derived bucket is engine-independent, so the split is
  SQL-auditable (oracle-gated in the inventory).
- :func:`stratified_sample` — per-stratum fractions via ``sampleBy``
  (seeded Bernoulli per row; approximate sizes, one pass, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_bucket(id_col, n_buckets: int = 100):
    """Deterministic bucket 0..n_buckets-1 from the row id: first 15 hex
    chars of md5(id) as int, mod n — identical in any engine."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10)
    return F.pmod(h.cast("long"), F.lit(n_buckets))


def hash_split(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    bucket_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split by cumulative hash-bucket ranges.

    ``fractions`` maps split name -> fraction (must sum to <= 1; remainder
    rows get the last split). E.g. {"train": .8, "val": .1, "test": .1}.
    """
    buckets = split_bucket(F.col(id_col))
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond = buckets < int(round(cum * 100))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = names[-1]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn(bucket_col, expr)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum Bernoulli sampling (e.g. downsample dominant languages):
    one map pass, approximate per-group sizes, deterministic under the
    seed AND the input partitioning."""
    return df.sampleBy(strata_col, fractions, seed=seed)
