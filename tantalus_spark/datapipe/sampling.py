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


def split_bucket(id_col, n_buckets: int = 100, salt: str | None = None):
    """Deterministic bucket 0..n_buckets-1 from the row id: first 15 hex
    chars of md5(id) as int, mod n — identical in any engine. ``salt``
    prefixes the hashed string (``salt_id``) so two consumers hashing the
    same ids draw independent buckets."""
    key = id_col.cast("string")
    if salt is not None:
        key = F.concat_ws("_", F.lit(salt), key)
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10)
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


def weighted_mix(
    sources: dict[str, "DataFrame"],
    weights: dict[str, float],
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Deterministic weighted dataset mixing — the op that builds a
    training mix ("60% web, 30% code, 10% books") from cleaned sources.

    Each source keeps a hash-derived fraction of its rows equal to
    ``weights[name]`` and is tagged with its name. Selection is
    :func:`split_bucket` on the id SALTED WITH THE SOURCE NAME — without
    the salt, sources sharing ids would select fully correlated subsets
    (a 0.2 source's picks a strict subset of a 0.6 source's). No RNG,
    stable under re-runs, appends, and repartitioning, and SQL-auditable
    (the same md5-bucket rule as hash_split). Weights are quantized to
    whole percent (bucket space is 100). Union is by name; schemas must
    match across sources. One map pass per source, zero shuffles.
    """
    out = None
    for name, df in sources.items():
        frac = weights[name]
        picked = df.filter(
            split_bucket(F.col(id_col), salt=name) < int(round(frac * 100))
        ).withColumn(source_col, F.lit(name))
        out = picked if out is None else out.unionByName(picked)
    return out
