"""Skew-mitigation operators: salted joins and skew-safe aggregation.

AQE's skew-join handling (enabled in ``session.py``) splits oversized
shuffle partitions at runtime, but two shapes still need explicit help:

- **joins where one key dominates**: AQE can split the skewed side's
  partitions only for sort-merge joins it can observe; a pre-salted join
  bounds the worst task deterministically, independent of runtime stats.
- **count-distinct / collect over a hot key**: the shuffle hashes on the
  GROUP BY key alone, so one reducer receives the hot key's entire value
  stream. Re-keying the first stage by (key, value) or (key, salt) spreads
  it; the second stage merges tiny partials.

Salts are deterministic (hash of payload columns, not ``rand()``) so plans
stay reproducible and retries/speculative tasks agree on placement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skew-prone big side against a modest side by exploding
    the modest side ``n_salts``× and salting the big side's rows.

    Each hot-key partition shrinks ~n_salts×; the replicated side grows
    n_salts× (keep it the smaller input). Result equals a plain join for
    ``inner``/``left``/``left_semi``/``left_anti``. ``right``/``full`` are
    rejected: an unmatched replicated-side row would surface once per salt
    (n_salts duplicates vs the plain join).
    """
    if how not in ("inner", "left", "left_outer", "left_semi", "left_anti"):
        raise ValueError(
            f"salted_join(how={how!r}): only inner/left/left_semi/left_anti "
            "preserve plain-join semantics; right/full would duplicate "
            "unmatched replicated rows n_salts times")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in skewed.columns if c not in keys] or keys
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in payload]), F.lit(n_salts))
    big = skewed.withColumn("__salt", salt.cast("int"))
    rep = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return big.join(rep, keys + ["__salt"], how).drop("__salt")


def skew_safe_count_distinct(
    df: DataFrame,
    keys: str | list[str],
    value_col: str,
    alias: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT value) per key without a hot reducer.

    Stage 1 dedupes on (keys, value) — the shuffle hash includes the value,
    so a hot key's rows spread over all partitions. Stage 2 counts per key
    with map-side partial aggregation (each partition contributes at most
    one partial row per key). Equivalent to
    ``groupBy(keys).agg(countDistinct(value))``.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    return (
        df.select(*keys, value_col)
        .dropDuplicates(keys + [value_col])
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(alias))
    )


def skew_safe_collect_set(
    df: DataFrame,
    keys: str | list[str],
    value_col: str,
    alias: str = "values",
    max_values: int | None = None,
) -> DataFrame:
    """Sorted distinct value list per key, dedup spread like
    :func:`skew_safe_count_distinct`; ``max_values`` caps the list (slice
    after sort) so one pathological key can't blow up a row."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    out = (
        df.select(*keys, value_col)
        .dropDuplicates(keys + [value_col])
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list(value_col)).alias(alias))
    )
    if max_values is not None:
        out = out.withColumn(alias, F.slice(F.col(alias), 1, max_values))
    return out


def approx_count_distinct(
    df: DataFrame,
    keys: str | list[str],
    value_col: str,
    alias: str = "n_distinct_approx",
    rsd: float = 0.05,
) -> DataFrame:
    """COUNT(DISTINCT) per key as a HyperLogLog++ sketch — the constant-
    memory alternative when even the dedup-spread of
    :func:`skew_safe_count_distinct` shuffles too much (e.g. distinct user
    ids per day over 100 TB of events).

    Per-group state is a fixed-size HLL register array (grows with 1/rsd²,
    not with cardinality), partial-aggregates map-side, and merges
    associatively — the sketch property that makes it safe at any scale.
    ``rsd`` is the target relative standard deviation (default 5%).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias(alias))
