"""Custom join operators Spark lacks as built-ins: as-of join and
bucketed range join.

The reference (molonc/tantalus) only ever emits equi-joins over its FK
graph (SURVEY.md §2.3) — these operators are the beyond-parity additions a
time-series / interval workload needs, built as compositions of existing
DataFrame ops so Catalyst still owns the physical plan.

Scale notes:

- **as-of join**: the naive formulation (non-equi theta join + per-row max)
  explodes into O(left × right-per-key) pairs. The union trick below does
  ONE shuffle on the join key and a single window pass — state per row is
  one "last seen right row", independent of key cardinality or time-series
  length. This is the same plan Flink/KDB use for temporal joins.
- **range join**: a BETWEEN join against a broadcast band dimension is a
  broadcast nested-loop — fine for small dims. For large interval tables,
  ``bucketed_range_join`` maps both sides onto fixed-width buckets
  (intervals explode to every bucket they overlap) and equi-joins on the
  bucket id, turning the theta join into a shuffle-bounded equi-join +
  residual filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_time: str,
    right_time: str,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: for each left row, attach the right row with the
    greatest ``right_time <= left_time`` (direction='backward', inclusive)
    or smallest ``right_time >= left_time`` ('forward') sharing the key.

    The right side must be unique per (key, right_time) — pre-aggregate it
    if not; ties would otherwise be nondeterministic in any engine.

    Implementation: tag both sides, union, one window sorted by
    (time, tag) per key, ``last(..., ignorenulls=True)`` to carry the most
    recent right row forward onto each left row. One shuffle, no pair
    explosion.
    """
    keys = [on] if isinstance(on, str) else list(on)
    rcols = [c for c in right.columns if c not in keys]
    lcols = [c for c in left.columns]

    out_rcols = {c: (c + suffix if c in lcols else c) for c in rcols}

    from tantalus_spark.functions.times import epoch_expr

    if direction == "forward":
        # mirror time so "most recent before" becomes "nearest after"
        t_expr = lambda df, c: -epoch_expr(df, c)  # noqa: E731
    elif direction == "backward":
        t_expr = lambda df, c: epoch_expr(df, c)  # noqa: E731
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in rcols],
        t_expr(left, left_time).alias("__t"),
        F.lit(1).alias("__tag"),
    )
    r_tagged = right.select(
        *[F.col(c) for c in keys],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in keys],
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        t_expr(right, right_time).alias("__t"),
        F.lit(0).alias("__tag"),
    ).select(*lcols, *[f"__r_{c}" for c in rcols], "__t", "__tag")

    # right rows sort before left rows at equal time -> inclusive match
    w = (
        W.partitionBy(*keys)
        .orderBy("__t", "__tag")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        *lcols, "__t", "__tag",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w)
            .alias(out_rcols[c])
            for c in rcols
        ],
        F.last(F.when(F.col("__tag") == 0, F.col("__t")), ignorenulls=True)
        .over(w).alias("__rt"),
    )
    out = carried.filter(F.col("__tag") == 1)
    if tolerance_seconds is not None:
        within = F.abs(F.col("__t") - F.col("__rt")) <= F.lit(
            float(tolerance_seconds))
        out = out.select(
            *lcols, "__rt", "__t",
            *[
                F.when(within, F.col(out_rcols[c])).alias(out_rcols[c])
                for c in rcols
            ],
        )
    return out.select(*lcols, *[out_rcols[c] for c in rcols])


def range_join(
    left: DataFrame,
    bands: DataFrame,
    value_col: str,
    low_col: str = "lo",
    high_col: str = "hi",
    closed: str = "left",
) -> DataFrame:
    """Join each left row to the band(s) whose [lo, hi) interval contains
    ``value_col``. The band table is broadcast — correct choice whenever the
    dimension is small (tariff bands, SLA tiers, histogram edges)."""
    if closed == "left":
        cond = (F.col(value_col) >= F.col(low_col)) & (
            F.col(value_col) < F.col(high_col))
    elif closed == "both":
        cond = (F.col(value_col) >= F.col(low_col)) & (
            F.col(value_col) <= F.col(high_col))
    else:
        raise ValueError(f"closed must be left|both, got {closed!r}")
    return left.join(F.broadcast(bands), cond, "left")


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    value_col: str,
    low_col: str = "lo",
    high_col: str = "hi",
    bucket_width: float = 1000.0,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join for LARGE interval tables: both sides map to
    fixed-width buckets (intervals explode to every overlapped bucket), the
    join becomes an equi-join on bucket id plus a residual range filter.

    Shuffle volume is O(points + sum(interval_width)/bucket_width) instead
    of the full cross product per key — the knob is ``bucket_width``, sized
    so a typical interval spans O(1) buckets.
    """
    b = F.lit(float(bucket_width))
    p = points.withColumn(
        "__bucket", F.floor(F.col(value_col).cast("double") / b))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(low_col).cast("double") / b),
                F.floor(F.col(high_col).cast("double") / b),
            )
        ),
    )
    cond = (
        (p["__bucket"] == iv["__bucket"])
        & (F.col(value_col) >= F.col(low_col))
        & (F.col(value_col) < F.col(high_col))
    )
    return p.join(iv, cond, how).drop(p["__bucket"]).drop(iv["__bucket"])
