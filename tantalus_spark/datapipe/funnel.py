"""Event-sequence analytics: ordered funnels and cohort retention.

Batch counterparts of the streaming module — the analyses a 100 TB/day
event feed feeds into dashboards. Both are pure DataFrame compositions:

- **funnel**: step i is one aggregation over events semi-joined to the
  users who reached step i-1, keyed on user — N_steps shuffles on user_id,
  no window state, no row explosion. Strictly-ordered semantics (each step
  must occur strictly after the user's step-(i-1) time).
- **retention**: one distinct (user, period) frame + a min-period cohort
  frame, joined and bucketed — two shuffles total regardless of horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel user counts: (step, step_idx, n_users) where a user
    counts for step i only with an event of type steps[i] strictly after
    their step i-1 completion time (min-time semantics)."""
    base = events.select(user_col, ts_col, type_col)
    reached = (
        base.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("__t"))
    )
    out_rows = [(steps[0], 0, reached)]
    for i, step in enumerate(steps[1:], start=1):
        nxt = (
            base.filter(F.col(type_col) == step)
            .join(reached, user_col)
            .filter(F.col(ts_col) > F.col("__t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("__t"))
        )
        out_rows.append((step, i, nxt))
        reached = nxt
    frames = [
        df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(step).alias("step"),
            F.lit(idx).cast("int").alias("step_idx"),
            "n_users",
        )
        for step, idx, df in out_rows
    ]
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention: (cohort, k, n_users) — users whose first-ever
    activity period is ``cohort`` and who were also active k periods later.
    k=0 row is the cohort size."""
    days = {"day": 1, "week": 7}[period]
    act = (
        events.select(
            F.col(user_col).alias("u"),
            F.date_trunc(period, F.col(ts_col)).alias("p"),
        )
        .dropDuplicates(["u", "p"])
    )
    cohort = act.groupBy("u").agg(F.min("p").alias("cohort"))
    return (
        act.join(cohort, "u")
        .groupBy(
            "cohort",
            (F.datediff(F.col("p"), F.col("cohort")) / days)
            .cast("int").alias("k"),
        )
        .agg(F.countDistinct("u").alias("n_users"))
    )


def gap_fill_daily(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Time-series resample: per user, a COMPLETE daily grid from their
    first to last event with per-day aggregates, gaps emitted as zero-
    event rows, and the last observed daily total FORWARD-FILLED across
    gaps — the hypertable gap-fill/locf shape (TimescaleDB's
    ``time_bucket_gapfill`` + ``locf``).

    Exactness: per-day sums are INTEGER cents (``floor(value*100+0.5)``,
    deterministic IEEE double ops in any engine) so no float summation
    order can perturb the gate. Forward fill is ``last(..., ignorenulls)``
    over the per-user day order.

    Scale shape: one (user, day) aggregate shuffle; the grid is a
    per-user ``sequence()`` explode (rows = days in the user's span, not
    corpus size); the fill window partitions by user — parallel across
    users, and within a user bounded by calendar days, not event count.
    A 100 TB event store gap-fills with the same plan; only the daily
    aggregate sees the raw volume, and it combines map-side.
    """
    cents = F.floor(F.col(value_col) * F.lit(100.0) + F.lit(0.5)).cast("long")
    ev = events.select(
        F.col(user_col),
        F.to_date(F.col(ts_col)).alias("day"),
        cents.alias("_cents"),
    )
    daily = ev.groupBy(user_col, "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("_cents").alias("day_cents"),
    )
    bounds = ev.groupBy(user_col).agg(
        F.min("day").alias("_d0"), F.max("day").alias("_d1"))
    grid = bounds.select(
        F.col(user_col),
        F.explode(F.expr("sequence(_d0, _d1, interval 1 day)")).alias("day"),
    )
    j = (grid.join(daily, [user_col, "day"], "left")
         .withColumn("n_events", F.coalesce("n_events", F.lit(0))))
    w = (W.partitionBy(user_col).orderBy("day")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return j.select(
        user_col, "day", "n_events", "day_cents",
        F.last("day_cents", ignorenulls=True).over(w).alias("filled_cents"),
    )
