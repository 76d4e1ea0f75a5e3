"""Deterministic ID generation (SURVEY.md §2.6 W2, §7 hard part 5).

Reference: next ``SA####`` patient id = max(numeric suffix of patient_ids
starting with 'SA') + 1 (views.py:468-473, forms.py:146-160), assigned
sequentially across ingest rows; version bump ``v{N+1}.0.0``
(views.py:1094-1095).

Never ``monotonically_increasing_id`` for user-visible ids — the max +
``row_number`` over a single ordered window is the distributed-safe scheme
(the ingest batch is small; the windowed assignment is one tiny stage after
a broadcast-able max)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def max_sa_number(patient: DataFrame) -> int:
    """max numeric suffix over 'SA'-prefixed patient ids (views.py:468-473)."""
    row = (
        patient.filter(F.col("patient_id").startswith("SA"))
        .select(F.max(F.substring("patient_id", 3, 10).try_cast("int")).alias("m"))
        .first()
    )
    return int(row["m"] or 0)


def assign_sa_ids(patient: DataFrame, new_rows: DataFrame,
                  order_col: str) -> DataFrame:
    """Fill null patient_id on *new_rows* with consecutive SA ids starting
    at max+1, in ``order_col`` order (forms.py:160-173)."""
    start = max_sa_number(patient)
    w = W.orderBy(order_col)
    needs = F.col("patient_id").isNull()
    numbered = new_rows.withColumn(
        "_rn",
        F.sum(needs.cast("int")).over(
            w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return numbered.withColumn(
        "patient_id",
        F.when(needs, F.concat(F.lit("SA"), (F.lit(start) + F.col("_rn"))
                               .cast("string")))
        .otherwise(F.col("patient_id")),
    ).drop("_rn")


def bump_major_version(version_col):
    """'v3.0.0' -> 'v4.0.0' (views.py:1094-1095)."""
    # try_cast: ANSI-safe — malformed versions bump to null, not an error
    major = F.split(F.regexp_replace(version_col, "^v", ""), r"\.")[0] \
        .try_cast("int")
    return F.concat(F.lit("v"), (major + 1).cast("string"), F.lit(".0.0"))


VERSION_RE = r"^v\d+\.\d+\.\d+$"  # models.py:618-621, 999-1002


def valid_version(version_col):
    return version_col.rlike(VERSION_RE)
