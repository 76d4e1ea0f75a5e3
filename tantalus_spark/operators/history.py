"""Audit-history subsystem: history capture + the curation diff engine.

Reference: django-simple-history snapshots on nearly every model (SURVEY.md
§1.1; ``HistoricalRecords()`` models.py:31,124,464,1009) with
``history_type`` '+'/'~'/'-' rows, consumed by the curation change log
``tantalus/services.py:4-78`` — a Python loop pairing each history row with
its predecessor and formatting a change message.

Spark design (SURVEY.md §2.6 W1): the predecessor pairing is ``lag()`` over
``Window.partitionBy(curation).orderBy(version)``; per-version dataset
adds/deletes come from grouping the junction history by (version,
history_type) with ``collect_list`` — the whole change log for EVERY
curation is one job, versus the reference's per-curation N+1 loops."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from tantalus_spark.catalog.loader import Database

HISTORY_COLS = ["history_id", "history_date", "history_type", "history_user_id"]


def append_history(history_df: DataFrame, snapshot: DataFrame,
                   history_type: str, user_id: int | None,
                   next_history_id: int, ts=None) -> DataFrame:
    """History writer (SURVEY.md §2.11 M8): append one snapshot row per
    mutated row, stamped with type/date/user."""
    w = W.orderBy(F.lit(1))
    stamped = (
        snapshot
        .withColumn("history_id",
                    (F.row_number().over(w) + F.lit(next_history_id - 1))
                    .cast("long"))
        .withColumn("history_date",
                    F.lit(ts).cast("timestamp") if ts is not None
                    else F.current_timestamp())
        .withColumn("history_type", F.lit(history_type))
        .withColumn("history_user_id", F.lit(user_id).cast("long"))
    )
    return history_df.unionByName(stamped)


def table_as_of(history_df: DataFrame, ts, key_col: str = "id") -> DataFrame:
    """Reconstruct the table's state at time *ts* from its append-only
    history: the latest snapshot per key at-or-before ts, excluding keys
    whose latest operation was a delete ('-').

    This is point-in-time time travel over simple-history-style tables —
    one window pass, no self-joins; same shape Delta Lake time travel
    resolves to internally.
    """
    w = (
        W.partitionBy(key_col)
        .orderBy(F.col("history_date").desc(), F.col("history_id").desc())
    )
    return (
        history_df.filter(F.col("history_date") <= F.lit(ts).cast("timestamp"))
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("history_type") != "-"))
        .drop("__rn", *HISTORY_COLS)
    )


def curation_changes(db: Database) -> DataFrame:
    """The change log for all curations at once (services.py:4-78 parity).

    Returns (curation_id, version, action, message) where action is
    'Created' for the first version and 'Edited' afterwards, and message
    reproduces the reference's formatting:

    - first version: ``Field 'sequencedatasets' is created with <ids>;
      Field 'description' is created with <val>.``-style message
    - later versions: ``Field 'description' changed from 'a' to 'b'`` and
      ``SequenceDataset(s) 1, 2 added 3 deleted`` joined by '; ', or
      ``No field was modified.``
    """
    ch = db.table("curation_history")
    cdh = db.table("curation_dataset_history")

    cur = ch.select(
        F.col("id").alias("curation_id"), "version", "description", "owner_id",
    ).withColumn("prev_version", F.lag("version").over(
        W.partitionBy(F.col("curation_id")).orderBy("version"))
    ).withColumn("prev_description", F.lag("description").over(
        W.partitionBy(F.col("curation_id")).orderBy("version"))
    ).withColumn("prev_owner", F.lag("owner_id").over(
        W.partitionBy(F.col("curation_id")).orderBy("version"))
    )

    adds = (
        cdh.filter(F.col("history_type") == "+")
        .groupBy(F.col("curation_id"), F.col("version"))
        .agg(F.sort_array(F.collect_list(
            F.col("sequencedataset_id").cast("string"))).alias("added"))
    )
    drops = (
        cdh.filter(F.col("history_type") == "-")
        .groupBy(F.col("curation_id"), F.col("version"))
        .agg(F.sort_array(F.collect_list(
            F.col("sequencedataset_id").cast("string"))).alias("deleted"))
    )

    # deletions are recorded against the PREVIOUS version (services.py:30-35)
    joined = (
        cur
        .join(adds, ["curation_id", "version"], "left")
        .join(
            drops.select(
                F.col("curation_id"),
                F.col("version").alias("prev_version"),
                F.col("deleted"),
            ),
            ["curation_id", "prev_version"],
            "left",
        )
    )

    added_msg = F.when(
        F.size(F.coalesce(F.col("added"), F.array())) > 0,
        F.concat(F.array_join("added", ", "), F.lit(" added")),
    ).otherwise(F.lit(""))
    deleted_msg = F.when(
        F.size(F.coalesce(F.col("deleted"), F.array())) > 0,
        F.concat(F.array_join("deleted", ", "), F.lit(" deleted")),
    ).otherwise(F.lit(""))
    ds_change = F.when(
        (F.size(F.coalesce(F.col("added"), F.array())) > 0)
        | (F.size(F.coalesce(F.col("deleted"), F.array())) > 0),
        F.concat(F.lit("SequenceDataset(s) "), added_msg, F.lit(" "), deleted_msg),
    )

    desc_change = F.when(
        ~(F.col("prev_description").eqNullSafe(F.col("description"))),
        F.format_string("Field 'description' changed from '%s' to '%s'",
                        F.col("prev_description"), F.col("description")),
    )
    owner_change = F.when(
        ~(F.col("prev_owner").eqNullSafe(F.col("owner_id"))),
        F.format_string("Field 'owner' changed from '%s' to '%s'",
                        F.col("prev_owner").cast("string"),
                        F.col("owner_id").cast("string")),
    )

    edit_parts = F.array_compact(F.array(ds_change, owner_change, desc_change))
    edit_msg = F.when(F.size(edit_parts) > 0, F.array_join(edit_parts, "; ")) \
        .otherwise(F.lit("No field was modified."))

    created_msg = F.concat(
        F.lit("Field 'Sequence Dataset' is created with "),
        F.coalesce(F.array_join("added", ", "), F.lit("None")),
        F.lit("; Field 'owner' is created with "),
        F.coalesce(F.col("owner_id").cast("string"), F.lit("None")),
        F.lit("; Field 'description' is created with "),
        F.coalesce(F.col("description"), F.lit("None")),
        F.lit("."),
    )

    is_first = F.col("prev_version").isNull()
    return joined.select(
        "curation_id",
        "version",
        F.when(is_first, F.lit("Created")).otherwise(F.lit("Edited")).alias("action"),
        F.when(is_first, created_msg).otherwise(edit_msg).alias("message"),
    )
