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


def stream_clean_corpus_to_snapshot(
    docs_stream: DataFrame,
    snapshot_path: str,
    checkpoint_path: str,
    ts_col: str = "ts",
    watermark: str = "2 hours",
    id_col: str = "doc_id",
    **gates,
):
    """The full streaming ingest story, end to end: a continuously-fed
    raw corpus runs the SAME cleaning composition as the batch pipeline
    (quality + language gates, watermarked exact dedup —
    ``clean_corpus_stream``) and each micro-batch MERGEs into the
    hive-partitioned parquet snapshot via ``merge_into_snapshot``,
    partitioned by predicted language.

    Exactly-once without a ledger: the merge is an idempotent upsert
    keyed on the doc id, so a replayed micro-batch (crash between sink
    commit and checkpoint advance) rewrites the same rows instead of
    duplicating them — the property that makes foreachBatch + bare
    parquet safe. Per batch the rewrite cost is O(touched language
    partitions), never O(snapshot).

    Returns the StreamingQuery (callers use ``trigger(availableNow=
    True)`` semantics: this starts one, processes the backlog, and
    terminates).
    """
    from tantalus_spark.datapipe.pipeline import clean_corpus_stream
    from tantalus_spark.sources.sink import merge_into_snapshot

    cleaned = clean_corpus_stream(
        docs_stream, ts_col=ts_col, watermark=watermark,
        id_col=id_col, **gates)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        jvm_path = spark._jvm.org.apache.hadoop.fs.Path(snapshot_path)
        fs = jvm_path.getFileSystem(
            spark._jsc.hadoopConfiguration())
        if not fs.exists(jvm_path):
            # bootstrap: first batch creates the snapshot layout
            (batch_df.write.mode("overwrite")
             .partitionBy("lang_pred").parquet(snapshot_path))
            return
        merge_into_snapshot(
            spark, snapshot_path, upserts=batch_df,
            key_cols=[id_col], partition_col="lang_pred")

    return (
        cleaned.writeStream
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
