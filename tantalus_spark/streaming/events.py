"""Structured Streaming ingest of file-event logs (SURVEY.md §2.9 extension).

The reference has NO streaming operators — its closest analogs are the
``auto_now`` change-capture timestamps (models.py:335-338,466-469) and the
append-only history tables. This module is the beyond-parity streaming path:
the same event-log analytics the batch inventory runs (tumbling windows,
sessionization) expressed as Structured Streaming jobs with watermarks, so
a 100 TB/day event feed maintains the dashboards incrementally instead of
recomputing.

Batch/stream parity: ``windowed_counts`` here and the batch
``q49_tumbling_window`` produce the same rows for the same closed windows —
tested with a parquet-backed stream driven to completion via the memory
sink."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("user_id", T.LongType(), True),
    T.StructField("event_type", T.StringType(), True),
    T.StructField("value", T.DoubleType(), True),
    T.StructField("props", T.StringType(), True),
])


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 4,
                      fmt: str = "parquet") -> DataFrame:
    """File-source stream over a directory of event drops — the standard
    cloud landing-zone pattern (S3/ABFS path at scale). ``fmt`` is
    ``parquet`` or ``json`` (JSONL drops); both bind the explicit
    EVENT_SCHEMA so late schema drift fails loudly instead of inferring."""
    return (
        spark.readStream.format(fmt)
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def windowed_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts + value sums with late-data handling.

    The watermark bounds state: events later than *watermark* behind the max
    seen event time are dropped and their windows finalized — state size is
    O(active windows × event types), independent of stream length."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "sum_value")
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows via the native session_window operator —
    the streaming counterpart of the batch lag+cumsum sessionization
    (inventory q50)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.sum("value").alias("session_value"))
        .select(F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"),
                "user_id", "n_events", "session_value")
    )


def dedup_stream(events: DataFrame, keys: list[str] | None = None,
                 watermark: str = "2 hours") -> DataFrame:
    """Streaming exact deduplication: drop events already seen within the
    watermark horizon — the streaming counterpart of the batch
    ``datapipe.dedup.exact_duplicates`` (at-least-once sources deliver
    duplicates; this makes the downstream aggregates effectively-once).

    ``dropDuplicatesWithinWatermark`` bounds state to the watermark window:
    O(events per horizon) keys, evicted as the watermark advances —
    unbounded-history dedup in a stream would grow state forever.
    """
    keys = keys or ["event_id"]
    return (
        events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys)
    )


def _totals_update_fn(idle_ttl_minutes: int | None):
    """The per-group state-transition function for
    :func:`user_running_totals`, factored out so the eviction logic is
    unit-testable with a stub GroupState (a real processing-time timeout
    cannot fire deterministically in a test)."""
    import pandas as pd

    def update(key, pdfs, state):
        if state.hasTimedOut:
            # idle past the TTL: evict; the user restarts at zero later
            state.remove()
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        if idle_ttl_minutes is not None:
            state.setTimeoutDuration(idle_ttl_minutes * 60 * 1000)
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return update


def user_running_totals(events: DataFrame,
                        idle_ttl_minutes: int | None = None) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (n_events, total_value) maintained across micro-batches.

    This is the extension point for stateful logic the built-in windowed
    aggregations can't express (decaying counters, per-key ML state,
    alert debouncing). State is one small tuple per user, shuffle only on
    user_id — but "O(distinct users)" is unbounded on a 100 TB/day feed
    with user churn, so a CONTINUOUS deployment passes
    ``idle_ttl_minutes``: a user idle longer than the TTL has their state
    evicted (processing-time timeout) and restarts from zero on return.

    ``None`` keeps state forever — required for bounded replays: a
    registered processing-time timeout keeps ``availableNow`` +
    ``processAllAvailable`` harnesses from ever settling (verified), so
    TTL is strictly for long-running triggers.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _totals_update_fn(idle_ttl_minutes),
            outputStructType="user_id long, n_events long, total_value double",
            stateStructType="n long, total double",
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if idle_ttl_minutes is not None
                else GroupStateTimeout.NoTimeout),
        )
    )


def run_to_completion(stream_df: DataFrame, query_name: str,
                      output_mode: str = "append") -> DataFrame:
    """Drive a bounded file-backed stream to completion synchronously and
    return the materialized result (memory sink) — the local smoke-test
    harness; production uses a real sink + trigger."""
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory").queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    spark = stream_df.sparkSession
    return spark.table(query_name)
