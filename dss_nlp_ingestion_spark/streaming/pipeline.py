"""Streaming operators (SURVEY.md §2.12).

| reference mechanism                   | here                         |
|---------------------------------------|------------------------------|
| 1-hour task buckets (reddit.py:100)   | window(ts, '1 hour') agg     |
| re-scrape overlap + Redis dedup       | watermark + dropDuplicates-  |
| (redislease.py:60-79, 7-day SETEX)    | WithinWatermark (7-day)      |
| workers drain & exit (rediswq.py:76)  | trigger(availableNow=True)   |
| ES create-if-absent sink              | foreachBatch idempotent      |
| (datamodels.py:32)                    | anti-join append             |

Batch/stream parity: each streaming transform is the thin wrapper
over the same expression its batch twin uses, so the batch oracle
results certify the streaming plan too (the tests assert stream
output == batch output under availableNow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dss_nlp_ingestion_spark.sources.sinks import idempotent_append


def read_events_stream(
    spark: SparkSession, events_dir: str, schema=None
) -> DataFrame:
    """File-source stream over a directory of event parquet files —
    the stand-in for Kafka/queue ingestion; same downstream plan."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    return reader.format("parquet").load(events_dir)


def hourly_window_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """T7 tumbling 1-hour windows with late-data tolerance: watermark
    bounds state; output matches the batch date_trunc form."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


def watermark_dedup(
    stream: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
    ts_col: str = "ts",
    ttl: str = "7 days",
) -> DataFrame:
    """D1 streaming form: state-store dedup with TTL — the Redis
    SETEX 7-day key-space as ``dropDuplicatesWithinWatermark`` (state
    is evicted by the watermark instead of Redis TTL)."""
    return stream.withWatermark(ts_col, ttl).dropDuplicatesWithinWatermark(
        list(key_cols)
    )


def run_available_now(
    stream_df: DataFrame, query_name: str = "drain"
) -> list:
    """Graceful-drain execution (workers exit when the queue empties,
    rediswq.py:76-83): process everything available, then stop;
    results land in an in-memory table named ``query_name``."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append" if not stream_df.isStreaming else "append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q.recentProgress


def run_complete_available_now(stream_df: DataFrame, query_name: str) -> None:
    """As above for aggregation streams (complete output mode)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_to_idempotent_store(
    spark: SparkSession,
    stream_df: DataFrame,
    store_path: str,
    key: str = "unique_identifier",
    partition_by: tuple[str, ...] = ("source",),
):
    """K2 exactly-once-effect sink: every micro-batch is MERGEd
    insert-if-absent by key, so replays are no-ops (the ES
    ``_op_type='create'`` semantics)."""

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        idempotent_append(spark, batch_df, store_path, key, partition_by)

    return (
        stream_df.writeStream.foreachBatch(_merge)
        .trigger(availableNow=True)
        .start()
    )


def session_window_counts_stream(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """§2.12 session windows in Structured Streaming: the engine
    merges an event into the open session while it lands before
    last_ts + gap; the watermark closes sessions and evicts their
    state.  Same expression as the batch ``session_window_counts``
    query — stream==batch parity is the test."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(key_col))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col(key_col),
            F.unix_millis(F.col("session_window.start")).alias("session_start_ms"),
            F.unix_millis(F.col("session_window.end")).alias("session_end_ms"),
            "n_events",
        )
    )
