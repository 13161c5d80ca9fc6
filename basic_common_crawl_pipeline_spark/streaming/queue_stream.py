"""Structured-Streaming analog of the reference's queue boundary
(operators S4/S5 of SURVEY.md §2.1, G1 of §2.6).

The reference moves batches through RabbitMQ with prefetch-1 backpressure
and ack-after-process at-least-once semantics (rust/src/rabbitmq.rs:74-121,
python/worker.py:29-43). Spark-first restatement:

- the *queue* is a directory of files; ``publish_batches`` is the
  producer (S4), ``consume_batches`` a ``readStream`` consumer (S5);
- backpressure = ``maxFilesPerTrigger``; at-least-once + ack =
  checkpointing (the offsets log replaces acks; replay after crash is
  exactly the queue's redelivery story, but deterministic);
- ``windowed_event_counts`` shows watermark + windowed aggregation on an
  event-time stream — late data beyond the watermark is dropped instead
  of blocking state forever.

The frontier loop itself stays a batch wave (the feedback edge rules out
one streaming query — SURVEY.md §2.6 G1); streaming covers the
unidirectional ingest/ETL edges of the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import round4


def publish_batches(df: DataFrame, queue_dir: str, batch_size: int = 1000) -> None:
    """S4: producer side — write the dataset as N-row parquet 'messages'.
    Batch size is a physical knob, matching the reference's disagreeing
    BATCH_SIZE constants (1000 Rust / 50 Py,Go — SURVEY.md §1.3)."""
    n = df.count()
    num_files = max(1, -(-n // batch_size))
    df.repartition(num_files).write.mode("overwrite").parquet(queue_dir)


def consume_batches(
    spark: SparkSession,
    queue_dir: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """S5: consumer side — file-source stream with prefetch-style
    backpressure (maxFilesPerTrigger ≈ basic_qos prefetch)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(queue_dir)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts with a watermark for late data."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        # round4, NOT F.round — cross-engine tie-breaking rule (CLAUDE.md)
        .agg(F.count("*").alias("n"), round4(F.sum("value")).alias("sum_value"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_stream_to_memory(
    spark: SparkSession,
    stream_df: DataFrame,
    table_name: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> DataFrame:
    """Drain a stream with trigger=availableNow into an in-memory sink and
    return the result table. Deterministic: processes all available input
    then stops (the batch-replay view of the stream)."""
    query = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(table_name)
