"""Structured Streaming twins of the event-time batch operators.

The reference has no streaming surface (SURVEY §2.3); these are part of
the engine's beyond-reference pipeline story: the same event-time logic as
``operators/events.py`` expressed as incremental queries with watermarks,
so a 100 TB/day event feed computes the identical aggregates a backfill
batch job would.

Local testing drives them with ``trigger(availableNow=True)`` over a
parquet directory and a memory sink (tests/test_streaming.py), asserting
stream-batch equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from bigdata_hits_spark.operators.events import HOUR_NS

#: On-disk schema of the events parquet under nanosAsLong (ts is int64 ns).
EVENTS_RAW_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_events_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over an events parquet directory, normalized to
    the engine's (ts_ns, ts) convention."""
    reader = spark.readStream.schema(EVENTS_RAW_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.parquet(path)
    return raw.withColumnRenamed("ts", "ts_ns").withColumn(
        "ts", F.timestamp_micros((F.col("ts_ns") / 1000).cast("long"))
    )


def hourly_event_counts_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming tumbling-window counts.  Watermark bounds state for late
    data; the window start is re-expressed as the same epoch-hour bucket
    the batch operator emits, so outputs are directly comparable."""
    windowed = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
    )
    return windowed.select(
        (F.unix_timestamp("window.start") * 1_000_000_000 / HOUR_NS)
        .cast("long")
        .alias("bucket_hour"),
        "event_type",
        "n",
        "total_value",
    )


def run_to_memory(stream_df: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drain a finite stream into an in-memory table (availableNow) and
    block until done.  Returns the StreamingQuery (already terminated)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
