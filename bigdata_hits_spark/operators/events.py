"""Event-time batch operators over the ``events`` table.

These are the batch twins of the Structured Streaming jobs in
``streaming/jobs.py`` — same grouping logic, so stream-vs-batch
equivalence is testable and the DuckDB oracles apply to both.

Timestamps: the driver writes nanosecond parquet timestamps; the engine
reads them as raw int64 nanos (``ts_ns``, see sources/readers.py), and all
bucket arithmetic is integer division on nanos — no float time math, no
timezone surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

HOUR_NS = 3_600_000_000_000
SESSION_GAP_NS = 1_800_000_000_000  # 30 min


def hourly_event_counts(events: DataFrame) -> DataFrame:
    """(bucket_hour, event_type, n, total_value): tumbling 1h windows keyed
    by epoch-hour index."""
    return (
        events.groupBy(
            F.expr(f"ts_ns div {HOUR_NS}").alias("bucket_hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
    )


def sessionize(events: DataFrame, gap_ns: int = SESSION_GAP_NS) -> DataFrame:
    """Gap-based sessionization per user: a new session starts when the
    inter-event gap exceeds ``gap_ns``.  (user_id, session_idx, n_events,
    start_s, end_s) with second-resolution bounds.

    Window-function formulation (lag -> flag -> running sum) — one shuffle
    on user_id; the running sum stays within each user partition.
    """
    order = [F.asc("ts_ns"), F.asc("event_id")]
    w_lag = Window.partitionBy("user_id").orderBy(*order)
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = events.select(
        "user_id",
        "event_id",
        "ts_ns",
        F.when(
            F.lag("ts_ns").over(w_lag).isNull()
            | ((F.col("ts_ns") - F.lag("ts_ns").over(w_lag)) > gap_ns),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("new_s"),
    )
    sessions = flagged.select(
        "user_id", "ts_ns", F.sum("new_s").over(w_run).alias("session_idx")
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.expr("min(ts_ns) div 1000000000").alias("start_s"),
        F.expr("max(ts_ns) div 1000000000").alias("end_s"),
    )
