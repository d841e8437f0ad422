"""Event-time windowed aggregation with late-data watermarking (the
Structured Streaming analog of A6's hourly throughput, SURVEY.md §2.4/§2.9).

``withWatermark`` bounds how long window state waits for stragglers: an
event older than (max event time seen − delay) arrives after its window
finalized and is dropped. In append mode a window only emits once the
watermark passes its end — exactly-once per window per key, which is what a
downstream metrics sink wants. State size is O(open windows × keys), flat
in stream length — the property that matters on an unbounded 100 TB/day
feed.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

STREAM_EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def windowed_throughput(events: DataFrame, delay: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type, tolerating
    ``delay`` of lateness before a window's state is finalized."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(events: DataFrame, gap: str = "30 minutes",
                    delay: str = "1 hour") -> DataFrame:
    """Streaming sessionization: ``F.session_window`` merges events into
    per-key sessions that close after ``gap`` of inactivity — the
    streaming twin of the batch w8_sessionize operator, with the same
    30-minute gap. A session row emits (append mode) once the watermark
    passes session end + gap; state per open session only."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.session_window("ts", gap).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("win.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "event_type",
            "n_events",
            "session_value",
        )
    )


def run_session_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
) -> None:
    """Drain the event stream into finalized session rows."""
    os.makedirs(out_dir, exist_ok=True)
    stream = spark.readStream.schema(STREAM_EVENT_SCHEMA).json(events_dir)
    query = (
        session_windows(stream, gap)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def run_windowed_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    delay: str = "1 hour",
) -> None:
    """Drain the event stream, appending FINALIZED windows to ``out_dir``.

    Append output mode means a window row is written only when the
    watermark has passed its end — late events beyond ``delay`` never
    mutate an emitted row (they are dropped by the state store)."""
    os.makedirs(out_dir, exist_ok=True)
    stream = spark.readStream.schema(STREAM_EVENT_SCHEMA).json(events_dir)

    query = (
        windowed_throughput(stream, delay)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
