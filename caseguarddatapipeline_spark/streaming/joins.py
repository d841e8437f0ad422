"""Stream-stream interval join: match each job-completion event to the
job-enqueue event it answers, within a bounded event-time window.

Reference parity: the worker loop correlates a finished task back to the
queue row it consumed (etl/worker.py:112-136 claims a job, processes it,
then updates that job's row); done as two unbounded streams this is the
canonical stream-stream join. The interval bound is what makes it
FEASIBLE on an unbounded feed: with watermarks on BOTH sides plus a
time-range predicate, Spark's symmetric hash join can discard buffered
rows older than (watermark − interval) — state stays O(rows in the
interval), flat in stream length. Without the range predicate the state
store would have to keep every row forever.

The left-outer variant is timeout detection: a job row whose completion
never arrived inside the interval emits with NULL completion columns once
the watermark proves no match can still come — the streaming form of the
T4 dead-letter routing decision (jobs.py routes on retry_count; this
routes on elapsed event time).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

JOB_SCHEMA = StructType(
    [
        StructField("job_id", LongType()),
        StructField("enqueue_ts", TimestampType()),
        StructField("priority", IntegerType()),
    ]
)

DONE_SCHEMA = StructType(
    [
        StructField("job_id", LongType()),
        StructField("done_ts", TimestampType()),
        StructField("status", StringType()),
    ]
)


def match_completions(
    jobs: DataFrame,
    dones: DataFrame,
    within: str = "30 minutes",
    delay: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join completions to their enqueue event: same job_id, completion
    inside [enqueue_ts, enqueue_ts + within]. ``how='leftOuter'`` also
    emits never-completed jobs (NULL status / latency) once the watermark
    passes enqueue_ts + within + delay — the timeout path.

    Both inputs MUST be watermarked (done here) for state eviction and,
    in the outer case, for deciding when "no match" is final."""
    j = jobs.withWatermark("enqueue_ts", delay).alias("j")
    d = dones.withWatermark("done_ts", delay).alias("d")
    cond = F.expr(
        "j.job_id = d.job_id AND "
        f"d.done_ts BETWEEN j.enqueue_ts AND j.enqueue_ts + INTERVAL {within}"
    )
    latency = (
        F.col("d.done_ts").cast("double") - F.col("j.enqueue_ts").cast("double")
    )
    return (
        j.join(d, cond, how)
        .select(
            F.col("j.job_id").alias("job_id"),
            F.date_format("j.enqueue_ts", "yyyy-MM-dd HH:mm:ss").alias("enqueued"),
            "j.priority",
            F.date_format("d.done_ts", "yyyy-MM-dd HH:mm:ss").alias("done"),
            F.col("d.status").alias("status"),
            F.round(latency, 1).alias("latency_sec"),
        )
    )


def run_match_stream(
    spark: SparkSession,
    jobs_dir: str,
    dones_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    within: str = "30 minutes",
    delay: str = "1 hour",
    how: str = "inner",
):
    """Drain both file streams through the interval join into parquet.

    Append mode: an inner match emits as soon as both rows have arrived;
    an outer (timeout) row emits only when the watermark proves the
    completion can no longer arrive. Returns the finished query — its
    ``lastProgress["stateOperators"]`` carries the buffered-row counts
    that prove state stays bounded by the interval, not stream length."""
    os.makedirs(out_dir, exist_ok=True)
    jobs = spark.readStream.schema(JOB_SCHEMA).json(jobs_dir)
    dones = spark.readStream.schema(DONE_SCHEMA).json(dones_dir)
    query = (
        match_completions(jobs, dones, within, delay, how)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
