"""Job-queue processing as Structured Streaming (T3-T5, SURVEY.md §2.9).

The reference runs a Redis-priority-queue worker fleet: BRPOP across
``case_processing_queue:priority:{1,2,3}`` in priority order
(etl/worker.py:63-68,112-136), retries with retry_count+1 up to 3 then
routes to a failed_jobs DLQ (worker.py:208-250), and rate-limits to
max_jobs_per_hour (worker.py:283-305).

Spark-first, the queue is a file (or Kafka) stream of JSON job rows and the
worker fleet is ONE streaming query:

- priority ordering  → ORDER BY priority inside each foreachBatch
  micro-batch (W4) — strict global priority within a batch, which is the
  same guarantee the reference gives (its BRPOP scan order is per-poll).
- retry + DLQ        → failed rows are re-appended to the queue dir with
  retry_count+1; rows exceeding MAX_RETRIES go to the DLQ sink (T4).
- rate limiting      → ``maxFilesPerTrigger`` bounds intake per micro-batch
  (T5; the streaming analog of max_jobs_per_hour).

Everything inside the batch is DataFrame-native; at scale the same topology
runs on Kafka with ``maxOffsetsPerTrigger`` and a Delta DLQ.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

JOB_SCHEMA = StructType(
    [
        StructField("job_id", LongType()),
        StructField("entity_id", LongType()),
        StructField("change_type", StringType()),
        StructField("priority", IntegerType()),
        StructField("retry_count", IntegerType()),
    ]
)

MAX_RETRIES = 3


def jobs_from_reconciliation(detail: DataFrame) -> DataFrame:
    """Reconciliation detail → prioritized job rows (the enqueue step,
    etl/flows/sync_daily.py:246-317): new=1 (highest), update=2, rest=3."""
    return (
        detail.filter(F.col("change_type").isin("new", "update"))
        .select(
            F.col("entity_id").alias("job_id"),
            "entity_id",
            "change_type",
            F.when(F.col("change_type") == "new", 1)
            .when(F.col("change_type") == "update", 2)
            .otherwise(3)
            .cast("int")
            .alias("priority"),
            F.lit(0).cast("int").alias("retry_count"),
        )
    )


def process_job_batch(batch: DataFrame, fail_predicate=None) -> DataFrame:
    """Pure per-batch transform: order by priority, attempt each job,
    tag the outcome. ``fail_predicate`` is a Column predicate marking jobs
    that fail this attempt (tests inject deterministic failures)."""
    if fail_predicate is None:
        fail_predicate = F.lit(False)
    ordered = batch.orderBy("priority", "job_id")
    return ordered.withColumn(
        "outcome",
        F.when(~fail_predicate, F.lit("done"))
        .when(F.col("retry_count") + 1 >= MAX_RETRIES, F.lit("dead"))
        .otherwise(F.lit("retry")),
    )


def kafka_queue_options(
    bootstrap_servers: str,
    topic: str,
    *,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
    group_id_prefix: str | None = None,
) -> dict[str, str]:
    """Option map for the Kafka job-queue source — the transport a
    production deployment swaps in for the file queue (the reference's
    Redis BRPOP loop, etl/worker.py:112-136; Kafka is the durable
    at-least-once equivalent). Separated from the reader call so the
    contract is unit-testable without a broker or the
    spark-sql-kafka connector on the classpath.
    ``max_offsets_per_trigger`` is the Kafka analog of the file source's
    ``maxFilesPerTrigger`` rate limit (T5)."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if group_id_prefix is not None:
        opts["groupIdPrefix"] = group_id_prefix
    return opts


def parse_job_records(records: DataFrame) -> DataFrame:
    """Kafka frames arrive as (key binary, value binary, topic, …): decode
    the JSON value into typed job rows against JOB_SCHEMA. Works on any
    frame with a ``value`` column (streaming or batch), so the parse
    contract is testable without a broker."""
    return records.select(
        F.from_json(F.col("value").cast("string"), JOB_SCHEMA).alias("job")
    ).select("job.*")


def queue_source(
    spark: SparkSession,
    mode: str = "files",
    *,
    queue_dir: str | None = None,
    max_files_per_trigger: int = 10,
    **kafka_opts,
) -> DataFrame:
    """S10 queue source seam: one call site, two transports.

    ``files`` (default, sandbox-runnable) reads the JSON job directory;
    ``kafka`` builds the Kafka reader from ``kafka_queue_options(**
    kafka_opts)`` and decodes values via ``parse_job_records`` — the
    swap a production deployment makes first (requires the
    spark-sql-kafka-0-10 package on the classpath)."""
    if mode == "files":
        if queue_dir is None:
            raise ValueError("files mode requires queue_dir=")
        return (
            spark.readStream.schema(JOB_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .json(queue_dir)
        )
    if mode == "kafka":
        raw = (
            spark.readStream.format("kafka")
            .options(**kafka_queue_options(**kafka_opts))
            .load()
        )
        return parse_job_records(raw)
    raise ValueError(f"unknown queue transport {mode!r}")


def kafka_sink_options(
    bootstrap_servers: str,
    topic: str,
    *,
    checkpoint_dir: str | None = None,
) -> dict[str, str]:
    """Option map for the Kafka job-queue SINK (the enqueue side of
    S9 — the reference's LPUSH, etl/flows/sync_daily.py:246-317).
    Unit-testable without a broker, like ``kafka_queue_options``."""
    opts = {"kafka.bootstrap.servers": bootstrap_servers, "topic": topic}
    if checkpoint_dir is not None:
        opts["checkpointLocation"] = checkpoint_dir
    return opts


def jobs_to_kafka_records(jobs: DataFrame) -> DataFrame:
    """Encode typed job rows as Kafka (key, value) pairs: key =
    entity id (stable partitioning → per-entity ordering in the topic,
    the property the reference's per-case queue discipline relies on),
    value = the JSON payload ``parse_job_records`` decodes. Round-trips
    with the source side by construction."""
    return jobs.select(
        F.col("entity_id").cast("string").cast("binary").alias("key"),
        # fields derived from JOB_SCHEMA so the Kafka encoding can never
        # drift from what parse_job_records decodes, and null fields kept
        # explicit so both transports emit identical bytes for the same
        # row (same guarantees the file-queue path gets via flows.JOB_COLS
        # and flows._job_json's ignoreNullFields=false)
        F.to_json(
            F.struct(*JOB_SCHEMA.fieldNames()), {"ignoreNullFields": "false"}
        )
        .cast("binary")
        .alias("value"),
    )


def enqueue_jobs_kafka(
    jobs: DataFrame,
    bootstrap_servers: str,
    topic: str,
    *,
    checkpoint_dir: str | None = None,
):
    """S9 Kafka enqueue, composed end-to-end: typed job rows →
    (key, value) records → a fully-configured Kafka writer. Returns the
    UNSTARTED writer (``DataStreamWriter`` for streaming inputs,
    ``DataFrameWriter`` for batch) so deployments call ``.start()`` /
    ``.save()`` themselves — and so the whole seam short of the broker
    handshake is unit-testable without the spark-sql-kafka connector."""
    records = jobs_to_kafka_records(jobs)
    opts = kafka_sink_options(
        bootstrap_servers, topic, checkpoint_dir=checkpoint_dir
    )
    if jobs.isStreaming:
        return records.writeStream.format("kafka").options(**opts)
    return records.write.format("kafka").options(**opts)


def make_batch_handler(
    queue_dir: str, out_dir: str, dlq_dir: str, fail_predicate=None
):
    """The foreachBatch body of the jobs stream, exposed so the
    crash-recovery test can wrap it (crash AFTER effects, BEFORE the
    checkpoint commit — the adversarial replay point). Every effect is
    REPLAY-EXACT: done/dead rows land in their own ``batch_id=N``
    partition via dynamic overwrite, retries write ONE deterministically
    named file per batch — a replayed batch overwrites its own outputs
    byte-for-byte instead of appending duplicates."""

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        processed = process_job_batch(batch, fail_predicate).cache()
        try:
            for outcome, sink in (("done", out_dir), ("dead", dlq_dir)):
                (processed.filter(F.col("outcome") == outcome)
                    .drop("outcome")
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(sink))
            retries = (
                processed.filter(F.col("outcome") == "retry")
                .drop("outcome")
                .withColumn("retry_count", F.col("retry_count") + 1)
            )
            rows = retries.collect()  # retry sets are small (failed jobs)
            if rows:
                path = os.path.join(queue_dir, f"retry-{batch_id:06d}.json")
                with open(path, "w") as fh:
                    for r in rows:
                        fh.write(json.dumps(r.asDict()) + "\n")
        finally:
            processed.unpersist()

    return handle_batch


def run_jobs_stream(
    spark: SparkSession,
    queue_dir: str,
    out_dir: str,
    dlq_dir: str,
    checkpoint_dir: str,
    fail_predicate=None,
    max_files_per_trigger: int = 10,
):
    """Consume the job queue until drained (availableNow trigger).

    Each micro-batch: process in priority order; done → out_dir parquet;
    retry → re-enqueue into queue_dir (picked up by a later batch when
    run again); dead → dlq_dir. Returns the finished StreamingQuery.

    All three sinks are REPLAY-EXACT (foreachBatch is at-least-once):
    done/dead rows land in their own ``batch_id=N`` partition via dynamic
    overwrite, and retries write ONE deterministically named file per
    batch — a replayed batch overwrites its own outputs byte-for-byte
    instead of appending duplicates (which would double-complete jobs and
    double-consume retry budgets).
    """
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(dlq_dir, exist_ok=True)

    stream = queue_source(
        spark,
        "files",
        queue_dir=queue_dir,
        max_files_per_trigger=max_files_per_trigger,
    )

    query = (
        stream.writeStream.foreachBatch(
            make_batch_handler(queue_dir, out_dir, dlq_dir, fail_predicate)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query


def drain_queue(
    spark: SparkSession,
    queue_dir: str,
    out_dir: str,
    dlq_dir: str,
    checkpoint_dir: str,
    fail_predicate=None,
    max_rounds: int = MAX_RETRIES + 1,
) -> None:
    """Run availableNow passes until the queue stops producing retries —
    the batch-mode equivalent of the worker's long-running poll loop.

    The checkpoint is SHARED across rounds: the file-stream source tracks
    consumed files in it, so each later round picks up only the retry files
    appended during the previous round (no reprocessing, no duplicates)."""
    for _ in range(max_rounds):
        run_jobs_stream(
            spark,
            queue_dir,
            out_dir,
            dlq_dir,
            checkpoint_dir,
            fail_predicate=fail_predicate,
        )
