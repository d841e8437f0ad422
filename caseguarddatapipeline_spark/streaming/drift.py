"""Streaming distribution-drift monitor — the live face of
``a32_psi_drift`` (operators/profiling.py): micro-batches of events
accumulate per-type value histograms, and after every batch the
cumulative profile is scored (smoothed PSI) against a FROZEN baseline
profile, emitting one alert row per event type per batch. This is the
model-monitoring loop a feature store runs continuously, instead of the
batch operator's one-shot half-vs-half comparison (and the
distribution-level upgrade of the reference dashboard's static alert
thresholds, monitoring/dashboard.py).

Replay-exactness follows the span/near-dup index protocol
(streaming/neardup.py): each batch writes its OWN histogram partition
``counts_dir/ingest_batch=N`` via dynamic partition overwrite (a
replayed batch rewrites its partition byte-for-byte; no count is ever
double-added), and the PSI for batch N scores the union of partitions
``ingest_batch <= N`` — so the cumulative profile is a pure function of
the input batches, not of how many times any of them was attempted. Per-
batch histogram rows number |event_type| × PSI_BINS (tiny); the heavy
per-event work (binning + counting) is one combinable hash aggregate
inside the batch.

The baseline is any DataFrame of (event_type, bin, n) — typically the
profile of the training window, written once by ``write_baseline`` —
against which drift is scored; PSI ≥ 0.25 is flagged (the standard
"significant shift" band).
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.profiling import psi_bin, psi_report

EVENT_STREAM_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, value double"
)
PSI_ALERT = 0.25


def write_baseline(events: DataFrame, baseline_dir: str) -> None:
    """Freeze a (event_type, bin, n) profile of a reference window —
    the denominator every subsequent stream batch is scored against."""
    (
        events.select("event_type", psi_bin(F.col("value")).alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(baseline_dir)
    )


def score_against_baseline(
    spark: SparkSession, baseline: DataFrame, current: DataFrame
) -> DataFrame:
    """Smoothed PSI of a current (event_type, bin, n) profile against a
    baseline profile, with the alert flag applied."""
    counts = baseline.select(
        "event_type", F.lit("base").alias("phase"), "bin", "n"
    ).unionByName(
        current.select("event_type", F.lit("curr").alias("phase"), "bin", "n")
    )
    report = psi_report(spark, counts)
    return report.select(
        "event_type",
        "n_base",
        "n_curr",
        "psi",
        (F.col("psi") >= PSI_ALERT).alias("drifted"),
    )


def run_drift_stream(
    spark: SparkSession,
    input_dir: str,
    baseline_dir: str,
    counts_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
):
    """Drain the event stream (availableNow), accumulating per-type value
    histograms and emitting one PSI-vs-baseline report per batch to
    ``out_dir/batch_id=N``; returns the finished query."""
    os.makedirs(counts_dir, exist_ok=True)
    os.makedirs(out_dir, exist_ok=True)

    stream = (
        spark.readStream.schema(EVENT_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(input_dir)
    )

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        sess = batch.sparkSession
        admissible = batch.filter(
            F.col("event_type").isNotNull() & F.col("value").isNotNull()
        )
        # the batch owns its histogram partition: replay-exact accumulation
        (
            admissible.select("event_type", psi_bin(F.col("value")).alias("bin"))
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(counts_dir)
        )
        cumulative = (
            sess.read.parquet(counts_dir)
            .filter(F.col("ingest_batch") <= batch_id)
            .groupBy("event_type", "bin")
            .agg(F.sum("n").alias("n"))
        )
        baseline = sess.read.parquet(baseline_dir)
        (
            score_against_baseline(sess, baseline, cumulative)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
