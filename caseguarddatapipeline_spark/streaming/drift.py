"""Streaming distribution-drift monitor — the live face of
``a32_psi_drift`` (operators/profiling.py): micro-batches of events
accumulate per-type value histograms, and after every batch the
cumulative profile is scored (smoothed PSI) against a FROZEN baseline
profile, emitting one report row per event type per batch. This is the
model-monitoring loop a feature store runs continuously, instead of the
batch operator's one-shot half-vs-half comparison (and the
distribution-level upgrade of the reference dashboard's static alert
thresholds, monitoring/dashboard.py).

State protocol — replay-exact AND O(1) per batch: partition
``counts_dir/ingest_batch=N`` holds the CUMULATIVE histogram through
batch N (batch N's own counts merged with the latest partition < N), so
each batch reads exactly one prior partition regardless of stream age —
per-batch delta partitions would make batch N re-read all N predecessors,
O(B²) file opens over the stream's life. Dynamic partition overwrite
makes a replayed batch rewrite its own partition from the SAME
predecessor it read originally (partitions > N cannot exist while N is
being retried under availableNow's sequential batches), so no count is
ever double-added. ``maintain_drift_counts`` retires partitions past a
horizon — at least 2 are always kept, because a replay of the next batch
needs its predecessor.

Each report row carries the ≥ 0.25 alert flag ("significant shift"
band). A type present only in the BASELINE scores high PSI by
construction (its current profile smooths to uniform) — that is absence
of data, not drift, so ``drifted`` additionally requires n_curr > 0; the
row still surfaces with n_curr = 0 for no-data visibility. A batch with
no admissible rows and no prior state writes nothing (scoring nothing
against the baseline has no meaning yet) and cannot wedge the stream.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..operators.profiling import psi_bin, psi_report
from .neardup import _check_index_ownership

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
    baseline profile. ``drifted`` fires only for types with current
    data — a baseline-only type smooths to the uniform profile and would
    otherwise false-alarm on every batch until it first arrives."""
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
        ((F.col("psi") >= PSI_ALERT) & (F.col("n_curr") > 0)).alias("drifted"),
    )


def _latest_counts(
    sess: SparkSession, counts_dir: str, before_batch: int
) -> DataFrame | None:
    """The cumulative histogram of the newest batch BEFORE the current
    one, or None when nothing is accumulated yet. Reads the partition
    directory directly (one partition, however old the stream is)."""
    prior = [
        b
        for d in os.listdir(counts_dir)
        if d.startswith("ingest_batch=") and (b := int(d.split("=", 1)[1])) < before_batch
    ]
    if not prior:
        return None
    return sess.read.parquet(
        os.path.join(counts_dir, f"ingest_batch={max(prior)}")
    ).select("event_type", "bin", "n")


def maintain_drift_counts(counts_dir: str, keep_batches: int = 8) -> int:
    """Retire cumulative-histogram partitions past the horizon (newest
    ``keep_batches`` kept, floor 2 — a replayed batch reads its
    predecessor). Returns the number dropped. Each partition is a full
    cumulative profile, so dropping old ones loses no information."""
    import shutil

    keep = max(2, keep_batches)
    batches = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(counts_dir)
        if d.startswith("ingest_batch=")
    )
    dropped = 0
    for b in batches[: max(0, len(batches) - keep)]:
        shutil.rmtree(os.path.join(counts_dir, f"ingest_batch={b}"))
        dropped += 1
    return dropped


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
        # checkpoint/state-dir mismatch gate (shared with the near-dup
        # index sinks): batch ids restart at 0 under a FRESH checkpoint, so
        # pointing one at a counts_dir that already holds HIGHER-numbered
        # partitions would silently restart accumulation from empty while
        # maintain_drift_counts keeps preferring the stale partitions.
        _check_index_ownership(counts_dir, batch_id, label="drift counts_dir")
        admissible = batch.filter(
            F.col("event_type").isNotNull() & F.col("value").isNotNull()
        )
        prev = _latest_counts(sess, counts_dir, batch_id)
        if prev is None and admissible.isEmpty():
            return  # nothing accumulated and nothing admissible: no state yet
        batch_counts = (
            admissible.select("event_type", psi_bin(F.col("value")).alias("bin"))
            .groupBy("event_type", "bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        cumulative = (
            batch_counts
            if prev is None
            else batch_counts.unionByName(prev)
            .groupBy("event_type", "bin")
            .agg(F.sum("n").alias("n"))
        )
        # the batch owns its cumulative partition: replay-exact, and the
        # next batch reads only this one
        (
            cumulative.withColumn("ingest_batch", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("ingest_batch")
            .parquet(counts_dir)
        )
        baseline = sess.read.parquet(baseline_dir)
        current = _latest_counts(sess, counts_dir, batch_id + 1)
        (
            score_against_baseline(sess, baseline, current)
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
