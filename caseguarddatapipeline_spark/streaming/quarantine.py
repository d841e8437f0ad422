"""Row-level expectation gate for streams: validate each micro-batch
against named row predicates, route clean rows onward and violators —
tagged with WHICH rules they broke — to a quarantine sink.

The streaming sibling of the batch contract report
(operators/profiling.a29_expectations): the batch op answers "is the
table healthy", this keeps a 24/7 ingest flowing while bad rows divert
for replay after a fix — the DLT-expectations / dead-letter pattern
(T4's retry routing handles TRANSIENT failures; quarantine handles
CONTRACT failures, which retrying cannot fix).

Rules are (name, Column-predicate) pairs evaluated as plain projections
— one pass, no UDFs; the violated-rule list is a filtered array of rule
names built from the same predicate expressions.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession

from .windows import STREAM_EVENT_SCHEMA

# default contract for the event stream shape
def default_event_rules() -> list[tuple[str, Column]]:
    return [
        ("event_id.not_null", F.col("event_id").isNotNull()),
        ("ts.not_null", F.col("ts").isNotNull()),
        ("value.non_negative", F.col("value") >= 0),
        (
            "event_type.in_domain",
            F.col("event_type").isin("view", "click", "purchase", "signup",
                                     "error"),
        ),
    ]


def apply_expectations(
    df: DataFrame, rules: Sequence[tuple[str, Column]]
) -> DataFrame:
    """Tag every row with the array of violated rule names (empty = clean).
    NULL predicate results count as violations (a null `value` fails
    `value >= 0` — the conservative contract reading)."""
    violated = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
                for name, pred in rules
            ]
        )
    )
    return df.withColumn("violated", violated)


def run_quarantine_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    quarantine_dir: str,
    checkpoint_dir: str,
    rules: Sequence[tuple[str, Column]] | None = None,
) -> None:
    """Drain the event stream through the expectation gate: clean rows
    append to ``out_dir``, violators (with their ``violated`` tags) to
    ``quarantine_dir`` — both sides of each micro-batch written from one
    evaluation (foreachBatch caches the tagged frame)."""
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(quarantine_dir, exist_ok=True)
    rules = list(rules) if rules is not None else default_event_rules()

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        tagged = apply_expectations(batch, rules).cache()
        try:
            tagged.filter(F.size("violated") == 0).drop("violated").write.mode(
                "append"
            ).parquet(out_dir)
            tagged.filter(F.size("violated") > 0).write.mode("append").parquet(
                quarantine_dir
            )
        finally:
            tagged.unpersist()

    stream = spark.readStream.schema(STREAM_EVENT_SCHEMA).json(events_dir)
    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
