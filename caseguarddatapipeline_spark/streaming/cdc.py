"""Streaming CDC materialization (the live twin of t15_cdc_apply).

The batch entry (operators/incremental.py t15) compacts a FULL changelog
with one window rank; a live pipeline instead receives the changelog as a
stream and must keep the materialized state current batch by batch — the
reference's per-row UPDATE/DELETE loops (etl/reconciliation.py:226-268)
as a continuously-maintained table.

Semantics are VERSION-ordered, not arrival-ordered: the merge keeps, per
entity, whichever row (current state vs incoming batch) carries the higher
version, and a winning delete removes the entity. Version-ordering is what
makes the whole pipeline safe under at-least-once delivery — replaying any
already-applied batch compares equal-or-lower versions everywhere and is a
no-op, so foreachBatch's replay window needs no separate dedup.

State commits by atomic directory swap (write to ``<state>.tmp``, rename
over the live dir) — the commit-by-rename pattern object stores and table
formats use; a crash mid-write leaves the previous state intact. At scale
the state table is bucketed on entity_id so the per-batch merge join
co-locates, and the swap becomes a metadata commit (Delta/Iceberg); the
transformation here is the engine-agnostic core.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CDC_SCHEMA = StructType(
    [
        StructField("entity_id", LongType()),
        StructField("op", StringType()),  # 'U' upsert | 'D' delete
        StructField("value_micro", LongType()),
        StructField("version", LongType()),
    ]
)

STATE_COLS = ["entity_id", "value_micro", "version"]


def merge_cdc_batch(state: DataFrame, batch: DataFrame) -> DataFrame:
    """Version-ordered merge: per entity keep the higher-version side;
    a winning 'D' removes the entity. Idempotent under replays and
    commutative over already-applied prefixes."""
    latest = (
        batch.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("entity_id").orderBy(
                    F.desc("version"), F.desc("op")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("entity_id", "op", "value_micro", "version")
    )
    s = state.select([F.col(c).alias(f"s_{c}") for c in STATE_COLS])
    joined = latest.join(
        s, latest.entity_id == s.s_entity_id, "full_outer"
    )
    batch_wins = F.col("s_version").isNull() | (
        F.col("version") > F.col("s_version")
    )
    return (
        joined.select(
            F.coalesce("entity_id", "s_entity_id").alias("entity_id"),
            F.when(F.col("version").isNull(), F.lit("keep"))
            .when(batch_wins & (F.col("op") == "D"), F.lit("delete"))
            .when(batch_wins, F.lit("upsert"))
            .otherwise(F.lit("keep"))
            .alias("action"),
            F.when(
                F.col("version").isNull() | ~batch_wins, F.col("s_value_micro")
            )
            .otherwise(F.col("value_micro"))
            .alias("value_micro"),
            F.greatest(
                F.coalesce("version", F.lit(-1)),
                F.coalesce("s_version", F.lit(-1)),
            ).alias("version"),
        )
        .filter(F.col("action") != "delete")
        .select(STATE_COLS)
    )


def _read_state(spark: SparkSession, state_dir: str) -> DataFrame:
    if os.path.isdir(state_dir) and any(
        f.endswith(".parquet") for f in os.listdir(state_dir)
    ):
        return spark.read.parquet(state_dir)
    return spark.createDataFrame(
        [], "entity_id long, value_micro long, version long"
    )


def run_cdc_stream(
    spark: SparkSession,
    log_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 10,
):
    """Consume the JSON changelog directory until drained (availableNow)
    and maintain the materialized state at ``state_dir`` via
    merge → tmp-write → atomic rename per micro-batch."""
    stream = (
        spark.readStream.schema(CDC_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .json(log_dir)
    )

    def handle_batch(batch: DataFrame, batch_id: int) -> None:
        state = _read_state(spark, state_dir)
        merged = merge_cdc_batch(state, batch)
        tmp = state_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(state_dir):
            shutil.rmtree(state_dir)
        os.rename(tmp, state_dir)

    query = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return query
