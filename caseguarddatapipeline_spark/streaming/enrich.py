"""Stream-static enrichment with a refreshing dimension: join an event
stream against a managed dimension table that OTHER jobs keep updating.

Structured Streaming re-resolves the static side's files every
micro-batch, so a dimension overwrite (new handler roster, new tenant
config rows, new MIME map) is picked up by the NEXT batch without
restarting the query — the always-fresh form of the reference's per-run
config reload (core/session_manager.py re-reads tenant config per
session; here the refresh is per micro-batch and free). Contrast with a
broadcast() of a captured DataFrame, which would freeze the dimension at
query start.

At 100 TB the static side is a dimension (MBs), so each batch's join
broadcasts; the stream side never shuffles.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .windows import STREAM_EVENT_SCHEMA


def enrich_with_dim(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Left-join the stream to the dimension on event_type; unmatched
    events keep NULL enrichment (never dropped — a dim gap must not lose
    fact rows)."""
    return events.join(F.broadcast(dim), "event_type", "left").select(
        "event_id",
        "event_type",
        "value",
        F.col("category").alias("category"),
        F.col("weight").alias("weight"),
    )


def run_enrich_stream(
    spark: SparkSession,
    events_dir: str,
    dim_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain the event stream, enriching each micro-batch against the
    CURRENT contents of ``dim_dir`` (parquet, overwritten out-of-band)."""
    os.makedirs(out_dir, exist_ok=True)
    stream = spark.readStream.schema(STREAM_EVENT_SCHEMA).json(events_dir)
    dim = spark.read.parquet(dim_dir)  # re-resolved per micro-batch
    query = (
        enrich_with_dim(stream, dim)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
