"""Custom stateful streaming operator: per-entity high-watermark tracking
with ``applyInPandasWithState`` (T1/T2/T6 as a *streaming* operator).

The batch engine implements watermark detection as a theta join against a
bookmark table (operators/incremental.py, j4_watermark_updates). On a live
stream the same semantics become keyed state: for every entity the operator
holds (watermark, event_count) in Spark-managed state, and each micro-batch
emits one row per touched entity with the advanced watermark and how many
serials the batch moved it by — the reference's ChangeTracker
(database/change_tracking.py:86-152) without a Postgres round-trip per case.

Scale notes: state lives in the state store partitioned by the grouping
key — the shuffle is on entity_id only, state size is O(distinct entities)
× 16 bytes, and Arrow batches keep the pandas hop amortized. With RocksDB
state store this holds at billions of keys.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("entity_id", LongType()),
        StructField("serialno", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("watermark", LongType()),
        StructField("n_events", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("entity_id", LongType()),
        StructField("watermark", LongType()),
        StructField("n_events", LongType()),
        StructField("advanced_by", LongType()),
    ]
)


def _track(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (entity_id,) = key
    old_mark, old_n = state.get if state.exists else (0, 0)
    new_mark, new_n = old_mark, old_n
    for pdf in pdfs:
        if len(pdf):
            new_mark = max(new_mark, int(pdf["serialno"].max()))
            new_n += len(pdf)
    state.update((new_mark, new_n))
    yield pd.DataFrame(
        {
            "entity_id": [entity_id],
            "watermark": [new_mark],
            "n_events": [new_n],
            "advanced_by": [new_mark - old_mark],
        }
    )


def track_watermarks(events: DataFrame) -> DataFrame:
    """Apply the stateful watermark operator to a streaming DataFrame."""
    return events.groupBy("entity_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_watermark_stream(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain the event stream (availableNow), appending per-entity watermark
    updates to ``out_dir``. State persists across invocations through the
    checkpoint, so a later batch of files continues from the stored
    watermarks — the streaming analog of T2's bookmark advance."""
    os.makedirs(out_dir, exist_ok=True)
    stream = spark.readStream.schema(EVENT_SCHEMA).json(events_dir)

    # update-mode stateful output pairs with foreachBatch (the file sink is
    # append-only); each micro-batch appends its state deltas.
    def sink(batch: DataFrame, batch_id: int) -> None:
        batch.write.mode("append").parquet(out_dir)

    query = (
        track_watermarks(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


# --- transformWithStateInPandas variant (Spark 4.x state-v2 API) ---------
#
# Same watermark semantics as track_watermarks, on the newer arbitrary-
# state API: typed ValueState handles, explicit time modes, and the
# RocksDB state store (required by transformWithState) — the store that
# actually holds billions of keys with changelog checkpointing. The
# applyInPandasWithState form above stays as the HDFS-state-store-
# compatible fallback.

try:  # pragma: no cover - import guard for older runtimes
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    # transformWithState's Python driver worker talks protobuf to the JVM;
    # without google.protobuf the query crashes at start
    # (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE), so the capability
    # gate must probe the transitive dependency too.
    import google.protobuf.descriptor  # noqa: F401

    HAS_TWS = True
except ImportError:  # pragma: no cover
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TWS = False

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class WatermarkProcessor(StatefulProcessor):
    """Per-entity high-watermark state as a StatefulProcessor: one
    ValueState holding (watermark, n_events); each batch emits the
    advanced watermark per touched entity (T1/T2 semantics, as in
    _track above)."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._state = handle.getValueState("wm", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (entity_id,) = key
        old_mark, old_n = self._state.get() if self._state.exists() else (0, 0)
        new_mark, new_n = old_mark, old_n
        for pdf in rows:
            if len(pdf):
                new_mark = max(new_mark, int(pdf["serialno"].max()))
                new_n += len(pdf)
        self._state.update((new_mark, new_n))
        yield pd.DataFrame(
            {
                "entity_id": [entity_id],
                "watermark": [new_mark],
                "n_events": [new_n],
                "advanced_by": [new_mark - old_mark],
            }
        )

    def close(self) -> None:
        pass


def track_watermarks_tws(events: DataFrame) -> DataFrame:
    """Watermark operator on the transformWithStateInPandas API."""
    return events.groupBy("entity_id").transformWithStateInPandas(
        statefulProcessor=WatermarkProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def run_watermark_stream_tws(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """Drain the event stream through the transformWithState operator
    (availableNow), appending per-entity watermark updates to
    ``out_dir``. Requires the RocksDB state store provider; the conf is
    scoped to this call and restored after."""
    os.makedirs(out_dir, exist_ok=True)
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    try:
        stream = spark.readStream.schema(EVENT_SCHEMA).json(events_dir)

        def sink(batch: DataFrame, batch_id: int) -> None:
            batch.write.mode("append").parquet(out_dir)

        query = (
            track_watermarks_tws(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        query.awaitTermination()
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
