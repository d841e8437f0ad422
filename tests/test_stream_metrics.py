"""StreamingQueryListener health metrics (T6): progress events captured
per micro-batch, row counts accounted, health verdict derived."""

from __future__ import annotations

import json
import time

from caseguarddatapipeline_spark.streaming.metrics import (
    attach_health_listener,
    detach,
)
from caseguarddatapipeline_spark.streaming.stateful import run_watermark_stream


def test_health_listener_accounts_rows(spark, tmp_path):
    events = tmp_path / "events"
    events.mkdir()
    rows = [{"entity_id": i % 3, "serialno": i} for i in range(12)]
    with open(events / "b.json", "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")

    listener = attach_health_listener(spark)
    try:
        run_watermark_stream(
            spark, str(events), str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        # listener bus delivers asynchronously; generous deadline so the
        # test stays solid on a loaded box
        deadline = time.time() + 30
        while time.time() < deadline:
            s = listener.summary()
            if s["n_batches"] >= 1 and s["total_input_rows"] >= 12:
                break
            time.sleep(0.2)
        s = listener.summary()
        assert s["n_batches"] >= 1
        assert s["total_input_rows"] == 12
        assert s["healthy"] is True
        kinds = {k for k, _, _ in listener.events}
        assert "started" in kinds and "terminated" in kinds
    finally:
        detach(spark, listener)


def test_listener_captures_observed_metrics(spark, tmp_path):
    """Business counters attached with observe() on the streaming frame
    surface in the listener's progress events, summable across batches."""
    import pyspark.sql.functions as F

    from caseguarddatapipeline_spark.streaming.windows import STREAM_EVENT_SCHEMA

    events = tmp_path / "events"
    events.mkdir()
    with open(events / "b.json", "w") as fh:
        for i in range(10):
            fh.write(
                json.dumps(
                    {
                        "event_id": i,
                        "ts": f"2024-01-01 10:{i:02d}:00",
                        "event_type": "view" if i % 2 else "click",
                        "value": float(i),
                    }
                )
                + "\n"
            )

    listener = attach_health_listener(spark)
    try:
        stream = spark.readStream.schema(STREAM_EVENT_SCHEMA).json(str(events))
        observed = stream.observe(
            "ingest",
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("event_type") == "view", 1)).alias("n_views"),
        )
        q = (
            observed.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        deadline = time.time() + 30
        while time.time() < deadline:
            if listener.observed_totals("ingest", "n_rows") >= 10:
                break
            time.sleep(0.2)
        assert listener.observed_totals("ingest", "n_rows") == 10
        assert listener.observed_totals("ingest", "n_views") == 5
    finally:
        detach(spark, listener)
