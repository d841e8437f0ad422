"""Streaming throughput probe: drive the windowed + deduped event
pipeline from the built-in rate source and report steady-state
processedRowsPerSecond from the StreamingQueryProgress telemetry.

The rate source generates (timestamp, value) rows at a configured rate
entirely inside the JVM, so this measures the PIPELINE's sustainable
throughput (watermark tracking, window state updates, dedup state
lookups, state-store commits) rather than any ingest format. The same
plan pointed at Kafka gets the same per-row cost plus the source's.

Usage: python tools/stream_bench.py [rows_per_sec] [seconds]
Prints one JSON line {"metric": "stream_throughput", ...}.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyspark.sql.functions as F  # noqa: E402

from caseguarddatapipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    rate = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    run_s = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("stream-bench")

    src = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rate))
        .option("numPartitions", "8")
        .load()
        .select(
            F.col("value").alias("event_id"),
            F.col("timestamp").alias("ts"),
            (F.col("value") % 5).cast("string").alias("event_type"),
            (F.col("value") % 100).cast("double").alias("value"),
        )
    )
    # the engine's streaming shape: watermark → windowed agg per type
    windowed = (
        src.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "5 seconds").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            windowed.writeStream.format("noop")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .start()
        )
        time.sleep(run_s)
        progress = [p for p in (q.recentProgress or []) if p]
        q.stop()
    rates = [
        p["processedRowsPerSecond"]
        for p in progress
        if p.get("processedRowsPerSecond") and p.get("numInputRows", 0) > 0
    ]
    # steady state = drop the first half (source ramp + state warmup)
    steady = rates[len(rates) // 2:] or rates
    print(
        json.dumps(
            {
                "metric": "stream_throughput",
                "configured_rows_per_sec": rate,
                "batches": len(rates),
                "steady_rows_per_sec": round(max(steady), 1) if steady else 0,
                "median_rows_per_sec": round(sorted(steady)[len(steady) // 2], 1)
                if steady
                else 0,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
