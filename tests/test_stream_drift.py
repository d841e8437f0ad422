"""Streaming PSI drift monitor: per-batch scoring of the cumulative
event histogram against a frozen baseline, with replay-exact count
accumulation."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from caseguarddatapipeline_spark.streaming.drift import (
    PSI_ALERT,
    run_drift_stream,
    write_baseline,
)


def _write_batch(d: str, n: int, rows) -> None:
    with open(os.path.join(d, f"batch{n}.json"), "w") as f:
        for i, (etype, value) in enumerate(rows):
            f.write(
                json.dumps(
                    {
                        "event_id": n * 100_000 + i,
                        "ts": "2024-01-01T00:00:00",
                        "user_id": 1,
                        "event_type": etype,
                        "value": value,
                    }
                )
                + "\n"
            )


def test_drift_stream_alerts_on_shift(spark, tmp_path):
    inp = str(tmp_path / "in")
    base_dir = str(tmp_path / "baseline")
    counts, out, ck = (
        str(tmp_path / "counts"),
        str(tmp_path / "out"),
        str(tmp_path / "ck"),
    )
    os.makedirs(inp)

    # baseline: 'click' values in bin 1 (60.0), 'view' in bin 0 (10.0)
    baseline_events = spark.createDataFrame(
        [("click", 60.0)] * 40 + [("view", 10.0)] * 40,
        "event_type string, value double",
    )
    write_baseline(baseline_events, base_dir)

    # batch 1 matches the baseline -> no drift anywhere
    _write_batch(inp, 1, [("click", 60.0)] * 20 + [("view", 10.0)] * 20)
    run_drift_stream(spark, inp, base_dir, counts, out, ck)
    r1 = {r["event_type"]: r for r in spark.read.parquet(out).collect()}
    assert set(r1) == {"click", "view"}
    assert not r1["click"]["drifted"] and not r1["view"]["drifted"]
    # identical distribution: PSI stays in the <0.1 "stable" band (it is
    # not exactly 0 — Laplace smoothing differs with 40 vs 20 samples)
    assert r1["click"]["psi"] < 0.1

    # batch 2: 'click' moves entirely to bin 4 (210.0) -> cumulative
    # profile shifts past the alert band; 'view' stays put
    _write_batch(inp, 2, [("click", 210.0)] * 60 + [("view", 10.0)] * 20)
    run_drift_stream(spark, inp, base_dir, counts, out, ck)
    latest = (
        spark.read.parquet(out)
        .filter(F.col("batch_id") == F.lit(1))
        .collect()
    )
    r2 = {r["event_type"]: r for r in latest}
    assert r2["click"]["drifted"] and r2["click"]["psi"] >= PSI_ALERT
    assert not r2["view"]["drifted"]
    # cumulative counts: batch partitions accumulate, never double-add
    assert r2["click"]["n_curr"] == 80 and r2["view"]["n_curr"] == 40

    # earlier batch's report is untouched by the later drain
    first = {
        r["event_type"]: r
        for r in spark.read.parquet(out)
        .filter(F.col("batch_id") == F.lit(0))
        .collect()
    }
    assert not first["click"]["drifted"]


def test_null_rows_divert(spark, tmp_path):
    inp = str(tmp_path / "in")
    base_dir = str(tmp_path / "baseline")
    os.makedirs(inp)
    write_baseline(
        spark.createDataFrame([("click", 60.0)] * 40, "event_type string, value double"),
        base_dir,
    )
    with open(os.path.join(inp, "b.json"), "w") as f:
        for i in range(20):
            f.write(json.dumps({"event_id": i, "ts": "2024-01-01T00:00:00",
                                "user_id": 1, "event_type": "click", "value": 60.0}) + "\n")
        f.write(json.dumps({"event_id": 98, "ts": "2024-01-01T00:00:00",
                            "user_id": 1, "event_type": None, "value": 1.0}) + "\n")
        f.write(json.dumps({"event_id": 99, "ts": "2024-01-01T00:00:00",
                            "user_id": 1, "event_type": "click", "value": None}) + "\n")
    run_drift_stream(
        spark, inp, base_dir,
        str(tmp_path / "counts"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    # the two null rows diverted: only the 20 valid clicks were counted
    assert len(rows) == 1 and rows[0]["n_curr"] == 20
    assert not rows[0]["drifted"]
